#!/usr/bin/env python
"""Feature-diagnostics report on this engine (north-star surface) — the
robust/multivariate statistics a feature-engineering pipeline runs
before trusting a column, composed from the declared stats family:

  1. winsorized moments   (q_winsorize — clipped mean/std at exact
                           rank-selected p01/p99 bounds)
  2. rank correlation     (q_spearman_by_group — average-rank Spearman,
                           the monotone-association monitor)
  3. multivariate outliers(q_anomaly_mahalanobis — closed-form 2-D
                           Mahalanobis; catches combination anomalies
                           1-D z-scores miss)
  4. association          (q_mutual_information — lang x source MI
                           cells; is any source language-skewed?)
  5. distribution ladder  (q_quantile_ladder — exact multi-quantiles
                           from one distributed rank pass)

Run::

    python examples/stats_diagnostics.py [sf_dir]

Every step is a DataFrame plan over declared queries; only
segment-grain rows reach the driver.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from java_etl_bi_generator_spark.queries import registry  # noqa: E402
from java_etl_bi_generator_spark.session import get_spark  # noqa: E402


def report(spark, sf_dir: str) -> dict[str, int]:
    qs = registry()
    out: dict[str, int] = {}

    w = qs["q_winsorize"](spark, sf_dir).collect()[0]
    print(
        f"\nWinsorized order totals (clipped to [{w['lo']:.2f}, "
        f"{w['hi']:.2f}]): mean={w['wins_mean']:.2f} "
        f"std={w['wins_std']:.2f} over {w['n_orders']} orders"
    )
    out["winsorize_rows"] = 1

    sp = (
        qs["q_spearman_by_group"](spark, sf_dir)
        .orderBy("l_returnflag")
        .collect()
    )
    print("\nSpearman(quantity, price) per return flag:")
    for r in sp:
        rho = "n/a (zero variance)" if r["spearman"] is None \
            else f"{r['spearman']:.6f}"
        print(f"  {r['l_returnflag']}: rho={rho} (n={r['n_rows']})")
    out["spearman_groups"] = len(sp)

    mh = (
        qs["q_anomaly_mahalanobis"](spark, sf_dir)
        .orderBy("l_returnflag")
        .collect()
    )
    print("\nMahalanobis (quantity, price) outliers per flag "
          "(d2 > chi2_2@0.999):")
    for r in mh:
        print(f"  {r['l_returnflag']}: {r['n_outliers']}/{r['n_rows']} "
              f"flagged, max d2={r['max_d2']:.2f}")
    out["mahalanobis_groups"] = len(mh)

    mi = qs["q_mutual_information"](spark, sf_dir).collect()
    total_mi = sum(r["mi_contrib"] for r in mi)
    print(f"\nCorpus lang x source mutual information: {total_mi:.6f} bits "
          f"({len(mi)} cells)")
    out["mi_cells"] = len(mi)

    ql = qs["q_quantile_ladder"](spark, sf_dir).orderBy("p").collect()
    print("\nOrder-total quantiles (exact, one rank pass):")
    for r in ql:
        print(f"  p{int(r['p'] * 100):>2}: {r['q_value']:.2f}")
    out["quantiles"] = len(ql)
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    report(get_spark(app_name="stats-diagnostics"), sf)
