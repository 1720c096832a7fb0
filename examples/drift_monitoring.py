#!/usr/bin/env python
"""Model-monitoring drift report on this engine (north-star surface) — the
checks a scoring/data pipeline runs between a reference period and the
current one, composed from the declared drift family:

  1. KS test          (exact two-sample Kolmogorov-Smirnov on order
                       totals, URGENT vs LOW arms — integer
                       cross-multiplied ECDF gap, distributed cumsum)
  2. per-segment KS   (the sliced fairness view via grouped_cumsum —
                       a shift invisible in aggregate can sit inside
                       one market segment)
  3. PSI per bin      (Population Stability Index 1995 vs 1996,
                       add-one smoothed; which bin moved is the
                       actionable output)
  4. JS per bin       (Jensen-Shannon — symmetric, bounded at 1 bit)
  5. mixture report   (language token-mass shares + temperature
                       weights — the corpus-side companion)

Run::

    python examples/drift_monitoring.py [sf_dir]

Everything is a DataFrame plan over the declared queries — the same
report distributes unchanged on a cluster; nothing here collects more
than bin-/segment-grain rows to the driver.
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

    ks = qs["q_ks_test"](spark, sf_dir).collect()[0]
    print(f"\nKS (URGENT vs LOW order totals): D={ks['ks']} "
          f"at value {ks['at_value']} (n1={ks['n1']}, n2={ks['n2']})")
    out["ks_rows"] = 1

    seg = qs["q_ks_by_segment"](spark, sf_dir).orderBy("segment").collect()
    print("\nPer-segment KS:")
    for r in seg:
        print(f"  {r['segment']:12s} D={r['ks']:8.6f} at {r['at_value']}")
    out["segments"] = len(seg)

    psi = qs["q_psi_drift"](spark, sf_dir).orderBy("bin").collect()
    total_psi = sum(r["psi_contrib"] for r in psi)
    worst = max(psi, key=lambda r: abs(r["psi_contrib"]))
    print(f"\nPSI 1995->1996 (sum of per-bin contributions): "
          f"{total_psi:.6f}; biggest mover: bin {worst['bin']} "
          f"({worst['psi_contrib']:+.6f})")
    out["psi_bins"] = len(psi)

    js = qs["q_js_divergence"](spark, sf_dir).orderBy("bin").collect()
    total_js = sum(r["js_contrib"] for r in js)
    print(f"JS divergence (bits, same bins): {total_js:.6f}")
    out["js_bins"] = len(js)

    mix = qs["q_domain_mixture"](spark, sf_dir).orderBy("lang").collect()
    print("\nCorpus mixture (temperature α=1/2):")
    for r in mix:
        print(f"  {r['lang']}: share={r['share']:.4f} -> "
              f"weight={r['weight']:.4f} (x{r['sample_factor']:.2f}, "
              f"{r['alloc_tokens']} tokens)")
    out["langs"] = len(mix)
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    report(get_spark(app_name="drift-monitoring"), sf)
