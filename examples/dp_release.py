#!/usr/bin/env python
"""Differential-privacy release dashboard on this engine — the full
mechanism family a governance team composes for one publication window,
each piece a declared registry query (round 6-8):

  1. noisy counts       (two-sided geometric, ε=0.5 — q_dp_noisy_counts)
  2. noisy bounded sums (clip-then-quantize, sensitivity 1 unit —
                         q_dp_noisy_sum)
  3. report-noisy-max   (release WHICH category won, no count —
                         q_dp_noisy_max)
  4. noisy quantiles    (histogram sketch + per-bin noise for ONE ε by
                         parallel composition; quantile reads are free
                         post-processing — q_dp_quantile)
  5. above-threshold    (sparse vector technique: first candidate over a
                         noisy threshold, then halt — q_dp_above_threshold)

Run::

    python examples/dp_release.py [sf_dir]

Default: /root/testdata/sf0.01.  SECRECY caveat (functions/privacy.py,
repeated loudly here): these queries use a PUBLIC salt so a DuckDB oracle
can recompute the identical noise for cross-engine certification — a
production release draws its salt from a secret per-release key and
never publishes the calibration columns.  ε-accounting for this window:
counts ε=0.5, sums ε=0.5, argmax ε=0.5, quantile histogram ε=0.5, SVT
ε=0.5 (ε/2 threshold + ε/4 per tested query at c=1) — sequential
composition totals ε=2.5 over the five releases (plus the documented
truncation δ per mechanism).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from java_etl_bi_generator_spark.queries import registry  # noqa: E402
from java_etl_bi_generator_spark.session import get_spark  # noqa: E402


def report(spark, sf_dir: str) -> dict:
    qs = registry()
    out: dict = {}

    counts = qs["q_dp_noisy_counts"](spark, sf_dir)
    rows = counts.orderBy("order_year", "priority").collect()
    print(f"1. noisy counts (ε=0.5): {len(rows)} cells; sample:")
    for r in rows[:3]:
        print(
            f"   {r['order_year']}/{r['priority']}: released="
            f"{r['released_count']} (true={r['true_count']}, "
            f"noise={r['noise']:+d})"
        )
    out["count_cells"] = len(rows)

    sums = qs["q_dp_noisy_sum"](spark, sf_dir).collect()
    print(f"2. noisy bounded sums (ε=0.5): {len(sums)} cells")
    out["sum_cells"] = len(sums)

    argmax = qs["q_dp_noisy_max"](spark, sf_dir).orderBy("order_year")
    flips = [r for r in argmax.collect() if not r["matches_true"]]
    print(
        f"3. report-noisy-max (ε=0.5): "
        f"{len(flips)} year(s) where noise flipped the winner"
    )
    out["argmax_flips"] = len(flips)

    quant = qs["q_dp_quantile"](spark, sf_dir).orderBy("event_type")
    print("4. noisy quantiles (ε=0.5 for the WHOLE histogram):")
    for r in quant.collect():
        print(
            f"   {r['event_type']}: p50={r['p50_cents_dp']}c "
            f"p95={r['p95_cents_dp']}c p99={r['p99_cents_dp']}c "
            f"(ñ={r['n_released']})"
        )

    svt = qs["q_dp_above_threshold"](spark, sf_dir).first()
    released = svt["released_year"]
    print(
        f"5. above-threshold / SVT (ε=0.5): "
        + (
            f"released year {released} after {svt['queries_tested']} "
            f"of {svt['n_candidates']} candidates"
            if released is not None
            else f"no candidate cleared (tested all "
            f"{svt['n_candidates']}) — the honest null release"
        )
    )
    out["svt_released"] = released

    print("\nWindow ε-account: 0.5 × 5 releases = 2.5 total "
          "(sequential composition; quantile reads post-processing-free)")
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    report(get_spark(app_name="dp-release"), sf)
