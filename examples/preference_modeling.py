#!/usr/bin/env python
"""End-to-end preference-modeling loop on this engine — the RLHF data
shape from raw corpus to fitted preference strengths:

  1. quality scoring       (fastText-shaped hashed linear model applied
                            via a broadcast 1024-slot weight table;
                            exact bigint margins)
  2. preference pairs      (per (lang, source) stratum: best-margin doc
                            as `chosen` vs worst as `rejected` — the
                            DPO dataset construction)
  3. preference fitting    (Bradley-Terry strengths from pairwise wins
                            via three exact-integer Hunter-MM rounds —
                            the reward-model / leaderboard statistic,
                            here on within-order brand competitions)
  4. sequential monitor    (Wald SPRT over the daily conversion of the
                            treated arm — the always-valid early-stop
                            dashboard for the downstream experiment)

Run::

    python examples/preference_modeling.py [sf_dir]

Default: /root/testdata/sf0.01.  Every step is DataFrame expressions —
no Python UDFs — and every number printed here is the same
hash-checked arithmetic the declared queries certify against DuckDB.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from java_etl_bi_generator_spark.queries import registry
from java_etl_bi_generator_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="preference_modeling")
    r = registry()

    scored = r["q_quality_linear_scorer"](spark, sf_dir)
    n_docs = scored.count()
    n_pass = scored.filter("quality_pass = 1").count()
    print(f"[1/4] scored {n_docs} docs; {n_pass} pass the quality gate")

    pairs = r["q_preference_pairs"](spark, sf_dir)
    print(f"[2/4] built {pairs.count()} preference pairs; widest margins:")
    for row in pairs.orderBy(pairs.margin_gap.desc()).limit(3).collect():
        print(
            f"      ({row['lang']},{row['source']}): "
            f"doc {row['chosen_doc']} over doc {row['rejected_doc']} "
            f"(gap {row['margin_gap']})"
        )

    bt = r["q_bradley_terry"](spark, sf_dir)
    print("[3/4] Bradley-Terry leaderboard (top 5 strengths):")
    for row in bt.orderBy(bt.strength.desc()).limit(5).collect():
        print(
            f"      {row['brand']}: strength {row['strength']:.4f} "
            f"({row['wins']}/{row['games']} wins)"
        )

    sprt = r["q_sprt_sequential"](spark, sf_dir)
    decided = sprt.filter("decision != 'continue'")
    first = decided.orderBy("d").first()
    if first is not None:
        print(
            f"[4/4] SPRT reached '{first['decision']}' on {first['d']} "
            f"(llr {first['llr']:.3f})"
        )
    else:
        print("[4/4] SPRT still in 'continue' at end of data")


if __name__ == "__main__":
    main()
