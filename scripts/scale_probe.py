#!/usr/bin/env python
"""Scale probe beyond the driver fixtures: synthesize events tables of
arbitrary volume with the Python Data Source generator (zero input
storage), write them in the testdata layout, and time the event-analytics
headline queries on each — the measured answer to "does the plan hold at
100x sf0.1?".

Run::

    python scripts/scale_probe.py [rows ...]      # default 1e5 1e6 1e7

Prints one markdown table row per volume (min-of-2 per query, seconds),
ready for SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from java_etl_bi_generator_spark.queries import registry  # noqa: E402
from java_etl_bi_generator_spark.session import get_spark  # noqa: E402
from java_etl_bi_generator_spark.sources.synthetic import (  # noqa: E402
    SyntheticEventsDataSource,
)

PROBES = [
    "q_window_tumbling",
    "q_sessionize",
    "q_funnel",
    "q_rolling_distinct",
    "q_groupby_sum",  # events-only grouped dsum
]
# q_groupby_sum reads lineitem in the registry — swap for an events twin
EVENT_ONLY = [p for p in PROBES if p != "q_groupby_sum"]


def main() -> None:
    volumes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000, 10_000_000]
    spark = get_spark(app_name="scale_probe")
    spark.dataSource.register(SyntheticEventsDataSource)
    qs = registry()

    print("| events rows | " + " | ".join(EVENT_ONLY) + " | total |")
    print("|" + "---|" * (len(EVENT_ONLY) + 2))
    for n in volumes:
        tmp = tempfile.mkdtemp(prefix=f"scale_probe_{n}_")
        (
            spark.read.format("synthetic_events")
            .option("rows", n)
            .option("partitions", 32)
            .option("numUsers", max(1000, n // 100))
            .load()
            .withColumn("props", F.lit(None).cast("string"))
            .write.parquet(os.path.join(tmp, "events.parquet"))
        )
        times = {}
        for name in EVENT_ONLY:
            qs[name](spark, tmp).write.mode("overwrite").format("noop").save()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, tmp).write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
            times[name] = best
        total = sum(times.values())
        print(
            f"| {n:,} | "
            + " | ".join(f"{times[p]:.2f}" for p in EVENT_ONLY)
            + f" | {total:.2f} |"
        )
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
