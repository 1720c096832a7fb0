#!/usr/bin/env python
"""Per-introduction 10x volume gate (VERDICT r8 task 4) — the medoid
lesson institutionalized: every NEW query must show sub-quadratic wall
time growth across a volume decade BEFORE it lands, not at the
end-of-round sweep.  The round-8b sweep caught q_vector_medoid's
pair-frame form going quadratic (5k-vector cells -> 250M pairs,
>25 min); this gate makes that signature a per-query failure at
introduction time.

Usage::

    python scripts/volume_gate.py q_foo [q_bar ...] [--factor 10]
                                  [--ratio 30] [--floor 1.0]

Per query: times at 1x and factor-x synthesized volume (min-of-2 each,
noop count sink).  FAILS (exit 1) when

    t_factor > ratio * max(t_1x, floor)

With factor=10, linear queries land well under 10x2 overhead (sorts add
a log factor, the ~1 s scheduling floor absorbs tiny baselines), while
a quadratic query grows ~100x and trips the default ratio=30 cleanly —
the threshold is the documented "quadratic signature" boundary, not a
perf SLO.  The `floor` keeps sub-second baselines from tripping the
ratio on scheduling noise.

Round workflow (SCALING.md "Volume gate"): run this on every new
query's name in the same session that introduces it; the full-registry
`volume_sweep.py` remains the end-of-round backstop.
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
    SyntheticDocumentsDataSource,
    SyntheticEmbeddingsDataSource,
    SyntheticEventsDataSource,
)
from java_etl_bi_generator_spark.sources.synthetic_star import (  # noqa: E402
    generate_star,
)

# sf0.1 fixture grains (shared with volume_sweep.py)
BASE = {
    "orders": 150_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 5_000,
}


def _generate(spark, factor: int) -> str:
    tmp = tempfile.mkdtemp(prefix=f"volume_gate_{factor}x_")
    generate_star(spark, tmp, BASE["orders"] * factor)
    (
        spark.read.format("synthetic_events")
        .option("rows", BASE["events"] * factor)
        .option("partitions", 32)
        .option("numUsers", 200 * factor)
        .load()
        .withColumn("props", F.lit(None).cast("string"))
        .write.parquet(os.path.join(tmp, "events.parquet"))
    )
    (
        spark.read.format("synthetic_documents")
        .option("rows", BASE["documents"] * factor)
        .option("partitions", 32)
        .load()
        .write.parquet(os.path.join(tmp, "documents.parquet"))
    )
    (
        spark.read.format("synthetic_embeddings")
        .option("rows", BASE["embeddings"] * factor)
        .option("partitions", 32)
        .load()
        .write.parquet(os.path.join(tmp, "embeddings.parquet"))
    )
    return tmp


def _time(fn, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir)
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    args = [a for a in sys.argv[1:]]

    def opt(name: str, default: float) -> float:
        if name in args:
            i = args.index(name)
            v = float(args[i + 1])
            del args[i : i + 2]
            return v
        return default

    factor = int(opt("--factor", 10))
    ratio = opt("--ratio", 30.0)
    floor = opt("--floor", 1.0)
    names = args
    if not names:
        sys.exit("usage: volume_gate.py q_name [...] [--factor N] "
                 "[--ratio R] [--floor S]")
    qs = registry()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="volume_gate")
    for src in (SyntheticEventsDataSource, SyntheticDocumentsDataSource,
                SyntheticEmbeddingsDataSource):
        spark.dataSource.register(src)
    d1 = _generate(spark, 1)
    dF = _generate(spark, factor)
    print(f"generated 1x ({d1}) and {factor}x ({dF})", flush=True)

    failed = []
    try:
        for name in names:
            fn = qs[name]

            def run(spark_, sf, _fn=fn):
                return _fn(spark_, sf).count()

            t1 = _time(run, spark, d1)
            tF = _time(run, spark, dF)
            limit = ratio * max(t1, floor)
            verdict = "OK  " if tF <= limit else "FAIL"
            if tF > limit:
                failed.append(name)
            print(
                f"{verdict} {name:36s} 1x={t1:7.2f}s {factor}x={tF:7.2f}s "
                f"growth={tF / max(t1, 1e-9):6.1f}x limit={limit:7.2f}s",
                flush=True,
            )
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(dF, ignore_errors=True)
    if failed:
        sys.exit(f"QUADRATIC SIGNATURE: {failed}")
    print(f"\nall {len(names)} queries pass the {factor}x gate")


if __name__ == "__main__":
    main()
