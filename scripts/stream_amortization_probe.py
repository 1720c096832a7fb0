#!/usr/bin/env python
"""Multi-batch probe for the streaming family's fixed-cost claim
(VERDICT r11 item 9).

The bench entries for q_stream_* each start a fresh availableNow stream
over ONE parquet file — a single micro-batch that pays the full
machinery cost (footer probe, state-store open across all shuffle
partitions, memory-sink setup, commit) once and amortizes it over
nothing.  The claim recorded since round 9 is that this cost is a
PER-QUERY constant, not a per-row cost: a real deployment pays it per
trigger and amortizes it across the stream's lifetime.

This probe makes the claim measurable: it splits the events fixture
into N equal parquet files, streams them with ``maxFilesPerTrigger=1``
(one micro-batch per file), and reports each batch's durations from the
query's progress events.  If the machinery were per-batch rather than
per-query, batch k would cost what batch 1 costs; the measured shape is
batch 1 >> batches 2..N, i.e. state-store open and sink setup amortize
exactly as documented.

Usage::

    python scripts/stream_amortization_probe.py [n_files]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from java_etl_bi_generator_spark.session import get_spark  # noqa: E402
from java_etl_bi_generator_spark.streaming.source import (  # noqa: E402
    event_stream,
)

import pyspark.sql.functions as F  # noqa: E402


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stream-amortization-probe")

    # Split the single-file fixture into n_files equal parts so the
    # file source can trigger one micro-batch per file.
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    split_dir = os.path.join(
        tempfile.mkdtemp(prefix="stream_probe_"), "events_parts"
    )
    src.repartition(n_files).write.parquet(split_dir)

    # The same stateful shape the q_stream_* family uses: watermarked
    # tumbling-window aggregation (one state store per shuffle
    # partition), one micro-batch per input file.  maxFilesPerTrigger
    # is a SOURCE option (availableNow honors read limits per batch),
    # so it is injected into the reader event_stream builds.
    _orig_prop = type(spark).readStream

    class _Patched:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, a):
            return getattr(self._inner, a)

        def schema(self, s):
            return self._inner.schema(s).option("maxFilesPerTrigger", "1")

    type(spark).readStream = property(
        lambda self: _Patched(_orig_prop.fget(self))
    )
    try:
        ev = event_stream(spark, split_dir)
    finally:
        type(spark).readStream = _orig_prop
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("amortization_probe")
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = []
    for p in q.recentProgress:
        d = p["durationMs"]
        rows.append(
            {
                "batchId": p["batchId"],
                "rows": p["numInputRows"],
                "triggerExecution_ms": d.get("triggerExecution"),
                "addBatch_ms": d.get("addBatch"),
                "stateRowsTotal": (p.get("stateOperators") or [{}])[0].get(
                    "numRowsTotal"
                ),
            }
        )
    print(json.dumps(rows, indent=1))
    if len(rows) >= 2:
        first = rows[0]["triggerExecution_ms"]
        rest = [r["triggerExecution_ms"] for r in rows[1:] if r["rows"]]
        if rest:
            print(
                f"batch1 {first} ms vs later batches "
                f"{rest} ms -> marginal batch cost = "
                f"{(sum(rest) / len(rest)) / first:.2f}x of batch 1"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
