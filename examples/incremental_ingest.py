#!/usr/bin/env python
"""Incremental ingestion lifecycle on this engine — the continuous-load
half the reference's batch ETL lacks (FullETLGenerator.java rebuilds
every output per run), built from this round's components:

  1. generate   a deterministic event stream with zero storage
                (sources/synthetic.py — Spark 4 Python Data Source API,
                splitmix64 rows synthesized in the executors)
  2. ingest     micro-batches through the streaming merge sink
                (streaming/sink.py: foreachBatch keep-latest upsert,
                versioned atomic publish, batch-id replay idempotence)
  3. compact    the accreted snapshot into scan-friendly files clustered
                by user (sources/parquet_sink.compact_parquet — the
                OPTIMIZE step; range-partitioned so min/max footer
                pruning works on the key)
  4. analyze    the published table with the engine's event analytics
                (latest-state profile per event_type)

Run::

    python examples/incremental_ingest.py [n_rows]

Default 200k generated events.  Everything runs storage-free except the
published table itself; on a cluster the same script points the sink at
object storage and drops the availableNow trigger.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from java_etl_bi_generator_spark.session import get_spark  # noqa: E402
from java_etl_bi_generator_spark.sources.parquet_sink import (  # noqa: E402
    compact_parquet,
)
from java_etl_bi_generator_spark.sources.synthetic import (  # noqa: E402
    SyntheticEventsDataSource,
)
from java_etl_bi_generator_spark.streaming.sink import (  # noqa: E402
    current_snapshot,
    merge_stream_into_parquet,
)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="incremental_ingest")
    spark.dataSource.register(SyntheticEventsDataSource)
    work = tempfile.mkdtemp(prefix="incremental_ingest_")
    table = os.path.join(work, "user_state")

    # 1-2. generate + ingest: one catch-all batch under availableNow
    # (Python stream sources take the single-batch fallback), merged
    # through the idempotent versioned sink
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", n_rows)
        .option("partitions", 16)
        .option("numUsers", 5_000)
        .load()
    )
    q = merge_stream_into_parquet(
        stream,
        table,
        key_col="user_id",
        order_col="ts",
        tiebreak_col="event_id",
        checkpoint_dir=os.path.join(work, "ckpt"),
        query_name="incremental_ingest",
    )
    q.awaitTermination()
    versions = sorted(d for d in os.listdir(table) if d.startswith("v"))
    print(f"ingested {n_rows} events -> {len(versions)} published version(s)")

    # 3. compact the live snapshot clustered by user_id
    snap_dir = os.path.join(table, versions[-1])
    n_files = compact_parquet(
        spark, snap_dir, target_file_bytes=4 * 1024 * 1024,
        sort_cols=["user_id"],
    )
    print(f"compacted snapshot to {n_files} range-clustered file(s)")

    # 4. analyze latest state: distribution of users by their last action
    snap = current_snapshot(spark, table)
    profile = (
        snap.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.avg("value").alias("avg_last_value"),
        )
        .orderBy(F.desc("n_users"))
    )
    profile.show(truncate=False)
    assert snap.count() == snap.select("user_id").distinct().count()
    shutil.rmtree(work, ignore_errors=True)
    print("ok")


if __name__ == "__main__":
    main()
