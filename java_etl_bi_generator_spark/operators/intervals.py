"""Interval coalescing — merge each key's overlapping-or-adjacent
[start, end] integer intervals into maximal spans (gaps-and-islands).

The coverage/uptime primitive: per key, ordered by start, an island opens
where a start exceeds the running max of preceding ends by more than the
adjacency gap; the island id is the running count of opens; one groupBy
collapses to span grain.  Key-partitioned windows are already parallel;
each key's interval count is its own history (bounded per entity), the
same contract as sessionization.  Pure integer arithmetic, so the output
is bit-identical to a SQL-window oracle.

Shared by ``q_interval_merge`` and the hypothesis property test — one
implementation, no drift between the query and its invariants.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def coalesce_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    adjacency: int = 1,
) -> DataFrame:
    """Maximal merged spans per key: rows within ``adjacency`` of the
    running max end fuse into one island.  Returns one row per span with
    ``span_start``/``span_end``/``n_intervals`` plus the key columns and
    a 1-based ``island`` ordinal per key."""
    wp = (
        Window.partitionBy(*key_cols)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(end_col).over(wp)
    marked = df.withColumn(
        "__new_island",
        F.when(prev_max.isNull(), 1)
        .when(F.col(start_col) > prev_max + adjacency, 1)
        .otherwise(0),
    )
    wi = (
        Window.partitionBy(*key_cols)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marked.withColumn("__island", F.sum("__new_island").over(wi))
        .groupBy(*key_cols, "__island")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .select(
            *key_cols,
            F.col("__island").cast("bigint").alias("island"),
            "span_start",
            "span_end",
            "n_intervals",
        )
    )
