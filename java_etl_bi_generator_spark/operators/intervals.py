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


def interval_overlap_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int = 30,
) -> DataFrame:
    """LARGE × LARGE interval-overlap self-join via bucketization — the
    scale path where a theta join (``a.s <= b.e AND b.s <= a.e``) plans
    as a nested loop: each interval explodes to the integer buckets it
    spans, candidate pairs come from an EQUI-join on (key, bucket), and
    the exact overlap predicate then filters candidates.  Two intervals
    overlap iff they share at least one bucket (any common point lies in
    some bucket), so the result is IDENTICAL to the theta join; cost is
    |intervals| × spans/bucket_width explode rows plus bucket-local
    pairs instead of |pairs| comparisons.

    ``bucket_width`` trades explode volume against bucket collision
    rate: ~the typical interval length is the classic choice.  Returns
    (key..., id_a, id_b) pairs with ``id_a < id_b``, each emitted
    EXACTLY once — no quadratic-size ``distinct``: a pair spanning many
    shared buckets is attributed to its CANONICAL bucket (the bucket of
    ``max(a.s, b.s)``, which both intervals cover whenever they
    overlap), so the duplicate emissions are filtered row-locally
    instead of shuffled away.
    """
    b = df.select(
        *key_cols,
        F.col(id_col),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width).cast("bigint"),
                F.floor(F.col(end_col) / bucket_width).cast("bigint"),
            )
        ).alias("__bk"),
    )
    a_side, b_side = b.alias("a"), b.alias("b")
    cond = [F.col("a.__bk") == F.col("b.__bk")]
    for k in key_cols:
        cond.append(F.col(f"a.{k}") == F.col(f"b.{k}"))
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    canonical_bk = F.floor(
        F.greatest(F.col("a.__s"), F.col("b.__s")) / bucket_width
    ).cast("bigint")
    return (
        a_side.join(b_side, on=cond)
        # exact overlap test on the candidates (closed intervals)
        .filter(
            (F.col("a.__s") <= F.col("b.__e"))
            & (F.col("b.__s") <= F.col("a.__e"))
        )
        # emit only in the pair's canonical bucket — exactly-once without
        # a distinct over the (quadratic) pair set
        .filter(F.col("a.__bk") == canonical_bk)
        .select(
            *[F.col(f"a.{k}").alias(k) for k in key_cols],
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
