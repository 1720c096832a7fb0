"""Skew mitigation for joins and aggregations.

AQE's skew-join splitting (on by default in session.py) handles most skew
at runtime; explicit salting remains the tool when (a) AQE cannot split
(e.g. a skewed *aggregation* key rather than a join), or (b) the skew is
known in advance and you want a deterministic plan.

``salted_join``: replicate the small side R times, add a random salt
0..R-1 to the big side, join on (key, salt) — hot keys fan out over R
partitions instead of one.

``two_phase_agg``: aggregate on (key, salt) first (spreads a hot group
over R reducers), then re-aggregate by key.  Works for any associative
aggregate; this is the classic two-stage combiner for power-law keys
(word counts, user activity).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``salt_buckets`` times.  Use when one join key dominates and the small
    side is too large to broadcast outright."""
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return salted_big.join(
        replicated_small, on=[on, "__salt"], how=how
    ).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation: ``agg_exprs`` maps output column ->
    one of sum/count/min/max (associative re-aggregable functions)."""
    partial_exprs, final_exprs = [], []
    for out, fn in agg_exprs.items():
        src = F.expr(f"{fn}({out})") if fn != "count" else F.count(F.lit(1))
        partial_exprs.append(src.alias(f"__p_{out}"))
        refn = "sum" if fn == "count" else fn
        final_exprs.append(F.expr(f"{refn}(__p_{out})").alias(out))
    partial = (
        df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
        .groupBy(key, "__salt")
        .agg(*partial_exprs)
    )
    return partial.groupBy(key).agg(*final_exprs)
