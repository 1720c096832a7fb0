"""As-of join — for each left row, the most recent right row at or before
its timestamp, per key.  Spark has no built-in as-of join (cf. pandas
``merge_asof``, DuckDB ``ASOF JOIN``); this implements it as a composition
of built-in operators via the union + window trick:

1. tag left and right rows and union them into one stream;
2. per key, ordered by (ts, side), carry the latest-seen right payload
   forward with ``last_value(..., ignoreNulls)``;
3. keep the left rows — each now holds the as-of matched right payload.

Cost: one shuffle on the key + one in-partition sort — the same shape as a
sort-merge join, linear in |L|+|R|, no pairwise expansion.  This is the
scalable layout for 100 TB backfills (point-in-time feature joins).

Right-side rows must be unique per (key, ts) — pre-aggregate to enforce a
deterministic winner before calling.  Right-side VALUES may be null: the
carried unit is one STRUCT per right row (non-null iff the row is a right
row), so a null value rides along with its own row's timestamp instead of
the ignorenulls carry skipping back to an older row's value.

Three directions share the tag/union scaffold (``_tag_union``):
``asof_join`` (backward, <=), ``asof_join_forward`` (>=), and
``asof_join_nearest`` (closest either way, exact-microsecond distances,
backward preferred on ties).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _tag_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_value_cols: list[str],
    out_cols: list[str],
) -> DataFrame:
    """Union left and right into one tagged stream: left rows carry their
    own payload plus null placeholders for the right value columns
    (aliased ``out_cols``) and the matched-right-timestamp slot ``__rts``;
    right rows the reverse.  ``__is_left`` distinguishes the sides for
    the window tie-breaks downstream."""
    left_cols = left.columns
    l_tagged = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols if c not in (on, ts_col)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(o)
          for c, o in zip(right_value_cols, out_cols)],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__rts"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in (on, ts_col)],
        *[F.col(c).alias(o) for c, o in zip(right_value_cols, out_cols)],
        F.col(ts_col).alias("__rts"),
    )
    return l_tagged.unionByName(r_tagged)


def _pack(out_cols: list[str]) -> Column:
    """One atomic carry unit per RIGHT row: a struct of the row's value
    columns plus its timestamp, null on left rows.  Carrying the struct
    (not each column separately) through the ignorenulls window keeps a
    null right VALUE paired with its own row — separate per-column
    carries would skip a null back to an older row's value."""
    return F.when(
        F.col("__is_left") == 0,
        F.struct(*[F.col(o) for o in out_cols], F.col("__rts")),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right values with ``right.ts <= left.ts``.

    Returns all left columns plus ``<col><suffix>`` for each right value
    column (null when no right row precedes the left row).
    """
    left_cols = left.columns
    out_cols = [f"{c}{suffix}" for c in right_value_cols]
    unioned = _tag_union(left, right, on, ts_col, right_value_cols, out_cols)

    # Right rows sort before left rows at equal ts (__is_left 0 < 1), so a
    # right row AT the left row's timestamp is matched (<= semantics).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_pack(out_cols), ignorenulls=True).over(w)
    filled = unioned.select(
        *[F.col(c) for c in left_cols],
        F.col("__is_left"),
        *[carried[o].alias(o) for o in out_cols],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Forward as-of join: EARLIEST right values with ``right.ts >=
    left.ts`` — the "next event after" direction (next maintenance slot,
    next price tick) the backward join can't express.  Same union +
    window layout; the frame looks forward and the tie-break flips so a
    right row AT the left row's timestamp still matches (>= semantics:
    left rows sort before right rows at equal ts, putting the same-ts
    right row inside the following frame)."""
    left_cols = left.columns
    out_cols = [f"{c}{suffix}" for c in right_value_cols]
    unioned = _tag_union(left, right, on, ts_col, right_value_cols, out_cols)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = F.first(_pack(out_cols), ignorenulls=True).over(w)
    filled = unioned.select(
        *[F.col(c) for c in left_cols],
        F.col("__is_left"),
        *[carried[o].alias(o) for o in out_cols],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Nearest as-of join: for each left row, the right row with the
    smallest |right.ts − left.ts| per key; equal distance prefers the
    BACKWARD match (deterministic).  One shuffle on the key, two
    in-partition window passes (backward carry + forward carry) over the
    same union — still linear, no pairwise expansion.  Adds
    ``<ts_col><suffix>`` (the matched right timestamp) alongside the
    value columns so callers can audit the chosen direction; ``suffix``
    must therefore be non-empty (an empty suffix would collide the audit
    column with ``ts_col`` itself).  Distances compare in exact
    MICROSECONDS (``unix_micros``), not whole seconds — sub-second
    timestamps would otherwise truncate toward the wrong neighbor."""
    if not suffix:
        raise ValueError(
            "asof_join_nearest needs a non-empty suffix: the matched-"
            f"timestamp audit column would collide with {ts_col!r}"
        )
    left_cols = left.columns
    out_cols = [f"{c}{suffix}" for c in right_value_cols]
    rts = f"{ts_col}{suffix}"
    unioned = _tag_union(left, right, on, ts_col, right_value_cols, out_cols)
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    both = unioned.select(
        *[F.col(c) for c in left_cols],
        F.col("__is_left"),
        F.last(_pack(out_cols), ignorenulls=True).over(wb).alias("__b"),
        F.first(_pack(out_cols), ignorenulls=True).over(wf).alias("__f"),
    ).filter(F.col("__is_left") == 1)
    # backward wins when forward is missing, or when its distance is <=
    # (exact integer microseconds on both sides)
    b_ts = F.col("__b")["__rts"]
    f_ts = F.col("__f")["__rts"]
    back_wins = F.col("__f").isNull() | (
        F.col("__b").isNotNull()
        & (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(b_ts)
            <= F.unix_micros(f_ts) - F.unix_micros(F.col(ts_col))
        )
    )
    chosen = F.when(back_wins, F.col("__b")).otherwise(F.col("__f"))
    return both.select(
        *[F.col(c) for c in left_cols],
        *[chosen[o].alias(o) for o in out_cols],
        chosen["__rts"].alias(rts),
    )
