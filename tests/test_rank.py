"""operators.rank — distributed global rank / cumsum / closed-form NTILE.

Each test pins the two-phase distributed form against the single-partition
``Window.orderBy()`` plan it replaces: identical values, regardless of where
the range-partition boundaries fall.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F
from pyspark.sql import Window

from java_etl_bi_generator_spark.operators.rank import (
    global_cumsum,
    global_rank,
    grouped_lag,
    grouped_topk,
    ntile_from_rank,
)


def _sample(spark, n=997):
    # non-uniform values with ties; id is the unique tie-break
    return spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 37) % 101).alias("v"),
    )


def test_global_rank_matches_window_row_number(spark):
    df = _sample(spark)
    keys = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r["id"]: r["rk"]
        for r in global_rank(df, keys, rank_col="rk").collect()
    }
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*keys))
        ).collect()
    }
    assert got == want


def test_global_rank_total_col(spark):
    df = _sample(spark, n=250)
    out = global_rank(
        df, [F.col("id")], rank_col="rk", total_col="n"
    ).collect()
    assert all(r["n"] == 250 for r in out)
    assert sorted(r["rk"] for r in out) == list(range(1, 251))


def test_ntile_matches_sql_ntile_all_remainders(spark):
    # N mod k sweeps 0..k-1 so both tile-size branches are exercised
    for n in (40, 41, 42, 43):
        df = spark.range(n)
        keys = [F.col("id")]
        ranked = global_rank(df, keys, rank_col="rk", total_col="n")
        got = {
            r["id"]: r["t"]
            for r in ranked.select(
                "id", ntile_from_rank(F.col("rk"), F.col("n"), 4).alias("t")
            ).collect()
        }
        want = {
            r["id"]: r["t"]
            for r in df.withColumn(
                "t", F.ntile(4).over(Window.orderBy(*keys))
            ).collect()
        }
        assert got == want, f"n={n}"


def test_ntile_more_tiles_than_rows(spark):
    df = spark.range(3)
    ranked = global_rank(df, [F.col("id")], rank_col="rk", total_col="n")
    got = sorted(
        r["t"]
        for r in ranked.select(
            ntile_from_rank(F.col("rk"), F.col("n"), 7).alias("t")
        ).collect()
    )
    want = sorted(
        r["t"]
        for r in df.withColumn(
            "t", F.ntile(7).over(Window.orderBy("id"))
        ).collect()
    )
    assert got == want


def test_global_cumsum_matches_window_sum(spark):
    df = _sample(spark).select(
        "id", "v", (F.col("v").cast("decimal(18,2)") / 4).alias("x")
    )
    keys = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r["id"]: (r["c"], r["tot"])
        for r in global_cumsum(
            df, keys, "x", cum_col="c", total_col="tot"
        ).collect()
    }
    w = Window.orderBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = df.withColumn("c", F.sum("x").over(w)).withColumn(
        "tot", F.sum("x").over(Window.partitionBy())
    )
    want = {r["id"]: (r["c"], r["tot"]) for r in ref.collect()}
    assert got == want


def test_grouped_lag_matches_window_lag(spark):
    # 5 low-cardinality groups, interleaved order values
    df = spark.range(1201).select(
        (F.col("id") % 5).alias("g"),
        ((F.col("id") * 53) % 997).alias("t"),
        F.col("id"),
        (F.col("id") * 7).alias("v"),
    )
    got = {
        (r["g"], r["id"]): r["prev"]
        for r in grouped_lag(
            df, ["g"], [F.col("t"), F.col("id")], F.col("v"), lag_col="prev"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("t", "id")
    want = {
        (r["g"], r["id"]): r["prev"]
        for r in df.withColumn("prev", F.lag("v").over(w)).collect()
    }
    assert got == want


def test_grouped_topk_matches_window_rank(spark):
    df = spark.range(900).select(
        (F.col("id") % 3).alias("g"),
        ((F.col("id") * 31) % 797).alias("h"),
        F.col("id"),
    )
    k = 16
    got = {
        (r["g"], r["id"]): r["rn"]
        for r in grouped_topk(
            df, ["g"], [F.col("h"), F.col("id")], k
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("h", "id")
    want = {
        (r["g"], r["id"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .collect()
    }
    assert got == want


@pytest.mark.slow  # 27 s property sweep; round-close suite
def test_grouped_rank_property_random_inputs(spark):
    """Hypothesis sweep: grouped_rank must equal the naive partitioned
    window for arbitrary group/value multisets (ties broken by id)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 2), st.integers(-50, 50)),
            min_size=1,
            max_size=60,
        )
    )
    def check(rows):
        from java_etl_bi_generator_spark.operators.rank import grouped_rank

        df = spark.createDataFrame(
            [(g, v, i) for i, (g, v) in enumerate(rows)], "g int, v int, id int"
        )
        got = {
            r["id"]: r["rk"]
            for r in grouped_rank(
                df, ["g"], [F.col("v").desc(), F.col("id")], rank_col="rk"
            ).collect()
        }
        w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id"))
        want = {
            r["id"]: r["rk"]
            for r in df.withColumn("rk", F.row_number().over(w)).collect()
        }
        assert got == want

    check()


def test_no_single_partition_window_in_plan(spark):
    """The distributed plan's only unpartitioned window runs over the
    partitions-sized offset table, never the input: the input-side window
    must carry the __pid partition key."""
    df = _sample(spark)
    out = global_rank(df, [F.col("v"), F.col("id")], rank_col="rk")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window node either partitions by __pid (input side) or sits
    # downstream of the tiny groupBy(__pid) aggregate (offset side)
    for line in plan.splitlines():
        if "Window [" in line and "__pid" not in line:
            raise AssertionError(f"unexpected windowed node: {line}")


def test_grouped_lag_null_values_mid_stream(spark):
    """A NULL value mid-partition must lag through as NULL — not be
    replaced by the previous partition's boundary carry (the struct-lag
    distinguishes 'no previous row' from 'previous value is NULL')."""
    rows = [
        (i % 3, (i * 53) % 997, i, None if i % 7 == 0 else i * 11)
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "g int, t int, id int, v int")
    got = {
        (r["g"], r["id"]): r["prev"]
        for r in grouped_lag(
            df, ["g"], [F.col("t"), F.col("id")], F.col("v"), lag_col="prev"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("t", "id")
    want = {
        (r["g"], r["id"]): r["prev"]
        for r in df.withColumn("prev", F.lag("v").over(w)).collect()
    }
    assert got == want


def test_grouped_rank_with_payload_columns(spark):
    """Payload columns beyond the (group, order) keys must ride through
    unchanged with correct ranks — the pre-pinned partition id makes the
    offset join immune to per-branch boundary resampling."""
    df = _sample(spark).select(
        "id", "v", (F.col("id") * 997 + 13).alias("payload")
    )
    keys = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r["id"]: (r["rk"], r["payload"])
        for r in global_rank(df, keys, rank_col="rk").collect()
    }
    want = {
        r["id"]: (r["rk"], r["payload"])
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*keys))
        ).collect()
    }
    assert got == want


def test_grouped_cumsum_matches_window_sum(spark):
    from java_etl_bi_generator_spark.operators.rank import grouped_cumsum

    df = spark.range(1201).select(
        (F.col("id") % 5).alias("g"),
        ((F.col("id") * 53) % 997).alias("t"),
        F.col("id"),
        ((F.col("id") * 7) % 100 - 50).alias("v"),  # signed bigints
    )
    keys = [F.col("t").asc(), F.col("id").asc()]
    got = {
        r["id"]: (r["c"], r["tot"])
        for r in grouped_cumsum(
            df, ["g"], keys, "v", cum_col="c", total_col="tot"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = df.withColumn("c", F.sum("v").over(w)).withColumn(
        "tot", F.sum("v").over(Window.partitionBy("g"))
    )
    want = {r["id"]: (r["c"], r["tot"]) for r in ref.collect()}
    assert got == want


def test_grouped_ops_keep_null_group_rows(spark):
    """NULL group values are ordinary window partitions: the null-safe
    offset join must keep (and correctly rank/cumsum) those rows, not
    silently drop them like a plain equi-join would."""
    from java_etl_bi_generator_spark.operators.rank import (
        grouped_cumsum,
        grouped_rank,
    )

    df = spark.range(301).select(
        F.when(F.col("id") % 3 == 0, None)
        .otherwise((F.col("id") % 3).cast("string"))
        .alias("g"),
        ((F.col("id") * 53) % 997).alias("t"),
        F.col("id"),
        (F.col("id") % 7).alias("v"),
    )
    keys = [F.col("t").asc(), F.col("id").asc()]

    got_r = {
        r["id"]: r["rk"]
        for r in grouped_rank(df, ["g"], keys, rank_col="rk").collect()
    }
    want_r = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("g").orderBy(*keys)),
        ).collect()
    }
    assert got_r == want_r and len(got_r) == 301

    got_c = {
        r["id"]: r["c"]
        for r in grouped_cumsum(df, ["g"], keys, "v", cum_col="c").collect()
    }
    want_c = {
        r["id"]: r["c"]
        for r in df.withColumn(
            "c",
            F.sum("v").over(
                Window.partitionBy("g")
                .orderBy(*keys)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ).collect()
    }
    assert got_c == want_c
