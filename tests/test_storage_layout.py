"""Storage-layout tests: partition pruning and bucketed joins actually
change the physical plan (the 100 TB levers in SCALING.md)."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

from java_etl_bi_generator_spark.catalog import load_table
from java_etl_bi_generator_spark.plans import explain_formatted, explain_simple
from java_etl_bi_generator_spark.sources.parquet_sink import (
    read_partitioned,
    write_bucketed,
    write_partitioned,
)


def test_partitioned_write_enables_pruning(spark, sf_dir):
    od = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = tempfile.mkdtemp(prefix="part_write_") + "/orders_by_year"
    write_partitioned(od, out, ["order_year"])

    back = read_partitioned(spark, out).filter(F.col("order_year") == 1997)
    plan = explain_formatted(back)
    # attribute ids are appended (order_year#NN) — match the prefix
    assert "PartitionFilters: [isnotnull(order_year" in plan
    assert "= 1997)" in plan
    # pruned scan still returns exactly the 1997 rows
    want = od.filter(F.col("order_year") == 1997).count()
    assert back.count() == want


def test_dynamic_partition_pruning(spark, sf_dir):
    # A dimension-side filter must prune fact partitions at RUNTIME (the
    # join key is the partition column): the scan's PartitionFilters gains
    # a dynamicpruning subquery.  At 100 TB this is the difference between
    # scanning one year and scanning the decade.
    od = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = tempfile.mkdtemp(prefix="dpp_write_") + "/orders_by_year"
    write_partitioned(od, out, ["order_year"])

    fact = read_partitioned(spark, out)
    dim = spark.createDataFrame(
        [(y, "keep" if y == 1997 else "drop") for y in range(1992, 1999)],
        "dim_year int, tag string",
    )
    joined = fact.join(
        F.broadcast(dim.filter(F.col("tag") == "keep")),
        fact.order_year == F.col("dim_year"),
    )
    plan = explain_formatted(joined)
    assert "dynamicpruning" in plan
    want = od.filter(F.col("order_year") == 1997).count()
    assert joined.count() == want


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    write_bucketed(cu, "cust_b", "c_custkey", 8)
    write_bucketed(
        od.withColumn("o_custkey_b", F.col("o_custkey")), "ord_b", "o_custkey_b", 8
    )
    try:
        joined = (
            spark.table("cust_b")
            .join(
                spark.table("ord_b"),
                F.col("c_custkey") == F.col("o_custkey_b"),
            )
            .select("c_custkey", "o_orderkey")
        )
        # disable broadcast so the join must co-locate: bucketing means no
        # exchange on either side
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = explain_simple(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS cust_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
