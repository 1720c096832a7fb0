"""sources.jdbc — live partitioned-read round-trip against embedded Derby
(bundled with Spark's jars), plus the options contract.

BASELINE.json names "Spark SQL + DataFrame transformations over JDBC
sources" as the approach; this exercises the real reader path: write a
table over JDBC, read it back through read_jdbc_partitioned, and assert
both the values and the parallelism contract (numPartitions range splits)."""

from __future__ import annotations

import pyspark.sql.functions as F

from java_etl_bi_generator_spark.sources.jdbc import read_jdbc_partitioned

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/jdbc_smoke;create=true"


def test_jdbc_partitioned_round_trip(spark, tmp_path):
    url = _derby_url(tmp_path)
    src = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 13).alias("v"),
    )
    src.write.format("jdbc").option("url", url).option(
        "dbtable", "t_smoke"
    ).option("driver", DRIVER).mode("overwrite").save()

    got = read_jdbc_partitioned(
        spark,
        url,
        "t_smoke",
        partition_column="k",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
        driver=DRIVER,
    )
    # the parallelism contract: numPartitions range splits, not one scan
    assert got.rdd.getNumPartitions() == 4
    rows = {r["k"]: r["v"] for r in got.collect()}
    assert rows == {i: i * 7 % 13 for i in range(100)}


def test_jdbc_predicate_pushdown_reaches_source(spark, tmp_path):
    """A filter on the partition column must reach the JDBC scan as a
    pushed predicate (the plan's scan node carries PushedFilters), not be
    evaluated Spark-side over a full-table pull."""
    url = _derby_url(tmp_path)
    spark.range(50).select(F.col("id").alias("k")).write.format(
        "jdbc"
    ).option("url", url).option("dbtable", "t_push").option(
        "driver", DRIVER
    ).mode("overwrite").save()

    df = read_jdbc_partitioned(
        spark, url, "t_push", "k", 0, 50, num_partitions=3, driver=DRIVER
    ).filter(F.col("k") >= 40)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "40" in plan, plan
    assert df.count() == 10
