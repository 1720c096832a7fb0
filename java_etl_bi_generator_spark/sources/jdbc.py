"""JDBC source passthrough (BASELINE.json ``spark_approach``: "Spark SQL +
DataFrame transformations over JDBC sources").

Thin wrapper over ``spark.read.jdbc`` that insists on a partitioned read:
a single-connection JDBC scan is the classic accidental bottleneck — with
``partitionColumn/lowerBound/upperBound/numPartitions`` Spark issues range
predicates per partition and the pull parallelizes across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    **options: str,
) -> DataFrame:
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .options(**options)
        .load()
    )
