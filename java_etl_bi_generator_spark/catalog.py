"""Table catalog over a directory of parquet files (the driver testdata
layout: ``{sf_dir}/{table}.parquet``).

Scale note: each ``load_table`` is a plain parquet scan — Catalyst pushes
filters and prunes columns into the scan, so callers should express
everything declaratively and never pre-``collect``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS,false), which Spark
    cannot map to a native type; with ``nanosAsLong`` it arrives as bigint
    nanoseconds and is converted here to a microsecond TIMESTAMP (``ts``)
    — pure integer division, no precision surprises, tz-independent.
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for ``spark.sql`` use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
