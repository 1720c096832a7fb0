"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``java_etl_bi_generator_spark``: ``queries()`` exposes the
declared-query registry (SURVEY.md §2), ``oracle_sql()`` the matching DuckDB
SQL, and ``entry()`` runs the flagship star query on sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from java_etl_bi_generator_spark.oracles import ORACLES  # noqa: E402
from java_etl_bi_generator_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from java_etl_bi_generator_spark.queries import q_star_flagship

    return q_star_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; exactly 2 rows-only queries are
    omitted (q_approx_count_distinct / q_approx_percentile — Spark's
    builtin HLL++/GK sketch internals are engine-specific)."""
    return dict(ORACLES)
