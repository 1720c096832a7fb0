"""Plan introspection: `.explain("formatted")` as a string plus small
predicates over it.

At 100 TB the physical plan IS the performance model — these helpers let
tests assert the properties that matter (column pruning via ReadSchema,
predicate pushdown via PushedFilters, broadcast-vs-shuffle join choice,
TakeOrderedAndProject for top-k) instead of eyeballing explain output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode_name: str) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return qe.explainString(mode.fromString(mode_name))


def explain_formatted(df: DataFrame) -> str:
    return _explain(df, "formatted")


def explain_simple(df: DataFrame) -> str:
    """One line per physical node; ``*(n)`` marks whole-stage-codegen spans."""
    return _explain(df, "simple")


def plan_contains(df: DataFrame, *needles: str) -> bool:
    plan = explain_formatted(df)
    return all(n in plan for n in needles)


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan in the plan (checks column pruning)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", explain_formatted(df))
