"""Vector expressions over ``array<float>`` embedding columns (north-star
similarity-search surface; BASELINE.json ``north_star``).

Implemented with ``zip_with`` + ``aggregate`` higher-order functions:
JVM-side, sequential left-to-right summation (bit-reproducible and
matching DuckDB's ``list_dot_product`` fold order), no UDF, no shuffle.
Cast to ``array<double>`` first so accumulation happens in double.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_double_array(c: Column | str) -> Column:
    return _col(c).cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    a, b = as_double_array(a), as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
