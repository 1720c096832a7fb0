"""Cross-engine-stable rounding.

Spark's ``round`` rounds the *shortest decimal rendering* of a double
(java.math.BigDecimal HALF_UP), while DuckDB's ``round`` works on the
binary value — they disagree on ties like 10.015.  For differential
testing (and any reproducible pipeline output), rounding is expressed as
plain IEEE arithmetic that every engine evaluates identically:

    pround(x, n) = floor(x * 10^n + 0.5) / 10^n

The matching SQL text for an oracle is produced by ``pround_sql``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def pround(c: Column, ndigits: int = 2) -> Column:
    scale = float(10**ndigits)
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def pround_sql(expr: str, ndigits: int = 2) -> str:
    scale = 10**ndigits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def dsum(c: Column, scale: int = 2) -> Column:
    """Exact sum of fixed-decimal values: cast to DECIMAL, sum in integer
    arithmetic (order-independent — float summation order varies with
    partitioning and differs between engines), cast back to double.

    ``pround`` pins a float sum only while both engines feed it the *same*
    double; a parallel sum does not guarantee that, and a group whose sum
    lands near a rounding boundary then hashes differently (observed in
    practice).  Decimal aggregation removes the problem at the source, and
    is what a production pipeline should do with money anyway.
    Requires inputs that are true fixed-decimal quantities at ``scale``.
    """
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"
