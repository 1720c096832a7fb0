"""Ranking-evaluation constants shared by the engine and its oracles.

The nDCG discount weights 1/log2(r+1) are computed ONCE here (Python's
``math.log2``) and consumed as repr-exact double literals by BOTH the
Spark Column expressions and the DuckDB oracle SQL — neither engine ever
evaluates a logarithm, so there is no libm last-ulp divergence to pin.
``repr`` of a Python float round-trips exactly, and both Spark's literal
parser and DuckDB's resolve it to the identical IEEE double.
"""

from __future__ import annotations

import math

# 1-indexed rank r = 1..10 -> weight 1/log2(r+1)
NDCG_WEIGHTS: list[float] = [1.0 / math.log2(r + 1) for r in range(1, 11)]


def ndcg_weight_sql(k: int) -> str:
    """The rank-k discount as an exact SQL DOUBLE literal.

    The ``e0`` exponent suffix matters: DuckDB types a plain 17-digit
    decimal literal as DECIMAL, whose cast to DOUBLE double-rounds (the
    decimal mantissa exceeds 2^53), landing one ulp off the Python
    double.  An exponent-form literal is typed DOUBLE and parsed with a
    correctly-rounded strtod — bit-identical to ``float(repr(w))``.
    """
    r = repr(NDCG_WEIGHTS[k - 1])
    return r if "e" in r else f"{r}e0"
