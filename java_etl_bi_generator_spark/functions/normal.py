"""Two-sided normal p-values as a LITERAL table.

The normal CDF needs ``erf``, whose libm implementations differ between
the JVM and DuckDB in the last ulp (and DuckDB SQL has no erf at all) —
so, like the Holt weights and the pt-BR month names, the function is
evaluated ONCE in Python at import over a quantized grid and published
as integer literals both engines consume verbatim: z is quantized to the
0.01 grid (identically in both engines — same plain-arithmetic floor
expression on identically-computed doubles), and p = 2·(1−Φ(z)) =
erfc(z/√2) is looked up as an exact scaled-1e9 integer.  Grid range
0.00..5.99; z beyond 5.99 clamps to the last cell (p ≈ 2e-9 — below any
sane decision threshold)."""

from __future__ import annotations

import math

#: Number of 0.01-wide |z| cells: 0.00 .. 5.99.
Z_CELLS = 600

#: p-values scaled by 1e9.
P_SCALE = 10**9


def _p_two_sided(z: float) -> int:
    return int(round(math.erfc(z / math.sqrt(2.0)) * P_SCALE))


#: zq (|z|·100, clamped) -> two-sided p scaled 1e9.
P_E9_TABLE: list[int] = [_p_two_sided(zq / 100.0) for zq in range(Z_CELLS)]


def p_table_rows() -> list[tuple[int, int]]:
    """(zq, p_e9) literal rows for both engines."""
    return list(enumerate(P_E9_TABLE))


def p_table_values_sql() -> str:
    """DuckDB VALUES literal of :func:`p_table_rows`."""
    rows = ", ".join(f"({zq}, {p})" for zq, p in p_table_rows())
    return f"(VALUES {rows}) pt(zq, p_e9)"


def gaussian_kernel_rows(sigma_buckets: int = 5, half_width: int = 15) -> list[tuple[int, int]]:
    """(offset, weight_e9) literal rows of a discrete Gaussian kernel —
    exp has the same libm-divergence problem as erf, so kernel weights
    are evaluated once here and shipped as integer literals to both
    engines (the KDE query's convolution is then exact int64)."""
    return [
        (o, int(round(math.exp(-(o * o) / (2.0 * sigma_buckets**2)) * P_SCALE)))
        for o in range(-half_width, half_width + 1)
    ]


def gaussian_kernel_values_sql(sigma_buckets: int = 5, half_width: int = 15) -> str:
    rows = ", ".join(
        f"({o}, {w})" for o, w in gaussian_kernel_rows(sigma_buckets, half_width)
    )
    return f"(VALUES {rows}) kk(o, w)"
