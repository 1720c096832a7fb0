"""Holt linear-trend smoothing as LITERAL weights.

Holt's double exponential smoothing is a per-step recursion
(l_t = a·y_t + (1-a)(l_{t-1}+b_{t-1});  b_t = g(l_t-l_{t-1}) + (1-g)b_{t-1})
— sequential state that neither engine can fold order-independently.  But
the recursion is LINEAR in the observations, so for a fixed series length
T the final (level, trend) are fixed weighted sums Σ w_k·y_k.  This module
runs the recursion once per T over unit impulses (pure Python, at import)
and publishes the weights as integer literals scaled 1e9 — the same
literal-map discipline as the pt-BR month names and NDCG_WEIGHTS: each
engine computes Σ y_cents·w_int in EXACT int64 (order-free), then one
final division.  Initialization (standard): l_1 = y_1, b_1 = y_2 - y_1
(T >= 2; T == 1 forecasts the lone observation with zero trend).

Weight magnitude: |w| <= ~2 for the classic 0 < a,g < 1 regime, so terms
are y_cents·2e9 — int64-safe for daily sums up to ~4e9 cents ($40 M/day
per series), far beyond the fixtures and gated loudly by ANSI mode past
that.
"""

from __future__ import annotations

ALPHA = 0.5
GAMMA = 0.3

#: Longest trailing window the forecast consumes.
MAX_T = 16

#: Weight scale: integer weights are round(w * 1e9).
WEIGHT_SCALE = 10**9


def _holt_weights(T: int) -> list[tuple[int, int]]:
    """(level, trend) weight per observation index 0..T-1 (0 = oldest),
    computed by running the recursion on unit impulses."""
    out = []
    for i in range(T):
        y = [0.0] * T
        y[i] = 1.0
        if T == 1:
            out.append((1.0, 0.0))
            continue
        l, b = y[0], y[1] - y[0]
        for t in range(1, T):
            l_new = ALPHA * y[t] + (1 - ALPHA) * (l + b)
            b = GAMMA * (l_new - l) + (1 - GAMMA) * b
            l = l_new
        out.append((l, b))
    return [
        (
            int(round(lw * WEIGHT_SCALE)),
            int(round(bw * WEIGHT_SCALE)),
        )
        for lw, bw in out
    ]


#: {(T, p): (w_level_int, w_trend_int)} for T in 1..MAX_T, p in 1..T where
#: p is the 1-based position from the END of the series (p=1 is the most
#: recent observation — matching a row_number() DESC rank).
HOLT_WEIGHTS: dict[tuple[int, int], tuple[int, int]] = {}
for _T in range(1, MAX_T + 1):
    _w = _holt_weights(_T)
    for _i, (_wl, _wb) in enumerate(_w):
        HOLT_WEIGHTS[(_T, _T - _i)] = (_wl, _wb)


def holt_weight_rows() -> list[tuple[int, int, int, int]]:
    """(T, p, w_level_int, w_trend_int) literal rows for both engines."""
    return [
        (T, p, wl, wb) for (T, p), (wl, wb) in sorted(HOLT_WEIGHTS.items())
    ]


def holt_weights_values_sql() -> str:
    """DuckDB VALUES literal of :func:`holt_weight_rows`."""
    rows = ", ".join(
        f"({T}, {p}, {wl}, {wb})" for T, p, wl, wb in holt_weight_rows()
    )
    return f"(VALUES {rows}) hw(t_len, p, wl, wb)"
