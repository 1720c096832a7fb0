"""Shared literals for deterministic resampling operators.

The Poisson bootstrap (Kleiner et al.'s scale-native bootstrap; also the
production form at web-scale analytics shops) replaces sample-with-
replacement — which needs a global ordering — with an independent
Poisson(1) multiplicity per (row, replicate), computable from a pure
hash with NO coordination.  Both the Spark query and the DuckDB oracle
import THIS table so the inverse-CDF thresholds are bit-identical by
construction (same accumulation code, same floats).
"""

from __future__ import annotations

import math


def poisson1_cdf(kmax: int = 8) -> list[float]:
    """Cumulative Poisson(1) probabilities [P(X<=0), ..., P(X<=kmax)].

    A 32-bit uniform u maps to multiplicity k = #(thresholds < u); the
    tail mass beyond kmax (≈1.1e-6 at 8) maps to kmax+1 — bias far below
    the bootstrap's own Monte-Carlo noise, and identical in both engines
    either way.
    """
    term = math.exp(-1.0)
    cum = term
    out = [cum]
    for k in range(1, kmax + 1):
        term = term / k
        cum = cum + term
        out.append(cum)
    return out


#: 2^32 as a float divisor: an 8-hex-nibble hash prefix over this is a
#: uniform in [0, 1) with 32 bits of resolution.
U32_DIVISOR = 4294967296.0


def poisson1_hex_thresholds(kmax: int = 8) -> list[str]:
    """The inverse CDF as 8-hex-char STRING thresholds: u < cdf[k] on
    the exact 32-bit uniform u = u32/2^32 is equivalent to
    u32 <= floor(cdf[k]·2^32) (the scale by 2^32 is exact in IEEE, and
    cdf[k]·2^32 is never an integer), and fixed-width lowercase hex
    compares lexicographically in numeric order — so the multiplicity
    needs NO radix conversion at all, just string compares on the raw
    digest slice (measured: Spark's conv() was 95% of the bootstrap's
    per-row cost; DuckDB's nibble-sum arithmetic similarly).  Bit-for-
    bit the same multiplicities as the arithmetic form.
    """
    return [
        format(math.floor(c * U32_DIVISOR), "08x")
        for c in poisson1_cdf(kmax)
    ]


def dyadic_decay_weights(kmax: int = 40) -> list[tuple[int, int]]:
    """[(age_bucket k, integer weight 2^(kmax-k))] for an EXACT
    half-life decay: score·2^kmax = Σ value·2^(kmax−k) is pure integer
    arithmetic (order-independent, engine-identical), and the final
    rescale divides by the exactly-representable double 2^kmax.  Ages
    beyond kmax are truncated — their weight is < 2^−kmax of a unit,
    the same declared-truncation contract as the FIR exp_smoothing.
    """
    return [(k, 1 << (kmax - k)) for k in range(kmax + 1)]


#: 2^40 as an exactly-representable double divisor.
DYADIC_KMAX_DIVISOR = 1099511627776.0
