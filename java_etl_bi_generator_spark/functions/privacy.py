"""Differential-privacy mechanism primitives, engine-exact.

The two-sided (discrete) geometric mechanism [Ghosh-Roughgarden-
Sundararajan 2009] adds integer noise K with P(K=k) ∝ α^|k|,
α = exp(-ε/Δ) — the discrete analogue of Laplace, and the natural DP
mechanism for COUNT releases because output stays integer.  Sampling
uses the ``poisson1_hex_thresholds`` discipline (functions/resample.py):
the inverse CDF becomes fixed-width lowercase-hex thresholds compared
lexicographically against an 8-hex-char md5 slice — no floats at query
time, bit-identical on any engine.

Truncation: |K| ≤ kmax, with the pmf renormalized over the truncated
support — the standard bounded-noise variant (the tail mass beyond
kmax=16 at ε=0.5 is ~2e-4; truncated geometric satisfies a slightly
relaxed (ε, δ)-guarantee with δ = the clipped tail mass, documented at
the query).  Determinism caveat, stated loudly: a DETERMINISTIC
per-release noise draw (seeded by the release key) is what makes the
query hash-checkable cross-engine and idempotent per release window —
re-running the same release must NOT spend privacy budget twice.
Releasing multiple DIFFERENT statistics must vary the salt.

SECRECY caveat, equally loud: the (ε, δ)-guarantee only holds if the
per-release seed/salt is SECRET.  The queries in this repo use a
public hardcoded salt so the DuckDB oracle can recompute the identical
noise for cross-engine benchmarking — anyone who knows that salt can
subtract the noise and recover exact true counts, i.e. the in-repo
release provides zero actual privacy by construction.  A production
release must draw its salt from a secret per-release key (e.g. an HSM
/ KMS secret scoped to the release window) and must never publish the
calibration columns (true_count / noise).
"""

from __future__ import annotations

import math

U32 = 2**32


def twosided_geometric_hex_thresholds(
    eps: float = 0.5, kmax: int = 16
) -> list[tuple[int, str]]:
    """[(k, hex threshold)] for k = -kmax..kmax: draw u32 from an md5
    slice, the noise is the FIRST k whose threshold (8 lowercase hex
    chars, lexicographic == numeric) is >= the slice.  The last
    threshold is pinned to 'ffffffff' so every u32 maps to some k."""
    alpha = math.exp(-eps)
    weights = [alpha ** abs(k) for k in range(-kmax, kmax + 1)]
    total = sum(weights)
    out: list[tuple[int, str]] = []
    acc = 0.0
    for k, w in zip(range(-kmax, kmax + 1), weights):
        acc += w / total
        t = min(math.floor(acc * U32), U32 - 1)
        out.append((k, format(t, "08x")))
    out[-1] = (kmax, "ffffffff")
    return out
