"""Geospatial primitives in cross-engine-exact arithmetic.

The reference engine has no geo module; this family extends the engine
with the spatial operators a 100 TB event/location pipeline needs (cell
aggregation, radius joins, geohash bucketing, trajectory stats) while
keeping every value differential-testable against DuckDB:

- **Coordinates are integers.** Points live on a 1e-4-degree grid
  (``lat_units`` / ``lon_units`` BIGINT).  Distances are computed as
  integer squared sums; the only float ops are ``sqrt`` (correctly
  rounded by IEEE-754, so bit-identical across engines) and divisions
  by constants (single IEEE ops, identically rounded) — never trig,
  whose libm implementations differ between JVM and DuckDB in the last
  ulp.  Haversine/geodesic distance is an app-layer concern; at city
  scale the planar approximation these operators use is the standard
  first stage of any spatial join anyway (coarse cell filter → fine
  re-check).
- **One SQL text, two engines.**  The geohash interleave below is
  GENERATED as a plain-arithmetic SQL string (powers-of-two divisions
  and ``% 2`` — exact in both engines) and evaluated verbatim by Spark
  (``F.expr``) and DuckDB, so the 25-bit interleave cannot drift
  between the query and its oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: Points-per-degree of the integer coordinate grid.
UNITS_PER_DEG = 10_000

#: Geohash precision-5 bit widths (odd chars: lon leads): 13 lon + 12 lat.
GEOHASH_LON_BITS = 13
GEOHASH_LAT_BITS = 12

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def hash_units(key: Column, salt: str, mod: int) -> Column:
    """Deterministic pseudo-coordinate in ``[0, mod)`` from the first 8
    hex chars of ``md5(key || ':' || salt)`` — the repo's portable hash
    idiom (Spark ``conv`` ↔ oracle ``_hex_bigint``), widened to 8
    nibbles so the modulo bias at 1e5-1e6 grains is negligible."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", key.cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return h % F.lit(mod)


def hash_units_sql(key_expr: str, salt: str, mod: int, hex_bigint) -> str:
    """Oracle twin of :func:`hash_units`; ``hex_bigint`` is the
    oracles-module helper (md5 hex window → BIGINT)."""
    md5 = f"md5(CAST({key_expr} AS VARCHAR) || ':{salt}')"
    return f"({hex_bigint(md5, 1, 8)} % {mod})"


def geohash5_quant_sql(lat_units_expr: str, lon_units_expr: str) -> tuple[str, str]:
    """SQL for the precision-5 geohash quantizers over FULL-GLOBE integer
    coordinates (``lat_units`` in [0, 180e4) ≙ [-90°, 90°);
    ``lon_units`` in [0, 360e4) ≙ [-180°, 180°)):

        lat_q = floor(lat_units · 2^12 / 180e4)   (12 bits)
        lon_q = floor(lon_units · 2^13 / 360e4)   (13 bits)

    The products stay ≤ 2.95e10 — exact in a double — and the single
    constant division rounds identically in both engines, so the floor
    is cross-engine stable."""
    lat_q = (
        f"CAST(floor(({lat_units_expr}) * {1 << GEOHASH_LAT_BITS}.0 "
        f"/ {180 * UNITS_PER_DEG}.0) AS BIGINT)"
    )
    lon_q = (
        f"CAST(floor(({lon_units_expr}) * {1 << GEOHASH_LON_BITS}.0 "
        f"/ {360 * UNITS_PER_DEG}.0) AS BIGINT)"
    )
    return lat_q, lon_q


def geohash5_code_sql(lat_q_col: str, lon_q_col: str) -> str:
    """One generated SQL expression for the 25-bit geohash interleave
    (classic even-bit-is-longitude layout, MSB first), valid verbatim in
    Spark SQL and DuckDB: each bit is extracted with an EXACT
    power-of-two division (operands < 2^13, representable; /2^k exact;
    floor exact) — no engine-specific bit operators."""
    terms = []
    for i in range(GEOHASH_LON_BITS + GEOHASH_LAT_BITS):  # i=0 is the MSB
        if i % 2 == 0:  # longitude bit
            j = GEOHASH_LON_BITS - 1 - i // 2
            src = lon_q_col
        else:  # latitude bit
            j = GEOHASH_LAT_BITS - 1 - (i - 1) // 2
            src = lat_q_col
        weight = 1 << (24 - i)
        bit = f"(CAST(floor(({src}) / {1 << j}.0) AS BIGINT) % 2)"
        terms.append(f"{bit} * {weight}" if weight > 1 else bit)
    return "(" + " + ".join(terms) + ")"


def geohash5_chars_sql(code_col: str) -> str:
    """Base32 rendering of the 25-bit code: five 5-bit groups, MSB
    first, each indexed into the geohash alphabet (substr is 1-based in
    both engines)."""
    parts = []
    for g in range(5):  # g=0 is the leading char
        shift = 1 << (5 * (4 - g))
        idx = f"(CAST(floor(({code_col}) / {shift}.0) AS BIGINT) % 32)"
        parts.append(f"substr('{_BASE32}', CAST({idx} AS INT) + 1, 1)")
    return "(" + " || ".join(parts) + ")"
