"""Differential tests against DuckDB — the same comparison the driver's t2
harness performs (row count + column set + order-insensitive value hash),
at sf0.001 for speed.  ``check_parity.py`` runs the identical logic
standalone at any sf."""

from __future__ import annotations

import duckdb
import pytest

from check_parity import frame_fingerprint
from java_etl_bi_generator_spark.catalog import TABLES
from java_etl_bi_generator_spark.oracles import ORACLES
from java_etl_bi_generator_spark.queries import registry

from .conftest import SF_DIR

# Rows-only queries (no oracle): builtin sketches only — each
# inherently engine-specific.  (Streaming and LSH gained oracles in
# round 4; the IVF/k-means family in round 5 via integer-pinned
# training; the rolling HLL in round 6 via the from-scratch register
# sketch.)
ROWS_ONLY = {
    "q_approx_count_distinct",
    "q_approx_percentile",
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


# Smoke/slow split (VERDICT r11 item 2): the full 489-query sweep is
# ~20-25 min of the 56-minute suite that outgrew the driver's verify
# window.  The default (smoke) run keeps every HEADLINE-benched query
# plus a deterministic md5-keyed ~1-in-10 sample of the rest (~150
# tests); the remainder carry the `slow` marker and still run in the
# round-close full suite (`pytest -m ""`).  The sample is keyed on the
# query name, not round state, so the driver exercises the identical
# subset every round.
import hashlib as _hashlib

from bench import HEADLINE as _HEADLINE

_SMOKE = set(_HEADLINE) | {
    n
    for n in ORACLES
    if int(_hashlib.md5(n.encode()).hexdigest(), 16) % 10 == 0
}
_PARAMS = [
    n if n in _SMOKE else pytest.param(n, marks=pytest.mark.slow)
    for n in sorted(ORACLES)
]


@pytest.mark.parametrize("name", _PARAMS)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    fn = registry()[name]
    df = fn(spark, sf_dir)
    sp = frame_fingerprint(df.columns, [tuple(r) for r in df.collect()])
    rel = duck.execute(ORACLES[name])
    du = frame_fingerprint(
        [d[0] for d in rel.description], rel.fetchall()
    )
    assert sp == du, f"{name}: spark {sp} != duckdb {du}"


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_queries_produce_rows(name, spark, sf_dir):
    df = registry()[name](spark, sf_dir)
    assert df.count() > 0
