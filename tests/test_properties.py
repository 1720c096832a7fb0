"""Property-based checks (SURVEY.md §5.2(3)) with hypothesis — the quirk
functions must hold over arbitrary inputs, not just the fixture values."""

from __future__ import annotations

import pytest

import datetime

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from java_etl_bi_generator_spark.functions.locale_ptbr import (
    format_ptbr_decimal,
    parse_ptbr_decimal,
)
from java_etl_bi_generator_spark.functions.rounding import pround
from java_etl_bi_generator_spark.operators.star import build_calendar_dim

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from java_etl_bi_generator_spark.session import get_spark

        _spark = get_spark(app_name="props", master="local[4]",
                           shuffle_partitions=4)
    return _spark


@settings(max_examples=30, deadline=None)
@given(
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    )
)
def test_parse_format_roundtrip_property(x):
    """parse(format(x)) == pround(x, 2) for any finite double in range."""
    spark = _get_spark()
    got = (
        spark.range(1)
        .select(
            parse_ptbr_decimal(format_ptbr_decimal(F.lit(x))).alias("rt"),
            pround(F.lit(x), 2).alias("pr"),
        )
        .first()
    )
    assert abs(got["rt"] - got["pr"]) <= 0.005 + 1e-9  # formatter may tie-break
    # exact representation property: formatted value re-parses losslessly
    assert got["rt"] == round(got["rt"], 2)


@settings(max_examples=15, deadline=None)
@given(
    st.dates(min_value=datetime.date(1990, 1, 1),
             max_value=datetime.date(2040, 1, 1)),
    st.integers(min_value=0, max_value=400),
)
def test_calendar_inclusive_gapless_property(start, span):
    """Calendar covers every day min..max inclusive, no gaps or dups
    (gerarDimTempo loop semantics, FullETLGenerator.java:188)."""
    spark = _get_spark()
    end = start + datetime.timedelta(days=span)
    cal = build_calendar_dim(spark, start.isoformat(), end.isoformat())
    keys = [r["ChaveData"] for r in cal.select("ChaveData").collect()]
    assert len(keys) == span + 1
    assert len(set(keys)) == span + 1
    assert min(keys) == int(start.strftime("%Y%m%d"))
    assert max(keys) == int(end.strftime("%Y%m%d"))


def test_hash_bucket_matches_pure_python():
    """The portable md5 sampling bucket (first 4 hex nibbles mod 100) must
    equal an independent pure-Python computation for a wide id range —
    every sampling/split/contamination query rides on this."""
    import hashlib

    import pyspark.sql.functions as F

    spark = _get_spark()
    ids = list(range(0, 2000, 7)) + [10**9, 10**12, 10**15]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint") % 100
    )
    got = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", bucket.alias("b")).collect()
    }
    for i in ids:
        want = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100
        assert got[i] == want, i


def test_simhash_matches_pure_python():
    """SimHash halves must equal an independent pure-Python vote count —
    guards the nibble/bit arithmetic (incl. the signed-64 split)."""
    import hashlib

    from java_etl_bi_generator_spark.operators.dedup import simhash64

    spark = _get_spark()
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "a a b"),
        (4, "único açaí jalapeño"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["simhash_hi"], r["simhash_lo"])
        for r in simhash64(df, "text", "doc_id").collect()
    }
    for doc_id, text in docs:
        toks = sorted(set(text.strip().split()))
        votes = [0] * 64
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            for pos in range(64):
                nib = int(h[pos // 4], 16)
                bit = (nib >> (3 - pos % 4)) & 1
                votes[pos] += 1 if bit else -1
        hi = sum(1 << (p - 32) for p in range(32, 64) if votes[p] > 0)
        lo = sum(1 << p for p in range(32) if votes[p] > 0)
        assert got[doc_id] == (hi, lo), doc_id


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=2),
        min_size=8,
        max_size=40,
    ),
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=2),
        min_size=8,
        max_size=40,
    ),
)
@pytest.mark.slow  # 15 s property sweep; round-close suite
def test_duplicated_passages_invariants_property(toks1, toks2):
    """Over arbitrary 2-letter token streams (heavy accidental overlap by
    construction): islands lie within doc bounds, never overlap, are at
    least k tokens long, and the cut removes exactly the covered tokens."""
    from java_etl_bi_generator_spark.operators.dedup import (
        cut_passages,
        duplicated_passages,
    )

    k = 8
    spark = _get_spark()
    df = spark.createDataFrame(
        [(1, " ".join(toks1)), (2, " ".join(toks2))], ["doc_id", "text"]
    )
    spans = duplicated_passages(df, "text", "doc_id", k=k)
    rows = spans.collect()
    n = {1: len(toks1), 2: len(toks2)}
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        assert 1 <= r["tok_start"] <= r["tok_end"] <= n[r["doc_id"]]
        assert r["tok_end"] - r["tok_start"] + 1 >= k
        by_doc.setdefault(r["doc_id"], []).append(
            (r["tok_start"], r["tok_end"])
        )
    for doc, sp in by_doc.items():
        sp.sort()
        for (s1, e1), (s2, e2) in zip(sp, sp[1:]):
            assert e1 < s2  # islands are disjoint (maximal merge)
    cut = {
        r["doc_id"]: (r["n_tokens_before"], r["n_tokens_after"])
        for r in cut_passages(df, spans, "text", "doc_id").collect()
    }
    for doc in (1, 2):
        covered = sum(e - s + 1 for s, e in by_doc.get(doc, []))
        assert cut[doc] == (n[doc], n[doc] - covered)


@settings(max_examples=12, deadline=None)
@given(
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # key
            st.integers(min_value=0, max_value=60),   # start day
            st.integers(min_value=0, max_value=20),   # span length
        ),
        min_size=1,
        max_size=14,
    )
)
def test_interval_merge_invariants_property(ivs):
    """Coalesced spans must (a) be disjoint and non-adjacent per key,
    (b) cover exactly the union of input intervals, (c) account for
    every input interval once — exercised through the SAME operator
    q_interval_merge runs (operators/intervals.py), not a private
    re-implementation."""
    from java_etl_bi_generator_spark.operators.intervals import (
        coalesce_intervals,
    )

    spark = _get_spark()
    rows = [(k, s, s + ln) for k, s, ln in ivs]
    df = spark.createDataFrame(rows, "custkey int, s int, e int")
    spans = coalesce_intervals(df, ["custkey"], "s", "e").collect()
    by_key: dict[int, list] = {}
    for r in spans:
        by_key.setdefault(r["custkey"], []).append(r)
    assert sum(r["n_intervals"] for r in spans) == len(rows)  # (c)
    for k, srs in by_key.items():
        srs.sort(key=lambda r: r["span_start"])
        for p_, q_ in zip(srs, srs[1:]):
            assert q_["span_start"] > p_["span_end"] + 1  # (a)
        got = set()
        for r in srs:
            got |= set(range(r["span_start"], r["span_end"] + 1))
        want = set()
        for kk, s_, e_ in rows:
            if kk == k:
                want |= set(range(s_, e_ + 1))
        assert got == want  # (b)


@settings(max_examples=12, deadline=None)
@given(
    lts=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                 max_size=6, unique=True),
    rts=st.lists(st.integers(min_value=0, max_value=10**6), min_size=0,
                 max_size=6, unique=True),
)
@pytest.mark.slow  # 13 s property sweep; round-close suite
def test_asof_nearest_is_argmin_property(lts, rts):
    """The matched right row must minimize |r.ts - l.ts| (microseconds),
    backward preferred on exact ties — checked against a brute-force
    argmin over the same rows."""
    import datetime as dt

    from java_etl_bi_generator_spark.operators.asof import asof_join_nearest

    spark = _get_spark()
    base = dt.datetime(2024, 1, 1)
    mk = lambda us: base + dt.timedelta(microseconds=us * 37)  # noqa: E731
    left = spark.createDataFrame(
        [(1, mk(t), i) for i, t in enumerate(lts)],
        "user_id int, ts timestamp, event_id int",
    )
    right = spark.createDataFrame(
        [(1, mk(t), float(t)) for t in rts],
        "user_id int, ts timestamp, rv double",
    )
    got = {
        r["event_id"]: r["rv_m"]
        for r in asof_join_nearest(
            left, right, on="user_id", ts_col="ts",
            right_value_cols=["rv"], suffix="_m",
        ).collect()
    }
    for i, lt in enumerate(lts):
        if not rts:
            assert got[i] is None
            continue
        best = min(
            rts,
            key=lambda rt: (abs(rt - lt), 0 if rt <= lt else 1),
        )
        assert got[i] == float(best), (lt, sorted(rts))


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=-999, max_value=9999)),
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Lu", "Ll", "Nd"),
                    max_codepoint=0x7E,
                ),
                max_size=8,
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_fixed_width_roundtrip_property(rows):
    """Any in-width (int|None, space-free string) row set survives the
    fixed-width write/read cycle exactly — with the format's declared
    NULL ≡ '' conflation (both render as spaces, both read back NULL)."""
    import tempfile

    from java_etl_bi_generator_spark.sources.fixed_width import (
        read_fixed_width,
        write_fixed_width,
    )

    spark = _get_spark()
    specs = [("k", 6, "int"), ("name", 10, "string")]
    df = spark.createDataFrame(rows, "k int, name string")
    with tempfile.TemporaryDirectory() as d:
        write_fixed_width(df, f"{d}/fw", specs)
        # null-safe on BOTH fields: the NULL = '' conflation means t[1]
        # comes back None whenever the written string was empty
        key = lambda t: (  # noqa: E731
            t[0] is None,
            t[0] or 0,
            t[1] is None,
            t[1] or "",
        )
        back = sorted(
            (
                (r["k"], r["name"])
                for r in read_fixed_width(spark, f"{d}/fw", specs).collect()
            ),
            key=key,
        )
    assert back == sorted(
        ((k, s if s != "" else None) for k, s in rows), key=key
    )


@settings(max_examples=8, deadline=None)
@given(
    names=st.lists(
        st.text(alphabet="ab1", min_size=1, max_size=5),
        min_size=2,
        max_size=10,
        unique=True,
    )
)
def test_fastss_matches_bruteforce_ed1(names):
    """Deletion-neighborhood completeness over arbitrary strings: the
    FastSS query's per-name neighbor counts must equal brute-force
    levenshtein<=1 over all pairs — a tiny 'ab1' alphabet forces dense
    collisions (shared variants, transposes, repeated characters)."""
    import tempfile

    from java_etl_bi_generator_spark.queries import registry

    def ed(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {}
    for a in names:
        near = sorted(b for b in names if b != a and ed(a, b) <= 1)
        if near:
            want[a] = (len(near), near[0])

    spark = _get_spark()
    cu = spark.createDataFrame(
        [(i, n, 0, 0.0, "B") for i, n in enumerate(names)],
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    with tempfile.TemporaryDirectory() as d:
        cu.write.parquet(f"{d}/customer.parquet")
        got = {
            r["c_name"]: (r["n_near"], r["nearest"])
            for r in registry()["q_fuzzy_ids_fastss"](spark, d).collect()
        }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    ckeys=st.lists(
        st.integers(min_value=1, max_value=3000), min_size=1, max_size=12,
        unique=True,
    ),
    skeys=st.lists(
        st.integers(min_value=1, max_value=3000), min_size=1, max_size=12,
        unique=True,
    ),
)
@pytest.mark.slow  # 18 s property sweep; round-close suite
def test_knn_grid_matches_bruteforce(ckeys, skeys):
    """Grid-KNN equals brute force restricted to the 3x3 neighborhood,
    over arbitrary key sets (coordinates derive from keys, so random
    keys scatter points across cells, edges and corners included)."""
    import tempfile

    from java_etl_bi_generator_spark.queries import registry

    def cpoint(k):
        return (k * 37 % 1000, k * 73 % 1000)

    def spoint(k):
        return (k * 41 % 1000, k * 59 % 1000)

    want = {}
    for ck in ckeys:
        clat, clon = cpoint(ck)
        cx, cy = clat // 100, clon // 100
        best = None
        for sk in skeys:
            slat, slon = spoint(sk)
            if abs(slat // 100 - cx) > 1 or abs(slon // 100 - cy) > 1:
                continue
            d2 = (clat - slat) ** 2 + (clon - slon) ** 2
            if best is None or (d2, sk) < best:
                best = (d2, sk)
        want[ck] = (best[1], best[0]) if best else (None, None)

    spark = _get_spark()
    cu = spark.createDataFrame([(k,) for k in ckeys], "c_custkey bigint")
    su = spark.createDataFrame([(k,) for k in skeys], "s_suppkey bigint")
    with tempfile.TemporaryDirectory() as d:
        cu.write.parquet(f"{d}/customer.parquet")
        su.write.parquet(f"{d}/supplier.parquet")
        got = {
            r["c_custkey"]: (r["nearest_suppkey"], r["d2"])
            for r in registry()["q_knn_grid_join"](spark, d).collect()
        }
    assert got == want
