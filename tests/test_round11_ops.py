"""Behavioral pins for the round-11 additions.

Parity (value-hash vs DuckDB) is covered by check_parity.py / the driver;
these tests pin the SEMANTIC claims each docstring makes, at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from java_etl_bi_generator_spark.queries import registry


def test_probe_set_is_count_bounded(spark, sf_dir):
    """VERDICT r10 #1 pin: the probe-keyed BFS family's seed set is a
    COUNT-bounded top-k (never the data-linear %100 rule), determinate
    under re-evaluation, and made of real graph hubs."""
    from java_etl_bi_generator_spark.queries import (
        PROBE_CAP,
        _copurchase_sym,
        _hub_probes,
    )

    sym = _copurchase_sym(spark, sf_dir)
    probes = _hub_probes(sym)
    rows = probes.collect()
    assert 0 < len(rows) <= PROBE_CAP
    ids = sorted(r["probe"] for r in rows)
    assert len(set(ids)) == len(ids)
    # deterministic: a second evaluation yields the identical set
    assert sorted(r["probe"] for r in probes.collect()) == ids
    # they are the TOP-degree nodes: every probe's degree >= the
    # (cap+1)-th highest degree in the full degree table
    deg = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.col("deg").desc(), F.col("src").asc())
        .collect()
    )
    if len(deg) > PROBE_CAP:
        cutoff = deg[PROBE_CAP]["deg"]
        probe_degs = {r["src"]: r["deg"] for r in deg}
        assert all(probe_degs[i] >= cutoff for i in ids)


def test_probe_keyed_queries_bounded_output(spark, sf_dir):
    """The two probe-keyed BFS queries emit at most PROBE_CAP probes —
    the output grain itself certifies the state bound held."""
    from java_etl_bi_generator_spark.queries import PROBE_CAP

    reg = registry()
    h = reg["q_harmonic_centrality"](spark, sf_dir).collect()
    assert 0 < len(h) <= PROBE_CAP
    pc = reg["q_graph_path_counts"](spark, sf_dir)
    n_probes = pc.select("probe").distinct().count()
    assert 0 < n_probes <= PROBE_CAP


def test_truth_sample_bounded_and_deterministic(spark, sf_dir):
    """VERDICT r10 #2 pin: the dedup evals' exact-truth side runs on a
    COUNT-bounded deterministic sample; the sampled-N column keeps the
    denominator honest; at the test SFs the sample covers the corpus
    so the eval is non-vacuous."""
    from java_etl_bi_generator_spark.operators.dedup import exact_dedup
    from java_etl_bi_generator_spark.queries import (
        T,
        TRUTH_SAMPLE_K,
        _truth_sample,
    )

    docs = exact_dedup(T(spark, sf_dir, "documents"), "text", "doc_id")
    samp = _truth_sample(docs, TRUTH_SAMPLE_K)
    ids = sorted(r["doc_id"] for r in samp.select("doc_id").collect())
    assert 0 < len(ids) <= TRUTH_SAMPLE_K
    # determinism under re-evaluation
    again = sorted(
        r["doc_id"]
        for r in _truth_sample(docs, TRUTH_SAMPLE_K)
        .select("doc_id")
        .collect()
    )
    assert again == ids
    # k=None is the full-truth flag
    assert _truth_sample(docs, None).count() == docs.count()

    reg = registry()
    bq = reg["q_blocking_quality"](spark, sf_dir).collect()[0]
    assert bq["sampled_docs"] == len(ids)
    assert bq["sampled_docs"] <= bq["n_docs"]
    cq = reg["q_dedup_cluster_quality"](spark, sf_dir).collect()[0]
    assert cq["sampled_docs"] == len(ids)


def test_png_stored_decode_validates_with_real_zlib(spark, sf_dir):
    """q_media_png_decode emits genuinely valid PNGs (python zlib
    decompresses the IDAT and validates the REAL adler trailer), the
    decoder's channel sums match an independent pure-python decode,
    and both verification booleans hold on every row."""
    import struct
    import zlib

    rows = (
        registry()["q_media_png_decode"](spark, sf_dir)
        .orderBy("doc_id")
        .limit(8)
        .collect()
    )
    assert rows
    for r in rows:
        assert r["container"] == "png"
        assert r["filters_ok"] and r["adler_ok"]
        blob = bytes.fromhex(r["blob_hex"])
        w = struct.unpack(">I", blob[16:20])[0]
        h = struct.unpack(">I", blob[20:24])[0]
        assert (w, h) == (r["width"], r["height"])
        idat_len = struct.unpack(">I", blob[33:37])[0]
        assert blob[37:41] == b"IDAT"
        raw = zlib.decompress(blob[41 : 41 + idat_len])  # checks adler
        rb = 1 + 3 * w
        assert len(raw) == h * rb
        sums = [0, 0, 0]
        for p in range(w * h):
            base = (p // w) * rb + 1 + 3 * (p % w)
            for ch in range(3):
                sums[ch] += raw[base + ch]
        assert sums == [r["sum_r"], r["sum_g"], r["sum_b"]]


def test_png_decoder_catches_corruption(spark):
    """The adler check is a real integrity verification: flipping one
    raw pixel byte (keeping the framing intact) must flip adler_ok to
    False while the parse still succeeds."""
    from java_etl_bi_generator_spark.queries import _png_canonical_media
    from java_etl_bi_generator_spark.sources.multimodal import (
        png_stored_pixel_stats,
    )

    media = _png_canonical_media(
        spark, "/root/testdata/sf0.001", "png_corrupt_test"
    )
    one = media.orderBy("doc_id").limit(1).collect()[0]
    blob = bytearray(one["content"])
    blob[49] = (blob[49] + 1) % 256  # first raw byte after the filter byte
    corrupted = spark.createDataFrame(
        [(one["doc_id"], bytes(blob))], "doc_id bigint, content binary"
    )
    r = png_stored_pixel_stats(corrupted).collect()[0]
    assert r["container"] == "png"
    assert r["adler_ok"] is False
    assert r["filters_ok"] is True


def test_rake_scores_bounds(spark, sf_dir):
    rows = registry()["q_rake_keywords"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r["freq"] > 0
        # deg counts the full phrase length per occurrence, so deg >= freq
        assert r["deg"] >= r["freq"]
        assert r["rake_score"] >= 1.0


def test_url_canonicalize_recovers_exact_dup_factor(spark, sf_dir):
    """Each doc emits 3 raw variants that all collapse to ONE canonical
    URL — dup_factor is exactly 3 and canon_distinct equals the doc
    count per source."""
    rows = registry()["q_url_canonicalize"](spark, sf_dir).collect()
    assert rows
    from java_etl_bi_generator_spark.queries import T

    per_source = {
        r["source"]: r["cnt"]
        for r in T(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in rows:
        assert r["canon_distinct"] == per_source[r["source"]]
        assert r["raw_distinct"] == 3 * r["canon_distinct"]
        assert abs(r["dup_factor"] - 3.0) < 1e-9


def test_zorder_beats_linear_on_trailing_key(spark, sf_dir):
    """The measured reason Z-order exists: the linear layout scans ~all
    files for the trailing key's predicate, Z-order a bounded
    fraction for BOTH keys."""
    rows = registry()["q_zorder_layout"](spark, sf_dir).collect()
    d = {(r["layout"], r["predicate"]): r for r in rows}
    assert len(d) == 4
    lin_b = d[("linear", "b_in_first_eighth")]
    z_b = d[("zorder", "b_in_first_eighth")]
    lin_a = d[("linear", "a_in_first_eighth")]
    assert z_b["scan_fraction"] < lin_b["scan_fraction"]
    assert z_b["scan_fraction"] <= 0.6
    # the linear layout's LEADING key prunes well
    assert lin_a["scan_fraction"] <= 0.3


def test_compaction_plan_conserves_rows(spark, sf_dir):
    from java_etl_bi_generator_spark.queries import T

    rows = registry()["q_compaction_plan"](spark, sf_dir).collect()
    assert rows
    total = T(spark, sf_dir, "lineitem").count()
    assert sum(r["bin_rows"] for r in rows) == total
    n_files = (
        T(spark, sf_dir, "lineitem")
        .select((F.col("l_orderkey") % 1000).alias("f"))
        .distinct()
        .count()
    )
    assert sum(r["n_files"] for r in rows) == n_files
    bins = sorted(r["bin_id"] for r in rows)
    assert bins == list(range(len(bins)))  # contiguous plan


def test_shapley_synergy_shares_sum_to_one(spark, sf_dir):
    import math

    rows = registry()["q_shapley_synergy"](spark, sf_dir).collect()
    assert rows
    assert math.isclose(sum(r["share"] for r in rows), 1.0, abs_tol=1e-4)
    assert any(r["channel"] == "purchase" for r in rows)
    # symmetric game: per-journey credit is identical for every member,
    # so total scaled credit is divisible by 6
    assert all(r["shapley12"] % 6 == 0 for r in rows)


def test_salted_join_equals_unsalted(spark, sf_dir):
    from java_etl_bi_generator_spark.queries import T

    got = {
        r["n_name"]: (r["n_orders"], r["revenue_cents"])
        for r in registry()["q_join_salted"](spark, sf_dir).collect()
    }
    plain = (
        T(spark, sf_dir, "orders")
        .join(
            T(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            T(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            ).alias("cents"),
        )
        .collect()
    )
    assert got == {r["n_name"]: (r["n"], r["cents"]) for r in plain}
