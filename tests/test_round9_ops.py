"""Round-9 pins.

Behavioral pins for the ADVICE-r8 fixes: singleton-cell medoid semantics
(both engines emit the row, mean NULL), the calibration claim softened to
what PAV actually guarantees, and the encoding advisor's distributed form.
"""

from __future__ import annotations

import os

import duckdb
import pytest


def _write_singleton_fixture(spark, tmpdir: str) -> str:
    """A 2-label embeddings table: label 0 has 3 vectors, label 1 has ONE."""
    rows = [
        (0, [1.0] + [0.0] * 63, 0),
        (1, [2.0] + [0.0] * 63, 0),
        (2, [4.0] + [0.0] * 63, 0),
        (7, [9.0] + [0.0] * 63, 1),  # singleton cell
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    path = os.path.join(tmpdir, "embeddings.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return tmpdir


def test_medoid_singleton_cell(spark, tmp_path):
    """ADVICE r8 (oracles.py q_vector_medoid): a 1-vector label cell must
    produce the IDENTICAL row in Spark and the DuckDB oracle —
    (label, medoid_id, n_vectors=1, sum_sq_dist_micro2=0, mean NULL)."""
    from java_etl_bi_generator_spark.oracles import ORACLES
    from java_etl_bi_generator_spark.queries import q_vector_medoid

    sf = _write_singleton_fixture(spark, str(tmp_path))

    got = {
        r["label"]: r.asDict()
        for r in q_vector_medoid(spark, sf).collect()
    }
    assert set(got) == {0, 1}
    # label 0: medoid of micro-quantized 1e6/2e6/4e6 on axis 0 is 2e6
    # (vec_id=1): sums of squared dists 1e12+4e12 < 1e12+9e12 < 4e12+9e12.
    assert got[0]["medoid_id"] == 1
    assert got[0]["n_vectors"] == 3
    assert got[0]["sum_sq_dist_micro2"] == 5_000_000_000_000
    # the singleton: present, zero distance, mean NULL (0/0)
    assert got[1]["medoid_id"] == 7
    assert got[1]["n_vectors"] == 1
    assert got[1]["sum_sq_dist_micro2"] == 0
    assert got[1]["mean_sq_dist"] is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf}/embeddings.parquet/*.parquet'"
    )
    ora = {
        r[0]: r
        for r in con.execute(ORACLES["q_vector_medoid"]).fetchall()
    }
    assert set(ora) == {0, 1}
    for lbl in (0, 1):
        g = got[lbl]
        assert ora[lbl][1] == g["medoid_id"]
        assert ora[lbl][2] == g["n_vectors"]
        assert ora[lbl][3] == g["sum_sq_dist_micro2"]
        assert ora[lbl][4] == g["mean_sq_dist"]


def test_medoid_oracle_is_linear():
    """ADVICE r8: the oracle must not materialize the within-cell pair
    frame (the exact quadratic the Spark side was rewritten to avoid) —
    pin the absence of a self-join on embeddings."""
    from java_etl_bi_generator_spark.oracles import ORACLES

    sql = ORACLES["q_vector_medoid"]
    assert "em a JOIN em b" not in sql
    assert "HUGEINT" in sql  # 128-bit accumulators, the decimal(38,0) twin


def test_session_paths_truncates_before_collect(spark, sf_dir):
    """VERDICT r8 item 2: the ranked 8-event filter must PRECEDE the
    path collect (deeper in the plan tree = earlier execution), and
    Catalyst must plan it as a WindowGroupLimit — the per-partition
    top-8 that keeps a bot session from funneling one task."""
    from java_etl_bi_generator_spark.plans import explain_simple
    from java_etl_bi_generator_spark.queries import registry

    plan = explain_simple(registry()["q_session_paths"](spark, sf_dir))
    assert "WindowGroupLimit" in plan
    collect_at = plan.index("partial_collect_list")
    filter_at = plan.index("Filter (__rn")
    assert filter_at > collect_at  # filter is a descendant of the agg


def test_event_pattern_has_no_unbounded_collect(spark, sf_dir):
    """VERDICT r8 item 2: the journey regex is algebraized — the only
    collect carries the CASE-guarded 40-event prefix, and no rlike
    remains in the plan (the DuckDB oracle still runs the regex, so
    parity verifies the two algorithms against each other)."""
    from java_etl_bi_generator_spark.plans import explain_simple
    from java_etl_bi_generator_spark.queries import registry

    plan = explain_simple(registry()["q_event_pattern"](spark, sf_dir))
    assert "rlike" not in plan.lower()
    assert "__pos" in plan and "<= 40" in plan
    for i, line in enumerate(plan.splitlines()):
        if "collect_list" in line:
            assert "CASE WHEN" in line and "<= 40" in line


def test_encoding_advisor_data_window_is_partitioned(spark, sf_dir):
    """ADVICE r8: the data-grain run-length lag must ride a day-
    partitioned window (hashpartitioning on o_orderdate), leaving the
    single-partition exchange to the ~2.4k-row DAY-grain stitch only
    — i.e. it must sit ABOVE the day aggregate in the plan tree."""
    from java_etl_bi_generator_spark.plans import explain_simple
    from java_etl_bi_generator_spark.queries import registry

    plan = explain_simple(registry()["q_encoding_advisor"](spark, sf_dir))
    assert "hashpartitioning(o_orderdate" in plan
    single = plan.index("Exchange SinglePartition")
    day_agg = plan.index("SortAggregate(key=[o_orderdate")
    assert single < day_agg  # the funnel consumes day-grain rows only


def test_wav_extensible_general_walk_agrees(spark, sf_dir):
    """The promotion point (VERDICT r8 task 3): the general variable-
    offset RIFF walk (wav_chunk_meta — handles LIST-before-fmt and the
    40-byte extensible fmt) must agree with the fixed-offset codegen
    parser on the canonical extensible fixtures, field for field."""
    from java_etl_bi_generator_spark.queries import registry
    from java_etl_bi_generator_spark.sources.multimodal import (
        wav_chunk_meta,
    )

    rows = registry()["q_media_wav_extensible"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        b = bytes.fromhex(r["blob_hex"])
        rate, ch, bits, dur = wav_chunk_meta(b)
        assert rate == r["sample_rate"]
        assert ch == r["channels"]
        assert bits == r["bits_per_sample"]
        assert dur == r["duration_ms"]
        assert r["valid_bits"] <= r["bits_per_sample"]
        assert r["byte_len"] == 102 + r["data_size"]


def test_pr_curve_shape(spark, sf_dir):
    """Recall is non-increasing as the threshold bucket rises, AP lies
    in [0,1] and is constant across rows, and the top bucket's
    precision (if any predictions) is within [0,1]."""
    from java_etl_bi_generator_spark.queries import registry

    rows = registry()["q_pr_curve"](spark, sf_dir).collect()
    # sf0.001 leaves some of the 20 score buckets empty
    assert 10 <= len(rows) <= 20
    ap = {r["avg_precision"] for r in rows}
    assert len(ap) == 1 and 0.0 <= ap.pop() <= 1.0
    by_bucket = sorted(rows, key=lambda r: r["threshold_bucket"])
    recalls = [r["recall"] for r in by_bucket]
    assert recalls == sorted(recalls, reverse=True)
    for r in rows:
        assert 0.0 <= r["precision"] <= 1.0


def test_zipf_slope_is_negative(spark, sf_dir):
    """A natural-ish corpus has a strictly negative rank-frequency
    slope; 100 points fit."""
    from java_etl_bi_generator_spark.queries import registry

    r = registry()["q_zipf_law"](spark, sf_dir).first()
    # top-100 cap; the sf0.001 vocabulary is smaller than 100
    assert 10 <= r["n_points"] <= 100
    assert r["zipf_slope"] < 0


def test_assortativity_in_range(spark, sf_dir):
    """r is a correlation: within [-1, 1]."""
    from java_etl_bi_generator_spark.queries import registry

    r = registry()["q_graph_assortativity"](spark, sf_dir).first()
    assert r["m"] > 0
    assert -1.0 <= r["assortativity"] <= 1.0


def test_data_freshness_consistency(spark, sf_dir):
    """Staleness is non-negative, exactly one feed touches the global
    high-water mark (staleness 0), and counts are non-negative."""
    from java_etl_bi_generator_spark.queries import registry

    rows = registry()["q_data_freshness"](spark, sf_dir).collect()
    assert len(rows) >= 1
    assert all(r["staleness_s"] >= 0 for r in rows)
    assert any(r["staleness_s"] == 0 for r in rows)
    assert all(r["latest_day_events"] >= 0 for r in rows)


def test_token_budget_caps(spark, sf_dir):
    """Allocation never exceeds the uniform target nor 4 epochs, and
    epochs_milli is consistent with the allocation."""
    from java_etl_bi_generator_spark.queries import registry

    rows = registry()["q_token_budget"](spark, sf_dir).collect()
    for r in rows:
        assert r["tokens_allocated"] <= r["uniform_target"]
        assert r["tokens_allocated"] <= 4 * r["tokens"]
        assert r["epochs_milli"] == r["tokens_allocated"] * 1000 // r["tokens"]


def test_semantic_outliers_ranked(spark, sf_dir):
    """Exactly 3 ranked outliers per label, distances non-increasing
    within a label."""
    from collections import defaultdict

    from java_etl_bi_generator_spark.queries import registry

    rows = registry()["q_semantic_outliers"](spark, sf_dir).collect()
    per = defaultdict(list)
    for r in rows:
        per[r["label"]].append((r["outlier_rank"], r["dist2_micro2"]))
    for label, rs in per.items():
        rs.sort()
        assert [x[0] for x in rs] == [1, 2, 3]
        dists = [x[1] for x in rs]
        assert dists == sorted(dists, reverse=True)


def test_stream_join_outer_contract(spark, sf_dir):
    """The inner rows equal q_stream_join's pairs; every null-padded
    click is genuinely unmatched in batch; no click near the stream
    end (inside watermark horizon + window) is emitted null-padded."""
    import pyspark.sql.functions as F

    from java_etl_bi_generator_spark.catalog import load_table
    from java_etl_bi_generator_spark.queries import registry

    out = registry()["q_stream_join_outer"](spark, sf_dir)
    inner = out.filter(F.col("purchase_id").isNotNull())
    ref = registry()["q_stream_join"](spark, sf_dir)
    assert inner.count() == ref.count()

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    mx_c = (
        ev.filter(F.col("event_type") == "click").agg(F.max("ts")).first()[0]
    )
    mx_p = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.max("ts"))
        .first()[0]
    )
    wm_epoch = min(mx_c, mx_p).timestamp() - 3600
    nulls = out.filter(F.col("purchase_id").isNull())
    late = nulls.filter(
        F.col("click_epoch") + 1800 > F.lit(wm_epoch)
    ).count()
    assert late == 0


def test_moore_lewis_target_scores_higher(spark, sf_dir):
    """The target domain's own documents must average a higher
    Moore-Lewis score than the rest of the corpus — the selection
    property the method exists for."""
    import pyspark.sql.functions as F

    from java_etl_bi_generator_spark.queries import registry

    df = registry()["q_moore_lewis"](spark, sf_dir)
    means = (
        df.groupBy((F.col("source") == "src7").alias("is_tgt"))
        .agg(F.avg("ml_score").alias("m"))
        .collect()
    )
    m = {r["is_tgt"]: r["m"] for r in means}
    assert m[True] > m[False]


def test_srm_check_balanced_fixture(spark, sf_dir):
    """The md5 50/50 split on the fixture population must not trip the
    SRM alarm (the same hash assignment the z-test relies on), and
    chi2 must reconcile with the emitted counts."""
    from java_etl_bi_generator_spark.queries import registry

    r = registry()["q_srm_check"](spark, sf_dir).first()
    assert r["srm_alarm"] is False
    expect = (r["n_a"] - r["n_b"]) ** 2 / (r["n_a"] + r["n_b"])
    assert abs(r["chi2"] - expect) < 1e-6


def test_seasonal_decompose_identity(spark, sf_dir):
    """y = trend + seasonal + residual must reconcile per day within
    the 1e-4 rounding grid, and edge days (incomplete 7-day windows)
    must be absent."""
    from java_etl_bi_generator_spark.queries import registry

    rows = registry()["q_seasonal_decompose"](spark, sf_dir).collect()
    assert len(rows) > 100
    for r in rows[:200]:
        recon = r["trend"] + r["seasonal"] + r["residual"]
        assert abs(recon - r["revenue"]) < 3e-4


def test_seasonal_anomalies_scored_descending(spark, sf_dir):
    """Top-10 by score, non-increasing; flags consistent with the 3x
    threshold."""
    from java_etl_bi_generator_spark.queries import registry

    rows = registry()["q_seasonal_anomalies"](spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["is_anomalous"] == (r["score"] > 3.0) or abs(
            r["score"] - 3.0
        ) < 1e-3  # rounding at the exact boundary


def test_sequence_pairs_bounded_support(spark, sf_dir):
    """Supports lie in (0, 1]; no self-pairs at the first-occurrence
    grain (a type's first occurrence cannot precede itself)."""
    from java_etl_bi_generator_spark.queries import registry

    rows = registry()["q_sequence_pairs"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 < r["support"] <= 1.0
        assert r["type_a"] != r["type_b"]


def test_csv_malformed_audit_classes(spark, sf_dir):
    """All three planted corruption classes are flagged, clean rows are
    not, and partially-parsed fields survive (the PERMISSIVE
    contract pinned by the round-9 prototype)."""
    from java_etl_bi_generator_spark.queries import registry

    rows = registry()["q_csv_malformed_audit"](spark, sf_dir).collect()
    assert len(rows) == 25
    by_corrupt = [r for r in rows if r["is_corrupt"]]
    # nation keys 0..24: %11 -> {0,11,22}; %7 (not %11) -> {7,14,21};
    # %13 (neither) -> {13}
    assert len(by_corrupt) == 7
    for r in by_corrupt:
        assert r["corrupt_line"] is not None
        # short rows still parse their present fields
        assert r["n_name"] is not None
    for r in rows:
        if not r["is_corrupt"]:
            assert r["n_nationkey"] is not None
            assert r["n_regionkey"] is not None


def test_catalog_coverage_bounds(spark, sf_dir):
    """Coverage in (0, 1]; recommended items cannot exceed the catalog;
    exposure Gini in [0, 1)."""
    from java_etl_bi_generator_spark.queries import registry

    r = registry()["q_catalog_coverage"](spark, sf_dir).first()
    assert 0 < r["n_recommended"] <= r["n_items"]
    assert 0.0 < r["coverage_at_3"] <= 1.0
    assert 0.0 <= r["exposure_gini"] < 1.0


def test_knn_probe_accuracy_null_calibrated(spark, sf_dir):
    """On isotropic vectors with geometry-independent labels the
    correct reading is NO signal: observed accuracy within a few
    probes of the permutation null for both label kinds (distance
    concentration, Beyer et al. 1999) — the query must not
    manufacture lift where none exists."""
    from java_etl_bi_generator_spark.queries import registry

    rows = registry()["q_knn_probe_accuracy"](spark, sf_dir).collect()
    kinds = {r["label_kind"]: r for r in rows}
    assert set(kinds) == {"fixture", "sign3"}
    for r in rows:
        assert 0.0 <= r["knn_accuracy"] <= 1.0
        assert 0.0 < r["null_accuracy"] < 1.0
        assert r["n_correct"] <= r["n_probes"]
        # within ~3 standard errors of the null on these fixtures
        import math

        se = math.sqrt(
            r["null_accuracy"] * (1 - r["null_accuracy"]) / r["n_probes"]
        )
        assert abs(r["knn_accuracy"] - r["null_accuracy"]) < 4 * se + 0.05


def test_hybrid_search_fuses_both_signals(spark, sf_dir):
    """Top-10 hybrid scores in [0,1], non-increasing, and not a pure
    copy of either input ranking's scale (both components present)."""
    from java_etl_bi_generator_spark.queries import registry

    rows = registry()["q_hybrid_search"](spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r["hybrid_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert any(r["bm25"] > 0 for r in rows)
    assert len({r["cosine"] for r in rows}) > 1


def test_ts_strength_in_unit_range(spark, sf_dir):
    """Both strengths in [0,1]; the daily series carries SOME trend
    mass relative to pure noise."""
    from java_etl_bi_generator_spark.queries import registry

    r = registry()["q_ts_strength"](spark, sf_dir).first()
    assert 0.0 <= r["trend_strength"] <= 1.0
    assert 0.0 <= r["seasonal_strength"] <= 1.0
    assert r["n_days"] > 100


def test_embedding_dim_profile_consistency(spark, sf_dir):
    """64 dims, std >= 0, min <= mean <= max, no dead dims on the
    dense synthetic embeddings, zero fraction in [0,1]."""
    from java_etl_bi_generator_spark.queries import registry

    rows = registry()["q_embedding_dim_profile"](spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["std"] >= 0.0
        assert r["min"] <= r["mean"] <= r["max"]
        assert 0.0 <= r["zero_fraction"] <= 1.0
        assert r["is_dead_dim"] is False


def test_weighted_quantile_ladder_monotone(spark, sf_dir):
    """Five rungs, quantities non-decreasing in p, median rung agrees
    with q_weighted_median's global crossing rule."""
    from java_etl_bi_generator_spark.queries import registry

    rows = sorted(
        registry()["q_weighted_quantile_ladder"](spark, sf_dir).collect(),
        key=lambda r: r["p"],
    )
    assert [r["p"] for r in rows] == [10, 25, 50, 75, 90]
    qtys = [r["weighted_quantile_qty"] for r in rows]
    assert qtys == sorted(qtys)


def test_cross_lingual_pairs_canonical(spark, sf_dir):
    """Language pairs canonical (a < b) with positive counts; shingle
    count bounds the doc-pair count from below per pair is NOT
    required (many docs can share one shingle) but both are >= 1."""
    from java_etl_bi_generator_spark.queries import registry

    rows = registry()["q_cross_lingual_contamination"](
        spark, sf_dir
    ).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["lang_a"] < r["lang_b"]
        assert r["n_shared_shingles"] >= 1
        assert r["n_doc_pairs"] >= 1


def test_quality_token_frontier_shape(spark, sf_dir):
    """10 deciles; mean quality non-decreasing in decile; cumulative
    kept-share decreasing as the cutoff rises and reaching 1.0 at
    decile 1 (keep everything)."""
    from java_etl_bi_generator_spark.queries import registry

    rows = sorted(
        registry()["q_quality_token_frontier"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    means = [r["mean_quality"] for r in rows]
    assert means == sorted(means)
    shares = [r["cum_token_share_kept"] for r in rows]
    assert abs(shares[0] - 1.0) < 1e-6
    assert shares == sorted(shares, reverse=True)


def test_threshold_selection_criteria_valid(spark, sf_dir):
    """Three criteria rows; confusion counts internally consistent;
    Youden's J value reconciles with its own counts."""
    from java_etl_bi_generator_spark.queries import registry

    rows = {r["criterion"]: r for r in
            registry()["q_threshold_selection"](spark, sf_dir).collect()}
    assert set(rows) == {"youden_j", "f1", "min_cost_fn5"}
    for r in rows.values():
        assert r["tp"] >= 0 and r["fp"] >= 0
        assert 0 <= r["threshold_bucket"] <= 19
    j = rows["youden_j"]
    p = j["tp"] + j["fn"]
    n = j["fp"] + j["tn"]
    assert abs(j["value"] - (j["tp"] / p - j["fp"] / n)) < 1e-5
