"""Invariant checks for the round-4 statistics/evaluation additions.

The DuckDB differential harness is the primary gate for these queries;
the tests here pin the mathematical invariants an oracle comparison
cannot express (bounds, monotonicity, ordering of CI endpoints) plus one
brute-force cross-check of Kendall's τ against the naive O(n²) pair
count in plain Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from java_etl_bi_generator_spark.queries import registry


def _rows(spark, sf_dir, name):
    return registry()[name](spark, sf_dir).collect()


def test_gains_lift_monotone_and_normalized(spark, sf_dir):
    rows = sorted(_rows(spark, sf_dir, "q_gains_lift"),
                  key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    captures = [r["capture_pct"] for r in rows]
    assert all(b >= a for a, b in zip(captures, captures[1:]))
    assert abs(captures[-1] - 1.0) < 1e-9
    assert rows[-1]["cum_active"] == sum(r["n_active"] for r in rows)
    # lifts are positive and average to ~1 when weighted by decile size
    total_n = sum(r["n_customers"] for r in rows)
    total_a = sum(r["n_active"] for r in rows)
    wavg = sum(
        r["lift"] * r["n_customers"] / total_n for r in rows
    )
    assert all(r["lift"] > 0 for r in rows if r["n_active"] > 0)
    assert total_a == 0 or abs(wavg - 1.0) < 1e-4


def test_kendall_tau_bounds_and_bruteforce(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q_kendall_tau")
    assert rows and all(-1.0 <= r["kendall_tau"] <= 1.0 for r in rows)

    # brute-force τ-b on the raw pairs of one flag
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "l_returnflag",
            "cast(floor(l_quantity + 0.5) as bigint) x",
            "cast(floor(l_discount * 100 + 0.5) as bigint) y",
        )
        .where("l_returnflag = 'A'")
        .collect()
    )
    from collections import Counter

    xs = [(r["x"], r["y"]) for r in li]
    c = d = 0
    for i in range(len(xs)):
        for j in range(i + 1, len(xs)):
            dx = xs[i][0] - xs[j][0]
            dy = xs[i][1] - xs[j][1]
            if dx == 0 or dy == 0:
                continue
            if (dx > 0) == (dy > 0):
                c += 1
            else:
                d += 1
    n = len(xs)
    got = next(r for r in rows if r["l_returnflag"] == "A")
    # concordant/discordant are canonical digit STRINGS since r10 (the
    # registry bans DECIMAL outputs; pair counts pass int64 at ~1e10 rows)
    assert int(got["concordant"]) == c and int(got["discordant"]) == d
    # τ-b tie terms are per VARIABLE marginal, not per pair-class
    t1 = sum(t * (t - 1) for t in Counter(v[0] for v in xs).values())
    t2 = sum(t * (t - 1) for t in Counter(v[1] for v in xs).values())
    tau = 2.0 * (c - d) / ((n * (n - 1) - t1) * (n * (n - 1) - t2)) ** 0.5
    assert abs(got["kendall_tau"] - tau) < 1e-6


def test_welch_t_shapes(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q_ttest_welch")
    assert len(rows) == 5
    for r in rows:
        assert r["n_urgent"] > 1 and r["n_routine"] > 1
        # Welch df is bounded by min(n-1) below and (na+nb-2) above
        assert (
            min(r["n_urgent"], r["n_routine"]) - 1
            <= r["welch_df"]
            <= r["n_urgent"] + r["n_routine"] - 2
        )


def test_cramers_v_bounds(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "q_cramers_v")
    assert r["chi2"] >= 0.0
    assert 0.0 <= r["cramers_v"] <= 1.0


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "q_bootstrap_ci")
    assert r["ci_lo"] <= r["ci_hi"]
    # the point estimate should sit inside its own 95% bootstrap CI
    assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"]


def test_rolling_median_robustness(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q_rolling_median")
    assert rows
    by_d = sorted(rows, key=lambda r: r["d"])
    # each median lies within the min/max of its 7-row window
    revs = [r["revenue"] for r in by_d]
    for i, r in enumerate(by_d):
        win = revs[max(0, i - 6): i + 1]
        assert min(win) - 1e-9 <= r["median_7d"] <= max(win) + 1e-9


def test_linkage_weights_band_range(spark, sf_dir):
    from java_etl_bi_generator_spark.functions.linkage import fs_weights

    rows = _rows(spark, sf_dir, "q_linkage_weights")
    assert rows
    lo = sum(wd for _, _, wd in fs_weights())
    hi = sum(wa for _, wa, _ in fs_weights())
    for r in rows:
        assert lo - 1 <= r["weight_band"] <= hi
        assert r["n_pairs"] > 0


def test_decayed_engagement_bounded_by_total(spark, sf_dir):
    # decayed value can never exceed the customer's undecayed total
    rows = _rows(spark, sf_dir, "q_decayed_engagement")
    totals = {
        r["o_custkey"]: r["total"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("total"))
        .collect()
    }
    assert rows
    for r in rows:
        assert 0.0 <= r["decayed_value"] <= totals[r["o_custkey"]] + 1e-6


def test_grid_density_clusters_partition(spark, sf_dir):
    # cluster cell counts must not exceed the number of core cells, and
    # cluster ids must be distinct cell labels
    rows = _rows(spark, sf_dir, "q_grid_density_clusters")
    ids = [r["cluster_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert r["n_cells"] >= 1 and r["n_points"] >= 5 * r["n_cells"]
