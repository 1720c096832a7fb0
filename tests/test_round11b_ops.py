"""Behavioral pins for the round-11b additions (geo / network / link
prediction).

Parity (value-hash vs DuckDB) is covered by check_parity.py / the driver;
these tests pin the SEMANTIC claims each docstring makes, at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from java_etl_bi_generator_spark.queries import registry


def _py_geohash5(lat: float, lon: float) -> str:
    """Textbook geohash (precision 5) — the independent reference the
    generated-SQL encoder must reproduce."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    ch = 0
    for _ in range(25):
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_lo = mid
            else:
                ch = ch * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_lo = mid
            else:
                ch = ch * 2
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(b32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_sql_matches_textbook_algorithm(spark):
    """The generated-SQL interleave (functions/geo.py) must agree with
    the classic bisection geohash for points away from quantizer cell
    boundaries (on-boundary points differ only by float-vs-integer
    quantizer tie handling, which the integer grid avoids by design)."""
    from java_etl_bi_generator_spark.functions.geo import (
        geohash5_chars_sql,
        geohash5_code_sql,
        geohash5_quant_sql,
    )

    pts = [
        (123_456, 2_345_678),
        (900_000, 1_800_000),
        (1_799_999, 3_599_999),
        (1, 1),
        (457_893, 98_771),
    ]
    df = spark.createDataFrame(
        [(la, lo) for la, lo in pts], "glat_units long, glon_units long"
    )
    lat_q, lon_q = geohash5_quant_sql("glat_units", "glon_units")
    got = (
        df.select(
            "glat_units",
            "glon_units",
            F.expr(lat_q).alias("lat_q"),
            F.expr(lon_q).alias("lon_q"),
        )
        .select(
            "glat_units",
            "glon_units",
            F.expr(geohash5_code_sql("lat_q", "lon_q")).alias("code"),
        )
        .select(
            "glat_units",
            "glon_units",
            F.expr(geohash5_chars_sql("code")).alias("gh"),
        )
        .collect()
    )
    for r in got:
        lat = r["glat_units"] / 10_000.0 - 90.0
        lon = r["glon_units"] / 10_000.0 - 180.0
        assert r["gh"] == _py_geohash5(lat, lon), (lat, lon)


def test_radius_join_grid_covers_disk(spark, sf_dir):
    """The 3x3 grid probe must find EXACTLY the naive all-pairs
    within-radius set (the docstring's coverage claim: radius == cell
    edge implies |cell diff| <= 1)."""
    from java_etl_bi_generator_spark.queries import (
        _geo_customers,
        _geo_suppliers,
    )

    reg = registry()
    got = {
        r["s_suppkey"]: (r["n_within"], r["min_dist_units"])
        for r in reg["q_geo_radius_join"](spark, sf_dir).collect()
    }
    cust = _geo_customers(spark, sf_dir).collect()
    sup = _geo_suppliers(spark, sf_dir).collect()
    import math

    for s in sup:
        d2s = [
            (s["slat_units"] - c["lat_units"]) ** 2
            + (s["slon_units"] - c["lon_units"]) ** 2
            for c in cust
        ]
        within = [d for d in d2s if d <= 5000**2]
        exp_n = len(within)
        exp_min = (
            int(math.floor(math.sqrt(min(within)) + 0.5)) if within else None
        )
        assert got[s["s_suppkey"]] == (exp_n, exp_min)


def test_nearest_neighbor_is_argmin_within_block(spark, sf_dir):
    """q_geo_nearest_neighbor returns the true argmin (d2, point_id)
    over the 3x3 cell block, NULL when the block is empty."""
    from java_etl_bi_generator_spark.queries import (
        _geo_customers,
        _geo_suppliers,
    )

    reg = registry()
    got = {
        r["s_suppkey"]: (r["nn_point_id"], r["nn_dist_units"])
        for r in reg["q_geo_nearest_neighbor"](spark, sf_dir).collect()
    }
    cust = _geo_customers(spark, sf_dir).collect()
    import math

    for s in _geo_suppliers(spark, sf_dir).collect():
        sc_lat, sc_lon = s["slat_units"] // 5000, s["slon_units"] // 5000
        cands = [
            (
                (s["slat_units"] - c["lat_units"]) ** 2
                + (s["slon_units"] - c["lon_units"]) ** 2,
                c["point_id"],
            )
            for c in cust
            if abs(c["lat_units"] // 5000 - sc_lat) <= 1
            and abs(c["lon_units"] // 5000 - sc_lon) <= 1
        ]
        if not cands:
            assert got[s["s_suppkey"]] == (None, None)
        else:
            d2, pid = min(cands)
            assert got[s["s_suppkey"]] == (
                pid,
                int(math.floor(math.sqrt(d2) + 0.5)),
            )


def test_cidr_lpm_prefers_longest_prefix(spark, sf_dir):
    """Events whose second octet lands on a nation of their region must
    attribute to the /16 (nation) block, never the enclosing /8 — and
    every event is accounted for (matched + unmatched == |events|)."""
    reg = registry()
    rows = reg["q_ip_cidr_lpm"](spark, sf_dir).collect()
    total = sum(r["n_events"] for r in rows)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events
    by_len = {}
    for r in rows:
        by_len.setdefault(r["matched_len"], []).append(r["net_name"])
    # nation names only ever appear at /16, region names only at /8
    region_names = {
        r["r_name"]
        for r in spark.read.parquet(f"{sf_dir}/region.parquet").collect()
    }
    nation_names = {
        r["n_name"]
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    assert all(n in nation_names for n in by_len.get(16, []))
    assert all(n in region_names for n in by_len.get(8, []))
    assert by_len.get(0, []) == ["<unmatched>"] or 0 not in by_len
    # both match lengths actually occur at sf0.001 (16% of in-space ips
    # hit a nation block; the rest of octet-10..14 space hits the /8)
    assert 8 in by_len and 16 in by_len


def test_link_prediction_pairs_are_new_and_capped(spark, sf_dir):
    """Predicted pairs must NOT be existing edges, must be canonical
    (src < dst), and every common-neighbor count must be positive and
    achievable through low-degree centers only."""
    from java_etl_bi_generator_spark.queries import (
        _LP_CENTER_DEG_CAP,
        _copurchase_edges,
    )

    reg = registry()
    rows = reg["q_link_prediction"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 30
    edges = {
        (r["src"], r["dst"])
        for r in _copurchase_edges(spark, sf_dir).collect()
    }
    for r in rows:
        assert r["src"] < r["dst"]
        assert (r["src"], r["dst"]) not in edges
        assert r["common"] >= 1
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["deg_u"] >= r["common"] and r["deg_v"] >= r["common"]
    assert _LP_CENTER_DEG_CAP == 64


def test_trajectory_totals_consistent(spark, sf_dir):
    """Per-user trajectory stats: n_points sums over the top-30 must not
    exceed the event count; path and bbox are non-negative; n_cells is
    between 1 and n_points."""
    reg = registry()
    rows = reg["q_geo_trajectory"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 30
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["n_points"] for r in rows) <= n_events
    for r in rows:
        assert r["path_units"] >= 0
        assert r["bbox_area_units2"] >= 0
        assert 1 <= r["n_cells"] <= r["n_points"]


def test_radius_join_plan_is_equi_join(spark, sf_dir):
    """The spatial join must compile to a hash/sort-merge EQUI-join on
    the cell keys — never a BroadcastNestedLoopJoin / cartesian (the
    all-pairs form the grid exists to avoid)."""
    reg = registry()
    for name in ("q_geo_radius_join", "q_geo_nearest_neighbor"):
        plan = reg[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_theil_sen_matches_bruteforce(spark, sf_dir):
    """q_theil_sen must equal the literal median-of-pairwise-slopes
    recomputed in Python from the same daily aggregation."""
    import statistics

    reg = registry()
    got = {
        r["event_type"]: (r["n_pairs"], r["theil_sen_slope"])
        for r in reg["q_theil_sen"](spark, sf_dir).collect()
    }
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("vc").alias("y"))
        .collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append((r["d"], r["y"]))
    import math

    for et, pts in by_type.items():
        pts.sort()
        slopes = [
            (y2 - y1) / (d2 - d1)
            for i, (d1, y1) in enumerate(pts)
            for (d2, y2) in pts[i + 1:]
        ]
        med = statistics.median(slopes)
        exp = math.floor(med * 1e6 + 0.5) / 1e6
        n, s = got[et]
        assert n == len(slopes)
        assert abs(s - exp) < 1e-9, (et, s, exp)


def test_markov_removal_effects_sane(spark, sf_dir):
    """Removal effects: every channel's removed-conversion mass is
    <= base, effects are non-negative, and base is consistent across
    rows.  Removing a channel that carries journey mass must strictly
    reduce conversions at the fixtures."""
    reg = registry()
    rows = reg["q_markov_removal"](spark, sf_dir).collect()
    assert len(rows) >= 2
    bases = {r["base_conv_e9"] for r in rows}
    assert len(bases) == 1
    base = bases.pop()
    assert 0 < base <= 10**9
    for r in rows:
        assert 0 <= r["removed_conv_e9"] <= base
        assert r["removal_effect_e9"] == base - r["removed_conv_e9"]
        assert r["removal_effect_e9"] > 0


def test_cell_smooth_is_box_mean(spark, sf_dir):
    """Each smoothed value must equal the 3x3 neighbor sum / 9 of the
    independently recomputed cell-count raster."""
    from java_etl_bi_generator_spark.queries import _geo_customers

    reg = registry()
    got = reg["q_geo_cell_smooth"](spark, sf_dir).collect()
    counts: dict = {}
    for r in _geo_customers(spark, sf_dir).collect():
        key = (r["lat_units"] // 1000, r["lon_units"] // 1000)
        counts[key] = counts.get(key, 0) + 1
    import math

    for r in got:
        cl, cn = r["cell_lat"], r["cell_lon"]
        assert counts[(cl, cn)] == r["n_points"]
        box = sum(
            counts.get((cl + a, cn + b), 0)
            for a in (-1, 0, 1)
            for b in (-1, 0, 1)
        )
        assert box == r["box_sum"]
        exp = math.floor(box / 9.0 * 1e6 + 0.5) / 1e6
        assert abs(r["smoothed"] - exp) < 1e-12


def test_holt_forecast_matches_direct_recursion(spark, sf_dir):
    """The literal-weight weighted sum must reproduce the textbook Holt
    recursion run directly on the trailing window of each series (up to
    weight-quantization at 1e-9 and the output's 1e-2 pin)."""
    reg = registry()
    got = {
        r["event_type"]: (r["t_len"], r["forecast_cents"])
        for r in reg["q_holt_forecast"](spark, sf_dir).collect()
    }
    from java_etl_bi_generator_spark.functions.holt import (
        ALPHA,
        GAMMA,
        MAX_T,
    )

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("vc").alias("y"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["y"]))
    import math

    for et, pts in series.items():
        pts.sort()
        y = [v for _, v in pts][-MAX_T:]
        t_len, fc = got[et]
        assert t_len == len(y)
        if len(y) == 1:
            direct = float(y[0])
        else:
            l, b = float(y[0]), float(y[1] - y[0])
            for t in range(1, len(y)):
                ln = ALPHA * y[t] + (1 - ALPHA) * (l + b)
                b = GAMMA * (ln - l) + (1 - GAMMA) * b
                l = ln
            direct = l + b
        assert abs(fc - math.floor(direct * 100 + 0.5) / 100) < 0.05, (
            et,
            fc,
            direct,
        )


def test_wasserstein_matches_bruteforce(spark, sf_dir):
    """W1 must equal the brute-force CDF-gap sum over the 1-dollar
    buckets, recomputed in Python."""
    reg = registry()
    got = {
        r["event_type"]: (r["n_t"], r["w1_dollars"])
        for r in reg["q_wasserstein_1d"](spark, sf_dir).collect()
    }
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type", F.floor("value").cast("long").alias("b")
        )
        .collect()
    )
    from collections import Counter

    gc = Counter(r["b"] for r in rows)
    buckets = sorted(gc)
    n_g = len(rows)
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], Counter())[r["b"]] += 1
    import math

    for et, tc in by_type.items():
        n_t = sum(tc.values())
        cum_t = cum_g = 0
        s = 0
        for b in buckets:
            cum_t += tc.get(b, 0)
            cum_g += gc[b]
            s += abs(cum_t * n_g - cum_g * n_t)
        exp = math.floor(s / (n_t * n_g) * 1e9 + 0.5) / 1e9
        assert got[et][0] == n_t
        assert abs(got[et][1] - exp) < 1e-12, (et, got[et], exp)


def test_qini_curve_accounting(spark, sf_dir):
    """The final cumulative decile must account for every user; arm
    sizes are hash-split; qini at the last decile equals total treated
    conversions minus scaled control conversions."""
    reg = registry()
    rows = sorted(
        reg["q_qini_curve"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    last = rows[-1]
    assert last["cum_tn"] + last["cum_cn"] == n_users
    # monotone cumulative counts
    for a, b in zip(rows, rows[1:]):
        assert b["cum_tn"] >= a["cum_tn"] and b["cum_cn"] >= a["cum_cn"]
        assert b["cum_tc"] >= a["cum_tc"] and b["cum_cc"] >= a["cum_cc"]
    import math

    if last["cum_cn"] > 0:
        exp = last["cum_tc"] - last["cum_cc"] * last["cum_tn"] / last[
            "cum_cn"
        ]
        assert abs(
            rows[-1]["qini"] - math.floor(exp * 1e6 + 0.5) / 1e6
        ) < 1e-9


def test_random_walks_follow_edges(spark, sf_dir):
    """Every consecutive hop must be a real edge of the symmetrized
    graph; seeds are the capped hub set; re-evaluation reproduces the
    identical walks (no RNG)."""
    from java_etl_bi_generator_spark.queries import (
        _copurchase_sym,
        _hub_probes,
    )

    reg = registry()
    walks = reg["q_random_walks"](spark, sf_dir).collect()
    assert 0 < len(walks) <= 32
    sym = _copurchase_sym(spark, sf_dir)
    edges = {(r["src"], r["dst"]) for r in sym.collect()}
    seeds = {r["probe"] for r in _hub_probes(sym).collect()}
    for w in walks:
        assert w["walk_id"] in seeds
        path = [w["walk_id"], w["hop1"], w["hop2"], w["hop3"], w["hop4"]]
        for a, b in zip(path, path[1:]):
            assert (a, b) in edges, (a, b)
    again = reg["q_random_walks"](spark, sf_dir).collect()
    assert sorted(map(tuple, walks)) == sorted(map(tuple, again))


def test_fdr_bh_step_up_property(spark, sf_dir):
    """BH correctness: the rejected set is exactly ranks 1..k* where
    k* = max{k : p_k <= k*q/m}; the literal p-table matches
    math.erfc; rejections are a prefix of the p-sorted order."""
    import math

    from java_etl_bi_generator_spark.functions.normal import (
        P_E9_TABLE,
        Z_CELLS,
    )

    for zq in (0, 1, 100, 196, 599):
        exp = int(round(math.erfc((zq / 100.0) / math.sqrt(2.0)) * 1e9))
        assert P_E9_TABLE[zq] == exp
    assert len(P_E9_TABLE) == Z_CELLS
    reg = registry()
    rows = sorted(
        reg["q_fdr_bh"](spark, sf_dir).collect(), key=lambda r: r["k"]
    )
    m = len(rows)
    ks = [
        r["k"]
        for r in rows
        if r["p_e9"] * m * 10 <= r["k"] * 10**9
    ]
    kstar = max(ks) if ks else 0
    for r in rows:
        assert r["rejected"] == (r["k"] <= kstar)
    # p-values sorted by rank
    ps = [r["p_e9"] for r in rows]
    assert ps == sorted(ps)


def test_nelson_aalen_monotone_and_exact(spark, sf_dir):
    """Cumulative hazard must be non-decreasing, match the brute-force
    risk-set recomputation, and n_risk must never increase after the
    first death/censor day boundary conditions."""
    reg = registry()
    rows = sorted(
        reg["q_nelson_aalen"](spark, sf_dir).collect(),
        key=lambda r: r["d"],
    )
    assert rows
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "user_id",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
            "event_type",
        )
        .collect()
    )
    spans: dict = {}
    for r in ev:
        u = r["user_id"]
        e, dd, ld = spans.get(u, (10**9, None, -1))
        e = min(e, r["d"])
        if r["event_type"] == "purchase":
            dd = r["d"] if dd is None else min(dd, r["d"])
        ld = max(ld, r["d"])
        spans[u] = (e, dd, ld)
    prev = -1
    for r in rows:
        d = r["d"]
        n_risk = sum(
            1
            for (e, dd, ld) in spans.values()
            if e <= d <= (dd if dd is not None else ld)
        )
        deaths = sum(
            1 for (e, dd, ld) in spans.values() if dd == d
        )
        assert r["n_risk"] == n_risk and r["deaths"] == deaths, d
        assert r["cumhaz_e12"] >= prev
        prev = r["cumhaz_e12"]


def test_ab_bayes_normal_probability_consistent(spark, sf_dir):
    """P(B>A) must agree with the literal-table lookup of the computed
    z, sit in (0,1), and both arms must be populated."""
    from java_etl_bi_generator_spark.functions.normal import P_E9_TABLE

    reg = registry()
    [r] = reg["q_ab_bayes_normal"](spark, sf_dir).collect()
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert 0 < r["c_a"] < r["n_a"] or 0 < r["c_b"] < r["n_b"]
    assert r["z6"] is not None
    zq = min(599, int(abs(r["z6"]) * 100 + 0.5))
    p = P_E9_TABLE[zq]
    exp = 10**9 - p // 2 if r["z6"] >= 0 else p // 2
    assert r["prob_b_beats_a_e9"] == exp
    assert 0 < r["prob_b_beats_a_e9"] < 10**9


def test_pca_power_iteration_properties(spark, sf_dir):
    """The returned direction must be a unit-ish max-abs-normalized
    vector (max |component| == 1e6), reproducible, and aligned with a
    numpy power iteration on the same covariance (cosine > 0.99)."""
    import numpy as np

    reg = registry()
    rows = sorted(
        reg["q_pca_power_iteration"](spark, sf_dir).collect(),
        key=lambda r: r["dim"],
    )
    assert [r["dim"] for r in rows] == list(range(1, 65))
    v = np.array([r["v_e6"] for r in rows], dtype=float)
    assert int(np.abs(v).max()) == 10**6
    emb = [
        np.asarray(r["embedding"], dtype=float)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("embedding")
        .collect()
    ]
    X = np.stack(emb)
    Xq = np.floor(X * 1e6 + 0.5)
    C = np.cov(Xq.T, bias=True)
    w = np.ones(64)
    for _ in range(3):
        w = C @ w
        w = w / np.abs(w).max()
    cos = float(
        (v @ w) / (np.linalg.norm(v) * np.linalg.norm(w))
    )
    assert cos > 0.99, cos


def test_propensity_match_pairs_balanced(spark, sf_dir):
    """Matched count per stratum must be min(n_treated, n_control), and
    the ATT must equal the matched mean difference recomputed in
    Python."""
    from java_etl_bi_generator_spark.functions.geo import hash_units

    reg = registry()
    got = {
        r["stratum"]: r
        for r in reg["q_propensity_match"](spark, sf_dir).collect()
    }
    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.least(
                F.lit(20),
                F.sum(
                    F.when(F.col("event_type") == "click", 1).otherwise(0)
                ),
            ).alias("stratum"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("outcome"),
        )
        .withColumn("treat", hash_units(F.col("user_id"), "arm", 2))
        .collect()
    )
    import math
    from collections import defaultdict

    strata = defaultdict(lambda: {0: [], 1: []})
    for u in users:
        strata[u["stratum"]][u["treat"]].append(
            (u["user_id"], u["outcome"])
        )
    for st, arms in strata.items():
        t = sorted(arms[1])
        c = sorted(arms[0])
        k = min(len(t), len(c))
        row = got[st]
        assert row["n_treated"] == len(t)
        assert row["n_control"] == len(c)
        assert row["n_matched"] == k
        if k:
            dsum = sum(t[i][1] - c[i][1] for i in range(k))
            exp = math.floor(dsum / k * 1e6 + 0.5) / 1e6
            assert abs(row["att"] - exp) < 1e-9, (st, row["att"], exp)


def test_holt_backtest_beats_or_loses_honestly(spark, sf_dir):
    """Backtest accounting: n_days = series length - 2 per type; MAEs
    are positive; the ratio equals the two error sums' quotient."""
    reg = registry()
    rows = reg["q_holt_backtest"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_days"] >= 1
        assert r["mae_holt_cents"] > 0 and r["mae_naive_cents"] > 0
        assert r["holt_vs_naive"] > 0


def test_kde_density_matches_bruteforce(spark, sf_dir):
    """Density at each reported bucket must equal the literal-kernel
    convolution recomputed in Python."""
    from collections import Counter

    from java_etl_bi_generator_spark.functions.normal import (
        gaussian_kernel_rows,
    )

    reg = registry()
    got = reg["q_kde_density"](spark, sf_dir).collect()
    vals = [
        int(r["b"])
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.floor("value").cast("long").alias("b"))
        .collect()
    ]
    cnt = Counter(vals)
    kern = dict(gaussian_kernel_rows())
    for r in got:
        b = r["bucket"]
        exp = sum(cnt.get(b - o, 0) * w for o, w in kern.items())
        assert r["density_e9"] == exp, (b, r["density_e9"], exp)
        assert r["n_raw"] == cnt.get(b, 0)


def test_pacf_matches_statsmodels_free_reference(spark, sf_dir):
    """The integer Levinson-Durbin must agree with a float Durbin
    recursion on the same ACF to ~1e-6 (the pinning grid), and lag-1
    PACF must equal lag-1 ACF exactly."""
    reg = registry()
    rows = sorted(
        reg["q_pacf_durbin"](spark, sf_dir).collect(),
        key=lambda r: r["lag"],
    )
    assert [r["lag"] for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0]["acf_e9"] == rows[0]["pacf_e9"]
    rho = [1.0] + [r["acf_e9"] / 1e9 for r in rows]
    phi_prev = {1: rho[1]}
    expected = [rho[1]]
    for k in range(2, 6):
        num = rho[k] - sum(
            phi_prev[j] * rho[k - j] for j in range(1, k)
        )
        den = 1.0 - sum(phi_prev[j] * rho[j] for j in range(1, k))
        kk = num / den
        phi = {
            j: phi_prev[j] - kk * phi_prev[k - j] for j in range(1, k)
        }
        phi[k] = kk
        phi_prev = phi
        expected.append(kk)
    for r, e in zip(rows, expected):
        assert abs(r["pacf_e9"] / 1e9 - e) < 1e-5, (r["lag"], e)


def test_od_matrix_flows_from_trajectories(spark, sf_dir):
    """Each reported flow count must match the Python recomputation of
    consecutive-cell transitions, and self-loops must be absent."""
    from java_etl_bi_generator_spark.functions.geo import hash_units
    from collections import Counter

    reg = registry()
    got = reg["q_geo_od_matrix"](spark, sf_dir).collect()
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "user_id",
            "ts",
            "event_id",
            (hash_units(F.col("event_id"), "elat", 100_000) / 5000)
            .cast("long")
            .alias("cl"),
            (hash_units(F.col("event_id"), "elon", 100_000) / 5000)
            .cast("long")
            .alias("cn"),
        )
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["cl"], r["cn"])
        )
    flows = Counter()
    for evs in by_user.values():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            if (a[2], a[3]) != (b[2], b[3]):
                flows[(a[2], a[3], b[2], b[3])] += 1
    for r in got:
        key = (r["from_lat"], r["from_lon"], r["to_lat"], r["to_lon"])
        assert (r["from_lat"], r["from_lon"]) != (
            r["to_lat"],
            r["to_lon"],
        )
        assert flows[key] == r["n_trips"], (key, r["n_trips"])


def test_price_index_bounds(spark, sf_dir):
    """Fisher must lie between Laspeyres and Paasche (the classic
    inequality for positive baskets), all three positive, and the
    matched-part count must be positive and no larger than either
    year's part count."""
    reg = registry()
    [r] = reg["q_price_index"](spark, sf_dir).collect()
    assert r["n_parts"] > 0
    lo, hi = sorted([r["laspeyres"], r["paasche"]])
    assert 0 < lo <= hi
    assert lo - 1e-6 <= r["fisher"] <= hi + 1e-6


def test_dtw_matches_textbook_dp(spark, sf_dir):
    """The reported DTW must equal the classic O(n*m) DP recomputed in
    Python from the same daily series, and must be <= the straight
    pointwise L1 distance when lengths match (warping can only help)."""
    reg = registry()
    [r] = reg["q_dtw_distance"](spark, sf_dir).collect()
    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("vc").alias("y"))
        .collect()
    )
    a = sorted((x["day"], x["y"]) for x in daily if x["event_type"] == "click")
    b = sorted(
        (x["day"], x["y"]) for x in daily if x["event_type"] == "purchase"
    )
    ya, yb = [y for _, y in a], [y for _, y in b]
    assert (r["n_a"], r["n_b"]) == (len(ya), len(yb))
    INF = 10**15
    prev = [0] + [INF] * len(yb)
    for va in ya:
        cur = [INF] * (len(yb) + 1)
        for j, vb in enumerate(yb, start=1):
            cur[j] = abs(va - vb) + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    assert r["dtw_cents"] == prev[len(yb)]
    if len(ya) == len(yb):
        straight = sum(abs(x - y) for x, y in zip(ya, yb))
        assert r["dtw_cents"] <= straight


def test_binseg_split_maximizes_objective(spark, sf_dir):
    """The chosen split must achieve the maximum between-segment
    objective over all candidate days (recomputed exactly in Python)."""
    from fractions import Fraction

    reg = registry()
    [r] = reg["q_changepoint_binseg"](spark, sf_dir).collect()
    daily = sorted(
        (x["d"], x["y"])
        for x in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
        )
        .groupBy("d")
        .agg(F.sum("vc").alias("y"))
        .collect()
    )
    n = len(daily)
    s = sum(y for _, y in daily)
    best = None
    s_l = 0
    for idx, (d, y) in enumerate(daily[:-1], start=1):
        s_l += y
        n_l, n_r = idx, n - idx
        s_r = s - s_l
        obj = Fraction(s_l * s_l, n_l) + Fraction(s_r * s_r, n_r)
        if best is None or obj > best[0]:
            best = (obj, d, n_l, n_r)
    assert r["split_day"] == best[1]
    assert (r["n_l"], r["n_r"]) == (best[2], best[3])


def test_time_decay_attribution_shares(spark, sf_dir):
    """Shares must sum to ~1, weights must be dyadic fractions of 1e9,
    and older touches must never outweigh same-channel newer ones in
    the per-touch weighting rule."""
    reg = registry()
    rows = reg["q_attribution_time_decay"](spark, sf_dir).collect()
    assert rows
    total_share = sum(r["share"] for r in rows)
    assert abs(total_share - 1.0) < 1e-4
    for r in rows:
        assert r["touches"] > 0 and r["weight_e9"] > 0


def test_runs_test_counts(spark, sf_dir):
    """Runs/n1/n2 must match a Python recomputation from the daily
    series and its exact median rule."""
    reg = registry()
    [r] = reg["q_runs_test"](spark, sf_dir).collect()
    daily = sorted(
        (x["d"], x["y"])
        for x in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
        )
        .groupBy("d")
        .agg(F.sum("vc").alias("y"))
        .collect()
    )
    ys = sorted(y for _, y in daily)
    n = len(ys)
    if n % 2 == 0:
        m2 = ys[n // 2 - 1] + ys[n // 2]
    else:
        m2 = 2 * ys[n // 2]
    signs = [1 if y * 2 > m2 else 0 for _, y in daily]
    runs = sum(
        1
        for i, s in enumerate(signs)
        if i == 0 or signs[i - 1] != s
    )
    assert r["runs"] == runs
    assert r["n1"] == sum(signs)
    assert r["n2"] == n - sum(signs)


def test_mcnemar_discordant_counts(spark, sf_dir):
    """b and c must count exactly the discordant users, and chi2 must
    equal the continuity-corrected formula."""
    import math

    reg = registry()
    [r] = reg["q_mcnemar"](spark, sf_dir).collect()
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.dayofmonth(F.to_date("ts")) <= 7, 1).otherwise(0)
            ).alias("w1"),
            F.max(
                F.when(F.dayofmonth(F.to_date("ts")) >= 24, 1).otherwise(
                    0
                )
            ).alias("w4"),
        )
        .collect()
    )
    b = sum(1 for x in rows if x["w1"] == 1 and x["w4"] == 0)
    c = sum(1 for x in rows if x["w1"] == 0 and x["w4"] == 1)
    assert (r["b"], r["c"]) == (b, c)
    assert r["n_users"] == len(rows)
    if b + c:
        exp = (abs(b - c) - 1) ** 2 / (b + c)
        assert abs(r["chi2"] - math.floor(exp * 1e6 + 0.5) / 1e6) < 1e-9


def test_cmh_accounting(spark, sf_dir):
    """Stratum count must equal the segment count; sum_a must count
    exposed+outcome customers exactly; E and V sums positive."""
    from java_etl_bi_generator_spark.functions.geo import hash_units

    reg = registry()
    [r] = reg["q_cmh_test"](spark, sf_dir).collect()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    segs = cust.select("c_mktsegment").distinct().count()
    assert r["n_strata"] == segs
    big = {
        x["o_custkey"]
        for x in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_totalprice") > 450_000)
        .select("o_custkey")
        .distinct()
        .collect()
    }
    rows = cust.select(
        "c_custkey", hash_units(F.col("c_custkey"), "arm", 2).alias("e")
    ).collect()
    exp_a = sum(
        1 for x in rows if x["e"] == 1 and x["c_custkey"] in big
    )
    assert r["sum_a"] == exp_a
    assert r["sum_e_e9"] > 0 and r["sum_v_e9"] > 0


def test_spc_xbar_chart_consistency(spark, sf_dir):
    """Per-day xbar/r must match a Python recomputation of the 5-lowest
    -event_id subgroups; limits symmetric around the centerline."""
    import math

    reg = registry()
    rows = reg["q_spc_xbar"](spark, sf_dir).collect()
    assert rows
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
        )
        .collect()
    )
    by_day: dict = {}
    for r in ev:
        by_day.setdefault(r["d"], []).append((r["event_id"], r["vc"]))
    for r in rows:
        grp = sorted(by_day[r["d"]])[:5]
        assert len(grp) == 5
        vals = [v for _, v in grp]
        xbar = sum(vals) / 5.0
        assert abs(
            r["xbar_cents"] - math.floor(xbar * 100 + 0.5) / 100
        ) < 1e-9
        assert r["r"] == max(vals) - min(vals)
        assert abs(
            (r["ucl_cents"] - r["cl_cents"])
            - (r["cl_cents"] - r["lcl_cents"])
        ) < 0.02  # symmetric up to the 2dp pin


def test_hurst_in_plausible_range(spark, sf_dir):
    """One output row; chunk counts match floor(days/size); Hurst in a
    sane (0, 1.5) band for a real series."""
    reg = registry()
    [r] = reg["q_hurst_exponent"](spark, sf_dir).collect()
    days = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.to_date("ts").alias("day"))
        .distinct()
        .count()
    )
    assert r["n5"] <= days // 5
    assert r["n10"] <= days // 10
    assert r["n15"] <= days // 15
    assert 0.0 < r["hurst"] < 1.5


def test_cointegration_regression_is_ols(spark, sf_dir):
    """Beta/alpha must match a numpy least-squares fit of the same
    daily series, and gamma must equal the ADF(0) slope on the pinned
    residuals."""
    import numpy as np

    reg = registry()
    [r] = reg["q_cointegration"](spark, sf_dir).collect()
    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
        )
        .groupBy("d")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", F.col("vc"))
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("vc"))
            ).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .orderBy("d")
        .collect()
    )
    x = np.array([p["x"] for p in daily], dtype=float)
    y = np.array([p["y"] for p in daily], dtype=float)
    beta, alpha = np.polyfit(x, y, 1)
    assert abs(r["beta"] - beta) < 1e-4 * max(1.0, abs(beta))
    assert abs(r["alpha_cents"] - alpha) < max(1.0, abs(alpha) * 1e-4)
    e = np.floor((y - alpha - beta * x) * 100 + 0.5)
    de = np.diff(e)
    ep = e[:-1]
    gamma = float((ep * de).sum() / (ep * ep).sum())
    assert abs(r["gamma"] - gamma) < 1e-3
    assert r["n"] == len(daily) and r["m"] == len(daily) - 1


def test_kruskal_wallis_matches_scipy_free_reference(spark, sf_dir):
    """H must match a direct Python computation with tie-corrected
    average ranks over the same cent-grain values."""
    reg = registry()
    [r] = reg["q_kruskal_wallis"](spark, sf_dir).collect()
    pris = [
        "1-URGENT",
        "2-HIGH",
        "3-MEDIUM",
        "4-NOT SPECIFIED",
        "5-LOW",
    ]
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("v"),
        )
        .collect()
    )
    vals = sorted(x["v"] for x in rows)
    # tie-corrected average rank per value
    import itertools

    avg_rank = {}
    pos = 1
    for val, grp in itertools.groupby(vals):
        n = len(list(grp))
        avg_rank[val] = pos + (n - 1) / 2
        pos += n
    N = len(vals)
    groups = {p: [] for p in pris}
    for x in rows:
        groups[x["o_orderpriority"]].append(avg_rank[x["v"]])
    srn = sum(
        (sum(g) ** 2) / len(g) for g in groups.values() if g
    )
    h_raw = 12.0 / (N * (N + 1)) * srn - 3 * (N + 1)
    from collections import Counter

    tie3 = sum(t**3 - t for t in Counter(vals).values())
    h = h_raw / (1 - tie3 / (N**3 - N))
    assert abs(r["h"] - h) < 1e-4, (r["h"], h)
    for j, p in enumerate(pris):
        assert r[f"n{j}"] == len(groups[p])


def test_burrows_delta_properties(spark, sf_dir):
    """Deltas are non-negative and symmetric by construction; every
    pair covers the full 20-word panel; the source sets are the
    count-bounded tops."""
    reg = registry()
    rows = reg["q_burrows_delta"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert r["n_words"] == 20
        assert r["delta"] >= 0.0
    deltas = [r["delta"] for r in rows]
    assert deltas == sorted(deltas)


def test_levene_bf_matches_direct_computation(spark, sf_dir):
    """W must equal the Brown-Forsythe statistic recomputed in Python
    with exact group medians over the same cent-grain values."""
    import statistics

    reg = registry()
    [r] = reg["q_levene_bf"](spark, sf_dir).collect()
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.col("o_orderpriority").alias("g"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("y"),
        )
        .collect()
    )
    groups: dict = {}
    for x in rows:
        groups.setdefault(x["g"], []).append(x["y"])
    pris = sorted(groups)
    z = {}
    for g, ys in groups.items():
        ys.sort()
        n = len(ys)
        m2 = (
            ys[n // 2 - 1] + ys[n // 2] if n % 2 == 0 else 2 * ys[n // 2]
        )
        z[g] = [abs(2 * y - m2) for y in ys]
    N = sum(len(v) for v in z.values())
    k = len(z)
    zbar = sum(sum(v) for v in z.values()) / N
    between = sum(
        len(v) * (statistics.fmean(v) - zbar) ** 2 for v in z.values()
    )
    within = sum(
        sum((x - statistics.fmean(v)) ** 2 for x in v)
        for v in z.values()
    )
    w = (N - k) / (k - 1) * between / within
    assert abs(r["w_stat"] - w) < max(1e-4, abs(w) * 1e-6), (
        r["w_stat"],
        w,
    )


def test_dunn_posthoc_bh_property(spark, sf_dir):
    """10 pairs; ranks 1..10; rejected set is exactly the BH prefix;
    z values are antisymmetric-consistent (each pair appears once)."""
    reg = registry()
    rows = sorted(
        reg["q_dunn_posthoc"](spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    assert len(rows) == 10
    assert [r["k"] for r in rows] == list(range(1, 11))
    seen = set()
    for r in rows:
        assert (r["grp_a"], r["grp_b"]) not in seen
        seen.add((r["grp_a"], r["grp_b"]))
        assert r["grp_a"] < r["grp_b"]
    ks = [
        r["k"] for r in rows if r["p_e9"] * 10 * 20 <= r["k"] * 10**9
    ]
    kstar = max(ks) if ks else 0
    for r in rows:
        assert r["rejected_5pct"] == (r["k"] <= kstar)
    ps = [r["p_e9"] for r in rows]
    assert ps == sorted(ps)


def test_effect_sizes_match_bruteforce(spark, sf_dir):
    """Pair counts and both effect sizes must match a direct Python
    recomputation (all-pairs for Cliff's delta at sf0.001 scale)."""
    import math
    import statistics

    reg = registry()
    [r] = reg["q_effect_sizes"](spark, sf_dir).collect()
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("v"),
        )
        .collect()
    )
    a = [x["v"] for x in rows if x["o_orderpriority"] == "1-URGENT"]
    b = [x["v"] for x in rows if x["o_orderpriority"] == "5-LOW"]
    assert (r["n1"], r["n2"]) == (len(a), len(b))
    gt = sum(1 for x in a for y in b if x > y)
    lt = sum(1 for x in a for y in b if x < y)
    tie = len(a) * len(b) - gt - lt
    assert (r["n_gt"], r["n_lt"], r["n_tie"]) == (gt, lt, tie)
    delta = (gt - lt) / (len(a) * len(b))
    assert abs(r["cliffs_delta"] - delta) < 1e-6
    m1, m2 = statistics.fmean(a), statistics.fmean(b)
    ss1 = sum((x - m1) ** 2 for x in a)
    ss2 = sum((x - m2) ** 2 for x in b)
    d = (m1 - m2) / math.sqrt((ss1 + ss2) / (len(a) + len(b) - 2))
    assert abs(r["cohens_d"] - d) < 1e-4


def test_anderson_darling_matches_reference(spark, sf_dir):
    """A2 must approximate the textbook statistic computed with full
    erfc precision (the 0.01-z quantization bounds the difference), and
    the weighted-sum accounting must be internally consistent."""
    import math
    import statistics

    reg = registry()
    [r] = reg["q_anderson_darling"](spark, sf_dir).collect()
    daily = sorted(
        x["y"]
        for x in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
        )
        .groupBy("d")
        .agg(F.sum("vc").alias("y"))
        .collect()
    )
    n = len(daily)
    assert r["n"] == n
    m = statistics.fmean(daily)
    sd = math.sqrt(sum((y - m) ** 2 for y in daily) / (n - 1))
    zs = [(y - m) / sd for y in daily]

    def phi(z):
        return 0.5 * math.erfc(-z / math.sqrt(2))

    a2_ref = -n - (1.0 / n) * sum(
        (2 * (i + 1) - 1)
        * (math.log(phi(zs[i])) + math.log(1 - phi(zs[n - 1 - i])))
        for i in range(n)
    )
    # quantized-z + pinned-ln approximation: generous tolerance
    assert abs(r["a2"] - a2_ref) < 0.05, (r["a2"], a2_ref)
    assert r["a2_star"] > r["a2"] * 0.99
