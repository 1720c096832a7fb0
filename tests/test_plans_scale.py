"""Scale-path variants: accuracy pins for sketch-based alternatives to
exact plans (the operators reached for past the exact plans' measured
boundaries — SCALING.md round-4 probes)."""

from __future__ import annotations

import pyspark.sql.functions as F

from java_etl_bi_generator_spark.queries import registry


def test_rolling_distinct_hll_tracks_exact(spark, sf_dir):
    """The HLL register estimate stays within its documented error band of the exact WAU."""
    exact = {
        r["day"]: (r["dau"], r["wau_7d"])
        for r in registry()["q_rolling_distinct"](spark, sf_dir).collect()
    }
    approx = registry()["q_rolling_distinct_hll"](spark, sf_dir).collect()
    assert len(approx) == len(exact)
    for r in approx:
        dau, wau = exact[r["day"]]
        assert abs(r["dau_approx"] - dau) <= max(2, 0.05 * dau)
        assert abs(r["wau_7d_approx"] - wau) <= max(2, 0.05 * wau)


def test_rolling_distinct_hll_fanout_is_day_grain(spark, sf_dir):
    """The join fans out register tables at (day, bucket) grain — the
    pre-join aggregate must collapse events to <= m rows per day BEFORE
    the range join (the property that makes the plan
    volume-independent).  Physical plans print top-down (join above its
    children), so nothing ABOVE the join line may touch user_id: the
    user grain must be gone before the fanout."""
    plan = (
        registry()["q_rolling_distinct_hll"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    join_at = plan.index("Join")
    assert "user_id" not in plan[:join_at]
    # and the register build (max(rho) keyed by day+bucket) is below it
    assert "user_id" in plan[join_at:]


def test_data_expectations_is_single_pass(spark, sf_dir):
    """All rules evaluate in ONE scan + one aggregate — the property that
    makes a 50-rule gate cost the same as a count(*)."""
    from java_etl_bi_generator_spark.plans.plan_tools import explain_formatted

    import re

    plan = explain_formatted(registry()["q_data_expectations"](spark, sf_dir))
    # formatted explain prints each node once in the tree and once in the
    # detail list — count distinct scan NODES, not substring occurrences
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_kmv_set_ops_estimates_track_exact(spark, sf_dir):
    """KMV union/intersection estimates stay within the sketch's
    expected error band (k=64 -> ~12% std err; allow 3 sigma) of the
    exact counts on real testdata, and the mergeable invariants hold."""
    row = registry()["q_kmv_set_ops"](spark, sf_dir).collect()[0]
    assert row["k"] == 64
    assert 0 <= row["n_both"] <= 64
    ru = row["est_union"] / row["exact_union"]
    assert 0.6 < ru < 1.5, row
    if row["exact_inter"] >= 64:  # only meaningful with a full sketch
        ri = row["est_inter"] / row["exact_inter"]
        assert 0.4 < ri < 2.0, row
