"""Physical-plan assertions — the properties that keep these queries fast
at scale must survive refactors: pruned scans, pushed filters, broadcast
star joins, TakeOrderedAndProject top-k, whole-stage codegen."""

from __future__ import annotations

from java_etl_bi_generator_spark.plans import (
    explain_formatted,
    explain_simple,
    plan_contains,
    scan_read_schemas,
)
from java_etl_bi_generator_spark.queries import registry


def test_projection_prunes_scan(spark, sf_dir):
    df = registry()["q_project"](spark, sf_dir)
    schemas = scan_read_schemas(df)
    assert len(schemas) == 1
    # 4 of lineitem's 11 columns — nothing else reaches the scan
    assert schemas[0].count(":") == 4


def test_filter_is_pushed_to_scan(spark, sf_dir):
    df = registry()["q_filter"](spark, sf_dir)
    plan = explain_formatted(df)
    assert "PushedFilters:" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThan(l_quantity,30.0)" in plan


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = registry()["q_star_flagship"](spark, sf_dir)
    plan = explain_simple(df)
    assert plan.count("BroadcastHashJoin") == 4  # orders/customer/nation/region
    assert "SortMergeJoin" not in plan


def test_topk_plans_take_ordered(spark, sf_dir):
    assert plan_contains(
        registry()["q_topk"](spark, sf_dir), "TakeOrderedAndProject"
    )


def test_groupby_has_partial_aggregation(spark, sf_dir):
    plan = explain_simple(registry()["q_groupby_sum"](spark, sf_dir))
    # partial + final HashAggregate around one exchange: map-side combine
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1


def test_whole_stage_codegen_covers_scan_agg(spark, sf_dir):
    from java_etl_bi_generator_spark.plans.plan_tools import _explain

    # codegen mode reports generated subtrees even under AQE's lazy plan
    plan = _explain(registry()["q_groupby_sum"](spark, sf_dir), "codegen")
    assert "WholeStageCodegen subtree" in plan
