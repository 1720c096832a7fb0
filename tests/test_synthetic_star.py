"""Synthetic TPC-H-shaped star generator (sources/synthetic_star.py):
schema fidelity to the driver fixtures, referential integrity by
construction, determinism, and that the declared relational queries run
with non-empty results on generated data."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from java_etl_bi_generator_spark.catalog import load_table
from java_etl_bi_generator_spark.queries import registry
from java_etl_bi_generator_spark.sources.synthetic_star import generate_star


@pytest.fixture(scope="module")
def star_dir(spark):
    tmp = tempfile.mkdtemp(prefix="star_test_")
    generate_star(spark, tmp, num_orders=2000, partitions=4)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_schemas_match_fixture(spark, sf_dir, star_dir):
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        fix = load_table(spark, sf_dir, t)
        gen = load_table(spark, star_dir, t)
        assert [f.name for f in gen.schema.fields] == [
            f.name for f in fix.schema.fields
        ], t
        # timestamp vs timestamp_ntz is a fixture-regeneration artifact
        # (the driver has shipped ts columns in three physical shapes —
        # see streaming/source.py); every consumer casts to date, so the
        # timestamp FAMILY is the contract
        def _norm(dt):
            return "timestamp" if "imestamp" in type(dt).__name__ else dt

        assert [_norm(f.dataType) for f in gen.schema.fields] == [
            _norm(f.dataType) for f in fix.schema.fields
        ], t


def test_referential_integrity_by_construction(spark, star_dir):
    li = load_table(spark, star_dir, "lineitem")
    od = load_table(spark, star_dir, "orders")
    cu = load_table(spark, star_dir, "customer")
    assert li.count() == 4 * od.count()
    assert (
        li.join(od, li.l_orderkey == od.o_orderkey, "left_anti").count() == 0
    )
    assert (
        od.join(cu, od.o_custkey == cu.c_custkey, "left_anti").count() == 0
    )
    # region names in the canonical fixture order
    regions = dict(
        (r["r_regionkey"], r["r_name"])
        for r in load_table(spark, star_dir, "region").collect()
    )
    assert regions[2] == "ASIA" and regions[0] == "AFRICA"


def test_generation_is_deterministic(spark, star_dir):
    tmp2 = tempfile.mkdtemp(prefix="star_test2_")
    try:
        generate_star(spark, tmp2, num_orders=2000, partitions=7)
        a = load_table(spark, star_dir, "lineitem")
        b = load_table(spark, tmp2, "lineitem")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    finally:
        shutil.rmtree(tmp2, ignore_errors=True)


def test_tpch_queries_run_nonempty_on_generated_star(spark, star_dir):
    qs = registry()
    for name in ("q_tpch_q1", "q_tpch_q3", "q_tpch_q5", "q_tpch_q6",
                 "q_join_star_3way", "q_star_flagship"):
        assert qs[name](spark, star_dir).count() > 0, name
