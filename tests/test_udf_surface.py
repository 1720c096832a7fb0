"""UDF escape hatches (SURVEY.md §2.13): the engine needs zero Python UDFs
for reference parity (every quirk function is a Column expression), but
the standard hatches must work when users bring custom logic.  These tests
pin the two shapes that matter: Arrow-vectorized pandas_udf matching its
built-in equivalent, and applyInPandas for UDAF-shaped per-group logic."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf

from java_etl_bi_generator_spark.catalog import load_table
from java_etl_bi_generator_spark.functions.locale_ptbr import parse_ptbr_decimal

from .conftest import SF_DIR


def test_pandas_udf_matches_builtin_expression(spark):
    """A vectorized pandas_udf re-implementation of the pt-BR parse must
    agree with the codegen expression everywhere (the expression stays the
    production path; the UDF is the extension template)."""

    @pandas_udf("double")
    def parse_ptbr_py(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return 0.0
            v = v.strip().replace(".", "").replace(",", ".")
            try:
                return float(v)
            except ValueError:
                return 0.0

        return s.map(one)

    df = spark.createDataFrame(
        [("1.234,56",), ("30000",), ("",), (None,), ("x2,",), ("-9,9",)],
        "s string",
    )
    rows = df.select(
        parse_ptbr_decimal("s").alias("expr"), parse_ptbr_py("s").alias("udf")
    ).collect()
    assert all(r["expr"] == r["udf"] for r in rows)


def test_apply_in_pandas_group_logic(spark):
    """applyInPandas: per-group custom aggregate (here: acctbal spread) —
    grouped Arrow batches, one group per call."""
    cu = load_table(spark, SF_DIR, "customer")

    def spread(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_nationkey": [pdf["c_nationkey"].iloc[0]],
                "bal_spread": [
                    round(pdf["c_acctbal"].max() - pdf["c_acctbal"].min(), 2)
                ],
            }
        )

    got = {
        r["c_nationkey"]: r["bal_spread"]
        for r in cu.groupBy("c_nationkey")
        .applyInPandas(spread, "c_nationkey int, bal_spread double")
        .collect()
    }
    want = {
        r["c_nationkey"]: round(r["mx"] - r["mn"], 2)
        for r in cu.groupBy("c_nationkey")
        .agg(F.max("c_acctbal").alias("mx"), F.min("c_acctbal").alias("mn"))
        .collect()
    }
    assert got == want


def test_udtf_sentences_one_to_many_and_determinism(spark, sf_dir):
    """The UDTF escape hatch (q_udtf_sentences): emits >= 1 row per
    non-empty doc in the bounded subset, indexes segments densely from
    0, and two runs are identical (deterministic table function)."""
    from java_etl_bi_generator_spark.queries import registry

    df = registry()["q_udtf_sentences"](spark, sf_dir)
    rows = df.collect()
    again = registry()["q_udtf_sentences"](spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    assert rows, "bounded subset must be non-empty"
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["seg_idx"])
        assert r["seg_chars"] >= 1 and r["seg_tokens"] >= 1
    for doc_id, idxs in by_doc.items():
        assert sorted(idxs) == list(range(len(idxs))), doc_id
