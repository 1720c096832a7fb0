"""Property-based checks (SURVEY.md §5.2(3)) with hypothesis — the quirk
functions must hold over arbitrary inputs, not just the fixture values."""

from __future__ import annotations

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
