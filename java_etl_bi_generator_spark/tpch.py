"""TPC-H query set over the driver's TPC-H-ish tables — the standard BI
workload a star-schema engine must run (readme.md:3 names Power BI /
Tableau as the reference's consumers; TPC-H is the canonical stand-in).

Adaptations to the synthetic schema are per-query-documented: the testdata
lacks partsupp, l_commitdate/l_receiptdate/l_shipmode, o_comment/
o_shippriority and c_phone, so Q2/Q4/Q9/Q11/Q12/Q13/Q15-Q17/Q20-Q22 are
not implementable verbatim; the ten below are faithful (TPC-H spec is
public).  Float discipline follows queries.py: decimal sums (`dsum`),
portable rounding for ratios (`pround`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .functions.rounding import dsum, pround
from .queries import T, q

# l_extendedprice(2dp) * (1-l_discount)(2dp) is an exact 4-decimal value;
# * (1+l_tax)(2dp) an exact 6-decimal value.
_DISC_PRICE = "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))"
_CHARGE = (
    "CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))"
)


@q("q_tpch_q1")
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary report (full aggregate set)."""
    li = T(spark, sf_dir, "lineitem")
    f = li.filter(F.col("l_shipdate").cast("date") <= F.lit("2001-06-30").cast("date"))
    n = F.count(F.lit(1))
    return f.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        F.sum(F.expr(_DISC_PRICE)).cast("double").alias("sum_disc_price"),
        F.sum(F.expr(_CHARGE)).cast("double").alias("sum_charge"),
        pround(dsum(F.col("l_quantity")) / n, 6).alias("avg_qty"),
        pround(dsum(F.col("l_extendedprice")) / n, 6).alias("avg_price"),
        pround(dsum(F.col("l_discount")) / n, 6).alias("avg_disc"),
        n.alias("count_order"),
    )


@q("q_tpch_q3")
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority (no o_shippriority column -> omitted)."""
    li = T(spark, sf_dir, "lineitem")
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer")
    d = F.lit("1998-06-30").cast("date")
    return (
        li.filter(F.col("l_shipdate").cast("date") > d)
        .join(od.filter(F.col("o_orderdate").cast("date") < d),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu.filter(F.col("c_mktsegment") == "BUILDING"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("odate"))
        .agg(F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@q("q_tpch_q5")
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local supplier volume (ASIA, 1996)."""
    li = T(spark, sf_dir, "lineitem")
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer")
    su = T(spark, sf_dir, "supplier")
    na = T(spark, sf_dir, "nation")
    re = T(spark, sf_dir, "region")
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
        )
        .groupBy("n_name")
        .agg(F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue"))
    )


@q("q_tpch_q6")
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting revenue change."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.expr("CAST(l_extendedprice * l_discount AS DECIMAL(18,4))")
            ).cast("double").alias("revenue")
        )
    )


@q("q_tpch_q7")
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations."""
    li = T(spark, sf_dir, "lineitem")
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer")
    su = T(spark, sf_dir, "supplier")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue"))
    )


@q("q_tpch_q8")
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share (NATION_3 in AMERICA, PROMO parts)."""
    li = T(spark, sf_dir, "lineitem")
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer")
    su = T(spark, sf_dir, "supplier")
    pt = T(spark, sf_dir, "part")
    na_c = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    na_s = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    re = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = (
        li.join(F.broadcast(pt.filter(F.col("p_type") == "PROMO")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(na_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(re), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(na_s), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.expr(_DISC_PRICE).alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        pround(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                  .otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@q("q_tpch_q10")
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting (top 20 by lost revenue)."""
    li = T(spark, sf_dir, "lineitem")
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer")
    na = T(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            od.filter(
                (F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date"))
                & (F.col("o_orderdate").cast("date") < F.lit("1997-04-01").cast("date"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@q("q_tpch_q14")
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect (PROMO revenue share in 1996-03)."""
    li = T(spark, sf_dir, "lineitem")
    pt = T(spark, sf_dir, "part")
    j = li.filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    ).join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.expr(_DISC_PRICE))
        .otherwise(F.lit(0).cast("decimal(18,4)"))
    ).cast("double")
    total = F.sum(F.expr(_DISC_PRICE)).cast("double")
    return j.agg(pround(F.lit(100.0) * promo / total, 6).alias("promo_revenue_pct"))


@q("q_tpch_q18")
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers (order qty sum > 220)."""
    li = T(spark, sf_dir, "lineitem")
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 220)
    )
    return (
        big.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("odate"),
            "o_totalprice",
            "total_qty",
        )
    )


@q("q_tpch_q19")
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue (OR of brand/size/qty bands)."""
    li = T(spark, sf_dir, "lineitem")
    pt = T(spark, sf_dir, "part")
    j = li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity").between(20, 40)))
    )
    return j.filter(cond).agg(
        F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue")
    )
