#!/usr/bin/env python
"""End-to-end BI customer-analytics build on this engine (north-star
surface; BASELINE.json) — the segmentation feed a dashboard or CRM export
consumes, with every global ordering running DISTRIBUTED (operators/rank:
range-partitioned two-phase rank + broadcast offsets; no single-partition
window anywhere):

  1. customer base       (one aggregation over orders: recency/frequency/
                          monetary, exact decimal money)
  2. RFM quartiles       (three orderings fused into ONE two-phase rank
                          pass over a stacked slim projection)
  3. Pareto 80% set      (distributed running share of revenue; flags the
                          customers producing the first 80%)
  4. concentration       (Gini coefficient + decile Lorenz curve from the
                          same distributed ranks)
  5. write               (segments parquet partitioned by r_score — each
                          recency band lands in its own directory)

Run::

    python examples/customer_analytics.py [sf_dir] [output_dir]

Defaults: /root/testdata/sf0.01 -> /tmp/customer_analytics_out.  The same
script distributes unchanged on a cluster: every stage is a DataFrame
plan, and the only driver-side values are the tiny offset tables the rank
operator broadcasts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from java_etl_bi_generator_spark.catalog import load_table
from java_etl_bi_generator_spark.operators.rank import (
    global_cumsum,
    global_rank,
    grouped_rank,
    ntile_from_rank,
)
from java_etl_bi_generator_spark.session import get_spark


def build(spark, sf_dir: str, out_dir: str) -> dict[str, float]:
    orders = load_table(spark, sf_dir, "orders")

    # 1. customer base — exact decimal money
    base = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )

    # 2. RFM quartiles: stack the three metrics as order-isomorphic bigint
    #    sort keys, rank the 3N union in one two-phase pass, pivot back
    stacked = base.select(
        "o_custkey",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("metric"),
                    (-F.unix_date(F.col("last_order"))).cast("bigint").alias("sk"),
                ),
                F.struct(
                    F.lit("f").alias("metric"),
                    (-F.col("frequency")).cast("bigint").alias("sk"),
                ),
                F.struct(
                    F.lit("m").alias("metric"),
                    # exact: monetary is DECIMAL(18,2), so *100 is an
                    # integral decimal and the bigint cast is lossless
                    # (with double money this roundtrip would collide
                    # adjacent cent values — see q_rfm, which keeps the
                    # scaled bigint cents sum end-to-end instead)
                    (-(F.col("monetary") * 100)).cast("bigint").alias("sk"),
                ),
            )
        ).alias("mx"),
    ).select("o_custkey", "mx.metric", "mx.sk")
    ranked = grouped_rank(
        stacked,
        ["metric"],
        [F.col("sk"), F.col("o_custkey")],
        rank_col="rk",
        total_col="n",
    )
    tiles = ranked.select(
        "o_custkey",
        "metric",
        ntile_from_rank(F.col("rk"), F.col("n"), 4).alias("tile"),
    )
    scores = tiles.groupBy("o_custkey").agg(
        F.max(F.when(F.col("metric") == "r", F.col("tile"))).alias("r_score"),
        F.max(F.when(F.col("metric") == "f", F.col("tile"))).alias("f_score"),
        F.max(F.when(F.col("metric") == "m", F.col("tile"))).alias("m_score"),
    )

    # 3. Pareto flag: distributed running revenue share, richest first
    cum = global_cumsum(
        base.select("o_custkey", "monetary"),
        [F.col("monetary").desc(), F.col("o_custkey")],
        "monetary",
        cum_col="cum_rev",
        total_col="total_rev",
    ).select(
        "o_custkey",
        (
            F.col("cum_rev").cast("double") / F.col("total_rev").cast("double")
        ).alias("cum_share"),
    )

    segments = (
        base.join(scores, "o_custkey")
        .join(cum, "o_custkey")
        .withColumn("pareto80", F.col("cum_share") <= 0.8)
    )

    # 4. concentration: Gini from ascending distributed ranks + Lorenz deciles
    xr = global_rank(
        base.select("o_custkey", F.col("monetary").alias("x")),
        [F.col("x").asc(), F.col("o_custkey").asc()],
        rank_col="i",
        total_col="n",
    )
    g = xr.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("double")).alias("sx"),
        F.sum(F.col("i").cast("decimal(19,0)") * F.col("x"))
        .cast("double")
        .alias("six"),
    ).select(
        (
            F.lit(2.0) * F.col("six") / (F.col("n") * F.col("sx"))
            - (F.col("n") + 1.0) / F.col("n")
        ).alias("gini")
    )
    gini = g.collect()[0]["gini"]  # one scalar for the report, not data

    # 5. write, partitioned by recency band
    seg_path = os.path.join(out_dir, "segments")
    segments.write.mode("overwrite").partitionBy("r_score").parquet(seg_path)

    n_customers = segments.count()
    n_pareto = segments.filter("pareto80").count()
    return {
        "n_customers": float(n_customers),
        "n_pareto80": float(n_pareto),
        "gini": round(float(gini), 4),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/customer_analytics_out"
    )
    spark = get_spark(app_name="customer-analytics-example")
    stats = build(spark, sf_dir, out_dir)
    print({k: v for k, v in sorted(stats.items())})


if __name__ == "__main__":
    main()
