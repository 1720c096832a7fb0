#!/usr/bin/env python
"""End-to-end graph analytics on the co-purchase graph this engine's
star data induces (north-star surface; BASELINE.json) — the product-
affinity feed a recommender or assortment planner consumes, every stage
an iterative-but-bounded DataFrame plan (one shuffle per round, lineage
cut on a cadence, exact integer arithmetic — see operators/graph.py):

  1. edges               (within-basket pairs over the bounded part
                          subset; single shuffle, never corpus-quadratic)
  2. PageRank            (5 rounds, scaled-bigint mass, broadcast degrees)
  3. reach               (multi-source BFS hop levels from the hub seed
                          set, 6 bounded Bellman-Ford rounds)
  4. weighted distance   (5-round Bellman-Ford, endpoint-derived weights)
  5. triangles + degree  (oriented wedge join; plain count over the
                          unique symmetrized edges)
  6. write               (one node-profile parquet: rank, hops, distance,
                          triangles, degree per part)

Run::

    python examples/graph_analytics.py [sf_dir] [output_dir]

Defaults: /root/testdata/sf0.01 -> /tmp/graph_analytics_out.  The same
script distributes unchanged on a cluster: iteration control flow is
driver-side only; all data stays partitioned, and a configured
checkpoint dir upgrades every lineage cut to reliable storage.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from java_etl_bi_generator_spark.operators.graph import (
    bellman_ford,
    pagerank_integer,
    triangle_counts,
)
from java_etl_bi_generator_spark.queries import (
    _copurchase_edges,
    _copurchase_sym,
    _hub_sources,
)
from java_etl_bi_generator_spark.session import get_spark


def build(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    # the same canonical (distinct, src<dst) edge builders the declared
    # graph queries use — one definition, no drift
    edges = _copurchase_edges(spark, sf_dir)
    sym = _copurchase_sym(spark, sf_dir)

    ranks = pagerank_integer(sym, iterations=5, symmetric=True).select(
        "node", F.col("rank").alias("rank_scaled")
    )

    hubs = _hub_sources(sym)
    hops = bellman_ford(sym, hubs, iterations=6).select(
        "node", F.col("dist").alias("hub_hops")
    )
    wdist = bellman_ford(
        sym.withColumn(
            "w", ((F.col("src") + F.col("dst")) % 7 + 1).cast("bigint")
        ),
        hubs,
        iterations=5,
        weight_col="w",
    ).select("node", F.col("dist").alias("hub_distance"))

    tris = triangle_counts(edges)
    # sym rows are unique (distinct canonical pairs, both directions), so
    # degree is a plain count — the same shape the q_degree_distribution
    # fix measured 42s -> 25s at 60M lineitem vs count_distinct
    degrees = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )

    profile = (
        ranks.join(hops, "node", "left")
        .join(wdist, "node", "left")
        .join(tris.withColumnRenamed("node", "n2"),
              F.col("node") == F.col("n2"), "left")
        .drop("n2")
        .join(degrees, "node", "left")
        .select(
            "node", "rank_scaled", "hub_hops", "hub_distance",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.coalesce("degree", F.lit(0)).alias("degree"),
        )
    )
    out = os.path.join(out_dir, "node_profile")
    profile.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    return {"nodes": n}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graph_analytics_out"
    spark = get_spark(app_name="graph_analytics")
    t0 = time.time()
    stats = build(spark, sf_dir, out_dir)
    print(
        f"graph analytics: {stats['nodes']} node profiles -> {out_dir} "
        f"in {time.time() - t0:.1f}s"
    )
    assert stats["nodes"] > 0


if __name__ == "__main__":
    main()
