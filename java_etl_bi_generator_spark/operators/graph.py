"""Connected components over near-duplicate pairs — the final step of
corpus dedup: candidate pairs (from MinHash/SimHash/cosine) form a graph;
each connected component is one duplicate cluster, and one representative
per cluster is kept.

Implemented as iterative label propagation (small-star style: every node
adopts the minimum label in its neighborhood, repeat to fixpoint) — the
standard Spark-native formulation when GraphFrames is unavailable.  Each
iteration is one join + one aggregation; iteration count is O(component
diameter), and near-dup clusters are shallow in practice.  The loop is
driver-side control flow only; all data stays distributed, with
``lineage.cut_lineage`` every round to cut the growing plan (reliable
``checkpoint()`` when a checkpoint dir is configured — the cluster-safe
form — else ``localCheckpoint``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..lineage import cut_lineage


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 20,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(id_a, id_b) edges -> (node, component) with component = min node id
    in the component.

    ALTERNATING LARGE-STAR / SMALL-STAR [Kiveris, Lattanzi, Mirrokni,
    Rastogi & Vassilvitskii 2014, "Connected Components in MapReduce
    and Beyond"] — the round-11 optimization replacing the
    propagate + pointer-jump label loop: on the LSH star-edge graph at
    sf0.1 the label loop needed 16 rounds (long bucket chains), this
    converges in 6 (measured 16.3 s -> 6.8 s, outputs bit-identical —
    OPTIMIZATION_r11.md change 21).  Each round contracts the EDGE set:

      large-star: for every node u with m(u) = min(Γ(u) ∪ {u}), rewire
        every larger neighbor v > u to (v, m(u)) — strictly decreasing
        parents, halves chain depth;
      small-star: for every parent a over its smaller neighbors
        Γ⁻(a), rewire all of them plus a itself to min(Γ⁻(a)) — merges
        sibling stars.

    Both steps preserve the component partition (every rewire stays
    inside a neighborhood), so when the edge set becomes a disjoint
    min-rooted star forest each star IS one original component and the
    root its minimum.  Termination is EXACT, not a fingerprint: one
    aggregate per round counts nodes that are both parent and child
    (chain) or children with two parents (unmerged siblings) — zero
    violations  <=>  star forest.  Every endpoint of the current edge
    set survives each round (a node appears as some child or some
    parent in both rewires), so the final left-join from the original
    node spine only coalesces true singletons (self-loop inputs).

    The edge table is lineage-cut ONCE up front: ``pairs`` is usually
    the tail of an expensive pipeline (LSH banding, fuzzy scoring), and
    without the cut every round's rewires would replay that whole
    subtree — measured 115 s -> 8 s on a 50k-doc near-dup clustering.
    Per-round edge sets are pinned with LAZY cuts (the convergence
    aggregate is the round's one action and materializes the pinned
    RDD in passing — the round-11 job-count lesson)."""
    E = cut_lineage(
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
    )
    nodes = E.select(F.col("u").alias("node")).distinct()
    stars = E.filter(F.col("u") > F.col("v")).select(
        F.col("u").alias("s"), F.col("v").alias("t")
    )
    for _ in range(max_iterations):
        # large-star: (v, m(u)) for v in Γ(u), v > u; m ≤ u < v keeps
        # every emitted edge strictly parent-pointing (a > b).
        lm = (
            E.groupBy("u")
            .agg(F.min("v").alias("__mn"))
            .select("u", F.least(F.col("u"), F.col("__mn")).alias("__m"))
        )
        ls = (
            E.join(lm, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("__m").alias("b"))
            .distinct()
        )
        # small-star: per parent a, rewire Γ⁻(a) ∪ {a} to min(Γ⁻(a)).
        sm = ls.groupBy("a").agg(F.min("b").alias("__m"))
        ss = (
            ls.join(sm, "a")
            .select(F.col("b").alias("x"), F.col("__m").alias("m"))
            .unionAll(sm.select(F.col("a").alias("x"), F.col("__m").alias("m")))
            .filter(F.col("x") != F.col("m"))
            .select(F.col("x").alias("s"), F.col("m").alias("t"))
            .distinct()
        )
        stars = cut_lineage(ss, eager=False)
        # Exact star-forest test (the round's one action): a node
        # violating is either both parent and child (a chain survives)
        # or a child with >1 parent (sibling stars not yet merged).
        violations = (
            stars.select(
                F.col("t").alias("n"),
                F.lit(1).alias("p"),
                F.lit(0).alias("c"),
            )
            .unionAll(
                stars.select(
                    F.col("s").alias("n"),
                    F.lit(0).alias("p"),
                    F.lit(1).alias("c"),
                )
            )
            .groupBy("n")
            .agg(F.sum("p").alias("np"), F.sum("c").alias("nc"))
            .filter(
                ((F.col("np") > 0) & (F.col("nc") > 0)) | (F.col("nc") > 1)
            )
            .count()
        )
        if violations == 0:
            break
        E = stars.select(F.col("s").alias("u"), F.col("t").alias("v")).unionAll(
            stars.select(F.col("t").alias("u"), F.col("s").alias("v"))
        )
    # min-parent extraction: a no-op at convergence (each child has
    # exactly one parent in a star forest) that keeps the one-row-per-
    # node contract even if the iteration cap is ever hit unconverged.
    roots = stars.groupBy("s").agg(F.min("t").alias("__comp")).select(
        F.col("s").alias("node"), "__comp"
    )
    return nodes.join(roots, "node", "left").select(
        "node", F.coalesce(F.col("__comp"), F.col("node")).alias("component")
    )


def dedup_keep_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Drop all but the min-id member of every duplicate cluster."""
    comps = connected_components(pairs)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
    symmetric: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank in EXACT integer arithmetic.

    ``edges`` is a directed (src, dst) edge list; the node set is every
    node with out-degree >= 1 (feed symmetric edges for an undirected
    graph, which also removes dangling-node mass loss).  Ranks are scaled
    bigints (initial mass = ``scale`` per node); each step is

        rank' = (100-d)%*scale + d% * sum(rank_src div out_degree_src)

    with truncating integer division throughout — bit-identical across
    engines (no float summation-order sensitivity), so the result is
    hash-checkable against an unrolled SQL oracle.

    Scale shape: one shuffle per iteration (groupBy dst), the out-degree
    table joins broadcast-size, and lineage is cut per iteration with
    ``lineage.cut_lineage`` — reliable ``checkpoint()`` to cluster
    storage when a checkpoint dir is configured, ``localCheckpoint``
    locally; the plan per iteration is identical either way.

    ``symmetric=True`` declares the edge list symmetric (every (a,b) has
    its (b,a)) — then every node with out-degree also has in-degree, the
    per-iteration left join against the node spine is an identity, and
    the update reduces to renaming the contribution aggregate: one join +
    one agg per round instead of two joins.  Results are bit-identical
    to the general path for symmetric inputs.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    # (src, dst, out_degree) — static per run, reused every iteration.
    # LAZY cut (the connected_components lesson): there is no per-round
    # action in this loop — the terminal action materializes every
    # pinned RDD as it runs, so an eager cut would only add a separate
    # full-materialization job.  Safe: deterministic input, and the
    # first materialization caches the blocks every iteration reuses.
    # (A/B at sf0.1, min-of-6: lazy and eager are within the ±0.15 s
    # noise band here; lazy is kept for the job-count reduction.)
    ed = cut_lineage(edges.join(deg, "src"), eager=False)
    base = (100 - damping_pct) * scale // 100
    ranks = deg.select(F.col("src").alias("node"), F.lit(scale).alias("rank"))
    for it in range(iterations):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", F.expr("rank div out_degree").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        upd = (
            F.lit(base)
            + F.expr(f"({damping_pct} * coalesce(in_mass, 0)) div 100")
        ).alias("rank")
        if symmetric:
            # symmetric graph: contrib's dst set IS the node set
            ranks = contrib.select(F.col("dst").alias("node"), upd)
        else:
            ranks = (
                deg.select(F.col("src").alias("node"))
                .join(contrib, F.col("node") == contrib.dst, "left")
                .select("node", upd)
            )
        # Cut every 2nd round: lineage depth stays bounded at two
        # join+agg levels — well inside codegen/stack limits — while
        # halving the materialization jobs an every-round cut would
        # schedule.  The final round stays uncut (its consumer is the
        # terminal action; materializing first would only add a job).
        # On a cluster each cut is a reliable checkpoint (see
        # cut_lineage), so failure recovery replays at most one round.
        # LAZY: with no per-round action, the terminal action runs the
        # whole chain as one job and persists each pinned RDD in
        # passing — eager cuts were measured as pure job-scheduling
        # overhead on the small-graph benchmarks (profiled via
        # scripts/profile_query.py: q_pagerank 22 jobs, none above
        # 0.2 cpu-s).
        if it % 2 == 1 and it != iterations - 1:
            ranks = cut_lineage(ranks, eager=False)
    return ranks


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over an undirected graph.

    ``edges`` must be canonical (src < dst, distinct).  Triangles are
    enumerated once each via the oriented wedge join (a<b<c):
    e(a,b) ⋈ e(b,c) ⋈ e(a,c) — two self-joins, both equi-joins that
    Catalyst plans as shuffle-hash/sort-merge on the node key, never a
    cartesian.  Returns (node, n_triangles) for every node in >= 1
    triangle, each triangle crediting all three corners.
    """
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a2"), F.col("dst").alias("c2"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .select("a", "b", "c")
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def bellman_ford(
    edges: DataFrame,
    sources: DataFrame,
    iterations: int,
    weight_col: str | None = None,
    inf: int = 2**40,
) -> DataFrame:
    """Bounded-iteration multi-source shortest paths in EXACT integer
    arithmetic — Bellman-Ford relaxation; with ``weight_col=None`` every
    edge costs 1 and the result is multi-source BFS hop levels.

    ``edges`` is a directed (src, dst[, weight]) list (feed symmetric
    edges for an undirected graph); ``sources`` is a one-column ``node``
    frame.  The distance spine holds every node that appears on either
    edge end, seeded 0 for sources and the ``inf`` sentinel otherwise;
    each round relaxes

        dist'[v] = least(dist[v], min over in-edges (dist[u] + w(u,v)))

    so after k rounds every node whose shortest path uses <= k edges
    carries its exact distance (integer weights => no float
    summation-order sensitivity; the trajectory is bit-identical to an
    unrolled k-level SQL oracle).  Unreached nodes keep the sentinel and
    are dropped from the result.

    Scale shape: one shuffle per round (the min-relaxation groupBy on
    ``dst``); already-settled infinite rows are filtered out of the
    relaxation probe side, so each round's join carries only the reached
    frontier's closure; lineage is cut every second round through
    ``lineage.cut_lineage`` (reliable ``checkpoint()`` on a cluster with
    a checkpoint dir, ``localCheckpoint`` locally), the same bounded-plan
    discipline as ``pagerank_integer``.
    """
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    ed = cut_lineage(
        edges.select(F.col("src"), F.col("dst"), w.alias("__w")), eager=False
    )
    nodes = (
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct()
    )
    dist = nodes.join(
        sources.select(F.col("node"), F.lit(0).cast("bigint").alias("__s")),
        "node",
        "left",
    ).select(
        "node",
        F.coalesce(F.col("__s"), F.lit(inf).cast("bigint")).alias("dist"),
    )
    for it in range(iterations):
        relax = (
            ed.join(
                dist.filter(F.col("dist") < inf), ed.src == dist.node
            )
            .select("dst", (F.col("dist") + F.col("__w")).alias("__cand"))
            .groupBy("dst")
            .agg(F.min("__cand").alias("__nd"))
        )
        dist = dist.join(relax, dist.node == relax.dst, "left").select(
            "node",
            F.least(
                F.col("dist"), F.coalesce(F.col("__nd"), F.col("dist"))
            ).alias("dist"),
        )
        # LAZY for the same reason as pagerank_integer's round cuts: no
        # per-round action, so the terminal action materializes the
        # pinned RDDs in one job instead of one eager job per cut.
        if it % 2 == 1 and it != iterations - 1:
            dist = cut_lineage(dist, eager=False)
    return dist.filter(F.col("dist") < inf)


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Bounded k-core peel: each round drops every node whose current
    degree is < k, plus its incident edges; survivors are returned with
    their residual degree after ``rounds`` peels.

    ``edges`` is a SYMMETRIC directed edge list (both directions of each
    undirected edge), so degree = out-degree on ``src``.  The peel is
    confluent — the k-core is the unique maximal subgraph of min-degree
    >= k, independent of removal order — so if the peel converges within
    the round budget the result IS the exact k-core; either way the
    bounded trajectory is bit-identical to an unrolled SQL oracle (pure
    integer counting, no floats).

    Scale shape: one degree groupBy + two semi-joins per round (the same
    shuffle budget as a Bellman-Ford relaxation); the edge frame only
    shrinks, and lineage is cut every second round so the plan stays
    bounded (``lineage.cut_lineage``: reliable ``checkpoint()`` on a
    cluster with a checkpoint dir, ``localCheckpoint`` locally).
    """
    e = edges.select("src", "dst")
    for r in range(rounds):
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        e = e.join(keep, "src", "left_semi").join(
            keep.select(F.col("src").alias("dst")), "dst", "left_semi"
        )
        # LAZY (see pagerank_integer): the terminal action materializes
        # the pinned edge RDDs in passing; the peel's own keep-join
        # consumes each round's edges twice, and the persisted blocks
        # cover both consumers.
        if r % 2 == 1 and r != rounds - 1:
            e = cut_lineage(e, eager=False)
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("src").alias("node"), "deg")
    )


def label_propagation_mode(sym: DataFrame, rounds: int = 4) -> DataFrame:
    """Synchronous mode-label propagation [Raghavan, Albert & Kumara
    2007] — the near-linear community detector: every node starts as
    its own community, and each round adopts the label MOST FREQUENT
    among its neighbors, ties broken to the SMALLEST label (the
    deterministic synchronous variant; the paper's random asynchronous
    order is not reproducible across engines).  Fixed ``rounds`` keeps
    the trajectory engine-identical (unrolled CTE oracle), the same
    bounded-iteration contract as kcore_peel / pagerank_integer.
    Distinct from connected_components: mode-adoption lets DENSE
    regions keep their own label against a bridge edge, so one thin
    connection does not merge two communities.

    Scale shape: per round one edges⋈labels shuffle + one (node, label)
    count + one per-node argmax window — all on the edge grain;
    ``cut_lineage`` per round stops plan replay (the connected_components
    lesson).  Returns (node, label)."""
    # LAZY cuts throughout (see pagerank_integer): the loop has no
    # per-round action, so the terminal action materializes every
    # pinned RDD in one job; each round's labels have a single consumer
    # (the next round) and the mode-window tie-break is deterministic.
    edges = cut_lineage(sym.select("src", "dst"), eager=False)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    w = Window.partitionBy("__n").orderBy(
        F.col("__c").desc(), F.col("label").asc()
    )
    for _ in range(rounds):
        counts = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("__n"), "label")
            .groupBy("__n", "label")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        labels = cut_lineage(
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("__n").alias("node"), "label"),
            eager=False,
        )
    return labels
