"""Similarity search over embedding columns (north-star; BASELINE.json).

- ``brute_force_topk``: exact cosine top-k — one scan, JVM-side
  zip_with/aggregate dot product, ``TakeOrderedAndProject`` for the top-k
  (no global sort materialization).  The correctness baseline.
- ``ivf_topk``: IVF-style approximate search — vectors are pre-assigned to
  cells (any clustering works; here the testdata's ``label`` or a provided
  assignment), cell centroids are tiny and broadcast; the query probes only
  the ``nprobe`` nearest cells.  At 100 TB this turns a full-corpus scan
  into a partition-pruned scan of nprobe/ncells of the data — the scale
  path (cf. IVF in FAISS; public algorithm).
- ``lsh_bucket_topk``: random-hyperplane (SimHash) bucketing over
  deterministic pseudo-planes — same bucket first, exact rerank inside.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.rounding import pround
from ..functions.vectors import as_double_array, cosine_similarity


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    scored = embeddings.select(
        F.col(id_col),
        pround(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
    )
    # orderBy + limit plans as TakeOrderedAndProject: per-partition heaps,
    # only k rows cross the final exchange.
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def cell_centroids(
    embeddings: DataFrame, cell_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Mean vector per cell: posexplode + groupBy(cell, pos) + re-assemble.
    Map-side partial aggregation keeps the shuffle at |cells| x dim rows."""
    dims = (
        embeddings.select(
            F.col(cell_col),
            F.posexplode(as_double_array(vec_col)).alias("pos", "v"),
        )
        .groupBy(cell_col, "pos")
        .agg(F.avg("v").alias("c"))
    )
    return dims.groupBy(cell_col).agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "c"))
        ).alias("pc")
    ).select(
        cell_col, F.transform("pc", lambda s: s["c"]).alias("centroid")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Approximate top-k: score centroids, keep ``nprobe`` nearest cells,
    exact-rerank only vectors in those cells (broadcast semi-join on the
    tiny probed-cell list -> partition pruning when data is clustered/
    bucketed by cell on disk)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    cents = cell_centroids(embeddings, cell_col, vec_col)
    probed = (
        cents.select(
            cell_col, cosine_similarity(F.col("centroid"), q).alias("cs")
        )
        .orderBy(F.desc("cs"), F.asc(cell_col))
        .limit(nprobe)
        .select(cell_col)
    )
    candidates = embeddings.join(F.broadcast(probed), on=cell_col, how="left_semi")
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def _md5_signed_fold(v: F.Column, dim: int, key_prefix: str) -> F.Column:
    """Left-fold Σ_d ±v_d with the ±1 sign of dim d drawn from the
    parity of md5(f"{key_prefix}{d}") — the shared seedless weight
    family behind both the hyperplane LSH signature and the JL random
    projection (one salt namespace per consumer keeps the two sign
    conventions independent).  Explicit left-assoc addition pins the
    IEEE summation order so an oracle can reproduce it term-for-term."""
    import hashlib

    signs = [
        (
            1.0
            if int(hashlib.md5(f"{key_prefix}{d}".encode()).hexdigest(), 16)
            % 2
            == 0
            else -1.0
        )
        for d in range(dim)
    ]
    # One parsed literal sign array + a sequential ``aggregate`` fold
    # instead of dim unrolled ``element_at * lit`` terms chained with
    # ``+``: the unrolled form cost dim×planes py4j round-trips to
    # BUILD and a same-sized tree to analyze on every job (the
    # LSH/ANN family's wall clock was driver-side — OPTIMIZATION_r11.md).
    # The fold is the identical left-assoc IEEE sequence: aggregate
    # folds elements in order, ((0.0+t0)+t1)+…, and 0.0+t0 == t0 for
    # every representable t0 except the sign of an exact -0.0 — which
    # cannot change any consumer here (the signature compares acc >= 0,
    # where ±0.0 agree, and a JL component only flips to -0.0 if EVERY
    # term is ±0.0, i.e. an all-zeros vector).
    terms = F.zip_with(
        v,
        F.expr(
            "array(" + ",".join(f"{s:.1f}D" for s in signs) + ")"
        ),
        lambda x, s: x * s,
    )
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)


def hyperplane_signature(
    vec_col, num_planes: int = 8, dim: int = 64
) -> F.Column:
    """Deterministic pseudo-random hyperplane sign bits -> int bucket id.

    Plane p, dim d weight = ±1 derived from md5(p,d) parity — portable,
    seedless, no stored model.  Good enough for bucketing; not a trained
    index."""
    v = as_double_array(vec_col)
    bits = []
    for p in range(num_planes):
        acc = _md5_signed_fold(v, dim, f"{p},")
        bits.append(F.when(acc >= 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe only the query's hyperplane bucket, exact-rerank inside it."""
    dim = len(query_vec)
    bucketed = embeddings.withColumn(
        "__bucket", hyperplane_signature(F.col(vec_col), num_planes, dim)
    )
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame([(query_vec,)], f"qv array<double>").withColumn(
        "__bucket", hyperplane_signature(F.col("qv"), num_planes, dim)
    ).select("__bucket")
    candidates = bucketed.join(F.broadcast(qdf), on="__bucket", how="left_semi")
    return brute_force_topk(candidates.drop("__bucket"), query_vec, k, id_col, vec_col)


def mmr_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    n_candidates: int = 20,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversified top-k: Maximal Marginal Relevance (Carbonell &
    Goldstein) — greedily pick the candidate maximizing
    ``lam·sim(q,d) − (1−lam)·max_{s∈S} sim(d,s)``, so near-duplicates of
    already-selected results are penalized (the RAG rerank that stops a
    retriever returning five copies of the same paragraph).

    Scale split: all corpus-sized work is distributed — the top-N
    candidate pull is a TakeOrderedAndProject scan, the N² candidate
    pair sims a broadcast self-join of the N-row frame.  The k-step
    greedy itself is INHERENTLY sequential (each pick changes the next
    penalty) and runs on the driver over the two collected score tables
    — O(N·k) scalar ops on N=20 rows, the same bounded-driver-sync class
    as fetching the query vector.  All similarities are pinned BEFORE
    the greedy, so the selection is engine-exact and hash-checks against
    a recursive-CTE oracle.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    scored = embeddings.select(
        F.col(id_col),
        as_double_array(vec_col).alias("__v"),
        pround(cosine_similarity(as_double_array(vec_col), q), 6).alias(
            "__simq"
        ),
    )
    # persist: the ps self-join consumes cand on both legs and the simq
    # collect a third time — without the pin the corpus-wide top-N scan
    # would re-execute per consumer (same reason minhash_lsh_candidates
    # persists its bucket table)
    cand = scored.orderBy(F.desc("__simq"), F.asc(id_col)).limit(
        n_candidates
    ).persist()
    a = cand.select(
        F.col(id_col).alias("__ia"), F.col("__v").alias("__va")
    )
    b = cand.select(
        F.col(id_col).alias("__ib"), F.col("__v").alias("__vb")
    )
    ps = a.join(F.broadcast(b), F.col("__ia") != F.col("__ib")).select(
        "__ia",
        "__ib",
        pround(cosine_similarity(F.col("__va"), F.col("__vb")), 6).alias(
            "__sim"
        ),
    )
    # the penalty weight is derived ONCE as 1.0 - lam (an IEEE op both
    # engines perform identically); a hand-written 0.3 literal would NOT
    # equal 1.0 - 0.7 and the greedy could diverge on near-ties
    mu = 1.0 - lam
    simq = {r[0]: r["__simq"] for r in cand.select(id_col, "__simq").collect()}
    pair = {(r["__ia"], r["__ib"]): r["__sim"] for r in ps.collect()}
    cand.unpersist()
    selected: list = []
    remaining = set(simq)
    while remaining and len(selected) < k:
        best = min(
            remaining,
            key=lambda d: (
                -(
                    lam * simq[d]
                    - mu * max(pair[(d, s)] for s in selected)
                    if selected
                    else lam * simq[d]
                ),
                d,
            ),
        )
        selected.append(best)
        remaining.discard(best)
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(i + 1, int(v)) for i, v in enumerate(selected)],
        f"rank int, {id_col} bigint",
    )


def random_projection(
    vec_col: str = "embedding",
    out_dim: int = 8,
    dim: int = 64,
) -> list[F.Column]:
    """Johnson-Lindenstrauss-style ±1 random projection to ``out_dim``
    components: out_j = (Σ_d s(j,d)·v_d) / sqrt(out_dim), signs from
    md5("proj:{j},{d}") parity via the shared ``_md5_signed_fold`` — the
    same seedless, engine-portable weight family as
    ``hyperplane_signature`` under its own salt namespace (Achlioptas,
    "Database-friendly random projections", PODS 2001: ±1 entries
    satisfy the JL lemma; public).  Returns pure Columns (no DataFrame
    binding) — select them on any frame carrying ``vec_col``.

    Scale shape: pure per-row codegen arithmetic (dim × out_dim fused
    multiply-adds), no shuffle, no UDF — the cheap first stage before
    bucketing/ANN on the reduced vectors.
    """
    import math

    v = as_double_array(F.col(vec_col))
    scale = F.lit(math.sqrt(float(out_dim)))
    return [
        (_md5_signed_fold(v, dim, f"proj:{j},") / scale).alias(f"p{j}")
        for j in range(out_dim)
    ]
