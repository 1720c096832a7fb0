"""Operators: star-schema toolkit (reference parity), dedup family and
similarity search (north-star LLM-pipeline surface), graph/temporal/
interval primitives — re-exported here so a user of the reference can
discover the engine surface in one place."""

from .asof import asof_join, asof_join_forward, asof_join_nearest
from .dedup import (
    containment_pairs,
    cut_passages,
    duplicated_passages,
    exact_dedup,
    exact_dedup_groups,
    minhash_lsh_candidates,
    minhash_lsh_dup_clusters,
    ngram_jaccard_pairs,
    prefix_jaccard_pairs,
    simhash64,
    winnow_fingerprints,
)
from .graph import (
    bellman_ford,
    connected_components,
    kcore_peel,
    pagerank_integer,
    triangle_counts,
)
from .intervals import coalesce_intervals
from .rank import (
    global_cumsum,
    global_rank,
    grouped_cumsum,
    grouped_lag,
    grouped_rank,
    grouped_topk,
    ntile_from_rank,
)
from .similarity import (
    brute_force_topk,
    hyperplane_signature,
    ivf_topk,
    lsh_bucket_topk,
    mmr_topk,
    random_projection,
)
from .star import build_calendar_dim, build_dimension, build_fact

__all__ = [
    "asof_join",
    "asof_join_forward",
    "asof_join_nearest",
    "bellman_ford",
    "brute_force_topk",
    "build_calendar_dim",
    "build_dimension",
    "build_fact",
    "coalesce_intervals",
    "connected_components",
    "containment_pairs",
    "cut_passages",
    "duplicated_passages",
    "exact_dedup",
    "exact_dedup_groups",
    "global_cumsum",
    "global_rank",
    "grouped_cumsum",
    "grouped_lag",
    "grouped_rank",
    "grouped_topk",
    "hyperplane_signature",
    "ivf_topk",
    "kcore_peel",
    "lsh_bucket_topk",
    "minhash_lsh_candidates",
    "minhash_lsh_dup_clusters",
    "mmr_topk",
    "ngram_jaccard_pairs",
    "ntile_from_rank",
    "pagerank_integer",
    "prefix_jaccard_pairs",
    "random_projection",
    "simhash64",
    "triangle_counts",
    "winnow_fingerprints",
]
