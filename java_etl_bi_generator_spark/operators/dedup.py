"""Deduplication family for large-scale training-data pipelines
(north-star; BASELINE.json).  All variants are built from shuffle-on-key
primitives that scale linearly with data volume — never pairwise over the
full corpus.

- exact        : content hash -> groupBy.  One shuffle on a 64-hex key.
- minhash_lsh  : shingle -> minhash signature -> band buckets -> join
                 within buckets (classic MinHash+LSH banding, cf. MMDS ch.3).
                 Pure SQL expressions (md5-derived hash family), no Spark ML
                 dependency, no UDF.
- simhash      : 64-bit simhash fingerprint from token md5s; near-dups =
                 fingerprints at small hamming distance within buckets.
- ngram_jaccard: exact Jaccard over word shingles via explode + join on
                 shingle — only candidate pairs sharing a shingle are ever
                 materialized.
- winnowing    : per-doc fingerprint selection (Schleimer, Wilkerson,
                 Aiken, "Winnowing: Local Algorithms for Document
                 Fingerprinting", SIGMOD 2003 — public): hash every
                 shingle, keep the minimum of each sliding window of
                 hashes.  Guarantees any sufficiently long match between
                 two docs shares a fingerprint.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.rounding import pround
from ..functions.text import word_shingles


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct content hash: the kept id (min), dup count."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_hash"), id_col)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly one row (min id) per distinct text content."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """Per-doc MinHash signature: for each of ``num_hashes`` hash functions,
    the min hash over the doc's distinct shingles.

    The hash family is Kirsch-Mitzenmacher double hashing (h1 + i*h2 over
    two halves of ONE md5 per shingle — public technique from the Bloom
    filter literature): one digest instead of ``num_hashes`` digests per
    shingle, which is the dominant cost at corpus scale.

    Layout: explode shingles (rows = docs x shingles), derive the family
    per row, partial-aggregate min per doc — one shuffle on doc id,
    map-side combined.  No pairwise work.
    """
    mask = (1 << 60) - 1  # keep everything positive in bigint arithmetic
    # h1: 60 bits, h2: 48 bits — i*h2 + h1 stays far below 2^63 even for
    # large hash families (ANSI mode makes long overflow an error).
    # Pin the shingle+md5 map at the configured shuffle width (r12): the
    # doc scan is a single parquet split at bench scale, so the entire
    # per-shingle digest work — the documented dominant cost — ran in
    # ONE task (profiled: q_dedup_near_clusters execution 0 spent
    # ~3 cpu-s in 1-2 tasks).  Same deterministic-key idiom as the
    # landed r11 doc-table spreads (q_dedup_cut / q_rake_keywords /
    # q_cdc_chunking); the id-keyed exchange is one bounded pass of the
    # text bytes that buys full-width hashing at every scale.
    df = df.repartition(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")),
        F.col(id_col),
    )
    shingled = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias("sh"),
    ).select(
        id_col,
        F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring(F.md5("sh"), 17, 12), 16, 10).cast("bigint").alias("h2"),
    )
    aggs = [
        F.min(
            (F.col("h1") + F.lit(i) * F.col("h2")).bitwiseAND(F.lit(mask))
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def lsh_band_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, bucket) rows: the signature split into ``bands`` bands,
    each hashed to a bucket id — the shared first stage of candidate-pair
    enumeration and star-edge clustering."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh_{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: signature split into
    ``bands`` bands of ``num_hashes/bands`` rows; docs sharing any band
    bucket become a candidate pair.  The join is an equi-join on
    (band, bucket-hash) — shuffle-partitioned, broadcast-free, and skew
    handled by AQE; only same-bucket pairs are generated.

    Scale bound: pair ENUMERATION is inherently |bucket|² — a boilerplate
    mega-cluster of 60k identical docs is 1.8e9 pairs by definition
    (measured: 500k synthetic docs with 1/8 duplicate mass over 64
    sources put the pairwise join at ~90 s where every other corpus op
    stayed sub-5 s).  When the goal is dedup GROUPS rather than scored
    pairs, use ``minhash_lsh_dup_clusters`` below (star edges — linear in
    bucket size, identical components), and always collapse exact
    duplicates (exact_dedup_groups) before pair scoring."""
    buckets = lsh_band_buckets(
        df, text_col, id_col, num_hashes, bands, shingle_n
    )
    # The self-join would otherwise recompute the whole shingle->signature
    # pipeline for each side; materialize it once (at corpus scale you
    # would write signatures to a table instead).
    buckets = buckets.persist()
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col(f"a.band") == F.col(f"b.band"),
                F.col(f"a.bucket") == F.col(f"b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def minhash_lsh_dup_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_iterations: int = 20,
) -> DataFrame:
    """Near-dup CLUSTERS from LSH banding at linear cost: each (band,
    bucket) emits STAR edges (bucket-min -> member) instead of all
    |bucket|² pairs.  A star spans exactly the nodes the bucket clique
    spans, so connected components over star edges equal components over
    the full candidate-pair graph — the output contract of
    "group near-duplicates" is preserved while a 60k-doc boilerplate
    bucket costs 60k edge rows, not 1.8e9.  (Same trick FAISS-style IVF
    uses for posting lists, and the reason production dedup pipelines
    cluster via union-find over buckets rather than materialized pairs.)

    One shuffle to (band, bucket) for the window min; dup-heavy buckets
    are single window partitions processed linearly.  Returns
    (node, component) per doc that shares at least one bucket."""
    from pyspark.sql import Window

    from .graph import connected_components

    buckets = lsh_band_buckets(
        df, text_col, id_col, num_hashes, bands, shingle_n
    )
    w = Window.partitionBy("band", "bucket")
    edges = (
        buckets.withColumn("root", F.min(id_col).over(w))
        .filter(F.col(id_col) > F.col("root"))
        .select(F.col("root").alias("id_a"), F.col(id_col).alias("id_b"))
        .distinct()
    )
    return connected_components(edges, max_iterations=max_iterations)


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Tokens -> md5 -> first 16 hex nibbles = 64 bits; per bit position the
    weighted vote (+1 if set, -1 if not) is summed over tokens; the sign of
    each vote becomes the fingerprint bit.  Expressed as explode(token) x
    explode(bit position) + one groupBy — scales as docs x tokens x 64 with
    map-side combine, no UDF.

    The fingerprint is emitted as two unsigned 32-bit halves
    (simhash_hi/simhash_lo) rather than one int64: setting bit 63 of a
    signed 64-bit value is engine-divergent (Java shiftleft wraps
    negative, DuckDB raises an overflow) — max shift per half is 31, so
    both engines agree exactly.  Hamming distance over the pair is
    bit_count(hi⊕hi') + bit_count(lo⊕lo').
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("tok"),
    ).withColumn("h", F.md5(F.col("tok")))
    # bit (pos) of the 64-bit prefix of md5: nibble = hex digit pos/4,
    # tested against mask 1 << (3 - pos%4)
    bit_set = F.expr(
        "(CAST(conv(substring(h, CAST(pos DIV 4 AS INT) + 1, 1), 16, 10) AS INT)"
        " & shiftleft(1, 3 - CAST(pos % 4 AS INT))) > 0"
    )
    votes = (
        toks.select(
            id_col, F.explode(F.sequence(F.lit(0), F.lit(63))).alias("pos"), "h"
        )
        .withColumn("vote", F.when(bit_set, 1).otherwise(-1))
        .groupBy(id_col, "pos")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(
                (F.col("v") > 0) & (F.col("pos") >= 32),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos - 32 AS INT))"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash_hi"),
        F.sum(
            F.when(
                (F.col("v") > 0) & (F.col("pos") < 32),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos AS INT))"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash_lo"),
    )


def embedding_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity — exact pairwise
    scoring (the verification / small-candidate-set path).

    At corpus scale the pairwise join is the wrong shape: bucket first
    (``similarity.lsh_bucket_topk``'s hyperplane signature, or IVF cells)
    and run this only within buckets.  Kept exact here so it can be
    oracle-checked.
    """
    from ..functions.rounding import pround as _pr
    from ..functions.vectors import as_double_array, cosine_similarity

    a = embeddings.select(
        F.col(id_col).alias("id_a"), as_double_array(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), as_double_array(vec_col).alias("vb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            _pr(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle.

    explode -> self-equi-join on shingle -> count intersection -> Jaccard =
    |A∩B| / (|A|+|B|-|A∩B|).  The join key is the shingle, so common
    shingles are the skew risk at scale — AQE skew-join splitting plus an
    optional document-frequency cap handle it (callers can pre-filter
    stop-shingles).
    """
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("sh"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.sh") == F.col("b.sh"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            pround(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 2,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003).

    Per document: hash every ``shingle_n``-word shingle (first 8 hex chars
    of md5 -> 32-bit int, portable across engines), then keep the minimum
    hash of each sliding ``window`` of consecutive shingle hashes.  The
    distinct selected hashes are the document's fingerprints; any shared
    run of ``window + shingle_n - 1`` words between two documents is
    guaranteed to surface a common fingerprint.

    Everything is array higher-order functions on one row per document —
    no explode before the final fingerprint emission, no shuffle at all
    until a consumer groups by fingerprint.  At corpus scale the output
    (doc_id, fingerprint) is the inverted index to bucket-join on, exactly
    like the LSH band table.
    """
    hashes = F.transform(
        word_shingles(text_col, shingle_n),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint"),
    )
    base = df.select(F.col(id_col), hashes.alias("hs"))
    m = F.size(F.col("hs"))
    wins = F.when(
        m <= window, F.array(F.array_min(F.col("hs")))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), m - window + 1),
            lambda i: F.array_min(F.slice(F.col("hs"), i, window)),
        )
    )
    return base.select(
        id_col, F.explode(F.array_distinct(wins)).alias("fingerprint")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    min_pct: int = 20,
) -> DataFrame:
    """Directed shingle CONTAINMENT C(a->b) = |S_a ∩ S_b| / |S_a|.

    Jaccard dilutes doc-in-doc duplication: a short document fully quoted
    inside a long one scores |S_a|/|S_b| (tiny), while its containment is
    1.0.  Containment is the standard detector for that case (Broder's
    original resemblance/containment pair).

    Same scale shape as ``ngram_jaccard_pairs``: explode distinct
    shingles -> self-equi-join on the shingle -> count the intersection.
    Only the DENOMINATOR differs — |S_a| alone — so the pair table joins
    the size table once, not twice, and the result is directed (both
    (a,b) and (b,a) emitted when both clear the threshold).  The
    threshold filter runs in exact integer arithmetic
    (``100·|A∩B| >= min_pct·|S_a|``); the emitted score is pinned.
    Shared-shingle skew at corpus scale is handled the same way as the
    Jaccard variant (AQE skew split + optional stop-shingle df cap).
    """
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("sh"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.sh") == F.col("b.sh"),
                F.col(f"a.{id_col}") != F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return _containment_emit(inter, sizes, id_col, min_pct)


def _containment_emit(
    inter: DataFrame, sizes: DataFrame, id_col: str, min_pct: int
) -> DataFrame:
    """Shared tail of both containment variants: join |S_a|, apply the
    exact integer threshold, emit the pinned ratio — one place to change
    the score contract."""
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    return (
        inter.join(sa, "id_a")
        .filter(F.lit(100) * F.col("n_inter") >= F.lit(min_pct) * F.col("n_a"))
        .select(
            "id_a",
            "id_b",
            pround(
                F.col("n_inter").cast("double") / F.col("n_a").cast("double"), 6
            ).alias("containment"),
        )
    )


def duplicated_passages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    keep_canonical: bool = False,
    hash_shuffle_key: bool = False,
) -> DataFrame:
    """Cross-document duplicated PASSAGES with token positions — the
    substring-level dedup shape (suffix-array dedup's output: which spans
    to cut, not which documents to drop).

    Every ``k``-token sliding window is emitted with its 1-based start
    position; windows whose text occurs in >= 2 DISTINCT documents are
    duplicates; per document, overlapping duplicate windows merge into
    maximal ``[tok_start, tok_end]`` ranges via gaps-and-islands (a new
    island starts when a window begins past the running max end).

    ``keep_canonical=False`` reports EVERY occurrence (the detector /
    audit view, and what ExactSubstr-style cutting does — it removes all
    copies).  ``keep_canonical=True`` exempts each window's occurrences
    in its minimum-id document, so a downstream cut preserves the
    passage in that canonical document (ALL its in-document copies, if
    it repeats there; and an overlapping different duplicate can still
    clip it) while removing every other document's copies — the
    "keep a copy" improvement the suffix-array-dedup paper leaves as
    future work; feed this to ``cut_passages``.

    Scale shape: the window explode is a bounded fan-out (one row per
    token), and the duplicate test is ONE shuffle on the window text —
    "occurs in >= 2 distinct docs" is min(doc) != max(doc) over the
    window-text partition, so there is no groupBy + join-back (which
    would evaluate the explode subtree twice: DataFrame lineage is not a
    CTE — measured 3.1 s -> 2.0 s at sf0.1 from this alone).  Never
    all-pairs.  The island merge runs per document (doc-length-bounded
    partitions).

    ``hash_shuffle_key=True`` is the 100 TB path: the duplicate-test
    shuffle carries the 128-bit md5 of each window instead of its text
    (~4x fewer shuffle bytes for k=8 word windows); identical output up
    to md5 collisions (~2^-128 per pair — zero in practice; pinned equal
    to the string-keyed run on the fixtures by tests).  The default keeps
    the string key so the semantics stay engine-portable for differential
    checking.
    """
    from ..functions.text import tokens
    from pyspark.sql import Window

    t = tokens(text_col)
    docs = df.select(F.col(id_col), t.alias("__toks")).filter(
        F.size("__toks") >= k
    )
    wins = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice("__toks", i, k)),
            )
        ).alias("__p0", "win"),
    ).select(F.col(id_col), (F.col("__p0") + 1).cast("bigint").alias("start"), "win")
    if hash_shuffle_key:
        wins = wins.withColumn("win", F.md5("win"))
    win_w = Window.partitionBy("win")
    marked = wins.withColumn("__mn", F.min(id_col).over(win_w)).withColumn(
        "__mx", F.max(id_col).over(win_w)
    )
    dup_occurrence = F.col("__mn") != F.col("__mx")  # >= 2 distinct docs
    if keep_canonical:
        # the min-id doc's copy survives the cut; every other copy is a hit
        dup_occurrence = dup_occurrence & (F.col(id_col) != F.col("__mn"))
    hits = marked.filter(dup_occurrence).select(F.col(id_col), F.col("start"))
    w = Window.partitionBy(id_col).orderBy("start")
    prev_end = F.max(F.col("start") + F.lit(k - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.withColumn(
        "__new",
        F.when(prev_end.isNull() | (F.col("start") > prev_end), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "__isl",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy(F.col(id_col), F.col("__isl")).agg(
        F.min("start").alias("tok_start"),
        (F.max("start") + F.lit(k - 1)).cast("bigint").alias("tok_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
    ).select(id_col, "tok_start", "tok_end", "n_windows")


def cut_passages(
    df: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Remove token spans from documents — the FIX step that consumes
    ``duplicated_passages``'s output (suffix-array dedup removes the
    duplicated substrings themselves, not whole documents).

    Pass spans from ``duplicated_passages(keep_canonical=True)`` to keep
    each duplicated passage alive in its minimum-id document; the default
    all-occurrences spans reproduce ExactSubstr's remove-all-copies
    behavior.  ``spans`` is (id, tok_start, tok_end) with 1-based
    inclusive token ranges.  The per-document span list is a
    ``collect_list`` of structs (doc-length-bounded: a doc has at most
    n_tokens/k islands), joined back LEFT so span-free documents keep
    their full token stream.  NOTE: ``clean_text`` is the kept tokens
    rejoined with single spaces — original whitespace (tabs, newlines,
    runs) is normalized for every document, cut or not; consume it where
    downstream processing is token-based.  The cut
    itself is pure array higher-order functions — index each token,
    drop those inside any span, rejoin — so it runs JVM-side in codegen
    over the full corpus; no Python worker, no explode of the corpus.
    """
    from ..functions.text import tokens

    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("tok_start").alias("a"), F.col("tok_end").alias("b"))
        ).alias("__spans")
    )
    t = tokens(text_col)
    out = df.join(per_doc, id_col, "left").withColumn(
        "__toks", t
    )
    idx = F.sequence(F.lit(1), F.size("__toks"))
    kept = F.filter(
        F.transform(
            idx,
            lambda i: F.struct(
                i.alias("i"), F.element_at(F.col("__toks"), i).alias("t")
            ),
        ),
        lambda s: ~F.exists(
            F.coalesce(
                F.col("__spans"),
                F.array().cast("array<struct<a:bigint,b:bigint>>"),
            ),
            lambda sp: (s["i"] >= sp["a"]) & (s["i"] <= sp["b"]),
        ),
    )
    return out.select(
        F.col(id_col),
        F.size("__toks").cast("bigint").alias("n_tokens_before"),
        F.size(kept).cast("bigint").alias("n_tokens_after"),
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias(
            "clean_text"
        ),
    )


def containment_for_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    min_pct: int = 50,
) -> DataFrame:
    """Exact directed containment verification restricted to CANDIDATE
    pairs — the corpus-scale path: ``containment_pairs``'s all-pairs
    shingle self-join (quadratic in shared-shingle groups) is replaced
    by candidates ⋈ shingles, so the expensive exact metric is computed
    only where a bucketing pre-filter (LSH bands, IVF cells, blocking
    keys) already found a likely pair.  ``pairs`` is (id_a, id_b)
    DIRECTED (emit both directions for a symmetric candidate source).

    Cost shape: |pairs| × shingles(id_a) intermediate rows — linear in
    the candidate count, independent of corpus size.
    """
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("s"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col(id_col).alias("id_a"), "s")
    sb = sh.select(F.col(id_col).alias("id_b"), "s")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return _containment_emit(inter, sizes, id_col, min_pct)


def prefix_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    t_num: int = 1,
    t_den: int = 10,
) -> DataFrame:
    """EXACT set-similarity self-join at Jaccard >= t_num/t_den via
    prefix filtering (the AllPairs/PPJoin family — Bayardo et al.,
    "Scaling Up All Pairs Similarity Search", WWW 2007; public).

    The deterministic counterpart to MinHash banding: instead of a
    probabilistic bucket join, each document indexes only the PREFIX of
    its shingle set under a global rarest-first ordering
    (document-frequency asc, shingle asc).  For a set of size s the
    prefix length is ``s - ceil(t*s) + 1``; the classic prefix lemma
    guarantees any pair with Jaccard >= t shares at least one prefix
    shingle, so candidate generation joins ONLY on the rarest shingles —
    the frequent-shingle skew that dominates the naive shingle self-join
    (``ngram_jaccard_pairs``) never enters the join.  Output is
    IDENTICAL to the all-pairs exact join at the same threshold.

    Scale shape: one shuffle on shingle for document frequencies, one
    groupBy on id to sort each set rarest-first (per-doc array, bounded
    by document size), an equi-join on prefix shingles (rare by
    construction -> small, skew-free groups), then exact verification
    restricted to candidates (candidates x shingles rows, as in
    ``containment_for_pairs``).  The length filter
    ``t*|A| <= |B| <= |A|/t`` prunes candidates before verification in
    exact integer arithmetic.
    """
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("s"),
    )
    # five consumers (dfreq, the sorted-doc build, both verification
    # sides) would each re-run the tokenize+explode scan; materialize it
    # once.  cut_lineage (RDD-block pin) rather than persist(): these
    # blocks are ContextCleaner-tracked, so they free themselves when the
    # returned plan is dropped — a registry sweep running hundreds of
    # queries in one session would otherwise accumulate CacheManager
    # entries that only an explicit unpersist releases (at corpus scale
    # the shingle table would be a written table instead).
    from ..lineage import cut_lineage

    sh = cut_lineage(sh, eager=False)
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_s"))
    # three consumers (the prefix index and both verification sides)
    # would each replay the df-join + rarest-first sort; pin the
    # doc-grain array frame once (same self-freeing RDD-block pin)
    docs = cut_lineage(
        sh.join(dfreq, "s")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("df_s", "s"))).alias("toks")
        )
        .select(id_col, "toks", F.size("toks").alias("n_sh")),
        eager=False,
    )
    # p = s - ceil(t*s) + 1, in exact integer arithmetic (n_sh is far
    # below 2^53 so the double division in floor() is exact).
    p = (
        F.col("n_sh")
        - F.floor((F.col("n_sh") * t_num + t_den - 1) / t_den).cast("int")
        + 1
    )
    pref = docs.select(
        F.col(id_col),
        F.col("n_sh"),
        F.explode(
            F.transform(F.slice("toks", F.lit(1), p), lambda st: st["s"])
        ).alias("s"),
    )
    # the self-join's two sides would each replay the df-join + sort
    # chain; pin the prefix index once (same self-freeing RDD-block pin)
    pref = cut_lineage(pref, eager=False)
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.s") == F.col("b.s"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        # length filter: J >= t forces t*max(|A|,|B|) <= min(|A|,|B|)
        .filter(F.col("a.n_sh") * t_num <= F.col("b.n_sh") * t_den)
        .filter(F.col("b.n_sh") * t_num <= F.col("a.n_sh") * t_den)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    # Pin the verification join's parallelism with an EXPLICIT count
    # (exempt from AQE coalescing): the candidate-pair frame is a few
    # hundred KB, so byte-based coalescing ran the whole verification
    # in a handful of tasks (profiled at sf0.1: 6.9 cpu-s on 8 tasks =
    # the query's serialization tail; min-of-6 3.38 s -> 2.73 s with
    # the pin).  The count is the deployment-sized shuffle-parallelism
    # conf, the same scale-adaptive rule as queries.spread.
    cand = cand.repartition(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")),
        "id_a",
    )
    # Verification via array_intersect on the per-doc sorted shingle
    # arrays ALREADY built for the prefix index: |A∩B| per candidate
    # pair is one hash-set intersection in codegen.  The previous form
    # re-exploded both sides to shingle grain (cand⋈sh on id_a, ⋈sh on
    # (id_b, s), then a groupBy back to pair grain) — candidates×|A|
    # rows through two joins and an exchange, profiled as the query's
    # top cpu stage (17.3 cpu-s at sf0.1) for what is per-pair local
    # set arithmetic.  Same exact result: toks holds each doc's
    # DISTINCT shingles, so the intersection size equals the matched
    # (id_a, id_b, s) row count.  The doc-grain array frame joins at
    # pair grain (AQE broadcasts it at bench scale; at corpus scale
    # both joins are id-keyed equi-joins — still linear, never
    # shingle-grain).
    ta = docs.select(
        F.col(id_col).alias("id_a"),
        F.transform("toks", lambda st: st["s"]).alias("__ts_a"),
        F.col("n_sh").alias("n_a"),
    )
    tb = docs.select(
        F.col(id_col).alias("id_b"),
        F.transform("toks", lambda st: st["s"]).alias("__ts_b"),
        F.col("n_sh").alias("n_b"),
    )
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn(
            "n_inter", F.size(F.array_intersect("__ts_a", "__ts_b"))
        )
        # threshold test in exact integers BEFORE the pinned ratio:
        # n_inter / (n_a + n_b - n_inter) >= t_num/t_den
        .filter(
            F.col("n_inter") * t_den
            >= (F.col("n_a") + F.col("n_b") - F.col("n_inter")) * t_num
        )
        .select(
            "id_a",
            "id_b",
            pround(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
