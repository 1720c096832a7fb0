"""Deterministic synthetic events source — Spark 4 Python Data Source API.

The reference ingests fixed CSV files (FullETLGenerator.java:31-38); a
100 TB engine also needs a *generator* source: load/soak testing, plan
experiments and CI fixtures need arbitrary data volume WITHOUT storing
it.  This source materializes the ``events`` schema from pure integer
arithmetic in the executors:

- **No I/O, no driver bottleneck**: the driver hands each partition a
  row range (an ``InputPartition`` is just ``(start, end)``); executors
  synthesize their slice independently.  100 TB of input costs zero
  bytes of storage and scales with executor count like any scan.
- **Deterministic**: row ``i``'s content is a pure function of ``i``
  (splitmix64 finalizer — public-domain mixing constants from Vigna's
  splittable-PRNG paper), so any two reads — any partitioning, any
  engine — produce the same multiset.  Tests can assert exact equality
  against a second read or a different ``partitions`` setting.
- **Vectorized**: batches are built in numpy and yielded as Arrow
  RecordBatches (the reader protocol's fast path — no per-row Python
  tuples), 64k rows at a time for constant memory.
- **Streaming too**: the same generator behind ``readStream`` with
  row-offset micro-batches — a reproducible ``rate`` source whose
  content (not just row count) is stable across runs, which the built-in
  rate source cannot do.

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    spark.read.format("synthetic_events").option("rows", 10**9).load()
    spark.readStream.format("synthetic_events")
         .option("rows", 10**6).option("rowsPerBatch", 10**5).load()
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double"
)
_TYPES = ["view", "click", "cart", "purchase"]
_BATCH = 65536
_BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z — fixed, not "now"


def _mix(x):
    """splitmix64 finalizer, vectorized over a numpy uint64 array."""
    import numpy as np

    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z = (z * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    z ^= z >> np.uint64(27)
    z = (z * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return z ^ (z >> np.uint64(31))


def _gen_batch(
    start: int,
    end: int,
    n_users: int,
    seed: int,
    hot_pct: int = 0,
    hot_users: int = 10,
):
    """Arrow RecordBatch for rows [start, end) — pure function of range.

    ``hot_pct`` > 0 routes that percentage of events to ``hot_users``
    hot keys (ids 0..hot_users-1) — the deterministic power-law knob for
    skew experiments; the rest spread uniformly over the remaining ids."""
    import numpy as np
    import pyarrow as pa

    i = np.arange(start, end, dtype=np.uint64)
    h = _mix(i + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
    h2 = _mix(h)
    event_id = i.astype(np.int64)
    # 1 event/second mean with hash jitter inside the second (micros)
    ts_us = (np.uint64(_BASE_EPOCH) + i) * np.uint64(1_000_000) + (
        h % np.uint64(1_000_000)
    )
    user_id = (h % np.uint64(n_users)).astype(np.int64)
    if hot_pct > 0:
        is_hot = ((h >> np.uint64(33)) % np.uint64(100)) < np.uint64(hot_pct)
        hot_id = ((h >> np.uint64(13)) % np.uint64(hot_users)).astype(np.int64)
        cold_id = (
            np.uint64(hot_users) + (h % np.uint64(max(1, n_users - hot_users)))
        ).astype(np.int64)
        user_id = np.where(is_hot, hot_id, cold_id)
    etype = (h2 % np.uint64(len(_TYPES))).astype(np.int64)
    value = ((h2 >> np.uint64(8)) % np.uint64(1_000_000)).astype(
        np.float64
    ) / 100.0
    return pa.RecordBatch.from_arrays(
        [
            pa.array(event_id, pa.int64()),
            pa.array(ts_us.astype(np.int64), pa.timestamp("us", tz="UTC")),
            pa.array(user_id, pa.int64()),
            pa.array([_TYPES[t] for t in etype], pa.string()),
            pa.array(value, pa.float64()),
        ],
        names=["event_id", "ts", "user_id", "event_type", "value"],
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _opts(options):
    return (
        int(options.get("rows", 100_000)),
        int(options.get("partitions", 8)),
        int(options.get("numUsers", 1000)),
        int(options.get("seed", 0)),
        int(options.get("hotPct", 0)),
        int(options.get("hotUsers", 10)),
    )


def _read_range(part, n_users: int, seed: int, hot_pct: int, hot_users: int):
    for s in range(part.start, part.end, _BATCH):
        yield _gen_batch(
            s, min(s + _BATCH, part.end), n_users, seed, hot_pct, hot_users
        )


class _Reader(DataSourceReader):
    def __init__(self, options):
        (self.rows, self.nparts, self.n_users, self.seed,
         self.hot_pct, self.hot_users) = _opts(options)

    def partitions(self):
        step = -(-self.rows // self.nparts)
        return [
            _RangePartition(s, min(s + step, self.rows))
            for s in range(0, self.rows, step)
        ]

    def read(self, partition):
        return _read_range(
            partition, self.n_users, self.seed, self.hot_pct, self.hot_users
        )


class _StreamReader(DataSourceStreamReader):
    """Row-offset micro-batches: offset = rows emitted so far.

    ``latestOffset`` advances by ``rowsPerBatch`` per planning call — the
    rate-limit hook — so a processing-time trigger replays the dataset as
    genuine micro-batches until the ``rows`` cap, then idles.  (Spark's
    availableNow trigger falls back to one catch-all batch for Python
    stream sources; ``partitions`` therefore must — and does — cover
    exactly the committed ``[start, end)`` range, never clamping it.)"""

    def __init__(self, options):
        (self.rows, self.nparts, self.n_users, self.seed,
         self.hot_pct, self.hot_users) = _opts(options)
        self.rows_per_batch = int(options.get("rowsPerBatch", 10_000))
        self._planned = 0

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        self._planned = min(self._planned + self.rows_per_batch, self.rows)
        return {"offset": self._planned}

    def partitions(self, start, end):
        lo, hi = start["offset"], end["offset"]
        step = max(1, -(-(hi - lo) // self.nparts))
        return [
            _RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition):
        return _read_range(
            partition, self.n_users, self.seed, self.hot_pct, self.hot_users
        )

    def commit(self, end):
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _Reader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


# ---------------------------------------------------------------------------
# Synthetic documents — the corpus twin of the events generator, for
# scale-probing the LLM-pipeline operators (dedup, minhash, tf-idf, text
# stats) past the sf0.1 fixture.  Same splitmix64 purity: doc ``i``'s
# text is a function of ``i`` alone.  Controlled duplication: 1/8 of
# docs (outside a 64-doc base pool) are EXACT copies of a pool doc and
# another 1/8 are NEAR copies (one word substituted) — so exact-dedup
# group sizes and MinHash candidate rates stay realistic and *known* at
# any volume.
# ---------------------------------------------------------------------------

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
_VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "vector", "scan", "fast", "query", "agg", "join", "shuffle", "plan",
    "table", "index", "merge", "filter", "group", "window", "stream",
    "state", "hash", "range", "broadcast", "skew", "salt", "bucket",
    "codec", "page", "footer", "stats", "prune", "push", "cache", "spill",
    "stage", "task", "executor", "driver", "row", "value", "key", "count",
    "sum", "min", "max", "avg",
]
_LANGS = ["en", "pt", "es", "de", "fr"]
_POOL = 64  # ids < _POOL are never duplicates; dup sources come from here


def _doc_words(i: int, seed: int) -> list[str]:
    """Base word sequence for doc ``i`` — pure, scalar (used per row; the
    heavy lifting below batches the hash math in numpy and only joins
    strings here)."""
    import numpy as np

    h = int(_mix(np.uint64([i + seed * 1_000_003]))[0])
    n = 20 + (h >> 8) % 80
    ks = np.arange(n, dtype=np.uint64)
    idx = _mix(np.uint64(h) + ks * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(
        len(_VOCAB)
    )
    return [_VOCAB[int(k)] for k in idx]


def _gen_doc_batch(start: int, end: int, seed: int):
    import numpy as np
    import pyarrow as pa

    i = np.arange(start, end, dtype=np.uint64)
    h = _mix(i + np.uint64(seed) * np.uint64(0x1000003))
    h2 = _mix(h)
    roll = h2 % np.uint64(8)
    src_pool = (h2 >> np.uint64(16)) % np.uint64(_POOL)
    texts: list[str] = []
    for k in range(len(i)):
        did = int(i[k])
        if did >= _POOL and roll[k] == 0:  # exact duplicate of a pool doc
            words = _doc_words(int(src_pool[k]), seed)
        elif did >= _POOL and roll[k] == 1:  # near duplicate: one word swapped
            words = _doc_words(int(src_pool[k]), seed)
            p = int(h[k]) % len(words)
            words = list(words)
            words[p] = _VOCAB[(int(h[k]) >> 32) % len(_VOCAB)]
        else:
            words = _doc_words(did, seed)
        texts.append(" ".join(words))
    lang = [(int(x) % len(_LANGS)) for x in (h >> np.uint64(40))]
    return pa.RecordBatch.from_arrays(
        [
            pa.array(i.astype(np.int64), pa.int64()),
            pa.array(texts, pa.string()),
            pa.array([_LANGS[x] for x in lang], pa.string()),
            pa.array([f"src{int(x) % 4}" for x in (h2 >> np.uint64(40))], pa.string()),
            pa.array([len(t) for t in texts], pa.int64()),
        ],
        names=["doc_id", "text", "lang", "source", "n_chars"],
    )


class _DocReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 10_000))
        self.nparts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        step = -(-self.rows // self.nparts)
        return [
            _RangePartition(s, min(s + step, self.rows))
            for s in range(0, self.rows, step)
        ]

    def read(self, partition):
        for s in range(partition.start, partition.end, _BATCH):
            yield _gen_doc_batch(s, min(s + _BATCH, partition.end), self.seed)


class SyntheticDocumentsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_documents"

    def schema(self):
        return DOC_SCHEMA

    def reader(self, schema):
        return _DocReader(self.options)


# ---------------------------------------------------------------------------
# Synthetic embeddings — clustered vectors for scale-probing the
# similarity-search family (brute/IVF/LSH/k-means).  Each vector is its
# cluster's deterministic centroid plus hash jitter, so IVF/k-means have
# real structure to find; ``label`` carries the planted cluster for
# recall checks.
# ---------------------------------------------------------------------------

EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def _gen_emb_batch(start: int, end: int, dim: int, n_clusters: int, seed: int):
    import numpy as np
    import pyarrow as pa

    i = np.arange(start, end, dtype=np.uint64)
    h = _mix(i + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
    label = (h % np.uint64(n_clusters)).astype(np.int64)
    # centroid[c][d] in [-1, 1) from mix(c*dim+d); jitter ~ N-ish in
    # [-0.125, 0.125) from mix over the flat (row, dim) index
    cd = label[:, None] * np.int64(dim) + np.arange(dim, dtype=np.int64)[None, :]
    cent = _mix(cd.astype(np.uint64) + np.uint64(0xC0FFEE)) % np.uint64(2_000_000)
    jd = (i[:, None] * np.uint64(dim)) + np.arange(dim, dtype=np.uint64)[None, :]
    jit = _mix(jd + np.uint64(0xBEEF)) % np.uint64(250_000)
    vecs = (
        (cent.astype(np.float64) / 1_000_000.0 - 1.0)
        + (jit.astype(np.float64) / 1_000_000.0 - 0.125)
    ).astype(np.float32)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(i.astype(np.int64), pa.int64()),
            pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
            pa.array(label, pa.int32()),
        ],
        names=["vec_id", "embedding", "label"],
    )


class _EmbReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 10_000))
        self.nparts = int(options.get("partitions", 8))
        self.dim = int(options.get("dim", 64))
        self.n_clusters = int(options.get("numClusters", 10))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        step = -(-self.rows // self.nparts)
        return [
            _RangePartition(s, min(s + step, self.rows))
            for s in range(0, self.rows, step)
        ]

    def read(self, partition):
        for s in range(partition.start, partition.end, _BATCH):
            yield _gen_emb_batch(
                s, min(s + _BATCH, partition.end), self.dim,
                self.n_clusters, self.seed,
            )


class SyntheticEmbeddingsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_embeddings"

    def schema(self):
        return EMB_SCHEMA

    def reader(self, schema):
        return _EmbReader(self.options)
