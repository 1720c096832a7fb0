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


def _gen_batch(start: int, end: int, n_users: int, seed: int):
    """Arrow RecordBatch for rows [start, end) — pure function of range."""
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
    )


def _read_range(part, n_users: int, seed: int):
    for s in range(part.start, part.end, _BATCH):
        yield _gen_batch(s, min(s + _BATCH, part.end), n_users, seed)


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.rows, self.nparts, self.n_users, self.seed = _opts(options)

    def partitions(self):
        step = -(-self.rows // self.nparts)
        return [
            _RangePartition(s, min(s + step, self.rows))
            for s in range(0, self.rows, step)
        ]

    def read(self, partition):
        return _read_range(partition, self.n_users, self.seed)


class _StreamReader(DataSourceStreamReader):
    """Row-offset micro-batches: offset = rows emitted so far.

    ``latestOffset`` advances by ``rowsPerBatch`` per planning call — the
    rate-limit hook — so a processing-time trigger replays the dataset as
    genuine micro-batches until the ``rows`` cap, then idles.  (Spark's
    availableNow trigger falls back to one catch-all batch for Python
    stream sources; ``partitions`` therefore must — and does — cover
    exactly the committed ``[start, end)`` range, never clamping it.)"""

    def __init__(self, options):
        self.rows, self.nparts, self.n_users, self.seed = _opts(options)
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
        return _read_range(partition, self.n_users, self.seed)

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
