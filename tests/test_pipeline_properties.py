"""Differential properties for the training-data-prep operators: each
declared query re-derived in plain Python from the raw parquet (a second,
independent oracle besides DuckDB — same idea, different engine)."""

from __future__ import annotations

import duckdb

from java_etl_bi_generator_spark.queries import registry

from .conftest import SF_DIR


def _duck():
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_sessionize_matches_python_simulation(spark, sf_dir):
    rows = _duck().execute(
        "SELECT event_id, user_id, epoch_ms(ts) FROM events "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    want: dict[int, int] = {}
    cur_user, cur_sess, last_ms = None, 0, None
    for eid, uid, ms in rows:
        if uid != cur_user:
            cur_user, cur_sess, last_ms = uid, 1, ms
        elif ms - last_ms > 1800000:
            cur_sess += 1
        last_ms = ms
        want[eid] = cur_sess
    got = {
        r["event_id"]: r["session_seq"]
        for r in registry()["q_sessionize"](spark, sf_dir).collect()
    }
    assert got == want


def test_chunks_exactly_cover_every_document(spark, sf_dir):
    # Every token position of every doc must be inside >=1 chunk, chunk
    # windows must start every 40 tokens, and sizes must match the slice.
    n_toks = {
        d: n
        for d, n in _duck().execute(
            "SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) "
            "FROM documents WHERE trim(text) <> ''"
        ).fetchall()
    }
    chunks: dict[int, list[tuple[int, int]]] = {}
    for r in registry()["q_chunk_documents"](spark, sf_dir).collect():
        chunks.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_tokens"])
        )
    assert set(chunks) == set(n_toks)
    for doc_id, n in n_toks.items():
        got = sorted(chunks[doc_id])
        covered = set()
        for cid, ct in got:
            start = 1 + 40 * cid
            assert ct == min(50, n - start + 1)
            covered.update(range(start, start + ct))
        assert covered == set(range(1, n + 1))


def test_pack_sequences_conserves_docs_and_tokens(spark, sf_dir):
    bins = registry()["q_pack_sequences"](spark, sf_dir).collect()
    (n_docs, n_tokens) = _duck().execute(
        "SELECT count(*), sum(CASE WHEN trim(text) = '' THEN 0 ELSE "
        "len(string_split_regex(trim(text), '\\s+')) END) FROM documents"
    ).fetchone()
    assert sum(r["n_docs"] for r in bins) == n_docs
    assert sum(r["bin_tokens"] for r in bins) == n_tokens
    # bin ids are a dense 0..k prefix (contiguous packing leaves no holes)
    ids = sorted(r["bin_id"] for r in bins)
    assert ids == list(range(len(ids)))


def test_business_days_matches_python_loop(spark, sf_dir):
    """The closed-form weekday formula must equal a literal day-by-day
    Python walk over every (order, first-ship) span in the fixture."""
    import datetime

    con = _duck()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    )
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    rows = con.execute(
        """
        WITH fs AS (SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS s
                    FROM lineitem GROUP BY 1)
        SELECT CAST(o_orderdate AS DATE), s
        FROM orders JOIN fs ON o_orderkey = fs.l_orderkey
        WHERE s >= CAST(o_orderdate AS DATE)
        """
    ).fetchall()
    want: dict[int, int] = {}
    for a, b in rows:
        d, n = a, 0
        while d < b:
            if d.weekday() < 5:
                n += 1
            d += datetime.timedelta(days=1)
        want[n] = want.get(n, 0) + 1
    got = {
        r["business_days"]: r["n_orders"]
        for r in registry()["q_business_days"](spark, sf_dir).collect()
    }
    assert got == want


def test_proportional_allocation_invariants(spark, sf_dir):
    """Slots must sum to exactly 1000 and each nation gets its floor quota
    or floor+1 (largest-remainder property)."""
    con = _duck()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    )
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/customer.parquet')"
    )
    cents = dict(con.execute(
        """
        SELECT c_nationkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1
        """
    ).fetchall())
    total = sum(cents.values())
    got = {
        r["c_nationkey"]: r["slots"]
        for r in registry()["q_proportional_allocation"](
            spark, sf_dir
        ).collect()
    }
    assert sum(got.values()) == 1000
    for k, slots in got.items():
        floor_q = cents[k] * 1000 // total
        assert slots in (floor_q, floor_q + 1), k


def test_spearman_planted_values(spark):
    """Hand-computable Spearman per group: a perfectly monotone group is
    +1, a reversed one is -1, and a tied group exercises average-rank
    handling (x=[1,1,2] vs y=[10,20,30] -> rho = 1.5/sqrt(3) ~ 0.866025,
    which row-number tie-breaking would instead report as 0.5 or 1.0
    depending on the arbitrary tie order)."""
    import tempfile

    rows = (
        [("A", float(i), 10.0 * i) for i in range(1, 5)]
        + [("B", float(i), 10.0 * (5 - i)) for i in range(1, 5)]
        + [("C", 1.0, 10.0), ("C", 1.0, 20.0), ("C", 2.0, 30.0)]
    )
    df = spark.createDataFrame(
        rows, ["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        got = {
            r["l_returnflag"]: (r["n_rows"], r["spearman"])
            for r in registry()["q_spearman_by_group"](spark, d).collect()
        }
    assert got["A"] == (4, 1.0)
    assert got["B"] == (4, -1.0)
    assert got["C"][0] == 3
    assert abs(got["C"][1] - 0.866025) < 1e-9


def test_knn_grid_planted_points(spark):
    """Hand-checkable grid KNN: key-derived points put supplier 1 in
    customer 1's own cell (d2 = (37-41)^2 + (73-59)^2 = 212) and supplier
    2 one cell over (d2 = 4050); customer 50 lands in cell (8,6) with an
    empty 3x3 neighborhood and must keep NULLs through the left join."""
    import tempfile

    cu = spark.createDataFrame([(1,), (50,)], ["c_custkey"])
    su = spark.createDataFrame([(1,), (2,)], ["s_suppkey"])
    with tempfile.TemporaryDirectory() as d:
        cu.write.parquet(f"{d}/customer.parquet")
        su.write.parquet(f"{d}/supplier.parquet")
        got = {
            r["c_custkey"]: (r["nearest_suppkey"], r["d2"])
            for r in registry()["q_knn_grid_join"](spark, d).collect()
        }
    assert got[1] == (1, 212)
    assert got[50] == (None, None)


def test_rrf_fusion_planted_lists(spark):
    """Hand-checkable RRF: doc 1 leads both lists (longest term-heavy
    text, closest non-query vector beats only ties), docs 0 and 3 appear
    ONLY in the semantic list (no query terms) and must contribute
    exactly 1/(60+rank) with a NULL lex_rank through the full-outer
    fusion."""
    import tempfile

    docs = spark.createDataFrame(
        [
            (0, "nothing relevant here", "en", "s", 21),
            (1, "the the the and", "en", "s", 15),
            (2, "the and", "en", "s", 7),
            (3, "also no query terms", "en", "s", 19),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.0, 1.0], 0),
            (3, [1.0, 0.0], 0),
        ],
        ["vec_id", "embedding", "label"],
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        vecs.write.parquet(f"{d}/embeddings.parquet")
        rows = registry()["q_rrf_fusion"](spark, d).collect()
    order = [r["doc_id"] for r in rows]
    by_id = {r["doc_id"]: r for r in rows}
    # sem ranks: vec0 (cos 1.0) 1, vec3 (cos 1.0, id tiebreak) 2,
    # vec1 (~0.9939) 3, vec2 (0.0) 4; lex ranks: doc1 1, doc2 2
    assert order == [1, 2, 0, 3]
    assert by_id[1]["lex_rank"] == 1 and by_id[1]["sem_rank"] == 3
    assert by_id[0]["lex_rank"] is None and by_id[0]["sem_rank"] == 1
    assert abs(by_id[0]["rrf"] - 1.0 / 61.0) < 1e-12
    assert abs(by_id[3]["rrf"] - 1.0 / 62.0) < 1e-12
    assert abs(by_id[1]["rrf"] - (1.0 / 61.0 + 1.0 / 63.0)) < 1e-12


def test_ndcg_planted_gains(spark):
    """Hand-checkable nDCG@10: 4 vectors, query = vec 0, retrieved order
    (cosine desc, id) = [0, 3, 1, 2] with labels [3, 1, 2, 0]; ideal
    order of labels is [3, 2, 1, 0].  Expected values recomputed with
    the same shared weight table (functions/ranking_eval.py)."""
    import tempfile

    from java_etl_bi_generator_spark.functions.ranking_eval import (
        NDCG_WEIGHTS as W,
    )

    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 3),
            (1, [0.9, 0.1], 2),
            (2, [0.0, 1.0], 0),
            (3, [1.0, 0.0], 1),
        ],
        ["vec_id", "embedding", "label"],
    )
    with tempfile.TemporaryDirectory() as d:
        vecs.write.parquet(f"{d}/embeddings.parquet")
        row = registry()["q_ndcg_at_10"](spark, d).collect()[0]
    dcg = 3.0 * W[0] + 1.0 * W[1] + 2.0 * W[2] + 0.0 * W[3]
    idcg = 3.0 * W[0] + 2.0 * W[1] + 1.0 * W[2] + 0.0 * W[3]
    assert row["dcg"] == dcg
    assert row["idcg"] == idcg
    assert row["ndcg"] == dcg / idcg


def test_fastss_planted_neighbors(spark):
    """Hand-checkable deletion-neighborhood join: a deletion pair, a
    substitution pair, and a chain ("hello111" +1 char -> "hello1111"
    +sub -> "hello1112") must all verify at ed<=1; the adjacent
    TRANSPOSE pair ("world9999"/"wolrd9999") shares a deletion variant
    but is ed=2 and must be dropped by the exact verify."""
    import tempfile

    names = ["hello1111", "hello1112", "hello111", "world9999", "wolrd9999"]
    cu = spark.createDataFrame(
        [(i, n, 0, 0.0, "B") for i, n in enumerate(names)],
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    with tempfile.TemporaryDirectory() as d:
        cu.write.parquet(f"{d}/customer.parquet")
        got = {
            r["c_name"]: (r["n_near"], r["nearest"])
            for r in registry()["q_fuzzy_ids_fastss"](spark, d).collect()
        }
    assert got == {
        "hello1111": (2, "hello111"),
        "hello1112": (2, "hello111"),
        "hello111": (2, "hello1111"),
    }


def test_spearman_matches_pure_python():
    """Average-rank Spearman re-derived in plain Python (fractional
    ranks via sorted positions, then Pearson) over a fixed tie-heavy
    case mix — breaks the symmetry of 'both engines share a systematic
    error' that oracle agreement alone can't rule out."""
    import math
    import tempfile

    cases = {
        "A": ([1, 2, 3, 4, 5], [10, 40, 20, 50, 30]),
        "B": ([1, 1, 2, 2, 3], [5, 5, 7, 9, 9]),     # ties on both sides
        "C": ([2, 2, 2, 2], [1, 2, 3, 4]),           # zero x-variance
    }

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + 1 + j + 1) / 2.0
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    def spearman(xs, ys):
        rx, ry = avg_ranks(xs), avg_ranks(ys)
        n = len(xs)
        mx, my = sum(rx) / n, sum(ry) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        vx = sum((a - mx) ** 2 for a in rx)
        vy = sum((b - my) ** 2 for b in ry)
        if vx <= 0 or vy <= 0:
            return None
        return cov / math.sqrt(vx * vy)

    rows = []
    for flag, (xs, ys) in cases.items():
        for x, y in zip(xs, ys):
            rows.append((flag, float(x), float(y)))

    from java_etl_bi_generator_spark.session import get_spark

    spark = get_spark(app_name="spearman-prop")
    df = spark.createDataFrame(
        rows, ["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        got = {
            r["l_returnflag"]: r["spearman"]
            for r in registry()["q_spearman_by_group"](spark, d).collect()
        }
    for flag, (xs, ys) in cases.items():
        want = spearman(xs, ys)
        if want is None:
            assert got[flag] is None, flag
        else:
            pinned = math.floor(want * 1e6 + 0.5) / 1e6
            assert abs(got[flag] - pinned) < 1e-9, (flag, got[flag], want)


def test_mahalanobis_flags_combination_anomaly(spark):
    """A point whose x and y are each in-range but whose COMBINATION is
    off the correlation line must be flagged — the case 1-D z-scores
    miss by construction.  Expected values re-derived in plain Python
    with the same closed-form 2x2 inverse."""
    import math
    import tempfile

    pts = [(float(i), 10.0 * i) for i in range(1, 21)] + [(10.0, 10.0)]
    rows = [("A", x, y) for x, y in pts]
    df = spark.createDataFrame(
        rows, ["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        got = registry()["q_anomaly_mahalanobis"](spark, d).collect()[0]

    cents = [(round(x * 100), round(y * 100)) for x, y in pts]
    n = float(len(cents))
    sx = float(sum(c[0] for c in cents))
    sy = float(sum(c[1] for c in cents))
    sxx = float(sum(c[0] * c[0] for c in cents))
    syy = float(sum(c[1] * c[1] for c in cents))
    sxy = float(sum(c[0] * c[1] for c in cents))
    mx, my = sx / n, sy / n
    cxx = (sxx - sx * sx / n) / (n - 1.0)
    cyy = (syy - sy * sy / n) / (n - 1.0)
    cxy = (sxy - sx * sy / n) / (n - 1.0)
    det = cxx * cyy - cxy * cxy
    d2s = [
        (cyy * (x - mx) * (x - mx) - 2.0 * cxy * (x - mx) * (y - my)
         + cxx * (y - my) * (y - my)) / det
        for x, y in cents
    ]
    n_out = sum(1 for v in d2s if v > 13.8155)
    assert n_out >= 1  # the planted (10, 10) point is the anomaly
    assert got["n_rows"] == 21
    assert got["n_outliers"] == n_out
    assert got["max_d2"] == math.floor(max(d2s) * 1e6 + 0.5) / 1e6


def test_twap_planted_step_function(spark):
    """Hand-checkable TWAP: samples 10@0s, 20@10s, 30@40s hold until the
    next sample -> (10*10s + 20*30s)/40s = 17.5, while the plain mean
    (20.0) over-weights the burst; the last sample carries no weight."""
    import datetime as dt
    import tempfile

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "T", 10.0, None),
        (2, t0 + dt.timedelta(seconds=10), 7, "T", 20.0, None),
        (3, t0 + dt.timedelta(seconds=40), 7, "T", 30.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = registry()["q_twap"](spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["event_type"], r["n_intervals"], r["span_ms"]) == ("T", 2, 40000)
    assert r["twap"] == 17.5
