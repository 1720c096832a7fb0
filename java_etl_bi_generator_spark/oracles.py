"""DuckDB oracle SQL for every hash-checkable declared query.

Each statement mirrors its Spark twin in ``queries.py`` — same column
names, same pinned float treatment (portable floor-rounding via
``pround_sql``), types cast to match Spark's (DuckDB returns BIGINT for
year()/row_number()/len() where Spark returns INT, HUGEINT for integer
sums, DOUBLE for ceil — all cast explicitly).

Notable DuckDB-vs-Spark divergences handled here:
- ``regexp_replace`` needs the ``'g'`` flag (Spark replaces all matches);
- ``dayofweek``: DuckDB Sunday=0, Spark Sunday=1 (lookup arrays shifted);
- ``round()`` tie behavior differs -> never used; ``floor(x*10^n+0.5)``
  everywhere a float must be pinned.
- plain decimal literals are typed DECIMAL, and DECIMAL->DOUBLE
  double-rounds once the mantissa exceeds 2^53 — a 17-digit repr lands
  one ulp off Python/Spark's double.  Exact double literals must use
  exponent form (``0.63…e0``), which DuckDB types DOUBLE and parses
  with correctly-rounded strtod (see functions/ranking_eval.py).

Queries with no entry here — exactly q_approx_count_distinct and
q_approx_percentile — are declared rows-only: Spark's builtin
HLL++/Greenwald-Khanna sketch internals are engine-specific and not
reproducible in DuckDB.  Everything else is hash-checked, including the
streaming set (round 4), the IVF/k-means family (round 5, via
integer-pinned training — _kmeans_int_ctes below), and the rolling HLL
(round 6, via the from-scratch register-table sketch — _hll1024_est).
"""

from __future__ import annotations

from .functions.ranking_eval import ndcg_weight_sql
from .functions.resample import poisson1_hex_thresholds
from .functions.rounding import dsum_sql, pround_sql
from .functions.phonetic import soundex_sql

_PTBR_MONTHS = (
    "['janeiro','fevereiro','março','abril','maio','junho','julho',"
    "'agosto','setembro','outubro','novembro','dezembro']"
)
# Indexed by DuckDB dayofweek()+1 (Sunday=0 -> index 1)
_PTBR_DOW = (
    "['domingo','segunda-feira','terça-feira','quarta-feira',"
    "'quinta-feira','sexta-feira','sábado']"
)

_STOP_EN = "['the','a','an','and','or','of','to','in','is','it','on','for','with','as','at','by','from','that','this','be']"
_STOP_PT = "['de','a','o','que','e','do','da','em','um','para']"
_STOP_ES = "['de','la','que','el','en','y','a','los','se','del']"

_TOKENS = "string_split_regex(trim(text), '\\s+')"
_NON_ASCII = "length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g'))"
_NON_ASCII_RATIO = (
    f"CAST({_NON_ASCII} AS DOUBLE) / CAST(length(text) AS DOUBLE)"
)
_N_TOKENS = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKENS}) END"


# Shared CTE bodies — q_bm25 / q_vector_topk define the canonical lexical
# and semantic scoring; the fusion/eval oracles (q_rrf_fusion,
# q_ndcg_at_10) compose the SAME text so a tokenizer or pround change
# can never leave a stale copy behind.
_BM25_SCORED_CTES = """docs AS (
          SELECT doc_id, {toks} AS toks FROM documents
          WHERE trim(text) <> ''),
        tf AS (
          SELECT doc_id, dl, tok, count(*) AS tf
          FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok
                FROM docs) t
          WHERE tok IN ('the', 'and') GROUP BY 1, 2, 3),
        st AS (
          SELECT *, count(*) OVER (PARTITION BY tok) AS df FROM tf),
        corpus AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl
          FROM docs),
        bm AS (
          SELECT doc_id,
                 {score} AS bm25
          FROM st CROSS JOIN corpus GROUP BY doc_id)"""


def _bm25_scored_ctes() -> str:
    return _BM25_SCORED_CTES.format(
        toks=_TOKENS,
        score=pround_sql(
            'sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)'
            ' * (tf * (1.2 + 1.0)'
            ' / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))))', 4),
    )


def _cosine_scored_ctes() -> str:
    return (
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings\n"
        "              WHERE vec_id = 0),\n"
        "        scored AS (\n"
        "          SELECT vec_id,\n"
        "                 " + pround_sql(
            'list_dot_product(CAST(embedding AS DOUBLE[]), qv) / '
            '(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), '
            'CAST(embedding AS DOUBLE[]))) * '
            'sqrt(list_dot_product(qv, qv)))', 6) + " AS cosine\n"
        "          FROM embeddings, q)"
    )


def _dcg_chain(prefix: str) -> str:
    """Left-associated 10-term DCG chain over pivoted gains — the same
    fixed repr-exact weight literals the Spark side uses (see
    functions/ranking_eval.py), so the float result is bit-identical."""
    return " + ".join(
        f"COALESCE(CAST({prefix}{k} AS DOUBLE), 0.0) * {ndcg_weight_sql(k)}"
        for k in range(1, 11)
    )


def _gain_pivot(prefix: str) -> str:
    return ", ".join(
        f"max(CASE WHEN r = {k} THEN label END) AS {prefix}{k}"
        for k in range(1, 11)
    )


def _hits(stoplist: str) -> str:
    return (
        f"CAST(len(list_filter({_TOKENS}, t -> list_contains({stoplist}, lower(t)))) AS INT)"
    )


_QUALITY_EXPR = f"""
    0.4 * least(CAST({_N_TOKENS} AS DOUBLE) / 100.0, 1.0)
  + 0.4 * least(
        (CASE WHEN {_N_TOKENS} > 0
              THEN CAST({_hits(_STOP_EN)} AS DOUBLE) / CAST({_N_TOKENS} AS DOUBLE)
              ELSE 0.0 END) * 4.0, 1.0)
  + 0.2 * (1.0 - least(
        (CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END) * 10.0, 1.0))
"""

# 2-word shingles (mirrors word_shingles(text, 2) in queries.py)
_SHINGLES = """
  CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
       ELSE list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i+1])
  END
"""

# Shared passage-dedup CTE prefix (mirrors operators/dedup.py
# duplicated_passages, k=8): sliding 8-token windows with 1-based starts,
# plus each window-text group's min/max doc id (the duplicate test:
# min <> max <=> >= 2 distinct docs).  Consumers derive `hits` from
# `marked` (all occurrences, or keep-canonical via doc_id <> mn) and run
# the gaps-and-islands merge in _PASSAGE_ISLANDS.
_PASSAGE_MARKED = """
        docs AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
          FROM documents
        ),
        w AS (
          SELECT doc_id, toks,
                 unnest(range(1, len(toks) - 6)) AS start
          FROM docs WHERE len(toks) >= 8
        ),
        wins AS (
          SELECT doc_id, CAST(start AS BIGINT) AS start,
                 array_to_string(toks[start:start+7], ' ') AS win
          FROM w
        ),
        marked AS (
          SELECT doc_id, start,
                 min(doc_id) OVER (PARTITION BY win) AS mn,
                 max(doc_id) OVER (PARTITION BY win) AS mx
          FROM wins
        )
"""

# Gaps-and-islands merge over `hits`(doc_id, start): overlapping 8-token
# windows collapse to maximal [tok_start, tok_end] ranges.
_PASSAGE_ISLANDS = """
        flagged AS (
          SELECT doc_id, start,
                 max(start + 7) OVER (
                   PARTITION BY doc_id ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS prev_end
          FROM hits
        ),
        islands AS (
          SELECT doc_id, start,
                 sum(CASE WHEN prev_end IS NULL OR start > prev_end
                          THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc_id ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS isl
          FROM flagged
        )
"""

# Winnowing fingerprint pipeline (Schleimer et al.) as a reusable CTE chain
# ending in fps(doc_id, fingerprint) — mirrors operators/dedup.py
# winnow_fingerprints (shingle_n=2, window=4, 8-nibble md5 hash).
_WINNOW_CTE = """
        WITH docs AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
          FROM documents WHERE doc_id % 10 = 0
        ),
        sh AS (SELECT doc_id,
          CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])
          END AS shingles FROM docs),
        h AS (
          SELECT doc_id,
                 list_transform(shingles, s ->
                   CAST(list_sum(list_transform(range(0, 8), i ->
                     (CAST(strpos('0123456789abcdef',
                                  substr(md5(s), CAST(i AS INT) + 1, 1))
                           AS BIGINT) - 1)
                     * (CAST(1 AS BIGINT) << CAST(4 * (7 - i) AS INT))
                   )) AS BIGINT)) AS hs
          FROM sh
        ),
        w AS (
          SELECT doc_id,
                 CASE WHEN len(hs) <= 4 THEN [list_min(hs)]
                      ELSE list_transform(range(1, len(hs) - 2),
                             i -> list_min(hs[CAST(i AS INT):CAST(i + 3 AS INT)]))
                 END AS wins
          FROM h
        ),
        fps AS (
          SELECT DISTINCT doc_id, fingerprint
          FROM (SELECT doc_id, unnest(wins) AS fingerprint FROM w) t
        )
"""

_CHURN_Z_SQL = (
    "-2.0 + 0.9 * ln(1.0 + frequency)"
    " + 0.15 * (cents / 100.0 / 100000.0)"
    " - 0.002 * (10957 - last_day)"
)  # the model's weights, mirrored from queries._churn_z — ONE place per engine


def _churn_feat_sql(upto_1997: bool) -> str:
    """The f CTE: exact feature aggregates, optionally with the temporal
    train/serve split (mirrors queries._churn_features)."""
    where = ("\n          WHERE year(CAST(o_orderdate AS DATE)) <= 1997"
             if upto_1997 else "")
    return f"""f AS (
          SELECT o_custkey,
                 count(*) AS frequency,
                 sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                   AS cents,
                 max(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                   AS last_day
          FROM orders{where} GROUP BY 1)"""


_CHURN_SCORED_LABELED_SQL = f"""{_churn_feat_sql(True)},
        s AS (
          SELECT o_custkey,
                 CAST(floor(
                   (1.0 / (1.0 + exp(-({_CHURN_Z_SQL})))) * 1000000.0 + 0.5)
                   AS BIGINT) AS s6
          FROM f),
        a AS (SELECT DISTINCT o_custkey FROM orders
              WHERE year(CAST(o_orderdate AS DATE)) = 1998),
        j AS MATERIALIZED (
          SELECT s.o_custkey, s.s6,
                 CASE WHEN a.o_custkey IS NULL THEN 0 ELSE 1 END AS label
          FROM s LEFT JOIN a ON a.o_custkey = s.o_custkey)"""


def _decay_sql() -> str:
    """Mirror of q_decayed_engagement: the same 41-row dyadic weight
    table (imported, not retyped), HUGEINT products matching Spark's
    DECIMAL(38,0), and the same two exact-double divisions."""
    from .functions.resample import dyadic_decay_weights

    vals = ", ".join(f"({k}, {w})" for k, w in dyadic_decay_weights())
    return f"""
        WITH od AS (
          SELECT o_custkey,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS cents,
                 CAST(floor((DATE '1998-08-02'
                             - CAST(o_orderdate AS DATE)) / 30.0) AS INT)
                   AS k
          FROM orders),
        wt(k, wt) AS (VALUES {vals})
        SELECT o_custkey, count(*) AS n_orders,
               {pround_sql(
                   'CAST(sum(CAST(cents AS HUGEINT) * CAST(wt AS HUGEINT))'
                   ' AS DOUBLE) / 1099511627776.0 / 100.0', 6)}
                 AS decayed_value
        FROM od JOIN wt USING (k)
        GROUP BY o_custkey
    """


def _bootstrap_by_segment_sql() -> str:
    """Mirror of q_bootstrap_ci_by_segment: the grouped Poisson
    bootstrap with the same shared thresholds, digest-slice uniforms,
    and per-segment order-statistic bounds."""
    hexes = poisson1_hex_thresholds()
    cases = " ".join(
        f"WHEN u8 <= '{hx}' THEN {k}" for k, hx in enumerate(hexes)
    )
    quads = _bootstrap_quads_sql(
        seg_expr="c.c_mktsegment AS segment, ",
        seg_col="segment, ",
        join=" JOIN customer c ON c.c_custkey = o.o_custkey",
    )
    return f"""
        WITH {quads},
        w AS (
          SELECT segment, b, cents, CASE {cases} ELSE {len(hexes)} END AS w
          FROM r),
        g AS (SELECT segment, b, sum(w) AS sw, sum(w * cents) AS swx
              FROM w GROUP BY segment, b),
        m AS (SELECT segment,
                     CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS mean_cents
              FROM g),
        c AS (SELECT segment,
                     (list_sort(list(mean_cents)))[2] AS lo_cents,
                     (list_sort(list(mean_cents)))[40] AS hi_cents
              FROM m GROUP BY segment)
        SELECT segment,
               {pround_sql('lo_cents / 100.0', 6)} AS ci_lo,
               {pround_sql('hi_cents / 100.0', 6)} AS ci_hi
        FROM c
    """


def _linkage_sql() -> str:
    """Mirror of q_linkage_weights: the same pinned Fellegi-Sunter
    log-odds (imported, not retyped) in the same left-to-right 4-term
    chain over the same blocked pair join."""
    from .functions.linkage import fs_weights

    cols = ["p_size", "name_adj", "name_noun", "ptype"]
    chain = None
    for c, (_, wa, wd) in zip(cols, fs_weights()):
        t = f"(CASE WHEN a.{c} = b.{c} THEN {wa!r} ELSE {wd!r} END)"
        chain = t if chain is None else f"({chain} + {t})"
    return f"""
        WITH pt AS (
          SELECT p_partkey, p_brand, p_size,
                 split_part(p_name, ' ', 1) AS name_adj,
                 split_part(p_name, ' ', 2) AS name_noun,
                 p_type AS ptype
          FROM part)
        SELECT CAST(floor({chain}) AS BIGINT) AS weight_band,
               count(*) AS n_pairs
        FROM pt a JOIN pt b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        GROUP BY 1
    """


def _linkage_em_sql(rounds: int = 3) -> str:
    """Mirror of q_linkage_em: the 16-row agreement-pattern contingency,
    then ``rounds`` unrolled EM rounds — dyadic inits, the per-pattern
    posterior as the same left-associated IEEE chain, w pinned to x1e9
    before HUGEINT-exact weighted sums, every M-step parameter one
    division of exact integers."""
    h = "CAST(c AS HUGEINT)"
    ctes = []
    for k in range(1, rounds + 1):
        num = "s.lam"
        den = "(1.0 - s.lam)"
        for i in range(4):
            num = (
                f"({num} * (CASE WHEN g{i} = 1 THEN s.m{i}"
                f" ELSE 1.0 - s.m{i} END))"
            )
            den = (
                f"({den} * (CASE WHEN g{i} = 1 THEN s.u{i}"
                f" ELSE 1.0 - s.u{i} END))"
            )
        m_terms = ", ".join(
            f"CAST(sum({h} * w9 * g{i}) AS DOUBLE)"
            f" / CAST(sum({h} * w9) AS DOUBLE) AS m{i}"
            for i in range(4)
        )
        u_terms = ", ".join(
            f"CAST(sum({h} * (1000000000 - w9) * g{i}) AS DOUBLE)"
            f" / (CAST(sum({h}) AS DOUBLE) * 1e9"
            f"    - CAST(sum({h} * w9) AS DOUBLE)) AS u{i}"
            for i in range(4)
        )
        ctes.append(f"""
        r{k} AS (
          SELECT c, g0, g1, g2, g3,
                 CAST(floor({num} / ({num} + {den}) * 1e9 + 0.5)
                      AS BIGINT) AS w9
          FROM pat, s{k - 1} s),
        s{k} AS (
          SELECT CAST(sum({h} * w9) AS DOUBLE)
                   / (CAST(sum({h}) AS DOUBLE) * 1e9) AS lam,
                 {m_terms},
                 {u_terms}
          FROM r{k})""")
    names = ["size", "name_adj", "name_noun", "ptype"]
    outs = ", ".join(
        [pround_sql("lam", 6) + " AS lambda_match"]
        + [
            pround_sql(f"m{i}", 6) + f" AS m_{names[i]}"
            for i in range(4)
        ]
        + [
            pround_sql(f"u{i}", 6) + f" AS u_{names[i]}"
            for i in range(4)
        ]
    )
    return (
        """
        WITH pt AS (
          SELECT p_partkey, p_brand, p_size,
                 split_part(p_name, ' ', 1) AS name_adj,
                 split_part(p_name, ' ', 2) AS name_noun,
                 p_type AS ptype
          FROM part),
        pat AS (
          SELECT CASE WHEN a.p_size = b.p_size THEN 1 ELSE 0 END AS g0,
                 CASE WHEN a.name_adj = b.name_adj THEN 1 ELSE 0 END
                   AS g1,
                 CASE WHEN a.name_noun = b.name_noun THEN 1 ELSE 0 END
                   AS g2,
                 CASE WHEN a.ptype = b.ptype THEN 1 ELSE 0 END AS g3,
                 CAST(count(*) AS BIGINT) AS c
          FROM pt a JOIN pt b
            ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
          GROUP BY 1, 2, 3, 4),
        s0 AS (SELECT 0.125 AS lam,
                      0.75 AS m0, 0.75 AS m1, 0.75 AS m2, 0.75 AS m3,
                      0.25 AS u0, 0.25 AS u1, 0.25 AS u2, 0.25 AS u3),"""
        + ",".join(ctes)
        + f"""
        SELECT {outs} FROM s{rounds}"""
    )


def _bootstrap_quads_sql(seg_expr: str = "", seg_col: str = "",
                         join: str = "") -> str:
    """The shared replicate-uniform CTEs: one md5 per (row, chunk), four
    32-bit digest slices per hash — mirrors the Spark side's 11-hash
    layout exactly (same strings hashed, same slices)."""
    slices = ", ".join(
        f"struct_pack(b := chunk * 4 + {j}, "
        f"u8 := substr(h, {1 + 8 * j}, 8))"
        for j in range(4)
    )
    return f"""hx AS (
          SELECT {seg_expr}t.chunk AS chunk,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
                 md5(CAST(o_orderkey AS VARCHAR) || ':'
                     || CAST(t.chunk AS VARCHAR)) AS h
          FROM orders o{join}
          CROSS JOIN range(0, 11) t(chunk)),
        rq AS (
          SELECT {seg_col}cents, unnest([{slices}]) AS q
          FROM hx),
        r AS (
          SELECT {seg_col}cents, q.b AS b, q.u8 AS u8
          FROM rq WHERE q.b <= 40)"""


def _bootstrap_sql() -> str:
    """Mirror of q_bootstrap_ci: same md5-digest-slice uniforms, the
    SAME Poisson(1) inverse-CDF thresholds (imported, not retyped),
    exact integer replicate sums, and order-statistic CI bounds."""
    hexes = poisson1_hex_thresholds()
    cases = " ".join(
        f"WHEN u8 <= '{hx}' THEN {k}" for k, hx in enumerate(hexes)
    )
    return f"""
        WITH {_bootstrap_quads_sql()},
        w AS (
          SELECT b, cents, CASE {cases} ELSE {len(hexes)} END AS w
          FROM r),
        g AS (SELECT b, sum(w) AS sw, sum(w * cents) AS swx
              FROM w GROUP BY b),
        m AS (SELECT CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) AS mean_cents
              FROM g),
        c AS (SELECT (list_sort(list(mean_cents)))[2] AS lo_cents,
                     (list_sort(list(mean_cents)))[40] AS hi_cents
              FROM m),
        p AS (SELECT count(*) AS n_orders,
                     sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                       AS sc
              FROM orders)
        SELECT n_orders,
               {pround_sql('CAST(sc AS DOUBLE) / n_orders / 100.0', 6)}
                 AS mean_value,
               {pround_sql('lo_cents / 100.0', 6)} AS ci_lo,
               {pround_sql('hi_cents / 100.0', 6)} AS ci_hi
        FROM p CROSS JOIN c
    """


def _cramers_sql() -> str:
    """Mirror of q_cramers_v: the same pinned 3×5 contingency pivot, the
    same algebraic clearing (O·N−R·C)²/(N·R·C) in exact HUGEINT products
    (Spark side: DECIMAL(38,0)), and the same left-to-right 15-term
    double chain."""
    sts = ["F", "O", "P"]
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    cells = ",\n                 ".join(
        f"sum(CASE WHEN o_orderstatus = '{s}' AND o_orderpriority = '{p}'"
        f" THEN 1 ELSE 0 END) AS o_{i}_{j}"
        for i, s in enumerate(sts)
        for j, p in enumerate(pris)
    )
    h = lambda e: f"CAST({e} AS HUGEINT)"  # noqa: E731
    rows = {
        i: "(" + " + ".join(f"o_{i}_{j}" for j in range(len(pris))) + ")"
        for i in range(len(sts))
    }
    cols = {
        j: "(" + " + ".join(f"o_{i}_{j}" for i in range(len(sts))) + ")"
        for j in range(len(pris))
    }
    n = "(" + " + ".join(rows[i] for i in range(len(sts))) + ")"
    chain = None
    for i in range(len(sts)):
        for j in range(len(pris)):
            num = (
                f"({h(f'o_{i}_{j}')} * {h(n)}"
                f" - {h(rows[i])} * {h(cols[j])})"
            )
            den = f"({h(n)} * {h(rows[i])} * {h(cols[j])})"
            t = f"(CAST({num} * {num} AS DOUBLE) / CAST({den} AS DOUBLE))"
            chain = t if chain is None else f"({chain} + {t})"
    return f"""
        WITH one AS (
          SELECT {cells}
          FROM orders)
        SELECT CAST({n} AS BIGINT) AS n_orders,
               {pround_sql(chain, 6)} AS chi2,
               {pround_sql(
                   f'sqrt({chain} / (CAST({n} AS DOUBLE) * 2.0))', 6)}
                 AS cramers_v
        FROM one
    """


def _ema_sql(n_terms: int = 12, decay: float = 0.7) -> str:
    """Truncated-FIR exponential smoothing mirroring q_exp_smoothing:
    the same 12 lag terms with repr'd double weights, summed in the same
    left-to-right order, renormalized over the lags present."""
    num, den = [], []
    for k in range(n_terms):
        wk = repr(decay**k)
        lk = "revenue" if k == 0 else f"lag(revenue, {k}) OVER w"
        num.append(
            f"CASE WHEN {lk} IS NOT NULL THEN {wk} * {lk} ELSE 0.0 END"
        )
        den.append(f"CASE WHEN {lk} IS NOT NULL THEN {wk} ELSE 0.0 END")
    expr = f"({' + '.join(num)}) / ({' + '.join(den)})"
    return f"""
        WITH monthly AS (
          SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                 CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
          FROM orders GROUP BY 1)
        SELECT m, revenue,
               {pround_sql(expr, 4)} AS smoothed
        FROM monthly WINDOW w AS (ORDER BY m)
    """


def _hex_bigint(md5_expr: str, start: int, length: int) -> str:
    """SQL for interpreting ``length`` hex chars of ``md5_expr`` starting at
    1-based ``start`` as a BIGINT — DuckDB has no ``conv``; mirrors Spark's
    ``conv(substring(md5(x), start, length), 16, 10)``.

    CAUTION: the expansion re-evaluates ``md5_expr`` inside a lambda whose
    variable is ``i`` — a caller column named ``i`` referenced in
    ``md5_expr`` is silently shadowed by the nibble index (observed as
    identical hashes for every probe round in q_bloom_semijoin).  Name
    outer columns anything but ``i``."""
    return (
        f"CAST(list_sum(list_transform(range(0, {length}), i -> "
        f"(CAST(strpos('0123456789abcdef', "
        f"substr({md5_expr}, CAST(i AS INT) + {start}, 1)) AS BIGINT) - 1) "
        f"* (CAST(1 AS BIGINT) << CAST(4 * ({length - 1} - i) AS INT)))) "
        f"AS BIGINT)"
    )


# Portable md5 bucket in [0,100): first 4 hex nibbles of md5(doc_id) as an
# int, mod 100 — matches Spark's conv(substring(md5(...),1,4),16,10) % 100.
_BUCKET = """
  CAST(list_sum(list_transform(range(0, 4), i ->
    (CAST(strpos('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT) + 1, 1))
          AS BIGINT) - 1)
    * (CAST(1 AS BIGINT) << CAST(4 * (3 - i) AS INT)))) AS BIGINT) % 100
"""


# Shared MinHash+LSH banding chain (16 hashes / 4 bands / 3-word
# shingles — mirrors operators/dedup.py lsh_band_buckets), ending in
# bands(doc_id, band, bucket); consumers join bands to themselves for
# candidate pairs or derive star edges.  ``src`` names the document
# source (a pre-collapsed CTE cannot shadow the documents view —
# DuckDB rejects the circular reference).
def _lsh_bands_cte(src: str = "documents") -> str:
    return _LSH_BANDS_TEMPLATE.format(src=src)


_LSH_BANDS_TEMPLATE = f"""
        docs AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
          FROM {{src}}
        ),
        sh3 AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            END)) AS sh
          FROM docs
        ),
        dg AS (SELECT doc_id, md5(sh) AS m FROM sh3),
        hh AS (
          SELECT doc_id,
                 {_hex_bigint('m', 1, 15)} AS h1,
                 {_hex_bigint('m', 17, 12)} AS h2
          FROM dg
        ),
        mh AS (
          SELECT doc_id, i,
                 min((h1 + i * h2) & ((CAST(1 AS BIGINT) << 60) - 1)) AS mh
          FROM hh, (SELECT unnest(range(0, 16)) AS i) idx
          GROUP BY doc_id, i
        ),
        bands AS (
          SELECT doc_id, CAST(i // 4 AS INT) AS band,
                 md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS bucket
          FROM mh GROUP BY doc_id, band
        )
"""

def _h_le16(pos: int) -> str:
    """Little-endian uint16 at 1-based BYTE offset ``pos`` of hex column
    ``h`` — the oracle-side twin of sources/multimodal.py ``_le16``."""
    return (
        f"({_hex_bigint('h', 2 * pos - 1, 2)}"
        f" + {_hex_bigint('h', 2 * pos + 1, 2)} * 256)"
    )


def _h_le32(pos: int) -> str:
    """Little-endian uint32 at byte offset ``pos`` of hex column ``h``."""
    return f"({_h_le16(pos)} + {_h_le16(pos + 2)} * 65536)"


def _media_roundtrip_oracle() -> str:
    """Twin of q_media_header_roundtrip: build the same blob hex from the
    same doc_id-derived parameters (layouts + encoders single-sourced in
    functions/mediahex.py), then re-derive every output field with
    fixed-offset nibble arithmetic OVER THE HEX — the parse is real, not
    an echo of the construction parameters."""
    from .functions.mediahex import (
        DATA_HEX,
        FMT_HEX,
        GIF_SIG_HEX,
        GIF_TAIL_HEX,
        IHDR_HEX,
        PNG_SIG_HEX,
        PNG_TAIL_HEX,
        RIFF_HEX,
        WAVE_HEX,
        WAV_BITS,
        WAV_RATES,
        be32_sql,
        le16_sql,
        le32_sql,
    )

    rates = ",".join(str(r) for r in WAV_RATES)
    bits_l = ",".join(str(b) for b in WAV_BITS)
    return f"""
        WITH p AS (
          SELECT doc_id, doc_id % 3 AS m,
                 16 + (doc_id * 37) % 4080 AS pw,
                 16 + (doc_id * 61) % 2160 AS ph,
                 16 + (doc_id * 37) % 60000 AS gw,
                 16 + (doc_id * 61) % 60000 AS gh,
                 1 + doc_id % 2 AS ch,
                 ([{rates}])[CAST(doc_id % 5 AS INT) + 1] AS rate,
                 ([{bits_l}])[CAST(doc_id % 7 % 3 AS INT) + 1] AS bits,
                 1000 + (doc_id * 97) % 100000 AS db
          FROM documents
        ),
        blobs AS (
          SELECT doc_id, m,
                 CASE WHEN m = 2 THEN 'audio' ELSE 'image' END AS modality,
                 CASE m
                   WHEN 0 THEN '{PNG_SIG_HEX}' || '0000000d' || '{IHDR_HEX}'
                     || {be32_sql('pw')} || {be32_sql('ph')}
                     || '{PNG_TAIL_HEX}'
                   WHEN 1 THEN '{GIF_SIG_HEX}'
                     || {le16_sql('gw')} || {le16_sql('gh')}
                     || '{GIF_TAIL_HEX}'
                   ELSE '{RIFF_HEX}' || {le32_sql('db + 36')}
                     || '{WAVE_HEX}' || '{FMT_HEX}' || '10000000' || '0100'
                     || {le16_sql('ch')} || {le32_sql('rate')}
                     || {le32_sql('rate * ch * bits // 8')}
                     || {le16_sql('ch * bits // 8')} || {le16_sql('bits')}
                     || '{DATA_HEX}' || {le32_sql('db')}
                 END AS h
          FROM p
        )
        SELECT doc_id, modality,
               CAST(length(h) // 2 AS INT) AS byte_len,
               h AS blob_hex,
               CASE WHEN m = 2 THEN
                 CASE WHEN substr(h, 1, 8) = '{RIFF_HEX}'
                       AND substr(h, 17, 8) = '{WAVE_HEX}'
                      THEN 'wav' ELSE 'unknown' END
               ELSE
                 CASE WHEN substr(h, 1, 16) = '{PNG_SIG_HEX}'
                      THEN 'png'
                      WHEN substr(h, 1, 8) = '47494638'
                      THEN 'gif' ELSE 'unknown' END
               END AS container,
               CASE WHEN m = 0 THEN CAST({_hex_bigint('h', 33, 8)} AS INT)
                    WHEN m = 1 THEN CAST({_h_le16(7)} AS INT)
               END AS width,
               CASE WHEN m = 0 THEN CAST({_hex_bigint('h', 41, 8)} AS INT)
                    WHEN m = 1 THEN CAST({_h_le16(9)} AS INT)
               END AS height,
               CASE WHEN m = 2 THEN {_h_le32(25)} END AS sample_rate,
               CASE WHEN m = 2 THEN CAST({_h_le16(23)} AS INT)
               END AS channels,
               CASE WHEN m = 2 THEN CAST({_h_le16(35)} AS INT)
               END AS bits_per_sample,
               CASE WHEN m = 2 THEN CAST(floor(
                 CAST({_h_le32(41)} * 1000 AS DOUBLE)
                 / (CAST({_h_le32(25)} AS DOUBLE)
                    * {_h_le16(23)} * {_h_le16(35)} / 8)
               ) AS BIGINT) END AS duration_ms
        FROM blobs
    """


def _png_decode_oracle() -> str:
    """Twin of q_media_png_decode: rebuild the identical stored-deflate
    PNG hex from the single-sourced derivations (functions/mediahex.py
    — including the REAL computed ADLER-32 trailer), then DECODE it —
    IHDR fields via fixed-offset nibble arithmetic, the stored-block
    LEN from the deflate framing bytes, identity unfiltering with a
    per-row filter-byte max, channel sums via a dynamic-position
    nibble walk, and the adler re-verification.  Lambda vars p/q/r —
    never i (_hex_bigint caveat)."""
    from .functions.mediahex import (
        IDAT_HEX,
        IEND_HEX,
        IHDR_HEX,
        PNG_IHDR_TAIL_RGB_HEX,
        PNG_SIG_HEX,
        PNGS_H,
        PNGS_PX,
        PNGS_W,
        ZLIB_STORED_HDR_HEX,
        be32_sql,
        le16_sql,
        png_rowbytes_sql,
    )

    nib = "'0123456789abcdef'"

    def hbyte(off0: str) -> str:
        """Byte value at dynamic 0-based offset of hex column ``h``."""
        return (
            f"((strpos({nib}, substr(h, CAST(2 * ({off0}) + 1 AS INT),"
            f" 1)) - 1) * 16"
            f" + strpos({nib}, substr(h, CAST(2 * ({off0}) + 2 AS INT),"
            f" 1)) - 1)"
        )

    def chan_sum(ch: int) -> str:
        off = f"48 + (p // wp) * rbp + 1 + 3 * (p % wp) + {ch}"
        return (
            f"list_sum(list_transform(range(0, wp * hp), p -> "
            f"{hbyte(off)}))"
        )

    raw_b = f"CASE WHEN q % rb = 0 THEN 0 ELSE {PNGS_PX} END"
    raw_hex = (
        "array_to_string(list_transform(range(0, rawlen), q -> "
        f"lower(lpad(hex({raw_b}), 2, '0'))), '')"
    )
    s1 = (
        f"(1 + list_sum(list_transform(range(0, rawlen), q -> {raw_b})))"
        " % 65521"
    )
    s2 = (
        "(rawlen + list_sum(list_transform(range(0, rawlen), q -> "
        f"(rawlen - q) * ({raw_b})))) % 65521"
    )
    # decode-side dynamic adler parse: 4 bytes big-endian at 0-based
    # offset 48 + lp
    adler_stored = " + ".join(
        f"{hbyte(f'48 + lp + {k}')} * {256 ** (3 - k)}" for k in range(4)
    )
    return f"""
        WITH p0 AS (
          SELECT doc_id, {PNGS_W} AS w, {PNGS_H} AS hh FROM documents),
        sized AS (
          SELECT doc_id, w, hh, {png_rowbytes_sql('w')} AS rb,
                 hh * {png_rowbytes_sql('w')} AS rawlen
          FROM p0),
        blobs AS (
          SELECT doc_id,
                 '{PNG_SIG_HEX}' || {be32_sql('13')} || '{IHDR_HEX}'
                 || {be32_sql('w')} || {be32_sql('hh')}
                 || '{PNG_IHDR_TAIL_RGB_HEX}' || '00000000'
                 || {be32_sql('rawlen + 11')} || '{IDAT_HEX}'
                 || '{ZLIB_STORED_HDR_HEX}'
                 || {le16_sql('rawlen')} || {le16_sql('65535 - rawlen')}
                 || {raw_hex}
                 || {be32_sql(f'({s2}) * 65536 + ({s1})')}
                 || '00000000' || '00000000' || '{IEND_HEX}'
                 || '00000000' AS h
          FROM sized),
        hdr AS (
          SELECT doc_id, h,
                 CAST({_hex_bigint('h', 33, 8)} AS BIGINT) AS wp,
                 CAST({_hex_bigint('h', 41, 8)} AS BIGINT) AS hp,
                 CAST({_h_le16(45)} AS BIGINT) AS lp
          FROM blobs),
        dec AS (
          SELECT *, 1 + 3 * wp AS rbp FROM hdr),
        sums AS (
          SELECT doc_id, h, wp, hp, lp, rbp,
                 CAST({chan_sum(0)} AS BIGINT) AS sum_r,
                 CAST({chan_sum(1)} AS BIGINT) AS sum_g,
                 CAST({chan_sum(2)} AS BIGINT) AS sum_b,
                 list_max(list_transform(range(0, hp), r ->
                   {hbyte('48 + r * rbp')})) = 0 AS filters_ok,
                 CAST({adler_stored} AS BIGINT) =
                   ((lp + list_sum(list_transform(range(0, lp), q ->
                       (lp - q) * {hbyte('48 + q')}))) % 65521) * 65536
                   + ((1 + list_sum(list_transform(range(0, lp), q ->
                       {hbyte('48 + q')}))) % 65521) AS adler_ok
          FROM dec)
        SELECT doc_id,
               CASE WHEN substr(h, 1, 16) = '{PNG_SIG_HEX}'
                    THEN 'png' ELSE 'unknown' END AS container,
               CAST(length(h) // 2 AS INT) AS byte_len,
               h AS blob_hex,
               CAST(wp AS INT) AS width,
               CAST(hp AS INT) AS height,
               CAST(wp * hp AS BIGINT) AS n_px,
               sum_r, sum_g, sum_b,
               CAST(299 * sum_r + 587 * sum_g + 114 * sum_b AS BIGINT)
                 AS luma_k,
               filters_ok, adler_ok
        FROM sums
    """


def _png_histogram_oracle() -> str:
    """Twin of q_media_png_histogram: rebuild the stored-deflate PNG
    hex, parse dims from IHDR, walk the scanlines at parsed offsets,
    and bin each channel into 4 bins of 64 levels — one row per
    (doc, channel r/g/b)."""
    from .functions.mediahex import (
        IDAT_HEX,
        IEND_HEX,
        IHDR_HEX,
        PNG_IHDR_TAIL_RGB_HEX,
        PNG_SIG_HEX,
        PNGS_H,
        PNGS_PX,
        PNGS_W,
        ZLIB_STORED_HDR_HEX,
        be32_sql,
        le16_sql,
        png_rowbytes_sql,
    )

    nib = "'0123456789abcdef'"

    def hbyte(off0: str) -> str:
        return (
            f"((strpos({nib}, substr(h, CAST(2 * ({off0}) + 1 AS INT),"
            f" 1)) - 1) * 16"
            f" + strpos({nib}, substr(h, CAST(2 * ({off0}) + 2 AS INT),"
            f" 1)) - 1)"
        )

    def chan_px(ch: int) -> str:
        off = f"48 + (p // wp) * rbp + 1 + 3 * (p % wp) + {ch}"
        return (
            f"list_transform(range(0, wp * hp), p -> {hbyte(off)})"
        )

    def bins(ch: int) -> str:
        return ", ".join(
            f"CAST(len(list_filter({chan_px(ch)}, v -> v // 64 = {k}))"
            f" AS BIGINT) AS bin_{k}"
            for k in range(4)
        )

    raw_b = f"CASE WHEN q % rb = 0 THEN 0 ELSE {PNGS_PX} END"
    raw_hex = (
        "array_to_string(list_transform(range(0, rawlen), q -> "
        f"lower(lpad(hex({raw_b}), 2, '0'))), '')"
    )
    s1 = (
        f"(1 + list_sum(list_transform(range(0, rawlen), q -> {raw_b})))"
        " % 65521"
    )
    s2 = (
        "(rawlen + list_sum(list_transform(range(0, rawlen), q -> "
        f"(rawlen - q) * ({raw_b})))) % 65521"
    )
    per_chan = "\n          UNION ALL\n          ".join(
        f"SELECT doc_id, '{name}' AS channel, wp, hp, {bins(ch)} FROM dec"
        for ch, name in ((0, "r"), (1, "g"), (2, "b"))
    )
    return f"""
        WITH p0 AS (
          SELECT doc_id, {PNGS_W} AS w, {PNGS_H} AS hh FROM documents),
        sized AS (
          SELECT doc_id, w, hh, {png_rowbytes_sql('w')} AS rb,
                 hh * {png_rowbytes_sql('w')} AS rawlen
          FROM p0),
        blobs AS (
          SELECT doc_id,
                 '{PNG_SIG_HEX}' || {be32_sql('13')} || '{IHDR_HEX}'
                 || {be32_sql('w')} || {be32_sql('hh')}
                 || '{PNG_IHDR_TAIL_RGB_HEX}' || '00000000'
                 || {be32_sql('rawlen + 11')} || '{IDAT_HEX}'
                 || '{ZLIB_STORED_HDR_HEX}'
                 || {le16_sql('rawlen')} || {le16_sql('65535 - rawlen')}
                 || {raw_hex}
                 || {be32_sql(f'({s2}) * 65536 + ({s1})')}
                 || '00000000' || '00000000' || '{IEND_HEX}'
                 || '00000000' AS h
          FROM sized),
        hdr AS (
          SELECT doc_id, h,
                 CAST({_hex_bigint('h', 33, 8)} AS BIGINT) AS wp,
                 CAST({_hex_bigint('h', 41, 8)} AS BIGINT) AS hp
          FROM blobs),
        dec AS (SELECT *, 1 + 3 * wp AS rbp FROM hdr),
        chans AS (
          {per_chan})
        SELECT doc_id, channel,
               CAST(wp AS INT) AS width, CAST(hp AS INT) AS height,
               CAST(wp * hp AS BIGINT) AS n_px,
               bin_0, bin_1, bin_2, bin_3
        FROM chans
    """


def _bmp_decode_oracle() -> str:
    """Twin of q_media_bmp_decode: rebuild the identical BMP hex from
    the single-sourced derivations (functions/mediahex.py), then DECODE
    it — header fields via fixed-offset nibble arithmetic, pixel
    channel sums via a dynamic-position nibble walk over the hex (the
    hex-pair at 1-based position 2·o+1 is the byte at 0-based offset
    o).  Lambda var p/q — never i (_hex_bigint caveat); all walk inputs
    come from the PARSED header columns, mirroring bmp_pixel_stats."""
    from .functions.mediahex import (
        BMP_H,
        BMP_PX,
        BMP_SIG_HEX,
        BMP_W,
        bmp_stride_sql,
        le16_sql,
        le32_sql,
    )

    def chan_sum(ch: int) -> str:
        off = f"2 * (po + (p // wp) * st + 3 * (p % wp) + {ch})"
        nib = "'0123456789abcdef'"
        return (
            f"list_sum(list_transform(range(0, wp * hp), p -> "
            f"(strpos({nib}, substr(h, CAST({off} + 1 AS INT), 1)) - 1)"
            f" * 16"
            f" + strpos({nib}, substr(h, CAST({off} + 2 AS INT), 1)) - 1"
            f"))"
        )

    pixel_hex = (
        "array_to_string(list_transform(range(0, npb), q -> "
        "lower(lpad(hex(CASE WHEN q % stride < 3 * w "
        f"THEN {BMP_PX} ELSE 0 END), 2, '0'))), '')"
    )
    return f"""
        WITH p0 AS (
          SELECT doc_id, {BMP_W} AS w, {BMP_H} AS hh FROM documents),
        sized AS (
          SELECT doc_id, w, hh, {bmp_stride_sql('w')} AS stride,
                 {bmp_stride_sql('w')} * hh AS npb
          FROM p0),
        blobs AS (
          SELECT doc_id,
                 '{BMP_SIG_HEX}' || {le32_sql('54 + npb')} || '00000000'
                 || {le32_sql('54')} || {le32_sql('40')}
                 || {le32_sql('w')} || {le32_sql('hh')}
                 || {le16_sql('1')} || {le16_sql('24')}
                 || {le32_sql('0')} || {le32_sql('npb')}
                 || {le32_sql('2835')} || {le32_sql('2835')}
                 || {le32_sql('0')} || {le32_sql('0')}
                 || {pixel_hex} AS h
          FROM sized),
        hdr AS (
          SELECT doc_id, h,
                 CAST({_h_le32(11)} AS BIGINT) AS po,
                 CAST({_h_le32(19)} AS BIGINT) AS wp,
                 CAST({_h_le32(23)} AS BIGINT) AS hp
          FROM blobs),
        dec AS (
          SELECT *, {bmp_stride_sql('wp')} AS st FROM hdr),
        sums AS (
          SELECT doc_id, h, wp, hp,
                 CAST({chan_sum(0)} AS BIGINT) AS sum_b,
                 CAST({chan_sum(1)} AS BIGINT) AS sum_g,
                 CAST({chan_sum(2)} AS BIGINT) AS sum_r
          FROM dec)
        SELECT doc_id,
               CASE WHEN substr(h, 1, 4) = '{BMP_SIG_HEX}'
                    THEN 'bmp' ELSE 'unknown' END AS container,
               CAST(length(h) // 2 AS INT) AS byte_len,
               h AS blob_hex,
               CAST(wp AS INT) AS width,
               CAST(hp AS INT) AS height,
               CAST(wp * hp AS BIGINT) AS n_px,
               sum_b, sum_g, sum_r,
               CAST(299 * sum_r + 587 * sum_g + 114 * sum_b AS BIGINT)
                 AS luma_k
        FROM sums
    """


def _ewma_oracle() -> str:
    """Twin of q_ewma_daily: identical dyadic integer weights
    W_k = 3^k·4^(7−k), identical lag taps with warm-up exclusion from
    both numerator and denominator, one pinned division."""
    wts = [3**k * 4 ** (7 - k) for k in range(8)]
    lags = ",\n                 ".join(
        f"lag(cents, {k}) OVER (ORDER BY d) AS l{k}" for k in range(8)
    )
    num = " + ".join(f"{w} * coalesce(l{k}, 0)" for k, w in enumerate(wts))
    den = " + ".join(
        f"CASE WHEN l{k} IS NOT NULL THEN {w} ELSE 0 END"
        for k, w in enumerate(wts)
    )
    return f"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders,
                 CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        lagged AS (
          SELECT d, n_orders, cents,
                 {lags}
          FROM daily)
        SELECT d, n_orders, cents / 100.0 AS revenue,
               {pround_sql(
                   f'CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)'
                   ' / 100.0', 4
               )} AS ewma_revenue
        FROM lagged
    """


def _qls_margin_ctes() -> str:
    """Shared CTE chain computing the hashed-linear-model margin per
    doc (twin of queries._qls_margins) — consumed by the scorer AND
    the preference-pair oracle."""
    return f"""tok AS (
          SELECT doc_id, len({_TOKENS}) AS dl,
                 unnest({_TOKENS}) AS tok
          FROM documents WHERE trim(text) <> ''),
        sl AS (
          SELECT doc_id, dl,
                 CAST({_hex_bigint("md5('qls-v1|' || tok)", 1, 8)} % 1024
                      AS INT) AS slot
          FROM tok),
        model AS (
          SELECT CAST(r AS INT) AS slot,
                 CAST({_hex_bigint(
                     "md5('qls-w-v1|' || CAST(r AS VARCHAR))", 1, 8
                 )} % 2001 - 1000 AS BIGINT) AS w
          FROM (SELECT unnest(range(0, 1024)) AS r) g),
        sc AS (
          SELECT doc_id, dl, CAST(SUM(w) AS BIGINT) AS margin
          FROM sl JOIN model USING (slot) GROUP BY doc_id, dl)"""


def _power_analysis_oracle() -> str:
    """Twin of q_power_analysis: identical repr-exact (z_a+z_b)^2
    literal, identical DECIMAL power sums and expression order."""
    c2 = '7.848879734349091'
    return f"""
        WITH j AS (
          SELECT c.c_mktsegment AS segment,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        g AS (
          SELECT segment,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS sx,
                 SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
                   AS sxx
          FROM j GROUP BY 1),
        v AS (
          SELECT segment, n, sx,
                 CAST(CAST(n AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)
                      AS DOUBLE)
                 / CAST(n * (n - 1) AS DOUBLE) AS vr,
                 CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu
          FROM g)
        SELECT segment, n,
               {pround_sql('mu / 100.0', 4)} AS mean_value,
               {pround_sql('sqrt(vr) / 100.0', 4)} AS sd_value,
               {pround_sql(
                   f'sqrt({c2} * vr * 2.0 / CAST(n AS DOUBLE)) / 100.0',
                   4
               )} AS mde_value,
               CAST(ceil(2.0 * vr * {c2}
                         / ((mu * 0.05) * (mu * 0.05))) AS BIGINT)
                 AS n_required_per_arm
        FROM v
    """


def _sprt_oracle() -> str:
    """Twin of q_sprt_sequential: identical repr-exact LLR increment
    literals, identical hash arm, identical ordered cumulative sum."""
    import math

    l1 = repr(math.log(0.35 / 0.30))
    l0 = repr(math.log(0.65 / 0.70))
    bound = repr(math.log(19.0))
    return f"""
        WITH tr AS (
          SELECT CAST(o_orderdate AS DATE) AS d, o_orderpriority
          FROM orders
          WHERE {_hex_bigint(
              "md5('sprt-v1|' || CAST(o_custkey AS VARCHAR))", 1, 8
          )} % 2 = 0),
        daily AS (
          SELECT d, CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN o_orderpriority
                                IN ('1-URGENT', '2-HIGH')
                          THEN 1 ELSE 0 END) AS BIGINT) AS c
          FROM tr GROUP BY d),
        cum AS (
          SELECT d, n, c,
                 SUM(CAST(c AS DOUBLE) * {l1}
                     + CAST(n - c AS DOUBLE) * {l0})
                   OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS s
          FROM daily)
        SELECT d, n, c,
               {pround_sql('s', 6)} AS llr,
               CASE WHEN s >= {bound} THEN 'accept_h1'
                    WHEN s <= -{bound} THEN 'accept_h0'
                    ELSE 'continue' END AS decision
        FROM cum
    """


def _quality_linear_scorer_oracle() -> str:
    """Twin of q_quality_linear_scorer: same tokenization, same md5
    slot/weight derivations (weights in [-1000, 1000] from the 1024-row
    generated model), exact bigint margin, pinned score/sigmoid."""
    z = "(CAST(margin AS DOUBLE) / (1000.0 * CAST(dl AS DOUBLE)))"
    return f"""
        WITH {_qls_margin_ctes()}
        SELECT doc_id, dl AS n_tokens, margin AS margin_x1000,
               {pround_sql(z, 6)} AS score,
               {pround_sql(f'1.0 / (1.0 + exp(-{z}))', 6)} AS prob,
               CAST(CASE WHEN margin > 0 THEN 1 ELSE 0 END AS INT)
                 AS quality_pass
        FROM sc
    """


def _preference_pairs_oracle() -> str:
    """Twin of q_preference_pairs: the shared margin CTEs joined to the
    (lang, source) strata, two rank-1 window picks, pairs only for
    strata of >= 2 docs."""
    return f"""
        WITH {_qls_margin_ctes()},
        jd AS (
          SELECT sc.doc_id, sc.margin, d.lang, d.source
          FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
        ranked AS (
          SELECT lang, source, doc_id, margin,
                 row_number() OVER (PARTITION BY lang, source
                   ORDER BY margin DESC, doc_id ASC) AS rc,
                 row_number() OVER (PARTITION BY lang, source
                   ORDER BY margin ASC, doc_id ASC) AS rr,
                 count(*) OVER (PARTITION BY lang, source) AS n_docs
          FROM jd),
        ch AS (
          SELECT lang, source, CAST(n_docs AS BIGINT) AS n_docs,
                 doc_id AS chosen_doc, margin AS chosen_margin
          FROM ranked WHERE rc = 1 AND n_docs >= 2),
        rj AS (
          SELECT lang, source, doc_id AS rejected_doc,
                 margin AS rejected_margin
          FROM ranked WHERE rr = 1 AND n_docs >= 2)
        SELECT ch.lang, ch.source, ch.n_docs,
               chosen_doc, chosen_margin, rejected_doc, rejected_margin,
               chosen_margin - rejected_margin AS margin_gap
        FROM ch JOIN rj ON ch.lang = rj.lang AND ch.source = rj.source
    """


def _bradley_terry_oracle() -> str:
    """Twin of q_bradley_terry: identical pair construction (within-
    order brand pairs, ties to the lexically smaller brand), then the
    three Hunter-MM rounds unrolled as CTE pairs in the same
    scaled-bigint arithmetic (S=10^4, all intermediates exact
    integers), and the one pinned normalization division at the end."""
    s2 = 10_000 * 10_000
    rounds = []
    prev = "p0"
    for r in (1, 2, 3):
        rounds.append(f"""
        d{r} AS (
          SELECT e.i AS i,
                 CAST(SUM((e.n * {s2}) // (pi.P + pj.P)) AS BIGINT) AS D
          FROM edges e
          JOIN {prev} pi ON e.i = pi.i
          JOIN {prev} pj ON e.j = pj.i
          GROUP BY e.i),
        p{r} AS (
          SELECT w.i,
                 GREATEST(CAST((w.W * {s2}) // d.D AS BIGINT),
                          CAST(1 AS BIGINT)) AS P
          FROM wins w JOIN d{r} d ON w.i = d.i)""")
        prev = f"p{r}"
    rounds_sql = ",".join(rounds)
    return f"""
        WITH base AS (
          SELECT l_orderkey, p_brand,
                 MAX(CAST(floor(l_extendedprice * 100 + 0.5)
                          AS BIGINT)) AS cents
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY l_orderkey, p_brand),
        pairs AS (
          SELECT a.p_brand AS b1, b.p_brand AS b2,
                 CASE WHEN a.cents >= b.cents THEN 1 ELSE 0 END AS w1
          FROM base a JOIN base b
            ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand),
        games AS (
          SELECT b1, b2, COUNT(*) AS n, CAST(SUM(w1) AS BIGINT) AS w1
          FROM pairs GROUP BY b1, b2),
        edges AS (
          SELECT b1 AS i, b2 AS j, n, w1 AS w FROM games
          UNION ALL
          SELECT b2 AS i, b1 AS j, n, n - w1 AS w FROM games),
        wins AS (
          SELECT i, CAST(SUM(w) AS BIGINT) AS W,
                 CAST(SUM(n) AS BIGINT) AS games
          FROM edges GROUP BY i),
        p0 AS (SELECT i, CAST(10000 AS BIGINT) AS P FROM wins),
        {rounds_sql},
        tot AS (SELECT CAST(SUM(P) AS BIGINT) AS t FROM p3)
        SELECT w.i AS brand, w.games, w.W AS wins,
               p3.P AS p_scaled,
               {pround_sql(
                   'CAST(p3.P AS DOUBLE) / CAST(t AS DOUBLE)', 6
               )} AS strength
        FROM wins w JOIN p3 ON w.i = p3.i CROSS JOIN tot
    """


def _bmp_histogram_oracle() -> str:
    """Twin of q_media_bmp_histogram: rebuild the identical BMP hex,
    parse the header, walk each channel's pixel bytes with nibble
    arithmetic, and bin into 4 × 64-level intensity bins — exact
    integer counts, unpivoted to one row per (doc, channel) via
    UNION ALL over the channel index.  Lambda vars p/q/v — never i."""
    from .functions.mediahex import (
        BMP_H,
        BMP_PX,
        BMP_SIG_HEX,
        BMP_W,
        bmp_stride_sql,
        le16_sql,
        le32_sql,
    )

    nib = "'0123456789abcdef'"
    off = "2 * (po + (p // wp) * st + 3 * (p % wp) + chidx)"
    px = (
        f"list_transform(range(0, wp * hp), p -> CAST("
        f"(strpos({nib}, substr(h, CAST({off} + 1 AS INT), 1)) - 1) * 16"
        f" + strpos({nib}, substr(h, CAST({off} + 2 AS INT), 1)) - 1"
        f" AS BIGINT))"
    )
    bins = ", ".join(
        f"CAST(length(list_filter(px, v -> v // 64 = {k})) AS BIGINT)"
        f" AS bin_{k}"
        for k in range(4)
    )
    pixel_hex = (
        "array_to_string(list_transform(range(0, npb), q -> "
        "lower(lpad(hex(CASE WHEN q % stride < 3 * w "
        f"THEN {BMP_PX} ELSE 0 END), 2, '0'))), '')"
    )
    return f"""
        WITH p0 AS (
          SELECT doc_id, {BMP_W} AS w, {BMP_H} AS hh FROM documents),
        sized AS (
          SELECT doc_id, w, hh, {bmp_stride_sql('w')} AS stride,
                 {bmp_stride_sql('w')} * hh AS npb
          FROM p0),
        blobs AS (
          SELECT doc_id,
                 '{BMP_SIG_HEX}' || {le32_sql('54 + npb')} || '00000000'
                 || {le32_sql('54')} || {le32_sql('40')}
                 || {le32_sql('w')} || {le32_sql('hh')}
                 || {le16_sql('1')} || {le16_sql('24')}
                 || {le32_sql('0')} || {le32_sql('npb')}
                 || {le32_sql('2835')} || {le32_sql('2835')}
                 || {le32_sql('0')} || {le32_sql('0')}
                 || {pixel_hex} AS h
          FROM sized),
        hdr AS (
          SELECT doc_id, h,
                 CAST({_h_le32(11)} AS BIGINT) AS po,
                 CAST({_h_le32(19)} AS BIGINT) AS wp,
                 CAST({_h_le32(23)} AS BIGINT) AS hp
          FROM blobs),
        dec AS (
          SELECT *, {bmp_stride_sql('wp')} AS st FROM hdr),
        chans AS (
          SELECT doc_id, h, po, wp, hp, st,
                 unnest([0, 1, 2]) AS chidx,
                 unnest(['b', 'g', 'r']) AS channel
          FROM dec),
        pxl AS (
          SELECT doc_id, channel, wp, hp, {px} AS px FROM chans)
        SELECT doc_id, channel,
               CAST(wp AS INT) AS width,
               CAST(hp AS INT) AS height,
               CAST(wp * hp AS BIGINT) AS n_px,
               {bins}
        FROM pxl
    """


def _wav_decode_oracle() -> str:
    """Twin of q_media_wav_decode: rebuild the identical canonical WAV
    hex from the single-sourced derivations (functions/mediahex.py),
    then DECODE it — header fields via fixed-offset nibble arithmetic,
    per-channel sample folds via a dynamic-position nibble walk over
    the hex.  All walk inputs (channels / bits / data size → frame
    count) come from the PARSED header columns, mirroring
    wav_pcm_stats; signedness via v − 65536·(v // 32768).  Lambda vars
    f/q/v/x — never i (_hex_bigint caveat)."""
    from .functions.mediahex import (
        DATA_HEX,
        FMT_HEX,
        PCM_BITS,
        PCM_CH,
        PCM_FRAMES,
        PCM_SB,
        RIFF_HEX,
        WAVE_HEX,
        WAV_RATES,
        le16_sql,
        le32_sql,
    )

    rates = ",".join(str(r) for r in WAV_RATES)
    nib = "'0123456789abcdef'"
    off = "2 * (44 + (f * chp + channel) * 2)"
    raw = (
        f"((strpos({nib}, substr(h, CAST({off} + 1 AS INT), 1)) - 1) * 16"
        f" + strpos({nib}, substr(h, CAST({off} + 2 AS INT), 1)) - 1"
        f" + 256 * ((strpos({nib}, substr(h, CAST({off} + 3 AS INT), 1))"
        f"           - 1) * 16"
        f"    + strpos({nib}, substr(h, CAST({off} + 4 AS INT), 1)) - 1))"
    )
    samples = (
        f"list_transform(list_transform(range(0, nfp),"
        f" f -> CAST({raw} AS BIGINT)), v -> v - 65536 * (v // 32768))"
    )
    data_hex = (
        "array_to_string(list_transform(range(0, db), q -> "
        f"lower(lpad(hex({PCM_SB}), 2, '0'))), '')"
    )
    return f"""
        WITH p AS (
          SELECT doc_id, {PCM_CH} AS ch, {PCM_FRAMES} AS nf,
                 ([{rates}])[CAST(doc_id % 5 AS INT) + 1] AS rate,
                 ({PCM_FRAMES}) * ({PCM_CH}) * 2 AS db
          FROM documents),
        blobs AS (
          SELECT doc_id,
                 '{RIFF_HEX}' || {le32_sql('db + 36')} || '{WAVE_HEX}'
                 || '{FMT_HEX}' || '10000000' || '0100'
                 || {le16_sql('ch')} || {le32_sql('rate')}
                 || {le32_sql('rate * ch * 2')} || {le16_sql('ch * 2')}
                 || {le16_sql(str(PCM_BITS))} || '{DATA_HEX}'
                 || {le32_sql('db')} || {data_hex} AS h
          FROM p),
        hdr AS (
          SELECT doc_id, h,
                 CAST({_h_le32(25)} AS BIGINT) AS ratep,
                 CAST({_h_le16(23)} AS INT) AS chp,
                 CAST({_h_le16(35)} AS INT) AS bitsp,
                 CAST({_h_le32(41)} AS BIGINT) AS ds
          FROM blobs),
        fr AS (
          SELECT *, CAST(ds // (chp * (bitsp // 8)) AS BIGINT) AS nfp
          FROM hdr),
        chanx AS (
          SELECT *, unnest(range(0, chp)) AS channel FROM fr),
        smp AS (
          SELECT doc_id, h, ratep, chp, bitsp, nfp, channel,
                 {samples} AS s
          FROM chanx),
        agg AS (
          SELECT doc_id, h, ratep, chp, bitsp, nfp, channel,
                 CAST(list_sum(s) AS BIGINT) AS sum_s,
                 CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT)
                   AS sumsq_s,
                 CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT)
                   AS peak_abs
          FROM smp)
        SELECT doc_id,
               CASE WHEN substr(h, 1, 8) = '{RIFF_HEX}'
                     AND substr(h, 17, 8) = '{WAVE_HEX}'
                    THEN 'wav' ELSE 'unknown' END AS container,
               CAST(length(h) // 2 AS INT) AS byte_len,
               h AS blob_hex,
               ratep AS sample_rate, chp AS channels,
               bitsp AS bits_per_sample, nfp AS n_frames,
               CAST(channel AS INT) AS channel,
               sum_s, sumsq_s, peak_abs,
               {pround_sql(
                   'CAST(sum_s AS DOUBLE) / CAST(nfp AS DOUBLE)', 6
               )} AS dc_offset,
               {pround_sql(
                   'sqrt(CAST(sumsq_s AS DOUBLE) / CAST(nfp AS DOUBLE))', 6
               )} AS rms
        FROM agg
    """


def _binaryfile_ingest_oracle() -> str:
    """Twin of q_binaryfile_ingest: rebuild the identical canonical WAV
    hex for doc_id < 64 (single-sourced derivations) and emit the
    filesystem-roundtrip view — byte length, hex, parsed header, one
    row per channel."""
    from .functions.mediahex import (
        DATA_HEX,
        FMT_HEX,
        PCM_BITS,
        PCM_CH,
        PCM_FRAMES,
        PCM_SB,
        RIFF_HEX,
        WAVE_HEX,
        WAV_RATES,
        le16_sql,
        le32_sql,
    )

    rates = ",".join(str(r) for r in WAV_RATES)
    data_hex = (
        "array_to_string(list_transform(range(0, db), q -> "
        f"lower(lpad(hex({PCM_SB}), 2, '0'))), '')"
    )
    return f"""
        WITH p AS (
          SELECT doc_id, {PCM_CH} AS ch, {PCM_FRAMES} AS nf,
                 ([{rates}])[CAST(doc_id % 5 AS INT) + 1] AS rate,
                 ({PCM_FRAMES}) * ({PCM_CH}) * 2 AS db
          FROM documents WHERE doc_id < 64),
        blobs AS (
          SELECT doc_id,
                 '{RIFF_HEX}' || {le32_sql('db + 36')} || '{WAVE_HEX}'
                 || '{FMT_HEX}' || '10000000' || '0100'
                 || {le16_sql('ch')} || {le32_sql('rate')}
                 || {le32_sql('rate * ch * 2')} || {le16_sql('ch * 2')}
                 || {le16_sql(str(PCM_BITS))} || '{DATA_HEX}'
                 || {le32_sql('db')} || {data_hex} AS h
          FROM p),
        hdr AS (
          SELECT doc_id, h,
                 CAST({_h_le32(25)} AS BIGINT) AS ratep,
                 CAST({_h_le16(23)} AS INT) AS chp,
                 CAST({_h_le16(35)} AS INT) AS bitsp,
                 CAST({_h_le32(41)} AS BIGINT) AS ds
          FROM blobs),
        fr AS (
          SELECT *, CAST(ds // (chp * (bitsp // 8)) AS BIGINT) AS nfp
          FROM hdr)
        SELECT doc_id,
               CAST(length(h) // 2 AS BIGINT) AS byte_len,
               h AS blob_hex,
               ratep AS sample_rate, chp AS channels,
               bitsp AS bits_per_sample, nfp AS n_frames,
               CAST(unnest(range(0, chp)) AS INT) AS channel
        FROM fr
    """


def _wav_features_oracle() -> str:
    """Twin of q_media_wav_features: rebuild the identical canonical WAV
    hex (single-sourced from functions/mediahex.py), replay the decode
    into the per-channel sample list, then compute the FEATURES in SQL:
    zero crossings over consecutive-sample sign flips, attack/decay
    energy split on the half index, peak, and the pinned zcr-rate /
    crest-factor divisions.  Lambda vars f/q/v/x — never i."""
    from .functions.mediahex import (
        DATA_HEX,
        FMT_HEX,
        PCM_BITS,
        PCM_CH,
        PCM_FRAMES,
        PCM_SB,
        RIFF_HEX,
        WAVE_HEX,
        WAV_RATES,
        le16_sql,
        le32_sql,
    )

    rates = ",".join(str(r) for r in WAV_RATES)
    nib = "'0123456789abcdef'"
    off = "2 * (44 + (f * chp + channel) * 2)"
    raw = (
        f"((strpos({nib}, substr(h, CAST({off} + 1 AS INT), 1)) - 1) * 16"
        f" + strpos({nib}, substr(h, CAST({off} + 2 AS INT), 1)) - 1"
        f" + 256 * ((strpos({nib}, substr(h, CAST({off} + 3 AS INT), 1))"
        f"           - 1) * 16"
        f"    + strpos({nib}, substr(h, CAST({off} + 4 AS INT), 1)) - 1))"
    )
    samples = (
        f"list_transform(list_transform(range(0, nfp),"
        f" f -> CAST({raw} AS BIGINT)), v -> v - 65536 * (v // 32768))"
    )
    data_hex = (
        "array_to_string(list_transform(range(0, db), q -> "
        f"lower(lpad(hex({PCM_SB}), 2, '0'))), '')"
    )
    return f"""
        WITH p AS (
          SELECT doc_id, {PCM_CH} AS ch, {PCM_FRAMES} AS nf,
                 ([{rates}])[CAST(doc_id % 5 AS INT) + 1] AS rate,
                 ({PCM_FRAMES}) * ({PCM_CH}) * 2 AS db
          FROM documents),
        blobs AS (
          SELECT doc_id,
                 '{RIFF_HEX}' || {le32_sql('db + 36')} || '{WAVE_HEX}'
                 || '{FMT_HEX}' || '10000000' || '0100'
                 || {le16_sql('ch')} || {le32_sql('rate')}
                 || {le32_sql('rate * ch * 2')} || {le16_sql('ch * 2')}
                 || {le16_sql(str(PCM_BITS))} || '{DATA_HEX}'
                 || {le32_sql('db')} || {data_hex} AS h
          FROM p),
        hdr AS (
          SELECT doc_id, h,
                 CAST({_h_le32(25)} AS BIGINT) AS ratep,
                 CAST({_h_le16(23)} AS INT) AS chp,
                 CAST({_h_le16(35)} AS INT) AS bitsp,
                 CAST({_h_le32(41)} AS BIGINT) AS ds
          FROM blobs),
        fr AS (
          SELECT *, CAST(ds // (chp * (bitsp // 8)) AS BIGINT) AS nfp
          FROM hdr),
        chanx AS (
          SELECT *, unnest(range(0, chp)) AS channel FROM fr),
        smp AS (
          SELECT doc_id, ratep, nfp, channel, {samples} AS s
          FROM chanx),
        feat AS (
          SELECT doc_id, channel, ratep, nfp,
                 CAST(list_sum(list_transform(range(1, nfp), f ->
                        CASE WHEN (s[CAST(f AS INT)] >= 0)
                                  != (s[CAST(f + 1 AS INT)] >= 0)
                             THEN 1 ELSE 0 END)) AS BIGINT) AS zcr_count,
                 CAST(list_sum(list_transform(
                        s[1:CAST(nfp // 2 AS INT)], x -> x * x))
                      AS BIGINT) AS energy_first,
                 CAST(list_sum(list_transform(
                        s[CAST(nfp // 2 + 1 AS INT):CAST(nfp AS INT)],
                        x -> x * x)) AS BIGINT) AS energy_second,
                 CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT)
                   AS sumsq_s,
                 CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT)
                   AS peak_abs
          FROM smp)
        SELECT doc_id,
               CAST(channel AS INT) AS channel,
               ratep AS sample_rate,
               nfp AS n_frames,
               CAST((1000000 * nfp) // ratep AS BIGINT) AS duration_us,
               zcr_count,
               {pround_sql(
                   'CAST(zcr_count AS DOUBLE)'
                   ' / CAST(nfp - 1 AS DOUBLE)', 6
               )} AS zcr_rate,
               energy_first,
               energy_second,
               peak_abs,
               CASE WHEN sumsq_s > 0 THEN {pround_sql(
                   'CAST(peak_abs AS DOUBLE)'
                   ' / sqrt(CAST(sumsq_s AS DOUBLE)'
                   '        / CAST(nfp AS DOUBLE))', 6
               )} END AS crest_factor
        FROM feat
    """


def _dp_noisy_counts_oracle() -> str:
    """Twin of q_dp_noisy_counts: identical salted md5 slice, identical
    hex-threshold CASE chain (single-sourced from functions/privacy.py),
    identical clamp."""
    from .functions.privacy import twosided_geometric_hex_thresholds

    thr = twosided_geometric_hex_thresholds(eps=0.5, kmax=16)
    chain = " ".join(
        f"WHEN u <= '{t}' THEN CAST({k} AS INT)" for k, t in thr
    )
    return f"""
        WITH g AS (
          SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT)
                   AS order_year,
                 o_orderpriority AS priority,
                 CAST(count(*) AS BIGINT) AS true_count
          FROM orders GROUP BY 1, 2),
        n AS (
          SELECT *, substr(md5('dp-count-v1' || '|'
                   || CAST(order_year AS VARCHAR) || '|' || priority),
                 1, 8) AS u
          FROM g),
        k AS (SELECT *, CASE {chain}
                        ELSE CAST(16 AS INT) END AS noise FROM n)
        SELECT order_year, priority, true_count, noise,
               greatest(CAST(true_count + noise AS BIGINT),
                        CAST(0 AS BIGINT)) AS released_count
        FROM k
    """


def _dp_noisy_sum_oracle() -> str:
    """Twin of q_dp_noisy_sum: identical cents clip, identical half-up
    quantization to units of B, identical salted md5 slice and
    hex-threshold noise chain (single-sourced from functions/privacy.py),
    identical clamp-then-rescale."""
    from .functions.privacy import twosided_geometric_hex_thresholds

    B = 60_000_000
    thr = twosided_geometric_hex_thresholds(eps=0.5, kmax=16)
    chain = " ".join(
        f"WHEN u <= '{t}' THEN CAST({k} AS INT)" for k, t in thr
    )
    return f"""
        WITH od AS (
          SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT)
                   AS order_year,
                 o_orderpriority AS priority,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
          FROM orders),
        g AS (
          SELECT order_year, priority,
                 CAST(sum(c) AS BIGINT) AS true_sum_cents,
                 CAST(sum(least(c, {B})) AS BIGINT) AS clipped_sum_cents
          FROM od GROUP BY 1, 2),
        n AS (
          SELECT *, substr(md5('dp-sum-v1' || '|'
                   || CAST(order_year AS VARCHAR) || '|' || priority),
                 1, 8) AS u,
                 CAST((clipped_sum_cents + {B // 2}) // {B} AS BIGINT)
                   AS units
          FROM g),
        k AS (SELECT *, CASE {chain}
                        ELSE CAST(16 AS INT) END AS noise FROM n)
        SELECT order_year, priority, true_sum_cents, clipped_sum_cents,
               units, noise,
               CAST(greatest(units + noise, 0) * {B} AS BIGINT)
                 AS released_sum_cents
        FROM k
    """


def _dp_noisy_max_oracle() -> str:
    """Twin of q_dp_noisy_max: identical salted noise chain per
    candidate, identical (noisy desc, priority asc) argmax and
    (true desc, priority asc) calibration argmax."""
    from .functions.privacy import twosided_geometric_hex_thresholds

    thr = twosided_geometric_hex_thresholds(eps=0.5, kmax=16)
    chain = " ".join(
        f"WHEN u <= '{t}' THEN CAST({k} AS INT)" for k, t in thr
    )
    return f"""
        WITH g AS (
          SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT)
                   AS order_year,
                 o_orderpriority AS priority,
                 CAST(count(*) AS BIGINT) AS true_count
          FROM orders GROUP BY 1, 2),
        n AS (
          SELECT *, substr(md5('dp-argmax-v1' || '|'
                   || CAST(order_year AS VARCHAR) || '|' || priority),
                 1, 8) AS u
          FROM g),
        k AS (SELECT *, true_count + CAST(CASE {chain}
                        ELSE CAST(16 AS INT) END AS BIGINT) AS noisy
              FROM n),
        r AS (SELECT *,
                 row_number() OVER (PARTITION BY order_year
                   ORDER BY noisy DESC, priority ASC) AS rn,
                 first(priority) OVER (PARTITION BY order_year
                   ORDER BY true_count DESC, priority ASC) AS true_argmax
              FROM k)
        SELECT order_year, priority AS released_priority, true_argmax,
               priority = true_argmax AS matches_true
        FROM r WHERE rn = 1
    """


def _dp_above_threshold_oracle() -> str:
    """Twin of q_dp_above_threshold: identical mean-ceil threshold,
    identical ε/2 + ε/4 hex-threshold noise chains (kmax=32,
    single-sourced from functions/privacy.py), identical
    first-above-in-year-order release and always-one-row output."""
    from .functions.privacy import twosided_geometric_hex_thresholds

    def chain(u: str, eps: float) -> str:
        thr = twosided_geometric_hex_thresholds(eps=eps, kmax=32)
        return (
            "CASE "
            + " ".join(
                f"WHEN {u} <= '{t}' THEN CAST({k} AS INT)" for k, t in thr
            )
            + f" ELSE CAST({thr[-1][0]} AS INT) END"
        )

    return f"""
        WITH g AS (
          SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT)
                   AS order_year,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM orders GROUP BY 1),
        t AS (
          SELECT CAST((sum(cnt) + count(*) - 1) // count(*) AS BIGINT)
            AS threshold
          FROM g),
        n AS (
          SELECT g.order_year, g.cnt, t.threshold,
                 substr(md5('dp-svt-t-v1'), 1, 8) AS ut,
                 substr(md5('dp-svt-q-v1' || '|'
                        || CAST(g.order_year AS VARCHAR)), 1, 8) AS uq
          FROM g, t),
        k AS (
          SELECT order_year, cnt, threshold,
                 CAST({chain('ut', 0.25)} AS BIGINT) AS nt,
                 CAST({chain('uq', 0.125)} AS BIGINT) AS nq
          FROM n),
        s AS (
          SELECT *, (cnt + nq) >= (threshold + nt) AS above,
                 row_number() OVER (ORDER BY order_year) AS pos
          FROM k)
        SELECT CAST(min(CASE WHEN above THEN order_year END) AS INT)
                 AS released_year,
               CAST(min(CASE WHEN above THEN pos END) AS INT)
                 AS queries_tested,
               CAST(max(threshold) AS BIGINT) AS threshold,
               CAST(count(*) AS BIGINT) AS n_candidates
        FROM s
    """


def _mp4_header_oracle() -> str:
    """Twin of q_media_mp4_header: rebuild the identical canonical
    MP4/ISO-BMFF hex from the single-sourced layout
    (functions/mediahex.py), then re-derive every output field with
    fixed-offset nibble arithmetic OVER THE HEX (brand decoded from its
    bytes with unhex, integers via the _hex_bigint be32 reads) — the
    parse is real, not an echo of the construction parameters."""
    from .functions.mediahex import (
        FTYP_HEX,
        MOOV_HEX,
        MP4_BRAND_HEX,
        MP4_TIMESCALES,
        MVHD_HEX,
        MVHD_TAIL_HEX,
        be32_sql,
    )

    brands = ",".join(f"'{h}'" for h in MP4_BRAND_HEX)
    tss = ",".join(str(t) for t in MP4_TIMESCALES)

    def be32(pos: int) -> str:  # 1-based BYTE offset in hex column h
        return _hex_bigint("h", 2 * pos - 1, 8)

    return f"""
        WITH p AS (
          SELECT doc_id,
                 (['{FTYP_HEX}'])[1] AS _f,
                 ([{brands}])[CAST(doc_id % 4 AS INT) + 1] AS bh,
                 ([{tss}])[CAST(doc_id % 5 AS INT) + 1] AS tsc,
                 (doc_id * 3) % 512 AS minor,
                 3000000000 + (doc_id * 17) % 100000 AS created,
                 1 + (doc_id * 131) % 1000000 AS dur
          FROM documents),
        blobs AS (
          SELECT doc_id,
                 '00000014' || '{FTYP_HEX}' || bh || {be32_sql('minor')}
                 || bh || '00000074' || '{MOOV_HEX}'
                 || '0000006c' || '{MVHD_HEX}' || '00000000'
                 || {be32_sql('created')} || {be32_sql('created')}
                 || {be32_sql('tsc')} || {be32_sql('dur')}
                 || '{MVHD_TAIL_HEX}' || '00000002' AS h
          FROM p)
        SELECT doc_id,
               CAST(length(h) // 2 AS INT) AS byte_len,
               h AS blob_hex,
               CASE WHEN substr(h, 9, 8) = '{FTYP_HEX}'
                    THEN 'mp4' ELSE 'unknown' END AS container,
               decode(unhex(substr(h, 17, 8))) AS major_brand,
               CAST({be32(13)} AS INT) AS minor_version,
               CAST({be32(41)} AS BIGINT) AS creation_time,
               CAST({be32(49)} AS BIGINT) AS timescale,
               CAST({be32(53)} AS BIGINT) AS duration,
               CAST({be32(53)} * 1000 // {be32(49)} AS BIGINT)
                 AS duration_ms,
               CAST({be32(133)} AS INT) AS next_track_id
        FROM blobs
    """


def _jpeg_header_oracle() -> str:
    """Twin of q_media_jpeg_header: rebuild the identical canonical
    JFIF hex from the single-sourced layout (functions/mediahex.py),
    then re-derive every output field with fixed-offset nibble
    arithmetic OVER THE HEX — the parse is real, not an echo."""
    from .functions.mediahex import (
        JPEG_COMPONENTS_HEX,
        JPEG_DENSITIES,
        JPEG_SOF0_HEX,
        JPEG_SOI_APP0_HEX,
        JPEG_THUMB_HEX,
        be16_sql,
    )

    dens = ",".join(str(x) for x in JPEG_DENSITIES)

    def be16(pos: int) -> str:  # 1-based BYTE offset in hex column h
        return _hex_bigint("h", 2 * pos - 1, 4)

    def u8(pos: int) -> str:
        return _hex_bigint("h", 2 * pos - 1, 2)

    return f"""
        WITH p AS (
          SELECT doc_id,
                 16 + (doc_id * 37) % 4080 AS w,
                 16 + (doc_id * 61) % 2160 AS hh,
                 ([{dens}])[CAST(doc_id % 4 AS INT) + 1] AS dn
          FROM documents),
        blobs AS (
          SELECT doc_id,
                 '{JPEG_SOI_APP0_HEX}' || {be16_sql('dn')}
                 || {be16_sql('dn')} || '{JPEG_THUMB_HEX}'
                 || '{JPEG_SOF0_HEX}' || {be16_sql('hh')}
                 || {be16_sql('w')} || '03' || '{JPEG_COMPONENTS_HEX}' AS h
          FROM p)
        SELECT doc_id,
               CAST(length(h) // 2 AS INT) AS byte_len,
               h AS blob_hex,
               CASE WHEN substr(h, 1, 4) = 'ffd8'
                    THEN 'jpeg' ELSE 'unknown' END AS container,
               CAST({be16(28)} AS INT) AS header_width,
               CAST({be16(26)} AS INT) AS header_height,
               CAST({u8(30)} AS INT) AS n_components,
               CAST({u8(14)} AS INT) AS density_unit,
               CAST({be16(15)} AS INT) AS x_density,
               CAST({be16(17)} AS INT) AS y_density
        FROM blobs
    """


def _wav_extensible_oracle() -> str:
    """Twin of q_media_wav_extensible: rebuild the identical canonical
    WAVE_FORMAT_EXTENSIBLE hex from the single-sourced layout
    (functions/mediahex.py), then re-derive every output field with
    fixed-offset LITTLE-ENDIAN nibble arithmetic OVER THE HEX — the
    parse is real, not an echo of the construction parameters."""
    from .functions.mediahex import (
        INFO_ISFT_HEX,
        LIST_HEX,
        PCM_GUID_HEX,
        WAVEXT_BITS,
        WAVEXT_CBSIZE_HEX,
        WAVEXT_CH,
        WAVEXT_FMT_HEX,
        WAVEXT_FRAMES,
        WAVEXT_VALID,
        WAV_RATES,
        le16_sql,
        le32_sql,
    )

    rates = ",".join(str(r) for r in WAV_RATES)

    def u8(pos: int) -> str:  # byte at 1-based offset pos, from hex col h
        return _hex_bigint("h", 2 * pos - 1, 2)

    def le16(pos: int) -> str:
        return f"({u8(pos)} + 256 * {u8(pos + 1)})"

    def le32(pos: int) -> str:
        return (
            f"({u8(pos)} + 256 * {u8(pos + 1)} + 65536 * {u8(pos + 2)}"
            f" + 16777216 * {u8(pos + 3)})"
        )

    return f"""
        WITH p AS (
          SELECT doc_id,
                 {WAVEXT_CH} AS ch,
                 {WAVEXT_BITS} AS bits,
                 {WAVEXT_VALID} AS vbits,
                 ([{rates}])[CAST(doc_id % 5 AS INT) + 1] AS rate,
                 ({WAVEXT_CH}) * ({WAVEXT_BITS}) // 8 AS blk,
                 (1 << ({WAVEXT_CH})) - 1 AS mask,
                 ({WAVEXT_FRAMES}) * (({WAVEXT_CH}) * ({WAVEXT_BITS})
                   // 8) AS dsz
          FROM documents),
        blobs AS (
          SELECT doc_id,
                 '52494646' || {le32_sql('dsz + 94')}
                 || '57415645' || '{LIST_HEX}' || '1a000000'
                 || '{INFO_ISFT_HEX}' || '{WAVEXT_FMT_HEX}'
                 || {le16_sql('ch')} || {le32_sql('rate')}
                 || {le32_sql('rate * blk')} || {le16_sql('blk')}
                 || {le16_sql('bits')} || '{WAVEXT_CBSIZE_HEX}'
                 || {le16_sql('vbits')} || {le32_sql('mask')}
                 || '{PCM_GUID_HEX}' || '64617461' || {le32_sql('dsz')}
                 || repeat('00', CAST(dsz AS INT)) AS h
          FROM p)
        SELECT doc_id,
               CAST(length(h) // 2 AS INT) AS byte_len,
               h AS blob_hex,
               CASE WHEN substr(h, 1, 8) = '52494646'
                     AND substr(h, 17, 8) = '57415645'
                    THEN 'wav' ELSE 'unknown' END AS audio_format,
               CASE WHEN substr(h, 25, 8) = '{LIST_HEX}'
                     AND substr(h, 157, 32) = '{PCM_GUID_HEX}'
                    THEN 'extensible_pcm' END AS subformat,
               CAST({le16(57)} AS INT) AS channels,
               CAST({le32(59)} AS BIGINT) AS sample_rate,
               CAST({le32(63)} AS BIGINT) AS byte_rate,
               CAST({le16(67)} AS INT) AS block_align,
               CAST({le16(69)} AS INT) AS bits_per_sample,
               CAST({le16(73)} AS INT) AS valid_bits,
               CAST({le32(75)} AS BIGINT) AS channel_mask,
               CAST({le32(99)} AS BIGINT) AS data_size,
               CAST({le32(99)} * 8 * 1000 // ({le32(59)} * {le16(57)}
                 * {le16(69)}) AS BIGINT) AS duration_ms
        FROM blobs
    """


def _dp_quantile_oracle() -> str:
    """Twin of q_dp_quantile: identical cents-div-50 histogram, identical
    salted md5 slice + hex-threshold noise chain (single-sourced from
    functions/privacy.py), identical clamp, monotone cumsum, and integer
    ceil-rank bucket reads."""
    from .functions.privacy import twosided_geometric_hex_thresholds

    thr = twosided_geometric_hex_thresholds(eps=0.5, kmax=16)
    chain = " ".join(
        f"WHEN u <= '{t}' THEN CAST({k} AS INT)" for k, t in thr
    )
    return f"""
        WITH h AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) // 50 AS bucket,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        n AS (
          SELECT *, substr(md5('dp-quantile-v1' || '|' || event_type
                   || '|' || CAST(bucket AS VARCHAR)), 1, 8) AS u
          FROM h),
        k AS (
          SELECT event_type, bucket,
                 greatest(c + CAST(CASE {chain}
                          ELSE CAST(16 AS INT) END AS BIGINT),
                          CAST(0 AS BIGINT)) AS nc
          FROM n),
        cum AS (
          SELECT event_type, bucket,
                 sum(nc) OVER (PARTITION BY event_type ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(nc) OVER (PARTITION BY event_type) AS n
          FROM k)
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_released,
               CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100
                        THEN bucket * 50 END) AS BIGINT) AS p50_cents_dp,
               CAST(min(CASE WHEN cum >= (n * 95 + 99) // 100
                        THEN bucket * 50 END) AS BIGINT) AS p95_cents_dp,
               CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100
                        THEN bucket * 50 END) AS BIGINT) AS p99_cents_dp
        FROM cum GROUP BY event_type
    """


ORACLES: dict[str, str] = {
    # --- sources ---
    "q_media_bmp_decode": _bmp_decode_oracle(),
    "q_media_png_decode": _png_decode_oracle(),
    "q_media_png_histogram": _png_histogram_oracle(),
    "q_media_bmp_histogram": _bmp_histogram_oracle(),
    "q_bradley_terry": _bradley_terry_oracle(),
    "q_quality_linear_scorer": _quality_linear_scorer_oracle(),
    "q_sprt_sequential": _sprt_oracle(),
    "q_conformal_interval": f"""
        WITH base AS (
          SELECT c.c_mktsegment AS segment,
                 year(CAST(o_orderdate AS DATE)) AS yr,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        model AS (
          SELECT segment,
                 CAST(SUM(cents) // count(*) AS BIGINT) AS yhat
          FROM base WHERE yr <= 1996 GROUP BY segment),
        calib AS (
          SELECT b.segment, abs(b.cents - m.yhat) AS r
          FROM base b JOIN model m ON b.segment = m.segment
          WHERE b.yr = 1997),
        ranked AS (
          SELECT segment, r,
                 row_number() OVER (PARTITION BY segment ORDER BY r)
                   AS rk,
                 count(*) OVER (PARTITION BY segment) AS n_cal
          FROM calib),
        qhat AS (
          SELECT segment, r AS qhat, n_cal FROM ranked
          WHERE rk = CAST(ceil(CAST(n_cal + 1 AS DOUBLE) * 0.9)
                          AS BIGINT)),
        hold AS (
          SELECT b.segment, m.yhat, q.qhat, q.n_cal,
                 CAST(count(*) AS BIGINT) AS n_test,
                 CAST(SUM(CASE WHEN abs(b.cents - m.yhat) <= q.qhat
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
          FROM base b
          JOIN model m ON b.segment = m.segment
          JOIN qhat q ON b.segment = q.segment
          WHERE b.yr = 1998
          GROUP BY b.segment, m.yhat, q.qhat, q.n_cal)
        SELECT segment,
               yhat / 100.0 AS point_pred,
               qhat / 100.0 AS interval_halfwidth,
               CAST(n_cal AS BIGINT) AS n_cal,
               n_test, n_covered,
               {pround_sql(
                   'CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE)',
                   6
               )} AS coverage
        FROM hold
    """,
    "q_mase_forecast_eval": f"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        lagged AS (
          SELECT d, cents,
                 lag(cents, 1) OVER (ORDER BY d) AS l0,
                 lag(cents, 2) OVER (ORDER BY d) AS l1,
                 lag(cents, 3) OVER (ORDER BY d) AS l2,
                 lag(cents, 4) OVER (ORDER BY d) AS l3,
                 lag(cents, 5) OVER (ORDER BY d) AS l4,
                 lag(cents, 6) OVER (ORDER BY d) AS l5,
                 lag(cents, 7) OVER (ORDER BY d) AS l6,
                 lag(cents, 8) OVER (ORDER BY d) AS l7,
                 lag(cents, 7) OVER (ORDER BY d) AS naive_fc
          FROM daily),
        fc AS (
          SELECT d, cents, naive_fc,
                 CASE WHEN (CASE WHEN l0 IS NOT NULL THEN 16384 ELSE 0 END + CASE WHEN l1 IS NOT NULL THEN 12288 ELSE 0 END + CASE WHEN l2 IS NOT NULL THEN 9216 ELSE 0 END + CASE WHEN l3 IS NOT NULL THEN 6912 ELSE 0 END + CASE WHEN l4 IS NOT NULL THEN 5184 ELSE 0 END + CASE WHEN l5 IS NOT NULL THEN 3888 ELSE 0 END + CASE WHEN l6 IS NOT NULL THEN 2916 ELSE 0 END + CASE WHEN l7 IS NOT NULL THEN 2187 ELSE 0 END) > 0
                      THEN CAST(floor(CAST(16384 * coalesce(l0, 0) + 12288 * coalesce(l1, 0) + 9216 * coalesce(l2, 0) + 6912 * coalesce(l3, 0) + 5184 * coalesce(l4, 0) + 3888 * coalesce(l5, 0) + 2916 * coalesce(l6, 0) + 2187 * coalesce(l7, 0) AS DOUBLE)
                                      / CAST(CASE WHEN l0 IS NOT NULL THEN 16384 ELSE 0 END + CASE WHEN l1 IS NOT NULL THEN 12288 ELSE 0 END + CASE WHEN l2 IS NOT NULL THEN 9216 ELSE 0 END + CASE WHEN l3 IS NOT NULL THEN 6912 ELSE 0 END + CASE WHEN l4 IS NOT NULL THEN 5184 ELSE 0 END + CASE WHEN l5 IS NOT NULL THEN 3888 ELSE 0 END + CASE WHEN l6 IS NOT NULL THEN 2916 ELSE 0 END + CASE WHEN l7 IS NOT NULL THEN 2187 ELSE 0 END AS DOUBLE))
                                AS BIGINT) END AS ewma_fc
          FROM lagged),
        sc AS (
          SELECT * FROM fc
          WHERE ewma_fc IS NOT NULL AND naive_fc IS NOT NULL),
        ag AS (
          SELECT CAST(count(*) AS BIGINT) AS n_days,
                 CAST(SUM(abs(cents - ewma_fc)) AS BIGINT) AS me,
                 CAST(SUM(abs(cents - naive_fc)) AS BIGINT) AS mn
          FROM sc)
        SELECT n_days,
               {pround_sql(
                   'CAST(me AS DOUBLE) / CAST(n_days AS DOUBLE)'
                   ' / 100.0', 4
               )} AS mae_ewma,
               {pround_sql(
                   'CAST(mn AS DOUBLE) / CAST(n_days AS DOUBLE)'
                   ' / 100.0', 4
               )} AS mae_naive,
               {pround_sql(
                   'CAST(me AS DOUBLE) / CAST(mn AS DOUBLE)', 6
               )} AS mase
        FROM ag
    """,
    "q_power_analysis": _power_analysis_oracle(),
    "q_preference_pairs": _preference_pairs_oracle(),
    "q_seasonality_strength": f"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM orders GROUP BY 1),
        g AS (
          SELECT dayofweek(d) AS dow,
                 CAST(count(*) AS BIGINT) AS n_g,
                 CAST(SUM(c) AS BIGINT) AS s_g,
                 CAST(SUM(c * c) AS BIGINT) AS ss_g
          FROM daily GROUP BY 1),
        t AS (
          SELECT SUM(n_g) AS n, SUM(s_g) AS sx, SUM(ss_g) AS sxx,
                 CAST(SUM(CAST(floor(
                   CAST(s_g * s_g AS DOUBLE) / CAST(n_g AS DOUBLE)
                   * 1000000.0) AS BIGINT)) AS BIGINT) AS bg6_sum
          FROM g)
        SELECT CAST(n AS BIGINT) AS n_days,
               {pround_sql(
                   'CAST(sxx AS DOUBLE)'
                   ' - CAST(sx * sx AS DOUBLE) / CAST(n AS DOUBLE)', 4
               )} AS ss_total,
               {pround_sql(
                   'CAST(bg6_sum AS DOUBLE) / 1000000.0'
                   ' - CAST(sx * sx AS DOUBLE) / CAST(n AS DOUBLE)', 4
               )} AS ss_between_dow,
               {pround_sql(
                   '(CAST(bg6_sum AS DOUBLE) / 1000000.0'
                   '  - CAST(sx * sx AS DOUBLE) / CAST(n AS DOUBLE))'
                   ' / (CAST(sxx AS DOUBLE)'
                   '    - CAST(sx * sx AS DOUBLE) / CAST(n AS DOUBLE))',
                   6
               )} AS eta_squared
        FROM t
    """,
    "q_mann_kendall": f"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS y
          FROM orders GROUP BY 1),
        sg AS (
          SELECT CAST(SUM(CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT)
                   AS s
          FROM daily a JOIN daily b ON a.d < b.d),
        ties AS (
          SELECT CAST(coalesce(SUM(t * (t - 1) * (2 * t + 5)), 0)
                      AS BIGINT) AS tie_term
          FROM (SELECT CAST(count(*) AS BIGINT) AS t
                FROM daily GROUP BY y HAVING count(*) > 1) g),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        o AS (
          SELECT n, s, tie_term,
                 CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)
                   / 18.0 AS vr
          FROM sg CROSS JOIN ties CROSS JOIN nn)
        SELECT n, s, tie_term,
               {pround_sql(
                   "CASE WHEN s > 0"
                   " THEN CAST(s - 1 AS DOUBLE) / sqrt(vr)"
                   " WHEN s < 0"
                   " THEN CAST(s + 1 AS DOUBLE) / sqrt(vr)"
                   " ELSE 0.0 END", 6
               )} AS z,
               CAST(CASE WHEN abs(CASE WHEN s > 0
                          THEN CAST(s - 1 AS DOUBLE) / sqrt(vr)
                          WHEN s < 0
                          THEN CAST(s + 1 AS DOUBLE) / sqrt(vr)
                          ELSE 0.0 END) > 1.959964
                    THEN 1 ELSE 0 END AS INT) AS trend_at_95pct
        FROM o
    """,
    "q_sax_symbolic": f"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        bounds AS (
          SELECT MIN(d) AS d0,
                 (MAX(d) - MIN(d)) AS span,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS sx,
                 SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
                   AS sxx
          FROM daily),
        seg AS (
          SELECT LEAST(CAST((d - d0) * 8 // (span + 1) AS INT), 7)
                   AS segment,
                 cents, n, sx, sxx
          FROM daily CROSS JOIN bounds),
        g AS (
          SELECT segment, n, sx, sxx,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(SUM(cents) AS BIGINT) AS seg_cents
          FROM seg GROUP BY 1, 2, 3, 4),
        zc AS (
          SELECT segment, n_days,
                 CAST(seg_cents AS DOUBLE) / CAST(n_days AS DOUBLE)
                   AS paa,
                 CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                 CAST(CAST(n AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)
                      AS DOUBLE)
                 / CAST(n * (n - 1) AS DOUBLE) AS vr
          FROM g)
        SELECT segment, n_days,
               {pround_sql('paa / 100.0', 4)} AS paa_revenue,
               {pround_sql('(paa - mu) / sqrt(vr)', 6)} AS z,
               CASE WHEN (paa - mu) / sqrt(vr) < -0.6745 THEN 'a'
                    WHEN (paa - mu) / sqrt(vr) < 0.0 THEN 'b'
                    WHEN (paa - mu) / sqrt(vr) < 0.6745 THEN 'c'
                    ELSE 'd' END AS symbol
        FROM zc
    """,
    "q_ewma_daily": _ewma_oracle(),
    "q_dp_noisy_sum": _dp_noisy_sum_oracle(),
    "q_dp_noisy_max": _dp_noisy_max_oracle(),
    "q_media_wav_decode": _wav_decode_oracle(),
    "q_media_wav_features": _wav_features_oracle(),
    "q_binaryfile_ingest": _binaryfile_ingest_oracle(),
    "q_dp_noisy_counts": _dp_noisy_counts_oracle(),
    "q_dp_quantile": _dp_quantile_oracle(),
    "q_media_mp4_header": _mp4_header_oracle(),
    "q_media_wav_extensible": _wav_extensible_oracle(),
    "q_dp_above_threshold": _dp_above_threshold_oracle(),
    "q_media_jpeg_header": _jpeg_header_oracle(),
    "q_csv_roundtrip": "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q_csv_malformed_audit": """
        WITH lines AS (
          SELECT CASE
                   WHEN n_nationkey % 11 = 0 THEN
                     'X' || CAST(n_nationkey AS VARCHAR) || ';'
                     || n_name || ';' || CAST(n_regionkey AS VARCHAR)
                   WHEN n_nationkey % 7 = 0 THEN
                     CAST(n_nationkey AS VARCHAR) || ';' || n_name
                   WHEN n_nationkey % 13 = 0 THEN
                     CAST(n_nationkey AS VARCHAR) || ';' || n_name
                     || ';' || CAST(n_regionkey AS VARCHAR) || ';zz'
                   ELSE CAST(n_nationkey AS VARCHAR) || ';' || n_name
                     || ';' || CAST(n_regionkey AS VARCHAR)
                 END AS line
          FROM nation),
        parsed AS (
          SELECT line,
                 string_split(line, ';') AS p,
                 len(string_split(line, ';')) AS np
          FROM lines)
        SELECT p[2] AS n_name,
               TRY_CAST(p[1] AS INT) AS n_nationkey,
               CASE WHEN np >= 3 THEN TRY_CAST(p[3] AS INT) END
                 AS n_regionkey,
               (np != 3 OR TRY_CAST(p[1] AS INT) IS NULL
                OR (np >= 3 AND TRY_CAST(p[3] AS INT) IS NULL))
                 AS is_corrupt,
               CASE WHEN np != 3 OR TRY_CAST(p[1] AS INT) IS NULL
                      OR (np >= 3 AND TRY_CAST(p[3] AS INT) IS NULL)
                    THEN line END AS corrupt_line
        FROM parsed
    """,
    "q_fixedwidth_roundtrip": "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q_media_header_roundtrip": _media_roundtrip_oracle(),
    # --- projection / filter ---
    "q_project": (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem"
    ),
    "q_filter": (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag "
        "FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30"
    ),
    # --- dedup / surrogate keys ---
    "q_distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_surrogate_key": (
        "SELECT CAST(row_number() OVER (ORDER BY o_orderpriority ASC NULLS FIRST) AS INT)"
        " AS priority_id, o_orderpriority "
        "FROM (SELECT DISTINCT o_orderpriority FROM orders) t"
    ),
    "q_dedup_first_row": (
        "SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM customer "
        "QUALIFY row_number() OVER (PARTITION BY c_nationkey "
        "ORDER BY c_custkey ASC NULLS FIRST) = 1"
    ),
    # --- joins ---
    "q_join_broadcast_left": (
        "SELECT l_orderkey, l_linenumber, l_partkey, "
        "coalesce(p_size, -1) AS p_size_or_missing "
        "FROM lineitem LEFT JOIN (SELECT p_partkey, p_size FROM part "
        "WHERE p_size >= 30) d ON l_partkey = d.p_partkey"
    ),
    "q_join_inner": (
        "SELECT o_orderstatus, count(*) AS n_lines, "
        f"{dsum_sql('l_extendedprice')} AS sum_price "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY o_orderstatus"
    ),
    "q_join_star_3way": (
        "SELECT n_name, count(*) AS n_lines, "
        f"{dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)} AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name"
    ),
    "q_join_semi": (
        "SELECT o_orderkey, o_totalprice FROM orders WHERE EXISTS ("
        "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)"
    ),
    "q_join_anti": (
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS ("
        "SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderpriority = '1-URGENT')"
    ),
    "q_join_range": (
        "SELECT c_custkey, c_acctbal, tier FROM customer JOIN "
        "(VALUES ('low', -100000.0, 0.0), ('mid', 0.0, 5000.0), "
        "('high', 5000.0, 100000.0)) AS t(tier, lo, hi) "
        "ON c_acctbal >= lo AND c_acctbal < hi"
    ),
    "q_join_asof": """
        WITH l AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'click'),
             r AS (SELECT user_id, ts, max(value) AS rv FROM events
                   WHERE event_type = 'purchase' GROUP BY user_id, ts)
        SELECT l.event_id, l.user_id,
               CAST(floor(epoch(l.ts)) AS BIGINT) AS ts_epoch,
               l.value, r.rv AS last_purchase_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
    "q_join_asof_forward": """
        WITH l AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'click'),
             r AS (SELECT user_id, ts, max(value) AS rv FROM events
                   WHERE event_type = 'purchase' GROUP BY user_id, ts)
        SELECT l.event_id, l.user_id,
               CAST(floor(epoch(l.ts)) AS BIGINT) AS ts_epoch,
               l.value, r.rv AS next_purchase_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND r.ts >= l.ts
    """,
    # nearest = backward ASOF + forward ASOF + the same tie-break CASE
    # as Spark (backward wins when forward is absent or not strictly
    # closer); exact integer MICROSECOND distances (epoch_us), matching
    # Spark's unix_micros — whole-second truncation could pick the
    # farther neighbor on sub-second data.
    "q_join_asof_nearest": """
        WITH l AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'click'),
             r AS (SELECT user_id, ts, max(value) AS rv FROM events
                   WHERE event_type = 'purchase' GROUP BY user_id, ts),
        b AS (
          SELECT l.event_id, r.rv AS b_rv, r.ts AS b_ts
          FROM l ASOF LEFT JOIN r
            ON l.user_id = r.user_id AND r.ts <= l.ts),
        f AS (
          SELECT l.event_id, r.rv AS f_rv, r.ts AS f_ts
          FROM l ASOF LEFT JOIN r
            ON l.user_id = r.user_id AND r.ts >= l.ts)
        SELECT l.event_id, l.user_id,
               CAST(floor(epoch(l.ts)) AS BIGINT) AS ts_epoch,
               l.value,
               CASE WHEN f.f_ts IS NULL
                         OR (b.b_ts IS NOT NULL
                             AND epoch_us(l.ts) - epoch_us(b.b_ts)
                                 <= epoch_us(f.f_ts) - epoch_us(l.ts))
                    THEN b.b_rv ELSE f.f_rv END AS nearest_purchase_value,
               CAST(CASE WHEN f.f_ts IS NULL
                         OR (b.b_ts IS NOT NULL
                             AND epoch_us(l.ts) - epoch_us(b.b_ts)
                                 <= epoch_us(f.f_ts) - epoch_us(l.ts))
                    THEN floor(epoch(b.b_ts))
                    ELSE floor(epoch(f.f_ts)) END AS BIGINT)
                 AS matched_ts_epoch
        FROM l
        JOIN b USING (event_id)
        JOIN f USING (event_id)
    """,
    # rolling corr / autocorrelation: exact integer daily series, exact
    # (HUGEINT) rolling power sums, one fixed-order float corr at the
    # end — mirrors Spark's DECIMAL accumulation bit-for-bit because
    # both engines round the SAME exact integer into a double.
    "q_rolling_corr": """
        WITH daily AS (
          SELECT datediff('day', DATE '1970-01-01',
                          CAST(o_orderdate AS DATE)) AS d,
                 count(*) AS x,
                 sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
          FROM orders GROUP BY 1),
        g AS (
          SELECT d,
                 count(*) OVER w AS n,
                 sum(x) OVER w AS sx,
                 sum(y) OVER w AS sy,
                 sum(x * x) OVER w AS sxx,
                 sum(y * y) OVER w AS syy,
                 sum(x * y) OVER w AS sxy
          FROM daily
          WINDOW w AS (ORDER BY d
                       ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
        SELECT d, CAST(n AS BIGINT) AS n_days,
               floor((CASE WHEN n >= 2 AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0 AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0 THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END) * 1000000 + 0.5) / 1000000 AS corr_30d
        FROM g
    """,
    "q_autocorr": """
        WITH daily AS (
          SELECT datediff('day', DATE '1970-01-01',
                          CAST(o_orderdate AS DATE)) AS d,
                 count(*) AS x
          FROM orders GROUP BY 1),
        lagged AS (
          SELECT x,
                 lag(x, 1) OVER (ORDER BY d) AS xl1,
                 lag(x, 2) OVER (ORDER BY d) AS xl2,
                 lag(x, 3) OVER (ORDER BY d) AS xl3,
                 lag(x, 4) OVER (ORDER BY d) AS xl4,
                 lag(x, 5) OVER (ORDER BY d) AS xl5,
                 lag(x, 6) OVER (ORDER BY d) AS xl6,
                 lag(x, 7) OVER (ORDER BY d) AS xl7
          FROM daily),
        pairs AS (
          SELECT 1 AS k, x AS xt, xl1 AS xl FROM lagged WHERE xl1 IS NOT NULL
          UNION ALL SELECT 2 AS k, x AS xt, xl2 AS xl FROM lagged WHERE xl2 IS NOT NULL
          UNION ALL SELECT 3 AS k, x AS xt, xl3 AS xl FROM lagged WHERE xl3 IS NOT NULL
          UNION ALL SELECT 4 AS k, x AS xt, xl4 AS xl FROM lagged WHERE xl4 IS NOT NULL
          UNION ALL SELECT 5 AS k, x AS xt, xl5 AS xl FROM lagged WHERE xl5 IS NOT NULL
          UNION ALL SELECT 6 AS k, x AS xt, xl6 AS xl FROM lagged WHERE xl6 IS NOT NULL
          UNION ALL SELECT 7 AS k, x AS xt, xl7 AS xl FROM lagged WHERE xl7 IS NOT NULL),
        g AS (
          SELECT k, count(*) AS n, sum(xt) AS sx, sum(xl) AS sy,
                 sum(xt * xt) AS sxx, sum(xl * xl) AS syy,
                 sum(xt * xl) AS sxy
          FROM pairs GROUP BY k)
        SELECT k, CAST(n AS BIGINT) AS n_pairs,
               floor((CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0 AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0 THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END) * 1000000 + 0.5) / 1000000 AS acf
        FROM g
    """,
    "q_pivot": (
        "SELECT l_returnflag, "
        "count(*) FILTER (WHERE l_linestatus = 'F') AS n_f, "
        "count(*) FILTER (WHERE l_linestatus = 'O') AS n_o "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "q_unpivot": (
        "SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val FROM part "
        "UNION ALL "
        "SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part"
    ),
    "q_scalar_subquery": (
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > "
        f"(SELECT {dsum_sql('o_totalprice')} / count(*) FROM orders)"
    ),
    "q_percentile": (
        "SELECT l_returnflag, "
        f"{pround_sql('quantile_cont(l_quantity, 0.25)', 6)} AS p25_qty, "
        f"{pround_sql('quantile_cont(l_quantity, 0.5)', 6)} AS p50_qty, "
        f"{pround_sql('quantile_cont(l_quantity, 0.75)', 6)} AS p75_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    # --- aggregations ---
    "q_minmax_date": (
        "SELECT min(CAST(o_orderdate AS DATE)) AS min_orderdate, "
        "max(CAST(o_orderdate AS DATE)) AS max_orderdate FROM orders"
    ),
    "q_groupby_sum": (
        "SELECT l_returnflag, l_linestatus, "
        f"{dsum_sql('l_quantity')} AS sum_qty, "
        f"{dsum_sql('l_extendedprice')} AS sum_base_price, "
        "count(*) AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "q_groupby_multi_agg": (
        "SELECT o_orderpriority, count(*) AS n_orders, "
        f"{dsum_sql('o_totalprice')} AS sum_price, "
        f"{pround_sql(dsum_sql('o_totalprice') + ' / count(*)', 2)} AS avg_price, "
        "min(o_totalprice) AS min_price, max(o_totalprice) AS max_price "
        "FROM orders GROUP BY o_orderpriority"
    ),
    "q_count_distinct": (
        "SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts, "
        "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps, "
        "CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lineitem"
    ),
    "q_rollup": (
        "SELECT l_returnflag, l_linestatus, "
        f"{dsum_sql('l_quantity')} AS sum_qty, "
        "count(*) AS n_rows, "
        "CAST(grouping(l_returnflag) AS INT) AS g_flag, "
        "CAST(grouping(l_linestatus) AS INT) AS g_status "
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    ),
    "q_cube": (
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders, "
        "CAST(grouping(o_orderstatus) AS INT) AS g_status, "
        "CAST(grouping(o_orderpriority) AS INT) AS g_prio "
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"
    ),
    "q_having": (
        "SELECT l_orderkey, count(*) AS n_lines FROM lineitem "
        "GROUP BY l_orderkey HAVING count(*) >= 5"
    ),
    "q_merge_upsert": """
        WITH updates AS (
          SELECT c_custkey, upper(c_name) AS c_name, c_nationkey,
                 CAST(0.0 AS DOUBLE) AS c_acctbal, c_mktsegment
          FROM customer WHERE c_custkey % 7 = 0
          UNION ALL
          SELECT c_custkey + 1000000, 'NEW_' || c_name, c_nationkey,
                 c_acctbal, c_mktsegment
          FROM customer WHERE c_custkey % 97 = 0
        )
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
        UNION ALL SELECT * FROM updates
    """,
    "q_profile": """
        SELECT 'c_custkey' AS "column", count(*) AS n_rows,
               count(*) FILTER (WHERE c_custkey IS NULL) AS n_nulls,
               count(DISTINCT c_custkey) AS n_distinct,
               CAST(min(c_custkey) AS VARCHAR) AS min_str,
               CAST(max(c_custkey) AS VARCHAR) AS max_str FROM customer
        UNION ALL
        SELECT 'c_name', count(*),
               count(*) FILTER (WHERE c_name IS NULL),
               count(DISTINCT c_name),
               CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR)
        FROM customer
        UNION ALL
        SELECT 'c_nationkey', count(*),
               count(*) FILTER (WHERE c_nationkey IS NULL),
               count(DISTINCT c_nationkey),
               CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR)
        FROM customer
        UNION ALL
        SELECT 'c_acctbal', count(*),
               count(*) FILTER (WHERE c_acctbal IS NULL),
               count(DISTINCT c_acctbal),
               CAST(min(c_acctbal) AS VARCHAR), CAST(max(c_acctbal) AS VARCHAR)
        FROM customer
        UNION ALL
        SELECT 'c_mktsegment', count(*),
               count(*) FILTER (WHERE c_mktsegment IS NULL),
               count(DISTINCT c_mktsegment),
               CAST(min(c_mktsegment) AS VARCHAR), CAST(max(c_mktsegment) AS VARCHAR)
        FROM customer
    """,
    # --- window functions ---
    "q_window_rank": (
        "SELECT c_custkey, c_nationkey, c_acctbal, "
        "CAST(row_number() OVER (PARTITION BY c_nationkey "
        "ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rn, "
        "CAST(rank() OVER (PARTITION BY c_nationkey "
        "ORDER BY c_acctbal DESC) AS INT) AS rnk, "
        "CAST(dense_rank() OVER (PARTITION BY c_nationkey "
        "ORDER BY c_acctbal DESC) AS INT) AS drnk "
        "FROM customer"
    ),
    "q_window_lag": (
        "SELECT o_orderkey, o_custkey, o_totalprice, "
        "lag(o_totalprice) OVER w AS prev_price, "
        "lead(o_totalprice) OVER w AS next_price "
        "FROM orders WINDOW w AS (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey)"
    ),
    "q_window_running_sum": (
        "SELECT o_orderkey, o_custkey, "
        + "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey "
        + "ORDER BY o_orderdate, o_orderkey "
        + "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
        + " AS running_spend FROM orders"
    ),
    # --- generators ---
    "q_date_dim_generate": f"""
        WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS d0,
                          max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
        days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d FROM b)
        SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS "ChaveData",
               strftime(d, '%Y-%m-%d') AS "DataCompleta",
               CAST(year(d) AS INT) AS "Ano",
               CAST(month(d) AS INT) AS "MesNumero",
               ({_PTBR_MONTHS})[month(d)] AS "NomeMes",
               CAST(day(d) AS INT) AS "Dia",
               ({_PTBR_DOW})[dayofweek(d) + 1] AS "DiaDaSemana",
               'T' || CAST(quarter(d) AS INT) AS "Trimestre"
        FROM days
    """,
    "q_explode": (
        "SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos, "
        "CAST(unnest(embedding) AS DOUBLE) AS val "
        "FROM embeddings WHERE vec_id < 100"
    ),
    # --- scalar functions ---
    "q_null_default": (
        "SELECT c_custkey, CASE WHEN x IS NULL OR trim(x) = '' THEN 'N/A' "
        "ELSE x END AS segment_or_na FROM (SELECT c_custkey, "
        "CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END "
        "AS x FROM customer) t"
    ),
    "q_locale_decimal_parse": (
        "SELECT s, coalesce(try_cast(replace(replace(trim(s), '.', ''), ',', '.')"
        " AS DOUBLE), 0.0) AS parsed FROM (VALUES "
        "('1.234,56'), ('30000'), ('0,5'), ('1.000.000,99'), (''), (NULL), "
        "('12a,3'), ('  7,25  '), ('-1.234,5')) AS v(s)"
    ),
    "q_date_parse": (
        "SELECT s, CAST(try_strptime(substr(s, 1, 10), '%Y-%m-%d') AS DATE) AS d "
        "FROM (VALUES ('2023-05-17'), ('2023-05-17 10:11:12'), "
        "('1999-12-31T23:59'), ('2023-13-01'), ('2023'), (''), (NULL), "
        "('garbage-xx')) AS v(s)"
    ),
    "q_date_key": (
        "SELECT o_orderkey, coalesce(CAST(strftime(o_orderdate, '%Y%m%d') AS INT), 0)"
        " AS dkey FROM orders"
    ),
    "q_date_parts": (
        "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yy, "
        "CAST(month(o_orderdate) AS INT) AS mm, "
        "CAST(day(o_orderdate) AS INT) AS dd FROM orders"
    ),
    "q_quarter_label": (
        "SELECT o_orderkey, 'T' || CAST(quarter(o_orderdate) AS INT) AS tri "
        "FROM orders"
    ),
    "q_month_name_ptbr": (
        f"SELECT o_orderkey, ({_PTBR_MONTHS})[month(o_orderdate)] AS nome_mes, "
        f"({_PTBR_DOW})[dayofweek(o_orderdate) + 1] AS dia_semana FROM orders"
    ),
    "q_decimal_format": (
        "SELECT CAST(x0 AS DOUBLE) AS x, "
        "replace(printf('%.2f', CAST(x0 AS DOUBLE)), '.', ',') AS formatted "
        "FROM (VALUES (1234.56), (0.5), (12.0), (1234567.89), (0.0), (-42.75))"
        " AS v(x0)"
    ),
    "q_concat_ws": (
        "SELECT p_partkey, concat_ws(';', p_brand, p_type) AS part_key FROM part"
    ),
    "q_json_extract": (
        "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS prop_k "
        "FROM events"
    ),
    "q_string_funcs": (
        "SELECT doc_id, upper(lang) AS lang_u, CAST(length(text) AS INT) AS n_len, "
        "substr(text, 1, 20) AS prefix, "
        "CAST(text LIKE '%data%' AS INT) AS has_data FROM documents"
    ),
    "q_math_funcs": (
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1.0 - l_discount) AS net_price, "
        "abs(l_quantity - 25.0) AS qty_dev, "
        "CAST(ceil(l_tax * 100.0) AS BIGINT) AS tax_pct_ceil FROM lineitem"
    ),
    # --- sorts / set ops ---
    "q_orderby": (
        "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate, o_totalprice "
        "FROM orders ORDER BY odate, o_orderkey"
    ),
    "q_topk": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15"
    ),
    "q_union": (
        "SELECT c_nationkey AS nk FROM customer "
        "UNION ALL SELECT s_nationkey AS nk FROM supplier"
    ),
    "q_intersect": (
        "SELECT c_nationkey AS nk FROM customer "
        "INTERSECT SELECT s_nationkey AS nk FROM supplier"
    ),
    "q_except": (
        "SELECT c_nationkey AS k FROM customer "
        "EXCEPT ALL SELECT s_nationkey AS k FROM supplier"
    ),
    # --- event-time windows (batch equivalents) ---
    "q_window_tumbling": (
        "SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS win_start, "
        "event_type, count(*) AS n_events, "
        f"{dsum_sql('value')} AS sum_value "
        "FROM events GROUP BY 1, 2"
    ),
    # Streaming twins of the batch window aggs: a single-file availableNow
    # backfill is ONE micro-batch, so complete-mode output is exactly the
    # batch aggregate (the first batch's watermark is epoch 0 — nothing is
    # late) and the stream-stream join sees both sides fully in state.
    # Batch/stream unification, hash-checked; the multi-batch late-drop
    # path is pinned separately by tests/test_streaming.py.
    "q_stream_watermark": (
        "SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS win_start, "
        "event_type, count(*) AS n_events, "
        f"{dsum_sql('value')} AS sum_value "
        "FROM events GROUP BY 1, 2"
    ),
    "q_stream_join": """
        SELECT c.event_id AS click_id,
               p.event_id AS purchase_id,
               c.user_id,
               CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
               CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
               p.value AS purchase_value
        FROM events c
        JOIN events p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL 30 MINUTE
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    "q_stream_join_outer": """
        WITH c AS (
          SELECT event_id AS click_id, user_id, ts AS click_ts
          FROM events WHERE event_type = 'click'),
        p AS (
          SELECT event_id AS purchase_id, user_id AS p_user_id,
                 ts AS purchase_ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'),
        wm AS (
          -- global watermark = min of the two per-stream watermarks,
          -- each = that stream's max event time (ms-truncated, the
          -- engine's watermark granularity) minus the 1 h delay; in
          -- MICROseconds to match Spark's internal event-time longs
          SELECT least((SELECT max(epoch_ms(click_ts)) FROM c),
                       (SELECT max(epoch_ms(purchase_ts)) FROM p))
                 * 1000 - 3600000000 AS wm_us),
        matched AS (
          SELECT c.click_id, c.user_id, c.click_ts,
                 p.purchase_id, p.purchase_ts, p.purchase_value
          FROM c JOIN p
            ON p.p_user_id = c.user_id
           AND p.purchase_ts >= c.click_ts
           AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE),
        unmatched AS (
          SELECT c.click_id, c.user_id, c.click_ts
          FROM c ANTI JOIN matched m ON c.click_id = m.click_id)
        SELECT click_id, user_id,
               CAST(floor(epoch(click_ts)) AS BIGINT) AS click_epoch,
               purchase_id,
               CAST(floor(epoch(purchase_ts)) AS BIGINT)
                 AS purchase_epoch,
               purchase_value
        FROM matched
        UNION ALL
        SELECT u.click_id, u.user_id,
               CAST(floor(epoch(u.click_ts)) AS BIGINT) AS click_epoch,
               NULL, NULL, NULL
        FROM unmatched u, wm
        WHERE epoch_us(u.click_ts) + 1800000000 < wm.wm_us
    """,
    "q_stream_join_full": """
        WITH c AS (
          SELECT event_id AS click_id, user_id, ts AS click_ts
          FROM events WHERE event_type = 'click'),
        p AS (
          SELECT event_id AS purchase_id, user_id AS p_user_id,
                 ts AS purchase_ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'),
        wm AS (
          -- global watermark = min of the two per-stream watermarks
          -- (max event time ms-truncated minus the 1 h delay), in
          -- MICROseconds to match Spark's internal event-time longs
          SELECT least((SELECT max(epoch_ms(click_ts)) FROM c),
                       (SELECT max(epoch_ms(purchase_ts)) FROM p))
                 * 1000 - 3600000000 AS wm_us),
        matched AS (
          SELECT c.click_id, c.user_id, c.click_ts,
                 p.purchase_id, p.purchase_ts, p.purchase_value
          FROM c JOIN p
            ON p.p_user_id = c.user_id
           AND p.purchase_ts >= c.click_ts
           AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE),
        un_c AS (
          SELECT c.click_id, c.user_id, c.click_ts
          FROM c ANTI JOIN matched m ON c.click_id = m.click_id),
        un_p AS (
          SELECT p.purchase_id, p.p_user_id, p.purchase_ts,
                 p.purchase_value
          FROM p ANTI JOIN matched m ON p.purchase_id = m.purchase_id)
        SELECT click_id, user_id,
               CAST(floor(epoch(click_ts)) AS BIGINT) AS click_epoch,
               purchase_id,
               CAST(floor(epoch(purchase_ts)) AS BIGINT)
                 AS purchase_epoch,
               purchase_value
        FROM matched
        UNION ALL
        SELECT u.click_id, u.user_id,
               CAST(floor(epoch(u.click_ts)) AS BIGINT) AS click_epoch,
               NULL, NULL, NULL
        FROM un_c u, wm
        WHERE epoch_us(u.click_ts) + 1800000000 < wm.wm_us
        UNION ALL
        SELECT NULL, u.p_user_id AS user_id, NULL,
               u.purchase_id,
               CAST(floor(epoch(u.purchase_ts)) AS BIGINT)
                 AS purchase_epoch,
               u.purchase_value
        FROM un_p u, wm
        WHERE epoch_us(u.purchase_ts) < wm.wm_us
    """,
    "q_window_sliding": (
        "SELECT win_start, count(*) AS n_events, "
        f"{dsum_sql('value')} AS sum_value FROM ("
        "  SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS win_start, value"
        "  FROM events"
        "  UNION ALL"
        "  SELECT CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT), value"
        "  FROM events"
        ") GROUP BY win_start"
    ),
    "q_window_session": f"""
        WITH o AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w >= INTERVAL 300 SECOND
                      THEN 1 ELSE 0 END AS new_sess
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, event_id, ts, value,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess_no
          FROM o
        )
        SELECT user_id,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
               count(*) AS n_events,
               {dsum_sql('value')} AS sum_value
        FROM s GROUP BY user_id, sess_no
    """,
    # the dedup's deterministic contract: the surviving key set
    "q_stream_dedup": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    # single-batch backfill: the stateful processor emits one update row
    # per user, whose exact-cents accumulator equals a batch grouped agg
    "q_stream_stateful": f"""
        SELECT user_id,
               count(*) AS n_events,
               {dsum_sql('value')} AS sum_value,
               CAST(max(floor(epoch(ts))) AS BIGINT) AS last_seen_epoch
        FROM events GROUP BY user_id
    """,
    # single-batch availableNow backfill == batch session agg (see the
    # q_stream_watermark comment above)
    "q_stream_session": f"""
        WITH o AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w >= INTERVAL 300 SECOND
                      THEN 1 ELSE 0 END AS new_sess
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, event_id, ts, value,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess_no
          FROM o
        )
        SELECT user_id,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
               count(*) AS n_events,
               {dsum_sql('value')} AS sum_value
        FROM s GROUP BY user_id, sess_no
    """,
    "q_funnel": """
        WITH v AS (
          SELECT user_id, event_type, ts,
                 min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t_view
          FROM events
        ),
        c AS (
          SELECT user_id, event_type, ts, t_view,
                 min(CASE WHEN event_type = 'click' AND ts > t_view
                          THEN ts END)
                   OVER (PARTITION BY user_id) AS t_click
          FROM v
        ),
        p AS (
          SELECT user_id, t_view, t_click,
                 min(CASE WHEN event_type = 'purchase' AND ts > t_click
                          THEN ts END)
                   OVER (PARTITION BY user_id) AS t_purchase
          FROM c
        ),
        u AS (SELECT DISTINCT user_id, t_view, t_click, t_purchase FROM p)
        SELECT count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
               count(CASE WHEN t_click IS NOT NULL THEN 1 END) AS n_click,
               count(CASE WHEN t_purchase IS NOT NULL THEN 1 END) AS n_purchase
        FROM u
    """,
    "q_time_to_convert": """
        WITH v AS (
          SELECT user_id, event_type, ts,
                 min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t_view
          FROM events),
        p AS (
          SELECT user_id, t_view,
                 min(CASE WHEN event_type = 'purchase' AND ts > t_view
                          THEN ts END)
                   OVER (PARTITION BY user_id) AS t_purchase
          FROM v),
        conv AS (
          SELECT user_id,
                 epoch_ms(t_purchase) - epoch_ms(t_view) AS dur_ms
          FROM (SELECT DISTINCT user_id, t_view, t_purchase FROM p) u
          WHERE t_purchase IS NOT NULL),
        r AS (
          SELECT user_id, dur_ms,
                 NTILE(10) OVER (ORDER BY dur_ms, user_id) AS decile
          FROM conv)
        SELECT decile,
               count(*) AS n_users,
               min(dur_ms) / 1000.0 AS min_s,
               max(dur_ms) / 1000.0 AS max_s
        FROM r GROUP BY decile
    """,
    "q_funnel_horizon": """
        WITH v AS (
          SELECT user_id, event_type, ts,
                 min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t_view
          FROM events
        ),
        c AS (
          SELECT user_id, event_type, ts, t_view,
                 min(CASE WHEN event_type = 'click' AND ts > t_view
                          AND ts <= t_view + INTERVAL 48 HOUR
                          THEN ts END)
                   OVER (PARTITION BY user_id) AS t_click
          FROM v
        ),
        p AS (
          SELECT user_id, t_view, t_click,
                 min(CASE WHEN event_type = 'purchase' AND ts > t_click
                          AND ts <= t_click + INTERVAL 48 HOUR
                          THEN ts END)
                   OVER (PARTITION BY user_id) AS t_purchase
          FROM c
        ),
        u AS (SELECT DISTINCT user_id, t_view, t_click, t_purchase FROM p)
        SELECT count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
               count(CASE WHEN t_click IS NOT NULL THEN 1 END)
                 AS n_click_48h,
               count(CASE WHEN t_purchase IS NOT NULL THEN 1 END)
                 AS n_purchase_48h
        FROM u
    """,
    "q_join_full_outer": """
        WITH cu AS (SELECT c_nationkey AS ck, count(*) AS n_cust
                    FROM customer GROUP BY c_nationkey),
        su AS (SELECT s_nationkey AS sk, count(*) AS n_supp
               FROM supplier GROUP BY s_nationkey)
        SELECT coalesce(ck, sk) AS nationkey,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM cu FULL OUTER JOIN su ON ck = sk
    """,
    "q_retention_cohort": """
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ),
        w AS (
          SELECT user_id, d,
                 min(d) OVER (PARTITION BY user_id) AS cohort
          FROM ud
        )
        SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
               CAST(date_diff('day', cohort, d) AS INT) AS day_offset,
               count(DISTINCT user_id) AS n_users
        FROM w GROUP BY 1, 2
    """,
    # --- LLM ops ---
    "q_dedup_simhash": r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok
          FROM documents WHERE doc_id % 10 = 0
        ),
        bits AS (
          SELECT doc_id, md5(tok) AS h, unnest(range(0, 64)) AS pos FROM toks
        ),
        votes AS (
          SELECT doc_id, pos,
                 sum(CASE WHEN (
                     (strpos('0123456789abcdef',
                             substr(h, CAST(pos // 4 AS INT) + 1, 1)) - 1)
                     & (1 << (3 - CAST(pos % 4 AS INT)))
                 ) > 0 THEN 1 ELSE -1 END) AS v
          FROM bits GROUP BY doc_id, pos
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 AND pos >= 32
                             THEN CAST(1 AS BIGINT) << CAST(pos - 32 AS INT)
                             ELSE 0 END) AS BIGINT) AS simhash_hi,
               CAST(sum(CASE WHEN v > 0 AND pos < 32
                             THEN CAST(1 AS BIGINT) << CAST(pos AS INT)
                             ELSE 0 END) AS BIGINT) AS simhash_lo
        FROM votes GROUP BY doc_id
    """,
    "q_doc_fingerprint": f"""
        {_WINNOW_CTE}
        SELECT doc_id, fingerprint FROM fps
    """,
    "q_overlap_candidates": f"""
        {_WINNOW_CTE}
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               count(*) AS shared_fps
        FROM fps a JOIN fps b
          ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= 3
    """,
    "q_heavy_hitters": f"""
        WITH t AS (
          SELECT unnest({_TOKENS}) AS token
          FROM documents WHERE trim(text) <> ''
        ),
        c AS (SELECT token, count(*) AS freq FROM t GROUP BY token)
        SELECT token, freq FROM c
        WHERE freq * 1000 > (SELECT count(*) FROM t)
    """,
    "q_linkage_weights": _linkage_sql(),
    "q_linkage_em": _linkage_em_sql(3),
    "q_fuzzy_match": """
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 5
    """,
    "q_grouping_sets": f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql('l_quantity')} AS sum_qty, count(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    # Efraimidis-Spirakis A-Res with an md5 draw: u exact rational,
    # key = ln(u)/w, top-20 (key DESC, doc_id) — deterministic weighted
    # sampling without replacement.
    "q_sample_weighted": f"""
        WITH d AS (
          SELECT doc_id, CAST(n_chars AS INT) AS weight,
                 ln((CAST({_hex_bigint("md5(CAST(doc_id AS VARCHAR))", 1, 8)}
                      AS DOUBLE) + 0.5) / 4294967296.0)
                   / CAST(n_chars AS DOUBLE) AS k
          FROM documents
        )
        SELECT doc_id, weight, {pround_sql('k', 6)} AS sample_key
        FROM d ORDER BY k DESC, doc_id LIMIT 20
    """,
    # Per-language top-3 A-Res draws (grouped weighted sampling).
    "q_sample_weighted_grouped": f"""
        WITH d AS (
          SELECT lang, doc_id, CAST(n_chars AS INT) AS weight,
                 ln((CAST({_hex_bigint("md5(CAST(doc_id AS VARCHAR))", 1, 8)}
                      AS DOUBLE) + 0.5) / 4294967296.0)
                   / CAST(n_chars AS DOUBLE) AS k
          FROM documents
        ),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY lang ORDER BY k DESC, doc_id
          ) AS rn FROM d
        )
        SELECT lang, CAST(rn AS INT) AS rn, doc_id, weight,
               {pround_sql('k', 6)} AS sample_key
        FROM r WHERE rn <= 3
    """,
    # Deterministic 15%-bucket MLM masking; DuckDB's indexed lambda is
    # 1-based like the Spark side's i+1.  The outer lambda variable must
    # NOT be named i (it would be shadowed inside _hex_bigint's nibble
    # lambda — see that helper's CAUTION note).
    "q_mlm_masking": f"""
        WITH base AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(range(1, len(toks) + 1), p ->
                 {_hex_bigint("md5(CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR))", 1, 4)} % 100 < 15
               )) AS BIGINT) AS n_masked,
               md5(coalesce(array_to_string(
                 list_transform(toks, (x, j) ->
                   CASE WHEN {_hex_bigint("md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR))", 1, 4)} % 100 < 15
                        THEN '[MASK]' ELSE x END),
                 ' '), '')) AS masked_md5
        FROM base
    """,
    "q_corpus_sample": f"""
        SELECT doc_id, bucket FROM (
          SELECT doc_id, {_BUCKET} AS bucket FROM documents
        ) t WHERE bucket < 10
    """,
    "q_split_assign": f"""
        SELECT doc_id,
               CASE WHEN {_BUCKET} < 80 THEN 'train'
                    WHEN {_BUCKET} < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "q_dedup_exact": (
        "SELECT sha256(text) AS content_hash, min(doc_id) AS keep_id, "
        "count(*) AS dup_count FROM documents GROUP BY sha256(text)"
    ),
    "q_dedup_ngram_jaccard": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents WHERE doc_id % 10 = 0
        ),
        sh AS (
          SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS sh FROM docs
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b,
               {pround_sql('CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)', 6)} AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE {pround_sql('CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)', 6)} >= 0.01
    """,
    # Prefix-filter join oracle: the ALL-PAIRS exact formulation — the
    # Spark side's prefix filtering is an invisible optimization, so the
    # oracle simply computes every pair's exact 3-gram Jaccard over the
    # full table and applies the same integer threshold (5*inter >=
    # 4*union, i.e. J >= 4/5) before the pinned ratio.
    "q_setsim_prefix_join": f"""
        WITH uniq AS (
          SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
        ),
        docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM uniq
        ),
        sh AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            END)) AS sh FROM docs
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b,
               {pround_sql('CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)', 6)} AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE 5 * n_inter >= 4 * (sa.n_sh + sb.n_sh - n_inter)
    """,
    # Directed containment twin: same shingle join, |S_a|-only denominator,
    # integer threshold (100*inter >= 20*n_a) before the pinned ratio.
    "q_dedup_containment": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents WHERE doc_id % 10 = 0
        ),
        sh AS (
          SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS sh FROM docs
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b,
               {pround_sql('CAST(n_inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE)', 6)} AS containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        WHERE 100 * n_inter >= 20 * sa.n_sh
    """,
    # Mirrors operators/dedup.py duplicated_passages (k=8): sliding
    # windows with 1-based starts, >=2-distinct-doc duplicate test
    # (min <> max over the window-text partition), per-document
    # gaps-and-islands merge into maximal token ranges.
    "q_dedup_substrings": f"""
        WITH {_PASSAGE_MARKED},
        hits AS (SELECT doc_id, start FROM marked WHERE mn <> mx),
        {_PASSAGE_ISLANDS}
        SELECT doc_id,
               CAST(min(start) AS BIGINT) AS tok_start,
               CAST(max(start) + 7 AS BIGINT) AS tok_end,
               CAST(count(*) AS BIGINT) AS n_windows
        FROM islands GROUP BY doc_id, isl
    """,
    # MMR diversified top-k: the recursive CTE replays the driver-side
    # greedy — sel carries the selected ids, each step's argmax orders by
    # 0.7·simq − (1.0−0.7)·max-sim-to-selected with vec_id tie-break.
    # All sims pre-pinned; (1.0 - 0.7) spelled as the same IEEE subtract
    # the Spark side performs (a 0.3 literal would differ in the last ulp).
    "q_vector_topk_mmr": """
        WITH RECURSIVE q AS (
          SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
          WHERE vec_id = 0
        ),
        cand AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 floor((list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                     / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(qv, qv))))
                   * 1000000 + 0.5) / 1000000 AS simq
          FROM embeddings, q
          ORDER BY simq DESC, vec_id ASC LIMIT 20
        ),
        ps AS (
          SELECT a.vec_id AS ia, b.vec_id AS ib,
                 floor((list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))))
                   * 1000000 + 0.5) / 1000000 AS sim
          FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
        ),
        mmr AS (
          SELECT 1 AS rank,
                 (SELECT vec_id FROM cand
                  ORDER BY simq DESC, vec_id LIMIT 1) AS vec_id,
                 [(SELECT vec_id FROM cand
                   ORDER BY simq DESC, vec_id LIMIT 1)] AS sel
          UNION ALL
          SELECT rank + 1,
                 (SELECT c.vec_id FROM cand c
                  WHERE NOT list_contains(sel, c.vec_id)
                  ORDER BY 0.7 * c.simq - (1.0 - 0.7) * (
                      SELECT max(ps.sim) FROM ps
                      WHERE ps.ia = c.vec_id AND list_contains(sel, ps.ib)
                    ) DESC,
                    c.vec_id ASC
                  LIMIT 1),
                 list_append(sel, (SELECT c.vec_id FROM cand c
                  WHERE NOT list_contains(sel, c.vec_id)
                  ORDER BY 0.7 * c.simq - (1.0 - 0.7) * (
                      SELECT max(ps.sim) FROM ps
                      WHERE ps.ia = c.vec_id AND list_contains(sel, ps.ib)
                    ) DESC,
                    c.vec_id ASC
                  LIMIT 1))
          FROM mmr WHERE rank < 5
        )
        -- vec_id IS NULL = the greedy ran out of candidates before k:
        -- the Spark while-loop stops early, so drop the padded rows
        SELECT CAST(rank AS INT) AS rank, CAST(vec_id AS BIGINT) AS vec_id
        FROM mmr WHERE vec_id IS NOT NULL
    """,
    # Per-language fertility: integer sums only; ratios are per-row IEEE
    # on identical bigints (regex matches queries.py BPE_ISH_PATTERN).
    "q_tokenizer_fertility": f"""
        WITH per AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum({_N_TOKENS}) AS BIGINT) AS n_words,
                 CAST(sum(len(regexp_extract_all(text,
                      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
                      AS n_subwords,
                 CAST(sum(length(text)) AS BIGINT) AS n_chars
          FROM documents GROUP BY lang
        )
        SELECT lang, n_docs, n_words, n_subwords,
               {pround_sql('CAST(n_subwords AS DOUBLE) / CAST(n_words AS DOUBLE)', 6)} AS fertility,
               {pround_sql('CAST(n_chars AS DOUBLE) / CAST(n_subwords AS DOUBLE)', 6)} AS chars_per_subword
        FROM per
    """,
    # Temperature mixture: the only aggregates are integer sums; the
    # scaled sqrt is made integer per GROUP row (floor(sqrt(m*1e8))), so
    # weights divide exact bigints and every double is per-row IEEE.
    "q_domain_mixture": f"""
        WITH per AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum({_N_TOKENS}) AS BIGINT) AS n_tokens
          FROM documents GROUP BY lang
        ),
        r AS (
          SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) * 100000000.0))
                         AS BIGINT) AS rr
          FROM per
        ),
        tot AS (
          SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_m,
                 CAST(sum(rr) AS BIGINT) AS tot_r
          FROM r
        )
        SELECT lang, n_docs, n_tokens,
               {pround_sql('CAST(n_tokens AS DOUBLE) / CAST(tot_m AS DOUBLE)', 6)} AS share,
               {pround_sql('CAST(rr AS DOUBLE) / CAST(tot_r AS DOUBLE)', 6)} AS weight,
               {pround_sql('(CAST(rr AS DOUBLE) / CAST(tot_r AS DOUBLE)) / (CAST(n_tokens AS DOUBLE) / CAST(tot_m AS DOUBLE))', 6)} AS sample_factor,
               CAST(floor((CAST(rr AS DOUBLE) / CAST(tot_r AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS alloc_tokens
        FROM r, tot
    """,
    # The cut applied with keep_canonical=True: each window's min-doc
    # occurrences survive (doc_id <> mn filter), so every duplicated
    # passage stays alive in its canonical document; islands
    # -> per-doc span lists -> index-filtered token keep -> md5 of the
    # rejoined text; span-free docs keep their token stream.
    "q_dedup_cut": f"""
        WITH {_PASSAGE_MARKED},
        hits AS (
          SELECT doc_id, start FROM marked
          WHERE mn <> mx AND doc_id <> mn
        ),
        {_PASSAGE_ISLANDS},
        spans AS (
          SELECT doc_id, min(start) AS a, max(start) + 7 AS b
          FROM islands GROUP BY doc_id, isl
        ),
        sp AS (
          SELECT doc_id, list(struct_pack(a := a, b := b)) AS spans
          FROM spans GROUP BY doc_id
        ),
        cut AS (
          SELECT d.doc_id, len(d.toks) AS nb,
                 list_filter(
                   list_transform(range(1, len(d.toks) + 1), i ->
                     CASE WHEN s.spans IS NULL
                               OR len(list_filter(s.spans,
                                    sp2 -> i >= sp2.a AND i <= sp2.b)) = 0
                          THEN d.toks[i] END),
                   x -> x IS NOT NULL) AS kept
          FROM docs d LEFT JOIN sp s USING (doc_id)
        )
        SELECT doc_id,
               CAST(nb AS BIGINT) AS n_tokens_before,
               CAST(len(kept) AS BIGINT) AS n_tokens_after,
               -- array_to_string([]) is NULL in DuckDB but '' in Spark's
               -- array_join: coalesce pins md5('') for fully-cut docs
               md5(coalesce(array_to_string(kept, ' '), '')) AS clean_md5
        FROM cut
    """,
    # MinHash+LSH banding IS DuckDB-expressible after all: the md5-derived
    # Kirsch-Mitzenmacher hash family and band buckets are deterministic.
    # Mirrors operators/dedup.py minhash_lsh_candidates (16 hashes, 4
    # bands, 3-word shingles, 60-bit mask).
    "q_dedup_near": f"""
        WITH {_lsh_bands_cte()}
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
    # Containment verified only on LSH candidate pairs (directed: the
    # bucket join with <> emits both directions) — the bucket-first scale
    # path; exact duplicates collapse to their min-id representative
    # FIRST (mirrors the Spark side's exact_dedup), then 2-gram
    # containment like q_dedup_containment, threshold 50%.
    "q_dedup_containment_lsh": f"""
        WITH uniq AS (
          SELECT d.* FROM documents d
          JOIN (SELECT min(doc_id) AS keep FROM documents GROUP BY text) k
            ON d.doc_id = k.keep
        ),
        {_lsh_bands_cte("uniq")},
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket
               AND a.doc_id <> b.doc_id
        ),
        d2 AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
        sh2 AS (
          SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS sh FROM d2
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh2 GROUP BY doc_id),
        inter AS (
          SELECT c.id_a, c.id_b, count(*) AS n_inter
          FROM cand c
          JOIN sh2 a ON a.doc_id = c.id_a
          JOIN sh2 b ON b.doc_id = c.id_b AND b.sh = a.sh
          GROUP BY c.id_a, c.id_b
        )
        SELECT id_a, id_b,
               {pround_sql('CAST(n_inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE)', 6)} AS containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        WHERE 100 * n_inter >= 50 * sa.n_sh
    """,
    # Same banding as q_dedup_near, but star edges (bucket-min -> member)
    # + recursive min-label components — the linear-cost cluster contract.
    "q_dedup_near_clusters": f"""
        WITH RECURSIVE docs AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
          FROM documents
        ),
        sh3 AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            END)) AS sh
          FROM docs
        ),
        dg AS (SELECT doc_id, md5(sh) AS m FROM sh3),
        hh AS (
          SELECT doc_id,
                 {_hex_bigint('m', 1, 15)} AS h1,
                 {_hex_bigint('m', 17, 12)} AS h2
          FROM dg
        ),
        mh AS (
          SELECT doc_id, i,
                 min((h1 + i * h2) & ((CAST(1 AS BIGINT) << 60) - 1)) AS mh
          FROM hh, (SELECT unnest(range(0, 16)) AS i) idx
          GROUP BY doc_id, i
        ),
        bands AS (
          SELECT doc_id, CAST(i // 4 AS INT) AS band,
                 md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS bucket
          FROM mh GROUP BY doc_id, band
        ),
        be AS (
          SELECT doc_id, min(doc_id) OVER (PARTITION BY band, bucket) AS root
          FROM bands
        ),
        star AS (
          SELECT DISTINCT root AS id_a, doc_id AS id_b FROM be
          WHERE doc_id > root
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM star
          UNION
          SELECT id_b AS src, id_a AS dst FROM star
        ),
        cc AS (
          SELECT DISTINCT src AS node, src AS comp FROM edges
          UNION
          SELECT e.dst AS node, cc.comp AS comp
          FROM cc JOIN edges e ON e.src = cc.node
          WHERE cc.comp < e.dst
        )
        SELECT node, min(comp) AS component FROM cc GROUP BY node
    """,
    # Iterative connected components IS ANSI-expressible after all: min-
    # label propagation as a recursive CTE.  The comp < dst prune is safe:
    # the component minimum m is smaller than every node, so its
    # propagation path is never cut, and only min(comp) is kept.
    "q_dedup_clusters": f"""
        WITH RECURSIVE docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents WHERE doc_id % 10 = 0
        ),
        shd AS (
          SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS sh FROM docs
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM shd a JOIN shd b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
          SELECT id_a, id_b FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE {pround_sql(
              'CAST(n_inter AS DOUBLE) '
              '/ CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)', 6)} >= 0.05
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        cc AS (
          SELECT DISTINCT src AS node, src AS comp FROM edges
          UNION
          SELECT e.dst AS node, cc.comp AS comp
          FROM cc JOIN edges e ON e.src = cc.node
          WHERE cc.comp < e.dst
        )
        SELECT node, min(comp) AS component FROM cc GROUP BY node
    """,
    "q_embed_neardup": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id < 300)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {pround_sql(
                   'list_dot_product(a.v, b.v) / '
                   '(sqrt(list_dot_product(a.v, a.v)) * '
                   'sqrt(list_dot_product(b.v, b.v)))', 6)} AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE {pround_sql(
                   'list_dot_product(a.v, b.v) / '
                   '(sqrt(list_dot_product(a.v, a.v)) * '
                   'sqrt(list_dot_product(b.v, b.v)))', 6)} >= 0.3
    """,
    "q_vector_topk": f"""
        WITH {_cosine_scored_ctes()}
        SELECT vec_id, cosine FROM scored
        ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
    "q_exact_median_rank": """
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               median(o_totalprice) AS median_price
        FROM orders
    """,
    # interpolation written as the SAME IEEE expression Spark evaluates
    # (x_lo + frac*(x_hi - x_lo), h = (N-1)p + 1) — bit-identical, so no
    # rounding pin is needed; quantile_cont would compute an equivalent
    # but differently-ordered float expression.
    "q_quantile_ladder": """
        WITH r AS (
          SELECT o_totalprice,
                 row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
                 count(*) OVER () AS n
          FROM orders),
        p AS (SELECT CAST(unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS DOUBLE)
                     AS p),  -- a bare list literal types as DECIMAL(3,2)
        sel AS (
          SELECT p.p, r.o_totalprice, r.rn, r.n
          FROM p JOIN r
            ON r.rn = floor((r.n - 1) * p.p + 1)
            OR r.rn = ceil((r.n - 1) * p.p + 1))
        SELECT p,
               CAST(max(n) AS BIGINT) AS n_orders,
               max(CASE WHEN rn = floor((n - 1) * p + 1)
                        THEN o_totalprice END)
               + ((max(n) - 1) * p + 1 - floor((max(n) - 1) * p + 1))
                 * (max(CASE WHEN rn = ceil((n - 1) * p + 1)
                             THEN o_totalprice END)
                    - max(CASE WHEN rn = floor((n - 1) * p + 1)
                               THEN o_totalprice END)) AS q_value
        FROM sel GROUP BY p
    """,
    "q_calibration_applied": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        b AS (
          SELECT CAST(LEAST(s6 // 50000, 19) AS INT) AS bucket,
                 COUNT(*) AS n, CAST(SUM(label) AS BIGINT) AS pos
          FROM j GROUP BY 1),
        pre AS (
          SELECT bucket, n, pos,
                 SUM(n) OVER (ORDER BY bucket) AS cn,
                 SUM(pos) OVER (ORDER BY bucket) AS cpos
          FROM b),
        pr AS (
          SELECT p1.bucket AS jb,
                 CAST(p2.cpos - (p1.cpos - p1.pos) AS DOUBLE)
                 / CAST(p2.cn - (p1.cn - p1.n) AS DOUBLE) AS mean_jk
          FROM pre p1 JOIN pre p2 ON p2.bucket >= p1.bucket),
        mj AS (SELECT jb, MIN(mean_jk) AS m FROM pr GROUP BY jb),
        iso AS (
          SELECT jb AS bucket,
                 MAX(m) OVER (ORDER BY jb
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS iso
          FROM mj),
        app AS (
          SELECT j.s6, j.label, iso.iso
          FROM j JOIN iso
            ON CAST(LEAST(j.s6 // 50000, 19) AS INT) = iso.bucket),
        ag AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(floor(
                   (CAST(s6 AS DOUBLE) / 1000000.0 - CAST(label AS DOUBLE))
                   * (CAST(s6 AS DOUBLE) / 1000000.0 - CAST(label AS DOUBLE))
                   * 1000000000.0) AS BIGINT)) AS BIGINT) AS se_raw9,
                 CAST(SUM(CAST(floor(
                   (iso - CAST(label AS DOUBLE))
                   * (iso - CAST(label AS DOUBLE))
                   * 1000000000.0) AS BIGINT)) AS BIGINT) AS se_iso9
          FROM app)
        SELECT n,
               {pround_sql(
                   'CAST(se_raw9 AS DOUBLE)'
                   ' / (CAST(n AS DOUBLE) * 1000000000.0)', 6
               )} AS brier_raw,
               {pround_sql(
                   'CAST(se_iso9 AS DOUBLE)'
                   ' / (CAST(n AS DOUBLE) * 1000000000.0)', 6
               )} AS brier_calibrated
        FROM ag
    """,
    "q_isotonic_calibration": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        b AS (
          SELECT CAST(LEAST(s6 // 50000, 19) AS INT) AS bucket,
                 COUNT(*) AS n, CAST(SUM(label) AS BIGINT) AS pos
          FROM j GROUP BY 1),
        pre AS (
          SELECT bucket, n, pos,
                 SUM(n) OVER (ORDER BY bucket) AS cn,
                 SUM(pos) OVER (ORDER BY bucket) AS cpos
          FROM b),
        pr AS (
          SELECT p1.bucket AS jb,
                 CAST(p2.cpos - (p1.cpos - p1.pos) AS DOUBLE)
                 / CAST(p2.cn - (p1.cn - p1.n) AS DOUBLE) AS mean_jk
          FROM pre p1 JOIN pre p2 ON p2.bucket >= p1.bucket),
        mj AS (SELECT jb, MIN(mean_jk) AS m FROM pr GROUP BY jb),
        iso AS (
          SELECT jb AS bucket,
                 MAX(m) OVER (ORDER BY jb
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS iso
          FROM mj)
        SELECT b.bucket AS bucket,
               b.n AS n_customers,
               b.pos AS n_active,
               {pround_sql(
                   'CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE)', 6
               )} AS raw_rate,
               {pround_sql('iso.iso', 6)} AS iso_rate
        FROM b JOIN iso ON b.bucket = iso.bucket
    """,
    "q_score_calibration": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        r AS (
          SELECT *, NTILE(10) OVER (ORDER BY -s6, o_custkey) AS decile
          FROM j)
        SELECT decile,
               count(*) AS n_customers,
               CAST(sum(label) AS BIGINT) AS n_active,
               sum(s6) / 1000000.0 / count(*) AS mean_score,
               CAST(sum(label) AS BIGINT)
                 / CAST(count(*) AS DOUBLE) AS observed_rate
        FROM r GROUP BY decile
    """,
    "q_auc_by_segment": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        js AS (
          SELECT j.o_custkey, c.c_mktsegment AS segment, j.s6, j.label
          FROM j JOIN customer c ON c.c_custkey = j.o_custkey),
        r AS (SELECT segment, s6, label,
                     row_number() OVER (PARTITION BY segment
                                        ORDER BY s6, o_custkey) AS rk
              FROM js),
        g AS (SELECT segment, s6, min(rk) AS mn, count(*) AS c,
                     sum(label) AS np
              FROM r GROUP BY segment, s6),
        t AS (SELECT segment,
                     sum(np * (2 * mn + c - 1)) AS u2,
                     sum(np) AS n_pos, sum(c - np) AS n_neg
              FROM g GROUP BY segment)
        SELECT segment,
               CAST(n_pos AS BIGINT) AS n_pos,
               CAST(n_neg AS BIGINT) AS n_neg,
               (u2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg) AS auc
        FROM t
    """,
    "q_auc_exact": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        r AS (SELECT s6, label,
                     row_number() OVER (ORDER BY s6, o_custkey) AS rk
              FROM j),
        g AS (SELECT s6, min(rk) AS mn, count(*) AS c,
                     sum(label) AS np
              FROM r GROUP BY s6),
        t AS (SELECT sum(np * (2 * mn + c - 1)) AS u2,
                     sum(np) AS n_pos, sum(c - np) AS n_neg FROM g)
        SELECT CAST(n_pos AS BIGINT) AS n_pos,
               CAST(n_neg AS BIGINT) AS n_neg,
               (u2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg) AS auc
        FROM t
    """,
    "q_woe_iv": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        per AS (
          SELECT c.c_mktsegment AS bucket,
                 CAST(sum(label) AS BIGINT) AS n_active,
                 CAST(sum(1 - label) AS BIGINT) AS n_inactive
          FROM j JOIN customer c ON c.c_custkey = j.o_custkey
          GROUP BY 1)
        SELECT bucket, n_active, n_inactive,
               {pround_sql(
                   'ln((n_active / CAST(sum(n_active) OVER () AS DOUBLE))'
                   ' / (n_inactive'
                   ' / CAST(sum(n_inactive) OVER () AS DOUBLE)))', 6)}
                 AS woe,
               {pround_sql(
                   '((n_active / CAST(sum(n_active) OVER () AS DOUBLE))'
                   ' - (n_inactive'
                   ' / CAST(sum(n_inactive) OVER () AS DOUBLE)))'
                   ' * ln((n_active'
                   ' / CAST(sum(n_active) OVER () AS DOUBLE))'
                   ' / (n_inactive'
                   ' / CAST(sum(n_inactive) OVER () AS DOUBLE)))', 6)}
                 AS iv_contrib
        FROM per
    """,
    "q_price_elasticity": f"""
        WITH li AS (
          SELECT l_partkey,
                 CAST(floor(ln(l_extendedprice / l_quantity) * 1e6 + 0.5)
                      AS BIGINT) AS xi,
                 CAST(floor(ln(l_quantity) * 1e6 + 0.5) AS BIGINT) AS yi
          FROM lineitem),
        g AS (
          SELECT p.p_brand,
                 CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(xi) AS DOUBLE) AS sx,
                 CAST(sum(yi) AS DOUBLE) AS sy,
                 CAST(sum(CAST(xi AS HUGEINT) * CAST(xi AS HUGEINT))
                      AS DOUBLE) AS sxx,
                 CAST(sum(CAST(xi AS HUGEINT) * CAST(yi AS HUGEINT))
                      AS DOUBLE) AS sxy
          FROM li JOIN part p ON p.p_partkey = li.l_partkey
          GROUP BY 1)
        SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
               {pround_sql(
                   '(n * sxy - sx * sy) / (n * sxx - sx * sx)', 6)}
                 AS elasticity
        FROM g
    """,
    "q_growth_accounting": """
        WITH um AS (
          SELECT DISTINCT user_id,
                 CAST(floor((CAST(ts AS DATE) - DATE '1970-01-01') / 7.0)
                      AS INT) AS mi
          FROM events),
        lab AS (
          SELECT DATE '1970-01-01' + (mi * 7) AS m, mi,
                 lag(mi) OVER (PARTITION BY user_id ORDER BY mi)
                   AS prev_mi,
                 lead(mi) OVER (PARTITION BY user_id ORDER BY mi)
                   AS next_mi
          FROM um)
        SELECT m,
               CAST(sum(CASE WHEN prev_mi IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS new_users,
               CAST(sum(CASE WHEN prev_mi = mi - 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS retained_users,
               CAST(sum(CASE WHEN prev_mi IS NOT NULL
                              AND prev_mi < mi - 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS resurrected_users,
               CAST(sum(CASE WHEN next_mi IS NULL OR next_mi > mi + 1
                             THEN 1 ELSE 0 END)
                    AS BIGINT) AS churning_users
        FROM lab GROUP BY m
    """,
    "q_cohort_ltv": f"""
        WITH od AS (
          SELECT o_custkey,
                 date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
          FROM orders),
        wc AS (SELECT *, min(m) OVER (PARTITION BY o_custkey) AS cohort
               FROM od),
        grain AS (
          SELECT cohort,
                 CAST((year(m) * 12 + month(m))
                      - (year(cohort) * 12 + month(cohort)) AS INT) AS age,
                 CAST(sum(cents) AS BIGINT) AS rev
          FROM wc GROUP BY 1, 2),
        sizes AS (
          SELECT cohort, count(*) AS n_customers
          FROM (SELECT DISTINCT o_custkey, cohort FROM wc) t GROUP BY 1)
        SELECT g.cohort, g.age, s.n_customers,
               {pround_sql(
                   '(sum(g.rev) OVER (PARTITION BY g.cohort ORDER BY g.age'
                   ' ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))'
                   ' / 100.0 / CAST(s.n_customers AS DOUBLE)', 6)}
                 AS ltv_per_customer
        FROM grain g JOIN sizes s ON s.cohort = g.cohort
    """,
    "q_seasonal_index": f"""
        WITH monthly AS (
          SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                 sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                   AS cents
          FROM orders GROUP BY 1),
        per AS (
          SELECT CAST(month(m) AS INT) AS month,
                 count(*) AS n_months,
                 CAST(sum(cents) AS BIGINT) AS mcents
          FROM monthly GROUP BY 1)
        SELECT month, n_months,
               {pround_sql(
                   '(mcents / CAST(n_months AS DOUBLE)) / 100.0', 6)}
                 AS avg_revenue,
               {pround_sql(
                   '(mcents / CAST(n_months AS DOUBLE))'
                   ' / (sum(mcents) OVER ()'
                   ' / CAST(sum(n_months) OVER () AS DOUBLE))', 6)}
                 AS seasonal_index
        FROM per
    """,
    "q_brier_score": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        be AS (SELECT (s6 - label * 1000000) AS err FROM j),
        ba AS (SELECT count(*) AS n, sum(err * err) AS sq FROM be)
        SELECT CAST(n AS BIGINT) AS n_customers,
               {pround_sql(
                   'CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1e12', 6)}
                 AS brier
        FROM ba
    """,
    "q_log_loss": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        le AS (
          SELECT CAST(floor(
                   ln((CASE WHEN label = 1
                            THEN greatest(1, least(999999, s6))
                            ELSE 1000000 - greatest(1, least(999999, s6))
                       END) / 1000000.0) * 1000000.0 + 0.5)
                 AS BIGINT) AS ll6
          FROM j),
        la AS (SELECT count(*) AS n, sum(ll6) AS ll FROM le)
        SELECT CAST(n AS BIGINT) AS n_customers,
               {pround_sql(
                   '-CAST(ll AS DOUBLE) / CAST(n AS DOUBLE) / 1e6', 6)}
                 AS log_loss
        FROM la
    """,
    "q_gains_lift": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        r AS (
          SELECT *, NTILE(10) OVER (ORDER BY -s6, o_custkey) AS decile
          FROM j),
        d AS (
          SELECT decile,
                 count(*) AS n_customers,
                 CAST(sum(label) AS BIGINT) AS n_active
          FROM r GROUP BY decile)
        SELECT decile, n_customers, n_active,
               CAST(sum(n_active) OVER (ORDER BY decile) AS BIGINT)
                 AS cum_active,
               {pround_sql(
                   'sum(n_active) OVER (ORDER BY decile)'
                   ' / CAST(sum(n_active) OVER () AS DOUBLE)', 6)}
                 AS capture_pct,
               {pround_sql(
                   '(n_active / CAST(n_customers AS DOUBLE))'
                   ' / (sum(n_active) OVER ()'
                   ' / CAST(sum(n_customers) OVER () AS DOUBLE))', 6)}
                 AS lift
        FROM d
    """,
    "q_ml_score_inference": f"""
        WITH {_churn_feat_sql(False)},
        z AS (
          SELECT o_custkey, frequency, cents,
                 {_CHURN_Z_SQL} AS zv
          FROM f)
        SELECT o_custkey,
               frequency,
               cents / 100.0 AS monetary,
               {pround_sql('1.0 / (1.0 + exp(-zv))', 6)} AS churn_score,
               CAST(CASE WHEN 1.0 / (1.0 + exp(-zv)) >= 0.5
                         THEN 1 ELSE 0 END AS INT) AS retained_pred
        FROM z
    """,
    "q_exp_smoothing": _ema_sql(),
    "q_decayed_engagement": _decay_sql(),
    "q_survival_km": f"""
        WITH last AS (
          SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_d
          FROM orders GROUP BY 1),
        t AS (SELECT count(*) AS n FROM last),
        d AS (
          SELECT date_trunc('month', last_d) AS m, count(*) AS d
          FROM last WHERE last_d < DATE '1998-06-01' GROUP BY 1),
        s AS (
          SELECT m, d,
                 n - COALESCE(sum(d) OVER (ORDER BY m
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS risk
          FROM d, t),
        f AS (
          SELECT m, CAST(d AS BIGINT) AS d, CAST(risk AS BIGINT) AS risk,
                 (risk - d) / CAST(risk AS DOUBLE) AS factor
          FROM s)
        SELECT m, d, risk,
               {pround_sql(
                   'product(factor) OVER (ORDER BY m '
                   'ROWS UNBOUNDED PRECEDING)', 6)} AS survival
        FROM f
    """,
    "q_cusum_changepoint": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                   AS cents
          FROM orders GROUP BY 1),
        t AS (SELECT sum(cents) AS S, count(*) AS N FROM daily),
        s AS (
          SELECT day, cents,
                 sum(cents * N - S) OVER (ORDER BY day
                                          ROWS UNBOUNDED PRECEDING)
                   AS cusum_scaled
          FROM daily, t),
        p AS (SELECT day AS peak_day FROM s
              ORDER BY abs(cusum_scaled) DESC, day DESC LIMIT 1)
        SELECT s.day,
               CAST(cents AS DOUBLE) / 100.0 AS revenue,
               cusum_scaled,
               CAST(CASE WHEN s.day = p.peak_day THEN 1 ELSE 0 END
                    AS INT) AS is_peak
        FROM s, p
    """,
    "q_quantile_ladder_grouped": """
        WITH r AS (
          SELECT o_orderpriority, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) AS rn,
                 count(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM orders),
        p AS (SELECT CAST(unnest([0.25, 0.5, 0.75]) AS DOUBLE) AS p),
        sel AS (
          SELECT r.o_orderpriority, p.p, r.o_totalprice, r.rn, r.n
          FROM p JOIN r
            ON r.rn = floor((r.n - 1) * p.p + 1)
            OR r.rn = ceil((r.n - 1) * p.p + 1))
        SELECT o_orderpriority, p,
               CAST(max(n) AS BIGINT) AS n_orders,
               max(CASE WHEN rn = floor((n - 1) * p + 1)
                        THEN o_totalprice END)
               + ((max(n) - 1) * p + 1 - floor((max(n) - 1) * p + 1))
                 * (max(CASE WHEN rn = ceil((n - 1) * p + 1)
                             THEN o_totalprice END)
                    - max(CASE WHEN rn = floor((n - 1) * p + 1)
                               THEN o_totalprice END)) AS q_value
        FROM sel GROUP BY o_orderpriority, p
    """,
    "q_event_pattern": """
        WITH j AS (
          SELECT user_id,
                 CAST(count(*) AS BIGINT) AS n_events,
                 string_agg(substr(event_type, 1, 1), ''
                            ORDER BY ts, event_id) AS jy
          FROM events GROUP BY user_id)
        SELECT user_id, n_events,
               substr(jy, 1, 40) AS journey_prefix,
               CAST(length(jy) - length(replace(jy, 'p', ''))
                    AS BIGINT) AS n_purchases,
               CAST(CASE WHEN regexp_matches(jy, 'v[^p]*p')
                         THEN 1 ELSE 0 END AS INT) AS view_to_purchase
        FROM j
    """,
    "q_inverted_index": """
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_distinct(
                       string_split_regex(trim(text), '\\s+'))) AS token
            FROM documents
            WHERE trim(text) <> ''
        )
        SELECT token,
               CAST(count(*) AS BIGINT) AS df,
               list_slice(list_sort(list(doc_id)), 1, 20) AS postings
        FROM tok
        GROUP BY token
    """,
    "q_arrow_doc_stats": f"""
        -- coalesce pins the NULL-text convention to the Spark side's
        -- fillna(""): NULL text counts as 0 tokens/chars/digits in BOTH
        -- engines (bare length(NULL) would be NULL here but 0 there)
        SELECT doc_id,
               CAST({_N_TOKENS} AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    AS BIGINT) AS n_digits
        FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents) d
    """,
    "q_text_stats": f"""
        SELECT doc_id,
               CAST(length(text) AS INT) AS n_chars_calc,
               CAST({_N_TOKENS} AS INT) AS n_tokens,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens,
               CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS INT)
                    AS n_punct,
               {_hits(_STOP_EN)} AS n_stopwords
        FROM documents
    """,
    "q_text_quality": (
        f"SELECT doc_id, {pround_sql(_QUALITY_EXPR, 4)} AS quality FROM documents"
    ),
    "q_readability": f"""
        WITH d AS (
          SELECT doc_id,
                 CAST({_N_TOKENS} AS BIGINT) AS n_words,
                 greatest(CAST(length(text)
                               - length(replace(text, '.', ''))
                               AS BIGINT), 1) AS n_sentences,
                 CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                      AS BIGINT) AS n_syllables
          FROM documents WHERE trim(text) <> '')
        SELECT doc_id, n_words, n_sentences, n_syllables,
               {pround_sql(
                   '206.835'
                   ' - 1.015 * (CAST(n_words AS DOUBLE)'
                   '            / CAST(n_sentences AS DOUBLE))'
                   ' - 84.6 * (CAST(n_syllables AS DOUBLE)'
                   '           / CAST(n_words AS DOUBLE))', 4
               )} AS flesch_reading_ease
        FROM d
    """,
    "q_text_clean": r"""
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(text, 'https?://\S+', '<URL>', 'g'),
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\s+', ' ', 'g')) AS clean_text,
               CAST(length(trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(text, 'https?://\S+', '<URL>', 'g'),
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\s+', ' ', 'g'))) AS INT) AS clean_len
        FROM documents
    """,
    "q_corpus_filter": f"""
        SELECT doc_id, lang, n_tokens, quality FROM (
          SELECT doc_id, lang,
                 CAST({_N_TOKENS} AS INT) AS n_tokens,
                 {pround_sql(_QUALITY_EXPR, 4)} AS quality
          FROM documents
        ) t WHERE n_tokens >= 20 AND quality >= 0.35
    """,
    "q_vocab_topk": f"""
        SELECT token, count(*) AS doc_freq FROM (
          SELECT doc_id, unnest(list_distinct({_TOKENS})) AS token
          FROM documents
        ) t GROUP BY token ORDER BY doc_freq DESC, token ASC LIMIT 30
    """,
    "q_lang_id": f"""
        SELECT doc_id, en_hits, pt_hits, es_hits,
               CASE WHEN en_hits >= pt_hits AND en_hits >= es_hits THEN 'en'
                    WHEN pt_hits >= es_hits THEN 'pt'
                    ELSE 'es' END AS lang_pred
        FROM (
          SELECT doc_id,
                 {_hits(_STOP_EN)} AS en_hits,
                 {_hits(_STOP_PT)} AS pt_hits,
                 {_hits(_STOP_ES)} AS es_hits
          FROM documents
        ) t
    """,
    # --- TPC-H set (adapted where the synthetic schema lacks columns;
    #     see tpch.py docstrings) ---
    "q_stats_moments": f"""
        WITH s AS (
          SELECT l_returnflag,
            CAST(count(*) AS DOUBLE) AS n,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
            CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(22,4)))
                 AS DOUBLE) AS sxx,
            CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4)))
                 AS DOUBLE) AS syy,
            CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(24,4)))
                 AS DOUBLE) AS sxy
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               {pround_sql('sqrt((sxx - sx * sx / n) / (n - 1.0))', 9)}
                 AS std_qty,
               {pround_sql(
                   '(n * sxy - sx * sy)'
                   ' / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))', 9)}
                 AS corr_qty_price
        FROM s
    """,
    "q_string_advanced": """
        SELECT c_custkey,
               split_part(c_name, '#', 2) AS cust_num,
               lpad(CAST(c_nationkey AS VARCHAR), 3, '0') AS nk_pad,
               translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
               reverse(c_mktsegment) AS seg_rev,
               CAST(strpos(c_name, '9') AS INT) AS pos_nine,
               repeat('*', CAST(c_nationkey % 5 AS INT)) AS stars
        FROM customer
    """,
    "q_date_arithmetic": """
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
                 AS next_month,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
                 AS quarter_start,
               CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INT) AS doy
        FROM orders
    """,
    "q_array_ops": f"""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               CAST(embedding AS DOUBLE[])[1] AS first_val,
               list_min(CAST(embedding AS DOUBLE[])) AS min_val,
               list_max(CAST(embedding AS DOUBLE[])) AS max_val,
               {pround_sql(
                   'sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), '
                   'CAST(embedding AS DOUBLE[])))', 6)} AS l2
        FROM embeddings
    """,
    "q_topn_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        FROM orders
        QUALIFY rn <= 3
    """,
    "q_rolling_median": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                   AS cents
          FROM orders GROUP BY 1)
        SELECT d,
               CAST(cents AS DOUBLE) / 100.0 AS revenue,
               quantile_cont(cents, 0.5) OVER
                 (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 / 100.0 AS median_7d
        FROM daily
    """,
    "q_moving_avg_range": f"""
        WITH base AS (
          SELECT o_custkey, o_orderkey,
                 CAST(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS INT) AS day_no,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec
          FROM orders
        )
        SELECT o_custkey, o_orderkey, day_no,
               {pround_sql(
                   'CAST(sum(price_dec) OVER w AS DOUBLE) '
                   '/ CAST(count(*) OVER w AS DOUBLE)', 6)} AS avg_7d
        FROM base
        WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    "q_cume_dist": """
        SELECT o_orderkey, o_custkey,
               cume_dist() OVER
                 (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS cd,
               nth_value(o_totalprice, 2) OVER
                 (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING) AS second_price
        FROM orders
    """,
    "q_percent_rank": """
        SELECT c_custkey, c_nationkey,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    "q_window_first_last": """
        SELECT o_orderkey, o_custkey,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS last_price,
               CAST(ntile(4) OVER w AS INT) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "q_tpch_q1": f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql('l_quantity')} AS sum_qty,
               {dsum_sql('l_extendedprice')} AS sum_base_price,
               {dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)} AS sum_disc_price,
               {dsum_sql('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)', 6)} AS sum_charge,
               {pround_sql(dsum_sql('l_quantity') + ' / count(*)', 6)} AS avg_qty,
               {pround_sql(dsum_sql('l_extendedprice') + ' / count(*)', 6)} AS avg_price,
               {pround_sql(dsum_sql('l_discount') + ' / count(*)', 6)} AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '2001-06-30'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_tpch_q3": f"""
        SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate,
               {dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND CAST(o_orderdate AS DATE) < DATE '1998-06-30'
          AND CAST(l_shipdate AS DATE) > DATE '1998-06-30'
        GROUP BY l_orderkey, odate
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
    "q_tpch_q5": f"""
        SELECT n_name,
               {dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
          AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        GROUP BY n_name
    """,
    "q_tpch_q6": f"""
        SELECT {dsum_sql('l_extendedprice * l_discount', 4)} AS revenue
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
    "q_tpch_q7": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q_tpch_q8": f"""
        WITH vol AS (
          SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS volume,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
        )
        SELECT o_year,
               {pround_sql(
                   "CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume "
                   "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) "
                   "/ CAST(sum(volume) AS DOUBLE)", 6)} AS mkt_share
        FROM vol GROUP BY o_year
    """,
    "q_tpch_q10": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
    "q_tpch_q14": f"""
        SELECT {pround_sql(
            "100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' "
            "THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) "
            "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) / "
            + dsum_sql('l_extendedprice * (1.0 - l_discount)', 4), 6)}
            AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01'
          AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
    """,
    "q_tpch_q18": f"""
        WITH big AS (
          SELECT l_orderkey, {dsum_sql('l_quantity')} AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING {dsum_sql('l_quantity')} > 220
        )
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS odate, o_totalprice, total_qty
        FROM big JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "q_tpch_q19": f"""
        SELECT {dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 40)
    """,
    "q_tpch_q2": """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        eu AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        ),
        cand AS (SELECT * FROM ps JOIN eu ON l_suppkey = s_suppkey),
        mins AS (
          SELECT l_partkey AS mp, min(s_acctbal) AS min_bal
          FROM cand GROUP BY l_partkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM cand JOIN part ON l_partkey = p_partkey
        JOIN mins ON mp = p_partkey AND s_acctbal = min_bal
        WHERE p_type = 'PROMO' AND p_size <= 15
        ORDER BY s_acctbal DESC, p_partkey ASC, s_name ASC LIMIT 100
    """,
    "q_tpch_q4": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
          AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE))
        GROUP BY o_orderpriority
    """,
    "q_tpch_q9": """
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                    - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,4)))
                    AS DOUBLE) AS sum_profit
        FROM lineitem JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
    """,
    "q_tpch_q11": """
        WITH j AS (
          SELECT l_partkey,
                 CAST(l_quantity * p_retailprice AS DECIMAL(18,2)) AS val
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
        ),
        v AS (
          SELECT l_partkey AS partkey, CAST(sum(val) AS DOUBLE) AS part_value
          FROM j GROUP BY l_partkey
        )
        SELECT partkey, part_value FROM v
        WHERE part_value >
              (SELECT CAST(sum(val) AS DOUBLE)
                      * (2.0 / CAST((SELECT count(*) FROM part)
                                    AS DOUBLE))
               FROM j)
    """,
    "q_tpch_q12": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
          AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        GROUP BY l_returnflag
    """,
    "q_tpch_q13": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%URGENT%'
          GROUP BY c_custkey
        ) t
        GROUP BY c_count
    """,
    "q_tpch_q15": f"""
        WITH rev AS (
          SELECT l_suppkey AS supplier_no,
                 {dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)}
                   AS total_revenue
          FROM lineitem
          WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
            AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN rev ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    "q_tpch_q16": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
        GROUP BY p_brand, p_type, p_size
    """,
    "q_tpch_q17": f"""
        SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#2'
          AND l_quantity < (
            SELECT 0.2 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = part.p_partkey)
    """,
    "q_tpch_q20": f"""
        SELECT s_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA' AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE '%widget%'
            AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
            AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING {dsum_sql('l_quantity')} > 50)
    """,
    "q_tpch_q21": """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND CAST(l3.l_shipdate AS DATE) > CAST(o_orderdate AS DATE))
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC LIMIT 100
    """,
    "q_tpch_q22": f"""
        SELECT c_nationkey AS cntrycode, count(*) AS numcust,
               {dsum_sql('c_acctbal')} AS totacctbal
        FROM customer
        WHERE c_nationkey IN (1, 2, 3, 13, 17)
          AND c_acctbal > (
            SELECT {dsum_sql('c_acctbal')} / count(*) FROM customer
            WHERE c_acctbal > 0 AND c_nationkey IN (1, 2, 3, 13, 17))
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
    """,
    # --- flagship ---
    "q_star_flagship": (
        "SELECT r_name, n_name, CAST(year(o_orderdate) AS INT) AS order_year, "
        "count(*) AS n_lines, "
        f"{dsum_sql('l_extendedprice * (1.0 - l_discount)', 4)} AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name, n_name, order_year"
    ),
    # --- event analytics / BI extensions ---
    "q_sessionize": """
        WITH e AS (
          SELECT event_id, user_id, ts,
                 lag(epoch_ms(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
          FROM events)
        SELECT event_id, user_id,
          CAST(sum(CASE WHEN prev_ms IS NULL
                          OR epoch_ms(ts) - prev_ms > 1800000
                        THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM e
    """,
    "q_sequence_pairs": f"""
        WITH e AS (
          SELECT event_id, user_id, ts, event_type,
                 lag(epoch_ms(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ms
          FROM events),
        s AS (
          SELECT event_id, user_id, ts, event_type,
                 CAST(sum(CASE WHEN prev_ms IS NULL
                                 OR epoch_ms(ts) - prev_ms > 1800000
                               THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_seq
          FROM e),
        firsts AS (
          SELECT user_id, session_seq, event_type,
                 min(ts) AS fts,
                 first(event_id ORDER BY ts, event_id) AS fid
          FROM s GROUP BY 1, 2, 3),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b
          FROM firsts a JOIN firsts b
            ON a.user_id = b.user_id
           AND a.session_seq = b.session_seq
           AND (a.fts < b.fts
                OR (a.fts = b.fts AND a.fid < b.fid))),
        counts AS (
          SELECT type_a, type_b,
                 CAST(count(*) AS BIGINT) AS n_sessions
          FROM pairs GROUP BY 1, 2),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n_total
          FROM (SELECT DISTINCT user_id, session_seq FROM firsts))
        SELECT type_a, type_b, n_sessions,
               {pround_sql(
                   'CAST(n_sessions AS DOUBLE)'
                   ' / CAST(n_total AS DOUBLE)', 6)} AS support
        FROM counts, tot
    """,
    "q_string_agg": """
        SELECT c_nationkey, count(*) AS n_customers,
               string_agg(c_name, '|' ORDER BY c_name) AS names
        FROM customer GROUP BY c_nationkey
    """,
    "q_mode_per_group": """
        WITH c AS (
          SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
          FROM orders GROUP BY 1, 2),
        r AS (
          SELECT *, row_number() OVER
            (PARTITION BY o_orderstatus
             ORDER BY cnt DESC, o_orderpriority ASC) AS rn
          FROM c)
        SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
        FROM r WHERE rn = 1
    """,
    "q_histogram": f"""
        SELECT CAST(least(floor(o_totalprice / 25000.0), 19) AS INT) AS bin_id,
               count(*) AS n_orders, {dsum_sql('o_totalprice')} AS sum_price
        FROM orders GROUP BY 1
    """,
    "q_join_null_aware_anti": """
        SELECT o_orderkey FROM (
          SELECT o_orderkey,
                 CASE WHEN o_custkey % 100 = 0 THEN NULL
                      ELSE o_custkey END AS probe_key
          FROM orders) p
        WHERE probe_key NOT IN
          (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    """,
    "q_tfidf": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
          WHERE trim(text) <> ''),
        tfa AS (
          SELECT doc_id, token, count(*) AS tf
          FROM (SELECT doc_id, unnest(toks) AS token FROM docs)
          GROUP BY 1, 2),
        dfa AS (SELECT token, count(*) AS df_cnt FROM tfa GROUP BY 1),
        nd AS (SELECT count(*) AS n_docs FROM docs),
        scored AS (
          SELECT t.doc_id, t.token, t.tf, d.df_cnt, n.n_docs,
                 (t.tf * 1000000) // d.df_cnt AS key
          FROM tfa t JOIN dfa d USING (token) CROSS JOIN nd n),
        r AS (
          SELECT *, row_number() OVER
            (PARTITION BY doc_id ORDER BY key DESC, token ASC) AS rn
          FROM scored)
        SELECT doc_id, token, tf,
               {pround_sql('tf * ln(CAST(n_docs AS DOUBLE) / df_cnt)', 4)}
                 AS tfidf
        FROM r WHERE rn <= 5
    """,
    "q_pmi_bigrams": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
          WHERE trim(text) <> '' AND len({_TOKENS}) >= 2),
        uni AS (
          SELECT w, count(*) AS c_w
          FROM (SELECT unnest(toks) AS w FROM docs) GROUP BY w),
        uni2 AS (SELECT w, c_w, (SELECT sum(c_w) FROM uni) AS n_uni FROM uni),
        bi AS (
          SELECT bigram, count(*) AS c_xy FROM (
            SELECT unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i+1]))
                   AS bigram
            FROM docs) GROUP BY bigram),
        bi2 AS (
          SELECT bigram, c_xy, (SELECT sum(c_xy) FROM bi) AS n_bi
          FROM bi WHERE c_xy >= 5)
        SELECT b.bigram, b.c_xy,
          {pround_sql(
              "ln((CAST(b.c_xy AS DOUBLE) / b.n_bi)"
              " / ((CAST(x.c_w AS DOUBLE) / x.n_uni)"
              "    * (CAST(y.c_w AS DOUBLE) / y.n_uni)))", 4)} AS pmi
        FROM bi2 b
        JOIN uni2 x ON x.w = string_split(b.bigram, ' ')[1]
        JOIN uni2 y ON y.w = string_split(b.bigram, ' ')[2]
    """,
    "q_time_bucket_rollup": f"""
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS day_start,
               event_type, count(*) AS n_events,
               {dsum_sql('value')} AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_salted_groupby": f"""
        SELECT event_type, count(*) AS n_events,
               {dsum_sql('value')} AS sum_value
        FROM events GROUP BY 1
    """,
    "q_rfm": f"""
        WITH base AS (
          SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_order,
                 count(*) AS frequency,
                 {dsum_sql('o_totalprice')} AS monetary
          FROM orders GROUP BY 1)
        SELECT o_custkey, last_order, frequency, monetary,
          CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS INT)
            AS r_score,
          CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT)
            AS f_score,
          CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS INT)
            AS m_score
        FROM base
    """,
    "q_attribution_positional": """
        WITH fp AS MATERIALIZED (
          SELECT user_id, min(ts) AS pts
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        touches AS (
          SELECT e.user_id, e.event_type, e.ts, e.event_id, fp.pts
          FROM events e JOIN fp USING (user_id)
          WHERE e.event_type <> 'purchase'
            AND e.ts < fp.pts
            AND e.ts >= fp.pts - INTERVAL 7 DAY),
        ranked AS (
          SELECT *, row_number() OVER
                   (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM touches),
        kept AS (
          SELECT *, count(*) OVER (PARTITION BY user_id) AS n
          FROM (SELECT * FROM ranked WHERE rn <= 8) t)
        SELECT event_type,
               count(*) AS n_touches,
               sum(CASE WHEN n = 1 THEN 600
                        WHEN n = 2 THEN 300
                        WHEN rn = 1 OR rn = n THEN 240
                        ELSE CAST(120 / (n - 2) AS BIGINT) END) / 600.0
                 AS credit
        FROM kept GROUP BY event_type
    """,
    "q_attribution_last_touch": """
        WITH e AS (
          SELECT event_id, user_id, event_type, ts, epoch_ms(ts) AS ms,
                 max(CASE WHEN event_type <> 'purchase'
                          THEN {'ms': epoch_ms(ts), 'eid': event_id} END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_t
          FROM events)
        SELECT event_id AS purchase_id, user_id,
               CAST(last_t.eid AS BIGINT) AS touch_id
        FROM e
        WHERE event_type = 'purchase' AND last_t IS NOT NULL
          AND ms - last_t.ms <= 604800000
    """,
    "q_anomaly_zscore": f"""
        WITH s AS (
          SELECT event_type,
                 CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(value AS DECIMAL(18,2))
                          * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx
          FROM events GROUP BY 1),
        st AS (
          SELECT event_type, sx / n AS mean,
                 sqrt((sxx - sx * sx / n) / (n - 1.0)) AS std
          FROM s)
        SELECT event_id, e.event_type, value,
               {pround_sql('(value - mean) / std', 4)} AS z_score
        FROM events e JOIN st ON e.event_type = st.event_type
        WHERE abs((value - mean) / std) > 3.0
    """,
    "q_json_roundtrip": (
        "SELECT n_nationkey, n_name, n_regionkey FROM nation"
    ),
    "q_orc_roundtrip": "SELECT * FROM region",
    "q_managed_table": "SELECT * FROM supplier",
    "q_jdbc_roundtrip": (
        "SELECT n_nationkey, n_name, n_regionkey FROM nation"
    ),
    "q_xml_roundtrip": (
        "SELECT n_nationkey, n_name, n_regionkey FROM nation"
    ),
    "q_posexplode": """
        SELECT vec_id, CAST(i - 1 AS INT) AS pos,
               CAST(embedding[i] AS DOUBLE) AS val
        FROM embeddings, (SELECT unnest([1, 2, 3, 4]) AS i) t
    """,
    "q_grid_fill": f"""
        WITH years AS (
          SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS order_year
          FROM orders),
        rev AS (
          SELECT n_regionkey AS rk, CAST(year(o_orderdate) AS INT) AS yr,
                 {dsum_sql('o_totalprice')} AS rev
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2)
        SELECT r_name, order_year, coalesce(rev, 0.0) AS revenue
        FROM region CROSS JOIN years
        LEFT JOIN rev ON region.r_regionkey = rev.rk
                     AND years.order_year = rev.yr
    """,
    "q_map_ops": """
        WITH c AS (
          SELECT user_id, event_type, count(*) AS cnt
          FROM events GROUP BY 1, 2)
        SELECT user_id,
          coalesce(max(CASE WHEN event_type = 'view' THEN cnt END), 0)
            AS n_view,
          coalesce(max(CASE WHEN event_type = 'purchase' THEN cnt END), 0)
            AS n_purchase,
          CAST(count(*) AS INT) AS n_types
        FROM c GROUP BY user_id
    """,
    "q_dedup_threshold_curve": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
          WHERE doc_id % 10 = 0),
        sh2 AS (
          SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS sh FROM docs),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh2 GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        j AS (
          SELECT {pround_sql(
                     'CAST(n_inter AS DOUBLE)'
                     ' / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)', 6)}
                   AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b),
        f AS (SELECT jaccard FROM j WHERE jaccard >= 0.02)
        SELECT count(*) AS pairs_ge_002,
               CAST(sum(CASE WHEN jaccard >= 0.05 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pairs_ge_005,
               CAST(sum(CASE WHEN jaccard >= 0.10 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pairs_ge_010,
               CAST(sum(CASE WHEN jaccard >= 0.20 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pairs_ge_020
        FROM f
    """,
    # Quantile normalization: within-type ECDF position (rank - 1/2)/n.
    "q_quantile_normalize": f"""
        SELECT event_id, event_type, value,
               {pround_sql('(CAST(row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS DOUBLE) - 0.5) / CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE)', 6)} AS qnorm
        FROM events
    """,
    # Grid KNN: identical integer point synthesis, 3x3 neighbor
    # replication of the supplier side, exact integer squared distance,
    # winner = (d2, suppkey) lexicographic min — matches Spark's
    # min(struct) exactly; LEFT JOIN keeps empty-neighborhood customers.
    "q_grid_density_clusters": """
        WITH RECURSIVE pts AS (
          SELECT (c_custkey * 37) % 1000 AS lat,
                 (c_custkey * 73) % 1000 AS lon
          FROM customer),
        cel AS (
          SELECT CAST(floor(lat / 50.0) AS BIGINT) AS cx,
                 CAST(floor(lon / 50.0) AS BIGINT) AS cy
          FROM pts),
        core AS (
          SELECT cx * 100 + cy AS cell, cx, cy, count(*) AS n_pts
          FROM cel GROUP BY cx, cy HAVING count(*) >= 5),
        edges AS (
          SELECT a.cell AS src, b.cell AS dst
          FROM core a JOIN core b
            ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
        cc AS (
          SELECT DISTINCT src AS node, src AS comp FROM edges
          UNION
          SELECT e.dst AS node, cc.comp AS comp
          FROM cc JOIN edges e ON e.src = cc.node
          WHERE cc.comp < e.dst
        ),
        comp AS (SELECT node, min(comp) AS component FROM cc GROUP BY node)
        SELECT comp.component AS cluster_id,
               count(*) AS n_cells,
               CAST(sum(core.n_pts) AS BIGINT) AS n_points
        FROM comp JOIN core ON core.cell = comp.node
        GROUP BY comp.component
    """,
    "q_knn_grid_join": """
        WITH cu AS (
          SELECT c_custkey,
                 c_custkey * 37 % 1000 AS clat,
                 c_custkey * 73 % 1000 AS clon
          FROM customer),
        su AS (
          SELECT s_suppkey,
                 s_suppkey * 41 % 1000 AS slat,
                 s_suppkey * 59 % 1000 AS slon
          FROM supplier),
        su9 AS (
          SELECT s_suppkey, slat, slon,
                 CAST(floor(slat / 100.0) AS BIGINT) + dx.d AS cx,
                 CAST(floor(slon / 100.0) AS BIGINT) + dy.d AS cy
          FROM su,
               (VALUES (-1), (0), (1)) dx(d),
               (VALUES (-1), (0), (1)) dy(d)),
        cand AS (
          SELECT c_custkey, s_suppkey,
                 (clat - slat) * (clat - slat)
                 + (clon - slon) * (clon - slon) AS d2
          FROM cu
          JOIN su9 ON CAST(floor(clat / 100.0) AS BIGINT) = cx
                  AND CAST(floor(clon / 100.0) AS BIGINT) = cy),
        best AS (
          SELECT c_custkey, s_suppkey, d2,
                 row_number() OVER (PARTITION BY c_custkey
                                    ORDER BY d2, s_suppkey) AS rn
          FROM cand)
        SELECT cu.c_custkey,
               b.s_suppkey AS nearest_suppkey,
               b.d2 AS d2
        FROM cu
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (c_custkey)
    """,
    # Spearman with average-rank ties: doubled avg rank r2 = 2*cum - c + 1
    # stays integer (HUGEINT power sums match Spark's DECIMAL(38,0));
    # window sum over the per-distinct-value frame = Spark's
    # grouped_cumsum (RANGE vs ROWS identical on distinct keys); the one
    # float corr evaluates in the same fixed IEEE order as the Spark side.
    "q_spearman_by_group": """
        WITH li AS (
          SELECT l_returnflag,
                 CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
          FROM lineitem),
        rx AS (
          SELECT l_returnflag, x,
                 2 * sum(c) OVER (PARTITION BY l_returnflag ORDER BY x)
                   - c + 1 AS r2x
          FROM (SELECT l_returnflag, x, count(*) AS c
                FROM li GROUP BY 1, 2)),
        ry AS (
          SELECT l_returnflag, y,
                 2 * sum(c) OVER (PARTITION BY l_returnflag ORDER BY y)
                   - c + 1 AS r2y
          FROM (SELECT l_returnflag, y, count(*) AS c
                FROM li GROUP BY 1, 2)),
        g AS (
          SELECT li.l_returnflag,
                 count(*) AS n,
                 sum(r2x) AS sx, sum(r2y) AS sy,
                 sum(r2x * r2x) AS sxx, sum(r2y * r2y) AS syy,
                 sum(r2x * r2y) AS sxy
          FROM li
          JOIN rx ON li.l_returnflag = rx.l_returnflag AND li.x = rx.x
          JOIN ry ON li.l_returnflag = ry.l_returnflag AND li.y = ry.y
          GROUP BY 1)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
               floor((CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0.0
                            AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0
                      THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                      END) * 1000000 + 0.5) / 1000000 AS spearman
        FROM g
    """,
    # KS: integer cross-multiplied ECDF gap, one cumsum of the signed
    # delta; argmax = (largest |gap|, smallest value).
    "q_kendall_tau": f"""
        WITH li AS (
          SELECT l_returnflag,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
                 CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y
          FROM lineitem),
        cells AS (
          SELECT l_returnflag, x, y, count(*) AS cnt
          FROM li GROUP BY 1, 2, 3),
        cd AS (
          SELECT a.l_returnflag,
                 sum(CASE WHEN b.y > a.y THEN a.cnt * b.cnt ELSE 0 END)
                   AS c_pairs,
                 sum(CASE WHEN b.y < a.y THEN a.cnt * b.cnt ELSE 0 END)
                   AS d_pairs
          FROM cells a JOIN cells b
            ON a.l_returnflag = b.l_returnflag AND a.x < b.x
          GROUP BY 1),
        mx AS (
          SELECT l_returnflag, sum(t * (t - 1)) AS t1, sum(t) AS n
          FROM (SELECT l_returnflag, x, sum(cnt) AS t
                FROM cells GROUP BY 1, 2) m
          GROUP BY 1),
        my AS (
          SELECT l_returnflag, sum(t * (t - 1)) AS t2
          FROM (SELECT l_returnflag, y, sum(cnt) AS t
                FROM cells GROUP BY 1, 2) m
          GROUP BY 1)
        SELECT cd.l_returnflag,
               CAST(mx.n AS BIGINT) AS n_rows,
               CAST(CAST(c_pairs AS HUGEINT) AS VARCHAR) AS concordant,
               CAST(CAST(d_pairs AS HUGEINT) AS VARCHAR) AS discordant,
               {pround_sql(
                   '2.0 * CAST(c_pairs - d_pairs AS DOUBLE)'
                   ' / sqrt(CAST(n * (n - 1) - t1 AS DOUBLE)'
                   ' * CAST(n * (n - 1) - t2 AS DOUBLE))', 6)}
                 AS kendall_tau
        FROM cd JOIN mx ON mx.l_returnflag = cd.l_returnflag
                JOIN my ON my.l_returnflag = cd.l_returnflag
    """,
    "q_ks_test": f"""
        WITH od AS (
          SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
                 CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1,
                 CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS g2
          FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        g AS (
          SELECT v, CAST(sum(g1) AS BIGINT) AS c1, CAST(sum(g2) AS BIGINT) AS c2
          FROM od GROUP BY v
        ),
        t AS (
          SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
          FROM g
        ),
        c AS (
          SELECT v, n1, n2,
                 sum(n2 * c1 - n1 * c2) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS gap
          FROM g, t
        )
        SELECT n1, n2,
               {pround_sql('CAST(abs(gap) AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)', 6)} AS ks,
               CAST(v AS DOUBLE) / 100.0 AS at_value
        FROM c ORDER BY abs(gap) DESC, v ASC LIMIT 1
    """,
    # Per-segment KS: same cross-multiplied gap, windowed per segment;
    # argmax per segment = (largest |gap|, smallest value).
    "q_ks_by_segment": f"""
        WITH od AS (
          SELECT c.c_mktsegment AS segment,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
                 CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1,
                 CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS g2
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        g AS (
          SELECT segment, v,
                 CAST(sum(g1) AS BIGINT) AS c1, CAST(sum(g2) AS BIGINT) AS c2
          FROM od GROUP BY segment, v
        ),
        t AS (
          SELECT segment,
                 CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
          FROM g GROUP BY segment
        ),
        c AS (
          SELECT g.segment, v, n1, n2,
                 sum(n2 * c1 - n1 * c2) OVER (
                   PARTITION BY g.segment ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS gap
          FROM g JOIN t ON g.segment = t.segment
        ),
        r AS (
          SELECT segment, n1, n2, gap, v,
                 row_number() OVER (
                   PARTITION BY segment ORDER BY abs(gap) DESC, v ASC
                 ) AS rn
          FROM c
        )
        SELECT segment, n1, n2,
               {pround_sql('CAST(abs(gap) AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)', 6)} AS ks,
               CAST(v AS DOUBLE) / 100.0 AS at_value
        FROM r WHERE rn = 1
    """,
    # PSI per bin: add-one smoothed exact-rational probabilities, per-row
    # fixed-order (p - q) * ln(p / q), pinned.
    "q_psi_drift": f"""
        WITH g AS (
          SELECT CAST(least(9, floor(o_totalprice / 50000.0)) AS BIGINT) AS bin,
                 CAST(sum(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c_ref,
                 CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c_cur
          FROM orders WHERE year(o_orderdate) IN (1995, 1996)
          GROUP BY 1
        ),
        t AS (
          SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
                 CAST(sum(c_cur) AS BIGINT) AS n_cur
          FROM g
        )
        SELECT bin, c_ref, c_cur,
               {pround_sql('CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + 10 AS DOUBLE)', 6)} AS p_ref,
               {pround_sql('CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + 10 AS DOUBLE)', 6)} AS p_cur,
               {pround_sql('(CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + 10 AS DOUBLE) - CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + 10 AS DOUBLE)) * ln((CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + 10 AS DOUBLE)) / (CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + 10 AS DOUBLE)))', 6)} AS psi_contrib
        FROM g, t
    """,
    # Per-bin JS divergence: identical smoothing scaffold as PSI; the
    # contribution is a fixed-order per-row expression, log2 via ln/ln(2).
    "q_js_divergence": f"""
        WITH g AS (
          SELECT CAST(least(9, floor(o_totalprice / 50000.0)) AS BIGINT) AS bin,
                 CAST(sum(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c_ref,
                 CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c_cur
          FROM orders WHERE year(o_orderdate) IN (1995, 1996)
          GROUP BY 1
        ),
        t AS (
          SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
                 CAST(sum(c_cur) AS BIGINT) AS n_cur
          FROM g
        ),
        pq AS (
          SELECT bin, c_ref, c_cur,
                 CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + 10 AS DOUBLE) AS p,
                 CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + 10 AS DOUBLE) AS q
          FROM g, t
        )
        SELECT bin, c_ref, c_cur,
               {pround_sql('0.5 * p * (ln(p / ((p + q) / 2.0)) / 0.6931471805599453) + 0.5 * q * (ln(q / ((p + q) / 2.0)) / 0.6931471805599453)', 6)} AS js_contrib
        FROM pq
    """,
    "q_mix_shift": f"""
        WITH base AS (
          SELECT n_name,
                 CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN 1
                               ELSE 0 END) AS BIGINT) AS v0,
                 CAST(sum(CASE WHEN year(o_orderdate) = 1997 THEN 1
                               ELSE 0 END) AS BIGINT) AS v1,
                 CAST(sum(CASE WHEN year(o_orderdate) = 1996
                               THEN CAST(o_totalprice AS DECIMAL(18,2))
                               ELSE CAST(0 AS DECIMAL(18,2)) END)
                      AS DOUBLE) AS r0,
                 CAST(sum(CASE WHEN year(o_orderdate) = 1997
                               THEN CAST(o_totalprice AS DECIMAL(18,2))
                               ELSE CAST(0 AS DECIMAL(18,2)) END)
                      AS DOUBLE) AS r1
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE year(o_orderdate) IN (1996, 1997)
          GROUP BY 1
          HAVING v0 > 0 AND v1 > 0)
        SELECT n_name,
               {pround_sql('(v1 - v0) * (r0 / v0)', 4)} AS volume_effect,
               {pround_sql('v1 * (r1 / v1 - r0 / v0)', 4)} AS price_effect,
               {pround_sql('r1 - r0', 4)} AS total_change
        FROM base
    """,
    "q_survivorship": f"""
        WITH per AS (
          SELECT sha256(text) AS hash, doc_id, source,
                 CAST(floor(({_QUALITY_EXPR}) * 1000000.0 + 0.5) AS BIGINT)
                   AS qm
          FROM documents)
        SELECT hash, min(doc_id) AS keeper, count(*) AS n_members,
               {pround_sql('CAST(max(qm) AS DOUBLE) / 1000000.0', 6)}
                 AS best_quality,
               array_to_string(list_sort(list_distinct(list(source))), '|')
                 AS sources
        FROM per GROUP BY 1
    """,
    "q_ascii_ratio": f"""
        SELECT doc_id,
               CAST({_NON_ASCII} AS INT) AS n_non_ascii,
               {pround_sql(_NON_ASCII_RATIO, 6)} AS non_ascii_ratio
        FROM documents WHERE length(text) > 0
    """,
    "q_business_days": """
        WITH fs AS (
          SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
          FROM lineitem GROUP BY 1),
        spans AS (
          SELECT CAST(first_ship - CAST(o_orderdate AS DATE) AS BIGINT)
                   AS days,
                 CAST(floor(epoch(CAST(o_orderdate AS DATE)) / 86400)
                      AS BIGINT) + 3 AS sd
          FROM orders JOIN fs ON o_orderkey = fs.l_orderkey
          WHERE first_ship >= CAST(o_orderdate AS DATE)),
        b AS (
          SELECT (days // 7) * 5 +
                 CASE WHEN days % 7 = 0 THEN 0
                      ELSE len(list_filter(range(0, days % 7),
                               i -> (sd % 7 + i) % 7 < 5)) END
                   AS business_days
          FROM spans)
        SELECT CAST(business_days AS BIGINT) AS business_days,
               count(*) AS n_orders
        FROM b GROUP BY 1
    """,
    "q_skyline": """
        WITH base AS (
          SELECT o_custkey, count(*) AS frequency,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS monetary
          FROM orders GROUP BY 1),
        m AS (
          SELECT o_custkey, frequency, monetary,
                 max(monetary) OVER
                   (ORDER BY frequency ASC
                    RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS max_higher,
                 max(monetary) OVER (PARTITION BY frequency) AS max_same
          FROM base)
        SELECT o_custkey, frequency, monetary FROM m
        WHERE monetary = max_same
          AND (max_higher IS NULL OR monetary > max_higher)
    """,
    "q_proportional_allocation": """
        WITH rev AS (
          SELECT c_nationkey,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                      AS BIGINT) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1),
        q AS (
          SELECT c_nationkey,
                 (cents * 1000) // (SELECT sum(cents) FROM rev)
                   AS floor_slots,
                 (cents * 1000) % (SELECT sum(cents) FROM rev) AS rem
          FROM rev),
        r AS (
          SELECT c_nationkey, floor_slots, rem,
                 row_number() OVER (ORDER BY rem DESC, c_nationkey ASC)
                   AS rk,
                 1000 - sum(floor_slots) OVER () AS deficit
          FROM q)
        SELECT c_nationkey,
               CAST(floor_slots + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
                    AS BIGINT) AS slots
        FROM r
    """,
    "q_weighted_median": """
        WITH base AS (
          SELECT l_returnflag, l_quantity,
                 CAST(l_extendedprice AS DECIMAL(18,2)) AS w
          FROM lineitem),
        c AS (
          SELECT l_returnflag, l_quantity,
                 sum(w) OVER (PARTITION BY l_returnflag
                              ORDER BY l_quantity ASC, w ASC
                              ROWS UNBOUNDED PRECEDING) AS cumw,
                 sum(w) OVER (PARTITION BY l_returnflag) AS total
          FROM base)
        SELECT l_returnflag, min(l_quantity) AS weighted_median_qty
        FROM c WHERE cumw * 2 >= total GROUP BY 1
    """,
    "q_weighted_quantile_ladder": """
        WITH per_qty AS (
          SELECT l_quantity,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS w
          FROM lineitem GROUP BY 1),
        c AS (
          SELECT l_quantity,
                 sum(w) OVER (ORDER BY l_quantity ASC
                              ROWS UNBOUNDED PRECEDING) AS cumw,
                 sum(w) OVER () AS total
          FROM per_qty),
        rungs AS (
          SELECT c.*, p FROM c,
            (SELECT unnest([10, 25, 50, 75, 90]) AS p) ps)
        SELECT p,
               min(l_quantity) AS weighted_quantile_qty,
               CAST(CAST(max(total) AS DECIMAL(18,2)) AS VARCHAR)
                 AS total_weight
        FROM rungs WHERE cumw * 100 >= p * total
        GROUP BY p
    """,
    "q_lorenz_deciles": f"""
        WITH rev AS (
          SELECT o_custkey,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
          FROM orders GROUP BY 1),
        dec AS (
          SELECT x, CAST(ntile(10) OVER (ORDER BY x ASC, o_custkey ASC)
                         AS INT) AS decile
          FROM rev),
        per AS (
          SELECT decile, count(*) AS n_customers, sum(x) AS rev_d
          FROM dec GROUP BY 1),
        c AS (
          SELECT decile, n_customers, rev_d,
                 sum(rev_d) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                   AS cum_d
          FROM per),
        t AS (SELECT *, max(cum_d) OVER () AS total_d FROM c)
        SELECT decile, n_customers,
               CAST(rev_d AS DOUBLE) AS decile_revenue,
               {pround_sql(
                   'CAST(cum_d AS DOUBLE) / CAST(total_d AS DOUBLE)', 6)}
                 AS cum_share
        FROM t
    """,
    "q_referential_audit": """
        SELECT 'lineitem->orders' AS relation,
               (SELECT count(*) FROM lineitem) AS n_rows,
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
                 AS n_orphans
        UNION ALL
        SELECT 'orders->customer',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'customer->nation',
               (SELECT count(*) FROM customer),
               (SELECT count(*) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM nation n
                                  WHERE n.n_nationkey = c.c_nationkey))
    """,
    "q_fulfillment_latency": """
        WITH fs AS (
          SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
          FROM lineitem GROUP BY 1)
        SELECT CAST(first_ship - CAST(o_orderdate AS DATE) AS INT)
                 AS latency_days,
               count(*) AS n_orders
        FROM orders JOIN fs ON o_orderkey = fs.l_orderkey
        GROUP BY 1
    """,
    # interval coalescing: same island construction — a row opens an
    # island when its start exceeds the running max of preceding ends
    # (+1 adjacency); DuckDB's epoch-day ints match Spark's datediff.
    "q_interval_merge": """
        WITH fs AS (
          SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
          FROM lineitem GROUP BY 1),
        iv AS (
          SELECT o.o_custkey AS custkey,
                 datediff('day', DATE '1970-01-01',
                          CAST(o.o_orderdate AS DATE)) AS s,
                 datediff('day', DATE '1970-01-01', fs.first_ship) AS e
          FROM orders o JOIN fs ON o.o_orderkey = fs.l_orderkey),
        marked AS (
          SELECT custkey, s, e,
                 CASE WHEN max(e) OVER w IS NULL THEN 1
                      WHEN s > max(e) OVER w + 1 THEN 1
                      ELSE 0 END AS new_island
          FROM iv
          WINDOW w AS (PARTITION BY custkey ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        islands AS (
          SELECT custkey, s, e,
                 sum(new_island) OVER
                   (PARTITION BY custkey ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
          FROM marked)
        SELECT custkey, CAST(island AS BIGINT) AS island,
               min(s) AS span_start_day, max(e) AS span_end_day,
               count(*) AS n_intervals
        FROM islands GROUP BY custkey, island
    """,
    # the bucketization is invisible in the result: the oracle is the
    # direct theta join (DuckDB plans IEJoin), counted per nation.
    "q_join_interval_overlap": """
        WITH fs AS (
          SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
          FROM lineitem GROUP BY 1),
        iv AS (
          SELECT nation, okey, least(d1, d2) AS s, greatest(d1, d2) AS e
          FROM (
            SELECT c.c_nationkey AS nation, o.o_orderkey AS okey,
                   datediff('day', DATE '1970-01-01',
                            CAST(o.o_orderdate AS DATE)) AS d1,
                   datediff('day', DATE '1970-01-01', fs.first_ship) AS d2
            FROM orders o
            JOIN fs ON o.o_orderkey = fs.l_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_orderkey % 4 = 0))
        SELECT a.nation, count(*) AS n_overlapping_pairs
        FROM iv a JOIN iv b
          ON a.nation = b.nation AND a.okey < b.okey
         AND a.s <= b.e AND b.s <= a.e
        GROUP BY a.nation
    """,
    # the sweep-line twin: same theta-count truth as the join form
    "q_overlap_count_sweepline": """
        WITH fs AS (
          SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
          FROM lineitem GROUP BY 1),
        iv AS (
          SELECT nation, okey, least(d1, d2) AS s, greatest(d1, d2) AS e
          FROM (
            SELECT c.c_nationkey AS nation, o.o_orderkey AS okey,
                   datediff('day', DATE '1970-01-01',
                            CAST(o.o_orderdate AS DATE)) AS d1,
                   datediff('day', DATE '1970-01-01', fs.first_ship) AS d2
            FROM orders o
            JOIN fs ON o.o_orderkey = fs.l_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_orderkey % 4 = 0))
        SELECT a.nation, count(*) AS n_overlapping_pairs
        FROM iv a JOIN iv b
          ON a.nation = b.nation AND a.okey < b.okey
         AND a.s <= b.e AND b.s <= a.e
        GROUP BY a.nation
    """,
    "q_backlog_sweepline": """
        WITH fs AS (
          SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
          FROM lineitem GROUP BY 1),
        spans AS (
          SELECT CAST(o_orderdate AS DATE) AS open_d, first_ship
          FROM orders JOIN fs ON o_orderkey = fs.l_orderkey),
        deltas AS (
          SELECT open_d AS d, 1 AS delta FROM spans
          UNION ALL SELECT first_ship, -1 FROM spans),
        daily AS (SELECT d, CAST(sum(delta) AS BIGINT) AS net
                  FROM deltas GROUP BY 1)
        SELECT d, CAST(sum(net) OVER
                 (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS open_orders
        FROM daily
    """,
    "q_hhi": f"""
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
          FROM lineitem GROUP BY 1, 2),
        pp AS (
          SELECT l_partkey, count(*) AS n_suppliers,
                 CAST(sum(q) AS DOUBLE) AS sq,
                 CAST(sum(q * q) AS DOUBLE) AS sqq
          FROM ps GROUP BY 1)
        SELECT l_partkey, n_suppliers,
               {pround_sql('sqq / (sq * sq)', 6)} AS hhi
        FROM pp WHERE n_suppliers >= 2
    """,
    "q_minhash_accuracy": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
          WHERE doc_id % 10 = 0),
        sh2 AS (
          SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS sh FROM docs),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh2 GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        exact AS (
          SELECT id_a, id_b,
                 {pround_sql(
                     'CAST(n_inter AS DOUBLE)'
                     ' / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)', 6)}
                   AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE {pround_sql(
                     'CAST(n_inter AS DOUBLE)'
                     ' / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)', 6)}
                >= 0.05),
        dg AS (SELECT doc_id, md5(sh) AS m FROM sh2),
        hh AS (
          SELECT doc_id,
                 {_hex_bigint('m', 1, 15)} AS h1,
                 {_hex_bigint('m', 17, 12)} AS h2
          FROM dg),
        mh AS (
          SELECT doc_id, i,
                 min((h1 + i * h2) & ((CAST(1 AS BIGINT) << 60) - 1)) AS mh
          FROM hh, (SELECT unnest(range(0, 16)) AS i) idx
          GROUP BY doc_id, i),
        agree AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS n_agree
          FROM mh a JOIN mh b ON a.i = b.i AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT e.id_a, e.id_b, e.jaccard,
               {pround_sql('CAST(g.n_agree AS DOUBLE) / 16.0', 6)}
                 AS mh_estimate,
               {pround_sql(
                   'abs(CAST(g.n_agree AS DOUBLE) / 16.0 - e.jaccard)', 6)}
                 AS abs_err
        FROM exact e
        JOIN agree g ON g.id_a = e.id_a AND g.id_b = e.id_b
    """,
    "q_dedup_prefix": f"""
        WITH p AS (
          SELECT doc_id,
                 substr(sha256(array_to_string(
                     ({_TOKENS})[1:20], ' ')), 1, 16) AS prefix_hash
          FROM documents WHERE trim(text) <> '')
        SELECT prefix_hash, count(*) AS n_docs, min(doc_id) AS keeper
        FROM p GROUP BY 1 HAVING count(*) > 1
    """,
    "q_repetition_filter": f"""
        WITH tc AS (
          SELECT doc_id, tok, count(*) AS cnt
          FROM (SELECT doc_id, unnest({_TOKENS}) AS tok
                FROM documents WHERE trim(text) <> '') t
          GROUP BY 1, 2),
        pd AS (
          SELECT doc_id, max(cnt) AS max_cnt, sum(cnt) AS n_tok,
                 count(*) AS n_unique
          FROM tc GROUP BY 1)
        SELECT doc_id,
               {pround_sql(
                   'CAST(max_cnt AS DOUBLE) / CAST(n_tok AS DOUBLE)', 6)}
                 AS top_token_share,
               {pround_sql(
                   'CAST(n_unique AS DOUBLE) / CAST(n_tok AS DOUBLE)', 6)}
                 AS distinct_ratio
        FROM pd
    """,
    "q_source_profile": f"""
        WITH per AS (
          SELECT source,
                 CAST(floor(({_QUALITY_EXPR}) * 1000000.0 + 0.5) AS BIGINT)
                   AS qm,
                 {_N_TOKENS} AS n_tok,
                 sha256(text) AS hash
          FROM documents)
        SELECT source, count(*) AS n_docs,
               {pround_sql(
                   'CAST(sum(qm) AS DOUBLE) / count(*) / 1000000.0', 6)}
                 AS mean_quality,
               {pround_sql('CAST(sum(n_tok) AS DOUBLE) / count(*)', 6)}
                 AS mean_tokens,
               count(*) - count(DISTINCT hash) AS n_dup_docs
        FROM per GROUP BY 1
    """,
    "q_cross_source_dedup": """
        WITH allrows AS (
          SELECT source, text FROM documents
          UNION ALL
          SELECT 'mirror:' || source AS source, text
          FROM documents WHERE doc_id % 25 = 0),
        sh AS (
          SELECT DISTINCT source, sha256(text) AS hash FROM allrows)
        SELECT a.source AS src_a, b.source AS src_b,
               count(*) AS n_shared_hashes
        FROM sh a JOIN sh b
          ON a.hash = b.hash AND a.source < b.source
        GROUP BY 1, 2
    """,
    "q_cramers_v": _cramers_sql(),
    "q_chi2_cells": f"""
        WITH cells AS (
          SELECT o_orderstatus, o_orderpriority, count(*) AS observed
          FROM orders GROUP BY 1, 2),
        t AS (
          SELECT o_orderstatus, o_orderpriority, observed,
                 sum(observed) OVER (PARTITION BY o_orderstatus)
                   * sum(observed) OVER (PARTITION BY o_orderpriority)
                   / sum(observed) OVER () AS expected
          FROM cells)
        SELECT o_orderstatus, o_orderpriority, observed,
               {pround_sql('expected', 6)} AS expected,
               {pround_sql(
                   '(observed - expected) * (observed - expected)'
                   ' / expected', 6)} AS chi2_contrib
        FROM t
    """,
    # TWAP: identical ms-integer ordering on both sides (lead == the
    # desc-order grouped_lag), exact cents x gap products in HUGEINT,
    # one pinned division.
    "q_twap": f"""
        WITH ev AS (
          SELECT event_type, event_id, epoch_ms(ts) AS ms,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
          FROM events),
        w AS (
          SELECT event_type, c, ms,
                 lead(ms) OVER (PARTITION BY event_type
                                ORDER BY ms, event_id) AS nxt
          FROM ev),
        d AS (
          SELECT event_type, c, nxt - ms AS dur
          FROM w WHERE nxt IS NOT NULL)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(sum(dur) AS BIGINT) AS span_ms,
               {pround_sql(
                   'CAST(sum(c * dur) AS DOUBLE)'
                   ' / CAST(sum(dur) AS DOUBLE) / 100.0', 6)} AS twap
        FROM d GROUP BY 1
    """,
    # Mahalanobis: exact integer power sums cast to DOUBLE at the same
    # point as Spark, closed-form 2x2 inverse, one fixed-IEEE per-row
    # quadratic form; threshold literal is low-digit (exact DECIMAL ->
    # single-rounded DOUBLE).
    "q_anomaly_mahalanobis": f"""
        WITH li AS (
          SELECT l_returnflag,
                 CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
          FROM lineitem),
        s AS (
          SELECT l_returnflag,
                 CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(x) AS DOUBLE) AS sx,
                 CAST(sum(y) AS DOUBLE) AS sy,
                 CAST(sum(x * x) AS DOUBLE) AS sxx,
                 CAST(sum(y * y) AS DOUBLE) AS syy,
                 CAST(sum(x * y) AS DOUBLE) AS sxy
          FROM li GROUP BY 1),
        st AS (
          SELECT l_returnflag,
                 sx / n AS mx, sy / n AS my,
                 (sxx - sx * sx / n) / (n - 1.0) AS cxx,
                 (syy - sy * sy / n) / (n - 1.0) AS cyy,
                 (sxy - sx * sy / n) / (n - 1.0) AS cxy,
                 ((sxx - sx * sx / n) / (n - 1.0))
                   * ((syy - sy * sy / n) / (n - 1.0))
                   - ((sxy - sx * sy / n) / (n - 1.0))
                     * ((sxy - sx * sy / n) / (n - 1.0)) AS det
          FROM s),
        d AS (
          SELECT li.l_returnflag,
                 (cyy * (CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx)
                  - 2.0 * cxy * (CAST(x AS DOUBLE) - mx)
                        * (CAST(y AS DOUBLE) - my)
                  + cxx * (CAST(y AS DOUBLE) - my)
                        * (CAST(y AS DOUBLE) - my)) / det AS d2
          FROM li JOIN st USING (l_returnflag)
          WHERE det > 0.0)
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN d2 > 13.8155 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
               {pround_sql('max(d2)', 6)} AS max_d2
        FROM d GROUP BY 1
    """,
    # Winsorize: rank-selected exact cent bounds, integer clip, HUGEINT
    # power sums (= Spark's bigint/decimal), one pinned float expression
    # in the same IEEE order.
    "q_winsorize": f"""
        WITH od AS (
          SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
                 o_orderkey
          FROM orders),
        r AS (
          SELECT c, row_number() OVER (ORDER BY c, o_orderkey) AS rr,
                 count(*) OVER () AS n
          FROM od),
        b AS (
          SELECT
            max(CASE WHEN rr = GREATEST(1, CAST(floor(n / 100.0) AS BIGINT))
                     THEN c END) AS lo,
            max(CASE WHEN rr = n
                          - GREATEST(1, CAST(floor(n / 100.0) AS BIGINT)) + 1
                     THEN c END) AS hi
          FROM r),
        g AS (
          SELECT count(*) AS n, max(lo) AS lo, max(hi) AS hi,
                 sum(LEAST(GREATEST(c, lo), hi)) AS s,
                 sum(LEAST(GREATEST(c, lo), hi)
                     * LEAST(GREATEST(c, lo), hi)) AS ss
          FROM od, b)
        SELECT CAST(n AS BIGINT) AS n_orders,
               CAST(lo AS DOUBLE) / 100.0 AS lo,
               CAST(hi AS DOUBLE) / 100.0 AS hi,
               {pround_sql('CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0', 6)}
                 AS wins_mean,
               {pround_sql(
                   'CASE WHEN n > 1 THEN sqrt((CAST(n AS DOUBLE)'
                   ' * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)'
                   ' * CAST(s AS DOUBLE)) / (CAST(n AS DOUBLE)'
                   ' * (CAST(n AS DOUBLE) - 1.0))) / 100.0 END', 6)}
                 AS wins_std
        FROM g
    """,
    # FastSS deletion neighborhoods: identical variant generation
    # (1-based substr, deletion at each position plus identity), exact
    # levenshtein verify, symmetric per-name rollup.
    "q_fuzzy_ids_fastss": """
        WITH vocab AS (SELECT DISTINCT c_name AS tok FROM customer),
        var AS (
          SELECT tok, unnest(list_append(
            list_transform(range(1, length(tok) + 1),
                           i -> substr(tok, 1, i - 1)
                                || substr(tok, i + 1, length(tok))),
            tok)) AS v
          FROM vocab),
        cand AS (
          SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b
          FROM var a JOIN var b ON a.v = b.v AND a.tok <> b.tok)
        SELECT tok_a AS c_name,
               CAST(count(*) AS BIGINT) AS n_near,
               min(tok_b) AS nearest
        FROM cand
        WHERE levenshtein(tok_a, tok_b) <= 1
        GROUP BY 1
    """,
    # MI cells: same window-sum marginals and the same per-row float
    # expression shape as the Spark side; ln2 literal is the repr-safe
    # 16-digit form (mantissa < 2^53, DECIMAL->DOUBLE single-rounds).
    "q_mutual_information": f"""
        WITH cells AS (
          SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1, 2),
        m AS (
          SELECT lang, source, n_docs,
                 sum(n_docs) OVER (PARTITION BY lang) AS nl,
                 sum(n_docs) OVER (PARTITION BY source) AS ns,
                 sum(n_docs) OVER () AS n
          FROM cells)
        SELECT lang, source, n_docs,
               {pround_sql(
                   '(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE))'
                   ' * (ln(CAST(n_docs AS DOUBLE) * CAST(n AS DOUBLE)'
                   ' / (CAST(nl AS DOUBLE) * CAST(ns AS DOUBLE)))'
                   ' / 0.6931471805599453)', 6)} AS mi_contrib
        FROM m
    """,
    "q_entropy_profile": f"""
        WITH c AS (
          SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1),
        t AS (
          SELECT o_orderpriority, n,
                 CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS p
          FROM c)
        SELECT o_orderpriority, n,
               {pround_sql('p', 6)} AS p,
               {pround_sql('-p * ln(p)', 6)} AS surprisal
        FROM t
    """,
    "q_vector_medoid": f"""
        WITH em AS (
          SELECT vec_id, label,
                 list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))
                   AS qv
          FROM embeddings),
        vec AS (
          SELECT vec_id, label, qv,
                 CAST(list_sum(list_transform(qv, u -> u * u))
                      AS HUGEINT) AS sq
          FROM em),
        cell AS (
          SELECT label, CAST(count(*) AS HUGEINT) AS n_c,
                 CAST(sum(sq) AS HUGEINT) AS ssq_c
          FROM vec GROUP BY label),
        flat AS (
          SELECT vec_id, label, CAST(f AS INT) AS pos,
                 qv[CAST(f AS INT)] AS u
          FROM em, unnest(range(1, len(qv) + 1)) AS t(f)),
        comp AS (
          SELECT label, pos, CAST(sum(u) AS HUGEINT) AS s
          FROM flat GROUP BY 1, 2),
        dotv AS (
          SELECT f.label, f.vec_id,
                 CAST(sum(CAST(f.u AS HUGEINT) * c.s) AS HUGEINT) AS dot
          FROM flat f JOIN comp c
            ON f.label = c.label AND f.pos = c.pos
          GROUP BY 1, 2),
        sums AS (
          SELECT v.label, v.vec_id,
                 CAST(c.n_c * v.sq + c.ssq_c - 2 * d.dot
                      AS BIGINT) AS sum_d,
                 CAST(c.n_c - 1 AS BIGINT) AS n_others
          FROM vec v
          JOIN cell c ON v.label = c.label
          JOIN dotv d ON v.label = d.label AND v.vec_id = d.vec_id),
        best AS (
          SELECT label, MIN(sum_d) AS best FROM sums GROUP BY label)
        SELECT s.label,
               MIN(s.vec_id) AS medoid_id,
               s.n_others + 1 AS n_vectors,
               s.sum_d AS sum_sq_dist_micro2,
               {pround_sql(
                   'CAST(s.sum_d AS DOUBLE)'
                   ' / CAST(s.n_others AS DOUBLE) / 1e12', 6
               )} AS mean_sq_dist
        FROM sums s JOIN best t
          ON s.label = t.label AND s.sum_d = t.best
        GROUP BY s.label, s.sum_d, s.n_others
    """,
    "q_zipf_law": f"""
        WITH vocab AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest({_TOKENS}) AS tok FROM documents
                WHERE trim(text) <> '') t
          GROUP BY tok),
        top AS (
          SELECT tok, c FROM vocab ORDER BY c DESC, tok LIMIT 100),
        ranked AS (
          SELECT CAST(row_number() OVER (ORDER BY c DESC, tok)
                      AS BIGINT) AS r, c
          FROM top),
        terms AS (
          -- per-point lns pinned to the x1e6 grid with +0.5 FIRST
          -- (the q_moore_lewis discipline); OLS moments are then
          -- exact integer products of the pinned values
          SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1e6 + 0.5)
                      AS BIGINT) AS x6,
                 CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6 + 0.5)
                      AS BIGINT) AS y6
          FROM ranked),
        sums AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(SUM(x6) AS BIGINT) AS sx6,
                 CAST(SUM(y6) AS BIGINT) AS sy6,
                 CAST(SUM(x6 * x6) AS BIGINT) AS sxx12,
                 CAST(SUM(x6 * y6) AS BIGINT) AS sxy12
          FROM terms),
        fit AS (
          SELECT k,
                 (CAST(k AS DOUBLE) * (CAST(sxy12 AS DOUBLE) / 1e12)
                  - (CAST(sx6 AS DOUBLE) / 1e6)
                    * (CAST(sy6 AS DOUBLE) / 1e6))
                 / (CAST(k AS DOUBLE) * (CAST(sxx12 AS DOUBLE) / 1e12)
                    - (CAST(sx6 AS DOUBLE) / 1e6)
                      * (CAST(sx6 AS DOUBLE) / 1e6)) AS slope,
                 CAST(sx6 AS DOUBLE) / 1e6 AS sx,
                 CAST(sy6 AS DOUBLE) / 1e6 AS sy
          FROM sums)
        SELECT k AS n_points,
               {pround_sql('slope', 6)} AS zipf_slope,
               {pround_sql('(sy - slope * sx) / CAST(k AS DOUBLE)', 6)}
                 AS log_intercept
        FROM fit
    """,
    "q_embedding_dim_profile": f"""
        WITH flat AS (
          SELECT CAST(f AS INT) AS dim,
                 CAST(floor(CAST(embedding AS DOUBLE[])[CAST(f AS INT)]
                            * 1000000.0 + 0.5) AS BIGINT) AS u
          FROM embeddings,
               unnest(range(1, len(embedding) + 1)) AS t(f)),
        g AS (
          SELECT dim,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(u AS HUGEINT)) AS HUGEINT) AS s1,
                 CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS s2,
                 CAST(min(u) AS BIGINT) AS mn,
                 CAST(max(u) AS BIGINT) AS mx,
                 CAST(SUM(CASE WHEN u = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_zero
          FROM flat GROUP BY 1)
        SELECT dim, n,
               {pround_sql(
                   'CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1e6', 6
               )} AS mean,
               {pround_sql(
                   'sqrt(greatest((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)'
                   ' - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))'
                   '   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))'
                   ' / 1e12, 0.0))', 6)} AS std,
               {pround_sql('CAST(mn AS DOUBLE) / 1e6', 6)} AS min,
               {pround_sql('CAST(mx AS DOUBLE) / 1e6', 6)} AS max,
               {pround_sql(
                   'CAST(n_zero AS DOUBLE) / CAST(n AS DOUBLE)', 6
               )} AS zero_fraction,
               sqrt(greatest((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / 1e12,
                 0.0)) < 1e-3 AS is_dead_dim
        FROM g
    """,
    "q_embedding_covariance": f"""
        WITH x AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                            * 1000000.0 + 0.5) AS BIGINT) AS xi
          FROM embeddings),
        nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
        s AS (SELECT pos, CAST(sum(xi) AS HUGEINT) AS sv
              FROM x GROUP BY 1),
        g AS (
          SELECT a.pos AS i, b.pos AS j,
                 CAST(sum(CAST(a.xi AS HUGEINT) * b.xi) AS HUGEINT) AS t
          FROM x a JOIN x b
            ON a.vec_id = b.vec_id AND a.pos < b.pos
          GROUP BY 1, 2),
        c AS (
          SELECT CAST(g.i + 1 AS INT) AS dim_i,
                 CAST(g.j + 1 AS INT) AS dim_j,
                 {pround_sql(
                     'CAST(nn.n * g.t - si.sv * sj.sv AS DOUBLE)'
                     ' / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)'
                     '    * 1e12)', 8)} AS cov
          FROM g JOIN s si ON si.pos = g.i
                 JOIN s sj ON sj.pos = g.j, nn)
        SELECT dim_i, dim_j, cov FROM c
        ORDER BY abs(cov) DESC, dim_i, dim_j LIMIT 20
    """,
    "q_knn_probe_accuracy": f"""
        WITH em AS (
          SELECT vec_id, label,
                 list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))
                   AS qv
          FROM embeddings),
        em2 AS (
          SELECT vec_id, label, qv,
                 4 * CASE WHEN qv[1] > 0 THEN 1 ELSE 0 END
                 + 2 * CASE WHEN qv[2] > 0 THEN 1 ELSE 0 END
                 + CASE WHEN qv[3] > 0 THEN 1 ELSE 0 END AS sign3
          FROM em),
        probes AS (
          SELECT vec_id AS p_id, label AS p_label, sign3 AS p_sign3,
                 qv AS p_q
          FROM em2 WHERE vec_id % 37 = 0 AND vec_id < 20000),
        pairs AS (
          SELECT p.p_id, p.p_label, p.p_sign3, e.label, e.sign3,
                 e.vec_id,
                 CAST(list_sum(list_transform(
                   range(1, len(e.qv) + 1),
                   f -> (e.qv[CAST(f AS INT)] - p.p_q[CAST(f AS INT)])
                      * (e.qv[CAST(f AS INT)] - p.p_q[CAST(f AS INT)])))
                   AS BIGINT) AS d2
          FROM em2 e CROSS JOIN probes p
          WHERE e.vec_id != p.p_id),
        top3 AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY p_id
              ORDER BY d2 ASC, vec_id ASC) AS rn
            FROM pairs) WHERE rn <= 3),
        pf AS (
          SELECT CAST(t AS INT) AS t, CAST(pr AS INT) AS pr FROM (
            SELECT p_id, p_label AS t, label AS pr,
                   row_number() OVER (PARTITION BY p_id
                     ORDER BY count(*) DESC, label ASC) AS r
            FROM top3 GROUP BY p_id, p_label, label) WHERE r = 1),
        ps AS (
          SELECT CAST(t AS INT) AS t, CAST(pr AS INT) AS pr FROM (
            SELECT p_id, p_sign3 AS t, sign3 AS pr,
                   row_number() OVER (PARTITION BY p_id
                     ORDER BY count(*) DESC, sign3 ASC) AS r
            FROM top3 GROUP BY p_id, p_sign3, sign3) WHERE r = 1),
        statf AS (
          SELECT CAST(count(*) AS BIGINT) AS n_probes,
                 CAST(SUM(CASE WHEN pr = t THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_correct,
                 CAST((SELECT sum(COALESCE(a.n_t, 0)
                                  * COALESCE(b.n_p, 0))
                       FROM (SELECT t AS l, count(*) AS n_t FROM pf
                             GROUP BY 1) a
                       FULL JOIN (SELECT pr AS l, count(*) AS n_p
                                  FROM pf GROUP BY 1) b USING (l))
                      AS BIGINT) AS s_null
          FROM pf),
        stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_probes,
                 CAST(SUM(CASE WHEN pr = t THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_correct,
                 CAST((SELECT sum(COALESCE(a.n_t, 0)
                                  * COALESCE(b.n_p, 0))
                       FROM (SELECT t AS l, count(*) AS n_t FROM ps
                             GROUP BY 1) a
                       FULL JOIN (SELECT pr AS l, count(*) AS n_p
                                  FROM ps GROUP BY 1) b USING (l))
                      AS BIGINT) AS s_null
          FROM ps),
        u AS (
          SELECT 'fixture' AS label_kind, * FROM statf
          UNION ALL SELECT 'sign3', * FROM stats)
        SELECT label_kind, n_probes, n_correct,
               {pround_sql(
                   'CAST(n_correct AS DOUBLE)'
                   ' / CAST(n_probes AS DOUBLE)', 6)} AS knn_accuracy,
               {pround_sql(
                   'CAST(s_null AS DOUBLE) / (CAST(n_probes AS DOUBLE)'
                   ' * CAST(n_probes AS DOUBLE))', 6)} AS null_accuracy,
               {pround_sql(
                   '(CAST(n_correct AS DOUBLE)'
                   ' / CAST(n_probes AS DOUBLE))'
                   ' / (CAST(s_null AS DOUBLE)'
                   ' / (CAST(n_probes AS DOUBLE)'
                   '    * CAST(n_probes AS DOUBLE)))', 6)} AS lift
        FROM u
    """,
    "q_semantic_outliers": f"""
        WITH em AS (
          SELECT vec_id, label,
                 list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))
                   AS qv
          FROM embeddings),
        flat AS (
          SELECT vec_id, label, CAST(f AS INT) AS pos,
                 qv[CAST(f AS INT)] AS u
          FROM em, unnest(range(1, len(qv) + 1)) AS t(f)),
        cell AS (
          SELECT label, pos,
                 CAST(floor(CAST(sum(u) AS DOUBLE)
                            / CAST(count(DISTINCT vec_id) AS DOUBLE))
                      AS BIGINT) AS c
          FROM flat GROUP BY 1, 2),
        d AS (
          SELECT f.label, f.vec_id,
                 CAST(SUM((f.u - c.c) * (f.u - c.c)) AS BIGINT)
                   AS dist2_micro2
          FROM flat f JOIN cell c
            ON f.label = c.label AND f.pos = c.pos
          GROUP BY 1, 2),
        r AS (
          SELECT label, vec_id, dist2_micro2,
                 CAST(row_number() OVER (PARTITION BY label
                   ORDER BY dist2_micro2 DESC, vec_id ASC) AS INT)
                   AS outlier_rank
          FROM d)
        SELECT label, outlier_rank, vec_id, dist2_micro2,
               {pround_sql(
                   'CAST(dist2_micro2 AS DOUBLE) / 1e12', 6
               )} AS dist2
        FROM r WHERE outlier_rank <= 3
    """,
    "q_heaps_law": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
          WHERE trim(text) <> ''),
        maxd AS (SELECT MAX(doc_id) AS m FROM docs),
        cps AS (
          SELECT pct, (m * pct) // 100 AS cut
          FROM (SELECT unnest([25, 50, 75, 100]) AS pct) p
          CROSS JOIN maxd),
        fs AS (
          SELECT tok, MIN(doc_id) AS fseen
          FROM (SELECT doc_id, unnest(toks) AS tok FROM docs) t
          GROUP BY tok),
        vocab AS (
          SELECT pct, cut, CAST(COUNT(*) AS BIGINT) AS vocab_cum
          FROM fs CROSS JOIN cps WHERE fseen <= cut
          GROUP BY pct, cut),
        ntok AS (
          SELECT pct, cut, CAST(SUM(len(toks)) AS BIGINT) AS n_tokens_cum
          FROM docs CROSS JOIN cps WHERE doc_id <= cut
          GROUP BY pct, cut),
        j AS (
          SELECT v.pct, v.cut, n.n_tokens_cum, v.vocab_cum
          FROM vocab v JOIN ntok n ON v.pct = n.pct AND v.cut = n.cut)
        SELECT pct, cut, n_tokens_cum, vocab_cum,
               {pround_sql(
                   'ln(CAST(vocab_cum AS DOUBLE)'
                   ' / CAST(lag(vocab_cum) OVER (ORDER BY pct)'
                   '        AS DOUBLE))'
                   ' / ln(CAST(n_tokens_cum AS DOUBLE)'
                   ' / CAST(lag(n_tokens_cum) OVER (ORDER BY pct)'
                   '        AS DOUBLE))', 6
               )} AS beta
        FROM j
    """,
    "q_roc_curve": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        b AS (
          SELECT CAST(LEAST(s6 // 50000, 19) AS INT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(label) AS BIGINT) AS pos
          FROM j GROUP BY 1),
        cum AS (
          SELECT bucket,
                 SUM(pos) OVER (ORDER BY bucket DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS tp,
                 SUM(n) OVER (ORDER BY bucket DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - SUM(pos) OVER (ORDER BY bucket DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS fp,
                 SUM(pos) OVER () AS p_all,
                 SUM(n) OVER () - SUM(pos) OVER () AS n_all
          FROM b)
        SELECT bucket AS threshold_bucket,
               CAST(tp AS BIGINT) AS tp,
               CAST(fp AS BIGINT) AS fp,
               CAST(p_all - tp AS BIGINT) AS fn,
               CAST(n_all - fp AS BIGINT) AS tn,
               {pround_sql(
                   'CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE)', 6
               )} AS tpr,
               {pround_sql(
                   'CAST(fp AS DOUBLE) / CAST(n_all AS DOUBLE)', 6
               )} AS fpr,
               CASE WHEN tp + fp > 0 THEN {pround_sql(
                   'CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)', 6
               )} END AS precision
        FROM cum
    """,
    "q_pr_curve": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        b AS (
          SELECT CAST(LEAST(s6 // 50000, 19) AS INT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(label) AS BIGINT) AS pos
          FROM j GROUP BY 1),
        cum AS (
          SELECT bucket,
                 SUM(pos) OVER (ORDER BY bucket DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS tp,
                 SUM(n) OVER (ORDER BY bucket DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - SUM(pos) OVER (ORDER BY bucket DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS fp,
                 SUM(pos) OVER () AS p_all
          FROM b),
        c2 AS (
          SELECT bucket, tp, fp, p_all,
                 CASE WHEN tp + fp > 0
                      THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                      ELSE 0.0 END AS prec,
                 CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE) AS rec,
                 CAST(floor(
                   (CAST(tp - COALESCE(lag(tp) OVER (ORDER BY bucket
                      DESC), 0) AS DOUBLE) / CAST(p_all AS DOUBLE))
                   * (CASE WHEN tp + fp > 0
                        THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                        ELSE 0.0 END)
                   * 1e9) AS BIGINT) AS t9
          FROM cum)
        SELECT bucket AS threshold_bucket,
               CAST(tp AS BIGINT) AS tp,
               CAST(fp AS BIGINT) AS fp,
               CAST(p_all - tp AS BIGINT) AS fn,
               {pround_sql('prec', 6)} AS precision,
               {pround_sql('rec', 6)} AS recall,
               CASE WHEN prec + rec > 0 THEN {pround_sql(
                   '2.0 * prec * rec / (prec + rec)', 6
               )} END AS f1,
               {pround_sql(
                   'CAST(SUM(t9) OVER () AS DOUBLE) / 1e9', 6
               )} AS avg_precision
        FROM c2
    """,
    "q_threshold_selection": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        b AS (
          SELECT CAST(LEAST(s6 // 50000, 19) AS INT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(label) AS BIGINT) AS pos
          FROM j GROUP BY 1),
        cum AS (
          SELECT bucket,
                 CAST(SUM(pos) OVER wd AS BIGINT) AS tp,
                 CAST(SUM(n) OVER wd - SUM(pos) OVER wd AS BIGINT)
                   AS fp,
                 CAST(SUM(pos) OVER () AS BIGINT) AS p_all,
                 CAST(SUM(n) OVER () - SUM(pos) OVER () AS BIGINT)
                   AS n_all
          FROM b
          WINDOW wd AS (ORDER BY bucket DESC
                        ROWS UNBOUNDED PRECEDING)),
        m AS (
          SELECT bucket, tp, fp,
                 CAST(p_all - tp AS BIGINT) AS fn,
                 CAST(n_all - fp AS BIGINT) AS tn,
                 CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE)
                 - CAST(fp AS DOUBLE) / CAST(n_all AS DOUBLE) AS jstat,
                 2.0 * CAST(tp AS DOUBLE)
                 / CAST(2 * tp + fp + (p_all - tp) AS DOUBLE) AS f1,
                 CAST(5 * (p_all - tp) + fp AS BIGINT) AS cost
          FROM cum)
        SELECT 'youden_j' AS criterion,
               bucket AS threshold_bucket,
               {pround_sql('jstat', 6)} AS value, tp, fp, fn, tn
        FROM m QUALIFY row_number() OVER (ORDER BY jstat DESC,
                                          bucket ASC) = 1
        UNION ALL
        SELECT 'f1', bucket, {pround_sql('f1', 6)}, tp, fp, fn, tn
        FROM m QUALIFY row_number() OVER (ORDER BY f1 DESC,
                                          bucket ASC) = 1
        UNION ALL
        SELECT 'min_cost_fn5', bucket,
               {pround_sql('CAST(cost AS DOUBLE)', 6)}, tp, fp, fn, tn
        FROM m QUALIFY row_number() OVER (ORDER BY cost ASC,
                                          bucket ASC) = 1
    """,
    "q_ece": f"""
        WITH {_CHURN_SCORED_LABELED_SQL},
        b AS (
          SELECT CAST(LEAST(s6 // 50000, 19) AS INT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_b,
                 CAST(SUM(label) AS BIGINT) AS pos,
                 CAST(SUM(s6) AS BIGINT) AS s6_sum
          FROM j GROUP BY 1),
        e_t AS (
          SELECT n_b,
                 abs(CAST(pos AS DOUBLE) / CAST(n_b AS DOUBLE)
                     - CAST(s6_sum AS DOUBLE)
                       / (1000000.0 * CAST(n_b AS DOUBLE))) AS gap
          FROM b),
        e_a AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
                 CAST(SUM(n_b) AS BIGINT) AS n,
                 CAST(SUM(CAST(floor(
                   CAST(n_b AS DOUBLE) * gap * 1000000000.0
                 ) AS BIGINT)) AS BIGINT) AS wgap9,
                 MAX({pround_sql('gap', 6)}) AS mce
          FROM e_t)
        SELECT n_buckets, n,
               {pround_sql(
                   'CAST(wgap9 AS DOUBLE)'
                   ' / (CAST(n AS DOUBLE) * 1000000000.0)', 6
               )} AS ece,
               mce
        FROM e_a
    """,
    "q_littles_law": f"""
        WITH fs AS (
          SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS ship
          FROM lineitem GROUP BY 1),
        j AS (
          SELECT CAST(o_orderdate AS DATE) AS od,
                 GREATEST(fs.ship, CAST(o_orderdate AS DATE)) AS ship2
          FROM orders JOIN fs ON orders.o_orderkey = fs.l_orderkey),
        b AS (SELECT MAX(od) AS d1 FROM j),
        jj AS (
          SELECT od, (ship2 - od) AS wait,
                 GREATEST(LEAST(ship2 - od, d1 - od), 0) AS ov
          FROM j CROSS JOIN b),
        ag AS (
          SELECT CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(SUM(wait) AS BIGINT) AS wait_days_total,
                 CAST(SUM(ov) AS BIGINT) AS overlap_days_total,
                 CAST(MAX(od) - MIN(od) AS BIGINT) AS span_days
          FROM jj)
        SELECT n_orders, span_days,
               {pround_sql(
                   'CAST(n_orders AS DOUBLE)'
                   ' / CAST(span_days AS DOUBLE)', 6
               )} AS lambda_per_day,
               {pround_sql(
                   'CAST(wait_days_total AS DOUBLE)'
                   ' / CAST(n_orders AS DOUBLE)', 6
               )} AS w_mean_days,
               {pround_sql(
                   'CAST(overlap_days_total AS DOUBLE)'
                   ' / CAST(span_days AS DOUBLE)', 6
               )} AS l_measured,
               {pround_sql(
                   'CAST(overlap_days_total AS DOUBLE)'
                   ' / CAST(wait_days_total AS DOUBLE)', 6
               )} AS littles_ratio,
               wait_days_total - overlap_days_total AS censored_days
        FROM ag
    """,
    "q_encoding_advisor": f"""
        WITH fl AS (
          SELECT o_orderpriority, o_orderstatus, o_custkey,
                 CASE WHEN lag(o_orderpriority) OVER (ORDER BY o_orderdate, o_orderkey) IS NULL OR o_orderpriority != lag(o_orderpriority) OVER (ORDER BY o_orderdate, o_orderkey) THEN 1 ELSE 0 END AS chg_o_orderpriority,
                 CASE WHEN lag(o_orderstatus) OVER (ORDER BY o_orderdate, o_orderkey) IS NULL OR o_orderstatus != lag(o_orderstatus) OVER (ORDER BY o_orderdate, o_orderkey) THEN 1 ELSE 0 END AS chg_o_orderstatus,
                 CASE WHEN lag(o_custkey) OVER (ORDER BY o_orderdate, o_orderkey) IS NULL OR o_custkey != lag(o_custkey) OVER (ORDER BY o_orderdate, o_orderkey) THEN 1 ELSE 0 END AS chg_o_custkey
          FROM orders),
        ag AS (
          SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(SUM(chg_o_orderpriority) AS BIGINT) AS runs_o_orderpriority, CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS ndv_o_orderpriority,
                 CAST(SUM(chg_o_orderstatus) AS BIGINT) AS runs_o_orderstatus, CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS ndv_o_orderstatus,
                 CAST(SUM(chg_o_custkey) AS BIGINT) AS runs_o_custkey, CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_o_custkey
          FROM fl),
        st AS (
          SELECT 'o_orderpriority' AS column_name, n_rows, ndv_o_orderpriority AS ndv, runs_o_orderpriority AS n_runs FROM ag
          UNION ALL
          SELECT 'o_orderstatus' AS column_name, n_rows, ndv_o_orderstatus AS ndv, runs_o_orderstatus AS n_runs FROM ag
          UNION ALL
          SELECT 'o_custkey' AS column_name, n_rows, ndv_o_custkey AS ndv, runs_o_custkey AS n_runs FROM ag)
        SELECT column_name, n_rows, ndv, n_runs,
               {pround_sql(
                   'CAST(n_rows AS DOUBLE) / CAST(n_runs AS DOUBLE)', 4
               )} AS avg_run_length
        FROM st
    """,
    "q_table_checksum": f"""
        WITH c AS (
          SELECT {_hex_bigint(
              "md5(CAST(o_orderkey AS VARCHAR) || '|'"
              " || CAST(o_custkey AS VARCHAR) || '|'"
              " || CAST(CAST(floor(o_totalprice * 100.0 + 0.5)"
              "         AS BIGINT) AS VARCHAR) || '|'"
              " || CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || '|'"
              " || o_orderpriority)", 1, 8
          )} AS h
          FROM orders)
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(CAST(SUM(h) AS HUGEINT) AS VARCHAR) AS checksum_sum,
               CAST(bit_xor(h) AS BIGINT) AS checksum_xor
        FROM c
    """,
    "q_join_cardinality_estimate": f"""
        WITH a AS (
          SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS ca
          FROM orders GROUP BY 1),
        b AS (
          SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS cb
          FROM lineitem GROUP BY 1),
        j AS (
          SELECT CAST(SUM(ca * cb) AS BIGINT) AS exact_join_rows,
                 CAST(MAX(ca * cb) AS BIGINT) AS max_key_contribution,
                 CAST(count(*) AS BIGINT) AS n_matching_keys
          FROM a JOIN b USING (k)),
        ta AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                      CAST(count(*) AS BIGINT) AS ndv_a FROM a),
        tb AS (SELECT CAST(SUM(cb) AS BIGINT) AS nb,
                      CAST(count(*) AS BIGINT) AS ndv_b FROM b)
        SELECT na, nb, ndv_a, ndv_b, n_matching_keys, exact_join_rows,
               CAST((na * nb) // GREATEST(ndv_a, ndv_b) AS BIGINT)
                 AS independence_estimate,
               max_key_contribution,
               {pround_sql(
                   'CAST(max_key_contribution AS DOUBLE)'
                   ' / CAST(exact_join_rows AS DOUBLE)', 6
               )} AS top_key_share
        FROM j CROSS JOIN ta CROSS JOIN tb
    """,
    "q_burstiness": f"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        g AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(SUM(c) AS BIGINT) AS sx,
                 CAST(SUM(c * c) AS BIGINT) AS sxx
          FROM daily GROUP BY 1)
        SELECT event_type, n_days, sx,
               {pround_sql(
                   'CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)', 6
               )} AS mean_daily,
               {pround_sql(
                   'CAST(n_days * sxx - sx * sx AS DOUBLE)'
                   ' / CAST(n_days * (n_days - 1) AS DOUBLE)', 6
               )} AS var_daily,
               {pround_sql(
                   '(CAST(n_days * sxx - sx * sx AS DOUBLE)'
                   ' / CAST(n_days * (n_days - 1) AS DOUBLE))'
                   ' / (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))', 6
               )} AS fano_factor
        FROM g
    """,
    "q_bloom_fpr_eval": f"""
        WITH members AS (
          SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
        mk AS (SELECT c_custkey, unnest([0, 1, 2]) AS kk FROM members),
        bits AS (
          SELECT DISTINCT {_hex_bigint(
              "md5(CAST(kk AS VARCHAR) || ':'"
              " || CAST(c_custkey AS VARCHAR))", 1, 8
          )} % 65536 AS pos
          FROM mk),
        pk AS (SELECT DISTINCT o_custkey FROM orders),
        pr AS (
          SELECT o_custkey,
                 {_hex_bigint(
                     "md5(CAST(kk AS VARCHAR) || ':'"
                     " || CAST(o_custkey AS VARCHAR))", 1, 8
                 )} % 65536 AS pos
          FROM (SELECT o_custkey, unnest([0, 1, 2]) AS kk FROM pk) t),
        passing AS (
          SELECT o_custkey FROM pr JOIN bits USING (pos)
          GROUP BY o_custkey HAVING count(*) = 3),
        flagged AS (
          SELECT CASE WHEN p.o_custkey IS NULL THEN 0 ELSE 1 END AS pp,
                 CASE WHEN m.c_custkey IS NULL THEN 0 ELSE 1 END AS mm
          FROM pk
          LEFT JOIN passing p ON pk.o_custkey = p.o_custkey
          LEFT JOIN members m ON pk.o_custkey = m.c_custkey),
        nb AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM bits),
        ag AS (
          SELECT CAST(count(*) AS BIGINT) AS n_probed,
                 CAST(SUM(mm) AS BIGINT) AS n_members_probed,
                 CAST(SUM(CASE WHEN pp = 1 AND mm = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS fp_count
          FROM flagged)
        SELECT n_probed, n_members_probed, fp_count, bits_set,
               {pround_sql(
                   'CAST(fp_count AS DOUBLE)'
                   ' / CAST(n_probed - n_members_probed AS DOUBLE)', 6
               )} AS fpr_measured,
               {pround_sql(
                   '(CAST(bits_set AS DOUBLE) / 65536.0)'
                   ' * (CAST(bits_set AS DOUBLE) / 65536.0)'
                   ' * (CAST(bits_set AS DOUBLE) / 65536.0)', 6
               )} AS fpr_expected
        FROM ag CROSS JOIN nb
    """,
    "q_partition_balance": f"""
        WITH g AS (
          SELECT {_hex_bigint(
              "md5('pb-v1|' || CAST(user_id AS VARCHAR))", 1, 8
          )} % 32 AS bucket,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1),
        wn AS (
          SELECT bucket, c,
                 SUM(c) OVER () AS n,
                 MAX(c) OVER () AS cmax,
                 COUNT(*) OVER () AS nb
          FROM g),
        t AS (
          SELECT n, cmax, nb,
                 CAST(floor(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                     * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
                     * 1000000000.0) AS BIGINT) AS h9
          FROM wn),
        ag AS (
          SELECT n, cmax, nb, CAST(SUM(h9) AS BIGINT) AS h9_sum
          FROM t GROUP BY n, cmax, nb)
        SELECT CAST(nb AS BIGINT) AS n_buckets,
               CAST(n AS BIGINT) AS n_rows,
               {pround_sql(
                   'CAST(cmax AS DOUBLE) / CAST(n AS DOUBLE)', 6
               )} AS max_share,
               {pround_sql(
                   'CAST(h9_sum AS DOUBLE) / 1000000000.0'
                   f' / {__import__("math").log(32)!r}', 6
               )} AS balance
        FROM ag
    """,
    "q_reconciliation": """
        WITH line AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(floor(
                   l_extendedprice * (1.0 - l_discount)
                   * (1.0 + l_tax) * 100.0 + 0.5) AS BIGINT))
                   AS BIGINT) AS line_cents
          FROM lineitem GROUP BY 1),
        hdr AS (
          SELECT o_orderkey,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS hdr_cents
          FROM orders),
        j AS (
          SELECT hdr_cents, coalesce(line_cents, 0) AS line_cents
          FROM hdr LEFT JOIN line ON hdr.o_orderkey = line.l_orderkey)
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN abs(hdr_cents - line_cents) = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
               CAST(SUM(CASE WHEN abs(hdr_cents - line_cents) != 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
               CAST(MAX(abs(hdr_cents - line_cents)) AS BIGINT)
                 AS max_abs_diff_cents,
               CAST(SUM(abs(hdr_cents - line_cents)) AS BIGINT)
                 AS total_abs_diff_cents
        FROM j
    """,
    "q_gaps_and_islands": """
        WITH days AS (
          SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d
          FROM orders),
        isl AS (
          SELECT o_custkey, d,
                 (d - DATE '1970-01-01')
                 - row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY d) AS grp
          FROM days),
        st AS (
          SELECT o_custkey, grp, CAST(count(*) AS BIGINT) AS len
          FROM isl GROUP BY 1, 2)
        SELECT o_custkey,
               CAST(SUM(len) AS BIGINT) AS active_days,
               CAST(COUNT(*) AS BIGINT) AS n_streaks,
               CAST(MAX(len) AS BIGINT) AS longest_streak
        FROM st GROUP BY o_custkey
        HAVING MAX(len) >= 2
    """,
    "q_causal_ipw": f"""
        WITH b0 AS (
          SELECT c_mktsegment, c_custkey FROM customer),
        b1 AS (
          SELECT CAST(CASE c_mktsegment
                      WHEN 'AUTOMOBILE' THEN 8 WHEN 'BUILDING' THEN 6
                      WHEN 'FURNITURE' THEN 5 WHEN 'HOUSEHOLD' THEN 4
                      WHEN 'MACHINERY' THEN 2 ELSE 5 END AS BIGINT) AS k,
                 {_hex_bigint(
                     "md5('ipw-v1|' || CAST(c_custkey AS VARCHAR))", 1, 8
                 )} % 10 AS u
          FROM b0),
        b2 AS (SELECT *, CASE WHEN u < k THEN 1 ELSE 0 END AS t FROM b1),
        b3 AS (
          SELECT *, CAST(k * 1000 + t * 5000 AS BIGINT) AS y,
                 CAST(k AS DOUBLE) / 10.0 AS p
          FROM b2),
        b4 AS (
          SELECT *,
                 CAST(floor(CAST(t AS DOUBLE) * CAST(y AS DOUBLE)
                            / p * 1000.0) AS BIGINT) AS tt,
                 CAST(floor(CAST(1 - t AS DOUBLE) * CAST(y AS DOUBLE)
                            / (1.0 - p) * 1000.0) AS BIGINT) AS tc
          FROM b3),
        ag AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(t) AS BIGINT) AS n_treated,
                 CAST(SUM(CASE WHEN t = 1 THEN y END) AS BIGINT) AS yt,
                 CAST(SUM(CASE WHEN t = 0 THEN y END) AS BIGINT) AS yc,
                 CAST(SUM(tt) AS BIGINT) AS stt,
                 CAST(SUM(tc) AS BIGINT) AS stc
          FROM b4)
        SELECT n, n_treated,
               {pround_sql(
                   '(CAST(yt AS DOUBLE) / CAST(n_treated AS DOUBLE)'
                   ' - CAST(yc AS DOUBLE)'
                   '   / CAST(n - n_treated AS DOUBLE)) / 100.0', 4
               )} AS naive_diff,
               {pround_sql(
                   'CAST(stt - stc AS DOUBLE)'
                   ' / (1000.0 * CAST(n AS DOUBLE)) / 100.0', 4
               )} AS ate_ipw
        FROM ag
    """,
    "q_phonetic_blocking": f"""
        WITH pt AS (
          SELECT p_partkey,
                 regexp_extract(p_name, '^([a-z]+)', 1) AS w
          FROM part),
        coded AS (
          SELECT p_partkey, w,
                 {soundex_sql('w')} AS code
          FROM pt)
        SELECT code,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(count(DISTINCT w) AS BIGINT) AS n_words,
               MIN(w) AS first_word,
               CAST(count(*) * (count(*) - 1) // 2 AS BIGINT)
                 AS candidate_pairs
        FROM coded GROUP BY code
    """,
    "q_simpson_paradox": """
        WITH li AS (
          SELECT l_returnflag AS segment,
                 CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS x,
                 CAST(l_quantity AS BIGINT) AS y
          FROM lineitem),
        g AS (
          SELECT segment, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM li GROUP BY segment),
        seg AS (
          SELECT segment, n,
                 n * sxy - sx * sy AS cov_num,
                 CAST(sign(n * sxy - sx * sy) AS INT) AS slope_sign
          FROM g),
        pooled AS (
          SELECT SUM(n) * SUM(sxy) - SUM(sx) * SUM(sy)
                   AS pooled_cov_num
          FROM g)
        SELECT segment, n, cov_num, slope_sign,
               CAST(sign(pooled_cov_num) AS INT) AS pooled_sign,
               CAST(CASE WHEN MAX(slope_sign) OVER ()
                              = MIN(slope_sign) OVER ()
                          AND CAST(sign(pooled_cov_num) AS INT)
                              != slope_sign
                    THEN 1 ELSE 0 END AS INT) AS paradox
        FROM seg CROSS JOIN pooled
    """,
    "q_theil_decomposition": f"""
        WITH rev AS (
          SELECT o_custkey,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
          FROM orders GROUP BY 1),
        seg AS (
          SELECT c.c_mktsegment AS segment, rev.x
          FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey),
        g AS (
          SELECT segment, CAST(count(*) AS BIGINT) AS n_g,
                 sum(x) AS s_g
          FROM seg GROUP BY segment),
        gm AS (
          SELECT segment, n_g,
                 CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS mu_g,
                 CAST(SUM(s_g) OVER () AS DOUBLE)
                   / CAST(SUM(n_g) OVER () AS DOUBLE) AS mu,
                 CAST(s_g AS DOUBLE)
                   / CAST(SUM(s_g) OVER () AS DOUBLE) AS share
          FROM g),
        w AS (
          SELECT seg.segment,
                 CAST(SUM(CAST(floor(
                   (CAST(seg.x AS DOUBLE) / gm.mu_g)
                   * ln(CAST(seg.x AS DOUBLE) / gm.mu_g)
                   * 1000000000.0) AS BIGINT)) AS BIGINT) AS sum_t9
          FROM seg JOIN gm ON seg.segment = gm.segment
          GROUP BY seg.segment),
        o AS (
          SELECT gm.segment, gm.n_g AS n_customers, gm.share,
                 CAST(w.sum_t9 AS DOUBLE)
                   / (CAST(gm.n_g AS DOUBLE) * 1000000000.0) AS t_within,
                 CAST(floor(gm.share * ln(gm.mu_g / gm.mu)
                            * 1000000000.0) AS BIGINT) AS b9
          FROM gm JOIN w ON gm.segment = w.segment),
        o2 AS (
          SELECT *, CAST(floor(share * t_within * 1000000000.0)
                         AS BIGINT) AS ww9
          FROM o)
        SELECT segment, n_customers,
               {pround_sql('share', 6)} AS revenue_share,
               {pround_sql('t_within', 6)} AS theil_within,
               {pround_sql(
                   'CAST(SUM(b9) OVER () AS DOUBLE) / 1000000000.0', 6
               )} AS theil_between,
               {pround_sql(
                   'CAST(SUM(b9) OVER () + SUM(ww9) OVER () AS DOUBLE)'
                   ' / 1000000000.0', 6
               )} AS theil_total
        FROM o2
    """,
    "q_gini": f"""
        WITH rev AS (
          SELECT o_custkey,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
          FROM orders GROUP BY 1),
        r AS (
          SELECT x, CAST(row_number() OVER (ORDER BY x ASC, o_custkey ASC)
                         AS DECIMAL(19,0)) AS i
          FROM rev),
        a AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(x) AS DOUBLE) AS sx,
                 CAST(sum(i * x) AS DOUBLE) AS six
          FROM r)
        SELECT CAST(n AS BIGINT) AS n_customers,
               {pround_sql('2.0 * six / (n * sx) - (n + 1.0) / n', 6)}
                 AS gini
        FROM a
    """,
    "q_bm25": f"""
        WITH {_bm25_scored_ctes()}
        SELECT doc_id, bm25 FROM bm
    """,
    "q_hybrid_search": f"""
        WITH {_bm25_scored_ctes()},
        {_cosine_scored_ctes()},
        cand AS (
          SELECT s.vec_id AS doc_id,
                 COALESCE(b.bm25, 0.0) AS bm25,
                 s.cosine
          FROM scored s LEFT JOIN bm b ON b.doc_id = s.vec_id),
        mm AS (
          SELECT min(bm25) AS l_mn, max(bm25) AS l_mx,
                 min(cosine) AS s_mn, max(cosine) AS s_mx
          FROM cand)
        SELECT doc_id, bm25, cosine,
               {pround_sql(
                   '0.5 * (CASE WHEN l_mx > l_mn'
                   ' THEN (bm25 - l_mn) / (l_mx - l_mn) ELSE 0.5 END)'
                   ' + 0.5 * (CASE WHEN s_mx > s_mn'
                   ' THEN (cosine - s_mn) / (s_mx - s_mn)'
                   ' ELSE 0.5 END)', 6)} AS hybrid_score
        FROM cand, mm
        ORDER BY hybrid_score DESC, doc_id ASC LIMIT 10
    """,
    # nDCG@10: both engines consume the SAME repr-exact discount
    # literals and the SAME left-associated 10-term chain — unrounded
    # floats are safe (see functions/ranking_eval.py).
    "q_mrr": f"""
        WITH qs AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
                 label AS qlabel
          FROM embeddings WHERE vec_id < 5),
        cand AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv, label
          FROM embeddings),
        scored AS (
          SELECT qid, qlabel, vec_id, label,
                 {pround_sql(
                     'list_dot_product(cv, qv)'
                     ' / (sqrt(list_dot_product(cv, cv))'
                     '    * sqrt(list_dot_product(qv, qv)))', 6
                 )} AS cos
          FROM cand CROSS JOIN qs WHERE vec_id != qid),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id) AS r
          FROM scored),
        fr AS (
          SELECT qid, qlabel, MIN(r) AS first_rel_rank
          FROM ranked WHERE label = qlabel GROUP BY qid, qlabel)
        SELECT qid, qlabel, first_rel_rank,
               {pround_sql(
                   '1.0 / CAST(first_rel_rank AS DOUBLE)', 6
               )} AS rr,
               {pround_sql(
                   'CAST(SUM(CAST(floor(1000000.0 / '
                   'CAST(first_rel_rank AS DOUBLE)) AS BIGINT)) OVER ()'
                   ' AS DOUBLE) / 5000000.0', 6
               )} AS mrr
        FROM fr
    """,
    "q_ndcg_at_10": f"""
        WITH {_cosine_scored_ctes()},
        top10 AS (
          SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS r
          FROM (SELECT * FROM scored ORDER BY cosine DESC, vec_id LIMIT 10)),
        gains AS (
          SELECT r, label FROM top10 JOIN embeddings USING (vec_id)),
        ideal AS (
          SELECT label, row_number() OVER (ORDER BY label DESC, vec_id) AS r
          FROM (SELECT vec_id, label FROM embeddings
                ORDER BY label DESC, vec_id LIMIT 10)),
        g AS (SELECT {_gain_pivot('g')} FROM gains),
        ig AS (SELECT {_gain_pivot('i')} FROM ideal),
        m AS (SELECT {_dcg_chain('g')} AS dcg, {_dcg_chain('i')} AS idcg
              FROM g, ig)
        SELECT dcg, idcg,
               CASE WHEN idcg > 0.0 THEN dcg / idcg END AS ndcg
        FROM m
    """,
    # RRF fusion: both lists rank on the SAME pinned scores as their
    # standalone oracles (bm25 pround-4, cosine pround-6) with id
    # tie-breaks; 1/(60+rank) on small ints is per-row IEEE, unrounded.
    "q_rrf_fusion": f"""
        WITH {_bm25_scored_ctes()},
        lexr AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                      AS INTEGER) AS lex_rank
          FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50)),
        {_cosine_scored_ctes()},
        semr AS (
          SELECT vec_id AS doc_id,
                 CAST(row_number() OVER (ORDER BY cosine DESC, vec_id)
                      AS INTEGER) AS sem_rank
          FROM (SELECT * FROM scored ORDER BY cosine DESC, vec_id LIMIT 50))
        SELECT COALESCE(lexr.doc_id, semr.doc_id) AS doc_id,
               lex_rank, sem_rank,
               COALESCE(1.0 / (60.0 + CAST(lex_rank AS DOUBLE)), 0.0)
               + COALESCE(1.0 / (60.0 + CAST(sem_rank AS DOUBLE)), 0.0)
                 AS rrf
        FROM lexr FULL OUTER JOIN semr ON lexr.doc_id = semr.doc_id
        ORDER BY rrf DESC, COALESCE(lexr.doc_id, semr.doc_id)
        LIMIT 10
    """,
    "q_bm25_topk_batch": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
          WHERE trim(text) <> ''),
        tf AS (
          SELECT doc_id, dl, tok, count(*) AS tf
          FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok
                FROM docs) t
          WHERE tok IN ('data', 'hash', 'join', 'merge', 'scan', 'vector')
          GROUP BY 1, 2, 3),
        st AS (
          SELECT *, count(*) OVER (PARTITION BY tok) AS df FROM tf),
        qt AS (SELECT * FROM (VALUES
                 ('q1', 'join'), ('q1', 'hash'),
                 ('q2', 'vector'), ('q2', 'scan'),
                 ('q3', 'data'), ('q3', 'merge')) v(qid, tok)),
        corpus AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl
          FROM docs),
        scored AS (
          SELECT qid, doc_id,
                 {pround_sql(
                     'sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)'
                     ' * (tf * (1.2 + 1.0)'
                     ' / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))))', 4)}
                   AS bm25
          FROM st JOIN qt USING (tok) CROSS JOIN corpus
          GROUP BY qid, doc_id),
        ranked AS (
          SELECT qid, doc_id, bm25,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY bm25 DESC, doc_id) AS rnk
          FROM scored)
        SELECT qid, CAST(rnk AS INT) AS rnk, doc_id, bm25
        FROM ranked WHERE rnk <= 5
    """,
    "q_path_trigrams": """
        WITH p AS (
          SELECT lag(event_type, 2) OVER w AS t1,
                 lag(event_type, 1) OVER w AS t2,
                 event_type AS t3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT t1 || '>' || t2 || '>' || t3 AS path,
               count(*) AS n_paths
        FROM p WHERE t1 IS NOT NULL
        GROUP BY 1 ORDER BY n_paths DESC, path ASC LIMIT 10
    """,
    "q_benford": f"""
        WITH d AS (
          SELECT CAST(floor(
            CASE WHEN o_totalprice >= 100000.0 THEN o_totalprice / 100000.0
                 WHEN o_totalprice >= 10000.0 THEN o_totalprice / 10000.0
                 WHEN o_totalprice >= 1000.0 THEN o_totalprice / 1000.0
                 WHEN o_totalprice >= 100.0 THEN o_totalprice / 100.0
                 WHEN o_totalprice >= 10.0 THEN o_totalprice / 10.0
                 ELSE o_totalprice END) AS INT) AS digit
          FROM orders),
        c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1)
        SELECT digit, n,
               {pround_sql(
                   'CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE)', 6)}
                 AS share,
               {pround_sql('log10(1.0 + 1.0 / digit)', 6)} AS benford
        FROM c
    """,
    "q_audience_overlap": f"""
        WITH ua AS (
          SELECT DISTINCT event_type, user_id FROM events),
        inter AS (
          SELECT a.event_type AS ta, b.event_type AS tb,
                 count(*) AS n_inter
          FROM ua a JOIN ua b
            ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY 1, 2),
        sizes AS (
          SELECT event_type, count(*) AS n_u FROM ua GROUP BY 1)
        SELECT i.ta, i.tb, i.n_inter,
               {pround_sql(
                   'CAST(i.n_inter AS DOUBLE)'
                   ' / (sa.n_u + sb.n_u - i.n_inter)', 6)} AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.event_type = i.ta
        JOIN sizes sb ON sb.event_type = i.tb
    """,
    "q_ohlc": """
        WITH base AS (
          SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
                   AS hour_start,
                 event_type,
                 {'ms': epoch_ms(ts), 'eid': event_id, 'v': value} AS k,
                 value
          FROM events)
        SELECT hour_start, event_type,
               (min(k)).v AS open, max(value) AS high,
               min(value) AS low, (max(k)).v AS close
        FROM base GROUP BY 1, 2
    """,
    "q_scd2_asof": """
        WITH ver AS (
          SELECT o_custkey,
                 row_number() OVER
                   (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE),
                    o_orderkey) AS version,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                   (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE),
                    o_orderkey ROWS UNBOUNDED PRECEDING) AS cum_spend_d,
                 CAST(o_orderdate AS DATE) AS valid_from,
                 lead(CAST(o_orderdate AS DATE)) OVER
                   (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE),
                    o_orderkey) AS valid_to
          FROM orders)
        SELECT o_custkey, version, CAST(cum_spend_d AS DOUBLE) AS cum_spend
        FROM ver
        WHERE valid_from <= DATE '1997-07-01'
          AND (valid_to IS NULL OR valid_to > DATE '1997-07-01')
    """,
    "q_latest_per_key": """
        WITH r AS (
          SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        SELECT user_id, event_id AS last_event_id,
               event_type AS last_type, ms AS last_ms
        FROM r WHERE rn = 1
    """,
    "q_moore_lewis": f"""
        WITH docs AS (
          SELECT doc_id, source, {_TOKENS} AS toks FROM documents
          WHERE trim(text) <> ''),
        tfa AS (
          SELECT doc_id, source, token, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, source, unnest(toks) AS token FROM docs)
          GROUP BY 1, 2, 3),
        cg AS (SELECT token, CAST(sum(tf) AS BIGINT) AS c_gen
               FROM tfa GROUP BY 1),
        ctg AS (SELECT token, CAST(sum(tf) AS BIGINT) AS c_tgt
                FROM tfa WHERE source = 'src7' GROUP BY 1),
        sc AS (SELECT CAST(sum(tf) AS BIGINT) AS t_gen,
                      CAST(count(DISTINCT token) AS BIGINT) AS v,
                      CAST(sum(CASE WHEN source = 'src7' THEN tf
                               ELSE 0 END) AS BIGINT) AS t_tgt
               FROM tfa),
        j AS (
          SELECT t.doc_id, t.source, t.tf,
                 CAST(floor(ln((COALESCE(g.c_tgt, 0) + 1.0)
                               / (sc.t_tgt + CAST(sc.v AS DOUBLE)))
                            * 1000000 + 0.5) AS BIGINT)
                 - CAST(floor(ln((c.c_gen + 1.0)
                                 / (sc.t_gen + CAST(sc.v AS DOUBLE)))
                              * 1000000 + 0.5) AS BIGINT) AS diff
          FROM tfa t
          JOIN cg c USING (token)
          LEFT JOIN ctg g USING (token)
          CROSS JOIN sc)
        SELECT doc_id, source,
               CAST(sum(tf) AS BIGINT) AS n_tokens,
               {pround_sql(
                   'CAST(sum(tf * diff) AS DOUBLE) / 1e6'
                   ' / CAST(sum(tf) AS DOUBLE)', 4)} AS ml_score,
               sum(tf * diff) > 0 AS selected
        FROM j GROUP BY 1, 2
    """,
    "q_unigram_logprob": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
          WHERE trim(text) <> ''),
        tfa AS (
          SELECT doc_id, token, count(*) AS tf
          FROM (SELECT doc_id, unnest(toks) AS token FROM docs)
          GROUP BY 1, 2),
        ct AS (SELECT token, sum(tf) AS c FROM tfa GROUP BY 1),
        tot AS (SELECT sum(tf) AS t FROM tfa)
        SELECT doc_id,
               CAST(sum(tf) AS BIGINT) AS n_tokens,
               {pround_sql(
                   'CAST(sum(tf * CAST(floor(ln(CAST(c AS DOUBLE) '
                   '/ CAST(t AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)) '
                   'AS DOUBLE) / 1000000.0 / sum(tf)', 4)} AS avg_logprob
        FROM tfa JOIN ct USING (token) CROSS JOIN tot
        GROUP BY doc_id
    """,
    "q_bigram_logprob": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
          WHERE trim(text) <> ''),
        big AS (
          SELECT doc_id, z[1] AS w1, z[2] AS w2
          FROM (SELECT doc_id,
                       unnest(list_zip(toks[1:len(toks) - 1],
                                       toks[2:len(toks)])) AS z
                FROM docs WHERE len(toks) >= 2)),
        tfa AS (
          SELECT doc_id, w1, w2, count(*) AS tf FROM big GROUP BY 1, 2, 3),
        cb AS (SELECT w1, w2, sum(tf) AS c_big FROM tfa GROUP BY 1, 2),
        cw AS (SELECT w1, sum(tf) AS c_w1 FROM tfa GROUP BY 1),
        v AS (SELECT count(DISTINCT t) AS V
              FROM (SELECT unnest(toks) AS t FROM docs))
        SELECT doc_id,
               CAST(sum(tf) AS BIGINT) AS n_bigrams,
               {pround_sql(
                   'CAST(sum(tf * CAST(floor(ln((c_big + 1.0) '
                   '/ (c_w1 + V)) * 1000000 + 0.5) AS BIGINT)) '
                   'AS DOUBLE) / 1000000.0 / sum(tf)', 4)} AS avg_logprob
        FROM tfa JOIN cb USING (w1, w2) JOIN cw USING (w1) CROSS JOIN v
        GROUP BY doc_id
    """,
    "q_data_expectations": """
        WITH v AS (
          SELECT 'orderkey_not_null' AS rule,
                 count(*) AS n_rows,
                 count(*) FILTER (NOT coalesce(o_orderkey IS NOT NULL, false))
                   AS n_violations
          FROM orders
          UNION ALL
          SELECT 'totalprice_positive', count(*),
                 count(*) FILTER (NOT coalesce(o_totalprice > 0, false))
          FROM orders
          UNION ALL
          SELECT 'priority_in_domain', count(*),
                 count(*) FILTER (NOT coalesce(o_orderpriority IN
                   ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'),
                   false))
          FROM orders
          UNION ALL
          SELECT 'status_in_domain', count(*),
                 count(*) FILTER (NOT coalesce(o_orderstatus IN ('O','F','P'),
                   false))
          FROM orders
          UNION ALL
          SELECT 'orderdate_in_range', count(*),
                 count(*) FILTER (NOT coalesce(
                   CAST(o_orderdate AS DATE) >= DATE '1990-01-01'
                   AND CAST(o_orderdate AS DATE) < DATE '1997-01-01', false))
          FROM orders)
        SELECT rule, CAST(n_rows AS BIGINT) AS n_rows,
               CAST(n_violations AS BIGINT) AS n_violations,
               n_violations = 0 AS pass
        FROM v
    """,
    "q_synthetic_events": """
        -- splitmix64 (Vigna's public-domain finalizer) re-derived in pure
        -- SQL: UHUGEINT keeps the 64x64 products exact, % 2^64 wraps them,
        -- xor/shift run on UBIGINT — bit-identical to the numpy generator
        WITH m1 AS (
          SELECT i,
                 xor(((i::UHUGEINT + 11400714819323198485::UHUGEINT)
                      % 18446744073709551616::UHUGEINT)::UBIGINT,
                     (((i::UHUGEINT + 11400714819323198485::UHUGEINT)
                      % 18446744073709551616::UHUGEINT)::UBIGINT >> 30)) AS z1
          FROM range(0, 2000) t(i)),
        m2 AS (
          SELECT i, xor(((z1::UHUGEINT * 13787848793156543929::UHUGEINT)
                         % 18446744073709551616::UHUGEINT)::UBIGINT,
                        (((z1::UHUGEINT * 13787848793156543929::UHUGEINT)
                         % 18446744073709551616::UHUGEINT)::UBIGINT >> 27))
                 AS z2
          FROM m1),
        h AS (
          SELECT i, xor(((z2::UHUGEINT * 10723151780598845931::UHUGEINT)
                         % 18446744073709551616::UHUGEINT)::UBIGINT,
                        (((z2::UHUGEINT * 10723151780598845931::UHUGEINT)
                         % 18446744073709551616::UHUGEINT)::UBIGINT >> 31))
                 AS h
          FROM m2),
        -- second mix round: h2 = mix(h)
        n1 AS (
          SELECT i, h,
                 xor(((h::UHUGEINT + 11400714819323198485::UHUGEINT)
                      % 18446744073709551616::UHUGEINT)::UBIGINT,
                     (((h::UHUGEINT + 11400714819323198485::UHUGEINT)
                      % 18446744073709551616::UHUGEINT)::UBIGINT >> 30)) AS y1
          FROM h),
        n2 AS (
          SELECT i, h, xor(((y1::UHUGEINT * 13787848793156543929::UHUGEINT)
                            % 18446744073709551616::UHUGEINT)::UBIGINT,
                           (((y1::UHUGEINT * 13787848793156543929::UHUGEINT)
                            % 18446744073709551616::UHUGEINT)::UBIGINT >> 27))
                 AS y2
          FROM n1),
        h2 AS (
          SELECT i, h,
                 xor(((y2::UHUGEINT * 10723151780598845931::UHUGEINT)
                      % 18446744073709551616::UHUGEINT)::UBIGINT,
                     (((y2::UHUGEINT * 10723151780598845931::UHUGEINT)
                      % 18446744073709551616::UHUGEINT)::UBIGINT >> 31))
                 AS h2
          FROM n2)
        SELECT CAST(i AS BIGINT) AS event_id,
               CAST((1704067200 + i) * 1000000
                    + CAST(h % 1000000::UBIGINT AS BIGINT) AS BIGINT) AS ts_us,
               CAST(h % 100::UBIGINT AS BIGINT) AS user_id,
               ['view','click','cart','purchase'][
                   CAST(h2 % 4::UBIGINT AS INT) + 1] AS event_type,
               CAST((h2 >> 8) % 1000000::UBIGINT AS DOUBLE) / 100.0 AS value
        FROM h2
    """,
    "q_stream_merge": """
        -- batch arg-max twin of the streaming keep-latest merge sink:
        -- commutativity over micro-batch boundaries makes the published
        -- snapshot equal this single-pass latest-event-per-user
        WITH r AS (
          SELECT user_id, event_id, event_type, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        SELECT user_id, ts_epoch, event_id, event_type, value
        FROM r WHERE rn = 1
    """,
    "q_hierarchy_paths": """
        WITH RECURSIVE nodes AS (
          SELECT p_partkey AS node FROM part WHERE p_partkey <= 2000),
        edges AS (
          SELECT node,
                 node // (2 + (CAST(strpos('0123456789abcdef',
                        substr(md5(CAST(node AS VARCHAR)), 1, 1)) AS BIGINT)
                        - 1) % 7) AS parent
          FROM nodes),
        walk AS (
          SELECT node, node AS cursor, 0 AS depth FROM nodes
          UNION ALL
          SELECT w.node, e.parent, w.depth + 1
          FROM walk w JOIN edges e ON e.node = w.cursor
          WHERE e.parent > 0),
        final AS (
          SELECT node, cursor AS root, depth,
                 row_number() OVER (PARTITION BY node ORDER BY depth DESC)
                   AS rn
          FROM walk)
        SELECT node, root, CAST(depth AS INT) AS depth
        FROM final WHERE rn = 1
    """,
    "q_bitmap_presence": """
        WITH h AS (
          SELECT event_type,
                 CAST(floor((CAST(floor(epoch(ts)) AS BIGINT) % 86400)
                            / 3600.0) AS INT) AS h
          FROM events)
        SELECT event_type,
               CAST(bit_or(CAST(1 AS BIGINT) << h) AS BIGINT) AS hour_mask,
               CAST(bit_count(bit_or(CAST(1 AS BIGINT) << h)) AS INT)
                 AS n_active_hours
        FROM h GROUP BY 1
    """,
    "q_ttest_welch": f"""
        WITH j AS (
          SELECT c.c_mktsegment AS segment,
                 o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS urgent,
                 CAST(o.o_totalprice AS DECIMAL(18,2)) AS d
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        s AS (
          SELECT segment,
                 CAST(sum(CASE WHEN urgent THEN 1 ELSE 0 END) AS DOUBLE)
                   AS na,
                 CAST(sum(CASE WHEN urgent THEN d END) AS DOUBLE) AS sxa,
                 CAST(sum(CASE WHEN urgent THEN d * d END) AS DOUBLE)
                   AS sxxa,
                 CAST(sum(CASE WHEN NOT urgent THEN 1 ELSE 0 END) AS DOUBLE)
                   AS nb,
                 CAST(sum(CASE WHEN NOT urgent THEN d END) AS DOUBLE) AS sxb,
                 CAST(sum(CASE WHEN NOT urgent THEN d * d END) AS DOUBLE)
                   AS sxxb
          FROM j GROUP BY 1),
        m AS (
          SELECT segment, na, nb,
                 sxa / na AS mean_a, sxb / nb AS mean_b,
                 ((sxxa - sxa * sxa / na) / (na - 1.0)) / na AS sea,
                 ((sxxb - sxb * sxb / nb) / (nb - 1.0)) / nb AS seb
          FROM s)
        SELECT segment,
               CAST(na AS BIGINT) AS n_urgent,
               CAST(nb AS BIGINT) AS n_routine,
               {pround_sql('mean_a', 6)} AS mean_urgent,
               {pround_sql('mean_b', 6)} AS mean_routine,
               {pround_sql(
                   '(mean_a - mean_b) / sqrt(sea + seb)', 6)} AS t_stat,
               {pround_sql(
                   '((sea + seb) * (sea + seb))'
                   ' / (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0))',
                   6)} AS welch_df
        FROM m
    """,
    "q_ts_strength": f"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                               AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        t AS (
          SELECT day, cents,
                 CAST(sum(cents) OVER w AS BIGINT) AS trend_x7,
                 count(*) OVER w AS n_win,
                 CAST(datediff('day', DATE '1970-01-01', day) % 7
                      AS INT) AS dow
          FROM daily
          WINDOW w AS (ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        t2 AS (
          SELECT *, CAST(7 * cents - trend_x7 AS BIGINT) AS detr_x7
          FROM t WHERE n_win = 7),
        dm AS (
          SELECT dow, CAST(sum(detr_x7) AS BIGINT) AS s_dow,
                 CAST(count(*) AS BIGINT) AS n_dow
          FROM t2 GROUP BY 1),
        c AS (
          SELECT CAST(trend_x7 AS DOUBLE) / 700.0 AS t_,
                 CAST(s_dow AS DOUBLE)
                   / (700.0 * CAST(n_dow AS DOUBLE)) AS s_,
                 CAST(detr_x7 AS DOUBLE) / 700.0
                 - CAST(s_dow AS DOUBLE)
                   / (700.0 * CAST(n_dow AS DOUBLE)) AS r_
          FROM t2 JOIN dm USING (dow)),
        sums AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(floor(r_ * 1e6) AS HUGEINT)) AS HUGEINT)
                   AS sr6,
                 CAST(SUM(CAST(floor(r_ * r_) AS HUGEINT))
                      AS HUGEINT) AS srr0,
                 CAST(SUM(CAST(floor((t_ + r_) * 1e6) AS HUGEINT))
                      AS HUGEINT) AS str6,
                 CAST(SUM(CAST(floor((t_ + r_) * (t_ + r_))
                               AS HUGEINT)) AS HUGEINT) AS strr0,
                 CAST(SUM(CAST(floor((s_ + r_) * 1e6) AS HUGEINT))
                      AS HUGEINT) AS ssr6,
                 CAST(SUM(CAST(floor((s_ + r_) * (s_ + r_))
                               AS HUGEINT)) AS HUGEINT) AS ssrr0
          FROM c)
        SELECT n AS n_days,
               {pround_sql(
                   'greatest(0.0, 1.0 -'
                   ' (CAST(srr0 AS DOUBLE) / CAST(n AS DOUBLE)'
                   '  - (CAST(sr6 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE))'
                   '    * (CAST(sr6 AS DOUBLE) / 1e6'
                   '       / CAST(n AS DOUBLE)))'
                   ' / (CAST(strr0 AS DOUBLE) / CAST(n AS DOUBLE)'
                   '  - (CAST(str6 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE))'
                   '    * (CAST(str6 AS DOUBLE) / 1e6'
                   '       / CAST(n AS DOUBLE))))', 6
               )} AS trend_strength,
               {pround_sql(
                   'greatest(0.0, 1.0 -'
                   ' (CAST(srr0 AS DOUBLE) / CAST(n AS DOUBLE)'
                   '  - (CAST(sr6 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE))'
                   '    * (CAST(sr6 AS DOUBLE) / 1e6'
                   '       / CAST(n AS DOUBLE)))'
                   ' / (CAST(ssrr0 AS DOUBLE) / CAST(n AS DOUBLE)'
                   '  - (CAST(ssr6 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE))'
                   '    * (CAST(ssr6 AS DOUBLE) / 1e6'
                   '       / CAST(n AS DOUBLE))))', 6
               )} AS seasonal_strength
        FROM sums
    """,
    "q_seasonal_anomalies": f"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                               AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        t AS (
          SELECT day, cents,
                 CAST(sum(cents) OVER w AS BIGINT) AS trend_x7,
                 count(*) OVER w AS n_win,
                 CAST(datediff('day', DATE '1970-01-01', day) % 7
                      AS INT) AS dow
          FROM daily
          WINDOW w AS (ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        t2 AS (
          SELECT *, CAST(7 * cents - trend_x7 AS BIGINT) AS detr_x7
          FROM t WHERE n_win = 7),
        dm AS (
          SELECT dow, CAST(sum(detr_x7) AS BIGINT) AS s_dow,
                 CAST(count(*) AS BIGINT) AS n_dow
          FROM t2 GROUP BY 1),
        scored AS (
          SELECT day, CAST(cents AS DOUBLE) / 100.0 AS revenue,
                 CAST(n_dow * detr_x7 - s_dow AS DOUBLE)
                 / (7.0 * CAST(n_dow AS DOUBLE) * 100.0) AS r
          FROM t2 JOIN dm USING (dow)),
        ranked AS (
          SELECT *, abs(r) AS ar,
                 row_number() OVER (ORDER BY abs(r) ASC, day ASC) AS rn,
                 count(*) OVER () AS n
          FROM scored),
        mad AS (
          SELECT ar AS m FROM ranked WHERE rn = (n + 1) // 2)
        SELECT day, revenue,
               {pround_sql('r', 4)} AS residual,
               {pround_sql('m', 4)} AS mad,
               {pround_sql('abs(r) / m', 4)} AS score,
               abs(r) > 3.0 * m AS is_anomalous
        FROM scored, mad
        ORDER BY abs(r) DESC, day ASC LIMIT 10
    """,
    "q_seasonal_decompose": f"""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                               AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        t AS (
          SELECT day, cents,
                 CAST(sum(cents) OVER w AS BIGINT) AS trend_x7,
                 count(*) OVER w AS n_win,
                 CAST(datediff('day', DATE '1970-01-01', day) % 7
                      AS INT) AS dow
          FROM daily
          WINDOW w AS (ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        t2 AS (
          SELECT *, CAST(7 * cents - trend_x7 AS BIGINT) AS detr_x7
          FROM t WHERE n_win = 7),
        dm AS (
          SELECT dow, CAST(sum(detr_x7) AS BIGINT) AS s_dow,
                 CAST(count(*) AS BIGINT) AS n_dow
          FROM t2 GROUP BY 1)
        SELECT day, dow,
               CAST(cents AS DOUBLE) / 100.0 AS revenue,
               {pround_sql(
                   'CAST(trend_x7 AS DOUBLE) / 7.0 / 100.0', 4
               )} AS trend,
               {pround_sql(
                   'CAST(s_dow AS DOUBLE)'
                   ' / (7.0 * CAST(n_dow AS DOUBLE)) / 100.0', 4
               )} AS seasonal,
               {pround_sql(
                   '(CAST(detr_x7 AS DOUBLE) / 7.0'
                   ' - CAST(s_dow AS DOUBLE)'
                   '   / (7.0 * CAST(n_dow AS DOUBLE))) / 100.0', 4
               )} AS residual
        FROM t2 JOIN dm USING (dow)
    """,
    "q_srm_check": f"""
        WITH u AS (SELECT DISTINCT user_id FROM events),
        arms AS (
          SELECT CASE WHEN {_hex_bigint(
              "md5(CAST(user_id AS VARCHAR))", 1, 4)} % 2 = 0
                 THEN 'A' ELSE 'B' END AS arm
          FROM u),
        w AS (
          SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_b
          FROM arms)
        SELECT n_a, n_b,
               {pround_sql(
                   'CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)'
                   ' / CAST(n_a + n_b AS DOUBLE)', 6)} AS chi2,
               100 * (n_a - n_b) * (n_a - n_b) > 384 * (n_a + n_b)
                 AS srm_alarm
        FROM w
    """,
    "q_abtest_zscore": f"""
        WITH arms AS (
          SELECT CASE WHEN ({_BUCKET.replace('doc_id', 'user_id')}) % 2 = 0
                      THEN 'A' ELSE 'B' END AS arm,
                 value
          FROM events WHERE event_type = 'purchase'),
        s AS (
          SELECT arm, CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(value AS DECIMAL(18,2))
                          * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx
          FROM arms GROUP BY 1),
        m AS (
          SELECT arm, n, sx / n AS mean,
                 (sxx - sx * sx / n) / (n - 1.0) AS var
          FROM s),
        a AS (SELECT n AS n_a, mean AS mean_a, var AS var_a
              FROM m WHERE arm = 'A'),
        b AS (SELECT n AS n_b, mean AS mean_b, var AS var_b
              FROM m WHERE arm = 'B')
        SELECT n_a, n_b,
               {pround_sql('mean_a', 6)} AS mean_a,
               {pround_sql('mean_b', 6)} AS mean_b,
               {pround_sql(
                   '(mean_a - mean_b)'
                   ' / sqrt(var_a / n_a + var_b / n_b)', 6)} AS z_stat
        FROM a CROSS JOIN b
    """,
    "q_session_paths": """
        WITH g AS (
          SELECT user_id, event_id, ts, event_type,
                 CASE WHEN lag(epoch_ms(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                      IS NULL
                      OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000
                      THEN 1 ELSE 0 END AS is_new
          FROM events),
        sess AS (
          SELECT user_id, event_id, ts, event_type,
                 SUM(is_new) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS session_seq
          FROM g),
        paths AS (
          SELECT user_id, session_seq,
                 array_to_string(
                   (list(event_type ORDER BY ts, event_id))[1:8],
                   '>') AS path
          FROM sess GROUP BY user_id, session_seq)
        SELECT path,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path ASC
        LIMIT 10
    """,
    "q_markov_transitions": f"""
        WITH p AS (
          SELECT lag(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
                 event_type AS to_type
          FROM events),
        c AS (
          SELECT from_type, to_type, count(*) AS n_trans
          FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n_trans,
               {pround_sql(
                   'CAST(n_trans AS DOUBLE) / CAST(sum(n_trans) OVER '
                   '(PARTITION BY from_type) AS DOUBLE)', 6)} AS p_trans
        FROM c
    """,
    "q_ngram_novelty": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks,
                 CASE WHEN ({_BUCKET}) < 80 THEN 'train'
                      ELSE 'heldout' END AS split
          FROM documents
          WHERE trim(text) <> '' AND len({_TOKENS}) >= 2),
        bg AS (
          SELECT doc_id, split,
                 unnest(list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i+1]))
                   AS bigram
          FROM docs),
        train_set AS (
          SELECT DISTINCT bigram FROM bg WHERE split = 'train'),
        held AS (SELECT doc_id, bigram FROM bg WHERE split = 'heldout'),
        novel AS (
          SELECT doc_id, count(*) AS n_novel FROM held h
          WHERE NOT EXISTS (SELECT 1 FROM train_set t
                            WHERE t.bigram = h.bigram)
          GROUP BY doc_id),
        tot AS (SELECT doc_id, count(*) AS n_bigrams FROM held GROUP BY 1)
        SELECT t.doc_id, t.n_bigrams,
               coalesce(n.n_novel, 0) AS n_novel,
               {pround_sql(
                   'CAST(coalesce(n.n_novel, 0) AS DOUBLE)'
                   ' / CAST(t.n_bigrams AS DOUBLE)', 6)} AS novelty
        FROM tot t LEFT JOIN novel n ON t.doc_id = n.doc_id
    """,
    "q_dedup_keep_best": f"""
        WITH scored AS (
          SELECT doc_id, sha256(text) AS hash, {_QUALITY_EXPR} AS q
          FROM documents),
        r AS (
          SELECT doc_id, hash, row_number() OVER
            (PARTITION BY hash ORDER BY q DESC, doc_id ASC) AS rn
          FROM scored)
        SELECT doc_id, hash FROM r WHERE rn = 1
    """,
    "q_langid_confusion": f"""
        SELECT lang AS lang_true,
               CASE WHEN en_hits >= pt_hits AND en_hits >= es_hits THEN 'en'
                    WHEN pt_hits >= es_hits THEN 'pt'
                    ELSE 'es' END AS lang_pred,
               count(*) AS n_docs
        FROM (
          SELECT lang,
                 {_hits(_STOP_EN)} AS en_hits,
                 {_hits(_STOP_PT)} AS pt_hits,
                 {_hits(_STOP_ES)} AS es_hits
          FROM documents
        ) t GROUP BY 1, 2
    """,
    "q_contamination_check": f"""
        WITH hashed AS (
          SELECT doc_id, sha256(text) AS hash,
                 CASE WHEN {_BUCKET} < 80 THEN 'train'
                      ELSE 'heldout' END AS split
          FROM documents),
        held AS (SELECT * FROM hashed WHERE split = 'heldout'),
        tr AS (SELECT hash FROM hashed WHERE split = 'train')
        SELECT (SELECT count(*) FROM held) AS n_heldout,
               (SELECT count(*) FROM held h
                WHERE EXISTS (SELECT 1 FROM tr WHERE tr.hash = h.hash))
                 AS n_contaminated
    """,
    "q_ldiversity_audit": """
        SELECT c_nationkey AS qi_nation,
               CAST(floor(c_acctbal / 1000.0) * 1000 AS INT) AS qi_bucket,
               count(*) AS class_size,
               count(DISTINCT c_mktsegment) AS n_sensitive,
               CASE WHEN count(DISTINCT c_mktsegment) >= 3 THEN 1 ELSE 0 END
                 AS meets_l
        FROM customer GROUP BY 1, 2
    """,
    # t-closeness: exact-integer TVD numerator (order-free), one final
    # double division in the same operation order as Spark.
    "q_tcloseness_audit": f"""
        WITH cu AS (
          SELECT c_nationkey AS qi_nation,
                 CAST(floor(c_acctbal / 1000.0) * 1000 AS INT) AS qi_bucket,
                 c_mktsegment
          FROM customer),
        tot AS (SELECT count(*) AS t_rows FROM cu),
        gseg AS (SELECT c_mktsegment, count(*) AS g FROM cu GROUP BY 1),
        cls AS (SELECT qi_nation, qi_bucket, count(*) AS cs
                FROM cu GROUP BY 1, 2),
        present AS (SELECT qi_nation, qi_bucket, c_mktsegment,
                           count(*) AS cnt
                    FROM cu GROUP BY 1, 2, 3),
        parts AS (
          SELECT p.qi_nation, p.qi_bucket, c.cs, tot.t_rows,
                 sum(abs(p.cnt * tot.t_rows - g.g * c.cs)) AS num_present,
                 sum(g.g) AS g_present
          FROM present p
          JOIN gseg g USING (c_mktsegment)
          JOIN cls c USING (qi_nation, qi_bucket)
          CROSS JOIN tot
          GROUP BY 1, 2, 3, 4)
        SELECT qi_nation, qi_bucket, cs AS class_size,
               {pround_sql('CAST(num_present + (t_rows - g_present) * cs AS DOUBLE) / (2.0 * cs * t_rows)', 6)} AS tvd,
               CASE WHEN 5 * (num_present + (t_rows - g_present) * cs)
                         > 2 * cs * t_rows
                    THEN 1 ELSE 0 END AS breaches_t
        FROM parts
    """,
    # applyInPandas UDAF twin: plain SQL over the same exact-cents ints
    "q_pandas_udaf": """
        SELECT c_nationkey,
               count(*) AS n_customers,
               CAST(max(floor(c_acctbal * 100 + 0.5))
                    - min(floor(c_acctbal * 100 + 0.5)) AS BIGINT)
                 AS spread_cents
        FROM customer GROUP BY c_nationkey
    """,
    "q_kanonymity_audit": """
        WITH klass AS (
          SELECT c_nationkey AS qi_nation,
                 CAST(floor(c_acctbal / 1000.0) * 1000 AS INT) AS qi_bucket,
                 count(*) AS class_size
          FROM customer GROUP BY 1, 2)
        SELECT count(*) AS n_classes,
               CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_small_classes,
               CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
                    AS BIGINT) AS n_exposed
        FROM klass
    """,
    "q_entity_cluster": """
        WITH RECURSIVE fpairs AS (
          SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
          FROM part a JOIN part b
            ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
          WHERE levenshtein(a.p_name, b.p_name) <= 5),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM fpairs
          UNION SELECT id_b, id_a FROM fpairs),
        cc AS (
          SELECT DISTINCT src AS node, src AS comp FROM edges
          UNION
          SELECT e.dst AS node, cc.comp AS comp
          FROM cc JOIN edges e ON e.src = cc.node
          WHERE cc.comp < e.dst),
        lab AS (SELECT node, min(comp) AS component FROM cc GROUP BY node),
        ent AS (
          SELECT component AS entity_id, count(*) AS n_members
          FROM lab GROUP BY 1)
        SELECT e.entity_id, e.n_members, p.p_name AS rep_name
        FROM ent e JOIN part p ON p.p_partkey = e.entity_id
    """,
    "q_percent_of_total": f"""
        WITH rev AS (
          SELECT r_name, n_name,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2)
        SELECT r_name, n_name, CAST(rev_d AS DOUBLE) AS revenue,
               {pround_sql(
                   'CAST(rev_d AS DOUBLE) / CAST(sum(rev_d) OVER '
                   '(PARTITION BY r_name) AS DOUBLE)', 6)} AS region_share
        FROM rev
    """,
    "q_yoy_growth": f"""
        WITH rev AS (
          SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        lagd AS (
          SELECT n_name, yr, rev_d,
                 lag(rev_d) OVER (PARTITION BY n_name ORDER BY yr) AS prev_d
          FROM rev)
        SELECT n_name, yr, CAST(rev_d AS DOUBLE) AS revenue,
               {pround_sql(
                   '(CAST(rev_d AS DOUBLE) - CAST(prev_d AS DOUBLE))'
                   ' / CAST(prev_d AS DOUBLE)', 6)} AS yoy_growth
        FROM lagd WHERE prev_d IS NOT NULL
    """,
    "q_seasonal_profile": f"""
        SELECT CAST((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 3) % 7
                    AS INT) AS dow,
               CAST(floor((CAST(floor(epoch(ts)) AS BIGINT) % 86400)
                          / 3600.0) AS INT) AS hour,
               count(*) AS n_events,
               {dsum_sql('value')} AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_interarrival_stats": f"""
        WITH g AS (
          SELECT event_type,
                 epoch_ms(ts) - lag(epoch_ms(ts)) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id) AS gap_ms
          FROM events)
        SELECT event_type, count(*) AS n_gaps,
               {pround_sql('CAST(sum(gap_ms) AS DOUBLE) / count(*)', 6)}
                 AS mean_gap_ms,
               {pround_sql('quantile_cont(gap_ms, 0.5)', 6)} AS p50_gap_ms
        FROM g WHERE gap_ms IS NOT NULL GROUP BY 1
    """,
    "q_iqr_outliers": """
        WITH qs AS (
          SELECT event_type,
                 quantile_cont(value, 0.25) AS q1,
                 quantile_cont(value, 0.75) AS q3
          FROM events GROUP BY 1)
        SELECT event_id, e.event_type, value
        FROM events e JOIN qs ON e.event_type = qs.event_type
        WHERE value < q1 - 1.5 * (q3 - q1)
           OR value > q3 + 1.5 * (q3 - q1)
    """,
    "q_basket_pairs": f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        no AS (SELECT count(*) AS n_orders FROM orders),
        pairs AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS c_ab
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 3),
        sup AS (SELECT l_partkey, count(*) AS c_x FROM li GROUP BY 1)
        SELECT p.p1, p.p2, p.c_ab,
          {pround_sql(
              '(CAST(n.n_orders AS DOUBLE) * p.c_ab) / (sa.c_x * sb.c_x)',
              6)} AS lift
        FROM pairs p
        JOIN sup sa ON sa.l_partkey = p.p1
        JOIN sup sb ON sb.l_partkey = p.p2
        CROSS JOIN no n
    """,
    "q_catalog_coverage": f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        counts AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                 CAST(count(*) AS BIGINT) AS c
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
        sym AS (
          SELECT p1 AS a, p2 AS b, c FROM counts
          UNION ALL SELECT p2, p1, c FROM counts),
        recs AS (
          SELECT a, b FROM (
            SELECT a, b,
                   row_number() OVER (PARTITION BY a
                     ORDER BY c DESC, b ASC) AS rn
            FROM sym) WHERE rn <= 3),
        ni AS (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT)
                 AS n_items FROM li),
        exposure AS (
          SELECT b, CAST(count(*) AS BIGINT) AS x FROM recs GROUP BY 1),
        nr AS (SELECT CAST(count(*) AS BIGINT) AS n_recommended
               FROM exposure),
        ranked AS (
          SELECT x, CAST(row_number() OVER (ORDER BY x ASC, b ASC)
                         AS BIGINT) AS i
          FROM exposure),
        g AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(x) AS DOUBLE) AS sx,
                 CAST(sum(i * x) AS DOUBLE) AS six
          FROM ranked)
        SELECT ni.n_items, nr.n_recommended,
               {pround_sql(
                   'CAST(nr.n_recommended AS DOUBLE)'
                   ' / CAST(ni.n_items AS DOUBLE)', 6)} AS coverage_at_3,
               {pround_sql(
                   '2.0 * g.six / (g.n * g.sx) - (g.n + 1.0) / g.n', 6
               )} AS exposure_gini
        FROM g, ni, nr
    """,
    "q_degree_distribution": """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        sym AS (
          SELECT p1 AS node, p2 AS nbr FROM e
          UNION ALL SELECT p2, p1 FROM e),
        d AS (SELECT node, count(DISTINCT nbr) AS degree FROM sym GROUP BY 1)
        SELECT degree, count(*) AS n_nodes FROM d GROUP BY 1
    """,
    "q_graph_assortativity": f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (
          SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        sym AS (
          SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e),
        d AS (SELECT node, CAST(count(*) AS BIGINT) AS d
              FROM sym GROUP BY 1),
        ed AS (
          SELECT da.d AS d1, db.d AS d2
          FROM e JOIN d da ON e.p1 = da.node
                 JOIN d db ON e.p2 = db.node),
        sums AS (
          SELECT CAST(count(*) AS BIGINT) AS m,
                 CAST(SUM(CAST(d1 + d2 AS HUGEINT)) AS HUGEINT) AS s1,
                 CAST(SUM(CAST(d1 AS HUGEINT) * d1
                          + CAST(d2 AS HUGEINT) * d2) AS HUGEINT) AS s2,
                 CAST(SUM(CAST(d1 AS HUGEINT) * d2) AS HUGEINT) AS s3
          FROM ed)
        SELECT m,
               CAST(s1 AS BIGINT) AS s_sum,
               CAST(s3 AS BIGINT) AS s_prod,
               CASE WHEN 2 * CAST(m AS HUGEINT) * s2 - s1 * s1 != 0
                    THEN {pround_sql(
                        'CAST(4 * CAST(m AS HUGEINT) * s3 - s1 * s1'
                        ' AS DOUBLE)'
                        ' / CAST(2 * CAST(m AS HUGEINT) * s2 - s1 * s1'
                        ' AS DOUBLE)', 6
                    )} END AS assortativity
        FROM sums
    """,
    "q_chunk_dup_stats": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks, len({_TOKENS}) AS n
          FROM documents WHERE trim(text) <> ''),
        st AS (
          SELECT doc_id, toks, n, unnest(range(1, n + 1, 40)) AS start
          FROM docs),
        ch AS (
          SELECT substr(sha256(array_to_string(
                   toks[CAST(start AS INT):CAST(start + 49 AS INT)], ' ')),
                   1, 16) AS chunk_hash
          FROM st)
        SELECT count(*) AS n_chunks,
               count(DISTINCT chunk_hash) AS n_unique,
               {pround_sql(
                   '(count(*) - count(DISTINCT chunk_hash))'
                   ' / CAST(count(*) AS DOUBLE)', 6)} AS dup_rate
        FROM ch
    """,
    "q_chunk_documents": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks, len({_TOKENS}) AS n
          FROM documents WHERE trim(text) <> ''),
        st AS (
          SELECT doc_id, toks, n, unnest(range(1, n + 1, 40)) AS start
          FROM docs)
        SELECT doc_id,
               CAST((start - 1) // 40 AS INT) AS chunk_id,
               CAST(least(n - start + 1, 50) AS INT) AS chunk_tokens,
               substr(sha256(array_to_string(
                 toks[CAST(start AS INT):CAST(start + 49 AS INT)], ' ')),
                 1, 16) AS chunk_hash
        FROM st
    """,
    "q_pack_sequences": f"""
        WITH d AS (
          SELECT doc_id, {_N_TOKENS} AS n_tok FROM documents),
        p AS (
          SELECT doc_id, n_tok,
                 CAST(floor(CAST(sum(n_tok) OVER
                        (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok
                      AS DOUBLE) / 512) AS BIGINT) AS bin_id
          FROM d)
        SELECT bin_id, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS bin_tokens
        FROM p GROUP BY 1
    """,
    "q_mad": f"""
        WITH med AS (
          SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
          FROM lineitem GROUP BY 1),
        d AS (
          SELECT l.l_returnflag, m.med,
                 abs(l.l_quantity - m.med) AS dev
          FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag)
        SELECT l_returnflag,
               {pround_sql('max(med)', 6)} AS median_qty,
               {pround_sql('quantile_cont(dev, 0.5)', 6)} AS mad_qty
        FROM d GROUP BY 1
    """,
    "q_regression_by_group": f"""
        WITH pts AS (
          SELECT event_type,
                 CAST(floor(floor(epoch(ts)) / 3600.0 * 1000 + 0.5)
                      AS BIGINT) AS xi,
                 CAST(value AS DECIMAL(18,2)) AS yi
          FROM events),
        g AS (
          SELECT event_type,
                 CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(xi) AS DOUBLE) AS sx,
                 CAST(sum(yi) AS DOUBLE) AS sy,
                 CAST(sum(CAST(xi AS DECIMAL(19,0))
                          * CAST(xi AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
                 CAST(sum(CAST(xi AS DECIMAL(19,0)) * yi) AS DOUBLE) AS sxy
          FROM pts GROUP BY 1)
        SELECT event_type,
          {pround_sql('(n * sxy - sx * sy) / (n * sxx - sx * sx)', 10)}
            AS slope,
          {pround_sql(
              '(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n',
              6)} AS intercept
        FROM g
    """,
    "q_minmax_scale": f"""
        SELECT o_orderkey,
               {pround_sql('(o_totalprice - mn) / (mx - mn)', 6)}
                 AS price_scaled
        FROM (SELECT o_orderkey, o_totalprice,
                     min(o_totalprice) OVER () AS mn,
                     max(o_totalprice) OVER () AS mx
              FROM orders) t
    """,
    "q_onehot": """
        SELECT o_orderkey,
          CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_p1,
          CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS is_p2,
          CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS is_p3,
          CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END
            AS is_p4,
          CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS is_p5
        FROM orders
    """,
    "q_bpe_pair_counts": f"""
        WITH words AS (
          SELECT word, count(*) AS freq FROM (
            SELECT unnest({_TOKENS}) AS word FROM documents
            WHERE trim(text) <> '') t
          GROUP BY word HAVING length(word) >= 2),
        pairs AS (
          SELECT freq,
                 unnest(list_transform(range(1, length(word)),
                                       i -> substr(word, i, 2))) AS pair
          FROM words)
        SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
        FROM pairs GROUP BY 1
        ORDER BY pair_count DESC, pair ASC LIMIT 50
    """,
    "q_bootstrap_ci": _bootstrap_sql(),
    "q_bootstrap_ci_by_segment": _bootstrap_by_segment_sql(),
    "q_snapshot_diff": """
        WITH v1 AS (SELECT c_custkey, c_acctbal FROM customer),
        v2 AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
                      ELSE c_acctbal END AS c_acctbal
          FROM customer WHERE c_custkey % 97 <> 0
          UNION ALL
          SELECT c_custkey + 1000000, c_acctbal
          FROM customer WHERE c_custkey % 50 = 0),
        j AS (
          SELECT v1.c_custkey AS k, v2.c_custkey AS k2,
                 v1.c_acctbal AS old_bal, v2.c_acctbal AS new_bal
          FROM v1 FULL OUTER JOIN v2 ON v1.c_custkey = v2.c_custkey)
        SELECT coalesce(k, k2) AS c_custkey,
               CASE WHEN k IS NULL THEN 'added'
                    WHEN k2 IS NULL THEN 'removed'
                    WHEN old_bal <> new_bal THEN 'changed'
                    ELSE 'unchanged' END AS change_type,
               old_bal, new_bal
        FROM j
        WHERE (CASE WHEN k IS NULL THEN 'added'
                    WHEN k2 IS NULL THEN 'removed'
                    WHEN old_bal <> new_bal THEN 'changed'
                    ELSE 'unchanged' END) <> 'unchanged'
    """,
    "q_incremental_dedup": """
        WITH batch AS (
          SELECT doc_id, sha256(text) AS hash FROM documents
          WHERE doc_id % 3 = 0),
        existing AS (
          SELECT sha256(text) AS hash FROM documents WHERE doc_id % 3 <> 0)
        SELECT doc_id, hash FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.hash = b.hash)
    """,
    "q_pareto": f"""
        WITH rev AS (
          SELECT o_custkey,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
          FROM orders GROUP BY 1),
        c AS (
          SELECT o_custkey, rev_d,
                 sum(rev_d) OVER (ORDER BY rev_d DESC, o_custkey
                                  ROWS UNBOUNDED PRECEDING) AS cum_d
          FROM rev),
        t AS (SELECT *, max(cum_d) OVER () AS total_d FROM c)
        SELECT o_custkey, CAST(rev_d AS DOUBLE) AS revenue,
               {pround_sql(
                   'CAST(cum_d AS DOUBLE) / CAST(total_d AS DOUBLE)', 6)}
                 AS cum_share
        FROM t
        WHERE CAST(cum_d AS DOUBLE) / CAST(total_d AS DOUBLE) <= 0.8
    """,
    "q_embed_normalize": f"""
        SELECT vec_id,
          {pround_sql(
              'sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), '
              'CAST(embedding AS DOUBLE[])))', 6)} AS norm,
          {pround_sql(
              'CAST(embedding[1] AS DOUBLE) / '
              'sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), '
              'CAST(embedding AS DOUBLE[])))', 6)} AS v0_unit
        FROM embeddings
    """,
    "q_embed_centroid": f"""
        WITH x AS (
          SELECT label, CAST(i - 1 AS INT) AS pos,
                 CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5)
                      AS BIGINT) AS qv
          FROM embeddings, (SELECT unnest(range(1, 65)) AS i) t)
        SELECT label, pos,
               {pround_sql(
                   'CAST(sum(qv) AS DOUBLE) / count(*) / 1000000.0', 6)}
                 AS centroid
        FROM x GROUP BY label, pos
    """,
    "q_embed_quantize": f"""
        WITH s AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS d,
                 list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                               x -> abs(x)), 'max') AS scale
          FROM embeddings)
        SELECT vec_id, {pround_sql('scale', 6)} AS scale_q,
          CAST(floor(d[1] / scale * 127.0 + 0.5) AS INT) AS q1,
          CAST(floor(d[2] / scale * 127.0 + 0.5) AS INT) AS q2,
          CAST(floor(d[3] / scale * 127.0 + 0.5) AS INT) AS q3,
          CAST(floor(d[4] / scale * 127.0 + 0.5) AS INT) AS q4
        FROM s
    """,
    "q_stratified_sample": f"""
        SELECT doc_id, lang, bucket FROM (
          SELECT doc_id, lang, {_BUCKET} AS bucket FROM documents) t
        WHERE bucket < CASE WHEN lang = 'en' THEN 10
                            WHEN lang = 'pt' THEN 30
                            WHEN lang = 'es' THEN 50
                            ELSE 20 END
    """,
    "q_cumulative_distinct": """
        WITH f AS (
          SELECT user_id,
                 min(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS day
          FROM events GROUP BY 1),
        d AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
        SELECT day, new_users,
               CAST(sum(new_users) OVER
                    (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_users
        FROM d
    """,
    "q_gap_fill_ffill": f"""
        WITH hourly AS (
          SELECT event_type,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
                 {dsum_sql('value')} AS sv
          FROM events GROUP BY 1, 2),
        b AS (
          SELECT event_type, min(hour) AS mn, max(hour) AS mx
          FROM hourly GROUP BY 1),
        grid AS (
          SELECT event_type, unnest(range(mn, mx + 1)) AS hour FROM b),
        f AS (
          SELECT g.event_type, g.hour, h.sv
          FROM grid g LEFT JOIN hourly h
            ON g.event_type = h.event_type AND g.hour = h.hour)
        SELECT event_type, hour,
               last_value(sv IGNORE NULLS) OVER
                 (PARTITION BY event_type ORDER BY hour
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS sv_filled,
               CASE WHEN sv IS NULL THEN 1 ELSE 0 END AS is_gap
        FROM f
    """,
    # Interpolation twin: same grid; prev/next non-null neighbor value
    # and hour via IGNORE NULLS windows over (hour, sv) pairs, linear
    # blend on gap rows.  Double arithmetic in the same operation order
    # as Spark: prev + (next - prev) * ((h - hp) / (hn - hp)).
    "q_gap_fill_interpolate": f"""
        WITH hourly AS (
          SELECT event_type,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
                 {dsum_sql('value')} AS sv
          FROM events GROUP BY 1, 2),
        b AS (
          SELECT event_type, min(hour) AS mn, max(hour) AS mx
          FROM hourly GROUP BY 1),
        grid AS (
          SELECT event_type, unnest(range(mn, mx + 1)) AS hour FROM b),
        f AS (
          SELECT g.event_type, g.hour, h.sv
          FROM grid g LEFT JOIN hourly h
            ON g.event_type = h.event_type AND g.hour = h.hour),
        nb AS (
          SELECT event_type, hour, sv,
                 last_value(CASE WHEN sv IS NOT NULL THEN hour END IGNORE NULLS)
                   OVER wb AS hp,
                 last_value(CASE WHEN sv IS NOT NULL THEN sv END IGNORE NULLS)
                   OVER wb AS vp,
                 first_value(CASE WHEN sv IS NOT NULL THEN hour END IGNORE NULLS)
                   OVER wf AS hn,
                 first_value(CASE WHEN sv IS NOT NULL THEN sv END IGNORE NULLS)
                   OVER wf AS vn
          FROM f
          WINDOW wb AS (PARTITION BY event_type ORDER BY hour
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wf AS (PARTITION BY event_type ORDER BY hour
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT event_type, hour,
               {pround_sql("CASE WHEN sv IS NOT NULL THEN sv ELSE vp + (vn - vp) * (CAST(hour - hp AS DOUBLE) / CAST(hn - hp AS DOUBLE)) END", 6)} AS sv_interp,
               CASE WHEN sv IS NULL THEN 1 ELSE 0 END AS is_gap
        FROM nb
    """,
    "q_mask_pii": """
        SELECT c_custkey,
               regexp_replace(c_name, '[0-9]', '*', 'g') AS masked_name,
               substr(sha256(c_name), 1, 16) AS pseudonym,
               CAST(floor(c_acctbal / 1000.0) * 1000 AS INT) AS acctbal_bucket
        FROM customer
    """,
    "q_char_ngrams": """
        WITH docs AS (
          SELECT lower(text) AS t FROM documents
          WHERE length(lower(text)) >= 3),
        tri AS (
          SELECT unnest(list_transform(range(1, length(t) - 1),
                                       i -> substr(t, i, 3))) AS trigram
          FROM docs)
        SELECT trigram, count(*) AS freq FROM tri GROUP BY 1
        ORDER BY freq DESC, trigram ASC LIMIT 20
    """,
}

# --- Deterministic sketches & layout operators (round 2) -------------------
# Every sketch mirrors the Spark build verbatim: same md5-derived integer
# hashes (_hex_bigint == Spark conv(substring(md5(..)))), same integer
# arithmetic, identical float-op ORDER in the final scalar estimates.

_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)
# DuckDB parses bare decimal-point literals as DECIMAL (which overflows in
# the multiply); explicit DOUBLE casts keep the arithmetic in IEEE floats
# with the same operand order as the Spark expression.
_HLL_EST = (
    f"CAST({_HLL_ALPHA!r} AS DOUBLE) * CAST(65536 AS DOUBLE)"
    " * CAST(4294967296 AS DOUBLE) / s_total"
)
_KMV_EST = (
    "CAST(63 AS DOUBLE) * CAST(4294967296 AS DOUBLE) / kth_hash"
)

_CM_SLOT = (
    _hex_bigint("md5(concat_ws(':', j, o_custkey))", 1, 8) + " % 256"
)

# Morton interleave mirror of queries._Z_EXPR (Spark `div` -> DuckDB `//`).
_Z_SQL = " + ".join(
    f"((x // {1 << b}) % 2) * {1 << (2 * b + 1)}"
    f" + ((y // {1 << b}) % 2) * {1 << (2 * b)}"
    for b in range(8)
)

ORACLES.update({
    "q_hll_distinct": f"""
        WITH li AS (
          SELECT concat_ws('-', l_orderkey, l_linenumber) AS k
          FROM lineitem),
        h AS (
          SELECT {_hex_bigint("md5(k)", 1, 8)} AS h1,
                 {_hex_bigint("md5(k)", 9, 8)} AS h2
          FROM li),
        regs AS (
          SELECT h1 % 256 AS bucket, max(33 - length(bin(h2))) AS reg
          FROM h GROUP BY 1),
        s AS (
          SELECT count(*) AS m_obs,
                 sum(CAST(1 AS BIGINT) << CAST(32 - reg AS INT)) AS s_obs
          FROM regs),
        t AS (
          SELECT 256 - m_obs AS m_empty,
                 CAST(s_obs + (256 - m_obs) * 4294967296 AS BIGINT)
                   AS s_total
          FROM s),
        e AS (SELECT count(DISTINCT k) AS exact_distinct FROM li)
        SELECT 256 AS m, CAST(m_empty AS BIGINT) AS m_empty,
               {pround_sql(_HLL_EST, 4)} AS est_distinct,
               exact_distinct,
               {pround_sql(f"({_HLL_EST} - exact_distinct) / exact_distinct", 4)}
                 AS rel_err
        FROM t, e
    """,
    "q_kmv_distinct": f"""
        WITH d AS (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem),
        h AS (
          SELECT l_returnflag, l_orderkey,
                 {_hex_bigint("md5(CAST(l_orderkey AS VARCHAR))", 1, 8)} AS h
          FROM d),
        r AS (
          SELECT l_returnflag, h,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY h, l_orderkey) AS rn
          FROM h),
        kth AS (SELECT l_returnflag, h AS kth_hash FROM r WHERE rn = 64),
        e AS (SELECT l_returnflag, count(DISTINCT l_orderkey)
                       AS exact_distinct
              FROM d GROUP BY 1)
        SELECT l_returnflag, kth_hash,
               {pround_sql(_KMV_EST, 4)} AS est_distinct,
               exact_distinct,
               {pround_sql(f"({_KMV_EST} - exact_distinct) / exact_distinct", 4)}
                 AS rel_err
        FROM kth JOIN e USING (l_returnflag)
    """,
    # KMV set-op twin: two 64-min sketches over the 1997/1998 customer
    # populations, merged union sketch (k smallest of the <=128 merged
    # rows, distinct by key), kth hash -> est_union; intersection via
    # the in-both ratio.  Same estimate arithmetic order as Spark.
    "q_kmv_set_ops": f"""
        WITH a AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE year(o_orderdate) = 1997),
        b AS (SELECT DISTINCT o_custkey FROM orders
              WHERE year(o_orderdate) = 1998),
        ha AS (SELECT o_custkey, {_hex_bigint('md5(CAST(o_custkey AS VARCHAR))', 1, 8)} AS h FROM a),
        hb AS (SELECT o_custkey, {_hex_bigint('md5(CAST(o_custkey AS VARCHAR))', 1, 8)} AS h FROM b),
        ska AS (SELECT o_custkey, h FROM
                  (SELECT o_custkey, h,
                          row_number() OVER (ORDER BY h, o_custkey) AS rn
                   FROM ha) WHERE rn <= 64),
        skb AS (SELECT o_custkey, h FROM
                  (SELECT o_custkey, h,
                          row_number() OVER (ORDER BY h, o_custkey) AS rn
                   FROM hb) WHERE rn <= 64),
        merged AS (SELECT DISTINCT o_custkey, h FROM
                     (SELECT * FROM ska UNION ALL SELECT * FROM skb)),
        usk AS (SELECT o_custkey, h FROM
                  (SELECT o_custkey, h,
                          row_number() OVER (ORDER BY h, o_custkey) AS rn
                   FROM merged) WHERE rn <= 64),
        kth AS (SELECT max(h) AS kth_hash FROM usk),
        nb AS (SELECT count(*) AS n_both FROM usk
               WHERE o_custkey IN (SELECT o_custkey FROM ska)
                 AND o_custkey IN (SELECT o_custkey FROM skb)),
        ex AS (SELECT count(*) AS exact_union,
                      CAST(sum(CASE WHEN n_pops = 2 THEN 1 ELSE 0 END)
                           AS BIGINT) AS exact_inter
               FROM (SELECT o_custkey, count(*) AS n_pops FROM
                       (SELECT o_custkey FROM a
                        UNION ALL SELECT o_custkey FROM b)
                     GROUP BY o_custkey))
        SELECT 64 AS k, kth_hash, n_both,
               {pround_sql('CAST(63 AS DOUBLE) * CAST(4294967296 AS DOUBLE) / kth_hash', 4)} AS est_union,
               exact_union,
               {pround_sql('CAST(n_both AS DOUBLE) * (CAST(63 AS DOUBLE) * CAST(4294967296 AS DOUBLE) / kth_hash) / CAST(64 AS DOUBLE)', 4)} AS est_inter,
               exact_inter
        FROM kth, nb, ex
    """,
    "q_countmin_heavy": f"""
        WITH od AS (SELECT o_custkey FROM orders),
        jj AS (SELECT unnest(range(4)) AS j),
        counters AS (
          SELECT j, {_CM_SLOT} AS slot, count(*) AS c
          FROM od, jj GROUP BY 1, 2),
        probes AS (
          SELECT o_custkey, j, {_CM_SLOT} AS slot
          FROM (SELECT DISTINCT o_custkey FROM od), jj),
        est AS (
          SELECT o_custkey, min(c) AS est_count
          FROM probes JOIN counters USING (j, slot) GROUP BY 1),
        exact AS (
          SELECT o_custkey, count(*) AS exact_count FROM od GROUP BY 1),
        ranked AS (
          SELECT o_custkey, est_count, exact_count,
                 row_number() OVER (ORDER BY exact_count DESC, o_custkey)
                   AS rn
          FROM est JOIN exact USING (o_custkey))
        SELECT o_custkey, est_count, exact_count,
               est_count - exact_count AS overcount
        FROM ranked WHERE rn <= 10
    """,
    "q_bloom_semijoin": f"""
        WITH members AS (
          SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
        ii AS (SELECT unnest(range(3)) AS bi),
        bits AS (
          SELECT DISTINCT
                 {_hex_bigint("md5(concat_ws(':', bi, c_custkey))", 1, 8)}
                   % 65536 AS pos
          FROM members, ii),
        probes AS (
          SELECT o_custkey,
                 {_hex_bigint("md5(concat_ws(':', bi, o_custkey))", 1, 8)}
                   % 65536 AS pos
          FROM (SELECT DISTINCT o_custkey FROM orders), ii),
        passing AS (
          SELECT o_custkey FROM probes JOIN bits USING (pos)
          GROUP BY o_custkey HAVING count(*) = 3)
        SELECT p.o_custkey, m.c_custkey IS NOT NULL AS is_member
        FROM passing p LEFT JOIN members m ON p.o_custkey = m.c_custkey
    """,
    "q_zorder_key": f"""
        WITH od AS (
          SELECT o_custkey % 256 AS x,
                 least(CAST(floor(o_totalprice / 2500.0) AS BIGINT), 255)
                   AS y
          FROM orders),
        z AS (SELECT x, y, {_Z_SQL} AS zkey FROM od)
        SELECT zkey // 1024 AS zbucket, count(*) AS n_rows,
               min(x) AS x_min, max(x) AS x_max,
               min(y) AS y_min, max(y) AS y_max
        FROM z GROUP BY 1
    """,
    "q_ivm_merge": """
        WITH od AS (
          SELECT o_orderstatus, CAST(o_orderdate AS DATE) AS d,
                 o_totalprice
          FROM orders),
        state AS (
          SELECT o_orderstatus, count(*) AS cnt,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
          FROM od WHERE d < DATE '1997-01-01' GROUP BY 1),
        delta AS (
          SELECT o_orderstatus, count(*) AS cnt,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
          FROM od WHERE d >= DATE '1997-01-01' GROUP BY 1),
        merged AS (
          SELECT o_orderstatus, CAST(sum(cnt) AS BIGINT) AS order_cnt,
                 sum(s) AS s_m
          FROM (SELECT * FROM state UNION ALL SELECT * FROM delta)
          GROUP BY 1),
        full_ AS (
          SELECT o_orderstatus, count(*) AS f_cnt,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS f_s
          FROM od GROUP BY 1)
        SELECT o_orderstatus, order_cnt,
               CAST(s_m AS DOUBLE) AS total_price,
               (order_cnt = f_cnt AND s_m = f_s) AS match
        FROM merged JOIN full_ USING (o_orderstatus)
    """,
    "q_skew_join_salted": f"""
        SELECT c_mktsegment, count(*) AS n_orders,
               {dsum_sql('o_totalprice')} AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    """,
    "q_runlength_encode": f"""
        WITH e AS (
          SELECT user_id, event_id, ts, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
          FROM events),
        f AS (
          SELECT *, CASE WHEN prev IS NULL OR prev <> event_type
                         THEN 1 ELSE 0 END AS is_new
          FROM e),
        r AS (
          SELECT user_id, event_type,
                 sum(is_new) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS run_id
          FROM f),
        runs AS (
          SELECT user_id, run_id, event_type, count(*) AS run_len
          FROM r GROUP BY 1, 2, 3)
        SELECT event_type, count(*) AS n_runs,
               max(run_len) AS max_run_len,
               {pround_sql('avg(run_len)', 4)} AS avg_run_len
        FROM runs GROUP BY 1
    """,
    "q_percentile_bands": f"""
        WITH b AS (
          SELECT o_orderkey, o_totalprice,
                 CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                      AS INT) AS band
          FROM orders)
        SELECT band, count(*) AS n_orders,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price,
               {dsum_sql('o_totalprice')} AS band_sum
        FROM b GROUP BY 1
    """,
})


def _kcore_sql(k: int = 3, rounds: int = 4) -> str:
    """Unrolled bounded k-core peel mirroring operators/graph.py::
    kcore_peel over the co-purchase graph — each level keeps nodes of
    degree >= k and restricts edges to kept endpoints; pure integer
    counting, bit-identical to Spark's bounded trajectory."""
    levels = []
    for r in range(1, rounds + 1):
        levels.append(f"""
        k{r} AS (SELECT src FROM e{r - 1} GROUP BY src
                 HAVING count(*) >= {k}),
        e{r} AS (SELECT e.src, e.dst FROM e{r - 1} e
                 JOIN k{r} a ON e.src = a.src
                 JOIN k{r} b ON e.dst = b.src)""")
    return (
        """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey % 10 = 0),
        ep AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
        e0 AS (SELECT p1 AS src, p2 AS dst FROM ep
               UNION ALL SELECT p2 AS src, p1 AS dst FROM ep),"""
        + ",".join(levels)
        + f"""
        SELECT src AS node, count(*) AS deg FROM e{rounds} GROUP BY src"""
    )


def _pagerank_sql(iterations: int = 5) -> str:
    """Unrolled integer-PageRank CTE chain mirroring
    operators/graph.py::pagerank_integer — truncating integer division,
    scaled-bigint ranks, so every iteration is bit-identical to Spark."""
    levels = []
    for k in range(1, iterations + 1):
        levels.append(f"""
        r{k} AS (
          SELECT d.src AS node,
                 CAST(150000000000 + (85 * COALESCE(m.in_mass, 0)) // 100
                      AS BIGINT) AS rank
          FROM deg d
          LEFT JOIN (
            SELECT e.dst AS dst, SUM(r.rank // d2.outd) AS in_mass
            FROM e
            JOIN r{k - 1} r ON r.node = e.src
            JOIN deg d2 ON d2.src = e.src
            GROUP BY e.dst) m ON m.dst = d.src)""")
    return (
        """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey % 10 = 0),
        e0 AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
        e AS (SELECT p1 AS src, p2 AS dst FROM e0
              UNION ALL SELECT p2 AS src, p1 AS dst FROM e0),
        deg AS (SELECT src, count(*) AS outd FROM e GROUP BY 1),
        r0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS rank
               FROM deg),"""
        + ",".join(levels)
        + f"""
        SELECT node, rank AS rank_scaled FROM r{iterations}"""
    )


# UDTF sentence segmentation (mirrors queries.q_udtf_sentences): split
# on '.', trim, drop empties, index among kept segments — unnest twin
# of the Python table function's deterministic logic.
ORACLES.update({
    "q_udtf_sentences": r"""
        WITH d AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id % 50 = 0 AND trim(text) != ''),
        segs AS (
          SELECT doc_id, trim(s) AS seg, ord
          FROM (SELECT doc_id,
                       unnest(string_split(text, '.')) AS s,
                       generate_subscripts(string_split(text, '.'), 1)
                         AS ord
                FROM d)),
        kept AS (
          SELECT doc_id, seg,
                 row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1
                   AS seg_idx
          FROM segs WHERE seg != '')
        SELECT doc_id, CAST(seg_idx AS INT) AS seg_idx,
               CAST(length(seg) AS INT) AS seg_chars,
               CAST(len(string_split_regex(seg, '\s+')) AS INT)
                 AS seg_tokens
        FROM kept
    """,
})


# Churn label generation (mirrors queries.q_churn_labels): 80% span
# pivot, pre-period-only features, label from post-period presence.
ORACLES.update({
    "q_churn_labels": f"""
        WITH ev AS (
          SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
                 CAST(ts AS DATE) AS d,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
          FROM events),
        b AS (SELECT min(s) + ((max(s) - min(s)) * 8) // 10 AS b
              FROM ev),
        pu AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN s < b THEN 1 ELSE 0 END) AS BIGINT)
                   AS pre_events,
                 CAST(count(DISTINCT CASE WHEN s < b THEN d END)
                   AS BIGINT) AS pre_days,
                 CAST(sum(CASE WHEN s < b THEN c ELSE 0 END) AS BIGINT)
                   AS pre_cents,
                 CAST(sum(CASE WHEN s >= b THEN 1 ELSE 0 END) AS BIGINT)
                   AS post_events
          FROM ev, b GROUP BY 1),
        g AS (
          SELECT CASE WHEN 4 * post_events < pre_events
                 THEN 'churning' ELSE 'stable' END AS label,
                 CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(pre_events) AS BIGINT) AS se,
                 CAST(sum(pre_days) AS BIGINT) AS sd,
                 CAST(sum(pre_cents) AS BIGINT) AS sc
          FROM pu WHERE pre_events > 0 GROUP BY 1)
        SELECT label, n_users,
               {pround_sql(
                   'CAST(se AS DOUBLE) / CAST(n_users AS DOUBLE)', 6)}
                 AS avg_pre_events,
               {pround_sql(
                   'CAST(sd AS DOUBLE) / CAST(n_users AS DOUBLE)', 6)}
                 AS avg_pre_days,
               {pround_sql(
                   'CAST(sc AS DOUBLE) / CAST(n_users AS DOUBLE)', 6)}
                 AS avg_pre_cents
        FROM g
    """,
})

# Vocabulary coverage curve (mirrors queries.q_vocab_coverage_curve):
# vocab-grain rank/cumsum, exact mass at each cut, pinned division.
ORACLES.update({
    "q_vocab_coverage_curve": rf"""
        WITH tk AS (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
          FROM documents WHERE trim(text) != ''),
        freq AS (
          SELECT token, CAST(count(*) AS BIGINT) AS f
          FROM tk GROUP BY 1),
        ranked AS (
          SELECT f,
                 row_number() OVER (ORDER BY f DESC, token ASC) AS r,
                 sum(f) OVER (ORDER BY f DESC, token ASC
                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM freq),
        tot AS (
          SELECT CAST(sum(f) AS BIGINT) AS total_tokens,
                 CAST(count(*) AS BIGINT) AS vocab_size
          FROM freq),
        cuts AS (
          SELECT k,
                 CAST(count(*) AS BIGINT) AS vocab_tokens,
                 CAST(max(cum) AS BIGINT) AS covered_tokens
          FROM ranked, (SELECT unnest([100, 1000, 10000]) AS k) kk
          WHERE r <= k GROUP BY k)
        SELECT CAST(k AS INT) AS k, vocab_tokens, covered_tokens,
               total_tokens, vocab_size,
               {pround_sql(
                   'CAST(covered_tokens AS DOUBLE)'
                   ' / CAST(total_tokens AS DOUBLE)', 6)} AS coverage
        FROM cuts, tot
    """,
})

# OOV rate vs the corpus top-1000 vocabulary (mirrors
# queries.q_oov_rate): same whitespace tokens, same (freq DESC, token)
# vocabulary cut, one pinned division per source.
ORACLES.update({
    "q_oov_rate": rf"""
        WITH tk AS (
          SELECT source,
                 unnest(string_split_regex(trim(text), '\s+')) AS token
          FROM documents WHERE trim(text) != ''),
        vocab AS (
          SELECT token FROM (
            SELECT token, count(*) AS freq FROM tk GROUP BY 1)
          ORDER BY freq DESC, token LIMIT 1000),
        j AS (
          SELECT tk.source,
                 CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
          FROM tk LEFT JOIN vocab v ON v.token = tk.token)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(oov) AS BIGINT) AS n_oov,
               {pround_sql(
                   'CAST(sum(oov) AS DOUBLE)'
                   ' / CAST(count(*) AS DOUBLE)', 6)} AS oov_rate
        FROM j GROUP BY 1
    """,
})


# Cohen's kappa (mirrors queries.q_cohens_kappa): same confusion cells
# as q_langid_confusion, chance-corrected agreement via the exact
# cross-multiplied integer form, one pinned division.
def _cohens_kappa_oracle() -> str:
    return f"""
        WITH cm AS (
          SELECT lang AS t,
                 CASE WHEN en_hits >= pt_hits AND en_hits >= es_hits
                      THEN 'en'
                      WHEN pt_hits >= es_hits THEN 'pt'
                      ELSE 'es' END AS p,
                 CAST(count(*) AS BIGINT) AS c
          FROM (
            SELECT lang,
                   {_hits(_STOP_EN)} AS en_hits,
                   {_hits(_STOP_PT)} AS pt_hits,
                   {_hits(_STOP_ES)} AS es_hits
            FROM documents) z
          GROUP BY 1, 2),
        m AS (
          SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN t = p THEN c ELSE 0 END) AS BIGINT)
                   AS agree
          FROM cm),
        rr AS (SELECT t AS cls, CAST(sum(c) AS BIGINT) AS r
               FROM cm GROUP BY 1),
        pp AS (SELECT p AS cls, CAST(sum(c) AS BIGINT) AS pc
               FROM cm GROUP BY 1),
        rp AS (
          SELECT CAST(sum(coalesce(r, 0) * coalesce(pc, 0)) AS BIGINT)
            AS sum_rp
          FROM rr FULL JOIN pp USING (cls))
        SELECT m.n, m.agree,
               {pround_sql(
                   'CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)', 6)}
                 AS p_observed,
               {pround_sql(
                   'CAST(sum_rp AS DOUBLE)'
                   ' / CAST(n * n AS DOUBLE)', 6)} AS p_expected,
               {pround_sql(
                   'CAST(n * agree - sum_rp AS DOUBLE)'
                   ' / CAST(n * n - sum_rp AS DOUBLE)', 6)} AS kappa
        FROM m, rp
    """


ORACLES.update({"q_cohens_kappa": _cohens_kappa_oracle()})


def _class_prf1_oracle() -> str:
    """Twin of q_class_prf1: same confusion cells, same
    division-stable F1 = 2tp/(2tp+fp+fn), NULL on empty denominators."""
    return f"""
        WITH cm AS (
          SELECT lang AS t,
                 CASE WHEN en_hits >= pt_hits AND en_hits >= es_hits
                      THEN 'en'
                      WHEN pt_hits >= es_hits THEN 'pt'
                      ELSE 'es' END AS p,
                 CAST(count(*) AS BIGINT) AS c
          FROM (
            SELECT lang,
                   {_hits(_STOP_EN)} AS en_hits,
                   {_hits(_STOP_PT)} AS pt_hits,
                   {_hits(_STOP_ES)} AS es_hits
            FROM documents) z
          GROUP BY 1, 2),
        classes AS (SELECT t AS cls FROM cm
                    UNION SELECT p AS cls FROM cm),
        tp AS (SELECT t AS cls, c AS tp FROM cm WHERE t = p),
        pt_ AS (SELECT p AS cls, CAST(sum(c) AS BIGINT) AS pred_n
                FROM cm GROUP BY 1),
        tt AS (SELECT t AS cls, CAST(sum(c) AS BIGINT) AS true_n
               FROM cm GROUP BY 1),
        j AS (
          SELECT classes.cls,
                 CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
                 CAST(coalesce(pt_.pred_n, 0) - coalesce(tp.tp, 0)
                      AS BIGINT) AS fp,
                 CAST(coalesce(tt.true_n, 0) - coalesce(tp.tp, 0)
                      AS BIGINT) AS fn
          FROM classes
          LEFT JOIN tp ON tp.cls = classes.cls
          LEFT JOIN pt_ ON pt_.cls = classes.cls
          LEFT JOIN tt ON tt.cls = classes.cls)
        SELECT cls, tp, fp, fn,
               {pround_sql(
                   'CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE)'
                   ' / CAST(tp + fp AS DOUBLE) END', 6)} AS precision,
               {pround_sql(
                   'CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE)'
                   ' / CAST(tp + fn AS DOUBLE) END', 6)} AS recall,
               {pround_sql(
                   'CASE WHEN 2 * tp + fp + fn > 0'
                   ' THEN 2.0 * CAST(tp AS DOUBLE)'
                   ' / CAST(2 * tp + fp + fn AS DOUBLE) END', 6)} AS f1
        FROM j
    """


ORACLES.update({"q_class_prf1": _class_prf1_oracle()})


# Difference-in-differences (mirrors queries.q_did): md5 arm bucket,
# 70% span boundary, exact-cents cell means, pinned divisions.
ORACLES.update({
    "q_did": f"""
        WITH ev AS (
          SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
          FROM events WHERE event_type = 'purchase'),
        b AS (SELECT min(s) + ((max(s) - min(s)) * 7) // 10 AS b1
              FROM ev),
        cells AS (
          SELECT CASE WHEN {_hex_bigint(
              "md5(CAST(user_id AS VARCHAR))", 1, 4)} % 2 = 0
                 THEN 'A' ELSE 'B' END AS arm,
                 CASE WHEN s < b1 THEN 'pre' ELSE 'post' END AS period,
                 CAST(sum(c) AS BIGINT) AS sc,
                 CAST(count(*) AS BIGINT) AS n
          FROM ev, b GROUP BY 1, 2),
        m AS (SELECT arm, period,
                     CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean
              FROM cells),
        wide AS (
          SELECT
            max(CASE WHEN arm = 'A' AND period = 'pre'
                THEN mean END) AS mean_a_pre,
            max(CASE WHEN arm = 'A' AND period = 'post'
                THEN mean END) AS mean_a_post,
            max(CASE WHEN arm = 'B' AND period = 'pre'
                THEN mean END) AS mean_b_pre,
            max(CASE WHEN arm = 'B' AND period = 'post'
                THEN mean END) AS mean_b_post
          FROM m)
        SELECT {pround_sql('mean_a_pre', 6)} AS mean_a_pre,
               {pround_sql('mean_a_post', 6)} AS mean_a_post,
               {pround_sql('mean_b_pre', 6)} AS mean_b_pre,
               {pround_sql('mean_b_post', 6)} AS mean_b_post,
               {pround_sql(
                   '(mean_b_post - mean_b_pre)'
                   ' - (mean_a_post - mean_a_pre)', 6)} AS did_cents
        FROM wide
    """,
})


# ANALYZE TABLE stats sweep (mirrors queries.q_analyze_table_stats):
# one wide pass, unpivoted to the (column, stat) catalog grain.
def _analyze_stats_sql() -> str:
    cols = {
        "o_orderkey": "CAST(o_orderkey AS VARCHAR)",
        "o_custkey": "CAST(o_custkey AS VARCHAR)",
        "o_orderstatus": "o_orderstatus",
        "o_orderpriority": "o_orderpriority",
        "o_orderdate": "CAST(o_orderdate AS VARCHAR)",
    }
    parts = [
        f"""
        SELECT '{name}' AS "column",
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN {expr} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {expr}) AS BIGINT) AS ndv,
               min({expr}) AS min_str,
               max({expr}) AS max_str
        FROM orders"""
        for name, expr in cols.items()
    ]
    return " UNION ALL ".join(parts)


ORACLES.update({"q_analyze_table_stats": _analyze_stats_sql()})


def _skew_stats_sql(table: str, col: str, label: str) -> str:
    """One skew-report row (mirrors queries.q_skew_report's stats())."""
    return f"""
        SELECT '{label}' AS join_key,
               CAST(max(n_keys) AS BIGINT) AS n_keys,
               CAST(max(n_rows) AS BIGINT) AS n_rows,
               CAST(max(max_freq) AS BIGINT) AS max_freq,
               CAST(max(avg_freq) AS BIGINT) AS avg_freq,
               CAST(sum(CASE WHEN f > 10 * avg_freq THEN 1 ELSE 0 END)
                    AS BIGINT) AS keys_over_10x_avg,
               {pround_sql(
                   'CAST(max(max_freq) AS DOUBLE)'
                   ' / CAST(max(avg_freq) AS DOUBLE)', 6)}
                 AS max_over_avg
        FROM (
          SELECT f, n_keys, n_rows, max_freq, n_rows // n_keys AS avg_freq
          FROM (SELECT CAST(count(*) AS BIGINT) AS f
                FROM {table} GROUP BY {col}) fr,
               (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                       CAST(sum(f) AS BIGINT) AS n_rows,
                       CAST(max(f) AS BIGINT) AS max_freq
                FROM (SELECT CAST(count(*) AS BIGINT) AS f
                      FROM {table} GROUP BY {col})) t)
    """


ORACLES.update({
    "q_skew_report": (
        _skew_stats_sql("orders", "o_custkey", "orders.o_custkey")
        + " UNION ALL "
        + _skew_stats_sql("lineitem", "l_partkey", "lineitem.l_partkey")
    ),
})


def _shapley_attribution_oracle() -> str:
    """Twin of q_shapley_attribution: identical coalition bitmask,
    identical v(S) subset census, identical 1/24-unit integer Shapley
    terms (the literal term table is generated by the same Python
    loop)."""
    from itertools import combinations
    from math import factorial

    CH = ["click", "error", "signup", "view"]
    k = len(CH)
    rows = []
    for i, c in enumerate(CH):
        for r in range(k):
            for S in combinations([j for j in range(k) if j != i], r):
                s_mask = sum(1 << j for j in S)
                w = factorial(r) * factorial(k - r - 1)
                rows.append(
                    f"('{c}', {s_mask}, {s_mask | (1 << i)}, {w})"
                )
    values = ",\n               ".join(rows)
    bits = " + ".join(
        f"max(CASE WHEN event_type = '{c}' THEN {1 << i} ELSE 0 END)"
        for i, c in enumerate(CH)
    )
    return f"""
        WITH u AS (
          SELECT user_id, {bits} AS mask,
                 max(CASE WHEN event_type = 'purchase'
                     THEN 1 ELSE 0 END) AS conv
          FROM events GROUP BY 1),
        census AS (
          SELECT mask, CAST(count(*) AS BIGINT) AS n
          FROM u WHERE conv = 1 GROUP BY 1),
        subsets AS (SELECT CAST(unnest(range(16)) AS INT) AS s),
        v AS (
          SELECT s, CAST(coalesce(sum(n), 0) AS BIGINT) AS v
          FROM subsets LEFT JOIN census
            ON (CAST(census.mask AS INT) & s) = CAST(census.mask AS INT)
          GROUP BY s),
        terms(channel, s, s_with, w) AS (
          VALUES {values}),
        phi AS (
          SELECT t.channel,
                 CAST(sum(t.w * (vw.v - vs.v)) AS BIGINT) AS phi_x24
          FROM terms t
          JOIN v vs ON vs.s = t.s
          JOIN v vw ON vw.s = t.s_with
          GROUP BY 1)
        SELECT channel, phi_x24,
               {pround_sql('CAST(phi_x24 AS DOUBLE) / 24.0', 6)}
                 AS shapley_conversions
        FROM phi
    """


ORACLES.update({"q_shapley_attribution": _shapley_attribution_oracle()})


# Temporal split + leakage audit (mirrors queries.q_temporal_split):
# integer 70/85% span boundaries, strict epoch-second comparison,
# train-user overlap per split.
ORACLES.update({
    "q_data_freshness": f"""
        WITH ev AS (
          SELECT event_type,
                 CAST(floor(epoch(ts)) AS BIGINT) AS s,
                 CAST(ts AS DATE) AS day
          FROM events),
        hw AS (SELECT max(s) AS hw_s, max(day) AS hw_day FROM ev),
        pt AS (
          SELECT event_type,
                 CAST(max(s) AS BIGINT) AS last_seen_s,
                 max(hw_s) AS hw,
                 CAST(SUM(CASE WHEN day = hw_day THEN 1 ELSE 0 END)
                      AS BIGINT) AS latest_day_events,
                 CAST(SUM(CASE WHEN day >= hw_day - INTERVAL 7 DAY
                                AND day < hw_day THEN 1 ELSE 0 END)
                      AS BIGINT) AS trailing_7d_events
          FROM ev, hw GROUP BY event_type)
        SELECT event_type,
               last_seen_s,
               CAST(hw - last_seen_s AS BIGINT) AS staleness_s,
               latest_day_events,
               trailing_7d_events,
               CASE WHEN trailing_7d_events > 0 THEN {pround_sql(
                   '7.0 * CAST(latest_day_events AS DOUBLE)'
                   ' / CAST(trailing_7d_events AS DOUBLE)', 6
               )} END AS volume_vs_trailing_mean,
               7 * latest_day_events * 2 < trailing_7d_events
                 AS partial_load_suspect
        FROM pt
    """,
    "q_temporal_split": """
        WITH ev AS (
          SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s
          FROM events),
        b AS (SELECT min(s) AS mn, max(s) AS mx FROM ev),
        bb AS (SELECT mn + ((mx - mn) * 7) // 10 AS b1,
                      mn + ((mx - mn) * 17) // 20 AS b2 FROM b),
        tagged AS (
          SELECT user_id,
                 CASE WHEN s < b1 THEN 'train'
                      WHEN s < b2 THEN 'val'
                      ELSE 'test' END AS split
          FROM ev, bb),
        ps AS (
          SELECT split, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM tagged GROUP BY 1),
        su AS (SELECT DISTINCT split, user_id FROM tagged),
        tu AS (SELECT user_id FROM su WHERE split = 'train'),
        ov AS (
          SELECT split, CAST(count(*) AS BIGINT) AS ovl
          FROM su JOIN tu USING (user_id) GROUP BY 1)
        SELECT ps.split, ps.n_events, ps.n_users,
               CAST(coalesce(ov.ovl, 0) AS BIGINT)
                 AS n_users_seen_in_train
        FROM ps LEFT JOIN ov ON ov.split = ps.split
    """,
    "q_gdpr_erasure": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS rows_before,
               CAST(count(*) - sum(CASE WHEN user_id % 97 = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS rows_after,
               CAST(sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS rows_erased,
               CAST(count(DISTINCT CASE WHEN user_id % 97 = 0
                    THEN user_id END) AS BIGINT) AS users_erased
        FROM events GROUP BY 1
    """,
})

# Pretraining mixing weights (mirrors queries.q_domain_mixing_weights):
# exact token mass per source, up-to-uniform cap, pinned divisions.
ORACLES.update({
    "q_token_budget": f"""
        WITH ps AS (
          SELECT source, CAST(sum({_N_TOKENS}) AS BIGINT) AS tokens
          FROM documents GROUP BY 1),
        t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
                     CAST(count(*) AS BIGINT) AS n_sources,
                     CAST(2 * sum(tokens) AS BIGINT) AS budget FROM ps),
        j AS (
          SELECT ps.source, ps.tokens, t.budget, t.n_sources,
                 t.budget // t.n_sources AS target,
                 least(t.budget // t.n_sources, 4 * ps.tokens) AS alloc
          FROM ps, t)
        SELECT source,
               tokens,
               CAST(target AS BIGINT) AS uniform_target,
               CAST(alloc AS BIGINT) AS tokens_allocated,
               CAST(alloc * 1000 // tokens AS BIGINT) AS epochs_milli,
               {pround_sql(
                   'CAST(alloc AS DOUBLE) / CAST(budget AS DOUBLE)', 6
               )} AS budget_share
        FROM j
    """,
    "q_domain_mixing_weights": f"""
        WITH ps AS (
          SELECT source, CAST(sum({_N_TOKENS}) AS BIGINT) AS tokens,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1),
        t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
                     CAST(count(*) AS BIGINT) AS n_sources FROM ps),
        j AS (
          SELECT ps.source, ps.n_docs, ps.tokens,
                 CAST(t.total_tokens AS DOUBLE)
                   / CAST(t.n_sources AS DOUBLE) AS target,
                 CAST(ps.tokens AS DOUBLE)
                   / CAST(t.total_tokens AS DOUBLE) AS share
          FROM ps, t),
        k AS (
          SELECT *, CASE WHEN CAST(tokens AS DOUBLE) > target
                         THEN target / CAST(tokens AS DOUBLE)
                         ELSE 1.0 END AS w
          FROM j)
        SELECT source, n_docs, tokens,
               {pround_sql('share', 6)} AS natural_share,
               {pround_sql('w', 6)} AS mix_weight,
               CAST(floor(CAST(tokens AS DOUBLE) * w) AS BIGINT)
                 AS tokens_after_cap
        FROM k
    """,
    "q_language_temperature_sampling": f"""
        WITH pl AS (
          SELECT lang, CAST(sum({_N_TOKENS}) AS BIGINT) AS tokens,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1),
        t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens FROM pl),
        -- ln(p) pinned to x1e6, exp(0.7*pinned) re-pinned to x1e6 so the
        -- normalizing sum is order-free integer addition (mirrors Spark)
        w AS (
          SELECT pl.lang, pl.n_docs, pl.tokens, t.total_tokens,
                 CAST(floor(exp(0.7 * (CAST(floor(
                     ln(CAST(pl.tokens AS DOUBLE)
                        / CAST(t.total_tokens AS DOUBLE)) * 1e6 + 0.5)
                   AS BIGINT) / 1e6)) * 1e6 + 0.5) AS BIGINT) AS w6
          FROM pl, t),
        s AS (SELECT CAST(sum(w6) AS BIGINT) AS sum_w6 FROM w)
        SELECT w.lang, w.n_docs, w.tokens,
               {pround_sql(
                   'CAST(w.tokens AS DOUBLE) / CAST(w.total_tokens AS DOUBLE)',
                   6)} AS natural_share,
               {pround_sql(
                   'CAST(w.w6 AS DOUBLE) / CAST(s.sum_w6 AS DOUBLE)', 6
               )} AS temperature_share,
               {pround_sql(
                   '(CAST(w.w6 AS DOUBLE) / CAST(s.sum_w6 AS DOUBLE))'
                   ' / (CAST(w.tokens AS DOUBLE)'
                   '    / CAST(w.total_tokens AS DOUBLE))', 4
               )} AS sampling_boost
        FROM w, s
    """,
    "q_distinct_ngrams": f"""
        WITH docs AS (
          SELECT lang, {_TOKENS} AS toks, len({_TOKENS}) AS n
          FROM documents WHERE trim(text) <> ''),
        uni AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_uni,
                 CAST(count(DISTINCT g) AS BIGINT) AS d_uni
          FROM (SELECT lang, unnest(toks) AS g FROM docs) u
          GROUP BY 1),
        bi AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_bi,
                 CAST(count(DISTINCT g) AS BIGINT) AS d_bi
          FROM (SELECT lang,
                       toks[CAST(i AS INT)] || ' '
                         || toks[CAST(i + 1 AS INT)] AS g
                FROM docs, unnest(range(1, n)) AS r(i)
                WHERE n >= 2) b
          GROUP BY 1)
        SELECT uni.lang, n_uni, d_uni, n_bi, d_bi,
               {pround_sql(
                   'CAST(d_uni AS DOUBLE) / CAST(n_uni AS DOUBLE)', 6
               )} AS distinct_1,
               {pround_sql(
                   'CAST(d_bi AS DOUBLE) / CAST(n_bi AS DOUBLE)', 6
               )} AS distinct_2
        FROM uni JOIN bi USING (lang)
    """,
    "q_dsir_weights": f"""
        WITH tb AS (
          SELECT doc_id, source,
                 {_hex_bigint("md5(tok)", 1, 8)} % 1024 AS b
          FROM (SELECT doc_id, source, unnest({_TOKENS}) AS tok
                FROM documents WHERE trim(text) <> '') u),
        model AS (
          SELECT b,
                 CAST(sum(CASE WHEN source = 'src7' THEN 1 ELSE 0 END)
                      AS BIGINT) AS c_tgt,
                 CAST(count(*) AS BIGINT) AS c_raw
          FROM tb GROUP BY 1),
        sc AS (
          SELECT CAST(sum(CASE WHEN source = 'src7' THEN 1 ELSE 0 END)
                      AS BIGINT) AS t_tgt,
                 CAST(count(*) AS BIGINT) AS t_raw
          FROM tb),
        lr AS (
          SELECT m.b,
                 CAST(floor(ln((CAST(m.c_tgt AS DOUBLE) + 1.0)
                               / (CAST(sc.t_tgt AS DOUBLE) + 1024.0))
                            * 1000000 + 0.5) AS BIGINT)
                 - CAST(floor(ln((CAST(m.c_raw AS DOUBLE) + 1.0)
                                 / (CAST(sc.t_raw AS DOUBLE) + 1024.0))
                              * 1000000 + 0.5) AS BIGINT) AS lr6
          FROM model m, sc),
        per_doc AS (
          SELECT tb.doc_id, tb.source,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(lr.lr6) AS BIGINT) AS s6
          FROM tb JOIN lr USING (b)
          GROUP BY 1, 2),
        corpus AS (
          SELECT CAST(sum(s6) AS BIGINT) AS s_total,
                 CAST(sum(n_tokens) AS BIGINT) AS t_tokens
          FROM per_doc)
        SELECT doc_id, source, n_tokens,
               {pround_sql(
                   'CAST(s6 AS DOUBLE) / 1e6'
                   ' / CAST(n_tokens AS DOUBLE)', 4
               )} AS dsir_logw,
               CAST(s6 AS HUGEINT) * t_tokens
                 > CAST(s_total AS HUGEINT) * n_tokens AS selected
        FROM per_doc, corpus
    """,
    "q_watermark_lateness_profile": f"""
        WITH e AS (
          SELECT event_id, epoch_us(ts) AS us,
                 epoch_us(ts)
                   + {_hex_bigint("md5(CAST(event_id AS VARCHAR))", 1, 8)}
                     % 600000000 AS arr_us
          FROM events),
        r AS (
          SELECT max(us) OVER (ORDER BY arr_us, event_id
                               ROWS UNBOUNDED PRECEDING) - us AS late_us
          FROM e),
        b AS (
          SELECT CASE WHEN late_us <= 0 THEN 0
                      WHEN late_us <= 60000000 THEN 1
                      WHEN late_us <= 300000000 THEN 2
                      WHEN late_us <= 900000000 THEN 3
                      WHEN late_us <= 3600000000 THEN 4
                      ELSE 5 END AS bo, late_us
          FROM r),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM b)
        SELECT CAST(bo AS INT) AS bucket_order,
               CASE bo WHEN 0 THEN 'on_time' WHEN 1 THEN 'le_1m'
                       WHEN 2 THEN 'le_5m' WHEN 3 THEN 'le_15m'
                       WHEN 4 THEN 'le_1h' ELSE 'gt_1h' END
                 AS lateness_bucket,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(late_us) AS BIGINT) AS max_late_us,
               {pround_sql(
                   'CAST(count(*) AS DOUBLE) / CAST(any_value(t.n_total)'
                   ' AS DOUBLE)', 6)} AS share
        FROM b, t
        GROUP BY 1, 2
    """,
})


# Hashing trick (mirrors queries.q_hashing_trick): portable md5-slice
# slot + sign hashes, 64-slot signed-mass profile.
ORACLES.update({
    "q_hashing_trick": f"""
        WITH ev AS (
          SELECT CAST({_hex_bigint(
              "md5('ht-v1' || '|' || event_type)", 1, 8)} % 64 AS INT)
                   AS slot,
                 event_type,
                 (1 - 2 * ({_hex_bigint(
                     "md5('ht-sign-v1' || '|' || event_type)", 1, 8)} % 2))
                 * CAST(floor(value * 100 + 0.5) AS BIGINT) AS sc
          FROM events)
        SELECT slot,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_features,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(sc) AS BIGINT) AS sum_signed_cents
        FROM ev GROUP BY slot
    """,
})


# CUPED variance reduction (mirrors queries.q_cuped): exact integer
# power sums at the user grain in HUGEINT (Spark side: decimal(38,0)
# — same exact integers), then the identical fixed-order double
# divisions, pround-pinned at the end.
ORACLES.update({
    "q_cuped": f"""
        WITH pu AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'view'
                      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                      ELSE 0 END) AS HUGEINT) AS x,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                      ELSE 0 END) AS HUGEINT) AS y
          FROM events GROUP BY 1),
        s AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx,
                 sum(y * y) AS syy
          FROM pu),
        sc AS (
          SELECT CAST(n AS BIGINT) AS n_users,
                 CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
                 CAST(n * sxx - sx * sx AS DOUBLE) AS vx,
                 CAST(n * syy - sy * sy AS DOUBLE) AS vy,
                 CAST(n AS DOUBLE) AS nd
          FROM s),
        sc2 AS (
          SELECT n_users,
                 CASE WHEN vx > 0 THEN cxy / vx END AS theta,
                 CASE WHEN vx > 0 AND vy > 0
                      THEN (cxy * cxy) / (vx * vy)
                      ELSE 0.0 END AS rho2,
                 vy / (nd * nd) AS var_y
          FROM sc)
        SELECT n_users,
               {pround_sql('theta', 6)} AS theta,
               {pround_sql('rho2', 6)} AS var_reduction,
               {pround_sql('var_y', 6)} AS var_y_cents2,
               {pround_sql('var_y * (1.0 - rho2)', 6)}
                 AS var_y_cuped_cents2
        FROM sc2
    """,
})


# HITS hubs & authorities (mirrors queries.q_hits): 2 unrolled
# unnormalized integer iterations over the canonically oriented
# (p1 < p2) co-purchase edges.
ORACLES_HITS = {
    "q_hits": """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey % 10 = 0),
        e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey),
        a1 AS (SELECT dst, CAST(count(*) AS BIGINT) AS a
               FROM e GROUP BY 1),
        h1 AS (SELECT e.src, CAST(sum(a1.a) AS BIGINT) AS h
               FROM e JOIN a1 USING (dst) GROUP BY 1),
        a2 AS (SELECT e.dst, CAST(sum(h1.h) AS BIGINT) AS a2
               FROM e JOIN h1 USING (src) GROUP BY 1),
        h2 AS (SELECT e.src, CAST(sum(a2.a2) AS BIGINT) AS h2
               FROM e JOIN a2 USING (dst) GROUP BY 1),
        nodes AS (SELECT src AS node FROM e
                  UNION SELECT dst AS node FROM e),
        scored AS (
          SELECT n.node,
                 CAST(coalesce(a2.a2, 0) AS BIGINT) AS authority,
                 CAST(coalesce(h2.h2, 0) AS BIGINT) AS hub
          FROM nodes n
          LEFT JOIN a2 ON a2.dst = n.node
          LEFT JOIN h2 ON h2.src = n.node)
        SELECT node, authority, hub FROM scored
        ORDER BY authority DESC, hub DESC, node LIMIT 20
    """,
}
ORACLES.update(ORACLES_HITS)


def _lsh_bucket_sql(col: str, num_planes: int = 8, dim: int = 64) -> str:
    """The hyperplane-LSH bucket id of ``col`` as a SQL expression that
    is BIT-IDENTICAL to operators/similarity.py::hyperplane_signature:
    the same md5-parity ±1 weights, the same left-fold summation order
    (IEEE addition is order-sensitive; an engine-chosen reduction like
    list_dot_product could flip a near-zero sign), the same >= 0 test.
    ~8 planes x 64 terms of generated arithmetic — mechanical, like the
    unrolled PageRank/Bellman-Ford CTEs."""
    import hashlib

    planes = []
    for p in range(num_planes):
        terms = []
        for d in range(dim):
            sign = (
                1
                if int(hashlib.md5(f"{p},{d}".encode()).hexdigest(), 16) % 2
                == 0
                else -1
            )
            t = f"CAST({col}[{d + 1}] AS DOUBLE)"
            if d == 0:
                terms.append(t if sign == 1 else f"- {t}")
            else:
                terms.append(f"{'+' if sign == 1 else '-'} {t}")
        acc = " ".join(terms)
        planes.append(f"(CASE WHEN ({acc}) >= 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(planes)


def _random_projection_sql(col: str, out_dim: int = 8, dim: int = 64) -> str:
    """Projected components p0..p{k-1} of ``col`` as SQL select-list
    expressions BIT-IDENTICAL to operators/similarity.py::
    random_projection: md5("proj:{j},{d}") parity ±1 weights, the same
    left-fold order, the same sqrt(out_dim) divisor literal (repr
    round-trips, so both parsers land on the same double)."""
    import hashlib
    import math

    scale = repr(math.sqrt(float(out_dim)))
    comps = []
    for j in range(out_dim):
        terms = []
        for d in range(dim):
            sign = (
                1
                if int(
                    hashlib.md5(f"proj:{j},{d}".encode()).hexdigest(), 16
                )
                % 2
                == 0
                else -1
            )
            t = f"CAST({col}[{d + 1}] AS DOUBLE)"
            if d == 0:
                terms.append(t if sign == 1 else f"- {t}")
            else:
                terms.append(f"{'+' if sign == 1 else '-'} {t}")
        acc = " ".join(terms)
        comps.append(f"{pround_sql(f'(({acc}) / {scale})', 6)} AS p{j}")
    return ", ".join(comps)


def _bellman_sql(iterations: int, weighted: bool, out_col: str) -> str:
    """Unrolled bounded Bellman-Ford CTE chain mirroring
    operators/graph.py::bellman_ford — bigint distances, LEAST-relaxation
    per level, sentinel 2^40 for unreached — bit-identical to Spark's
    per-round trajectory (integer arithmetic, no summation-order
    sensitivity)."""
    inf = 2**40
    w = "((e.src + e.dst) % 7 + 1)" if weighted else "1"
    levels = []
    for k in range(1, iterations + 1):
        levels.append(f"""
        d{k} AS (
          SELECT n.node,
                 LEAST(n.dist, COALESCE(m.nd, n.dist)) AS dist
          FROM d{k - 1} n
          LEFT JOIN (
            SELECT e.dst AS node, MIN(r.dist + {w}) AS nd
            FROM e JOIN d{k - 1} r ON r.node = e.src
            GROUP BY e.dst) m ON m.node = n.node)""")
    return (
        f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey % 10 = 0),
        e0 AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
        e AS (SELECT p1 AS src, p2 AS dst FROM e0
              UNION ALL SELECT p2 AS src, p1 AS dst FROM e0),
        d0 AS (SELECT src AS node,
                      CAST(CASE WHEN src % 100 = 0 THEN 0
                                ELSE {inf} END AS BIGINT) AS dist
               FROM (SELECT DISTINCT src FROM e)),"""
        + ",".join(levels)
        + f"""
        SELECT node, dist AS {out_col} FROM d{iterations}
        WHERE dist < {inf}"""
    )


def _harmonic_sql(rounds: int) -> str:
    """Unrolled probe-keyed BFS mirroring queries.q_harmonic_centrality:
    state (probe, node, dist), each round adds UNSEEN (probe, node)
    pairs at their first (= minimal) hop count; 12/d is exact integer
    for d ∈ {1..4} so the harmonic sum accumulates as Σ(12 // dist).
    Probes mirror queries._hub_probes: top-32 by degree, ties to the
    smaller node id (COUNT-bounded — VERDICT r10 #1)."""
    ctes = []
    for k in range(1, rounds + 1):
        ctes.append(f"""
        n{k} AS (
          SELECT DISTINCT f.probe, e.dst AS node
          FROM f{k - 1} f JOIN e ON e.src = f.node
          WHERE NOT EXISTS (
            SELECT 1 FROM s{k - 1} s
            WHERE s.probe = f.probe AND s.node = e.dst)),
        s{k} AS (
          SELECT * FROM s{k - 1}
          UNION ALL
          SELECT probe, node, CAST({k} AS BIGINT) FROM n{k}),
        f{k} AS (SELECT probe, node FROM n{k})""")
    return (
        """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey % 10 = 0),
        e0 AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
        e AS (SELECT p1 AS src, p2 AS dst FROM e0
              UNION ALL SELECT p2 AS src, p1 AS dst FROM e0),
        p AS (SELECT probe FROM (
                SELECT src AS probe, count(*) AS deg
                FROM e GROUP BY src
                ORDER BY deg DESC, probe ASC LIMIT 32)),
        s0 AS (SELECT probe, probe AS node, CAST(0 AS BIGINT) AS dist
               FROM p),
        f0 AS (SELECT probe, node FROM s0),"""
        + ",".join(ctes)
        + f"""
        SELECT probe,
               CAST(count(*) AS BIGINT) AS n_reached,
               CAST(sum(12 // dist) AS BIGINT) AS h12,
               {pround_sql('CAST(sum(12 // dist) AS DOUBLE) / 12.0', 6)}
                 AS harmonic_centrality
        FROM s{rounds} WHERE dist > 0
        GROUP BY probe"""
    )


def _path_counts_sql(rounds: int) -> str:
    """Unrolled probe-keyed BFS with σ accumulation mirroring
    queries.q_graph_path_counts: a node enters at its first hop with
    σ = Σ σ(predecessors in the previous frontier), exact BIGINT.
    Probes mirror queries._hub_probes (top-32 by degree, COUNT-bounded
    — VERDICT r10 #1)."""
    ctes = []
    for k in range(1, rounds + 1):
        ctes.append(f"""
        n{k} AS (
          SELECT f.probe, e.dst AS node,
                 CAST(sum(f.sigma) AS BIGINT) AS sigma
          FROM f{k - 1} f JOIN e ON e.src = f.node
          WHERE NOT EXISTS (
            SELECT 1 FROM s{k - 1} s
            WHERE s.probe = f.probe AND s.node = e.dst)
          GROUP BY 1, 2),
        s{k} AS (
          SELECT * FROM s{k - 1}
          UNION ALL
          SELECT probe, node, CAST({k} AS BIGINT), sigma FROM n{k}),
        f{k} AS (SELECT probe, node, sigma FROM n{k})""")
    return (
        """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey % 10 = 0),
        e0 AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
        e AS (SELECT p1 AS src, p2 AS dst FROM e0
              UNION ALL SELECT p2 AS src, p1 AS dst FROM e0),
        p AS (SELECT probe FROM (
                SELECT src AS probe, count(*) AS deg
                FROM e GROUP BY src
                ORDER BY deg DESC, probe ASC LIMIT 32)),
        s0 AS (SELECT probe, probe AS node, CAST(0 AS BIGINT) AS dist,
                      CAST(1 AS BIGINT) AS sigma
               FROM p),
        f0 AS (SELECT probe, node, sigma FROM s0),"""
        + ",".join(ctes)
        + f"""
        SELECT probe, dist,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(sigma) AS BIGINT) AS paths_total,
               CAST(min(sigma) AS BIGINT) AS sigma_min,
               CAST(max(sigma) AS BIGINT) AS sigma_max
        FROM s{rounds} WHERE dist > 0
        GROUP BY 1, 2"""
    )


ORACLES.update({
    "q_harmonic_centrality": _harmonic_sql(4),
    "q_graph_path_counts": _path_counts_sql(4),
    "q_pii_extraction": """
        WITH base AS (
          SELECT 'reach ' || c_name || ' at user'
                 || CAST(c_custkey AS VARCHAR) || '@example.'
                 || (['com', 'org', 'net'])[CAST(c_custkey % 3 AS INT) + 1]
                 || ' or +55 (11) 9'
                 || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                 || '-'
                 || lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0')
                 || CASE WHEN c_custkey % 5 = 0
                         THEN ' ssn 987-65-4321' ELSE '' END
                 || ' re order updates' AS t
          FROM customer),
        allk AS (
          SELECT 'email' AS kind,
                 regexp_extract_all(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
                   AS ms
          FROM base
          UNION ALL
          SELECT 'phone',
                 regexp_extract_all(t,
                   '\+[0-9]{2} \([0-9]{2}\) [0-9]{4,5}-[0-9]{4}')
          FROM base
          UNION ALL
          SELECT 'ssn',
                 regexp_extract_all(t, '[0-9]{3}-[0-9]{2}-[0-9]{4}')
          FROM base)
        SELECT kind,
               CAST(SUM(len(ms)) AS BIGINT) AS n_matches,
               CAST(SUM(CASE WHEN len(ms) > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rows_exposed,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT ms[1]) AS BIGINT) AS n_distinct_first
        FROM allk GROUP BY kind
    """,
    "q_embed_random_projection": f"""
        SELECT vec_id, {_random_projection_sql('embedding')}
        FROM embeddings
    """,
    "q_vector_topk_lsh": f"""
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv,
                          {_lsh_bucket_sql('embedding')} AS qb
                   FROM embeddings WHERE vec_id = 0),
        cand AS (
          SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ev, q.qv
          FROM embeddings e, q
          WHERE {_lsh_bucket_sql('e.embedding')} = q.qb),
        scored AS (
          SELECT vec_id,
                 {pround_sql(
                     'list_dot_product(ev, qv) / '
                     '(sqrt(list_dot_product(ev, ev)) * '
                     'sqrt(list_dot_product(qv, qv)))', 6)} AS cosine
          FROM cand)
        SELECT vec_id, cosine FROM scored
        ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
    # ANN recall: exact top-10 (shared cosine CTE) vs the LSH bucket's
    # reranked top-10 (same bit-identical bucket expression as
    # q_vector_topk_lsh); counts + one exact-int division.
    "q_ann_recall": f"""
        WITH {_cosine_scored_ctes()},
        exact AS (
          SELECT vec_id FROM scored
          ORDER BY cosine DESC, vec_id ASC LIMIT 10),
        lq AS (SELECT CAST(embedding AS DOUBLE[]) AS qv,
                      {_lsh_bucket_sql('embedding')} AS qb
               FROM embeddings WHERE vec_id = 0),
        lcand AS (
          SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ev, lq.qv
          FROM embeddings e, lq
          WHERE {_lsh_bucket_sql('e.embedding')} = lq.qb),
        lscored AS (
          SELECT vec_id,
                 {pround_sql(
                     'list_dot_product(ev, qv) / '
                     '(sqrt(list_dot_product(ev, ev)) * '
                     'sqrt(list_dot_product(qv, qv)))', 6)} AS cosine
          FROM lcand),
        lsh AS (
          SELECT vec_id FROM lscored
          ORDER BY cosine DESC, vec_id ASC LIMIT 10)
        SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
          (SELECT CAST(count(*) AS BIGINT) FROM lsh) AS n_lsh,
          (SELECT CAST(count(*) AS BIGINT)
           FROM exact JOIN lsh USING (vec_id)) AS n_overlap,
          CAST((SELECT count(*) FROM exact JOIN lsh USING (vec_id))
               AS DOUBLE) / 10.0 AS recall_at_10
    """,
    "q_kcore": _kcore_sql(3, 4),
    "q_pagerank": _pagerank_sql(5),
    "q_bfs_levels": _bellman_sql(6, weighted=False, out_col="hops"),
    "q_shortest_path_weighted": _bellman_sql(
        5, weighted=True, out_col="distance"
    ),
    "q_triangle_count": """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey % 10 = 0),
        e0 AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
        tri AS (
          SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
          FROM e0 e1
          JOIN e0 e2 ON e2.p1 = e1.p2
          JOIN e0 e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
        corners AS (
          SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
        SELECT node, count(*) AS n_triangles FROM corners GROUP BY 1
    """,
    "q_partition_prune": f"""
        SELECT CAST(ts AS DATE) AS day,
               count(*) AS n_clicks,
               {dsum_sql('value')} AS click_value
        FROM events WHERE event_type = 'click' GROUP BY 1
    """,
    "q_bucketed_join": f"""
        SELECT o.o_orderkey,
               count(*) AS n_lines,
               {dsum_sql('l.l_extendedprice')} AS order_revenue,
               min(o.o_totalprice) AS o_totalprice
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    """,
})


# m=1024 HLL estimate from a per-group (m_obs, s_obs) register summary:
# exact-bigint s_total (empties at 2^32), raw harmonic estimate, and
# Flajolet's linear-counting branch when raw <= 2.5m — mirrors
# queries.q_rolling_distinct_hll._est exactly (same constants, same op
# order; the greatest() guard keeps the unused branch finite).
_HLL1024_ALPHA = 0.7213 / (1.0 + 1.079 / 1024)


def _hll1024_est(m_obs: str, s_obs: str) -> str:
    m_empty = f"CAST(1024 - {m_obs} AS BIGINT)"
    s_total = f"CAST({s_obs} + (1024 - {m_obs}) * 4294967296 AS BIGINT)"
    raw = (
        f"CAST({_HLL1024_ALPHA!r} AS DOUBLE) * CAST(1048576 AS DOUBLE)"
        f" * CAST(4294967296 AS DOUBLE) / {s_total}"
    )
    lc = (
        f"CAST(1024 AS DOUBLE)"
        f" * ln(CAST(1024 AS DOUBLE) / greatest({m_empty}, 1))"
    )
    return (
        f"CASE WHEN {m_empty} > 0 AND {raw} <= CAST(2560 AS DOUBLE)"
        f" THEN {lc} ELSE {raw} END"
    )


ORACLES.update({
    "q_rolling_distinct": f"""
        WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                    FROM events),
        days AS (SELECT DISTINCT day FROM du)
        SELECT d.day,
               count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END)
                 AS dau,
               count(DISTINCT u.user_id) AS wau_7d,
               {pround_sql(
                   'count(DISTINCT CASE WHEN u.day = d.day '
                   'THEN u.user_id END) / count(DISTINCT u.user_id)', 6)}
                 AS stickiness
        FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day
    """,
    # Register-table HLL twin of queries.q_rolling_distinct_hll (round 6):
    # per-(day,bucket) max-rho registers, 7-day range-join merge at day x
    # bucket grain, exact-bigint harmonic sum, linear-counting branch for
    # the small range.  Same m=1024 / alpha / op order as Spark; x1024 is
    # an exact power-of-two scale so only ln()'s last ulp is shared.
    "q_rolling_distinct_hll": f"""
        WITH dr AS (
          SELECT day, bucket, max(rho) AS reg FROM (
            SELECT CAST(ts AS DATE) AS day,
                   {_hex_bigint("md5(CAST(user_id AS VARCHAR))", 1, 8)}
                     % 1024 AS bucket,
                   33 - length(bin(
                     {_hex_bigint("md5(CAST(user_id AS VARCHAR))", 9, 8)}
                   )) AS rho
            FROM events)
          GROUP BY 1, 2),
        days AS (SELECT DISTINCT day FROM dr),
        mg AS (
          SELECT d.day, w.bucket, max(w.reg) AS reg_w,
                 max(CASE WHEN w.day = d.day THEN w.reg END) AS reg_d
          FROM days d JOIN dr w ON w.day BETWEEN d.day - 6 AND d.day
          GROUP BY 1, 2),
        p AS (
          SELECT day,
                 CAST(1 AS BIGINT) << CAST(32 - reg_w AS INT) AS pw,
                 CAST(1 AS BIGINT) << CAST(32 - reg_d AS INT) AS pd
          FROM mg),
        s AS (
          SELECT day, count(pw) AS mw_obs, sum(pw) AS sw_obs,
                 count(pd) AS md_obs, sum(pd) AS sd_obs
          FROM p GROUP BY 1)
        SELECT day,
               {pround_sql(_hll1024_est('md_obs', 'sd_obs'), 4)}
                 AS dau_approx,
               {pround_sql(_hll1024_est('mw_obs', 'sw_obs'), 4)}
                 AS wau_7d_approx
        FROM s
    """,
    "q_union_schema_evolution": """
        SELECT doc_id, lang, NULL AS source, NULL AS n_chars
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, NULL AS lang, source, n_chars
        FROM documents WHERE doc_id % 2 = 1
    """,
})


# q_sql_interface: the oracle IS the query text — one engine-portable SQL
# statement valid under both Spark SQL and DuckDB (kept in sync with
# queries.PORTABLE_STAR_SQL by tests/test_contract.py).
ORACLES.update({
    "q_sql_interface": """
    SELECT r_name, n_name, CAST(year(o_orderdate) AS INT) AS order_year,
           count(*) AS n_lines,
           (CAST(sum(CAST(floor(((l_extendedprice * (1.0 - l_discount))
                 * 10000.0) + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0)
             AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name, order_year
""",
})


# ---------------------------------------------------------------------------
# Integer-pinned Lloyd's k-means (round 5): the SQL twin of
# operators/kmeans.py kmeans_fit_int — quantize to micro-units, exact
# bigint distances, floor-divided integer means, md5-ordered seeds —
# unrolled one CTE chain per Lloyd round.  Bit-identical training lets
# q_kmeans_cells / q_vector_topk_ivf_trained leave the rows-only set.
# ---------------------------------------------------------------------------

def _kmeans_int_ctes(
    k: int,
    iters: int,
    prefix: str = "",
    pos_lo: int | None = None,
    pos_hi: int | None = None,
    x_src: str | None = None,
    seed_where: str | None = None,
) -> str:
    """CTE chain ending in {prefix}a{iters+1} (assignment under the FINAL
    model {prefix}c{iters}) and {prefix}d{iters+1} (exact per-vector
    squared distance to every cell of the final model).  The floor
    division uses the pinned non-negative-remainder form
    ``(sx - ((sx % n) + n) % n) // n`` — identical to Python's ``//`` on
    the Spark driver.  ``prefix`` + the half-open component window
    [pos_lo, pos_hi) let several INDEPENDENT chains coexist in one query
    — the product-quantization oracle trains one sub-quantizer per
    subspace slice (positions rebased to 0 so the chain is
    self-contained); defaults reproduce the original whole-vector
    chain.  ``x_src`` names an EARLIER CTE providing (vec_id, pos, xi)
    long form to train on instead of the embeddings table — the IVF-PQ
    residual trainer's input (seeds still order by md5 over the
    embeddings ids: same id set).  ``seed_where`` filters the seed
    candidate ids — REQUIRED whenever the training input is a strict
    subset of the embeddings ids (sample-then-train), so the seeds come
    from the sample like Spark's trainer-on-a-filtered-frame does."""
    fdiv = "CAST((sx - ((sx % n) + n) % n) // n AS BIGINT)"
    z = prefix
    base_x = (
        f"SELECT vec_id, pos, xi FROM {x_src}"
        if x_src is not None
        else "SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,"
        " CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5)"
        " AS BIGINT) AS xi FROM embeddings"
    )
    if pos_lo is not None or pos_hi is not None:
        # generate_subscripts/unnest cannot appear in WHERE — slice in
        # an outer select and rebase the subspace positions to 0
        lo = pos_lo or 0
        conds = []
        if pos_lo is not None:
            conds.append(f"pos >= {lo}")
        if pos_hi is not None:
            conds.append(f"pos < {pos_hi}")
        x_cte = (
            f"{z}x AS MATERIALIZED (SELECT vec_id, pos - {lo} AS pos, xi"
            f" FROM ({base_x}) WHERE {' AND '.join(conds)})"
        )
    else:
        x_cte = f"{z}x AS MATERIALIZED ({base_x})"
    parts = [
        # micro-unit quantization: per-component floor(x·1e6 + 0.5)
        x_cte,
        # seeds: k vectors whose (md5(id), id) sorts first; cell = rank-1
        f"{z}seeds AS MATERIALIZED (SELECT vec_id, CAST(row_number() OVER ("
        f"ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cell"
        f" FROM embeddings"
        + (f" WHERE {seed_where}" if seed_where else "")
        + f" ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})",
        f"{z}c0 AS MATERIALIZED (SELECT s.cell, x.pos, x.xi AS ci"
        f" FROM {z}seeds s JOIN {z}x x USING (vec_id))",
    ]
    for t in range(1, iters + 2):
        p = t - 1
        parts.append(
            f"{z}d{t} AS MATERIALIZED (SELECT x.vec_id, c.cell,"
            f" sum((x.xi - c.ci) * (x.xi - c.ci)) AS d"
            f" FROM {z}x x JOIN {z}c{p} c ON x.pos = c.pos GROUP BY 1, 2)"
        )
        parts.append(
            f"{z}a{t} AS MATERIALIZED (SELECT vec_id, cell FROM ("
            f"SELECT vec_id, cell, row_number() OVER ("
            f"PARTITION BY vec_id ORDER BY d, cell) AS rn FROM {z}d{t})"
            f" WHERE rn = 1)"
        )
        if t <= iters:
            parts.append(
                f"{z}m{t} AS MATERIALIZED (SELECT a.cell, x.pos, sum(x.xi) AS sx,"
                f" count(*) AS n"
                f" FROM {z}a{t} a JOIN {z}x x USING (vec_id) GROUP BY 1, 2)"
            )
            parts.append(
                f"{z}c{t} AS MATERIALIZED (SELECT cell, pos, {fdiv} AS ci FROM {z}m{t}"
                f" UNION ALL SELECT c.cell, c.pos, c.ci FROM {z}c{p} c"
                f" WHERE c.cell NOT IN (SELECT cell FROM {z}m{t}))"
            )
    return ",\n        ".join(parts)


ORACLES.update({
    "q_kmeans_cells": f"""
        WITH {_kmeans_int_ctes(8, 3)}
        SELECT CAST(a.cell AS BIGINT) AS cell,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(sum(d.d) AS BIGINT) AS sum_sq_dist
        FROM a4 a JOIN d4 d ON a.vec_id = d.vec_id AND a.cell = d.cell
        GROUP BY 1
    """,
    "q_vector_topk_ivf": f"""
        WITH x AS (SELECT vec_id,
                 generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                      + 0.5) AS BIGINT) AS xi FROM embeddings),
        qm AS (SELECT pos, xi AS qi FROM x WHERE vec_id = 0),
        cents AS (
          SELECT label, pos,
                 CAST((sx - ((sx % n) + n) % n) // n AS BIGINT) AS ci
          FROM (SELECT e.label, x.pos, sum(x.xi) AS sx, count(*) AS n
                FROM x JOIN embeddings e USING (vec_id) GROUP BY 1, 2)),
        probe AS (
          SELECT label FROM (
            SELECT c.label, sum((c.ci - qm.qi) * (c.ci - qm.qi)) AS d
            FROM cents c JOIN qm USING (pos) GROUP BY 1)
          ORDER BY d, label LIMIT 2),
        cand AS (SELECT e.vec_id FROM embeddings e JOIN probe USING (label)),
        {_cosine_scored_ctes()}
        SELECT vec_id, cosine FROM scored JOIN cand USING (vec_id)
        ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
    "q_ivf_recall": f"""
        WITH x AS (SELECT vec_id,
                 generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                      + 0.5) AS BIGINT) AS xi FROM embeddings),
        qm AS (SELECT pos, xi AS qi FROM x WHERE vec_id = 0),
        cents AS (
          SELECT label, pos,
                 CAST((sx - ((sx % n) + n) % n) // n AS BIGINT) AS ci
          FROM (SELECT e.label, x.pos, sum(x.xi) AS sx, count(*) AS n
                FROM x JOIN embeddings e USING (vec_id) GROUP BY 1, 2)),
        probe AS (
          SELECT label FROM (
            SELECT c.label, sum((c.ci - qm.qi) * (c.ci - qm.qi)) AS d
            FROM cents c JOIN qm USING (pos) GROUP BY 1)
          ORDER BY d, label LIMIT 2),
        cand AS (SELECT e.vec_id FROM embeddings e JOIN probe USING (label)),
        {_cosine_scored_ctes()},
        ivf AS (
          SELECT vec_id FROM scored JOIN cand USING (vec_id)
          ORDER BY cosine DESC, vec_id ASC LIMIT 10),
        exact AS (
          SELECT vec_id FROM scored
          ORDER BY cosine DESC, vec_id ASC LIMIT 10)
        SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
          (SELECT CAST(count(*) AS BIGINT) FROM ivf) AS n_ivf,
          (SELECT CAST(count(*) AS BIGINT)
           FROM exact JOIN ivf USING (vec_id)) AS n_overlap,
          CAST((SELECT count(*) FROM exact JOIN ivf USING (vec_id))
               AS DOUBLE) / 10.0 AS recall_at_10
    """,
    "q_vector_topk_ivf_trained": f"""
        WITH {_kmeans_int_ctes(8, 2)},
        qm AS (SELECT pos, xi AS qi FROM x WHERE vec_id = 0),
        cd AS (SELECT c.cell, sum((c.ci - qm.qi) * (c.ci - qm.qi)) AS d
               FROM c2 c JOIN qm USING (pos) GROUP BY 1),
        probe AS (SELECT cell FROM cd ORDER BY d, cell LIMIT 3),
        cand AS (SELECT a.vec_id FROM a3 a JOIN probe USING (cell)),
        {_cosine_scored_ctes()}
        SELECT vec_id, cosine FROM scored JOIN cand USING (vec_id)
        ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
})


# Product quantization (Jegou 2011) — four INDEPENDENT prefixed Lloyd
# chains, one per rebased 16-dim subspace slice; codes = the final
# assignment a3, per-subspace quantization error = d3 at the assigned
# cell; ADC re-derives the query's 4x16 distance table in SQL from the
# final models c2 and the query's subvectors.
_PQ_CHAINS = ",\n        ".join(
    _kmeans_int_ctes(16, 2, prefix=f"s{s}", pos_lo=s * 16, pos_hi=(s + 1) * 16)
    for s in range(4)
)

ORACLES.update({
    "q_pq_encode": f"""
        WITH {_PQ_CHAINS},
        e0 AS (SELECT a.vec_id, a.cell, d.d FROM s0a3 a
               JOIN s0d3 d ON a.vec_id = d.vec_id AND a.cell = d.cell),
        e1 AS (SELECT a.vec_id, a.cell, d.d FROM s1a3 a
               JOIN s1d3 d ON a.vec_id = d.vec_id AND a.cell = d.cell),
        e2 AS (SELECT a.vec_id, a.cell, d.d FROM s2a3 a
               JOIN s2d3 d ON a.vec_id = d.vec_id AND a.cell = d.cell),
        e3 AS (SELECT a.vec_id, a.cell, d.d FROM s3a3 a
               JOIN s3d3 d ON a.vec_id = d.vec_id AND a.cell = d.cell)
        SELECT e0.vec_id,
               CAST(e0.cell AS INT) AS code0, CAST(e1.cell AS INT) AS code1,
               CAST(e2.cell AS INT) AS code2, CAST(e3.cell AS INT) AS code3,
               CAST(e0.d + e1.d + e2.d + e3.d AS BIGINT) AS qerr
        FROM e0 JOIN e1 USING (vec_id) JOIN e2 USING (vec_id)
             JOIN e3 USING (vec_id)
    """,
    "q_pq_adc_topk": f"""
        WITH {_PQ_CHAINS},
        q0 AS (SELECT pos, xi AS qi FROM s0x WHERE vec_id = 0),
        q1 AS (SELECT pos, xi AS qi FROM s1x WHERE vec_id = 0),
        q2 AS (SELECT pos, xi AS qi FROM s2x WHERE vec_id = 0),
        q3 AS (SELECT pos, xi AS qi FROM s3x WHERE vec_id = 0),
        t0 AS (SELECT c.cell, sum((c.ci - q.qi) * (c.ci - q.qi)) AS d
               FROM s0c2 c JOIN q0 q USING (pos) GROUP BY 1),
        t1 AS (SELECT c.cell, sum((c.ci - q.qi) * (c.ci - q.qi)) AS d
               FROM s1c2 c JOIN q1 q USING (pos) GROUP BY 1),
        t2 AS (SELECT c.cell, sum((c.ci - q.qi) * (c.ci - q.qi)) AS d
               FROM s2c2 c JOIN q2 q USING (pos) GROUP BY 1),
        t3 AS (SELECT c.cell, sum((c.ci - q.qi) * (c.ci - q.qi)) AS d
               FROM s3c2 c JOIN q3 q USING (pos) GROUP BY 1)
        SELECT a0.vec_id,
               CAST(t0.d + t1.d + t2.d + t3.d AS BIGINT) AS adc_dist
        FROM s0a3 a0 JOIN s1a3 a1 USING (vec_id)
             JOIN s2a3 a2 USING (vec_id) JOIN s3a3 a3_ USING (vec_id)
             JOIN t0 ON t0.cell = a0.cell
             JOIN t1 ON t1.cell = a1.cell
             JOIN t2 ON t2.cell = a2.cell
             JOIN t3 ON t3.cell = a3_.cell
        WHERE a0.vec_id != 0
        ORDER BY adc_dist, a0.vec_id LIMIT 10
    """,
})

# TPC-H refresh stream RF1/RF2 (mirrors queries.q_tpch_refresh):
# modulus delete, re-keyed +1-day insert copy, before/after audit.
ORACLES.update({
    "q_tpch_refresh": """
        WITH od AS (
          SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
                 o_orderpriority,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS cents
          FROM orders),
        ins AS (
          SELECT o_orderkey + 10000000000 AS o_orderkey,
                 d + INTERVAL 1 DAY AS d, o_orderpriority, cents
          FROM od WHERE o_orderkey % 100 = 0),
        upd AS (
          SELECT * FROM od WHERE o_orderkey % 97 != 0
          UNION ALL SELECT * FROM ins),
        base AS (
          SELECT CAST(year(d) AS INT) AS order_year,
                 o_orderpriority AS priority,
                 CAST(count(*) AS BIGINT) AS n_base,
                 CAST(sum(cents) AS BIGINT) AS cents_base
          FROM od GROUP BY 1, 2),
        after AS (
          SELECT CAST(year(d) AS INT) AS order_year,
                 o_orderpriority AS priority,
                 CAST(count(*) AS BIGINT) AS n_updated,
                 CAST(sum(cents) AS BIGINT) AS cents_updated
          FROM upd GROUP BY 1, 2)
        SELECT order_year, priority,
               CAST(coalesce(n_base, 0) AS BIGINT) AS n_base,
               CAST(coalesce(n_updated, 0) AS BIGINT) AS n_updated,
               CAST(coalesce(n_updated, 0) - coalesce(n_base, 0)
                    AS BIGINT) AS delta_rows,
               CAST(coalesce(cents_base, 0) AS BIGINT) AS cents_base,
               CAST(coalesce(cents_updated, 0) AS BIGINT)
                 AS cents_updated
        FROM base FULL JOIN after USING (order_year, priority)
    """,
})


# SCD2 dimension build (mirrors queries.q_scd2_build): change
# collapsing via lag, dense versions via running sum, intervals via
# lead over the version grain.
ORACLES.update({
    "q_scd2_build": """
        WITH ev AS (
          SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
                 event_id, event_type AS attr
          FROM events WHERE user_id % 7 = 0),
        marked AS (
          SELECT *, CASE WHEN lag(attr) OVER w IS NULL
                          OR lag(attr) OVER w != attr
                     THEN 1 ELSE 0 END AS chg
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)),
        grp AS (
          SELECT *, sum(chg) OVER (PARTITION BY user_id
                   ORDER BY s, event_id
                   ROWS UNBOUNDED PRECEDING) AS ver
          FROM marked),
        versions AS (
          SELECT user_id, ver, min(attr) AS attr,
                 CAST(min(s) AS BIGINT) AS valid_from_s,
                 CAST(count(*) AS BIGINT) AS n_source_rows
          FROM grp GROUP BY 1, 2)
        SELECT user_id, CAST(ver AS INT) AS version, attr,
               valid_from_s,
               lead(valid_from_s) OVER w2 AS valid_to_s,
               lead(valid_from_s) OVER w2 IS NULL AS is_current,
               n_source_rows
        FROM versions
        WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from_s, ver)
    """,
})


# Padding-waste analysis (mirrors queries.q_padding_waste): exact
# integer ceil arithmetic at max_len=128, bucketed + corpus totals.
ORACLES.update({
    "q_padding_waste": f"""
        WITH d AS (SELECT {_N_TOKENS} AS n_tok FROM documents),
        per AS (
          SELECT n_tok // 128 AS bucket, n_tok,
                 ((n_tok + 127) // 128) * 128 AS padded
          FROM d WHERE n_tok > 0),
        g AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tok) AS BIGINT) AS tokens,
                 CAST(sum(padded) AS BIGINT) AS padded_tokens
          FROM per GROUP BY 1),
        t AS (
          SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
                 CAST(sum(padded_tokens) AS BIGINT) AS total_padded
          FROM g)
        SELECT CAST(bucket AS BIGINT) AS bucket, n_docs, tokens,
               padded_tokens,
               {pround_sql(
                   'CAST(padded_tokens - tokens AS DOUBLE)'
                   ' / CAST(padded_tokens AS DOUBLE)', 6)}
                 AS waste_share,
               total_tokens, total_padded,
               CAST((total_tokens + 127) // 128 AS BIGINT)
                 AS packed_rows
        FROM g, t
    """,
})

# Deterministic negative sampling (mirrors queries.q_negative_sampling):
# sampled-user x bounded-item grid, anti-join interactions, md5 rank.
ORACLES.update({
    "q_negative_sampling": """
        WITH inter AS (
          SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          WHERE o_custkey % 100 = 0 AND l_partkey % 10 = 0),
        users AS (
          SELECT DISTINCT o_custkey AS custkey FROM orders
          WHERE o_custkey % 100 = 0),
        items AS (SELECT p_partkey AS partkey FROM part
                  WHERE p_partkey % 10 = 0),
        neg AS (
          SELECT u.custkey, it.partkey
          FROM users u, items it
          WHERE NOT EXISTS (
            SELECT 1 FROM inter i
            WHERE i.custkey = u.custkey AND i.partkey = it.partkey)),
        r AS (
          SELECT custkey, partkey,
                 row_number() OVER (PARTITION BY custkey
                   ORDER BY md5(concat_ws('|', custkey, partkey)),
                            partkey) AS rank
          FROM neg)
        SELECT custkey, partkey, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= 3
    """,
})

# Hard-negative mining (mirrors queries.q_hard_negatives): 5 probes,
# exact integer L2, different-label top-3 each.
ORACLES.update({
    "q_hard_negatives": """
        WITH x AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS xi
          FROM embeddings),
        lab AS (SELECT vec_id, label FROM embeddings),
        px AS (SELECT vec_id, pos, xi FROM x WHERE vec_id < 5),
        dd AS (
          SELECT px.vec_id AS probe_id, cx.vec_id,
                 CAST(sum((cx.xi - px.xi) * (cx.xi - px.xi)) AS BIGINT)
                   AS d_micro2
          FROM x cx JOIN px ON px.pos = cx.pos
          GROUP BY 1, 2),
        f AS (
          SELECT dd.probe_id, dd.vec_id, cl.label, dd.d_micro2,
                 row_number() OVER (PARTITION BY dd.probe_id
                   ORDER BY dd.d_micro2, dd.vec_id) AS rn
          FROM dd
          JOIN lab pl ON pl.vec_id = dd.probe_id
          JOIN lab cl ON cl.vec_id = dd.vec_id
          WHERE cl.label != pl.label AND dd.vec_id != dd.probe_id)
        SELECT CAST(probe_id AS BIGINT) AS probe_id, vec_id, label,
               d_micro2
        FROM f WHERE rn <= 3
    """,
})


# Embedding-drift monitor (mirrors queries.q_embed_drift): vec_id
# parity split, floor-div integer micro-unit means, top-10 by |delta|.
ORACLES.update({
    "q_embed_drift": f"""
        WITH x AS (
          SELECT CASE WHEN vec_id % 2 = 0 THEN 'ref' ELSE 'cur' END
                   AS side,
                 generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS xi
          FROM embeddings),
        per AS (
          SELECT side, pos,
                 CAST((sx - ((sx % n) + n) % n) // n AS BIGINT)
                   AS mean_micro
          FROM (SELECT side, pos, sum(xi) AS sx, count(*) AS n
                FROM x GROUP BY 1, 2)),
        wide AS (
          SELECT pos,
                 max(CASE WHEN side = 'ref' THEN mean_micro END)
                   AS ref_micro,
                 max(CASE WHEN side = 'cur' THEN mean_micro END)
                   AS cur_micro
          FROM per GROUP BY 1),
        d AS (
          SELECT pos, ref_micro, cur_micro,
                 abs(cur_micro - ref_micro) AS abs_delta
          FROM wide),
        t AS (SELECT CAST(sum(abs_delta * abs_delta) AS BIGINT)
                AS total_sq FROM d)
        SELECT pos, ref_micro, cur_micro, abs_delta,
               {pround_sql(
                   'CAST(abs_delta * abs_delta AS DOUBLE)'
                   ' / CAST(total_sq AS DOUBLE)', 6)} AS share_of_shift
        FROM d, t
        ORDER BY abs_delta DESC, pos LIMIT 10
    """,
})

# Fairness disparate-impact audit (mirrors queries.q_fairness_parity):
# nation selection rates, deterministic arg-max reference, exact
# integer cross-multiplied 80%-rule flag.
ORACLES.update({
    "q_fairness_parity": f"""
        WITH g AS (
          SELECT c_nationkey,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN o_orderpriority IN
                      ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                      AS BIGINT) AS positives
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1),
        ref AS (
          SELECT positives AS pos_max, n AS n_max FROM g
          ORDER BY CAST(positives AS DOUBLE) / CAST(n AS DOUBLE) DESC,
                   c_nationkey ASC
          LIMIT 1)
        SELECT c_nationkey, n, positives,
               {pround_sql(
                   'CAST(positives AS DOUBLE) / CAST(n AS DOUBLE)', 6)}
                 AS selection_rate,
               {pround_sql(
                   '(CAST(positives AS DOUBLE) / CAST(n AS DOUBLE))'
                   ' / (CAST(pos_max AS DOUBLE)'
                   ' / CAST(n_max AS DOUBLE))', 6)} AS di_ratio,
               5 * positives * n_max < 4 * pos_max * n
                 AS below_80pct_rule
        FROM g, ref
    """,
})


# Content-defined chunking (mirrors queries.q_cdc_chunking): boundary
# after any token with hash % 16 == 0; a token's chunk index is the
# count of boundaries strictly before its position; identical md5
# chunk identities and the identical 1-row dedup-mass summary.
ORACLES.update({
    "q_cdc_chunking": f"""
        WITH d AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
          WHERE trim(text) != ''),
        tok AS (
          SELECT doc_id, unnest(toks) AS t,
                 generate_subscripts(toks, 1) AS pos
          FROM d),
        hb AS (
          SELECT doc_id, pos, t,
                 {_hex_bigint('md5(t)', 1, 8)} % 16 AS h
          FROM tok),
        cid AS (
          SELECT doc_id, pos, t,
                 coalesce(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS chunk_no
          FROM hb),
        chunks AS (
          SELECT doc_id, chunk_no,
                 CAST(count(*) AS BIGINT) AS n_tok,
                 md5(string_agg(t, ' ' ORDER BY pos)) AS chunk_hash
          FROM cid GROUP BY 1, 2),
        grp AS (
          SELECT chunk_hash, CAST(count(*) AS BIGINT) AS c,
                 CAST(max(n_tok) AS BIGINT) AS tok
          FROM chunks GROUP BY 1),
        s AS (
          SELECT CAST(sum(c) AS BIGINT) AS n_chunks,
                 CAST(count(*) AS BIGINT) AS n_distinct_chunks,
                 CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)
                      AS BIGINT) AS dup_chunk_copies,
                 CAST(sum(CASE WHEN c > 1 THEN (c - 1) * tok
                          ELSE 0 END) AS BIGINT) AS dup_token_mass,
                 CAST(sum(c * tok) AS BIGINT) AS tok_tot
          FROM grp),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d)
        SELECT n_docs, n_chunks, n_distinct_chunks, dup_chunk_copies,
               dup_token_mass,
               {pround_sql(
                   'CAST(tok_tot AS DOUBLE)'
                   ' / CAST(n_chunks AS DOUBLE)', 6)}
                 AS mean_chunk_tokens
        FROM s, nd
    """,
})


# Blocking-quality eval (mirrors queries.q_blocking_quality): exact
# Jaccard >= 1/2 truth pairs over min-id representatives vs the LSH
# banding candidates; PC and RR as pinned divisions of exact counts.
# Truth side runs on the COUNT-bounded deterministic sample mirroring
# queries._truth_sample (smallest-1024 md5(doc_id), tie-break doc_id).
_TRUTH_SAMPLE_CTE = """
        samp AS (SELECT doc_id FROM (
          SELECT doc_id FROM uniq
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 1024))"""

ORACLES.update({
    "q_blocking_quality": f"""
        WITH uniq AS (
          SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
        ),
        {_TRUTH_SAMPLE_CTE},
        tdocs AS (SELECT u.doc_id, {_TOKENS} AS toks
                  FROM uniq u JOIN samp USING (doc_id)),
        tsh AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' '
                             || toks[i+2])
            END)) AS sh FROM tdocs
        ),
        tsizes AS (SELECT doc_id, count(*) AS n_sh FROM tsh
                   GROUP BY doc_id),
        tinter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 count(*) AS n_inter
          FROM tsh a JOIN tsh b
            ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        truth AS (
          SELECT id_a, id_b FROM tinter
          JOIN tsizes sa ON sa.doc_id = id_a
          JOIN tsizes sb ON sb.doc_id = id_b
          WHERE 2 * n_inter >= (sa.n_sh + sb.n_sh - n_inter)),
        {_lsh_bands_cte("uniq")},
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket
           AND a.doc_id < b.doc_id),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM uniq),
        sn AS (SELECT CAST(count(*) AS BIGINT) AS sampled_docs
               FROM samp),
        tc AS (SELECT CAST(count(*) AS BIGINT) AS true_pairs FROM truth),
        cc AS (SELECT CAST(count(*) AS BIGINT) AS candidate_pairs
               FROM cand),
        gc AS (SELECT CAST(count(*) AS BIGINT) AS caught_pairs
               FROM truth JOIN cand USING (id_a, id_b))
        SELECT n_docs, sampled_docs, true_pairs, candidate_pairs,
               caught_pairs,
               {pround_sql(
                   'CASE WHEN true_pairs > 0'
                   ' THEN CAST(caught_pairs AS DOUBLE)'
                   ' / CAST(true_pairs AS DOUBLE) END', 6)}
                 AS pair_completeness,
               {pround_sql(
                   '1.0 - CAST(candidate_pairs AS DOUBLE)'
                   ' / CAST(n_docs * (n_docs - 1) // 2 AS DOUBLE)', 6)}
                 AS reduction_ratio
        FROM nn, sn, tc, cc, gc
    """,
    "q_dedup_cluster_quality": f"""
        WITH RECURSIVE uniq AS (
          SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
        ),
        {_TRUTH_SAMPLE_CTE},
        tdocs AS (SELECT u.doc_id, {_TOKENS} AS toks
                  FROM uniq u JOIN samp USING (doc_id)),
        tsh AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' '
                             || toks[i+2])
            END)) AS sh FROM tdocs
        ),
        tsizes AS (SELECT doc_id, count(*) AS n_sh FROM tsh
                   GROUP BY doc_id),
        tinter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 count(*) AS n_inter
          FROM tsh a JOIN tsh b
            ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        truth AS (
          SELECT id_a, id_b FROM tinter
          JOIN tsizes sa ON sa.doc_id = id_a
          JOIN tsizes sb ON sb.doc_id = id_b
          WHERE 2 * n_inter >= (sa.n_sh + sb.n_sh - n_inter)),
        {_lsh_bands_cte("uniq")},
        be AS (
          SELECT doc_id, min(doc_id) OVER (PARTITION BY band, bucket)
                 AS root
          FROM bands),
        star AS (
          SELECT DISTINCT root AS id_a, doc_id AS id_b FROM be
          WHERE doc_id > root),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM star
          UNION
          SELECT id_b AS src, id_a AS dst FROM star),
        cc AS (
          SELECT DISTINCT src AS node, src AS comp FROM edges
          UNION
          SELECT e.dst AS node, cc.comp AS comp
          FROM cc JOIN edges e ON e.src = cc.node
          WHERE cc.comp < e.dst),
        comp AS (SELECT node, min(comp) AS component FROM cc
                 GROUP BY node),
        pred AS (
          SELECT CAST(coalesce(sum(s * (s - 1) // 2), 0) AS BIGINT)
                 AS predicted_pairs
          FROM (SELECT component, count(*) AS s
                FROM comp JOIN samp ON samp.doc_id = comp.node
                GROUP BY 1) z),
        sn AS (SELECT CAST(count(*) AS BIGINT) AS sampled_docs
               FROM samp),
        tpr AS (
          SELECT CAST(count(*) AS BIGINT) AS tp_pairs
          FROM truth t
          JOIN comp a ON a.node = t.id_a
          JOIN comp b ON b.node = t.id_b
                     AND a.component = b.component),
        tc AS (SELECT CAST(count(*) AS BIGINT) AS true_pairs FROM truth)
        SELECT sampled_docs, true_pairs, predicted_pairs, tp_pairs,
               {pround_sql(
                   'CASE WHEN predicted_pairs > 0'
                   ' THEN CAST(tp_pairs AS DOUBLE)'
                   ' / CAST(predicted_pairs AS DOUBLE) END', 6)}
                 AS pair_precision,
               {pround_sql(
                   'CASE WHEN true_pairs > 0'
                   ' THEN CAST(tp_pairs AS DOUBLE)'
                   ' / CAST(true_pairs AS DOUBLE) END', 6)}
                 AS pair_recall,
               {pround_sql(
                   'CASE WHEN predicted_pairs + true_pairs > 0'
                   ' THEN 2.0 * CAST(tp_pairs AS DOUBLE)'
                   ' / CAST(predicted_pairs + true_pairs AS DOUBLE) END',
                   6)}
                 AS pair_f1
        FROM sn, tc, pred, tpr
    """,
})


# ColBERT-style MaxSim late interaction (mirrors
# queries.q_maxsim_late_interaction): 4x16 sub-vector slices, exact
# int64 micro-unit dots, per-query-token max, summed, top-10.
ORACLES.update({
    "q_maxsim_late_interaction": """
        WITH x AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS xi
          FROM embeddings),
        sub AS (
          SELECT vec_id, CAST(pos // 16 AS INT) AS s, pos % 16 AS p, xi
          FROM x),
        qm AS (SELECT s, p, xi AS qi FROM sub WHERE vec_id = 0),
        dots AS (
          SELECT d.vec_id, q.s AS qs, d.s AS ds,
                 CAST(sum(d.xi * q.qi) AS BIGINT) AS dot
          FROM sub d JOIN qm q ON q.p = d.p
          WHERE d.vec_id != 0
          GROUP BY 1, 2, 3),
        best AS (
          SELECT vec_id, qs, max(dot) AS b
          FROM dots GROUP BY 1, 2),
        scored AS (
          SELECT vec_id, CAST(sum(b) AS BIGINT) AS maxsim_micro2
          FROM best GROUP BY 1)
        SELECT vec_id, maxsim_micro2 FROM scored
        ORDER BY maxsim_micro2 DESC, vec_id LIMIT 10
    """,
})


# Sample-then-train PQ (mirrors queries.q_pq_train_sampled): the four
# prefixed Lloyd chains train on the deterministic 25% sample (x AND
# seeds filtered to vec_id % 4 = 0), then the FULL corpus encodes
# against the sampled-trained final models and recall@10 of the ADC
# list vs the exact integer L2 list is the output.
_PQ_SAMPLED_CHAINS = ",\n        ".join(
    _kmeans_int_ctes(
        16, 2, prefix=f"p{s}", pos_lo=s * 16, pos_hi=(s + 1) * 16,
        x_src="sampx", seed_where="vec_id % 4 = 0",
    )
    for s in range(4)
)


def _pq_train_sampled_oracle() -> str:
    enc = ",\n        ".join(
        f"""e{s} AS MATERIALIZED (
          SELECT f.vec_id, c.cell,
                 sum((f.xi - c.ci) * (f.xi - c.ci)) AS d
          FROM (SELECT vec_id, pos - {s * 16} AS pos, xi FROM fx
                WHERE pos >= {s * 16} AND pos < {(s + 1) * 16}) f
          JOIN p{s}c2 c ON c.pos = f.pos GROUP BY 1, 2),
        g{s} AS MATERIALIZED (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (
              PARTITION BY vec_id ORDER BY d, cell) AS rn FROM e{s})
          WHERE rn = 1),
        t{s} AS (
          SELECT c.cell, sum((c.ci - q.qi) * (c.ci - q.qi)) AS d
          FROM p{s}c2 c JOIN (SELECT pos, xi AS qi FROM p{s}x
                              WHERE vec_id = 0) q
            ON c.pos = q.pos
          GROUP BY 1)"""
        for s in range(4)
    )
    return f"""
        WITH sampx AS MATERIALIZED (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS xi
          FROM embeddings WHERE vec_id % 4 = 0),
        {_PQ_SAMPLED_CHAINS},
        fx AS MATERIALIZED (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS xi
          FROM embeddings),
        {enc},
        scored AS (
          SELECT g0.vec_id,
                 CAST(t0.d + t1.d + t2.d + t3.d AS BIGINT) AS adc_dist
          FROM g0 JOIN g1 USING (vec_id) JOIN g2 USING (vec_id)
               JOIN g3 USING (vec_id)
               JOIN t0 ON t0.cell = g0.cell
               JOIN t1 ON t1.cell = g1.cell
               JOIN t2 ON t2.cell = g2.cell
               JOIN t3 ON t3.cell = g3.cell
          WHERE g0.vec_id != 0),
        adck AS (SELECT vec_id FROM scored
                 ORDER BY adc_dist, vec_id LIMIT 10),
        qm AS (SELECT pos, xi AS qi FROM fx WHERE vec_id = 0),
        exactk AS (
          SELECT vec_id FROM (
            SELECT f.vec_id, sum((f.xi - q.qi) * (f.xi - q.qi)) AS d
            FROM fx f JOIN qm q USING (pos)
            WHERE f.vec_id != 0 GROUP BY 1
            ORDER BY d, f.vec_id LIMIT 10) z),
        h AS (SELECT CAST(count(*) AS BIGINT) AS hits
              FROM exactk JOIN adck USING (vec_id))
        SELECT CAST(4 AS INT) AS sample_mod, CAST(10 AS INT) AS k, hits,
               {pround_sql('CAST(hits AS DOUBLE) / 10.0', 6)} AS recall
        FROM h
    """


ORACLES.update({"q_pq_train_sampled": _pq_train_sampled_oracle()})


# IVF-PQ / IVFADC (Jegou 2011 SIV): coarse chain (default prefix) ->
# residual long form -> four residual-sourced prefixed chains (x_src) ->
# probe + per-probed-cell ADC tables on the query residual.
_IVFPQ_RES_CHAINS = ",\n        ".join(
    _kmeans_int_ctes(
        16, 2, prefix=f"r{s}", pos_lo=s * 16, pos_hi=(s + 1) * 16,
        x_src="res",
    )
    for s in range(4)
)

ORACLES.update({
    "q_ivfpq_topk": f"""
        WITH {_kmeans_int_ctes(8, 2)},
        res AS MATERIALIZED (SELECT x.vec_id, x.pos, x.xi - c.ci AS xi
                FROM x JOIN a3 a USING (vec_id)
                     JOIN c2 c ON c.cell = a.cell AND c.pos = x.pos),
        {_IVFPQ_RES_CHAINS},
        qm AS (SELECT pos, xi AS qi FROM x WHERE vec_id = 0),
        cd AS (SELECT c.cell, sum((c.ci - qm.qi) * (c.ci - qm.qi)) AS d
               FROM c2 c JOIN qm USING (pos) GROUP BY 1),
        probe AS (SELECT cell FROM cd ORDER BY d, cell LIMIT 3),
        qr AS (SELECT c.cell AS pc, c.pos, q.qi - c.ci AS qi
               FROM c2 c JOIN qm q USING (pos)
                    JOIN probe p ON p.cell = c.cell),
        qr0 AS (SELECT pc, pos - 0 AS pos, qi FROM qr
                WHERE pos >= 0 AND pos < 16),
        qr1 AS (SELECT pc, pos - 16 AS pos, qi FROM qr
                WHERE pos >= 16 AND pos < 32),
        qr2 AS (SELECT pc, pos - 32 AS pos, qi FROM qr
                WHERE pos >= 32 AND pos < 48),
        qr3 AS (SELECT pc, pos - 48 AS pos, qi FROM qr
                WHERE pos >= 48 AND pos < 64),
        t0 AS (SELECT q.pc, c.cell, sum((c.ci - q.qi) * (c.ci - q.qi))
                 AS d
               FROM r0c2 c JOIN qr0 q USING (pos) GROUP BY 1, 2),
        t1 AS (SELECT q.pc, c.cell, sum((c.ci - q.qi) * (c.ci - q.qi))
                 AS d
               FROM r1c2 c JOIN qr1 q USING (pos) GROUP BY 1, 2),
        t2 AS (SELECT q.pc, c.cell, sum((c.ci - q.qi) * (c.ci - q.qi))
                 AS d
               FROM r2c2 c JOIN qr2 q USING (pos) GROUP BY 1, 2),
        t3 AS (SELECT q.pc, c.cell, sum((c.ci - q.qi) * (c.ci - q.qi))
                 AS d
               FROM r3c2 c JOIN qr3 q USING (pos) GROUP BY 1, 2)
        SELECT a.vec_id,
               CAST(t0.d + t1.d + t2.d + t3.d AS BIGINT) AS adc_dist
        FROM a3 a JOIN probe p USING (cell)
             JOIN r0a3 e0 ON e0.vec_id = a.vec_id
             JOIN r1a3 e1 ON e1.vec_id = a.vec_id
             JOIN r2a3 e2 ON e2.vec_id = a.vec_id
             JOIN r3a3 e3 ON e3.vec_id = a.vec_id
             JOIN t0 ON t0.pc = a.cell AND t0.cell = e0.cell
             JOIN t1 ON t1.pc = a.cell AND t1.cell = e1.cell
             JOIN t2 ON t2.pc = a.cell AND t2.cell = e2.cell
             JOIN t3 ON t3.pc = a.cell AND t3.cell = e3.cell
        WHERE a.vec_id != 0
        ORDER BY adc_dist, a.vec_id LIMIT 10
    """,
})

# IVFADC+R two-stage retrieval: the IVF-PQ scoring chain with a k'=50
# shortlist (derived from the q_ivfpq_topk oracle by widening its final
# LIMIT — same training chains, same ADC tables), then exact integer
# squared-L2 re-rank of the shortlist to top-10.  Mirrors
# queries.q_ivfpq_rerank.
_IVFPQ_SHORTLIST_50 = ORACLES["q_ivfpq_topk"].replace(
    "ORDER BY adc_dist, a.vec_id LIMIT 10",
    "ORDER BY adc_dist, a.vec_id LIMIT 50",
)
assert "LIMIT 50" in _IVFPQ_SHORTLIST_50
ORACLES.update({
    "q_ivfpq_rerank": f"""
        WITH short AS MATERIALIZED (
          SELECT vec_id, adc_dist FROM ({_IVFPQ_SHORTLIST_50}) s),
        xall AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS xi
          FROM embeddings),
        qm AS (SELECT pos, xi AS qi FROM xall WHERE vec_id = 0),
        ex AS (
          SELECT x.vec_id,
                 CAST(sum((x.xi - q.qi) * (x.xi - q.qi)) AS BIGINT) AS d
          FROM xall x JOIN qm q USING (pos)
               JOIN short st ON st.vec_id = x.vec_id
          GROUP BY 1)
        SELECT s.vec_id, CAST(s.adc_dist AS BIGINT) AS adc_dist,
               e.d AS exact_dist
        FROM short s JOIN ex e ON e.vec_id = s.vec_id
        ORDER BY e.d, s.vec_id LIMIT 10
    """,
})

# PQ recall@10: the ADC list above vs the exact integer squared-L2
# top-10 — both deterministic, so the recall itself hash-checks.
ORACLES.update({
    "q_pq_recall": f"""
        WITH {_PQ_CHAINS},
        xall AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1
                   AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS xi
                 FROM embeddings),
        qm AS (SELECT pos, xi AS qi FROM xall WHERE vec_id = 0),
        ex AS (SELECT x.vec_id,
                      sum((x.xi - q.qi) * (x.xi - q.qi)) AS d
               FROM xall x JOIN qm q USING (pos)
               WHERE x.vec_id != 0 GROUP BY 1
               ORDER BY d, vec_id LIMIT 10),
        q0 AS (SELECT pos, xi AS qi FROM s0x WHERE vec_id = 0),
        q1 AS (SELECT pos, xi AS qi FROM s1x WHERE vec_id = 0),
        q2 AS (SELECT pos, xi AS qi FROM s2x WHERE vec_id = 0),
        q3 AS (SELECT pos, xi AS qi FROM s3x WHERE vec_id = 0),
        t0 AS (SELECT c.cell, sum((c.ci - q.qi) * (c.ci - q.qi)) AS d
               FROM s0c2 c JOIN q0 q USING (pos) GROUP BY 1),
        t1 AS (SELECT c.cell, sum((c.ci - q.qi) * (c.ci - q.qi)) AS d
               FROM s1c2 c JOIN q1 q USING (pos) GROUP BY 1),
        t2 AS (SELECT c.cell, sum((c.ci - q.qi) * (c.ci - q.qi)) AS d
               FROM s2c2 c JOIN q2 q USING (pos) GROUP BY 1),
        t3 AS (SELECT c.cell, sum((c.ci - q.qi) * (c.ci - q.qi)) AS d
               FROM s3c2 c JOIN q3 q USING (pos) GROUP BY 1),
        adc AS (
          SELECT a0.vec_id
          FROM s0a3 a0 JOIN s1a3 a1 USING (vec_id)
               JOIN s2a3 a2 USING (vec_id) JOIN s3a3 a3_ USING (vec_id)
               JOIN t0 ON t0.cell = a0.cell
               JOIN t1 ON t1.cell = a1.cell
               JOIN t2 ON t2.cell = a2.cell
               JOIN t3 ON t3.cell = a3_.cell
          WHERE a0.vec_id != 0
          ORDER BY CAST(t0.d + t1.d + t2.d + t3.d AS BIGINT), a0.vec_id
          LIMIT 10),
        h AS (SELECT CAST(count(*) AS BIGINT) AS hits
              FROM ex JOIN adc USING (vec_id))
        SELECT CAST(10 AS INT) AS k, hits,
               {pround_sql('CAST(hits AS DOUBLE) / 10.0', 6)} AS recall
        FROM h
    """,
})


# ---------------------------------------------------------------------------
# Round-5 additions: decontamination, quality rules, the remaining test
# family, target encoding.
# ---------------------------------------------------------------------------

# 5-word shingles with the word_shingles() short-doc fallback (whole text
# as the single shingle) — the n=5 sibling of _SHINGLES.  Lambda var j:
# never i (see _hex_bigint caveat).
_SHINGLES5 = """
  CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       ELSE list_transform(range(1, len(toks) - 3),
                           j -> toks[j] || ' ' || toks[j+1] || ' ' ||
                                toks[j+2] || ' ' || toks[j+3] || ' ' ||
                                toks[j+4])
  END
"""

ORACLES.update({
    "q_decontaminate_ngrams": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks,
                 CASE WHEN {_BUCKET} < 80 THEN 'train' ELSE 'heldout' END
                   AS split
          FROM documents WHERE trim(text) <> ''
        ),
        sh AS (
          SELECT doc_id, split, unnest(list_distinct({_SHINGLES5})) AS g
          FROM docs
        ),
        tg AS (SELECT DISTINCT g FROM sh WHERE split = 'train'),
        held AS (SELECT doc_id, g FROM sh WHERE split = 'heldout'),
        hits AS (SELECT doc_id, count(*) AS n_hit
                 FROM held JOIN tg USING (g) GROUP BY 1),
        base AS (SELECT doc_id, count(*) AS n_ngrams FROM held GROUP BY 1)
        SELECT b.doc_id,
               CAST(b.n_ngrams AS BIGINT) AS n_ngrams,
               CAST(coalesce(h.n_hit, 0) AS BIGINT)
                 AS n_contaminated_ngrams,
               coalesce(h.n_hit, 0) > 0 AS is_contaminated
        FROM base b LEFT JOIN hits h USING (doc_id)
    """,
    "q_gopher_quality_rules": f"""
        WITH d AS (
          SELECT doc_id,
                 CAST({_N_TOKENS} AS BIGINT) AS n_words,
                 CAST(length(regexp_replace(text, '\\s', '', 'g'))
                      AS BIGINT) AS sum_word_chars,
                 CAST({_hits(_STOP_EN)} AS BIGINT) AS n_stop,
                 CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                      AS BIGINT) AS n_symbols,
                 CAST(len(list_filter({_TOKENS},
                      t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT)
                   AS n_alpha_words
          FROM documents WHERE trim(text) <> ''
        )
        SELECT doc_id,
               n_words >= 30 AND n_words <= 100000 AS ok_word_count,
               sum_word_chars >= 3 * n_words
                 AND sum_word_chars <= 10 * n_words AS ok_mean_word_len,
               n_stop >= 2 AS ok_stopwords,
               10 * n_symbols <= n_words AS ok_symbol_ratio,
               10 * n_alpha_words >= 8 * n_words AS ok_alpha_words,
               (n_words >= 30 AND n_words <= 100000)
                 AND (sum_word_chars >= 3 * n_words
                      AND sum_word_chars <= 10 * n_words)
                 AND n_stop >= 2
                 AND 10 * n_symbols <= n_words
                 AND 10 * n_alpha_words >= 8 * n_words AS keep
        FROM d
    """,
    "q_mannwhitney_u": f"""
        WITH g AS (
          SELECT v, CAST(sum(g1) AS BIGINT) AS c1,
                 CAST(sum(g2) AS BIGINT) AS c2,
                 CAST(sum(g1) + sum(g2) AS BIGINT) AS t
          FROM (SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                         AS v,
                       CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                            ELSE 0 END AS g1,
                       CASE WHEN o_orderpriority = '5-LOW' THEN 1
                            ELSE 0 END AS g2
                FROM orders
                WHERE o_orderpriority IN ('1-URGENT', '5-LOW'))
          GROUP BY v
        ),
        c AS (
          SELECT *, sum(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - t
                      AS b
          FROM g
        ),
        a AS (
          SELECT CAST(sum(c1) AS BIGINT) AS n1,
                 CAST(sum(c2) AS BIGINT) AS n2,
                 CAST(sum(CAST(c1 AS HUGEINT)
                          * CAST(2 * b + t + 1 AS HUGEINT))
                      AS DECIMAL(38,0)) AS r1_x2,
                 CAST(sum(CAST(t AS HUGEINT) * t * t - t)
                      AS DECIMAL(38,0)) AS tie3
          FROM c
        )
        SELECT n1, n2, CAST(r1_x2 AS BIGINT) AS rank_sum1_x2,
               CAST(r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1)
                    AS BIGINT) AS u1_x2,
               {pround_sql(
                   "(CAST(r1_x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE)"
                   " / 2.0 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)"
                   " / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0"
                   " * ((CAST(n1 + n2 AS DOUBLE) + 1.0)"
                   " - CAST(tie3 AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)"
                   " * (CAST(n1 + n2 AS DOUBLE) - 1.0))))", 6)} AS z
        FROM a
    """,
    "q_anova_f": "",  # built below (generated per-priority columns)
    "q_target_encoding": f"""
        WITH od AS (
          SELECT o_orderkey, c_nationkey,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey
        ),
        pn AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_nat,
                      CAST(sum(cents) AS BIGINT) AS s_nat
               FROM od GROUP BY 1),
        gl AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
                      CAST(sum(cents) AS BIGINT) AS s_all FROM od)
        SELECT o_orderkey, c_nationkey AS nationkey,
               {pround_sql(
                   "CAST(CAST(s_nat - cents AS HUGEINT) * n_all"
                   " + 10 * CAST(s_all AS HUGEINT) AS DOUBLE)"
                   " / CAST(CAST(n_nat - 1 + 10 AS HUGEINT) * n_all"
                   " AS DOUBLE) / 100.0", 6)} AS nation_target_enc
        FROM od JOIN pn USING (c_nationkey), gl
    """,
})


def _anova_oracle() -> str:
    """Mirror of q_anova_f's fixed-order chains over the pinned priority
    domain: per-group (n, Σx, Σx²) conditional aggregates into one row,
    left-associated 5-term chains, divisions last."""
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    k = len(pris)
    cols = []
    for j, p in enumerate(pris):
        hit = f"o_orderpriority = '{p}'"
        cols.append(
            f"CAST(sum(CASE WHEN {hit} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_{j}"
        )
        cols.append(
            f"CAST(sum(CASE WHEN {hit} THEN v ELSE 0 END) AS BIGINT)"
            f" AS s_{j}"
        )
        cols.append(
            f"CAST(sum(CASE WHEN {hit} THEN CAST(v AS HUGEINT) * v"
            f" ELSE 0 END) AS DECIMAL(38,0)) AS q_{j}"
        )
    n_tot = " + ".join(f"n_{j}" for j in range(k))
    s_tot = " + ".join(f"s_{j}" for j in range(k))
    terms = " + ".join(
        f"CAST(CAST(s_{j} AS HUGEINT) * s_{j} AS DOUBLE)"
        f" / CAST(n_{j} AS DOUBLE)"
        for j in range(k)
    )
    q_tot = " + ".join(f"q_{j}" for j in range(k))
    grand = (
        f"CAST(CAST(({s_tot}) AS HUGEINT) * ({s_tot}) AS DOUBLE)"
        f" / CAST(({n_tot}) AS DOUBLE)"
    )
    ssb = f"(({terms}) - {grand})"
    ssw = f"(CAST(({q_tot}) AS DOUBLE) - ({terms}))"
    f_stat = (
        f"({ssb} / {float(k - 1)}) / ({ssw}"
        f" / (CAST(({n_tot}) AS DOUBLE) - {float(k)}))"
    )
    return f"""
        WITH one AS (
          SELECT {", ".join(cols)}
          FROM (SELECT o_orderpriority,
                       CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                         AS v
                FROM orders)
        )
        SELECT CAST(({n_tot}) AS BIGINT) AS n_orders,
               CAST({k} AS INT) AS k_groups,
               {pround_sql(f"{ssb} / ({ssb} + {ssw})", 6)} AS eta_squared,
               {pround_sql(f_stat, 6)} AS f_stat
        FROM one
    """


ORACLES["q_anova_f"] = _anova_oracle()


def _bpe_ctes(rounds: int) -> list[str]:
    """Shared CTE chain for the BPE family: w0 (word-frequency grain,
    per-symbol-delimited strings '|a||b||c|' — boundary-preserving so
    runs of the merged pair collapse like canonical greedy BPE), then
    one (pairs → argmax → merge) triple per round ending in w{rounds}.
    Lambda vars j/x — never i (_hex_bigint caveat)."""
    parts = [
        f"""w0 AS (
          SELECT CAST(cnt AS BIGINT) AS cnt,
                 regexp_replace(word, '(.)', '|\\1|', 'g') AS seq
          FROM (SELECT word, count(*) AS cnt
                FROM (SELECT unnest({_TOKENS}) AS word
                      FROM documents WHERE trim(text) <> '')
                WHERE regexp_matches(word, '^[A-Za-z0-9]+$')
                GROUP BY word))"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""p{r} AS (
          SELECT pair, sum(cnt) AS c FROM (
            SELECT cnt, unnest(CASE WHEN len(syms) < 2
                     THEN CAST([] AS VARCHAR[])
                     ELSE list_transform(range(1, len(syms)),
                            j -> syms[j] || ' ' || syms[j+1]) END) AS pair
            FROM (SELECT cnt,
                         list_filter(string_split(seq, '|'),
                                     x -> x <> '') AS syms
                  FROM w{p}))
          GROUP BY pair)"""
        )
        parts.append(
            f"b{r} AS (SELECT pair, c FROM p{r} ORDER BY c DESC, pair"
            f" LIMIT 1)"
        )
        parts.append(
            f"""w{r} AS (
          SELECT cnt,
                 replace(seq,
                   '|' || split_part(pair, ' ', 1) || '||'
                       || split_part(pair, ' ', 2) || '|',
                   '|' || replace(pair, ' ', '') || '|') AS seq
          FROM w{p}, b{r})"""
        )
    return parts


def _bpe_train_oracle(rounds: int = 3) -> str:
    """Twin of q_bpe_train_rounds: the shared merge CTEs, merge log out."""
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS round, pair AS merged_pair,"
        f" CAST(c AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return (
        "WITH " + ",\n        ".join(_bpe_ctes(rounds)) + "\n        " + selects
    )


def _bpe_encode_oracle(rounds: int = 3) -> str:
    """Twin of q_bpe_encode: replay the identical merges, then the
    corpus summary off the final word table — tokens before = character
    inventory (delimiters stripped), tokens after = surviving symbols."""
    summary = f"""enc AS (
          SELECT cnt,
                 length(replace(seq, '|', '')) AS n_chars,
                 len(list_filter(string_split(seq, '|'),
                                 x -> x <> '')) AS n_syms
          FROM w{rounds})
        SELECT CAST({rounds} AS INT) AS n_merges,
               CAST(sum(cnt) AS BIGINT) AS total_words,
               CAST(sum(cnt * n_chars) AS BIGINT) AS tokens_before,
               CAST(sum(cnt * n_syms) AS BIGINT) AS tokens_after,
               {pround_sql(
                   'CAST(sum(cnt * n_syms) AS DOUBLE)'
                   ' / CAST(sum(cnt) AS DOUBLE)', 6)} AS fertility,
               {pround_sql(
                   'CAST(sum(cnt * n_syms) AS DOUBLE)'
                   ' / CAST(sum(cnt * n_chars) AS DOUBLE)', 6)}
                 AS compression
        FROM enc"""
    return (
        "WITH "
        + ",\n        ".join(_bpe_ctes(rounds) + [summary])
    )


ORACLES["q_bpe_train_rounds"] = _bpe_train_oracle()
ORACLES["q_bpe_encode"] = _bpe_encode_oracle()

# SemDeDup twin: the shared integer-pinned k-means CTEs (k=8, iters=2 —
# same trainer as q_vector_topk_ivf_trained), within-cell pair dots from
# the x table, the exact cross-multiplied cosine threshold in HUGEINT.
ORACLES["q_semdedup_cells"] = f"""
    WITH {_kmeans_int_ctes(8, 2)},
    nrm AS (SELECT vec_id, sum(xi * xi) AS n2 FROM x GROUP BY 1),
    prs AS (
      SELECT a.cell, a.vec_id AS ida, b.vec_id AS idb
      FROM a3 a JOIN a3 b ON a.cell = b.cell AND a.vec_id < b.vec_id),
    dts AS (
      SELECT p.cell, p.ida, p.idb, sum(xa.xi * xb.xi) AS dot
      FROM prs p
      JOIN x xa ON xa.vec_id = p.ida
      JOIN x xb ON xb.vec_id = p.idb AND xb.pos = xa.pos
      GROUP BY 1, 2, 3),
    dup AS (
      SELECT DISTINCT d.cell, d.idb
      FROM dts d
      JOIN nrm na ON na.vec_id = d.ida
      JOIN nrm nb ON nb.vec_id = d.idb
      WHERE na.n2 > 0 AND nb.n2 > 0
        AND CAST(100 AS HUGEINT) * (CAST(d.dot AS HUGEINT) * abs(d.dot))
            >= CAST(9 AS HUGEINT) * (CAST(na.n2 AS HUGEINT) * nb.n2)),
    cns AS (SELECT cell, count(*) AS n_vecs FROM a3 GROUP BY 1),
    drp AS (SELECT cell, count(*) AS n_dropped FROM dup GROUP BY 1)
    SELECT CAST(c.cell AS BIGINT) AS cell,
           CAST(c.n_vecs AS BIGINT) AS n_vecs,
           CAST(coalesce(d.n_dropped, 0) AS BIGINT) AS n_dropped,
           CAST(c.n_vecs - coalesce(d.n_dropped, 0) AS BIGINT) AS n_kept
    FROM cns c LEFT JOIN drp d ON c.cell = d.cell
"""


ORACLES.update({
    "q_ab_srm_check": f"""
        WITH a AS (
          SELECT CAST(sum(CASE WHEN
                   {_hex_bigint("md5(CAST(c_custkey AS VARCHAR))", 1, 4)}
                   % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN
                   {_hex_bigint("md5(CAST(c_custkey AS VARCHAR))", 1, 4)}
                   % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          FROM customer
        )
        SELECT n_a, n_b,
               {pround_sql(
                   "(CAST(n_a AS DOUBLE)"
                   " - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)"
                   " * (CAST(n_a AS DOUBLE)"
                   " - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)"
                   " / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)"
                   " + (CAST(n_b AS DOUBLE)"
                   " - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)"
                   " * (CAST(n_b AS DOUBLE)"
                   " - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)"
                   " / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)",
                   6)} AS chi2,
               (CAST(n_a AS DOUBLE)
                 - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
               * (CAST(n_a AS DOUBLE)
                 - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
               / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
               + (CAST(n_b AS DOUBLE)
                 - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
               * (CAST(n_b AS DOUBLE)
                 - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
               / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)
               > 3.841458820694124 AS srm_detected
        FROM a
    """,
    "q_anomaly_robust_z": f"""
        WITH od AS (
          SELECT o_orderkey,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
          FROM orders
        ),
        med AS (SELECT median(cents) AS med FROM od),
        mad AS (SELECT max(med) AS med,
                       median(abs(CAST(cents AS DOUBLE) - med)) AS mad
                FROM od, med)
        SELECT o_orderkey,
               {pround_sql("cents / 100.0", 2)} AS totalprice,
               {pround_sql(
                   "0.6745 * (CAST(cents AS DOUBLE) - med) / mad", 6
               )} AS modified_z
        FROM od, mad
        ORDER BY abs(0.6745 * (CAST(cents AS DOUBLE) - med) / mad) DESC,
                 o_orderkey ASC
        LIMIT 20
    """,
    "q_curation_funnel": f"""
        WITH base AS (
          SELECT doc_id, source, text,
                 doc_id = min(doc_id) OVER (PARTITION BY text) AS dedup_ok,
                 CAST({_N_TOKENS} AS BIGINT) AS n_words,
                 CAST(length(regexp_replace(text, '\\s', '', 'g'))
                      AS BIGINT) AS sum_word_chars,
                 CAST({_hits(_STOP_EN)} AS BIGINT) AS n_stop,
                 CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                      AS BIGINT) AS n_symbols,
                 CAST(len(list_filter({_TOKENS},
                      t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT)
                   AS n_alpha_words,
                 CASE WHEN {_BUCKET} < 80 THEN 'train' ELSE 'heldout' END
                   AS split
          FROM documents WHERE trim(text) <> ''
        ),
        tagged AS (
          SELECT *,
                 (n_words >= 30 AND n_words <= 100000)
                   AND (sum_word_chars >= 3 * n_words
                        AND sum_word_chars <= 10 * n_words)
                   AND n_stop >= 2
                   AND 10 * n_symbols <= n_words
                   AND 10 * n_alpha_words >= 8 * n_words AS quality_ok
          FROM base
        ),
        grams AS (
          SELECT doc_id, split, unnest(list_distinct({_SHINGLES5})) AS g
          FROM (SELECT doc_id, split, {_TOKENS} AS toks
                FROM tagged)
        ),
        tg AS (SELECT DISTINCT g FROM grams WHERE split = 'train'),
        dirty AS (
          SELECT DISTINCT h.doc_id
          FROM grams h JOIN tg USING (g) WHERE h.split = 'heldout'
        ),
        flagged AS (
          SELECT t.*,
                 t.split = 'train' OR d.doc_id IS NULL AS clean_ok
          FROM tagged t LEFT JOIN dirty d ON t.doc_id = d.doc_id
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_in,
               CAST(sum(CASE WHEN dedup_ok THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_after_dedup,
               CAST(sum(CASE WHEN dedup_ok AND quality_ok THEN 1 ELSE 0
                        END) AS BIGINT) AS n_after_quality,
               CAST(sum(CASE WHEN dedup_ok AND quality_ok AND clean_ok
                        THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_after_decontamination
        FROM flagged GROUP BY source
    """,
})


ORACLES.update({
    "q_join_asof_tolerance": """
        WITH l AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'click'),
             r AS (SELECT user_id, ts, max(value) AS rv FROM events
                   WHERE event_type = 'purchase' GROUP BY user_id, ts)
        SELECT l.event_id, l.user_id,
               CAST(floor(epoch(l.ts)) AS BIGINT) AS ts_epoch,
               l.value,
               CASE WHEN floor(epoch(l.ts)) - floor(epoch(r.ts))
                         <= 24 * 3600
                    THEN r.rv END AS recent_purchase_value,
               CASE WHEN floor(epoch(l.ts)) - floor(epoch(r.ts))
                         <= 24 * 3600
                    THEN CAST(floor(epoch(r.ts)) AS BIGINT)
               END AS matched_ts_epoch
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
    # the per-container metadata sweep is the roundtrip oracle re-grouped
    # — zero drift by construction
    "q_media_type_stats": f"""
        SELECT container,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(byte_len) AS BIGINT) AS total_bytes,
               CAST(sum(width) AS BIGINT) AS sum_width,
               CAST(sum(height) AS BIGINT) AS sum_height,
               CAST(sum(duration_ms) AS BIGINT) AS sum_duration_ms
        FROM ({ORACLES["q_media_header_roundtrip"]})
        GROUP BY container
    """,
})


ORACLES.update({
    "q_item_cf_neighbors": f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS c_ab
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 3),
        sym AS (
          SELECT p1 AS item, p2 AS nbr, c_ab FROM pairs
          UNION ALL SELECT p2, p1, c_ab FROM pairs),
        sup AS (SELECT l_partkey, count(*) AS c_x FROM li GROUP BY 1),
        ranked AS (
          SELECT s.item, s.nbr, s.c_ab, sa.c_x AS c_a, sb.c_x AS c_b,
                 row_number() OVER (PARTITION BY s.item ORDER BY
                   CAST(s.c_ab AS DOUBLE)
                     / sqrt(CAST(sa.c_x * sb.c_x AS DOUBLE)) DESC,
                   s.nbr ASC) AS rank
          FROM sym s
          JOIN sup sa ON sa.l_partkey = s.item
          JOIN sup sb ON sb.l_partkey = s.nbr)
        SELECT item, nbr, c_ab,
               {pround_sql(
                   "CAST(c_ab AS DOUBLE)"
                   " / sqrt(CAST(c_a * c_b AS DOUBLE))", 6)} AS cosine,
               CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 3
    """,
})


ORACLES.update({
    "q_snaive_backtest": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS y
          FROM orders GROUP BY 1
        ),
        s AS (
          SELECT d, y, lag(y, 7) OVER (ORDER BY d) AS yhat FROM daily
        ),
        e AS (
          SELECT date_trunc('month', d) AS m,
                 abs(y - yhat) AS ae,
                 CAST(floor(abs(y - yhat) * 1000000.0 / y + 0.5)
                      AS BIGINT) AS ape_u
          FROM s WHERE yhat IS NOT NULL
        )
        SELECT m,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(ae) // count(*) AS BIGINT) AS mae_cents,
               CAST(sum(ape_u) // count(*) AS BIGINT) AS mape_micro
        FROM e GROUP BY m
    """,
    "q_neyman_allocation": """
        WITH g AS (
          SELECT o_orderpriority,
                 CAST(count(*) AS BIGINT) AS n_h,
                 CAST(sum(v) AS BIGINT) AS s_h,
                 CAST(sum(CAST(v AS HUGEINT) * v) AS DECIMAL(38,0)) AS q_h
          FROM (SELECT o_orderpriority,
                       CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                         AS v FROM orders)
          GROUP BY 1
        ),
        w AS (
          SELECT o_orderpriority, n_h,
                 CAST(floor(sqrt(
                   (CAST(n_h AS DOUBLE) * CAST(q_h AS DOUBLE)
                    - CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE))
                   / (CAST(n_h AS DOUBLE) * (CAST(n_h AS DOUBLE) - 1.0))
                 ) * 1000000.0 + 0.5) AS BIGINT) AS sigma_micro
          FROM g
        ),
        a AS (
          SELECT *, CAST(n_h AS HUGEINT) * sigma_micro AS wt,
                 sum(CAST(n_h AS HUGEINT) * sigma_micro) OVER () AS wsum
          FROM w
        ),
        b AS (
          SELECT *, CAST((10000 * wt) // wsum AS BIGINT) AS base,
                 (10000 * wt) % wsum AS rem
          FROM a
        ),
        c AS (
          SELECT *, 10000 - sum(base) OVER () AS leftover,
                 row_number() OVER (ORDER BY rem DESC, o_orderpriority)
                   AS rr
          FROM b
        )
        SELECT o_orderpriority, n_h, sigma_micro,
               CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS n_sampled
        FROM c
    """,
})


ORACLES.update({
    "q_stream_topk": """
        WITH c AS (
          SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS win_start,
                 event_type, count(*) AS n_events
          FROM events GROUP BY 1, 2
        ),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY win_start
                      ORDER BY n_events DESC, event_type ASC) AS rank
          FROM c
        )
        SELECT win_start, event_type, n_events, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= 3
    """,
})


ORACLES.update({
    "q_lag_features": """
        WITH od AS (
          SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                   AS cents
          FROM orders
        ),
        l AS (
          SELECT o_orderkey, o_custkey, cents,
                 lag(cents, 1) OVER (PARTITION BY o_custkey
                                     ORDER BY d, o_orderkey) AS prev1,
                 lag(cents, 2) OVER (PARTITION BY o_custkey
                                     ORDER BY d, o_orderkey) AS prev2,
                 lag(cents, 3) OVER (PARTITION BY o_custkey
                                     ORDER BY d, o_orderkey) AS prev3
          FROM od
        )
        SELECT o_orderkey, o_custkey, cents, prev1, prev2,
               CASE WHEN prev1 IS NOT NULL THEN
                 CAST(floor(
                   (coalesce(prev1, 0) + coalesce(prev2, 0)
                    + coalesce(prev3, 0))
                   / (CASE WHEN prev1 IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN prev2 IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN prev3 IS NOT NULL THEN 1 ELSE 0 END)
                 ) AS BIGINT)
               END AS prev3_mean_cents
        FROM l
    """,
    "q_calendar_spine_join": """
        WITH b AS (
          SELECT min(CAST(o_orderdate AS DATE)) AS d0,
                 max(CAST(o_orderdate AS DATE)) AS d1
          FROM orders
        ),
        spine AS (
          SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                 CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
          FROM b
        ),
        daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS rev
          FROM orders GROUP BY 1
        )
        SELECT s.d,
               coalesce(n, 0) AS n_orders,
               coalesce(rev, 0) AS rev_cents
        FROM spine s LEFT JOIN daily USING (d)
    """,
})

# CCNet perplexity bucketing: rank the bigram-LM scores (the
# q_bigram_logprob oracle, inlined) and cut exact integer thirds.
ORACLES.update({
    "q_perplexity_buckets": f"""
        WITH base AS ({ORACLES['q_bigram_logprob']}),
        r AS (SELECT doc_id, avg_logprob,
                     row_number() OVER (ORDER BY avg_logprob DESC, doc_id)
                       AS rank,
                     count(*) OVER () AS n_docs
              FROM base)
        SELECT doc_id, avg_logprob, CAST(rank AS BIGINT) AS rank,
               (['head', 'middle', 'tail'])[
                 CAST(((rank - 1) * 3) // n_docs AS INT) + 1] AS ppl_bucket
        FROM r
    """,
})

# Synchronous mode-LPA, 4 unrolled rounds mirroring
# operators/graph.py::label_propagation_mode over the co-purchase graph.
def _lpa_sql(rounds: int = 4) -> str:
    levels = []
    for r in range(1, rounds + 1):
        levels.append(f"""
        n{r} AS (SELECT e.src AS node, l.label, count(*) AS c
                 FROM e0 e JOIN l{r - 1} l ON l.node = e.dst
                 GROUP BY 1, 2),
        l{r} AS (SELECT node, label FROM (
                   SELECT node, label, row_number() OVER (
                     PARTITION BY node ORDER BY c DESC, label ASC) AS rn
                   FROM n{r}) WHERE rn = 1)""")
    return (
        """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey % 10 = 0),
        ep AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
        e0 AS MATERIALIZED (SELECT p1 AS src, p2 AS dst FROM ep
               UNION ALL SELECT p2 AS src, p1 AS dst FROM ep),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM e0),"""
        + ",".join(levels)
        + f"""
        SELECT node, label AS community FROM l{rounds}"""
    )


ORACLES.update({"q_lpa_communities": _lpa_sql(4)})

# Newman modularity of the LPA partition (mirrors
# queries.q_graph_modularity): labels from the nested LPA chain, exact
# integer Q·4m², one pinned division.
ORACLES.update({
    "q_graph_modularity": f"""
        WITH labels AS (
          SELECT node, community AS c FROM ({_lpa_sql(4)}) z),
        li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
               WHERE l_partkey % 10 = 0),
        e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey),
        sym AS (SELECT src, dst FROM e
                UNION ALL SELECT dst, src FROM e),
        mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        intra AS (
          SELECT ls.c, CAST(count(*) AS BIGINT) AS l_c
          FROM e
          JOIN labels ls ON ls.node = e.src
          JOIN labels ld ON ld.node = e.dst
          WHERE ls.c = ld.c GROUP BY 1),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
                FROM sym GROUP BY 1),
        dmass AS (
          SELECT l.c, CAST(sum(deg.d) AS BIGINT) AS d_c
          FROM deg JOIN labels l ON l.node = deg.src GROUP BY 1),
        per_c AS (
          SELECT dmass.c, CAST(coalesce(intra.l_c, 0) AS BIGINT) AS l_c,
                 dmass.d_c
          FROM dmass LEFT JOIN intra ON intra.c = dmass.c),
        tot AS (
          SELECT max(m) AS m,
                 CAST(count(*) AS BIGINT) AS n_communities,
                 CAST(sum(l_c) AS BIGINT) AS intra_edges,
                 CAST(sum(4 * m * l_c - d_c * d_c) AS BIGINT) AS q_x4m2
          FROM per_c, mm)
        SELECT CAST(m AS BIGINT) AS m, n_communities, intra_edges,
               q_x4m2,
               {pround_sql(
                   'CAST(q_x4m2 AS DOUBLE) / (4.0 * CAST(m AS DOUBLE)'
                   ' * CAST(m AS DOUBLE))', 6)} AS modularity
        FROM tot
    """,
})

# Streaming mergeable-HLL daily distinct: the batch daily registers ARE
# the stream's converged state (max-merge commutes over micro-batches),
# so the oracle is the daily column of the q_rolling_distinct_hll sketch.
ORACLES.update({
    "q_stream_static_enrich": """
        SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
               e.event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents_sum,
               CAST(sum(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) / 100.0 AS value_sum
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
    """,
    "q_stream_hll_distinct": f"""
        WITH dr AS (
          SELECT day, bucket, max(rho) AS reg FROM (
            SELECT CAST(ts AS DATE) AS day,
                   {_hex_bigint("md5(CAST(user_id AS VARCHAR))", 1, 8)}
                     % 1024 AS bucket,
                   33 - length(bin(
                     {_hex_bigint("md5(CAST(user_id AS VARCHAR))", 9, 8)}
                   )) AS rho
            FROM events)
          GROUP BY 1, 2),
        p AS (
          SELECT day,
                 CAST(1 AS BIGINT) << CAST(32 - reg AS INT) AS pd
          FROM dr),
        s AS (
          SELECT day, count(pd) AS md_obs, sum(pd) AS sd_obs
          FROM p GROUP BY 1)
        SELECT day,
               {pround_sql(_hll1024_est('md_obs', 'sd_obs'), 4)}
                 AS dau_approx
        FROM s
    """,
})

# Histogram-sketch quantiles: order-free mergeable buckets, integer
# ceil rank, bucket lower bound in cents — mirrors
# queries.q_approx_percentile_hist exactly.
ORACLES.update({
    "q_approx_percentile_hist": """
        WITH h AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) // 50 AS bucket,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        cum AS (
          SELECT event_type, bucket,
                 sum(c) OVER (PARTITION BY event_type ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(c) OVER (PARTITION BY event_type) AS n
          FROM h)
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_rows,
               CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100
                        THEN bucket * 50 END) AS BIGINT) AS p50_cents,
               CAST(min(CASE WHEN cum >= (n * 95 + 99) // 100
                        THEN bucket * 50 END) AS BIGINT) AS p95_cents,
               CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100
                        THEN bucket * 50 END) AS BIGINT) AS p99_cents
        FROM cum GROUP BY event_type
    """,
})

# Streaming count-min heavy hitters: counter increments are commutative
# adds, so the converged 3-micro-batch state equals the batch CMS
# exactly — the oracle is the plain batch sketch over events/user_id
# (mirrors queries.q_stream_cms_heavy's read-time point queries; the
# q_countmin_heavy chain at the user grain).
ORACLES.update({
    "q_stream_cms_heavy": f"""
        WITH ev AS (SELECT user_id FROM events),
        jj AS (SELECT unnest(range(4)) AS j),
        counters AS (
          SELECT j, {_hex_bigint("md5(concat_ws(':', j, user_id))", 1, 8)}
                   % 256 AS slot,
                 CAST(count(*) AS BIGINT) AS c
          FROM ev, jj GROUP BY 1, 2),
        probes AS (
          SELECT user_id,
                 j, {_hex_bigint("md5(concat_ws(':', j, user_id))", 1, 8)}
                   % 256 AS slot
          FROM (SELECT DISTINCT user_id FROM ev), jj),
        est AS (
          SELECT user_id, min(c) AS est_count
          FROM probes JOIN counters USING (j, slot) GROUP BY 1),
        exact AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
          FROM ev GROUP BY 1),
        ranked AS (
          SELECT user_id, est_count, exact_count,
                 row_number() OVER (ORDER BY exact_count DESC, user_id)
                   AS rn
          FROM est JOIN exact USING (user_id))
        SELECT user_id, est_count, exact_count,
               est_count - exact_count AS overcount
        FROM ranked WHERE rn <= 10
    """,
})

# Streaming histogram quantiles: counts are commutative adds, so the
# converged 3-micro-batch state equals the batch histogram exactly —
# the oracle is the plain batch computation at the day grain (mirrors
# queries.q_stream_hist_quantile's read-time percentile arithmetic).
ORACLES.update({
    "q_stream_hist_quantile": """
        WITH h AS (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) // 50 AS bucket,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        cum AS (
          SELECT day, bucket,
                 sum(c) OVER (PARTITION BY day ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(c) OVER (PARTITION BY day) AS n
          FROM h)
        SELECT day,
               CAST(max(n) AS BIGINT) AS n_rows,
               CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100
                        THEN bucket * 50 END) AS BIGINT) AS p50_cents,
               CAST(min(CASE WHEN cum >= (n * 95 + 99) // 100
                        THEN bucket * 50 END) AS BIGINT) AS p95_cents
        FROM cum GROUP BY day
    """,
})

# Matryoshka truncation recall: exact integer L2 top-10 on the first 16
# components vs the full 64 — mirrors queries.q_embed_truncation_recall.
ORACLES.update({
    "q_embed_truncation_recall": f"""
        WITH xall AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS xi
          FROM embeddings),
        qm AS (SELECT pos, xi AS qi FROM xall WHERE vec_id = 0),
        fullk AS (
          SELECT x.vec_id, sum((x.xi - q.qi) * (x.xi - q.qi)) AS d
          FROM xall x JOIN qm q USING (pos)
          WHERE x.vec_id != 0 GROUP BY 1
          ORDER BY d, vec_id LIMIT 10),
        trunck AS (
          SELECT x.vec_id, sum((x.xi - q.qi) * (x.xi - q.qi)) AS d
          FROM xall x JOIN qm q USING (pos)
          WHERE x.vec_id != 0 AND x.pos < 16 GROUP BY 1
          ORDER BY d, vec_id LIMIT 10),
        h AS (SELECT CAST(count(*) AS BIGINT) AS hits
              FROM fullk JOIN trunck USING (vec_id))
        SELECT CAST(16 AS INT) AS trunc_dim, CAST(10 AS INT) AS k, hits,
               {pround_sql('CAST(hits AS DOUBLE) / 10.0', 6)} AS recall
        FROM h
    """,
})

# IVF-PQ recall@10: the composite-index list (nested-WITH reuse of the
# q_ivfpq_topk oracle) vs the exact integer squared-L2 top-10.
ORACLES.update({
    "q_ivfpq_recall": f"""
        WITH ivf AS (SELECT vec_id FROM ({ORACLES['q_ivfpq_topk']}) t),
        xall AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS xi
          FROM embeddings),
        qm AS (SELECT pos, xi AS qi FROM xall WHERE vec_id = 0),
        ex AS (
          SELECT x.vec_id, sum((x.xi - q.qi) * (x.xi - q.qi)) AS d
          FROM xall x JOIN qm q USING (pos)
          WHERE x.vec_id != 0 GROUP BY 1
          ORDER BY d, vec_id LIMIT 10),
        h AS (SELECT CAST(count(*) AS BIGINT) AS hits
              FROM ex JOIN ivf USING (vec_id))
        SELECT CAST(10 AS INT) AS k, hits,
               {pround_sql('CAST(hits AS DOUBLE) / 10.0', 6)} AS recall
        FROM h
    """,
})

# Interpolated Kneser-Ney bigram probabilities — identical counts at the
# bigram-type grain and the identical pinned IEEE probability expression.
ORACLES.update({
    "q_kneser_ney_bigram": f"""
        WITH docs AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
          WHERE trim(text) <> ''),
        big AS (
          SELECT z[1] AS w1, z[2] AS w2
          FROM (SELECT unnest(list_zip(toks[1:len(toks) - 1],
                                       toks[2:len(toks)])) AS z
                FROM docs WHERE len(toks) >= 2)),
        tf AS (
          SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
          FROM big GROUP BY 1, 2),
        typed AS (
          SELECT w1, w2, c,
                 sum(c) OVER (PARTITION BY w1) AS c1,
                 count(*) OVER (PARTITION BY w1) AS n1l,
                 count(*) OVER (PARTITION BY w2) AS nl,
                 count(*) OVER () AS T
          FROM tf)
        SELECT w1, w2, c,
               {pround_sql(
                   '(CAST(c AS DOUBLE) - 0.75) / CAST(c1 AS DOUBLE)'
                   ' + ((0.75 * CAST(n1l AS DOUBLE))'
                   ' / CAST(c1 AS DOUBLE))'
                   ' * (CAST(nl AS DOUBLE) / CAST(T AS DOUBLE))', 6
               )} AS p_kn
        FROM typed
        ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 200
    """,
})

# Round-9 continuation: cross-lingual contamination + the quality
# frontier (both reuse the shared token/shingle/quality macros above).
ORACLES.update({
    "q_cross_lingual_contamination": f"""
        WITH docs AS (
          SELECT doc_id, lang, {_TOKENS} AS toks
          FROM documents WHERE trim(text) <> ''),
        sh AS (
          SELECT doc_id, lang, unnest(list_distinct({_SHINGLES5})) AS g
          FROM docs),
        pairs AS (
          SELECT a.lang AS lang_a, b.lang AS lang_b, a.g,
                 a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sh a JOIN sh b
            ON a.g = b.g AND a.lang < b.lang)
        SELECT lang_a, lang_b,
               CAST(count(DISTINCT g) AS BIGINT) AS n_shared_shingles,
               CAST(count(DISTINCT (doc_a, doc_b)) AS BIGINT)
                 AS n_doc_pairs
        FROM pairs GROUP BY 1, 2
    """,
    "q_quality_token_frontier": f"""
        WITH scored AS (
          SELECT doc_id,
                 CAST({_N_TOKENS} AS BIGINT) AS n_tok,
                 {pround_sql(_QUALITY_EXPR, 6)} AS q
          FROM documents WHERE trim(text) <> ''),
        ranked AS (
          SELECT *, row_number() OVER (ORDER BY q ASC, doc_id ASC)
                      AS r,
                 count(*) OVER () AS n
          FROM scored),
        tiled AS (
          SELECT *, CAST((r - 1) * 10 // n + 1 AS INT) AS decile
          FROM ranked),
        per AS (
          SELECT decile,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tok) AS BIGINT) AS tokens,
                 {pround_sql(
                     'CAST(SUM(CAST(floor(q * 1e6 + 0.5) AS BIGINT))'
                     ' AS DOUBLE) / 1e6 / CAST(count(*) AS DOUBLE)', 6
                 )} AS mean_quality
          FROM tiled GROUP BY 1)
        SELECT decile, n_docs, tokens, mean_quality,
               {pround_sql(
                   'CAST(sum(tokens) OVER (ORDER BY decile DESC'
                   ' ROWS UNBOUNDED PRECEDING) AS DOUBLE)'
                   ' / CAST(sum(tokens) OVER () AS DOUBLE)', 6
               )} AS cum_token_share_kept
        FROM per
    """,
})


# ---------------------------------------------------------------------------
# Round-11 additions: RAKE keywords, URL canonicalization, Z-order
# layout, compaction planning, Shapley attribution, skew-salted join.
# ---------------------------------------------------------------------------

def _rake_oracle() -> str:
    """Twin of q_rake_keywords: identical phrase segmentation (running
    stopword-boundary count per doc), identical freq/deg integers, one
    pinned division, (deg DESC, word) top-50."""
    from .functions.text import STOPWORDS_EN

    stops = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"""
        WITH d AS (
          SELECT doc_id, {_TOKENS} AS toks FROM documents
          WHERE trim(text) != ''),
        tok AS (
          SELECT doc_id, generate_subscripts(toks, 1) AS pos,
                 lower(regexp_replace(unnest(toks), '[^A-Za-z0-9]', '',
                                      'g')) AS w
          FROM d),
        m AS (
          SELECT doc_id, pos, w,
                 (w = '' OR w IN ({stops})) AS is_stop
          FROM tok),
        ph AS (
          SELECT doc_id, pos, w, is_stop,
                 sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
          FROM m),
        words AS (
          SELECT doc_id, phrase_id, w FROM ph WHERE NOT is_stop),
        plen AS (
          SELECT doc_id, phrase_id, count(*) AS plen
          FROM words GROUP BY 1, 2),
        stats AS (
          SELECT w, CAST(count(*) AS BIGINT) AS freq,
                 CAST(sum(plen) AS BIGINT) AS deg
          FROM words JOIN plen USING (doc_id, phrase_id)
          GROUP BY w)
        SELECT w AS word, freq, deg,
               {pround_sql('CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE)', 6)}
                 AS rake_score
        FROM stats ORDER BY deg DESC, w LIMIT 50
    """


def _url_canonicalize_oracle() -> str:
    """Twin of q_url_canonicalize: identical variant synthesis and the
    identical three anchored regex canonicalization steps."""
    return f"""
        WITH v AS (
          SELECT doc_id, source, unnest([0, 1, 2]) AS k FROM documents),
        u AS (
          SELECT source,
                 (CASE WHEN (doc_id + k) % 2 = 0 THEN 'http://'
                       ELSE 'https://' END)
                 || (CASE WHEN (doc_id + k) % 3 = 0 THEN 'www.'
                          ELSE '' END)
                 || lower(source) || '.example.com/doc/'
                 || CAST(doc_id AS VARCHAR)
                 || (CASE WHEN k = 1
                          THEN '?utm_source=feed&utm_campaign=x'
                          WHEN k = 2 THEN '/' ELSE '' END) AS raw_url
          FROM v),
        c AS (
          SELECT source, raw_url,
                 regexp_replace(regexp_replace(regexp_replace(
                   lower(raw_url),
                   '^https?://(www\\.)?', ''),
                   '\\?utm_[a-z_]+=[^&]*(&utm_[a-z_]+=[^&]*)*$', ''),
                   '/$', '') AS canon_url
          FROM u)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(count(DISTINCT raw_url) AS BIGINT) AS raw_distinct,
               CAST(count(DISTINCT canon_url) AS BIGINT)
                 AS canon_distinct,
               {pround_sql(
                   'CAST(count(DISTINCT raw_url) AS DOUBLE)'
                   ' / CAST(count(DISTINCT canon_url) AS DOUBLE)', 6)}
                 AS dup_factor
        FROM c GROUP BY source
    """


def _zorder_oracle() -> str:
    """Twin of q_zorder_layout: identical bucket normalization, bit
    interleave, file assignment, per-file min/max stats, and the 4-row
    (layout x predicate) skipping audit."""
    inter = " + ".join(
        f"((ba >> {k}) & 1) * {1 << (2 * k + 1)}"
        f" + ((bb >> {k}) & 1) * {1 << (2 * k)}"
        for k in range(8)
    )
    return f"""
        WITH o AS (
          SELECT o_custkey AS a_raw,
                 CAST(year(o_orderdate) * 10000
                      + month(o_orderdate) * 100
                      + day(o_orderdate) AS BIGINT) AS b_raw
          FROM orders),
        ext AS (
          SELECT min(a_raw) AS amin, max(a_raw) AS amax,
                 min(b_raw) AS bmin, max(b_raw) AS bmax
          FROM o),
        b AS (
          SELECT ((a_raw - amin) * 256) // (amax - amin + 1) AS ba,
                 ((b_raw - bmin) * 256) // (bmax - bmin + 1) AS bb
          FROM o, ext),
        laid AS (
          SELECT ba, bb,
                 ({inter}) // 1024 AS file_z,
                 (ba * 256 + bb) // 1024 AS file_lin
          FROM b),
        files AS (
          SELECT 'zorder' AS layout, file_z AS file_id,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 min(ba) AS min_a, max(ba) AS max_a,
                 min(bb) AS min_b, max(bb) AS max_b
          FROM laid GROUP BY 1, 2
          UNION ALL
          SELECT 'linear', file_lin, CAST(count(*) AS BIGINT),
                 min(ba), max(ba), min(bb), max(bb)
          FROM laid GROUP BY 1, 2),
        audit AS (
          SELECT layout, 'a_in_first_eighth' AS predicate,
                 CAST(count(*) AS BIGINT) AS files_total,
                 CAST(sum(CASE WHEN min_a <= 31 THEN 1 ELSE 0 END)
                      AS BIGINT) AS files_scanned,
                 CAST(sum(CASE WHEN min_a <= 31 THEN n_rows ELSE 0 END)
                      AS BIGINT) AS rows_scanned
          FROM files GROUP BY layout
          UNION ALL
          SELECT layout, 'b_in_first_eighth',
                 CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN min_b <= 31 THEN 1 ELSE 0 END)
                      AS BIGINT),
                 CAST(sum(CASE WHEN min_b <= 31 THEN n_rows ELSE 0 END)
                      AS BIGINT)
          FROM files GROUP BY layout)
        SELECT layout, predicate, files_total, files_scanned,
               rows_scanned,
               {pround_sql(
                   'CAST(files_scanned AS DOUBLE)'
                   ' / CAST(files_total AS DOUBLE)', 6)}
                 AS scan_fraction
        FROM audit
    """


ORACLES.update({
    "q_rake_keywords": _rake_oracle(),
    "q_url_canonicalize": _url_canonicalize_oracle(),
    "q_zorder_layout": _zorder_oracle(),
    "q_compaction_plan": f"""
        WITH files AS (
          SELECT l_orderkey % 1000 AS file_id,
                 CAST(count(*) AS BIGINT) AS size_rows
          FROM lineitem GROUP BY 1),
        tot AS (
          SELECT CAST(sum(size_rows) AS BIGINT) AS total_rows
          FROM files),
        sized AS (
          SELECT file_id, size_rows,
                 greatest(total_rows // 64, 1) AS target
          FROM files, tot),
        ordered AS (
          SELECT *, sum(size_rows)
                 OVER (ORDER BY size_rows DESC, file_id ASC) AS cum
          FROM sized),
        planned AS (
          SELECT *, (cum - size_rows) // target AS bin_id FROM ordered)
        SELECT CAST(bin_id AS BIGINT) AS bin_id,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(size_rows) AS BIGINT) AS bin_rows,
               {pround_sql(
                   'CAST(sum(size_rows) AS DOUBLE)'
                   ' / CAST(max(target) AS DOUBLE)', 6)}
                 AS fill_fraction
        FROM planned GROUP BY 1
    """,
    "q_shapley_synergy": f"""
        WITH fp AS (
          SELECT user_id, min(ts) AS fpts FROM events
          WHERE event_type = 'purchase' GROUP BY user_id),
        j AS (
          SELECT e.user_id, e.event_type
          FROM events e JOIN fp USING (user_id)
          WHERE e.ts <= fp.fpts),
        journeys AS (
          SELECT user_id, count(DISTINCT event_type) AS n
          FROM j GROUP BY user_id),
        per AS (SELECT DISTINCT user_id, event_type AS channel FROM j),
        credited AS (
          SELECT p.channel, CAST((jo.n - 1) * 6 AS BIGINT) AS credit12
          FROM per p JOIN journeys jo USING (user_id)),
        tot AS (SELECT CAST(sum(credit12) AS BIGINT) AS t12
                FROM credited)
        SELECT channel,
               CAST(count(*) AS BIGINT) AS journeys,
               CAST(sum(credit12) AS BIGINT) AS shapley12,
               {pround_sql(
                   'CAST(sum(credit12) AS DOUBLE) / CAST(t12 AS DOUBLE)',
                   6)} AS share
        FROM credited, tot GROUP BY channel, t12
    """,
    "q_join_salted": """
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
})


# ---------------------------------------------------------------------------
# Geospatial / network / link-prediction oracles (round 11b)
# ---------------------------------------------------------------------------

from .functions.geo import (  # noqa: E402
    geohash5_chars_sql,
    geohash5_code_sql,
    geohash5_quant_sql,
    hash_units_sql,
)


def _geo_pts_cte() -> str:
    """Customer point cloud CTE shared by the geo oracles (twin of
    queries._geo_customers)."""
    lat = hash_units_sql("c_custkey", "lat", 100_000, _hex_bigint)
    lon = hash_units_sql("c_custkey", "lon", 100_000, _hex_bigint)
    return (
        f"SELECT c_custkey AS point_id, c_mktsegment, "
        f"{lat} AS lat_units, {lon} AS lon_units FROM customer"
    )


def _geo_sup_cte() -> str:
    slat = hash_units_sql("s_suppkey", "slat", 100_000, _hex_bigint)
    slon = hash_units_sql("s_suppkey", "slon", 100_000, _hex_bigint)
    return (
        f"SELECT s_suppkey, {slat} AS slat_units, {slon} AS slon_units "
        f"FROM supplier"
    )


_GEOHASH_LAT_Q, _GEOHASH_LON_Q = geohash5_quant_sql("glat_units", "glon_units")

ORACLES.update({
    "q_geo_cell_density": f"""
        WITH pts AS ({_geo_pts_cte()})
        SELECT lat_units // 1000 AS cell_lat,
               lon_units // 1000 AS cell_lon,
               CAST(count(*) AS BIGINT) AS n_points,
               CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
        FROM pts GROUP BY 1, 2
        ORDER BY n_points DESC, cell_lat, cell_lon LIMIT 20
    """,
    # The Spark side's 3x3 grid probe is an invisible optimization (the
    # radius equals the cell edge, so the block covers the disk); the
    # oracle is the naive all-pairs distance filter.
    "q_geo_radius_join": f"""
        WITH sup AS ({_geo_sup_cte()}),
        cust AS ({_geo_pts_cte()}),
        pairs AS (
          SELECT s.s_suppkey,
                 (s.slat_units - c.lat_units) * (s.slat_units - c.lat_units)
               + (s.slon_units - c.lon_units) * (s.slon_units - c.lon_units)
                 AS d2
          FROM sup s CROSS JOIN cust c),
        w AS (
          SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_within,
                 min(d2) AS min_d2
          FROM pairs WHERE d2 <= 25000000 GROUP BY 1)
        SELECT s.s_suppkey,
               CAST(coalesce(w.n_within, 0) AS BIGINT) AS n_within,
               CAST(floor(sqrt(CAST(w.min_d2 AS DOUBLE)) + 0.5) AS BIGINT)
                 AS min_dist_units
        FROM sup s LEFT JOIN w USING (s_suppkey)
    """,
    # Here the 3x3 block IS the contract (nearest within the block), so
    # the oracle reproduces the cell arithmetic (all coords >= 0, so
    # DuckDB's floor-div // equals Spark's truncating div).
    "q_geo_nearest_neighbor": f"""
        WITH sup AS ({_geo_sup_cte()}),
        cust AS ({_geo_pts_cte()}),
        cand AS (
          SELECT s.s_suppkey, c.point_id,
                 (s.slat_units - c.lat_units) * (s.slat_units - c.lat_units)
               + (s.slon_units - c.lon_units) * (s.slon_units - c.lon_units)
                 AS d2
          FROM sup s JOIN cust c
            ON (c.lat_units // 5000)
                 BETWEEN (s.slat_units // 5000) - 1
                     AND (s.slat_units // 5000) + 1
           AND (c.lon_units // 5000)
                 BETWEEN (s.slon_units // 5000) - 1
                     AND (s.slon_units // 5000) + 1),
        r AS (
          SELECT s_suppkey, point_id,
                 CAST(floor(sqrt(CAST(d2 AS DOUBLE)) + 0.5) AS BIGINT)
                   AS dist_units,
                 row_number() OVER (
                   PARTITION BY s_suppkey ORDER BY d2, point_id) AS rn
          FROM cand)
        SELECT s.s_suppkey,
               r.point_id AS nn_point_id,
               r.dist_units AS nn_dist_units
        FROM sup s LEFT JOIN (SELECT * FROM r WHERE rn = 1) r
          USING (s_suppkey)
    """,
    # The 25-bit interleave + base32 rendering below is the SAME
    # generated SQL text the Spark side evaluates (functions/geo.py).
    "q_geohash_encode": f"""
        WITH pts AS (
          SELECT c_custkey AS point_id,
                 {hash_units_sql("c_custkey", "glat", 1_800_000, _hex_bigint)}
                   AS glat_units,
                 {hash_units_sql("c_custkey", "glon", 3_600_000, _hex_bigint)}
                   AS glon_units
          FROM customer),
        q AS (
          SELECT point_id, {_GEOHASH_LAT_Q} AS lat_q, {_GEOHASH_LON_Q} AS lon_q
          FROM pts),
        g0 AS (
          SELECT point_id, {geohash5_code_sql("lat_q", "lon_q")} AS code
          FROM q),
        g AS (
          SELECT point_id, {geohash5_chars_sql("code")} AS geohash5
          FROM g0)
        SELECT geohash5, CAST(count(*) AS BIGINT) AS n_points,
               CAST(min(point_id) AS BIGINT) AS sample_point
        FROM g GROUP BY 1
        ORDER BY n_points DESC, geohash5 LIMIT 20
    """,
    "q_geo_trajectory": f"""
        WITH ev AS (
          SELECT user_id, ts, event_id,
                 {hash_units_sql("event_id", "elat", 100_000, _hex_bigint)}
                   AS lat_units,
                 {hash_units_sql("event_id", "elon", 100_000, _hex_bigint)}
                   AS lon_units
          FROM events),
        s AS (
          SELECT user_id, lat_units, lon_units,
                 lag(lat_units) OVER w AS prev_lat,
                 lag(lon_units) OVER w AS prev_lon
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        st AS (
          SELECT user_id, lat_units, lon_units,
                 CASE WHEN prev_lat IS NULL THEN CAST(0 AS BIGINT)
                      ELSE CAST(floor(sqrt(CAST(
                             (lat_units - prev_lat) * (lat_units - prev_lat)
                           + (lon_units - prev_lon) * (lon_units - prev_lon)
                           AS DOUBLE)) + 0.5) AS BIGINT) END AS step_units
          FROM s),
        per AS (
          SELECT user_id,
                 CAST(count(*) AS BIGINT) AS n_points,
                 CAST(sum(step_units) AS BIGINT) AS path_units,
                 CAST(count(DISTINCT
                   (lat_units // 5000) * 1000 + (lon_units // 5000)
                 ) AS BIGINT) AS n_cells,
                 CAST((max(lat_units) - min(lat_units))
                    * (max(lon_units) - min(lon_units)) AS BIGINT)
                   AS bbox_area_units2
          FROM st GROUP BY user_id)
        SELECT user_id, n_points, path_units, n_cells, bbox_area_units2
        FROM per ORDER BY path_units DESC, user_id LIMIT 30
    """,
    "q_ip_cidr_lpm": f"""
        WITH dim AS (
          SELECT 8 AS prefix_len,
                 CAST(10 + r_regionkey AS BIGINT) AS prefix_key,
                 r_name AS net_name
          FROM region
          UNION ALL
          SELECT 16,
                 CAST((10 + n_regionkey) * 256 + n_nationkey AS BIGINT),
                 n_name
          FROM nation),
        ev AS (
          SELECT event_id, user_id,
                 (10 + {hash_units_sql("event_id", "o1", 6, _hex_bigint)})
                   * 16777216
               + {hash_units_sql("event_id", "o2", 32, _hex_bigint)} * 65536
               + {hash_units_sql("event_id", "lo", 65_536, _hex_bigint)}
                 AS ip
          FROM events),
        cand AS (
          SELECT e.event_id, d.net_name, d.prefix_len
          FROM ev e JOIN dim d
            ON (d.prefix_len = 8  AND e.ip // 16777216 = d.prefix_key)
            OR (d.prefix_len = 16 AND e.ip // 65536 = d.prefix_key)),
        best AS (
          SELECT event_id,
                 arg_max(net_name, prefix_len) AS net_name,
                 max(prefix_len) AS matched_len
          FROM cand GROUP BY event_id),
        att AS (
          SELECT e.event_id, e.user_id,
                 coalesce(b.net_name, '<unmatched>') AS net_name,
                 CAST(coalesce(b.matched_len, 0) AS BIGINT) AS matched_len
          FROM ev e LEFT JOIN best b USING (event_id))
        SELECT net_name, matched_len,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM att GROUP BY 1, 2
        ORDER BY n_events DESC, net_name
    """,
    # The degree cap (<= 64 wedge centers) is part of the contract, so
    # the oracle applies the identical cap before the wedge join.
    "q_link_prediction": f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey % 10 = 0),
        e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey),
        sym AS (SELECT src, dst FROM e
                UNION ALL SELECT dst, src FROM e),
        deg AS (SELECT src AS center, CAST(count(*) AS BIGINT) AS deg
                FROM sym GROUP BY 1),
        lowc AS (SELECT center FROM deg WHERE deg <= 64),
        adj AS (SELECT sym.src AS center, sym.dst AS nbr
                FROM sym JOIN lowc ON sym.src = lowc.center),
        wedges AS (
          SELECT a.nbr AS u, b.nbr AS v
          FROM adj a JOIN adj b
            ON a.center = b.center AND a.nbr < b.nbr),
        cn AS (SELECT u, v, CAST(count(*) AS BIGINT) AS common
               FROM wedges GROUP BY 1, 2),
        newp AS (
          SELECT cn.u, cn.v, cn.common FROM cn
          WHERE NOT EXISTS (
            SELECT 1 FROM e WHERE e.src = cn.u AND e.dst = cn.v)),
        scored AS (
          SELECT u AS src, v AS dst, common,
                 du.deg AS deg_u, dv.deg AS deg_v,
                 {pround_sql(
                     "CAST(common AS DOUBLE) "
                     "/ CAST(du.deg + dv.deg - common AS DOUBLE)", 6)}
                   AS jaccard
          FROM newp
          JOIN deg du ON du.center = newp.u
          JOIN deg dv ON dv.center = newp.v)
        SELECT src, dst, common, deg_u, deg_v, jaccard
        FROM scored ORDER BY common DESC, src, dst LIMIT 30
    """,
})


def _markov_removal_oracle(steps: int = 12) -> str:
    """Generated oracle for q_markov_removal: the SAME integer absorption
    recurrence the Spark side runs on the collected bounded transition
    matrix, unrolled as ``steps`` CTE levels per scenario (scenario =
    '__base__' or the removed channel).  Every term is
    (val * cnt) // tot — truncating integer division then integer sums,
    order-free, so the 12-step trajectory is bit-identical.

    Every CTE is MATERIALIZED: without it DuckDB inlines the chain and
    each level is re-evaluated by BOTH its consumers (v and a), an
    exponential 2^steps blowup (measured 64 s -> 1.4 s at sf0.01)."""
    ctes = []
    for t in range(1, steps + 1):
        p = t - 1
        ctes.append(f"""
        v{t} AS MATERIALIZED (
          SELECT v.scen, t.dst AS state,
                 CAST(sum((v.val * t.cnt) // o.tot) AS BIGINT) AS val
          FROM v{p} v
          JOIN trans t ON t.src = v.state
          JOIN outs o ON o.src = v.state
          WHERE t.dst <> 'purchase' AND t.dst <> v.scen
          GROUP BY v.scen, t.dst),
        a{t} AS MATERIALIZED (
          SELECT v.scen,
                 CAST(sum((v.val * t.cnt) // o.tot) AS BIGINT) AS a
          FROM v{p} v
          JOIN trans t ON t.src = v.state AND t.dst = 'purchase'
          JOIN outs o ON o.src = v.state
          GROUP BY v.scen)""")
    abs_union = " UNION ALL ".join(
        f"SELECT scen, a FROM a{t}" for t in range(1, steps + 1)
    )
    return f"""
        WITH fp AS (
          SELECT user_id, ts AS fpts, event_id AS fpid FROM (
            SELECT user_id, ts, event_id,
                   row_number() OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events WHERE event_type = 'purchase') x
          WHERE rn = 1),
        j AS (
          SELECT e.user_id, e.event_type,
                 lead(e.event_type) OVER (
                   PARTITION BY e.user_id ORDER BY e.ts, e.event_id)
                   AS nxt,
                 row_number() OVER (
                   PARTITION BY e.user_id ORDER BY e.ts, e.event_id)
                   AS rn
          FROM events e LEFT JOIN fp USING (user_id)
          WHERE fp.user_id IS NULL
             OR e.ts < fp.fpts
             OR (e.ts = fp.fpts AND e.event_id <= fp.fpid)),
        trans AS MATERIALIZED (
          SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT 'START' AS src, event_type AS dst FROM j WHERE rn = 1
            UNION ALL
            SELECT event_type AS src, nxt AS dst FROM j
            WHERE nxt IS NOT NULL) u
          GROUP BY src, dst),
        outs AS MATERIALIZED (SELECT src, CAST(sum(cnt) AS BIGINT) AS tot
                 FROM trans GROUP BY src),
        channels AS MATERIALIZED (
          SELECT DISTINCT state FROM (
            SELECT src AS state FROM trans
            UNION SELECT dst FROM trans) s
          WHERE state NOT IN ('START', 'purchase')),
        scens AS (SELECT '__base__' AS scen
                  UNION ALL SELECT state FROM channels),
        v0 AS (SELECT scen, 'START' AS state,
                      CAST(1000000000 AS BIGINT) AS val FROM scens),
        {",".join(ctes)},
        absorbed AS (
          SELECT scen, CAST(sum(a) AS BIGINT) AS a
          FROM ({abs_union}) z GROUP BY scen),
        base AS (
          SELECT CAST(coalesce(
            (SELECT a FROM absorbed WHERE scen = '__base__'), 0)
            AS BIGINT) AS a)
        SELECT ch.state AS channel,
               b.a AS base_conv_e9,
               CAST(coalesce(ab.a, 0) AS BIGINT) AS removed_conv_e9,
               CAST(b.a - coalesce(ab.a, 0) AS BIGINT)
                 AS removal_effect_e9
        FROM channels ch
        LEFT JOIN absorbed ab ON ab.scen = ch.state
        CROSS JOIN base b
        ORDER BY channel
    """


ORACLES.update({
    "q_theil_sen": f"""
        WITH ev AS (
          SELECT event_type,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS d,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vcents
          FROM events),
        daily AS (
          SELECT event_type, d, CAST(sum(vcents) AS BIGINT) AS y
          FROM ev GROUP BY 1, 2),
        pairs AS (
          SELECT a.event_type,
                 CAST(b.y - a.y AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
                   AS slope
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.d < b.d)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_pairs,
               {pround_sql('quantile_cont(slope, 0.5)', 6)}
                 AS theil_sen_slope
        FROM pairs GROUP BY 1 ORDER BY 1
    """,
    "q_geo_cell_smooth": f"""
        WITH pts AS ({_geo_pts_cte()}),
        cells AS (
          SELECT lat_units // 1000 AS cell_lat,
                 lon_units // 1000 AS cell_lon,
                 CAST(count(*) AS BIGINT) AS n_points
          FROM pts GROUP BY 1, 2),
        contrib AS (
          SELECT cell_lat + d1.o AS t_lat, cell_lon + d2.o AS t_lon,
                 n_points
          FROM cells,
               (VALUES (-1), (0), (1)) d1(o),
               (VALUES (-1), (0), (1)) d2(o)),
        box AS (
          SELECT t_lat, t_lon, CAST(sum(n_points) AS BIGINT) AS box_sum
          FROM contrib GROUP BY 1, 2)
        SELECT c.cell_lat, c.cell_lon, c.n_points, b.box_sum,
               {pround_sql('CAST(b.box_sum AS DOUBLE) / 9.0', 6)}
                 AS smoothed
        FROM cells c
        JOIN box b ON b.t_lat = c.cell_lat AND b.t_lon = c.cell_lon
        ORDER BY smoothed DESC, cell_lat, cell_lon LIMIT 20
    """,
    "q_markov_removal": _markov_removal_oracle(),
})


from .functions.holt import holt_weights_values_sql  # noqa: E402

ORACLES.update({
    "q_holt_forecast": f"""
        WITH daily AS (
          SELECT event_type,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS d,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        ranked AS (
          SELECT event_type, y,
                 row_number() OVER (
                   PARTITION BY event_type ORDER BY d DESC) AS p
          FROM daily QUALIFY p <= 16),
        tl AS (SELECT event_type, CAST(max(p) AS INT) AS t_len
               FROM ranked GROUP BY 1),
        j AS (
          SELECT r.event_type, tl.t_len, r.y, hw.wl, hw.wb
          FROM ranked r
          JOIN tl USING (event_type)
          JOIN {holt_weights_values_sql()}
            ON hw.t_len = tl.t_len AND hw.p = r.p)
        SELECT event_type, t_len,
               {pround_sql(
                   'CAST(CAST(sum(y * wl) AS BIGINT) AS DOUBLE) '
                   '/ 1000000000.0', 2)} AS level_cents,
               {pround_sql(
                   'CAST(CAST(sum(y * wb) AS BIGINT) AS DOUBLE) '
                   '/ 1000000000.0', 2)} AS trend_cents,
               {pround_sql(
                   'CAST(CAST(sum(y * wl) + sum(y * wb) AS BIGINT) '
                   'AS DOUBLE) / 1000000000.0', 2)} AS forecast_cents
        FROM j GROUP BY event_type, t_len
        ORDER BY event_type
    """,
    "q_wasserstein_1d": f"""
        WITH ev AS (
          SELECT event_type, CAST(floor(value) AS BIGINT) AS bucket
          FROM events),
        tc AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS c
               FROM ev GROUP BY 1, 2),
        gc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS g
               FROM ev GROUP BY 1),
        grid AS (
          SELECT t.event_type, g.bucket, g.g
          FROM (SELECT DISTINCT event_type FROM ev) t
          CROSS JOIN gc g),
        fullg AS (
          SELECT grid.event_type, grid.bucket,
                 CAST(coalesce(tc.c, 0) AS BIGINT) AS c, grid.g
          FROM grid LEFT JOIN tc
            ON tc.event_type = grid.event_type
           AND tc.bucket = grid.bucket),
        cums AS (
          SELECT event_type, bucket,
                 CAST(sum(c) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_t,
                 CAST(sum(g) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_g,
                 CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_t,
                 CAST(sum(g) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_g
          FROM fullg)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(max(n_t) AS BIGINT) AS n_t,
               {pround_sql(
                   'CAST(CAST(sum(abs(cum_t * n_g - cum_g * n_t)) '
                   'AS BIGINT) AS DOUBLE) '
                   '/ (CAST(max(n_t) AS DOUBLE) * CAST(max(n_g) AS DOUBLE))',
                   9)} AS w1_dollars
        FROM cums GROUP BY event_type ORDER BY event_type
    """,
    "q_qini_curve": f"""
        WITH users AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                          END) AS BIGINT) AS score,
                 CAST(max(CASE WHEN event_type = 'purchase' THEN 1
                          ELSE 0 END) AS BIGINT) AS converted,
                 {hash_units_sql("user_id", "arm", 2, _hex_bigint)}
                   AS treat
          FROM events GROUP BY user_id),
        banded AS (
          SELECT *,
                 CAST(ntile(10) OVER (ORDER BY score DESC, user_id)
                      AS INT) AS decile
          FROM users),
        per AS (
          SELECT decile,
                 CAST(sum(treat) AS BIGINT) AS tn,
                 CAST(sum(treat * converted) AS BIGINT) AS tc,
                 CAST(sum(1 - treat) AS BIGINT) AS cn,
                 CAST(sum((1 - treat) * converted) AS BIGINT) AS cc
          FROM banded GROUP BY decile),
        cum AS (
          SELECT decile,
                 CAST(sum(tn) OVER w AS BIGINT) AS cum_tn,
                 CAST(sum(tc) OVER w AS BIGINT) AS cum_tc,
                 CAST(sum(cn) OVER w AS BIGINT) AS cum_cn,
                 CAST(sum(cc) OVER w AS BIGINT) AS cum_cc
          FROM per
          WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
        SELECT decile, cum_tn, cum_tc, cum_cn, cum_cc,
               CASE WHEN cum_cn > 0 THEN {pround_sql(
                   'CAST(cum_tc AS DOUBLE) '
                   '- CAST(cum_cc * cum_tn AS DOUBLE) '
                   '/ CAST(cum_cn AS DOUBLE)', 6)}
                    ELSE NULL END AS qini
        FROM cum ORDER BY decile
    """,
})


from .functions.normal import p_table_values_sql  # noqa: E402


def _random_walks_oracle(steps: int = 4) -> str:
    """Unrolled deterministic-walk oracle mirroring q_random_walks: the
    per-source neighbor rank + md5 index selection, one CTE per hop."""
    ctes = []
    prev_cur = "cur"
    hop_cols = []
    for t in range(1, steps + 1):
        md5 = (
            f"md5(CAST(w.walk_id AS VARCHAR) || ':{t}:' "
            f"|| CAST(w.{prev_cur} AS VARCHAR))"
        )
        carry = ", ".join(f"w.{h}" for h in hop_cols)
        carry = carry + ", " if carry else ""
        ctes.append(f"""
        w{t} AS (
          SELECT w.walk_id, {carry}a.dst AS hop{t}
          FROM w{t - 1} w
          JOIN deg d ON d.src = w.{prev_cur}
          JOIN adj a ON a.src = w.{prev_cur}
           AND a.r = ({_hex_bigint(md5, 1, 8)} % d.deg) + 1)""")
        hop_cols.append(f"hop{t}")
        prev_cur = f"hop{t}"
    return (
        """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey % 10 = 0),
        e0 AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
        e AS (SELECT p1 AS src, p2 AS dst FROM e0
              UNION ALL SELECT p2 AS src, p1 AS dst FROM e0),
        p AS (SELECT probe FROM (
                SELECT src AS probe, count(*) AS deg
                FROM e GROUP BY src
                ORDER BY deg DESC, probe ASC LIMIT 32)),
        adj AS (SELECT src, dst,
                       row_number() OVER (
                         PARTITION BY src ORDER BY dst) AS r
                FROM e),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
                FROM e GROUP BY src),
        w0 AS (SELECT probe AS walk_id, probe AS cur FROM p),"""
        + ",".join(ctes)
        + f"""
        SELECT walk_id, {", ".join(hop_cols)}
        FROM w{steps} ORDER BY walk_id"""
    )


ORACLES.update({
    "q_random_walks": _random_walks_oracle(),
    "q_fdr_bh": f"""
        WITH rows_ AS (
          SELECT n.n_name,
                 CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS x
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey),
        per AS (
          SELECT n_name,
                 CAST(count(*) AS BIGINT) AS n1,
                 CAST(sum(x) AS BIGINT) AS s1,
                 sum(x * x) AS q1
          FROM rows_ GROUP BY n_name),
        tot AS (
          SELECT CAST(sum(n1) AS BIGINT) AS nt,
                 CAST(sum(s1) AS BIGINT) AS st,
                 sum(q1) AS qt,
                 CAST(count(*) AS BIGINT) AS m
          FROM per),
        zf AS (
          SELECT n_name, n1, m,
                 nt - n1 AS n0, st - s1 AS s0, qt - q1 AS q0, s1, q1
          FROM per CROSS JOIN tot),
        zed AS (
          SELECT n_name, n1 AS n_orders, m,
                 (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 / sqrt(
                     (CAST(CAST(n1 AS HUGEINT) * q1
                           - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)
                           AS DOUBLE)
                      / CAST(n1 * (n1 - 1) AS DOUBLE))
                       / CAST(n1 AS DOUBLE)
                   + (CAST(CAST(n0 AS HUGEINT) * q0
                           - CAST(s0 AS HUGEINT) * CAST(s0 AS HUGEINT)
                           AS DOUBLE)
                      / CAST(n0 * (n0 - 1) AS DOUBLE))
                       / CAST(n0 AS DOUBLE)) AS z
          FROM zf),
        scored AS (
          SELECT zed.*, pt.p_e9
          FROM (SELECT zed.*,
                       CAST(least(599,
                         floor(abs(z) * 100.0 + 0.5)) AS INT) AS zq
                FROM zed) zed
          JOIN {p_table_values_sql()} ON pt.zq = zed.zq),
        ranked AS (
          SELECT n_name, n_orders, z, p_e9,
                 CAST(row_number() OVER (ORDER BY p_e9, n_name)
                      AS BIGINT) AS k,
                 m
          FROM scored),
        ks AS (
          SELECT CAST(coalesce(max(CASE
                   WHEN p_e9 * m * 10 <= k * 1000000000 THEN k
                   ELSE 0 END), 0) AS BIGINT) AS kstar
          FROM ranked)
        SELECT n_name, n_orders,
               {pround_sql('z', 6)} AS z6,
               p_e9, k,
               (k <= kstar) AS rejected
        FROM ranked CROSS JOIN ks
        ORDER BY k
    """,
})


ORACLES.update({
    "q_nelson_aalen": """
        WITH ev AS (
          SELECT user_id,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS d,
                 event_type
          FROM events),
        per_user AS (
          SELECT user_id,
                 min(d) AS enter_d,
                 min(CASE WHEN event_type = 'purchase' THEN d END)
                   AS death_d,
                 max(d) AS last_d
          FROM ev GROUP BY user_id),
        spans AS (
          SELECT user_id, enter_d,
                 coalesce(death_d, last_d) AS exit_d,
                 death_d IS NOT NULL AS died
          FROM per_user),
        days AS (SELECT DISTINCT exit_d AS d FROM spans),
        at_risk AS (
          SELECT days.d,
                 CAST(count(*) AS BIGINT) AS n_risk,
                 CAST(sum(CASE WHEN s.died AND s.exit_d = days.d
                               THEN 1 ELSE 0 END) AS BIGINT) AS deaths
          FROM days JOIN spans s
            ON s.enter_d <= days.d AND days.d <= s.exit_d
          GROUP BY days.d),
        inc AS (
          SELECT d, n_risk, deaths,
                 CAST(floor(CAST(deaths * 1000000000000 AS DOUBLE)
                            / CAST(n_risk AS DOUBLE) + 0.5) AS BIGINT)
                   AS inc_e12
          FROM at_risk)
        SELECT d, n_risk, deaths,
               CAST(sum(inc_e12) OVER (
                 ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cumhaz_e12,
               CAST(CAST(sum(inc_e12) OVER (
                 ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS DOUBLE) / 1e12 AS cum_hazard
        FROM inc ORDER BY d
    """,
    "q_ab_bayes_normal": f"""
        WITH users AS (
          SELECT user_id,
                 CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) >= 14
                      THEN 1 ELSE 0 END AS BIGINT) AS conv,
                 {hash_units_sql("user_id", "arm", 2, _hex_bigint)}
                   AS arm
          FROM events GROUP BY user_id),
        piv AS (
          SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                      AS BIGINT) AS c_a,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_b,
                 CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                      AS BIGINT) AS c_b
          FROM users),
        zed AS (
          SELECT n_a, c_a, n_b, c_b,
                 (CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                  - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                 / sqrt(
                     (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                     * (1.0 - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                     / CAST(n_a AS DOUBLE)
                   + (CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                     * (1.0 - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                     / CAST(n_b AS DOUBLE)) AS z
          FROM piv
          WHERE (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                * (1.0 - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                / CAST(n_a AS DOUBLE)
              + (CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                * (1.0 - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                / CAST(n_b AS DOUBLE) > 0
          UNION ALL
          SELECT n_a, c_a, n_b, c_b, NULL AS z
          FROM piv
          WHERE NOT ((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                * (1.0 - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                / CAST(n_a AS DOUBLE)
              + (CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                * (1.0 - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                / CAST(n_b AS DOUBLE) > 0)),
        scored AS (
          SELECT zed.*,
                 CAST(least(599, floor(abs(z) * 100.0 + 0.5)) AS INT)
                   AS zq,
                 z >= 0 AS b_ahead
          FROM zed)
        SELECT n_a, c_a, n_b, c_b,
               {pround_sql('z', 6)} AS z6,
               CAST(CASE WHEN b_ahead
                         THEN 1000000000 - (pt.p_e9 // 2)
                         ELSE pt.p_e9 // 2 END AS BIGINT)
                 AS prob_b_beats_a_e9
        FROM scored JOIN {p_table_values_sql()} ON pt.zq = scored.zq
    """,
})


def _pca_power_oracle(iters: int = 3, scale: int = 10**6) -> str:
    """Unrolled power iteration mirroring q_pca_power_iteration: full
    integer covariance in HUGEINT, sign-split truncating renormalization
    per round.  MATERIALIZED everywhere (the q_markov_removal lesson —
    inlined CTE chains re-evaluate exponentially)."""
    ctes = []
    for t in range(1, iters + 1):
        p = t - 1
        ctes.append(f"""
        w{t} AS MATERIALIZED (
          SELECT c.i, CAST(sum(c.cij * v.v) AS HUGEINT) AS w
          FROM c JOIN v{p} v ON v.i = c.j GROUP BY c.i),
        m{t} AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w{t}),
        v{t} AS MATERIALIZED (
          SELECT w.i, CAST(CASE WHEN m.m = 0 THEN vp.v
                     WHEN w.w < 0 THEN -((-w.w) * {scale} // m.m)
                     ELSE (w.w * {scale}) // m.m END AS HUGEINT) AS v
          FROM w{t} w JOIN v{p} vp ON vp.i = w.i, m{t} m)""")
    return (
        f"""
        WITH x AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                            * 1000000.0 + 0.5) AS BIGINT) AS xi
          FROM embeddings),
        nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
        s AS (SELECT pos, CAST(sum(xi) AS HUGEINT) AS sv
              FROM x GROUP BY 1),
        g2 AS (
          SELECT a.pos AS i, b.pos AS j,
                 CAST(sum(CAST(a.xi AS HUGEINT) * b.xi) AS HUGEINT) AS t
          FROM x a JOIN x b ON a.vec_id = b.vec_id
          GROUP BY 1, 2),
        c AS MATERIALIZED (
          SELECT g2.i, g2.j, nn.n * g2.t - si.sv * sj.sv AS cij
          FROM g2 JOIN s si ON si.pos = g2.i
                 JOIN s sj ON sj.pos = g2.j, nn),
        v0 AS (SELECT pos AS i, CAST({scale} AS HUGEINT) AS v
               FROM (SELECT DISTINCT pos FROM x)),"""
        + ",".join(ctes)
        + f"""
        SELECT CAST(i + 1 AS INT) AS dim, CAST(v AS BIGINT) AS v_e6
        FROM v{iters} ORDER BY dim"""
    )


ORACLES.update({"q_pca_power_iteration": _pca_power_oracle()})


ORACLES.update({
    "q_propensity_match": f"""
        WITH users AS (
          SELECT user_id,
                 least(20, sum(CASE WHEN event_type = 'click'
                               THEN 1 ELSE 0 END)) AS stratum,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS outcome,
                 {hash_units_sql("user_id", "arm", 2, _hex_bigint)}
                   AS treat
          FROM events GROUP BY user_id),
        ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY stratum, treat ORDER BY user_id) AS rn
          FROM users),
        pairs AS (
          SELECT t.stratum, t.outcome AS y_t, c.outcome AS y_c
          FROM (SELECT * FROM ranked WHERE treat = 1) t
          JOIN (SELECT * FROM ranked WHERE treat = 0) c
            ON t.stratum = c.stratum AND t.rn = c.rn),
        sizes AS (
          SELECT stratum,
                 CAST(sum(treat) AS BIGINT) AS n_treated,
                 CAST(sum(1 - treat) AS BIGINT) AS n_control
          FROM users GROUP BY stratum),
        matched AS (
          SELECT stratum,
                 CAST(count(*) AS BIGINT) AS n_matched,
                 CAST(sum(y_t - y_c) AS BIGINT) AS dsum
          FROM pairs GROUP BY stratum)
        SELECT s.stratum AS stratum, s.n_treated, s.n_control,
               CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
               CASE WHEN m.n_matched > 0 THEN {pround_sql(
                   'CAST(m.dsum AS DOUBLE) / CAST(m.n_matched AS DOUBLE)',
                   6)} ELSE NULL END AS att
        FROM sizes s LEFT JOIN matched m ON m.stratum = s.stratum
        ORDER BY s.stratum
    """,
    "q_holt_backtest": f"""
        WITH daily AS (
          SELECT event_type,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS d,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        seq AS (
          SELECT event_type, d, y,
                 row_number() OVER w AS r,
                 lag(y) OVER w AS y_prev
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY d)),
        tgt AS (
          SELECT event_type, r AS r_t, y AS y_true, y_prev,
                 CAST(least(16, r - 1) AS INT) AS t_len
          FROM seq WHERE r >= 3),
        cand AS (
          SELECT t.event_type, t.r_t, t.y_true, t.y_prev, t.t_len,
                 h.y AS y_h, CAST(t.r_t - h.r AS INT) AS p
          FROM tgt t JOIN seq h
            ON h.event_type = t.event_type
           AND h.r < t.r_t AND h.r >= t.r_t - t.t_len),
        fc AS (
          SELECT c.event_type, c.r_t, c.y_true, c.y_prev,
                 CAST(sum(c.y_h * (hw.wl + hw.wb)) AS BIGINT) AS f_e9
          FROM cand c
          JOIN {holt_weights_values_sql()}
            ON hw.t_len = c.t_len AND hw.p = c.p
          GROUP BY 1, 2, 3, 4),
        errs AS (
          SELECT event_type,
                 abs(y_true * 1000000000 - f_e9) AS err_holt_e9,
                 abs(y_true - y_prev) * 1000000000 AS err_naive_e9
          FROM fc)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               {pround_sql(
                   'CAST(CAST(sum(err_holt_e9) AS BIGINT) AS DOUBLE) '
                   '/ CAST(count(*) * 1000000000 AS DOUBLE)', 2)}
                 AS mae_holt_cents,
               {pround_sql(
                   'CAST(CAST(sum(err_naive_e9) AS BIGINT) AS DOUBLE) '
                   '/ CAST(count(*) * 1000000000 AS DOUBLE)', 2)}
                 AS mae_naive_cents,
               {pround_sql(
                   'CAST(CAST(sum(err_holt_e9) AS BIGINT) AS DOUBLE) '
                   '/ CAST(CAST(sum(err_naive_e9) AS BIGINT) AS DOUBLE)',
                   6)} AS holt_vs_naive
        FROM errs GROUP BY event_type ORDER BY event_type
    """,
})


from .functions.normal import gaussian_kernel_values_sql  # noqa: E402


def _pacf_oracle(K: int = 5, Z: int = 10**9) -> str:
    """Unrolled Levinson-Durbin mirroring queries._durbin_levinson —
    the generator REUSES the Python recursion's loop structure so the
    two engines cannot drift: per level k, the num/den sums and the
    phi-row update are emitted from the same j-loops."""

    def sdiv(a: str, b: str) -> str:
        return (
            f"(CASE WHEN (({a}) < 0) != (({b}) < 0) THEN -1 ELSE 1 END)"
            f" * (abs({a}) // abs({b}))"
        )

    gsel = ", ".join(
        f"CAST(coalesce(max(CASE WHEN lag = {k} THEN g END), 0) "
        f"AS HUGEINT) AS g{k}"
        for k in range(K + 1)
    )
    rsel = ", ".join(
        sdiv(f"g{k} * {Z}", "g0") + f" AS r{k}" for k in range(1, K + 1)
    )
    levels = [f"p1 AS (SELECT rs.*, r1 AS f1_1 FROM rs)"]
    for k in range(2, K + 1):
        p = k - 1
        num_terms = " - ".join(
            [f"r{k} * {Z}"]
            + [f"f{p}_{j} * r{k - j}" for j in range(1, k)]
        )
        den_terms = " - ".join(
            [f"CAST({Z} AS HUGEINT) * {Z}"]
            + [f"f{p}_{j} * r{j}" for j in range(1, k)]
        )
        cols = [f"p{p}.*", f"({num_terms}) AS num{k}", f"({den_terms}) AS den{k}"]
        pre = f"p{k}a AS (SELECT {', '.join(cols)} FROM p{p})"
        kk = sdiv(f"num{k} * {Z}", f"den{k}")
        upd = [f"p{k}a.*", f"{kk} AS f{k}_{k}"]
        mid = f"p{k}b AS (SELECT {', '.join(upd)} FROM p{k}a)"
        row = [f"p{k}b.*"] + [
            f"(f{p}_{j} - {sdiv(f'f{k}_{k} * f{p}_{k - j}', str(Z))})"
            f" AS f{k}_{j}"
            for j in range(1, k)
        ]
        fin = f"p{k} AS (SELECT {', '.join(row)} FROM p{k}b)"
        levels += [pre, mid, fin]
    out = " UNION ALL ".join(
        f"SELECT {k} AS lag, CAST(r{k} AS BIGINT) AS acf_e9, "
        f"CAST(f{k}_{k} AS BIGINT) AS pacf_e9 FROM p{K}"
        for k in range(1, K + 1)
    )
    return f"""
        WITH daily AS (
          SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS d,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS y
          FROM events GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                       CAST(sum(y) AS HUGEINT) AS s FROM daily),
        seq AS (SELECT d, (tot.n * y - tot.s) AS a FROM daily, tot),
        g AS (
          SELECT b.d - a.d AS lag,
                 CAST(sum(a.a * b.a) AS HUGEINT) AS g
          FROM seq a JOIN seq b
            ON b.d >= a.d AND b.d <= a.d + {K}
          GROUP BY 1),
        gs AS (SELECT {gsel} FROM g),
        rs AS (SELECT gs.*, {rsel} FROM gs),
        {", ".join(levels)}
        SELECT * FROM ({out}) z ORDER BY lag
    """


ORACLES.update({
    "q_kde_density": f"""
        WITH ev AS (
          SELECT CAST(floor(value) AS BIGINT) AS bucket FROM events),
        counts AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS c
          FROM ev GROUP BY 1),
        contrib AS (
          SELECT counts.bucket + kk.o AS b, counts.c * kk.w AS cw
          FROM counts, {gaussian_kernel_values_sql()}),
        dens AS (
          SELECT b, CAST(sum(cw) AS BIGINT) AS density_e9
          FROM contrib GROUP BY 1)
        SELECT d.b AS bucket,
               CAST(coalesce(c.c, 0) AS BIGINT) AS n_raw,
               d.density_e9
        FROM dens d LEFT JOIN counts c ON c.bucket = d.b
        ORDER BY d.density_e9 DESC, bucket LIMIT 20
    """,
    "q_pacf_durbin": _pacf_oracle(),
})


ORACLES.update({
    "q_geo_od_matrix": f"""
        WITH ev AS (
          SELECT user_id, ts, event_id,
                 {hash_units_sql("event_id", "elat", 100_000, _hex_bigint)}
                   // 5000 AS cell_lat,
                 {hash_units_sql("event_id", "elon", 100_000, _hex_bigint)}
                   // 5000 AS cell_lon
          FROM events),
        seq AS (
          SELECT user_id, cell_lat, cell_lon,
                 lead(cell_lat) OVER w AS to_lat,
                 lead(cell_lon) OVER w AS to_lon
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT cell_lat AS from_lat, cell_lon AS from_lon,
               to_lat, to_lon,
               CAST(count(*) AS BIGINT) AS n_trips
        FROM seq
        WHERE to_lat IS NOT NULL
          AND (cell_lat != to_lat OR cell_lon != to_lon)
        GROUP BY 1, 2, 3, 4
        ORDER BY n_trips DESC, from_lat, from_lon, to_lat, to_lon
        LIMIT 20
    """,
    "q_price_index": f"""
        WITH li AS (
          SELECT l_partkey, year(l_shipdate) AS yr,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   AS cents,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
          FROM lineitem),
        base AS (
          SELECT l_partkey,
                 CAST(sum(cents) AS BIGINT) AS s_0,
                 CAST(sum(qty) AS BIGINT) AS q_0
          FROM li WHERE yr = 1995 GROUP BY 1 HAVING sum(qty) > 0),
        curr AS (
          SELECT l_partkey,
                 CAST(sum(cents) AS BIGINT) AS s_t,
                 CAST(sum(qty) AS BIGINT) AS q_t
          FROM li WHERE yr = 2000 GROUP BY 1 HAVING sum(qty) > 0),
        m AS (SELECT * FROM base JOIN curr USING (l_partkey)),
        terms AS (
          SELECT (s_t * q_0 * 1000000) // q_t AS lnum,
                 (s_0 * q_t * 1000000) // q_0 AS pden,
                 s_0, s_t
          FROM m),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_parts,
                 sum(CAST(lnum AS HUGEINT)) AS lnum_sum,
                 sum(CAST(pden AS HUGEINT)) AS pden_sum,
                 sum(CAST(s_0 AS HUGEINT)) AS s0_sum,
                 sum(CAST(s_t AS HUGEINT)) AS st_sum
          FROM terms)
        SELECT n_parts,
               {pround_sql(
                   'CAST(lnum_sum AS DOUBLE) '
                   '/ (CAST(s0_sum AS DOUBLE) * 1e6)', 6)} AS laspeyres,
               {pround_sql(
                   '(CAST(st_sum AS DOUBLE) * 1e6) '
                   '/ CAST(pden_sum AS DOUBLE)', 6)} AS paasche,
               {pround_sql(
                   'sqrt((CAST(lnum_sum AS DOUBLE) '
                   '/ (CAST(s0_sum AS DOUBLE) * 1e6)) '
                   '* ((CAST(st_sum AS DOUBLE) * 1e6) '
                   '/ CAST(pden_sum AS DOUBLE)))', 6)} AS fisher
        FROM agg
    """,
})


def _dtw_oracle(max_n: int = 40, inf: int = 10**15) -> str:
    """Generated DTW oracle mirroring q_dtw_distance: one CTE pair per
    row i, the in-row sequential dependency re-expressed as a window
    prefix-min (D(i,j) = C_ij + min_{k<=j}(m_k - C_{i,k-1})) — exact
    integer algebra, so the unrolled form equals the classic DP."""
    ctes = []
    for i in range(1, max_n + 1):
        init = 0 if i == 1 else inf
        ctes.append(f"""
        c{i} AS MATERIALIZED (
          SELECT b.j, abs((SELECT y FROM a WHERE i = {i}) - b.y) AS c
          FROM b),
        t{i} AS MATERIALIZED (
          SELECT cb.j,
                 sum(cb.c) OVER (ORDER BY cb.j
                   ROWS UNBOUNDED PRECEDING) AS csum,
                 least(rp.d, coalesce(lag(rp.d) OVER (ORDER BY cb.j),
                       {init})) AS m
          FROM c{i} cb JOIN r{i - 1} rp ON rp.j = cb.j),
        s{i} AS MATERIALIZED (
          SELECT j, csum,
                 m - coalesce(lag(csum) OVER (ORDER BY j), 0) AS z
          FROM t{i}),
        r{i} AS MATERIALIZED (
          SELECT j, CAST(csum + min(z) OVER (ORDER BY j
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS d
          FROM s{i})""")
    allr = " UNION ALL ".join(
        f"SELECT {i} AS i, j, d FROM r{i}" for i in range(1, max_n + 1)
    )
    return (
        f"""
        WITH daily AS (
          SELECT event_type,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS dd,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS y
          FROM events
          WHERE event_type IN ('click', 'purchase')
          GROUP BY 1, 2),
        a AS (SELECT row_number() OVER (ORDER BY dd) AS i, y
              FROM daily WHERE event_type = 'click'),
        b AS (SELECT row_number() OVER (ORDER BY dd) AS j, y
              FROM daily WHERE event_type = 'purchase'),
        r0 AS (SELECT j, CAST({inf} AS BIGINT) AS d FROM b),"""
        + ",".join(ctes)
        + f"""
        SELECT CAST((SELECT count(*) FROM a) AS INT) AS n_a,
               CAST((SELECT count(*) FROM b) AS INT) AS n_b,
               z.d AS dtw_cents
        FROM ({allr}) z
        WHERE z.i = (SELECT count(*) FROM a)
          AND z.j = (SELECT count(*) FROM b)"""
    )


ORACLES.update({
    "q_dtw_distance": _dtw_oracle(),
    "q_changepoint_binseg": f"""
        WITH daily AS (
          SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS d,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS y
          FROM events GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(y) AS BIGINT) AS s FROM daily),
        pre AS (
          SELECT d,
                 CAST(count(*) OVER w AS BIGINT) AS n_l,
                 CAST(sum(y) OVER w AS BIGINT) AS s_l
          FROM daily
          WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)),
        cand AS (
          SELECT pre.d, pre.n_l, pre.s_l,
                 tot.n - pre.n_l AS n_r,
                 tot.s - pre.s_l AS s_r
          FROM pre, tot WHERE pre.n_l < tot.n),
        scored AS (
          SELECT d, n_l, n_r, s_l, s_r,
                 CAST(CAST(s_l AS HUGEINT) * s_l * n_r
                      + CAST(s_r AS HUGEINT) * s_r * n_l AS DOUBLE)
                 / CAST(n_l * n_r AS DOUBLE) AS score
          FROM cand),
        best AS (
          SELECT *, row_number() OVER (ORDER BY score DESC, d) AS rn
          FROM scored)
        SELECT d AS split_day, n_l, n_r,
               {pround_sql('CAST(s_l AS DOUBLE) / CAST(n_l AS DOUBLE)',
                           2)} AS mean_l_cents,
               {pround_sql('CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE)',
                           2)} AS mean_r_cents,
               {pround_sql('score', 2)} AS score
        FROM best WHERE rn = 1
    """,
})


ORACLES.update({
    "q_attribution_time_decay": f"""
        WITH fp AS (
          SELECT user_id, ts AS fpts, event_id AS fpid FROM (
            SELECT user_id, ts, event_id,
                   row_number() OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events WHERE event_type = 'purchase') x
          WHERE rn = 1),
        touches AS (
          SELECT e.user_id, e.event_type AS channel,
                 CAST(least(30,
                   (epoch_us(fp.fpts) - epoch_us(e.ts)) // 86400000000)
                   AS INT) AS age_days
          FROM events e JOIN fp USING (user_id)
          WHERE (e.ts < fp.fpts
                 OR (e.ts = fp.fpts AND e.event_id <= fp.fpid))
            AND e.event_type != 'purchase'),
        weighted AS (
          SELECT channel,
                 1000000000 // CAST(power(2, age_days) AS BIGINT)
                   AS weight_e9
          FROM touches),
        tot AS (SELECT CAST(sum(weight_e9) AS BIGINT) AS t
                FROM weighted)
        SELECT channel,
               CAST(count(*) AS BIGINT) AS touches,
               CAST(sum(weight_e9) AS BIGINT) AS weight_e9,
               {pround_sql(
                   'CAST(sum(weight_e9) AS DOUBLE) / CAST(t AS DOUBLE)',
                   6)} AS share
        FROM weighted, tot GROUP BY channel, t ORDER BY channel
    """,
    "q_runs_test": f"""
        WITH daily AS (
          SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS d,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS y
          FROM events GROUP BY 1),
        ranked AS (
          SELECT d, y,
                 row_number() OVER (ORDER BY y, d) AS r,
                 count(*) OVER () AS n
          FROM daily),
        m2t AS (
          SELECT CAST(sum(y) * 2 / count(*) AS BIGINT) AS m2
          FROM ranked
          WHERE r * 2 = n OR r * 2 = n + 1 OR r * 2 = n + 2),
        signs AS (
          SELECT d,
                 CASE WHEN y * 2 > m2t.m2 THEN 1 ELSE 0 END AS s
          FROM daily, m2t),
        runs_ AS (
          SELECT s,
                 CASE WHEN lag(s) OVER (ORDER BY d) IS NULL
                        OR lag(s) OVER (ORDER BY d) != s
                      THEN 1 ELSE 0 END AS new_run
          FROM signs),
        agg AS (
          SELECT CAST(sum(new_run) AS BIGINT) AS runs,
                 CAST(sum(s) AS BIGINT) AS n1,
                 CAST(sum(1 - s) AS BIGINT) AS n2
          FROM runs_),
        zed AS (
          SELECT runs, n1, n2,
                 CASE WHEN CAST(2.0 * n1 * n2 AS DOUBLE)
                        * CAST(2.0 * n1 * n2 - (n1 + n2) AS DOUBLE)
                        / (CAST(n1 + n2 AS DOUBLE)
                           * CAST(n1 + n2 AS DOUBLE)
                           * CAST(n1 + n2 - 1 AS DOUBLE)) > 0
                 THEN (CAST(runs AS DOUBLE)
                  - (1.0 + CAST(2.0 * n1 * n2 AS DOUBLE)
                           / CAST(n1 + n2 AS DOUBLE)))
                 / sqrt(CAST(2.0 * n1 * n2 AS DOUBLE)
                        * CAST(2.0 * n1 * n2 - (n1 + n2) AS DOUBLE)
                        / (CAST(n1 + n2 AS DOUBLE)
                           * CAST(n1 + n2 AS DOUBLE)
                           * CAST(n1 + n2 - 1 AS DOUBLE))) END AS z
          FROM agg),
        scored AS (
          SELECT zed.*,
                 CAST(least(599, floor(abs(z) * 100.0 + 0.5)) AS INT)
                   AS zq
          FROM zed)
        SELECT runs, n1, n2, {pround_sql('z', 6)} AS z6, pt.p_e9
        FROM scored LEFT JOIN {p_table_values_sql()}
          ON pt.zq = scored.zq
    """,
    "q_mcnemar": f"""
        WITH users AS (
          SELECT user_id,
                 max(CASE WHEN day(CAST(ts AS DATE)) <= 7
                     THEN 1 ELSE 0 END) AS w1,
                 max(CASE WHEN day(CAST(ts AS DATE)) >= 24
                     THEN 1 ELSE 0 END) AS w4
          FROM events GROUP BY user_id),
        agg AS (
          SELECT CAST(sum(CASE WHEN w1 = 1 AND w4 = 0 THEN 1 ELSE 0
                          END) AS BIGINT) AS b,
                 CAST(sum(CASE WHEN w1 = 0 AND w4 = 1 THEN 1 ELSE 0
                          END) AS BIGINT) AS c,
                 CAST(count(*) AS BIGINT) AS n_users
          FROM users),
        scored AS (
          SELECT n_users, b, c,
                 CASE WHEN b + c > 0 THEN
                   CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                   / CAST(b + c AS DOUBLE) END AS chi2
          FROM agg),
        q AS (
          SELECT n_users, b, c,
                 {pround_sql('chi2', 6)} AS chi2,
                 CAST(least(599, floor(sqrt(chi2) * 100.0 + 0.5))
                      AS INT) AS zq
          FROM scored)
        SELECT q.n_users, q.b, q.c, q.chi2, pt.p_e9
        FROM q LEFT JOIN {p_table_values_sql()} ON pt.zq = q.zq
    """,
})


ORACLES.update({
    "q_cmh_test": f"""
        WITH big AS (
          SELECT DISTINCT o_custkey FROM orders
          WHERE o_totalprice > 450000),
        users AS (
          SELECT c.c_mktsegment,
                 {hash_units_sql("c.c_custkey", "arm", 2, _hex_bigint)}
                   AS exposed,
                 CASE WHEN b.o_custkey IS NOT NULL THEN 1 ELSE 0 END
                   AS outcome
          FROM customer c LEFT JOIN big b ON c.c_custkey = b.o_custkey),
        per AS (
          SELECT c_mktsegment,
                 CAST(sum(CASE WHEN exposed = 1 AND outcome = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(sum(exposed) AS BIGINT) AS r1,
                 CAST(sum(outcome) AS BIGINT) AS c1,
                 CAST(count(*) AS BIGINT) AS n
          FROM users GROUP BY 1),
        terms AS (
          SELECT a,
                 (r1 * c1 // n) * 1000000000
                   + ((r1 * c1 % n) * 1000000000) // n AS e_e9,
                 CAST(floor(CAST(r1 * (n - r1) AS DOUBLE)
                   * CAST(c1 * (n - c1) AS DOUBLE) * 1000000000.0
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      * CAST(n - 1 AS DOUBLE)) + 0.5) AS BIGINT)
                   AS v_e9
          FROM per),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_strata,
                 CAST(sum(a) AS BIGINT) AS sum_a,
                 CAST(sum(e_e9) AS BIGINT) AS sum_e_e9,
                 CAST(sum(v_e9) AS BIGINT) AS sum_v_e9
          FROM terms),
        zed AS (
          SELECT agg.*,
                 CASE WHEN sum_v_e9 > 0 THEN
                   (abs(CAST(sum_a AS DOUBLE)
                        - CAST(sum_e_e9 AS DOUBLE) / 1e9) - 0.5)
                   / sqrt(CAST(sum_v_e9 AS DOUBLE) / 1e9) END AS z
          FROM agg),
        scored AS (
          SELECT zed.*,
                 CAST(least(599, floor(abs(z) * 100.0 + 0.5)) AS INT)
                   AS zq
          FROM zed)
        SELECT n_strata, sum_a, sum_e_e9, sum_v_e9,
               {pround_sql('z', 6)} AS z6, pt.p_e9
        FROM scored LEFT JOIN {p_table_values_sql()}
          ON pt.zq = scored.zq
    """,
})


def _hurst_oracle(sizes=(5, 10, 15)) -> str:
    """Per-size R/S CTEs mirroring q_hurst_exponent; the 3-point OLS
    constants are computed with the SAME Python pinning as the query."""
    import math as _m

    lx = {s: _m.floor(_m.log(s) * 1e6 + 0.5) / 1e6 for s in sizes}
    xbar = sum(lx.values()) / len(lx)
    sxx = sum((v - xbar) ** 2 for v in lx.values())
    ctes = []
    for s in sizes:
        ctes.append(f"""
        ch{s} AS (SELECT t, y, (t - 1) // {s} AS chunk FROM seqq),
        full{s} AS (SELECT chunk FROM ch{s} GROUP BY chunk
                    HAVING count(*) = {s}),
        cs{s} AS (
          SELECT c.chunk, CAST(sum(c.y) AS BIGINT) AS sy
          FROM ch{s} c JOIN full{s} USING (chunk) GROUP BY c.chunk),
        dev{s} AS (
          SELECT c.chunk, c.t, (c.y * {s} - cs.sy) AS a,
                 sum(c.y * {s} - cs.sy) OVER (
                   PARTITION BY c.chunk ORDER BY c.t
                   ROWS UNBOUNDED PRECEDING) AS z
          FROM ch{s} c JOIN cs{s} cs ON cs.chunk = c.chunk),
        rs{s} AS (
          SELECT chunk, CAST(max(z) - min(z) AS BIGINT) AS rp,
                 sum(CAST(a AS HUGEINT) * a) AS d2
          FROM dev{s} GROUP BY chunk
          HAVING (max(z) - min(z)) > 0
             AND sum(CAST(a AS HUGEINT) * a) > 0),
        lnt{s} AS (
          SELECT CAST(floor(ln(CAST(rp AS DOUBLE) * sqrt({s}.0)
                   / sqrt(CAST(d2 AS DOUBLE))) * 1000000.0 + 0.5)
                 AS BIGINT) AS ln_e6
          FROM rs{s}),
        m{s} AS (
          SELECT CAST(count(*) AS BIGINT) AS n{s},
                 CAST(sum(ln_e6) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   / 1000000.0 AS l{s}
          FROM lnt{s})"""
        )
    slope = " + ".join(
        f"({lx[s] - xbar!r}) * l{s}" for s in sizes
    )
    return (
        """
        WITH daily AS (
          SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS d,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS y
          FROM events GROUP BY 1),
        seqq AS (SELECT y, row_number() OVER (ORDER BY d) AS t
                 FROM daily),"""
        + ",".join(ctes)
        + f"""
        SELECT n5, n10, n15,
               {pround_sql('l5', 6)} AS ln_rs_5,
               {pround_sql('l10', 6)} AS ln_rs_10,
               {pround_sql('l15', 6)} AS ln_rs_15,
               {pround_sql(f'(({slope}) / {sxx!r})', 6)} AS hurst
        FROM m5, m10, m15"""
    )


ORACLES.update({
    "q_spc_xbar": f"""
        WITH ev AS (
          SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS d,
                 event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vcents
          FROM events),
        sub AS (
          SELECT d,
                 CAST(count(*) AS BIGINT) AS n_sub,
                 CAST(sum(vcents) AS BIGINT) AS s,
                 CAST(max(vcents) - min(vcents) AS BIGINT) AS r
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY d ORDER BY event_id) AS rn FROM ev) x
          WHERE rn <= 5 GROUP BY d HAVING count(*) = 5),
        grand AS (
          SELECT CAST(sum(s) AS DOUBLE)
                   / CAST(count(*) * 5 AS DOUBLE) AS cl,
                 CAST(sum(r) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   * 0.577 AS a2rbar
          FROM sub)
        SELECT d,
               {pround_sql('CAST(s AS DOUBLE) / 5.0', 2)} AS xbar_cents,
               r,
               {pround_sql('cl', 2)} AS cl_cents,
               {pround_sql('cl + a2rbar', 2)} AS ucl_cents,
               {pround_sql('cl - a2rbar', 2)} AS lcl_cents,
               (CAST(s AS DOUBLE) / 5.0 > cl + a2rbar
                OR CAST(s AS DOUBLE) / 5.0 < cl - a2rbar)
                 AS out_of_control
        FROM sub, grand ORDER BY d
    """,
    "q_hurst_exponent": _hurst_oracle(),
})


ORACLES.update({
    "q_cointegration": f"""
        WITH daily AS (
          SELECT d,
                 CAST(sum(CASE WHEN event_type = 'click'
                          THEN vcents END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                          THEN vcents END) AS BIGINT) AS y
          FROM (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(ts AS DATE)) AS d,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS vcents
            FROM events
            WHERE event_type IN ('click', 'purchase')) e
          GROUP BY d
          HAVING sum(CASE WHEN event_type = 'click' THEN vcents END)
                   IS NOT NULL
             AND sum(CASE WHEN event_type = 'purchase' THEN vcents END)
                   IS NOT NULL),
        sums AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 sum(CAST(x AS HUGEINT) * x) AS sxx,
                 sum(CAST(x AS HUGEINT) * y) AS sxy
          FROM daily),
        ab AS (
          SELECT n,
                 CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                   AS beta,
                 sx, sy
          FROM sums),
        ab2 AS (
          SELECT n, beta,
                 (CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) AS alpha
          FROM ab),
        resid AS (
          SELECT daily.d, ab2.n, ab2.beta, ab2.alpha,
                 CAST(floor((CAST(daily.y AS DOUBLE) - ab2.alpha
                             - ab2.beta * CAST(daily.x AS DOUBLE))
                            * 100.0 + 0.5) AS BIGINT) AS ep
          FROM daily, ab2),
        lagd AS (
          SELECT *, lag(ep) OVER (ORDER BY d) AS ep_prev FROM resid),
        adf AS (
          SELECT max(n) AS n, max(beta) AS beta, max(alpha) AS alpha,
                 CAST(count(*) AS BIGINT) AS m,
                 sum(CAST(ep_prev AS HUGEINT) * (ep - ep_prev)) AS spd,
                 sum(CAST(ep_prev AS HUGEINT) * ep_prev) AS spp,
                 sum(CAST(ep - ep_prev AS HUGEINT) * (ep - ep_prev))
                   AS sdd
          FROM lagd WHERE ep_prev IS NOT NULL),
        tt AS (
          SELECT n, m, beta, alpha,
                 CAST(spd AS DOUBLE) / CAST(spp AS DOUBLE) AS g,
                 (CAST(sdd AS DOUBLE)
                  - (CAST(spd AS DOUBLE) / CAST(spp AS DOUBLE))
                    * CAST(spd AS DOUBLE)) AS ssr,
                 spp
          FROM adf)
        SELECT n, m,
               {pround_sql('beta', 6)} AS beta,
               {pround_sql('alpha', 2)} AS alpha_cents,
               {pround_sql('g', 6)} AS gamma,
               {pround_sql(
                   'g / sqrt((ssr / CAST(m - 1 AS DOUBLE)) '
                   '/ CAST(spp AS DOUBLE))', 6)} AS adf_t,
               (g / sqrt((ssr / CAST(m - 1 AS DOUBLE))
                         / CAST(spp AS DOUBLE)) < -3.37)
                 AS cointegrated_5pct
        FROM tt
    """,
})


def _kruskal_oracle() -> str:
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    k = len(pris)
    csel = ", ".join(
        f"CAST(sum(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c{j}"
        for j, p in enumerate(pris)
    )
    tsum = " + ".join(f"c{j}" for j in range(k))
    nsel = ", ".join(
        f"CAST(sum(c{j}) AS BIGINT) AS n{j}" for j in range(k)
    )
    r2sel = ", ".join(
        f"sum(CAST(c{j} AS HUGEINT) * (2 * b + t + 1)) AS r2_{j}"
        for j in range(k)
    )
    ncols = " + ".join(f"n{j}" for j in range(k))
    terms = " + ".join(
        f"(CAST(r2_{j} AS DOUBLE) * CAST(r2_{j} AS DOUBLE))"
        f" / (4.0 * CAST(n{j} AS DOUBLE))"
        for j in range(k)
    )
    nlist = ", ".join(f"n{j}" for j in range(k))
    return f"""
        WITH g AS (
          SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
                 {csel}
          FROM orders GROUP BY 1),
        g2 AS (SELECT *, {tsum} AS t FROM g),
        cum AS (
          SELECT *,
                 CAST(sum(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) - t AS b
          FROM g2),
        agg AS (
          SELECT {nsel}, {r2sel},
                 sum(CAST(t AS HUGEINT) * t * t - t) AS tie3
          FROM cum),
        hh AS (
          SELECT {nlist}, tie3,
                 CAST({ncols} AS DOUBLE) AS nd,
                 ({terms}) AS srn
          FROM agg)
        SELECT {nlist},
               {pround_sql(
                   '((12.0 / (nd * (nd + 1.0)) * srn - 3.0 * (nd + 1.0))'
                   ' / (1.0 - CAST(tie3 AS DOUBLE)'
                   ' / (nd * nd * nd - nd)))', 6)} AS h,
               (((12.0 / (nd * (nd + 1.0)) * srn - 3.0 * (nd + 1.0))
                 / (1.0 - CAST(tie3 AS DOUBLE) / (nd * nd * nd - nd)))
                > 9.4877) AS significant_5pct
        FROM hh
    """


ORACLES.update({"q_kruskal_wallis": _kruskal_oracle()})


ORACLES.update({
    "q_burrows_delta": f"""
        WITH tok AS (
          SELECT source, unnest({_TOKENS}) AS w FROM documents),
        top_words AS (
          SELECT w FROM (
            SELECT w, count(*) AS cnt FROM tok GROUP BY w
            ORDER BY cnt DESC, w LIMIT 20)),
        top_sources AS (
          SELECT source FROM (
            SELECT source, count(*) AS nd FROM documents GROUP BY source
            ORDER BY nd DESC, source LIMIT 10)),
        stok AS (SELECT t.* FROM tok t JOIN top_sources USING (source)),
        n_s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tok
                FROM stok GROUP BY source),
        swc AS (
          SELECT s.source, s.w, CAST(count(*) AS BIGINT) AS c
          FROM stok s JOIN top_words USING (w)
          GROUP BY s.source, s.w),
        grid AS (
          SELECT ts.source, tw.w,
                 (coalesce(swc.c, 0) * 1000000000) // n_s.n_tok AS f_e9
          FROM top_sources ts
          CROSS JOIN top_words tw
          LEFT JOIN swc ON swc.source = ts.source AND swc.w = tw.w
          JOIN n_s ON n_s.source = ts.source),
        stats AS (
          SELECT w, CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(f_e9) AS BIGINT) AS sf,
                 sum(CAST(f_e9 AS HUGEINT) * f_e9) AS sff
          FROM grid GROUP BY w),
        zed AS (
          SELECT g.source, g.w,
                 CASE WHEN st.k * st.sff
                        - CAST(st.sf AS HUGEINT) * st.sf > 0
                 THEN CAST(floor(
                   CAST(st.k * g.f_e9 - st.sf AS DOUBLE)
                   / sqrt(CAST(st.k * st.sff
                          - CAST(st.sf AS HUGEINT) * st.sf AS DOUBLE))
                   * 1000000.0 + 0.5) AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END AS z_e6
          FROM grid g JOIN stats st ON st.w = g.w),
        pairs AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(abs(a.z_e6 - b.z_e6)) AS BIGINT) AS sdz
          FROM zed a JOIN zed b
            ON a.w = b.w AND a.source < b.source
          GROUP BY 1, 2)
        SELECT src_a, src_b, n_words,
               {pround_sql(
                   'CAST(sdz AS DOUBLE) '
                   '/ (CAST(n_words AS DOUBLE) * 1e6)', 6)} AS delta
        FROM pairs ORDER BY delta, src_a, src_b LIMIT 10
    """,
})


def _levene_oracle() -> str:
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    k = len(pris)
    aggs = ", ".join(
        f"CAST(sum(CASE WHEN g = '{p}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{j}, "
        f"CAST(sum(CASE WHEN g = '{p}' THEN z ELSE 0 END) AS BIGINT)"
        f" AS s_{j}, "
        f"sum(CASE WHEN g = '{p}' THEN CAST(z AS HUGEINT) * z"
        f" ELSE 0 END) AS q_{j}"
        for j, p in enumerate(pris)
    )
    n_tot = " + ".join(f"n_{j}" for j in range(k))
    s_tot = " + ".join(f"s_{j}" for j in range(k))
    t_groups = " + ".join(
        f"(CAST(CAST(s_{j} AS HUGEINT) * s_{j} AS DOUBLE)"
        f" / CAST(n_{j} AS DOUBLE))"
        for j in range(k)
    )
    q_tot = " + ".join(f"CAST(q_{j} AS DOUBLE)" for j in range(k))
    nlist = ", ".join(f"n_{j}" for j in range(k))
    return f"""
        WITH od AS (
          SELECT o_orderpriority AS g,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
          FROM orders),
        ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY g ORDER BY y, g) AS r,
                 count(*) OVER (PARTITION BY g) AS n
          FROM od),
        m2 AS (
          SELECT g, CAST(sum(y) * 2 / count(*) AS BIGINT) AS m2
          FROM ranked
          WHERE r * 2 = n OR r * 2 = n + 1 OR r * 2 = n + 2
          GROUP BY g),
        zt AS (
          SELECT od.g, abs(od.y * 2 - m2.m2) AS z
          FROM od JOIN m2 ON m2.g = od.g),
        one AS (SELECT {aggs} FROM zt),
        w AS (
          SELECT {nlist},
                 ({n_tot}) AS ntot,
                 (({t_groups})
                  - CAST(CAST(({s_tot}) AS HUGEINT) * ({s_tot})
                         AS DOUBLE) / CAST(({n_tot}) AS DOUBLE))
                   AS between_,
                 (({q_tot}) - ({t_groups})) AS within_
          FROM one)
        SELECT {nlist},
               {pround_sql(
                   'CAST(ntot - 5 AS DOUBLE) / 4.0 '
                   '* between_ / within_', 6)} AS w_stat,
               (CAST(ntot - 5 AS DOUBLE) / 4.0 * between_ / within_
                > 2.372) AS heteroscedastic_5pct
        FROM w
    """


ORACLES.update({"q_levene_bf": _levene_oracle()})


def _dunn_oracle() -> str:
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    k = len(pris)
    m = k * (k - 1) // 2
    csel = ", ".join(
        f"CAST(sum(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c{j}"
        for j, p in enumerate(pris)
    )
    tsum = " + ".join(f"c{j}" for j in range(k))
    nsel = ", ".join(
        f"CAST(sum(c{j}) AS BIGINT) AS n{j}" for j in range(k)
    )
    r2sel = ", ".join(
        f"sum(CAST(c{j} AS HUGEINT) * (2 * b + t + 1)) AS r2_{j}"
        for j in range(k)
    )
    ncols = " + ".join(f"n{j}" for j in range(k))
    base = (
        f"(CAST({ncols} AS DOUBLE) * (CAST({ncols} AS DOUBLE) + 1.0)"
        f" / 12.0 - CAST(tie3 AS DOUBLE)"
        f" / (12.0 * (CAST({ncols} AS DOUBLE) - 1.0)))"
    )
    pair_sel = []
    for i in range(k):
        for j in range(i + 1, k):
            z = (
                f"(CAST(r2_{i} AS DOUBLE) / (2.0 * CAST(n{i} AS DOUBLE))"
                f" - CAST(r2_{j} AS DOUBLE) / (2.0 * CAST(n{j} AS DOUBLE)))"
                f" / sqrt({base} * (1.0 / CAST(n{i} AS DOUBLE)"
                f" + 1.0 / CAST(n{j} AS DOUBLE)))"
            )
            pair_sel.append(
                f"SELECT '{pris[i]}' AS grp_a, '{pris[j]}' AS grp_b, "
                f"{z} AS z FROM agg"
            )
    pairs_union = " UNION ALL ".join(pair_sel)
    return f"""
        WITH g AS (
          SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
                 {csel}
          FROM orders GROUP BY 1),
        g2 AS (SELECT *, {tsum} AS t FROM g),
        cum AS (
          SELECT *,
                 CAST(sum(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) - t AS b
          FROM g2),
        agg AS MATERIALIZED (
          SELECT {nsel}, {r2sel},
                 sum(CAST(t AS HUGEINT) * t * t - t) AS tie3
          FROM cum),
        pairs AS ({pairs_union}),
        scored AS (
          SELECT p.grp_a, p.grp_b, p.z, pt.p_e9
          FROM (SELECT pairs.*,
                       CAST(least(599, floor(abs(z) * 100.0 + 0.5))
                            AS INT) AS zq
                FROM pairs) p
          JOIN {p_table_values_sql()} ON pt.zq = p.zq),
        ranked AS (
          SELECT *, CAST(row_number() OVER (
                   ORDER BY p_e9, grp_a, grp_b) AS BIGINT) AS k
          FROM scored),
        ks AS (
          SELECT CAST(coalesce(max(CASE
                   WHEN CAST(p_e9 AS BIGINT) * {m} * 20
                        <= k * 1000000000 THEN k
                   ELSE 0 END), 0) AS BIGINT) AS kstar
          FROM ranked)
        SELECT grp_a, grp_b, {pround_sql('z', 6)} AS z6, p_e9, k,
               (k <= kstar) AS rejected_5pct
        FROM ranked CROSS JOIN ks ORDER BY k
    """


ORACLES.update({"q_dunn_posthoc": _dunn_oracle()})


ORACLES.update({
    "q_effect_sizes": f"""
        WITH od AS (
          SELECT o_orderpriority AS pri,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
          FROM orders
          WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        g AS (
          SELECT v,
                 CAST(sum(CASE WHEN pri = '1-URGENT' THEN 1 ELSE 0 END)
                      AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN pri = '5-LOW' THEN 1 ELSE 0 END)
                      AS BIGINT) AS c2
          FROM od GROUP BY v),
        cum AS (
          SELECT *,
                 CAST(sum(c2) OVER (ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2
          FROM g),
        agg AS (
          SELECT CAST(sum(c1) AS BIGINT) AS n1,
                 CAST(sum(c2) AS BIGINT) AS n2,
                 sum(CAST(c1 AS HUGEINT) * v) AS s1,
                 sum(CAST(c2 AS HUGEINT) * v) AS s2,
                 sum(CAST(c1 AS HUGEINT) * v * v) AS q1,
                 sum(CAST(c2 AS HUGEINT) * v * v) AS q2,
                 sum(CAST(c1 AS HUGEINT) * (cum2 - c2)) AS gt,
                 sum(CAST(c1 AS HUGEINT) * c2) AS ties
          FROM cum),
        m AS (
          SELECT agg.*,
                 CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                 CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
                 (CAST(n1 AS HUGEINT) * n2 - gt - ties) AS lt
          FROM agg)
        SELECT n1, n2,
               CAST(gt AS BIGINT) AS n_gt,
               CAST(lt AS BIGINT) AS n_lt,
               CAST(ties AS BIGINT) AS n_tie,
               {pround_sql(
                   '(m1 - m2) / sqrt(((CAST(q1 AS DOUBLE) '
                   '- m1 * CAST(s1 AS DOUBLE)) '
                   '+ (CAST(q2 AS DOUBLE) - m2 * CAST(s2 AS DOUBLE))) '
                   '/ (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0))',
                   6)} AS cohens_d,
               {pround_sql(
                   'CAST(gt - lt AS DOUBLE) '
                   '/ (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))', 6)}
                 AS cliffs_delta
        FROM m
    """,
})


ORACLES.update({
    "q_anderson_darling": f"""
        WITH daily AS (
          SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS d,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS y
          FROM events GROUP BY 1),
        tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS s,
                 sum(CAST(y AS HUGEINT) * y) AS q
          FROM daily),
        zed AS (
          SELECT daily.d, daily.y, tot.n,
                 (CAST(daily.y AS DOUBLE)
                  - CAST(tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE))
                 / sqrt((CAST(tot.q AS DOUBLE)
                         - (CAST(tot.s AS DOUBLE)
                            / CAST(tot.n AS DOUBLE))
                           * CAST(tot.s AS DOUBLE))
                        / (CAST(tot.n AS DOUBLE) - 1.0)) AS z
          FROM daily, tot),
        ranked AS (
          SELECT zed.*,
                 CAST(row_number() OVER (ORDER BY y, d) AS BIGINT) AS i,
                 CAST(least(599, floor(abs(z) * 100.0 + 0.5)) AS INT)
                   AS zq
          FROM zed),
        withp AS (
          SELECT r.*,
                 CASE WHEN r.z >= 0
                      THEN 1000000000 - (pt.p_e9 // 2)
                      ELSE pt.p_e9 // 2 END AS phi_e9
          FROM ranked r
          JOIN {p_table_values_sql()} ON pt.zq = r.zq),
        lns AS (
          SELECT i, n,
                 CAST(floor(ln(CAST(phi_e9 AS DOUBLE) / 1e9)
                            * 1000000.0 + 0.5) AS BIGINT) AS lnp_e6,
                 CAST(floor(ln(CAST(1000000000 - phi_e9 AS DOUBLE)
                               / 1e9) * 1000000.0 + 0.5) AS BIGINT)
                   AS lnq_e6
          FROM withp),
        paired AS (
          SELECT a.i, a.n, a.lnp_e6, b.lnq_e6 AS lnq_rev_e6
          FROM lns a JOIN lns b ON a.i + b.i = a.n + 1),
        agg AS (
          SELECT max(n) AS n,
                 CAST(sum((2 * i - 1) * (lnp_e6 + lnq_rev_e6))
                      AS BIGINT) AS wsum_e6
          FROM paired),
        fin AS (
          SELECT n, wsum_e6,
                 (-CAST(n AS DOUBLE)
                  - CAST(wsum_e6 AS DOUBLE)
                    / (CAST(n AS DOUBLE) * 1000000.0)) AS a2v,
                 (1.0 + 0.75 / CAST(n AS DOUBLE)
                  + 2.25 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   AS adj
          FROM agg)
        SELECT n, wsum_e6,
               {pround_sql('a2v', 6)} AS a2,
               {pround_sql('a2v * adj', 6)} AS a2_star,
               (a2v * adj > 0.752) AS non_normal_5pct
        FROM fin
    """,
})
