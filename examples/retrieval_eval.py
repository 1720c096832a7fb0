#!/usr/bin/env python
"""Hybrid-retrieval evaluation harness on this engine (north-star
surface) — the loop a RAG stack runs to tune its retrievers, composed
from the declared retrieval family:

  1. lexical scores   (q_bm25 — Okapi BM25 over the corpus, pinned)
  2. semantic top-k   (q_vector_topk — exact cosine, TakeOrdered)
  3. fusion           (q_rrf_fusion — reciprocal-rank fusion k=60 of
                       the two top-50 lists, full-outer on doc_id)
  4. diversity rerank (q_vector_topk_mmr — MMR over the candidate pool)
  5. quality metric   (q_ndcg_at_10 — nDCG of the semantic list against
                       the graded labels, bit-exact cross-engine)
  6. corpus QA        (q_mutual_information — is any source
                       language-skewed enough to bias retrieval?)

Run::

    python examples/retrieval_eval.py [sf_dir]

Each step is a DataFrame plan over declared queries; the corpus-side
work is one scan per retriever (per-partition top-k heaps), so the same
harness distributes unchanged — only list-grain rows ever reach the
driver.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from java_etl_bi_generator_spark.queries import registry  # noqa: E402
from java_etl_bi_generator_spark.session import get_spark  # noqa: E402


def report(spark, sf_dir: str) -> dict[str, int]:
    qs = registry()
    out: dict[str, int] = {}

    lex = (
        qs["q_bm25"](spark, sf_dir)
        .orderBy("bm25", ascending=False)
        .limit(5)
        .collect()
    )
    print("\nLexical (BM25) top-5:")
    for r in lex:
        print(f"  doc {r['doc_id']:>6}  bm25={r['bm25']:.4f}")
    out["lex"] = len(lex)

    sem = qs["q_vector_topk"](spark, sf_dir).collect()
    print("\nSemantic (cosine) top-10:")
    for r in sem[:5]:
        print(f"  vec {r['vec_id']:>6}  cos={r['cosine']:.6f}")
    out["sem"] = len(sem)

    fused = qs["q_rrf_fusion"](spark, sf_dir).collect()
    print("\nRRF fusion top-10 (lex_rank / sem_rank -> rrf):")
    for r in fused:
        lr = "-" if r["lex_rank"] is None else str(r["lex_rank"])
        sr = "-" if r["sem_rank"] is None else str(r["sem_rank"])
        print(f"  doc {r['doc_id']:>6}  {lr:>2} / {sr:>2}  rrf={r['rrf']:.6f}")
    out["fused"] = len(fused)

    mmr = qs["q_vector_topk_mmr"](spark, sf_dir).collect()
    print(f"\nMMR-diversified picks: {[r['vec_id'] for r in mmr]}")
    out["mmr"] = len(mmr)

    m = qs["q_ndcg_at_10"](spark, sf_dir).collect()[0]
    ndcg = "n/a (no positive labels)" if m["ndcg"] is None else f"{m['ndcg']:.4f}"
    print(
        f"\nnDCG@10 of the semantic list vs graded labels: "
        f"{ndcg} (DCG {m['dcg']:.4f} / IDCG {m['idcg']:.4f})"
    )
    out["ndcg_rows"] = 1

    mi = qs["q_mutual_information"](spark, sf_dir).collect()
    total_mi = sum(r["mi_contrib"] for r in mi)
    worst = max(mi, key=lambda r: abs(r["mi_contrib"]))
    print(
        f"\nCorpus lang x source MI: {total_mi:.6f} bits; strongest "
        f"cell ({worst['lang']}, {worst['source']}) "
        f"{worst['mi_contrib']:+.6f}"
    )
    out["mi_cells"] = len(mi)
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    report(get_spark(app_name="retrieval-eval"), sf)
