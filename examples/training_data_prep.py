#!/usr/bin/env python
"""End-to-end training-data preparation on this engine (north-star surface;
BASELINE.json) — the post-curation half of an LLM data pipeline, picking up
where examples/corpus_curation.py stops:

  1. stratified sampling   (per-language hash-bucket rates: rebalance a
                            skewed corpus, reproducible under appends)
  2. PII masking           (digit redaction + sha-256 pseudonyms on the
                            join keys that leave the trust boundary)
  3. chunking              (overlapping 50-token windows, stride 40,
                            content-hashed)
  4. chunk-level dedup     (drop repeated chunk hashes, keep min doc)
  5. sequence packing      (distributed prefix-sum assignment of docs to
                            512-token training bins)
  6. write                 (parquet partitioned by bin bucket)

Run::

    python examples/training_data_prep.py [sf_dir] [output_dir]

Defaults: /root/testdata/sf0.01 -> a temp dir.  Every step is a DataFrame
transformation over built-in expressions — no Python UDFs — so the same
script distributes unchanged on a cluster; the only corpus-wide shuffles
are the chunk-hash dedup and the packing's bucket aggregation.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from java_etl_bi_generator_spark.catalog import load_table  # noqa: E402
from java_etl_bi_generator_spark.queries import (  # noqa: E402
    q_chunk_documents,
    q_pack_sequences,
    q_stratified_sample,
)
from java_etl_bi_generator_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="training_prep_")
    )
    spark = get_spark(app_name="training-data-prep")

    # 1. stratified sample (declared query, reused as a pipeline stage)
    sampled_ids = q_stratified_sample(spark, sf_dir).select("doc_id")
    docs = load_table(spark, sf_dir, "documents").join(
        F.broadcast(sampled_ids), "doc_id"
    )
    print(f"sampled docs: {docs.count()}")

    # 2. masking: text keeps content, ids leave as pseudonyms
    masked = docs.select(
        F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 16).alias(
            "doc_pseudonym"
        ),
        "doc_id",
        "text",
        "lang",
    )

    # 3-4. chunk + dedup chunks (first occurrence by doc_id wins)
    chunks = q_chunk_documents(spark, sf_dir).join(
        F.broadcast(sampled_ids), "doc_id"
    )
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_id")
    unique_chunks = (
        chunks.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    n_chunks, n_unique = chunks.count(), unique_chunks.count()
    print(f"chunks: {n_chunks} -> {n_unique} after dedup")

    # 5. pack into 512-token bins (declared query gives the bin table)
    bins = q_pack_sequences(spark, sf_dir)
    print(f"bins: {bins.count()}")

    # 6. write chunk table partitioned by a bounded bin bucket
    final = unique_chunks.join(masked.select("doc_id", "doc_pseudonym"), "doc_id")
    (
        final.withColumn("part", (F.col("doc_id") % 8).cast("int"))
        .write.mode("overwrite")
        .partitionBy("part")
        .parquet(f"{out}/chunks")
    )
    written = spark.read.parquet(f"{out}/chunks")
    print(f"wrote {written.count()} chunk rows to {out}/chunks")
    assert written.count() == n_unique


if __name__ == "__main__":
    main()
