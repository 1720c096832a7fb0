"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata (north-star; BASELINE.json).

The Spark-side plumbing is real — schemas, ``binaryFile`` reads,
Arrow-batched ``mapInPandas`` decode/feature-extract with bounded batch
sizes — while the actual media decode is STUBBED (image/audio codecs are
not available in this environment): ``decode_image_real`` raises
``NotImplementedError``; ``fake_decode_features`` derives deterministic
pseudo-features from the bytes so the distributed pipeline shape is fully
testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("byte_len", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("byte_len", LongType(), True),
        StructField("content_sha", StringType(), True),
        StructField("feat_width", IntegerType(), True),
        StructField("feat_height", IntegerType(), True),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Directory of media files -> (path, modificationTime, length, content).
    ``binaryFile`` is splittable per-file and prunes ``content`` when not
    selected — metadata-only queries never read the payload bytes."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def decode_image_real(content: bytes) -> tuple[int, int]:
    """Real decode would use PIL/libvips — not available in this container."""
    raise NotImplementedError(
        "media codecs not installed; use fake_decode_features for plumbing tests"
    )


def _fake_dims(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a decode: dims derived from content hash."""
    h = hashlib.sha256(content or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    ``mapInPandas`` streams bounded pandas batches through the Python
    worker — the scale-safe shape for per-item decode (each task holds at
    most ``batch_size`` payloads in memory; no collect, no driver loop).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            dims = [
                _fake_dims(bytes(c) if c is not None else b"") for c in content
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "byte_len": [
                        len(c) if c is not None else 0 for c in content
                    ],
                    "content_sha": [
                        hashlib.sha256(bytes(c) if c is not None else b"").hexdigest()
                        for c in content
                    ],
                    "feat_width": [d[0] for d in dims],
                    "feat_height": [d[1] for d in dims],
                }
            )

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = [
        (
            i,
            ("image", "audio", "video")[i % 3],
            hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 4),
            ("image/png", "audio/wav", "video/mp4")[i % 3],
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "media_id bigint, modality string, content binary, mime_type string"
    )
    return df.withColumn("byte_len", F.length("content").cast("long"))
