"""Multimodal plumbing tests: binary columns + Arrow-batched feature
extraction (decode itself is stubbed — see sources/multimodal.py)."""

from __future__ import annotations

import pytest

from java_etl_bi_generator_spark.sources.multimodal import (
    decode_image_real,
    extract_features,
    synthetic_media,
)


def test_extract_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=32)
    feats = extract_features(media).collect()
    assert len(feats) == 32
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[0]["modality"] == "image"
    assert by_id[0]["byte_len"] == 32  # sha256 digest * 1
    assert len(by_id[0]["content_sha"]) == 64
    assert 16 <= by_id[0]["feat_width"] <= 255
    # deterministic across runs
    again = {r["media_id"]: r["content_sha"]
             for r in extract_features(media).collect()}
    assert again == {k: v["content_sha"] for k, v in by_id.items()}


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")
