"""Multimodal binary plumbing: schema, batch shape, deterministic fake decode."""

from __future__ import annotations

import pytest

from stream_ingestion_amazon_kinesis_spark.operators.multimodal import (
    decode_features,
    synthesize_media,
)
from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table


def test_media_schema(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = synthesize_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    meta = media.select("meta.*").first()
    assert meta["mime"] == "image/fake"
    assert meta["n_bytes"] > 0
    assert 0 <= meta["width"] < 1920


def test_fake_decode_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = synthesize_media(docs)
    feats = decode_features(media)
    rows = {r["doc_id"]: r for r in feats.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(rows) == set(texts)
    for doc_id, r in rows.items():
        b = texts[doc_id].encode("utf-8")
        assert r["n_bytes"] == len(b)
        assert abs(r["feat_mean"] - sum(b) / len(b)) < 1e-9
        assert r["feat_dim"] == 64


def test_real_decoder_is_explicit_stub(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    with pytest.raises(NotImplementedError):
        decode_features(synthesize_media(docs), real_decoder=True)
