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


def test_wav_container_roundtrip_stdlib():
    """encode_wav output parses with the stdlib wave reader and the
    samples survive byte-exactly (the 44-byte canonical header)."""
    import io
    import wave

    from stream_ingestion_amazon_kinesis_spark.operators.multimodal import (
        decode_media,
        encode_wav,
    )

    samples = bytes(range(256))
    payload = encode_wav(samples)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert len(payload) == 44 + len(samples)
    with wave.open(io.BytesIO(payload), "rb") as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 1
        assert w.readframes(w.getnframes()) == samples
    assert decode_media(payload) == ("audio/wav", 256, sum(samples))


def test_pgm_container_roundtrip_stdlib():
    from stream_ingestion_amazon_kinesis_spark.operators.multimodal import (
        PGM_WIDTH,
        decode_media,
        encode_pgm,
    )

    pixels = b"\x10" * 40  # 40 bytes -> 2 rows of 32, 24 pad zeros
    payload = encode_pgm(pixels)
    assert payload.startswith(b"P5\n32 2\n255\n")
    mime, n_units, unit_sum = decode_media(payload)
    assert mime == "image/pgm"
    assert n_units == 2 * PGM_WIDTH
    assert unit_sum == 0x10 * 40


def test_decode_media_rejects_unknown_magic():
    from stream_ingestion_amazon_kinesis_spark.operators.multimodal import (
        decode_media,
    )

    with pytest.raises(ValueError, match="unknown container magic"):
        decode_media(b"GIF89a....")


def test_real_decoder_over_containers(spark, sf_dir):
    """decode_features(real_decoder=True) parses genuine WAV/PGM
    containers: feat_mean is the decoded-unit mean (headers and PGM
    zero-padding change it away from the raw-byte mean)."""
    from stream_ingestion_amazon_kinesis_spark.operators.multimodal import (
        PGM_WIDTH,
        synthesize_container_media,
    )

    docs = load_table(spark, sf_dir, "documents").filter("length(text) > 0").limit(20)
    media = synthesize_container_media(docs)
    feats = {r["doc_id"]: r for r in decode_features(media, real_decoder=True).collect()}
    for r in docs.collect():
        b = r["text"].encode("utf-8")
        f = feats[r["doc_id"]]
        if r["doc_id"] % 2 == 0:  # WAV: units are exactly the samples
            assert f["n_bytes"] == 44 + len(b)
            assert abs(f["feat_mean"] - sum(b) / len(b)) < 1e-9
        else:  # PGM: zero-padded to full 32-wide rows
            n_pix = PGM_WIDTH * -(-len(b) // PGM_WIDTH)
            assert abs(f["feat_mean"] - sum(b) / n_pix) < 1e-9


def test_real_decode_oracle_survives_multibyte_text(spark, tmp_path):
    """The multimodal_real_decode_stats oracle must agree with the
    Spark pipeline on NON-ASCII text: the containers carry the utf-8
    ENCODING, so the oracle's n/s are byte-based (octet_length +
    closed-form per-code-point byte sums), not code-point-based. A
    code-point oracle matches only while the fixture happens to be
    pure ASCII — this test runs the full encode->decode pipeline and
    the oracle SQL side by side on 2/3/4-byte utf-8 text."""
    import duckdb

    from stream_ingestion_amazon_kinesis_spark.plans.registry import (
        QUERIES,
        _load_all,
    )

    _load_all()
    texts = [
        "plain ascii only",
        "café naïve résumé",  # 2-byte sequences
        "你好世界 €100",  # 3-byte CJK + euro
        "clef \U0001d11e and emoji \U0001f600",  # 4-byte astral
        "mixed: aé中\U0001f680z",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pq_dir = tmp_path / "mmtest"
    pq_dir.mkdir()
    docs.toPandas().to_parquet(pq_dir / "documents.parquet")

    got = sorted(
        map(
            tuple,
            QUERIES["multimodal_real_decode_stats"]
            .fn(spark, str(pq_dir))
            .collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{pq_dir}/documents.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(QUERIES["multimodal_real_decode_stats"].oracle).fetchall())
    )
    assert got == want
    # sanity: the byte sums really differ from code-point sums here
    assert any(sum(t.encode()) != sum(map(ord, t)) for t in texts)
