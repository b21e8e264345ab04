"""Multimodal column plumbing (SURVEY §2.3 G17, driver north_star).

Images/audio/video are opaque `binary` columns plus typed metadata.
Two decode paths exist behind the same mapInPandas interface:
`decode_features()` keeps the original deterministic bytes-as-pixels
stand-in, and `decode_features(real_decoder=True)` / `decode_media`
REALLY decode WAV (stdlib `wave`) and PGM containers — header parse,
sample/pixel extraction — with no third-party codec needed. The
Spark-side plumbing — schema, batch iteration, partition-preserving
transform — is shared and is what matters at 100 TB: decode work is
embarrassingly parallel, never shuffles, and streams batch-by-batch
through Python workers without materializing a partition. A PIL/
librosa/ffmpeg decoder slots into the same loop for formats stdlib
can't parse.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import register
from ..sources.catalog import load_table, spread


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata to each doc —
    the shape a real image/audio ingest would produce. Payload bytes are
    the utf-8 text (deterministic stand-in for pixel data)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
            (F.crc32(F.encode(F.col("text"), "UTF-8")) % 1920).cast("int").alias("width"),
            (F.crc32(F.encode(F.col("text"), "UTF-8")) % 1080).cast("int").alias("height"),
        ).alias("meta"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_dim", T.IntegerType()),
    ]
)


_WAV_RATE = 8000


def encode_wav(samples: bytes) -> bytes:
    """Wrap raw bytes as a valid mono 8-bit PCM WAV container (stdlib
    `wave`) — 44-byte canonical RIFF header + the samples verbatim."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(_WAV_RATE)
        w.writeframes(samples)
    return buf.getvalue()


PGM_WIDTH = 32


def encode_pgm(pixels: bytes) -> bytes:
    """Wrap raw bytes as a valid binary PGM (P5) grayscale image,
    width-32, zero-padded to a full final row."""
    h = max(1, -(-len(pixels) // PGM_WIDTH))
    padded = pixels + b"\x00" * (PGM_WIDTH * h - len(pixels))
    return f"P5\n{PGM_WIDTH} {h}\n255\n".encode("ascii") + padded


def decode_media(payload: bytes) -> tuple[str, int, int]:
    """REAL container decode via magic-byte sniffing, stdlib only:
    RIFF/WAVE -> `wave` module (sample extraction), P5 -> PGM header
    parse + pixel plane. Returns (mime, n_units, unit_sum) where units
    are decoded samples/pixels — NOT raw container bytes (the header is
    parsed away, which is what makes this a decoder and not a strlen)."""
    import io
    import wave

    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        with wave.open(io.BytesIO(payload), "rb") as w:
            assert w.getframerate() == _WAV_RATE
            frames = w.readframes(w.getnframes())
        return "audio/wav", len(frames), sum(frames)
    if payload[:2] == b"P5":
        # P5\n<w> <h>\n<maxval>\n then w*h raw bytes
        hdr = io.BytesIO(payload)
        assert hdr.readline().strip() == b"P5"
        w_, h_ = map(int, hdr.readline().split())
        maxval = int(hdr.readline())
        assert maxval == 255
        pix = hdr.read(w_ * h_)
        assert len(pix) == w_ * h_
        return "image/pgm", len(pix), sum(pix)
    raise ValueError(f"unknown container magic: {payload[:4]!r}")


def decode_features(media: DataFrame, real_decoder: bool = False) -> DataFrame:
    """Decode payloads and extract a feature vector summary, batch-wise.

    With `real_decoder=True` the payloads must be actual WAV/PGM
    containers (see `synthesize_container_media`) and are decoded with
    the stdlib codecs in `decode_media`; the default fake path keeps the
    original bytes-as-pixels stand-in. Either way the Arrow batch shape,
    schema contract, and partitioning are identical — a PIL/librosa
    decoder slots into the same loop.
    """
    if real_decoder:

        def _real_decode(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                decoded = [decode_media(bytes(b)) for b in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "n_bytes": pdf["payload"].map(len).astype("int32"),
                        "feat_mean": [
                            (s / n) if n else 0.0 for _, n, s in decoded
                        ],
                        "feat_dim": pd.Series(
                            [64] * len(pdf), dtype="int32"
                        ),
                    }
                )

        return media.mapInPandas(_real_decode, schema=_DECODE_SCHEMA)

    def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            # Deterministic fake "pixel decode": bytes -> mean byte value.
            feat_mean = payloads.map(
                lambda b: float(sum(b)) / len(b) if len(b) else 0.0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "feat_mean": feat_mean,
                    "feat_dim": pd.Series([64] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(_fake_decode, schema=_DECODE_SCHEMA)


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           sha256(text) AS payload_sha256
    FROM documents
    """,
    description="G17 multimodal: opaque binary payload metadata + content hashes",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


# Closed-form utf-8 byte sum of a text column (matches Python's
# sum(text.encode()) for any unicode text) — shared by the multimodal
# oracles, which verify byte-level decode math from the text alone.
_UTF8_BYTESUM_SQL = """CAST(COALESCE(list_sum(list_transform(string_split(text, ''),
                 c -> CAST(CASE
                   WHEN ascii(c) < 128 THEN ascii(c)
                   WHEN ascii(c) < 2048 THEN
                     192 + (ascii(c) // 64) + 128 + (ascii(c) % 64)
                   WHEN ascii(c) < 65536 THEN
                     224 + (ascii(c) // 4096) + 128 + ((ascii(c) // 64) % 64)
                     + 128 + (ascii(c) % 64)
                   ELSE
                     240 + (ascii(c) // 262144) + 128
                     + ((ascii(c) // 4096) % 64) + 128
                     + ((ascii(c) // 64) % 64) + 128 + (ascii(c) % 64)
                 END AS BIGINT))), 0) AS BIGINT)"""


@register(
    "multimodal_decode_features",
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n,
               {_UTF8_BYTESUM_SQL} AS s
        FROM documents),
    f AS (
        SELECT doc_id, n,
               CASE WHEN n > 0 THEN (2000 * s + n) // (2 * n)
                    ELSE 0 END AS milli
        FROM b)
    SELECT CAST(64 AS INT) AS feat_dim,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_bytes,
           CAST(CAST(SUM(milli) AS DOUBLE) / 1000 AS DOUBLE)
               AS sum_feat_mean
    FROM f
    """,
    description="G17 multimodal decode/feature-extract via Arrow-batched "
    "mapInPandas — fake byte-mean decoder, verified against text-derived "
    "closed-form utf-8 byte arithmetic",
    twin_test="tests/test_multimodal.py::test_fake_decode_deterministic",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode-plumbing query (schema contract, Arrow batch shape,
    partitioning) with an exact value gate: feat_mean = mean byte value
    of the payload. The 3-dp rounding is done in EXACT INTEGER space on
    both sides (ADVICE r9: Spark F.round on double is exact BigDecimal
    HALF_UP while DuckDB ROUND multiplies/divides in IEEE — a 1-ulp gap
    near a .0005 boundary): milli = (2000*s + n) div (2*n) is half-up
    of 1000*s/n from pure integers. The exact byte sum s is recovered
    from the decoder's feat_mean (= fl(s/n)) via floor(feat_mean*n+0.5)
    — the relative error of the two IEEE ops is ~2^-52*s << 0.5, so the
    recovery is exact for any s < 2^51 (byte sums here are <= 255*n).
    The milli units then SUM as int64 — partitioning-invariant — and
    one final IEEE division by 1000 is bit-identical in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    feats = decode_features(media)
    milli = F.when(
        F.col("n_bytes") > 0,
        F.expr(
            "(2000 * CAST(floor(feat_mean * n_bytes + 0.5d) AS BIGINT)"
            " + n_bytes) div (2 * CAST(n_bytes AS BIGINT))"
        ),
    ).otherwise(F.lit(0))
    return (
        feats.select(
            "feat_dim",
            F.col("n_bytes").cast("bigint").alias("n"),
            milli.cast("bigint").alias("milli"),
        )
        .groupBy("feat_dim")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_bytes"),
            (F.sum("milli").cast("double") / F.lit(1000.0))
            .cast("double")
            .alias("sum_feat_mean"),
        )
    )


_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_REAL_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("container_bytes", T.LongType()),
        T.StructField("n_units", T.LongType()),
        T.StructField("unit_sum", T.LongType()),
    ]
)


def synthesize_container_media(docs: DataFrame) -> DataFrame:
    """Real containers, deterministically derived from the text: even
    doc_ids become 8-bit PCM WAV files (samples = utf-8 bytes), odd
    doc_ids become binary PGM images (pixels = utf-8 bytes, zero-padded
    to width 32). Unlike `synthesize_media`'s opaque stand-in, these
    payloads parse with any standards-compliant reader."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav(t.encode("utf-8"))
                if doc_id % 2 == 0
                else encode_pgm(t.encode("utf-8"))
                for doc_id, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        _encode, schema=_MEDIA_SCHEMA
    )


@register(
    "multimodal_real_decode_stats",
    oracle=f"""
    WITH b AS (
        -- BYTE-based, not code-point-based: the containers carry the
        -- utf-8 ENCODING of the text, so n is the encoded byte count
        -- and s folds each code point into its utf-8 byte sum in
        -- closed form (1/2/3/4-byte sequences). Matches Python's
        -- sum(text.encode()) for any unicode text, not just ASCII.
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n,
               CAST(list_sum(list_transform(string_split(text, ''),
                 c -> CAST(CASE
                   WHEN ascii(c) < 128 THEN ascii(c)
                   WHEN ascii(c) < 2048 THEN
                     192 + (ascii(c) // 64) + 128 + (ascii(c) % 64)
                   WHEN ascii(c) < 65536 THEN
                     224 + (ascii(c) // 4096) + 128 + ((ascii(c) // 64) % 64)
                     + 128 + (ascii(c) % 64)
                   ELSE
                     240 + (ascii(c) // 262144) + 128
                     + ((ascii(c) // 4096) % 64) + 128
                     + ((ascii(c) // 64) % 64) + 128 + (ascii(c) % 64)
                 END AS BIGINT))) AS BIGINT) AS s
        FROM documents WHERE strlen(text) > 0),
    dims AS (
        SELECT doc_id, n, s, (n + {PGM_WIDTH - 1}) // {PGM_WIDTH} AS h
        FROM b)
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'audio/wav'
                ELSE 'image/pgm' END AS mime,
           CAST(CASE WHEN doc_id % 2 = 0 THEN n + 44
                ELSE 11 + length(CAST(h AS VARCHAR)) + {PGM_WIDTH} * h
                END AS BIGINT) AS container_bytes,
           CAST(CASE WHEN doc_id % 2 = 0 THEN n
                ELSE {PGM_WIDTH} * h END AS BIGINT) AS n_units,
           s AS unit_sum
    FROM dims
    """,
    description="G17 multimodal REAL codec roundtrip: WAV (stdlib wave) and "
    "PGM containers built from the text bytes, then decoded back by "
    "magic-byte sniffing — container size, decoded unit count, and unit "
    "sum all verified against text-derived arithmetic (the header parse "
    "is what the oracle proves: 44-byte RIFF header, variable PGM header, "
    "zero-pad handling)",
)
def multimodal_real_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode -> decode roundtrip through REAL containers, stdlib-only.

    Both steps are chained mapInPandas (narrow — no shuffle between
    encode and decode; at 100 TB each partition's media stream flows
    batch-by-batch through the Python worker exactly once). The decoder
    is `decode_media`: it dispatches on magic bytes and PARSES the
    containers (RIFF chunk walk via `wave`, PGM header scan), so a
    malformed header or wrong pad length fails loudly rather than
    producing plausible numbers.
    """
    docs = spread(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    media = synthesize_container_media(docs)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_media(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m for m, _, _ in decoded],
                    "container_bytes": pdf["payload"].map(len),
                    "n_units": [n for _, n, _ in decoded],
                    "unit_sum": [s for _, _, s in decoded],
                }
            )

    return media.mapInPandas(_decode, schema=_REAL_DECODE_SCHEMA)


FRAME_CHARS = 32
FRAME_STRIDE = 4  # keep every 4th frame


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           g AS frame_idx,
           md5(substr(text, CAST(g * {FRAME_CHARS} + 1 AS INT), {FRAME_CHARS}))
               AS frame_md5,
           LEAST({FRAME_CHARS},
                 CAST(length(text) AS BIGINT) - g * {FRAME_CHARS})
               AS frame_chars
    FROM documents,
         UNNEST(generate_series(0, (length(text) - 1) // {FRAME_CHARS}))
             AS u(g)
    WHERE g % {FRAME_STRIDE} = 0
    """,
    description="G17 multimodal frame sampling: payload split into fixed-width "
    "frames, every 4th kept, per-frame content digest (deterministic fake of "
    "video frame extraction; the sampling arithmetic is the real deliverable)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over the opaque payload: frame i spans
    characters [i*W, (i+1)*W); only every FRAME_STRIDE-th frame is kept
    (the uniform temporal subsample a video pipeline takes before
    feature extraction). Pure JVM sequence+transform+explode — the
    sampling PREDICATE is applied before the explode output leaves the
    row, so dropped frames never materialize. A real codec would replace
    the substr with a decoder inside mapInPandas (see decode_features);
    the partitioning, fan-out, and digest contract stay identical."""
    docs = load_table(spark, sf_dir, "documents")
    last_frame = F.floor((F.length("text") - 1) / FRAME_CHARS).cast("bigint")
    idx = F.filter(
        F.sequence(F.lit(0).cast("bigint"), last_frame),
        lambda g: g % FRAME_STRIDE == 0,
    )
    frames = docs.select(
        "doc_id",
        "text",
        F.length("text").cast("bigint").alias("n_chars_t"),
        F.explode(idx).alias("frame_idx"),
    )
    frame = F.expr(
        f"substring(text, CAST(frame_idx * {FRAME_CHARS} + 1 AS INT), {FRAME_CHARS})"
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5(F.encode(frame, "UTF-8")).alias("frame_md5"),
        F.least(
            F.lit(FRAME_CHARS).cast("bigint"),
            F.col("n_chars_t") - F.col("frame_idx") * FRAME_CHARS,
        ).alias("frame_chars"),
    )


@register(
    "multimodal_arrow_byte_profile",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               length(text) - length(replace(text, 'e', '')) AS n_e
        FROM documents)
    SELECT CAST(n_bytes % 8 AS BIGINT) AS len_mod8,
           COUNT(*) AS n_payloads,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(n_e) AS BIGINT) AS total_e_bytes,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM p
    GROUP BY 1
    """,
    description="G16 mapInArrow: zero-copy per-batch byte profiling of binary "
    "payloads (length, first-byte high bit), grouped by length class",
)
def multimodal_arrow_byte_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fourth Arrow UDF entry point (after pandas_udf, applyInPandas,
    mapInPandas): `mapInArrow` hands each partition as raw
    `pyarrow.RecordBatch`es — no pandas conversion at all — which is the
    right hook for byte-level work on binary columns (codec sniffing,
    container demuxing) where pandas object boxing would dominate. The
    batch function touches buffers with pyarrow.compute only; the
    output schema contract is enforced by Spark like any UDF."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("n_e", T.LongType()),
        ]
    )

    def profile(batches):
        for batch in batches:
            payload = batch.column(batch.schema.get_field_index("payload"))
            lengths = pc.binary_length(payload).cast(pa.int64())
            # byte-pattern scan straight on the buffers (a codec would
            # sniff magic numbers the same way)
            n_e = pc.count_substring(payload.cast(pa.string()), "e").cast(pa.int64())
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), lengths, n_e],
                schema=pa.schema(
                    [
                        ("doc_id", pa.int64()),
                        ("n_bytes", pa.int64()),
                        ("n_e", pa.int64()),
                    ]
                ),
            )

    profiled = media.mapInArrow(profile, out_schema)
    return profiled.groupBy(
        (F.col("n_bytes") % 8).alias("len_mod8")
    ).agg(
        F.count("*").alias("n_payloads"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("n_e").alias("total_e_bytes"),
        F.min("doc_id").alias("first_doc"),
    )


_FRAME = 256

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


@register(
    "multimodal_audio_frame_energy",
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               list_transform(string_split(text, ''),
                              c -> CAST(ascii(c) AS BIGINT)) AS bytes
        FROM documents),
    frames AS (
        SELECT doc_id, st // {_FRAME} AS frame_idx,
               bytes[st + 1 : st + {_FRAME}] AS fr
        FROM b, LATERAL (
            SELECT unnest(generate_series(0, len(bytes) - 1, {_FRAME})) AS st))
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(len(fr) AS BIGINT) AS frame_bytes,
           CAST(list_sum(list_transform(fr, x -> (x - 128) * (x - 128)))
                AS BIGINT) AS energy
    FROM frames
    ORDER BY doc_id, frame_idx
    """,
    description="G17 multimodal audio framing: payload bytes treated as "
    "8-bit PCM, split into 256-byte frames with per-frame energy "
    "sum((b-128)^2) — real mapInPandas/Arrow plumbing over the binary "
    "column, integer-exact (the fake PCM is the utf-8 payload, so the "
    "oracle reproduces the bytes from text)",
)
def multimodal_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame energy over the opaque audio payload column.

    The frame loop is the real thing a feature extractor does (librosa
    frame/hop); here it runs in numpy over Arrow batches inside
    mapInPandas — one Python worker pass per partition, emitting
    |bytes|/256 bounded rows per doc, nothing shuffled until the final
    presentation sort. A real PCM decoder slots into the same batch
    loop (see `decode_features(real_decoder=True)` gate).
    """
    import numpy as np

    media = synthesize_media(load_table(spark, sf_dir, "documents"))

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_bytes": [],
                "energy": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                for i in range(0, len(arr), _FRAME):
                    fr = arr[i : i + _FRAME]
                    d = fr - 128
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i // _FRAME)
                    out["frame_bytes"].append(len(fr))
                    out["energy"].append(int((d * d).sum()))
            yield pd.DataFrame(out)

    return (
        media.select("doc_id", "payload")
        .mapInPandas(_frames, schema=_FRAME_SCHEMA)
        .orderBy("doc_id", "frame_idx")
    )


_PHASH_BITS = 60
_PHASH_BANDS = 4
_PHASH_BAND_BITS = 15
_PHASH_MAX_HAMMING = 8


@register(
    "multimodal_phash_hamming_neardup",
    oracle=f"""
    WITH codes AS (
        SELECT doc_id,
               list_transform(string_split(text, ''),
                              c -> CAST(ascii(c) AS BIGINT)) AS cs
        FROM documents),
    stats AS (
        SELECT doc_id, cs, CAST(len(cs) AS BIGINT) AS n,
               CAST(list_sum(cs) AS BIGINT) AS total
        FROM codes WHERE len(cs) >= 2),
    bits AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN cs[CAST(1 + (k * (n - 1)) // {_PHASH_BITS - 1}
                                        AS INT)] * n > total
                        THEN (1::BIGINT << k) ELSE 0 END) AS BIGINT) AS phash
        FROM stats, UNNEST(generate_series(0, {_PHASH_BITS - 1})) AS u(k)
        GROUP BY doc_id),
    bands AS (
        SELECT doc_id, j,
               (phash >> CAST({_PHASH_BAND_BITS} * j AS INT)) & 32767 AS band
        FROM bits, UNNEST(generate_series(0, {_PHASH_BANDS - 1})) AS v(j)),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id)
    SELECT c.doc_a, c.doc_b,
           CAST(bit_count(xor(ha.phash, hb.phash)) AS BIGINT) AS hamming
    FROM cand c
    JOIN bits ha ON ha.doc_id = c.doc_a
    JOIN bits hb ON hb.doc_id = c.doc_b
    WHERE bit_count(xor(ha.phash, hb.phash)) <= {_PHASH_MAX_HAMMING}
    """,
    description="G17 perceptual-hash media near-dup: a 60-bit "
    "brightness-profile pHash per payload (byte at 60 evenly spaced "
    "positions vs global mean, integer cross-multiplied), candidates "
    "from 4x15-bit Hamming bands (multi-index blocking), exact "
    "bit_count(xor) <= 8 verification — the image-dedup shape run "
    "entirely in JVM expressions",
)
def multimodal_phash_hamming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pHash + banded Hamming join over the opaque media payloads.

    The hash is a pure projection (no shuffle): sample 60 evenly-spaced
    bytes, compare each against the payload mean via the integer
    cross-multiplication byte*n > total (no division), pack into a
    60-bit long. Candidate generation is the multi-index trick
    (Norouzi et al., multi-index hashing): with 4 disjoint 15-bit
    bands, any pair within Hamming distance 3 MUST agree exactly on
    some band (pigeonhole), so that range is lossless; for distances
    4-8 the band screen is the standard high-recall (not lossless)
    index. The oracle implements the identical screen, so both engines
    see exactly the same candidate set and the comparison stays exact.
    Verification joins the |docs|-sized hash relation
    twice by key — nothing quadratic materializes beyond same-band
    collisions.
    """
    docs = spread(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") >= 2
    )
    codes = docs.select(
        "doc_id",
        F.expr("transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT))").alias(
            "cs"
        ),
    )
    stats = codes.select(
        "doc_id",
        "cs",
        F.size("cs").cast("bigint").alias("n"),
        F.expr("aggregate(cs, 0L, (acc, x) -> acc + x)").alias("total"),
    )
    k_max = _PHASH_BITS - 1
    phash = F.expr(
        f"""aggregate(sequence(0, {k_max}), 0L, (acc, k) ->
            acc + IF(element_at(cs, CAST(1 + (k * (n - 1)) div {k_max} AS INT))
                     * n > total, shiftleft(1L, k), 0L))"""
    )
    # bits feeds the band explode AND both verify joins (3 consumers);
    # materialize once — the char-split + 60-probe hash subtree re-ran
    # per consumer otherwise (measured 45 s -> ~8 s at sf0.1).
    bits = stats.select("doc_id", phash.alias("phash")).localCheckpoint()
    bands = bits.select(
        "doc_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(_PHASH_BANDS - 1))).alias("j"),
    ).select(
        "doc_id",
        "j",
        F.expr(f"shiftright(phash, CAST({_PHASH_BAND_BITS} * j AS INT)) & 32767").alias(
            "band"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ha = bits.select(F.col("doc_id").alias("doc_a"), F.col("phash").alias("pa"))
    hb = bits.select(F.col("doc_id").alias("doc_b"), F.col("phash").alias("pb"))
    ham = F.expr("CAST(bit_count(pa ^ pb) AS BIGINT)")
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
    )


@register(
    "binaryfile_scan_media",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    description="G1 binaryFile source format: per-document payload files "
    "staged on disk and ingested via spark.read.format('binaryFile') — "
    "path/length/content columns; doc_id parsed from the file name, "
    "length and md5(content) proven byte-identical to the source text",
)
def binaryfile_scan_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media-lake ingestion path: one opaque file per asset.

    Staging writes each payload EXECUTOR-side (foreachPartition — no
    driver collect), capped at 200 assets by construction (a format
    demo, not a bulk export; bulk media lives in the binary COLUMN
    path, see synthesize_media). binaryFile then lists the directory
    and yields (path, modificationTime, length, content) with content
    read lazily per row — at 100 TB this is the entry point that turns
    an object-store prefix of images into a DataFrame without a
    custom reader.
    """
    import os
    import tempfile

    from ..sources.catalog import fixture_fingerprint

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_binfiles",
        f"docs_{fixture_fingerprint(sf_dir)}",
    )
    marker = os.path.join(base, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(base, exist_ok=True)
        media = synthesize_media(
            load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        ).select("doc_id", "payload")

        def write_part(rows):
            for r in rows:
                with open(os.path.join(base, f"{r.doc_id:08d}.bin"), "wb") as f:
                    f.write(bytes(r.payload))

        media.foreachPartition(write_part)
        open(marker, "w").close()
    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(
        base
    )
    return files.select(
        F.regexp_extract(F.col("path"), r"(\d{8})\.bin$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    ).orderBy("doc_id")
