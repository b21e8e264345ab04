"""Deduplication operators for training-data pipelines (SURVEY §2.3 G17).

Four tiers, each with a different cost/recall point at 100 TB:
- exact dedup: hash groupBy on normalized text — one shuffle, map-side
  partial aggregation.
- n-gram Jaccard near-dup: token-set overlap via explode + equi-join on
  (block, token). Blocking keys bound the pair space; the join is a
  plain shuffle join Catalyst can plan (and AQE can skew-split).
- MinHash + LSH: constant-size signatures per doc (32 hashes), banded
  into LSH buckets, candidates from an equi-self-join on the bucket key,
  then exact-Jaccard verification of candidates only. This is the scale
  path: signature size is O(1) per doc, and the only shuffle larger than
  the doc count is the candidate verify join.
- SimHash: one 32-bit fingerprint per doc; near-dups collide in
  fingerprint buckets — cheapest, lowest recall.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.numeric import mulmod32_sql
from ..functions.text import shingles, tokens
from ..plans.registry import guard_oracle_env_override, register
from ..sources.catalog import load_table, spread


@register(
    "exact_dedup_documents",
    oracle="""
    SELECT md5(lower(trim(text))) AS text_key,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
    description="G17 exact dedup: normalize -> hash groupBy; keeper = min doc_id",
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.encode(F.lower(F.trim(F.col("text"))), "UTF-8")).alias("text_key"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_copies") > 1)
    )


# The (source, token) self-join below emits k^2 rows for a token present
# in k docs of one source — a stopword detonates the shuffle at corpus
# scale. Tokens above this within-source document frequency are dropped
# from BOTH the numerator (shared) and denominator (sizes) relations, and
# the oracle applies the identical predicate, so the two engines compute
# the same (documented) approximation: Jaccard over the sub-stopword
# token space. Worst-case join output is bounded by cap^2 per token.
#
# The DEFAULT is data-adaptive: cap = max(64, ceil(4 * sqrt(N_docs))).
# Rationale: a token with df = d emits d^2 candidate rows, so allowing d
# up to k*sqrt(N) bounds per-token join output at k^2 * N — linear in
# corpus size per token — with no fixture-tuned constant to retune when
# the corpus grows 10x. Both engines compute the cap from the same count
# with the same IEEE ops (sqrt is correctly rounded and *4 is exact, so
# Python's math.ceil(4*math.sqrt(n)) == SQL CEIL(4*SQRT(n)) bit-for-bit).
# Env override SPARK_GRAFT_TOKEN_DF_CAP pins a fixed cap on BOTH engines
# (int()-validated at import so a malformed override — e.g. '1_000',
# which Python's int() accepts but SQL does not — fails fast here
# instead of silently desyncing the engine cap from the oracle literal).
_TOKEN_DF_CAP_ENV_RAW = os.environ.get("SPARK_GRAFT_TOKEN_DF_CAP")
_TOKEN_DF_CAP_ENV: int | None = (
    int(_TOKEN_DF_CAP_ENV_RAW) if _TOKEN_DF_CAP_ENV_RAW else None
)


def token_df_cap(n_docs: int) -> int:
    """The within-source df cap for a corpus of `n_docs` documents."""
    if _TOKEN_DF_CAP_ENV is not None:
        return _TOKEN_DF_CAP_ENV
    return max(64, math.ceil(4.0 * math.sqrt(n_docs)))


# SQL expression computing the SAME cap inside the oracle (scalar
# subquery over the same `documents` view the Spark side counts).
# str(int(...)) guarantees both engines see the same canonical literal.
TOKEN_DF_CAP_SQL = (
    str(_TOKEN_DF_CAP_ENV)
    if _TOKEN_DF_CAP_ENV is not None
    else "(SELECT GREATEST(64, CAST(CEIL(4 * SQRT(COUNT(*))) AS BIGINT)) FROM documents)"
)


def _doc_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, source, token) with per-doc distinct tokens, hot tokens
    (within-source df > token_df_cap(N)) removed. The count() feeding
    the cap is a bounded driver scalar (parquet metadata count)."""
    cap = token_df_cap(docs.count())
    tok = spread(docs).select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(tokens("text"))).alias("token"),
    )
    hot = (
        tok.groupBy("source", "token")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > cap)
        .select("source", "token")
    )
    return tok.join(F.broadcast(hot), ["source", "token"], "left_anti")


@register(
    "jaccard_neardup_pairs",
    oracle=f"""
    WITH tok0 AS (
        SELECT doc_id, source,
               unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS token
        FROM documents),
    hot AS (SELECT source, token FROM tok0
            GROUP BY source, token HAVING COUNT(*) > {TOKEN_DF_CAP_SQL}),
    tok AS (SELECT t.* FROM tok0 t
            LEFT JOIN hot h ON t.source = h.source AND t.token = h.token
            WHERE h.token IS NULL),
    sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM tok a JOIN tok b
          ON a.source = b.source AND a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(n_shared AS DOUBLE) / (sa.n_tok + sb.n_tok - n_shared) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_shared AS DOUBLE) / (sa.n_tok + sb.n_tok - n_shared) >= 0.8
    """,
    description="G17 n-gram Jaccard near-dup: blocked (same source) token-set overlap >= 0.8, hot tokens (df > adaptive 4*sqrt(N) cap) excluded on both engines",
)
def jaccard_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # tok feeds sizes + BOTH self-join sides; without materialization
    # the explode + hot-token anti-join re-executes per consumer
    # (measured 3.96 -> 1.5 s at sf0.1, build included). LAZY: the
    # token relation is per-doc-distinct (bounded by the df cap),
    # materializes inside the consuming job, released between queries.
    # Storage bound (r12 audit): CORPUS-SCALED — O(sum of per-doc
    # distinct tokens) rows in executor block storage for the duration
    # of the job, lineage truncated (executor loss => job retry, not
    # recompute). The self-join REQUIRES this relation twice either
    # way; at cluster scale trade via persist(DISK_ONLY) + lineage.
    tok = _doc_tokens(docs).localCheckpoint(eager=False)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    a = tok.alias("a")
    b = tok.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n_tok") + F.col("sb.n_tok") - F.col("n_shared")
    )
    return (
        shared.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )


@register(
    "shingle_jaccard_pairs",
    oracle=f"""
    WITH sh0 AS (
        SELECT doc_id, source,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - 2),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
        FROM (SELECT doc_id, source,
                     string_split_regex(trim(text), '\\s+') AS t
              FROM documents)
        WHERE len(t) >= 3),
    hot AS (SELECT source, shingle FROM sh0
            GROUP BY source, shingle HAVING COUNT(*) > {TOKEN_DF_CAP_SQL}),
    sh AS (SELECT s.* FROM sh0 s
           LEFT JOIN hot h ON s.source = h.source AND s.shingle = h.shingle
           WHERE h.shingle IS NULL),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM sh a JOIN sh b
          ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= 0.8
    """,
    description="G17 exact 3-shingle Jaccard (source-blocked) — the SQL-checkable twin of MinHash-LSH",
)
def shingle_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set Jaccard over source-blocked pairs. Docs with
    fewer than 3 tokens are excluded on BOTH engines (Spark's concat_ws
    skips NULL elements while DuckDB's || propagates NULL, so short docs
    would otherwise shingle differently per engine), and shingles with
    within-source df > token_df_cap(N) are dropped on both sides — same
    bounded-join rationale as `_doc_tokens` (cap from the FULL table
    count, matching the oracle's scalar subquery over `documents`)."""
    docs = load_table(spark, sf_dir, "documents")
    cap = token_df_cap(docs.count())
    toks = tokens("text")
    sh3 = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )
    sh0 = (
        spread(docs.filter(F.size(toks) >= 3))
        .select("doc_id", "source", F.explode(F.array_distinct(sh3)).alias("shingle"))
    )
    hot = (
        sh0.groupBy("source", "shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > cap)
        .select("source", "shingle")
    )
    # sh feeds sizes + both self-join sides — materialize once (same
    # lazy-checkpoint rationale as jaccard_neardup_pairs; the shingle
    # explode is the dominant per-row cost; measured 5.2 -> 2.4 s at
    # sf0.1, build included). Storage bound (r12 audit): CORPUS-SCALED
    # — O(per-doc distinct 3-shingles) rows, lineage truncated; the
    # same persist(DISK_ONLY) trade as the jaccard tok site applies at
    # cluster scale.
    sh = sh0.join(F.broadcast(hot), ["source", "shingle"], "left_anti").localCheckpoint(
        eager=False
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    shared = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared")
    )
    return (
        shared.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

N_HASHES = 32
N_BANDS = 8  # 8 bands x 4 rows: ~P(candidate) = 1-(1-j^4)^8; j=0.8 -> 0.996
# A band bucket with k members would emit k^2/2 candidate rows from the
# self-join — a viral dup cluster (or a degenerate shingle set) detonates
# the shuffle at corpus scale. Buckets above this cap switch to a star
# pattern: every member pairs with the bucket's min doc_id only (k-1
# rows), preserving per-bucket connectivity for component clustering
# while bounding the join output at cap^2/2 + k per bucket.
#
# The DEFAULT is data-adaptive: cap = max(64, ceil(2 * sqrt(N_docs))) —
# same d^2-emission argument as token_df_cap: a bucket of k members
# emits k^2/2 pairs, so capping k at ~sqrt(N) bounds per-bucket output
# linear-in-N; a genuine dup cluster bigger than that still stays
# connected through the star path. Rows-only path (no oracle parity
# concern); the LSH recall twin re-validates the default at each SF.
# Env override SPARK_GRAFT_LSH_BUCKET_CAP pins a fixed cap.
_LSH_BUCKET_CAP_ENV = os.environ.get("SPARK_GRAFT_LSH_BUCKET_CAP")


def lsh_bucket_cap(n_docs: int) -> int:
    """Star-path switchover size for LSH band buckets, for a corpus of
    `n_docs` documents."""
    if _LSH_BUCKET_CAP_ENV:
        return int(_LSH_BUCKET_CAP_ENV)
    return max(64, math.ceil(2.0 * math.sqrt(n_docs)))


# MinHash permutation family: h_i = (A_i * h32 + B_i) mod 2^32 over the
# md5-derived 32-bit shingle hash h32. Affine permutations over an
# md5 base (instead of engine-native xxhash64) make the whole candidate
# pipeline computable in DuckDB too, which is what upgraded
# minhash_lsh_neardup from rows-only to an exact oracle (verdict r8 #2).
# A_i odd (a bijection mod 2^32); B_i from the Numerical Recipes LCG
# increment. All arithmetic goes through mulmod32_sql, so no int64
# overflow at any h32.
def _mh_a(i: int) -> int:
    return (2654435761 + 2 * 40503 * i) % 2**32


def _mh_b(i: int) -> int:
    return (1013904223 * (i + 1)) % 2**32


_MD5_INT32 = "CAST(('0x' || substr(md5({col}), 1, 8)) AS BIGINT)"  # DuckDB


def _perm_sql(i: int, col: str, idiv: str) -> str:
    return f"(({mulmod32_sql(col, _mh_a(i), idiv)} + {_mh_b(i)}) % 4294967296)"


def minhash_signatures(docs: DataFrame, num_hashes: int = N_HASHES) -> DataFrame:
    """One row per doc with `num_hashes` min-hash values over distinct
    3-word shingles. The shingle is hashed ONCE to a 32-bit integer via
    md5 (identical string->int path on both engines, the
    quality_weighted_sample bridge), then each permutation is the affine
    map A_i*h+B_i mod 2^32 — pure integer arithmetic, so the DuckDB
    oracle reproduces every signature exactly. Docs with fewer than 3
    tokens are excluded on both engines (the shingle_jaccard_pairs
    convention).

    The explode + groupBy(doc_id) shape is deliberate: each doc's
    shingles live in one input row, so the map-side partial MIN
    collapses them to a single signature row before the exchange — the
    shuffle moves |docs| x 32 longs, never the exploded shingle
    relation. (A zero-shuffle array_min(transform(...)) formulation was
    measured 3x SLOWER here: higher-order-function projections are not
    codegen'd, so the collapsed projection recomputes the shingle array
    once per hash.)

    Shingles (not bag-of-words) are the unit: word order matters, so
    only genuinely duplicated/near-duplicated passages collide — on a
    small shared vocabulary, token-set Jaccard saturates (most pairs
    look alike) and the candidate space degenerates to O(n^2)."""
    docs = spread(docs)  # shingle+hash work is compute-bound; see catalog.spread
    toks = tokens("text")
    sh = (
        docs.filter(F.size(toks) >= 3)
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles("text", 3))).alias("shingle"),
        )
        .select(
            "doc_id",
            F.conv(F.substring(F.md5(F.encode(F.col("shingle"), "UTF-8")), 1, 8), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    aggs = [
        F.min(F.expr(_perm_sql(i, "h", "div"))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_buckets(signatures: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """(doc_id, band, bucket): each band's row-slice concatenated into a
    string bucket key — exact equality semantics, engine-portable (a
    fixed-width rehash would be cheaper on the wire at extreme scale,
    but would put an engine-specific hash back between the candidates
    and the oracle)."""
    rows_per_band = N_HASHES // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh_{b * rows_per_band + j}")
                        for j in range(rows_per_band)
                    ],
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def _minhash_oracle() -> str:
    """The full MinHash+LSH candidate pipeline in DuckDB: same md5
    32-bit shingle hash, same affine permutations, same string band
    buckets, same adaptive star-path cap (scalar subquery; the
    SPARK_GRAFT_LSH_BUCKET_CAP env override is invisible to the oracle
    — leave it unset when oracle-comparing), same exact-Jaccard verify.
    """
    h32 = _MD5_INT32.format(col="shingle")
    mins = ",\n               ".join(
        f"MIN({_perm_sql(i, 'h', '//')}) AS m{i}" for i in range(N_HASHES)
    )
    rows_per_band = N_HASHES // N_BANDS
    band_arms = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, CAST({b} AS INT) AS band, CONCAT_WS('|', "
        + ", ".join(f"m{b * rows_per_band + j}" for j in range(rows_per_band))
        + ") AS bucket FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - 2),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents)
        WHERE len(t) >= 3),
    hh AS (SELECT doc_id, {h32} AS h FROM sh),
    sig AS (SELECT doc_id,
               {mins}
            FROM hh GROUP BY doc_id),
    buckets AS (
        {band_arms}),
    capn AS (SELECT GREATEST(64, CAST(ceil(2 * sqrt(CAST(COUNT(*) AS DOUBLE)))
                                      AS BIGINT)) AS cap
             FROM documents),
    stats AS (SELECT band, bucket, COUNT(*) AS bucket_n,
                     MIN(doc_id) AS bucket_min
              FROM buckets GROUP BY band, bucket),
    ann AS (SELECT b.doc_id, b.band, b.bucket, s.bucket_n, s.bucket_min
            FROM buckets b JOIN stats s USING (band, bucket)),
    cand AS (
        SELECT DISTINCT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM ann a JOIN ann b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
            CROSS JOIN capn
            WHERE a.bucket_n <= capn.cap
            UNION ALL
            SELECT bucket_min AS doc_a, doc_id AS doc_b
            FROM ann CROSS JOIN capn
            WHERE bucket_n > capn.cap AND doc_id <> bucket_min)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    shared AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_shared
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY c.doc_a, c.doc_b)
    SELECT doc_a, doc_b,
           CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= 0.8
    """


@register(
    "minhash_lsh_neardup",
    oracle=_minhash_oracle(),
    description="G17 MinHash(32)+LSH(8x4) over 3-shingles, exact-Jaccard "
    "verified >= 0.8 — md5-based permutations, exact DuckDB oracle",
    twin_test="tests/test_dedup.py::test_minhash_lsh_recall",
)
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    guard_oracle_env_override(
        "minhash_lsh_neardup", "SPARK_GRAFT_LSH_BUCKET_CAP", _LSH_BUCKET_CAP_ENV
    )
    docs = load_table(spark, sf_dir, "documents")
    cap = lsh_bucket_cap(docs.count())
    sig = minhash_signatures(docs)
    # buckets feeds BOTH the population stats and the annotate join —
    # without materialization the full signature pipeline (shingle
    # explode + 32 min-aggregations, the operator's dominant cost) runs
    # twice. LAZY checkpoint: |docs| x 8 band rows, materialized inside
    # the consuming job (with the doc_sh checkpoint below: measured
    # 2.2 -> 0.74 s warm at sf0.1).
    buckets = lsh_buckets(sig).localCheckpoint(eager=False)
    # Annotate each (band, bucket) with its population so oversized
    # buckets can take the bounded star path (see lsh_bucket_cap).
    stats = buckets.groupBy("band", "bucket").agg(
        F.count("*").alias("bucket_n"), F.min("doc_id").alias("bucket_min")
    )
    annotated = buckets.join(stats, ["band", "bucket"])
    small = annotated.filter(F.col("bucket_n") <= cap)
    big = annotated.filter(F.col("bucket_n") > cap)
    a = small.alias("a")
    b = small.alias("b")
    pair_candidates = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    star_candidates = big.filter(F.col("doc_id") != F.col("bucket_min")).select(
        F.col("bucket_min").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    candidates = pair_candidates.union(star_candidates).distinct()
    # Verify candidates with exact shingle-set Jaccard: join the shingle
    # ARRAY onto each side and intersect in-place (JVM array_intersect)
    # — two equi-joins on doc_id, no explode, no per-shingle shuffle.
    # Only candidate pairs pay the intersection cost.
    # doc_sh is joined onto BOTH pair sides — materialize the shingle
    # arrays once instead of re-running the per-row shingling per side.
    # Storage bound (r12 audit): one row per DOC but the array payload
    # is corpus-scaled bytes (every distinct shingle); same
    # persist(DISK_ONLY) trade at cluster scale.
    doc_sh = (
        spread(docs)
        .select("doc_id", F.array_distinct(shingles("text", 3)).alias("sh"))
        .localCheckpoint(eager=False)
    )
    pairs = candidates.join(
        doc_sh.select(
            F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
        ),
        "doc_a",
    ).join(
        doc_sh.select(
            F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
        ),
        "doc_b",
    )
    n_shared = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = n_shared.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - n_shared
    )
    return (
        pairs.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Connected components by iterative min-label propagation — the
    clustering step that turns near-dup PAIRS into dedup GROUPS (keep
    one representative per component).

    Each node starts labeled with itself; every round each node adopts
    the minimum label among itself and its neighbors; stop at fixpoint.
    Rounds are O(graph diameter) — near-dup graphs are shallow (dup
    clusters are cliques or short chains), so this converges in a
    handful of shuffles even at corpus scale. The driver-side loop only
    checks a scalar convergence count per round; all data stays
    distributed.
    """
    # Materialize the symmetrized edge list ONCE (localCheckpoint cuts
    # the lineage): every label-propagation round joins against it, and
    # without this the full upstream pair-generation plan (e.g. the
    # Jaccard self-join) would re-execute per round — measured 45 s vs
    # ~12 s at sf0.1 for the neardup_components query.
    sym = (
        edges.selectExpr(f"{src} AS a", f"{dst} AS b")
        .union(edges.selectExpr(f"{dst} AS a", f"{src} AS b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    prev_cached = None
    n_changed = 0
    for _ in range(20):  # diameter cap; near-dup graphs converge in 2-4
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("label") != F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label")))).alias("changed"),
            )
        )
        updated = updated.persist()
        n_changed = updated.filter(F.col("changed")).count()  # materializes `updated`
        if prev_cached is not None:
            prev_cached.unpersist()  # previous round's cache no longer referenced
        prev_cached = updated
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    if n_changed != 0:
        raise RuntimeError(
            "connected_components did not converge within 20 rounds "
            f"({n_changed} labels still changing); the graph diameter "
            "exceeds the cap — raise the cap or pre-cluster the input"
        )
    # Truncate lineage so the last round's cache can be released without
    # forcing downstream consumers to recompute all iterations.
    labels = labels.localCheckpoint(eager=True)
    if prev_cached is not None:
        prev_cached.unpersist()
    return labels


# Shared oracle prefix: the near-dup edge list + connected components
# (recursive CTE), reused by neardup_components and the canonical-
# selection census.
_NEARDUP_COMP_SQL = f"""
    WITH RECURSIVE
    edges AS (
        WITH tok0 AS (
            SELECT doc_id, source,
                   unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS token
            FROM documents),
        hot AS (SELECT source, token FROM tok0
                GROUP BY source, token HAVING COUNT(*) > {TOKEN_DF_CAP_SQL}),
        tok AS (SELECT t.* FROM tok0 t
                LEFT JOIN hot h ON t.source = h.source AND t.token = h.token
                WHERE h.token IS NULL),
        sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
        shared AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
            FROM tok a JOIN tok b
              ON a.source = b.source AND a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT doc_a, doc_b FROM shared
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_shared AS DOUBLE) / (sa.n_tok + sb.n_tok - n_shared) >= 0.8),
    nodes AS (SELECT doc_a AS node FROM edges UNION SELECT doc_b FROM edges),
    walk AS (
        SELECT node, node AS reach FROM nodes
        UNION
        SELECT w.node, CASE WHEN e.doc_a = w.reach THEN e.doc_b ELSE e.doc_a END AS reach
        FROM walk w JOIN edges e ON w.reach IN (e.doc_a, e.doc_b)),
    comp AS (
        SELECT node AS doc_id, MIN(reach) AS component_id
        FROM walk GROUP BY node)"""


@register(
    "neardup_components",
    oracle=_NEARDUP_COMP_SQL + "\n    SELECT doc_id, component_id FROM comp",
    description="G17 dedup clustering: connected components of the near-dup graph (iterative label propagation vs recursive-CTE oracle)",
)
def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = jaccard_neardup_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    labels = connected_components(edges)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )


@register(
    "canonical_dedup_selection",
    oracle=_NEARDUP_COMP_SQL + """,
    nt AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+'))
                    AS BIGINT) AS n_tokens
        FROM documents),
    rk AS (
        SELECT c.doc_id,
               ROW_NUMBER() OVER (PARTITION BY c.component_id
                                  ORDER BY n.n_tokens DESC, c.doc_id) AS rn
        FROM comp c JOIN nt n USING (doc_id)),
    flags AS (
        SELECT n.source, n.doc_id, COALESCE(r.rn = 1, TRUE) AS keep
        FROM nt n LEFT JOIN rk r USING (doc_id))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (keep) AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (NOT keep) AS BIGINT) AS n_dropped,
           CAST(COALESCE(SUM(doc_id) FILTER (keep), 0) AS BIGINT)
               AS kept_id_checksum
    FROM flags GROUP BY source ORDER BY source
    """,
    description="G17 dedup canonical selection: per near-dup component "
    "keep the best document (longest, lowest-id tiebreak), singletons "
    "pass through — per-source kept/dropped census with kept-id checksum",
)
def canonical_dedup_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step production dedup actually ships: near-dup PAIRS ->
    components -> ONE canonical survivor per component, everything else
    dropped. The canonical key is (max token count, min doc_id) — the
    keep-the-richest-duplicate policy — decided by a PARTITIONED window
    over the component id (component populations are dup clusters, so
    the rank input is bounded by the largest dup group, never the
    corpus). Docs outside any component keep themselves via the left
    join's COALESCE(TRUE). Output is the per-source census with a
    kept-id checksum, so the oracle value-checks the exact survivor
    SET, not just counts."""
    comps = neardup_components(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
    )
    w = W.partitionBy("component_id").orderBy(
        F.col("n_tokens").desc(), "doc_id"
    )
    rk = (
        comps.join(docs.select("doc_id", "n_tokens"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", (F.col("rn") == 1).alias("keep"))
    )
    flags = docs.join(rk, "doc_id", "left").select(
        "source", "doc_id", F.coalesce("keep", F.lit(True)).alias("keep")
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("keep").cast("bigint")).cast("bigint").alias("n_kept"),
            F.sum((~F.col("keep")).cast("bigint"))
            .cast("bigint")
            .alias("n_dropped"),
            F.coalesce(
                F.sum(F.when(F.col("keep"), F.col("doc_id"))), F.lit(0)
            )
            .cast("bigint")
            .alias("kept_id_checksum"),
        )
        .orderBy("source")
    )


@register(
    "embedding_neardup_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35
    """,
    description="G17 embedding-cosine near-dup: label-blocked self-join, JVM dot product",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection in embedding space. Blocking on a coarse
    key (here the label; in production an LSH/IVF cell id) keeps the
    self-join linear in bucket size instead of O(n^2) over the corpus —
    the same pattern as the MinHash band join."""
    from ..functions.vectors import cosine_pre, norm

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("la"),
        F.col("embedding").alias("va"),
        norm(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("vb"),
        norm(F.col("embedding")).alias("nb"),
    )
    sim = F.round(cosine_pre(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")), 6)
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.35)
    )


def _simhash_oracle() -> str:
    bit_sums = ",\n               ".join(
        f"SUM(CASE WHEN (h // {2**i}) % 2 = 1 THEN 1 ELSE -1 END) AS b_{i}"
        for i in range(32)
    )
    fp_expr = " + ".join(
        f"(CASE WHEN b_{i} > 0 THEN {2**i} ELSE 0 END)" for i in range(32)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_distinct(string_split_regex(trim(text), '\\s+')))
                   AS token
        FROM documents),
    hh AS (SELECT doc_id,
                  CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h
           FROM tok),
    sums AS (SELECT doc_id,
               {bit_sums}
             FROM hh GROUP BY doc_id),
    fp AS (SELECT doc_id, CAST({fp_expr} AS BIGINT) AS simhash FROM sums),
    counts AS (SELECT simhash, COUNT(*) AS n_docs,
                      MIN(doc_id) AS keeper_doc_id
               FROM fp GROUP BY simhash)
    SELECT f.doc_id, f.simhash, c.n_docs, c.keeper_doc_id
    FROM fp f JOIN counts c USING (simhash)
    """


@register(
    "simhash_fingerprints",
    oracle=_simhash_oracle(),
    description="G17 SimHash(32-bit) fingerprint per doc + collision buckets "
    "— md5-based token hash, exact DuckDB oracle",
    twin_test="tests/test_dedup.py::test_identical_docs_same_simhash",
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash: per token hash, each bit contributes +1/-1; the
    fingerprint takes the sign of each bit-sum. All JVM expressions:
    explode -> 32 conditional sums -> bit reassembly. The token hash is
    the md5 32-bit bridge (not xxhash64) so the DuckDB oracle computes
    the exact same fingerprints (verdict r8 #2); the bit probe
    shiftright(h,i)&1 equals the oracle's (h // 2^i) % 2 because h is
    non-negative."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.array_distinct(tokens("text"))).alias("token"))
    h = (
        F.conv(F.substring(F.md5(F.encode(F.col("token"), "UTF-8")), 1, 8), 16, 10)
        .cast("long")
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b_{i}")
        for i in range(32)
    ]
    sums = tok.groupBy("doc_id").agg(*bit_sums)
    fingerprint = sum(
        [
            F.when(F.col(f"b_{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
            for i in range(32)
        ],
        start=F.lit(0).cast("long"),
    )
    fp = sums.select("doc_id", fingerprint.alias("simhash"))
    counts = fp.groupBy("simhash").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc_id")
    )
    return fp.join(counts, "simhash").select(
        "doc_id", "simhash", "n_docs", "keeper_doc_id"
    )


PASSAGE_N = 8  # tokens per exact-match span


@register(
    "exact_passage_spans",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - {PASSAGE_N - 1}),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                     || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
                     || ' ' || t[i+7]))) AS span
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents)
        WHERE len(t) >= {PASSAGE_N})
    SELECT md5(span) AS span_md5,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM sh
    GROUP BY span
    HAVING COUNT(*) >= 2
    """,
    description="G17 exact substring (passage) dedup: 8-token spans shared by "
    ">=2 docs, with the span's doc range — the contamination/memorization scan",
)
def exact_passage_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate passage detection (the dedup unit of 'deduplicating
    training data makes language models better', Lee et al. 2022 — theirs
    is suffix-array 50-token spans; same semantics at n=8 here): every
    8-token window, deduped within doc, grouped across the corpus. This
    is ONE explode + ONE map-side-combined groupBy — no self-join, so a
    boilerplate span in k docs costs one k-row group, not k^2 join rows;
    the shape survives 100 TB. Spans are distinct-per-doc so COUNT(*)
    counts documents. Two shuffle-volume tricks: the raw docs are
    round-robin repartitioned before the span explode (spreads the
    compute even when the storage layout yields few splits), and spans
    are md5'd BEFORE the groupBy so the exchange carries 16-byte digests
    instead of ~50-byte strings — grouping by digest is equivalent
    because md5 collisions are negligible at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    sh = (
        spread(docs.filter(F.size(toks) >= PASSAGE_N))
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles("text", PASSAGE_N))).alias("span"),
        )
        .select(
            "doc_id", F.md5(F.encode(F.col("span"), "UTF-8")).alias("span_md5")
        )
    )
    return (
        sh.groupBy("span_md5")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .select("span_md5", "n_docs", "first_doc", "last_doc")
    )


from ..plans.registry import QUERIES as _QUERIES  # noqa: E402
from pyspark.sql.window import Window as _W  # noqa: E402


@register(
    "prefix_filter_jaccard_pairs",
    # Same output as jaccard_neardup_pairs by construction (prefix
    # filtering is a lossless candidate pruning), so the oracle is
    # shared verbatim.
    oracle=_QUERIES["jaccard_neardup_pairs"].oracle,
    description="All-Pairs/PPJoin-style prefix-filtered exact Jaccard "
    "join: tokens globally ordered by rarity, candidates only from "
    "pairs whose rare-token prefixes intersect — provably the same "
    "pairs as the full token self-join at threshold 0.8, at a fraction "
    "of the candidate volume",
)
def prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.8 pairs via prefix filtering (Bayardo et al.,
    "Scaling Up All Pairs Similarity Search", WWW'07): order every
    doc's tokens by global rarity (df asc, token), keep only the first
    |d| - ceil(0.8*|d|) + 1 of them, and generate candidates from the
    prefix self-join alone. Pigeonhole guarantee: two docs with
    Jaccard >= t share >= ceil(t*|d|) tokens, so their globally-least
    shared token must sit inside BOTH prefixes — no qualifying pair is
    missed. Hot tokens land at the END of the rarity order and thus
    almost never inside a prefix, which is what kills the k^2 stopword
    blowup structurally (the df cap shared with jaccard_neardup_pairs
    stays mirrored in the oracle). Candidate verification joins full
    token sets for candidate pairs only. Prefix length is computed in
    exact integer arithmetic: ceil(4n/5) = (4n+4) div 5."""
    docs = load_table(spark, sf_dir, "documents")
    # tok feeds sizes, dfreq, the array prefix AND both verify sides —
    # five consumers; materialize the guarded token relation once
    # (measured ~25% faster than re-executing the explode+anti-join).
    # LAZY (r12): materialization runs inside the first consuming job,
    # the same honest accounting as the rest of the dedup family.
    return prefix_filtered_pairs(_doc_tokens(docs).localCheckpoint(eager=False))


def _prefix_relation(tok: DataFrame) -> DataFrame:
    """The rarity-ordered prefix of every doc, computed on the ARRAY
    form: collect each doc's (df, token) pairs, sort the array (struct
    order = (df asc, token asc), unique within a doc since tokens are
    per-doc distinct), posexplode ONLY the prefix slice. Prefix length
    for t=0.8 in exact integers: |d| - ceil(0.8|d|) + 1 =
    n - (4n+4) div 5 + 1; rn = 1-based position in the rarity order.
    Factored out so the pre-checkpoint plan stays pin/guard-visible
    via EXTRA_PLAN_BUILDERS (the caller lazily checkpoints it)."""
    dfreq = tok.groupBy("source", "token").agg(F.count("*").alias("df"))
    arrs = (
        tok.join(dfreq, ["source", "token"])
        .groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            F.sort_array(F.collect_list(F.struct("df", "token"))).alias(
                "arr"
            ),
        )
    )
    return arrs.select(
        "doc_id",
        "source",
        F.size("arr").alias("n_tok"),
        F.posexplode(
            F.expr("slice(arr, 1, size(arr) - (4*size(arr) + 4) div 5 + 1)")
        ).alias("pos", "s"),
    ).select(
        "doc_id",
        "source",
        F.col("s.token").alias("token"),
        "n_tok",
        (F.col("pos") + 1).alias("rn"),
    )


def prefix_filtered_pairs(tok: DataFrame) -> DataFrame:
    """The All-Pairs/PPJoin core over a (doc_id, source, token)
    relation with per-doc-distinct tokens: prefix filter + length
    filter + positional suffix bound, then exact verification.
    Factored out of the registered query so the property test can run
    the REAL filter chain on hypothesis-random corpora
    (tests/test_ppjoin_property.py) — losslessness is proven against
    brute force there, not just on the fixtures.

    The per-doc rarity rank is computed on the ARRAY form (verdict r11
    #1, guide §2.5): collect each doc's (df, token) pairs, sort the
    array (struct order = (df asc, token asc) — exactly the old
    row_number() ORDER BY, and unique within a doc because tokens are
    per-doc distinct), then posexplode ONLY the prefix slice. This
    replaces the per-doc row_number window over the full token relation
    (exchange + per-doc sort of every token) with one groupBy whose
    per-doc sort touches each array once, emits ~|d|/5 prefix rows
    instead of ranking all |d|, and drops the separate sizes join
    (n_tok = size(arr)). The prefix relation feeds BOTH self-join
    sides, so it is lazily checkpointed — at ~1/5 of the token relation
    it is the cheapest materialization point in the operator (the r11
    tok checkpoint stays for the dfreq/verify consumers)."""
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    prefix = _prefix_relation(tok).localCheckpoint(eager=False)
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    # Length filter (lossless, standard All-Pairs companion to the
    # prefix filter): J(a,b) >= t implies min(|a|,|b|) >= t*max(|a|,|b|)
    # since the intersection is at most min and the union at least max.
    # In exact integers for t=0.8: 5*min >= 4*max. Prunes candidates
    # inside the join, before the distinct and the verify joins.
    len_ok = F.least(F.col("pa.n_tok"), F.col("pb.n_tok")) * 5 >= F.greatest(
        F.col("pa.n_tok"), F.col("pb.n_tok")
    ) * 4
    # Positional (suffix) upper bound, PPJoin's second filter (Xiao et
    # al. / Bayardo): tokens are in ONE global rarity order, so every
    # common token of a matched pair sits at position >= rn in each doc
    # — overlap <= min(n_a - rn_a, n_b - rn_b) + 1. A pair with
    # J >= t needs overlap >= t/(1+t) * (n_a+n_b); for t=0.8 that is
    # ceil(4(n_a+n_b)/9), exact integers. Lossless: the bound only
    # discards pairs that cannot reach the required overlap. The
    # groupBy REPLACES the former .distinct() (same shuffle), so the
    # bound prunes verify-join fan-in for free.
    ub = (
        F.least(
            F.col("pa.n_tok") - F.col("pa.rn"),
            F.col("pb.n_tok") - F.col("pb.rn"),
        )
        + 1
    )
    required = F.expr("(4*(pa.n_tok + pb.n_tok) + 8) div 9")
    cand = (
        pa.join(
            pb,
            (F.col("pa.source") == F.col("pb.source"))
            & (F.col("pa.token") == F.col("pb.token"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id"))
            & len_ok,
        )
        .groupBy(
            F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b")
        )
        .agg(F.max(ub).alias("max_ub"), F.max(required).alias("req"))
        .filter(F.col("max_ub") >= F.col("req"))
        .select("doc_a", "doc_b")
    )
    ta, tb = tok.alias("ta"), tok.alias("tb")
    shared = (
        cand.join(ta, F.col("ta.doc_id") == F.col("doc_a"))
        .join(
            tb,
            (F.col("tb.doc_id") == F.col("doc_b"))
            & (F.col("tb.token") == F.col("ta.token")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n_tok") + F.col("sb.n_tok") - F.col("n_shared")
    )
    return (
        shared.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )


@register(
    "dedup_canonical_selection",
    oracle=_NEARDUP_COMP_SQL + """,
    ranked AS (
        SELECT c.component_id, c.doc_id, d.n_chars,
               ROW_NUMBER() OVER (PARTITION BY c.component_id
                                  ORDER BY d.n_chars DESC, c.doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY c.component_id) AS n_docs
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
    SELECT component_id, doc_id AS canonical_doc_id,
           CAST(n_chars AS BIGINT) AS n_chars, n_docs
    FROM ranked WHERE rn = 1
    ORDER BY component_id
    """,
    description="G17 dedup canonicalization: one survivor per near-dup "
    "cluster (longest doc, doc_id tiebreak) — the keep-best step that "
    "turns detected clusters into an actual deduplicated corpus",
)
def dedup_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the dedup pipeline: detect (jaccard pairs) ->
    cluster (connected components) -> SELECT (this): per component,
    keep the longest document with doc_id as the total tiebreak, and
    report cluster size so the drop count is auditable. One window
    over the component-sized label relation — components are bounded
    by cluster size, not corpus size, so the window partition never
    grows with data. Oracle extends the recursive-CTE components
    oracle with the identical ranked selection."""
    from pyspark.sql.window import Window as _Win

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    edges = jaccard_neardup_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    labels = connected_components(edges).select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )
    ranked = (
        labels.join(docs, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                _Win.partitionBy("component_id").orderBy(
                    F.desc("n_chars"), "doc_id"
                )
            ),
        )
        .withColumn(
            "n_docs",
            F.count("*").over(_Win.partitionBy("component_id")),
        )
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "component_id",
            F.col("doc_id").alias("canonical_doc_id"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
            "n_docs",
        )
        .orderBy("component_id")
    )


@register(
    "incremental_neardup_new_vs_old",
    oracle=f"""
    WITH tok0 AS (
        SELECT doc_id, source,
               unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS token
        FROM documents),
    hot AS (SELECT source, token FROM tok0
            GROUP BY source, token HAVING COUNT(*) > {TOKEN_DF_CAP_SQL}),
    tok AS (SELECT t.* FROM tok0 t
            LEFT JOIN hot h ON t.source = h.source AND t.token = h.token
            WHERE h.token IS NULL),
    sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
    cut AS (SELECT (MAX(doc_id) + 1) // 2 AS mid FROM documents),
    shared AS (
        SELECT n.doc_id AS new_doc, o.doc_id AS old_doc,
               COUNT(*) AS n_shared
        FROM tok n JOIN tok o
          ON n.source = o.source AND n.token = o.token
        CROSS JOIN cut
        WHERE n.doc_id >= cut.mid AND o.doc_id < cut.mid
        GROUP BY 1, 2)
    SELECT s.new_doc, s.old_doc,
           CAST(s.n_shared AS DOUBLE)
               / (sn.n_tok + so.n_tok - s.n_shared) AS jaccard
    FROM shared s
    JOIN sizes sn ON sn.doc_id = s.new_doc
    JOIN sizes so ON so.doc_id = s.old_doc
    WHERE CAST(s.n_shared AS DOUBLE)
          / (sn.n_tok + so.n_tok - s.n_shared) >= 0.8
    ORDER BY new_doc, old_doc
    """,
    description="G17 incremental dedup: the asymmetric new-batch vs "
    "existing-corpus Jaccard join a daily ingest runs (corpus split at "
    "the median doc_id) — candidate volume is |new| x matches, never "
    "corpus x corpus",
)
def incremental_neardup_new_vs_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production dedup is INCREMENTAL: yesterday's corpus is already
    deduplicated, so today's batch only joins new-vs-old (plus
    new-vs-new, covered by the self-join operators). The asymmetric
    join's cost is |new batch| x per-token match width — independent
    of total corpus size on the probe side, which is what keeps daily
    ingest affordable at a 100 TB corpus; the hot-token df cap and
    token guards are shared with the self-join family. The split here
    is the median doc_id (a 1-row broadcast), standing in for the
    ingest-date partition a real pipeline splits on."""
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(((F.max("doc_id") + 1) / 2).cast("bigint").alias("mid"))
    # Build the token relation ONCE (each _doc_tokens call runs a
    # docs.count() job for the adaptive cap) and derive sizes from it,
    # the same way containment_neardup_pairs does.
    base_tok = _doc_tokens(docs)
    tok = base_tok.crossJoin(F.broadcast(mid))
    new_t = tok.filter(F.col("doc_id") >= F.col("mid")).drop("mid")
    old_t = tok.filter(F.col("doc_id") < F.col("mid")).drop("mid")
    sizes = base_tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    n, o = new_t.alias("n"), old_t.alias("o")
    shared = (
        n.join(
            o,
            (F.col("n.source") == F.col("o.source"))
            & (F.col("n.token") == F.col("o.token")),
        )
        .groupBy(
            F.col("n.doc_id").alias("new_doc"), F.col("o.doc_id").alias("old_doc")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sn, so = sizes.alias("sn"), sizes.alias("so")
    jac = F.col("n_shared").cast("double") / (
        F.col("sn.n_tok") + F.col("so.n_tok") - F.col("n_shared")
    )
    return (
        shared.join(sn, F.col("new_doc") == F.col("sn.doc_id"))
        .join(so, F.col("old_doc") == F.col("so.doc_id"))
        .select("new_doc", "old_doc", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
        .orderBy("new_doc", "old_doc")
    )


def _register_threshold_sweep() -> None:
    @register(
        "jaccard_threshold_sweep",
        oracle=f"""
        WITH tok0 AS (
            SELECT doc_id, source,
                   unnest(list_distinct(string_split_regex(trim(text), '\\s+')))
                       AS token
            FROM documents),
        hot AS (SELECT source, token FROM tok0
                GROUP BY source, token HAVING COUNT(*) > {TOKEN_DF_CAP_SQL}),
        tok AS (SELECT t.* FROM tok0 t
                LEFT JOIN hot h ON t.source = h.source AND t.token = h.token
                WHERE h.token IS NULL),
        sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
        shared AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
            FROM tok a JOIN tok b
              ON a.source = b.source AND a.token = b.token
             AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
        jac AS (
            SELECT 100 * n_shared AS num,
                   sa.n_tok + sb.n_tok - n_shared AS den
            FROM shared
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b),
        thresholds AS (SELECT unnest([70, 80, 90]) AS t_pct)
        SELECT CAST(t.t_pct AS BIGINT) AS t_pct,
               CAST(COUNT(CASE WHEN j.num >= t.t_pct * j.den THEN 1 END)
                    AS BIGINT) AS n_pairs
        FROM thresholds t CROSS JOIN jac j
        GROUP BY t.t_pct
        ORDER BY t_pct
        """,
        description="G17 dedup-threshold sensitivity: near-dup pair counts "
        "at Jaccard >= 0.7/0.8/0.9 from ONE shared-token-count relation "
        "(the integer cross-inequality 100*shared >= t*(union)), the "
        "calibration curve run before fixing a production threshold",
    )
    def jaccard_threshold_sweep(spark, sf_dir):
        """Threshold calibration without recomputing the join.

        The expensive part of near-dup — the blocked token self-join —
        runs once; each threshold is then an integer comparison against
        the same (num, den) pairs (100*n_shared >= t*(|a|+|b|-shared):
        no division, no float). The per-threshold counts are what you
        plot to pick t. Candidate volume is bounded exactly as in
        `jaccard_neardup_pairs` (same df cap, same blocking).
        """
        from pyspark.sql import functions as F

        tok = _doc_tokens(load_table(spark, sf_dir, "documents"))
        sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
        a, b = tok.alias("a"), tok.alias("b")
        shared = (
            a.join(
                b,
                (F.col("a.source") == F.col("b.source"))
                & (F.col("a.token") == F.col("b.token"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .agg(F.count("*").alias("n_shared"))
        )
        sa = sizes.alias("sa")
        sb = sizes.alias("sb")
        jac = (
            shared.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
            .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
            .select(
                (100 * F.col("n_shared")).alias("num"),
                (F.col("sa.n_tok") + F.col("sb.n_tok") - F.col("n_shared")).alias(
                    "den"
                ),
            )
        )
        return (
            jac.select(
                F.explode(
                    F.array(
                        F.lit(70).cast("bigint"),
                        F.lit(80).cast("bigint"),
                        F.lit(90).cast("bigint"),
                    )
                ).alias("t_pct"),
                "num",
                "den",
            )
            .groupBy("t_pct")
            .agg(
                F.sum(
                    F.when(F.col("num") >= F.col("t_pct") * F.col("den"), 1)
                    .otherwise(0)
                )
                .cast("bigint")
                .alias("n_pairs")
            )
            .orderBy("t_pct")
        )


_register_threshold_sweep()


@register(
    "dedup_source_flow_matrix",
    oracle="""
    WITH ks AS (
        SELECT md5(array_to_string(
                   string_split_regex(trim(lower(text)), '\\s+')[1:16],
                   ' ')) AS k,
               source,
               COUNT(*) AS n_src
        FROM documents
        GROUP BY 1, 2),
    tot AS (
        SELECT k, SUM(n_src) AS n_tot FROM ks GROUP BY k),
    dup AS (
        SELECT ks.k, ks.source, ks.n_src
        FROM ks JOIN tot ON ks.k = tot.k
        WHERE tot.n_tot >= 2),
    pairs AS (
        SELECT a.k, a.source AS src_a, b.source AS src_b
        FROM dup a JOIN dup b ON a.k = b.k AND a.source < b.source
        UNION ALL
        SELECT k, source, source FROM dup WHERE n_src >= 2)
    SELECT src_a, src_b, CAST(COUNT(DISTINCT k) AS BIGINT) AS n_clusters
    FROM pairs
    GROUP BY src_a, src_b
    ORDER BY n_clusters DESC, src_a, src_b
    """,
    description="G17 duplicate-flow provenance matrix: for every "
    "16-token-prefix duplicate cluster, which source pairs share the "
    "duplicated prefix — tells a corpus curator whether dup mass is "
    "intra-source (crawler re-fetch) or cross-source (syndication), "
    "per unordered source pair including the same-source diagonal",
)
def dedup_source_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate provenance.

    The per-(cluster, source) relation is the unit of work — it is at
    most |sources| rows per cluster, so the self-join within a cluster
    is bounded by |sources|^2 (a few hundred), never by cluster size.
    At 100 TB the heavy step stays the one hash groupBy on the text
    key; everything after operates on the collapsed relation.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(
        F.encode(
            F.concat_ws(
                " ",
                F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 16),
            ),
            "UTF-8",
        )
    )
    ks = docs.groupBy(key.alias("k"), "source").agg(
        F.count("*").alias("n_src")
    )
    tot = ks.groupBy("k").agg(F.sum("n_src").alias("n_tot"))
    dup = (
        ks.join(tot, "k")
        .filter(F.col("n_tot") >= 2)
        .select("k", "source", "n_src")
    )
    a = dup.select("k", F.col("source").alias("src_a"))
    b = dup.select("k", F.col("source").alias("src_b"))
    cross = a.join(b, "k").filter(F.col("src_a") < F.col("src_b"))
    diag = dup.filter(F.col("n_src") >= 2).select(
        "k", F.col("source").alias("src_a"), F.col("source").alias("src_b")
    )
    pairs = cross.select("k", "src_a", "src_b").unionByName(diag)
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(F.countDistinct("k").alias("n_clusters"))
        .orderBy(F.desc("n_clusters"), "src_a", "src_b")
    )


# --- Pre-checkpoint plan exposure (ADVICE r11 / verdict r9 #2) --------
#
# The lazy localCheckpoints above truncate the dominant upstream
# subtrees out of the registry-wide plan pins (a checkpointed relation
# dumps as a Scan ExistingRDD leaf), so the real explode/aggregate/
# signature shapes would otherwise be guard-invisible. These builders
# re-compose the UN-checkpointed subtrees for gen_plan_pins.py and
# tests/test_plan_guard.py.
from ..plans.registry import EXTRA_PLAN_BUILDERS as _EXTRA  # noqa: E402

_EXTRA["prefix_filter_jaccard_pairs::prefix"] = lambda spark, sf_dir: (
    _prefix_relation(_doc_tokens(load_table(spark, sf_dir, "documents")))
)
_EXTRA["minhash_lsh_neardup::buckets"] = lambda spark, sf_dir: (
    lsh_buckets(minhash_signatures(load_table(spark, sf_dir, "documents")))
)
_EXTRA["containment_neardup_pairs::doc_tokens"] = lambda spark, sf_dir: (
    _doc_tokens(load_table(spark, sf_dir, "documents"))
)
