"""Corpus-quality depth ops for the LLM-data pipeline (SURVEY §2.3 G17):
asymmetric containment near-dup and token-rarity document scoring.

Containment C(A -> B) = |A intersect B| / |A| is the directional
complement of Jaccard: a short document pasted inside a long one has low
Jaccard (the union is dominated by B) but containment ~1.0 — the shape
that catches quote-farms, boilerplate-wrapped reposts, and
sub-document scrapes that symmetric near-dup misses (cf. Broder's
resemblance vs containment distinction in the original shingling
paper). Reference scope: the reference pipeline treats each record's
payload as an opaque document (consumer.py:117-175); these are the
corpus-level batch analyses run over the accumulated archive.

Both ops reuse `dedup._doc_tokens` — per-doc distinct whitespace
tokens, blocked by source, hot tokens (within-source df > TOKEN_DF_CAP)
removed on BOTH engines — so the candidate volume is bounded exactly
like the Jaccard family (cap^2 per surviving token worst case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table, spread
from ..functions.text import tokens
from .dedup import _doc_tokens, TOKEN_DF_CAP_SQL

CONTAINMENT_T = 0.9
MIN_TOKENS = 5


@register(
    "containment_neardup_pairs",
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
        SELECT a.doc_id AS lo, b.doc_id AS hi, COUNT(*) AS n_shared
        FROM tok a JOIN tok b
          ON a.source = b.source AND a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    both_dirs AS (
        SELECT lo AS contained, hi AS container, n_shared,
               sa.n_tok AS n_contained
        FROM shared JOIN sizes sa ON sa.doc_id = lo
        UNION ALL
        SELECT hi AS contained, lo AS container, n_shared,
               sb.n_tok AS n_contained
        FROM shared JOIN sizes sb ON sb.doc_id = hi)
    SELECT contained, container, n_shared,
           CAST(n_contained AS BIGINT) AS n_contained,
           CAST(n_shared AS DOUBLE) / n_contained AS containment
    FROM both_dirs
    WHERE n_contained >= {MIN_TOKENS}
      AND CAST(n_shared AS DOUBLE) / n_contained >= {CONTAINMENT_T}
    """,
    description="G17 asymmetric containment near-dup: directional "
    "|A∩B|/|A| >= 0.9 pairs (catches sub-document duplication that "
    "symmetric Jaccard misses), same source blocking + hot-token cap as "
    "the Jaccard family",
)
def containment_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment pairs over blocked token sets.

    One token self-join with a < b (identical cost shape to
    `jaccard_neardup_pairs` — the shared-count relation is built ONCE),
    then both directions are derived from it by unioning the two size
    joins; no second self-join. The division is double on both engines
    over exact integers, so the ratio is bit-identical.
    """
    # tok feeds sizes + both self-join sides — materialize once (same
    # lazy-checkpoint rationale as jaccard_neardup_pairs; measured
    # 2.48 -> 1.6 s at sf0.1, build included). Storage bound (r12
    # audit): CORPUS-SCALED token relation, lineage truncated — same
    # persist(DISK_ONLY) trade as the jaccard site at cluster scale.
    tok = _doc_tokens(load_table(spark, sf_dir, "documents")).localCheckpoint(
        eager=False
    )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    a, b = tok.alias("a"), tok.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("lo"), F.col("b.doc_id").alias("hi"))
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    dir_a = (
        shared.join(sa, F.col("lo") == F.col("sa.doc_id"))
        .select(
            F.col("lo").alias("contained"),
            F.col("hi").alias("container"),
            "n_shared",
            F.col("sa.n_tok").alias("n_contained"),
        )
    )
    dir_b = (
        shared.join(sb, F.col("hi") == F.col("sb.doc_id"))
        .select(
            F.col("hi").alias("contained"),
            F.col("lo").alias("container"),
            "n_shared",
            F.col("sb.n_tok").alias("n_contained"),
        )
    )
    both = dir_a.unionByName(dir_b)
    cont = F.col("n_shared").cast("double") / F.col("n_contained")
    return both.filter(
        (F.col("n_contained") >= MIN_TOKENS) & (cont >= CONTAINMENT_T)
    ).select("contained", "container", "n_shared", "n_contained", cont.alias("containment"))


@register(
    "token_rarity_scores",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS token
        FROM documents),
    dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
              FROM tok GROUP BY token),
    scored AS (
        SELECT t.doc_id, d.df FROM tok t JOIN dfreq d USING (token))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(SUM(df) AS BIGINT) AS sum_df,
           (1000 * CAST(SUM(df) AS BIGINT)) // COUNT(*) AS mean_df_milli,
           CAST(COUNT(*) FILTER (WHERE df = 1) AS BIGINT) AS n_hapax,
           (1000000 * CAST(COUNT(*) FILTER (WHERE df = 1) AS BIGINT))
               // COUNT(*) AS hapax_ppm
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    description="G17 token-rarity document scoring: per-doc mean corpus "
    "document-frequency of its distinct tokens + hapax (df=1) share — an "
    "integer-exact lexical novelty / noisiness signal (high hapax share "
    "flags OCR garbage and codes; low mean-df flags template text)",
)
def token_rarity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc lexical rarity profile against the corpus df table.

    The df relation is |vocab|-sized (sub-linear in corpus size) and
    joined back on token — at 100 TB the join key is the token, the
    heavy side is pre-aggregated to distinct (doc, token), and the df
    side is a broadcastable dictionary for any realistic vocabulary.
    All statistics are integers; divisions are truncating on
    non-negative operands (identical on both engines).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("token")
    )
    dfreq = tok.groupBy("token").agg(F.count("*").alias("df"))
    scored = tok.join(dfreq, "token")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum("df").alias("sum_df"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .select(
            "doc_id",
            "n_tok",
            "sum_df",
            F.expr("(1000 * sum_df) div n_tok").alias("mean_df_milli"),
            F.col("n_hapax").cast("bigint").alias("n_hapax"),
            F.expr("(1000000 * n_hapax) div n_tok").alias("hapax_ppm"),
        )
        .orderBy("doc_id")
    )


@register(
    "vocab_overlap_langs",
    oracle="""
    WITH vocab AS (
        SELECT DISTINCT lang,
               unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS token
        FROM documents),
    sizes AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM vocab GROUP BY 1),
    shared AS (
        SELECT a.lang AS lang_a, b.lang AS lang_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM vocab a JOIN vocab b
          ON a.token = b.token AND a.lang < b.lang
        GROUP BY 1, 2)
    SELECT lang_a, lang_b, n_shared,
           sa.n AS n_vocab_a, sb.n AS n_vocab_b,
           CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.lang = lang_a
    JOIN sizes sb ON sb.lang = lang_b
    ORDER BY lang_a, lang_b
    """,
    description="G17 cross-language vocabulary overlap matrix: pairwise "
    "Jaccard between per-language token vocabularies — the corpus-level "
    "language-contamination screen (high overlap between supposedly "
    "distinct langs flags mislabeled or code-switched documents)",
)
def vocab_overlap_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between language groups.

    The vocab relation is |langs| x |vocab| (sub-linear in corpus
    size); the token self-join is keyed on token with lang_a < lang_b
    pruning, and output is |langs|^2 rows. At 100 TB the vocab relation
    is the only thing that shuffles — document text never moves after
    the distinct-(lang, token) map-side combine.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    vocab = docs.select(
        "lang", F.explode(F.array_distinct(tokens("text"))).alias("token")
    ).distinct()
    sizes = vocab.groupBy("lang").agg(F.count("*").alias("n"))
    a, b = vocab.alias("a"), vocab.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_shared")
    )
    return (
        shared.join(F.broadcast(sa), F.col("lang_a") == F.col("sa.lang"))
        .join(F.broadcast(sb), F.col("lang_b") == F.col("sb.lang"))
        .select(
            "lang_a",
            "lang_b",
            "n_shared",
            F.col("sa.n").alias("n_vocab_a"),
            F.col("sb.n").alias("n_vocab_b"),
            jac.alias("jaccard"),
        )
        .orderBy("lang_a", "lang_b")
    )


@register(
    "rag_chunk_dedup_rate",
    oracle="""
    WITH chunks AS (
        SELECT doc_id, source,
               md5(substr(text, CAST(g * 100 + 1 AS INT), 100)) AS chunk_md5
        FROM documents,
             UNNEST(generate_series(0, (length(text) - 1) // 100)) AS u(g)),
    freq AS (
        SELECT chunk_md5, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM chunks GROUP BY 1),
    per_source AS (
        SELECT c.source,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(COUNT(*) FILTER (WHERE f.n > 1) AS BIGINT) AS n_dup_chunks
        FROM chunks c JOIN freq f USING (chunk_md5)
        GROUP BY 1)
    SELECT source, n_chunks, n_dup_chunks,
           (1000000 * n_dup_chunks) // n_chunks AS dup_ppm
    FROM per_source
    ORDER BY source
    """,
    description="G17 RAG-chunk dedup rate: documents split into the same "
    "100-char chunks the UDTF query emits, content-hashed; per source, "
    "the share of chunks whose hash appears more than once corpus-wide "
    "— the index-bloat metric a retrieval pipeline tracks before "
    "embedding",
)
def rag_chunk_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-chunk share per source at the RAG chunk grain.

    Chunking is pure projection fan-out (posexplode of a substring
    sequence — no shuffle); dedup state is the |distinct chunks| hash
    relation, joined back by hash. At 100 TB the freq relation IS the
    dedup index a retrieval store maintains; everything here map-side
    combines before the hash shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_chunks_col = F.floor((F.length("text") - 1) / 100).cast("int")
    chunks = docs.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(0), n_chunks_col)).alias("g"),
        F.col("text"),
    ).select(
        "doc_id",
        "source",
        F.md5(
            F.encode(
                F.expr("substr(text, CAST(g * 100 + 1 AS INT), 100)"), "UTF-8"
            )
        ).alias("chunk_md5"),
    )
    freq = chunks.groupBy("chunk_md5").agg(F.count("*").alias("n"))
    per_source = (
        chunks.join(freq, "chunk_md5")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_chunks"),
        )
    )
    return per_source.select(
        "source",
        "n_chunks",
        "n_dup_chunks",
        F.expr("(1000000 * n_dup_chunks) div n_chunks").alias("dup_ppm"),
    ).orderBy("source")


@register(
    "bigram_surprise_scores",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents),
    bg AS (
        SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i)
        WHERE len(t) >= 2),
    bfreq AS (
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS bf
        FROM bg GROUP BY 1)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(bf) AS BIGINT) AS sum_bf,
           (1000 * CAST(SUM(bf) AS BIGINT)) // COUNT(*) AS mean_bf_milli,
           CAST(COUNT(*) FILTER (WHERE bf = 1) AS BIGINT) AS n_unique_bigrams,
           (1000000 * CAST(COUNT(*) FILTER (WHERE bf = 1) AS BIGINT))
               // COUNT(*) AS unique_ppm
    FROM bg JOIN bfreq USING (bigram)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    description="G17 bigram-surprise scoring: per-doc mean corpus "
    "frequency of its adjacent token PAIRS plus the share of "
    "corpus-unique bigrams — the sequence-level fluency proxy "
    "(token-rarity's unigram signal misses scrambled word salad whose "
    "unigrams are all common)",
)
def bigram_surprise_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-level novelty against the corpus bigram table.

    Token positions pair via a transform over the split array (1->n-1
    fan-out inside the task, no shuffle); the bigram-frequency
    dictionary is |bigram vocab|-sized and joined back by bigram. A
    doc whose every unigram is common but whose bigrams are mostly
    corpus-unique is scrambled/generated text — the exact case unigram
    rarity cannot flag. Integers end to end.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = tokens("text")
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(split(trim(text), '\\\\s+'), 1, "
                "size(split(trim(text), '\\\\s+')) - 1), "
                "(x, i) -> concat(x, ' ', element_at(split(trim(text), '\\\\s+'), i + 2)))"
            )
        ).alias("bigram"),
    )
    bfreq = bg.groupBy("bigram").agg(F.count("*").alias("bf"))
    joined = bg.join(bfreq, "bigram")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("bf").alias("sum_bf"),
            F.sum(F.when(F.col("bf") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique_bigrams"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_bf",
            F.expr("(1000 * sum_bf) div n_bigrams").alias("mean_bf_milli"),
            "n_unique_bigrams",
            F.expr("(1000000 * n_unique_bigrams) div n_bigrams").alias(
                "unique_ppm"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "length_dist_drift_by_source",
    oracle="""
    WITH d AS (
        SELECT source,
               LEAST(len(string_split_regex(trim(text), '\\s+')) // 50, 9)
                   AS bucket
        FROM documents),
    per_source AS (
        SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS c
        FROM d GROUP BY 1, 2),
    src_tot AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM per_source GROUP BY 1),
    corpus AS (
        SELECT bucket, CAST(SUM(c) AS BIGINT) AS a FROM per_source GROUP BY 1),
    n_all AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM per_source),
    grid AS (
        SELECT st.source, co.bucket, st.ns, co.a, n_all.n,
               COALESCE(ps.c, 0) AS c
        FROM src_tot st CROSS JOIN corpus co CROSS JOIN n_all
        LEFT JOIN per_source ps
          ON ps.source = st.source AND ps.bucket = co.bucket)
    SELECT source, ANY_VALUE(ns) AS n_docs,
           CAST(SUM(abs(c * n - a * ns)) AS BIGINT) AS tv_num,
           (1000000 * CAST(SUM(abs(c * n - a * ns)) AS BIGINT))
               // (2 * ANY_VALUE(ns) * ANY_VALUE(n)) AS tv_ppm
    FROM grid
    GROUP BY source
    ORDER BY source
    """,
    description="G17 distribution drift screen: total-variation distance "
    "between each source's token-length-bucket distribution and the "
    "corpus distribution, in exact cross-multiplied integers (the "
    "log-free alternative to KL that survives exact cross-engine "
    "comparison) — high TV flags sources whose length profile diverges "
    "from the mix",
)
def length_dist_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TV(source_dist, corpus_dist) per source, integers end to end.

    TV = 1/2 * sum_b |c_b/ns - a_b/n| is scaled by ns*n so every term
    is the integer |c_b*n - a_b*ns|; the ppm division at the end is
    truncating on non-negative operands. The bucket grid is
    |sources| x 10 — drift math runs on the tiny histogram relation,
    never on documents (one pass builds the histogram; the grid fills
    missing buckets with zeros so absent mass still counts).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    bucket = F.least(
        F.floor(F.size(tokens("text")) / 50).cast("bigint"), F.lit(9)
    )
    per_source = docs.select("source", bucket.alias("bucket")).groupBy(
        "source", "bucket"
    ).agg(F.count("*").alias("c"))
    src_tot = per_source.groupBy("source").agg(F.sum("c").alias("ns"))
    corpus = per_source.groupBy("bucket").agg(F.sum("c").alias("a"))
    n_all = per_source.agg(F.sum("c").alias("n"))
    grid = (
        src_tot.crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(n_all))
        .join(per_source, ["source", "bucket"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
    )
    return (
        grid.groupBy("source")
        .agg(
            F.first("ns").alias("n_docs"),
            F.sum(F.abs(F.col("c") * F.col("n") - F.col("a") * F.col("ns")))
            .cast("bigint")
            .alias("tv_num"),
        )
        .join(F.broadcast(src_tot), "source")
        .join(F.broadcast(n_all.withColumnRenamed("n", "n2")))
        .select(
            "source",
            "n_docs",
            "tv_num",
            F.expr("(1000000 * tv_num) div (2 * ns * n2)").alias("tv_ppm"),
        )
        .orderBy("source")
    )


# --- Gopher-style quality-rule funnel -------------------------------
#
# The four rules are the fixture-scaled analogs of the Gopher / MassiveText
# repetition-and-signal heuristics (Rae et al. 2021, §A1.1): token-count
# band, mean-word-length band, distinct-token ratio floor, and a
# stopword-coverage floor. Thresholds are integers and every ratio test
# is cross-multiplied, so both engines decide each rule with exact
# integer comparisons (no float division anywhere).
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 90
GOPHER_MWL_LO = 4  # mean word length lower bound (inclusive)
GOPHER_MWL_HI = 5  # mean word length upper bound (inclusive)
GOPHER_DISTINCT_NUM = 7  # distinct ratio >= 7/20 = 0.35
GOPHER_DISTINCT_DEN = 20
GOPHER_STOPWORDS = ("a", "the", "value", "key", "data")
GOPHER_MIN_STOP_HITS = 2
# SQL IN-list derived from the tuple above so the engine exprs and every
# oracle share ONE source of truth (ADVICE r9: the list used to be a
# hardcoded literal in two oracles — editing GOPHER_STOPWORDS would have
# desynchronized them and only been caught at gate time).
GOPHER_STOPWORDS_SQL = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)


GOPHER_FUNNEL_ORACLE = f"""
    WITH s AS (
        SELECT len(toks) AS n,
               list_sum(list_transform(toks, x -> len(x))) AS sl,
               len(list_distinct(toks)) AS nd,
               len(list_distinct(list_filter(toks,
                   x -> x IN ({GOPHER_STOPWORDS_SQL})))) AS n_stop
        FROM (SELECT string_split_regex(trim(text), '\\s+') AS toks
              FROM documents)),
    p AS (
        SELECT n BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS} AS p1,
               {GOPHER_MWL_LO} * n <= sl AND sl <= {GOPHER_MWL_HI} * n AS p2,
               {GOPHER_DISTINCT_DEN} * nd >= {GOPHER_DISTINCT_NUM} * n AS p3,
               n_stop >= {GOPHER_MIN_STOP_HITS} AS p4
        FROM s),
    c AS (
        SELECT COUNT(*) AS c0,
               COUNT(*) FILTER (p1) AS c1,
               COUNT(*) FILTER (p1 AND p2) AS c2,
               COUNT(*) FILTER (p1 AND p2 AND p3) AS c3,
               COUNT(*) FILTER (p1 AND p2 AND p3 AND p4) AS c4
        FROM p)
    SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS stage, 'ingest' AS rule, c0 AS survivors,
               CAST(0 AS BIGINT) AS failed_here FROM c
        UNION ALL
        SELECT 1, 'token_count_band', c1, c0 - c1 FROM c
        UNION ALL
        SELECT 2, 'mean_word_length_band', c2, c1 - c2 FROM c
        UNION ALL
        SELECT 3, 'distinct_ratio_floor', c3, c2 - c3 FROM c
        UNION ALL
        SELECT 4, 'stopword_coverage', c4, c3 - c4 FROM c)
    ORDER BY stage
    """


@register(
    "gopher_quality_funnel",
    oracle=GOPHER_FUNNEL_ORACLE,
    description="G17 Gopher-style quality-filter funnel: token-count band, "
    "mean-word-length band, distinct-ratio floor, stopword coverage — "
    "cumulative survivor counts per stage, exact integer rule math",
)
def gopher_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential quality-filter funnel over the corpus, the shape every
    training-data pipeline publishes as its filtering report: each stage
    applies one heuristic rule on top of all previous ones and records
    survivors + documents dropped at that stage.

    Scale: one narrow pass computes the four per-document statistics
    inside whole-stage codegen (token array folds, no Python); a single
    map-side-combined aggregate reduces them to five counters; the
    funnel rows are unpivoted from that one-row relation. No shuffle
    touches document text. Every rule is an integer comparison
    (cross-multiplied ratios), so the funnel is bit-identical across
    engines and partition counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    return funnel_rows(gopher_counters(docs))


def gopher_counters(docs: DataFrame) -> DataFrame:
    """Single-row relation (c0..c4) of cumulative rule survivors —
    shared by the batch funnel and its live streaming twin (the rule
    projections and the counting agg are the SAME exprs, so the two
    paths cannot drift)."""
    toks = tokens("text")
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    s = docs.select(
        F.size(toks).cast("long").alias("n"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("sl"),
        F.size(F.array_distinct(toks)).cast("long").alias("nd"),
        # array_intersect already returns distinct elements
        F.size(F.array_intersect(toks, stop_arr)).cast("long").alias("n_stop"),
    )
    p1 = F.col("n").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
    p2 = (F.lit(GOPHER_MWL_LO) * F.col("n") <= F.col("sl")) & (
        F.col("sl") <= F.lit(GOPHER_MWL_HI) * F.col("n")
    )
    p3 = F.lit(GOPHER_DISTINCT_DEN) * F.col("nd") >= F.lit(
        GOPHER_DISTINCT_NUM
    ) * F.col("n")
    p4 = F.col("n_stop") >= GOPHER_MIN_STOP_HITS
    return s.agg(
        F.count("*").alias("c0"),
        F.count_if(p1).alias("c1"),
        F.count_if(p1 & p2).alias("c2"),
        F.count_if(p1 & p2 & p3).alias("c3"),
        F.count_if(p1 & p2 & p3 & p4).alias("c4"),
    )


def gopher_pass_flag() -> F.Column:
    """Per-document boolean: passes all four Gopher rules — the quality
    gate of the composed streaming curation pipeline
    (operators/streaming_live.py). Same expressions as gopher_counters'
    stage predicates, so the gate and the funnel cannot drift."""
    toks = tokens("text")
    n = F.size(toks).cast("long")
    sl = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    nd = F.size(F.array_distinct(toks)).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr)).cast("long")
    return (
        n.between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
        & (F.lit(GOPHER_MWL_LO) * n <= sl)
        & (sl <= F.lit(GOPHER_MWL_HI) * n)
        & (F.lit(GOPHER_DISTINCT_DEN) * nd >= F.lit(GOPHER_DISTINCT_NUM) * n)
        & (n_stop >= F.lit(GOPHER_MIN_STOP_HITS))
    )


def funnel_rows(counters: DataFrame) -> DataFrame:
    """Unpivot the (c0..c4) counter row into the 5-stage funnel."""
    return counters.selectExpr(
        "stack(5, "
        "0L, 'ingest', c0, 0L, "
        "1L, 'token_count_band', c1, c0 - c1, "
        "2L, 'mean_word_length_band', c2, c1 - c2, "
        "3L, 'distinct_ratio_floor', c3, c2 - c3, "
        "4L, 'stopword_coverage', c4, c3 - c4) "
        "AS (stage, rule, survivors, failed_here)"
    ).orderBy("stage")
