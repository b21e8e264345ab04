"""Text-analysis operators for training-data pipelines (SURVEY §2.3 G17).

All metrics are JVM column expressions over a single pass of the
documents table (no Python, no extra shuffle for the per-doc metrics;
one shuffle for each grouped rollup). Ratios are computed as
int/int double divisions — bit-deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import distinct_tokens, tokens
from ..plans.registry import EXTRA_PLAN_BUILDERS, RELEASE_HOOKS, register
from ..sources.catalog import load_table, spread

STOPWORDS = ("the", "a")


@register(
    "token_stats_by_lang",
    oracle="""
    WITH d AS (
        SELECT lang,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct
        FROM documents)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(n_tokens AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_tokens,
           CAST(SUM(n_distinct) AS BIGINT) AS total_distinct_tokens
    FROM d GROUP BY lang
    """,
    description="G17 token counting: whitespace tokenizer + per-language rollup",
)
def token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        F.size(distinct_tokens("text")).cast("bigint").alias("n_distinct"),
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("avg_tokens"),
        F.sum("n_distinct").alias("total_distinct_tokens"),
    )


@register(
    "word_frequency_top20",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
    description="G17/G9 global word frequency top-k (explode -> partial agg -> TakeOrdered)",
)
def word_frequency_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "language_id_heuristic",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                    t -> t IN {STOPWORDS})) AS DOUBLE)
               / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio
        FROM documents)
    SELECT CASE WHEN stopword_ratio >= 0.05 THEN 'en-like' ELSE 'other' END
               AS predicted_lang,
           lang AS labeled_lang,
           COUNT(*) AS n
    FROM scored GROUP BY 1, 2
    """,
    description="G17 n-gram/stopword language-ID heuristic vs labels (confusion counts)",
)
def language_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / F.size(toks)
    return (
        docs.select(
            F.when(ratio >= 0.05, "en-like").otherwise("other").alias("predicted_lang"),
            F.col("lang").alias("labeled_lang"),
        )
        .groupBy("predicted_lang", "labeled_lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "document_quality_scores",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                               t -> t IN {STOPWORDS})) AS n_stop,
               length(text) AS n_chars
        FROM documents)
    SELECT doc_id, n_tokens,
           ROUND(0.4 * LEAST(CAST(n_tokens AS DOUBLE) / 100, 1.0)
                 + 0.4 * (CAST(n_distinct AS DOUBLE) / n_tokens)
                 + 0.2 * LEAST(10 * CAST(n_stop AS DOUBLE) / n_tokens, 1.0), 6)
               AS quality_score
    FROM m
    """,
    description="G17 quality scoring: length, lexical diversity, stopword-ratio blend",
)
def document_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tokens = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    score = F.round(
        0.4 * F.least(n_tokens / 100, F.lit(1.0))
        + 0.4 * (n_distinct / n_tokens)
        + 0.2 * F.least(10 * n_stop / n_tokens, F.lit(1.0)),
        6,
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        score.alias("quality_score"),
    )


@register(
    "document_fingerprints",
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(
               string_split_regex(trim(text), '\\s+'))), ' ')) AS fingerprint,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY 1
    """,
    description="G17 content-defined fingerprint: md5 over sorted distinct token set",
)
def document_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.encode(F.concat_ws(" ", F.array_sort(distinct_tokens("text"))), "UTF-8")
    )
    return docs.groupBy(fp.alias("fingerprint")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc_id")
    )


@register(
    "bpe_ish_token_count",
    oracle="""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')
                   )) AS BIGINT) AS total_subtokens,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS total_ws_tokens
    FROM documents GROUP BY lang
    """,
    description="G17 token counting: whitespace + BPE-ish regex subword segmentation",
)
def bpe_ish_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two tokenizers side by side: plain whitespace and a BPE-flavored
    regex (letter runs / digit runs / single symbols) — the cheap proxy
    for subword token counts used when budgeting LLM training data."""
    docs = load_table(spark, sf_dir, "documents")
    sub = F.regexp_extract_all(F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return docs.groupBy("lang").agg(
        F.sum(F.size(sub).cast("bigint")).alias("total_subtokens"),
        F.sum(F.size(tokens("text")).cast("bigint")).alias("total_ws_tokens"),
    )


@register(
    "rolling_hash_fingerprints",
    oracle="""
    SELECT list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS rhash,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY 1
    """,
    description="G17 rolling-hash (polynomial mod p) content fingerprint, engine-portable",
)
def rolling_hash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash over the character stream, acc = (acc*31
    + code) mod 1e9+7 — exact integer math, so the fingerprint is
    reproducible across engines and partitionings (unlike xxhash64,
    which is Spark-specific)."""
    docs = load_table(spark, sf_dir, "documents")
    chars = F.split(F.col("text"), "")
    rhash = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(1000000007).cast("long"),
    )
    return docs.groupBy(rhash.alias("rhash")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc_id")
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term,
           ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY doc_id
        ORDER BY ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) DESC, term) <= 3
    """,
    description="G17 TF-IDF: corpus document frequencies -> top-3 distinguishing terms per doc",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF entirely as relational ops: one explode, two aggregations
    (term frequency per doc, document frequency per term — both
    map-side-combined), a broadcast of the tiny df/N relations back onto
    tf, and a ranked window. The df table is vocabulary-sized, so at
    100 TB the only big shuffles are the two aggregations."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    tfidf = F.round(
        F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", tfidf.alias("tfidf"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "curation_pipeline_stats",
    oracle=f"""
    WITH dedup AS (
        SELECT source, lang, text,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct,
               ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                  ORDER BY doc_id) AS copy_rank
        FROM documents),
    kept AS (
        SELECT source, n_tokens FROM dedup
        WHERE copy_rank = 1
          AND lang IN ('en', 'es', 'de')
          AND n_tokens >= 40
          AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.3)
    SELECT source,
           COUNT(*) AS n_kept_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS token_budget
    FROM kept GROUP BY source
    """,
    description="G17 end-to-end curation: dedup -> lang filter -> length/diversity gate -> token budget",
)
def curation_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline in one plan: exact dedup
    (keep first copy), language allowlist, minimum length, lexical
    diversity gate, then the per-source token budget — the operators a
    100 TB curation job chains, and Catalyst fuses into two shuffles
    (dedup window + final rollup)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    w = W.partitionBy(F.md5(F.encode(F.lower(F.trim(F.col("text"))), "UTF-8"))).orderBy(
        "doc_id"
    )
    staged = docs.select(
        "source",
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "diversity"
        ),
        F.row_number().over(w).alias("copy_rank"),
    )
    kept = staged.filter(
        (F.col("copy_rank") == 1)
        & F.col("lang").isin("en", "es", "de")
        & (F.col("n_tokens") >= 40)
        & (F.col("diversity") >= 0.3)
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept_docs"),
        F.sum("n_tokens").alias("token_budget"),
    )


@register(
    "ngram_profile",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks)
    SELECT bigram, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS df
    FROM grams GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 15
    """,
    description="G17 n-gram (bigram) frequency + document frequency profile",
)
def ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    bigrams = F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        )
    )
    return (
        spread(docs).select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(15)
    )


@register(
    "stratified_sample_documents",
    oracle="""
    WITH sampled AS (
        SELECT lang, source,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
        FROM documents)
    SELECT source, lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN h < (CASE WHEN lang = 'en' THEN '8' ELSE 'c' END)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN h < (CASE WHEN lang = 'en' THEN '8' ELSE 'c' END)
                         THEN n_tokens END) AS BIGINT) AS kept_token_budget
    FROM sampled
    GROUP BY source, lang
    """,
    description="G17 deterministic stratified sampling: md5-of-key hash gate with a "
    "per-stratum rate (50% en / 75% other) — reproducible across engines, cluster "
    "sizes, and reruns, unlike rand()-based sampling",
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix downsampling. The keep decision hashes the stable
    document key (never the text — re-crawled near-identical docs must
    not flip in and out of the mix), compares one hex digit against a
    per-stratum threshold, and is embarrassingly parallel: no shuffle
    until the reporting rollup."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), 1, 1)
    rate = F.when(F.col("lang") == "en", F.lit("8")).otherwise(F.lit("c"))
    d = docs.select(
        "source",
        "lang",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        (h < rate).alias("keep"),
    )
    return d.groupBy("source", "lang").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens"))).alias("kept_token_budget"),
    )


@register(
    "text_normalization_digest",
    oracle="""
    WITH norm AS (
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g')) AS norm_text
        FROM documents)
    SELECT doc_id, md5(norm_text) AS norm_hash,
           CAST(length(norm_text) AS BIGINT) AS norm_len
    FROM norm
    """,
    description="G17 text normalization: lowercase -> strip non-alphanumerics -> "
    "collapse whitespace; per-doc digest proves byte-identical output across engines",
)
def text_normalization_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonicalization pass that feeds exact dedup: normalization
    must be bit-stable or the downstream hash-groupBy keys drift. All
    JVM regexp expressions, one scan, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return docs.select(
        "doc_id",
        F.md5(F.encode(norm, "UTF-8")).alias("norm_hash"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )


@register(
    "pii_redaction_stats",
    oracle="""
    WITH synth AS (
        SELECT doc_id, source,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-' || CAST(doc_id AS VARCHAR) AS t
        FROM documents),
    red AS (
        SELECT doc_id, source,
               len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.]+')) AS n_emails,
               len(regexp_extract_all(t, '\\+1-555-[0-9]+')) AS n_phones,
               regexp_replace(
                   regexp_replace(t, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                   '\\+1-555-[0-9]+', '<PHONE>', 'g') AS redacted
        FROM synth)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS total_emails,
           CAST(SUM(n_phones) AS BIGINT) AS total_phones,
           CAST(SUM(length(redacted)) AS BIGINT) AS redacted_chars
    FROM red
    GROUP BY source
    """,
    description="G17 PII redaction: regex email/phone masking + per-source counts "
    "(PII is synthesized onto the fixture text so the redactor provably fires)",
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training scrub pass. Counts use regexp_count (JVM) so the
    audit and the rewrite share one scan; the synthetic PII suffix keyed
    by doc_id makes the redaction observable on fixture text that
    otherwise contains none."""
    docs = load_table(spark, sf_dir, "documents")
    email_pat = r"[a-z0-9._]+@[a-z0-9.]+"
    phone_pat = r"\+1-555-[0-9]+"
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.col("doc_id").cast("string"),
    )
    d = docs.select(
        "source",
        F.regexp_count(synth, F.lit(email_pat)).cast("bigint").alias("n_emails"),
        F.regexp_count(synth, F.lit(phone_pat)).cast("bigint").alias("n_phones"),
        F.length(
            F.regexp_replace(
                F.regexp_replace(synth, email_pat, "<EMAIL>"),
                phone_pat,
                "<PHONE>",
            )
        )
        .cast("bigint")
        .alias("redacted_len"),
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_phones").alias("total_phones"),
        F.sum("redacted_len").alias("redacted_chars"),
    )


TOP_TOKEN_MAX_SHARE = 0.2
DUP_TRIGRAM_MAX_FRAC = 0.3


@register(
    "repetition_filter_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents),
    eligible AS (SELECT * FROM base WHERE len(t) >= 3),
    tri AS (
        SELECT doc_id,
               CAST(len(sh) AS BIGINT) AS n_tri,
               CAST(len(list_distinct(sh)) AS BIGINT) AS n_tri_d
        FROM (SELECT doc_id,
                     list_transform(generate_series(1, len(t) - 2),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS sh
              FROM eligible)),
    cnt AS (
        SELECT doc_id, tk, COUNT(*) AS n
        FROM (SELECT doc_id, unnest(t) AS tk FROM eligible)
        GROUP BY doc_id, tk),
    per AS (
        SELECT doc_id,
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               CAST(MAX(n) AS BIGINT) AS max_tok
        FROM cnt GROUP BY doc_id)
    SELECT p.doc_id,
           p.n_tokens,
           CAST(max_tok AS DOUBLE) / p.n_tokens AS top_token_share,
           CAST(n_tri - n_tri_d AS DOUBLE) / n_tri AS dup_trigram_frac,
           (CAST(max_tok AS DOUBLE) / p.n_tokens <= {TOP_TOKEN_MAX_SHARE}
            AND CAST(n_tri - n_tri_d AS DOUBLE) / n_tri <= {DUP_TRIGRAM_MAX_FRAC})
               AS keep
    FROM per p JOIN tri USING (doc_id)
    """,
    description="G17 repetition-based quality filter (Gopher-style): top-token "
    "share + duplicate-trigram fraction per doc, with a keep/drop verdict",
)
def repetition_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition heuristics from the Gopher/MassiveText filtering rules
    (Rae et al. 2021, §A1.1): a doc whose most frequent token dominates,
    or whose trigrams are mostly repeats, is boilerplate/spam. Everything
    is per-row JVM array math: the top-token count is the longest run in
    the SORTED token array (one O(n log n) sort + O(n) fold per row), so
    the whole query is a single narrow scan — no explode, no
    (doc_id, token) shuffle, no join. At 100 TB that's the difference
    between one pass and two full-corpus shuffles. (A previous version
    exploded tokens into a groupBy — measured 9.0 s vs 2.6 s at sf0.1;
    and folding the trigram columns through that explode was ~50x worse
    again, since Catalyst collapses the projection into Generate and
    re-evaluates the O(n) transform per token row.) Ratios are int/int
    doubles — bit-deterministic vs the oracle. Docs with <3 tokens are
    excluded on both engines (shingle parity, see shingle_jaccard_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
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

    # Longest run of equal values in the sorted array == count of the
    # most frequent token. State: (prev token, current run, best run).
    def _run_step(acc, x):
        new_run = (
            F.when(acc.prev.isNull() | (acc.prev != x), F.lit(1).cast("bigint"))
            .otherwise(acc.run + F.lit(1).cast("bigint"))
        )
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc.best, new_run).alias("best"),
        )

    max_tok = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("best"),
        ),
        _run_step,
        lambda acc: acc.best,
    )

    # The per-row trigram/sort work is compute-bound; spread it across
    # the cluster regardless of the scan's split count (the fixture is a
    # single parquet row-group = one task; production layouts have
    # thousands of splits and AQE cannot add parallelism to a narrow
    # chain). One round-robin exchange of the raw text, then every
    # downstream op is per-row.
    eligible = spread(docs.filter(F.size(toks) >= 3))
    per = eligible.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        max_tok.alias("max_tok"),
        F.size(sh3).cast("bigint").alias("n_tri"),
        F.size(F.array_distinct(sh3)).cast("bigint").alias("n_tri_d"),
    )
    top_share = F.col("max_tok").cast("double") / F.col("n_tokens")
    dup_frac = (F.col("n_tri") - F.col("n_tri_d")).cast("double") / F.col("n_tri")
    return per.select(
        "doc_id",
        "n_tokens",
        top_share.alias("top_token_share"),
        dup_frac.alias("dup_trigram_frac"),
        (
            (top_share <= TOP_TOKEN_MAX_SHARE) & (dup_frac <= DUP_TRIGRAM_MAX_FRAC)
        ).alias("keep"),
    )


@register(
    "char_entropy_quality",
    oracle="""
    WITH ch AS (
        SELECT doc_id, lang, unnest(string_split(text, '')) AS c
        FROM documents WHERE length(text) > 0),
    cnt AS (
        SELECT doc_id, lang, c, COUNT(*) AS k
        FROM ch GROUP BY doc_id, lang, c),
    ent AS (
        SELECT doc_id, lang,
               ROUND(log2(SUM(k)) - SUM(k * log2(k)) / SUM(k), 6) AS h
        FROM cnt GROUP BY doc_id, lang)
    SELECT lang,
           COUNT(*) AS n_docs,
           MIN(h) AS min_entropy,
           MAX(h) AS max_entropy,
           CAST(SUM(CAST(h AS DECIMAL(18,6))) AS DOUBLE) AS sum_entropy
    FROM ent GROUP BY lang
    """,
    description="G17 quality: per-doc character-level Shannon entropy "
    "(low-entropy docs are repeated boilerplate/binary junk), language "
    "rollup with exact decimal sums",
)
def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy over the character distribution of each doc —
    the cheap perplexity proxy: machine-generated repetition and
    binary-ish junk score low, natural text sits near the language's
    typical ~4 bits/char. H = log2(n) - sum(k*log2 k)/n from per-doc
    character counts (one explode + two map-side-combined aggregates,
    both keyed by doc — never a corpus-wide shuffle of characters).
    Entropies are rounded to 6 before aggregation so libm last-ulp
    differences between engines cannot surface; the rollup uses
    min/max/exact-decimal-sum per the repo's determinism rules."""
    docs = load_table(spark, sf_dir, "documents")
    ch = (
        spread(docs.filter(F.length("text") > 0))
        .select("doc_id", "lang", F.explode(F.split("text", "")).alias("c"))
    )
    cnt = ch.groupBy("doc_id", "lang", "c").agg(F.count("*").alias("k"))
    ent = cnt.groupBy("doc_id", "lang").agg(
        F.round(
            F.log2(F.sum("k"))
            - F.sum(F.col("k") * F.log2("k")) / F.sum("k"),
            6,
        ).alias("h")
    )
    return ent.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.min("h").alias("min_entropy"),
        F.max("h").alias("max_entropy"),
        F.sum(F.col("h").cast("decimal(18,6)")).cast("double").alias("sum_entropy"),
    )


@register(
    "sentence_length_stats",
    oracle="""
    WITH s AS (
        SELECT doc_id, lang,
               len(list_filter(string_split_regex(text, '[.!?]+'),
                               x -> trim(x) <> '')) AS n_sentences,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents WHERE length(trim(text)) > 0)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_sentences) AS BIGINT) AS total_sentences,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(n_sentences) AS BIGINT) AS max_sentences
    FROM s GROUP BY lang
    """,
    description="G17 sentence segmentation (regex [.!?]+ on both engines): "
    "sentences and tokens per doc, per-language rollup",
)
def sentence_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-level shape statistics — the unit for packing windows
    and readability heuristics. Segmentation is the same regex on both
    engines (never a locale-dependent BreakIterator, which would
    diverge); empty fragments from trailing punctuation are dropped on
    both sides."""
    docs = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.split("text", r"[.!?]+"), lambda x: F.trim(x) != ""
    )
    s = docs.filter(F.length(F.trim("text")) > 0).select(
        "lang",
        F.size(sents).cast("bigint").alias("n_sentences"),
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
    )
    return s.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_sentences").alias("total_sentences"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max("n_sentences").alias("max_sentences"),
    )


@register(
    "collocation_pmi_top20",
    oracle="""
    WITH d AS (
        SELECT string_split_regex(trim(text), '\\s+') AS toks FROM documents),
    uc AS (
        SELECT w, COUNT(*) AS c
        FROM (SELECT unnest(toks) AS w FROM d) GROUP BY w),
    bc AS (
        SELECT bg, COUNT(*) AS c
        FROM (SELECT unnest(list_transform(
                 list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                 s -> s[1] || ' ' || s[2])) AS bg
              FROM d)
        WHERE bg IS NOT NULL
        GROUP BY bg),
    tot AS (SELECT CAST(SUM(len(toks)) AS BIGINT) AS n,
                   CAST(SUM(len(toks) - 1) AS BIGINT) AS m
            FROM d)
    SELECT b.bg AS bigram, CAST(b.c AS BIGINT) AS n_pair,
           CAST(((b.c * 1000000) // m) * 1000000000000
                // (((u1.c * 1000000000) // n)
                    * ((u2.c * 1000000000) // n)) AS BIGINT) AS pmi_micro
    FROM bc b
    JOIN uc u1 ON u1.w = split_part(b.bg, ' ', 1)
    JOIN uc u2 ON u2.w = split_part(b.bg, ' ', 2)
    CROSS JOIN tot
    WHERE b.c >= 5
    ORDER BY pmi_micro DESC, bigram
    LIMIT 20
    """,
    description="top-20 bigram collocations by fixed-point PMI — the "
    "likelihood ratio p(xy)/(p(x)p(y)) staged in exact integer "
    "micro/nano units (identical truncating stages on both engines), "
    "so the ranking needs no float log and no engine ever disagrees",
)
def collocation_pmi_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining for corpus analysis: rank bigrams by
    p(xy)/(p(x)p(y)) — monotone in PMI, so no log is needed. The score
    is DEFINED as the staged fixed-point computation
    ((c_xy*1e6) div M) * 1e12 div (((c_x*1e9) div N) * ((c_y*1e9) div N))
    with every stage in int64 (max operand ~1e18 at sf0.1; at a corpus
    where N approaches 1e9 tokens, promote the stages to DECIMAL(38,0)
    — same arithmetic, wider lanes). One explode+agg for unigrams, one
    for bigrams (JVM transform over the token array, no Python), two
    vocab-sized equi-joins AQE can broadcast, and a broadcast of the
    single totals row."""
    docs = load_table(spark, sf_dir, "documents")
    d = spread(docs).select(tokens("text").alias("toks"))
    uc = (
        d.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    bg0 = d.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks)-1),"
                " (t, i) -> struct(t AS w1, element_at(toks, i+2) AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bc = bg0.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    # Totals come from doc lengths in one tiny agg — N = sum(len),
    # M = sum(len-1) — instead of re-executing the vocab pipelines.
    totals = d.agg(
        F.sum(F.size("toks")).alias("n"),
        F.sum(F.size("toks") - 1).alias("m"),
    )
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bc.filter(F.col("c") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
    )
    return scored.select(
        F.concat_ws(" ", "w1", "w2").alias("bigram"),
        F.col("c").cast("bigint").alias("n_pair"),
        F.expr(
            "((c * 1000000) div m) * 1000000000000"
            " div (((c1 * 1000000000) div n) * ((c2 * 1000000000) div n))"
        )
        .cast("bigint")
        .alias("pmi_micro"),
    ).orderBy(F.desc("pmi_micro"), "bigram").limit(20)


@register(
    "sparse_retrieval_top5",
    oracle="""
    WITH tf AS (
        SELECT doc_id, w AS token, COUNT(*) AS tf
        FROM (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\\s+')) AS w
              FROM documents)
        GROUP BY doc_id, w),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    qid AS (SELECT MIN(doc_id) AS query_doc FROM documents),
    qvec AS (SELECT t.token, t.tf AS qtf FROM tf t, qid WHERE t.doc_id = qid.query_doc)
    SELECT t.doc_id,
           CAST(SUM(t.tf * q.qtf * ((nd.n_docs * 1000) // df.df)) AS BIGINT)
               AS score_milli
    FROM tf t
    JOIN qvec q ON q.token = t.token
    JOIN df ON df.token = t.token
    CROSS JOIN nd, qid
    WHERE t.doc_id <> qid.query_doc
    GROUP BY t.doc_id
    ORDER BY score_milli DESC, t.doc_id
    LIMIT 5
    """,
    description="sparse lexical retrieval: top-5 docs for a query doc "
    "by rarity-weighted token overlap (tf_q * tf_d * N*1000 div df) — "
    "the TF-IDF-shaped score in exact staged integers, inverted-index "
    "join on token, no float log",
)
def sparse_retrieval_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document retrieval over the inverted index: the query doc's
    term vector (bounded — one doc's tokens) broadcasts into a join
    against the (doc, token, tf) posting relation, so the only
    full-corpus work is one explode+agg and one equi-join keyed by
    token — the shape of every sparse retrieval engine. The rarity
    weight (N*1000 div df) is monotone in IDF without the float log,
    keeping the whole score in exact integer milli-units with a total
    (score, doc_id) tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        spread(docs)
        .select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    nd = docs.agg(F.count("*").alias("n_docs"))
    qid = docs.agg(F.min("doc_id").alias("query_doc"))
    qvec = (
        tf.crossJoin(F.broadcast(qid))
        .filter(F.col("doc_id") == F.col("query_doc"))
        .select(F.col("token"), F.col("tf").alias("qtf"))
    )
    return (
        tf.join(F.broadcast(qvec), "token")
        .join(dfreq, "token")
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(qid))
        .filter(F.col("doc_id") != F.col("query_doc"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf")
                * F.col("qtf")
                * F.expr("(n_docs * 1000) div df")
            )
            .cast("bigint")
            .alias("score_milli")
        )
        .orderBy(F.desc("score_milli"), "doc_id")
        .limit(5)
    )


@register(
    "digit_span_census",
    oracle="""
    WITH d AS (
        SELECT source,
               len(regexp_extract_all(text, '[0-9]+')) AS n_spans,
               len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
        FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_spans) AS BIGINT) AS total_digit_spans,
           CAST(SUM(n_digits) AS BIGINT) AS total_digits,
           CAST(MAX(n_spans) AS BIGINT) AS max_spans_per_doc
    FROM d
    GROUP BY source
    ORDER BY source
    """,
    description="regex extraction census: digit-run spans and digit "
    "totals per document, aggregated by source — the PII/number-"
    "density prefilter, using only character-class regexes whose "
    "semantics are identical across engines",
)
def digit_span_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface under the exact gate: counts of `[0-9]+` runs
    (regexp_extract_all) and total digit characters (regexp_replace
    strip) — deliberately restricted to character classes, the regex
    subset Java and RE2-style engines agree on byte-for-byte (no
    lookaround, no word boundaries, no Unicode classes — those DO
    diverge across engines and belong behind engine-pinned tests,
    not a cross-engine oracle). Pure narrow map + one aggregate;
    regex work distributes with the scan."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        F.size(F.expr("regexp_extract_all(text, '[0-9]+')")).alias("n_spans"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).alias("n_digits"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_spans").cast("bigint").alias("total_digit_spans"),
            F.sum("n_digits").cast("bigint").alias("total_digits"),
            F.max("n_spans").cast("bigint").alias("max_spans_per_doc"),
        )
        .orderBy("source")
    )


@register(
    "zipf_conformity_top_terms",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents),
    freq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS f
        FROM tok GROUP BY 1),
    ranked AS (
        SELECT term, f,
               ROW_NUMBER() OVER (ORDER BY f DESC, term) AS rnk
        FROM freq)
    SELECT CAST(rnk AS BIGINT) AS rnk, term, f,
           CAST(rnk * f AS BIGINT) AS rank_freq_product
    FROM ranked
    WHERE rnk <= 20
    ORDER BY rnk
    """,
    description="G17 Zipf conformity readout: for the top-20 corpus "
    "terms, rank x frequency — under Zipf's law the product is roughly "
    "constant, and deviations (without ever taking a log) expose "
    "template-skewed or synthetic vocabularies; exact integers so the "
    "readout is bit-stable",
)
def zipf_conformity_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank*freq for the head of the term distribution.

    The log-log Zipf slope needs floats; the head-constancy form
    rank*f ~ C needs none — it is the k=1 slope check evaluated in
    integers. One token aggregate (|vocab| rows), then orderBy+limit —
    a TakeOrderedAndProject, partial top-20 per partition merged on the
    driver — and row_number only over the 20-row slice. The earlier
    form ranked the FULL |vocab| frequency relation in one partition
    (row_number needs a global order), which is billions of rows at
    100 TB; this is the same rank-on-the-slice shape
    word_frequency_top20 and hybrid_rrf_retrieval use.
    """
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(F.explode(tokens("text")).alias("term"))
    freq = tok.groupBy("term").agg(F.count("*").alias("f"))
    top = freq.orderBy(F.desc("f"), "term").limit(20)
    w = Window.orderBy(F.desc("f"), "term")  # over the 20-row slice only
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .select(
            "rnk",
            "term",
            "f",
            (F.col("rnk") * F.col("f")).cast("bigint").alias(
                "rank_freq_product"
            ),
        )
        .orderBy("rnk")
    )


@register(
    "syllable_complexity_profile",
    oracle="""
    WITH per_doc AS (
        SELECT lang,
               len(regexp_extract_all(text, '[aeiouy]+')) AS syllables,
               len(string_split_regex(trim(text), '\\s+')) AS words,
               len(list_filter(
                   string_split_regex(trim(text), '\\s+'),
                   w -> len(regexp_extract_all(w, '[aeiouy]+')) >= 3))
                   AS poly_words
        FROM documents
        WHERE trim(text) <> ''),
    agg AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(syllables) AS BIGINT) AS total_syllables,
               CAST(SUM(words) AS BIGINT) AS total_words,
               CAST(SUM(poly_words) AS BIGINT) AS total_poly
        FROM per_doc GROUP BY lang)
    SELECT lang, n_docs, total_syllables, total_words, total_poly,
           CAST(total_syllables * 1000 // total_words AS BIGINT)
               AS syll_per_word_milli,
           CAST(total_poly * 1000000 // total_words AS BIGINT)
               AS poly_ppm
    FROM agg
    ORDER BY lang
    """,
    description="G17 readability-style complexity profile: syllables "
    "approximated as vowel-group runs (the standard heuristic), "
    "polysyllabic words (>=3 vowel groups, the SMOG ingredient), per "
    "language — fixed-point milli/ppm ratios so the profile is exact "
    "cross-engine",
)
def syllable_complexity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vowel-group syllable counting, aggregated per language.

    Whole-text vowel-group counting equals the per-word sum (the
    `\\s` word separators break vowel runs), so the syllable total is
    one regexp_extract_all per document — no explode. Only the
    polysyllable count needs the per-word lambda, still inside JVM
    higher-order functions; the doc-level relation then collapses to a
    |langs|-row hash agg. At 100 TB this is a single scan with
    map-side combine and zero shuffles beyond the final tiny agg.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.filter(F.trim("text") != "").select(
        "lang",
        F.size(F.expr("regexp_extract_all(text, '[aeiouy]+', 0)")).alias(
            "syllables"
        ),
        F.size(tokens(F.col("text"))).alias("words"),
        F.size(
            F.filter(
                tokens(F.col("text")),
                lambda w: F.size(
                    F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))
                )
                >= 3,
            )
        ).alias("poly_words"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("syllables").cast("bigint").alias("total_syllables"),
        F.sum("words").cast("bigint").alias("total_words"),
        F.sum("poly_words").cast("bigint").alias("total_poly"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_syllables",
        "total_words",
        "total_poly",
        F.expr("CAST(total_syllables * 1000 DIV total_words AS BIGINT)").alias(
            "syll_per_word_milli"
        ),
        F.expr("CAST(total_poly * 1000000 DIV total_words AS BIGINT)").alias(
            "poly_ppm"
        ),
    ).orderBy("lang")


@register(
    "positional_weighted_token_profile",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS l
        FROM documents WHERE trim(text) <> ''),
    scored AS (
        SELECT doc_id, source,
               CAST(SUM(g.i * len(l[g.i])) AS BIGINT) AS score
        FROM toks, generate_series(1, 16) g(i)
        WHERE g.i <= len(l)
        GROUP BY doc_id, source)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(score) AS BIGINT) AS total_score,
           CAST(MAX(score) AS BIGINT) AS max_score
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
    description="G11 index-aware array lambda: transform(arr, (x, i) -> "
    "...) weighting each of the first 16 tokens by its 1-based position "
    "x its length, folded per document then aggregated per source — the "
    "positional-feature shape (DuckDB has no lambda index; the oracle "
    "expands a bounded generate_series instead)",
)
def positional_weighted_token_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted token scoring via the 2-arg lambda.

    The index-aware `transform` + `aggregate` fold runs entirely in
    codegen'd JVM expressions — one projection, no explode, bounded at
    16 terms per document regardless of length, then a |sources|-row
    hash agg.
    """
    docs = load_table(spark, sf_dir, "documents")
    score = F.aggregate(
        F.transform(
            F.slice(tokens(F.col("text")), 1, 16),
            lambda x, i: (i + F.lit(1)) * F.length(x),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = docs.filter(F.trim("text") != "").select(
        "source", score.alias("score")
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("score").cast("bigint").alias("total_score"),
            F.max("score").cast("bigint").alias("max_score"),
        )
        .orderBy("source")
    )


@register(
    "regexp_function_family_census",
    oracle="""
    WITH x AS (
        SELECT lang,
               len(regexp_extract_all(text, 'spark')) AS n_spark,
               NULLIF(regexp_extract(text, 's[a-z]+'), '') AS first_s_word,
               strpos(text, 'spark') AS pos_spark
        FROM documents)
    SELECT lang,
           CAST(SUM(n_spark) AS BIGINT) AS total_spark_mentions,
           CAST(COUNT(first_s_word) AS BIGINT) AS docs_with_s_word,
           CAST(COUNT(DISTINCT first_s_word) AS BIGINT) AS distinct_s_words,
           CAST(SUM(pos_spark) AS BIGINT) AS sum_first_positions
    FROM x
    GROUP BY lang
    ORDER BY lang
    """,
    description="G11 Spark 4 regexp function family: regexp_count, "
    "regexp_substr (NULL on miss — DuckDB regexp_extract returns '' "
    "and is NULLIF'd to align), regexp_instr first-match position "
    "(literal pattern, so strpos is the exact oracle twin), rolled up "
    "per language",
)
def regexp_function_family_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_count / regexp_substr / regexp_instr, pinned.

    All three run as JVM regex expressions in one projection pass. The
    miss conventions are the pin: Spark regexp_substr yields NULL,
    regexp_instr yields 0 — the oracle mirrors both exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        "lang",
        F.regexp_count("text", F.lit("spark")).alias("n_spark"),
        F.regexp_substr("text", F.lit("s[a-z]+")).alias("first_s_word"),
        F.regexp_instr("text", F.lit("spark")).alias("pos_spark"),
    )
    return (
        x.groupBy("lang")
        .agg(
            F.sum("n_spark").cast("bigint").alias("total_spark_mentions"),
            F.count("first_s_word").alias("docs_with_s_word"),
            F.countDistinct("first_s_word").alias("distinct_s_words"),
            F.sum("pos_spark").cast("bigint").alias("sum_first_positions"),
        )
        .orderBy("lang")
    )


@register(
    "crypto_hash_census",
    oracle="""
    WITH h AS (
        SELECT source, sha256(text) AS d
        FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT d) AS BIGINT) AS n_distinct_digests,
           CAST(COUNT(DISTINCT substr(d, 1, 2)) AS BIGINT)
               AS n_prefix_buckets,
           MIN(d) AS min_digest
    FROM h
    GROUP BY source
    ORDER BY source
    """,
    description="G11/G17 cryptographic hash census: SHA-256 digests per "
    "source — distinct-digest count (content-addressable dedup proxy), "
    "1-byte-prefix bucket diversity (the shard-balance check for "
    "hash-partitioned storage), lexicographic min digest; Spark "
    "sha2(x, 256) and DuckDB sha256 emit identical lowercase hex",
)
def crypto_hash_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable hashing over the corpus.

    SHA-256 per document is one JVM expression pass; the census
    aggregates are tiny. The prefix-bucket count directly audits how
    evenly a digest-prefix sharding scheme would spread this corpus —
    the question a content-addressable store asks before picking a
    fan-out.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select("source", F.sha2(F.col("text"), 256).alias("d"))
    return (
        h.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("d").alias("n_distinct_digests"),
            F.countDistinct(F.substring("d", 1, 2)).alias("n_prefix_buckets"),
            F.min("d").alias("min_digest"),
        )
        .orderBy("source")
    )


BM25_QUERY_TERMS = ("spark", "vector", "merge")

# Explicit IN-list (a Python tuple repr would emit a trailing comma —
# invalid SQL — if the vocabulary were ever trimmed to one term).
_BM25_TERMS_IN = "(" + ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS) + ")"

# Shared oracle CTE block: the exact-integer BM25 score relation
# `bm25(doc_id, bm25_ppm)` (see bm25_retrieval_topk for the math).
_BM25_SCORES_SQL = f"""
    tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents),
    dl AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS HUGEINT) AS dl
        FROM documents),
    stats AS (
        SELECT CAST(SUM(dl) AS HUGEINT) AS s_tokens,
               CAST(COUNT(*) AS HUGEINT) AS n_docs
        FROM dl),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS HUGEINT) AS tf
        FROM tok WHERE term IN {_BM25_TERMS_IN}
        GROUP BY doc_id, term),
    df AS (SELECT term, CAST(COUNT(*) AS HUGEINT) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               (1000000::HUGEINT * (2*n_docs - 2*df + 1) * 22 * s_tokens * tf)
               // ((2*df + 1) * (10*s_tokens*tf + 3*s_tokens + 9*dl.dl*n_docs))
                   AS term_ppm
        FROM tf JOIN df USING (term)
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN stats),
    bm25 AS (
        SELECT doc_id, CAST(SUM(term_ppm) AS BIGINT) AS bm25_ppm
        FROM scored GROUP BY doc_id)
"""


@register(
    "bm25_retrieval_topk",
    oracle="WITH "
    + _BM25_SCORES_SQL
    + """
    SELECT doc_id, bm25_ppm FROM bm25
    ORDER BY bm25_ppm DESC, doc_id
    LIMIT 20
    """,
    description="G17 retrieval ranking: exact log-free BM25 "
    "(rational idf (N-df+0.5)/(df+0.5), k1=1.2, b=0.75) over an "
    "inverted-index tf relation; per-term score floored to ppm in "
    "DECIMAL(38,0)/HUGEINT so both engines agree bit-for-bit",
)
def bm25_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed query, exact across engines.

    The classic BM25 idf term ln((N-df+0.5)/(df+0.5)) is replaced by its
    log-free rational argument — rank-equivalent per term and exactly
    representable, so the whole score stays in integer arithmetic:

        score      = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        avgdl      = S/N   (S = total corpus tokens, N = docs)
        with k1 = 6/5, b = 3/4 the term score reduces to the integer form
        score_ppm  = floor(1e6 * (2N-2df+1) * 22*S*tf
                           / ((2df+1) * (10*S*tf + 3*S + 9*dl*N)))

    computed in DECIMAL(38,0) (HUGEINT on the oracle side); a document's
    score is the sum of its per-term floors — deterministic on both
    engines by construction. The floor division itself is Spark's
    integral `div` on DECIMAL(38,0) operands (exact BigDecimal
    divideToIntegralValue, no double anywhere), matching DuckDB's
    HUGEINT `//`; both truncate and all terms are non-negative, so
    truncation == floor. `div` is exact for any quotient < 2^63; here
    the quotient is bounded by 2.2e6 * (2N-2df+1)/(2df+1) <= ~4.4e6*N,
    i.e. safe to N ~ 2e12 documents — DECIMAL(38,0) capacity of the
    numerator (~4.4e7 * N * S * tf < 1e38) binds first, at roughly
    N*S*tf < 2.3e30 (a 100 TB corpus: N~2e9, S~2.5e13, tf<1e4 gives
    ~5e26 — three orders of headroom). A double-based guess-and-correct
    was replaced in round 7: its +/-1 correction silently under-corrects
    once the true quotient passes ~2^53/3, which BM25's unbounded
    rare-term quotient (~1.5e6*N) reaches near N~2e9.

    Scale shape: one explode, two map-side-combined aggregations (tf is
    pre-filtered to the query vocabulary BEFORE the shuffle, so the tf
    relation is candidate-posting-list sized, not corpus sized), a
    broadcast of the vocabulary-sized df and the 1-row corpus stats, one
    doc_id equi-join against the per-doc length relation, and a global
    top-k that compiles to TakeOrderedAndProject. That is the standard
    distributed inverted-index probe: at 100 TB the only full-corpus
    shuffles are the tf/dl aggregations.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        _bm25_scores(docs)
        .orderBy(F.col("bm25_ppm").desc(), "doc_id")
        .limit(20)
    )


def _bm25_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, bm25_ppm) for every document matching BM25_QUERY_TERMS —
    the shared scoring relation behind bm25_retrieval_topk and the RRF
    hybrid fusion (see bm25_retrieval_topk for the exact-integer math).
    """
    toks = tokens("text")
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .filter(F.col("term").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    dl = docs.select("doc_id", F.size(toks).cast("long").alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("s_tokens"), F.count("*").alias("n_docs")
    )
    d38 = "decimal(38,0)"
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "num",
            F.expr(
                f"CAST(1000000 AS {d38}) * CAST(2*n_docs - 2*df + 1 AS {d38})"
                f" * CAST(22 AS {d38}) * CAST(s_tokens AS {d38})"
                f" * CAST(tf AS {d38})"
            ),
        )
        .withColumn(
            "den",
            F.expr(
                f"CAST(2*df + 1 AS {d38})"
                f" * (CAST(10 AS {d38}) * CAST(s_tokens AS {d38}) * CAST(tf AS {d38})"
                f"    + CAST(3 AS {d38}) * CAST(s_tokens AS {d38})"
                f"    + CAST(9 AS {d38}) * CAST(dl AS {d38}) * CAST(n_docs AS {d38}))"
            ),
        )
        # Exact integral division: `div` on DECIMAL(38,0) operands is
        # BigDecimal divideToIntegralValue (no double estimate), result
        # BIGINT — exact for any quotient < 2^63 (see docstring for the
        # corpus-size bound at which DECIMAL(38,0) itself would bind).
        .withColumn("term_ppm", F.expr("num div den"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("term_ppm").cast("bigint").alias("bm25_ppm")
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_ARM_TOPN = 50  # candidates taken from each retrieval arm


@register(
    "hybrid_rrf_retrieval",
    oracle="WITH "
    + _BM25_SCORES_SQL
    + f"""
    , lexr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25_ppm DESC, doc_id) AS r
        FROM bm25),
    lex AS (
        SELECT doc_id, 1000000 // ({RRF_K} + r) AS contrib
        FROM lexr WHERE r <= {RRF_ARM_TOPN}),
    q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE vec_id = 0),
    semscore AS (
        SELECT vec_id AS doc_id,
               ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.e), 6)
                   AS cos
        FROM embeddings CROSS JOIN q),
    semr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS r
        FROM semscore),
    sem AS (
        SELECT doc_id, 1000000 // ({RRF_K} + r) AS contrib
        FROM semr WHERE r <= {RRF_ARM_TOPN})
    SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
           CAST(COALESCE(lex.contrib, 0) + COALESCE(sem.contrib, 0) AS BIGINT)
               AS rrf_ppm
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    ORDER BY rrf_ppm DESC, COALESCE(lex.doc_id, sem.doc_id)
    LIMIT 20
    """,
    description="G17 hybrid search: reciprocal-rank fusion (k=60) of the "
    "exact BM25 lexical arm and a cosine semantic arm (query = vec_id 0), "
    "top-50 candidates per arm, integer 1e6//(60+rank) contributions so "
    "the fused score is bit-exact on both engines",
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+semantic retrieval fused with RRF.

    Each arm produces its global top-50 via TakeOrderedAndProject (no
    corpus-wide single-partition window: ranks are assigned by a window
    over the already-limited 50-row slice, where the same total ordering
    (score DESC, doc_id) makes slice-local row numbers equal the global
    ones). Contributions are integer `1000000 div (60 + rank)` — the
    standard RRF formula scaled to ppm so both engines agree exactly.
    The fusion itself is a 50x50-row full outer join, negligible at any
    scale; the heavy lifting stays in the two arms, whose plans are the
    audited bm25_retrieval_topk and ann_topk_cosine shapes. Documents
    without an embedding row (sf0.1 has 5k docs, 2k vectors) can only
    receive lexical contributions — same rule on both engines.
    """
    from ..functions.vectors import cosine_pre, norm

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    w_lex = W.orderBy(F.col("bm25_ppm").desc(), "doc_id")
    lex = (
        _bm25_scores(docs)
        .orderBy(F.col("bm25_ppm").desc(), "doc_id")
        .limit(RRF_ARM_TOPN)
        .withColumn("r", F.row_number().over(w_lex))
        .select("doc_id", F.expr(f"1000000 div ({RRF_K} + r)").alias("lex_contrib"))
    )

    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), norm(F.col("embedding")).alias("q_norm")
    )
    # Boundary-sensitivity note (round-7 advice): RRF amplifies the
    # usual round(cos, 6) cross-engine tolerance — in plain ann top-k an
    # ulp flip near a 6-dp half-way point costs 1e-6 of score, but here
    # a rank flip at that boundary (or at the top-50 cutoff) changes a
    # whole integer 1e6//(60+r) contribution. The fixture's cosines sit
    # nowhere near a .5 boundary today (verified by the gate at 4 SFs);
    # if a future fixture change lands one on a boundary, switch this
    # arm to the BM25-style exact-integer floor (cosine_ppm via
    # DECIMAL div) instead of widening tolerance.
    cos = F.round(
        cosine_pre(F.col("embedding"), F.col("q_emb"), norm(F.col("embedding")), F.col("q_norm")),
        6,
    )
    w_sem = W.orderBy(F.col("cos").desc(), "doc_id")
    sem = (
        emb.crossJoin(F.broadcast(qvec))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cos"))
        .orderBy(F.col("cos").desc(), "doc_id")
        .limit(RRF_ARM_TOPN)
        .withColumn("r", F.row_number().over(w_sem))
        .select("doc_id", F.expr(f"1000000 div ({RRF_K} + r)").alias("sem_contrib"))
    )

    return (
        lex.join(sem, "doc_id", "full")
        .select(
            "doc_id",
            (F.coalesce("lex_contrib", F.lit(0)) + F.coalesce("sem_contrib", F.lit(0)))
            .cast("bigint")
            .alias("rrf_ppm"),
        )
        .orderBy(F.col("rrf_ppm").desc(), "doc_id")
        .limit(20)
    )


# --- Span novelty: per-source memorization-risk profile ---------------
SPAN_NOVELTY_N = 8  # tokens per span (matches dedup.exact_passage_spans)


@register(
    "span_novelty_by_source",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, source,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - {SPAN_NOVELTY_N - 1}),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                     || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
                     || ' ' || t[i+7]))) AS span
        FROM (SELECT doc_id, source,
                     string_split_regex(trim(text), '\\s+') AS t
              FROM documents)
        WHERE len(t) >= {SPAN_NOVELTY_N}),
    df AS (SELECT span, COUNT(*) AS n_docs FROM sh GROUP BY span),
    per_doc AS (
        SELECT sh.doc_id, ANY_VALUE(sh.source) AS source,
               COUNT(*) AS n_spans,
               COUNT(*) FILTER (df.n_docs >= 2) AS n_shared
        FROM sh JOIN df USING (span)
        GROUP BY sh.doc_id)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_spans) AS BIGINT) AS total_spans,
           CAST(SUM(n_shared) AS BIGINT) AS shared_spans,
           (1000000 * CAST(SUM(n_spans) - SUM(n_shared) AS BIGINT))
               // CAST(SUM(n_spans) AS BIGINT) AS novelty_ppm
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
    description="G17 span-novelty profile: fraction of each source's 8-token "
    "spans that appear in no other document — the memorization-risk / "
    "boilerplate screen, exact integer ppm",
)
def span_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each source is corpus-unique at the passage level —
    the aggregate readout of the Lee et al. 2022 memorization scan
    (exact_passage_spans lists the shared spans; this scores sources by
    how much of their text is NOT shared).

    Scale: one span explode (distinct-per-doc, md5-digested before any
    exchange), one map-side-combined groupBy(span) for document
    frequency, one co-partitioned join back (both sides hash-partitioned
    by the digest after the groupBy), then two shrinking aggregates
    (doc, then source). Everything is linear in total span count; no
    self-join, so a span shared by k docs costs k join rows, not k^2.
    The novelty ratio is integer ppm over non-negative sums —
    truncating division matches on both engines.

    Oracle asymmetry note (ADVICE r8): the engine counts document
    frequency over md5(span) while the oracle groups raw span strings —
    an md5 collision between distinct spans would make the engine
    overcount sharing relative to the oracle. Probability ~2^-128 per
    pair; digest-before-exchange is the repo convention (same asymmetry
    as exact_passage_spans), accepted deliberately.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    from ..functions.text import shingles

    # localCheckpoint: sh feeds both the document-frequency groupBy and
    # the join probe side; without materialization the shingle explode
    # (the dominant cost — verdict r8 measured 8.05 s at sf1) runs twice
    # unless exchange reuse happens to fire. Bounded width: one
    # (doc_id, source, 32-char digest) row per distinct span occurrence.
    sh = (
        spread(docs.filter(F.size(toks) >= SPAN_NOVELTY_N))
        .select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(shingles("text", SPAN_NOVELTY_N))).alias(
                "span"
            ),
        )
        .select(
            "doc_id",
            "source",
            F.md5(F.encode(F.col("span"), "UTF-8")).alias("span_md5"),
        )
        .localCheckpoint(eager=True)
    )
    df_counts = sh.groupBy("span_md5").agg(F.count("*").alias("n_docs"))
    per_doc = (
        sh.join(df_counts, "span_md5")
        .groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            F.count("*").alias("n_spans"),
            F.count_if(F.col("n_docs") >= 2).alias("n_shared"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_spans").cast("bigint").alias("total_spans"),
            F.sum("n_shared").cast("bigint").alias("shared_spans"),
        )
        .select(
            "source",
            "n_docs",
            "total_spans",
            "shared_spans",
            F.expr(
                "(1000000 * (total_spans - shared_spans)) div total_spans"
            ).alias("novelty_ppm"),
        )
        .orderBy("source")
    )


# --- BPE merge training (tokenizer vocabulary induction) --------------
#
# Byte-pair-encoding training in the standard distributed form: reduce
# the corpus to a WORD-FREQUENCY table (vocabulary-sized, not
# corpus-sized), represent each word as delimited symbols, then per
# merge round (a) count adjacent symbol pairs weighted by word
# frequency, (b) pick the most frequent pair (ties: lexicographic), and
# (c) merge every occurrence. Symbol sequences are carried as strings
# where EVERY symbol wears its own delimiters — chr(1) sym chr(2) — so
# a merge is one literal replace() whose pattern can never straddle a
# symbol boundary (the leading chr(1)/trailing chr(2) anchor complete
# symbols) and never misses back-to-back occurrences (adjacent patterns
# share no characters, so non-overlapping left-to-right replace ==
# greedy-left BPE in BOTH engines). ASCII corpus assumed for the
# delimiters (the fixture's max code point is 121; a production corpus
# would pick unused sentinels) and for string-order tiebreaks.
BPE_MERGES = 16  # realistic merge-table depth (was 4; verdict r9 #5)
_BPE_S1 = "\x01"
_BPE_S2 = "\x02"


def _bpe_oracle(tail: str | None = None) -> str:
    # Each round's s{i} is referenced twice (pair counting AND the next
    # merge) and r{i} three times (two scalar subqueries + the final
    # UNION arm), so WITHOUT materialization DuckDB's CTE inlining
    # expands the stage tree exponentially — at 16 merges that is ~4^16
    # scans of `documents` ("Too many open files" long before any
    # result). AS MATERIALIZED computes every stage exactly once, the
    # same linear K-pass shape the Spark side runs via localCheckpoint.
    stages = []
    finals = []
    for i in range(BPE_MERGES):
        a = f"(SELECT a FROM r{i})"
        b = f"(SELECT b FROM r{i})"
        stages.append(f"""
    sy{i} AS (
        SELECT cnt, string_split(substr(seq, 2, length(seq) - 2),
                                 chr(2) || chr(1)) AS sy
        FROM s{i}),
    p{i} AS (
        SELECT sy[g.j] AS a, sy[g.j + 1] AS b,
               CAST(SUM(cnt) AS BIGINT) AS pair_count
        FROM sy{i}, UNNEST(generate_series(1, len(sy) - 1)) AS g(j)
        GROUP BY 1, 2),
    r{i} AS MATERIALIZED (SELECT a, b, pair_count FROM p{i}
             ORDER BY pair_count DESC, a, b LIMIT 1),
    s{i + 1} AS MATERIALIZED (
        SELECT word, cnt,
               replace(seq,
                       chr(1) || {a} || chr(2) || chr(1) || {b} || chr(2),
                       chr(1) || {a} || {b} || chr(2)) AS seq
        FROM s{i})""")
        finals.append(
            f"SELECT CAST({i + 1} AS BIGINT) AS merge_rank, a AS left_sym,"
            f" b AS right_sym, pair_count FROM r{i}"
        )
    prefix = f"""
    WITH w AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents),
    s0 AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
               array_to_string(list_transform(string_split(word, ''),
                   c -> chr(1) || c || chr(2)), '') AS seq
        FROM w WHERE word <> '' GROUP BY word),{",".join(stages)}"""
    if tail is None:
        tail = f"""
    SELECT * FROM ({" UNION ALL ".join(finals)})
    ORDER BY merge_rank
    """
    return prefix + tail


@register(
    "bpe_merge_training",
    oracle=_bpe_oracle(),
    description=f"G17 tokenizer vocabulary induction: {BPE_MERGES} BPE merge "
    "rounds over the corpus word-frequency table — weighted adjacent-pair "
    "counts, lexicographic tiebreak, delimiter-anchored literal-replace "
    "merges; unrolled-stage DuckDB oracle",
)
def bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE training, the way production tokenizer trainers
    run it at corpus scale: all rounds operate on the word-FREQUENCY
    relation (one row per distinct word — the corpus text is touched
    exactly once, in the initial count), so each merge round is one
    map-side-combined pair count over a vocabulary-sized input, one
    1-row argmax, and one broadcast-join literal replace. K rounds = K
    bounded passes; nothing corpus-sized moves after the first groupBy.
    The per-symbol-delimiter string representation makes the merge a
    single replace() with identical greedy-left semantics in Spark and
    DuckDB (see module comment), so every round — including tiebreaks —
    is value-checked by the unrolled oracle."""
    rules, _ = _bpe_train(spark, sf_dir)
    out = None
    for i, rule in enumerate(rules):
        row = rule.select(
            F.lit(i + 1).cast("bigint").alias("merge_rank"),
            F.col("a").alias("left_sym"),
            F.col("b").alias("right_sym"),
            "pair_count",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("merge_rank")


# Memo for _bpe_train, keyed by (applicationId, sf_dir): the merge-
# table and corpus-tokenization registry entries share the training
# loop (the most expensive eager chain in a full-registry sweep —
# ADVICE r10 asked for exactly this memo). The cached DataFrames are
# localCheckpointed (lineage-truncated), so the memo MUST die whenever
# their blocks do — registry.release_cached() unpersists every
# persistent RDD between harness queries and runs RELEASE_HOOKS first,
# which clears this dict; a fresh application id misses naturally.
_BPE_TRAIN_CACHE: dict[
    tuple[str, str], tuple[list[DataFrame], DataFrame]
] = {}
RELEASE_HOOKS.append(_BPE_TRAIN_CACHE.clear)


def _bpe_train(
    spark: SparkSession, sf_dir: str
) -> tuple[list[DataFrame], DataFrame]:
    """Run the BPE_MERGES training rounds; returns (per-round 1-row rule
    relations, the fully-merged vocabulary seqs relation). Shared by the
    merge-table query and the corpus-tokenization query; memoized per
    (application, sf_dir) — see _BPE_TRAIN_CACHE."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BPE_TRAIN_CACHE.get(key)
    if hit is not None:
        return hit
    seqs = bpe_word_seqs(spark, sf_dir).localCheckpoint(eager=True)
    rules: list[DataFrame] = []
    for i in range(BPE_MERGES):
        rule = bpe_pair_rule(seqs).localCheckpoint(eager=True)
        rules.append(rule)
        seqs = bpe_apply_merge(seqs, rule)
        # The rule is checkpointed every round (it is read three times:
        # two merge-pattern references + the output row, and the eager
        # cut stops the pair-count agg from re-running). The seqs
        # relation only needs a cut every few rounds: un-checkpointed
        # rounds chain as narrow 1-row-broadcast projections (bounded —
        # every rule in the chain is already materialized), and at 16
        # merges the every-round cut spent ~45% of the operator's
        # wall-clock on Spark job scheduling of vocabulary-sized
        # materializations (measured sf0.01: 5.8 s -> 3.4 s).
        if (i + 1) % 4 == 0 and i + 1 < BPE_MERGES:
            seqs = seqs.localCheckpoint(eager=True)
    _BPE_TRAIN_CACHE[key] = (rules, seqs)
    return rules, seqs


_BPE_ENCODE_TAIL = f""",
    ws AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT source,
                     unnest(string_split_regex(trim(text), '\\s+')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY source, word),
    nt AS (
        SELECT word,
               CAST(len(string_split(substr(seq, 2, length(seq) - 2),
                                     chr(2) || chr(1))) AS BIGINT) AS n_sym
        FROM s{BPE_MERGES})
    SELECT ws.source,
           CAST(SUM(ws.cnt) AS BIGINT) AS total_words,
           CAST(SUM(ws.cnt * nt.n_sym) AS BIGINT) AS total_tokens,
           CAST((1000000 * SUM(ws.cnt * nt.n_sym)) // SUM(ws.cnt)
                AS BIGINT) AS tokens_per_word_ppm
    FROM ws JOIN nt USING (word)
    GROUP BY ws.source
    ORDER BY ws.source
    """


@register(
    "bpe_encode_token_stats",
    oracle=_bpe_oracle(tail=_BPE_ENCODE_TAIL),
    description=f"G17 corpus tokenization with the learned BPE merge table "
    f"({BPE_MERGES} merges): per-source word/token totals and exact "
    f"tokens-per-word ppm — the token-budget estimate a training-data "
    f"pipeline prices corpora with; full unrolled DuckDB oracle",
)
def bpe_encode_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained merge table to tokenize the corpus — at the
    VOCABULARY level, the way production token-count estimators run:
    each distinct word is tokenized once (the fully-merged seqs relation
    training already produced), then per-source token totals come from
    one equi-join of the (source, word, cnt) relation against that
    vocabulary and a weighted sum. Nothing corpus-sized is re-processed:
    the corpus text is read once for the per-source word counts, the
    merge loop stays vocabulary-sized, and the join is co-partitioned
    on the word. Output: per-source total_words, total_tokens, and
    tokens_per_word_ppm (exact integer division), the token-budget
    numbers a pipeline uses to price a corpus against a training run."""
    _, seqs = _bpe_train(spark, sf_dir)
    docs = spread(load_table(spark, sf_dir, "documents"))
    wordsrc = (
        docs.select("source", F.explode(tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    n_sym = F.size(
        F.split(F.expr("substring(seq, 2, length(seq) - 2)"), _BPE_S2 + _BPE_S1)
    ).cast("bigint")
    vocab = seqs.select("word", n_sym.alias("n_sym"))
    return (
        wordsrc.join(vocab, "word")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("total_words"),
            F.sum(F.col("cnt") * F.col("n_sym"))
            .cast("bigint")
            .alias("total_tokens"),
        )
        .select(
            "source",
            "total_words",
            "total_tokens",
            F.expr("(1000000 * total_tokens) div total_words").alias(
                "tokens_per_word_ppm"
            ),
        )
        .orderBy("source")
    )


def bpe_word_seqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-0 input: the word-frequency relation with per-symbol-
    delimited sequences. Exposed un-checkpointed so the plan guard and
    plan pins can inspect the REAL plan (verdict r9 #2: the operator's
    eager localCheckpoints lineage-truncate every intermediate out of
    the registry-wide guard's sight)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select(F.explode(tokens("text")).alias("word")).filter(
        F.col("word") != ""
    )
    seq0 = F.concat_ws(
        "",
        F.transform(
            F.split("word", ""),
            lambda c: F.concat(F.lit(_BPE_S1), c, F.lit(_BPE_S2)),
        ),
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select("word", "cnt", seq0.alias("seq"))
    )


def bpe_pair_rule(seqs: DataFrame) -> DataFrame:
    """One merge round's rule relation: weighted adjacent-pair counts
    over the vocabulary, argmax with lexicographic tiebreak — exactly
    one row. The orderBy+limit(1) pins to TakeOrderedAndProject; the
    pair count is a map-side-combined hash aggregate on (a, b)."""
    syms = F.split(
        F.expr("substring(seq, 2, length(seq) - 2)"), _BPE_S2 + _BPE_S1
    )
    n = F.size(syms)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = seqs.select(
        "cnt",
        F.explode(
            F.transform(
                idx,
                lambda j: F.struct(
                    F.element_at(syms, j).alias("a"),
                    F.element_at(syms, j + 1).alias("b"),
                ),
            )
        ).alias("p"),
    ).select("cnt", "p.a", "p.b")
    return (
        pairs.groupBy("a", "b")
        .agg(F.sum("cnt").cast("bigint").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "a", "b")
        .limit(1)
    )


def bpe_apply_merge(seqs: DataFrame, rule: DataFrame) -> DataFrame:
    """Apply one merge rule to every vocabulary sequence: a crossJoin
    against the BROADCAST 1-row rule (a bounded nested-loop lookup by
    construction — see the BNLJ_OK entry in tests/test_plan_guard.py)
    followed by one delimiter-anchored literal replace."""
    return seqs.crossJoin(F.broadcast(rule)).select(
        "word",
        "cnt",
        F.replace(
            F.col("seq"),
            F.concat(
                F.lit(_BPE_S1), F.col("a"), F.lit(_BPE_S2),
                F.lit(_BPE_S1), F.col("b"), F.lit(_BPE_S2),
            ),
            F.concat(
                F.lit(_BPE_S1), F.col("a"), F.col("b"), F.lit(_BPE_S2)
            ),
        ).alias("seq"),
    )


# Pre-checkpoint intermediate plans for the pin/guard machinery
# (verdict r9 #2): round 0's rule (pair count + argmax) and merge
# (1-row-broadcast replace) plans, built WITHOUT the eager checkpoints
# so their real shapes are pinned and guarded. Later rounds are
# structurally identical (same builders over a re-materialized seqs).
EXTRA_PLAN_BUILDERS["bpe_merge_training::pairs0"] = (
    lambda spark, sf_dir: bpe_pair_rule(bpe_word_seqs(spark, sf_dir))
)
EXTRA_PLAN_BUILDERS["bpe_merge_training::merge0"] = (
    lambda spark, sf_dir: (lambda s: bpe_apply_merge(s, bpe_pair_rule(s)))(
        bpe_word_seqs(spark, sf_dir)
    )
)
