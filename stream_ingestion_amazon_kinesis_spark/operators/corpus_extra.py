"""Corpus-curation analytics, wave 2 (SURVEY §2.3 G17 extensions).

Four training-data-pipeline shapes the earlier waves did not cover:

- inequality/concentration measurement (Gini) over spend — the same
  machinery audits token-share concentration across sources before a
  mixing run;
- one BPE merge iteration (adjacent symbol-pair frequencies over the
  word vocabulary) — the inner loop of tokenizer induction, expressed
  as explode -> groupBy so the pair counting is map-side combined;
- train/eval token-distribution drift (total-variation distance in
  fixed-point ppm) — the check that a hash split did not skew the
  token distribution;
- boilerplate span detection (3-gram spans shared across >=8% of a
  source's docs) — the C4-style repeated-template filter, reported as
  audit counts per source.

All four are exact-integer (cents / ppm with truncating division) so
both engines agree to the digit regardless of partial-aggregation
order; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import money
from ..functions.text import tokens
from ..plans.registry import register
from ..sources.catalog import load_table, load_tables, spread

# Knuth multiplicative hash — the registry-wide deterministic split
# function (curation.py uses the same constant for shard assignment and
# the 90/10 leakage split), reproducible on any engine with exact
# integer arithmetic.
_KNUTH = 2654435761


@register(
    "gini_concentration_nations",
    oracle="""
    WITH spend AS (
        SELECT c_nationkey AS nationkey, o_custkey AS custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
    ranked AS (
        SELECT nationkey, cents,
               ROW_NUMBER() OVER (PARTITION BY nationkey
                                  ORDER BY cents, custkey) AS i
        FROM spend),
    agg AS (
        SELECT nationkey, COUNT(*) AS n,
               SUM(cents) AS s, SUM(i * cents) AS si
        FROM ranked GROUP BY 1)
    -- SUM -> HUGEINT keeps every term exact; num*1e6 // den is integer
    -- division on non-negative HUGEINTs (floor == truncate), headroom
    -- to ~1e38 (the staged x1000 BIGINT form overflowed at sf1)
    SELECT n_name AS nation, CAST(n AS BIGINT) AS n_customers,
           CAST(s AS BIGINT) AS total_cents,
           CAST((2 * si - (n + 1) * s) * 1000000 // (n * s) AS BIGINT)
               AS gini_ppm
    FROM agg JOIN nation ON nationkey = n_nationkey
    ORDER BY nation
    """,
    description="per-nation Gini coefficient of customer spend in exact "
    "truncating ppm: rank-weighted sum identity "
    "G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending "
    "spend — one fact aggregation, one nation-partitioned window",
)
def gini_concentration_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration audit: how unequal is spend across a nation's
    customers? The rank-weighted identity needs each customer's
    ascending rank within its nation — a window PARTITIONED by nation
    over the per-customer aggregate (|customers| rows, grouped into 25
    independent partitions; no global sort). All arithmetic is integer
    cents accumulated in DECIMAL(38,0)/HUGEINT (the rank-weighted
    numerator grows as n^2 * cents — the staged x1000 BIGINT form from
    round 3 overflowed again at sf1, caught live by the round-6 sf1
    gate). The exact floor(num*1e6/den) on the Spark side avoids both
    decimal `div` (which wraps past int64, STATE.md) and decimal `/`
    (rounded at scale 6, can flip a floor boundary): a double-division
    GUESS — within 1 of exact, since the quotient is <= 1e6 and double
    division carries ~1e-10 absolute error at that magnitude — is
    corrected by two exact DECIMAL(38,0) comparisons. Gini >= 0 by
    construction, so DuckDB's truncating // is the same floor."""
    t = load_tables(spark, sf_dir, "orders", "customer", "nation")
    spend = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg((F.sum(money("o_totalprice")) * 100).cast("bigint").alias("cents"))
    )
    w = Window.partitionBy("nationkey").orderBy("cents", "custkey")
    ranked = spend.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy("nationkey").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("si"),
    )
    return (
        agg.join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_customers"),
            F.col("s").alias("total_cents"),
            F.expr(
                "CAST((2 * si - (CAST(n AS DECIMAL(38,0)) + 1) * s)"
                " * 1000000 AS DECIMAL(38,0))"
            ).alias("num6"),
            F.expr(
                "CAST(CAST(n AS DECIMAL(38,0)) * s AS DECIMAL(38,0))"
            ).alias("den"),
        )
        .withColumn(
            "guess",
            F.expr(
                "CAST(FLOOR(CAST(num6 AS DOUBLE) / CAST(den AS DOUBLE))"
                " AS DECIMAL(38,0))"
            ),
        )
        .withColumn(
            "gini_ppm",
            F.expr(
                "CAST(CASE WHEN (guess + 1) * den <= num6 THEN guess + 1"
                " WHEN guess * den > num6 THEN guess - 1"
                " ELSE guess END AS BIGINT)"
            ),
        )
        .drop("num6", "den", "guess")
        .orderBy("nation")
    )


@register(
    "bpe_merge_candidates",
    oracle="""
    WITH vocab AS (
        SELECT token AS word, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
              FROM documents)
        GROUP BY 1),
    pairs AS (
        SELECT substring(word, CAST(i AS INT), 2) AS pair, cnt
        FROM vocab, UNNEST(range(1, len(word))) AS t(i)
        WHERE len(word) >= 2)
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS weight
    FROM pairs GROUP BY pair
    ORDER BY weight DESC, pair
    LIMIT 20
    """,
    description="one BPE merge iteration: adjacent character-pair "
    "frequencies over the word vocabulary weighted by word count — "
    "tokenizer-induction inner loop as explode -> map-side-combined agg",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge-candidate scoring step of byte-pair encoding: collapse
    the corpus to its word vocabulary first (the corpus may be 100 TB;
    the vocabulary is millions of rows), then fan each word out to its
    adjacent symbol pairs weighted by the word's corpus count. Two
    shuffles total — vocab groupBy, pair groupBy — both map-side
    combined; the pair generation is a JVM `transform` over a substring
    window, never Python. Repeated pairs within one word count once per
    position, exactly as the BPE definition requires."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        spread(docs.select(F.explode(tokens("text")).alias("word")))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.length("word") >= 2)
    )
    pairs = vocab.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("weight"))
        .orderBy(F.col("weight").desc(), "pair")
        .limit(20)
    )


@register(
    "token_drift_train_eval",
    oracle=f"""
    WITH tok AS (
        SELECT lang,
               (doc_id * {_KNUTH}) % 4294967296 % 10 = 0 AS is_eval,
               unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents),
    cells AS (
        SELECT lang, token,
               SUM(CASE WHEN is_eval THEN 0 ELSE 1 END) AS cnt_train,
               SUM(CASE WHEN is_eval THEN 1 ELSE 0 END) AS cnt_eval
        FROM tok GROUP BY 1, 2),
    tot AS (
        SELECT lang, token, cnt_train, cnt_eval,
               SUM(cnt_train) OVER (PARTITION BY lang) AS tot_train,
               SUM(cnt_eval) OVER (PARTITION BY lang) AS tot_eval
        FROM cells),
    ppm AS (
        SELECT lang, cnt_train, cnt_eval, tot_train, tot_eval,
               CASE WHEN tot_train = 0 THEN 0
                    ELSE (cnt_train * 1000000) // tot_train END AS p_train,
               CASE WHEN tot_eval = 0 THEN 0
                    ELSE (cnt_eval * 1000000) // tot_eval END AS p_eval
        FROM tot)
    SELECT lang,
           CAST(MAX(tot_train) AS BIGINT) AS train_tokens,
           CAST(MAX(tot_eval) AS BIGINT) AS eval_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(ABS(p_train - p_eval)) AS BIGINT) AS l1_drift_ppm
    FROM ppm GROUP BY lang
    ORDER BY lang
    """,
    description="train/eval token-distribution drift per language: "
    "90/10 Knuth hash split, per-token share in truncating ppm, "
    "L1 (2x total-variation) distance — the post-split sanity check "
    "before a training run",
)
def token_drift_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the hash split skew the token distribution? Token shares are
    integer ppm with truncating division (identical on both engines;
    each side's shares sum to <= 1e6 so the L1 sum is bounded by 2e6 —
    no overflow lane needed). The per-(lang, token) cell relation is
    vocabulary-sized, so the two window sums deriving per-language
    totals run over vocab rows, not corpus rows; the only corpus-sized
    operation is the one exploded aggregation, map-side combined.
    A language with an empty split contributes shares of zero (guarded
    division), making the drift read 1e6 — maximal, as it should."""
    docs = load_table(spark, sf_dir, "documents")
    tok = spread(docs).select(
        "lang",
        ((F.col("doc_id") * _KNUTH) % 4294967296 % 10 == 0).alias("is_eval"),
        F.explode(tokens("text")).alias("token"),
    )
    cells = tok.groupBy("lang", "token").agg(
        F.sum(F.when(F.col("is_eval"), 0).otherwise(1)).alias("cnt_train"),
        F.sum(F.when(F.col("is_eval"), 1).otherwise(0)).alias("cnt_eval"),
    )
    w = Window.partitionBy("lang")
    tot = cells.select(
        "lang",
        "cnt_train",
        "cnt_eval",
        F.sum("cnt_train").over(w).alias("tot_train"),
        F.sum("cnt_eval").over(w).alias("tot_eval"),
    )
    ppm = tot.select(
        "lang",
        "tot_train",
        "tot_eval",
        F.when(F.col("tot_train") == 0, F.lit(0))
        .otherwise(F.expr("(cnt_train * 1000000) div tot_train"))
        .alias("p_train"),
        F.when(F.col("tot_eval") == 0, F.lit(0))
        .otherwise(F.expr("(cnt_eval * 1000000) div tot_eval"))
        .alias("p_eval"),
    )
    return (
        ppm.groupBy("lang")
        .agg(
            F.max("tot_train").alias("train_tokens"),
            F.max("tot_eval").alias("eval_tokens"),
            F.count("*").alias("vocab_size"),
            F.sum(F.abs(F.col("p_train") - F.col("p_eval"))).alias(
                "l1_drift_ppm"
            ),
        )
        .orderBy("lang")
    )


@register(
    "boilerplate_span_stats",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               string_split_regex(trim(text), '\\s+') AS toks
        FROM documents),
    s AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(toks) - 1),
                                     i -> array_to_string(toks[i:i+2], ' ')))
                   AS span
        FROM d WHERE len(toks) >= 3),
    occ AS (
        SELECT source, span, COUNT(*) AS occ,
               COUNT(DISTINCT doc_id) AS docs_with
        FROM s GROUP BY 1, 2),
    sz AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    boiler AS (
        SELECT o.source, o.span, o.occ
        FROM occ o JOIN sz USING (source)
        WHERE docs_with >= 2 AND docs_with * 100 >= n_docs * 8),
    bagg AS (
        SELECT source, COUNT(*) AS n_boiler_spans, SUM(occ) AS boiler_occ
        FROM boiler GROUP BY 1),
    aff AS (
        SELECT ds.source, COUNT(DISTINCT ds.doc_id) AS docs_affected
        FROM (SELECT DISTINCT source, doc_id, span FROM s) ds
        JOIN boiler b ON ds.source = b.source AND ds.span = b.span
        GROUP BY 1)
    SELECT sz.source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(COALESCE(n_boiler_spans, 0) AS BIGINT) AS n_boiler_spans,
           CAST(COALESCE(boiler_occ, 0) AS BIGINT) AS boiler_occurrences,
           CAST(COALESCE(docs_affected, 0) AS BIGINT) AS docs_affected
    FROM sz LEFT JOIN bagg ON sz.source = bagg.source
            LEFT JOIN aff ON sz.source = aff.source
    ORDER BY sz.source
    """,
    description="C4-style boilerplate detection: 3-gram spans shared by "
    ">=2 docs and >=8% of a source's documents flagged as template "
    "text; per-source span/occurrence/affected-doc audit counts",
)
def boilerplate_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated template spans (navigation chrome, license footers)
    inflate n-gram counts and leak across train/eval; this audit
    quantifies them per source before removal. Shape: one exploded
    span relation feeds both the doc-frequency aggregation and (as a
    distinct doc-span projection) the affected-doc count — the span
    relation is the only corpus-sized intermediate, and both
    aggregations over it are map-side combined on (source, span). The
    source-size dimension (|sources| rows) is broadcast. The relative
    threshold (>=8% of the source's docs, floor 2) keeps the flagged
    set meaningful at any corpus size, unlike an absolute doc count."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    d = spread(docs).select(
        "doc_id", "source", toks.alias("toks")
    ).filter(F.size("toks") >= 3)
    spans = d.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 2),
                lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, 3)),
            )
        ).alias("span"),
    )
    occ = spans.groupBy("source", "span").agg(
        F.count("*").alias("occ"),
        F.countDistinct("doc_id").alias("docs_with"),
    )
    sz = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    boiler = occ.join(F.broadcast(sz), "source").filter(
        (F.col("docs_with") >= 2)
        & (F.col("docs_with") * 100 >= F.col("n_docs") * 8)
    )
    bagg = boiler.groupBy("source").agg(
        F.count("*").alias("n_boiler_spans"),
        F.sum("occ").alias("boiler_occ"),
    )
    aff = (
        spans.dropDuplicates(["source", "doc_id", "span"])
        .join(boiler.select("source", "span"), ["source", "span"])
        .groupBy("source")
        .agg(F.countDistinct("doc_id").alias("docs_affected"))
    )
    return (
        sz.join(bagg, "source", "left")
        .join(aff, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_boiler_spans", F.lit(0)).cast("bigint").alias(
                "n_boiler_spans"
            ),
            F.coalesce("boiler_occ", F.lit(0)).cast("bigint").alias(
                "boiler_occurrences"
            ),
            F.coalesce("docs_affected", F.lit(0)).cast("bigint").alias(
                "docs_affected"
            ),
        )
        .orderBy("source")
    )
