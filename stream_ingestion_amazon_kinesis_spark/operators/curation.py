"""Corpus-curation operators for LLM training-data pipelines (SURVEY
§2.3 G17): benchmark-contamination detection, deterministic shard
assignment, concat-and-chunk sequence packing, and domain-mix
re-weighting.

These are the operations that sit between a cleaned corpus and a
training run. Every one is expressed as JVM column expressions +
joins/windows (no Python in the hot path), every keep/assign decision
hashes or arithmetics a STABLE key (never text, never rand()), so the
output is reproducible across engines, cluster sizes, and reruns.
The reference has no analog (it is a streaming ETL lab,
consumer.py:108-195); these extend the same declarative surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import mulmod32_sql
from ..functions.text import tokens
from ..plans.registry import EXTRA_PLAN_BUILDERS, register
from ..sources.catalog import load_table, spread
from .dedup import TOKEN_DF_CAP_SQL
from .corpus_quality import (
    GOPHER_DISTINCT_DEN,
    GOPHER_DISTINCT_NUM,
    GOPHER_MAX_TOKENS,
    GOPHER_MIN_TOKENS,
)

# Contamination unit: 5-token grams (docs shorter than 5 tokens carry no
# grams and drop out of the report — mirrored by generate_series in the
# oracle). The benchmark split is doc_id % 97 == 0: deterministic, ~1%.
CONTAM_N = 5
BENCH_MOD = 97

N_SHARDS = 16
# Knuth multiplicative hash constant — the shard hash must be arithmetic
# (not engine-native xxhash/md5) so the DuckDB oracle computes the exact
# same assignment.
_KNUTH = 2654435761

PACK_BIN_TOKENS = 512


# Overflow-free (col * mult) mod 2^32 shared by the arithmetic-hash
# family (ADVICE r8); lives in functions.numeric so dedup's MinHash
# permutations use the identical split formula.
_mulmod32 = mulmod32_sql


def _grams(text_col) -> F.Column:
    """Distinct CONTAM_N-token grams as array<string>; empty for short
    docs. Guarded sequence: Spark's sequence(1, stop) DESCENDS when
    stop < 1, so short docs must short-circuit to an empty array."""
    toks = tokens(text_col)
    n = F.size(toks)
    idx = F.when(
        n >= CONTAM_N, F.sequence(F.lit(1), n - (CONTAM_N - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, CONTAM_N)))
    )


@register(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               string_split_regex(trim(text), '\\s+') AS toks
        FROM documents),
    grams AS (
        SELECT DISTINCT doc_id, source,
               array_to_string(toks[g:g+{CONTAM_N - 1}], ' ') AS gram
        FROM t, UNNEST(generate_series(1, len(toks) - {CONTAM_N - 1}))
                    AS u(g)),
    bench AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id % {BENCH_MOD} = 0),
    scored AS (
        SELECT g.source, g.doc_id,
               COUNT(*) AS n_grams,
               SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                   AS matched
        FROM grams g LEFT JOIN bench b ON g.gram = b.gram
        WHERE g.doc_id % {BENCH_MOD} <> 0
        GROUP BY 1, 2)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN matched > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           CAST(SUM(n_grams) AS BIGINT) AS total_grams,
           CAST(SUM(matched) AS BIGINT) AS matched_grams
    FROM scored
    GROUP BY source
    """,
    description="G17 benchmark-contamination check: 5-gram overlap of training "
    "docs against a held-out benchmark split (doc_id % 97 == 0), per-source "
    "contaminated-doc and matched-gram counts",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination pass: flag training docs sharing any 5-gram with
    the benchmark set. The benchmark gram dictionary is tiny relative to
    the corpus (~1% of docs) -> broadcast; the per-doc gram explode
    feeds a groupBy(doc_id) whose map-side partial collapses each doc
    back to one row before the exchange, so the shuffle is O(docs),
    not O(grams)."""
    docs = load_table(spark, sf_dir, "documents")
    # Both branches below re-evaluate the gram explode; spread the raw
    # docs first so each evaluation runs cluster-wide (catalog.spread).
    grams = spread(docs).select(
        "doc_id", "source", F.explode(_grams(F.col("text"))).alias("gram")
    )
    bench = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(F.col("gram").alias("bench_gram"))
        .distinct()
    )
    scored = (
        grams.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench), F.col("gram") == F.col("bench_gram"), "left")
        .groupBy("source", "doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("bench_gram").alias("matched"),
        )
    )
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("matched") > 0).cast("bigint")).alias("n_contaminated"),
        F.sum("n_grams").alias("total_grams"),
        F.sum("matched").alias("matched_grams"),
    )


@register(
    "training_shard_assignment",
    oracle=f"""
    WITH d AS (
        SELECT {_mulmod32("doc_id", _KNUTH, "//")} % {N_SHARDS} AS shard,
               doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               n_chars
        FROM documents)
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM d
    GROUP BY shard
    """,
    description="G17 deterministic training-shard assignment: multiplicative "
    "hash of doc_id into 16 output shards with per-shard doc/token/byte "
    "balance stats",
)
def training_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write-side layout step for a training corpus: every doc maps
    to exactly one output shard by arithmetic hash of its stable id —
    reproducible regardless of cluster size or input split order, unlike
    repartition(n) round-robin. The per-shard stats are the balance
    audit (a skewed shard means a skewed hash or key). The real write
    would be .write.partitionBy('shard'); the stats rollup is one
    map-side-combined shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    shard = F.expr(_mulmod32("doc_id", _KNUTH, "div")) % N_SHARDS
    d = docs.select(
        shard.alias("shard"),
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        "n_chars",
    )
    return d.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.sum("n_chars").alias("shard_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


@register(
    "sequence_packing_bins",
    oracle=f"""
    WITH d AS (
        SELECT source, doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents),
    packed AS (
        SELECT source, doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) - n_tokens AS start_offset
        FROM d)
    SELECT source,
           start_offset // {PACK_BIN_TOKENS} AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc_id
    FROM packed
    GROUP BY source, bin
    """,
    description="G17 concat-and-chunk sequence packing: per-source token "
    "stream in doc_id order, each doc binned by the 512-token chunk its "
    "start offset lands in",
)
def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining batch layout: concatenate each source's token stream
    in stable doc_id order and cut it into fixed 512-token chunks; a doc
    belongs to the chunk where it starts (docs may span chunks — that is
    the concat-and-chunk convention, no padding waste). One window
    shuffle partitioned by source. At corpus scale the partition key
    would be (source, date-bucket) to bound a single source's stream per
    task; the packing arithmetic is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source", "doc_id", F.size(tokens("text")).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        packed.withColumn(
            "bin", (F.col("start_offset") / PACK_BIN_TOKENS).cast("bigint")
        )
        .groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


@register(
    "domain_mix_weights",
    oracle="""
    WITH d AS (
        SELECT source,
               CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                    THEN 2 ELSE 1 END AS target_num,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents),
    per_src AS (
        SELECT source, target_num,
               CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
        FROM d GROUP BY source, target_num),
    tot AS (
        SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(target_num) AS BIGINT) AS target_den
        FROM per_src)
    SELECT source, src_tokens,
           CAST(src_tokens AS DOUBLE) / total_tokens AS actual_share,
           CAST(target_num AS DOUBLE) / target_den AS target_share,
           CAST(target_num * total_tokens AS DOUBLE)
               / CAST(target_den * src_tokens AS DOUBLE) AS weight
    FROM per_src, tot
    """,
    description="G17 domain-mix re-weighting: per-source sampling weight = "
    "target share / actual token share (targets: even-numbered sources get "
    "2x the weight of odd)",
)
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture control: the weight each source's docs carry in
    the sampled mix so token shares hit the declared target. All-integer
    numerators/denominators with ONE double division at the end keeps
    the floats bit-identical across engines. The totals relation is a
    single row -> broadcast cross join; the per-source agg is map-side
    combined."""
    docs = load_table(spark, sf_dir, "documents")
    target_num = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(2)
    ).otherwise(F.lit(1))
    per_src = (
        docs.select(
            "source",
            target_num.alias("target_num"),
            F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        )
        .groupBy("source", "target_num")
        .agg(F.sum("n_tokens").alias("src_tokens"))
    )
    tot = per_src.agg(
        F.sum("src_tokens").alias("total_tokens"),
        F.sum("target_num").alias("target_den"),
    )
    joined = per_src.crossJoin(F.broadcast(tot))
    return joined.select(
        "source",
        "src_tokens",
        (F.col("src_tokens").cast("double") / F.col("total_tokens")).alias(
            "actual_share"
        ),
        (F.col("target_num").cast("double") / F.col("target_den")).alias(
            "target_share"
        ),
        (
            (F.col("target_num") * F.col("total_tokens")).cast("double")
            / (F.col("target_den") * F.col("src_tokens")).cast("double")
        ).alias("weight"),
    )


@register(
    "length_bucket_padding",
    oracle="""
    WITH d AS (
        SELECT len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents),
    b AS (
        SELECT n_tokens,
               GREATEST(16, LEAST(1024,
                   CAST(power(2, ceil(log2(n_tokens))) AS BIGINT))) AS bucket
        FROM d WHERE n_tokens > 0)
    SELECT bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
           CAST(SUM(bucket - LEAST(n_tokens, bucket)) AS BIGINT) AS padding_tokens,
           CAST(SUM(LEAST(n_tokens, bucket)) AS DOUBLE)
               / (COUNT(*) * bucket) AS fill_ratio
    FROM b GROUP BY bucket
    """,
    description="G17 length-bucketed batching audit: power-of-two sequence "
    "buckets (clamped 16..1024), padding waste and fill ratio per bucket",
)
def length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-shape planning for training: pad-to-bucket wastes
    bucket - len tokens per sequence, so the padding bill per
    power-of-two bucket decides the packing strategy (cf.
    sequence_packing_bins for the packed alternative). log2/ceil are
    exact for the integer inputs on both engines; all compared columns
    are int-derived."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(tokens("text")).cast("bigint")
    nt = F.col("n_tokens")
    bucket = F.greatest(
        F.lit(16).cast("bigint"),
        F.least(
            F.lit(1024).cast("bigint"),
            F.pow(F.lit(2.0), F.ceil(F.log2(nt))).cast("bigint"),
        ),
    )
    b = docs.select(n.alias("n_tokens")).filter(nt > 0).select(
        "n_tokens", bucket.alias("bucket")
    )
    capped = F.least(F.col("n_tokens"), F.col("bucket"))
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.col("bucket") - capped).alias("padding_tokens"),
        (
            F.sum(capped).cast("double")
            / (F.count("*") * F.first("bucket"))
        ).alias("fill_ratio"),
    )


@register(
    "mixture_epoch_expansion",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                    THEN 2 ELSE 1 END AS target_num,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents),
    per_src AS (
        SELECT source, ANY_VALUE(target_num) AS target_num,
               CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
        FROM d GROUP BY source),
    tot AS (
        SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(target_num) AS BIGINT) AS target_den
        FROM per_src),
    reps AS (
        SELECT source,
               LEAST(4, GREATEST(1,
                   (target_num * total_tokens)
                   // (target_den * src_tokens))) AS n_repeats
        FROM per_src, tot)
    SELECT d.doc_id, CAST(g.epoch AS BIGINT) AS epoch, d.source
    FROM d
    JOIN reps ON d.source = reps.source,
    UNNEST(generate_series(1, CAST(reps.n_repeats AS INT))) AS g(epoch)
    """,
    description="G17 mixture materialization: each doc replicated "
    "floor(upweight) times (clamped [1,4]) via explode(sequence()) — "
    "the epoch-expansion step that turns domain_mix_weights' ratios "
    "into an actual training stream; all-integer repeat counts so the "
    "expansion is bit-reproducible",
)
def mixture_epoch_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialization half of mixture control (`domain_mix_weights`
    computes the ratios; this op applies them): under-represented
    sources get their documents repeated floor(weight) times — epoch
    numbers 1..n — exactly the "duplicate the small domains" knob of a
    pretraining data loader. The repeat count is computed with integer
    div (truncating on both engines) and clamped to [1, 4]; the fan-out
    is explode(sequence(1, n)), a narrow rowwise amplification with no
    shuffle — each task expands its own rows, so the op scales as
    O(output rows) regardless of cluster size."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.when(F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(2))
        .otherwise(F.lit(1))
        .alias("target_num"),
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
    )
    per_src = d.groupBy("source").agg(
        F.any_value("target_num").alias("target_num"),
        F.sum("n_tokens").alias("src_tokens"),
    )
    tot = per_src.agg(
        F.sum("src_tokens").alias("total_tokens"),
        F.sum("target_num").alias("target_den"),
    )
    reps = (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.least(
                F.lit(4),
                F.greatest(
                    F.lit(1),
                    F.expr("(target_num * total_tokens) div (target_den * src_tokens)"),
                ),
            ).alias("n_repeats"),
        )
    )
    return (
        d.join(F.broadcast(reps), "source")
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.col("n_repeats").cast("int"))).alias("epoch"),
            "source",
        )
        .select("doc_id", F.col("epoch").cast("bigint").alias("epoch"), "source")
    )


VOCAB_SIZE = 30


@register(
    "vocab_oov_audit",
    oracle=f"""
    WITH tok AS (
        SELECT d.doc_id, d.lang, t.tok
        FROM documents d,
             UNNEST(string_split_regex(trim(d.text), '\\s+')) AS t(tok)),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, COUNT(*) AS n,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rnk
            FROM tok GROUP BY tok)
        WHERE rnk <= {VOCAB_SIZE}),
    per_doc AS (
        SELECT t.doc_id, ANY_VALUE(t.lang) AS lang,
               COUNT(*) AS n_tokens,
               COUNT(*) FILTER (WHERE v.tok IS NULL) AS n_oov
        FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
        GROUP BY t.doc_id)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_oov) AS BIGINT) AS total_oov,
           CAST(MAX(n_oov) AS BIGINT) AS max_doc_oov
    FROM per_doc GROUP BY lang
    """,
    description="G17 tokenizer-coverage audit: corpus-derived top-"
    f"{VOCAB_SIZE} vocab (deterministic count-then-token rank), per-doc "
    "out-of-vocabulary counts rolled up per lang — the coverage check "
    "run before committing to a tokenizer; vocab is a broadcast "
    "dictionary, OOV marking is a broadcast left join, never a shuffle "
    "of the token stream",
)
def vocab_oov_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass vocab coverage: pass 1 derives the top-K vocabulary
    (count desc, token asc — a total order, so the vocab set is
    identical on any partitioning); pass 2 marks each token instance
    against the broadcast vocab and aggregates per doc, then per lang.
    At 100 TB the vocab relation is K rows (broadcast) and both passes
    are map-side-combined token aggregates — no pairwise anything."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("tok")
    )
    # orderBy+limit plans as TakeOrderedAndProject: each partition keeps
    # its local top-K and only K rows reach the driver-side merge — a
    # global row_number window would instead sort ALL distinct tokens in
    # one partition (Zipf tails make that billions of rows at 100 TB).
    vocab = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(VOCAB_SIZE)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count("*").alias("n_tokens"),
            F.count_if(F.col("in_vocab").isNull()).alias("n_oov"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_oov").alias("total_oov"),
        F.max("n_oov").alias("max_doc_oov"),
    )


@register(
    "constraint_audit_orders",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_custkey,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nonpositive_price,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1
                    ELSE 0 END) AS BIGINT) AS bad_status,
           CAST(SUM(CASE WHEN o_orderdate < DATE '1992-01-01'
                         OR o_orderdate >= DATE '2030-01-01' THEN 1
                    ELSE 0 END) AS BIGINT) AS out_of_range_date,
           COUNT(*) - COUNT(DISTINCT o_orderkey) AS duplicate_keys
    FROM orders
    """,
    description="data-quality constraint audit: five declarative rules "
    "(null key, non-positive amount, status domain, date range, key "
    "uniqueness) evaluated in ONE scan as conditional sums — the batch "
    "admission gate a pipeline runs before promoting a partition, and "
    "the batch twin of the observe() counters in streaming/observability",
)
def constraint_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All rules ride one map-side-combined aggregate over one scan —
    adding a rule costs an expression, never a pass. The uniqueness rule
    is the only one needing distinct state (COUNT(DISTINCT key)), which
    Spark plans as a partial-distinct expand, still one scan."""
    orders = load_table(spark, sf_dir, "orders")
    rule = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")
    return orders.agg(
        F.count("*").alias("n_rows"),
        rule(F.col("o_custkey").isNull()).alias("null_custkey"),
        rule(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        rule(~F.col("o_orderstatus").isin("O", "F", "P")).alias("bad_status"),
        rule(
            (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
            | (F.col("o_orderdate") >= F.lit("2030-01-01").cast("date"))
        ).alias("out_of_range_date"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("duplicate_keys"),
    )


@register(
    "split_leakage_audit",
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
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.source AS source, COUNT(*) AS n_shared
        FROM tok a JOIN tok b
          ON a.source = b.source AND a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3),
    pairs AS (
        SELECT doc_a, doc_b, source,
               {_mulmod32("doc_a", _KNUTH, "//")} % 10 = 0 AS eval_a,
               {_mulmod32("doc_b", _KNUTH, "//")} % 10 = 0 AS eval_b
        FROM shared
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_shared AS DOUBLE)
              / (sa.n_tok + sb.n_tok - n_shared) >= 0.8)
    SELECT source,
           COUNT(*) AS n_neardup_pairs,
           CAST(COUNT(*) FILTER (WHERE eval_a <> eval_b) AS BIGINT)
               AS n_cross_split_pairs,
           COUNT(DISTINCT CASE WHEN eval_a AND NOT eval_b THEN doc_a
                               WHEN eval_b AND NOT eval_a THEN doc_b
                          END) AS n_contaminated_eval_docs
    FROM pairs
    GROUP BY source
    ORDER BY source
    """,
    description="train/eval split leakage audit: hash-split docs 90/10, "
    "then count near-dup pairs (Jaccard >= 0.8) that straddle the split "
    "and the distinct eval docs contaminated by a train twin — the "
    "pre-training check that keeps held-out loss honest",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes two registered primitives — the deterministic
    multiplicative-hash split (training_shard_assignment's function,
    mod 10 for a 90/10 split) and the guarded exact-Jaccard near-dup
    join (jaccard_neardup_pairs) — into the audit every training run
    needs: an eval doc with a 0.8-Jaccard twin in train leaks the
    answer key. Both primitives keep their scale shapes (hash is
    per-row arithmetic; the pair join is the hot-token-guarded
    self-join, upgradeable to prefix_filter_jaccard_pairs unchanged
    since the pair sets are identical); the audit itself adds one
    |pairs|-sized aggregation."""
    from .dedup import jaccard_neardup_pairs

    pairs = jaccard_neardup_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def is_eval(col: str):
        return F.expr(_mulmod32(col, _KNUTH, "div")) % 10 == 0

    flagged = (
        pairs.join(
            F.broadcast(docs).withColumnRenamed("doc_id", "doc_a"), "doc_a"
        )
        .withColumn("eval_a", is_eval("doc_a"))
        .withColumn("eval_b", is_eval("doc_b"))
    )
    leaked_doc = F.when(
        F.col("eval_a") & ~F.col("eval_b"), F.col("doc_a")
    ).when(F.col("eval_b") & ~F.col("eval_a"), F.col("doc_b"))
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_neardup_pairs"),
            F.count_if(F.col("eval_a") != F.col("eval_b"))
            .cast("bigint")
            .alias("n_cross_split_pairs"),
            F.countDistinct(leaked_doc).alias("n_contaminated_eval_docs"),
        )
        .orderBy("source")
    )


@register(
    "delete_cascade_audit",
    oracle="""
    WITH del AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
    oflag AS (
        SELECT o_orderkey, o_totalprice,
               CASE WHEN del.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM orders LEFT JOIN del ON orders.o_custkey = del.c_custkey),
    cust_row AS (
        SELECT 'customer' AS entity,
               CAST(COUNT(CASE WHEN c_custkey % 97 = 0 THEN 1 END) AS BIGINT)
                   AS n_deleted,
               CAST(COUNT(CASE WHEN c_custkey % 97 <> 0 THEN 1 END) AS BIGINT)
                   AS n_remaining,
               CAST(COALESCE(SUM(CASE WHEN c_custkey % 97 = 0 THEN
                   CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                   END), 0) AS BIGINT) AS deleted_cents
        FROM customer),
    ord_row AS (
        SELECT 'orders' AS entity,
               CAST(COUNT(CASE WHEN hit = 1 THEN 1 END) AS BIGINT)
                   AS n_deleted,
               CAST(COUNT(CASE WHEN hit = 0 THEN 1 END) AS BIGINT)
                   AS n_remaining,
               CAST(COALESCE(SUM(CASE WHEN hit = 1 THEN
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   END), 0) AS BIGINT) AS deleted_cents
        FROM oflag),
    li_row AS (
        SELECT 'lineitem' AS entity,
               CAST(COUNT(CASE WHEN hit = 1 THEN 1 END) AS BIGINT)
                   AS n_deleted,
               CAST(COUNT(CASE WHEN hit = 0 THEN 1 END) AS BIGINT)
                   AS n_remaining,
               CAST(COALESCE(SUM(CASE WHEN hit = 1 THEN
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) END), 0) AS BIGINT) AS deleted_cents
        FROM lineitem JOIN oflag ON lineitem.l_orderkey = oflag.o_orderkey)
    SELECT * FROM cust_row
    UNION ALL SELECT * FROM ord_row
    UNION ALL SELECT * FROM li_row
    ORDER BY entity
    """,
    description="G3/G17 GDPR-style delete-cascade audit: a deterministic "
    "deletion cohort (c_custkey % 97 = 0) is propagated customer -> "
    "orders -> lineitem, reporting per entity how many rows the cascade "
    "removes, how many remain, and the exact cents of value leaving "
    "each table — the pre-flight report a right-to-erasure batch job "
    "emits before committing deletes",
)
def delete_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade impact in ONE pass per table.

    Instead of semi + anti joins (two probes per table), each child
    table is LEFT-joined once against the deletion cohort and both the
    deleted and remaining counts come out of the same conditional
    aggregation — at 100 TB that is one shuffle join per fact table
    (AQE free to pick broadcast while the cohort is small) and one
    map-side-combined agg, nothing else. The cohort key is plain
    modulus, never rand()/hash(), so the cascade set is identical on
    every engine and rerun.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cents = lambda c: (F.col(c).cast("decimal(12,2)") * 100).cast("bigint")  # noqa: E731

    delk = (
        cust.filter(F.col("c_custkey") % 97 == 0)
        .select(F.col("c_custkey").alias("dk"))
        .withColumn("mark", F.lit(1))
    )
    oflag = orders.join(
        delk, orders.o_custkey == delk.dk, "left"
    ).select(
        "o_orderkey",
        "o_totalprice",
        F.coalesce("mark", F.lit(0)).alias("hit"),
    )

    def row(df: DataFrame, entity: str, hit: F.Column, cent: F.Column) -> DataFrame:
        return df.agg(
            F.lit(entity).alias("entity"),
            F.count(F.when(hit, 1)).alias("n_deleted"),
            F.count(F.when(~hit, 1)).alias("n_remaining"),
            F.coalesce(F.sum(F.when(hit, cent)), F.lit(0))
            .cast("bigint")
            .alias("deleted_cents"),
        )

    cust_row = row(
        cust, "customer", F.col("c_custkey") % 97 == 0, cents("c_acctbal")
    )
    ord_row = row(oflag, "orders", F.col("hit") == 1, cents("o_totalprice"))
    oslim = oflag.select(F.col("o_orderkey").alias("ok"), "hit")
    li_row = row(
        li.join(oslim, li.l_orderkey == oslim.ok),
        "lineitem",
        F.col("hit") == 1,
        cents("l_extendedprice"),
    )
    return cust_row.unionByName(ord_row).unionByName(li_row).orderBy("entity")


# --- DSIR-style importance weighting --------------------------------
#
# Data Selection with Importance Resampling (Xie et al. 2023) scores
# raw-pool documents by how target-like their hashed n-gram feature
# distribution is. The fixture analog: target = English docs, raw pool
# = everything else; features = unigrams hashed into 256 buckets by the
# first two hex chars of md5 (identical strings on both engines, no
# hex->int conversion needed). The textbook score is
# sum_t log(p_target(b_t)/p_raw(b_t)); logs are transcendental and not
# cross-engine exact, so the engine scores with the integer difference
# form sum_t (ppm_target(b_t) - ppm_raw(b_t)) — order-isomorphic to a
# first-order expansion of the log ratio, and exactly reproducible:
# ppm_X(b) = (count_X(b) * 1_000_000) div total_X in BIGINT space.
DSIR_TOP_K = 20


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang, source,
               substr(md5(unnest(string_split_regex(trim(text), '\\s+'))),
                      1, 2) AS bucket
        FROM documents),
    tgt AS (SELECT bucket, COUNT(*) AS ct FROM tok
            WHERE lang = 'en' GROUP BY bucket),
    raw AS (SELECT bucket, COUNT(*) AS cr FROM tok
            WHERE lang <> 'en' GROUP BY bucket),
    tot AS (SELECT (SELECT SUM(ct) FROM tgt) AS tt,
                   (SELECT SUM(cr) FROM raw) AS tr),
    ppm AS (
        SELECT r.bucket,
               (COALESCE(t.ct, 0) * 1000000) // tot.tt
                   - (r.cr * 1000000) // tot.tr AS w_ppm
        FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket, tot),
    scored AS (
        SELECT k.doc_id,
               ANY_VALUE(k.lang) AS lang,
               ANY_VALUE(k.source) AS source,
               COUNT(*) AS n_tokens,
               CAST(SUM(p.w_ppm) AS BIGINT) AS importance_ppm
        FROM tok k JOIN ppm p ON k.bucket = p.bucket
        WHERE k.lang <> 'en'
        GROUP BY k.doc_id)
    SELECT doc_id, lang, source, n_tokens, importance_ppm
    FROM scored
    ORDER BY importance_ppm DESC, doc_id
    LIMIT {DSIR_TOP_K}
    """,
    description="G17 DSIR-style data selection: hashed-unigram importance "
    "scores (target=en vs raw pool) in exact integer ppm space, top-20 "
    "most target-like raw documents",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-resampling scores for the raw pool against a target
    domain, the data-selection step that upweights target-like documents
    before training.

    Scale: the bucket weight relation is AT MOST 256 rows regardless of
    corpus size (hash-bucketed features are the whole point of DSIR —
    the model is a fixed-width table, not a vocabulary), so it
    broadcasts; per-doc scoring is one explode + broadcast-join + one
    map-side-combined groupBy(doc_id); the readout is a
    TakeOrderedAndProject over the scored relation. The exploded token
    relation is consumed exactly twice (bucket stats, scoring) — the
    totals never re-read the corpus.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", "lang", "source", F.explode(tokens("text")).alias("t")
    ).select(
        "doc_id",
        "lang",
        "source",
        F.substring(F.md5(F.encode(F.col("t"), "UTF-8")), 1, 2).alias("bucket"),
    )
    # One groupBy yields both arms' bucket counts (ct=0 naturally stands
    # in for the oracle's COALESCE on target-absent buckets); the grand
    # totals ride an UNORDERED window over the <=256-row stats relation,
    # so the corpus-wide token relation is consumed exactly twice
    # (bucket stats + scoring) instead of once per sub-aggregate.
    stats = tok.groupBy("bucket").agg(
        F.count_if(F.col("lang") == "en").alias("ct"),
        F.count_if(F.col("lang") != "en").alias("cr"),
    )
    w_all = Window.partitionBy()
    ppm = (
        stats.withColumn("tt", F.sum("ct").over(w_all))
        .withColumn("tr", F.sum("cr").over(w_all))
        .filter(F.col("cr") > 0)
        .select(
            "bucket",
            F.expr(
                "(ct * 1000000L) div tt - (cr * 1000000L) div tr"
            ).alias("w_ppm"),
        )
    )
    scored = (
        tok.filter(F.col("lang") != "en")
        .join(F.broadcast(ppm), "bucket")
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.first("source").alias("source"),
            F.count("*").alias("n_tokens"),
            F.sum("w_ppm").cast("bigint").alias("importance_ppm"),
        )
    )
    return scored.orderBy(
        F.col("importance_ppm").desc(), "doc_id"
    ).limit(DSIR_TOP_K)


# --- Epoch shuffle audit ---------------------------------------------
#
# Training runs re-shuffle the corpus every epoch. The production form
# is "order by hash(key, epoch)" — deterministic (resumable mid-epoch,
# reproducible across cluster sizes), epoch-dependent (different global
# order each epoch), and free of any coordinator-side RNG state. This
# audit materializes two epochs' orders and reports the per-shard
# composition: positions must tile 1..N (a permutation), shard sizes
# must balance, and the doc-id mix per shard must differ across epochs.
# The epoch varies the (odd) MULTIPLIER, not an additive salt: adding a
# constant mod 2^32 is an order-preserving shift (wrap-around aside),
# which left epoch orders near-identical; distinct odd multipliers give
# genuinely different bijections of the key space.
EPOCH_SHARDS = 16
_EPOCH_SALT = 40503  # Knuth's 16-bit multiplicative constant


@register(
    "epoch_shuffle_audit",
    oracle=f"""
    WITH d AS (SELECT doc_id FROM documents),
    n AS (SELECT COUNT(*) AS n FROM d),
    e AS (SELECT CAST(0 AS BIGINT) AS epoch UNION ALL SELECT 1),
    h AS (SELECT e.epoch, d.doc_id,
                 {_mulmod32("d.doc_id",
                            f"{_KNUTH} + 2 * {_EPOCH_SALT} * e.epoch",
                            "//")} AS hk
          FROM d, e),
    r AS (SELECT epoch, doc_id, hk,
                 ROW_NUMBER() OVER (PARTITION BY epoch
                                    ORDER BY hk, doc_id) AS pos
          FROM h),
    s AS (SELECT epoch, ((pos - 1) * {EPOCH_SHARDS}) // n.n AS shard,
                 doc_id, pos
          FROM r, n)
    SELECT epoch, shard,
           COUNT(*) AS n_docs,
           MIN(pos) AS min_pos,
           MAX(pos) AS max_pos,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM s
    GROUP BY epoch, shard
    ORDER BY epoch, shard
    """,
    description="G17 deterministic epoch shuffle: hash(doc_id, epoch) global "
    "order via distributed rank, position-contiguous shard split, per-shard "
    "composition audit across two epochs",
)
def epoch_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two epochs of the corpus's training order, audited shard by
    shard. Position = exact global rank of the arithmetic hash — NOT a
    single-partition window: `_distributed_rank` (range-bucket local
    ranks + broadcast offsets) keeps the order computation fully
    parallel, which is the point of auditing the production shuffle
    shape rather than calling orderBy and hoping.

    Scale: per epoch, one narrow hash projection, one distributed rank
    (bounded approxQuantile boundary collect, ~#cores bucket offsets
    broadcast), one crossJoin of the single-row corpus count for the
    position->shard split, one map-side-combined groupBy over
    EPOCH_SHARDS groups. Shard sizes differ by at most 1 by
    construction; the sum_doc_id column is the cheap cross-epoch
    composition witness (same shard, different epochs => different
    membership => different sums, while the per-epoch grand total is
    invariant)."""
    from .analytics import _distributed_rank

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n_row = docs.agg(F.count("*").alias("n"))
    per_epoch = []
    for epoch in (0, 1):
        h = docs.select(
            F.lit(epoch).cast("long").alias("epoch"),
            "doc_id",
            F.expr(
                _mulmod32("doc_id", _KNUTH + 2 * _EPOCH_SALT * epoch, "div")
            ).alias("hk"),
        )
        per_epoch.append(_distributed_rank(h, ["hk", "doc_id"], "pos"))
    ranked = per_epoch[0].unionByName(per_epoch[1])
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .select(
            "epoch",
            F.expr(f"((pos - 1) * {EPOCH_SHARDS}) div n").alias("shard"),
            "doc_id",
            "pos",
        )
        .groupBy("epoch", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        )
        .orderBy("epoch", "shard")
    )


# --- Quality-weighted deterministic sampling --------------------------
#
# Soft filtering: instead of a hard keep/drop rule, each document gets a
# keep-rate from its quality tier and survives iff a uniform hash draw
# lands under the rate — the standard way to downsample low-quality
# mass without zeroing it (cf. the quality-classifier sampling in
# CCNet/FineWeb-style pipelines). Deterministic: the "draw" is the
# first 6 md5 hex digits of the doc id, so reruns, engines, and
# cluster sizes all keep exactly the same documents.
QW_RATES_PPM = {0: 1000000, 1: 500000, 2: 125000}  # tier -> keep rate


@register(
    "quality_weighted_sample",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, source, len(toks) AS n,
               len(list_distinct(toks)) AS nd
        FROM (SELECT doc_id, source,
                     string_split_regex(trim(text), '\\s+') AS toks
              FROM documents)),
    t AS (
        SELECT doc_id, source,
               CAST(CASE WHEN n BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS}
                         AND {GOPHER_DISTINCT_DEN} * nd
                             >= {GOPHER_DISTINCT_NUM} * n THEN 0
                    WHEN n BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS}
                         THEN 1
                    ELSE 2 END AS BIGINT) AS tier
        FROM s),
    d AS (
        SELECT source, tier,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                    AS BIGINT) % 1000000 AS draw
        FROM t),
    k AS (
        SELECT source, tier, draw,
               draw < CASE tier WHEN 0 THEN {QW_RATES_PPM[0]}
                                WHEN 1 THEN {QW_RATES_PPM[1]}
                                ELSE {QW_RATES_PPM[2]} END AS kept
        FROM d)
    SELECT source, tier,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) FILTER (kept) AS BIGINT) AS n_kept
    FROM k
    GROUP BY source, tier
    ORDER BY source, tier
    """,
    description="G17 quality-weighted deterministic sampling: 3 quality "
    "tiers from integer rule math, per-tier keep rates applied via an "
    "md5-derived uniform draw — per-(source, tier) kept census",
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiered soft filtering — the downsampling step between a quality
    classifier and the training mix, with a reproducible hash draw in
    place of RNG state.

    Scale: one narrow pass assigns the tier (integer rule math shared
    with the Gopher funnel's thresholds), the draw is a hex-prefix of
    md5(doc_id) reduced mod 1e6 (identical string->int path on both
    engines), and the census is one map-side-combined groupBy over
    |sources| x 3 groups. Nothing but the census crosses a shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    s = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n"),
        F.size(F.array_distinct(toks)).cast("long").alias("nd"),
    )
    in_band = F.col("n").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
    diverse = (
        F.lit(GOPHER_DISTINCT_DEN) * F.col("nd")
        >= F.lit(GOPHER_DISTINCT_NUM) * F.col("n")
    )
    tier = (
        F.when(in_band & diverse, F.lit(0))
        .when(in_band, F.lit(1))
        .otherwise(F.lit(2))
        .cast("long")
    )
    draw = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 1000000
    )
    rate = (
        F.when(tier == 0, QW_RATES_PPM[0])
        .when(tier == 1, QW_RATES_PPM[1])
        .otherwise(QW_RATES_PPM[2])
    )
    return (
        s.select("source", tier.alias("tier"), draw.alias("draw"), rate.alias("rate"))
        .groupBy("source", "tier")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(F.col("draw") < F.col("rate")).alias("n_kept"),
        )
        .orderBy("source", "tier")
    )


# --- Quality-ordered token-budget curation ---------------------------
#
# The selection step a training run actually executes: rank the corpus
# by a quality score, then take documents best-first until a token
# budget is exhausted. The score here is lexical diversity in exact
# integer ppm ((1e6 * distinct_tokens) div n_tokens — the Gopher-funnel
# ratio family), the ordering is total (score desc, doc_id), and the
# cumulative token position comes from the two-pass distributed prefix
# sum (`analytics._distributed_prefix`) — no single-partition window
# anywhere, so the sweep scales to a 100 TB corpus the same way the
# equi-depth decile op does. Budget = total_tokens div 4 (the "keep the
# best quarter" run), computed from the same relation on both engines.

_QUALITY_PREFIX_SQL = """
    WITH q AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+'))
                    AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(string_split_regex(trim(text),
                    '\\s+'))) AS BIGINT) AS nd
        FROM documents),
    r AS (
        SELECT doc_id, source, n_tokens,
               CAST((1000000 * nd) // n_tokens AS BIGINT) AS quality_ppm
        FROM q),
    c AS (
        SELECT r.*,
               SUM(n_tokens) OVER (ORDER BY quality_ppm DESC, doc_id)
                   AS cum_tokens,
               (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM r)
                   AS total_tokens
        FROM r)"""


def _quality_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tokens, quality_ppm) — one compute-bound
    tokenizing pass over the corpus. Callers localCheckpoint it: the
    result is doc-count-sized (tiny next to the text it summarizes) and
    feeds 4+ downstream subtrees (quantile probe, local rank, bucket
    sizes, corpus totals) that would each re-tokenize otherwise
    (measured sf0.1: 3.2 s -> ~1.4 s warm). The raw plan stays guard/
    pin-visible via EXTRA_PLAN_BUILDERS."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = tokens("text")
    return docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("nd"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr("CAST((1000000 * nd) div n_tokens AS BIGINT)").alias(
            "quality_ppm"
        ),
    )


def _quality_token_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tokens, quality_ppm, cum_tokens, total_tokens)
    with cum_tokens = inclusive running token sum in (quality_ppm desc,
    doc_id) order — the shared sweep for the budget-selection and
    curriculum-phase queries. total_tokens rides every row via a
    broadcast 1-row crossJoin (bounded; see BNLJ_OK)."""
    from .analytics import _distributed_prefix

    r = _quality_relation(spark, sf_dir).localCheckpoint(eager=True)
    ranked = _distributed_prefix(
        r.withColumn("neg_q", (-F.col("quality_ppm")).cast("bigint")),
        ["neg_q", "doc_id"],
        {"cum_tokens": "n_tokens"},
    ).drop("neg_q")
    totals = r.agg(F.sum("n_tokens").cast("bigint").alias("total_tokens"))
    return ranked.crossJoin(F.broadcast(totals))


@register(
    "token_budget_selection",
    oracle=_QUALITY_PREFIX_SQL + """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
           CAST(SUM(doc_id) AS BIGINT) AS selected_id_checksum,
           CAST(MIN(quality_ppm) AS BIGINT) AS min_quality_ppm
    FROM c WHERE cum_tokens <= total_tokens // 4
    GROUP BY source ORDER BY source
    """,
    description="G17 curation: quality-ranked greedy selection under a "
    "global token budget (best quarter of corpus tokens) via the "
    "distributed prefix sum — per-source census with selected-id "
    "checksum, fully value-checked",
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy budget curation: documents enter in (quality desc,
    doc_id) order while the INCLUSIVE cumulative token count stays
    within budget — the deterministic 'take the best N tokens' rule.
    The global order is never materialized: `_distributed_prefix`
    range-buckets on the leading score, ranks locally, and offsets by
    the bounded per-bucket totals relation. The census checksums the
    exact survivor id set per source, so the oracle value-checks the
    selection itself, not just its size."""
    c = _quality_token_prefix(spark, sf_dir)
    sel = c.filter(
        F.col("cum_tokens") <= F.expr("total_tokens div 4")
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_selected"),
            F.sum("n_tokens").cast("bigint").alias("tokens_selected"),
            F.sum("doc_id").cast("bigint").alias("selected_id_checksum"),
            F.min("quality_ppm").cast("bigint").alias("min_quality_ppm"),
        )
        .orderBy("source")
    )


@register(
    "curriculum_token_phases",
    oracle=_QUALITY_PREFIX_SQL + """
    SELECT CAST(((cum_tokens - 1) * 4) // total_tokens + 1 AS BIGINT)
               AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS phase_tokens,
           CAST(MIN(quality_ppm) AS BIGINT) AS min_quality_ppm,
           CAST(MAX(quality_ppm) AS BIGINT) AS max_quality_ppm,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM c GROUP BY 1 ORDER BY phase
    """,
    description="G17 curation: curriculum phases — the quality-ordered "
    "corpus split into 4 equal-token-mass training phases via the "
    "distributed prefix sum; per-phase census with id checksum",
)
def curriculum_token_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum scheduling: phase p of 4 contains the docs whose
    inclusive cumulative token position falls in ((p-1)/4, p/4] of the
    corpus token mass, best-quality-first — i.e. phase 1 is the
    cleanest quarter a curriculum trains on first. The phase index is
    closed-form integer arithmetic on (cum_tokens, total_tokens):
    ((cum-1)*4) div total + 1, identical on both engines; the sweep is
    the same distributed prefix as token_budget_selection."""
    c = _quality_token_prefix(spark, sf_dir)
    return (
        c.select(
            "*",
            F.expr(
                "CAST(((cum_tokens - 1) * 4) div total_tokens + 1"
                " AS BIGINT)"
            ).alias("phase"),
        )
        .groupBy("phase")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("phase_tokens"),
            F.min("quality_ppm").cast("bigint").alias("min_quality_ppm"),
            F.max("quality_ppm").cast("bigint").alias("max_quality_ppm"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("phase")
    )


# --- Weighted priority sampling (Duffield–Lund–Thorup) ----------------
#
# The one-pass weighted sample-without-replacement a curation pipeline
# uses to pull a fixed-size, long-document-biased audit set from an
# unbounded corpus: each doc gets priority = weight * 2^32 div u for a
# deterministic md5 uniform u in [1, 2^32], and the sample is the
# top-k by priority — a single TakeOrderedAndProject pass, mergeable
# across partitions/days by construction (keep each side's top-k,
# re-rank). Priorities are pure BIGINT arithmetic (w * 2^32 < 2^63 for
# any document under ~2^31 tokens), so the sampled SET is value-checked
# exactly. (The DLT tau-threshold weight ESTIMATOR is intentionally not
# emitted: tau * u overflows int64 in the general case, and a float
# rendition would break the exact-oracle discipline.)
PRIORITY_SAMPLE_K = 100


@register(
    "priority_sample_weighted",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+'))
                    AS BIGINT) AS w
        FROM documents),
    p AS (
        SELECT doc_id, source, w,
               (w * 4294967296) //
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) + 1) AS pri
        FROM d),
    s AS (SELECT * FROM p ORDER BY pri DESC, doc_id
          LIMIT {PRIORITY_SAMPLE_K}),
    cs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(w) AS BIGINT) AS total_weight
           FROM d GROUP BY source),
    sc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
                  CAST(SUM(w) AS BIGINT) AS weight_sampled,
                  CAST(SUM(doc_id) AS BIGINT) AS sampled_id_checksum
           FROM s GROUP BY source)
    SELECT c.source, c.n_docs, c.total_weight,
           CAST(COALESCE(sc.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(COALESCE(sc.weight_sampled, 0) AS BIGINT)
               AS weight_sampled,
           CAST(COALESCE(sc.sampled_id_checksum, 0) AS BIGINT)
               AS sampled_id_checksum
    FROM cs c LEFT JOIN sc ON sc.source = c.source
    ORDER BY c.source
    """,
    description=f"G17 curation: Duffield-Lund-Thorup weighted priority "
    f"sample (k={PRIORITY_SAMPLE_K}, token-count weights, md5 uniforms, "
    "BIGINT priorities) — one TakeOrderedAndProject pass; per-source "
    "census with sampled-id checksum, value-checked exactly",
)
def priority_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement in one distributed pass:
    pri = w * 2^32 div (md5_32(doc_id) + 1) simulates the w/uniform
    priority draw with a reproducible hash uniform, and top-k by
    (pri desc, doc_id) is the sample — longer documents win
    proportionally more slots, yet the plan is just the pinned
    TakeOrderedAndProject (per-partition heap + driver merge of k
    rows), the cheapest possible shape at 100 TB. The census joins the
    sample back to per-source corpus totals so inclusion bias is
    auditable; the checksum value-checks the exact sampled id set."""
    docs = load_table(spark, sf_dir, "documents")
    d = spread(docs).select(
        "doc_id", "source", F.size(tokens("text")).cast("bigint").alias("w")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    )
    p = d.withColumn("u", u).withColumn(
        "pri", F.expr("(w * 4294967296) div u")
    )
    s = p.orderBy(F.col("pri").desc(), "doc_id").limit(PRIORITY_SAMPLE_K)
    cs = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("total_weight"),
    )
    sc = s.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_sampled"),
        F.sum("w").cast("bigint").alias("weight_sampled"),
        F.sum("doc_id").cast("bigint").alias("sampled_id_checksum"),
    )
    return (
        cs.join(F.broadcast(sc), "source", "left")
        .select(
            "source",
            "n_docs",
            "total_weight",
            F.coalesce("n_sampled", F.lit(0))
            .cast("bigint")
            .alias("n_sampled"),
            F.coalesce("weight_sampled", F.lit(0))
            .cast("bigint")
            .alias("weight_sampled"),
            F.coalesce("sampled_id_checksum", F.lit(0))
            .cast("bigint")
            .alias("sampled_id_checksum"),
        )
        .orderBy("source")
    )


# Pre-checkpoint plan of the shared quality relation (the
# token_budget_selection / curriculum_token_phases input whose eager
# localCheckpoint otherwise truncates it out of guard/pin sight).
EXTRA_PLAN_BUILDERS["token_budget_selection::quality_relation"] = (
    _quality_relation
)
