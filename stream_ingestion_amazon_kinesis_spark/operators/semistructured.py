"""Semi-structured data via Spark 4's VARIANT type (SURVEY §2.3 G11/S3).

The reference decodes every Kinesis record with a row-at-a-time
``json.loads`` and then pokes at dynamic fields (consumer.py:118,
135-158). The engine's first-class answer is `from_json` with an
explicit schema (sources/json_source.py, enrichment.json_props_extract);
VARIANT is the schema-ON-READ complement for payloads whose shape isn't
known up front: `parse_json` keeps the value in a binary columnar
encoding, `variant_get` extracts typed paths lazily, and
`try_variant_get` turns per-record type surprises into NULLs instead of
job failures — the same drop-with-log error contract the reference
implements by hand (consumer.py:179-186).

The fixture's `props` column is uniform, so the query manufactures the
dynamic-typing problem VARIANT exists for: half the records carry
``{"k": <int>}`` and half ``{"k": "<int>"}`` (string-typed), split by
event parity. `variant_get` deliberately casts across stored types, so
the stored type is witnessed with per-row `schema_of_variant` — the
int-typed sum, the string-typed count, and the type-blind sum are all
checked exactly against a DuckDB oracle computing the same split from
the raw JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..plans.registry import register
from ..sources.catalog import load_table


@register(
    "variant_props_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN event_id % 2 = 0
                         THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                    END) AS BIGINT) AS sum_k_int,
           CAST(COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS BIGINT)
               AS n_str_typed,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k_any
    FROM events
    GROUP BY event_type
    """,
    description="G11 VARIANT path: parse_json on mixed-typed payloads, "
    "variant_get typed extraction with try-semantics for type mismatches",
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    # Rebuild the payload with a per-row dynamic type for k: ints on
    # even event_ids, JSON strings on odd — the shape drift VARIANT
    # absorbs without a schema change.
    dynamic_json = F.concat(
        F.lit('{"k": '),
        F.when(F.col("event_id") % 2 == 0, k).otherwise(
            F.concat(F.lit('"'), k, F.lit('"'))
        ),
        F.lit("}"),
    )
    v = events.select(
        "event_id", "event_type", F.parse_json(dynamic_json).alias("v")
    )
    # variant_get CASTS across stored types (string "87" -> 87), so the
    # stored type itself is read via per-row schema introspection —
    # that's the VARIANT contract: values are dynamically typed, and
    # schema_of_variant is the runtime type witness.
    sch = F.schema_of_variant("v")
    k_any = F.try_variant_get("v", "$.k", "string").cast("bigint")
    int_typed = sch == "OBJECT<k: BIGINT>"
    str_typed = sch == "OBJECT<k: STRING>"
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.when(int_typed, k_any)).alias("sum_k_int"),
        F.count(F.when(str_typed, 1)).alias("n_str_typed"),
        F.sum(k_any).alias("sum_k_any"),
    )


@register(
    "variant_schema_profile",
    oracle="""
    SELECT 'OBJECT<k: BIGINT>' AS variant_schema,
           CAST(COUNT(*) AS BIGINT) AS n_records
    FROM events
    """,
    description="G11 VARIANT introspection: schema_of_variant_agg summarizes "
    "the merged runtime shape of a payload column",
)
def variant_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema discovery over a dynamic column — the batch answer to "what
    is actually inside these payloads?" before committing to a read
    schema. `schema_of_variant_agg` merges every record's runtime type
    into one DDL string in a single map-side-combined aggregate; on the
    uniform fixture payloads it is OBJECT<k: BIGINT> by construction
    (the oracle pins the literal, so a fixture drift fails loudly)."""
    events = load_table(spark, sf_dir, "events")
    v = events.select(F.parse_json("props").alias("v"))
    return v.agg(
        F.schema_of_variant_agg("v").alias("variant_schema"),
        F.count("*").alias("n_records"),
    )


@register(
    "variant_explode_props",
    oracle="""
    WITH kv AS (
        SELECT unnest(json_keys(props)) AS prop_key, props FROM events
    )
    SELECT prop_key,
           COUNT(*) AS n,
           CAST(MIN(CAST(json_extract(props, '$.' || prop_key) AS BIGINT))
                AS BIGINT) AS min_v,
           CAST(MAX(CAST(json_extract(props, '$.' || prop_key) AS BIGINT))
                AS BIGINT) AS max_v
    FROM kv
    GROUP BY prop_key
    ORDER BY prop_key
    """,
    description="G11 VARIANT lateral expansion: variant_explode fans each "
    "payload object out to (key, value) rows without a declared schema — "
    "the generic path for profiling unknown payload shapes; grouped back "
    "into a per-key presence + value-range profile",
)
def variant_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`variant_explode` is a table-valued generator (a LATERAL join in
    the plan): each record yields one row per object field, keys read
    from the variant's metadata dictionary — no schema declared anywhere.
    The profile aggregate is an ordinary map-side-combined hash agg, so
    the whole thing is one narrow pass + one bounded-key shuffle no
    matter how wide the payloads get."""
    events = load_table(spark, sf_dir, "events")
    v = events.select(F.parse_json("props").alias("v"))
    v.createOrReplaceTempView("_variant_props_rel")
    exploded = spark.sql(
        """
        SELECT ve.key AS prop_key,
               CAST(ve.value AS BIGINT) AS val
        FROM _variant_props_rel, LATERAL variant_explode(v) ve
        """
    )
    return (
        exploded.groupBy("prop_key")
        .agg(
            F.count("*").alias("n"),
            F.min("val").alias("min_v"),
            F.max("val").alias("max_v"),
        )
        .orderBy("prop_key")
    )


def _register_explode_outer_pin() -> None:
    from ..functions.text import tokens as _tokens

    @register(
        "explode_outer_semantics_pin",
        oracle="""
        WITH t AS (
            SELECT doc_id, source,
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> length(x) > 8) AS longs
            FROM documents)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(longs)) AS BIGINT) AS n_inner_rows,
               CAST(SUM(GREATEST(len(longs), 1)) AS BIGINT) AS n_outer_rows,
               CAST(COUNT(CASE WHEN len(longs) = 0 THEN 1 END) AS BIGINT)
                   AS n_docs_dropped_by_inner
        FROM t GROUP BY source
        ORDER BY source
        """,
        description="G11 generator-semantics pin: explode drops rows whose "
        "array is empty while explode_outer keeps them as NULL — the "
        "silent-row-loss trap in token pipelines, counted per source "
        "(inner rows = sum of lengths; outer rows = max(length, 1))",
    )
    def explode_outer_semantics_pin(spark, sf_dir):
        """explode vs explode_outer row accounting, pinned.

        A doc whose filtered token array is empty vanishes under
        `explode` — in a quality pipeline that silently deletes
        documents rather than scoring them zero. The engine counts both
        behaviors from the REAL generators (not arithmetic identities):
        an inner explode count and an outer explode count, which must
        reconcile with the closed-form sums the oracle computes. Both
        generators run in the same narrow projection — no shuffle until
        the rollup.
        """
        from pyspark.sql import functions as F

        docs = load_table(spark, sf_dir, "documents")
        longs = F.filter(_tokens("text"), lambda x: F.length(x) > 8)
        base = docs.select("doc_id", "source", longs.alias("longs"))
        inner = (
            base.select("doc_id", "source", F.explode("longs").alias("tok"))
            .groupBy("source")
            .agg(F.count("*").alias("n_inner_rows"))
        )
        outer = (
            base.select(
                "doc_id", "source", F.explode_outer("longs").alias("tok")
            )
            .groupBy("source")
            .agg(
                F.count("*").alias("n_outer_rows"),
                F.sum(F.when(F.col("tok").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_docs_dropped_by_inner"),
            )
        )
        n_docs = base.groupBy("source").agg(F.count("*").alias("n_docs"))
        return (
            n_docs.join(inner, "source", "left")
            .join(outer, "source")
            .select(
                "source",
                "n_docs",
                F.coalesce("n_inner_rows", F.lit(0))
                .cast("bigint")
                .alias("n_inner_rows"),
                F.col("n_outer_rows").cast("bigint").alias("n_outer_rows"),
                "n_docs_dropped_by_inner",
            )
            .orderBy("source")
        )


_register_explode_outer_pin()


@register(
    "posexplode_ordinality_pin",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
        FROM documents WHERE trim(text) <> ''),
    pos AS (
        SELECT l[i] AS token, i - 1 AS pos
        FROM toks, generate_series(1, 3) g(i)
        WHERE i <= len(l))
    SELECT CAST(pos AS INT) AS pos, token,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pos
    GROUP BY pos, token
    HAVING COUNT(*) >= 5
    ORDER BY pos, n DESC, token
    """,
    description="G11/G16 posexplode ordinality pin: the first three "
    "token positions of every document, exploded WITH position — "
    "Spark's 0-based posexplode is aligned against DuckDB's 1-based "
    "list indexing (no WITH ORDINALITY in this build), rolled up to a "
    "positional token histogram",
)
def posexplode_ordinality_pin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode semantics, pinned.

    `posexplode(slice(tokens, 1, 3))` keeps the generator bounded (3
    rows per document, never |tokens|), so the exploded relation is
    3x|documents| regardless of document length — the safe shape for
    positional n-gram features at corpus scale. DuckDB lacks WITH
    ORDINALITY; the oracle cross-joins a constant generate_series and
    filters by list length, which is the same bounded expansion.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.trim("text") != "").select(
        tokens(F.col("text")).alias("l")
    )
    pos = toks.select(
        F.posexplode(F.slice("l", 1, 3)).alias("pos", "token")
    )
    return (
        pos.groupBy(F.col("pos").cast("int").alias("pos"), "token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
        .orderBy("pos", F.desc("n"), "token")
    )


@register(
    "array_set_algebra_pin",
    oracle="""
    WITH t AS (
        SELECT lang,
               list_distinct(string_split_regex(trim(text), '\\s+')) AS toks
        FROM documents WHERE trim(text) <> ''),
    x AS (
        SELECT lang,
               len(list_distinct(list_concat(toks,
                   ['spark', 'data', 'zzz_never']))) AS n_union,
               len(list_filter(toks,
                   t -> list_contains(['spark', 'data', 'zzz_never'], t)))
                   AS n_intersect,
               len(list_filter(toks,
                   t -> NOT list_contains(['spark', 'data', 'zzz_never'], t)))
                   AS n_except
        FROM t)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_union) AS BIGINT) AS total_union,
           CAST(SUM(n_intersect) AS BIGINT) AS total_intersect,
           CAST(SUM(n_except) AS BIGINT) AS total_except
    FROM x
    GROUP BY lang
    ORDER BY lang
    """,
    description="G11 array set algebra pin: array_union / "
    "array_intersect / array_except of each document's distinct token "
    "set against a constant keyword set — all three DEDUPLICATE their "
    "result (set semantics, not bag), which the summed sizes prove; "
    "DuckDB spells them as list_distinct/list_filter compositions",
)
def array_set_algebra_pin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set semantics of the array_* algebra, pinned by cardinality.

    The identity checked at volume: |A ∪ K| = |A| + |K \\ A| and
    |A ∩ K| + |A \\ K| = |A| for DISTINCT token sets A — only true
    because Spark's array set functions dedupe. One JVM projection
    pass, a |langs|-row agg.
    """
    kw = F.array(F.lit("spark"), F.lit("data"), F.lit("zzz_never"))
    docs = load_table(spark, sf_dir, "documents")
    t = docs.filter(F.trim("text") != "").select(
        "lang", F.array_distinct(tokens(F.col("text"))).alias("toks")
    )
    x = t.select(
        "lang",
        F.size(F.array_union("toks", kw)).alias("n_union"),
        F.size(F.array_intersect("toks", kw)).alias("n_intersect"),
        F.size(F.array_except("toks", kw)).alias("n_except"),
    )
    return (
        x.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_union").cast("bigint").alias("total_union"),
            F.sum("n_intersect").cast("bigint").alias("total_intersect"),
            F.sum("n_except").cast("bigint").alias("total_except"),
        )
        .orderBy("lang")
    )


@register(
    "lateral_view_explode_sql",
    oracle="""
    WITH toks AS (
        SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents WHERE trim(text) <> '')
    SELECT lang,
           CAST(length(tok) AS INT) AS tok_len,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM toks
    WHERE length(tok) <= 8
    GROUP BY lang, tok_len
    ORDER BY lang, tok_len
    """,
    description="G11/G16 Hive-style LATERAL VIEW explode SQL syntax "
    "(the text twin of the DataFrame explode rows): token-length "
    "census per language from an exploded tokenizer, capped at length "
    "8 — the generator-in-FROM-clause surface SQL users migrate in "
    "with",
)
def lateral_view_explode_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode — the Hive-compat generator syntax.

    Catalyst plans this identically to the DataFrame explode (one
    Generate node feeding a partial-aggregated count), so the syntax
    carries zero cost; the census itself is bounded by |langs| x 8
    groups.
    """
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "lv_documents"
    )
    return spark.sql(
        r"""
        SELECT lang, CAST(length(tok) AS INT) AS tok_len,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lv_documents
        LATERAL VIEW explode(split(trim(text), '\\s+')) t AS tok
        WHERE trim(text) <> '' AND length(tok) <= 8
        GROUP BY lang, length(tok)
        ORDER BY lang, tok_len
        """
    )
