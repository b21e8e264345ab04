"""UDF surface (SURVEY §2.3 G16): Arrow-vectorized scalar Pandas UDF and
grouped-map applyInPandas, each oracle-checked.

The reference's whole transform is one ad-hoc per-record Python
function (consumer.py:97-175). Here Python is the *exception* path and,
when used, is Arrow-batched: a pandas Series/DataFrame per batch, never
a Python call per row. These two queries exist to pin the UDF plumbing
under the correctness gate; the engine's real operators stay JVM-side.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table


def _token_count_vec():
    # Defined lazily: decorating with a DDL-string return type resolves
    # it against the active SparkContext, which doesn't exist at import.
    @F.pandas_udf("bigint")
    def token_count_vec(texts: pd.Series) -> pd.Series:
        # str.split() with no pattern splits on runs of whitespace — the
        # same tokenization as the JVM-side split(trim(x), '\\s+').
        return texts.str.strip().str.split().str.len().astype("int64")

    return token_count_vec


@register(
    "pandas_udf_token_count",
    oracle="""
    SELECT lang,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS total_tokens,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    """,
    description="G16 scalar Pandas UDF (Arrow-vectorized) vs JVM tokenizer oracle",
)
def pandas_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", _token_count_vec()(F.col("text")).alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("total_tokens"),
            F.count("*").alias("n_docs"),
        )
    )


def _top3_by_chars(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    ).head(3)
    out = out.assign(rank=range(1, len(out) + 1))
    return out[["lang", "doc_id", "n_chars", "rank"]]


@register(
    "grouped_map_top_docs",
    oracle="""
    SELECT lang, doc_id, n_chars, rank FROM (
        SELECT lang, doc_id, n_chars,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY n_chars DESC, doc_id) AS BIGINT)
                   AS rank
        FROM documents)
    WHERE rank <= 3
    """,
    description="G16 grouped-map applyInPandas (UDTF-alike) vs window-SQL oracle",
)
def grouped_map_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    return docs.groupBy("lang").applyInPandas(
        _top3_by_chars, schema="lang string, doc_id bigint, n_chars bigint, rank bigint"
    )


CHUNK_CHARS = 100


def _context_chunks_udtf():
    # Lazy like _token_count_vec: the DDL return type resolves against
    # the active session. Python UDTF (SURVEY §2.3 G16 "UDTF surface"):
    # one input row fans out to ceil(len/CHUNK_CHARS) chunk rows — the
    # context-window chunking step of a RAG / training-data pipeline.
    import hashlib

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: bigint, chunk_md5: string, chunk_chars: bigint")
    class ContextChunks:
        def eval(self, text: str):
            text = text or ""
            for i in range(0, max(len(text), 1), CHUNK_CHARS):
                piece = text[i : i + CHUNK_CHARS]
                yield (
                    i // CHUNK_CHARS,
                    hashlib.md5(piece.encode("utf-8")).hexdigest(),
                    len(piece),
                )

    return ContextChunks


@register(
    "udtf_context_chunks",
    oracle=f"""
    SELECT doc_id,
           g AS chunk_idx,
           md5(substr(text, CAST(g * {CHUNK_CHARS} + 1 AS INT), {CHUNK_CHARS}))
               AS chunk_md5,
           LEAST({CHUNK_CHARS},
                 CAST(length(text) AS BIGINT) - g * {CHUNK_CHARS})
               AS chunk_chars
    FROM documents,
         UNNEST(generate_series(0, (length(text) - 1) // {CHUNK_CHARS}))
             AS u(g)
    """,
    description="G16 Python UDTF: lateral fan-out of each document into fixed "
    "100-char context chunks, content-hashed so the oracle proves byte parity",
)
def udtf_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one genuinely generative (1->N) Python surface: a table
    function in a LATERAL join. Chunk boundaries index by code point and
    the md5 covers the chunk's UTF-8 bytes, so DuckDB's substr/md5
    reproduce each value exactly. Fan-out happens inside the task that
    holds the row — no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    spark.udtf.register("context_chunks", _context_chunks_udtf())
    docs.select("doc_id", "text").createOrReplaceTempView("udtf_chunk_input")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_md5, c.chunk_chars
        FROM udtf_chunk_input d, LATERAL context_chunks(d.text) c
        """
    )


def _value_spread_agg():
    # Grouped-aggregate pandas UDF (Arrow-batched). max-min over exact
    # 2-decimal inputs is order-independent, so the result is
    # deterministic under any partitioning.
    @F.pandas_udf("double")
    def value_spread(v: pd.Series) -> float:
        # exact: 2-decimal inputs -> integer cents -> one final division
        cents = (v * 100).round().astype("int64")
        return float(int(cents.max() - cents.min()) / 100)

    return value_spread


@register(
    "pandas_grouped_agg_value_spread",
    oracle="""
    SELECT event_type,
           CAST(CAST(MAX(CAST(value AS DECIMAL(12,2)))
                     - MIN(CAST(value AS DECIMAL(12,2))) AS DECIMAL(12,2))
                AS DOUBLE) AS value_spread
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="G16 grouped-aggregate pandas UDF: per-type value range "
    "(max-min) computed in an Arrow-batched Python aggregate — "
    "order-independent math, so the UDF output is oracle-exact",
)
def pandas_grouped_agg_value_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED_AGG pandas UDF surface (the UDAF path of SURVEY
    G16): Spark shuffles by key and hands each group's column to
    Python as one Arrow batch. max-min is chosen deliberately — both
    reductions are exact on 2-decimal doubles and insensitive to
    partial-aggregation order, the property every custom UDAF needs
    before it can face an exact-value oracle. Unlike a pandas_udf
    scalar, GROUPED_AGG cannot do partial aggregation map-side; at
    100 TB prefer the JVM max/min and keep this path for genuinely
    custom reductions."""
    events = load_table(spark, sf_dir, "events")
    spread_udf = _value_spread_agg()
    return (
        events.groupBy("event_type")
        .agg(spread_udf(F.col("value")).alias("value_spread"))
        .orderBy("event_type")
    )


def _order_fill_profile(key, orders_pdf, lines_pdf):
    # Co-grouped applyInPandas keyed by HASH BUCKET, not by order key:
    # one Python call handles a whole bucket of orders with a
    # vectorized merge, so the number of Python invocations is bounded
    # by the bucket count regardless of order cardinality.
    import pandas as _pd

    if orders_pdf.empty:
        return _pd.DataFrame(
            columns=["o_orderkey", "n_lines", "cents_shipped_90d"]
        )
    merged = lines_pdf.merge(
        orders_pdf, left_on="l_orderkey", right_on="o_orderkey", how="right"
    )
    within = merged["l_shipdate"] <= merged["o_orderdate"] + _pd.Timedelta(
        days=90
    )
    # integer cents keeps the per-order sum exact regardless of row order
    merged["cents"] = (
        (merged["l_extendedprice"].where(within & merged["l_shipdate"].notna(), 0.0).fillna(0.0))
        * 100
    ).round().astype("int64")
    g = merged.groupby("o_orderkey", sort=False)
    out = _pd.DataFrame(
        {
            "n_lines": g["l_orderkey"].count(),
            "cents_shipped_90d": g["cents"].sum(),
        }
    ).reset_index()
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["n_lines"] = out["n_lines"].astype("int64")
    return out[["o_orderkey", "n_lines", "cents_shipped_90d"]]


@register(
    "cogroup_order_fill_profile",
    oracle="""
    SELECT o.o_orderkey,
           COUNT(l.l_orderkey) AS n_lines,
           CAST(COALESCE(SUM(CASE WHEN l.l_shipdate
                                       <= o.o_orderdate + INTERVAL 90 DAY
                                  THEN CAST(ROUND(l.l_extendedprice * 100)
                                            AS BIGINT) END), 0) AS BIGINT)
               AS cents_shipped_90d
    FROM orders o
    LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey
    ORDER BY o.o_orderkey
    """,
    description="G16 co-grouped applyInPandas: orders and lineitems "
    "co-shuffled by orderkey, each pair of per-key frames merged in "
    "Arrow-batched pandas — 90-day fulfillment profile in exact "
    "integer cents, oracle = the equivalent outer-join aggregate",
)
def cogroup_order_fill_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-sided applyInPandas surface: `a.groupBy(k).cogroup(
    b.groupBy(k)).applyInPandas(f, schema)` shuffles BOTH relations by
    the key and streams each key's pair of pandas frames through one
    Python call — the escape hatch for per-key logic that genuinely
    needs both sides materialized (here a ship-window profile; in a
    real pipeline, trajectory stitching or feature backfill). The
    cogroup key is a 256-way hash bucket of the order key, NOT the
    order key itself: per-key Python calls would mean one interpreter
    round-trip per order (measured 20x slower), while per-bucket calls
    amortize one vectorized pandas merge over thousands of orders and
    keep the Python invocation count constant at any scale. Money
    flows as integer cents so the sums are exact under any row
    order."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lines = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    out_schema = (
        "o_orderkey bigint, n_lines bigint, cents_shipped_90d bigint"
    )
    return (
        orders.groupBy((F.col("o_orderkey") % 256).alias("bucket"))
        .cogroup(lines.groupBy((F.col("l_orderkey") % 256).alias("bucket")))
        .applyInPandas(_order_fill_profile, out_schema)
        .orderBy("o_orderkey")
    )


def _lang_profile_udtf():
    # Table-argument UDTF (Spark 4 polymorphic TVF): receives WHOLE
    # PARTITIONS of a TABLE(...) input — eval() streams the partition's
    # rows, terminate() emits the per-partition summary. The stateful
    # accumulate-then-emit lifecycle that a scalar UDF cannot express.
    from pyspark.sql.functions import udtf
    from pyspark.sql import Row

    @udtf(returnType="lang: string, n_docs: bigint, total_chars: bigint, "
                     "max_chars: bigint")
    class LangProfile:
        def __init__(self):
            self.lang = None
            self.n = 0
            self.total = 0
            self.mx = 0

        def eval(self, row: Row):
            self.lang = row["lang"]
            self.n += 1
            c = int(row["n_chars"])
            self.total += c
            self.mx = max(self.mx, c)

        def terminate(self):
            if self.n:
                yield (self.lang, self.n, self.total, self.mx)

    return LangProfile


@register(
    "udtf_table_arg_lang_profile",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    description="G16 table-argument UDTF: TABLE(docs) PARTITION BY lang "
    "streams whole partitions through eval(), terminate() emits one "
    "summary row per partition — the accumulate/emit lifecycle, "
    "order-independent math so the oracle is exact",
)
def udtf_table_arg_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The polymorphic table-valued-function surface: the UDTF is
    invoked as `lang_profile(TABLE(docs) PARTITION BY lang)`, so Spark
    shuffles by lang and hands each partition's rows to one UDTF
    instance — per-group custom logic WITHOUT collect_list buffering or
    applyInPandas frame materialization (rows stream through eval one
    at a time; memory is O(state), not O(partition)). All accumulators
    here are order-independent (count/sum/max over ints), which is
    what makes the Python path oracle-exact."""
    docs = load_table(spark, sf_dir, "documents")
    spark.udtf.register("lang_profile", _lang_profile_udtf())
    docs.select("lang", "n_chars").createOrReplaceTempView("udtf_lang_input")
    return spark.sql(
        """
        SELECT lang, n_docs, total_chars, max_chars
        FROM lang_profile(TABLE(udtf_lang_input) PARTITION BY lang)
        ORDER BY lang
        """
    )


@register(
    "pandas_api_on_spark_priority_stats",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS max_cents
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="pandas API on Spark (pyspark.pandas): the dataframe-"
    "idiom surface (groupby/agg/sort_index) compiling to the same "
    "Catalyst plan — exact integer cents so the pandas-style path is "
    "held to the same bit-exact oracle as the native API",
)
def pandas_api_on_spark_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas-dialect API, verified against the SQL oracle.

    `DataFrame.pandas_api()` wraps the distributed frame in the pandas
    API on Spark; groupby/agg lower to the identical HashAggregate a
    native groupBy produces (no data leaves the JVM), and `.to_spark()`
    returns to the native API for the contract-stable result. Money is
    converted to exact integer cents BEFORE entering the pandas-style
    aggregation so the result is partition-order-free.
    """
    from ..functions.numeric import money

    orders = load_table(spark, sf_dir, "orders")
    with_cents = orders.select(
        "o_orderpriority", (money("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    psdf = with_cents.pandas_api()
    agg = psdf.groupby("o_orderpriority").agg(
        n=("cents", "count"), total_cents=("cents", "sum"), max_cents=("cents", "max")
    )
    out = agg.reset_index().to_spark()
    return out.select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n"),
        F.col("total_cents").cast("bigint").alias("total_cents"),
        F.col("max_cents").cast("bigint").alias("max_cents"),
    ).orderBy("o_orderpriority")


def _unpivot_numeric_udtf():
    """Polymorphic UDTF: output schema COMPUTED from the input table's
    schema by the Spark 4 `analyze()` static hook — the key column is
    carried through under its own name and every integral/floating
    column melts to (column_name, value_cents) rows. No schema is
    hardcoded: point it at a different table and analyze() re-derives
    the plan-time schema."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class UnpivotNumeric:
        @staticmethod
        def analyze(table: AnalyzeArgument) -> AnalyzeResult:
            fields = table.dataType.fields
            key = fields[0]
            return AnalyzeResult(
                schema=StructType(
                    [
                        StructField(key.name, key.dataType),
                        StructField("column_name", StringType()),
                        StructField("value_cents", LongType()),
                    ]
                )
            )

        def eval(self, row):
            d = row.asDict()
            items = list(d.items())
            key_val = items[0][1]
            for name, v in items[1:]:
                if isinstance(v, bool) or v is None:
                    continue
                if isinstance(v, int):
                    yield key_val, name, int(v) * 100
                elif isinstance(v, float):
                    # <=2dp money-style doubles -> exact cents
                    yield key_val, name, int(round(v * 100))

    return udtf(UnpivotNumeric)


@register(
    "udtf_analyze_unpivot_orders",
    oracle="""
    SELECT o_orderkey, 'o_custkey' AS column_name,
           CAST(o_custkey * 100 AS BIGINT) AS value_cents
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey, 'o_totalprice' AS column_name,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
    FROM orders WHERE o_orderkey % 10 = 0
    ORDER BY o_orderkey, column_name
    """,
    description="G16 polymorphic UDTF via the Spark 4 analyze() hook: "
    "the output schema is derived at PLAN time from the input table's "
    "schema (key column kept under its own name, numeric columns melted "
    "to rows) — schema-computing table functions, one step beyond the "
    "fixed-schema TABLE(...) UDTF",
)
def udtf_analyze_unpivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-polymorphic melt driven by analyze().

    The same registered function works on ANY keyed table — analyze()
    inspects the TABLE argument's StructType during planning and
    returns the derived output schema, so Catalyst sees concrete types
    (no runtime surprises, full pushdown below the UDTF). Fan-out
    happens row-local in the task; the ORDER BY is presentation only.
    """
    # 10% systematic sample: the row is about the analyze() surface —
    # per-row Python eval over the full fact table adds nothing.
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    spark.udtf.register("unpivot_numeric", _unpivot_numeric_udtf())
    orders.createOrReplaceTempView("udtf_unpivot_input")
    return spark.sql(
        """
        SELECT * FROM unpivot_numeric(TABLE(udtf_unpivot_input))
        ORDER BY o_orderkey, column_name
        """
    )


@register(
    "arrow_grouped_extremes_profile",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents,
           CAST(MAX(cents) - MIN(cents) AS BIGINT) AS range_cents
    FROM e GROUP BY event_type
    ORDER BY event_type
    """,
    description="G16 applyInArrow grouped map: per-group extremes "
    "computed in raw pyarrow (RecordBatch in, Table out — no pandas "
    "conversion layer), the zero-copy grouped-map entry point next to "
    "applyInPandas; exact integer cents so the Arrow path is held to "
    "the same oracle",
)
def arrow_grouped_extremes_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pyarrow-native grouped map (applyInArrow).

    applyInPandas pays the Arrow->pandas conversion both ways;
    applyInArrow hands the group over as a pyarrow.Table and takes one
    back — the right entry point when the UDF body is itself
    Arrow/numpy-native (compute kernels here). Group key cardinality
    (5 types) bounds Python invocations; per-group work is vectorized
    pyarrow.compute.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.numeric import money

    events = load_table(spark, sf_dir, "events").select(
        "event_type", (money("value") * 100).cast("bigint").alias("cents")
    )

    def extremes(table: pa.Table) -> pa.Table:
        cents = table.column("cents")
        mn = pc.min(cents).as_py()
        mx = pc.max(cents).as_py()
        return pa.table(
            {
                "event_type": [table.column("event_type")[0].as_py()],
                "n": [table.num_rows],
                "min_cents": [mn],
                "max_cents": [mx],
                "range_cents": [mx - mn],
            }
        )

    out = events.groupBy("event_type").applyInArrow(
        extremes,
        schema="event_type string, n bigint, min_cents bigint, "
        "max_cents bigint, range_cents bigint",
    )
    return out.orderBy("event_type")


@register(
    "pandas_iter_udf_value_buckets",
    oracle="""
    WITH e AS (
        SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events),
    b AS (
        SELECT CASE WHEN cents < 1000 THEN 0
                    WHEN cents < 5000 THEN 1
                    WHEN cents < 20000 THEN 2
                    WHEN cents < 50000 THEN 3
                    ELSE 4 END AS bucket
        FROM e)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket
    ORDER BY bucket
    """,
    description="G16 iterator pandas UDF (SCALAR_ITER): the once-per-"
    "worker-initialization variant — the bucketing table is 'loaded' "
    "once before the batch loop (the slot where a real pipeline loads "
    "a model/tokenizer), then every Arrow batch streams through it; "
    "completes the pandas-UDF matrix (scalar, scalar-iter, grouped-agg, "
    "grouped-map, cogrouped, mapInPandas, mapInArrow, applyInArrow)",
)
def pandas_iter_udf_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR_ITER pandas UDF: amortized per-worker setup.

    A plain scalar pandas UDF re-enters Python per batch with no place
    to hang expensive initialization; the iterator form runs ONCE per
    task, does its setup (here: build the bucket edges — stand-in for
    loading a tokenizer/model), then iterates the batch stream. Exact
    integer cents in, integer buckets out, so the Python path is
    oracle-checked like everything else.
    """
    from pyspark.sql.functions import pandas_udf

    from ..functions.numeric import money

    @pandas_udf("long")
    def bucketize(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # once-per-task setup (the model-load slot)
        import numpy as np

        edges = np.array([1000, 5000, 20000, 50000], dtype="int64")
        for cents in batches:
            yield pd.Series(
                np.searchsorted(edges, cents.to_numpy(), side="right")
            )

    events = load_table(spark, sf_dir, "events").select(
        (money("value") * 100).cast("bigint").alias("cents")
    )
    return (
        events.select(bucketize("cents").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


@register(
    "sql_registered_udf_digit_census",
    oracle="""
    WITH ds AS (
        SELECT (o_orderkey // 1 % 10) + (o_orderkey // 10 % 10)
             + (o_orderkey // 100 % 10) + (o_orderkey // 1000 % 10)
             + (o_orderkey // 10000 % 10) + (o_orderkey // 100000 % 10)
             + (o_orderkey // 1000000 % 10) + (o_orderkey // 10000000 % 10)
             + (o_orderkey // 100000000 % 10)
             + (o_orderkey // 1000000000 % 10)
             + (o_orderkey // 10000000000 % 10)
             + (o_orderkey // 100000000000 % 10) AS digit_sum
        FROM orders)
    SELECT CAST(digit_sum AS INT) AS digit_sum,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ds
    GROUP BY 1
    ORDER BY digit_sum
    """,
    description="G16 SQL-side UDF registration: a pandas_udf registered "
    "with spark.udf.register and invoked from spark.sql text — the "
    "digit-sum census of order keys, with the oracle spelling out the "
    "same arithmetic natively (12-digit mod/div unroll)",
)
def sql_registered_udf_digit_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`spark.udf.register` + SQL invocation — the UDF surface a SQL
    user (not a DataFrame user) reaches for.

    The UDF body is vectorized pandas (one Arrow batch per call, no
    per-row Python), and the query around it is plain SQL — showing
    registered UDFs compose with the rest of the engine. The census
    group key is bounded (max digit sum for 12 digits is 108), so the
    aggregate is a tiny hash agg after the one projection pass.
    """
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def digit_sum(keys: pd.Series) -> pd.Series:
        total = pd.Series(0, index=keys.index, dtype="int64")
        k = keys.astype("int64")
        for _ in range(12):
            total += k % 10
            k = k // 10
        return total

    spark.udf.register("digit_sum", digit_sum)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("udf_orders")
    return spark.sql(
        """
        SELECT CAST(digit_sum(o_orderkey) AS INT) AS digit_sum,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM udf_orders
        GROUP BY 1
        ORDER BY digit_sum
        """
    )
