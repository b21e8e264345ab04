"""UDF surface (SURVEY §2.3 G16): Arrow-vectorized scalar Pandas UDF and
grouped-map applyInPandas, each oracle-checked.

The reference's whole transform is one ad-hoc per-record Python
function (consumer.py:97-175). Here Python is the *exception* path and,
when used, is Arrow-batched: a pandas Series/DataFrame per batch, never
a Python call per row. These two queries exist to pin the UDF plumbing
under the correctness gate; the engine's real operators stay JVM-side.
"""

from __future__ import annotations

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
