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
