"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``stream_ingestion_amazon_kinesis_spark``; every operator
registers itself in ``plans.registry`` with its DataFrame callable and
(where SQL-expressible) its DuckDB oracle twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stream_ingestion_amazon_kinesis_spark.plans.registry import all_oracles, all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's ETL core (consumer.py:124-175): sessionize, enrich
    with the three browse-history aggregates, add the processing
    timestamp (T1), route to a destination (T6).
    """
    from pyspark.sql import functions as F

    from stream_ingestion_amazon_kinesis_spark.operators.enrichment import (
        enrich_sessions,
        sessionize_events,
    )

    sessions = sessionize_events(spark, SMOKE_SF_DIR)
    enriched = enrich_sessions(sessions, with_processing_ts=True)
    return enriched.withColumn(
        "route",
        F.when(F.col("overall_in_shopping_cart") > 0, F.lit("cart")).otherwise(
            F.lit("no_cart")
        ),
    ).drop("browse_history")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return all_oracles()
