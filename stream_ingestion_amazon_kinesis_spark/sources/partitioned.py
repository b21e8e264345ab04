"""Partitioned-layout writes and partition-pruned reads.

At 100 TB the single most important scan optimization is never reading
most of the data: lay fact tables out partitioned by a coarse time/key
column (`write.partitionBy`), and predicates on that column prune whole
directories at planning time (`PartitionFilters` in the scan node,
distinct from row-group `PushedFilters`). These helpers produce and
consume that layout; tests assert the pruning actually happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_month(
    df: DataFrame, ts_col: str, path: str, mode: str = "overwrite"
) -> None:
    """Write with a derived `part_month` directory column (yyyy-MM).
    The derived column stays IN the data as a partition column, so
    readers filter on it without touching the payload columns."""
    (
        df.withColumn("part_month", F.date_format(F.col(ts_col), "yyyy-MM"))
        .write.partitionBy("part_month")
        .mode(mode)
        .parquet(path)
    )


def read_month(spark: SparkSession, path: str, month: str) -> DataFrame:
    """Scan exactly one month partition — the filter binds to the
    directory structure, not the file contents."""
    return spark.read.parquet(path).filter(F.col("part_month") == month)
