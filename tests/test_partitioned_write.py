"""Partitioned parquet write path (SURVEY §2.3 G1 write side):
directory layout, value roundtrip, and — the part that matters at
100 TB — partition PRUNING: a filter on the partition column must reach
the scan as a PartitionFilter so non-matching directories are never
opened.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table
from stream_ingestion_amazon_kinesis_spark.sources.file_formats import (
    partitioned_orders_path,
)


def test_partitioned_layout_and_roundtrip(spark, sf_dir):
    path = partitioned_orders_path(spark, sf_dir)
    subdirs = {d for d in os.listdir(path) if d.startswith("o_orderpriority=")}
    orig = load_table(spark, sf_dir, "orders")
    priorities = {
        f"o_orderpriority={r[0]}"
        for r in orig.select("o_orderpriority").distinct().collect()
    }
    assert subdirs == priorities

    back = spark.read.parquet(path)
    assert back.count() == orig.count()
    # Values survive the roundtrip (orderkey sum is a cheap full checksum).
    assert (
        back.agg(F.sum("o_orderkey")).first()[0]
        == orig.agg(F.sum("o_orderkey")).first()[0]
    )


def test_partition_filter_reaches_scan(spark, sf_dir):
    path = partitioned_orders_path(spark, sf_dir)
    pruned = spark.read.parquet(path).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # The predicate must appear as a PartitionFilter on the scan (pruning
    # whole directories), NOT as a post-scan Filter over all partitions.
    assert "PartitionFilters" in plan
    assert "1-URGENT" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
