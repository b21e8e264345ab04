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


def test_small_file_compaction(spark, sf_dir, tmp_path):
    """The small-files problem: a fragmented write (many tiny files) is
    compacted by a repartition rewrite; row content is preserved exactly
    and the file count collapses to the target. At 100 TB this is the
    maintenance job that keeps scan task counts sane."""
    import os

    from pyspark.sql import functions as F

    from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    frag = str(tmp_path / "fragmented")
    events.repartition(64).write.mode("overwrite").parquet(frag)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_frag >= 32  # genuinely fragmented

    compacted = str(tmp_path / "compacted")
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(compacted)
    n_comp = len([f for f in os.listdir(compacted) if f.endswith(".parquet")])
    assert n_comp == 4

    a = spark.read.parquet(frag)
    b = spark.read.parquet(compacted)
    assert a.count() == b.count() == events.count()
    # exact content equality via order-insensitive digest
    dig = lambda df: df.select(
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")).alias("d")
    ).collect()[0].d
    assert dig(a) == dig(b)
