"""Compaction: fewer files, identical rows, crash-safe swap."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table
from stream_ingestion_amazon_kinesis_spark.sources.compaction import (
    compact_parquet_dir,
    count_parquet_files,
)


def test_compaction_preserves_rows_and_reduces_files(spark, sf_dir):
    path = os.path.join(tempfile.mkdtemp(prefix="compact_"), "events")
    events = load_table(spark, sf_dir, "events")
    # fragment: 40 small files
    events.repartition(40).write.parquet(path)
    before_files = count_parquet_files(path)
    before = events.count()
    before_sum = events.agg(
        F.sum(F.col("event_id")).alias("s")
    ).collect()[0].s

    after_files = compact_parquet_dir(
        spark, path, target_bytes=1 << 30, sort_col="ts"
    )

    assert after_files < before_files
    assert after_files == 1  # tiny fixture fits one target file
    got = spark.read.parquet(path)
    assert got.count() == before
    assert got.agg(F.sum("event_id").alias("s")).collect()[0].s == before_sum
    # sorted-within-file: each file's ts range is tight (single file -> trivially)
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")
