"""State Data Source: batch reads of streaming checkpoints, metadata,
and batchId time travel."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.streaming.state_reader import (
    read_state_metadata,
    read_state_store,
)


def _run_batch(spark, src_dir: str, ckpt: str, df) -> None:
    df.write.mode("append").json(src_dir)
    stream = spark.readStream.schema("k string, v long").json(src_dir)
    q = (
        stream.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"))
        .writeStream.format("noop")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_state_reader_matches_batch_and_time_travels(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    batch0 = spark.createDataFrame([("a", 1), ("a", 2), ("b", 10)], "k string, v long")
    batch1 = spark.createDataFrame([("a", 4), ("c", 7)], "k string, v long")

    _run_batch(spark, src, ckpt, batch0)
    _run_batch(spark, src, ckpt, batch1)

    # latest state == batch recompute over ALL input
    latest = {
        r.k: (r.n, r.sum_v)
        for r in read_state_store(spark, ckpt)
        .select(
            F.col("key.k").alias("k"),
            F.col("value.count").alias("n"),
            F.col("value.sum").alias("sum_v"),
        )
        .collect()
    }
    assert latest == {"a": (3, 7), "b": (1, 10), "c": (1, 7)}

    # time travel: state as of batch 0 has no key c and fewer a's
    asof0 = {
        r.k: (r.n, r.sum_v)
        for r in read_state_store(spark, ckpt, batch_id=0)
        .select(
            F.col("key.k").alias("k"),
            F.col("value.count").alias("n"),
            F.col("value.sum").alias("sum_v"),
        )
        .collect()
    }
    assert asof0 == {"a": (2, 3), "b": (1, 10)}


def test_state_metadata_describes_operator(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _run_batch(
        spark,
        src,
        ckpt,
        spark.createDataFrame([("a", 1)], "k string, v long"),
    )
    md = read_state_metadata(spark, ckpt).collect()
    assert len(md) == 1
    row = md[0]
    assert row.operatorName == "stateStoreSave"
    assert row.numPartitions > 0
    assert row.minBatchId == 0
