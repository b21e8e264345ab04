"""Partition pruning, progress listener (S10 parity), idempotent sink."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table
from stream_ingestion_amazon_kinesis_spark.sources.partitioned import (
    read_month,
    write_partitioned_by_month,
)
from stream_ingestion_amazon_kinesis_spark.streaming.idempotent_sink import (
    committed_epoch_dirs,
    idempotent_epoch_sink,
)
from stream_ingestion_amazon_kinesis_spark.streaming.observability import (
    attach_progress_log,
)
from stream_ingestion_amazon_kinesis_spark.streaming.pipeline import (
    read_event_stream,
)


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_month")
    write_partitioned_by_month(orders, "o_orderdate", path)

    one_month = read_month(spark, path, "1998-03")
    plan = one_month._jdf.queryExecution().executedPlan().toString()
    # the month predicate binds to directories (PartitionFilters), not
    # to parquet row groups (PushedFilters)
    assert "PartitionFilters: [isnotnull(part_month" in plan
    expected = orders.filter(
        (F.col("o_orderdate") >= "1998-03-01") & (F.col("o_orderdate") < "1998-04-01")
    ).count()
    assert one_month.count() == expected


def test_progress_listener_sees_batches(spark, sf_dir, tmp_path):
    d = str(tmp_path / "ev")
    events = load_table(spark, sf_dir, "events").limit(100)
    events.select(F.to_json(F.struct(*events.columns)).alias("value")).write.text(d)

    log, listener = attach_progress_log(spark)
    try:
        q = (
            read_event_stream(spark, d)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # listener events are delivered asynchronously
        for _ in range(40):
            if log.total_rows >= 100:
                break
            time.sleep(0.25)
        assert log.total_rows == 100
        assert all(b["batch_id"] is not None for b in log.batches)
        # End-to-end latency metric (reference's published operating
        # characteristic is 5-7 MINUTES to S3 visibility, README.md:580):
        # every micro-batch's trigger-to-commit latency is recorded,
        # positive, and far under that bound on local volume.
        lat = log.trigger_to_commit_ms
        assert lat, "no trigger-to-commit latencies recorded"
        assert all(0 < ms < 60_000 for ms in lat), lat
        assert log.max_latency_ms == max(lat)
    finally:
        spark.streams.removeListener(listener)


def test_observe_batch_metrics_ride_the_job(spark, sf_dir):
    from stream_ingestion_amazon_kinesis_spark.streaming.observability import (
        observe_batch,
    )

    events = load_table(spark, sf_dir, "events")
    df = events.withColumn(
        "maybe_null", F.when(F.col("event_id") % 10 == 0, None).otherwise(F.col("user_id"))
    )
    observed, obs = observe_batch(df, key_col="maybe_null")
    n = observed.count()
    got = obs.get
    assert got["n_rows"] == n
    assert got["n_null_keys"] == events.filter(F.col("event_id") % 10 == 0).count()


def test_observe_streaming_metrics_in_progress(spark, sf_dir, tmp_path):
    from stream_ingestion_amazon_kinesis_spark.streaming.observability import (
        with_quality_metrics,
    )

    d = str(tmp_path / "ev_obs")
    events = load_table(spark, sf_dir, "events").limit(80)
    events.select(F.to_json(F.struct(*events.columns)).alias("value")).write.text(d)

    stream = with_quality_metrics(
        read_event_stream(spark, d), name="quality", key_col="user_id"
    )
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt_obs"))
        .start()
    )
    q.processAllAvailable()
    seen = [
        p["observedMetrics"]["quality"]
        for p in q.recentProgress
        if "quality" in (p.get("observedMetrics") or {})
    ]
    q.stop()
    assert sum(m["n_rows"] for m in seen) == 80
    assert all(m["n_null_keys"] == 0 for m in seen)


def test_idempotent_sink_skips_retried_epoch(spark, sf_dir, tmp_path):
    out = str(tmp_path / "epochs")
    sink = idempotent_epoch_sink(out)
    batch = load_table(spark, sf_dir, "events").limit(10)
    sink(batch, epoch_id=7)
    first_mtime = os.path.getmtime(os.path.join(out, "epoch=7", "_COMMITTED"))
    # simulate the engine retrying epoch 7 after a failure
    sink(batch, epoch_id=7)
    assert os.path.getmtime(os.path.join(out, "epoch=7", "_COMMITTED")) == first_mtime
    sink(batch, epoch_id=8)
    assert [os.path.basename(p) for p in committed_epoch_dirs(out)] == [
        "epoch=7",
        "epoch=8",
    ]
    assert spark.read.json(committed_epoch_dirs(out)).count() == 20
