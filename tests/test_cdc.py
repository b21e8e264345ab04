"""SCD2 merge semantics on a synthetic dimension."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.operators.cdc import scd2_init, scd2_merge


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_scd2_merge_closes_and_opens_versions(spark):
    snapshot = spark.createDataFrame(
        [
            (1, "alice", "NYC", _ts("2024-01-01T00:00:00")),
            (2, "bob", "LA", _ts("2024-01-01T00:00:00")),
            (3, "carol", "SF", _ts("2024-01-01T00:00:00")),
        ],
        "id int, name string, city string, updated_at timestamp",
    )
    dim = scd2_init(snapshot, "id", "updated_at")

    updates = spark.createDataFrame(
        [(2, "bob", "Austin", _ts("2024-02-01T00:00:00"))],
        "id int, name string, city string, updated_at timestamp",
    )
    merged = scd2_merge(dim, updates, "id", "updated_at")

    rows = {(r["id"], r["city"], r["is_current"]): r for r in merged.collect()}
    # untouched keys unchanged and current
    assert (1, "NYC", True) in rows and (3, "SF", True) in rows
    # bob's old row closed at the update ts
    closed = rows[(2, "LA", False)]
    assert closed["valid_to"] == _ts("2024-02-01T00:00:00")
    # bob's new row open-ended and current
    opened = rows[(2, "Austin", True)]
    assert opened["valid_from"] == _ts("2024-02-01T00:00:00")
    assert opened["valid_to"].year == 9999
    assert merged.count() == 4

    # second update to the same key: history row preserved
    updates2 = spark.createDataFrame(
        [(2, "bob", "Denver", _ts("2024-03-01T00:00:00"))],
        "id int, name string, city string, updated_at timestamp",
    )
    merged2 = scd2_merge(merged, updates2, "id", "updated_at")
    bob_rows = sorted(
        ((r["city"], r["is_current"]) for r in merged2.filter(F.col("id") == 2).collect())
    )
    assert bob_rows == [("Austin", False), ("Denver", True), ("LA", False)]
    # exactly one current row per key
    per_key = (
        merged2.filter(F.col("is_current"))
        .groupBy("id")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in per_key) and len(per_key) == 3


def test_streaming_scd2_apply_versions_and_idempotence(spark, tmp_path):
    """Change stream -> foreachBatch SCD2 merge into a versioned
    copy-on-write dimension; one version per epoch, replays are no-ops,
    restart with the same checkpoint applies nothing twice."""
    import json
    import os

    from pyspark.sql import functions as F

    from stream_ingestion_amazon_kinesis_spark.streaming.cdc_apply import (
        init_dim,
        read_current_dim,
        run_scd2_apply,
    )

    dim_path = str(tmp_path / "dim")
    snapshot = spark.createDataFrame(
        [(1, "alice", "2024-01-01 00:00:00"), (2, "bob", "2024-01-01 00:00:00")],
        "id long, name string, updated_at string",
    ).withColumn("updated_at", F.to_timestamp("updated_at"))
    init_dim(snapshot, dim_path, "id", "updated_at")

    # two change batches as two files (maxFilesPerTrigger=1 -> 2 epochs)
    changes_dir = tmp_path / "changes"
    changes_dir.mkdir()
    (changes_dir / "c1.json").write_text(
        json.dumps({"id": 1, "name": "alice2", "updated_at": "2024-01-02 00:00:00"})
        + "\n"
    )
    (changes_dir / "c2.json").write_text(
        json.dumps({"id": 2, "name": "bob2", "updated_at": "2024-01-03 00:00:00"})
        + "\n"
    )
    stream = (
        spark.readStream.schema("id long, name string, updated_at string")
        .option("maxFilesPerTrigger", 1)
        .json(str(changes_dir))
        .withColumn("updated_at", F.to_timestamp("updated_at"))
    )
    ckpt = str(tmp_path / "ckpt")
    q = run_scd2_apply(spark, stream, dim_path, ckpt, "id", "updated_at")
    q.processAllAvailable()
    q.stop()

    dim = read_current_dim(spark, dim_path)
    rows = {(r.id, r.name, r.is_current) for r in dim.collect()}
    assert (1, "alice2", True) in rows and (2, "bob2", True) in rows
    assert (1, "alice", False) in rows and (2, "bob", False) in rows
    assert dim.count() == 4
    n_versions = len([d for d in os.listdir(dim_path) if d.startswith("v")])

    # restart from the same checkpoint: nothing new to process, the
    # dimension and version count are unchanged
    stream2 = (
        spark.readStream.schema("id long, name string, updated_at string")
        .option("maxFilesPerTrigger", 1)
        .json(str(changes_dir))
        .withColumn("updated_at", F.to_timestamp("updated_at"))
    )
    q2 = run_scd2_apply(spark, stream2, dim_path, ckpt, "id", "updated_at")
    q2.processAllAvailable()
    q2.stop()
    assert read_current_dim(spark, dim_path).count() == 4
    assert len([d for d in os.listdir(dim_path) if d.startswith("v")]) == n_versions
