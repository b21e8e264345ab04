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
