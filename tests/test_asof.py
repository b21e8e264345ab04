"""Unit semantics of the union+window as-of join."""

from __future__ import annotations

import datetime as dt

from stream_ingestion_amazon_kinesis_spark.operators.event_time import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "L1"),
            (1, _ts("2024-01-01T12:00:00"), "L2"),
            (2, _ts("2024-01-01T09:00:00"), "L3"),  # no prior right row
        ],
        "key int, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 10.0),
            (1, _ts("2024-01-01T11:00:00"), 20.0),
            (2, _ts("2024-01-01T09:30:00"), 30.0),
        ],
        "key int, ts timestamp, v double",
    )
    out = {
        r["lbl"]: r
        for r in asof_join(left, right, key="key", ts="ts", right_cols=["v"]).collect()
    }
    assert out["L1"]["asof_v"] == 10.0  # latest right at or before 10:00
    assert out["L2"]["asof_v"] == 20.0  # 11:00 beats 09:30
    assert "L3" not in out  # inner semantics: no prior right row


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "L")], "key int, ts timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 1.5)], "key int, ts timestamp, v double"
    )
    rows = asof_join(left, right, key="key", ts="ts", right_cols=["v"]).collect()
    # ts_left >= ts_right includes equality
    assert len(rows) == 1 and rows[0]["asof_v"] == 1.5
