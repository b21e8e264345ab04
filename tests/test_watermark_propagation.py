"""Pin of multi-stateful watermark PROPAGATION (join -> window).

Each stateful operator's output watermark is its input watermark minus
its event-time state retention. For a stream-stream interval join with
`c_ts BETWEEN p_ts - 1h AND p_ts`, the click side is retained while
`p_ts <= c_ts + 1h` can still match, so the downstream window stage's
watermark trails the global (min-of-inputs) watermark by exactly 1
hour: an hour whose end the GLOBAL watermark has passed, but the
JOIN-OUTPUT watermark has not, must stay open.

Round 4's sf0.1 value gate caught exactly this band (oracle emitted
291 windows, Spark 290); the fixtures only straddle it at sf0.1, so
this synthetic boundary pin holds the rule at any fixture size. The
control window proves the delayed watermark still closes old windows.
"""

from __future__ import annotations

import datetime as dt
import json
import uuid

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 3, 1)


def _stage(tmp_path, rows):
    d = tmp_path / "events_json"
    d.mkdir()
    with open(d / "part-0.json", "w") as f:
        for event_id, (minutes, user_id, event_type) in enumerate(rows):
            ts = BASE + dt.timedelta(minutes=minutes)
            f.write(
                json.dumps(
                    {
                        "event_id": event_id,
                        "ts": ts.strftime("%Y-%m-%dT%H:%M:%S.000000"),
                        "user_id": user_id,
                        "event_type": event_type,
                        "value": 1.0,
                        "props": "{}",
                    }
                )
                + "\n"
            )
    return str(d)


def test_join_output_watermark_holds_back_final_window(spark, tmp_path):
    from stream_ingestion_amazon_kinesis_spark.streaming.pipeline import (
        read_event_stream,
    )

    rows = [
        # control pair -> window [00:00, 01:00), far behind every watermark
        (5, 1, "click"),
        (10, 1, "purchase"),
        # boundary pair -> window [03:00, 04:00): end 04:00 is BEHIND the
        # global watermark (04:50) but AHEAD of the join-output watermark
        # (03:50) -> must NOT be emitted
        (185, 1, "click"),
        (190, 1, "purchase"),
        # watermark sentinels on users that can never pair: both input
        # streams' post-filter max ts = 05:00 -> global wm = 04:50
        (300, 98, "purchase"),
        (300, 99, "click"),
    ]
    staging = _stage(tmp_path, rows)
    stream = read_event_stream(spark, staging)
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "10 minutes")
    )
    pairs = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 hour")),
    )
    agg = (
        pairs.groupBy(F.window("p_ts", "1 hour"))
        .agg(F.count("*").alias("n_pairs"))
        .select(F.col("window.start").alias("window_start"), "n_pairs")
    )
    sink = f"wmprop_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    got = {
        r["window_start"]: r["n_pairs"] for r in spark.table(sink).collect()
    }
    # Only the control window closes; [03:00, 04:00) is held open by the
    # join's output watermark despite global wm (04:50) > its end.
    assert got == {BASE: 1}, got
