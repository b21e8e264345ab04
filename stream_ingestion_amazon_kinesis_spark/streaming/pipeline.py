"""Structured Streaming pipelines — the reference's runtime identity.

The reference is a hand-rolled poll loop: enumerate shards, get_records
per shard forever, transform each record in Python, put_record to one
of two destination streams, with in-memory cursors that vanish on
restart (consumer.py:53-94, 108-195 — at-least-once with full
TRIM_HORIZON replay). This module is the same pipeline as ONE logical
plan, incrementalized by the micro-batch engine:

- source: `readStream` over a directory of JSON records (the test/
  local stand-in; a Kinesis/Kafka source is a `format()` swap — the
  plan and sinks are untouched, per BASELINE.json's "Structured
  Streaming + Kinesis source" approach).
- transform: the exact T1-T6 enrichment from operators/enrichment.py —
  same code object as the batch path, which is what makes streaming
  results oracle-checkable by batch replay.
- sink: `foreachBatch` demux that writes BOTH routed outputs and the
  quarantine from one cached micro-batch (one source scan per trigger —
  the reference re-serializes record-at-a-time, consumer.py:160-171).
- state: checkpointed offsets give exactly-once file output, replacing
  the reference's restart-equals-replay behavior (consumer.py:76).

Shard -> partition mapping: each source file/shard becomes input
partitions processed by parallel tasks; `trigger(processingTime=...)`
replaces the `time.sleep(2)` pacing (consumer.py:194-195); per-key
output ordering (partition key session_id, consumer.py:170) is
preserved by repartitioning on session_id before the sink write.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.enrichment import enrich_sessions
from ..sources.json_source import CORRUPT_COL, SESSION_SCHEMA


def produce_records(
    spark: SparkSession,
    records: list[dict],
    stream_dir: str,
    partition_key: str = "session_id",
) -> None:
    """Producer twin of the reference's put_record loop
    (producer_from_cli_my_modifications.py:44-52): append records as a
    new JSON file in the stream directory, repartitioned by the
    partition key so per-key records land together — the file-source
    analog of PartitionKey shard routing."""
    import json as _json
    import uuid as _uuid

    rows = [( _json.dumps(r), r.get(partition_key, "")) for r in records]
    df = spark.createDataFrame(rows, "value string, pk string")
    (
        df.repartition(F.col("pk"))
        .select("value")
        .write.mode("append")
        .text(os.path.join(stream_dir, f"batch-{_uuid.uuid4().hex[:8]}"))
    )


def read_session_stream(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType = SESSION_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source of JSON session records.

    File source here; swapping `.format("kinesis")` / `.format("kafka")`
    with the matching options yields the same downstream plan. The
    `maxFilesPerTrigger` option is the file-source analog of the
    reference's `Limit=200` fetch cap (consumer.py:114-116).
    """
    schema_with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    reader = (
        spark.readStream.schema(schema_with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(input_dir)


def enrichment_sink(output_dir: str):
    """foreachBatch body: split one cached micro-batch into the two
    routed sinks + quarantine (T6 demux, consumer.py:160-165, with
    exactly-once file commits instead of per-record put_record)."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        batch.persist()
        try:
            ok = batch.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
            quarantine = batch.filter(F.col(CORRUPT_COL).isNotNull()).select(
                F.col(CORRUPT_COL).alias("raw_record")
            )
            enriched = enrich_sessions(ok)
            # T7: partition-key locality on session_id before the write —
            # the file-sink equivalent of put_record(PartitionKey=...).
            for name, part in (
                ("usa", enriched.filter(F.col("country") == "USA")),
                ("international", enriched.filter(F.col("country") != "USA")),
            ):
                (
                    part.repartition(F.col("session_id"))
                    .write.mode("append")
                    .json(os.path.join(output_dir, name))
                )
            quarantine.write.mode("append").json(os.path.join(output_dir, "errors"))
        finally:
            batch.unpersist()

    return write_batch


def run_enrichment_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int = 2,
    await_all_available: bool = False,
):
    """The flagship pipeline end-to-end (consumer.py main loop as one
    streaming query). Returns the started StreamingQuery.

    `trigger_seconds` mirrors the reference's sleep(2) sweep pacing;
    `checkpoint_dir` is what upgrades at-least-once/replay-everything
    (consumer.py:76) to exactly-once."""
    stream = read_session_stream(spark, input_dir)
    query = (
        stream.writeStream.foreachBatch(enrichment_sink(output_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
    if await_all_available:
        query.processAllAvailable()
    return query


# ---------------------------------------------------------------------------
# Event-time streaming over the events table shape (G12-G15): the
# streaming twins of operators/event_time.py, validated by batch replay.
# ---------------------------------------------------------------------------

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-backed event stream. `max_files_per_trigger` throttles each
    micro-batch to N files — the file-source twin of a Kinesis fetch
    cap, used by the state-growth soak to replay a corpus as a long
    sequence of small micro-batches."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(input_dir)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """G12+G13: watermarked tumbling-window aggregate. In append mode a
    window emits once the watermark passes its end; rows later than the
    watermark are dropped — the late-data policy the reference cannot
    express (it replays everything from TRIM_HORIZON instead)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def purchase_click_interval_join(
    purchases: DataFrame,
    clicks: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """G4 streaming: stream-stream inner join with a time-interval
    condition — each purchase pairs with the same user's clicks from the
    preceding `max_gap`. Both sides carry watermarks so the join state
    is bounded: a click older than (watermark + gap) can never match and
    is evicted. The reference cannot express any cross-record operation,
    let alone a windowed one."""
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_gap}")),
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"), "p_ts", "c_ts")


def dedup_event_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """G14: keyed streaming dedup on event_id. State is bounded by the
    watermark — duplicates arriving within the watermark horizon are
    dropped exactly-once across restarts (vs the reference, which
    re-emits every record on restart)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory_sink(df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a bounded streaming query to completion synchronously into
    an in-memory table (test/debug harness)."""
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return query


def kinesis_sim_sink(
    dest_streams: dict[str, str],
    num_shards: int = 4,
    run_scope: str = "default",
):
    """foreachBatch body writing each routed split to a kinesis_sim
    DESTINATION STREAM — the reference's dest_streams demux
    (consumer.py:160-171: country == 'USA' -> USA stream, else
    International, PartitionKey=session_id) executed through the custom
    DataSource's two-phase writer instead of per-record put_record.
    `dest_streams` maps route name ('USA'/'International') to a stream
    directory path."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        from ..sources.kinesis_sim import _consume_killpoint, register_format

        register_format(batch.sparkSession)
        # kill -9 drill points (round-7 chaos tests): torn WAL with
        # nothing / one route / both routes published. Armed by files in
        # the FIRST route's stream dir; no-ops in normal operation.
        first_route = next(iter(dest_streams.values()))
        _consume_killpoint(first_route, "_killpoint_batch_start")
        batch.persist()
        try:
            ok = batch.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
            enriched = enrich_sessions(ok)
            # S4 JSON encode inline (json_source.to_json_records semantics):
            # ISO-8601 timestamps native to to_json.
            records = enriched.select(
                F.col("session_id").alias("partition_key"),
                F.to_json(F.struct(*enriched.columns)).alias("data"),
                F.col("country"),
            )
            for route, pred in (
                ("USA", F.col("country") == "USA"),
                ("International", F.col("country") != "USA"),
            ):
                # Epoch-retry idempotence, two layers:
                # (1) this sink-level marker skips re-RUNNING the write
                #     job for a route that already committed (restart
                #     after a crash between the two route writes);
                # (2) the writer-level commitToken (round 7) makes the
                #     publish itself idempotent: commit() names published
                #     files with the token, rolls back a torn previous
                #     attempt of the same token before republishing, and
                #     records its own done-marker after the last file —
                #     closing both residual holes the marker alone left
                #     open (crash between writer-commit and marker
                #     creation re-appended the route; kill -9 mid-publish
                #     re-appended the already-published files). Both are
                #     exercised by the kill -9 drills in tests/test_cli.py.
                # Markers and tokens are scoped to the CHECKPOINT identity
                # (run_scope): epoch ids restart at 0 under a fresh
                # checkpoint, and an unscoped epoch-0 marker from an
                # earlier run into the same dest would silently skip the
                # new run's first epoch.
                marker = os.path.join(
                    dest_streams[route],
                    "_epochs",
                    f"{run_scope}-{epoch_id:020d}",
                )
                if os.path.exists(marker):
                    continue
                (
                    records.filter(pred)
                    .drop("country")
                    .write.format("kinesis_sim")
                    .option("path", dest_streams[route])
                    .option("numShards", str(num_shards))
                    .option("commitToken", f"{run_scope}e{epoch_id:020d}")
                    .mode("append")
                    .save()
                )
                os.makedirs(os.path.dirname(marker), exist_ok=True)
                with open(marker, "w", encoding="utf-8") as fh:
                    fh.write("ok")
                _consume_killpoint(first_route, "_killpoint_between_routes")
            _consume_killpoint(first_route, "_killpoint_after_routes")
        finally:
            batch.unpersist()

    return write_batch


def read_session_stream_kinesis_sim(
    spark: SparkSession, stream_dir: str
) -> DataFrame:
    """Session records from a kinesis_sim SOURCE stream: the custom
    DataSource yields (shard_id, sequence_number, partition_key, data);
    the JSON payload is parsed PERMISSIVE into the session schema with
    the corrupt column, so downstream sinks see the exact same shape as
    the file-source path (S3 JSON decode, consumer.py:118)."""
    from ..sources.kinesis_sim import register_format

    register_format(spark)
    schema_with_corrupt = T.StructType(
        list(SESSION_SCHEMA.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.readStream.format("kinesis_sim").option("path", stream_dir).load()
    )
    return raw.select(
        F.from_json(
            "data",
            schema_with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("r")
    ).select("r.*")


def run_kinesis_sim_pipeline(
    spark: SparkSession,
    input_dir: str,
    dest_streams: dict[str, str],
    checkpoint_dir: str,
    await_all_available: bool = False,
    source_format: str = "json",
):
    """The reference's full topology — source stream -> per-record
    enrichment -> keyed demux to two destination streams — with the
    destination side going through the kinesis_sim custom sink.
    `source_format="kinesis_sim"` reads the source from a kinesis_sim
    stream directory instead of a JSON file stream (the CLI pairing
    with `produce`)."""
    if source_format not in ("json", "kinesis_sim"):
        raise ValueError(
            f"source_format must be 'json' or 'kinesis_sim', "
            f"got {source_format!r}"
        )
    for path in dest_streams.values():
        os.makedirs(path, exist_ok=True)
    if source_format == "kinesis_sim":
        stream = read_session_stream_kinesis_sim(spark, input_dir)
    else:
        stream = read_session_stream(spark, input_dir)
    # Epoch-marker scope = the checkpoint path: one checkpoint == one
    # monotone epoch-id space, so markers from a different (e.g. fresh)
    # checkpoint can never suppress this run's writes.
    scope = hashlib.sha256(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:12]
    query = (
        stream.writeStream.foreachBatch(
            kinesis_sim_sink(dest_streams, run_scope=scope)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="0 seconds")
        .start()
    )
    if await_all_available:
        query.processAllAvailable()
    return query
