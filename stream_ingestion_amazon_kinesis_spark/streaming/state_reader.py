"""State Data Source: batch-read a streaming checkpoint's state store
(SURVEY §2.3 G14/G15 — the operational introspection surface).

The reference's only "state" is an in-memory shard cursor that dies
with the process (consumer.py:187-188) — nothing to inspect, nothing to
debug. This engine's stateful operators keep their state in the
checkpoint's state store; Spark 4's `statestore` / `state-metadata`
batch sources open that store as an ordinary DataFrame, which is how an
operator at 100 TB answers "what keys are stuck in state, how big is
each partition's state, what did state look like N batches ago"
WITHOUT touching the running query: the reader works on checkpoint
files alone, supports time travel via `batchId`, and distributes like
any other scan (one input split per state-store partition).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from .pipeline import read_event_stream


def _ensure_state_coordinator(spark: SparkSession) -> None:
    """The state-store provider on executors registers with the
    driver's StateStoreCoordinator RPC endpoint, which Spark only
    creates once a streaming query runs in the session. A session that
    has never streamed (exactly the batch-debugging scenario this
    reader exists for) hits CANNOT_LOAD_STATE_STORE /
    RpcEndpointNotFoundException — so force the lazy coordinator into
    existence first. Falls back to a no-op resume of nothing (harmless)
    if the internal accessor ever moves."""
    try:
        (
            spark._jsparkSession.sessionState()
            .streamingQueryManager()
            .stateStoreCoordinator()
        )
    except Exception:
        # Fallback: starting ANY streaming query initializes the
        # coordinator; a zero-row memory-sink stream is the cheapest.
        df = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        q = (
            df.writeStream.format("memory")
            .queryName(f"_coord_boot_{uuid.uuid4().hex[:8]}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def read_state_store(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """Open a checkpoint's state store as a batch DataFrame of
    (key struct, value struct, partition_id). `batch_id` time-travels
    to the state as of that micro-batch's commit; default is the last
    committed batch."""
    _ensure_state_coordinator(spark)
    reader = spark.read.format("statestore")
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if operator_id is not None:
        reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    return reader.load(checkpoint)


def read_state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Per-operator state metadata for a checkpoint: operator/store
    names, partition counts, and the min/max batch ids still
    reconstructable — the first stop when debugging a stateful query."""
    return spark.read.format("state-metadata").load(checkpoint)


def _windowed_counts_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """Run the hourly windowed-count stream over the staged events once
    per sf, leaving its checkpoint behind as the state fixture; a _DONE
    marker makes the (expensive) streaming run idempotent across
    processes. Re-running against an existing checkpoint with no new
    input is a no-op that leaves state intact, so a racing second
    process converges to the same store."""
    from ..operators.streaming_live import _staged_events_json

    import shutil

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    from ..sources.catalog import fixture_fingerprint

    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_state_reader",
        tag,
        fixture_fingerprint(sf_dir),
    )
    ckpt = os.path.join(root, "ckpt")
    marker = os.path.join(root, "_DONE")
    if not os.path.exists(marker):
        # a checkpoint without the marker is a half-built fixture from a
        # crashed run — rebuild from clean rather than resuming it
        shutil.rmtree(ckpt, ignore_errors=True)
        staging = _staged_events_json(spark, sf_dir)
        stream = read_event_stream(spark, staging)
        agg = stream.groupBy(F.window("ts", "1 hour"), "event_type").agg(
            F.count("*").alias("n")
        )
        sink = f"state_fixture_{uuid.uuid4().hex[:12]}"
        query = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        spark.catalog.dropTempView(sink)
        # marker only lands after the store proves batch-readable
        read_state_store(spark, ckpt).limit(1).count()
        with open(marker, "w") as fh:
            fh.write("ok")
    return ckpt


@register(
    "state_store_window_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    description="G14/G15 state introspection: the hourly windowed-count "
    "stream's checkpoint is opened with the `statestore` batch source "
    "and the state rows themselves — not the sink — are compared to the "
    "batch GROUP BY; proves the state store holds exactly the aggregate "
    "the engine claims, readable offline with batchId time travel",
)
def state_store_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Answer a query FROM THE STATE STORE: flatten (key, value) structs
    of the windowed-count operator's state into (window_start,
    event_type, n). The scan distributes one split per state partition
    and never touches the original events — at scale this is how you
    audit or bootstrap-repair a stateful pipeline from its checkpoint
    alone."""
    ckpt = _windowed_counts_checkpoint(spark, sf_dir)
    state = read_state_store(spark, ckpt)
    return state.select(
        F.col("key.window.start").alias("window_start"),
        F.col("key.event_type").alias("event_type"),
        # state value fields carry the aggregate BUFFER's internal names
        # (`count`), not the query's output aliases
        F.col("value.count").alias("n"),
    )
