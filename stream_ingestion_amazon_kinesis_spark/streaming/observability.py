"""Streaming observability (reference S10: per-record logging sink,
consumer.py:10-18, 119-121, 172-175).

The reference logs every record read and written with its shard and
sequence position. Per-record logging does not survive contact with
real volume; the Spark-native equivalent is the StreamingQueryListener:
per-micro-batch progress events carrying rows/sec, batch durations,
and state-store metrics — constant overhead regardless of throughput.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ProgressLog:
    """In-memory progress collector (swap the `record` method for a
    metrics emitter in production)."""

    batches: list[dict] = field(default_factory=list)

    def record(self, progress: dict) -> None:
        dur = progress.get("durationMs") or {}
        self.batches.append(
            {
                "batch_id": progress.get("batchId"),
                "num_input_rows": progress.get("numInputRows"),
                "rows_per_second": progress.get("processedRowsPerSecond"),
                "duration_ms": dur.get("triggerExecution"),
                # Sink-visibility components: addBatch is the data write,
                # walCommit/commitOffsets the offset-log commit that makes
                # the batch durable (the reference's only published
                # operating characteristic is 5-7 min from put to S3
                # visibility, README.md:580 — this is its per-batch twin).
                "add_batch_ms": dur.get("addBatch"),
                "commit_ms": (dur.get("walCommit") or 0)
                + (dur.get("commitOffsets") or 0),
                # State-store footprint: the number the 100 TB streaming
                # claim rests on — state must PLATEAU under a advancing
                # watermark, not grow with cumulative input (asserted by
                # the soak test in tests/test_streaming.py).
                "state_rows": sum(
                    op.get("numRowsTotal") or 0
                    for op in progress.get("stateOperators") or []
                ),
                "state_bytes": sum(
                    op.get("memoryUsedBytes") or 0
                    for op in progress.get("stateOperators") or []
                ),
            }
        )

    @property
    def state_rows_by_batch(self) -> list[int]:
        """State-store row count after each micro-batch, in batch order."""
        ordered = sorted(self.batches, key=lambda b: b["batch_id"] or 0)
        return [b["state_rows"] for b in ordered]

    @property
    def total_rows(self) -> int:
        return sum(b["num_input_rows"] or 0 for b in self.batches)

    @property
    def trigger_to_commit_ms(self) -> list[int]:
        """Per-micro-batch end-to-end latency: trigger start to durable
        commit (triggerExecution spans source fetch, plan execution,
        sink write, and the offset-log commit)."""
        return [
            b["duration_ms"] for b in self.batches if b["duration_ms"] is not None
        ]

    @property
    def max_latency_ms(self) -> int | None:
        lat = self.trigger_to_commit_ms
        return max(lat) if lat else None


class QueryProgressListener(StreamingQueryListener):
    def __init__(self, log: ProgressLog):
        self.log = log

    def onQueryStarted(self, event):  # noqa: N802 (Spark API casing)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        self.log.record(
            {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
            }
        )

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass


def attach_progress_log(spark: SparkSession) -> tuple[ProgressLog, QueryProgressListener]:
    """Attach a listener; returns (log, listener) — call
    `spark.streams.removeListener(listener)` when done."""
    log = ProgressLog()
    listener = QueryProgressListener(log)
    spark.streams.addListener(listener)
    return log, listener


def with_quality_metrics(df, name: str = "quality", key_col: str | None = None):
    """Attach in-plan data-quality counters via `Dataset.observe` — the
    aggregates ride the existing job (accumulator-backed, zero extra
    pass or shuffle), unlike a separate `.count()` audit query which
    would re-execute the plan.

    Metrics: row count, and per-key null count when `key_col` is given
    (the reference's per-record "read N / error M" log tallies,
    consumer.py:119-121,179-186, as constant-overhead counters).

    Batch: pass a `pyspark.sql.Observation()` as `name` is not needed —
    use `observe_batch` below. Streaming: metrics surface per
    micro-batch in `StreamingQueryProgress.observedMetrics[name]`.
    """
    from pyspark.sql import functions as F

    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if key_col is not None:
        metrics.append(
            F.count(F.when(F.col(key_col).isNull(), 1)).alias("n_null_keys")
        )
    return df.observe(name, *metrics)


def observe_batch(df, key_col: str | None = None):
    """Batch twin of `with_quality_metrics`: returns (df, Observation);
    read `observation.get` AFTER an action on the returned df."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if key_col is not None:
        metrics.append(
            F.count(F.when(F.col(key_col).isNull(), 1)).alias("n_null_keys")
        )
    return df.observe(obs, *metrics), obs
