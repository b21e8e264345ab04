"""Arbitrary stateful streaming on the Spark 4 transformWithState API
(SURVEY §2.3 G14) — the successor to applyInPandasWithState used in
`stateful.py`, with typed composable state primitives instead of one
opaque state tuple.

The reference keeps one in-memory cursor per shard and recomputes all
per-record state on every restart (consumer.py:108-195). Here the
per-user profile lives in the state store as two named, independently
evolvable pieces — a ValueState for the scalar totals and a MapState
keyed by event_type for the per-type counters — checkpointed
exactly-once and held off-heap (transformWithState requires the RocksDB
state-store provider, the configuration for billions of keys).

Environment gate: the transformWithState state-server protocol is
protobuf-based; `google.protobuf` is not installed in this container, so
the runtime path cannot execute here (verified: the TWS driver worker
dies with ImportError). `PROTOBUF_AVAILABLE` below gates the test; on a
real cluster (protobuf ships with every Spark distribution's Python
env) the operator runs as written. The applyInPandasWithState twin in
`stateful.py` covers the same semantics and IS runtime-tested here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

try:  # TWS wire protocol dependency — absent in this container
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    PROTOBUF_AVAILABLE = True
except ImportError:
    PROTOBUF_AVAILABLE = False

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_event_types", T.LongType()),
        T.StructField("top_event_type", T.StringType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class UserActivityProcessor(StatefulProcessor):
    """Per-user running profile: scalar totals in a ValueState, per-type
    counts in a MapState. Emits one change row per key per micro-batch;
    `top_event_type` breaks count ties lexicographically so every
    emission is deterministic."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.totals = handle.getValueState(
            "totals", "n_events BIGINT, total_value DOUBLE"
        )
        self.by_type = handle.getMapState(
            "by_type", "event_type STRING", "n BIGINT"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n_events, total_value = (
            self.totals.get() if self.totals.exists() else (0, 0.0)
        )
        for pdf in rows:
            n_events += len(pdf)
            total_value += float(pdf["value"].sum())
            for etype, n in pdf.groupby("event_type").size().items():
                prev = (
                    self.by_type.getValue((etype,))[0]
                    if self.by_type.containsKey((etype,))
                    else 0
                )
                self.by_type.updateValue((etype,), (prev + int(n),))
        self.totals.update((n_events, total_value))
        counts = sorted(
            (-v[0], k[0]) for k, v in self.by_type.iterator()
        )  # max count first, then lexicographic
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n_events],
                "total_value": [total_value],
                "n_event_types": [len(counts)],
                "top_event_type": [counts[0][1] if counts else None],
            }
        )

    def close(self) -> None:
        pass


def user_activity_profiles_tws(events: DataFrame) -> DataFrame:
    """Streaming per-user profiles via transformWithStateInPandas.
    Caller must run under the RocksDB state-store provider (the API
    rejects the default HDFS-backed store)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        UserActivityProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
