"""Arbitrary stateful streaming (SURVEY §2.3 G14, "custom stateful
operators") via applyInPandasWithState.

The reference's only state is an in-memory shard cursor
(consumer.py:187-188) — lost on restart. This operator keeps *keyed,
checkpointed* state: a per-user running profile (event count, value
sum, last-seen timestamp) updated per micro-batch and emitted as a
change record. State lives in the state store, scales with distinct
keys (not data volume), and survives restarts exactly-once.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)


def _update_user_profile(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n_events, total_value, last_ts_micros = (
        state.get if state.exists else (0, 0.0, 0)
    )
    for pdf in batches:
        n_events += len(pdf)
        total_value += float(pdf["value"].sum())
        batch_max = int(pdf["ts"].astype("int64").max()) // 1000  # ns -> us
        last_ts_micros = max(last_ts_micros, batch_max)
    state.update((n_events, total_value, last_ts_micros))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "total_value": [total_value],
            "last_ts": [pd.Timestamp(last_ts_micros, unit="us")],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-user running profiles, one change row
    per key per micro-batch (update semantics via append of deltas)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
