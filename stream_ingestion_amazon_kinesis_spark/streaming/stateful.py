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


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_micros", T.LongType()),
        T.StructField("end_micros", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap
_GAP_MS = 30 * 60 * 1000


def _ts_to_micros(series: pd.Series) -> pd.Series:
    return series.astype("datetime64[us]").astype("int64")


def _micros_to_ts(us: int) -> pd.Timestamp:
    return pd.Timestamp(us, unit="us")


def _update_session(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Custom sessionizer with an event-time timer.

    New events merge into the open session or split it on a > 30 min
    gap; every session closed BY A LATER EVENT is emitted immediately,
    and the still-open last session is parked in state with an
    event-time timeout at end + 30 min — when the watermark passes it,
    the timer fires (hasTimedOut) and the session flushes with no new
    data. Gap arithmetic is integer microseconds; the timer is set in
    the engine's millisecond domain (floor), mirroring Spark's
    watermark truncation.
    """
    (user_id,) = key
    if state.hasTimedOut:
        start_us, end_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [_micros_to_ts(start_us)],
                "session_end": [_micros_to_ts(end_us)],
                "n_events": [n],
            }
        )
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    ts_us = _ts_to_micros(rows["ts"]).sort_values().to_numpy()
    sessions: list[tuple[int, int, int]] = []
    if state.exists:
        start_us, end_us, n = state.get
        cur = [start_us, end_us, int(n)]
    else:
        cur = [int(ts_us[0]), int(ts_us[0]), 0]
        # n=0: the first event below extends cur
    for t in ts_us:
        t = int(t)
        if cur[2] > 0 and t - cur[1] > _GAP_US:
            sessions.append(tuple(cur))
            cur = [t, t, 0]
        cur[1] = max(cur[1], t)
        cur[2] += 1
    closed = pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": [_micros_to_ts(s[0]) for s in sessions],
            "session_end": [_micros_to_ts(s[1]) for s in sessions],
            "n_events": [s[2] for s in sessions],
        }
    )
    state.update((cur[0], cur[1], cur[2]))
    state.setTimeoutTimestamp(cur[1] // 1000 + _GAP_MS)
    if len(closed):
        yield closed


def custom_sessionize(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """G14: arbitrary stateful sessionization with event-time timers —
    the semantics `session_window` can't customize (per-session payload,
    explicit timer control, incremental emission of closed sessions)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_session,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
