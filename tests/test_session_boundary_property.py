"""Property-based pin of the session-window boundary convention.

Spark's `session_window(ts, gap)` only merges an event into the open
session when it lands STRICTLY inside [prev_ts, prev_ts + gap): a gap
of exactly `gap` starts a NEW session. The DuckDB oracles mirror that
with `gap >= INTERVAL -> new session` (gaps-and-islands form). The
fixtures' microsecond timestamps essentially never produce an exact
30:00.000000 gap, so this property test generates them deliberately —
minute-granularity offsets make exact-gap collisions common — and
asserts the engine sessionization equals the >=-convention
gaps-and-islands computation row for row.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)
GAP_MIN = 30

# (user, offset-minutes): minute granularity so exact 30-minute gaps
# (the boundary case) occur frequently; duplicates exercise zero gaps.
events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 300)),
    min_size=1,
    max_size=30,
)


def _expected_sessions(rows):
    """Gaps-and-islands with the >= convention, per user."""
    by_user: dict[int, list[dt.datetime]] = {}
    for uid, ts in rows:
        by_user.setdefault(uid, []).append(ts)
    out = []
    for uid, tss in by_user.items():
        tss.sort()
        start, n, last = tss[0], 0, None
        for ts in tss:
            if last is not None and (ts - last) >= dt.timedelta(minutes=GAP_MIN):
                out.append((uid, start, n))
                start, n = ts, 0
            n += 1
            last = ts
        out.append((uid, start, n))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=events)
def test_session_window_matches_ge_convention(spark, data):
    rows = [(uid, BASE + dt.timedelta(minutes=m)) for uid, m in data]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in (
            df.groupBy("user_id", F.session_window("ts", f"{GAP_MIN} minutes"))
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                "n_events",
            )
            .collect()
        )
    )
    assert got == _expected_sessions(rows)
