"""Property test: merge_intervals equals a single-threaded Python sweep
on random interval sets (hypothesis-generated), including touching
boundaries and duplicate starts."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.operators.event_time import (
    merge_intervals,
)

BASE = dt.datetime(2024, 1, 1)

rows = st.lists(
    st.tuples(
        st.integers(0, 2),  # key
        st.integers(0, 500),  # start seconds
        st.integers(0, 60),  # duration seconds (0 allowed: point interval)
    ),
    min_size=1,
    max_size=50,
)


def _reference(items):
    """Python sweep: dict key -> list of merged (start, end) seconds."""
    out = {}
    for key in {k for k, _, _ in items}:
        ivs = sorted((s, s + d) for k, s, d in items if k == key)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        out[key] = [tuple(m) for m in merged]
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(items=rows)
def test_merge_matches_python_sweep(spark, items):
    df = spark.createDataFrame(
        [
            (
                k,
                i,
                BASE + dt.timedelta(seconds=s),
                BASE + dt.timedelta(seconds=s + d),
            )
            for i, (k, s, d) in enumerate(items)
        ],
        "user_id long, event_id long, s timestamp, e timestamp",
    )
    got = {}
    for r in merge_intervals(df, key="user_id").collect():
        got.setdefault(r.user_id, []).append(
            (
                int((r.m_start - BASE).total_seconds()),
                int((r.m_end - BASE).total_seconds()),
            )
        )
    got = {k: sorted(v) for k, v in got.items()}
    assert got == _reference(items)
