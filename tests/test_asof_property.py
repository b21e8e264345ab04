"""Property-based check: the union+window as-of join agrees with
pandas.merge_asof on random inputs (hypothesis-generated)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_ingestion_amazon_kinesis_spark.operators.event_time import asof_join

BASE = dt.datetime(2024, 1, 1)

# (key, seconds-offset) pairs; distinct offsets per side to keep
# merge_asof's tie behavior out of scope (our join matches ties by
# design; merge_asof also allows exact matches by default).
side = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
    min_size=1,
    max_size=40,
    unique=True,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_rows=side, right_rows=side)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    lpdf = pd.DataFrame(
        {
            "key": [k for k, _ in left_rows],
            "ts": [BASE + dt.timedelta(seconds=s) for _, s in left_rows],
            "lid": range(len(left_rows)),
        }
    )
    rpdf = pd.DataFrame(
        {
            "key": [k for k, _ in right_rows],
            "ts": [BASE + dt.timedelta(seconds=s) for _, s in right_rows],
            "rv": [float(s) for _, s in right_rows],
        }
    )
    # merge_asof consumes the `on` column; carry the right ts separately
    rpdf["rts"] = rpdf["ts"]
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf[["key", "ts", "rv"]])

    got = {
        r["lid"]: (r["asof_ts"], r["asof_rv"])
        for r in asof_join(left, right, key="key", ts="ts", right_cols=["rv"]).collect()
    }

    expected = pd.merge_asof(
        lpdf.sort_values(["ts", "lid"]),
        rpdf.sort_values("ts"),
        on="ts",
        by="key",
        direction="backward",
        suffixes=("", "_r"),
    )
    exp = {
        row.lid: (row.rts.to_pydatetime(), row.rv)
        for row in expected.itertuples()
        if pd.notna(row.rv)
    }
    # inner semantics: drop left rows with no prior right row
    assert set(got) == set(exp)
    for lid in exp:
        assert got[lid] == exp[lid], f"lid={lid}: {got[lid]} vs {exp[lid]}"
