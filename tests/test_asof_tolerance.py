"""asof_join_with_tolerance agrees with pandas.merge_asof(tolerance=2h)
on the real events fixture — the union+running-max plan vs pandas'
reference single-node implementation, including the NULL-out-of-
tolerance rows and the (ts, event_id) tie convention."""

from __future__ import annotations

import pandas as pd

from stream_ingestion_amazon_kinesis_spark.operators.event_time import (
    asof_join_with_tolerance,
)
from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table


def test_tolerance_asof_matches_pandas(spark, sf_dir):
    got = {
        r["purchase_id"]: (r["click_id"], r["click_ts"], r["staleness_us"])
        for r in asof_join_with_tolerance(spark, sf_dir).collect()
    }

    events = load_table(spark, sf_dir, "events").toPandas()
    p = (
        events[events.event_type == "purchase"][["event_id", "user_id", "ts"]]
        .rename(columns={"event_id": "purchase_id"})
        .sort_values(["ts", "purchase_id"])
    )
    c = (
        events[events.event_type == "click"][["event_id", "user_id", "ts"]]
        .rename(columns={"event_id": "click_id"})
        .sort_values(["ts", "click_id"])  # last-in-order tie = max event_id
    )
    c["click_ts"] = c["ts"]
    m = pd.merge_asof(
        p,
        c,
        on="ts",
        by="user_id",
        direction="backward",
        tolerance=pd.Timedelta(hours=2),
        allow_exact_matches=True,
    )
    exp = {}
    for row in m.itertuples():
        if pd.notna(row.click_id):
            cts = row.click_ts.to_pydatetime()
            exp[row.purchase_id] = (
                int(row.click_id),
                cts,
                int((row.ts.to_pydatetime() - cts).total_seconds() * 1_000_000),
            )
        else:
            exp[row.purchase_id] = (None, None, None)

    assert set(got) == set(exp)
    mismatches = {k: (got[k], exp[k]) for k in exp if got[k] != exp[k]}
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. {next(iter(mismatches.items()))}"
