"""Property-based check of the bucketized interval-overlap join: on
random interval sets (boundary-aligned ends, multi-bucket spans,
duplicate windows) the explode-to-buckets + equi-join + keep-at-
overlap-start-bucket pipeline must produce EXACTLY the brute-force
overlap pairs — no duplicates (each pair survives in one bucket only)
and no misses (both intervals provably touch the overlap-start hour).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)

# (owner, start-offset-minutes, duration-minutes): durations up to 5h
# exercise intervals spanning many hour buckets; 60-multiples exercise
# exact bucket-boundary ends.
intervals = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 600), st.integers(1, 300)),
    min_size=2,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=intervals)
def test_bucketized_overlap_join_matches_bruteforce(spark, data):
    rows = [
        (i, owner, BASE + dt.timedelta(minutes=s), BASE + dt.timedelta(minutes=s + d))
        for i, (owner, s, d) in enumerate(data)
    ]
    df = spark.createDataFrame(
        rows, "iid int, owner int, st timestamp, en timestamp"
    )
    one_us = F.expr("INTERVAL 1 microsecond")
    hour = F.expr("INTERVAL 1 hour")
    b = df.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("st")),
                F.date_trunc("hour", F.col("en") - one_us),
                hour,
            )
        ),
    )
    l, r = b.alias("l"), b.alias("r")
    ov_start = F.greatest(F.col("l.st"), F.col("r.st"))
    got = {
        (row.a, row.b)
        for row in (
            l.join(
                r,
                (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.iid") < F.col("r.iid"))
                & (F.col("l.st") < F.col("r.en"))
                & (F.col("r.st") < F.col("l.en"))
                & (F.col("l.bucket") == F.date_trunc("hour", ov_start)),
            )
            .select(F.col("l.iid").alias("a"), F.col("r.iid").alias("b"))
            .collect()
        )
    }
    want = {
        (ia, ib)
        for ia, _, sa, ea in rows
        for ib, _, sb, eb in rows
        if ia < ib and sa < eb and sb < ea
    }
    assert got == want
