"""Property-based check: `_distributed_prefix` equals the sorted-list
row_number + running sums on adversarial inputs — heavy ties in the
leading column (rows collapse into one bucket), constant columns,
negative values and negative deltas (the sweep-line case), and n
smaller than the bucket count. `peak_concurrency_sessions` and
`pareto_cutpoint_customers` ride this helper, so the boundary math
here is their correctness argument at any partitioning.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_ingestion_amazon_kinesis_spark.operators.analytics import (
    _distributed_prefix,
)

# (leading value, delta) pairs; leading values from a tiny domain so
# ties dominate, deltas in {-1, 0, 1, 5} so running sums go negative.
rows_strategy = st.lists(
    st.tuples(st.integers(-3, 3), st.sampled_from([-1, 0, 1, 5])),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_distributed_prefix_matches_sorted_cumsum(spark, rows):
    data = [(v, i, d) for i, (v, d) in enumerate(rows)]
    df = spark.createDataFrame(data, "v long, id long, d long")
    got = {
        r.id: (r.rnk, r.cum)
        for r in _distributed_prefix(
            df, ["v", "id"], {"cum": "d"}, rank_name="rnk"
        ).collect()
    }
    want = {}
    run = 0
    for rank, (_, row_id, d) in enumerate(sorted(data), start=1):
        run += d
        want[row_id] = (rank, run)
    assert got == want


def test_distributed_prefix_without_rank(spark):
    data = [(2, 0, 10), (1, 1, -5), (2, 2, 3), (1, 3, 7)]
    df = spark.createDataFrame(data, "v long, id long, d long")
    got = {
        r.id: r.cum
        for r in _distributed_prefix(df, ["v", "id"], {"cum": "d"}).collect()
    }
    # sorted order: (1,1,-5), (1,3,7), (2,0,10), (2,2,3)
    assert got == {1: -5, 3: 2, 0: 12, 2: 15}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_distributed_prefix_grouped_matches_per_group_cumsum(spark, rows):
    # part_cols (r12, weighted_median_price_by_flag): ranks and prefixes
    # restart per group while buckets still come from the GLOBAL range
    # split of the leading column — groups share buckets, so the
    # per-(group, bucket) offset math is what this pins.
    data = [(v, i % 3, i, d) for i, (v, d) in enumerate(rows)]
    df = spark.createDataFrame(data, "v long, g long, id long, d long")
    got = {
        r.id: (r.rnk, r.cum)
        for r in _distributed_prefix(
            df, ["v", "id"], {"cum": "d"}, rank_name="rnk", part_cols=["g"]
        ).collect()
    }
    want = {}
    for g in {row[1] for row in data}:
        run, rank = 0, 0
        for v, _, row_id, d in sorted(
            (row for row in data if row[1] == g), key=lambda r: (r[0], r[2])
        ):
            rank += 1
            run += d
            want[row_id] = (rank, run)
    assert got == want


def test_distributed_prefix_multiple_sums(spark):
    data = [(1, 0, 2, 100), (0, 1, 3, 10), (1, 2, 5, 1)]
    df = spark.createDataFrame(data, "v long, id long, a long, b long")
    got = {
        r.id: (r.ca, r.cb)
        for r in _distributed_prefix(
            df, ["v", "id"], {"ca": "a", "cb": "b"}
        ).collect()
    }
    # sorted: id 1 (3,10), id 0 (2,100), id 2 (5,1)
    assert got == {1: (3, 10), 0: (5, 110), 2: (10, 111)}
