"""Property-based check: `_distributed_rank` equals the sorted-list
row_number on adversarial inputs — heavy ties in the leading column
(every row in one bucket), constant columns (every boundary collapses),
negative values, and n smaller than the bucket count. The fixture-based
equivalence test (tests/test_analytics_extra.py) covers realistic
distributions; this one hunts the boundary math.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_ingestion_amazon_kinesis_spark.operators.analytics import (
    _distributed_rank,
)

# (leading value, tiebreak id) — leading values drawn from a tiny domain
# so ties dominate and approxQuantile boundaries frequently coincide.
rows_strategy = st.lists(
    st.integers(-3, 3),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=rows_strategy)
def test_distributed_rank_matches_sorted_order(spark, vals):
    data = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(data, "v long, id long")
    got = {
        r.id: r.rnk
        for r in _distributed_rank(df, ["v", "id"], "rnk").collect()
    }
    want = {
        row_id: rank
        for rank, (_, row_id) in enumerate(sorted(data), start=1)
    }
    assert got == want
