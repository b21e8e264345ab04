"""Physical-plan shape regression pins for headline queries.

bench.py records plan_stats per round, but nothing FAILED when a plan
regressed — a dropped broadcast hint or a new unnecessary exchange only
showed up as seconds. These pins encode the structural expectations
(max shuffle-exchange count, top-k execution strategy) for a few
high-traffic plans; a violation is a plan regression even if the
fixture-scale runtime looks fine.
"""

from __future__ import annotations

import pytest

from stream_ingestion_amazon_kinesis_spark.plans.registry import QUERIES, _load_all

_load_all()

# name -> max allowed ShuffleExchange occurrences in the FORMATTED plan.
# Counts are static plan nodes (AQE may reuse at runtime); bounds are
# deliberately loose enough to survive cosmetic changes but tight
# enough to catch a lost broadcast (which adds sort+shuffle pairs).
MAX_SHUFFLES = {
    "q1_pricing_summary": 1,  # scan -> partial/final agg, one exchange
    "q6_forecast_revenue": 1,  # pure filter+agg
    "tumbling_window_events": 1,
    "exact_dedup_documents": 1,
    "topk_orders_by_price": 1,  # TakeOrderedAndProject, no full sort
}


@pytest.mark.parametrize("name", sorted(MAX_SHUFFLES))
def test_shuffle_budget(spark, sf_dir, name):
    plan = (
        QUERIES[name]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert n <= MAX_SHUFFLES[name], f"{name}: {n} shuffles\n{plan[:2000]}"


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = (
        QUERIES["topk_orders_by_price"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan[:2000]
