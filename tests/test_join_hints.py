"""The SHUFFLE_HASH hint must actually change the physical operator —
otherwise the registered query silently degrades to documentation."""

from __future__ import annotations

from stream_ingestion_amazon_kinesis_spark.operators.relational import (
    hinted_shuffle_hash_join,
)


def test_shuffle_hash_hint_takes_effect(spark, sf_dir):
    plan = (
        hinted_shuffle_hash_join(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]
