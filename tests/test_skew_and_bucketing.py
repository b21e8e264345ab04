"""Scale utilities: salted aggregation/join equivalence, bucketed
shuffle-free joins, and the Kinesis reader's graceful degradation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.functions.skew import salted_agg, salted_join
from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table
from stream_ingestion_amazon_kinesis_spark.sources.kinesis import (
    kinesis_reader_options,
    read_kinesis_stream,
)


def test_salted_agg_matches_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    plain = {
        (r["user_id"],): (r["n"], round(r["total"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    salted = {
        (r["user_id"],): (r["n"], round(r["total"], 6))
        for r in salted_agg(
            events,
            keys=["user_id"],
            aggs={"n": (F.count, F.sum, "*"), "total": (F.sum, F.sum, "value")},
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(customer, "c_custkey")
    salted = salted_join(orders, customer, "c_custkey", n_salts=8)
    assert salted.count() == plain.count()
    a = plain.groupBy("c_mktsegment").count().collect()
    b = salted.groupBy("c_mktsegment").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_join_hot_keys_plan_pin(spark, sf_dir):
    """Plan pin for the registered salted_join_hot_keys query: the fact
    join must be a ShuffledHashJoin on (l_suppkey, _salt) — an
    auto-broadcast of the replicated dimension would silently defeat
    the salting (no exchange on the fact side means nothing spreads),
    which is the exact beyond-AQE scenario the query documents."""
    from stream_ingestion_amazon_kinesis_spark.plans.registry import QUERIES, _load_all

    _load_all()
    df = QUERIES["salted_join_hot_keys"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan[:2000]
    assert "BroadcastHashJoin" not in plan, plan[:2000]
    # the salted compound key actually reaches the join
    import re

    jline = next(l for l in plan.splitlines() if "ShuffledHashJoin" in l)
    assert "_salt" in jline and "l_suppkey" in jline, jline


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """bucketBy co-locates both sides on the join key at write time —
    the later join plans SortMergeJoin with NO Exchange, the pattern
    that makes repeated fact-fact joins affordable at 100 TB."""
    # (warehouse dir is a static conf; managed tables land in
    # ./spark-warehouse, dropped in the finally below)
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("orders_b")
    lineitem.withColumnRenamed("l_orderkey", "o_orderkey").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("lineitem_b")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("lineitem_b").join(spark.table("orders_b"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_kinesis_options_map_reference_params():
    opts = kinesis_reader_options("stream-a", "us-east-1")
    # TRIM_HORIZON (consumer.py:76) -> earliest; Limit=200 -> fetch cap
    assert opts["startingPosition"] == "earliest"
    assert opts["maxFetchRecordsPerShard"] == "200"


def test_kinesis_reader_fails_gracefully_without_connector(spark):
    with pytest.raises(RuntimeError, match="connector"):
        read_kinesis_stream(spark, "stream-a", "us-east-1")
