"""The ad-hoc SQL entry point: register_views + spark.sql.

A user of the reference switching to this engine gets the full ANSI
surface over the fixture tables; these tests run ad-hoc SQL text and
cross-check it against the equivalent DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.sources.catalog import (
    load_table,
    register_views,
)


def test_adhoc_join_agg_matches_dataframe(spark, sf_dir):
    register_views(spark, sf_dir, ("orders", "customer"))
    got = spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    ).collect()
    exp = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("total"),
        )
        .collect()
    )
    assert {tuple(r) for r in got} == {tuple(r) for r in exp}


def test_adhoc_window_and_cte(spark, sf_dir):
    register_views(spark, sf_dir, ("supplier", "nation"))
    rows = spark.sql(
        """
        WITH ranked AS (
            SELECT n_name, s_name, s_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY n_name
                                      ORDER BY s_acctbal DESC, s_suppkey) rn
            FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        SELECT n_name, s_name FROM ranked WHERE rn = 1
        """
    ).collect()
    # one top supplier per nation present in the fixture
    assert len(rows) == len({r.n_name for r in rows}) > 0


def test_adhoc_sql_on_events_nanos_table(spark, sf_dir):
    # events carries TIMESTAMP(NANOS); register_views must make it
    # queryable by plain SQL under any session
    register_views(spark, sf_dir, ("events",))
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM events WHERE ts >= TIMESTAMP '2024-01-01'"
    ).collect()[0].n
    assert n > 0
