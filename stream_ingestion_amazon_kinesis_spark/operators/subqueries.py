"""Subquery operator classes: LATERAL joins, correlated scalar
subqueries, recursive CTEs (SURVEY §2.3 G2/G11 depth).

The reference has no query language at all; these are the three
subquery shapes a SQL engine must plan that are NOT expressible as a
single DataFrame method chain:

- LATERAL: a per-row dependent subquery — Catalyst decorrelates the
  top-k-per-group form into a ranked window, never a nested loop.
- Correlated scalar subqueries in predicates — decorrelated into an
  aggregate + join (one shuffle over the dimension, not one probe per
  outer row).
- WITH RECURSIVE (new in Spark 4) — iterative fixpoint union, the
  standard-SQL way to generate scaffolds (calendars, hierarchies)
  without driver-side loops.

All three run through `spark.sql` over the registered fixture views —
the DataFrame and SQL surfaces share one Catalyst planner, so the plan
guard and oracle gate apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.registry import register
from ..sources.catalog import register_views


@register(
    "lateral_top2_customers_per_nation",
    oracle="""
    SELECT n_name, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS acctbal
    FROM nation, LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_name
        LIMIT 2
    ) c
    """,
    description="G2 LATERAL correlated subquery: top-2 customers per "
    "nation — the dependent-join shape Catalyst decorrelates into a "
    "partitioned rank, so per-nation LIMIT never becomes a nested loop",
)
def lateral_top2_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(
        """
        SELECT n_name, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS acctbal
        FROM nation, LATERAL (
            SELECT c_name, c_acctbal FROM customer
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_name
            LIMIT 2
        ) c
        """
    )


@register(
    "correlated_scalar_above_nation_avg",
    oracle="""
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer c
    WHERE CAST(c_acctbal AS DECIMAL(12,2))
          * (SELECT COUNT(*) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
    """,
    description="G2 correlated scalar subqueries in a predicate: "
    "customers above their nation's average balance — written as "
    "acctbal*count > sum so the comparison is exact integer/decimal "
    "math (a float AVG threshold could flip membership by one ulp "
    "between engines/partitionings); Catalyst decorrelates both "
    "subqueries into one grouped aggregate joined back",
)
def correlated_scalar_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
        FROM customer c
        WHERE CAST(c_acctbal AS DECIMAL(12,2))
              * (SELECT COUNT(*) FROM customer c2
                 WHERE c2.c_nationkey = c.c_nationkey)
              > (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer c2
                 WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@register(
    "recursive_cte_monthly_scaffold",
    oracle="""
    WITH RECURSIVE bounds AS (
        SELECT DATE_TRUNC('month', MIN(o_orderdate)) AS lo,
               DATE_TRUNC('month', MAX(o_orderdate)) AS hi
        FROM orders
    ),
    months(m, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
    ),
    rev AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS m,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS r,
               COUNT(*) AS n
        FROM orders GROUP BY 1
    )
    SELECT months.m AS month,
           CAST(COALESCE(rev.r, 0) AS DOUBLE) AS revenue,
           CAST(COALESCE(rev.n, 0) AS BIGINT) AS n_orders
    FROM months LEFT JOIN rev ON months.m = rev.m
    """,
    description="G11 WITH RECURSIVE (Spark 4): generate the gap-free "
    "monthly calendar between first and last order by fixpoint "
    "iteration, then left-join revenue — the standard-SQL scaffold "
    "generator. The recursion carries the upper bound as a column so "
    "each of the O(months) steps is a constant-row union, not a "
    "re-scan of orders (a correlated MAX() in the step predicate "
    "re-reads the fact table once per iteration — 6x slower even at "
    "fixture scale, unboundedly worse at 100 TB)",
)
def recursive_cte_monthly_scaffold(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
            SELECT DATE_TRUNC('month', MIN(o_orderdate)) AS lo,
                   DATE_TRUNC('month', MAX(o_orderdate)) AS hi
            FROM orders
        ),
        months(m, hi) AS (
            SELECT lo, hi FROM bounds
            UNION ALL
            SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
        ),
        rev AS (
            SELECT DATE_TRUNC('month', o_orderdate) AS m,
                   SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS r,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        )
        SELECT months.m AS month,
               CAST(COALESCE(rev.r, 0) AS DOUBLE) AS revenue,
               CAST(COALESCE(rev.n, 0) AS BIGINT) AS n_orders
        FROM months LEFT JOIN rev ON months.m = rev.m
        """
    )
