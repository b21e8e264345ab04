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


@register(
    "not_in_vs_not_exists_null_semantics",
    oracle="""
    WITH keys AS (
        SELECT CASE WHEN o_totalprice < 1000 THEN NULL
                    ELSE o_custkey END AS k
        FROM orders WHERE o_orderstatus = 'F'),
    not_in_count AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM keys)),
    not_exists_count AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = c.c_custkey)),
    has_null AS (
        SELECT CAST(COUNT(*) FILTER (WHERE k IS NULL) > 0 AS BOOLEAN) AS v
        FROM keys)
    SELECT (SELECT n FROM not_in_count) AS n_not_in,
           (SELECT n FROM not_exists_count) AS n_not_exists,
           (SELECT v FROM has_null) AS subquery_has_null
    """,
    description="SQL three-valued-logic contrast: NOT IN against a "
    "subquery containing NULL returns zero rows (UNKNOWN != TRUE for "
    "every candidate), while NOT EXISTS ignores the NULLs — both "
    "semantics evaluated in one row so the engines' ANSI null handling "
    "is pinned against each other",
)
def not_in_vs_not_exists_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic NOT IN / NULL trap, as a regression-pinned query.

    The NULL-bearing key set makes `x NOT IN (...)` evaluate to UNKNOWN
    for every x (x <> NULL is UNKNOWN, AND-folded across the list), so
    the NOT IN count is 0 while NOT EXISTS — which tests row existence,
    not value comparison — counts real non-buyers. Catalyst plans NOT
    IN as NullAware anti join and NOT EXISTS as a plain left-anti; both
    are single-shuffle joins at scale. An engine that 'fixes' NOT IN to
    mean NOT EXISTS silently changes answers — this row pins the ANSI
    behavior.
    """
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        WITH keys AS (
            SELECT CASE WHEN o_totalprice < 1000 THEN NULL
                        ELSE o_custkey END AS k
            FROM orders WHERE o_orderstatus = 'F'),
        not_in_count AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer
            WHERE c_custkey NOT IN (SELECT k FROM keys)),
        not_exists_count AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = c.c_custkey)),
        has_null AS (
            SELECT COUNT(CASE WHEN k IS NULL THEN 1 END) > 0 AS v FROM keys)
        SELECT (SELECT n FROM not_in_count) AS n_not_in,
               (SELECT n FROM not_exists_count) AS n_not_exists,
               (SELECT v FROM has_null) AS subquery_has_null
        """
    )


@register(
    "recursive_cte_part_hierarchy",
    oracle="""
    WITH RECURSIVE tree(pk, root, depth) AS (
        SELECT p_partkey, p_partkey, 0
        FROM part WHERE p_partkey < 8
        UNION ALL
        SELECT p.p_partkey, t.root, t.depth + 1
        FROM part p JOIN tree t ON p.p_partkey // 8 = t.pk
        WHERE p.p_partkey >= 8
    )
    SELECT CAST(depth AS INT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
           CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS retail_cents
    FROM tree JOIN part ON part.p_partkey = tree.pk
    GROUP BY 1
    ORDER BY depth
    """,
    description="G11 WITH RECURSIVE with a JOIN inside the recursive "
    "term (Spark 4): walk a derived parent-child hierarchy over part "
    "(parent = p_partkey div 8, roots are partkey 0..7), carrying root "
    "and depth through the fixpoint, then roll up node count, root "
    "count, and exact retail cents per depth level",
)
def recursive_cte_part_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-depth hierarchy traversal as a recursive CTE.

    Unlike `recursive_cte_monthly_scaffold` (a linear counter), the
    recursive term here JOINs the full `part` relation against the
    previous level — each iteration is one shuffle join whose output is
    the next tree level, so total work is O(levels) joins and the depth
    is log_8(|part|) (~5 at sf0.1, ~10 at 100 TB — far under the
    recursion-level limit). The reference has no hierarchy surface at
    all (its only traversal is the shard poll loop,
    consumer.py:111-117).
    """
    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        WITH RECURSIVE tree(pk, root, depth) AS (
            SELECT p_partkey, p_partkey, 0
            FROM part WHERE p_partkey < 8
            UNION ALL
            SELECT p.p_partkey, t.root, t.depth + 1
            FROM part p JOIN tree t ON p.p_partkey DIV 8 = t.pk
            WHERE p.p_partkey >= 8
        )
        SELECT CAST(depth AS INT) AS depth,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
               CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS retail_cents
        FROM tree JOIN part ON part.p_partkey = tree.pk
        GROUP BY 1
        ORDER BY depth
        """
    )
