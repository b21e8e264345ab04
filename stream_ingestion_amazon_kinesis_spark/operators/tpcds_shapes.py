"""TPC-DS-style query shapes the TPC-H set doesn't exercise.

The reference has no query surface at all (SURVEY §2.3 — its ETL is
consumer.py:117-175); the TPC-H family (relational.py, tpch_extra.py)
covers classic star-join aggregation. This module adds the decision-
support shapes TPC-DS is known for and TPC-H lacks:

- multi-channel UNION ALL feeding one shared ROLLUP (q5 shape)
- EXISTS / NOT EXISTS chains against multiple subqueries (q16/q69)
- many conditional counts over one scan (q88 "time-slot" shape)
- GROUPING SETS over a derived date dimension (q27/q36 shape)
- channel-membership set algebra INTERSECT/EXCEPT (q38/q87 shape)

All exact-decimal money math (functions.numeric) so every aggregate is
bit-identical to the DuckDB oracle at any partitioning; all integer
outputs are bigint on both engines.

Scale notes are per query; the common theme: each shape stays a single
shuffle-per-aggregation plan with map-side partials, channels are
derived columns (no data duplication beyond the UNION branches Spark
also scans once each with column pruning), and membership set algebra
runs on distinct keys, never row bags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import as_double, frac, money
from ..plans.registry import register
from ..sources.catalog import load_table, load_tables

_ONE = "CAST(1 AS DECIMAL(3,2))"
_DISC_PRICE = (
    f"CAST(l_extendedprice AS DECIMAL(12,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(3,2)))"
)


def _disc_price() -> F.Column:
    one = F.lit(1).cast("decimal(3,2)")
    return money("l_extendedprice") * (one - frac(F.col("l_discount")))


@register(
    "tpcds_channel_union_rollup",
    oracle=f"""
    WITH chan AS (
        SELECT 'sold' AS channel, n_name,
               {_DISC_PRICE} AS rev
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag <> 'R'
        UNION ALL
        SELECT 'returned' AS channel, n_name,
               {_DISC_PRICE} AS rev
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R')
    SELECT channel, n_name,
           GROUPING(channel) AS g_channel,
           GROUPING(n_name) AS g_nation,
           COUNT(*) AS n_items,
           CAST(SUM(rev) AS DOUBLE) AS revenue
    FROM chan
    GROUP BY ROLLUP (channel, n_name)
    """,
    description="TPC-DS q5 shape: two revenue channels (sold vs "
    "returned lineitems) UNION ALL'd into one shared "
    "ROLLUP(channel, nation) with GROUPING() markers — the "
    "multi-channel report TPC-H never asks for",
)
def tpcds_channel_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Channel is a DERIVED column of one scan: the two UNION branches
    carry complementary returnflag filters over the SAME
    lineitem⋈orders⋈customer⋈nation tree, so together they partition
    its rows — the union is equivalent to a single pass with
    channel = CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'sold'
    (plus an IS NOT NULL guard mirroring that a NULL flag fails BOTH
    branch predicates). The UNION-of-branches form executed the
    three-join tree TWICE (Catalyst does not merge complementary-filter
    subtree copies; measured 1.15 s vs 0.6 s at sf0.1, and the join
    work doubles at any scale); the derived-channel form joins once and
    feeds the same single ROLLUP shuffle with map-side partials. At
    100 TB the channels would be separate fact tables and the UNION
    would be real; over one table it is pure recompute."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    joined = (
        t["lineitem"]
        .filter(F.col("l_returnflag").isNotNull())
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    chan = joined.select(
        F.when(F.col("l_returnflag") == "R", F.lit("returned"))
        .otherwise(F.lit("sold"))
        .alias("channel"),
        "n_name",
        _disc_price().alias("rev"),
    )
    return chan.rollup("channel", "n_name").agg(
        F.grouping("channel").cast("bigint").alias("g_channel"),
        F.grouping("n_name").cast("bigint").alias("g_nation"),
        F.count("*").alias("n_items"),
        as_double(F.sum("rev")).alias("revenue"),
    )


@register(
    "tpcds_exists_chain_customers",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F'
                        AND o.o_totalprice < 50000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                      WHERE o.o_custkey = c.c_custkey
                        AND l.l_returnflag = 'R')
    GROUP BY c_mktsegment
    """,
    description="TPC-DS q16/q69 shape: EXISTS + two NOT EXISTS chained "
    "against different subqueries (urgent buyers, no cheap finished "
    "orders, no returns) — semi-join then two anti-joins, each a "
    "distinct-key relation",
)
def tpcds_exists_chain_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS chains compile to one left-semi plus one left-anti join
    per predicate — never a count-then-filter (which would shuffle the
    full bag per customer). Each subquery side is reduced to distinct
    custkeys before the join, so what shuffles is bounded by the
    customer dimension, not by orders x lineitem. AQE picks
    broadcast for whichever membership sets end up small."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    cheap_f = t["orders"].filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 50000)
    )
    returned = (
        t["orders"]
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey")
    )
    c = (
        t["customer"]
        .join(urgent, F.col("c_custkey") == urgent["o_custkey"], "left_semi")
        .join(cheap_f, F.col("c_custkey") == cheap_f["o_custkey"], "left_anti")
        .join(returned, F.col("c_custkey") == returned["o_custkey"], "left_anti")
    )
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        as_double(F.sum(money("c_acctbal"))).alias("sum_acctbal"),
    )


@register(
    "tpcds_multi_band_counts",
    oracle="""
    SELECT
        COUNT(CASE WHEN l_quantity >= 1  AND l_quantity < 7  THEN 1 END) AS band1,
        COUNT(CASE WHEN l_quantity >= 7  AND l_quantity < 13 THEN 1 END) AS band2,
        COUNT(CASE WHEN l_quantity >= 13 AND l_quantity < 19 THEN 1 END) AS band3,
        COUNT(CASE WHEN l_quantity >= 19 AND l_quantity < 25 THEN 1 END) AS band4,
        COUNT(CASE WHEN l_quantity >= 25 AND l_quantity < 31 THEN 1 END) AS band5,
        COUNT(CASE WHEN l_quantity >= 31 AND l_quantity < 37 THEN 1 END) AS band6,
        COUNT(CASE WHEN l_quantity >= 37 AND l_quantity < 43 THEN 1 END) AS band7,
        COUNT(CASE WHEN l_quantity >= 43                     THEN 1 END) AS band8
    FROM lineitem
    WHERE l_discount >= 0.02
    """,
    description="TPC-DS q88 shape: eight conditional counts (quantity "
    "bands) computed in ONE scan/aggregate — where q88 spells eight "
    "cross-joined subqueries, the engine form is a single-pass "
    "multi-conditional aggregate",
)
def tpcds_multi_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q88's eight scalar subqueries over the same fact table collapse
    into one scan with eight F.count(when(...)) partials — 8x less I/O
    than the literal translation and a single map-side-combined
    aggregate with a 1-row result; the discount filter is pushed to
    the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.02)
    q = F.col("l_quantity")

    def band(lo: int | None, hi: int | None, name: str) -> F.Column:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (q >= lo)
        if hi is not None:
            cond = cond & (q < hi)
        return F.count(F.when(cond, 1)).alias(name)

    return li.agg(
        band(1, 7, "band1"),
        band(7, 13, "band2"),
        band(13, 19, "band3"),
        band(19, 25, "band4"),
        band(25, 31, "band5"),
        band(31, 37, "band6"),
        band(37, 43, "band7"),
        band(43, None, "band8"),
    )


@register(
    "tpcds_date_dim_grouping_sets",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
           GROUPING(EXTRACT(YEAR FROM o_orderdate)) AS g_year,
           GROUPING(EXTRACT(QUARTER FROM o_orderdate)) AS g_quarter,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((EXTRACT(YEAR FROM o_orderdate),
                             EXTRACT(QUARTER FROM o_orderdate)),
                            (EXTRACT(YEAR FROM o_orderdate)),
                            ())
    """,
    description="TPC-DS q27/q36 shape: GROUPING SETS over a DERIVED "
    "date dimension (year, quarter) — (y,q) detail, yearly subtotal, "
    "grand total in one pass with GROUPING() markers",
)
def tpcds_date_dim_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS joins a date_dim table; this engine derives the calendar
    attributes from the order timestamp (year/quarter are pure column
    expressions, so no join at all) and feeds them to one grouping-sets
    shuffle with map-side partials — at 100 TB this is strictly
    cheaper than the date_dim broadcast join it replaces."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        money("o_totalprice").alias("p"),
    )
    return orders.groupingSets([["yr", "qtr"], ["yr"], []], "yr", "qtr").agg(
        F.grouping("yr").cast("bigint").alias("g_year"),
        F.grouping("qtr").cast("bigint").alias("g_quarter"),
        F.count("*").alias("n_orders"),
        as_double(F.sum("p")).alias("revenue"),
    )


@register(
    "tpcds_crosschannel_except",
    oracle="""
    WITH urgent AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderpriority = '1-URGENT'),
    high AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderpriority = '2-HIGH'),
    low AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderpriority = '5-LOW'),
    target AS (
        SELECT k FROM urgent
        INTERSECT
        SELECT k FROM high
        EXCEPT
        SELECT k FROM low)
    SELECT c_mktsegment,
           COUNT(*) AS n_customers
    FROM customer JOIN target ON c_custkey = k
    GROUP BY c_mktsegment
    """,
    description="TPC-DS q38/q87 shape: channel-membership set algebra "
    "— customers placing URGENT and HIGH priority orders but never "
    "LOW (INTERSECT then EXCEPT on distinct key sets), by segment",
)
def tpcds_crosschannel_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q38/q87 cross-channel audit: each channel reduces to a
    DISTINCT key set before any set op, so INTERSECT/EXCEPT shuffle
    only deduplicated custkeys (bounded by the customer dimension),
    never order bags. Catalyst plans the set ops as left-semi /
    left-anti hash joins on the hashed key."""
    t = load_tables(spark, sf_dir, "customer", "orders")

    def channel(prio: str) -> DataFrame:
        return (
            t["orders"]
            .filter(F.col("o_orderpriority") == prio)
            .select(F.col("o_custkey").alias("k"))
            .distinct()
        )

    target = (
        channel("1-URGENT").intersect(channel("2-HIGH")).exceptAll(channel("5-LOW"))
    )
    return (
        t["customer"]
        .join(target, F.col("c_custkey") == F.col("k"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "tpcds_window_channel_crossover",
    oracle="""
    WITH sold AS (
        SELECT date_trunc('month', o_orderdate) AS mon,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                   AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag <> 'R'
        GROUP BY 1),
    ret AS (
        SELECT date_trunc('month', o_orderdate) AS mon,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                   AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY 1),
    series AS (
        SELECT COALESCE(s.mon, r.mon) AS mon,
               COALESCE(s.rev, 0) AS sold_rev,
               COALESCE(r.rev, 0) AS ret_rev
        FROM sold s FULL OUTER JOIN ret r ON s.mon = r.mon),
    cum AS (
        SELECT mon,
               SUM(sold_rev) OVER (ORDER BY mon
                                   ROWS UNBOUNDED PRECEDING) AS cum_sold,
               SUM(ret_rev) OVER (ORDER BY mon
                                  ROWS UNBOUNDED PRECEDING) AS cum_returned
        FROM series)
    SELECT mon,
           CAST(cum_sold AS DOUBLE) AS cum_sold,
           CAST(cum_returned AS DOUBLE) AS cum_returned
    FROM cum
    WHERE cum_returned * 2 > cum_sold
    ORDER BY mon
    """,
    description="TPC-DS q51 shape: two channel series (sold vs "
    "returned revenue by month) FULL OUTER JOINed on the date key, "
    "exact-decimal cumulative sums over the merged series, rows where "
    "the cumulative curves cross a threshold",
)
def tpcds_window_channel_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q51's signature plan: aggregate two channels independently,
    align them with a full outer join on the time key (months missing
    in one channel still appear), then run cumulative windows over the
    merged series. The global ORDER BY mon window is over months —
    bounded by calendar length, not data size — so the single-partition
    window is safe at any scale; everything upstream is partial-agg'd
    per channel before the join. Exact decimal cumsums keep the
    crossover predicate bit-identical cross-engine."""
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    joined = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
    )

    def monthly(flag_cond) -> DataFrame:
        return (
            joined.filter(flag_cond)
            .groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
            .agg(F.sum(_disc_price()).alias("rev"))
        )

    sold = monthly(F.col("l_returnflag") != "R").withColumnRenamed("rev", "s_rev")
    ret = monthly(F.col("l_returnflag") == "R").withColumnRenamed("rev", "r_rev")
    series = (
        sold.alias("s")
        .join(ret.alias("r"), F.col("s.mon") == F.col("r.mon"), "full_outer")
        .select(
            F.coalesce(F.col("s.mon"), F.col("r.mon")).alias("mon"),
            F.coalesce(F.col("s_rev"), F.lit(0).cast("decimal(16,4)")).alias(
                "sold_rev"
            ),
            F.coalesce(F.col("r_rev"), F.lit(0).cast("decimal(16,4)")).alias(
                "ret_rev"
            ),
        )
    )
    w = Window.orderBy("mon").rowsBetween(Window.unboundedPreceding, 0)
    cum = series.select(
        "mon",
        F.sum("sold_rev").over(w).alias("cum_sold_d"),
        F.sum("ret_rev").over(w).alias("cum_returned_d"),
    )
    return (
        cum.filter(F.col("cum_returned_d") * 2 > F.col("cum_sold_d"))
        .select(
            "mon",
            as_double(F.col("cum_sold_d")).alias("cum_sold"),
            as_double(F.col("cum_returned_d")).alias("cum_returned"),
        )
        .orderBy("mon")
    )


@register(
    "hierarchy_share_of_parent",
    oracle="""
    WITH leaf AS (
        SELECT r_name AS region, n_name AS nation,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY 1, 2),
    cents AS (
        SELECT region, nation,
               CAST(rev * 100 AS BIGINT) AS cents
        FROM leaf),
    agg AS (
        SELECT region, nation, cents,
               SUM(cents) OVER (PARTITION BY region) AS region_cents,
               SUM(cents) OVER () AS total_cents
        FROM cents)
    SELECT region, nation,
           CAST(cents AS BIGINT) AS rev_cents,
           CAST((cents * 1000000) // region_cents AS BIGINT)
               AS share_of_region_ppm,
           CAST((region_cents * 1000000) // total_cents AS BIGINT)
               AS region_share_of_total_ppm
    FROM agg
    ORDER BY region, nation
    """,
    description="BI percent-of-parent over the region>nation hierarchy: "
    "leaf revenue in exact cents, nation share of its region and "
    "region share of the grand total in truncating-integer ppm — two "
    "window sums over the bounded leaf relation, one fact scan",
)
def hierarchy_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drill-down ratio report every BI tool generates: each level's
    share of its parent. One scan aggregates the fact table to the
    (region, nation) leaf grain — bounded by the dimension domains, so
    the two window sums that derive parent totals run over a tiny
    relation no matter the fact cardinality; shares are truncating
    integer ppm on exact cents (both engines truncate identically on
    non-negatives), never float division."""
    t = load_tables(spark, sf_dir, "orders", "customer", "nation", "region")
    leaf = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            (F.sum(money("o_totalprice")) * 100).cast("bigint").alias("cents")
        )
    )
    agg = leaf.select(
        "region",
        "nation",
        "cents",
        F.sum("cents").over(Window.partitionBy("region")).alias("region_cents"),
        F.sum("cents").over(Window.partitionBy()).alias("total_cents"),
    )
    return agg.select(
        "region",
        "nation",
        F.col("cents").alias("rev_cents"),
        F.expr("(cents * 1000000) div region_cents")
        .cast("bigint")
        .alias("share_of_region_ppm"),
        F.expr("(region_cents * 1000000) div total_cents")
        .cast("bigint")
        .alias("region_share_of_total_ppm"),
    ).orderBy("region", "nation")


@register(
    "tpcds_yoy_growth_cohort",
    oracle="""
    WITH yearly AS (
        SELECT o_custkey,
               CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1995
                             THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                                       AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS cents_y1,
               CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1996
                             THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                                       AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS cents_y2
        FROM orders
        WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)
        GROUP BY o_custkey),
    grown AS (
        SELECT o_custkey,
               (cents_y2 * 1000000) // cents_y1 AS growth_ppm
        FROM yearly
        WHERE cents_y1 > 0 AND cents_y2 > 0)
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN growth_ppm > 1000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_grew,
           CAST(MAX(growth_ppm) AS BIGINT) AS max_growth_ppm
    FROM grown JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    description="TPC-DS q4/q11 shape: year-over-year customer growth "
    "cohort — both-year spenders, growth ratio in truncating ppm on "
    "exact cents, per-segment counts of who grew",
)
def tpcds_yoy_growth_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4/q11 compare a customer's spend trajectory across years and
    channels; the engine form pivots both years out of ONE scan with
    conditional sums (no self-join of yearly aggregates — the classic
    q4 plan joins the same CTE 2-6 times, this computes all years in
    one pass), guards the ratio with both-year > 0, and keeps the
    growth ratio in truncating-integer ppm so the cohort predicate
    `grew: ppm > 1e6` is bit-exact on both engines."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    yr = F.year("o_orderdate")
    cents = (money("o_totalprice") * 100).cast("bigint")
    yearly = (
        t["orders"]
        .filter(yr.isin(1995, 1996))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(yr == 1995, cents).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("cents_y1"),
            F.sum(F.when(yr == 1996, cents).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("cents_y2"),
        )
    )
    grown = yearly.filter(
        (F.col("cents_y1") > 0) & (F.col("cents_y2") > 0)
    ).select(
        "o_custkey",
        F.expr("(cents_y2 * 1000000) div cents_y1").alias("growth_ppm"),
    )
    return (
        grown.join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.when(F.col("growth_ppm") > 1000000, 1).otherwise(0))
            .cast("bigint")
            .alias("n_grew"),
            F.max("growth_ppm").cast("bigint").alias("max_growth_ppm"),
        )
    )


@register(
    "tpcds_rollup_topn_per_level",
    oracle="""
    WITH r AS (
        SELECT n_name, o_orderpriority,
               GROUPING(n_name) AS g_nation,
               GROUPING(o_orderpriority) AS g_priority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, o_orderpriority)),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY g_nation, g_priority, n_name
                   ORDER BY revenue DESC, o_orderpriority NULLS FIRST) AS rk
        FROM r)
    SELECT n_name, o_orderpriority, g_nation, g_priority, revenue,
           CAST(rk AS BIGINT) AS rk
    FROM ranked
    WHERE rk <= 3
    ORDER BY g_nation, g_priority, n_name NULLS FIRST,
             o_orderpriority NULLS FIRST
    """,
    description="TPC-DS q67 shape: window rank WITHIN each rollup "
    "level — top-3 priorities per nation, plus the per-nation and "
    "grand-total subtotal rows ranked within their own level, "
    "grouping markers as the window partition keys",
)
def tpcds_rollup_topn_per_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q67 ranks inside rollup output — the window's partition keys
    must include the GROUPING() markers, else detail rows and
    subtotal rows (whose rollup columns are NULL) collapse into one
    partition and ranks interleave across levels. The window runs
    over the rollup RESULT (bounded by the grouping-set domains), not
    the fact table, so the rank stage is near-free at any fact
    cardinality. Deterministic tiebreak on the priority key."""
    from pyspark.sql.window import Window as _W

    t = load_tables(spark, sf_dir, "orders", "customer", "nation")
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    r = joined.rollup("n_name", "o_orderpriority").agg(
        F.grouping("n_name").cast("bigint").alias("g_nation"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
        as_double(F.sum(money("o_totalprice"))).alias("revenue"),
    )
    w = _W.partitionBy("g_nation", "g_priority", "n_name").orderBy(
        F.desc("revenue"), F.asc_nulls_first("o_orderpriority")
    )
    return (
        r.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .orderBy(
            "g_nation",
            "g_priority",
            F.asc_nulls_first("n_name"),
            F.asc_nulls_first("o_orderpriority"),
        )
    )


@register(
    "dense_monthly_nation_report",
    oracle="""
    WITH months AS (
        SELECT unnest(generate_series(
                   (SELECT date_trunc('month', MIN(o_orderdate)) FROM orders),
                   (SELECT date_trunc('month', MAX(o_orderdate)) FROM orders),
                   INTERVAL '1 month')) AS mon),
    rev AS (
        SELECT n_name, date_trunc('month', o_orderdate) AS mon,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS r
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
    SELECT n.n_name, m.mon,
           CAST(COALESCE(rev.r, 0) AS DOUBLE) AS revenue,
           CASE WHEN rev.r IS NULL THEN 1 ELSE 0 END AS was_missing
    FROM nation n CROSS JOIN months m
    LEFT JOIN rev ON rev.n_name = n.n_name AND rev.mon = m.mon
    ORDER BY n.n_name, m.mon
    """,
    description="dense BI report: every (nation, month) cell present "
    "even when no orders exist — calendar spine from min/max dates "
    "cross the bounded dimension, left-joined to the sparse aggregate, "
    "zero-filled with a missing flag",
)
def dense_monthly_nation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-grid reports (every cell, zeros included) are a LEFT JOIN
    from a generated spine, never an aggregation trick: the month
    spine comes from one min/max aggregate + sequence (bounded by the
    calendar), crossed with the bounded nation dim — both broadcast —
    then left-joined to the sparse revenue aggregate. The only
    fact-sized operation is the one revenue groupBy; the dense grid
    is dimension-sized. `was_missing` makes imputation auditable."""
    t = load_tables(spark, sf_dir, "orders", "customer", "nation")
    span = t["orders"].agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    months = span.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 month"))
        ).alias("mon")
    )
    rev = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("rn"), F.date_trunc("month", "o_orderdate").alias("rmon")
        )
        .agg(F.sum(money("o_totalprice")).alias("r"))
    )
    grid = t["nation"].select("n_name").crossJoin(F.broadcast(months))
    return (
        grid.join(
            rev,
            (F.col("n_name") == F.col("rn")) & (F.col("mon") == F.col("rmon")),
            "left",
        )
        .select(
            "n_name",
            "mon",
            F.coalesce(F.col("r"), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue"),
            F.when(F.col("r").isNull(), 1).otherwise(0).alias("was_missing"),
        )
        .orderBy("n_name", "mon")
    )


@register(
    "quantity_discount_grid",
    oracle="""
    SELECT (CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) - 1) // 10
               AS qty_band,
           CAST(CAST(CAST(l_discount AS DECIMAL(3,2)) * 100 AS BIGINT) // 2
                AS BIGINT) AS disc_band,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS revenue
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    description="2-D banded contingency of two continuous variables: "
    "quantity deciles x discount 2-point bands, line counts and exact "
    "revenue per cell — the interaction grid behind pricing analyses, "
    "one map-side-banded aggregate",
)
def quantity_discount_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding both axes IN the grouping expression (integer
    arithmetic, no join against a band dim) keeps this a single
    hash aggregate whose cell count is the product of the band
    domains — bounded, so map-side partials collapse each partition
    to the grid size before the exchange. Discount bands come from
    cents-scaled integers (float banding boundaries would put
    borderline rows in different cells per engine)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_band = F.expr(
        "(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) - 1) div 10"
    )
    disc_band = F.expr(
        "CAST(CAST(CAST(l_discount AS DECIMAL(3,2)) * 100 AS BIGINT) div 2 "
        "AS BIGINT)"
    )
    return (
        li.groupBy(
            qty_band.alias("qty_band"), disc_band.alias("disc_band")
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(money("l_extendedprice")).cast("double").alias("revenue"),
        )
        .orderBy("qty_band", "disc_band")
    )


@register(
    "tpcds_return_ratio_top_parts",
    oracle="""
    WITH pr AS (
        SELECT l_partkey,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS qty_returned,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total
        FROM lineitem GROUP BY 1),
    scored AS (
        SELECT l_partkey, qty_returned, qty_total,
               (1000000 * qty_returned) // qty_total AS return_ppm
        FROM pr WHERE qty_total >= 50),
    ranked AS (
        SELECT *, RANK() OVER (ORDER BY return_ppm DESC, l_partkey) AS rnk
        FROM scored)
    SELECT l_partkey, qty_returned, qty_total, return_ppm,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 10
    """,
    description="TPC-DS q49-style worst-return-ratio ranking: per-part "
    "returned/shipped quantity ratio in truncated ppm, volume floor "
    "qty_total >= 50, top 10 by RANK with partkey tiebreak",
)
def tpcds_return_ratio_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst return-ratio parts (q49 shape on the TPC-H-ish fixture).

    One map-side-combinable conditional aggregate on l_partkey, a
    volume floor to kill small-denominator noise, then a OVERPROVISIONED-LIMIT
    top selection: orderBy+limit(100) is a TakeOrderedAndProject
    (per-partition partial top-100, driver merge — no single-partition
    window over the |parts|-sized score relation, which is billions of
    rows at 100 TB), and RANK runs on the 100-row slice only. The
    slice's RANK values equal the global RANK for every row that can
    satisfy rnk <= 10: the window ORDER BY includes l_partkey so ties
    need equal (return_ppm, l_partkey) — impossible after the groupBy —
    and the 10x headroom would bound boundary ties even without the
    tiebreak. Integer ppm division keeps ranking bit-stable across
    engines.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", qty).otherwise(0))
        .cast("bigint")
        .alias("qty_returned"),
        F.sum(qty).cast("bigint").alias("qty_total"),
    )
    scored = pr.filter(F.col("qty_total") >= 50).withColumn(
        "return_ppm", F.expr("(1000000 * qty_returned) div qty_total")
    )
    top = scored.orderBy(F.desc("return_ppm"), "l_partkey").limit(100)
    w = W.orderBy(F.desc("return_ppm"), "l_partkey")  # 100-row slice only
    return (
        top.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 10)
        .select("l_partkey", "qty_returned", "qty_total", "return_ppm", "rnk")
    )


@register(
    "tpcds_order_count_bands",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY o_custkey),
    banded AS (
        SELECT p.o_custkey, p.n_orders,
               CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS acct_cents
        FROM per_cust p JOIN customer ON o_custkey = c_custkey
        WHERE p.n_orders BETWEEN 2 AND 10)
    SELECT CAST(n_orders AS BIGINT) AS orders_in_band,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(acct_cents) AS BIGINT) AS acct_cents
    FROM banded
    GROUP BY n_orders
    ORDER BY orders_in_band
    """,
    description="TPC-DS q34/q73 shape: customers whose urgent-priority "
    "order count falls in a band (HAVING-style band on a grouped count, "
    "then join back to the dimension for attributes) — the "
    "find-entities-by-activity-level pattern",
)
def tpcds_order_count_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-band selection then dimension join-back.

    The per-customer count collapses the fact table before anything
    joins — the join input is |customers-in-band|, not |orders|. AQE
    picks broadcast for the collapsed side when small; the band filter
    is applied before the join on the aggregated relation, exactly
    where a 100-TB plan wants it.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders").between(2, 10))
    )
    acct_cents = (F.col("c_acctbal").cast("decimal(12,2)") * 100).cast("bigint")
    banded = per_cust.join(cust, per_cust.o_custkey == cust.c_custkey).select(
        "n_orders", acct_cents.alias("acct_cents")
    )
    return (
        banded.groupBy(F.col("n_orders").cast("bigint").alias("orders_in_band"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("acct_cents").cast("bigint").alias("acct_cents"),
        )
        .orderBy("orders_in_band")
    )
