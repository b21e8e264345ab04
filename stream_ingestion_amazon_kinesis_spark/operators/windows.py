"""Window functions — ranking, analytic, frames (SURVEY §2.3 G8).

One shuffle per distinct (partitionBy, orderBy) pair; Catalyst reuses
the sort across window expressions sharing a spec, so every query here
keeps all its window expressions on a single spec where possible.
Running sums use exact DECIMAL accumulation (order within a partition
is total via tiebreak keys, so results are engine-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.numeric import as_double, money
from ..plans.registry import register
from ..sources.catalog import load_table


@register(
    "window_running_total_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS order_seq
    FROM orders
    """,
    description="G8 running frame sum + row_number on one window spec",
)
def window_running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        as_double(
            F.sum(money("o_totalprice")).over(w.rowsBetween(W.unboundedPreceding, 0))
        ).alias("running_total"),
        # bigint to match SQL window-function output type cross-engine
        F.row_number().over(w).cast("bigint").alias("order_seq"),
    )


@register(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders)
    WHERE rnk <= 3
    """,
    description="G8/G9 top-k per group via ranked window",
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@register(
    "window_lag_event_deltas",
    oracle="""
    SELECT event_id, user_id, ts, value,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS value_delta,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_event_type
    FROM events
    """,
    description="G8 lag/lead analytics over the event stream table",
)
def window_lag_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@register(
    "window_moving_avg_events",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(12,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS moving_avg
    FROM events
    """,
    description="G8 bounded frame (3-row moving average), exact decimal sum / count",
)
def window_moving_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        (as_double(F.sum(money("value")).over(w)) / F.count("*").over(w)).alias(
            "moving_avg"
        ),
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           RANK() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS bal_rank,
           DENSE_RANK() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS bal_dense_rank,
           NTILE(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS bal_quartile
    FROM supplier
    """,
    description="G8 rank/dense_rank/ntile on a global window (small dim)",
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    w = W.orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    return supplier.select(
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).cast("bigint").alias("bal_rank"),
        F.dense_rank().over(w).cast("bigint").alias("bal_dense_rank"),
        F.ntile(4).over(w).cast("bigint").alias("bal_quartile"),
    )


@register(
    "window_percent_rank_cume",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           PERCENT_RANK() OVER w AS bal_pct_rank,
           CUME_DIST() OVER w AS bal_cume_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    description="G8 percent_rank + cume_dist per market segment (tie-broken "
    "total order so both distributions are deterministic)",
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions: both are rank/count int
    ratios, so the doubles are bit-identical across engines. Partitioned
    by segment — at 100 TB each partition's sort is independent; no
    global single-partition window anywhere."""
    customer = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )


@register(
    "topk_orders_per_customer_agg",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) rn
        FROM orders)
    WHERE rn <= 3
    """,
    description="G9 top-k per group WITHOUT a window sort: "
    "collect_list -> sort_array -> slice -> inline; same result as the "
    "window formulation, different physical strategy",
)
def topk_orders_per_customer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aggregation formulation of per-group top-k: one hash
    aggregate collecting (price, key) structs, sort+slice per group,
    inline back to rows. Versus the window version
    (`window_topk_orders_per_customer`): no per-partition sort of the
    FULL relation — the only ordered work is per-group over the
    collected array. For small k and modest group sizes this trades the
    window's sort for agg memory; the oracle pins both to identical
    rows. (With unbounded groups prefer the window; with a skewed hot
    key, slice caps the array the same way the docstring on
    sessionize_events prescribes.)"""
    orders = load_table(spark, sf_dir, "orders")
    # sort desc by (price, -orderkey): encode as struct ordering with
    # negated tiebreak, then fix sign on output — sort_array is ASC on
    # struct fields, so sort on (-price, orderkey).
    item = F.struct(
        (-F.col("o_totalprice")).alias("neg_price"),
        F.col("o_orderkey").alias("o_orderkey"),
    )
    top = (
        orders.groupBy("o_custkey")
        .agg(F.slice(F.sort_array(F.collect_list(item)), 1, 3).alias("top3"))
        .select("o_custkey", F.inline("top3"))
        .select(
            "o_custkey",
            "o_orderkey",
            (-F.col("neg_price")).alias("o_totalprice"),
        )
    )
    return top


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events)
    SELECT event_type, next_type,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    description="G8 behavioral transition matrix: per-user lead() over "
    "event-time order -> (type, next_type) pair counts — the Markov-chain "
    "profile of session behavior",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts over each user's event sequence:
    one window pass (partitioned by user — per-key sort, never global),
    one pair rollup. The output is the empirical Markov matrix used for
    both behavior analytics and synthetic-session generation; total
    tiebreak (ts, event_id) keeps lead() deterministic under ties."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    return seq.groupBy("event_type", "next_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


MICROS_HOUR = 3_600_000_000


@register(
    "window_range_time_frame",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CAST(FLOOR(value) AS BIGINT) AS v
        FROM events)
    SELECT user_id, event_id,
           CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY us
                             RANGE BETWEEN {MICROS_HOUR} PRECEDING
                                       AND CURRENT ROW) AS BIGINT)
               AS trailing_1h_sum,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                               RANGE BETWEEN {MICROS_HOUR} PRECEDING
                                         AND CURRENT ROW) AS BIGINT)
               AS trailing_1h_n
    FROM e
    """,
    description="G8 RANGE window frame: per-user trailing-1-hour sum/count "
    "over event time (value-range bounds, not row counts)",
)
def window_range_time_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RANGE-frame complement to the rowsBetween windows: the frame
    is bounded by the ORDER value (microseconds of event time), so two
    events 59 minutes apart share a frame regardless of how many rows
    sit between them. Spark's range frames need a numeric order column —
    unix_micros(ts) — which also makes the bound an exact integer on
    both engines. Ties in `us` are fine: RANGE includes all peers, the
    same on both. Integer floor(value) keeps sums exact."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.floor("value").cast("bigint").alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-MICROS_HOUR, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum("v").over(w).cast("bigint").alias("trailing_1h_sum"),
        F.count("*").over(w).cast("bigint").alias("trailing_1h_n"),
    )


@register(
    "status_runs_per_customer",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               CASE WHEN LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                                  ORDER BY o_orderdate, o_orderkey)
                         IS DISTINCT FROM o_orderstatus
                    THEN 1 ELSE 0 END AS new_run
        FROM orders),
    islands AS (
        SELECT o_custkey, o_orderstatus,
               SUM(new_run) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey
                                  ROWS UNBOUNDED PRECEDING) AS run_id
        FROM seq),
    runs AS (
        SELECT o_custkey, o_orderstatus, run_id, COUNT(*) AS run_len
        FROM islands GROUP BY 1, 2, 3)
    SELECT o_orderstatus,
           COUNT(*) AS n_runs,
           CAST(MAX(run_len) AS BIGINT) AS longest_run,
           CAST(SUM(run_len) AS BIGINT) AS total_orders
    FROM runs GROUP BY o_orderstatus
    """,
    description="G8 gaps-and-islands run labeling: lag-flag + running sum "
    "-> consecutive same-status runs per customer, run-length profile",
)
def status_runs_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The general island-labeling technique (lag to flag boundaries,
    cumulative sum to number islands) applied to status runs — the same
    shape the session-window oracle uses for time gaps, usable for any
    'consecutive equal values' question where session_window doesn't
    fit. Two window passes over the SAME partition+ordering spec, so
    Catalyst plans one sort; the rollups are map-side combined."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = orders.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        "o_orderkey",
        F.when(
            ~F.lag("o_orderstatus").over(w).eqNullSafe(F.col("o_orderstatus")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    islands = flagged.select(
        "o_custkey",
        "o_orderstatus",
        F.sum("new_run")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("run_id"),
    )
    runs = islands.groupBy("o_custkey", "o_orderstatus", "run_id").agg(
        F.count("*").alias("run_len")
    )
    return runs.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_runs"),
        F.max("run_len").alias("longest_run"),
        F.sum("run_len").alias("total_orders"),
    )


@register(
    "weekly_revenue_growth",
    oracle="""
    WITH weekly AS (
        SELECT date_trunc('week', o_orderdate) AS week_start,
               SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                   AS cents
        FROM orders GROUP BY 1)
    SELECT week_start,
           CAST(cents AS BIGINT) AS cents,
           CAST(LAG(cents) OVER (ORDER BY week_start) AS BIGINT) AS prev_cents,
           CAST(CASE WHEN LAG(cents) OVER (ORDER BY week_start) > 0
                     THEN ((cents - LAG(cents) OVER (ORDER BY week_start))
                           * 1000000)
                          // LAG(cents) OVER (ORDER BY week_start)
                END AS BIGINT) AS growth_ppm
    FROM weekly
    """,
    description="G8 period-over-period growth: lag over the AGGREGATED "
    "weekly series, integer parts-per-million growth",
)
def weekly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reporting staple: aggregate to the period grain first (the
    only corpus-sized work), then lag over the tiny weekly series — the
    unpartitioned window is over |weeks| rows, never raw data. Growth is
    integer ppm via floor division, exact on both engines (same
    int-division boundary argument as safe_arithmetic_orders)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (money("o_totalprice") * 100).cast("bigint")
    weekly = orders.groupBy(
        F.date_trunc("week", "o_orderdate").alias("week_start")
    ).agg(F.sum(cents).alias("cents"))
    w = W.orderBy("week_start")
    with_prev = weekly.select(
        "week_start",
        "cents",
        F.lag("cents").over(w).cast("bigint").alias("prev_cents"),
    )
    # `div` (integer division) truncates toward zero on BOTH engines;
    # floor(double/..) would floor toward -inf and disagree on negative
    # growth weeks.
    growth = F.when(
        F.col("prev_cents") > 0,
        F.expr("(cents - prev_cents) * 1000000 div prev_cents"),
    ).cast("bigint")
    return with_prev.select(
        "week_start", "cents", "prev_cents", growth.alias("growth_ppm")
    )


@register(
    "window_distinct_types_trailing",
    oracle=f"""
    SELECT e.event_id,
           e.user_id,
           CAST((SELECT COUNT(DISTINCT e2.event_type)
                 FROM events e2
                 WHERE e2.user_id = e.user_id
                   AND e2.ts <= e.ts
                   AND e2.ts >= e.ts - INTERVAL '1 hour') AS BIGINT)
               AS distinct_types_1h
    FROM events e
    """,
    description="G8 set aggregation over a RANGE window: per event, how many "
    "distinct event types the user produced in the trailing hour "
    "(collect_set over a time-range frame)",
)
def window_distinct_types_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) isn't a window aggregate, but collect_set is:
    the distinct-in-window count is the SIZE of the set aggregated over
    the range frame. State per row is bounded by the type cardinality
    (small by construction), so the frame never accumulates raw rows —
    the scalable form of 'distinct things per trailing window'. The
    oracle spells the same semantics as a correlated subquery (DuckDB
    has no set-valued window aggregate)."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"), "event_type"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-MICROS_HOUR, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("bigint")
        .alias("distinct_types_1h"),
    )


@register(
    "window_first_nth_ignore_nulls",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lead(o_totalprice) OVER w_ord AS next_price,
           first_value(CASE WHEN o_totalprice > 150000
                            THEN o_totalprice END IGNORE NULLS)
               OVER w_full AS first_big_price,
           nth_value(CASE WHEN o_totalprice > 150000
                          THEN o_totalprice END, 2 IGNORE NULLS)
               OVER w_full AS second_big_price
    FROM orders
    WINDOW w_ord AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey),
           w_full AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
    description="G8 null-skipping analytic windows: lead plus "
    "first_value/nth_value(2) IGNORE NULLS over a conditional column — "
    "the earliest and second high-value order per customer in date "
    "order, broadcast to every row of the partition",
)
def window_first_nth_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three analytics share one (partition, order) spec — a
    single sort-shuffle on o_custkey serves the whole query; only the
    frame differs (running for lead, full-partition for the
    first/nth broadcasts). The conditional column turns IGNORE NULLS
    into a filtered positional lookup without a second pass or join.
    Total tiebreak (o_orderdate, o_orderkey) keeps every value
    engine-independent."""
    orders = load_table(spark, sf_dir, "orders")
    w_ord = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w_ord.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    big = F.when(F.col("o_totalprice") > 150000, F.col("o_totalprice"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_totalprice").over(w_ord).alias("next_price"),
        F.first(big, ignorenulls=True).over(w_full).alias("first_big_price"),
        F.nth_value(big, 2, ignoreNulls=True).over(w_full).alias("second_big_price"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "topk_with_ties_orders",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC) AS rk
        FROM orders)
    WHERE rk <= 3
    ORDER BY o_orderpriority, rk, o_orderkey
    """,
    description="top-k WITH TIES per group: RANK() <= 3 keeps every "
    "order tied at the cutoff price (row_number top-k silently drops "
    "ties — different business semantics), deterministic output via "
    "the key sort",
)
def topk_with_ties_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH TIES semantics: the result size per group is >= k whenever
    the cutoff value repeats, which is what 'top 3 prices' usually
    means to an analyst (row_number's arbitrary tie drop is a bug
    report waiting to happen). Same single-shuffle ranking plan as
    row_number; only the rank function changes."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .orderBy("o_orderpriority", "rk", "o_orderkey")
    )


@register(
    "window_value_range_frame",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM orders)
    SELECT o_orderkey, o_orderpriority, cents,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_near,
           CAST(SUM(cents) OVER w AS BIGINT) AS sum_near_cents
    FROM o
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents
                 RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING)
    ORDER BY o_orderkey
    """,
    description="G8 value-based RANGE window frame: for every order, the "
    "count and exact-cents sum of same-priority orders priced within "
    "±$500 — a sliding-value-band density profile (RANGE frames over a "
    "numeric ORDER BY, not time and not ROWS)",
)
def window_value_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame: ±500-dollar neighborhood per order.

    RANGE frames bound by VALUE distance (not row count) are the one
    frame type the ROWS family can't emulate; Spark evaluates them with
    a single sort per partition and a sliding aggregate — one shuffle
    on the partition key. Frame arithmetic is on exact integer cents,
    so frame membership is identical across engines (a double ordering
    key could disagree at the boundary ulp).
    """
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_orderpriority",
        (money("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("cents")
        .rangeBetween(-50000, 50000)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.count("*").over(w).alias("n_near"),
        F.sum("cents").over(w).alias("sum_near_cents"),
    ).orderBy("o_orderkey")


@register(
    "revenue_concentration_topdecile",
    oracle="""
    WITH cust_rev AS (
        SELECT c.c_nationkey, o.o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
                   AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
    ranked AS (
        SELECT c_nationkey, cents,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY cents DESC, o_custkey) AS rn,
               COUNT(*) OVER (PARTITION BY c_nationkey) AS n_cust
        FROM cust_rev)
    SELECT n.n_name,
           CAST(ANY_VALUE(n_cust) AS BIGINT) AS n_customers,
           CAST((ANY_VALUE(n_cust) + 9) // 10 AS BIGINT) AS n_top,
           CAST(SUM(CASE WHEN rn <= (n_cust + 9) // 10 THEN cents END)
                AS BIGINT) AS top_cents,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           (1000000 * CAST(SUM(CASE WHEN rn <= (n_cust + 9) // 10
                                    THEN cents END) AS BIGINT))
               // CAST(SUM(cents) AS BIGINT) AS top_share_ppm
    FROM ranked r JOIN nation n ON n.n_nationkey = r.c_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    description="G5/G8 revenue concentration: the top-decile customers' "
    "share of each nation's revenue (ceil(n/10) by ranked exact-cents "
    "spend, custkey tiebreak) in exact ppm — the 80/20 concentration "
    "KPI next to the Gini query",
)
def revenue_concentration_topdecile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10%-customers revenue share per nation, all-integer.

    Per-customer revenue is an exact-cents aggregate; the per-nation
    ranking window is |customers|-sized per nation; everything after is
    a 25-row rollup joined to the broadcast nation dim. ceil(n/10) is
    integer ((n+9) div 10); the share is truncating-ppm on non-negative
    operands.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust_rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(money("o_totalprice") * 100).cast("bigint").alias("cents"))
    )
    wr = W.partitionBy("c_nationkey").orderBy(F.desc("cents"), "o_custkey")
    wc = W.partitionBy("c_nationkey")
    ranked = cust_rev.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n_cust", F.count("*").over(wc)
    )
    agg = (
        ranked.join(F.broadcast(nation), ranked.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.first("n_cust").cast("bigint").alias("n_customers"),
            F.expr("(first(n_cust) + 9) div 10").cast("bigint").alias("n_top"),
            F.sum(
                F.when(F.col("rn") <= F.expr("(n_cust + 9) div 10"), F.col("cents"))
            )
            .cast("bigint")
            .alias("top_cents"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )
    return agg.select(
        "n_name",
        "n_customers",
        "n_top",
        "top_cents",
        "total_cents",
        F.expr("(1000000 * top_cents) div total_cents").alias("top_share_ppm"),
    ).orderBy("n_name")


@register(
    "monotone_run_lengths",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders),
    flagged AS (
        SELECT o_custkey, o_orderdate, o_orderkey,
               CASE WHEN LAG(cents) OVER w IS NULL
                         OR cents <= LAG(cents) OVER w
                    THEN 1 ELSE 0 END AS brk
        FROM o
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)),
    runs AS (
        SELECT o_custkey,
               SUM(brk) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM flagged),
    run_sizes AS (
        SELECT o_custkey, run_id, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM runs GROUP BY 1, 2),
    best AS (
        SELECT o_custkey, MAX(run_len) AS max_streak
        FROM run_sizes GROUP BY 1)
    SELECT max_streak, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM best
    GROUP BY max_streak
    ORDER BY max_streak
    """,
    description="G8 monotone-streak islands: per customer, the longest "
    "run of strictly increasing order totals over their order history "
    "(a break starts whenever cents <= previous), rolled into a "
    "streak-length histogram — the islands variant where the boundary "
    "condition is a comparison, not equality or a time gap",
)
def monotone_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing spend streak per customer.

    One keyed window computes break flags (LAG comparison on exact
    cents with the (date, orderkey) total order), a cumulative sum
    converts flags to run ids — both windows share one partition sort —
    then two tiny aggregates produce the histogram. |customers| rows
    after the first aggregate; nothing rescans orders.
    """
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (money("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.withColumn(
        "brk",
        F.when(
            F.lag("cents").over(w).isNull()
            | (F.col("cents") <= F.lag("cents").over(w)),
            1,
        ).otherwise(0),
    )
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    runs = flagged.withColumn("run_id", F.sum("brk").over(wc))
    run_sizes = runs.groupBy("o_custkey", "run_id").agg(
        F.count("*").alias("run_len")
    )
    best = run_sizes.groupBy("o_custkey").agg(
        F.max("run_len").alias("max_streak")
    )
    return (
        best.groupBy("max_streak")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("max_streak")
    )


@register(
    "window_default_frame_ties_pin",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus, o_orderdate, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders),
    w AS (
        SELECT o_orderstatus,
               SUM(cents) OVER (PARTITION BY o_orderstatus
                                ORDER BY o_orderdate) AS range_cum,
               SUM(cents) OVER (PARTITION BY o_orderstatus
                                ORDER BY o_orderdate, o_orderkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS rows_cum
        FROM c)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN range_cum <> rows_cum THEN 1 END)
                AS BIGINT) AS n_tied_diverging,
           CAST(SUM(range_cum) AS BIGINT) AS sum_range_cum,
           CAST(SUM(rows_cum) AS BIGINT) AS sum_rows_cum
    FROM w
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    description="G8 default-frame pin: with ORDER BY and no frame "
    "clause the standard (and both engines) use RANGE UNBOUNDED "
    "PRECEDING..CURRENT ROW, so tied order dates SHARE their "
    "cumulative value; the ROWS frame with a total tiebreak splits "
    "them — the divergence count is exactly the tied-peer rows",
)
def window_default_frame_ties_pin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-default vs ROWS cumulative sums under ties.

    The RANGE cumulative depends only on the date (peer rows share a
    value — order-insensitive by construction); the ROWS cumulative is
    made deterministic by the (date, orderkey) total tiebreak. Both
    checksums and the diverging-row count are therefore exact on any
    engine and partitioning — the pin that stops 'cumulative revenue'
    silently changing when someone drops the frame clause.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    c = orders.select(
        "o_orderstatus", "o_orderdate", "o_orderkey", cents.alias("cents")
    )
    w_range = W.partitionBy("o_orderstatus").orderBy("o_orderdate")
    w_rows = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w = c.select(
        "o_orderstatus",
        F.sum("cents").over(w_range).alias("range_cum"),
        F.sum("cents").over(w_rows).alias("rows_cum"),
    )
    return (
        w.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("range_cum") != F.col("rows_cum"), 1)).alias(
                "n_tied_diverging"
            ),
            F.sum("range_cum").cast("bigint").alias("sum_range_cum"),
            F.sum("rows_cum").cast("bigint").alias("sum_rows_cum"),
        )
        .orderBy("o_orderstatus")
    )
