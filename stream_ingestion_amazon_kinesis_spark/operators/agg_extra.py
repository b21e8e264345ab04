"""Ordered-string, top-k, and bitmap aggregates (SURVEY §2.3 G5/G6).

Three Spark-4 aggregate families the reference's per-record loop
(consumer.py:117-175) could never express, each with an exact oracle:

- `listagg ... WITHIN GROUP (ORDER BY ...)` — deterministic ordered
  string aggregation (the per-group concat is sorted inside the
  aggregate, so partial-aggregation order can never change the value);
- `approx_top_k` — the sketch-backed heavy-hitters aggregate, run here
  in its exact regime (distinct values << maxItemsTracked means the
  sketch never evicts, making the counts exact and oracle-checkable —
  the same query at 100 TB simply degrades to epsilon-approximate
  instead of failing);
- `bitmap_construct_agg` / `bitmap_or_agg` — exact mergeable distinct
  counting: each (group, 32k-bucket) pair aggregates to a fixed-size
  bitmap, and any coarser rollup ORs bitmaps instead of re-shuffling
  rows — the exact counterpart of the HLL path in `sketches.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table


@register(
    "listagg_event_signatures",
    oracle="""
    WITH sigs AS (
        SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type)
                   AS signature
        FROM events
        GROUP BY user_id
    )
    SELECT signature, COUNT(*) AS n_users
    FROM sigs
    GROUP BY signature
    ORDER BY n_users DESC, signature
    """,
    description="G5 ordered string aggregation: per-user sorted distinct "
    "event-type signature via listagg WITHIN GROUP, rolled up to a "
    "signature histogram — deterministic because the ordering lives "
    "inside the aggregate, not in the input partition order",
)
def listagg_event_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioural signature -> signature histogram.

    The signature string is bounded by the event-type vocabulary (5
    values), so both aggregation levels are low-cardinality hash aggs
    with map-side partials; nothing here grows with row count beyond
    the per-user group set.
    """
    events = load_table(spark, sf_dir, "events")
    sigs = events.groupBy("user_id").agg(
        F.expr(
            "listagg(DISTINCT event_type, ',') WITHIN GROUP (ORDER BY event_type)"
        ).alias("signature")
    )
    return (
        sigs.groupBy("signature")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.desc("n_users"), "signature")
    )


@register(
    "approx_top_k_event_types",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY n_events DESC, event_type
    """,
    description="G6 approx_top_k heavy hitters over event_type, exercised "
    "in its exact regime (5 distinct values, maxItemsTracked=10000 -> the "
    "summary never evicts, counts are exact) so the oracle is the exact "
    "GROUP BY — at real cardinalities the same plan returns epsilon-"
    "approximate counts in one pass with a fixed-size state",
)
def approx_top_k_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters as ONE mergeable aggregate instead of a full
    groupBy + global sort: each partition tracks a bounded item->count
    summary, partials merge associatively, and only the k survivors
    leave the aggregate. Output is re-sorted with a total tiebreak key
    (count desc, then item) for cross-engine determinism.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.agg(F.expr("approx_top_k(event_type, 50, 10000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("event_type"),
            F.col("e.count").alias("n_events"),
        )
        .orderBy(F.desc("n_events"), "event_type")
    )


@register(
    "bitmap_distinct_customers_monthly",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS distinct_customers,
           COUNT(*) AS n_orders
    FROM orders
    """,
    description="G6 exact mergeable distinct: per-(month, 32k-bucket) "
    "customer bitmaps built with bitmap_construct_agg, merged across "
    "months with bitmap_or_agg and counted — the exact-count twin of the "
    "HLL rollup (hll_monthly_merge_customers): any date-range distinct "
    "query becomes an OR over fixed-size bitmaps, never a row re-shuffle",
)
def bitmap_distinct_customers_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level exact distinct rollup.

    Level 1 groups by (month, bitmap bucket) — the bucket split is what
    keeps this scale-safe: a bitmap covers 32768 bit positions, so key
    domains of any size map to bounded ~4 KB bitmaps instead of one
    giant bitset. Level 2 ORs the monthly bitmaps per bucket (bytes,
    not rows) and sums the per-bucket cardinalities — an exact answer
    with HLL-shaped data movement.
    """
    orders = load_table(spark, sf_dir, "orders")
    # bitmap positions are 1-based (bitmap_bit_position(0) collides with
    # another key — verified: {0,1,2} counts as 2); the +1 shift keeps
    # (bucket, pos) bijective over the 0-based key domain and leaves the
    # distinct count unchanged.
    keyed = orders.select(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        F.expr("bitmap_bucket_number(o_custkey + 1)").alias("bucket"),
        F.expr("bitmap_bit_position(o_custkey + 1)").alias("pos"),
    )
    monthly = keyed.groupBy("month", "bucket").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm"),
        F.count("*").alias("n_orders"),
    )
    merged = monthly.groupBy("bucket").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm"),
        F.sum("n_orders").alias("n_orders"),
    )
    return merged.agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("distinct_customers"),
        F.sum("n_orders").alias("n_orders"),
    )


@register(
    "percentile_disc_price_by_status",
    oracle="""
    SELECT o_orderstatus,
           quantile_disc(o_totalprice, 0.25) AS p25,
           quantile_disc(o_totalprice, 0.50) AS p50,
           quantile_disc(o_totalprice, 0.75) AS p75,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    description="G5 ordered-set aggregate percentile_disc WITHIN GROUP: "
    "discrete quantiles return ACTUAL data values (no interpolation), "
    "so the result is float-exact on any engine — the safe form of "
    "percentiles under an exact-value oracle",
)
def percentile_disc_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_disc picks the smallest value whose cumulative
    distribution reaches p — a SELECTION, not an interpolation, so
    unlike percentile_cont there is no float blend whose rounding
    could differ between engines (verified: Spark WITHIN GROUP and
    DuckDB quantile_disc agree on the same convention). Per-group
    sort happens inside the aggregate; one shuffle on the group key."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("pct_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75,
               COUNT(*) AS n
        FROM pct_orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


@register(
    "weighted_median_price_by_flag",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               l_extendedprice,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
        FROM lineitem
        GROUP BY l_returnflag, l_extendedprice),
    c AS (
        SELECT l_returnflag, l_extendedprice, wt,
               SUM(wt) OVER (PARTITION BY l_returnflag
                             ORDER BY l_extendedprice
                             ROWS UNBOUNDED PRECEDING) AS cumw,
               SUM(wt) OVER (PARTITION BY l_returnflag) AS total
        FROM w)
    SELECT l_returnflag,
           MIN(l_extendedprice) AS weighted_median_price
    FROM c
    WHERE 2 * cumw >= total
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="exact lower weighted median (weight = quantity) of "
    "line prices per returnflag: price-grouped integer weights, one "
    "cumulative window over the grouped relation, first price whose "
    "cumulative weight reaches half the total",
)
def weighted_median_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median without any per-row sort of the full fact table:
    weights are pre-aggregated per DISTINCT price (the grouped
    relation is bounded by price cardinality, far below row count),
    and the median is the first price where 2*cumw >= total — integer
    comparisons only, so engines agree exactly. Ties in price are
    impossible after grouping, making the selection deterministic.

    The cumulative weight runs on the GROUPED distributed sweep
    (verdict r11 #6, guide §2.5): a plain window partitioned by the
    3-value returnflag pins the whole distinct-price relation to 3
    sort tasks at any scale; `_distributed_prefix(part_cols=...)`
    range-buckets prices across the cluster and restarts the prefix
    per flag, so parallelism tracks core count instead of flag
    cardinality. The per-flag total comes from one 3-row aggregate
    broadcast back — replacing the second full-partition window pass."""
    from .analytics import _distributed_prefix

    li = load_table(spark, sf_dir, "lineitem")
    # w feeds the sweep's quantile probe + bucketing AND the total
    # aggregate — materialize the (flag, price)-grouped relation once
    # (bounded by value cardinality, never fact-row count) so lineitem
    # is scanned and pre-aggregated exactly once.
    w = (
        li.groupBy("l_returnflag", "l_extendedprice")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("wt"))
        .localCheckpoint(eager=False)
    )
    c = _distributed_prefix(
        w,
        ["l_extendedprice"],
        {"cumw": "wt"},
        part_cols=["l_returnflag"],
    )
    total = w.groupBy("l_returnflag").agg(F.sum("wt").alias("total"))
    return (
        c.join(F.broadcast(total), "l_returnflag")
        .filter(2 * F.col("cumw") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("weighted_median_price"))
        .orderBy("l_returnflag")
    )


@register(
    "capped_running_balance_final",
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT o_custkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn,
               CASE WHEN o_orderstatus = 'F'
                    THEN -CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                    ELSE  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               END AS delta
        FROM orders),
    walk AS (
        SELECT o_custkey, rn,
               LEAST(GREATEST(delta, 0), 100000000) AS bal
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.o_custkey, s.rn,
               LEAST(GREATEST(w.bal + s.delta, 0), 100000000)
        FROM walk w
        JOIN seq s ON s.o_custkey = w.o_custkey AND s.rn = w.rn + 1),
    last AS (
        SELECT o_custkey, MAX(rn) AS n_orders FROM walk GROUP BY o_custkey)
    SELECT w.o_custkey AS custkey,
           CAST(l.n_orders AS BIGINT) AS n_orders,
           CAST(w.bal AS BIGINT) AS final_balance_cents
    FROM walk w JOIN last l
      ON w.o_custkey = l.o_custkey AND w.rn = l.n_orders
    ORDER BY custkey
    """,
    description="non-associative per-key scan: running order balance "
    "clamped to [0, 1e8 cents] after every step (credit-limit "
    "semantics), per customer in (date, key) order — the fold no "
    "plain window can express; oracle is the recursive-CTE walk",
)
def capped_running_balance_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running sums are NON-associative (the clamp after each
    step destroys partial-aggregation algebra), so neither a window
    SUM nor a two-phase aggregate can compute them. The scalable
    distributed form: one shuffle groups each key's steps, sort_array
    orders them deterministically in-memory, and `F.aggregate` folds
    the clamp left-to-right as JVM codegen — state per key is one
    bigint, array size is the per-key step count (the reference's own
    per-record payload bound, capped upstream via sessionize-style
    F.slice when keys are unbounded). The same shape implements EMA,
    inventory with restock limits, and TCP-window-style simulations."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    delta = F.when(F.col("o_orderstatus") == "F", -cents).otherwise(cents)
    item = F.struct(
        F.col("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("k"),
        delta.alias("delta"),
    )
    folded = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sort_array(F.collect_list(item)).alias("steps"))
        .select(
            "custkey",
            F.size("steps").cast("bigint").alias("n_orders"),
            F.aggregate(
                "steps",
                F.lit(0).cast("bigint"),
                lambda acc, x: F.least(
                    F.greatest(acc + x["delta"], F.lit(0).cast("bigint")),
                    F.lit(100000000).cast("bigint"),
                ),
            ).alias("final_balance_cents"),
        )
    )
    return folded.orderBy("custkey")


@register(
    "ema_value_per_user_final",
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT user_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events),
    walk AS (
        SELECT user_id, rn, cents AS ema
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.user_id, s.rn,
               (2 * s.cents + 8 * w.ema) // 10
        FROM walk w
        JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1),
    last AS (SELECT user_id, MAX(rn) AS n_events FROM walk GROUP BY user_id)
    SELECT w.user_id,
           CAST(l.n_events AS BIGINT) AS n_events,
           CAST(w.ema AS BIGINT) AS ema_cents
    FROM walk w JOIN last l
      ON w.user_id = l.user_id AND w.rn = l.n_events
    ORDER BY w.user_id
    """,
    description="fixed-point EMA (alpha=0.2) of event values per user "
    "in event order — the decay fold (ema = (2x + 8*ema) div 10 on "
    "cents), non-associative like the clamp fold, exact on both "
    "engines via truncating integer arithmetic",
)
def ema_value_per_user_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving averages are the canonical decay statistic
    (monitoring, trend features for training data) and, like the
    clamped balance, non-associative — no window SUM computes them.
    Same distributed shape: one shuffle per key, deterministic
    sort_array, JVM `F.aggregate` fold; alpha is the integer ratio
    2/10 applied with truncating div so engines agree bit-for-bit
    (floats would drift in the last ulp per step). Fold state is one
    bigint per key."""
    events = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    item = F.struct(
        F.col("ts").alias("t"),
        F.col("event_id").alias("k"),
        cents.alias("cents"),
    )
    folded = (
        events.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(item)).alias("steps"))
        .select(
            "user_id",
            F.size("steps").cast("bigint").alias("n_events"),
            # `div` (truncating) is only reachable through SQL syntax,
            # and it is the operator DuckDB's `//` matches exactly.
            F.expr(
                "aggregate(slice(steps, 2, size(steps) - 1), "
                "element_at(steps, 1).cents, "
                "(acc, x) -> (2 * x.cents + 8 * acc) div 10)"
            )
            .cast("bigint")
            .alias("ema_cents"),
        )
    )
    return folded.select("user_id", "n_events", "ema_cents").orderBy("user_id")


@register(
    "orders_above_group_p95",
    oracle="""
    WITH p AS (
        SELECT o_orderpriority,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p95
        FROM orders GROUP BY o_orderpriority)
    SELECT o.o_orderpriority, COUNT(*) AS n_above,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_above,
           MAX(p.p95) AS p95
    FROM orders o JOIN p ON p.o_orderpriority = o.o_orderpriority
    WHERE o.o_totalprice > p.p95
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    description="group-quantile join-back filter: orders strictly above "
    "their priority's discrete p95, with per-group counts and exact "
    "sums — the 'top tail per segment' selection pattern",
)
def orders_above_group_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile thresholds computed per group (one aggregate over the
    fact table), broadcast back against the same scan, and applied as
    a strict filter — the selection behind per-segment outlier
    review queues. The threshold relation is bounded by the group
    domain, so the join-back is a broadcast at any fact size;
    discrete p95 keeps the cutoff an actual observed value, exact on
    both engines."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("p95_orders")
    p = spark.sql(
        """
        SELECT o_orderpriority AS prio,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p95
        FROM p95_orders GROUP BY o_orderpriority
        """
    )
    return (
        orders.join(
            F.broadcast(p), F.col("o_orderpriority") == F.col("prio")
        )
        .filter(F.col("o_totalprice") > F.col("p95"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_above"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_above"),
            F.max("p95").alias("p95"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "winsorized_mean_order_price",
    oracle="""
    WITH o AS (
        SELECT o_orderpriority, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY cents, o_orderkey) AS rn,
                  COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
        FROM o),
    fences AS (
        SELECT o_orderpriority,
               MAX(CASE WHEN rn = GREATEST((5 * cnt) // 100, 1)
                   THEN cents END) AS p05,
               MAX(CASE WHEN rn = GREATEST((95 * cnt) // 100, 1)
                   THEN cents END) AS p95
        FROM ranked GROUP BY 1)
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           f.p05 AS p05_cents, f.p95 AS p95_cents,
           CAST(SUM(LEAST(GREATEST(o.cents, f.p05), f.p95)) AS BIGINT)
               AS winsorized_sum_cents,
           CAST(SUM(LEAST(GREATEST(o.cents, f.p05), f.p95)) AS BIGINT)
               // COUNT(*) AS winsorized_mean_cents
    FROM o JOIN fences f USING (o_orderpriority)
    GROUP BY o.o_orderpriority, f.p05, f.p95
    ORDER BY o.o_orderpriority
    """,
    description="G5 winsorized mean: order prices clamped to the exact "
    "discrete [p5, p95] fences (row_number selection, orderkey "
    "tiebreak) before averaging — the robust mean in exact integer "
    "cents with truncating final division",
)
def winsorized_mean_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (winsorized) mean per priority, all-integer.

    Discrete p5/p95 come from the same row_number selection as the
    median family (no interpolation); clamping + summing are exact
    integer ops, so the robust mean is bit-stable. One ranked window
    pass + a broadcast 5-row fence join.
    """
    from pyspark.sql import Window as W

    from ..functions.numeric import money

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderpriority",
        "o_orderkey",
        (money("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    wr = W.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    wc = W.partitionBy("o_orderpriority")
    ranked = o.withColumn("rn", F.row_number().over(wr)).withColumn(
        "cnt", F.count("*").over(wc)
    )
    fences = ranked.groupBy("o_orderpriority").agg(
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.expr("(5 * cnt) div 100"), F.lit(1)),
                F.col("cents"),
            )
        ).alias("p05"),
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.expr("(95 * cnt) div 100"), F.lit(1)),
                F.col("cents"),
            )
        ).alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("p05")), F.col("p95"))
    return (
        o.join(F.broadcast(fences), "o_orderpriority")
        .groupBy("o_orderpriority", "p05", "p95")
        .agg(
            F.count("*").alias("n"),
            F.sum(clamped).cast("bigint").alias("winsorized_sum_cents"),
        )
        .select(
            "o_orderpriority",
            "n",
            F.col("p05").alias("p05_cents"),
            F.col("p95").alias("p95_cents"),
            "winsorized_sum_cents",
            F.expr("winsorized_sum_cents div n").alias("winsorized_mean_cents"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "percentile_grid_priority_year",
    oracle="""
    WITH o AS (
        SELECT o_orderpriority, year(o_orderdate) AS yr, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority, yr
                                     ORDER BY cents, o_orderkey) AS rn,
                  COUNT(*) OVER (PARTITION BY o_orderpriority, yr) AS cnt
        FROM o)
    SELECT o_orderpriority, CAST(yr AS BIGINT) AS yr,
           CAST(ANY_VALUE(cnt) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = GREATEST(cnt // 4, 1) THEN cents END)
                AS BIGINT) AS p25_cents,
           CAST(MAX(CASE WHEN rn = GREATEST(cnt // 2, 1) THEN cents END)
                AS BIGINT) AS p50_cents,
           CAST(MAX(CASE WHEN rn = GREATEST((3 * cnt) // 4, 1) THEN cents END)
                AS BIGINT) AS p75_cents
    FROM ranked
    GROUP BY o_orderpriority, yr
    ORDER BY o_orderpriority, yr
    """,
    description="G5/G8 quartile grid: exact discrete p25/p50/p75 of order "
    "value on the (priority x year) grid from ONE ranked window pass — "
    "the multi-cell percentile report that would otherwise be |cells| "
    "separate quantile queries",
)
def percentile_grid_priority_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three quartiles for every (priority, year) cell, one sort.

    One composite-key ranked window; each quartile is a rank-selection
    inside the same conditional aggregate, so adding quantiles costs
    expressions, not passes. Discrete selection (no interpolation),
    total (cents, orderkey) tiebreak — bit-stable everywhere.
    """
    from pyspark.sql import Window as W

    from ..functions.numeric import money

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderpriority",
        F.year("o_orderdate").alias("yr"),
        "o_orderkey",
        (money("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    wr = W.partitionBy("o_orderpriority", "yr").orderBy("cents", "o_orderkey")
    wc = W.partitionBy("o_orderpriority", "yr")
    ranked = o.withColumn("rn", F.row_number().over(wr)).withColumn(
        "cnt", F.count("*").over(wc)
    )

    def pick(expr: str) -> F.Column:
        return F.max(
            F.when(F.col("rn") == F.expr(expr), F.col("cents"))
        ).cast("bigint")

    return (
        ranked.groupBy("o_orderpriority", F.col("yr").cast("bigint").alias("yr"))
        .agg(
            F.first("cnt").cast("bigint").alias("n"),
            pick("greatest(cnt div 4, 1)").alias("p25_cents"),
            pick("greatest(cnt div 2, 1)").alias("p50_cents"),
            pick("greatest((3 * cnt) div 4, 1)").alias("p75_cents"),
        )
        .orderBy("o_orderpriority", "yr")
    )


@register(
    "winsorized_mean_value_by_type",
    oracle="""
    WITH c AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events),
    bounds AS (
        SELECT event_type,
               quantile_disc(cents, 0.05) AS lo,
               quantile_disc(cents, 0.95) AS hi
        FROM c GROUP BY event_type),
    w AS (
        SELECT c.event_type,
               CASE WHEN cents < lo THEN lo
                    WHEN cents > hi THEN hi
                    ELSE cents END AS wc
        FROM c JOIN bounds ON c.event_type = bounds.event_type)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(wc) AS BIGINT) AS winsorized_cents,
           CAST(SUM(wc) * 1000 // COUNT(*) AS BIGINT) AS w_mean_milli
    FROM w
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="G5 winsorized mean: per event type, values clamped to "
    "the discrete p05/p95 before averaging — the outlier-robust mean a "
    "metrics pipeline uses; percentile_disc selection (no interpolation) "
    "keeps both engines exact, and the mean is a staged integer ratio",
)
def winsorized_mean_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust mean via clamp-to-discrete-quantile.

    Two aggregations over the same keyed relation: the per-type bounds
    (percentile_disc inside the aggregate — per-group sort, one
    shuffle) and the clamped sum. The bounds relation is |types| rows,
    so the join back is a broadcast at any scale; nothing beyond the
    two hash aggs moves data.
    """
    events = load_table(spark, sf_dir, "events")
    c = events.select(
        "event_type",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    c.createOrReplaceTempView("wins_events")
    return spark.sql(
        """
        WITH bounds AS (
            SELECT event_type,
                   CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)
                        AS BIGINT) AS lo,
                   CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)
                        AS BIGINT) AS hi
            FROM wins_events GROUP BY event_type),
        w AS (
            SELECT e.event_type,
                   CASE WHEN cents < lo THEN lo
                        WHEN cents > hi THEN hi
                        ELSE cents END AS wc
            FROM wins_events e JOIN bounds ON e.event_type = bounds.event_type)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(wc) AS BIGINT) AS winsorized_cents,
               CAST(SUM(wc) * 1000 DIV COUNT(*) AS BIGINT) AS w_mean_milli
        FROM w
        GROUP BY event_type
        ORDER BY event_type
        """
    )


@register(
    "boolean_aggregate_census",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           bool_and(o_totalprice > 1000) AS all_above_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_high_value,
           CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_open
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="G5 boolean aggregate family: bool_and / bool_or (ANSI "
    "every/any) and count_if per priority — the predicate-rollup "
    "surface used by data-quality dashboards, exact on both engines",
)
def boolean_aggregate_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or / count_if — predicate rollups.

    All three are plain hash aggregates with map-side partials (a
    boolean AND/OR is associative+commutative), so the census costs one
    scan and one tiny shuffle at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_above_1k"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
            F.count_if(F.col("o_totalprice") > 100000).alias("n_high_value"),
            F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        )
        .orderBy("o_orderpriority")
    )
