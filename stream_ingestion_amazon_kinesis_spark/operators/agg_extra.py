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
