"""CDC / SCD2 upsert emulation (no Delta/Iceberg in this environment —
MERGE INTO is rebuilt from anti-join + union + window, the standard
plain-parquet formulation).

`scd2_merge` maintains a type-2 slowly-changing dimension: each key
keeps a history of rows with [valid_from, valid_to) ranges and a
current flag. Applying an update batch closes the affected current rows
and appends the new versions. Everything is one shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_TIME = "9999-12-31 00:00:00"


def scd2_init(snapshot: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Turn a plain snapshot into SCD2 shape."""
    return snapshot.select(
        "*",
        F.col(ts_col).alias("valid_from"),
        F.lit(END_OF_TIME).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(dim: DataFrame, updates: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    - rows for unaffected keys pass through untouched (anti-join);
    - affected current rows are closed (valid_to = update ts);
    - update rows are appended as the new current versions.

    `updates` carries the same payload columns as the original snapshot
    plus `ts_col` (the change time). One update row per key per batch.
    """
    payload_cols = [c for c in dim.columns if c not in ("valid_from", "valid_to", "is_current")]
    upd = updates.select(*payload_cols)
    upd_keys = upd.select(F.col(key).alias("_uk"), F.col(ts_col).alias("_uts"))

    untouched = dim.join(upd_keys, dim[key] == upd_keys["_uk"], "left_anti")
    closed = (
        dim.join(upd_keys, (dim[key] == upd_keys["_uk"]) & dim["is_current"])
        .withColumn("valid_to", F.col("_uts"))
        .withColumn("is_current", F.lit(False))
        .drop("_uk", "_uts")
    )
    # history rows of affected keys that were already closed
    history = (
        dim.filter(~F.col("is_current"))
        .join(upd_keys, dim[key] == upd_keys["_uk"], "left_semi")
    )
    opened = scd2_init(upd, key, ts_col)
    return untouched.unionByName(history).unionByName(closed).unionByName(opened)


def _register_snapshot_diff() -> None:
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as F

    from ..plans.registry import register
    from ..sources.catalog import load_table

    T1, T2 = "2024-01-15 00:00:00", "2024-01-30 00:00:00"

    @register(
        "snapshot_diff_user_state",
        oracle=f"""
        WITH s1 AS (
            SELECT user_id, value FROM (
                SELECT user_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts <= TIMESTAMP '{T1}')
            WHERE rn = 1),
        s2 AS (
            SELECT user_id, value FROM (
                SELECT user_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events WHERE ts <= TIMESTAMP '{T2}')
            WHERE rn = 1)
        SELECT COALESCE(s2.user_id, s1.user_id) AS user_id,
               s1.value AS old_value,
               s2.value AS new_value,
               CASE WHEN s1.user_id IS NULL THEN 'added'
                    ELSE 'changed' END AS change_type
        FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
        WHERE s1.user_id IS NULL OR s1.value <> s2.value
        ORDER BY user_id
        """,
        description="CDC snapshot diff: per-user latest-state at two "
        "as-of times (argmax by ts,event_id), full-outer compared — "
        "added and changed keys with old/new values, the audit between "
        "two SCD2 time-travel reads",
    )
    def snapshot_diff_user_state(spark, sf_dir: str):
        """Time-travel diff without storing snapshots: each side is an
        as-of argmax over the event history (one ranking window per
        side on the filtered scan, pushdown keeps the t1 side small),
        the comparison is a keyed full outer join — bounded by the
        user dimension. This is the audit query behind 'what changed
        between these two loads'; at 100 TB the event filter prunes
        partitions by the as-of date before anything shuffles."""
        events = load_table(spark, sf_dir, "events")

        def snap(t: str):
            w = _W.partitionBy("user_id").orderBy(
                F.desc("ts"), F.desc("event_id")
            )
            return (
                events.filter(F.col("ts") <= F.lit(t).cast("timestamp"))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("user_id", "value")
            )

        s1 = snap(T1).select(
            F.col("user_id").alias("u1"), F.col("value").alias("old_value")
        )
        s2 = snap(T2).select(
            F.col("user_id").alias("u2"), F.col("value").alias("new_value")
        )
        return (
            s1.join(s2, F.col("u1") == F.col("u2"), "full_outer")
            .filter(
                F.col("u1").isNull() | (F.col("old_value") != F.col("new_value"))
            )
            .select(
                F.coalesce(F.col("u2"), F.col("u1")).alias("user_id"),
                "old_value",
                "new_value",
                F.when(F.col("u1").isNull(), F.lit("added"))
                .otherwise(F.lit("changed"))
                .alias("change_type"),
            )
            .orderBy("user_id")
        )


_register_snapshot_diff()


def _register_incremental_agg() -> None:
    from pyspark.sql import SparkSession
    from ..functions.numeric import money
    from ..plans.registry import register
    from ..sources.catalog import load_table

    @register(
        "incremental_agg_maintenance",
        oracle="""
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM events
        GROUP BY 1, 2
        ORDER BY event_type, day
        """,
        description="incremental view maintenance: a daily aggregate "
        "maintained as base-partial MERGE delta-partial (full-outer join "
        "+ coalesced partial-sum algebra) must equal the from-scratch "
        "aggregate — the oracle IS the full recompute, so the merge "
        "algebra is verified exactly",
    )
    def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Merge-maintained daily aggregate == full recompute.

        The engine-side plan deliberately computes the view the way an
        incremental pipeline does at 100 TB: the historical partition
        (event_id % 10 < 8) is aggregated once ("materialized view"),
        the late-arriving delta (the remaining 20%) is aggregated
        separately, and the two PARTIAL aggregates are merged by keyed
        full-outer join with coalesce(0) + addition — the same
        partial-merge algebra Spark's own map-side combine uses, lifted
        to the view level. COUNT and exact-cents SUM are both
        self-mergeable; the oracle recomputes from scratch, proving the
        maintenance path loses nothing. No event-sized relation is ever
        joined — only the two |keys|-sized partials.
        """
        events = load_table(spark, sf_dir, "events")
        cents = (money("value") * 100).cast("bigint")

        def partial(df: DataFrame) -> DataFrame:
            return df.groupBy(
                "event_type", F.date_trunc("day", "ts").alias("day")
            ).agg(F.count("*").alias("n"), F.sum(cents).alias("sum_cents"))

        base = partial(events.filter(F.col("event_id") % 10 < 8))
        delta = partial(events.filter(F.col("event_id") % 10 >= 8)).select(
            F.col("event_type").alias("d_type"),
            F.col("day").alias("d_day"),
            F.col("n").alias("d_n"),
            F.col("sum_cents").alias("d_sum"),
        )
        merged = base.join(
            delta,
            (base.event_type == delta.d_type) & (base.day == delta.d_day),
            "full_outer",
        )
        z = F.lit(0).cast("bigint")
        return merged.select(
            F.coalesce("event_type", "d_type").alias("event_type"),
            F.coalesce("day", "d_day").alias("day"),
            (F.coalesce("n", z) + F.coalesce("d_n", z)).alias("n"),
            (F.coalesce("sum_cents", z) + F.coalesce("d_sum", z)).alias(
                "sum_cents"
            ),
        ).orderBy("event_type", "day")


_register_incremental_agg()


def _register_incremental_join() -> None:
    from pyspark.sql import functions as F

    from ..plans.registry import register
    from ..sources.catalog import load_table

    @register(
        "incremental_join_maintenance",
        oracle="""
        WITH delta AS (
            SELECT * FROM orders WHERE o_orderkey % 10 = 0),
        base AS (
            SELECT * FROM orders WHERE o_orderkey % 10 <> 0),
        joined_base AS (
            SELECT c_nationkey,
                   COUNT(*) AS n,
                   SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT)) AS cents
            FROM base JOIN customer ON o_custkey = c_custkey
            GROUP BY 1),
        joined_delta AS (
            SELECT c_nationkey,
                   COUNT(*) AS n,
                   SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT)) AS cents
            FROM delta JOIN customer ON o_custkey = c_custkey
            GROUP BY 1),
        merged AS (
            SELECT c_nationkey,
                   SUM(n) AS n, SUM(cents) AS cents
            FROM (SELECT * FROM joined_base
                  UNION ALL SELECT * FROM joined_delta)
            GROUP BY 1),
        recomputed AS (
            SELECT c_nationkey,
                   COUNT(*) AS n,
                   SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT)) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1)
        SELECT m.c_nationkey AS c_nationkey,
               CAST(m.n AS BIGINT) AS n_orders,
               CAST(m.cents AS BIGINT) AS cents,
               (m.n = f.n AND m.cents = f.cents) AS matches_recompute
        FROM merged m JOIN recomputed f ON m.c_nationkey = f.c_nationkey
        ORDER BY c_nationkey
        """,
        description="G15-adjacent incremental JOIN maintenance: a "
        "delta batch of orders is joined and aggregated alone, merged "
        "with the maintained base aggregate, and proven equal to the "
        "full recompute per nation — the delta-processing identity "
        "(join distributes over union) that makes incremental "
        "pipelines correct",
    )
    def incremental_join_maintenance(spark, sf_dir):
        """Join-then-aggregate maintained incrementally.

        The delta path joins ONLY the new batch against the dimension
        (work proportional to the delta, not the base), then merges
        partial aggregates — the exact identity streaming/foreachBatch
        pipelines rely on. The matches_recompute flag makes the proof
        part of the compared output.
        """
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")
        cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
            "bigint"
        )

        def agg_of(df):
            return (
                df.join(cust, df.o_custkey == cust.c_custkey)
                .groupBy("c_nationkey")
                .agg(
                    F.count("*").alias("n"),
                    F.sum(cents).alias("cents"),
                )
            )

        base = agg_of(orders.filter(F.col("o_orderkey") % 10 != 0))
        delta = agg_of(orders.filter(F.col("o_orderkey") % 10 == 0))
        merged = (
            base.unionByName(delta)
            .groupBy("c_nationkey")
            .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
        )
        full = agg_of(orders).withColumnRenamed("n", "fn").withColumnRenamed(
            "cents", "fcents"
        )
        out = merged.join(full, "c_nationkey").select(
            "c_nationkey",
            F.col("n").cast("bigint").alias("n_orders"),
            F.col("cents").cast("bigint").alias("cents"),
            (
                (F.col("n") == F.col("fn"))
                & (F.col("cents") == F.col("fcents"))
            ).alias("matches_recompute"),
        )
        return out.orderBy("c_nationkey")


_register_incremental_join()
