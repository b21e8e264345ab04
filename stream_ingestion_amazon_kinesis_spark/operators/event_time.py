"""Event-time operators (SURVEY §2.3 G4, G12-G14) in batch-replay form.

These are the batch twins of the streaming operators in
``streaming/pipeline.py`` — identical plans run over a bounded source,
which is what makes the streaming semantics oracle-checkable (SURVEY
§7 M3). The reference has no event-time notion at all (pure
processing-time loop, consumer.py:127-129); these fill G12-G14.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.numeric import as_double, money
from ..plans.registry import register
from ..sources.catalog import load_table


@register(
    "tumbling_window_events",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="G12 tumbling 1h event-time window aggregate (streaming twin: groupBy(window(ts,'1 hour')))",
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            as_double(F.sum(money("value"))).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "sliding_window_events",
    oracle="""
    WITH starts AS (
        SELECT event_id, value,
               time_bucket(INTERVAL '30 minutes', ts) AS s FROM events
        UNION ALL
        SELECT event_id, value,
               time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS s
        FROM events
    )
    SELECT s AS window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM starts
    GROUP BY s
    """,
    description="G12 sliding window (1h width / 30m slide): each event lands in 2 windows",
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count("*").alias("n"),
            as_double(F.sum(money("value"))).alias("sum_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n", "sum_value")
    )


@register(
    "session_window_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    islands AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM islands
    GROUP BY user_id, session_no
    """,
    description="G12 session window (30m gap) per user; oracle = gaps-and-islands SQL",
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary convention (empirically pinned by
    tests/test_session_boundary_property.py): Spark's
    `session_window(ts, gap)` merges NON-STRICTLY — an event exactly
    `gap` after the previous one still joins that session (its window
    start equals the open session's end, and Spark merges on
    touching). A new session therefore starts only when the gap is
    STRICTLY greater than 30 minutes, and the oracle mirrors that with
    `gap > INTERVAL '30 minutes' -> new session`."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            as_double(F.sum(money("value"))).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "dedup_first_event_per_user_type",
    oracle="""
    SELECT event_id, user_id, event_type, ts FROM (
        SELECT event_id, user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events)
    WHERE rn = 1
    """,
    description="G14 keyed dedup keep-first (streaming twin: dropDuplicatesWithinWatermark)",
)
def dedup_first_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


# ---------------------------------------------------------------------------
# G4: as-of join. Spark has no native ASOF; the scalable formulation is
# union-the-sides + one window pass — a single shuffle on the key, no
# Python, no O(n^2). (pd.merge_asof per group via applyInPandas is the
# fallback when the payload is wide; this version stays JVM-side.)
# ---------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.ts <= left.ts within the same key. Inner semantics (left rows
    with no prior right row are dropped).

    Both sides are unioned with a side tag, sorted once per key, and the
    right-side payload is carried forward with last(ignorenulls) — at
    equal ts the right row sorts first, matching `ts_left >= ts_right`.
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(key), F.col(ts), F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c not in (key, ts)],
    )
    tagged_l = left.select(
        F.col(key), F.col(ts), F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
        *[F.col(c) for c in lcols if c not in (key, ts)],
    )
    u = tagged_r.unionByName(tagged_l)
    w = (
        W.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_is_right").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
        F.last(F.when(F.col("_is_right") == 1, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias("asof_ts"),
    )
    return (
        carried.filter((F.col("_is_right") == 0) & F.col("asof_ts").isNotNull())
        .drop("_is_right", *[f"_r_{c}" for c in right_cols])
    )


@register(
    "asof_join_purchase_last_click",
    oracle="""
    WITH purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         clicks    AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id AS purchase_id, p.user_id, p.ts,
           c.ts AS asof_ts,
           epoch_us(p.ts - c.ts) AS micros_since_click
    FROM purchases p
    ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    description="G4 as-of join: each purchase matched to the user's latest prior click",
)
def asof_join_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, key="user_id", ts="ts", right_cols=[])
    return joined.select(
        "purchase_id",
        "user_id",
        "ts",
        "asof_ts",
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("micros_since_click"),
    )


@register(
    "time_gap_fill_hours",
    oracle="""
    WITH span AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events),
    hours AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour_start
        FROM span),
    actual AS (
        SELECT date_trunc('hour', ts) AS hour_start,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1)
    SELECT h.hour_start,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n,
           COALESCE(a.sum_value, 0.0) AS sum_value,
           (a.hour_start IS NULL) AS filled
    FROM hours h LEFT JOIN actual a USING (hour_start)
    """,
    description="G12 time-series resample / gap fill: dense hourly spine via "
    "sequence+explode, left join of actual hourly aggregates, zero-filled gaps",
)
def time_gap_fill_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularizing an event stream onto a dense time grid — the
    resample step before windowed feature extraction. The hour spine is
    `sequence(min, max, interval 1 hour)` exploded from ONE aggregate
    row (a bounded driver-free generate — at any scale the spine is
    |hours|, not |events|), then a left join against the hourly rollup;
    AQE broadcasts whichever side is small. Missing hours surface as
    zero rows with a `filled` flag instead of silently absent points."""
    events = load_table(spark, sf_dir, "events")
    span = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = span.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    actual = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(
        F.count("*").alias("n"),
        as_double(F.sum(money("value"))).alias("sum_value"),
    )
    return (
        hours.join(actual.withColumnRenamed("n", "a_n"), ["hour_start"], "left")
        .select(
            "hour_start",
            F.coalesce("a_n", F.lit(0)).cast("bigint").alias("n"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
            F.col("a_n").isNull().alias("filled"),
        )
    )


@register(
    "funnel_click_to_purchase",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts AS click_ts, event_id AS click_id
        FROM events WHERE event_type = 'click'),
    firsts AS (
        SELECT user_id, MIN(click_ts) AS first_click
        FROM clicks GROUP BY user_id),
    conv AS (
        SELECT f.user_id, f.first_click,
               MIN(p.ts) AS first_purchase
        FROM firsts f
        LEFT JOIN events p
          ON p.user_id = f.user_id
         AND p.event_type = 'purchase'
         AND p.ts >= f.first_click
         AND p.ts <= f.first_click + INTERVAL '1 hour'
        GROUP BY f.user_id, f.first_click)
    SELECT date_trunc('hour', first_click) AS cohort_hour,
           COUNT(*) AS n_users,
           CAST(COUNT(first_purchase) AS BIGINT) AS n_converted,
           CAST(SUM(CASE WHEN first_purchase IS NOT NULL
                         THEN epoch_us(first_purchase) - epoch_us(first_click)
                    END) AS BIGINT) AS total_latency_us
    FROM conv
    GROUP BY 1
    """,
    description="G8/G12 funnel conversion: first click per user -> first "
    "purchase within 1h, cohorted by click hour with conversion latency",
)
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conversion-funnel shape: anchor event per key (min over a
    filtered scan — map-side combined), a bounded time-interval left
    join to the converting event, then a cohort rollup. The interval
    predicate bounds the join state exactly like the streaming
    interval join's watermark; latency sums are integer microseconds so
    the oracle comparison stays exact."""
    events = load_table(spark, sf_dir, "events")
    firsts = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        firsts.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("first_click"))
            & (F.col("p_ts") <= F.col("first_click") + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .groupBy("user_id", "first_click")
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    latency = F.unix_micros("first_purchase") - F.unix_micros("first_click")
    return conv.groupBy(
        F.date_trunc("hour", "first_click").alias("cohort_hour")
    ).agg(
        F.count("*").alias("n_users"),
        F.count("first_purchase").alias("n_converted"),
        F.sum(F.when(F.col("first_purchase").isNotNull(), latency)).alias(
            "total_latency_us"
        ),
    )


@register(
    "retention_cohorts_daily",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day
        FROM events)
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.active_day) AS BIGINT)
               AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
    description="G5/G12 retention cohorts: users bucketed by first-seen day, "
    "distinct-active counts per day offset — the classic retention triangle",
)
def retention_cohorts_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle in two map-side-combined aggregates and one
    equi-join on user_id: first-seen day per user (the cohort key),
    distinct (user, day) activity, then offset = active - cohort. The
    join is keyed by user — co-partitioned with both inputs' shuffles,
    so AQE can plan it without an extra exchange; nothing here is
    quadratic in days or users."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = events.select(
        "user_id", F.date_trunc("day", "ts").alias("active_day")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("active_day"), F.col("cohort_day"))
            .cast("bigint")
            .alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "point_in_time_dim_join",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, 1 AS version, c_acctbal AS boost,
               TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
               TIMESTAMP '2024-01-15 00:00:00' AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, 2, c_acctbal * 2,
               TIMESTAMP '2024-01-15 00:00:00',
               TIMESTAMP '9999-12-31 00:00:00'
        FROM customer)
    SELECT d.version,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e
    JOIN dim d
      ON e.user_id = d.c_custkey
     AND e.ts >= d.valid_from AND e.ts < d.valid_to
    GROUP BY d.version
    """,
    description="G4/G14 point-in-time (SCD2) lookup join: each event joins "
    "the dimension version valid AT ITS OWN event time — equi-key plus "
    "validity-range predicate",
)
def point_in_time_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE temporal-dimension pattern: enrich facts with the attribute
    values that were true when the event happened, not today's. The
    join is an equi-join on the key (Catalyst plans a hash join; the
    validity range is a residual filter on matched pairs), so adding
    history to a dimension never changes the join strategy — each
    version row only widens the build side. The two-version dimension
    here is synthesized from customer with a 2024-01-15 cutover; see
    streaming/cdc_apply.py for how such versions are maintained."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    v1 = customer.select(
        "c_custkey",
        F.lit(1).alias("version"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit("2024-01-15 00:00:00").cast("timestamp").alias("valid_to"),
    )
    v2 = customer.select(
        "c_custkey",
        F.lit(2).alias("version"),
        F.lit("2024-01-15 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit("9999-12-31 00:00:00").cast("timestamp").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    j = events.join(
        dim,
        (F.col("user_id") == F.col("c_custkey"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("ts") < F.col("valid_to")),
    )
    return j.groupBy("version").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "interval_overlap_session_pairs",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    islands AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged),
    s AS (
        SELECT user_id, MIN(ts) AS st, MAX(ts) + INTERVAL '30 minutes' AS en
        FROM islands GROUP BY user_id, session_no)
    SELECT date_trunc('hour', greatest(a.st, b.st)) AS overlap_hour,
           COUNT(*) AS n_pairs,
           CAST(SUM(epoch_us(least(a.en, b.en))
                    - epoch_us(greatest(a.st, b.st))) AS BIGINT)
               AS overlap_micros_total
    FROM s a JOIN s b
      ON a.user_id < b.user_id AND a.st < b.en AND b.st < a.en
    GROUP BY 1
    ORDER BY 1
    """,
    description="G4 interval-overlap self-join at scale: sessions "
    "exploded into the hour buckets they span, equi-joined on bucket, "
    "each pair emitted ONLY in its overlap-start hour (no distinct "
    "needed) — the oracle is the quadratic overlap join",
)
def interval_overlap_session_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical distributed interval join: a raw overlap self-join
    is non-equi (quadratic shuffle); bucketizing every interval into
    the hour buckets it spans turns it into an equi-join on the bucket
    key, with the true overlap predicate applied as a post-filter.
    Dedup across shared buckets is FREE — a pair is kept only where
    bucket = hour(overlap start), an hour both intervals provably
    touch, so each overlapping pair survives exactly once without a
    distinct. Fan-out is bounded by interval length / bucket width
    (sessions here span ~1-2 hours); per-bucket join width is bounded
    by concurrent sessions, the quantity a 100 TB deployment would
    tune bucket width against. Output is the per-hour overlap census,
    not the raw pair list, so result size stays bounded too.

    Session boundary convention matches `session_window_events`: an
    exact 30-minute gap still MERGES in both engines (oracle splits
    only on `>`), per the property-test-pinned Spark behavior."""
    events = load_table(spark, sf_dir, "events")
    ses = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("_n"))
        .select(
            "user_id",
            F.col("session_window.start").alias("st"),
            F.col("session_window.end").alias("en"),
        )
    )
    # Both self-join sides read the bucketed session relation; without
    # materialization each side re-executes the session_window
    # aggregation over the full events scan (measured 12.0 -> 2.2 s at
    # sf0.1). LAZY checkpoint, placed BEFORE the hour-bucket explode
    # (ADVICE r11: post-explode storage is one row per session per
    # overlapped hour — session x ceil(span/1h), understating the
    # memory bound for long sessions): stored size is exactly the
    # session relation, and each join side re-runs only the cheap
    # narrow explode. A/B at sf0.1: pre-explode 2.21 s @ cal 0.70 vs
    # post-explode 2.45 s @ cal 0.75 warm — parity, strictly smaller
    # blocks. Released by release_cached() between queries.
    ses = ses.localCheckpoint(eager=False)
    one_us = F.expr("INTERVAL 1 microsecond")
    hour = F.expr("INTERVAL 1 hour")
    sesb = ses.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("st")),
                F.date_trunc("hour", F.col("en") - one_us),
                hour,
            )
        ),
    )
    a, b = sesb.alias("a"), sesb.alias("b")
    ov_start = F.greatest(F.col("a.st"), F.col("b.st"))
    ov_end = F.least(F.col("a.en"), F.col("b.en"))
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.user_id") < F.col("b.user_id"))
        & (F.col("a.st") < F.col("b.en"))
        & (F.col("b.st") < F.col("a.en"))
        & (F.col("a.bucket") == F.date_trunc("hour", ov_start)),
    )
    return (
        pairs.groupBy(F.col("a.bucket").alias("overlap_hour"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.unix_micros(ov_end) - F.unix_micros(ov_start))
            .cast("bigint")
            .alias("overlap_micros_total"),
        )
        .orderBy("overlap_hour")
    )


@register(
    "funnel_multistep_strict",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view' AND e.ts > s1.t1
        GROUP BY e.user_id),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'click' AND e.ts > s2.t2
        GROUP BY e.user_id),
    s4 AS (
        SELECT e.user_id, MIN(e.ts) AS t4
        FROM events e JOIN s3 ON e.user_id = s3.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s3.t3
        GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
           (SELECT COUNT(*) FROM s2) AS n_view_after,
           (SELECT COUNT(*) FROM s3) AS n_click_after,
           (SELECT COUNT(*) FROM s4) AS n_purchase_after
    """,
    description="G8/G12 strict-order multi-step funnel: signup -> view "
    "-> click -> purchase, each step's anchor is the FIRST qualifying "
    "event strictly after the previous step's anchor — the ordered "
    "sequence count MATCH_RECOGNIZE engines advertise, as staged "
    "user-keyed aggregations",
)
def funnel_multistep_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each stage is min(ts) over a filtered scan joined to the prior
    stage's per-user anchor: four user-keyed aggregations whose
    relations shrink monotonically (funnels only narrow), so every
    join after the first is a small-side broadcast under AQE and
    nothing wider than (user_id, ts) ever shuffles. The strict `>`
    keeps re-used timestamps from double-counting a step. This is the
    scalable alternative to per-user event-array folds: state per
    stage is one row per surviving user, never the event bag."""
    events = load_table(spark, sf_dir, "events")

    def stage(event_type: str, prior: DataFrame | None, t_prev: str, t_out: str):
        e = events.filter(F.col("event_type") == event_type)
        if prior is not None:
            e = e.join(prior, "user_id").filter(F.col("ts") > F.col(t_prev))
        return e.groupBy("user_id").agg(F.min("ts").alias(t_out))

    s1 = stage("signup", None, "", "t1")
    s2 = stage("view", s1, "t1", "t2")
    s3 = stage("click", s2, "t2", "t3")
    s4 = stage("purchase", s3, "t3", "t4")
    return (
        s1.agg(F.count("*").alias("n_signup"))
        .crossJoin(F.broadcast(s2.agg(F.count("*").alias("n_view_after"))))
        .crossJoin(F.broadcast(s3.agg(F.count("*").alias("n_click_after"))))
        .crossJoin(F.broadcast(s4.agg(F.count("*").alias("n_purchase_after"))))
    )


@register(
    "session_conversion_rates",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_type,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    islands AS (
        SELECT user_id, event_type,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged),
    sessions AS (
        SELECT user_id, session_no,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM islands GROUP BY user_id, session_no)
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST((SUM(converted) * 1000000) // COUNT(*) AS BIGINT)
               AS conversion_ppm
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
    description="per-user session conversion: session_window (30m gap) "
    "sessions flagged by whether they contain a purchase, conversion "
    "rate in truncating ppm — the product-analytics KPI built on the "
    "engine's session operator",
)
def session_conversion_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation on session windows: the first groupBy
    builds sessions (merging session state, one shuffle), the second
    collapses each user's bounded session list into the KPI. The
    conversion flag is a MAX over a conditional — computed inside the
    session aggregate, so no second pass over raw events. Boundary
    convention as pinned: exact 30-minute gaps merge."""
    events = load_table(spark, sf_dir, "events")
    ses = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
    )
    return (
        ses.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("converted").cast("bigint").alias("n_converted"),
        )
        .select(
            "user_id",
            "n_sessions",
            "n_converted",
            F.expr("(n_converted * 1000000) div n_sessions")
            .cast("bigint")
            .alias("conversion_ppm"),
        )
        .orderBy("user_id")
    )


@register(
    "late_data_audit_hourly",
    oracle="""
    WITH arr AS (
        SELECT ts,
               MAX(ts) OVER (ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) AS high_water
        FROM events),
    j AS (
        SELECT ts,
               CASE WHEN ts < high_water - INTERVAL '10 minutes'
                    THEN 1 ELSE 0 END AS is_late
        FROM arr)
    SELECT date_trunc('hour', ts) AS event_hour,
           COUNT(*) AS n_events,
           CAST(SUM(is_late) AS BIGINT) AS n_late,
           CAST((SUM(is_late) * 1000000) // COUNT(*) AS BIGINT) AS late_ppm
    FROM j
    GROUP BY 1
    ORDER BY 1
    """,
    description="G13 policy quantified in batch: events that a "
    "10-minute watermark would drop (event time below the running max "
    "of event time in arrival order), counted per event-hour in ppm — "
    "the lateness audit run before choosing a watermark delay. AUDIT "
    "TWIN (one global-order window): the scale-safe production form "
    "is late_data_audit_per_shard (per-ingest-partition high-water, "
    "the order that actually exists at scale)",
)
def late_data_audit_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Answers 'what delay should the watermark be?' from history:
    arrival order is the event_id sequence (the fixture's ingestion
    order), the high-water mark is a running MAX window over it, and
    an event is late iff its event time sits more than the candidate
    delay below that mark — exactly the streaming drop rule applied
    retrospectively. The running max is one global-order window; in
    production this runs per ingest partition (arrival order is only
    meaningful within one), making the window partition-bounded."""
    events = load_table(spark, sf_dir, "events")
    w = W.orderBy("event_id").rowsBetween(W.unboundedPreceding, 0)
    arr = events.select(
        "ts", F.max("ts").over(w).alias("high_water")
    )
    j = arr.select(
        "ts",
        F.when(
            F.col("ts") < F.col("high_water") - F.expr("INTERVAL 10 minutes"), 1
        )
        .otherwise(0)
        .alias("is_late"),
    )
    return (
        j.groupBy(F.date_trunc("hour", "ts").alias("event_hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("is_late").cast("bigint").alias("n_late"),
        )
        .select(
            "event_hour",
            "n_events",
            "n_late",
            F.expr("(n_late * 1000000) div n_events")
            .cast("bigint")
            .alias("late_ppm"),
        )
        .orderBy("event_hour")
    )


_LATE_SHARDS = 16


@register(
    "late_data_audit_per_shard",
    oracle=f"""
    WITH arr AS (
        SELECT ts,
               MAX(ts) OVER (PARTITION BY event_id % {_LATE_SHARDS}
                             ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) AS high_water
        FROM events),
    j AS (
        SELECT ts,
               CASE WHEN ts < high_water - INTERVAL '10 minutes'
                    THEN 1 ELSE 0 END AS is_late
        FROM arr)
    SELECT date_trunc('hour', ts) AS event_hour,
           COUNT(*) AS n_events,
           CAST(SUM(is_late) AS BIGINT) AS n_late,
           CAST((SUM(is_late) * 1000000) // COUNT(*) AS BIGINT) AS late_ppm
    FROM j
    GROUP BY 1
    ORDER BY 1
    """,
    description="G13 lateness audit, SCALE-SAFE FORM: the high-water "
    "mark runs PER INGEST PARTITION (event_id mod 16 simulates the "
    "shard a record arrived on) — the only arrival order that exists "
    "at scale, and the order the streaming engine itself sees — so "
    "every window partition is one shard's sequence, never a global "
    "sort; same hourly ppm rollup as the audit twin "
    "late_data_audit_hourly",
)
def late_data_audit_per_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermark-delay audit as production would run it.

    A global arrival sequence does not exist on a sharded stream —
    each Kinesis shard delivers its own ordered sequence, and the
    streaming engine advances its watermark from per-partition maxima.
    This audit mirrors that: ingest partition = event_id mod 16 (the
    fixture's round-robin stand-in for a shard id), high-water = the
    running max WITHIN the shard's arrival order, late = more than the
    candidate 10-minute delay below the shard's high-water. The window
    partitions by shard, so each sort is one shard's slice (at scale:
    partition further by ingest day — the high-water carries within a
    shard's replay, which is per-day in any real retention window).
    Lateness verdicts differ from the global audit twin exactly where
    cross-shard skew hides lateness — the HONEST per-shard view.
    """
    events = load_table(spark, sf_dir, "events")
    shard = (F.col("event_id") % _LATE_SHARDS).alias("shard")
    w = (
        W.partitionBy(shard)
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    arr = events.select("ts", F.max("ts").over(w).alias("high_water"))
    j = arr.select(
        "ts",
        F.when(
            F.col("ts") < F.col("high_water") - F.expr("INTERVAL 10 minutes"), 1
        )
        .otherwise(0)
        .alias("is_late"),
    )
    return (
        j.groupBy(F.date_trunc("hour", "ts").alias("event_hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("is_late").cast("bigint").alias("n_late"),
        )
        .select(
            "event_hour",
            "n_events",
            "n_late",
            F.expr("(n_late * 1000000) div n_events")
            .cast("bigint")
            .alias("late_ppm"),
        )
        .orderBy("event_hour")
    )


@register(
    "interarrival_stats_by_type",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us
        FROM events)
    SELECT event_type,
           COUNT(gap_us) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)
                AS BIGINT) AS p50_gap_us,
           CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY gap_us)
                AS BIGINT) AS p95_gap_us
    FROM gaps
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="inter-arrival time profile per event type: LAG gaps "
    "in exact integer microseconds with discrete p50/p95 — the "
    "traffic-model input for stream capacity planning, one window + "
    "one aggregate",
)
def interarrival_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival distributions drive throughput/state sizing for
    the streaming pipeline (how bursty is each event type?). Gaps are
    exact integer microsecond differences from one LAG window per
    type; quantiles are DISCRETE (actual observed gaps — float-exact
    cross-engine, unlike interpolated percentiles of derived
    doubles). The window partitions by type, so sorts are per-type;
    at scale this runs per (type, day) partition with identical
    output semantics."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = events.select(
        "event_type",
        (
            F.unix_micros("ts")
            - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    gaps.createOrReplaceTempView("interarrival_gaps")
    return spark.sql(
        """
        SELECT event_type,
               COUNT(gap_us) AS n_gaps,
               CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
               CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)
                    AS BIGINT) AS p50_gap_us,
               CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY gap_us)
                    AS BIGINT) AS p95_gap_us
        FROM interarrival_gaps
        GROUP BY event_type
        ORDER BY event_type
        """
    )


@register(
    "top_session_paths",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    islands AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged),
    paths AS (
        SELECT user_id, session_no,
               array_to_string(
                   list_slice(list(event_type ORDER BY ts, event_id), 1, 3),
                   '>') AS path
        FROM islands
        GROUP BY user_id, session_no)
    SELECT path, COUNT(*) AS n_sessions
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
    description="user-journey mining: each session's first three event "
    "types as a '>'-joined path, top-20 paths by session count — "
    "session_window + in-aggregate ordered list + slice, the product-"
    "analytics flows report",
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path extraction without a per-event window: sessions come from
    `session_window`, the ordered step list is built INSIDE the
    session aggregate (sort_array over (ts, event_id, type) structs —
    deterministic under any shuffle), and only the first three steps
    survive via slice, so the carried payload is O(3) per session
    regardless of session length — the cap the sessionize operator
    exposes as max_items, applied here structurally. Two bounded
    aggregations follow."""
    events = load_table(spark, sf_dir, "events")
    step = F.struct(
        F.col("ts").alias("t"),
        F.col("event_id").alias("k"),
        F.col("event_type").alias("e"),
    )
    paths = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.slice(F.sort_array(F.collect_list(step)), 1, 3),
                    lambda x: x["e"],
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


@register(
    "session_dwell_time_per_user",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    islands AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged),
    ses AS (
        SELECT user_id, session_no,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dwell_us
        FROM islands GROUP BY user_id, session_no)
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(dwell_us) AS BIGINT) AS total_dwell_us,
           CAST(MAX(dwell_us) AS BIGINT) AS max_dwell_us,
           CAST(SUM(dwell_us) // COUNT(*) AS BIGINT) AS avg_dwell_us
    FROM ses
    GROUP BY user_id
    ORDER BY user_id
    """,
    description="engagement profile: per-user session dwell times "
    "(first-to-last event span per session_window session) in exact "
    "integer microseconds — totals, max, truncating average",
)
def session_dwell_time_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell = the observed span of each session (first to last
    event), the engagement metric sessions exist to support. Span is
    computed inside the session aggregate (min/max ts — no second
    pass), per-user rollup is over the bounded session list, and all
    times are integer microseconds with a truncating average so the
    engines agree exactly. Boundary convention as pinned (exact gaps
    merge)."""
    events = load_table(spark, sf_dir, "events")
    ses = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("dwell_us")
        )
    )
    return (
        ses.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("dwell_us").cast("bigint").alias("total_dwell_us"),
            F.max("dwell_us").cast("bigint").alias("max_dwell_us"),
        )
        .select(
            "user_id",
            "n_sessions",
            "total_dwell_us",
            "max_dwell_us",
            F.expr("total_dwell_us div n_sessions")
            .cast("bigint")
            .alias("avg_dwell_us"),
        )
        .orderBy("user_id")
    )


@register(
    "asof_join_with_tolerance",
    oracle="""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'),
    c AS (
        SELECT event_id AS click_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'),
    joined AS (
        SELECT p.purchase_id, p.user_id, p.purchase_ts, c.click_id, c.click_ts,
               ROW_NUMBER() OVER (
                   PARTITION BY p.purchase_id
                   ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id
         AND c.click_ts <= p.purchase_ts
         AND c.click_ts >= p.purchase_ts - INTERVAL 2 HOUR)
    SELECT purchase_id, user_id, purchase_ts, click_id, click_ts,
           epoch_us(purchase_ts) - epoch_us(click_ts) AS staleness_us
    FROM joined WHERE rn = 1
    """,
    description="G4 as-of join with tolerance (merge_asof tolerance= "
    "semantics): each purchase matched to the user's latest click no "
    "older than 2 hours, NULL when the nearest click is staler — "
    "implemented as a union + running-max window, no non-equi join",
)
def asof_join_with_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join via the union trick.

    Instead of a per-row non-equi join (quadratic in the worst key),
    clicks and purchases are unioned into ONE stream per user, sorted
    once by (ts, kind, event_id), and the latest-click-so-far is a
    running `max(struct(ts, id))` window — a single shuffle on user_id,
    linear state, the standard scalable as-of plan. The tolerance is
    then a pure projection: matches staler than 2h become NULL. The
    kind flag orders clicks BEFORE purchases at equal timestamps, so a
    click at exactly purchase_ts is eligible (ties with the <=
    semantics of the oracle's join predicate).
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.lit(0).alias("kind"),
        F.col("event_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), F.lit(1).alias("kind"), F.col("event_id")
    )
    unioned = clicks.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_click = F.max(
        F.when(F.col("kind") == 0, F.struct(F.col("ts"), F.col("event_id")))
    ).over(w)
    matched = (
        unioned.withColumn("lc", last_click)
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("lc.event_id").alias("click_id"),
            F.col("lc.ts").alias("click_ts"),
        )
    )
    in_tol = F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 2 HOUR")
    return matched.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.when(in_tol, F.col("click_id")).alias("click_id"),
        F.when(in_tol, F.col("click_ts")).alias("click_ts"),
        F.when(
            in_tol, F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
        ).alias("staleness_us"),
    )


def merge_intervals(iv: DataFrame, key: str = "user_id") -> DataFrame:
    """Union of possibly-overlapping intervals per key (running-max
    island sweep). Input: (key, event_id, s, e) with e >= s and a
    unique event_id per row; output one row per merged interval:
    (key, island, m_start, m_end, n_raw). Touching intervals
    (next.s == prior max e) merge; the island test runs against PRIOR
    rows only (frame ... 1 PRECEDING) under the (s, event_id) total
    order, so results are partitioning- and tie-independent."""
    w_prev = (
        W.partitionBy(key)
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_max_e = F.max("e").over(w_prev)
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    )
    w_cum = (
        W.partitionBy(key)
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_cum))
    return islands.groupBy(key, "island").agg(
        F.min("s").alias("m_start"),
        F.max("e").alias("m_end"),
        F.count("*").alias("n_raw"),
    )


@register(
    "interval_merge_coverage",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id, ts AS s, ts + INTERVAL 15 MINUTE AS e
        FROM events),
    flagged AS (
        SELECT user_id, event_id, s, e,
               CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND 1 PRECEDING) IS NULL
                         OR s > MAX(e) OVER (PARTITION BY user_id
                                             ORDER BY s, event_id
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                                      AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv),
    islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                                     ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged),
    merged AS (
        SELECT user_id, island, MIN(s) AS m_start, MAX(e) AS m_end,
               CAST(COUNT(*) AS BIGINT) AS n_raw
        FROM islands GROUP BY 1, 2)
    SELECT user_id,
           CAST(SUM(n_raw) AS BIGINT) AS n_intervals_raw,
           CAST(COUNT(*) AS BIGINT) AS n_merged,
           CAST(SUM(epoch_us(m_end) - epoch_us(m_start)) AS BIGINT)
               AS covered_us
    FROM merged
    GROUP BY user_id
    ORDER BY user_id
    """,
    description="G8 interval merge (union of overlapping intervals): each "
    "event opens a 15-minute activity interval; per user, overlapping "
    "intervals merge via the running-max-end island trick and the query "
    "reports merged-interval count + exact covered time — the coverage/"
    "uptime calculation, one window pass, no self-join",
)
def interval_merge_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals per user in one sort.

    The classic O(n log n) sweep: order intervals by start, a new
    island begins exactly when this start exceeds the max end seen so
    far (frame ROWS ... 1 PRECEDING keeps the test against *prior*
    intervals only, so equal-boundary touching intervals merge).
    Everything is one user-keyed window sort + two bounded aggregates;
    covered time is exact integer microseconds.
    """
    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTE")).alias("e"),
    )
    merged = merge_intervals(iv, key="user_id")
    return (
        merged.groupBy("user_id")
        .agg(
            F.sum("n_raw").cast("bigint").alias("n_intervals_raw"),
            F.count("*").alias("n_merged"),
            F.sum(
                F.unix_micros("m_end") - F.unix_micros("m_start")
            )
            .cast("bigint")
            .alias("covered_us"),
        )
        .orderBy("user_id")
    )


@register(
    "peak_concurrency_sessions",
    oracle="""
    WITH pts AS (
        SELECT ts AS t, 1 AS delta, event_id FROM events
        UNION ALL
        SELECT ts + INTERVAL 15 MINUTE AS t, -1 AS delta, event_id
        FROM events),
    swept AS (
        SELECT t, delta,
               CAST(SUM(delta) OVER (ORDER BY t, delta, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS active
        FROM pts),
    peak AS (
        SELECT active, t,
               ROW_NUMBER() OVER (ORDER BY active DESC, t) AS rn
        FROM swept)
    SELECT active AS peak_concurrency, t AS peak_at
    FROM peak WHERE rn = 1
    """,
    description="G8 sweep-line peak concurrency: each event opens a "
    "15-minute activity interval; +1/-1 deltas sorted on the global "
    "(t, delta, event_id) total order and cumulative-summed give the "
    "exact maximum simultaneous-activity level and its first timestamp "
    "— ends sort before starts at equal t (delta -1 < +1), so touching "
    "intervals don't double-count",
)
def peak_concurrency_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum simultaneous active intervals, DISTRIBUTED sweep-line.

    The sweep-line rewrite turns pairwise overlap counting (quadratic)
    into 2n deltas + one ordered cumulative sum. The cumulative sum is
    the two-pass distributed prefix (`_distributed_prefix`: range
    buckets on the microsecond timestamp, per-bucket cumulative
    windows, broadcast per-bucket delta totals as offsets) — the
    earlier form ran ONE unpartitioned cumulative window over all 2n
    delta rows, the exact single-partition-global-order scale killer
    this repo retires everywhere else. The peak readout is
    orderBy+limit(1) (TakeOrderedAndProject), not a rank window.
    Tie order is pinned: at equal t the -1 rows apply first, matching
    half-open [t, t+15m) interval semantics; event_id completes the
    total order so partitioning can never flip equal rows (unix_micros
    is an order-isomorphic image of t, so bucketing on it preserves
    the (t, delta, event_id) global order exactly).
    """
    from .analytics import _distributed_prefix

    events = load_table(spark, sf_dir, "events")
    starts = events.select(
        F.col("ts").alias("t"), F.lit(1).alias("delta"), F.col("event_id")
    )
    ends = events.select(
        (F.col("ts") + F.expr("INTERVAL 15 MINUTE")).alias("t"),
        F.lit(-1).alias("delta"),
        F.col("event_id"),
    )
    pts = starts.unionByName(ends).withColumn("t_us", F.unix_micros("t"))
    swept = _distributed_prefix(
        pts, ["t_us", "delta", "event_id"], {"active": "delta"}
    ).withColumn("active", F.col("active").cast("bigint"))
    return (
        swept.orderBy(F.desc("active"), "t")
        .limit(1)
        .select(
            F.col("active").alias("peak_concurrency"),
            F.col("t").alias("peak_at"),
        )
    )


@register(
    "session_window_variable_gap",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE event_type
                   WHEN 'purchase' THEN INTERVAL '60 minutes'
                   WHEN 'click' THEN INTERVAL '15 minutes'
                   ELSE INTERVAL '30 minutes' END AS gap
        FROM events),
    e AS (
        SELECT user_id, ts, event_id, ts + gap AS w_end,
               MAX(ts + gap) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) AS prev_end
        FROM g),
    f AS (
        SELECT user_id, ts, event_id, w_end,
               CASE WHEN prev_end IS NULL OR ts > prev_end
                    THEN 1 ELSE 0 END AS new_s
        FROM e),
    i AS (
        SELECT user_id, ts, w_end,
               SUM(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM f)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(w_end) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM i
    GROUP BY user_id, sess_no
    ORDER BY user_id, session_start
    """,
    description="G12 DYNAMIC-gap session windows: each event carries its "
    "own inactivity gap (purchase 60m, click 15m, else 30m) and Spark "
    "merges the per-event [ts, ts+gap) intervals — the oracle is the "
    "gaps-and-islands form generalized to a running MAX of window ends "
    "(a plain LAG is wrong once gaps vary), with the same "
    "merge-on-touch boundary convention as the fixed-gap query",
)
def session_window_variable_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inactivity gaps via session_window(ts, gapExpr).

    Dynamic-gap sessionization is interval union: an event extends the
    current session iff its ts is <= the running max end (touching
    merges, pinned by tests/test_session_boundary_property.py for the
    fixed-gap case — same merge code path in Spark). The oracle's
    cumulative MAX over (ts + gap) is order-insensitive for ties
    because interval union only depends on the interval set. One
    shuffle on user_id; the session merge is Spark's native state-free
    batch implementation.
    """
    events = load_table(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("60 minutes"))
        .when(F.col("event_type") == "click", F.lit("15 minutes"))
        .otherwise(F.lit("30 minutes"))
    )
    return (
        events.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
