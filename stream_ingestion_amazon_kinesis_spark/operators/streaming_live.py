"""A real Structured Streaming query under the oracle gate.

Most streaming semantics are validated by batch-replay twins
(operators/event_time.py) — same plan, bounded source. This module goes
one step further: it runs the *actual streaming engine* (micro-batch
execution over a file source into a memory sink, complete output mode)
inside a registry query, so the driver's DuckDB comparison covers the
incremental execution path itself, not just the logical plan.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import as_double, money
from ..plans.registry import register
from ..sources.catalog import fixture_fingerprint, load_table
from ..streaming.pipeline import read_event_stream



def _staged_json(
    spark: SparkSession,
    sf_dir: str,
    prefix: str,
    table: str,
    transform=None,
    to_json_opts: dict | None = None,
) -> str:
    """Shared staging-cache core: export `table` (optionally transformed)
    as JSON-lines under /tmp once per (sf tag, prefix, TABLE-fingerprint).
    `_SUCCESS` makes the cache idempotent across processes; the
    fingerprint keys on the staged table itself, so regenerating that
    table's parquet invalidates the cache (the bug class this factoring
    exists to prevent: a copy-pasted helper once fingerprinted events
    while staging documents). The to_json options and the transform are
    ALSO folded into the key (a short stable hash) so two call sites
    sharing a prefix but exporting different shapes can never replay
    each other's staged files (ADVICE r8); the transform contributes its
    qualified name — keep transforms as named module-level functions,
    not lambdas that could collide on `<lambda>`."""
    import hashlib
    import os

    shape = repr(sorted((to_json_opts or {}).items()))
    if transform is not None:
        shape += f"|{getattr(transform, '__module__', '')}." + getattr(
            transform, "__qualname__", repr(transform)
        )
    shape_key = hashlib.md5(shape.encode()).hexdigest()[:8]
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_stage",
        tag,
        f"{prefix}_{shape_key}_{fixture_fingerprint(sf_dir, table)}",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = load_table(spark, sf_dir, table)
        if transform is not None:
            df = transform(df)
        df.select(
            F.to_json(F.struct(*df.columns), to_json_opts or {}).alias("value")
        ).write.mode("overwrite").text(path)
    return path


def _staged_events_json(spark: SparkSession, sf_dir: str, micros: bool = False) -> str:
    """Stage the events fixture as JSON-lines; `micros=True` keeps full
    microsecond timestamps (default to_json truncates to millis, which
    only matters when a query COMPARES timestamps, e.g. a join
    condition)."""
    suffix = "us" if micros else "ms"
    opts = (
        {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"} if micros else None
    )
    return _staged_json(
        spark, sf_dir, f"events_{suffix}", "events", to_json_opts=opts
    )


@register(
    "streaming_tumbling_counts_live",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="G12 executed by the real micro-batch engine (file source -> memory sink, complete mode)",
)
def streaming_tumbling_counts_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    staging = _staged_events_json(spark, sf_dir)
    stream = read_event_stream(spark, staging)
    agg = (
        stream.groupBy(F.window("ts", "1 hour"), "event_type")
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
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


@register(
    "streaming_sliding_counts_live",
    oracle="""
    WITH starts AS (
        SELECT value, time_bucket(INTERVAL '30 minutes', ts) AS s FROM events
        UNION ALL
        SELECT value, time_bucket(INTERVAL '30 minutes', ts)
               - INTERVAL '30 minutes' AS s
        FROM events)
    SELECT s AS window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM starts GROUP BY s
    """,
    description="G12 sliding window (1h/30m) executed by the real micro-batch engine",
)
def streaming_sliding_counts_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    staging = _staged_events_json(spark, sf_dir)
    stream = read_event_stream(spark, staging)
    agg = (
        stream.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count("*").alias("n"),
            as_double(F.sum(money("value"))).alias("sum_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n", "sum_value")
    )
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


EVENTS_CSV_SCHEMA = "event_id bigint, ts_us bigint, event_type string, value double"


@register(
    "streaming_csv_counts_live",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    description="G1+G12 streaming CSV source: events replayed through "
    "readStream.csv with an explicit schema (timestamps as unix micros), "
    "aggregated by the real micro-batch engine",
)
def streaming_csv_counts_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CSV twin of the JSON file-source stream: same micro-batch
    engine, different wire format. Timestamps travel as unix
    microseconds (bigint) — the only CSV encoding that is roundtrip- and
    timezone-proof without format-string coupling between writer and
    reader."""
    events = load_table(spark, sf_dir, "events")
    staging = tempfile.mkdtemp(prefix="stream_events_csv_")
    events.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_type",
        F.col("value").cast("double").alias("value"),
    ).write.mode("overwrite").option("header", True).csv(staging)

    stream = (
        spark.readStream.schema(EVENTS_CSV_SCHEMA)
        .option("header", True)
        .option("maxFilesPerTrigger", 8)  # force multiple micro-batches
        .csv(staging)
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"),
        as_double(F.sum(money("value"))).alias("sum_value"),
    )
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


@register(
    "streaming_static_enrich_live",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
    description="G4/G14 stream-static join executed by the real micro-batch "
    "engine: event stream enriched against the static customer dimension",
)
def streaming_static_enrich_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static equi-join — the canonical streaming enrichment
    pattern (dimension lookup per micro-batch). The static side is a
    bounded dimension, so it broadcasts into every micro-batch with no
    state store involvement; at cluster scale the dimension re-reads
    per batch pick up slowly-changing updates for free. The reference
    enriches per record in Python (consumer.py:117-175); here the
    lookup is a JVM broadcast hash join inside the streaming plan."""
    customer = load_table(spark, sf_dir, "customer")
    staging = _staged_events_json(spark, sf_dir)
    stream = read_event_stream(spark, staging)
    enriched = stream.join(
        F.broadcast(customer), stream.user_id == customer.c_custkey
    )
    # COUNT(DISTINCT) is unsupported in streaming aggregation; the
    # per-(segment, user) streaming agg below makes the outer batch
    # count exact. Money stays DECIMAL until the final projection so the
    # cross-level sum is order-independent.
    per_user = enriched.groupBy(
        F.col("c_mktsegment").alias("mktsegment"), "user_id"
    ).agg(
        F.count("*").alias("n"),
        F.sum(money("value")).alias("v"),
    )
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        per_user.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return (
        spark.table(sink)
        .groupBy("mktsegment")
        .agg(
            F.sum("n").alias("n_events"),
            F.count("*").alias("n_users"),
            as_double(F.sum("v")).alias("sum_value"),
        )
    )


@register(
    "streaming_session_window_live",
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
           date_trunc('milliseconds', MIN(ts)) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM islands
    GROUP BY user_id, session_no
    """,
    description="G12/G14 session windows (30m gap) executed by the real "
    "micro-batch engine with merging session state per user; the state "
    "store keeps window bounds at millisecond precision, so the oracle "
    "truncates its session_start to match",
)
def streaming_session_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows on the streaming engine proper: the
    state store holds open sessions per user and MERGES them as
    micro-batches arrive out of window order — semantics no batch
    replay can exercise. Complete mode keeps every closed-and-merged
    session visible for the oracle diff; production pipelines run the
    same plan in append mode with the watermark closing sessions."""
    staging = _staged_events_json(spark, sf_dir)
    stream = read_event_stream(spark, staging)
    agg = (
        stream.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            as_double(F.sum(money("value"))).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


@register(
    "streaming_kinesis_sim_live",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_records,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    description="S1/S2 live: the kinesis_sim custom Python DataSource "
    "streamed through the real micro-batch engine (shard offsets in the "
    "checkpoint), JSON-decoded and aggregated",
)
def streaming_kinesis_sim_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full reference ingest loop as Spark contracts end-to-end:
    events routed to shard files by partition key (put_record twin),
    streamed back through the custom DataSource's offset protocol
    (get_records pagination), decoded and aggregated by the streaming
    engine. COUNT(DISTINCT) is unsupported in streaming aggregation, so
    the stream aggregates per (event_type, user_id) and a bounded batch
    rollup finishes the distinct count."""
    from pyspark.sql import types as T

    from ..sources.kinesis_sim import events_stream_dir

    path = events_stream_dir(spark, sf_dir)
    payload = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("kinesis_sim")
        .option("path", path)
        .option("maxFetchRecordsPerShard", "1000000")
        .load()
        .select(F.from_json("data", payload).alias("r"))
        .select("r.*")
    )
    per_user = stream.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n")
    )
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        per_user.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_records"),
            F.count("*").alias("n_users"),
        )
    )


@register(
    "streaming_interval_join_live",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           p.ts AS p_ts,
           c.ts AS c_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL '1 hour'
    """,
    description="G4 stream-stream time-interval join executed by the real "
    "micro-batch engine (watermark-bounded state both sides), append mode",
)
def streaming_interval_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream join under the oracle gate: purchases pair with
    the same user's clicks from the preceding hour. Inner interval joins
    emit exactly the matched pairs once both sides arrive, so on a
    bounded replay the append-mode output equals the batch join — which
    is precisely what the oracle checks. Watermarks bound the state
    store: a click older than watermark+gap is evicted, never scanned."""
    from ..streaming.pipeline import purchase_click_interval_join, read_event_stream

    # the join CONDITION compares ts -> needs microsecond staging
    staging = _staged_events_json(spark, sf_dir, micros=True)

    stream = read_event_stream(spark, staging)
    purchases = stream.filter(F.col("event_type") == "purchase")
    clicks = stream.filter(F.col("event_type") == "click")
    joined = purchase_click_interval_join(purchases, clicks)
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


@register(
    "streaming_rest_pages_live",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
    description="G1/S1-analog live: the rest_page_sim custom DataSource "
    "streamed through the real micro-batch engine — rate-limited page "
    "tail (offset cursor in the checkpoint), JSON-decoded, aggregated",
)
def streaming_rest_pages_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The offset-paginated API as a live stream: each micro-batch
    advances the page cursor by at most maxPagesPerBatch (the client
    rate limit), so draining the fixture exercises several rounds of
    the offset protocol, not one bulk read. Streaming aggregation in
    complete mode; the memory sink holds the final per-lang counts."""
    from pyspark.sql import types as T

    from ..sources.rest_page_sim import documents_api_dir

    path = documents_api_dir(spark, sf_dir)
    payload = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("rest_page_sim")
        .option("path", path)
        .option("pageSize", "200")
        .option("maxPagesPerBatch", "4")
        .load()
        .select(F.from_json("record", payload).alias("r"))
        .select("r.*")
    )
    agg = stream.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


def _staged_events_json_doubled(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events fixture TWICE (every record duplicated) so the
    live dedup query has real duplicates to remove."""
    return _staged_json(
        spark, sf_dir, "events_dup", "events",
        transform=lambda df: df.unionAll(df),
    )


@register(
    "streaming_dedup_live",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    description="G14 executed by the real micro-batch engine: "
    "dropDuplicatesWithinWatermark on event_id over a doubled replay "
    "of the events fixture — per-type counts/sums must equal the "
    "single-copy batch aggregate, proving exactly one survivor per key",
)
def streaming_dedup_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming dedup operator the reference's at-least-once
    consumer needs in front of it (consumer.py re-reads records on
    restart): every event is staged twice, the stream drops duplicates
    by event_id with watermark-bounded state (state for a key is freed
    once the watermark passes its event time — bounded memory at any
    stream length, unlike an unbounded dropDuplicates), and the sink's
    per-type totals must equal the batch aggregate over the SINGLE
    copy. Dedup state is keyed only by event_id: at 100 TB that's one
    compact state row per in-flight key in RocksDB, sharded by the
    state-store partitioning."""
    staging = _staged_events_json_doubled(spark, sf_dir)
    stream = read_event_stream(spark, staging)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            as_double(F.sum(money("value"))).alias("sum_value"),
        )
    )


@register(
    "streaming_append_watermark_live",
    oracle="""
    WITH wm AS (
        SELECT date_trunc('milliseconds', MAX(ts)) - INTERVAL '10 minutes'
                   AS watermark
        FROM events)
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events CROSS JOIN wm
    GROUP BY 1, 2, wm.watermark
    HAVING date_trunc('hour', ts) + INTERVAL '1 hour' <= wm.watermark
    """,
    description="G13 executed by the real micro-batch engine in APPEND "
    "mode: a window row is emitted only once the watermark (max event "
    "time - 10min) passes its end, so the sink holds exactly the "
    "watermark-closed windows — the late-data policy as an oracle row, "
    "not just a pytest",
)
def streaming_append_watermark_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode watermark semantics, made oracle-checkable: after
    the bounded file source drains, Spark runs its no-data batch, the
    final watermark settles at max(staged ts) - delay (order-
    independent: the max is global), and the emitted set is exactly
    {windows : window.end <= watermark}. The oracle computes that set
    in SQL — ms-truncating the max because the JSON staging carries
    millisecond timestamps. In production the same plan runs forever
    and each window emits once, state freed after emission; that
    eviction is what bounds state at 100 TB/day stream volumes."""
    staging = _staged_events_json(spark, sf_dir)
    stream = read_event_stream(spark, staging)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
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
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


@register(
    "streaming_chained_windows_live",
    oracle="""
    WITH half AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS w30, event_type,
               COUNT(*) AS n30,
               SUM(CAST(value AS DECIMAL(12,2))) AS v30
        FROM events
        GROUP BY 1, 2),
    wm AS (
        SELECT date_trunc('milliseconds', MAX(ts)) - INTERVAL '10 minutes'
                   AS watermark
        FROM events)
    SELECT date_trunc('hour', w30) AS window_start, event_type,
           CAST(SUM(n30) AS BIGINT) AS n,
           CAST(SUM(v30) AS DOUBLE) AS sum_value
    FROM half CROSS JOIN wm
    GROUP BY 1, 2, wm.watermark
    HAVING date_trunc('hour', w30) + INTERVAL '1 hour' <= wm.watermark
    """,
    description="Spark 4 chained stateful operators on the real "
    "micro-batch engine: 30-minute windowed aggregate feeding a second "
    "1-hour window aggregate (window_time re-windowing) in ONE "
    "streaming query, append mode — the final watermark closes both "
    "stages, and the emitted hours must equal the direct hourly "
    "rollup of the half-hour partials",
)
def streaming_chained_windows_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple stateful operators in one query — the capability that
    lets production pipelines pre-aggregate at fine grain and roll up
    coarser WITHOUT a second job or an intermediate topic: state for
    stage 1 is per-30min window, stage 2 re-windows `window_time()`
    into hours, and watermark propagation closes stage 2 exactly when
    the stage-1 partials that feed an hour are final. Cross-checked
    against the batch identity: hourly totals == rollup of half-hour
    partials over closed hours."""
    staging = _staged_events_json(spark, sf_dir)
    stream = read_event_stream(spark, staging)
    half = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes"), "event_type")
        .agg(
            F.count("*").alias("n30"),
            F.sum(money("value")).alias("v30"),
        )
    )
    hourly = (
        half.groupBy(
            F.window(F.window_time("window"), "1 hour"), "event_type"
        )
        .agg(
            F.sum("n30").cast("bigint").alias("n"),
            as_double(F.sum("v30")).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        hourly.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


@register(
    "streaming_outer_interval_join_live",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (SELECT * FROM events WHERE event_type = 'click'),
    wm AS (
        -- the GLOBAL watermark is the min over both watermarked
        -- inputs, each computed from ITS OWN filtered stream
        SELECT least((SELECT MAX(ts) FROM p),
                     (SELECT MAX(ts) FROM c)) - INTERVAL '10 minutes'
                   AS watermark),
    matched AS (
        SELECT p.event_id AS purchase_id, c.event_id AS click_id,
               p.user_id, p.ts AS p_ts, c.ts AS c_ts
        FROM p JOIN c
          ON p.user_id = c.user_id
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL '1 hour'),
    unmatched AS (
        SELECT p.event_id AS purchase_id, NULL::BIGINT AS click_id,
               p.user_id, p.ts AS p_ts, NULL::TIMESTAMP AS c_ts
        FROM p CROSS JOIN wm
        WHERE p.ts < wm.watermark
          AND NOT EXISTS (
              SELECT 1 FROM c
              WHERE c.user_id = p.user_id
                AND c.ts <= p.ts
                AND c.ts >= p.ts - INTERVAL '1 hour'))
    SELECT * FROM matched
    UNION ALL
    SELECT * FROM unmatched
    """,
    description="G4 stream-stream LEFT OUTER interval join on the real "
    "micro-batch engine: matched purchase-click pairs emit on arrival; "
    "an unmatched purchase emits its null row only after the watermark "
    "proves no qualifying click can still arrive — the emitted set is "
    "matched pairs + watermark-cleared unmatched purchases",
)
def streaming_outer_interval_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The outer variant completes the stream-stream join family:
    inner results are watermark-independent (emit when both sides
    arrive), while null-padded rows are a WATERMARK DECISION — a
    purchase can only be declared clickless once the click-side
    watermark passes its ts (no click with c.ts <= p.ts can arrive
    after that). On a drained source the final watermark is
    the MIN over both sides' watermarks — each side's watermark
    derives from its OWN filtered stream's max event time (purchases
    and clicks top out at different instants), a multi-input subtlety
    single-stream oracles never see. The oracle's unmatched set is
    exactly {clickless purchases with p_ts < min(max_p, max_c) -
    10min}; later purchases stay in state unemitted (verified: the
    max-ts purchase is withheld because its own side's watermark
    sits 10min below it)."""
    from ..streaming.pipeline import read_event_stream

    staging = _staged_events_json(spark, sf_dir, micros=True)
    stream = read_event_stream(spark, staging)
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 hour")),
        "left_outer",
    ).select("purchase_id", "click_id", "user_id", "p_ts", "c_ts")
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


@register(
    "streaming_union_sources_live",
    oracle="""
    SELECT event_type,
           COUNT(*) * 2 AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) * 2 AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    description="multi-source streaming DAG on the real engine: the "
    "SAME events replayed through a JSON file stream AND a CSV file "
    "stream, unioned into one aggregate — per-type totals are exactly "
    "double the single-copy batch aggregate",
)
def streaming_union_sources_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One streaming query over two heterogeneous sources — the
    consolidation topology (many ingest formats, one logical stream) a
    platform needs when producers migrate wire formats. Each source
    keeps its own offsets in the shared checkpoint; the union is
    plan-level (no shuffle added beyond the aggregate's own), and the
    doubled totals give a self-evident oracle. The CSV side carries
    timestamps as unix micros (format-proof), the JSON side as ISO
    strings — both normalize before the union."""
    staging_json = _staged_events_json(spark, sf_dir)
    json_stream = read_event_stream(spark, staging_json).select(
        "event_type", F.col("value").cast("double").alias("value")
    )

    import os

    csv_dir = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_stage",
        os.path.basename(os.path.normpath(sf_dir)) or "sf",
        f"events_csv_{fixture_fingerprint(sf_dir)}",
    )
    if not os.path.exists(os.path.join(csv_dir, "_SUCCESS")):
        events = load_table(spark, sf_dir, "events")
        events.select(
            "event_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "event_type",
            F.col("value").cast("double").alias("value"),
        ).write.mode("overwrite").option("header", True).csv(csv_dir)
    csv_stream = (
        spark.readStream.schema(EVENTS_CSV_SCHEMA)
        .option("header", True)
        .csv(csv_dir)
        .select("event_type", F.col("value").cast("double").alias("value"))
    )

    unioned = json_stream.unionByName(csv_stream)
    agg = unioned.groupBy("event_type").agg(
        F.count("*").alias("n"),
        as_double(F.sum(money("value"))).alias("sum_value"),
    )
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


@register(
    "streaming_join_then_window_live",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (SELECT * FROM events WHERE event_type = 'click'),
    wm AS (
        SELECT least((SELECT MAX(ts) FROM p),
                     (SELECT MAX(ts) FROM c)) - INTERVAL '10 minutes'
                   AS watermark),
    pairs AS (
        SELECT p.ts AS p_ts
        FROM p JOIN c
          ON p.user_id = c.user_id
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL '1 hour')
    SELECT date_trunc('hour', p_ts) AS window_start,
           COUNT(*) AS n_pairs
    FROM pairs CROSS JOIN wm
    GROUP BY 1, wm.watermark
    -- the window stage sees the JOIN'S OUTPUT watermark, which is the
    -- global watermark minus the join's state retention: clicks are
    -- held while p_ts <= c_ts + 1h can still match, so retention (and
    -- the propagation delta) is the 1-hour interval width
    HAVING date_trunc('hour', p_ts) + INTERVAL '1 hour'
           <= wm.watermark - INTERVAL '1 hour'
    ORDER BY window_start
    """,
    description="chained stateful ops, join-first topology: "
    "stream-stream interval join feeding a windowed aggregate in ONE "
    "append-mode query — emitted hours are those closed by the JOIN'S "
    "OUTPUT watermark (global min-of-inputs watermark minus the "
    "join's 1h state retention), counts equal the batch join's "
    "per-hour pair totals",
)
def streaming_join_then_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second multi-stateful topology (the first,
    `streaming_chained_windows_live`, chains agg->agg): a watermarked
    stream-stream interval join whose matched pairs flow straight into
    a tumbling-window count. Watermark propagation is the subtle part:
    each stateful operator emits an OUTPUT watermark = its input
    watermark minus its event-time state retention, and the downstream
    window stage closes on THAT. Here the click side is retained while
    p_ts <= c_ts + 1h can still match, so the join's output watermark
    trails the global (min-of-inputs) watermark by exactly the 1-hour
    interval width — the final joinable hour stays open even after the
    global watermark passes its end (caught by the sf0.1 value gate in
    round 4; invisible at sf0.01 where no window lands in the 1-hour
    band). Pre-3.4 Spark rejected this plan (multiple stateful
    operators); it is now the one-query form of join-then-rollup
    pipelines."""
    from ..streaming.pipeline import read_event_stream

    staging = _staged_events_json(spark, sf_dir, micros=True)
    stream = read_event_stream(spark, staging)
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "10 minutes")
    )
    pairs = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 hour")),
    )
    agg = (
        pairs.groupBy(F.window("p_ts", "1 hour"))
        .agg(F.count("*").alias("n_pairs"))
        .select(F.col("window.start").alias("window_start"), "n_pairs")
    )
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


@register(
    "streaming_full_outer_interval_join_live",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (SELECT * FROM events WHERE event_type = 'click'),
    wm AS (
        SELECT least((SELECT MAX(ts) FROM p),
                     (SELECT MAX(ts) FROM c)) - INTERVAL '10 minutes'
                   AS watermark),
    matched AS (
        SELECT p.event_id AS purchase_id, c.event_id AS click_id,
               p.user_id AS uid, p.ts AS p_ts, c.ts AS c_ts
        FROM p JOIN c
          ON p.user_id = c.user_id
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL '1 hour'),
    unmatched_p AS (
        SELECT p.event_id AS purchase_id, NULL::BIGINT AS click_id,
               p.user_id AS uid, p.ts AS p_ts, NULL::TIMESTAMP AS c_ts
        FROM p CROSS JOIN wm
        WHERE p.ts < wm.watermark
          AND NOT EXISTS (
              SELECT 1 FROM c
              WHERE c.user_id = p.user_id
                AND c.ts <= p.ts
                AND c.ts >= p.ts - INTERVAL '1 hour')),
    unmatched_c AS (
        SELECT NULL::BIGINT AS purchase_id, c.event_id AS click_id,
               c.user_id AS uid, NULL::TIMESTAMP AS p_ts, c.ts AS c_ts
        FROM c CROSS JOIN wm
        WHERE c.ts + INTERVAL '1 hour' < wm.watermark
          AND NOT EXISTS (
              SELECT 1 FROM p
              WHERE p.user_id = c.user_id
                AND c.ts <= p.ts
                AND c.ts >= p.ts - INTERVAL '1 hour'))
    SELECT * FROM matched
    UNION ALL SELECT * FROM unmatched_p
    UNION ALL SELECT * FROM unmatched_c
    """,
    description="G4 stream-stream FULL OUTER interval join on the real "
    "micro-batch engine: each side's null row emits only once the "
    "global watermark passes the LAST instant the other side could "
    "still produce a match — p_ts itself for purchases, c_ts + 1h for "
    "clicks, the asymmetry coming from the interval condition",
)
def streaming_full_outer_interval_join_live(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Completes the stream-stream join family (inner, left-outer,
    full-outer). The instructive part is the ASYMMETRIC eviction rule
    both engines must agree on: under `p_ts - 1h <= c_ts <= p_ts`, a
    purchase's latest possible click arrives at c_ts = p_ts, so its
    null row is final once the global watermark (min over both sides'
    own-stream watermarks) passes p_ts; a click's latest possible
    purchase sits at p_ts = c_ts + 1h, so its null row waits a full
    extra hour. Rows above the final watermark stay withheld in state
    — the oracle enumerates exactly the watermark-cleared unmatched
    sets plus the watermark-independent matched pairs."""
    staging = _staged_events_json(spark, sf_dir, micros=True)
    stream = read_event_stream(spark, staging)
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 hour")),
        "full_outer",
    ).select(
        "purchase_id",
        "click_id",
        F.coalesce("user_id", "c_user").alias("uid"),
        "p_ts",
        "c_ts",
    )
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


@register(
    "streaming_dedup_then_window_live",
    oracle="""
    WITH wm AS (
        SELECT date_trunc('milliseconds', MAX(ts)) - INTERVAL '10 minutes'
                   AS watermark
        FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events CROSS JOIN wm
    GROUP BY 1, 2, wm.watermark
    HAVING time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
               <= wm.watermark
    """,
    description="chained stateful ops, dedup-first topology: "
    "dropDuplicatesWithinWatermark over a DOUBLED replay feeding a "
    "tumbling hourly aggregate in ONE append-mode query — closed "
    "windows must equal the single-copy batch rollup, proving the "
    "dedup stage removed every duplicate before the window stage "
    "counted it",
)
def streaming_dedup_then_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third multi-stateful topology (agg->agg and join->agg are
    registered above): at-least-once ingestion deduplicated and rolled
    up in one query instead of two jobs with an intermediate topic.
    Every event arrives twice; stage 1 keeps one survivor per event_id
    with watermark-bounded state, stage 2 windows the survivors into
    hourly per-type totals. Append mode emits exactly the windows the
    final watermark closed (window.end <= max(ts) - delay via the
    no-data batch), and each emitted total must equal the SINGLE-copy
    batch aggregate — a doubled count anywhere means a duplicate
    leaked past stage 1 into stage 2's state."""
    staging = _staged_events_json_doubled(spark, sf_dir)
    stream = read_event_stream(spark, staging)
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = (
        deduped.groupBy(F.window("ts", "1 hour"), "event_type")
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
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


@register(
    "streaming_foreachbatch_topk_live",
    oracle="""
    WITH counts AS (
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2),
    ranked AS (
        SELECT window_start, event_type, CAST(n AS BIGINT) AS n,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY window_start
                   ORDER BY n DESC, event_type) AS BIGINT) AS rnk
        FROM counts)
    SELECT window_start, event_type, n, rnk FROM ranked WHERE rnk <= 3
    """,
    description="G12/G14 batch-only operator inside a streaming sink: "
    "complete-mode windowed counts ranked top-3 per window by a window "
    "function INSIDE foreachBatch (rank/row_number are unsupported on "
    "streaming DataFrames; foreachBatch is the documented escape hatch) "
    "— executed by the real micro-batch engine",
)
def streaming_foreachbatch_topk_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per hour window, computed live.

    The streaming half is an ordinary complete-mode windowed count; the
    ranking half — a window function, which Structured Streaming
    rejects on unbounded input — runs per epoch inside foreachBatch on
    the (bounded, |windows| x |types|) aggregate state. The last
    epoch's ranking is the answer once the source drains. State held
    driver-side is only the ranked top-3 rows (3 x |windows|), never
    event-sized data. At scale the same topology writes each epoch's
    ranking to a keyed sink instead of a local holder.
    """
    from pyspark.sql import Window as W

    staging = _staged_events_json(spark, sf_dir)
    stream = read_event_stream(spark, staging)
    agg = (
        stream.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n"
        )
    )
    holder: dict[str, list] = {}
    rank_w = W.partitionBy("window_start").orderBy(F.desc("n"), "event_type")

    def rank_sink(batch_df: DataFrame, epoch_id: int) -> None:
        ranked = (
            batch_df.withColumn("rnk", F.row_number().over(rank_w).cast("bigint"))
            .filter(F.col("rnk") <= 3)
        )
        holder["rows"] = ranked.collect()  # bounded: 3 rows per window
        holder["schema"] = ranked.schema

    query = agg.writeStream.foreachBatch(rank_sink).outputMode("complete").start()
    query.processAllAvailable()
    query.stop()
    return spark.createDataFrame(holder["rows"], holder["schema"])


@register(
    "streaming_restart_resume_live",
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
    description="G15 exactly-once restart executed live: half the events "
    "are drained under a checkpoint, the query STOPS, the second half "
    "arrives, and a NEW query resumes from the same checkpoint — final "
    "complete-mode state must equal the one-shot batch aggregate over "
    "everything (file-source offsets + aggregate state both recovered)",
)
def streaming_restart_resume_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kill-and-resume drill as an oracle-checked query.

    Phase 1 stages the even-event_id half as JSON, drains it into a
    checkpointed complete-mode daily aggregate, and stops the query.
    Phase 2 drops the odd half into the same source directory and
    starts a FRESH query object on the SAME checkpoint: the file
    source's processed-file log skips phase-1 files, the state store
    restores the phase-1 aggregate, and the final emitted state covers
    both halves exactly once. Staging is per-invocation tempdir — the
    drill must actually run both phases every time, so nothing is
    cached. This is the reference's TRIM_HORIZON weakness (SURVEY §2.3
    G15: restart rereads everything, at-least-once) solved the Spark
    way.
    """
    import os
    import shutil

    base = tempfile.mkdtemp(prefix="spark_graft_restart_")
    data_dir = os.path.join(base, "data")
    ckpt_dir = os.path.join(base, "ckpt")
    os.makedirs(data_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events")

    def stage(half: int, name: str) -> None:
        part = events.filter(F.col("event_id") % 2 == half)
        tmp_out = os.path.join(base, f"stage_{name}")
        part.select(F.to_json(F.struct(*events.columns)).alias("value")).coalesce(
            1
        ).write.mode("overwrite").text(tmp_out)
        i = 0
        for f in sorted(os.listdir(tmp_out)):
            if f.startswith("part-"):
                shutil.copy(
                    os.path.join(tmp_out, f),
                    os.path.join(data_dir, f"{name}_{i}.json"),
                )
                i += 1

    agg_of = lambda stream: (  # noqa: E731
        stream.groupBy(
            F.date_trunc("day", "ts").alias("day"), F.col("event_type")
        ).agg(F.count("*").alias("n"))
    )

    stage(0, "half_a")
    sink1 = f"restart_a_{uuid.uuid4().hex[:10]}"
    q1 = (
        agg_of(read_event_stream(spark, data_dir))
        .writeStream.format("memory")
        .queryName(sink1)
        .outputMode("complete")
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    q1.processAllAvailable()
    q1.stop()

    stage(1, "half_b")
    sink2 = f"restart_b_{uuid.uuid4().hex[:10]}"
    q2 = (
        agg_of(read_event_stream(spark, data_dir))
        .writeStream.format("memory")
        .queryName(sink2)
        .outputMode("complete")
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    out = spark.table(sink2)
    return out


@register(
    "streaming_availablenow_live",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
    description="G12/G15 Trigger.AvailableNow executed live: the query "
    "drains everything available in rate-limited micro-batches and "
    "STOPS ITSELF (no processAllAvailable nudge) — the scheduled-batch "
    "ingestion mode; final complete-mode state equals the batch "
    "aggregate",
)
def streaming_availablenow_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AvailableNow trigger: stream semantics, batch lifecycle.

    Unlike the default micro-batch trigger (runs forever, needs an
    external stop), AvailableNow snapshots the source's current end
    offset at start, drains up to it under normal rate limits
    (maxFilesPerTrigger still applies, so state stays bounded per
    batch), then terminates — the mode a 100 TB nightly catch-up job
    runs under, with the same checkpoint it will reuse tomorrow.
    awaitTermination() here is the real self-stop, not a drain+stop
    from the driver.
    """
    staging = _staged_events_json(spark, sf_dir)
    stream = read_event_stream(spark, staging)
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"),
        as_double(F.sum(money("value"))).alias("sum_value"),
    )
    sink = f"avnow_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("maxFilesPerTrigger", "8")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(sink)


@register(
    "streaming_custom_session_timeout_live",
    oracle="""
    WITH marks AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marks),
    agg AS (
        SELECT user_id, sid,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, sid),
    flagged AS (
        SELECT a.*,
               MAX(sid) OVER (PARTITION BY user_id) AS max_sid,
               (SELECT epoch_ms(MAX(ts)) - 600000 FROM events) AS wm_ms
        FROM agg a)
    SELECT user_id, session_start, session_end, n_events
    FROM flagged
    WHERE sid < max_sid
       OR epoch_ms(session_end) + 1800000 < wm_ms
    """,
    description="G14 custom stateful sessionizer with EVENT-TIME TIMERS "
    "executed live (applyInPandasWithState + EventTimeTimeout): sessions "
    "closed by a later event emit immediately; the open session flushes "
    "when the watermark passes end+30min (hasTimedOut path) — oracle is "
    "gap-islands sessionization plus the engine's exact ms-floor "
    "watermark emission rule",
)
def streaming_custom_session_timeout_live(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The operator `session_window` can't express: custom per-session
    state with explicit timer control.

    Everything arrives in one micro-batch (watermark still 0), so the
    update path emits each user's earlier gap-split sessions and parks
    the last one with a timer at end+30min (ms floor, matching Spark's
    internal watermark truncation); the trailing no-data batch advances
    the watermark to max(ts)-10min and fires the timers whose deadline
    it passed strictly. State is (start, end, n) per user — O(keys),
    never O(events).
    """
    from ..streaming.stateful import custom_sessionize

    staging = _staged_events_json(spark, sf_dir, micros=True)
    stream = read_event_stream(spark, staging)
    sessions = custom_sessionize(stream.select("user_id", "ts"))
    sink = f"csess_{uuid.uuid4().hex[:12]}"
    query = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


@register(
    "streaming_scd2_pointintime_live",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2),
    cum AS (
        SELECT user_id, day,
               SUM(cents) OVER (PARTITION BY user_id ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS cum_cents
        FROM daily),
    tiers AS (
        SELECT user_id, day, CAST(LEAST(cum_cents // 50000, 10) AS BIGINT) AS tier
        FROM cum),
    changes AS (
        SELECT user_id, day AS valid_from, tier,
               LAG(tier) OVER (PARTITION BY user_id ORDER BY day) AS prev_tier
        FROM tiers),
    versions AS (
        SELECT user_id, valid_from, tier,
               COALESCE(LEAD(valid_from) OVER (PARTITION BY user_id
                                               ORDER BY valid_from),
                        TIMESTAMP '9999-01-01') AS valid_to
        FROM changes
        WHERE prev_tier IS NULL OR tier <> prev_tier)
    SELECT v.tier, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(e.value AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM events e JOIN versions v
      ON e.user_id = v.user_id
     AND e.ts >= v.valid_from AND e.ts < v.valid_to
    GROUP BY 1, 2
    ORDER BY tier, event_type
    """,
    description="G4+G14 stream-static SCD2 point-in-time join executed "
    "live: an SCD2 spend-tier dimension (compressed to change rows with "
    "[valid_from, valid_to) intervals) enriches the event STREAM by "
    "user + event-time validity interval; complete-mode rollup per "
    "(tier, event_type) equals the batch point-in-time join",
)
def streaming_scd2_pointintime_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of dimension enrichment inside the streaming engine.

    The dim is the batch-derived SCD2 tier history (cumulative exact
    cents bucketed to tiers, runs compressed to change rows, validity
    closed by the next version's start). The stream joins it with an
    interval predicate — a stream-STATIC join, so no watermark is
    needed and the static side is simply re-probed per micro-batch;
    every event lands in exactly one validity interval by
    construction. This is how a 100 TB pipeline does point-in-time
    feature lookup without leaking future dimension state into past
    events.
    """
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    cents = (money("value") * 100).cast("bigint")
    daily = events.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(cents).alias("cents"))
    wcum = (
        W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    )
    tiers = (
        daily.withColumn("cum_cents", F.sum("cents").over(wcum))
        .select(
            "user_id",
            "day",
            F.least(F.expr("cum_cents div 50000"), F.lit(10)).alias("tier"),
        )
    )
    wlag = W.partitionBy("user_id").orderBy("day")
    changes = tiers.withColumn("prev_tier", F.lag("tier").over(wlag)).filter(
        F.col("prev_tier").isNull() | (F.col("tier") != F.col("prev_tier"))
    )
    versions = (
        changes.select(
            "user_id", F.col("day").alias("valid_from"), "tier"
        )
        .withColumn(
            "valid_to",
            F.coalesce(
                F.lead("valid_from").over(
                    W.partitionBy("user_id").orderBy("valid_from")
                ),
                F.lit("9999-01-01").cast("timestamp"),
            ),
        )
        .localCheckpoint()  # static dim: materialize once, re-probed per batch
    )
    staging = _staged_events_json(spark, sf_dir, micros=True)
    stream = read_event_stream(spark, staging)
    joined = stream.join(
        versions,
        (stream.user_id == versions.user_id)
        & (stream.ts >= versions.valid_from)
        & (stream.ts < versions.valid_to),
    )
    agg = (
        joined.groupBy("tier", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum((money("value") * 100).cast("bigint")).alias("sum_cents"),
        )
    )
    sink = f"scd2pit_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink).orderBy("tier", "event_type")


@register(
    "streaming_observe_quality_live",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN props IS NULL THEN 1 END) AS BIGINT)
               AS n_null_keys,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM events
    """,
    description="S10 observability as an oracle row: Dataset.observe "
    "quality counters (row count, null-key count, exact-cents sum) ride "
    "the live streaming job as accumulators, are collected per "
    "micro-batch from StreamingQueryProgress.observedMetrics, summed "
    "across batches, and must equal the batch SQL totals — per-record "
    "logging (consumer.py:119-121) replaced by constant-overhead "
    "counters that are provably complete",
)
def streaming_observe_quality_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed metrics == ground truth, end to end through the engine.

    The observe() aggregates are accumulator-backed — no second pass,
    no extra shuffle — and each micro-batch reports its slice in
    progress.observedMetrics; summing slices across batches must
    reconstruct the exact batch totals (counts and exact-decimal cents
    are both self-additive). maxFilesPerTrigger=1 forces MULTIPLE
    micro-batches so the cross-batch additivity is actually exercised.
    """
    import json as _json

    import os

    staging = _staged_events_json(spark, sf_dir)
    # Multi-file restage (6 splits) so maxFilesPerTrigger=1 yields real
    # multi-batch execution; cached per fixture fingerprint like the
    # primary stage.
    split_dir = staging.rstrip("/") + "_split6"
    if not os.path.exists(os.path.join(split_dir, "_SUCCESS")):
        spark.read.text(staging).repartition(6).write.mode("overwrite").text(
            split_dir
        )
    stream = spark.readStream.option("maxFilesPerTrigger", "1").schema(
        read_event_stream(spark, staging).schema
    ).json(split_dir)
    observed = stream.observe(
        "quality",
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("props").isNull(), 1)).alias("n_null_keys"),
        F.sum((money("value") * 100).cast("bigint")).alias("sum_cents"),
    )
    sink = f"obsq_{uuid.uuid4().hex[:12]}"
    query = (
        observed.writeStream.format("noop")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    totals = {"n_rows": 0, "n_null_keys": 0, "sum_cents": 0}
    n_batches = 0
    for progress_json in query.recentProgress:
        p = (
            progress_json
            if isinstance(progress_json, dict)
            else _json.loads(progress_json.json)
        )
        om = (p.get("observedMetrics") or {}).get("quality")
        if om:
            n_batches += 1
            totals["n_rows"] += int(om["n_rows"])
            totals["n_null_keys"] += int(om["n_null_keys"] or 0)
            totals["sum_cents"] += int(om["sum_cents"] or 0)
    query.stop()
    assert n_batches >= 2, f"expected multiple micro-batches, got {n_batches}"
    return spark.createDataFrame(
        [(totals["n_rows"], totals["n_null_keys"], totals["sum_cents"])],
        "n_rows bigint, n_null_keys bigint, sum_cents bigint",
    )


@register(
    "streaming_session_variable_gap_live",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE event_type
                   WHEN 'purchase' THEN INTERVAL '60 minutes'
                   WHEN 'click' THEN INTERVAL '15 minutes'
                   ELSE INTERVAL '30 minutes' END AS gap
        FROM events),
    e AS (
        SELECT user_id, ts, event_id,
               MAX(ts + gap) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) AS prev_end
        FROM g),
    f AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_end IS NULL OR ts > prev_end
                    THEN 1 ELSE 0 END AS new_s
        FROM e),
    i AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM f)
    SELECT user_id,
           date_trunc('milliseconds', MIN(ts)) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM i
    GROUP BY user_id, sess_no
    """,
    description="G12/G14 DYNAMIC-gap session windows on the real "
    "micro-batch engine: each event's inactivity gap depends on its "
    "type (purchase 60m / click 15m / else 30m) and the state store "
    "merges per-event intervals across micro-batches; oracle = "
    "running-MAX gaps-and-islands with ms-truncated session starts "
    "(state-store precision)",
)
def streaming_session_variable_gap_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dynamic-gap counterpart of streaming_session_window_live.

    The gap expression is evaluated per event INSIDE the stateful
    operator, so sessions merge under out-of-order arrival exactly as
    in batch (interval union is order-insensitive) — complete mode
    keeps all merged sessions visible for the oracle diff.
    """
    staging = _staged_events_json(spark, sf_dir)
    stream = read_event_stream(spark, staging)
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("60 minutes"))
        .when(F.col("event_type") == "click", F.lit("15 minutes"))
        .otherwise(F.lit("30 minutes"))
    )
    agg = (
        stream.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.table(sink)


def _staged_documents_json(spark: SparkSession, sf_dir: str) -> str:
    """Stage the documents fixture as JSON-lines (no timestamps, so no
    precision variants), keyed on the DOCUMENTS table's fingerprint."""
    return _staged_json(spark, sf_dir, "documents", "documents")


DOCUMENTS_JSON_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


from .corpus_quality import GOPHER_FUNNEL_ORACLE


@register(
    "streaming_quality_funnel_live",
    oracle=GOPHER_FUNNEL_ORACLE,  # the batch funnel's oracle, verbatim
    description="G12+G17 the Gopher quality funnel executed by the real "
    "micro-batch engine: documents replayed through readStream.json, the "
    "SAME counter aggregate as the batch funnel in complete output mode, "
    "funnel rows unpivoted from the drained sink",
)
def streaming_quality_funnel_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-filtering report computed incrementally — the shape a
    production ingest runs (filter counters maintained as documents
    stream in) rather than as a batch audit. The rule projections and
    counting aggregate are imported from the batch operator
    (`corpus_quality.gopher_counters`), so the streaming path exercises
    the identical exprs under the incremental execution engine:
    per-micro-batch partial aggregation + state merge must reproduce the
    batch counts exactly when the stream drains.

    Scale: the streaming state is ONE row of five counters regardless of
    corpus size; each micro-batch does a map-side-combined partial count
    over its files. maxFilesPerTrigger forces multiple micro-batches so
    the state-merge path actually executes."""
    from .corpus_quality import funnel_rows, gopher_counters

    staging = _staged_documents_json(spark, sf_dir)
    stream = (
        spark.readStream.schema(DOCUMENTS_JSON_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .json(staging)
    )
    counters = gopher_counters(stream)
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        counters.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return funnel_rows(spark.table(sink))



def _double(df: DataFrame) -> DataFrame:
    """Duplicate every record — the at-least-once replay the reference's
    TRIM_HORIZON consumer produces on restart (consumer.py:76)."""
    return df.unionAll(df)


def run_curation_pipeline(
    spark: SparkSession,
    staging: str,
    out_dir: str,
    max_files_per_trigger: int | None = None,
    stop_mid_stream: bool = False,
) -> None:
    """The composed reference topology as ONE checkpointed Structured
    Streaming query: JSON document source (staged doubled — real
    duplicates) -> streaming exact dedup on doc_id -> Gopher quality
    gate -> route-partitioned parquet sink (`route=kept|quarantine`
    partition dirs are the two destination streams of consumer.py's
    country demux, expressed as partitionBy instead of per-record
    put_record). Exactly-once: offsets + dedup state live in the
    checkpoint, the file sink commits atomically per epoch — a restart
    from ANY stop point converges to the same file set (the pytest twin
    kills the query mid-stream and resumes on the same checkpoint).

    Scale: dedup state is one compact row per doc key (RocksDB-sharded;
    a production run bounds it with dropDuplicatesWithinWatermark on an
    ingest-time column — the documents fixture carries no event time,
    so the unbounded variant is used and documented); the gate is a
    narrow codegen projection; the sink shuffles nothing (task-local
    partition dirs)."""
    import os

    from ..functions.text import tokens
    from .corpus_quality import gopher_pass_flag

    reader = spark.readStream.schema(DOCUMENTS_JSON_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(staging)
    deduped = stream.dropDuplicates(["doc_id"])
    routed = deduped.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        F.when(gopher_pass_flag(), F.lit("kept"))
        .otherwise(F.lit("quarantine"))
        .alias("route"),
    )
    query = (
        routed.writeStream.format("parquet")
        .partitionBy("route")
        .option("path", os.path.join(out_dir, "data"))
        .option("checkpointLocation", os.path.join(out_dir, "chk"))
        .outputMode("append")
        .start()
    )
    if stop_mid_stream:
        import time

        # Wait for at least one committed micro-batch, then stop — the
        # restart twin resumes from the checkpoint.
        for _ in range(600):
            if any(p.numInputRows > 0 for p in query.recentProgress):
                break
            time.sleep(0.05)
        query.stop()
        query.awaitTermination(30)
    else:
        query.processAllAvailable()
        query.stop()


def curation_census(spark: SparkSession, data_dir: str) -> DataFrame:
    return (
        spark.read.parquet(data_dir)
        .groupBy("route")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("route")
    )


from .corpus_quality import (  # noqa: E402
    GOPHER_DISTINCT_DEN,
    GOPHER_DISTINCT_NUM,
    GOPHER_MAX_TOKENS,
    GOPHER_MIN_STOP_HITS,
    GOPHER_MIN_TOKENS,
    GOPHER_MWL_HI,
    GOPHER_MWL_LO,
    GOPHER_STOPWORDS_SQL,
)


@register(
    "streaming_curation_pipeline_live",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               len(toks) AS n,
               list_sum(list_transform(toks, x -> len(x))) AS sl,
               len(list_distinct(toks)) AS nd,
               len(list_distinct(list_filter(toks,
                   x -> x IN ({GOPHER_STOPWORDS_SQL})))) AS n_stop
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              FROM documents)),
    r AS (
        SELECT doc_id, n,
               CASE WHEN n BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS}
                     AND {GOPHER_MWL_LO} * n <= sl AND sl <= {GOPHER_MWL_HI} * n
                     AND {GOPHER_DISTINCT_DEN} * nd >= {GOPHER_DISTINCT_NUM} * n
                     AND n_stop >= {GOPHER_MIN_STOP_HITS}
                    THEN 'kept' ELSE 'quarantine' END AS route
        FROM s)
    SELECT route, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM r GROUP BY route ORDER BY route
    """,
    description="the full reference topology composed with curation ops, "
    "run by the real micro-batch engine: doubled (at-least-once) document "
    "source -> streaming exact dedup -> Gopher quality gate -> "
    "route-partitioned exactly-once parquet sink; census of the sink files "
    "must equal the batch oracle over the single-copy corpus",
)
def streaming_curation_pipeline_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See run_curation_pipeline — this registry entry stages the corpus
    doubled, drives the checkpointed query to completion, then reads the
    committed sink files back and reports the per-route census. The
    oracle computes the same census in SQL over the SINGLE copy:
    matching proves the stream (a) dropped every duplicate, (b) applied
    the same quality gate, and (c) committed each surviving doc to
    exactly one route partition.

    Disk hygiene (ADVICE r9): this entry rides the bench HEADLINE and
    the multi-SF gates, so a leaked uuid-named sink dir per invocation
    would accumulate doubled-corpus parquet copies. The census is a
    <=2-row relation — collect it (bounded by the route cardinality,
    not the corpus), rmtree the sink+checkpoint, and return the rows as
    a local DataFrame."""
    import os
    import shutil

    staging = _staged_json(
        spark, sf_dir, "docs_dup", "documents", transform=_double
    )
    out_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_curation_{uuid.uuid4().hex[:12]}"
    )
    try:
        run_curation_pipeline(spark, staging, out_dir)
        census = curation_census(spark, os.path.join(out_dir, "data"))
        rows = census.collect()
        schema = census.schema
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# --- Streaming HLL: incremental register maintenance ------------------

from .sketches import (  # noqa: E402
    _hll_oracle,
    hll_merge_all,
    hll_registers,
    hll_report,
)


@register(
    "streaming_hll_distinct_live",
    oracle=_hll_oracle(
        table="events",
        grp_sql="event_type",
        key_sql="CAST(user_id AS VARCHAR)",
    ),
    description="G6+G14 streaming HLL: the micro-batch engine maintains "
    "per-event-type HLL registers (groupBy MAX state) incrementally over "
    "the event stream; the batch tail merges the streamed registers into "
    "the ALL rollup and runs the integer-rational estimator — sketch, "
    "estimates, and error_ppm value-checked by the same oracle as the "
    "batch twin",
)
def streaming_hll_distinct_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB streaming-distinct path, executed for real: HLL
    registers are a groupBy(grp, bucket) MAX, which Structured
    Streaming maintains as incremental state — each micro-batch folds
    its rows into at most |types| x m register rows, so state is
    CONSTANT-size regardless of stream length (the whole point of
    sketching a stream). The memory sink holds the final registers; the
    batch tail max-merges them into 'ALL' (sketch algebra on streamed
    state) and computes the estimator. The exact-distinct audit column
    comes from the same fixture the stream replays, so the oracle
    value-checks estimator AND error."""
    staging = _staged_events_json(spark, sf_dir)
    stream = read_event_stream(spark, staging)
    keys = stream.select(
        F.col("event_type").alias("grp"),
        F.col("user_id").cast("string").alias("key"),
    )
    regs = hll_registers(keys)
    sink = f"live_{uuid.uuid4().hex[:12]}"
    query = (
        regs.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    streamed = spark.table(sink)
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.col("user_id").cast("string").alias("key"),
    )
    ex = (
        ev.groupBy("grp")
        .agg(F.countDistinct("key").cast("bigint").alias("exact_distinct"))
        .unionByName(
            ev.agg(
                F.countDistinct("key").cast("bigint").alias("exact_distinct")
            ).select(F.lit("ALL").alias("grp"), "exact_distinct")
        )
    )
    return hll_report(
        streamed.unionByName(hll_merge_all(streamed)), ex
    )
