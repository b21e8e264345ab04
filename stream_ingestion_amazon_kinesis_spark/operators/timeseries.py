"""Time-series analytics over the event stream (SURVEY §2.3 G5/G8/G12
depth): OHLC bars, autocorrelation, robust outliers, CUSUM changepoint
localization, and a seasonal-naive forecast backtest.

The reference's stream consumer (consumer.py:117-175) reduces each
record independently; these operators are the stateful-over-time
analyses a stream analyst runs downstream of ingestion. All of them
reduce the raw stream to a bounded grain first — (event_type, hour) or
(event_type, day) — so the per-series state is |calendar| x |types|,
never |events|: the shape that survives a 100 TB backfill. Every
statistic is exact integer / decimal arithmetic (no float
accumulation), so results are identical across partitionings and match
the single-threaded DuckDB oracle bit-for-bit.

Scale notes per operator are in each docstring; the shared integer
bound is n_hours * max_bucket_count < ~3e9 (so squared terms fit
int64). At a scale where a single (type, hour) bucket holds billions
of events, the mean-centered products must move to DECIMAL(38,0)
accumulation with a guarded final division (Spark's `div` on
decimal(38,0) wraps through long — see STATE.md lesson #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.numeric import money
from ..plans.registry import register
from ..sources.catalog import load_table


def _cents(col: str = "value") -> F.Column:
    """value (double, <=2dp) -> exact integer cents."""
    return (money(col) * 100).cast("bigint")


def _hourly_type_grid(events: DataFrame) -> DataFrame:
    """Dense (event_type x hour) spine with zero-filled counts.

    The spine is |hours| x |types| — calendar-bounded, built from ONE
    aggregate row via sequence+explode (no driver round-trip) and a
    broadcastable distinct-type relation. The left join against the
    hourly rollup is the only |data|-sized operation.
    """
    span = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour_start"
        )
    )
    types = events.select("event_type").distinct()
    actual = events.groupBy(
        F.col("event_type"), F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count("*").alias("a_n"))
    return (
        hours.crossJoin(F.broadcast(types))
        .join(actual, ["event_type", "hour_start"], "left")
        .select(
            "event_type",
            "hour_start",
            F.coalesce("a_n", F.lit(0)).cast("bigint").alias("x"),
        )
    )


_GRID_SQL = """
    span AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo,
               date_trunc('hour', MAX(ts)) AS hi
        FROM events),
    hours AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour_start
        FROM span),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_start,
               COUNT(*) AS a_n
        FROM events GROUP BY 1, 2),
    grid AS (
        SELECT t.event_type, h.hour_start,
               CAST(COALESCE(a.a_n, 0) AS BIGINT) AS x
        FROM hours h CROSS JOIN types t
        LEFT JOIN actual a
          ON a.event_type = t.event_type AND a.hour_start = h.hour_start)
"""


@register(
    "ohlc_hourly_bars",
    oracle="""
    WITH e AS (
        SELECT event_type, date_trunc('hour', ts) AS window_start,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events)
    SELECT event_type, window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           MAX(cents) AS high_cents,
           MIN(cents) AS low_cents,
           MAX(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
           MAX(CASE WHEN rn_d = 1 THEN cents END) AS close_cents
    FROM e
    GROUP BY 1, 2
    ORDER BY event_type, window_start
    """,
    description="G12 OHLC candlestick bars: per (event_type, hour) open/"
    "high/low/close/volume in exact integer cents, with a total (ts, "
    "event_id) tiebreak so open/close are deterministic",
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type.

    One hash aggregate on the (type, hour) grain: open/close are
    `min_by`/`max_by` against a `struct(ts, event_id)` ordering key
    (total order — event_id is unique), so the whole bar is a single
    map-side-combinable agg with no window sort. At 100 TB this is the
    textbook downsample: output cardinality = |calendar hours| x
    |types| regardless of input rows.
    """
    events = load_table(spark, sf_dir, "events")
    ord_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("window_start"),
            _cents().alias("cents"),
            ord_key.alias("k"),
        )
        .groupBy("event_type", "window_start")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.min_by("cents", F.col("k")).alias("open_cents"),
            F.max_by("cents", F.col("k")).alias("close_cents"),
        )
        .orderBy("event_type", "window_start")
    )


@register(
    "autocorr_hourly_counts",
    oracle=f"""
    WITH {_GRID_SQL},
    stats AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s
        FROM grid GROUP BY 1),
    lagged AS (
        SELECT g.event_type, g.x, s.n, s.s,
               LAG(g.x) OVER (PARTITION BY g.event_type
                              ORDER BY g.hour_start) AS xp
        FROM grid g JOIN stats s USING (event_type)),
    sums AS (
        SELECT event_type, ANY_VALUE(n) AS n_hours, ANY_VALUE(s) AS total_events,
               CAST(SUM(CASE WHEN xp IS NOT NULL
                        THEN (n * x - s) * (n * xp - s) END) AS BIGINT) AS acf1_num,
               CAST(SUM((n * x - s) * (n * x - s)) AS BIGINT) AS acf1_den
        FROM lagged GROUP BY event_type)
    SELECT event_type, n_hours, total_events, acf1_num, acf1_den,
           CASE WHEN acf1_den > 0
                THEN CAST(sign(acf1_num) AS BIGINT)
                     * ((1000000 * abs(acf1_num)) // acf1_den)
           END AS acf1_ppm
    FROM sums
    ORDER BY event_type
    """,
    description="G8/G12 lag-1 autocorrelation of the dense hourly count "
    "series per event type, in exact integer arithmetic (mean-centering "
    "scaled by n so no rational ever appears; ratio reported as "
    "truncated ppm)",
)
def autocorr_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of hourly event counts per type.

    r1 = sum((x_t - m)(x_(t-1) - m)) / sum((x_t - m)^2) computed as
    integers by scaling through n (m = S/n): numerator terms become
    (n*x_t - S)(n*x_(t-1) - S). Exact, partition-order-free, and the
    sign-safe ppm division (sign * (1e6*abs) div den) truncates toward
    zero identically on both engines. Series length is calendar-bounded;
    the window partition is |hours| per type, never |events|.
    """
    grid = _hourly_type_grid(load_table(spark, sf_dir, "events"))
    stats = grid.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("x").alias("s")
    )
    w = W.partitionBy("event_type").orderBy("hour_start")
    lagged = (
        grid.join(F.broadcast(stats), "event_type")
        .withColumn("xp", F.lag("x").over(w))
        .withColumn("dev", F.col("n") * F.col("x") - F.col("s"))
        .withColumn("devp", F.col("n") * F.col("xp") - F.col("s"))
    )
    sums = lagged.groupBy("event_type").agg(
        F.first("n").alias("n_hours"),
        F.first("s").alias("total_events"),
        F.sum(F.when(F.col("xp").isNotNull(), F.col("dev") * F.col("devp"))).alias(
            "acf1_num"
        ),
        F.sum(F.col("dev") * F.col("dev")).alias("acf1_den"),
    )
    ppm = F.when(
        F.col("acf1_den") > 0,
        F.signum("acf1_num").cast("bigint")
        * F.expr("(1000000 * abs(acf1_num)) div acf1_den"),
    )
    return sums.select(
        "event_type",
        "n_hours",
        "total_events",
        "acf1_num",
        "acf1_den",
        ppm.alias("acf1_ppm"),
    ).orderBy("event_type")


@register(
    "mad_outlier_events",
    oracle="""
    WITH e AS (
        SELECT event_type, event_id,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY cents, event_id) AS rn,
                  COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM e),
    med AS (
        SELECT event_type, cents AS med_cents
        FROM ranked WHERE rn = (cnt + 1) // 2),
    dev AS (
        SELECT e.event_type, e.event_id, e.cents,
               abs(e.cents - m.med_cents) AS d, m.med_cents
        FROM e JOIN med m USING (event_type)),
    dranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY d, event_id) AS rn,
                  COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM dev),
    mad AS (
        SELECT event_type, d AS mad_cents
        FROM dranked WHERE rn = (cnt + 1) // 2)
    SELECT d.event_type,
           ANY_VALUE(d.med_cents) AS med_cents,
           ANY_VALUE(mad.mad_cents) AS mad_cents,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE 10000 * d.d > 44478 * mad.mad_cents)
                AS BIGINT) AS n_outliers,
           (1000000 * CAST(COUNT(*) FILTER (
                WHERE 10000 * d.d > 44478 * mad.mad_cents) AS BIGINT))
               // COUNT(*) AS outlier_ppm
    FROM dev d JOIN mad USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
    description="G5/G8 robust outlier detection: median-absolute-deviation "
    "fences per event type (|v - med| > 3 * 1.4826 * MAD as the integer "
    "inequality 10000*dev > 44478*MAD) — lower-median via row_number so "
    "every statistic is an exact integer",
)
def mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD-based robust outliers per event type, all-integer.

    Lower medians are selected by row_number (rn == (n+1) div 2) —
    deterministic under any partitioning because (cents, event_id) is a
    total order. Two window passes + two broadcast joins of the 5-row
    median relations. The exact grouped median needs a per-type sort;
    this is the oracle-exact twin — at 100 TB the same fences run on
    approx_percentile(0.5) with identical downstream algebra.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", _cents().alias("cents")
    )
    wv = W.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = events.withColumn("rn", F.row_number().over(wv)).withColumn(
        "cnt", F.count("*").over(W.partitionBy("event_type"))
    )
    med = ranked.filter(F.col("rn") == F.expr("(cnt + 1) div 2")).select(
        "event_type", F.col("cents").alias("med_cents")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("cents") - F.col("med_cents"))
    )
    wd = W.partitionBy("event_type").orderBy("d", "event_id")
    dranked = dev.withColumn("rn", F.row_number().over(wd)).withColumn(
        "cnt", F.count("*").over(W.partitionBy("event_type"))
    )
    mad = dranked.filter(F.col("rn") == F.expr("(cnt + 1) div 2")).select(
        "event_type", F.col("d").alias("mad_cents")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    out = F.sum(
        F.when(10000 * F.col("d") > 44478 * F.col("mad_cents"), 1).otherwise(0)
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.first("med_cents").alias("med_cents"),
            F.first("mad_cents").alias("mad_cents"),
            F.count("*").alias("n"),
            out.cast("bigint").alias("n_outliers"),
        )
        .withColumn("outlier_ppm", F.expr("(1000000 * n_outliers) div n"))
        .orderBy("event_type")
    )


@register(
    "cusum_changepoint_daily",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
    stats AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s
        FROM daily GROUP BY 1),
    cs AS (
        SELECT d.event_type, d.day, s.n,
               CAST(SUM(s.n * d.x - s.s) OVER (
                   PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS cusum
        FROM daily d JOIN stats s USING (event_type)),
    peak AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY abs(cusum) DESC, day) AS rn
        FROM cs)
    SELECT c.event_type, ANY_VALUE(c.n) AS n_days,
           ANY_VALUE(p.day) AS peak_day,
           ANY_VALUE(p.cusum) AS peak_cusum,
           MAX(c.cusum) - MIN(c.cusum) AS cusum_range
    FROM cs c JOIN (SELECT * FROM peak WHERE rn = 1) p USING (event_type)
    GROUP BY c.event_type
    ORDER BY c.event_type
    """,
    description="G8/G12 CUSUM changepoint localization: cumulative sum of "
    "mean-centered daily revenue per event type (centered as n*x - S so "
    "every term is an exact integer); the |cusum| peak day is the "
    "estimated mean-shift point",
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift localization on daily revenue per type.

    The stream is reduced to the (type, day) grain first, so the
    windowed cumulative sum runs over a calendar-bounded series. The
    peak day = argmax |cusum| with a day tiebreak (row_number), the
    classic CUSUM changepoint estimate; cusum_range is the detector's
    test statistic. Integers throughout: dev_t = n*x_t - S.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(_cents()).alias("x"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("x").alias("s")
    )
    wcs = W.partitionBy("event_type").orderBy("day")
    cs = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("cusum", F.sum(F.col("n") * F.col("x") - F.col("s")).over(wcs))
        .select("event_type", "day", "n", "cusum")
    )
    wpk = W.partitionBy("event_type").orderBy(F.abs("cusum").desc(), "day")
    peak = (
        cs.withColumn("rn", F.row_number().over(wpk))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("peak_day"),
            F.col("cusum").alias("peak_cusum"),
        )
    )
    return (
        cs.join(F.broadcast(peak), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n").alias("n_days"),
            F.first("peak_day").alias("peak_day"),
            F.first("peak_cusum").alias("peak_cusum"),
            (F.max("cusum") - F.min("cusum")).alias("cusum_range"),
        )
        .orderBy("event_type")
    )


@register(
    "seasonal_naive_backtest",
    oracle=f"""
    WITH {_GRID_SQL},
    lagged AS (
        SELECT event_type, x,
               LAG(x, 1) OVER (PARTITION BY event_type ORDER BY hour_start)
                   AS lag1,
               LAG(x, 24) OVER (PARTITION BY event_type ORDER BY hour_start)
                   AS lag24
        FROM grid)
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE lag1 IS NOT NULL) AS BIGINT) AS n1,
           CAST(SUM(abs(x - lag1)) AS BIGINT) AS mae1_num,
           CAST(COUNT(*) FILTER (WHERE lag24 IS NOT NULL) AS BIGINT) AS n24,
           CAST(SUM(abs(x - lag24)) AS BIGINT) AS mae24_num,
           (1000 * CAST(SUM(abs(x - lag1)) AS BIGINT))
               // COUNT(*) FILTER (WHERE lag1 IS NOT NULL) AS mae1_milli,
           (1000 * CAST(SUM(abs(x - lag24)) AS BIGINT))
               // COUNT(*) FILTER (WHERE lag24 IS NOT NULL) AS mae24_milli
    FROM lagged
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="G8/G12 seasonal-naive forecast backtest: MAE of the "
    "24h-seasonal persistence forecast vs plain lag-1 persistence on the "
    "dense hourly count series, in exact integer milli-units",
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest: does 'same hour yesterday' beat 'previous hour'?

    Same dense grid as the autocorrelation query; two LAG windows over
    the calendar-bounded series, one aggregate. mae*_milli are
    truncated integer divisions of non-negative quantities (identical
    on both engines).
    """
    grid = _hourly_type_grid(load_table(spark, sf_dir, "events"))
    w = W.partitionBy("event_type").orderBy("hour_start")
    lagged = grid.withColumn("lag1", F.lag("x", 1).over(w)).withColumn(
        "lag24", F.lag("x", 24).over(w)
    )
    agg = lagged.groupBy("event_type").agg(
        F.count(F.col("lag1")).alias("n1"),
        F.sum(F.abs(F.col("x") - F.col("lag1"))).alias("mae1_num"),
        F.count(F.col("lag24")).alias("n24"),
        F.sum(F.abs(F.col("x") - F.col("lag24"))).alias("mae24_num"),
    )
    return agg.select(
        "event_type",
        "n1",
        "mae1_num",
        "n24",
        "mae24_num",
        F.expr("(1000 * mae1_num) div n1").alias("mae1_milli"),
        F.expr("(1000 * mae24_num) div n24").alias("mae24_milli"),
    ).orderBy("event_type")


@register(
    "seasonality_index_monthly",
    oracle="""
    WITH monthly AS (
        SELECT o_orderpriority, month(o_orderdate) AS m,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2),
    with_mean AS (
        SELECT o_orderpriority, m, n, cents,
               (1000 * cents) // n AS mean_milli
        FROM monthly),
    overall AS (
        SELECT o_orderpriority,
               (1000 * CAST(SUM(cents) AS BIGINT)) // CAST(SUM(n) AS BIGINT)
                   AS overall_milli
        FROM monthly GROUP BY 1)
    SELECT w.o_orderpriority, CAST(w.m AS BIGINT) AS month_of_year,
           w.n AS n_orders, w.mean_milli,
           (1000000 * w.mean_milli) // o.overall_milli AS index_ppm
    FROM with_mean w JOIN overall o USING (o_orderpriority)
    ORDER BY o_orderpriority, month_of_year
    """,
    description="G5/G8 month-of-year seasonality index: each priority's "
    "per-calendar-month mean order value relative to its overall mean, "
    "as truncating milli/ppm fixed-point (the classic seasonal index "
    "table, 1e6 = at-trend)",
)
def seasonality_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal index per (priority, calendar month), integer-staged.

    Both means are truncating integer divisions and the index divides
    the two staged integers again — deterministic on both engines (all
    operands non-negative). The heavy table reduces to a 5x12 grid in
    the first aggregate; everything after is broadcast-sized.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority", F.month("o_orderdate").alias("m")
    ).agg(
        F.count("*").alias("n"),
        F.sum(_cents("o_totalprice")).alias("cents"),
    )
    with_mean = monthly.withColumn("mean_milli", F.expr("(1000 * cents) div n"))
    overall = monthly.groupBy("o_orderpriority").agg(
        F.expr("(1000 * sum(cents)) div sum(n)").alias("overall_milli")
    )
    return (
        with_mean.join(F.broadcast(overall), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("m").cast("bigint").alias("month_of_year"),
            F.col("n").alias("n_orders"),
            "mean_milli",
            F.expr("(1000000 * mean_milli) div overall_milli").alias("index_ppm"),
        )
        .orderBy("o_orderpriority", "month_of_year")
    )


@register(
    "max_drawdown_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
    dd AS (
        SELECT event_type, day, x,
               CAST(MAX(x) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS run_max
        FROM daily),
    scored AS (
        SELECT event_type, day, run_max - x AS drawdown
        FROM dd),
    peak AS (
        SELECT event_type, day, drawdown,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY drawdown DESC, day) AS rn
        FROM scored)
    SELECT s.event_type,
           CAST(MAX(s.drawdown) AS BIGINT) AS max_drawdown_cents,
           ANY_VALUE(p.day) AS worst_day,
           CAST(MAX(d.x) AS BIGINT) AS peak_daily_cents
    FROM scored s
    JOIN (SELECT * FROM peak WHERE rn = 1) p USING (event_type)
    JOIN daily d ON d.event_type = s.event_type
    GROUP BY s.event_type
    ORDER BY s.event_type
    """,
    description="G8 maximum drawdown of the daily revenue series per "
    "event type: running-max minus current (exact cents), the worst "
    "peak-to-trough day identified with a (drawdown, day) tiebreak — "
    "the revenue-stability KPI computed the streaming-safe way "
    "(prefix-max window, no self-join)",
)
def max_drawdown_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst peak-to-trough drop of daily revenue, one window pass.

    Drawdown(t) = max(x[0..t]) - x[t] over the calendar-bounded daily
    series; a prefix-max window gives every day's drawdown in one
    sort, argmax is the usual row_number selection. All integers.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(_cents()).alias("x"))
    w_run = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    scored = daily.withColumn(
        "drawdown", F.max("x").over(w_run) - F.col("x")
    )
    w_peak = W.partitionBy("event_type").orderBy(F.desc("drawdown"), "day")
    peak = (
        scored.withColumn("rn", F.row_number().over(w_peak))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("day").alias("worst_day"))
    )
    return (
        scored.join(F.broadcast(peak), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("drawdown").cast("bigint").alias("max_drawdown_cents"),
            F.first("worst_day").alias("worst_day"),
            F.max("x").cast("bigint").alias("peak_daily_cents"),
        )
        .orderBy("event_type")
    )


def _register_theil_sen() -> None:
    from pyspark.sql import functions as F

    from ..plans.registry import register
    from ..sources.catalog import load_table

    @register(
        "theil_sen_revenue_trend",
        oracle="""
        WITH yearly AS (
            SELECT o_orderpriority,
                   CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM orders
            GROUP BY 1, 2),
        slopes AS (
            SELECT a.o_orderpriority,
                   (b.cents - a.cents) * 1000 // (b.yr - a.yr) AS slope_milli
            FROM yearly a JOIN yearly b
              ON a.o_orderpriority = b.o_orderpriority AND a.yr < b.yr)
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(quantile_disc(slope_milli, 0.5) AS BIGINT)
                   AS theil_sen_slope_milli,
               CAST(MIN(slope_milli) AS BIGINT) AS min_slope_milli,
               CAST(MAX(slope_milli) AS BIGINT) AS max_slope_milli
        FROM slopes
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        description="G5 Theil-Sen robust trend: the median of all "
        "pairwise year-over-year revenue slopes per priority — the "
        "outlier-resistant alternative to OLS for trend estimation; "
        "slopes are truncated integer milli-cents/year and the median "
        "is a discrete selection, so the estimate is exact on both "
        "engines",
    )
    def theil_sen_revenue_trend(spark, sf_dir):
        """Median-of-slopes trend, exactly.

        The pairwise join runs on the YEARLY aggregate (|priorities| x
        |years| rows — bounded regardless of order volume), so the
        quadratic pair step is over ~7 points per group, never over
        the fact table. The fact-table work is one hash aggregate.
        """
        orders = load_table(spark, sf_dir, "orders")
        cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
            "bigint"
        )
        yearly = orders.groupBy(
            "o_orderpriority",
            F.year("o_orderdate").cast("bigint").alias("yr"),
        ).agg(F.sum(cents).cast("bigint").alias("cents"))
        a = yearly.select(
            "o_orderpriority",
            F.col("yr").alias("ya"),
            F.col("cents").alias("ca"),
        )
        b = yearly.select(
            F.col("o_orderpriority").alias("pb"),
            F.col("yr").alias("yb"),
            F.col("cents").alias("cb"),
        )
        slopes = a.join(
            b,
            (a.o_orderpriority == b.pb) & (a.ya < b.yb),
        ).select(
            "o_orderpriority",
            F.expr("(cb - ca) * 1000 DIV (yb - ya)").alias("slope_milli"),
        )
        slopes.createOrReplaceTempView("ts_slopes")
        return spark.sql(
            """
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(percentile_disc(0.5)
                        WITHIN GROUP (ORDER BY slope_milli) AS BIGINT)
                       AS theil_sen_slope_milli,
                   CAST(MIN(slope_milli) AS BIGINT) AS min_slope_milli,
                   CAST(MAX(slope_milli) AS BIGINT) AS max_slope_milli
            FROM ts_slopes
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
            """
        )


_register_theil_sen()
