"""Dominance and independence analytics (SURVEY §2.3 G5/G9-adjacent):
the skyline (Pareto-front) operator and a chi-square independence
audit — two query shapes the reference's per-record loop
(consumer.py:117-175) cannot express, both with exact oracles.

Both are written to stay shuffle-minimal at 100 TB:

- the skyline is computed with ONE aggregation + ONE bounded window
  over the per-date relation (O(n log n) work, never the naive O(n^2)
  dominance join — that quadratic form is exactly what the DuckDB
  oracle runs, so the fast plan is verified against the definitional
  one);
- the chi-square contingency table collapses to |priorities| x
  |statuses| cells in a single map-side-combined aggregation, and all
  marginals come from windows over that bounded cell relation — no
  second scan, no join, and the statistic itself is exact integer
  milli-units (truncating div on both engines), so partial-aggregation
  order can never change a digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..sources.catalog import load_table


@register(
    "skyline_orders_price_date",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM orders d
        WHERE d.o_orderdate <= o.o_orderdate
          AND d.o_totalprice >= o.o_totalprice
          AND (d.o_orderdate < o.o_orderdate
               OR d.o_totalprice > o.o_totalprice))
    ORDER BY o_orderdate, o_orderkey
    """,
    description="2-D skyline (minimize orderdate, maximize totalprice) "
    "in O(n log n): per-date max + running max over strictly earlier "
    "dates replaces the quadratic dominance anti-join — which is what "
    "the oracle runs, verifying the fast plan against the definition",
)
def skyline_orders_price_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An order is Pareto-optimal iff no other order has an
    earlier-or-equal date with a higher-or-equal price (strictly better
    in at least one). Sorting by date reduces dominance to a running
    max: an order survives iff it holds its date's max price AND beats
    the max price of every strictly earlier date. The window runs over
    the per-date aggregate (one row per date — bounded, dense), not the
    raw fact table, so the sort is tiny regardless of fact cardinality;
    the only full-data operations are one groupBy(date) and one
    broadcast-joinable date lookup."""
    orders = load_table(spark, sf_dir, "orders")
    dates = orders.groupBy("o_orderdate").agg(
        F.max("o_totalprice").alias("date_max")
    )
    w = (
        Window.orderBy("o_orderdate")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = dates.withColumn("earlier_max", F.max("date_max").over(w)).filter(
        F.col("earlier_max").isNull() | (F.col("date_max") > F.col("earlier_max"))
    )
    return (
        orders.join(
            F.broadcast(frontier.select("o_orderdate", "date_max")), "o_orderdate"
        )
        .filter(F.col("o_totalprice") == F.col("date_max"))
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
    )


_CHI2 = "((o*1000 - (r*c*1000) {div} n) * (o*1000 - (r*c*1000) {div} n)) {div} ((r*c*1000) {div} n)"


@register(
    "chi2_priority_status",
    oracle=f"""
    WITH cells AS (
        SELECT o_orderpriority AS priority, o_orderstatus AS status,
               COUNT(*) AS o
        FROM orders GROUP BY 1, 2),
    win AS (
        SELECT priority, status, o,
               SUM(o) OVER (PARTITION BY priority) AS r,
               SUM(o) OVER (PARTITION BY status) AS c,
               SUM(o) OVER () AS n
        FROM cells)
    SELECT priority, status, CAST(o AS BIGINT) AS observed,
           CAST((r*c*1000) // n AS BIGINT) AS expected_milli,
           CAST({_CHI2.format(div='//')} AS BIGINT) AS chi2_contrib_milli
    FROM win
    ORDER BY priority, status
    """,
    description="chi-square independence audit of priority x status: "
    "contingency cells in one map-side-combined agg, marginals as "
    "windows over the bounded cell relation, contributions in exact "
    "integer milli-units (truncating div both engines)",
)
def chi2_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected counts e = r*c/n and contributions (o-e)^2/e are kept
    in integer milli-units with truncating division — associative and
    engine-independent, so 1 and 1000 executors agree to the digit
    (the pagerank_supplier_cooccurrence determinism recipe). At a key
    domain where r*c*1000 could pass 9.2e18, promote to DECIMAL(38,0);
    the arithmetic stays exact either way. The windows run over the
    |priority| x |status| cell relation — 15 rows here, bounded by the
    attribute domains at any data scale, so the unpartitioned window
    is a non-issue."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count("*").alias("o"))
    win = cells.select(
        "priority",
        "status",
        "o",
        F.sum("o").over(Window.partitionBy("priority")).alias("r"),
        F.sum("o").over(Window.partitionBy("status")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    return win.select(
        "priority",
        "status",
        F.col("o").cast("bigint").alias("observed"),
        F.expr("(r*c*1000) div n").cast("bigint").alias("expected_milli"),
        F.expr(_CHI2.format(div="div")).cast("bigint").alias("chi2_contrib_milli"),
    ).orderBy("priority", "status")


@register(
    "zscore_outlier_events",
    oracle="""
    WITH c AS (
        SELECT event_id, event_type, value,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
        FROM events),
    m AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(x*x) AS BIGINT) AS q
        FROM c GROUP BY event_type)
    SELECT c.event_id, c.event_type, c.value
    FROM c JOIN m USING (event_type)
    WHERE CAST(n*x - s AS HUGEINT) * CAST(n*x - s AS HUGEINT)
          > 9 * (CAST(n AS HUGEINT)*q - CAST(s AS HUGEINT)*s)
    ORDER BY c.event_id
    """,
    description="per-type z-score outlier filter (|z| > 3) decided by "
    "an exact integer inequality — (n*x-s)^2 > 9*(n*q-s^2) in centi "
    "units — so no float mean/stddev ever enters the comparison and "
    "every engine and partitioning agrees on the exact survivor set",
)
def zscore_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-filter primitive for pipeline telemetry: flag events
    whose value sits more than 3 sigma from their type's mean. The
    naive form compares float (x-mean)/stddev — partial-aggregation
    order changes the last ulp and engines disagree at the boundary.
    Multiplying through by n^2 turns |x-mean| > 3*sigma into the pure
    integer inequality (n*x-s)^2 > 9*(n*q-s^2) over centi-unit sums —
    one map-side-combined aggregate per type plus a broadcast join of
    the |event_type|-row moment relation; the products are promoted to
    DECIMAL(38,0) (HUGEINT on the oracle side) so the squares stay
    exact at any n."""
    events = load_table(spark, sf_dir, "events")
    c = events.select(
        "event_id",
        "event_type",
        "value",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("x"),
    )
    m = c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    joined = c.join(F.broadcast(m), "event_type")
    dev = (F.col("n") * F.col("x") - F.col("s")).cast("decimal(38,0)")
    var_n2 = (
        F.col("n").cast("decimal(38,0)") * F.col("q")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    )
    return (
        joined.filter(dev * dev > 9 * var_n2)
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    )


# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — precomputed constants, so
# no runtime log ever enters the compared values.
_BENFORD_PPM = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]


@register(
    "benford_digit_audit_orders",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders),
    c AS (
        SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM cents
        WHERE cents >= 1),
    d AS (SELECT digit, COUNT(*) AS n FROM c GROUP BY digit),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM d)
    SELECT digit, n,
           CAST((n * 1000000) // total AS BIGINT) AS share_ppm,
           CAST(CASE digit {' '.join(f'WHEN {i+1} THEN {v}' for i, v in enumerate(_BENFORD_PPM))}
           END AS BIGINT) AS benford_ppm
    FROM d CROSS JOIN t
    ORDER BY digit
    """,
    description="Benford first-digit audit of order totals: observed "
    "leading-digit shares in exact integer ppm vs the precomputed "
    "Benford expectation — the fraud/synthetic-data smoke test, no "
    "runtime float log anywhere",
)
def benford_digit_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First digits are extracted from exact integer cents rendered as
    strings (bigint-to-string is identical on every engine, unlike
    double formatting), shares are truncating-integer ppm, and the
    Benford expectations are compile-time constants — the whole audit
    is one map-side-combined aggregate over a 9-row result, exact at
    any scale."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    # Filter on the derived cents, not the raw price: a price in
    # (0, 0.005) rounds to 0 cents, whose first "digit" 0 has no
    # Benford expectation (element_at(_, 0) throws under ANSI).
    d = (
        orders.select(cents.alias("cents"))
        .filter(F.col("cents") >= 1)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("bigint")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    t = d.agg(F.sum("n").alias("total"))
    expected = F.element_at(
        F.array(*[F.lit(v) for v in _BENFORD_PPM]), F.col("digit").cast("int")
    ).cast("bigint")
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.expr("(n * 1000000) div total").cast("bigint").alias("share_ppm"),
            expected.alias("benford_ppm"),
        )
        .orderBy("digit")
    )


@register(
    "association_rules_parts",
    oracle="""
    WITH os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM os),
    ic AS (SELECT l_partkey AS item, COUNT(*) AS c FROM os GROUP BY 1),
    pc AS (
        SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
               COUNT(*) AS c_xy
        FROM os a JOIN os b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2)
    SELECT antecedent, consequent, CAST(c_xy AS BIGINT) AS n_baskets_both,
           CAST((c_xy * 1000000) // n_baskets AS BIGINT) AS support_ppm,
           CAST((c_xy * 1000000) // cx.c AS BIGINT) AS confidence_ppm,
           CAST(((c_xy * 1000000) // cx.c) * 1000000
                // ((cy.c * 1000000) // n_baskets) AS BIGINT) AS lift_micro
    FROM pc
    JOIN ic cx ON cx.item = antecedent
    JOIN ic cy ON cy.item = consequent
    CROSS JOIN n
    WHERE c_xy >= 2
    ORDER BY antecedent, consequent
    """,
    description="market-basket association rules over order baskets: "
    "directed part pairs with support/confidence/lift in exact staged "
    "fixed-point (ppm/micro) — the Apriori-style co-purchase miner, "
    "min-support 2, one self-join + two item-count joins",
)
def association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining the declarative way: baskets are
    distinct (order, part) rows; rule support comes from one
    per-basket self-join (bounded by parts-per-order, never
    corpus-quadratic), antecedent/consequent frequencies from one
    item aggregate joined twice (AQE broadcasts the item side), and
    the basket total from a broadcast single-row crossJoin. All three
    metrics are staged truncating-integer ratios — same recipe as
    collocation_pmi_top20 — so every engine and partitioning agrees
    exactly; at N near 1e9 baskets promote the stages to
    DECIMAL(38,0)."""
    li = load_table(spark, sf_dir, "lineitem")
    # The basket relation feeds the total, the item counts, and both
    # self-join sides — four subtree copies of the lineitem distinct
    # without materialization (lazy; measured ~1.6x at sf0.1,
    # calibration-normalized — the box was contended during the A/B).
    # Storage bound (r12 audit): FACT-DISTINCT-SCALED — one row per
    # distinct (order, part), 2 bigints wide; lineage truncated. At
    # cluster scale swap to persist(DISK_ONLY) with lineage intact.
    os_ = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = os_.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    ic = os_.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count("*").alias("c")
    )
    a, b = os_.alias("a"), os_.alias("b")
    pc = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("antecedent"),
            F.col("b.l_partkey").alias("consequent"),
        )
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= 2)
    )
    cx = ic.select(F.col("item").alias("antecedent"), F.col("c").alias("cx"))
    cy = ic.select(F.col("item").alias("consequent"), F.col("c").alias("cy"))
    return (
        pc.join(cx, "antecedent")
        .join(cy, "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("c_xy").cast("bigint").alias("n_baskets_both"),
            F.expr("(c_xy * 1000000) div n_baskets")
            .cast("bigint")
            .alias("support_ppm"),
            F.expr("(c_xy * 1000000) div cx")
            .cast("bigint")
            .alias("confidence_ppm"),
            F.expr(
                "((c_xy * 1000000) div cx) * 1000000"
                " div ((cy * 1000000) div n_baskets)"
            )
            .cast("bigint")
            .alias("lift_micro"),
        )
        .orderBy("antecedent", "consequent")
    )


@register(
    "iqr_outlier_orders",
    oracle="""
    WITH q AS (
        SELECT o_orderstatus,
               quantile_disc(o_totalprice, 0.25) AS p25,
               quantile_disc(o_totalprice, 0.75) AS p75
        FROM orders GROUP BY o_orderstatus)
    SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
    FROM orders o JOIN q USING (o_orderstatus)
    WHERE o.o_totalprice > q.p75 + 0.5 * (q.p75 - q.p25)
    ORDER BY o.o_orderkey
    """,
    description="Tukey-style IQR outlier filter per status: fences "
    "built from DISCRETE quantiles (actual data values, float-exact "
    "cross-engine), one broadcast join of the tiny quantile relation",
)
def iqr_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The robust-statistics cousin of zscore_outlier_events: flag
    orders above p75 + 0.5*IQR of their status group (the classic
    multiplier is 1.5; the fixture's price distribution is short-tailed
    so the fence is tightened to keep the survivor set non-empty at
    every sf — the plan is identical either way). percentile_disc
    returns actual data values, so the fence arithmetic runs on
    identical doubles in both engines and the survivor set is exact —
    the reason this uses discrete quantiles, not interpolated ones.
    One aggregate to a |status|-row relation, broadcast back over the
    fact table; no global sort anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("iqr_orders")
    q = spark.sql(
        """
        SELECT o_orderstatus,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75
        FROM iqr_orders GROUP BY o_orderstatus
        """
    )
    fence = F.col("p75") + 0.5 * (F.col("p75") - F.col("p25"))
    return (
        orders.join(F.broadcast(q), "o_orderstatus")
        .filter(F.col("o_totalprice") > fence)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "cohort_ltv_weekly",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id),
    weekly AS (
        SELECT e.user_id,
               date_trunc('week', e.ts) AS wk,
               SUM(CAST(e.value AS DECIMAL(12,2))) AS v
        FROM events e GROUP BY 1, 2),
    cohort_age AS (
        SELECT f.cohort_week,
               date_diff('day', f.cohort_week, w.wk) // 7 AS age_weeks,
               SUM(w.v) AS weekly_value
        FROM weekly w JOIN first_seen f USING (user_id)
        GROUP BY 1, 2),
    sizes AS (SELECT cohort_week, COUNT(*) AS n_users
              FROM first_seen GROUP BY cohort_week)
    SELECT c.cohort_week, c.age_weeks, s.n_users,
           CAST(SUM(c.weekly_value)
                OVER (PARTITION BY c.cohort_week ORDER BY c.age_weeks
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_value
    FROM cohort_age c JOIN sizes s USING (cohort_week)
    ORDER BY c.cohort_week, c.age_weeks
    """,
    description="cohort LTV curves: users cohorted by first-seen week, "
    "cumulative value by cohort age — exact DECIMAL cumsum over the "
    "bounded (cohort, age) relation, the triangle every growth "
    "dashboard draws",
)
def cohort_ltv_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three bounded shuffles: first-seen per user, weekly value per
    (user, week), then one rollup to the (cohort, age) triangle whose
    size is weeks^2 regardless of event volume — the running total
    window runs over that bounded relation, never the fact table.
    Money stays DECIMAL until the final double cast, so the cumsum is
    partition-order-proof."""
    events = load_table(spark, sf_dir, "events")
    money = F.col("value").cast("decimal(12,2)")
    first_seen = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    weekly = events.groupBy(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).agg(F.sum(money).alias("v"))
    cohort_age = (
        weekly.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("datediff(wk, cohort_week) div 7").alias("age_weeks"),
        )
        .agg(F.sum("v").alias("weekly_value"))
    )
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count("*").alias("n_users")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cohort_age.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "n_users",
            F.sum("weekly_value").over(w).cast("double").alias("cum_value"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


@register(
    "timeseries_comovement_pairs",
    oracle="""
    WITH series AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events
        GROUP BY 1, 2),
    stats AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_pts,
               CAST(SUM(cents) AS BIGINT) AS s
        FROM series GROUP BY user_id),
    dots AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               CAST(SUM(a.cents * b.cents) AS BIGINT) AS dot,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM series a JOIN series b
          ON a.h = b.h AND a.user_id < b.user_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 3)
    SELECT user_a, user_b, n_common,
           dot * 720 - sa.s * sb.s AS comovement
    FROM dots
    JOIN stats sa ON sa.user_id = user_a
    JOIN stats sb ON sb.user_id = user_b
    ORDER BY comovement DESC, user_a, user_b
    LIMIT 20
    """,
    description="time-series similarity search (EDBT'19 shape): "
    "per-user hourly cents series, sparse inner-product self-join on "
    "the hour key, covariance-numerator co-movement score in exact "
    "int64 over the shared 720-hour span, top-20 pairs",
)
def timeseries_comovement_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed time-series similarity without densifying: each
    user's series is its sparse (hour, cents) rows, and the pairwise
    inner product is an equi-join on the hour key — per-hour join
    width is bounded by concurrently active users, never total users,
    which is the scalable sparse formulation (dense vectors would be
    |users| x |hours|). Score = T*dot - s_a*s_b, the covariance
    numerator over the fixture's fixed T=720-hour span treating absent
    hours as zero — pure int64, so ranking is bit-exact cross-engine;
    >= 3 shared active hours guards degenerate pairs. At 100 TB the
    hour key would be salted per-bucket exactly like the interval
    join's buckets."""
    events = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    # series feeds stats + BOTH self-join sides — materialize once
    # (lazy; the relation is (user, hour)-sized, far smaller than
    # events). Near-neutral at sf0.1 (~3.6 -> ~3.4 s warm: the hourly
    # self-join output dominates here), but it removes two extra
    # events-table aggregations, which is what matters when events is
    # the 100 TB fact table.
    series = (
        events.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum(cents).alias("cents"))
        .localCheckpoint(eager=False)
    )
    stats = series.groupBy("user_id").agg(
        F.count("*").alias("n_pts"), F.sum("cents").alias("s")
    )
    a, b = series.alias("a"), series.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("user_a"), F.col("b.user_id").alias("user_b")
        )
        .agg(
            F.sum(F.col("a.cents") * F.col("b.cents")).alias("dot"),
            F.count("*").alias("n_common"),
        )
        .filter(F.col("n_common") >= 3)
    )
    sa, sb = stats.alias("sa"), stats.alias("sb")
    return (
        dots.join(sa, F.col("user_a") == F.col("sa.user_id"))
        .join(sb, F.col("user_b") == F.col("sb.user_id"))
        .select(
            "user_a",
            "user_b",
            "n_common",
            (F.col("dot") * 720 - F.col("sa.s") * F.col("sb.s")).alias(
                "comovement"
            ),
        )
        .orderBy(F.desc("comovement"), "user_a", "user_b")
        .limit(20)
    )


@register(
    "order_total_reconciliation_audit",
    oracle="""
    WITH li AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS line_cents
        FROM lineitem
        GROUP BY l_orderkey),
    j AS (
        SELECT o.o_orderstatus,
               CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS order_cents,
               COALESCE(li.line_cents, 0) AS line_cents
        FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey)
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN order_cents <> line_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatched,
           CAST(SUM(ABS(order_cents - line_cents)) AS BIGINT)
               AS total_abs_diff_cents
    FROM j
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    description="cross-table value reconciliation audit: order header "
    "total vs the sum of its line extended prices, exact cents — "
    "mismatch counts and total drift per status, the data-quality "
    "check run after any pipeline that writes both tables",
)
def order_total_reconciliation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation — the audit every warehouse
    runs between a fact table and its rollup: line items aggregate
    map-side to one row per order, a LEFT join keeps orders with no
    lines (drift of the full header amount), and all comparison is
    exact integer cents so 'mismatch' is a crisp predicate, not a
    float tolerance. One shuffle each side on the order key; output
    bounded by the status domain."""
    t_orders = load_table(spark, sf_dir, "orders")
    t_li = load_table(spark, sf_dir, "lineitem")
    line_cents = (
        t_li.groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast(
                    "bigint"
                )
            ).alias("line_cents")
        )
    )
    order_cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    j = (
        t_orders.select("o_orderkey", "o_orderstatus", order_cents.alias("order_cents"))
        .join(line_cents, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .select(
            "o_orderstatus",
            "order_cents",
            F.coalesce(F.col("line_cents"), F.lit(0)).alias("line_cents"),
        )
    )
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.when(F.col("order_cents") != F.col("line_cents"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_mismatched"),
            F.sum(F.abs(F.col("order_cents") - F.col("line_cents")))
            .cast("bigint")
            .alias("total_abs_diff_cents"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "sequence_gap_audit_user_events",
    oracle="""
    WITH k AS (SELECT DISTINCT user_id, event_id AS id FROM events),
    gaps AS (
        SELECT user_id, id,
               LEAD(id) OVER (PARTITION BY user_id ORDER BY id) AS next_id
        FROM k),
    g AS (
        SELECT user_id,
               CAST(COUNT(CASE WHEN next_id - id > 1 THEN 1 END) AS BIGINT)
                   AS n_gaps,
               CAST(COALESCE(SUM(CASE WHEN next_id - id > 1
                                      THEN next_id - id - 1 END), 0) AS BIGINT)
                   AS missing_ids
        FROM gaps GROUP BY user_id)
    SELECT user_id, n_gaps, missing_ids
    FROM g
    WHERE n_gaps > 0
    ORDER BY user_id
    """,
    description="per-key monotonic-sequence gap audit: missing "
    "event_id ranges within each user's sequence via one LEAD window "
    "partitioned by user — the completeness check for id-sequenced "
    "ingest, window bounded per key",
)
def sequence_gap_audit_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap detection as a single partitioned window pass: within each
    user's distinct id sequence, consecutive ids differing by more
    than 1 delimit a missing range; the per-user gap count and missing
    total make the audit row compact. The window is PARTITIONED by the
    key, so sorts are per-user (bounded), never global — the form that
    scales to id-sequenced ingest partitions at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    k = events.select("user_id", F.col("event_id").alias("id")).distinct()
    w = Window.partitionBy("user_id").orderBy("id")
    gaps = k.select(
        "user_id", "id", F.lead("id").over(w).alias("next_id")
    )
    g = gaps.groupBy("user_id").agg(
        F.count(F.when(F.col("next_id") - F.col("id") > 1, 1))
        .cast("bigint")
        .alias("n_gaps"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("next_id") - F.col("id") > 1,
                    F.col("next_id") - F.col("id") - 1,
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("missing_ids"),
    )
    return g.filter(F.col("n_gaps") > 0).orderBy("user_id")


@register(
    "rfm_segmentation_counts",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_order,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100)
                    AS BIGINT) AS monetary_cents
        FROM orders
        GROUP BY o_custkey),
    scored AS (
        SELECT o_custkey,
               NTILE(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
               NTILE(4) OVER (ORDER BY frequency, o_custkey) AS f_score,
               NTILE(4) OVER (ORDER BY monetary_cents, o_custkey) AS m_score
        FROM rfm)
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           COUNT(*) AS n_customers
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    description="RFM customer segmentation: recency/frequency/monetary "
    "quartiles (NTILE with total tiebreak on the customer key) over "
    "per-customer aggregates, segment population counts — the "
    "marketing-analytics staple",
)
def rfm_segmentation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartiles over the per-customer aggregate relation (one
    fact shuffle, then THREE CHAINED `_distributed_rank` passes — the
    spearman pattern — with the quartile recovered in closed form from
    each rank: at 100 TB the per-customer relation is billions of rows,
    so no unpartitioned ntile window anywhere).
    Determinism: NTILE assigns by row position, so every rank order
    carries the customer key as a total tiebreak — without it, equal
    frequencies would land in either quartile depending on partition
    order and the segment counts would wobble. Monetary is exact
    cents; recency orders by the date itself via its order-isomorphic
    unix_micros image (no now() in compared output)."""
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("monetary_cents"),
    )
    tot = rfm.agg(F.count("*").cast("bigint").alias("n_tot"))
    r = rfm.withColumn("_lo_us", F.unix_micros("last_order"))
    r = _distributed_rank(r, ["_lo_us", "o_custkey"], "rnk_r")
    r = _distributed_rank(r, ["frequency", "o_custkey"], "rnk_f")
    r = _distributed_rank(r, ["monetary_cents", "o_custkey"], "rnk_m")
    scored = r.crossJoin(F.broadcast(tot)).select(
        _ntile_expr(4, "rnk_r").alias("r_score"),
        _ntile_expr(4, "rnk_f").alias("f_score"),
        _ntile_expr(4, "rnk_m").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "decile_lift_purchases",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events
        GROUP BY user_id),
    scored AS (
        SELECT NTILE(10) OVER (ORDER BY cents DESC, user_id) AS decile,
               converted
        FROM per_user),
    d AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted
        FROM scored GROUP BY decile),
    t AS (SELECT CAST(SUM(n_converted) AS BIGINT) AS total_conv FROM d)
    SELECT CAST(decile AS BIGINT) AS decile, n_users, n_converted,
           CAST((n_converted * 1000000) // n_users AS BIGINT)
               AS conv_rate_ppm,
           CAST((SUM(n_converted) OVER (ORDER BY decile
                                        ROWS UNBOUNDED PRECEDING)
                 * 1000000) // t.total_conv AS BIGINT)
               AS cum_capture_ppm
    FROM d CROSS JOIN t
    ORDER BY decile
    """,
    description="decile lift/gains chart: users ranked by total spend "
    "into deciles (total tiebreak), per-decile conversion rate and "
    "cumulative capture of all converters in truncating ppm — the "
    "model-evaluation staple, exact end to end",
)
def decile_lift_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lift chart that evaluates any propensity ranking (here the
    ranking is total spend — swap in a model score column unchanged):
    decile assignment is the distributed rank + closed-form NTILE
    (total tiebreak; the per-user relation is billions of rows at
    100 TB, so no unpartitioned ntile window), per-decile conversion
    is integer ppm, and cumulative capture shows how much of all
    conversion the top-k deciles hold. The only remaining global
    window is the cumulative sum over the 10-row decile relation —
    bounded by construction."""
    from pyspark.sql.window import Window as _Win

    events = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    per_user = events.groupBy("user_id").agg(
        F.sum(cents).alias("cents"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    n_tot = per_user.agg(F.count("*").cast("bigint").alias("n_tot"))
    ranked = _distributed_rank(
        per_user.withColumn("neg_cents", (-F.col("cents")).cast("bigint")),
        ["neg_cents", "user_id"],
        "rnk",
    )
    scored = ranked.crossJoin(F.broadcast(n_tot)).select(
        _ntile_expr(10).alias("decile"), "converted"
    )
    d = scored.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    t = d.agg(F.sum("n_converted").cast("bigint").alias("total_conv"))
    cum = F.sum("n_converted").over(
        _Win.orderBy("decile").rowsBetween(_Win.unboundedPreceding, 0)
    )
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            "n_users",
            "n_converted",
            F.expr("(n_converted * 1000000) div n_users")
            .cast("bigint")
            .alias("conv_rate_ppm"),
            (cum * 1000000).cast("bigint").alias("_cum_scaled"),
            F.col("total_conv"),
        )
        .select(
            "decile",
            "n_users",
            "n_converted",
            "conv_rate_ppm",
            F.expr("_cum_scaled div total_conv")
            .cast("bigint")
            .alias("cum_capture_ppm"),
        )
        .orderBy("decile")
    )


@register(
    "ab_hash_split_outcomes",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS arm,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events
        GROUP BY user_id)
    SELECT arm,
           COUNT(*) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST((SUM(converted) * 1000000) // COUNT(*) AS BIGINT)
               AS conv_ppm,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM per_user
    GROUP BY arm
    ORDER BY arm
    """,
    description="experiment-analysis shape: users deterministically "
    "hash-split into arms via md5 first hex digit (identical on every "
    "engine — the reproducible assignment rule), per-arm conversion "
    "ppm and exact spend totals",
)
def ab_hash_split_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B readout with a REPRODUCIBLE split: arm assignment is a pure
    function of the unit key (md5 hex prefix — the same rule
    stratified sampling uses; never rand(), which is neither
    repeatable nor cross-engine comparable). At 100 TB the assignment
    is a narrow map fused into the scan; everything downstream is one
    per-user aggregate + a 2-row rollup. Swap the digit set to change
    traffic allocation."""
    events = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1)
        .isin(*"01234567"),
        "A",
    ).otherwise("B")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    per_user = events.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
        F.sum(cents).alias("cents"),
    ).select(arm.alias("arm"), "converted", "cents")
    return (
        per_user.groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .select(
            "arm",
            "n_users",
            "n_converted",
            F.expr("(n_converted * 1000000) div n_users")
            .cast("bigint")
            .alias("conv_ppm"),
            "total_cents",
        )
        .orderBy("arm")
    )


@register(
    "median_order_by_customer_decile",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
                   AS cents,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey),
    scored AS (
        SELECT o_custkey,
               NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
        FROM per_cust),
    j AS (
        SELECT s.decile, o.o_totalprice
        FROM orders o JOIN scored s ON s.o_custkey = o.o_custkey)
    SELECT CAST(decile AS BIGINT) AS decile,
           COUNT(*) AS n_orders,
           quantile_disc(o_totalprice, 0.5) AS median_order_price
    FROM j
    GROUP BY decile
    ORDER BY decile
    """,
    description="conditional distribution audit: discrete median ORDER "
    "price within each customer-spend decile — rank units on one "
    "metric, profile another's distribution per band (the 'whales "
    "order bigger?' question), ntile + join-back + percentile_disc",
)
def median_order_by_customer_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-metric conditional profiling: deciles are assigned on
    per-customer TOTAL spend (total tiebreak for determinism), then
    joined back to the raw orders so the per-decile statistic is over
    ORDERS, not customers — the join-back is what distinguishes a
    conditional distribution from a simple grouped aggregate.
    Discrete medians keep the oracle exact. The decile comes from the
    distributed rank + closed-form NTILE (the per-customer relation is
    billions of rows at 100 TB — never an unpartitioned ntile
    window); the join-back shuffles on the customer key."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    n_tot = per_cust.agg(F.count("*").cast("bigint").alias("n_tot"))
    ranked = _distributed_rank(
        per_cust.withColumn("neg_cents", (-F.col("cents")).cast("bigint")),
        ["neg_cents", "o_custkey"],
        "rnk",
    )
    scored = ranked.crossJoin(F.broadcast(n_tot)).select(
        F.col("o_custkey").alias("ck"),
        _ntile_expr(10).alias("decile"),
    )
    j = orders.join(scored, F.col("o_custkey") == F.col("ck")).select(
        "decile", "o_totalprice"
    )
    j.createOrReplaceTempView("decile_orders")
    return spark.sql(
        """
        SELECT CAST(decile AS BIGINT) AS decile,
               COUNT(*) AS n_orders,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                   AS median_order_price
        FROM decile_orders
        GROUP BY decile
        ORDER BY decile
        """
    )


@register(
    "dau_wau_stickiness",
    oracle="""
    WITH au AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
    days AS (SELECT DISTINCT day FROM au),
    contrib AS (
        SELECT au.user_id, au.day + i * INTERVAL 1 DAY AS bucket
        FROM au, unnest(generate_series(0, 6)) AS t(i)),
    wau AS (
        SELECT c.bucket AS day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
        FROM contrib c JOIN days d ON d.day = c.bucket
        GROUP BY 1),
    dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM au GROUP BY 1)
    SELECT d.day, d.dau, w.wau,
           (1000000 * d.dau) // w.wau AS stickiness_ppm
    FROM dau d JOIN wau w USING (day)
    ORDER BY d.day
    """,
    description="G5/G6 DAU/WAU stickiness: daily actives over trailing-"
    "7-day actives per day — the trailing distinct count is computed by "
    "the contribution trick (each active day feeds 7 day-buckets, like "
    "a sliding window), never a per-day 7-day rescan",
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day-AU stickiness ratio per day.

    Exact trailing distinct counts via contribution expansion: the
    (user, active-day) relation — already deduplicated, so bounded by
    users x days, not events — is exploded 7x onto the day-buckets it
    should count toward, then one distinct aggregate per bucket. This
    is the sliding-window-as-union shape that scales (the naive form
    rescans 7 days of raw events per output day). The bucket join
    against observed days is an equi-join; stickiness is truncating
    ppm on positive integers.
    """
    events = load_table(spark, sf_dir, "events")
    au = events.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    days = au.select("day").distinct()
    contrib = au.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
    ).select(
        "user_id", F.expr("day + i * INTERVAL 1 DAY").alias("bucket")
    )
    wau = (
        contrib.join(days, contrib.bucket == days.day)
        .groupBy(F.col("bucket").alias("wday"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = au.groupBy("day").agg(F.count("*").alias("dau"))
    return (
        dau.join(wau, dau.day == wau.wday)
        .select(
            "day",
            "dau",
            "wau",
            F.expr("(1000000 * dau) div wau").alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


@register(
    "user_lifecycle_growth_accounting",
    oracle="""
    WITH au AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
    hist AS (
        SELECT user_id, week,
               MIN(week) OVER (PARTITION BY user_id) AS first_week,
               LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week
        FROM au),
    classified AS (
        SELECT week,
               CASE WHEN week = first_week THEN 'new'
                    WHEN prev_week = week - INTERVAL 7 DAY THEN 'retained'
                    ELSE 'resurrected' END AS stage
        FROM hist),
    stage_counts AS (
        SELECT week,
               CAST(COUNT(*) FILTER (WHERE stage = 'new') AS BIGINT) AS n_new,
               CAST(COUNT(*) FILTER (WHERE stage = 'retained') AS BIGINT)
                   AS n_retained,
               CAST(COUNT(*) FILTER (WHERE stage = 'resurrected') AS BIGINT)
                   AS n_resurrected,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM classified GROUP BY week)
    SELECT week, n_new, n_retained, n_resurrected, n_active,
           COALESCE(LAG(n_active) OVER (ORDER BY week), 0)
               - n_retained AS n_churned
    FROM stage_counts
    ORDER BY week
    """,
    description="G8 growth accounting: every weekly active user classified "
    "new / retained / resurrected from their own activity history "
    "(first-week + lag), churn derived from the previous week's actives "
    "minus this week's retained — the standard DAU/MAU lifecycle ledger, "
    "all-integer",
)
def user_lifecycle_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly new/retained/resurrected/churned ledger.

    The per-user window runs over the deduplicated (user, week)
    relation — bounded by users x weeks, never events. Churn needs no
    user-level anti-join: actives(prev) - retained(cur) is the same
    number, derived from the 1-row-per-week rollup with a single
    ordered LAG. Consecutive-week arithmetic uses the week-start
    timestamp directly (week - 7 days), so no calendar table is needed.
    """
    events = load_table(spark, sf_dir, "events")
    au = events.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    wu = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("week")
    hist = au.withColumn("first_week", F.min("week").over(wu)).withColumn(
        "prev_week", F.lag("week").over(wo)
    )
    stage = (
        F.when(F.col("week") == F.col("first_week"), "new")
        .when(
            F.col("prev_week") == F.col("week") - F.expr("INTERVAL 7 DAY"),
            "retained",
        )
        .otherwise("resurrected")
    )
    counts = (
        hist.withColumn("stage", stage)
        .groupBy("week")
        .agg(
            F.sum(F.when(F.col("stage") == "new", 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(F.col("stage") == "retained", 1).otherwise(0))
            .cast("bigint")
            .alias("n_retained"),
            F.sum(F.when(F.col("stage") == "resurrected", 1).otherwise(0))
            .cast("bigint")
            .alias("n_resurrected"),
            F.count("*").alias("n_active"),
        )
    )
    wk = Window.orderBy("week")
    return counts.select(
        "week",
        "n_new",
        "n_retained",
        "n_resurrected",
        "n_active",
        (
            F.coalesce(F.lag("n_active").over(wk), F.lit(0).cast("bigint"))
            - F.col("n_retained")
        ).alias("n_churned"),
    ).orderBy("week")


@register(
    "power_user_curve_monthly",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, date_trunc('month', ts) AS month,
               date_trunc('day', ts) AS day
        FROM events),
    per_user AS (
        SELECT month, user_id, CAST(COUNT(*) AS BIGINT) AS active_days
        FROM ud GROUP BY 1, 2)
    SELECT month, active_days, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user
    GROUP BY 1, 2
    ORDER BY month, active_days
    """,
    description="G5 power-user curve (L28-style engagement histogram): "
    "users bucketed by distinct active days within each month — the "
    "engagement-depth distribution behind DAU/MAU",
)
def power_user_curve_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-days-per-user histogram per month.

    Two stacked distinct/count aggregates over progressively smaller
    relations (events -> user-days -> user-months -> histogram rows);
    every stage map-side combines. The histogram never exceeds
    |months| x 31 rows.
    """
    events = load_table(spark, sf_dir, "events")
    ud = events.select(
        "user_id",
        F.date_trunc("month", "ts").alias("month"),
        F.date_trunc("day", "ts").alias("day"),
    ).distinct()
    per_user = ud.groupBy("month", "user_id").agg(
        F.count("*").alias("active_days")
    )
    return (
        per_user.groupBy("month", "active_days")
        .agg(F.count("*").alias("n_users"))
        .orderBy("month", "active_days")
    )


@register(
    "cumulative_unique_users_hourly",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(date_trunc('hour', ts)) AS hour
        FROM events GROUP BY 1),
    per_day AS (
        SELECT hour, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM first_seen GROUP BY 1)
    SELECT hour, n_new,
           CAST(SUM(n_new) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_unique_users
    FROM per_day
    ORDER BY hour
    """,
    description="G8 cumulative-unique curve without running COUNT(DISTINCT): "
    "each user counts once at their first-seen hour, so the running total "
    "of first-seen counts IS the exact cumulative distinct-user curve — "
    "one aggregate + one tiny ordered window",
)
def cumulative_unique_users_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cumulative distinct users per hour, the first-seen trick.

    A naive running COUNT(DISTINCT) re-deduplicates an ever-growing
    prefix per day (quadratic state); attributing each user to their
    min-day turns it into one |users| aggregate plus a |days| window.
    This identity is exact, not approximate — the go-to rewrite at
    100 TB.
    """
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.min(F.date_trunc("hour", "ts")).alias("hour")
    )
    per_day = first_seen.groupBy("hour").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "hour",
        "n_new",
        F.sum("n_new").over(w).cast("bigint").alias("cum_unique_users"),
    ).orderBy("hour")


@register(
    "pareto_cutpoint_customers",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1),
    ranked AS (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rn,
               SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                                ROWS UNBOUNDED PRECEDING) AS cum_cents,
               SUM(cents) OVER () AS total_cents,
               COUNT(*) OVER () AS n_cust
        FROM rev)
    SELECT CAST(MIN(rn) AS BIGINT) AS k_customers,
           CAST(ANY_VALUE(n_cust) AS BIGINT) AS n_customers,
           (1000000 * CAST(MIN(rn) AS BIGINT)) // ANY_VALUE(n_cust)
               AS k_share_ppm,
           CAST(ANY_VALUE(total_cents) AS BIGINT) AS total_cents
    FROM ranked
    WHERE 5 * cum_cents >= 4 * total_cents
    """,
    description="G8/G9 Pareto cutpoint: the minimal number of top "
    "customers covering 80% of revenue — ranked exact-cents cumulative "
    "sum against the 5*cum >= 4*total integer inequality (no float "
    "threshold), reported with the customer-share in ppm",
)
def pareto_cutpoint_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is revenue, answered as a single exact row.

    The per-customer revenue relation is |customers|-sized — billions
    of rows at 100 TB, so the rank + running sum come from the
    two-pass distributed prefix (`_distributed_prefix`: range buckets
    on -cents, per-bucket cumulative windows, broadcast bucket
    offsets), never a single-partition window; the global totals are
    one aggregate broadcast back. Ordering by (-cents, o_custkey)
    reproduces the original (cents DESC, o_custkey) order exactly.
    The 80% threshold is the cross-multiplied integer inequality, so
    the cutpoint is identical on every engine and partitioning.
    """
    from ..functions.numeric import money

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(money("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    ranked = _distributed_prefix(
        rev.withColumn("neg_cents", (-F.col("cents")).cast("bigint")),
        ["neg_cents", "o_custkey"],
        {"cum_cents": "cents"},
        rank_name="rn",
    )
    tot = rev.agg(
        F.sum("cents").alias("total_cents"),
        F.count("*").alias("n_cust"),
    )
    hit = ranked.crossJoin(F.broadcast(tot)).filter(
        5 * F.col("cum_cents") >= 4 * F.col("total_cents")
    )
    return hit.agg(
        F.min("rn").cast("bigint").alias("k_customers"),
        F.first("n_cust").cast("bigint").alias("n_customers"),
        F.expr("(1000000 * min(rn)) div first(n_cust)").alias("k_share_ppm"),
        F.first("total_cents").cast("bigint").alias("total_cents"),
    )


@register(
    "leave_one_out_peer_outliers",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders),
    g AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s
        FROM o GROUP BY 1)
    SELECT o.o_orderpriority,
           ANY_VALUE(g.n) AS n_orders,
           CAST(COUNT(*) FILTER (
               WHERE o.cents * (g.n - 1) > 2 * (g.s - o.cents)) AS BIGINT)
               AS n_above_2x_peer_avg,
           (1000000 * CAST(COUNT(*) FILTER (
               WHERE o.cents * (g.n - 1) > 2 * (g.s - o.cents)) AS BIGINT))
               // ANY_VALUE(g.n) AS outlier_ppm
    FROM o JOIN g USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    description="G5 leave-one-out peer comparison: orders priced at more "
    "than 2x the average of their OWN group excluding themselves — the "
    "self-exclusion that a plain group average gets wrong for small "
    "groups, as the integer cross-inequality cents*(n-1) > 2*(S-cents)",
)
def leave_one_out_peer_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOO peer-average outlier counts, division-free.

    x > 2 * (S - x)/(n - 1) cross-multiplies to x*(n-1) > 2*(S-x): no
    rational, no window EXCLUDE CURRENT ROW (which Spark lacks) — the
    per-group (n, S) relation is 5 rows, broadcast back onto the scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    from ..functions.numeric import money

    o = orders.select(
        "o_orderpriority",
        (money("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    g = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    flagged = o.join(F.broadcast(g), "o_orderpriority").withColumn(
        "is_out",
        F.col("cents") * (F.col("n") - 1) > 2 * (F.col("s") - F.col("cents")),
    )
    return (
        flagged.groupBy("o_orderpriority")
        .agg(
            F.first("n").alias("n_orders"),
            F.sum(F.when(F.col("is_out"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_above_2x_peer_avg"),
        )
        .withColumn(
            "outlier_ppm", F.expr("(1000000 * n_above_2x_peer_avg) div n_orders")
        )
        .orderBy("o_orderpriority")
    )


@register(
    "price_depth_ladder",
    oracle="""
    WITH b AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   // 3000000 AS lvl,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1)
    SELECT lvl * 3000000 AS level_cents, n AS n_at_level,
           CAST(SUM(n) OVER (ORDER BY lvl DESC ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS n_at_or_above,
           CAST(SUM(cents) OVER (ORDER BY lvl DESC ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cents_at_or_above
    FROM b
    ORDER BY level_cents
    """,
    description="G8 depth-ladder readout: per $30k price level, how many "
    "orders (and how much exact-cents value) sit at or above it — the "
    "order-book depth chart built as one histogram aggregate plus a "
    "REVERSE cumulative window, never a per-level rescan",
)
def price_depth_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative >=-level depth from a single histogram pass.

    The naive form runs one COUNT(WHERE price >= L) per level (L scans);
    bucketing once and reverse-cumsumming the |levels|-sized histogram
    gives every level simultaneously. The window is descending-ordered
    ROWS-cumulative over ~20 rows.
    """
    from ..functions.numeric import money

    orders = load_table(spark, sf_dir, "orders")
    cents = (money("o_totalprice") * 100).cast("bigint")
    b = orders.groupBy(F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) div 3000000").alias("lvl")).agg(
        F.count("*").alias("n"), F.sum(cents).alias("cents")
    )
    w = Window.orderBy(F.desc("lvl")).rowsBetween(Window.unboundedPreceding, 0)
    return b.select(
        (F.col("lvl") * 3000000).alias("level_cents"),
        F.col("n").alias("n_at_level"),
        F.sum("n").over(w).cast("bigint").alias("n_at_or_above"),
        F.sum("cents").over(w).cast("bigint").alias("cents_at_or_above"),
    ).orderBy("level_cents")


@register(
    "linear_attribution_clicks",
    oracle="""
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
    c AS (
        SELECT event_id AS cid, user_id, ts AS cts
        FROM events WHERE event_type = 'click'),
    pc AS (
        SELECT p.pid, p.cents, c.cid, c.cts,
               CAST(COUNT(*) OVER (PARTITION BY p.pid) AS BIGINT) AS n_clicks,
               ROW_NUMBER() OVER (PARTITION BY p.pid
                                  ORDER BY c.cts DESC, c.cid DESC) AS rn
        FROM p JOIN c
          ON c.user_id = p.user_id
         AND c.cts <= p.pts AND c.cts >= p.pts - INTERVAL 2 HOUR),
    credited AS (
        SELECT cid, cts,
               (cents * 1000000) // n_clicks
                   + CASE WHEN rn = 1
                          THEN (cents * 1000000) % n_clicks ELSE 0 END
                   AS credit_micro_cents
        FROM pc)
    SELECT CAST(hour(cts) AS BIGINT) AS click_hour,
           CAST(COUNT(*) AS BIGINT) AS n_credited_clicks,
           CAST(SUM(credit_micro_cents) AS BIGINT) AS credit_micro_cents
    FROM credited
    GROUP BY 1
    ORDER BY click_hour
    """,
    description="G4/G8 linear marketing attribution: each purchase's "
    "exact-cents value split equally (integer micro-cents, remainder to "
    "the most-recent click so total credit is conserved to the unit) "
    "across the user's clicks in the prior 2 hours, rolled up by click "
    "hour-of-day",
)
def linear_attribution_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-split attribution with exact credit conservation.

    The purchase-click pairing is a user-keyed join with a time-band
    predicate (user equi-key bounds the fanout; at scale the band
    bucketization from `value_band_self_join_suppliers` applies the
    same way on time). Credit math is integer micro-cents with the
    division remainder assigned to the rank-1 (most recent) click, so
    SUM(credit) == SUM(purchase value) exactly — auditable end to end.
    """
    from ..functions.numeric import money

    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        (money("value") * 100).cast("bigint").alias("cents"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    pc = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 2 HOUR")),
    )
    wn = Window.partitionBy("pid")
    wr = Window.partitionBy("pid").orderBy(F.desc("cts"), F.desc("cid"))
    credited = (
        pc.withColumn("n_clicks", F.count("*").over(wn))
        .withColumn("rn", F.row_number().over(wr))
        .select(
            "cid",
            "cts",
            (
                F.expr("(cents * 1000000) div n_clicks")
                + F.when(
                    F.col("rn") == 1, F.expr("(cents * 1000000) % n_clicks")
                ).otherwise(0)
            ).alias("credit_micro_cents"),
        )
    )
    return (
        credited.groupBy(F.hour("cts").cast("bigint").alias("click_hour"))
        .agg(
            F.count("*").alias("n_credited_clicks"),
            F.sum("credit_micro_cents").cast("bigint").alias("credit_micro_cents"),
        )
        .orderBy("click_hour")
    )


@register(
    "duplicate_charge_audit",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type, ts,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events),
    lagged AS (
        SELECT event_type,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id, cents, event_type
                   ORDER BY ts, event_id)) AS gap_us
        FROM e)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE gap_us <= 300000000) AS BIGINT)
               AS n_suspect_dups,
           (1000000 * CAST(COUNT(*) FILTER (WHERE gap_us <= 300000000)
                           AS BIGINT)) // COUNT(*) AS suspect_ppm
    FROM lagged
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="G8 duplicate-charge / double-fire audit: events repeating "
    "the SAME user + amount + type within 5 minutes, found with one "
    "window lag over the (user, cents, type) partition — the "
    "idempotency-failure screen an at-least-once pipeline (the "
    "reference's TRIM_HORIZON replay, consumer.py:76) makes necessary",
)
def duplicate_charge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-key repeat events within a 5-minute idempotency window.

    Partitioning the window by (user, amount, type) makes 'suspiciously
    identical' a single LAG comparison instead of a self-join; gap
    arithmetic is integer microseconds. The partition key is
    high-cardinality (user x cents), so the window sort distributes
    evenly — no skew hotspot at scale.
    """
    from ..functions.numeric import money

    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        (money("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id", "cents", "event_type").orderBy(
        "ts", "event_id"
    )
    lagged = e.withColumn(
        "gap_us", F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    )
    sus = F.sum(
        F.when(F.col("gap_us") <= 300_000_000, 1).otherwise(0)
    ).cast("bigint")
    return (
        lagged.groupBy("event_type")
        .agg(F.count("*").alias("n_events"), sus.alias("n_suspect_dups"))
        .withColumn(
            "suspect_ppm", F.expr("(1000000 * n_suspect_dups) div n_events")
        )
        .orderBy("event_type")
    )


@register(
    "attribution_model_compare",
    oracle="""
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
    c AS (
        SELECT event_id AS cid, user_id, ts AS cts
        FROM events WHERE event_type = 'click'),
    pc AS (
        SELECT p.pid, p.cents, c.cid, c.cts,
               ROW_NUMBER() OVER (PARTITION BY p.pid
                                  ORDER BY c.cts, c.cid) AS rn_first,
               ROW_NUMBER() OVER (PARTITION BY p.pid
                                  ORDER BY c.cts DESC, c.cid DESC) AS rn_last
        FROM p JOIN c
          ON c.user_id = p.user_id
         AND c.cts <= p.pts AND c.cts >= p.pts - INTERVAL 2 HOUR),
    credited AS (
        SELECT 'first_touch' AS model, cts, cents FROM pc WHERE rn_first = 1
        UNION ALL
        SELECT 'last_touch' AS model, cts, cents FROM pc WHERE rn_last = 1)
    SELECT model, CAST(hour(cts) AS BIGINT) AS click_hour,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(cents) AS BIGINT) AS credited_cents
    FROM credited
    GROUP BY 1, 2
    ORDER BY model, click_hour
    """,
    description="G4/G8 attribution model comparison: the SAME "
    "purchase-click pairing credited under first-touch vs last-touch "
    "(both as rank-1 selections over one join result), rolled up by "
    "click hour — shows how much the model choice moves credit, exact "
    "cents conserved per model",
)
def attribution_model_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch credit from ONE pairing relation.

    Both models are row_number selections over the same user-keyed
    time-band join (built once); credit per model sums to total
    attributed purchase value exactly. The complement of
    `linear_attribution_clicks` — together the three standard models,
    all on one join shape.
    """
    from ..functions.numeric import money

    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        (money("value") * 100).cast("bigint").alias("cents"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    pc = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 2 HOUR")),
    )
    w_first = Window.partitionBy("pid").orderBy("cts", "cid")
    w_last = Window.partitionBy("pid").orderBy(F.desc("cts"), F.desc("cid"))
    ranked = pc.withColumn("rn_first", F.row_number().over(w_first)).withColumn(
        "rn_last", F.row_number().over(w_last)
    )
    first = ranked.filter(F.col("rn_first") == 1).select(
        F.lit("first_touch").alias("model"), "cts", "cents"
    )
    last = ranked.filter(F.col("rn_last") == 1).select(
        F.lit("last_touch").alias("model"), "cts", "cents"
    )
    return (
        first.unionByName(last)
        .groupBy("model", F.hour("cts").cast("bigint").alias("click_hour"))
        .agg(
            F.count("*").alias("n_conversions"),
            F.sum("cents").cast("bigint").alias("credited_cents"),
        )
        .orderBy("model", "click_hour")
    )


@register(
    "spend_tier_transition_matrix",
    oracle="""
    WITH weekly AS (
        SELECT user_id, date_trunc('week', ts) AS week,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2),
    tiers AS (
        SELECT user_id, week,
               CAST(CASE WHEN cents < 100000 THEN 0
                         WHEN cents < 300000 THEN 1
                         WHEN cents < 600000 THEN 2
                         ELSE 3 END AS BIGINT) AS tier
        FROM weekly),
    paired AS (
        SELECT tier AS tier_to,
               LAG(tier) OVER (PARTITION BY user_id ORDER BY week)
                   AS tier_from,
               week,
               LAG(week) OVER (PARTITION BY user_id ORDER BY week)
                   AS prev_week
        FROM tiers)
    SELECT tier_from, tier_to, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paired
    WHERE prev_week = week - INTERVAL 7 DAY
    GROUP BY 1, 2
    ORDER BY tier_from, tier_to
    """,
    description="G8 customer-state Markov matrix: weekly spend tiers "
    "(fixed exact-cents bands) paired week-over-week per user via LAG, "
    "consecutive weeks only — the segment-migration matrix behind "
    "upgrade/downgrade dashboards",
)
def spend_tier_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week spend-tier transitions per user.

    The raw stream reduces to |users| x |weeks| first; tiering is a
    pure projection on exact cents; the pairing is one user-keyed LAG
    with the consecutive-week guard (week arithmetic on the truncated
    week start — no calendar table). Output is a bounded tiers^2
    matrix.
    """
    from ..functions.numeric import money

    events = load_table(spark, sf_dir, "events")
    weekly = events.groupBy(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).agg(F.sum((money("value") * 100).cast("bigint")).alias("cents"))
    tier = (
        F.when(F.col("cents") < 100000, 0)
        .when(F.col("cents") < 300000, 1)
        .when(F.col("cents") < 600000, 2)
        .otherwise(3)
        .cast("bigint")
    )
    tiers = weekly.select("user_id", "week", tier.alias("tier"))
    w = Window.partitionBy("user_id").orderBy("week")
    paired = tiers.select(
        F.col("tier").alias("tier_to"),
        F.lag("tier").over(w).alias("tier_from"),
        "week",
        F.lag("week").over(w).alias("prev_week"),
    )
    return (
        paired.filter(
            F.col("prev_week") == F.col("week") - F.expr("INTERVAL 7 DAY")
        )
        .groupBy("tier_from", "tier_to")
        .agg(F.count("*").alias("n_users"))
        .orderBy("tier_from", "tier_to")
    )


@register(
    "session_event_affinity",
    oracle="""
    WITH marks AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
        SELECT user_id, event_type,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marks),
    st AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
    n_sessions AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS ns
        FROM (SELECT DISTINCT user_id, sid FROM st)),
    singles AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n1
        FROM st GROUP BY 1),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM st a JOIN st b
          ON a.user_id = b.user_id AND a.sid = b.sid
         AND a.event_type < b.event_type
        GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, p.n_ab,
           sa.n1 AS n_a, sb.n1 AS n_b,
           (SELECT ns FROM n_sessions) AS n_sessions,
           (1000000 * p.n_ab * (SELECT ns FROM n_sessions))
               // (sa.n1 * sb.n1) AS lift_ppm
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    ORDER BY type_a, type_b
    """,
    description="G8/G17 session-level basket affinity: event-type pairs "
    "co-occurring within the same 30-min-gap session, with lift vs "
    "independence in truncated ppm — market-basket analysis where the "
    "basket is the behavioral session, not the order",
)
def session_event_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types travel together within a session.

    Sessionization is the gap-islands window (same > 30 min convention
    as the session_window family, pinned by the boundary property
    test); the pair join runs on the DEDUPED (user, session, type)
    relation — bounded at 5 types per session, so pair fanout is <= 10
    rows per session regardless of event volume. Lift is integer
    cross-multiplied (n_ab * N vs n_a * n_b).
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts") - F.lag("ts").over(w)
                > F.expr("INTERVAL 30 MINUTE")
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = marks.withColumn("sid", F.sum("new_s").over(wc))
    st = sess.select("user_id", "sid", "event_type").distinct()
    n_sessions = st.select("user_id", "sid").distinct().count()
    singles = st.groupBy("event_type").agg(F.count("*").alias("n1"))
    a, b = st.alias("a"), st.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.sid") == F.col("b.sid"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_ab"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n1").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n1").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            F.lit(n_sessions).cast("bigint").alias("n_sessions"),
            F.expr(f"(1000000 * n_ab * {n_sessions}) div (n_a * n_b)").alias(
                "lift_ppm"
            ),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "attribution_window_sensitivity",
    oracle="""
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts
        FROM events WHERE event_type = 'purchase'),
    c AS (
        SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'),
    windows AS (SELECT unnest([30, 60, 120]) AS w_minutes),
    attributed AS (
        SELECT w.w_minutes, p.pid
        FROM p CROSS JOIN windows w
        WHERE EXISTS (
            SELECT 1 FROM c
            WHERE c.user_id = p.user_id
              AND c.cts <= p.pts
              AND c.cts >= p.pts - to_minutes(CAST(w.w_minutes AS BIGINT)))),
    totals AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases FROM p)
    SELECT CAST(w.w_minutes AS BIGINT) AS w_minutes,
           CAST(COUNT(a.pid) AS BIGINT) AS n_attributed,
           (SELECT n_purchases FROM totals) AS n_purchases,
           (1000000 * CAST(COUNT(a.pid) AS BIGINT))
               // (SELECT n_purchases FROM totals) AS attributed_ppm
    FROM windows w LEFT JOIN attributed a ON a.w_minutes = w.w_minutes
    GROUP BY w.w_minutes
    ORDER BY w_minutes
    """,
    description="G4/G8 attribution-window sensitivity sweep: the share "
    "of purchases with >= 1 prior click inside a 30/60/120-minute "
    "lookback, all three windows answered from ONE pass (per-purchase "
    "nearest-click staleness compared against the exploded window dim) "
    "— the robustness analysis behind choosing a lookback",
)
def attribution_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookback-window sweep from one staleness computation.

    The engine computes each purchase's nearest-click staleness ONCE
    (the union+running-max as-of plan — single shuffle), then every
    window size is a pure comparison against the broadcast 3-row
    window dim: sweeping parameters costs projections, not rescans.
    The oracle's EXISTS-per-window form is the semantic spec; both
    reduce to the same counts.
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.lit(0).alias("kind"), F.col("event_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), F.lit(1).alias("kind"), F.col("event_id")
    )
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click_ts = F.max(F.when(F.col("kind") == 0, F.col("ts"))).over(w)
    staleness = (
        unioned.withColumn("lc_ts", last_click_ts)
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("pid"),
            (F.unix_micros("ts") - F.unix_micros("lc_ts")).alias("stale_us"),
        )
    )
    n_purchases = staleness.count()
    windows = spark.createDataFrame([(30,), (60,), (120,)], "w_minutes bigint")
    return (
        staleness.crossJoin(F.broadcast(windows))
        .groupBy("w_minutes")
        .agg(
            F.sum(
                F.when(
                    F.col("stale_us") <= F.col("w_minutes") * 60_000_000, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_attributed")
        )
        .select(
            "w_minutes",
            "n_attributed",
            F.lit(n_purchases).cast("bigint").alias("n_purchases"),
            F.expr(f"(1000000 * n_attributed) div {n_purchases}").alias(
                "attributed_ppm"
            ),
        )
        .orderBy("w_minutes")
    )


@register(
    "weekly_mix_drift",
    oracle="""
    WITH wk AS (
        SELECT date_trunc('week', ts) AS week, event_type,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
    wk_tot AS (SELECT week, CAST(SUM(c) AS BIGINT) AS nw FROM wk GROUP BY 1),
    overall AS (
        SELECT event_type, CAST(SUM(c) AS BIGINT) AS a FROM wk GROUP BY 1),
    n_all AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM wk),
    grid AS (
        SELECT wt.week, o.event_type, wt.nw, o.a, n_all.n,
               COALESCE(w.c, 0) AS c
        FROM wk_tot wt CROSS JOIN overall o CROSS JOIN n_all
        LEFT JOIN wk w ON w.week = wt.week AND w.event_type = o.event_type)
    SELECT week, ANY_VALUE(nw) AS n_events,
           CAST(SUM(abs(c * n - a * nw)) AS BIGINT) AS tv_num,
           (1000000 * CAST(SUM(abs(c * n - a * nw)) AS BIGINT))
               // (2 * ANY_VALUE(nw) * ANY_VALUE(n)) AS tv_ppm
    FROM grid
    GROUP BY week
    ORDER BY week
    """,
    description="G5 temporal mix-drift monitor: per week, the total-"
    "variation distance between that week's event-type mix and the "
    "overall mix, exact cross-multiplied integers — the alert metric a "
    "pipeline owner tracks for upstream behavior changes",
)
def weekly_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TV(week mix, overall mix) per week, the drift alarm series.

    Same integer TV construction as `length_dist_drift_by_source`,
    applied along time: all math runs on the |weeks| x |types|
    histogram; zero-filled grid so a type disappearing entirely still
    contributes its missing mass.
    """
    events = load_table(spark, sf_dir, "events")
    wk = events.groupBy(
        F.date_trunc("week", "ts").alias("week"), "event_type"
    ).agg(F.count("*").alias("c"))
    wk_tot = wk.groupBy("week").agg(F.sum("c").alias("nw"))
    overall = wk.groupBy("event_type").agg(F.sum("c").alias("a"))
    n_all = wk.agg(F.sum("c").alias("n"))
    grid = (
        wk_tot.crossJoin(F.broadcast(overall))
        .crossJoin(F.broadcast(n_all))
        .join(wk, ["week", "event_type"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
    )
    return (
        grid.groupBy("week")
        .agg(
            F.first("nw").alias("n_events"),
            F.sum(F.abs(F.col("c") * F.col("n") - F.col("a") * F.col("nw")))
            .cast("bigint")
            .alias("tv_num"),
            F.first("n").alias("_n"),
        )
        .select(
            "week",
            "n_events",
            "tv_num",
            F.expr("(1000000 * tv_num) div (2 * n_events * _n)").alias("tv_ppm"),
        )
        .orderBy("week")
    )


@register(
    "language_purity_by_source",
    oracle="""
    WITH counts AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2),
    ranked AS (
        SELECT source, lang, c,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY c DESC, lang) AS rn,
               CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n_docs
        FROM counts)
    SELECT source, lang AS dominant_lang, n_docs, c AS n_dominant,
           (1000000 * c) // n_docs AS purity_ppm
    FROM ranked WHERE rn = 1
    ORDER BY source
    """,
    description="G5/G17 corpus governance: each source's dominant "
    "language and its share (argmax by count with lang tiebreak) — low "
    "purity flags mixed or mislabeled feeds before they pollute "
    "per-language training mixes",
)
def language_purity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-language share per source.

    One histogram aggregate + a per-source argmax window over the tiny
    (source, lang) relation. Purity is truncating ppm.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count("*").alias("c"))
    wr = Window.partitionBy("source").orderBy(F.desc("c"), "lang")
    wt = Window.partitionBy("source")
    ranked = counts.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n_docs", F.sum("c").over(wt).cast("bigint")
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "source",
            F.col("lang").alias("dominant_lang"),
            "n_docs",
            F.col("c").alias("n_dominant"),
            F.expr("(1000000 * c) div n_docs").alias("purity_ppm"),
        )
        .orderBy("source")
    )


@register(
    "early_value_retention_curve",
    oracle="""
    WITH fw AS (SELECT MIN(date_trunc('week', ts)) AS w0 FROM events),
    user_first AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN date_trunc('week', ts) = (SELECT w0 FROM fw)
                        THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS w0_cents,
               CAST(COUNT(DISTINCT date_trunc('week', ts)) AS BIGINT)
                   AS weeks_active
        FROM events GROUP BY user_id),
    cohort AS (SELECT * FROM user_first WHERE w0_cents > 0),
    ranked AS (
        SELECT *, NTILE(5) OVER (ORDER BY w0_cents, user_id) AS quintile
        FROM cohort)
    SELECT CAST(quintile AS BIGINT) AS quintile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(weeks_active) AS BIGINT) AS sum_weeks,
           (1000 * CAST(SUM(weeks_active) AS BIGINT)) // COUNT(*)
               AS mean_weeks_milli
    FROM ranked
    GROUP BY quintile
    ORDER BY quintile
    """,
    description="G8 early-value -> retention curve: users active in the "
    "first calendar week, bucketed into first-week-spend quintiles "
    "(NTILE with total tiebreak), against their eventual distinct-weeks-"
    "active — does week-1 spend predict staying?",
)
def early_value_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-1 spend quintile vs lifetime weeks active.

    The per-user rollup happens once (first-week cents + distinct
    active weeks in the same aggregate). The quintile does NOT come
    from an ntile window over the |cohort| relation (billions of users
    at 100 TB in one partition): NTILE(k) is a pure function of
    (global rank, total count) — q = n div 5, rem = n mod 5, the first
    rem buckets take q+1 rows — so the rank comes from
    `_distributed_rank` on the (w0_cents, user_id) total order and the
    bucket is recovered in closed-form integer arithmetic, the pattern
    proven by equi_depth_deciles_distributed. Mean weeks in
    truncating milli.
    """
    from ..functions.numeric import money

    events = load_table(spark, sf_dir, "events")
    w0 = (
        events.agg(F.min(F.date_trunc("week", "ts")).alias("w0"))
        .collect()[0]
        .w0
    )
    user_first = events.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.date_trunc("week", "ts") == F.lit(w0),
                (money("value") * 100).cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("w0_cents"),
        F.countDistinct(F.date_trunc("week", "ts")).alias("weeks_active"),
    )
    cohort = user_first.filter(F.col("w0_cents") > 0)
    tot = cohort.agg(F.count("*").cast("bigint").alias("n_tot"))
    ranked = _distributed_rank(cohort, ["w0_cents", "user_id"], "rnk")
    banded = ranked.crossJoin(F.broadcast(tot)).select(
        _ntile_expr(5).alias("quintile"), "weeks_active"
    )
    return (
        banded.groupBy("quintile")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("weeks_active").cast("bigint").alias("sum_weeks"),
        )
        .withColumn(
            "mean_weeks_milli", F.expr("(1000 * sum_weeks) div n_users")
        )
        .orderBy("quintile")
    )


@register(
    "calendar_iso_week_pin",
    oracle="""
    WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS dt, o_totalprice
        FROM orders),
    k AS (
        SELECT dt,
               CAST(date_trunc('week', dt) AS DATE) AS wk_start,
               CAST(EXTRACT(year FROM CAST(date_trunc('week', dt) AS DATE)
                            + INTERVAL 3 DAY) AS INT) AS iso_year,
               CAST(weekofyear(dt) AS INT) AS iso_week,
               CAST(isodow(dt) - 1 AS INT) AS wd,
               last_day(dt) AS month_end,
               o_totalprice
        FROM d)
    SELECT iso_year, iso_week,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(wk_start) AS TIMESTAMP) AS wk_start,
           CAST(COUNT(DISTINCT wd) AS BIGINT) AS n_weekdays,
           CAST(MIN(wd) AS INT) AS first_wd,
           CAST(MAX(month_end) AS TIMESTAMP) AS month_end_max,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM k
    GROUP BY iso_year, iso_week
    ORDER BY iso_year, iso_week
    """,
    description="G11 calendar-convention pin: ISO week numbering, "
    "Monday-start date_trunc('week'), ISO year via the Thursday rule, "
    "Monday=0 weekday, and last_day must all agree between Spark and "
    "DuckDB — grouped over every (iso_year, iso_week) in orders, "
    "including the year-boundary weeks where ISO year != calendar year",
)
def calendar_iso_week_pin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine calendar semantics, pinned over real data.

    Every derived field is computed with the engine's native calendar
    functions (weekofyear/date_trunc/weekday/last_day), not re-derived
    arithmetic — the whole point is to pin that both engines implement
    the same ISO-8601 conventions, especially the Thursday-rule ISO
    year at December/January boundaries. One scan, one hash agg on a
    (years x 53)-bounded key space.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.col("o_orderdate").cast("date").alias("dt"), "o_totalprice"
    )
    wk_start = F.date_trunc("week", F.col("dt")).cast("date")
    k = d.select(
        wk_start.alias("wk_start"),
        F.year(F.date_add(wk_start, 3)).cast("int").alias("iso_year"),
        F.weekofyear("dt").cast("int").alias("iso_week"),
        F.weekday("dt").cast("int").alias("wd"),
        F.last_day("dt").alias("month_end"),
        "o_totalprice",
    )
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    return (
        k.groupBy("iso_year", "iso_week")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("wk_start").cast("timestamp").alias("wk_start"),
            F.countDistinct("wd").alias("n_weekdays"),
            F.min("wd").cast("int").alias("first_wd"),
            F.max("month_end").cast("timestamp").alias("month_end_max"),
            F.sum(cents).cast("bigint").alias("cents"),
        )
        .orderBy("iso_year", "iso_week")
    )


_EQUI_DEPTH_ORACLE = """
    WITH ranked AS (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                   AS bucket
        FROM orders)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS lo_cents,
           CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS hi_cents,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM ranked
    GROUP BY bucket
    ORDER BY bucket
    """


@register(
    "equi_depth_deciles_price",
    oracle=_EQUI_DEPTH_ORACLE,
    description="G8 equi-depth decile histogram of order prices via "
    "ntile(10) over a total order (price, orderkey): per-bucket row "
    "count, exact cent boundaries, and bucket mass — both engines "
    "distribute the n mod 10 remainder rows to the first buckets, so "
    "the split is identical. AUDIT TWIN (single global sort): the "
    "scale-safe production form is equi_depth_deciles_distributed "
    "(identical output, range-partitioned rank)",
)
def equi_depth_deciles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth histogram (the oracle-checkable form).

    ntile over an unpartitioned window is a global sort — fine as the
    exact/audit form at fixture scale; the 100-TB production path for
    equi-depth boundaries is approx_percentile (covered by
    `approx_percentile_order_price`), with this query as its exact
    twin. The tiebreak on o_orderkey makes bucket assignment a total
    order, so every engine and partitioning yields the same buckets.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    ranked = orders.select(
        cents.alias("cents_v"),
        F.ntile(10).over(w).cast("int").alias("bucket"),
    )
    return (
        ranked.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("cents_v").alias("lo_cents"),
            F.max("cents_v").alias("hi_cents"),
            F.sum("cents_v").cast("bigint").alias("cents"),
        )
        .orderBy("bucket")
    )


@register(
    "repeat_purchase_interval_stats",
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               o_orderdate,
               LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
                   AS prev_date
        FROM orders),
    gaps AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
               datediff('day', prev_date, o_orderdate) AS gap_days
        FROM seq WHERE prev_date IS NOT NULL)
    SELECT yr,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(quantile_disc(gap_days, 0.5) AS BIGINT) AS median_gap_days,
           CAST(SUM(gap_days) * 1000 // COUNT(*) AS BIGINT)
               AS mean_gap_milli,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
    FROM gaps
    GROUP BY yr
    ORDER BY yr
    """,
    description="G8/G5 repeat-purchase cadence: per-customer consecutive "
    "order gaps (LAG over the customer timeline), rolled up per year of "
    "the later order — discrete median, staged-integer mean, max; the "
    "retention-cadence metric behind replenishment forecasting",
)
def repeat_purchase_interval_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap distribution by year.

    One window pass partitioned by customer (shuffle on o_custkey,
    per-partition sort), then a |years|-keyed agg — the gap relation is
    |orders| - |customers| rows, never joined. percentile_disc keeps
    the median exact cross-engine.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.lag("o_orderdate").over(w).alias("prev_date"),
    )
    gaps = seq.filter(F.col("prev_date").isNotNull()).select(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.col("prev_date").cast("date")
        ).alias("gap_days"),
    )
    gaps.createOrReplaceTempView("purchase_gaps")
    return spark.sql(
        """
        SELECT yr,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days)
                    AS BIGINT) AS median_gap_days,
               CAST(SUM(gap_days) * 1000 DIV COUNT(*) AS BIGINT)
                   AS mean_gap_milli,
               CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
        FROM purchase_gaps
        GROUP BY yr
        ORDER BY yr
        """
    )


@register(
    "minmax_scaled_histogram",
    oracle="""
    WITH c AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events),
    b AS (
        SELECT event_type, MIN(cents) AS lo, MAX(cents) AS hi
        FROM c GROUP BY event_type),
    scaled AS (
        SELECT c.event_type,
               CASE WHEN hi = lo THEN 0
                    ELSE (cents - lo) * 1000000 // (hi - lo) END AS ppm
        FROM c JOIN b ON c.event_type = b.event_type),
    bucketed AS (
        SELECT event_type,
               CASE WHEN ppm = 1000000 THEN 9
                    ELSE CAST(ppm // 100000 AS INT) END AS bucket
        FROM scaled)
    SELECT event_type, CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM bucketed
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
    description="G17 feature min-max scaling audit: per-type values "
    "scaled to [0, 1e6] ppm with exact integer arithmetic, bucketed "
    "into 10 equal-width bins (top edge closed into the last bin) — "
    "the normalized-feature distribution check before model training",
)
def minmax_scaled_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact min-max normalization, histogrammed.

    Two tiny shuffles: the per-type bounds agg and the final histogram
    agg; the bounds relation is |types| rows so the join back is a
    broadcast at any scale. Integer ppm scaling makes the bucket
    assignment identical on every engine and partitioning (no float
    scaler drift).
    """
    events = load_table(spark, sf_dir, "events")
    c = events.select(
        "event_type",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    b = c.groupBy("event_type").agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    scaled = c.join(F.broadcast(b), "event_type").select(
        "event_type",
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("bigint"))
        .otherwise(
            F.expr("(cents - lo) * 1000000 DIV (hi - lo)")
        )
        .alias("ppm"),
    )
    bucketed = scaled.select(
        "event_type",
        F.when(F.col("ppm") == 1000000, F.lit(9))
        .otherwise(F.expr("CAST(ppm DIV 100000 AS INT)"))
        .cast("int")
        .alias("bucket"),
    )
    return (
        bucketed.groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "bucket")
    )


_SPEARMAN_ORACLE = """
    WITH r AS (
        SELECT ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey,
                                           l_linenumber) AS rp,
               -- l_quantity alone ties ~0.6% of (okey, lineno) pairs:
               -- l_extendedprice (unique with okey+lineno) totalizes
               -- the order (caught live by the round-6 sf1 gate)
               ROW_NUMBER() OVER (ORDER BY l_quantity, l_orderkey,
                                           l_linenumber, l_extendedprice) AS rq
        FROM lineitem),
    s AS (
        -- sum_d2 grows as n^3: past int64 at ~6M rows (caught live by
        -- the round-6 sf1 gate). DuckDB SUM(BIGINT) accumulates exactly
        -- in HUGEINT; the double readout goes via VARCHAR because
        -- HUGEINT->DOUBLE is not correctly rounded past 2^53.
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM((rp - rq) * (rp - rq)) AS VARCHAR) AS DOUBLE)
                   AS sum_d2
        FROM r)
    SELECT n, sum_d2,
           CAST(FLOOR(1000000 * (1 - 6.0 * sum_d2
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
                       * CAST(n AS DOUBLE) - 1)))) AS BIGINT) AS rho_e6
    FROM s
    """


@register(
    "spearman_price_quantity",
    oracle=_SPEARMAN_ORACLE,
    description="G5/G8 Spearman rank correlation between line price and "
    "quantity, with a total tiebreak key so ranks are a permutation "
    "(deterministic tiebreak-ranked variant); sum of squared rank "
    "differences accumulates in exact DECIMAL(38,0)/HUGEINT (n^3 "
    "outgrows int64 past ~6M rows) and reads out as one correctly-"
    "rounded double on both engines, so the final rho is one mirrored "
    "IEEE double expression floored to ppm. AUDIT TWIN (two global "
    "sorts): the scale-safe production form is "
    "spearman_distributed_price_quantity (identical output, "
    "range-partitioned ranks)",
)
def spearman_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank correlation from exact rank arithmetic.

    The two global rankings are the audit-scale step (single-partition
    windows — the same caveat as every exact-quantile audit row; the
    production path samples or buckets first: see
    spearman_distributed_price_quantity). sum_d2 grows as n^3 and outruns
    int64 past ~6M rows (the round-6 sf1 gate caught the ANSI
    overflow live), so the per-row square (always < 2^63) accumulates
    in DECIMAL(38,0) — Spark's decimal sum and DuckDB's HUGEINT sum
    are both exact, and both read out through a correctly-rounded
    cast to double. The closing double expression is written
    identically on both engines, so the FLOOR sees bit-identical
    input.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wp = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    wq = Window.orderBy(
        "l_quantity", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    r = li.select(
        F.row_number().over(wp).cast("bigint").alias("rp"),
        F.row_number().over(wq).cast("bigint").alias("rq"),
    )
    s = r.agg(
        F.count("*").alias("n"),
        F.sum(
            ((F.col("rp") - F.col("rq")) * (F.col("rp") - F.col("rq"))).cast(
                "decimal(38,0)"
            )
        ).alias("sum_d2_dec"),
    )
    s = s.select("n", F.col("sum_d2_dec").cast("double").alias("sum_d2"))
    return s.select(
        "n",
        "sum_d2",
        F.floor(
            1000000
            * (
                F.lit(1)
                - 6.0
                * F.col("sum_d2")
                / (
                    F.col("n").cast("double")
                    * (
                        F.col("n").cast("double") * F.col("n").cast("double")
                        - 1
                    )
                )
            )
        )
        .cast("bigint")
        .alias("rho_e6"),
    )


def _distributed_rank(
    df: DataFrame, sort_cols: list[str], rank_name: str
) -> DataFrame:
    """Exact global row_number WITHOUT a single-partition window.

    The classic distributed-rank decomposition: bucket rows by range
    of the leading sort column, rank locally within each bucket, then
    add the cumulative size of all preceding buckets. Output rank is
    identical to ``row_number() OVER (ORDER BY sort_cols)``:

    - the bucket function is monotone in the leading sort column, so
      every row in bucket i sorts no later than every row in bucket
      i+1, and ties of the leading column never straddle a boundary
      (they compare equal against the same literal);
    - within a bucket the local row_number orders by the full TOTAL
      key (callers append tiebreak columns);
    - rank = (rows in preceding buckets) + local rank, where the
      offset relation is one row per bucket (window over ~#cores
      rows, broadcast back).

    The bucket boundaries are approxQuantile split points of the
    leading column, collected ONCE here and baked into the plan as
    literals. That determinism is load-bearing: the first cut of this
    helper used repartitionByRange, whose RangePartitioner samples
    with a per-RDD seed — the offset subtree and the main subtree
    each instantiated the exchange with DIFFERENT boundaries unless
    exchange reuse happened to fire, silently skewing ranks (caught
    by the vs-window equivalence test at sf0.01). Literal boundaries
    make both subtrees bit-identical by construction; quantile
    accuracy only affects bucket balance, never correctness. The
    leading sort column must be numeric, non-null.

    Storage note (ADVICE r11): the lazy checkpoint below holds the
    full input relation in executor block storage for the consuming
    job, and lineage truncation means an executor loss mid-job fails
    the job instead of recomputing. Every current caller ranks a
    pre-aggregated, entity-bounded relation (customers, sessions,
    docs — never raw fact rows); a caller feeding a fact-scaled
    relation at cluster scale should swap to persist(DISK_ONLY)-class
    storage with lineage intact and re-measure (guide §5).
    """
    spark = df.sparkSession
    k = max(spark.sparkContext.defaultParallelism, 2)
    first = sort_cols[0]
    bounds = df.select(F.col(first).cast("double").alias("_k")).approxQuantile(
        "_k", [i / k for i in range(1, k)], 0.01
    )
    key = F.col(first).cast("double")
    bkt = F.lit(0)
    for b in sorted(set(bounds)):
        bkt = bkt + F.when(key > F.lit(b), 1).otherwise(0)
    # `part` feeds BOTH the local-rank window and the bucket-size
    # aggregate below; without materialization each consumer re-executes
    # the full upstream lineage — and chained callers (rfm, spearman)
    # nest that x2 per pass, so k chained ranks re-ran the base 2^k
    # times (measured: rfm_segmentation_counts 14.6 s -> 3.3 s at sf0.1
    # from this checkpoint alone). LAZY so the materialization happens
    # inside the first consuming job — nothing moves out of a bench's
    # timed region; blocks are executor-local and released by
    # release_cached() between queries.
    part = df.withColumn("_bkt", bkt.cast("int")).localCheckpoint(eager=False)
    wl = Window.partitionBy("_bkt").orderBy(*sort_cols)
    local = part.withColumn("_lr", F.row_number().over(wl).cast("bigint"))
    # sizes come from `part`, NOT `local`: offsets need bucket counts
    # only, so the second subtree skips the per-bucket sort entirely.
    sizes = part.groupBy("_bkt").agg(F.count("*").alias("_c"))
    wo = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "_bkt", F.coalesce(F.sum("_c").over(wo), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offs), "_bkt")
        .withColumn(rank_name, (F.col("_off") + F.col("_lr")).cast("bigint"))
        .drop("_bkt", "_lr", "_off")
    )


def _distributed_prefix(
    df: DataFrame,
    sort_cols: list[str],
    sum_cols: dict[str, str],
    rank_name: str | None = None,
    part_cols: list[str] | None = None,
) -> DataFrame:
    """Exact global row_number AND running sums, no single-partition
    window — the two-pass distributed sweep primitive.

    Generalizes `_distributed_rank` (same literal-boundary bucketing,
    same correctness argument) to also compute, for each row, the
    running sum of one or more columns in the global sort order:
    within each bucket a partitioned cumulative window computes the
    local prefix, a one-row-per-bucket totals relation supplies the
    sum of all PRECEDING buckets (window over ~#cores rows, broadcast
    back), and the global prefix is offset + local. This is the
    textbook two-pass parallel prefix sum expressed in DataFrame ops:
    every unbounded stage is keyed by bucket, and the only global
    order ever materialized is over the bounded bucket-totals
    relation. `sum_cols` maps output name -> input column; pass
    `rank_name` to also get the global row_number.

    `part_cols` (r12) makes the sweep per-GROUP: ranks/prefixes restart
    per distinct `part_cols` value, i.e. the distributed form of
    ``OVER (PARTITION BY part_cols ORDER BY sort_cols)`` for groups too
    few or too skewed to parallelize a plain partitioned window (a
    3-value flag pins the whole relation to 3 tasks at any scale — the
    §2.5 parallelism-killer). Buckets still come from range-splitting
    the leading sort column GLOBALLY, so every (group, bucket) cell is
    one window partition and the offsets relation stays bounded by
    (#groups x #buckets) rows.

    Storage note (ADVICE r11): the lazy checkpoint below holds the full
    input relation in executor block storage for the duration of the
    consuming job, and lineage is truncated (an executor loss mid-job
    fails the job rather than recomputing). Every current caller feeds
    a pre-aggregated, entity- or value-cardinality-bounded relation
    (customer/session/distinct-price rows, not fact rows); a caller
    passing a fact-scaled relation at cluster scale should swap the
    checkpoint for persist(DISK_ONLY)-class storage with lineage
    intact and re-measure.
    """
    spark = df.sparkSession
    part_cols = list(part_cols or [])
    k = max(spark.sparkContext.defaultParallelism, 2)
    first = sort_cols[0]
    bounds = df.select(F.col(first).cast("double").alias("_k")).approxQuantile(
        "_k", [i / k for i in range(1, k)], 0.01
    )
    key = F.col(first).cast("double")
    bkt = F.lit(0)
    for b in sorted(set(bounds)):
        bkt = bkt + F.when(key > F.lit(b), 1).otherwise(0)
    # Same x2-consumer shape as _distributed_rank (local sweep + bucket
    # totals both read `part`): lazy-checkpoint so the upstream lineage
    # executes once per pass instead of once per consumer.
    part = df.withColumn("_bkt", bkt.cast("int")).localCheckpoint(eager=False)
    wl = (
        Window.partitionBy(*part_cols, "_bkt")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part
    if rank_name is not None:
        wr = Window.partitionBy(*part_cols, "_bkt").orderBy(*sort_cols)
        local = local.withColumn("_lr", F.row_number().over(wr).cast("bigint"))
    for out, src in sum_cols.items():
        local = local.withColumn(f"_ls_{out}", F.sum(src).over(wl))
    aggs = [F.count("*").alias("_c")] + [
        F.sum(src).alias(f"_t_{out}") for out, src in sum_cols.items()
    ]
    sizes = part.groupBy(*part_cols, "_bkt").agg(*aggs)
    # Bounded offset window: one row per (group, bucket) cell.
    wo = (
        Window.partitionBy(*part_cols)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sel = part_cols + [
        "_bkt",
        F.coalesce(F.sum("_c").over(wo), F.lit(0)).alias("_off"),
    ]
    for out in sum_cols:
        sel.append(
            F.coalesce(F.sum(f"_t_{out}").over(wo), F.lit(0)).alias(
                f"_soff_{out}"
            )
        )
    offs = sizes.select(*sel)
    res = local.join(F.broadcast(offs), part_cols + ["_bkt"])
    if rank_name is not None:
        res = res.withColumn(
            rank_name, (F.col("_off") + F.col("_lr")).cast("bigint")
        )
    for out in sum_cols:
        res = res.withColumn(out, F.col(f"_soff_{out}") + F.col(f"_ls_{out}"))
    drops = ["_bkt", "_off"]
    if rank_name is not None:
        drops.append("_lr")
    drops += [f"_ls_{o}" for o in sum_cols] + [f"_soff_{o}" for o in sum_cols]
    return res.drop(*drops)


def _ntile_expr(k: int, rank_col: str = "rnk", total_col: str = "n_tot"):
    """NTILE(k) recovered in closed form from (global rank, total
    count): q = n div k, rem = n mod k — the first rem buckets take
    q+1 rows, the rest take q. Integer arithmetic only, identical on
    every engine; when n < k the CASE's first arm always fires (rem =
    n, so rank <= rem*(q+1) = n) and the q-division arm is never
    evaluated. Pair with `_distributed_rank` to replace an
    unpartitioned ntile window over an entity-sized relation."""
    q = f"({total_col} div {k})"
    rem = f"({total_col} % {k})"
    return F.expr(
        f"""CAST(CASE
             WHEN {rank_col} <= {rem} * ({q} + 1)
             THEN ({rank_col} + {q}) div ({q} + 1)
             ELSE {rem} + ({rank_col} - {rem} * ({q} + 1) + {q} - 1) div {q}
           END AS BIGINT)"""
    )


@register(
    "equi_depth_deciles_distributed",
    oracle=_EQUI_DEPTH_ORACLE,
    description="G8 equi-depth decile histogram, SCALE-SAFE FORM: "
    "identical output to equi_depth_deciles_price (its oracle is "
    "byte-identical) but the global rank comes from a range-"
    "partitioned distributed rank instead of one single-partition "
    "ntile window, and the ntile bucket is recovered from the rank in "
    "closed form — no stage ever sorts more than one range partition",
)
def equi_depth_deciles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production path for exact equi-depth histograms at 100 TB.

    ntile(10) is a pure function of (global rank, total count):
    q = n div 10, rem = n mod 10; the first rem buckets take q+1 rows.
    rank r therefore lands in bucket ceil(r/(q+1)) while r <= rem*(q+1)
    and rem + ceil((r - rem*(q+1))/q) after — integer arithmetic only,
    identical on every engine. The global rank is `_distributed_rank`
    (range repartition + local rank + bounded offsets) and the total
    count is a broadcast scalar, so the whole plan is shuffle-bounded:
    no single-partition window anywhere. The exact single-sort form
    (`equi_depth_deciles_price`) stays registered as the audit twin;
    the approx-sketch boundary path is `approx_percentile_order_price`.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    tot = orders.agg(F.count("*").cast("bigint").alias("n_tot"))
    ranked = _distributed_rank(orders, ["o_totalprice", "o_orderkey"], "rnk")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    bucket = F.expr(
        """CAST(CASE
             WHEN rnk <= (n_tot % 10) * (n_tot div 10 + 1)
             THEN (rnk + n_tot div 10) div (n_tot div 10 + 1)
             ELSE n_tot % 10
                  + (rnk - (n_tot % 10) * (n_tot div 10 + 1)
                     + n_tot div 10 - 1) div (n_tot div 10)
           END AS INT)"""
    )
    b = ranked.crossJoin(F.broadcast(tot)).select(
        cents.alias("cents_v"), bucket.alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("cents_v").alias("lo_cents"),
            F.max("cents_v").alias("hi_cents"),
            F.sum("cents_v").cast("bigint").alias("cents"),
        )
        .orderBy("bucket")
    )


@register(
    "spearman_distributed_price_quantity",
    oracle=_SPEARMAN_ORACLE,
    description="G5/G8 Spearman rank correlation, SCALE-SAFE FORM: "
    "identical output to spearman_price_quantity (its oracle is "
    "byte-identical) but both global rankings come from range-"
    "partitioned distributed ranks joined back on the line identity — "
    "no single-partition window; the same exact DECIMAL(38,0) sum_d2 "
    "and mirrored IEEE readout",
)
def spearman_distributed_price_quantity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The production path for exact Spearman at 100 TB.

    Two CHAINED `_distributed_rank` passes: rank by the price key,
    then rank that already-ranked relation by the quantity key — each
    row carries its rp into the second pass, so no identity join is
    ever needed (important: (l_orderkey, l_linenumber) is NOT unique
    in this fixture, only the full line tuple is). Two range shuffles
    plus two bounded-range sorts, nothing global. The closing
    arithmetic is identical to the audit twin
    `spearman_price_quantity`, so both run against the SAME oracle and
    must agree with each other to the last bit.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    r1 = _distributed_rank(
        li, ["l_extendedprice", "l_orderkey", "l_linenumber"], "rp"
    )
    r = _distributed_rank(
        r1,
        ["l_quantity", "l_orderkey", "l_linenumber", "l_extendedprice"],
        "rq",
    )
    s = r.agg(
        F.count("*").alias("n"),
        F.sum(
            ((F.col("rp") - F.col("rq")) * (F.col("rp") - F.col("rq"))).cast(
                "decimal(38,0)"
            )
        ).alias("sum_d2_dec"),
    )
    s = s.select("n", F.col("sum_d2_dec").cast("double").alias("sum_d2"))
    return s.select(
        "n",
        "sum_d2",
        F.floor(
            1000000
            * (
                F.lit(1)
                - 6.0
                * F.col("sum_d2")
                / (
                    F.col("n").cast("double")
                    * (
                        F.col("n").cast("double") * F.col("n").cast("double")
                        - 1
                    )
                )
            )
        )
        .cast("bigint")
        .alias("rho_e6"),
    )
