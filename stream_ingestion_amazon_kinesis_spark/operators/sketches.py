"""Mergeable-sketch aggregates (SURVEY §2.3 G6 — the 100 TB distinct/
frequency path).

The reference has no aggregation at all (consumer.py is a per-record
loop); at cluster scale the idiomatic way to answer "distinct users per
day, and overall" over 100 TB is NOT a global shuffle per question but a
*mergeable summary*: sketch each partition/day once (map-side, one pass)
and merge the fixed-size sketches for any coarser rollup. Spark 4 ships
Apache DataSketches HLL (`hll_sketch_agg` / `hll_union_agg`) and a
count-min sketch aggregate; this module exposes both as first-class
queries.

Accuracy is pinned in tests/test_sketches.py against the exact twins
(countDistinct / exact groupBy counts) — the sketches are rows-only
under the oracle gate because their binary form is engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import as_double, dec
from ..plans.registry import EXTRA_PLAN_BUILDERS, register
from ..functions.text import tokens
from ..sources.catalog import load_table, spread


@register(
    "hll_monthly_merge_customers",
    oracle=None,  # DataSketches HLL binary is engine-specific; the 5%
    # accuracy band vs exact countDistinct is pinned in tests/test_sketches.py
    description="G6 mergeable HLL: per-month customer sketches merged via "
    "hll_union_agg into an overall distinct estimate — the incremental "
    "rollup pattern (sketch each day once, merge for any window) that "
    "replaces repeated global COUNT(DISTINCT) shuffles at 100 TB",
    twin_test="tests/test_sketches.py::test_hll_monthly_merge_within_5pct_of_exact",
)
def hll_monthly_merge_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level sketch rollup: month -> overall.

    Level 1 runs as an ordinary partial/final hash aggregate producing a
    fixed-size (lgK=12 -> ~2.5 KB) sketch per month; level 2 merges 80ish
    sketches — bytes, not rows — so the second stage is O(months), never
    O(customers). At 100 TB the level-1 sketches would be persisted and
    every ad-hoc date-range distinct query becomes a metadata-scale merge.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.hll_sketch_agg("o_custkey", 12).alias("custkey_sketch"),
        F.count("*").alias("n_orders"),
    )
    return monthly.agg(
        F.hll_sketch_estimate(F.hll_union_agg("custkey_sketch")).alias(
            "distinct_customers_est"
        ),
        F.count("*").alias("n_months"),
        F.sum("n_orders").alias("n_orders"),
    )


@register(
    "cms_orderpriority_frequencies",
    oracle=None,  # CMS binary is engine-specific; the (exact <= est <=
    # exact + eps*N) guarantee is asserted per key in tests/test_sketches.py
    description="G6 count-min sketch over o_orderpriority: fixed-size "
    "frequency summary with a one-sided error bound — the mergeable "
    "heavy-hitters path for streams/partitions at scale (seeded, so "
    "deterministic)",
    twin_test="tests/test_sketches.py::test_cms_estimates_bounded_above_exact",
)
def cms_orderpriority_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count_min_sketch("o_orderpriority", 0.001, 0.99, 42).alias(
            "priority_sketch"
        ),
        F.count("*").alias("n_rows"),
    )


@register(
    "corr_qty_price_exact",
    oracle="""
    WITH sums AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(12,2))
                   * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy,
               SUM(CAST(l_quantity AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(FLOOR(
               (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                       - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                         - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
               * 1e6) AS BIGINT) AS corr_qty_price_ppm,
           CAST(FLOOR(
               (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 100) AS BIGINT)
               AS covar_pop_cents
    FROM sums ORDER BY l_returnflag
    """,
    description="G5/G11 exact-decimal Pearson correlation per return flag: "
    "power sums aggregate exactly in DECIMAL (partition-order invariant), "
    "the float math happens once per group on the driver-visible sums — "
    "deterministic on any cluster, unlike naive float corr()",
)
def corr_qty_price_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation from exact power sums.

    A naive `F.corr` accumulates doubles in partition order and differs
    run-to-run at scale; summing DECIMAL products is exact, so the only
    float ops are the final per-group combination — identical on 1 or
    1000 executors. The products stay within DECIMAL(38): qty*price
    <= 10^2 * 10^7 at 2+2 dp -> (25,4); SUM caps at 38 digits which at
    SF100's 6e8 rows (~1e19 total) still fits.

    Compared outputs are floor-quantized (ppm / cents): the power sums
    exceed double's 16 significant digits, so each engine's
    decimal->double conversion can differ in the last ulp — quantizing
    makes the comparison insensitive to that while still pinning 6+
    significant digits.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty, price = dec("l_quantity", 12, 2), dec("l_extendedprice", 12, 2)
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(qty).alias("sx"),
        F.sum(price).alias("sy"),
        F.sum(qty * price).alias("sxy"),
        F.sum(qty * qty).alias("sxx"),
        F.sum(price * price).alias("syy"),
    )
    n = as_double(F.col("n"))
    sx, sy = as_double(F.col("sx")), as_double(F.col("sy"))
    sxy = as_double(F.col("sxy"))
    sxx, syy = as_double(F.col("sxx")), as_double(F.col("syy"))
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    covar = (n * sxy - sx * sy) / (n * n)
    return (
        sums.select(
            "l_returnflag",
            "n",
            F.floor(corr * F.lit(1e6)).cast("bigint").alias("corr_qty_price_ppm"),
            F.floor(covar * F.lit(100)).cast("bigint").alias("covar_pop_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "topk_sketch_monthly_merge",
    oracle="""
    SELECT o_orderpriority AS item, COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY n DESC, item
    """,
    description="G6 mergeable top-k: per-month approx_top_k_accumulate "
    "sketches combined with approx_top_k_combine and read out with "
    "approx_top_k_estimate — the heavy-hitters twin of the HLL/bitmap "
    "rollups (persist month sketches once, answer any date-range top-k "
    "by merging bytes); exercised in the exact regime (5 distinct "
    "priorities << maxItemsTracked) so the oracle is the exact GROUP BY",
)
def topk_sketch_monthly_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level heavy-hitters rollup. Level 1 is an ordinary
    partial/final hash aggregate emitting one fixed-size item-count
    summary per month; level 2 merges ~80 sketches (bytes, not rows).
    Like the HLL and bitmap rollups above, the month sketches would be
    persisted at 100 TB and every ad-hoc date-range top-k becomes a
    metadata-scale combine instead of a row shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_topk_sketch_orders")
    return spark.sql(
        """
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   approx_top_k_accumulate(o_orderpriority, 10000) AS sk
            FROM _topk_sketch_orders
            GROUP BY date_trunc('month', o_orderdate)
        ),
        merged AS (SELECT approx_top_k_combine(sk, 10000) AS sk FROM monthly)
        SELECT e.item, CAST(e.count AS BIGINT) AS n
        FROM merged, LATERAL explode(approx_top_k_estimate(sk, 10)) AS ex(e)
        ORDER BY n DESC, item
        """
    )


@register(
    "linreg_qty_price_exact",
    oracle="""
    WITH sums AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(12,2))
                   * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy,
               SUM(CAST(l_quantity AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(12,2))) AS sxx
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(FLOOR(
               (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                  - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
               * 1000) AS BIGINT) AS slope_milli,
           CAST(FLOOR(
               (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
                - (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                   - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                     - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
                  * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
               / CAST(n AS DOUBLE) * 100) AS BIGINT) AS intercept_cents
    FROM sums ORDER BY l_returnflag
    """,
    description="G5 regression aggregates from exact power sums: OLS "
    "slope/intercept per return flag — regr_slope/regr_intercept's "
    "float accumulation replaced by DECIMAL sums + one final float "
    "combination per group, floor-quantized for ulp-insensitive "
    "comparison",
)
def linreg_qty_price_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares price-per-quantity per return flag, the
    corr_qty_price_exact recipe applied to regression: slope =
    (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2), intercept = (Sy - slope*Sx)/n.
    The builtin regr_slope/regr_intercept accumulate doubles in
    partition order (run-to-run drift at scale); here every sum is
    exact DECIMAL and the float division happens once per group —
    identical on 1 or 1000 executors. Outputs floor-quantized
    (milli / cents) to absorb the last-ulp decimal->double cast."""
    li = load_table(spark, sf_dir, "lineitem")
    qty, price = dec("l_quantity", 12, 2), dec("l_extendedprice", 12, 2)
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(qty).alias("sx"),
        F.sum(price).alias("sy"),
        F.sum(qty * price).alias("sxy"),
        F.sum(qty * qty).alias("sxx"),
    )
    n = as_double(F.col("n"))
    sx, sy = as_double(F.col("sx")), as_double(F.col("sy"))
    sxy, sxx = as_double(F.col("sxy")), as_double(F.col("sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return sums.select(
        "l_returnflag",
        "n",
        F.floor(slope * 1000).cast("bigint").alias("slope_milli"),
        F.floor(intercept * 100).cast("bigint").alias("intercept_cents"),
    ).orderBy("l_returnflag")


@register(
    "hll_retention_intersection",
    oracle=None,  # sketch estimates are engine-specific; the accuracy
    # band vs the exact inclusion-exclusion twin is pinned in
    # tests/test_sketches.py::test_hll_intersection_accuracy
    description="G6 sketch set algebra: week-over-week retained-user "
    "estimate via HLL inclusion-exclusion (|A∩B| ≈ est(A) + est(B) - "
    "est(A∪B)) — the mergeable-sketch answer to retention at 100 TB, "
    "where exact weekly user sets are too large to re-intersect",
    twin_test="tests/test_sketches.py::test_hll_intersection_accuracy",
)
def hll_retention_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retained users between consecutive weeks from merged HLL sketches.

    One pass builds a per-week user sketch; every week-pair readout is
    then pure sketch algebra (union-merge + inclusion-exclusion), no
    second scan of the data — the reason sketch columns are stored at
    all. Estimates carry HLL error (lgK=12 -> ~1.6% * 3 terms); the
    exact twin and the error band live in the pytest.
    """
    events = load_table(spark, sf_dir, "events")
    weekly = events.groupBy(
        F.date_trunc("week", "ts").alias("week")
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    a, b = weekly.alias("a"), weekly.alias("b")
    pairs = a.join(
        b, F.col("b.week") == F.col("a.week") + F.expr("INTERVAL 7 DAY")
    ).select(
        F.col("a.week").alias("week"),
        F.col("b.week").alias("next_week"),
        F.hll_sketch_estimate("a.sk").alias("est_a"),
        F.hll_sketch_estimate("b.sk").alias("est_b"),
        F.hll_sketch_estimate(
            F.hll_union("a.sk", "b.sk", True)
        ).alias("est_union"),
    )
    return pairs.select(
        "week",
        "next_week",
        "est_a",
        "est_b",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
            "est_retained"
        ),
    ).orderBy("week")


# --- Exact-oracle HyperLogLog ----------------------------------------
#
# The built-in DataSketches entries above stay rows-only because their
# binary sketch form is engine-specific. This one does NOT: an HLL
# built from first principles on the md5 hex->int bridge (the same
# string->int path the MinHash family uses), with m = 64 registers
# addressed by the hash's top 6 bits and ranks from the low-26-bit
# field via length(bin(r)) — an exact string op both engines share.
# The estimator is Flajolet's alpha_64 * m^2 / sum(2^-M_j) evaluated in
# PURE INTEGER arithmetic: the harmonic sum is scaled by 2^27 (absent
# registers contribute 2^27 exactly), alpha_64 = 709/1000 as a
# rational, and the estimate is one int64 floor division — so registers
# AND estimate are bit-identical in Spark and DuckDB at any
# partitioning. No small-range (linear counting) correction: the keyed
# corpus (orders) is >> 2.5m at every shipped SF, and the raw regime is
# the point of the exactness demonstration. Registers are max-merged
# per group into the 'ALL' row — the mergeability property that makes
# sketches the 100 TB distinct path, here value-checked exactly.
HLL_P = 6
HLL_M = 1 << HLL_P  # 64 registers: stderr ~ 1.04/sqrt(64) = 13%
HLL_W = 32 - HLL_P  # 26-bit rank field
HLL_RMAX = HLL_W + 1
HLL_ALPHA_NUM, HLL_ALPHA_DEN = 709, 1000  # published alpha_64
_HLL_EST_NUM = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << HLL_RMAX)
_HLL_2W = 1 << HLL_W  # bucket divisor
_HLL_2RMAX = 1 << HLL_RMAX  # absent-register harmonic term


def _hll_oracle(
    table: str = "lineitem",
    grp_sql: str = "l_returnflag",
    key_sql: str = "CAST(l_orderkey AS VARCHAR)",
) -> str:
    return f"""
    WITH k AS (
        SELECT {grp_sql} AS grp, {key_sql} AS key
        FROM {table}),
    h AS (
        SELECT grp, key,
               CAST(('0x' || substr(md5(key), 1, 8)) AS BIGINT) AS h
        FROM k),
    rk AS (
        SELECT grp, h // {_HLL_2W} AS bucket,
               CASE WHEN h % {_HLL_2W} = 0 THEN {HLL_RMAX}
                    ELSE {HLL_RMAX} - length(bin(h % {_HLL_2W})) END AS rank
        FROM h),
    regs AS (
        SELECT grp, bucket, MAX(rank) AS m_j FROM rk GROUP BY grp, bucket),
    allregs AS (
        SELECT 'ALL' AS grp, bucket, MAX(m_j) AS m_j
        FROM regs GROUP BY bucket),
    mrg AS (SELECT * FROM regs UNION ALL SELECT * FROM allregs),
    st AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_set,
               CAST(SUM((bucket + 1) * m_j) AS BIGINT) AS register_checksum,
               CAST(SUM(CAST(1 AS BIGINT) << ({HLL_RMAX} - m_j))
                    AS BIGINT) AS s_present
        FROM mrg GROUP BY grp),
    ex AS (
        SELECT grp, CAST(COUNT(DISTINCT key) AS BIGINT) AS exact_distinct
        FROM k GROUP BY grp
        UNION ALL
        SELECT 'ALL', CAST(COUNT(DISTINCT key) AS BIGINT) FROM k),
    est AS (
        SELECT grp, n_set, register_checksum,
               {_HLL_EST_NUM} // ({HLL_ALPHA_DEN} *
                   (s_present + ({HLL_M} - n_set) * {_HLL_2RMAX}))
                   AS hll_estimate
        FROM st)
    SELECT e.grp, e.n_set AS n_registers_set, e.register_checksum,
           e.hll_estimate, x.exact_distinct,
           (1000000 * abs(e.hll_estimate - x.exact_distinct))
               // x.exact_distinct AS error_ppm
    FROM est e JOIN ex x USING (grp)
    ORDER BY e.grp
    """


@register(
    "hll_custom_exact_distinct",
    oracle=_hll_oracle(),
    description="G6 custom HyperLogLog (m=64, md5-derived buckets/ranks, "
    "integer-rational alpha_64 estimator) with register-level max-merge "
    "into the ALL rollup — the whole sketch, estimate, and error are "
    "bit-identical across engines (full DuckDB oracle)",
)
def hll_custom_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed HLL as declarative DataFrame ops: one narrow codegen
    projection hashes each key (md5 bridge -> 32-bit int), registers
    are a groupBy(grp, bucket) MAX — the classic map-side-combinable
    sketch build: each partition reduces to <= m rows before the
    exchange, which is WHY this is the 100 TB distinct path — and the
    'ALL' rollup merges registers with a second max, never re-touching
    the data. The estimator runs in exact integer arithmetic (see
    module comment), so unlike the DataSketches entries this sketch is
    oracle-exact end to end; the exact distinct per group rides the
    same output row, making the HLL error a value-checked column
    (error_ppm <= ~13% stderr band, pinned in tests/test_sketches.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_orderkey").cast("string").alias("key"),
    )
    regs = hll_registers(keys)
    ex = (
        keys.groupBy("grp")
        .agg(F.countDistinct("key").cast("bigint").alias("exact_distinct"))
        .unionByName(
            keys.agg(
                F.countDistinct("key").cast("bigint").alias("exact_distinct")
            ).select(F.lit("ALL").alias("grp"), "exact_distinct")
        )
    )
    return hll_report(regs.unionByName(hll_merge_all(regs)), ex)


def hll_registers(keys: DataFrame) -> DataFrame:
    """(grp, key) -> the (grp, bucket, m_j) register relation: md5
    32-bit hash split into bucket/rank, registers via groupBy MAX —
    the map-side-combinable sketch build. Shared by the batch query and
    the streaming twin (whose MAX the micro-batch engine maintains
    incrementally)."""
    h = F.conv(
        F.substring(F.md5(F.encode(F.col("key"), "UTF-8")), 1, 8), 16, 10
    ).cast("long")
    r = h % F.lit(_HLL_2W)
    rank = F.when(r == 0, F.lit(HLL_RMAX)).otherwise(
        F.lit(HLL_RMAX) - F.length(F.bin(r))
    )
    rk = keys.select(
        "grp",
        (h / F.lit(_HLL_2W)).cast("long").alias("bucket"),
        rank.cast("long").alias("rank"),
    )
    return rk.groupBy("grp", "bucket").agg(F.max("rank").alias("m_j"))


def hll_merge_all(regs: DataFrame) -> DataFrame:
    """Register-level max-merge of every group's sketch into one 'ALL'
    sketch — bytes, not data, are re-aggregated."""
    return (
        regs.groupBy("bucket")
        .agg(F.max("m_j").alias("m_j"))
        .select(F.lit("ALL").alias("grp"), "bucket", "m_j")
    )


def hll_report(both: DataFrame, ex: DataFrame) -> DataFrame:
    """(grp, bucket, m_j) registers + (grp, exact_distinct) audit ->
    the estimator output (integer-rational alpha_64 arithmetic,
    identical on both engines)."""
    st = both.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_set"),
        F.sum((F.col("bucket") + 1) * F.col("m_j"))
        .cast("bigint")
        .alias("register_checksum"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_RMAX} - m_j AS INT))"
            )
        )
        .cast("bigint")
        .alias("s_present"),
    )
    est = st.select(
        "grp",
        F.col("n_set").alias("n_registers_set"),
        "register_checksum",
        F.expr(
            f"{_HLL_EST_NUM} div ({HLL_ALPHA_DEN} *"
            f" (s_present + ({HLL_M} - n_set) * {_HLL_2RMAX}))"
        ).alias("hll_estimate"),
    )
    return (
        est.join(ex, "grp")
        .select(
            "grp",
            "n_registers_set",
            "register_checksum",
            "hll_estimate",
            "exact_distinct",
            F.expr(
                "(1000000 * abs(hll_estimate - exact_distinct))"
                " div exact_distinct"
            ).alias("error_ppm"),
        )
        .orderBy("grp")
    )


# --- Exact-oracle Count-Min Sketch ------------------------------------
#
# Same program as the custom HLL above, applied to the frequency
# sketch: d=4 counter rows x w=512 counters, the hash family is the
# MinHash module's md5-affine permutations (overflow-free mulmod32 on
# both engines), counters are exact integer SUMs (mergeable by
# addition), and the point estimate is the min over rows — so the whole
# sketch AND its one-sided error are value-checked by the oracle. The
# output reports the top-10 exact words alongside their CMS estimates;
# overestimate_ppm >= 0 is the CMS never-underestimates invariant as a
# value-checked column.
CMS_D = 4
CMS_W = 512


def _cms_oracle() -> str:
    from .dedup import _MD5_INT32, _perm_sql

    h32 = _MD5_INT32.format(col="word")
    rows = []
    for j in range(CMS_D):
        rows.append(
            f"SELECT {j} AS j, ({_perm_sql(j, 'h', '//')}) % {CMS_W} AS idx,"
            " cnt FROM wh"
        )
    probe_rows = []
    for j in range(CMS_D):
        probe_rows.append(
            f"SELECT word, exact_count, {j} AS j,"
            f" ({_perm_sql(j, 'h', '//')}) % {CMS_W} AS idx FROM topw"
        )
    return f"""
    WITH w AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents),
    wc AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM w WHERE word <> '' GROUP BY word),
    wh AS (
        SELECT word, cnt, {h32} AS h FROM wc),
    cells AS ({" UNION ALL ".join(rows)}),
    cms AS (
        SELECT j, idx, CAST(SUM(cnt) AS BIGINT) AS counter
        FROM cells GROUP BY j, idx),
    topw AS (
        SELECT word, cnt AS exact_count, {h32} AS h
        FROM wc ORDER BY cnt DESC, word LIMIT 10),
    probes AS ({" UNION ALL ".join(probe_rows)}),
    est AS (
        SELECT p.word, p.exact_count,
               CAST(MIN(c.counter) AS BIGINT) AS cms_estimate
        FROM probes p JOIN cms c ON c.j = p.j AND c.idx = p.idx
        GROUP BY p.word, p.exact_count)
    SELECT word, exact_count, cms_estimate,
           (1000000 * (cms_estimate - exact_count)) // exact_count
               AS overestimate_ppm
    FROM est
    ORDER BY exact_count DESC, word
    """


@register(
    "cms_custom_exact_frequencies",
    oracle=_cms_oracle(),
    description=f"G6 custom Count-Min Sketch ({CMS_D}x{CMS_W}, md5-affine "
    "hash family, exact integer counters) probing the top-10 corpus words "
    "— sketch, estimates, and the one-sided error all value-checked by "
    "the DuckDB oracle",
)
def cms_custom_exact_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed CMS as declarative ops: the corpus reduces to the
    word-frequency relation once, each word feeds d=4 (row, counter)
    cells via the md5-affine permutations, and the sketch is a
    groupBy(j, idx) SUM — at most d*w = 2048 rows whatever the corpus
    size, built with map-side partial aggregation and mergeable by
    plain addition (a per-day/per-shard rollup is one more SUM). The
    top-10 probe joins the 10-row TakeOrdered slice against the sketch
    on (j, idx) and takes the min counter per word. Everything is int64
    (the affine hashes run through the overflow-free mulmod32 split),
    so estimates AND the CMS one-sided-error invariant are oracle-exact
    columns; the error band is pinned in tests/test_sketches.py."""
    from ..functions.text import tokens
    from ..sources.catalog import spread
    from .dedup import _perm_sql

    docs = spread(load_table(spark, sf_dir, "documents"))
    wc = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    h = F.conv(
        F.substring(F.md5(F.encode(F.col("word"), "UTF-8")), 1, 8), 16, 10
    ).cast("long")
    wh = wc.select("word", "cnt", h.alias("h"))

    def perm_idx(j: int) -> F.Column:
        # The same overflow-free mulmod32 split the oracle uses (the
        # naive A_j*h product tops out near 2^64 and raises under ANSI).
        return F.expr(f"({_perm_sql(j, 'h', 'div')}) % {CMS_W}")

    cells = None
    for j in range(CMS_D):
        part = wh.select(
            F.lit(j).alias("j"), perm_idx(j).alias("idx"), "cnt"
        )
        cells = part if cells is None else cells.unionByName(part)
    cms = cells.groupBy("j", "idx").agg(
        F.sum("cnt").cast("bigint").alias("counter")
    )
    topw = (
        wc.orderBy(F.col("cnt").desc(), "word")
        .limit(10)
        .select("word", F.col("cnt").alias("exact_count"), h.alias("h"))
    )
    probes = None
    for j in range(CMS_D):
        part = topw.select(
            "word", "exact_count", F.lit(j).alias("j"), perm_idx(j).alias("idx")
        )
        probes = part if probes is None else probes.unionByName(part)
    return (
        probes.join(cms, ["j", "idx"])
        .groupBy("word", "exact_count")
        .agg(F.min("counter").cast("bigint").alias("cms_estimate"))
        .select(
            "word",
            "exact_count",
            "cms_estimate",
            F.expr(
                "(1000000 * (cms_estimate - exact_count)) div exact_count"
            ).alias("overestimate_ppm"),
        )
        .orderBy(F.col("exact_count").desc(), "word")
    )


# --- Exact-oracle KMV (k-minimum-values / theta) distinct sketch ------
#
# Third member of the exact-oracle sketch family (HLL m=64, CMS 4x512):
# the KMV sketch keeps the k smallest distinct 32-bit hashes of a set;
# the (k-1)/theta estimator gives ~1/sqrt(k-2) stderr, and — unlike
# HLL — KMV sketches support SET OPERATIONS: the union sketch is the k
# smallest of the combined value lists, and intersections estimate via
# the match fraction inside the union sketch (the DataSketches "theta
# sketch" algebra). Hashes are the md5 32-bit bridge, the estimator is
# exact integer arithmetic ((k-1) * 2^32 div theta), so sketch,
# estimates, and errors are all value-checked by the DuckDB oracle.
KMV_K = 64
_KMV_2P32 = 2**32


def _kmv_oracle() -> str:
    from .dedup import _MD5_INT32

    h32 = _MD5_INT32.format(col="word")
    est_num = (KMV_K - 1) * _KMV_2P32
    return f"""
    WITH tok AS (
        SELECT source,
               unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM documents),
    wh AS (
        SELECT DISTINCT source, {h32} AS h
        FROM tok WHERE word <> ''),
    allh AS (SELECT DISTINCT h FROM wh),
    grps AS (
        SELECT source AS grp, h FROM wh
        UNION ALL SELECT 'ALL' AS grp, h FROM allh),
    rk AS (
        SELECT grp, h,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM grps),
    sk AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_sketch,
               CAST(MAX(h) AS BIGINT) AS theta_h,
               CAST(SUM(h) AS BIGINT) AS sketch_checksum
        FROM rk WHERE rn <= {KMV_K} GROUP BY grp),
    ex AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS exact_distinct
        FROM grps GROUP BY grp),
    base AS (
        SELECT s.grp, s.n_sketch, s.theta_h, s.sketch_checksum,
               CAST(CASE WHEN s.n_sketch < {KMV_K} THEN e.exact_distinct
                    ELSE {est_num} // s.theta_h END AS BIGINT)
                   AS kmv_estimate,
               e.exact_distinct
        FROM sk s JOIN ex e USING (grp)),
    ss AS (SELECT source FROM (SELECT DISTINCT source FROM documents)
           ORDER BY source LIMIT 2),
    sa AS (SELECT MIN(source) AS s FROM ss),
    sb AS (SELECT MAX(source) AS s FROM ss),
    abh AS (
        SELECT DISTINCT h FROM wh
        WHERE source IN ((SELECT s FROM sa), (SELECT s FROM sb))),
    absk AS (SELECT h FROM abh ORDER BY h LIMIT {KMV_K}),
    abst AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_ab,
                    CAST(MAX(h) AS BIGINT) AS theta_ab FROM absk),
    m AS (
        SELECT k.h FROM absk k
        WHERE EXISTS (SELECT 1 FROM wh
                      WHERE wh.source = (SELECT s FROM sa) AND wh.h = k.h)
          AND EXISTS (SELECT 1 FROM wh
                      WHERE wh.source = (SELECT s FROM sb) AND wh.h = k.h)),
    mst AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_match,
                   CAST(COALESCE(SUM(h), 0) AS BIGINT) AS match_checksum
            FROM m),
    xi AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS exact_int FROM (
            SELECT h FROM wh WHERE source = (SELECT s FROM sa)
            INTERSECT
            SELECT h FROM wh WHERE source = (SELECT s FROM sb))),
    inter AS (
        SELECT 'INTERSECT(' || (SELECT s FROM sa) || ','
                   || (SELECT s FROM sb) || ')' AS grp,
               mst.n_match AS n_sketch,
               abst.theta_ab AS theta_h,
               mst.match_checksum AS sketch_checksum,
               CAST(CASE WHEN abst.n_ab < {KMV_K} THEN mst.n_match
                    ELSE (mst.n_match * ({est_num} // abst.theta_ab))
                         // {KMV_K} END AS BIGINT) AS kmv_estimate,
               xi.exact_int AS exact_distinct
        FROM abst, mst, xi),
    outp AS (SELECT * FROM base UNION ALL SELECT * FROM inter)
    SELECT grp, n_sketch, theta_h, sketch_checksum, kmv_estimate,
           exact_distinct,
           CAST(CASE WHEN exact_distinct = 0 THEN 0
                ELSE (1000000 * abs(kmv_estimate - exact_distinct))
                     // exact_distinct END AS BIGINT) AS error_ppm
    FROM outp ORDER BY grp
    """


@register(
    "kmv_distinct_setops",
    oracle=_kmv_oracle(),
    description=f"G6 custom KMV/theta sketch (k={KMV_K}, md5 32-bit "
    "hashes, integer-rational (k-1)/theta estimator) over per-source "
    "distinct tokens, with the union ('ALL') sketch and a theta-algebra "
    "INTERSECTION estimate between the two first sources — sketch, "
    "estimates, and errors all value-checked by the DuckDB oracle",
)
def kmv_distinct_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed KMV as declarative ops: the corpus reduces once to
    the distinct (source, hash) relation, each group keeps its k
    smallest hashes via a PARTITIONED rank (input bounded by per-source
    vocabulary, never corpus size; at extreme scale the same k-smallest
    is map-side combinable because any partition's candidates below the
    global theta are a superset of the final sketch). Set algebra runs
    on the sketches alone: the 'ALL' union re-ranks the merged value
    lists, and the intersection estimate is (n_match * est_union) div k
    where n_match counts union-sketch members present in both sides —
    every relation past the first distinct is <= k rows. Estimator,
    thresholds, and error_ppm are pure BIGINT arithmetic, identical on
    both engines (est = (k-1)*2^32 div theta; lossless CASE when a
    group holds fewer than k values)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    # Vocabulary-sized after the distinct; eagerly materialized because
    # SEVEN downstream subtrees reference it (per-source groups, ALL,
    # the AB union sketch, both membership sides, the exact intersect)
    # and each would re-tokenize the corpus otherwise (measured sf0.1
    # warm: 4.8 s -> ~1.5 s). Raw plan stays guard/pin-visible via
    # EXTRA_PLAN_BUILDERS["kmv_distinct_setops::distinct_hashes"].
    wh = _kmv_distinct_hashes(spark, sf_dir).localCheckpoint(eager=True)
    allh = wh.select("h").distinct()
    grps = wh.select(F.col("source").alias("grp"), "h").unionByName(
        allh.select(F.lit("ALL").alias("grp"), "h")
    )
    rk = grps.withColumn(
        "rn", F.row_number().over(W.partitionBy("grp").orderBy("h"))
    )
    est_num = (KMV_K - 1) * _KMV_2P32
    sk = (
        rk.filter(F.col("rn") <= KMV_K)
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_sketch"),
            F.max("h").cast("bigint").alias("theta_h"),
            F.sum("h").cast("bigint").alias("sketch_checksum"),
        )
    )
    ex = grps.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("exact_distinct")
    )
    base = sk.join(ex, "grp").select(
        "grp",
        "n_sketch",
        "theta_h",
        "sketch_checksum",
        F.when(F.col("n_sketch") < KMV_K, F.col("exact_distinct"))
        .otherwise(F.expr(f"{est_num} div theta_h"))
        .cast("bigint")
        .alias("kmv_estimate"),
        "exact_distinct",
    )
    # The two lexicographically-first sources — a bounded driver scalar
    # (|sources| is a handful; same convention as _doc_tokens's count).
    srcs = sorted(
        r[0] for r in docs.select("source").distinct().collect()
    )[:2]
    sa, sb = srcs[0], srcs[-1]
    da = wh.filter(F.col("source") == sa).select("h")
    db = wh.filter(F.col("source") == sb).select("h")
    absk = (
        wh.filter(F.col("source").isin([sa, sb]))
        .select("h")
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
    )
    abst = absk.agg(
        F.count("*").cast("bigint").alias("n_ab"),
        F.max("h").cast("bigint").alias("theta_ab"),
    )
    m = F.broadcast(absk).join(da, "h").join(db, "h")
    mst = m.agg(
        F.count("*").cast("bigint").alias("n_match"),
        F.coalesce(F.sum("h"), F.lit(0)).cast("bigint").alias(
            "match_checksum"
        ),
    )
    xi = (
        da.intersect(db)
        .agg(F.count("*").cast("bigint").alias("exact_int"))
    )
    inter = (
        abst.crossJoin(mst)
        .crossJoin(xi)
        .select(
            F.lit(f"INTERSECT({sa},{sb})").alias("grp"),
            F.col("n_match").alias("n_sketch"),
            F.col("theta_ab").alias("theta_h"),
            F.col("match_checksum").alias("sketch_checksum"),
            F.when(F.col("n_ab") < KMV_K, F.col("n_match"))
            .otherwise(
                F.expr(f"(n_match * ({est_num} div theta_ab)) div {KMV_K}")
            )
            .cast("bigint")
            .alias("kmv_estimate"),
            F.col("exact_int").alias("exact_distinct"),
        )
    )
    return (
        base.unionByName(inter)
        .select(
            "*",
            F.when(F.col("exact_distinct") == 0, F.lit(0))
            .otherwise(
                F.expr(
                    "(1000000 * abs(kmv_estimate - exact_distinct))"
                    " div exact_distinct"
                )
            )
            .cast("bigint")
            .alias("error_ppm"),
        )
        .orderBy("grp")
    )


# --- Exact-oracle Bloom filter membership audit -----------------------
#
# Fourth exact-oracle sketch: an m-bit / d-hash Bloom filter built over
# the urgent-order customer keys, probed with EVERY customer — the
# "does this key exist on the other side" pre-filter that saves a full
# join at 100 TB (Spark's own runtime bloom pushdown is exercised by
# the join-strategy queries; this one pins the DATA STRUCTURE with an
# engine-portable hash family so the bits, probes, and false-positive
# accounting are value-checked cell by cell). Bit positions come from
# the MinHash module's md5-affine permutations mod m; the "bitmap" is
# the <= m-row distinct-positions relation (broadcast to probes), so
# build is one map-side distinct and probe is a broadcast equi-join.
BLOOM_M = 65536
BLOOM_D = 3


def _bloom_oracle() -> str:
    from .dedup import _MD5_INT32, _perm_sql

    bh = _MD5_INT32.format(col="CAST(k AS VARCHAR)")
    ph = _MD5_INT32.format(col="CAST(c_custkey AS VARCHAR)")
    bit_rows = " UNION ALL ".join(
        f"SELECT ({_perm_sql(j, 'h', '//')}) % {BLOOM_M} AS pos FROM bh"
        for j in range(BLOOM_D)
    )
    probes = ", ".join(
        f"({_perm_sql(j, 'h', '//')}) % {BLOOM_M} AS p{j}"
        for j in range(BLOOM_D)
    )
    all_set = " AND ".join(
        f"EXISTS (SELECT 1 FROM bits WHERE pos = pp.p{j})"
        for j in range(BLOOM_D)
    )
    return f"""
    WITH bk AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderpriority = '1-URGENT'),
    bh AS (SELECT k, {bh} AS h FROM bk),
    bits AS (SELECT DISTINCT pos FROM ({bit_rows})),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bits_set FROM bits),
    pp AS (
        SELECT c_custkey, c_mktsegment, {probes}
        FROM (SELECT c_custkey, c_mktsegment, {ph} AS h FROM customer)),
    fl AS (
        SELECT c_mktsegment,
               ({all_set}) AS bloom_pos,
               EXISTS (SELECT 1 FROM bk WHERE bk.k = pp.c_custkey)
                   AS member
        FROM pp)
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_probed,
           CAST(COUNT(*) FILTER (member) AS BIGINT) AS true_members,
           CAST(COUNT(*) FILTER (bloom_pos) AS BIGINT) AS bloom_positives,
           CAST(COUNT(*) FILTER (bloom_pos AND NOT member) AS BIGINT)
               AS false_positives,
           CAST(CASE WHEN COUNT(*) = COUNT(*) FILTER (member) THEN 0
                ELSE (1000000 * COUNT(*) FILTER (bloom_pos AND NOT member))
                     // (COUNT(*) - COUNT(*) FILTER (member)) END
                AS BIGINT) AS fpr_ppm,
           (SELECT n_bits_set FROM nb) AS n_bits_set
    FROM fl GROUP BY 1 ORDER BY 1
    """


@register(
    "bloom_membership_audit",
    oracle=_bloom_oracle(),
    description=f"G6 custom Bloom filter ({BLOOM_M} bits, {BLOOM_D} "
    "md5-affine hashes) over urgent-order customer keys, probed with "
    "every customer — per-segment membership, false-positive counts, "
    "and fpr_ppm all value-checked by the DuckDB oracle (zero false "
    "negatives by construction)",
)
def bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom build+probe as declarative ops: the build side
    reduces to distinct urgent customers, fans each key to d bit
    positions, and distincts to the <= m-row bits relation — map-side
    combinable, broadcast once. Probes explode to d (key, position)
    rows and equi-join the broadcast bits; a key is bloom-positive iff
    ALL its d rows matched (SUM(hit) = d works even when a key's
    positions collide — colliding rows match identically). The exact
    member flag rides a broadcast semi-ish left join against the same
    build relation, making false_positives and fpr_ppm value-checked
    columns; bloom_positives >= true_members (no false negatives) is
    pinned in tests."""
    from .dedup import _perm_sql

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    bk = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    h32 = lambda c: (  # noqa: E731 — md5 32-bit bridge, both engines
        F.conv(
            F.substring(F.md5(F.encode(c.cast("string"), "UTF-8")), 1, 8),
            16,
            10,
        ).cast("long")
    )
    bh = bk.select("k", h32(F.col("k")).alias("h"))
    pos = [
        (F.expr(_perm_sql(j, "h", "div")) % BLOOM_M).cast("long")
        for j in range(BLOOM_D)
    ]
    bits = (
        bh.select(F.explode(F.array(*pos)).alias("pos")).distinct()
    )
    nb = bits.agg(F.count("*").cast("bigint").alias("n_bits_set"))
    pp = cust.select(
        "c_custkey", "c_mktsegment", h32(F.col("c_custkey")).alias("h")
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.posexplode(F.array(*pos)).alias("j", "pos"),
    )
    hits = (
        pp.join(
            F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left"
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            (F.sum(F.coalesce(F.col("hit"), F.lit(0))) == BLOOM_D).alias(
                "bloom_pos"
            )
        )
    )
    fl = hits.join(
        F.broadcast(bk.withColumn("is_m", F.lit(True))),
        hits.c_custkey == F.col("k"),
        "left",
    ).select(
        "c_mktsegment",
        "bloom_pos",
        F.coalesce(F.col("is_m"), F.lit(False)).alias("member"),
    )
    agg = fl.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").cast("bigint").alias("n_probed"),
        F.count_if(F.col("member")).cast("bigint").alias("true_members"),
        F.count_if(F.col("bloom_pos"))
        .cast("bigint")
        .alias("bloom_positives"),
        F.count_if(F.col("bloom_pos") & ~F.col("member"))
        .cast("bigint")
        .alias("false_positives"),
    )
    return (
        agg.select(
            "*",
            F.when(
                F.col("n_probed") == F.col("true_members"), F.lit(0)
            )
            .otherwise(
                F.expr(
                    "(1000000 * false_positives)"
                    " div (n_probed - true_members)"
                )
            )
            .cast("bigint")
            .alias("fpr_ppm"),
        )
        .crossJoin(F.broadcast(nb))
        .orderBy("segment")
    )


def _kmv_distinct_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (source, md5-32 token hash) — the one corpus-sized pass
    every KMV branch shares; kmv_distinct_setops localCheckpoints it."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        spread(docs)
        .select("source", F.explode(tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .select(
            "source",
            F.conv(
                F.substring(F.md5(F.encode(F.col("word"), "UTF-8")), 1, 8),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )


# Pre-checkpoint plan for the pin/guard machinery.
EXTRA_PLAN_BUILDERS["kmv_distinct_setops::distinct_hashes"] = (
    _kmv_distinct_hashes
)
