"""Z-order (Morton) data-layout clustering (SURVEY §2.3 G1 — the
multi-dimensional file-skipping path).

Directory partitioning (`sources/partitioned.py`) prunes on ONE coarse
column; queries that box-filter on TWO dimensions (user AND value, lat
AND lon, time AND tenant) still scan every file of the matching
partition. The standard lakehouse answer is to CLUSTER file contents on
a Morton key — interleave the bits of both dimensions, range-partition
and sort the write on that key — so parquet's per-file/row-group min-max
statistics become selective in BOTH dimensions at once and a 2-D box
predicate skips almost every file.

The Morton key is a pure JVM expression (an `aggregate` fold over bit
positions — no UDF, no shuffle beyond the one range-exchange the write
needs anyway), so clustering 100 TB costs one pass. The clustering is
write-side only: readers keep their ordinary predicates and the skipping
happens inside the parquet reader via pushed filters.

tests/test_layout.py asserts the mechanism itself: the same box query
touches strictly fewer files under the z-ordered layout than under a
round-robin layout of identical row content.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import as_double, money
from ..plans.registry import register
from ..sources.catalog import fixture_fingerprint, load_table

# 16 bits per dimension -> 32-bit Morton key. Dimension values are
# clamped into [0, 65535]; both fixture dimensions (user_id, whole-unit
# value bucket) stay far below that through sf1.
_BITS = 16


def morton_key(x: Column, y: Column) -> Column:
    """Interleave the low 16 bits of two non-negative int columns into
    one 32-bit Morton key: x occupies even bit positions, y odd ones.

    Expressed as a statically-unrolled sum of 32 shift/mask terms — all
    integer ops on two longs, fully inside whole-stage codegen (far
    below the codegen method-size cap), one pass, no Python."""
    cx = F.least(F.lit((1 << _BITS) - 1), F.greatest(F.lit(0), x)).cast("long")
    cy = F.least(F.lit((1 << _BITS) - 1), F.greatest(F.lit(0), y)).cast("long")
    key = F.lit(0).cast("long")
    for i in range(_BITS):
        key = key + F.shiftleft(
            F.shiftright(cx, i).bitwiseAND(F.lit(1)), 2 * i
        ) + F.shiftleft(F.shiftright(cy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return key


def write_zordered(
    df: DataFrame, x: str | Column, y: str | Column, path: str, n_files: int = 8
) -> None:
    """Write `df` clustered on morton_key(x, y): range-partition on the
    key (so each output file owns a compact Morton range = a compact 2-D
    tile) and sort within partitions (so row groups inside a file are
    tiles too). The key itself is dropped before the write — clustering
    is a physical property, not a schema change."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    (
        df.withColumn("_zkey", morton_key(xc, yc))
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def zordered_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Events clustered on (user_id, whole-unit value); written once per
    sf (idempotent via the _SUCCESS marker, same convention as
    file_formats._ensure_export)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_layout",
        tag,
        f"events_zorder_{fixture_fingerprint(sf_dir)}",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        events = load_table(spark, sf_dir, "events")
        write_zordered(
            events, F.col("user_id"), F.col("value").cast("long"), path
        )
    return path


@register(
    "zorder_box_query_events",
    oracle="""
    SELECT COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE user_id BETWEEN 10 AND 49
      AND value >= 50.0 AND value < 200.0
    """,
    description="G1 z-order clustered layout: events rewritten clustered "
    "on morton_key(user_id, value), then box-filtered on BOTH dimensions "
    "and aggregated — values must survive the clustered roundtrip exactly "
    "(oracle reads the original table); the file-skipping the layout buys "
    "is asserted in tests/test_layout.py",
)
def zorder_box_query_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A 2-D box query over the clustered layout. The predicate pushes
    down to the parquet scan as ordinary min/max filters; because file
    contents are Morton-clustered, those stats are tight in both
    dimensions and non-matching files/row groups are skipped instead of
    scanned. The result is layout-invariant — the oracle aggregates the
    ORIGINAL events table."""
    path = zordered_events_path(spark, sf_dir)
    back = spark.read.parquet(path)
    boxed = back.filter(
        (F.col("user_id").between(10, 49))
        & (F.col("value") >= 50.0)
        & (F.col("value") < 200.0)
    )
    return boxed.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        as_double(F.sum(money("value"))).alias("total_value"),
    )


@register(
    "scan_pruning_audit_orders",
    oracle="""
    WITH stats AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                   AS min_cents,
               MAX(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                   AS max_cents,
               CAST(COUNT(*) FILTER (
                   WHERE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                         BETWEEN 40000000 AND 45000000) AS BIGINT) AS n_match
        FROM orders GROUP BY 1)
    SELECT month, n_rows, min_cents, max_cents, n_match,
           (max_cents < 40000000 OR min_cents > 45000000) AS prunable,
           (1000000 * n_match) // n_rows AS selectivity_ppm
    FROM stats
    ORDER BY month
    """,
    description="layout/statistics audit: per-month min/max column "
    "statistics for o_totalprice vs a band predicate — which partitions "
    "a stats-based reader (parquet row-group / partition pruning) could "
    "skip entirely, and the actual selectivity inside non-prunable ones",
)
def scan_pruning_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Would-this-predicate-prune audit over a monthly partition layout.

    The exact audit a 100 TB table owner runs before choosing a
    partition/sort key: aggregate each candidate partition's min/max
    for the filter column and test the predicate band against the
    range. A `prunable=true` month is one a parquet reader skips from
    footer statistics alone (zero IO); `selectivity_ppm` inside
    non-prunable months measures how much the row-group-level sort
    (see `zorder_box_query_events`) would further cut. One map-side
    combinable aggregate on the month grain; no shuffle beyond it.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = (money("o_totalprice") * 100).cast("bigint")
    lo, hi = 40000000, 45000000
    stats = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.count("*").alias("n_rows"),
        F.min(cents).alias("min_cents"),
        F.max(cents).alias("max_cents"),
        F.sum(F.when(cents.between(lo, hi), 1).otherwise(0))
        .cast("bigint")
        .alias("n_match"),
    )
    return stats.select(
        "month",
        "n_rows",
        "min_cents",
        "max_cents",
        "n_match",
        ((F.col("max_cents") < lo) | (F.col("min_cents") > hi)).alias("prunable"),
        F.expr("(1000000 * n_match) div n_rows").alias("selectivity_ppm"),
    ).orderBy("month")
