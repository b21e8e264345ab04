"""Batch table catalog over the parquet fixtures.

The reference's only source is a polled Kinesis stream
(consumer.py:53-94,108-195); this engine's batch surface reads columnar
parquet with Catalyst predicate pushdown and column pruning — the scan
operator the reference lacks (SURVEY §2.3 G1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import TABLES


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def table_rowcount(sf_dir: str, name: str) -> int:
    """Exact row count from parquet footers, no Spark job — the cheap
    way for operators that derive blocking caps (semdedup K, IVF cells)
    to size themselves without an extra count() action. Handles both a
    single file and a directory of part files."""
    import pyarrow.parquet as pq

    src = table_path(sf_dir, name)
    if os.path.isdir(src):
        return sum(
            pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
            for root, _dirs, files in os.walk(src)
            for f in sorted(files)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(src).metadata.num_rows


def fixture_fingerprint(sf_dir: str, name: str = "events") -> str:
    """Short content fingerprint (mtime+size of every file under the
    table's parquet path). /tmp staging caches embed it in their path
    so a fixture REGENERATION (same sf tag, new data — has happened
    twice across rounds) invalidates the cache instead of silently
    replaying a stale export."""
    import hashlib

    src = table_path(sf_dir, name)
    parts: list[str] = []
    if os.path.isdir(src):
        for root, _dirs, files in os.walk(src):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(src):
        st = os.stat(src)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain `spark.read.parquet` so filters and
    projections placed on top by callers reach the scan (PushedFilters /
    ReadSchema).

    Timestamp normalization: fixture generations have carried
    TIMESTAMP(NANOS) (events.ts) and TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (all ts/date columns) — the latter reads as
    TIMESTAMP_NTZ in Spark 4. Every operator downstream (and every
    DuckDB oracle) treats these as UTC instants, so both shapes are
    normalized here to a real TimestampType with UTC wall times:

    - NTZ wall times are converted to instants TZ-INDEPENDENTLY:
      `timestampdiff(MICROSECOND, epoch_ntz, c)` is pure wall-clock
      arithmetic on the NTZ value, and `timestamp_micros` builds the
      instant from micros-since-epoch directly — neither consults the
      session timezone, so a later tz change in a shared session can
      never shift the normalized instants (unlike a bare NTZ->LTZ
      cast, which reads spark.sql.session.timeZone lazily at action
      time);
    - session timezone is still pinned to UTC (runtime-settable, works
      under ANY SparkSession including the verification driver's) so
      that instants RENDER as the same wall times DuckDB prints for
      its naive TIMESTAMP when rows are collected/serialized — a
      display concern only; correctness of the stored instants no
      longer depends on it;
    - NANOS fixtures additionally need nanosAsLong (else a vanilla
      session throws PARQUET_TYPE_ILLEGAL) + a micros truncation, the
      same truncation DuckDB applies.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(
                c,
                F.timestamp_micros(
                    F.expr(
                        "timestampdiff(MICROSECOND, "
                        f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{c}`)"
                    )
                ),
            )
    return df


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the cluster's default parallelism —
    but ONLY when the input plan actually yields fewer partitions.

    Use before compute-bound per-row work (shingling, hashing, regex)
    whose input scan may yield few splits: parquet parallelism stops at
    row-group granularity, so a compact fixture (or a small filtered
    table) can pin an expensive narrow chain to a handful of tasks. The
    exchange moves each input row exactly once and unlocks full-width
    execution for everything downstream. On a production layout whose
    scan already fans out to >= cluster width (thousands of splits at
    100 TB), this is a NO-OP — the guard is what keeps the helper from
    inserting a gratuitous full shuffle at scale. The partition count
    probe reads plan metadata (the file index), not data."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    try:
        if df.rdd.getNumPartitions() >= parallelism:
            return df
    except Exception:
        # streaming or otherwise unplannable-as-RDD inputs: fall through
        pass
    return df.repartition(parallelism)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view for the SQL surface."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
