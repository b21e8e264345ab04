"""Batch CSV / JSON scans with explicit schemas (SURVEY §2.3 G1).

The reference ingests JSON records off a stream; its batch-side twin is
`spark.read.csv/json` with an explicit schema (never inferSchema — a
schema-inference pass over 100 TB is a full extra scan). The fixtures
ship as parquet only, so each format's scan is exercised by exporting a
fixture table once to a per-sf cache dir and reading it back through
the real CSV/JSON reader.

Explicit schemas also keep the scan a single pass and give Catalyst a
fixed ReadSchema to prune against; CSV/JSON offer no row-group
statistics, so predicate pushdown only prunes whole files — which is
why the engine's large-table surface is parquet and these scans are the
interchange path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.numeric import as_double, money
from ..plans.registry import register
from .catalog import fixture_fingerprint, load_table

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)


def _export_path(sf_dir: str, name: str, fmt: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(
        tempfile.gettempdir(),
        "spark_graft_file_formats",
        tag,
        f"{name}_{fmt}_{fixture_fingerprint(sf_dir, name)}",
    )


def _ensure_export(spark: SparkSession, sf_dir: str, name: str, fmt: str) -> str:
    """Write the fixture out in `fmt` once per (sf_dir, table); Spark's
    `_SUCCESS` marker makes the cache idempotent across processes."""
    path = _export_path(sf_dir, name, fmt)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        writer = load_table(spark, sf_dir, name).write.mode("overwrite")
        if fmt == "csv":
            writer.option("header", True).csv(path)
        elif fmt == "orc":
            writer.orc(path)
        else:
            writer.json(path)
    return path


def csv_table(
    spark: SparkSession, sf_dir: str, name: str, schema: T.StructType
) -> DataFrame:
    """G1 CSV scan: explicit schema, header, PERMISSIVE mode (malformed
    rows become nulls rather than failing the 1000-executor job)."""
    path = _ensure_export(spark, sf_dir, name, "csv")
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def json_table(
    spark: SparkSession, sf_dir: str, name: str, schema: T.StructType
) -> DataFrame:
    """G1 batch JSON (JSON-lines) scan with explicit schema."""
    path = _ensure_export(spark, sf_dir, name, "json")
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


@register(
    "csv_scan_customer_segments",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
    description="G1 CSV scan (explicit schema, no inference) -> segment rollup; "
    "oracle reads the same rows from parquet",
)
def csv_scan_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = csv_table(spark, sf_dir, "customer", CUSTOMER_SCHEMA)
    return cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        as_double(F.sum(money("c_acctbal"))).alias("total_acctbal"),
    )


@register(
    "json_scan_supplier_balance",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    description="G1 batch JSON scan (explicit schema) + broadcast dim join; "
    "oracle reads the same rows from parquet",
)
def json_scan_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = json_table(spark, sf_dir, "supplier", SUPPLIER_SCHEMA)
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            as_double(F.sum(money("s_acctbal"))).alias("total_acctbal"),
        )
    )


@register(
    "partitioned_parquet_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="G1 partitioned parquet WRITE + readback: orders written "
    "partitionBy(o_orderpriority), re-read through the partitioned layout "
    "(partition pruning plan-asserted in tests/test_partitioned_write.py)",
)
def partitioned_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-corpus write path: hive-style directory partitioning
    on a low-cardinality routing column, so downstream readers prune
    whole directories (PartitionFilters) instead of scanning 100 TB and
    filtering. Values must survive the write->read roundtrip exactly —
    the oracle aggregates the ORIGINAL table while this query aggregates
    the readback, so any loss in the partitioned layout fails the gate."""
    path = partitioned_orders_path(spark, sf_dir)
    back = spark.read.parquet(path)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        as_double(F.sum(money("o_totalprice"))).alias("sum_price"),
    )


def partitioned_orders_path(spark: SparkSession, sf_dir: str) -> str:
    """Write orders partitioned by o_orderpriority once per sf (idempotent
    via the _SUCCESS marker, same convention as _ensure_export)."""
    path = _export_path(sf_dir, "orders", "parquet_partitioned")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        load_table(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(path)
    return path


PART_SCHEMA = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)


@register(
    "xml_scan_part_brands",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_price,
           CAST(MAX(p_size) AS BIGINT) AS max_size
    FROM part
    GROUP BY p_brand
    """,
    description="G1 XML scan (Spark 4 native XML source, explicit schema, "
    "rowTag records) -> brand rollup; oracle reads the same rows from parquet",
)
def xml_scan_part_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fourth wire format on the G1 scan surface (parquet, CSV, JSON,
    XML): the part table exported once as <part> row elements and read
    back through the native XML reader with an explicit schema — like
    CSV/JSON, XML carries no row-group statistics, so this is the
    interchange path, never the analytical store."""
    path = _export_path(sf_dir, "part", "xml")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "part")
            .select([f.name for f in PART_SCHEMA.fields])
            .write.mode("overwrite")
            .format("xml")
            .option("rootTag", "parts")
            .option("rowTag", "part")
            .save(path)
        )
    part = (
        spark.read.format("xml")
        .option("rowTag", "part")
        .schema(PART_SCHEMA)
        .load(path)
    )
    return part.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        as_double(F.sum(money("p_retailprice"))).alias("total_price"),
        F.max("p_size").cast("bigint").alias("max_size"),
    )


@register(
    "orc_scan_order_priorities",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    description="G1 ORC scan: orders exported once to ORC and read back "
    "through the native reader — columnar with row-group statistics, so "
    "unlike CSV/JSON the status predicate pushes into the stripe scan "
    "(asserted in tests/test_sources.py); oracle reads the same rows "
    "from parquet",
)
def orc_scan_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_export(spark, sf_dir, "orders", "orc")
    orders = spark.read.orc(path)
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            as_double(F.sum(money("o_totalprice"))).alias("total_price"),
        )
    )


def _bucketed_table(
    spark: SparkSession, sf_dir: str, name: str, key: str, n_buckets: int = 8
) -> str:
    """Stage a fixture table as a BUCKETED external table (bucketBy +
    sortBy on the join key) once per session+fixture-fingerprint; the
    in-memory catalog entry is per-session, the files are cached in
    /tmp like every other staged export. Returns the table name."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    fp = fixture_fingerprint(sf_dir, name)
    tbl = f"{name}_bucketed_{tag}_{fp}".replace(".", "_").replace("-", "_")
    if not spark.catalog.tableExists(tbl):
        path = os.path.join(
            tempfile.gettempdir(),
            "spark_graft_bucketed",
            tag,
            f"{name}_{fp}",
        )
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    return tbl


def _register_bucketed_query() -> None:
    from pyspark.sql import functions as F

    from ..plans.registry import register

    @register(
        "bucketed_join_order_line_sizes",
        oracle="""
        WITH per_order AS (
            SELECT o_orderkey, o_orderstatus, COUNT(l_orderkey) AS n_lines
            FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderkey, o_orderstatus)
        SELECT o_orderstatus, n_lines,
               COUNT(*) AS n_orders
        FROM per_order
        GROUP BY o_orderstatus, n_lines
        ORDER BY o_orderstatus, n_lines
        """,
        description="exchange-free co-located join: orders and lineitem "
        "staged as bucketed+sorted tables on the join key, joined "
        "without any shuffle of either side (SortMergeJoin reads "
        "bucket-aligned files) — the bucketing scale utility as an "
        "oracle row; result is the order-size histogram per status",
    )
    def bucketed_join_order_line_sizes(spark, sf_dir: str):
        """Bucketing is THE layout lever for repeated big-big joins at
        100 TB: both fact tables are written bucketed+sorted on the
        join key, so the join is bucket-wise aligned with NO exchange
        on either side (pinned structurally in
        tests/test_skew_and_bucketing.py; here the RESULT goes under
        the oracle gate). The one-time bucketed write costs one
        shuffle — amortized across every subsequent join on that
        key."""
        ob = _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
        lb = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
        orders_b = spark.table(ob)
        lines_b = spark.table(lb)
        per_order = (
            orders_b.join(
                lines_b, F.col("l_orderkey") == F.col("o_orderkey"), "left"
            )
            .groupBy("o_orderkey", "o_orderstatus")
            .agg(F.count("l_orderkey").alias("n_lines"))
        )
        return (
            per_order.groupBy("o_orderstatus", "n_lines")
            .agg(F.count("*").alias("n_orders"))
            .orderBy("o_orderstatus", "n_lines")
        )


_register_bucketed_query()


@register(
    "csv_corrupt_quarantine_scan",
    oracle="""
    SELECT CAST(COUNT(CASE WHEN o_orderkey % 10 <> 0 THEN 1 END) AS BIGINT)
               AS n_good,
           CAST(COUNT(CASE WHEN o_orderkey % 10 = 0 THEN 1 END) AS BIGINT)
               AS n_corrupt,
           CAST(SUM(CASE WHEN o_orderkey % 10 <> 0
                    THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                              AS BIGINT) END) AS BIGINT) AS good_cents
    FROM orders
    """,
    description="S3/T8 per-record error isolation on the CSV path as an "
    "oracle row: a staged export corrupts every 10th row's price field, "
    "the PERMISSIVE reader quarantines them into _corrupt_record "
    "without failing the scan, and the good/corrupt counts + exact "
    "good-row cents must equal the corruption rule applied to the "
    "source table",
)
def csv_corrupt_quarantine_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE + _corrupt_record, the reference's try/except loop
    (consumer.py:125,177-185) as engine semantics.

    The stage deterministically mangles o_totalprice to a non-numeric
    token for o_orderkey % 10 == 0 (executor-side export, fingerprint-
    cached); the typed read then proves: (a) bad rows never kill the
    scan, (b) they are COUNTABLE and inspectable via _corrupt_record,
    (c) good rows parse to the exact same cents as the clean source.
    At 100 TB this is the difference between a nightly load failing at
    row 80 billion and a quarantine directory to triage.
    """
    path = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_exports",
        f"orders_corrupt_csv_{fixture_fingerprint(sf_dir)}",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        orders = load_table(spark, sf_dir, "orders")
        staged = orders.select(
            F.concat_ws(
                ",",
                F.col("o_orderkey"),
                F.when(
                    F.col("o_orderkey") % 10 == 0, F.lit("NOT_A_PRICE")
                ).otherwise(F.col("o_totalprice").cast("string")),
                F.col("o_orderpriority"),
            ).alias("value")
        )
        staged.write.mode("overwrite").text(path)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    good_cents = F.sum(
        F.when(
            F.col("_corrupt_record").isNull(),
            (money("o_totalprice") * 100).cast("bigint"),
        )
    )
    return df.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1))
        .cast("bigint")
        .alias("n_good"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1))
        .cast("bigint")
        .alias("n_corrupt"),
        good_cents.cast("bigint").alias("good_cents"),
    )
