"""G1: file-format scans beyond parquet — CSV/JSON with explicit
schemas roundtrip losslessly through the engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table


def test_csv_roundtrip_with_explicit_schema(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_csv")
    orders.write.option("header", True).csv(path)
    back = spark.read.schema(orders.schema).option("header", True).csv(path)
    assert back.schema == orders.schema
    a = orders.agg(F.count("*"), F.sum("o_orderkey"), F.max("o_orderdate")).first()
    b = back.agg(F.count("*"), F.sum("o_orderkey"), F.max("o_orderdate")).first()
    assert a == b


def test_json_roundtrip_with_explicit_schema(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_json")
    # default JSON timestampFormat truncates to milliseconds; spell out
    # microseconds to keep the roundtrip lossless
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    events.write.option("timestampFormat", fmt).json(path)
    back = spark.read.schema(events.schema).option("timestampFormat", fmt).json(path)
    assert back.schema == events.schema
    a = events.agg(F.count("*"), F.sum("event_id"), F.max("ts")).first()
    b = back.agg(F.count("*"), F.sum("event_id"), F.max("ts")).first()
    assert a == b


def test_parquet_scan_prunes_and_pushes_down(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]" in plan
    # column pruning: the scan must read only the two referenced columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_csv_scan_query_prunes_columns(spark, sf_dir):
    """The registered CSV scan must read only referenced columns
    (ReadSchema pruning — CSV has no row-group stats, so pruning is the
    only free win the reader offers)."""
    from stream_ingestion_amazon_kinesis_spark.sources.file_formats import (
        csv_scan_customer_segments,
    )

    q = csv_scan_customer_segments(spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "FileScan csv" in plan
    assert "ReadSchema: struct<c_acctbal:double,c_mktsegment:string>" in plan


def test_registered_format_scans_match_parquet(spark, sf_dir):
    """CSV and JSON scans see exactly the rows the parquet fixture has."""
    from stream_ingestion_amazon_kinesis_spark.sources.file_formats import (
        CUSTOMER_SCHEMA,
        SUPPLIER_SCHEMA,
        csv_table,
        json_table,
    )

    cust_pq = load_table(spark, sf_dir, "customer")
    cust_csv = csv_table(spark, sf_dir, "customer", CUSTOMER_SCHEMA)
    assert cust_csv.count() == cust_pq.count()
    assert cust_csv.exceptAll(cust_pq).count() == 0
    supp_pq = load_table(spark, sf_dir, "supplier")
    supp_json = json_table(spark, sf_dir, "supplier", SUPPLIER_SCHEMA)
    assert supp_json.count() == supp_pq.count()
    assert supp_json.exceptAll(supp_pq).count() == 0


def test_spread_is_noop_when_scan_already_parallel(spark):
    from stream_ingestion_amazon_kinesis_spark.sources.catalog import spread

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10000, 1, numPartitions=par * 2)
    assert spread(wide) is wide  # no extra exchange on many-split layouts
    narrow = spark.range(0, 10000, 1, numPartitions=1)
    assert spread(narrow).rdd.getNumPartitions() == par


def test_orc_scan_pushes_down_and_prunes(spark, sf_dir):
    """The ORC path must behave like parquet: the status predicate
    reaches the stripe scan (PushedFilters) and only the referenced
    columns are read (ReadSchema)."""
    from stream_ingestion_amazon_kinesis_spark.sources.file_formats import (
        orc_scan_order_priorities,
    )

    q = orc_scan_order_priorities(spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "FileScan orc" in plan
    assert "EqualTo(o_orderstatus,F)" in plan
    assert (
        "ReadSchema: struct<o_orderstatus:string,o_totalprice:double,o_orderpriority:string>"
        in plan
    ), plan[plan.find("ReadSchema") : plan.find("ReadSchema") + 200]


def test_fixture_fingerprint_tracks_regeneration(tmp_path):
    """Staging caches key on this fingerprint; it must change whenever
    the fixture file content/mtime changes (the driver has regenerated
    fixtures mid-round twice) and stay stable otherwise."""
    import os
    import time

    from stream_ingestion_amazon_kinesis_spark.sources.catalog import (
        fixture_fingerprint,
    )

    sf = tmp_path / "sfX"
    sf.mkdir()
    p = sf / "events.parquet"
    p.write_bytes(b"v1")
    f1 = fixture_fingerprint(str(sf))
    assert f1 == fixture_fingerprint(str(sf))  # stable
    time.sleep(0.01)
    p.write_bytes(b"v2-longer")
    assert fixture_fingerprint(str(sf)) != f1  # size change
    stat = os.stat(p)
    os.utime(p, ns=(stat.st_atime_ns, stat.st_mtime_ns + 1_000_000))
    f3 = fixture_fingerprint(str(sf))
    os.utime(p, ns=(stat.st_atime_ns, stat.st_mtime_ns))
    assert f3 != fixture_fingerprint(str(sf))  # mtime-sensitive


def test_load_table_instants_independent_of_session_tz(spark, sf_dir):
    """ADVICE r2 regression pin: the NTZ->instant normalization must be
    pure wall-clock arithmetic — changing the session timezone AFTER
    load (as a shared verification driver might) can never shift the
    stored instants."""
    from pyspark.sql import functions as F

    from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table

    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        # Build the plan ONCE, then act on it under different session
        # timezones: lazy expressions read confs at ACTION time, so a
        # tz-dependent cast (the pre-fix implementation) would yield
        # different instants here.
        plan = load_table(spark, sf_dir, "orders").select(
            F.unix_micros("o_orderdate").alias("u")
        ).orderBy("u").limit(5)
        base = [r.u for r in plan.collect()]
        for tz in ("America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert [r.u for r in plan.collect()] == base, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
