"""Runtime bloom-filter join pruning (the 100 TB shuffle reducer).

When a large fact table joins a selectively-filtered build side, Spark
can inject a bloom filter built from the build side's join keys into the
probe side's scan (`might_contain(...)`), dropping non-matching fact
rows BEFORE the shuffle. On a 100 TB lineitem a 1%-selective orders
filter means ~99% of shuffle bytes never leave the mappers.

The optimization is size-gated (creation side < threshold, probe side
scan > threshold), so the tiny fixtures need the thresholds lowered to
observe it; on a real cluster the defaults (10MB / 10GB) apply
unchanged. These tests pin (a) the filter is actually injected into the
optimized plan and (b) it never changes results.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table


def _selective_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # ~1/5-priority selective build side; join key o_orderkey == l_orderkey
    sel = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return li.join(sel, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
        "o_orderpriority"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("qty"),
    )


def test_bloom_filter_injected_and_result_unchanged(spark, sf_dir):
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # Force a non-broadcast join (broadcast joins don't need the bloom
        # filter — the build side ships whole) and drop the size gates so
        # the fixture-scale tables qualify.
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        df = _selective_join(spark, sf_dir)
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized, optimized[:2000]
        with_filter = {tuple(r) for r in df.collect()}

        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        without = {tuple(r) for r in _selective_join(spark, sf_dir).collect()}
        assert with_filter == without
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
