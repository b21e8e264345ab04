"""Dynamic partition pruning must fire on the partitioned-layout path.

At 100 TB the month-partitioned fact table is only useful if a join
against a filtered dimension prunes partitions at RUNTIME (the filter
value isn't known at compile time). This pins the DPP subquery in the
physical plan so a future session-conf or layout change can't silently
turn the partitioned scan back into a full scan.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.sources.catalog import (
    fixture_fingerprint,
    load_table,
)


def test_dpp_subquery_in_plan(spark, sf_dir):
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_dpp",
        f"events_{fixture_fingerprint(sf_dir)}",
    )
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        events = load_table(spark, sf_dir, "events")
        events.withColumn(
            "month", F.date_format("ts", "yyyy-MM")
        ).write.mode("overwrite").partitionBy("month").parquet(base)
    fact = spark.read.parquet(base)
    dim = (
        fact.select("month")
        .distinct()
        .withColumn("is_target", F.col("month").endswith("-01"))
    )
    joined = fact.join(dim.filter(F.col("is_target")), "month").groupBy(
        "month"
    ).count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:3000]
