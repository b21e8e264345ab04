"""AQE skew-join handling: prove the session's conf actually splits a
skewed shuffle partition at runtime.

The engine leans on `spark.sql.adaptive.skewJoin.enabled` (session.py)
as the production answer to hot keys in shuffle joins (the alternative,
manual salting, is implemented for aggregation in
`salted_agg_user_totals`). Nothing pinned that the knob WORKS — a conf
typo or a Spark default change would silently degrade every skewed join
back to a straggler task. This test builds a join whose left side is
dominated by one hot key, shrinks the AQE skew thresholds so the hot
partition qualifies at fixture scale, and asserts the final adaptive
plan marked the sort-merge join `skew=true` (i.e. the hot partition was
split into parallel sub-partitions instead of one straggler task).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join_partition(spark):
    skew_confs = {
        # Make the hot partition qualify as skewed at test scale; in
        # production these stay at their defaults (256 MB / 5x median).
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # Force a sort-merge join: broadcast would hide the skew path.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # Keep coalescing from merging away the small partitions and
        # masking the size contrast.
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in skew_confs}
    try:
        for k, v in skew_confs.items():
            spark.conf.set(k, v)

        # 1 hot key (id=0) with ~200k fat rows + 1k uniform keys. The pad
        # column is non-foldable (sha2 of the row id — a literal pad gets
        # constant-folded out of the shuffle entirely) and aggregated
        # downstream so column pruning cannot drop it — the hot shuffle
        # partition stays fat enough to qualify as skewed.
        left = (
            spark.range(0, 201_000)
            .withColumn(
                "k", F.when(F.col("id") < 200_000, F.lit(0)).otherwise(F.col("id") - 199_999)
            )
            .withColumn("pad", F.sha2(F.col("id").cast("string"), 256))
        )
        right = spark.range(0, 1_001).withColumnRenamed("id", "k").withColumn(
            "rv", F.col("k") * 2
        )
        joined = left.join(right, "k").groupBy().agg(
            F.count("*").alias("n"),
            F.sum("rv").alias("s"),
            F.sum(F.length("pad")).alias("pad_bytes"),
        )
        [row] = joined.collect()
        # Correctness first: every left row has a match.
        assert row["n"] == 201_000
        assert row["pad_bytes"] == 201_000 * 64  # sha2-256 hex is 64 chars
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE did not mark the hot partition skewed; skew-join handling "
            "is not active. Final plan:\n" + plan[:4000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
