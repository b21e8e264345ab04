"""Warm per-query timing: median of 3 noop-sink runs after 1 warm-up,
with a calibration probe, for A/B comparison during optimization.

Usage: python scripts/time_query.py [sf_dir] query [query ...]
Prints one line per query: <median>s (runs...) cal=<calibration>
Set TIME_QUERY_REBUILD=1 to rebuild the DataFrame per run (times the
plan-build/eager-checkpoint cost too — the sweep_bench basis).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _calibration_probe
from stream_ingestion_amazon_kinesis_spark.plans.registry import (
    QUERIES,
    _load_all,
    release_cached,
)
from stream_ingestion_amazon_kinesis_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    rebuild = os.environ.get("TIME_QUERY_REBUILD") == "1"
    _load_all()
    spark = get_spark("time-query")
    warm_dir = "/root/testdata/sf0.001"
    for name in args:
        if os.path.isdir(warm_dir):
            QUERIES[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            release_cached(spark)
    cal = _calibration_probe(spark)
    for name in args:
        runs = []
        for i in range(4):
            t0 = time.perf_counter()
            df = QUERIES[name].fn(spark, sf_dir)
            if not rebuild:
                t0 = time.perf_counter()  # bench basis: build untimed
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            del df
            release_cached(spark)
        med = round(statistics.median(runs[1:]), 3)
        print(f"{name}: {med}s runs={runs} cal={cal}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
