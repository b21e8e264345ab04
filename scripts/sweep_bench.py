"""Full-registry timing sweep: run EVERY batch registry query into the
noop sink at the given sf_dir and print per-query seconds, slowest
first. The per-round feedback loop for finding perf regressions that
the curated headline set in bench.py would miss.

Usage: python scripts/sweep_bench.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_ingestion_amazon_kinesis_spark.plans.registry import QUERIES, _load_all
from stream_ingestion_amazon_kinesis_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    _load_all()
    spark = get_spark("sweep")

    # Warm the JVM/codegen/Arrow worker pool on the smallest fixture
    # (same families bench.py warms) so the alphabetically-first query
    # doesn't absorb session startup — without this the first entry
    # reads ~4x its real cost.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for warm_q in ("q1_pricing_summary", "ann_ivf_topk", "minhash_lsh_neardup"):
            QUERIES[warm_q].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(QUERIES):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # noqa: BLE001 - sweep must finish
            errors[name] = f"{type(ex).__name__}: {ex}"[:200]

    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"{sec:8.2f}  {name}")
    print(json.dumps({"total": round(sum(timings.values()), 2), "n": len(timings)}))
    for name, err in errors.items():
        print(f"ERR {name}: {err}")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
