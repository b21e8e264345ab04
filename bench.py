"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query executes its full plan into the `noop` sink (no driver-side
collect, no disk write) — measuring scan + compute + shuffle, which is
what scales.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stream_ingestion_amazon_kinesis_spark.plans.registry import QUERIES, _load_all
from stream_ingestion_amazon_kinesis_spark.session import get_spark

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
    "rollup_nation_priority",
    "topk_orders_by_price",
    # flagship ETL + windows
    "flagship_session_enrichment",
    "window_running_total_per_customer",
    "tumbling_window_events",
    "session_window_events",
    "asof_join_purchase_last_click",
    # LLM-data-pipeline ops
    "exact_dedup_documents",
    "minhash_lsh_neardup",
    "ann_topk_cosine",
    "document_quality_scores",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _load_all()
    spark = get_spark("bench")

    # Warm the JVM/codegen on the smallest fixture so per-query timings
    # measure execution, not first-call JIT — one representative per
    # plan family (agg/join, LSH join tree, vector fold).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for warm_q in ("q1_pricing_summary", "minhash_lsh_neardup", "ann_topk_cosine"):
            QUERIES[warm_q].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
