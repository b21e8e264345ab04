"""Partition-count invariance of compared results.

The engine's determinism contract: every oracle-compared value is
either exact-decimal aggregation, integer fixed-point, or an
int-derived double — so the SAME query produces bit-identical results
whether it runs on 1 shuffle partition or 32 (and, transitively, on a
1000-executor cluster vs the single-threaded DuckDB oracle). This test
executes representative money/ratio/window queries under shuffle
partition counts 1, 3, and 32 and requires identical sorted rows —
the local proof of the cross-scale claim.
"""

from __future__ import annotations

from stream_ingestion_amazon_kinesis_spark.plans.registry import QUERIES, _load_all

# One per arithmetic family: decimal sums + avgs (q1), ppm fixed-point
# over a window hierarchy, cumulative decimal windows over a full outer
# join, covariance-numerator int64 products.
REPRESENTATIVES = [
    "q1_pricing_summary",
    "hierarchy_share_of_parent",
    "tpcds_window_channel_crossover",
    "timeseries_comovement_pairs",
    # round-3 continuation families: island-merge windows over tied
    # timestamps, mean-centered integer autocorrelation, decimal(38,0)
    # power-iteration ranking, min_by/max_by struct-ordered OHLC
    "interval_merge_coverage",
    "autocorr_hourly_counts",
    "pca_power_iteration_topdims",
    "ohlc_hourly_bars",
    # session-6 families: dynamic-gap interval-union sessions, integer
    # ppm min-max bucketing, global-rank Spearman arithmetic
    "session_window_variable_gap",
    "minmax_scaled_histogram",
    "spearman_price_quantity",
    # round-4: mapInPandas codec roundtrip — integer unit sums must not
    # depend on how docs land in Arrow batches/partitions
    "multimodal_real_decode_stats",
    # round-8 additions: integer-quantized Lloyd iterations (truncating
    # integer centroid means must not see partial-agg order), greedy MMR
    # over per-query Arrow groups
    "kmeans_lloyd_clusters",
    "mmr_diversified_topk",
    # round-9 additions: integer-Gram SemDeDup prune (numpy int64 matmul
    # per cluster group), md5-affine MinHash signatures, exact-regime
    # IVF/SRP/PQ (quantized-cosine and ADC ranking must not see Arrow
    # batch or partial-agg boundaries)
    "semdedup_cluster_prune",
    "minhash_lsh_neardup",
    "ann_ivf_topk",
    "ann_srp_topk",
    "ann_pq_adc_topk",
    # round-10: two-level IVF — the fine-centroid equi-join and the
    # partitioned fine-init rank must not see partition boundaries;
    # the custom exact-oracle sketches (register max-merge / counter
    # sums must be partial-agg-order blind)
    "ann_ivf2_topk",
    "hll_custom_exact_distinct",
    "cms_custom_exact_frequencies",
]


def _rows(spark, name, sf_dir):
    df = QUERIES[name].fn(spark, sf_dir)
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_results_invariant_under_shuffle_partition_count(spark, sf_dir):
    _load_all()
    baseline = {}
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in ("32", "3", "1"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for name in REPRESENTATIVES:
                got = _rows(spark, name, sf_dir)
                if name in baseline:
                    assert got == baseline[name], (
                        f"{name}: result changed between shuffle partition "
                        f"counts — non-deterministic aggregation"
                    )
                else:
                    baseline[name] = got
                    assert got, f"{name}: empty result"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
