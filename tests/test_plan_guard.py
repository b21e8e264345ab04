"""Registry-wide physical-plan guard.

Builds (without executing) every batch query's plan and rejects the two
shapes that silently detonate at 100 TB: CartesianProduct and
BroadcastNestedLoopJoin — except where a non-equi join against a
BOUNDED broadcast side is the intended design (whitelist below, each
with the reason). Catches a future edit that drops a join key or breaks
a broadcast hint long before any benchmark notices.
"""

from __future__ import annotations

import pytest

from stream_ingestion_amazon_kinesis_spark.plans.registry import QUERIES, _load_all

_load_all()  # populate QUERIES before the parametrize list is built

# Queries whose FUNCTION already executes work (streaming engines, sinks,
# cache materialization) — their plan is validated by their own oracle
# run, and building them here would re-run that work.
SIDE_EFFECT = {
    "streaming_tumbling_counts_live",
    "streaming_sliding_counts_live",
    "streaming_csv_counts_live",
    "streaming_static_enrich_live",
    "streaming_session_window_live",
    "streaming_interval_join_live",
    "streaming_kinesis_sim_live",
    "streaming_dedup_live",
    "streaming_append_watermark_live",
    "streaming_chained_windows_live",
    "streaming_dedup_then_window_live",
    "streaming_full_outer_interval_join_live",
    "streaming_join_then_window_live",
    "streaming_outer_interval_join_live",
    "streaming_rest_pages_live",
    "streaming_union_sources_live",
    "streaming_foreachbatch_topk_live",
    "streaming_restart_resume_live",
    "streaming_availablenow_live",
    "streaming_custom_session_timeout_live",
    "streaming_session_variable_gap_live",
    "streaming_scd2_pointintime_live",
    "streaming_observe_quality_live",
    "sql_ddl_ctas_insert_roundtrip",
    "binaryfile_scan_media",
    "csv_corrupt_quarantine_scan",
    "rest_page_scan_documents",
    "orc_scan_order_priorities",
    "kinesis_sim_roundtrip",
    "csv_scan_customer_segments",
    "json_scan_supplier_balance",
    "xml_scan_part_brands",
    "partitioned_parquet_roundtrip",
}

# name -> why a nested-loop/broadcast-nested-loop join is intentional:
# the inner side is bounded (scalar aggregate, centroid table, query
# set, band dims), so the "nested loop" is a broadcast lookup, not a
# data-sized cross product.
BNLJ_OK = {
    "range_join_price_bands",  # non-equi join vs broadcast band dims
    "ann_topk_cosine",  # corpus x broadcast 8-query set (by design O(N*Q))
    "ann_hard_negatives",  # corpus x broadcast 8-query set, label non-equi
    "ann_range_search_cosine",  # corpus x broadcast 8-query set (radius)
    "knn_label_accuracy",  # all-pairs eval harness by design; production
    # path is the IVF cell join (see docstring)
    "ann_ivf_topk",  # corpus x broadcast centroid/probe sets
    "ann_srp_topk",  # candidates x broadcast query embeddings
    "embedding_neardup_ivf",  # corpus x broadcast centroids (assignment)
    "q11_important_stock_share",  # scalar global-total threshold subquery
    "q22_global_balance_cohort",  # scalar global-average threshold subquery
    "q17_small_quantity_revenue",  # per-part avg scalar compare
    "salted_agg_user_totals",  # replicated-dim salt join (bounded salts)
    "asof_join_purchase_last_click",  # bounded non-equi fallback path
    "domain_mix_weights",  # per-source weights vs broadcast totals row
    "mixture_epoch_expansion",  # per-source repeats vs broadcast totals row
    "curation_pipeline_stats",  # single-row threshold relation
    "stratified_sample_documents",  # bounded per-stratum rate relation
    "contamination_ngram_overlap",  # broadcast benchmark gram dictionary
    "time_gap_fill_hours",  # hour spine from a single aggregate row
    "median_mode_acctbal",  # broadcast 5-row mode relation
    "tfidf_top_terms",  # crossJoin of the single-row corpus count N
    "funnel_multistep_strict",  # 4 single-row stage counts cross-combined
    "incremental_neardup_new_vs_old",  # 1-row median-split broadcast
    "dense_monthly_nation_report",  # bounded nation x month spine grid
    "decile_lift_purchases",  # crossJoin of the single-row conversion total
    "collocation_pmi_top20",  # crossJoin of the single-row totals (N, M)
    "benford_digit_audit_orders",  # crossJoin of the single-row total count
    "association_rules_parts",  # crossJoin of the single-row basket count
    "sparse_retrieval_top5",  # crossJoins of single-row totals + query-doc id
    "bm25_retrieval_topk",  # crossJoin of the single-row corpus stats (S, N)
    "hybrid_rrf_retrieval",  # single-row corpus stats + single-row query vec
    "key_skew_audit_lineitem",  # crossJoin of the single-row total
    "referential_integrity_audit",  # crossJoins of single-row counts per FK edge
    "sequence_packing_bins",  # bounded per-source offsets relation
    "training_shard_assignment",  # bounded shard stats relation
    "autocorr_hourly_counts",  # hour spine x broadcast 5-type relation
    "seasonal_naive_backtest",  # hour spine x broadcast 5-type relation
    "length_dist_drift_by_source",  # sources x 10-bucket broadcast grid
    "attribution_window_sensitivity",  # staleness x broadcast 3-row window dim
    "weekly_mix_drift",  # weeks x broadcast 5-type histogram grid
    "equi_depth_deciles_distributed",  # crossJoin of the single-row total count
}


@pytest.mark.parametrize(
    "name", [n for n in sorted(QUERIES) if n not in SIDE_EFFECT] or ["_"]
)
def test_no_accidental_cartesian_or_nested_loop(spark, sf_dir, name):
    _load_all()
    if name == "_":
        pytest.skip("registry empty")
    plan = (
        QUERIES[name]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in BNLJ_OK:
        assert (
            "BroadcastNestedLoopJoin" not in plan
        ), f"{name}: unexpected nested-loop join"
