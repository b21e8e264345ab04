"""Registry-wide physical-plan guard.

Builds (without executing) every batch query's plan and rejects the
shapes that silently detonate at 100 TB:

1. CartesianProduct and BroadcastNestedLoopJoin — except where a
   non-equi join against a BOUNDED broadcast side is the intended
   design (BNLJ_OK below, each with the reason).
2. GLOBAL (unpartitioned, ordered) WindowExec — the "move all data to
   a single partition" plan — except over relations that are bounded
   by construction: the `_bkt` offset relations of
   `_distributed_rank`/`_distributed_prefix` (one row per range
   bucket, detected structurally) and the explicit GLOBAL_WINDOW_OK
   whitelist (time grids, category grids, post-limit slices, labeled
   audit twins — each entry names why its input is bounded).

Catches a future edit that drops a join key, breaks a broadcast hint,
or reintroduces a corpus-sized single-partition sort long before any
benchmark notices.
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
    "streaming_quality_funnel_live",
    "streaming_hll_distinct_live",
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
    "ann_matryoshka_truncation_recall",  # corpus x broadcast 8-query set
    # (two rankings in one pass; O(N*Q) baseline by design, like
    # ann_topk_cosine — the IVF entries are the indexed path)
    "knn_label_accuracy",  # all-pairs eval harness by design; production
    # path is the IVF cell join (see docstring)
    "ann_ivf_topk",  # corpus x broadcast centroid/probe sets
    "ann_ivf2_topk",  # queries x broadcast k1-row COARSE centroids only
    # (the C-row fine table reaches the corpus via equi-join, by design)
    "ann_srp_topk",  # candidates x broadcast query embeddings
    "embedding_neardup_ivf",  # corpus x broadcast centroids (assignment)
    "kmeans_lloyd_clusters",  # corpus x broadcast K(8)-row centroid table
    "semdedup_cluster_prune",  # corpus x broadcast K(~sqrt N)-row centroids
    "mmr_diversified_topk",  # corpus x broadcast 8-query set (candidate fetch)
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
    "q15_top_supplier",  # crossJoin of the single-row max-revenue scalar
    "order_backlog_aging",  # crossJoin of the single-row as-of max(date)
    "early_value_retention_curve",  # crossJoin of the single-row cohort count
    "rfm_segmentation_counts",  # crossJoin of the single-row customer count
    "decile_lift_purchases",  # crossJoins of single-row totals (n_tot, total_conv)
    "median_order_by_customer_decile",  # crossJoin of the single-row customer count
    "pareto_cutpoint_customers",  # crossJoin of the single-row totals row
    "epoch_shuffle_audit",  # crossJoin of the single-row corpus count
    "token_budget_selection",  # crossJoin of the single-row token total
    "bloom_membership_audit",  # crossJoin of the single-row n_bits_set
    "kmv_distinct_setops",  # crossJoins of single-row sketch stats
    # (theta/match/exact-intersection scalars) + broadcast <=k-row sketch
    "curriculum_token_phases",  # crossJoin of the single-row token total
    "bpe_encode_token_stats",  # K chained 1-row merge-RULE broadcasts:
    # each un-checkpointed merge round crossJoins the vocabulary against
    # its round's already-materialized 1-row rule relation (bounded by
    # construction — see bpe_apply_merge), and this query's vocabulary
    # chain keeps up to 3 of those rounds un-checkpointed, so they
    # surface as BroadcastNestedLoopJoin here while bpe_merge_training's
    # fully-checkpointed plan hides them (its round-0 shapes are pinned
    # via EXTRA_PLAN_BUILDERS instead)
}


# name -> why the query's global (unpartitioned, ordered) window input
# is bounded. Every entry must name the bound; anything not listed here
# (and not a `_bkt` offset window, allowed structurally) fails the
# guard.
GLOBAL_WINDOW_OK = {
    # category / rollup grids — input cardinality is a key-domain product
    "chi2_priority_status": "contingency cells: |priorities| x |statuses|",
    "hierarchy_share_of_parent": "share-of-total over the |regions| rollup",
    "revenue_share_of_total": "share-of-total over the |nations| rollup",
    "price_depth_ladder": "reverse cumsum over the dollar-level ladder "
    "(bounded price domain)",
    # time grids — one row per calendar unit, bounded by the data's span
    "cumulative_unique_users_hourly": "running sum over the hourly grid",
    "skyline_orders_price_date": "running max over the per-date grid",
    "tpcds_window_channel_crossover": "cumsum over the month grid",
    "user_lifecycle_growth_accounting": "lag over the weekly grid",
    "weekly_revenue_growth": "lag over the weekly grid",
    # post-limit slices — window input follows a TakeOrderedAndProject
    "zipf_conformity_top_terms": "rank over the 20-row top-terms slice",
    "two_hop_reach_centrality": "rank over the 30-row top-score slice",
    "tpcds_return_ratio_top_parts": "RANK over the 100-row headroom slice",
    "hybrid_rrf_retrieval": "rank over per-arm top-50 slices",
    "decile_lift_purchases": "cumsum over the 10-row decile relation",
    # bounded by a fixed model/schema dimension
    "pca_power_iteration_topdims": "rank over the EMB_DIM(64)-row "
    "dimension relation",
    "dsir_importance_weights": "unordered totals window over the "
    "<=256-row hashed-bucket stats relation (fixed feature width)",
    # labeled audit twins / demonstration anchors — the scale-safe form
    # is registered separately and checked against the SAME oracle
    "equi_depth_deciles_price": "audit twin of "
    "equi_depth_deciles_distributed (single-sort exact histogram)",
    "spearman_price_quantity": "audit twin of "
    "spearman_distributed_price_quantity",
    "late_data_audit_hourly": "audit anchor; scale-safe twin is "
    "late_data_audit_per_shard",
    "window_rank_dense_ntile": "G8 SQL-surface demonstration over the "
    "supplier dim (documented WindowExec-warning anchor)",
}


def _top_level_groups(line: str) -> list[str]:
    """The top-level [...] groups of a plan line (brackets nest)."""
    depth, out, cur = 0, [], []
    for ch in line:
        if ch == "[":
            depth += 1
            if depth > 1:
                cur.append(ch)
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        elif depth >= 1:
            cur.append(ch)
    return out


def global_window_lines(plan: str) -> list[str]:
    """Plan lines whose Window node has NO partition spec.

    Window prints as `Window [exprs], [partition], [order]` when both
    specs exist; with only one spec present the second group is the
    order spec iff it carries sort directions (`ASC`/`DESC NULLS`),
    else it is a partition-only window (fine at scale — partitioned
    execution). A single group means partitionBy() with no order —
    also global. `_bkt` offset windows (the bounded one-row-per-range-
    bucket relation inside _distributed_rank/_distributed_prefix) are
    allowed structurally.
    """
    hits = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-:* ").strip()
        if not s.startswith("Window "):
            continue
        if "windowspecdefinition(_bkt#" in line:
            continue  # distributed-prefix offset relation: bounded
        groups = _top_level_groups(line)
        if len(groups) >= 3:
            continue  # partitioned + ordered
        if len(groups) == 2 and not (
            "ASC NULLS" in groups[1] or "DESC NULLS" in groups[1]
        ):
            continue  # partition-only
        hits.append(s[:160])
    return hits


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
    if name not in GLOBAL_WINDOW_OK:
        glb = global_window_lines(plan)
        assert not glb, (
            f"{name}: global (single-partition) window over an unlisted "
            f"relation — move the order into a bounded slice "
            f"(orderBy+limit), use _distributed_rank/_distributed_prefix, "
            f"or whitelist with the boundedness reason: {glb[0]}"
        )


# Pre-checkpoint intermediate plans (verdict r9 #2): operators that
# eagerly localCheckpoint their rounds lineage-truncate the real
# join/agg shapes out of the registry-wide check above. Their builders
# register in EXTRA_PLAN_BUILDERS; `::merge0`-style stages that
# intentionally crossJoin a BOUNDED broadcast side are listed here with
# the reason, exactly like BNLJ_OK.
EXTRA_BNLJ_OK = {
    "bpe_merge_training::merge0": "vocabulary x broadcast 1-row merge "
    "rule (argmax of the pair counts — LIMIT 1 by construction)",
}


def test_extra_plan_builders_guarded(spark, sf_dir):
    from stream_ingestion_amazon_kinesis_spark.plans.registry import (
        EXTRA_PLAN_BUILDERS,
    )

    _load_all()
    assert EXTRA_PLAN_BUILDERS, "expected registered intermediate plans"
    for name, fn in sorted(EXTRA_PLAN_BUILDERS.items()):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        if name not in EXTRA_BNLJ_OK:
            assert (
                "BroadcastNestedLoopJoin" not in plan
            ), f"{name}: unexpected nested-loop join"
        glb = global_window_lines(plan)
        assert not glb, f"{name}: global window over unlisted relation: {glb[0]}"


def test_bpe_round0_shapes(spark, sf_dir):
    """The BPE per-round plans the operator's eager checkpoints hide:
    the rule is ONE map-side-combined hash aggregate + TakeOrdered (no
    global sort), and the merge is the vocabulary against a BROADCAST
    1-row rule (never a shuffled join)."""
    from stream_ingestion_amazon_kinesis_spark.plans.registry import (
        EXTRA_PLAN_BUILDERS,
    )

    _load_all()
    pairs = EXTRA_PLAN_BUILDERS["bpe_merge_training::pairs0"](spark, sf_dir)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert plan.count("HashAggregate") >= 2, "expected partial+final agg"
    assert "Sort " not in plan, "argmax must not global-sort the pairs"
    merge = EXTRA_PLAN_BUILDERS["bpe_merge_training::merge0"](spark, sf_dir)
    mplan = merge._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in mplan, mplan[:2000]
    # 5 shuffles in the UN-checkpointed composition: both branches
    # rebuild the word-frequency relation (spread + word groupBy each;
    # the real operator's seqs checkpoint dedupes that) + the pair-agg
    # exchange. Exact counts are pinned in plan_pins.json; this bound
    # only catches a structural blowup (e.g. the broadcast hint lost ->
    # a shuffled join appears).
    assert mplan.count("Exchange") - mplan.count("BroadcastExchange") <= 5
