"""Structural properties of the dominance/graph/prefix-filter operators
beyond their oracle checks: the oracle proves the RESULT; these prove
the SHAPE claims the docstrings make (candidate pruning actually
prunes, the skyline frontier is monotone, triangle corner counts are
consistent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.operators.analytics import (
    skyline_orders_price_date,
)
from stream_ingestion_amazon_kinesis_spark.operators.dedup import (
    _doc_tokens,
    jaccard_neardup_pairs,
    prefix_filter_jaccard_pairs,
)
from stream_ingestion_amazon_kinesis_spark.operators.graph import (
    triangle_count_parts,
)
from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table


def test_prefix_filter_prunes_candidates(spark, sf_dir):
    """The prefix self-join must generate strictly fewer candidate
    pairs than the full token self-join while returning the identical
    result set (the oracle checks equality to the same SQL; here we
    check both engines' DataFrames against each other and count the
    candidate volumes)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = _doc_tokens(docs)
    a, b = tok.alias("a"), tok.alias("b")
    full_candidates = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )

    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    dfreq = tok.groupBy("source", "token").agg(F.count("*").alias("df"))
    from pyspark.sql.window import Window

    ranked = (
        tok.join(dfreq, ["source", "token"])
        .join(sizes, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "token")),
        )
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("n_tok") - F.expr("(4*n_tok + 4) div 5") + 1
    ).select("doc_id", "source", "token")
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    prefix_candidates = (
        pa.join(
            pb,
            (F.col("pa.source") == F.col("pb.source"))
            & (F.col("pa.token") == F.col("pb.token"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(F.col("pa.doc_id"), F.col("pb.doc_id"))
        .distinct()
        .count()
    )
    assert prefix_candidates < full_candidates

    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_filter_jaccard_pairs(spark, sf_dir).collect()
    }
    want = {
        (r.doc_a, r.doc_b) for r in jaccard_neardup_pairs(spark, sf_dir).collect()
    }
    assert got == want


def test_skyline_frontier_is_monotone(spark, sf_dir):
    """The defining invariant: no skyline point dominates another —
    checked pairwise on the (small) result set."""
    rows = skyline_orders_price_date(spark, sf_dir).collect()
    assert rows, "skyline cannot be empty on non-empty input"
    for i, r in enumerate(rows):
        for s in rows[i + 1 :]:
            dominated = (
                s.o_orderdate <= r.o_orderdate
                and s.o_totalprice >= r.o_totalprice
                and (
                    s.o_orderdate < r.o_orderdate
                    or s.o_totalprice > r.o_totalprice
                )
            )
            dominates = (
                r.o_orderdate <= s.o_orderdate
                and r.o_totalprice >= s.o_totalprice
                and (
                    r.o_orderdate < s.o_orderdate
                    or r.o_totalprice > s.o_totalprice
                )
            )
            assert not dominated and not dominates


def test_triangle_counts_sum_divisible_by_three(spark, sf_dir):
    """Every triangle contributes exactly one count to each of its
    three corners, so the per-supplier counts must sum to 3x the
    number of triangles."""
    df = triangle_count_parts(spark, sf_dir)
    total = df.agg(F.sum("n_triangles")).collect()[0][0]
    assert total is not None and total % 3 == 0 and total > 0


def test_distributed_rank_matches_global_window(spark, sf_dir):
    """_distributed_rank must equal row_number() OVER (ORDER BY key)
    row-for-row — the decomposition (literal bucket boundaries + local
    rank + bucket offsets) is only correct if both subtrees see the
    SAME bucket assignment. The first cut used repartitionByRange and
    failed exactly this test at sf0.01: RangePartitioner samples with
    a per-RDD seed, so the offset subtree computed different ranges
    than the main subtree whenever exchange reuse didn't fire."""
    from pyspark.sql.window import Window

    from stream_ingestion_amazon_kinesis_spark.operators.analytics import (
        _distributed_rank,
    )
    from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    cols = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    dr = _distributed_rank(li, cols, "rp_d")
    wr = li.withColumn(
        "rp_w", F.row_number().over(Window.orderBy(*cols)).cast("bigint")
    )
    joined = dr.join(
        wr, ["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"]
    )
    n = li.count()
    assert joined.count() == n
    assert joined.filter(F.col("rp_d") != F.col("rp_w")).count() == 0


def test_distributed_twins_agree_with_audit_forms(spark, sf_dir):
    """The scale-safe forms must be value-identical to their
    single-sort audit twins — same rows, same bytes (both also run
    against the same DuckDB oracle; this pins the pair to each other
    so a future edit can't drift one silently)."""
    from stream_ingestion_amazon_kinesis_spark.plans.registry import (
        QUERIES,
        _load_all,
    )

    _load_all()
    for exact, dist in [
        ("equi_depth_deciles_price", "equi_depth_deciles_distributed"),
        ("spearman_price_quantity", "spearman_distributed_price_quantity"),
    ]:
        a = sorted(map(tuple, QUERIES[exact].fn(spark, sf_dir).collect()))
        b = sorted(map(tuple, QUERIES[dist].fn(spark, sf_dir).collect()))
        assert a == b, f"{dist} diverged from {exact}"


def test_bfs_layers_are_disjoint_min_hop_and_complete(spark, sf_dir):
    """BFS invariants: layer 0 is exactly the seed set, distances are
    min-hop (a node appears in exactly one layer), every node is
    accounted for (layers + unreached = node universe), and layer d>0
    is non-empty only if layer d-1 was."""
    from stream_ingestion_amazon_kinesis_spark.operators.graph import (
        BFS_SEEDS,
        bfs_reach_layers_parts,
    )
    from stream_ingestion_amazon_kinesis_spark.sources.catalog import (
        load_table,
    )

    rows = {
        r["dist"]: (r["n_nodes"], r["node_checksum"])
        for r in bfs_reach_layers_parts(spark, sf_dir).collect()
    }
    n_seeds = rows[0][0]
    assert n_seeds <= BFS_SEEDS
    assert rows[0][1] == sum(range(BFS_SEEDS))  # seed ids 0..7 checksum
    li = load_table(spark, sf_dir, "lineitem")
    universe = li.select("l_partkey").distinct().count()
    assert sum(n for n, _ in rows.values()) == universe
    dists = sorted(d for d in rows if d >= 0)
    assert dists == list(range(len(dists)))  # contiguous layers from 0
