"""Structural invariants for the round-8 pipeline additions
(gopher_quality_funnel, dsir_importance_weights, kmeans_lloyd_clusters,
mmr_diversified_topk). Value-level correctness is carried by the DuckDB
oracles (test_oracle_parity / the driver gate); these tests pin the
semantic properties an oracle diff can't name: funnel monotonicity,
selection-pool discipline, Lloyd-step improvement, MMR greedy shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.operators.corpus_quality import (
    gopher_quality_funnel,
)
from stream_ingestion_amazon_kinesis_spark.operators.curation import (
    dsir_importance_weights,
)
from stream_ingestion_amazon_kinesis_spark.operators.similarity import (
    KMEANS_K,
    MMR_K,
    MMR_LAMBDA_NUM,
    N_QUERIES,
    _km_assign,
    _km_quantized,
    kmeans_lloyd_clusters,
    mmr_diversified_topk,
)
from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table


def test_funnel_is_monotone_and_consistent(spark, sf_dir):
    rows = gopher_quality_funnel(spark, sf_dir).collect()
    assert [r["stage"] for r in rows] == [0, 1, 2, 3, 4]
    surv = [r["survivors"] for r in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:])), "funnel must shrink"
    for prev, cur in zip(rows, rows[1:]):
        assert cur["failed_here"] == prev["survivors"] - cur["survivors"]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert surv[0] == n_docs
    assert surv[-1] > 0, "thresholds must not reject the whole corpus"


def test_dsir_selects_from_raw_pool_only(spark, sf_dir):
    rows = dsir_importance_weights(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    assert all(r["lang"] != "en" for r in rows), "target docs must not score"
    scores = [r["importance_ppm"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_kmeans_partitions_corpus_and_lloyd_step_improves(spark, sf_dir):
    out = kmeans_lloyd_clusters(spark, sf_dir).collect()
    emb_n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vecs"] for r in out) == emb_n
    assert all(r["inertia"] >= 0 for r in out)
    assert len(out) <= KMEANS_K
    # Lloyd guarantee: cost after (update + reassign) <= initial-centroid
    # cost. Truncating integer means perturb each centroid coordinate by
    # < 1 quantum, negligible against the distances involved.
    q = _km_quantized(spark, sf_dir)
    c0 = q.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cluster"), F.col("qv").alias("cv")
    )
    init_cost = _km_assign(q, c0).agg(F.sum("dist")).collect()[0][0]
    final_cost = sum(r["inertia"] for r in out)
    assert final_cost <= init_cost


def test_mmr_greedy_shape(spark, sf_dir):
    rows = mmr_diversified_topk(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == N_QUERIES
    for qid, picks in by_q.items():
        assert [p["pick_rank"] for p in picks] == list(range(1, MMR_K + 1))
        ids = [p["neighbor_id"] for p in picks]
        assert len(set(ids)) == MMR_K, "picks must be distinct"
        assert qid not in ids, "query must not retrieve itself"
        # pick 1 is pure relevance (no diversity term yet), so its score
        # is exactly 7 * rel_ppm of the top candidate — a multiple of 7,
        # unlike later scores which mix in the 3*max_sim penalty.
        assert picks[0]["mmr_score10"] % MMR_LAMBDA_NUM == 0
    # Pick 1 must agree with the brute-force cosine top-1 (same rounding
    # contract, same id tiebreak).
    from stream_ingestion_amazon_kinesis_spark.operators.similarity import ann_topk_cosine

    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in ann_topk_cosine(spark, sf_dir).filter(F.col("rnk") == 1).collect()
    }
    for qid, picks in by_q.items():
        assert picks[0]["neighbor_id"] == top1[qid]


def test_semdedup_counts_are_consistent(spark, sf_dir):
    from stream_ingestion_amazon_kinesis_spark.operators.similarity import (
        semdedup_cluster_prune,
    )

    rows = semdedup_cluster_prune(spark, sf_dir).collect()
    assert all(r["n_kept"] + r["n_removed"] == r["n_vecs"] for r in rows)
    assert all(r["n_kept"] >= 1 for r in rows), (
        "every non-empty cluster keeps at least its lowest-id member"
    )
    assert sum(r["n_removed"] for r in rows) > 0, "bar must discriminate"


def test_span_novelty_ratios_are_sane(spark, sf_dir):
    from stream_ingestion_amazon_kinesis_spark.operators.text_analysis import (
        span_novelty_by_source,
    )

    rows = span_novelty_by_source(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["shared_spans"] <= r["total_spans"]
        assert 0 <= r["novelty_ppm"] <= 1000000
        expected = (
            1000000 * (r["total_spans"] - r["shared_spans"])
        ) // r["total_spans"]
        assert r["novelty_ppm"] == expected


def test_epoch_shuffle_is_permutation_and_epoch_dependent(spark, sf_dir):
    from stream_ingestion_amazon_kinesis_spark.operators.curation import (
        EPOCH_SHARDS,
        epoch_shuffle_audit,
    )
    from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table

    rows = epoch_shuffle_audit(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert sorted(by_epoch) == [0, 1]
    sums = {}
    for epoch, shards in by_epoch.items():
        # positions tile 1..N contiguously across shards => permutation
        shards.sort(key=lambda r: r["shard"])
        assert shards[0]["min_pos"] == 1
        assert shards[-1]["max_pos"] == n_docs
        for a, b in zip(shards, shards[1:]):
            assert b["min_pos"] == a["max_pos"] + 1
        assert sum(r["n_docs"] for r in shards) == n_docs
        # balance: shard sizes differ by at most 1
        sizes = [r["n_docs"] for r in shards]
        assert max(sizes) - min(sizes) <= 1
        assert len(shards) == min(EPOCH_SHARDS, n_docs)
        sums[epoch] = [r["sum_doc_id"] for r in shards]
    # epoch-dependence: at least one shard's membership changed
    assert sums[0] != sums[1]
    # conservation: each epoch's grand total is the same doc-id mass
    assert sum(sums[0]) == sum(sums[1])


def test_quality_weighted_sample_rates_are_ordered(spark, sf_dir):
    from stream_ingestion_amazon_kinesis_spark.operators.curation import (
        QW_RATES_PPM,
        quality_weighted_sample,
    )

    rows = quality_weighted_sample(spark, sf_dir).collect()
    assert rows, "census must not be empty"
    totals = {}
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        if r["tier"] == 0:
            # rate 1.0 => everything kept
            assert r["n_kept"] == r["n_docs"]
        t = totals.setdefault(r["tier"], [0, 0])
        t[0] += r["n_docs"]
        t[1] += r["n_kept"]
    # realized keep fractions respect the configured rate ordering
    # (wide tolerance: the draw is uniform-ish, not exact)
    fracs = {t: kept / max(n, 1) for t, (n, kept) in totals.items()}
    for lo, hi in [(2, 1), (1, 0)]:
        if lo in fracs and hi in fracs:
            assert fracs[lo] <= fracs[hi] + 0.15
    assert set(totals) <= set(QW_RATES_PPM)


def test_mulmod32_matches_bigint_math_in_both_engines(spark):
    """ADVICE r8: the naive doc_id * _KNUTH wraps in Spark but raises in
    DuckDB once doc_id >= ~3.5e9. The split formula must equal Python
    bigint (d * m) % 2^32 for extreme ids in BOTH engines."""
    import duckdb

    from stream_ingestion_amazon_kinesis_spark.operators.curation import (
        _EPOCH_SALT,
        _KNUTH,
        _mulmod32,
    )

    ids = [0, 1, 65535, 65536, 2**31 - 1, 2**31, 3_500_000_000,
           2**32 - 1, 2**32, 10**15, 2**62, 2**63 - 1]
    for mult in (_KNUTH, _KNUTH + 2 * _EPOCH_SALT):
        want = [(d * mult) % 4294967296 for d in ids]
        got_duck = [
            duckdb.sql(
                f"SELECT {_mulmod32(str(d), mult, '//')}"
            ).fetchone()[0]
            for d in ids
        ]
        assert got_duck == want
        sdf = spark.createDataFrame([(d,) for d in ids], "doc_id long")
        got_spark = [
            r[0]
            for r in sdf.select(
                F.expr(_mulmod32("doc_id", mult, "div"))
            ).collect()
        ]
        assert got_spark == want


def test_bpe_merge_training_matches_reference_bpe(spark, tmp_path):
    """Hand-checkable corpus incl. the greedy-left overlap case (aaa):
    the engine's delimiter-anchored replace must merge like canonical
    left-to-right BPE, and every round's argmax must honor the
    (count desc, left, right) tiebreak."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stream_ingestion_amazon_kinesis_spark.operators.text_analysis import (
        BPE_MERGES,
        bpe_merge_training,
    )

    texts = ["aaa aaa bb", "abab abab", "aaa bb bb", "ba ba ba"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    def ref_bpe(word_counts, k):
        seqs = {w: list(w) for w in word_counts}
        rules = []
        for _ in range(k):
            counts = {}
            for w, syms in seqs.items():
                for x, y in zip(syms, syms[1:]):
                    counts[(x, y)] = counts.get((x, y), 0) + word_counts[w]
            if not counts:
                # Corpus exhausted (every word one symbol) before k
                # merges: canonical BPE stops; the engine's empty rule
                # relation emits no row for the round, so both sides
                # agree on the truncated merge table.
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            (a, b), c = best
            rules.append((a, b, c))
            for w, syms in seqs.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                seqs[w] = out
        return rules

    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want = [
        (i + 1, a, b, c)
        for i, (a, b, c) in enumerate(ref_bpe(wc, BPE_MERGES))
    ]
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merge_training(spark, str(tmp_path)).collect()
    ]
    assert got == want


def test_token_budget_selection_respects_budget_and_greedy_order(
    spark, sf_dir
):
    """The inclusive greedy rule: selected token mass never exceeds
    total div 4, and the selection is a PREFIX of the (quality desc,
    doc_id) order — the doc ranked right after the last selected one
    would not have fit."""
    from stream_ingestion_amazon_kinesis_spark.operators.curation import (
        _quality_token_prefix,
        token_budget_selection,
    )

    c = _quality_token_prefix(spark, sf_dir).toPandas()
    total = int(c["total_tokens"].iloc[0])
    budget = total // 4
    census = token_budget_selection(spark, sf_dir).toPandas()
    assert int(census["tokens_selected"].sum()) <= budget
    sel = c[c["cum_tokens"] <= budget]
    assert int(census["n_selected"].sum()) == len(sel)
    # prefix property: every selected cum position < every unselected
    rest = c[c["cum_tokens"] > budget]
    if len(sel) and len(rest):
        assert sel["cum_tokens"].max() < rest["cum_tokens"].min()
        # the first unselected doc genuinely overflows the budget
        assert int(rest["cum_tokens"].min()) > budget


def test_curriculum_phases_partition_the_corpus(spark, sf_dir):
    from stream_ingestion_amazon_kinesis_spark.operators.curation import (
        _quality_token_prefix,
        curriculum_token_phases,
    )

    phases = curriculum_token_phases(spark, sf_dir).toPandas()
    assert sorted(phases["phase"]) == list(phases["phase"])
    assert set(phases["phase"]).issubset({1, 2, 3, 4})
    c = _quality_token_prefix(spark, sf_dir).toPandas()
    # partition: every doc in exactly one phase, token mass conserved
    assert int(phases["n_docs"].sum()) == len(c)
    assert int(phases["phase_tokens"].sum()) == int(
        c["total_tokens"].iloc[0]
    )
    # curriculum monotonicity: earlier phases carry no WORSE minimum
    # quality than later phases' maxima allow (phase 1 max >= phase 4 min)
    by_phase = phases.set_index("phase")
    if 1 in by_phase.index and 4 in by_phase.index:
        assert (
            by_phase.loc[1, "min_quality_ppm"]
            >= by_phase.loc[4, "max_quality_ppm"]
        ) or len(by_phase) < 4


def test_priority_sample_is_weighted_and_fixed_size(spark, sf_dir):
    """DLT priority sampling: exactly k docs sampled overall, and the
    token-weighted draw biases toward long documents — the sampled
    mean weight must exceed the corpus mean (w/u priorities make a
    doc's win probability proportional to its weight)."""
    from stream_ingestion_amazon_kinesis_spark.operators.curation import (
        PRIORITY_SAMPLE_K,
        priority_sample_weighted,
    )

    rows = priority_sample_weighted(spark, sf_dir).toPandas()
    n_docs = int(rows["n_docs"].sum())
    assert int(rows["n_sampled"].sum()) == min(PRIORITY_SAMPLE_K, n_docs)
    mean_corpus = rows["total_weight"].sum() / n_docs
    mean_sample = rows["weight_sampled"].sum() / rows["n_sampled"].sum()
    assert mean_sample > mean_corpus
