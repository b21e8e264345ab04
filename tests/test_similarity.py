"""ANN: IVF probe recall vs brute-force top-k."""

from __future__ import annotations

from stream_ingestion_amazon_kinesis_spark.operators.similarity import (
    ann_ivf_topk,
    ann_topk_cosine,
)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_cosine(spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"]) for r in ann_ivf_topk(spark, sf_dir).collect()
    }
    assert len(brute) > 0
    recall = len(brute & ivf) / len(brute)
    # single-probe IVF on synthetic clustered data should keep decent recall
    assert recall >= 0.5, f"IVF recall too low: {recall:.3f}"


def test_ivf2_recall_vs_brute_force(spark, sf_dir):
    """Two-level IVF (coarse+fine) must hold the SAME recall bar as the
    flat IVF twin — the verdict r9 #3 acceptance criterion for removing
    the flat quantizer's broadcast ceiling."""
    from stream_ingestion_amazon_kinesis_spark.operators.similarity import (
        ann_ivf2_topk,
    )

    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_cosine(spark, sf_dir).collect()
    }
    ivf2 = {
        (r["query_id"], r["neighbor_id"]) for r in ann_ivf2_topk(spark, sf_dir).collect()
    }
    assert len(brute) > 0
    recall = len(brute & ivf2) / len(brute)
    assert recall >= 0.5, f"two-level IVF recall too low: {recall:.3f}"


def test_ivf_neardup_recall_vs_label_blocked(spark, sf_dir):
    """The IVF-cell-blocked near-dup must recover nearly all pairs the
    label-blocked exact variant finds (the quantizer is label-seeded, so
    same-label pairs should share a cell; multi-assign covers boundary
    stragglers). Precision needs no test: both verify with exact cosine."""
    from stream_ingestion_amazon_kinesis_spark.operators.dedup import (
        embedding_neardup_pairs,
    )
    from stream_ingestion_amazon_kinesis_spark.operators.similarity import (
        embedding_neardup_ivf,
    )

    exact = {
        (r["vec_a"], r["vec_b"]) for r in embedding_neardup_pairs(spark, sf_dir).collect()
    }
    ivf = {
        (r["vec_a"], r["vec_b"]) for r in embedding_neardup_ivf(spark, sf_dir).collect()
    }
    assert len(exact) > 0
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.9, f"IVF near-dup recall too low: {recall:.3f}"


def test_srp_recall_vs_brute_force(spark, sf_dir):
    """Banded SRP (8x4 bits) must recover most brute-force top-k pairs.
    0.6 is the floor for this corpus' mid-cosine neighbors (measured
    0.8 at sf0.001, 0.7 at sf0.01); production tuning trades band width
    for recall."""
    from stream_ingestion_amazon_kinesis_spark.operators.similarity import (
        ann_srp_topk,
    )

    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_cosine(spark, sf_dir).collect()
    }
    srp = {
        (r["query_id"], r["neighbor_id"]) for r in ann_srp_topk(spark, sf_dir).collect()
    }
    assert len(brute) > 0
    recall = len(brute & srp) / len(brute)
    assert recall >= 0.6, f"SRP recall too low: {recall:.3f}"


def test_topk_is_k_per_query(spark, sf_dir):
    import collections

    rows = ann_topk_cosine(spark, sf_dir).collect()
    per_query = collections.Counter(r["query_id"] for r in rows)
    assert all(v == 5 for v in per_query.values())
    # cosine in [-1, 1]
    assert all(-1.000001 <= r["cosine_sim"] <= 1.000001 for r in rows)


def test_ivf_pq_recall_vs_brute_force(spark, sf_dir):
    """IVF-PQ (codes-only candidate scoring + exact rerank) must stay
    near the plain-IVF recall ceiling — the PQ stage may cost a little
    recall for its 8x candidate-I/O reduction, never collapse it.
    Measured 0.65 at sf0.01 / 0.60 at sf0.1 (IVF ceiling 0.65)."""
    from stream_ingestion_amazon_kinesis_spark.operators.similarity import (
        ann_ivf_pq_topk,
    )

    brute = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk_cosine(spark, sf_dir).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"]) for r in ann_ivf_pq_topk(spark, sf_dir).collect()
    }
    assert len(brute) > 0
    recall = len(brute & pq) / len(brute)
    assert recall >= 0.5, f"IVF-PQ recall too low: {recall:.3f}"


def test_ivf_train_cap_scales_with_requested_cells():
    """ADVICE r7 (medium): a fixed 4096-sample training cap silently
    clamped k once a caller requested more cells (constant-population
    blocking asks for ceil(4N/1024) cells, crossing 4096 at N ~ 1.05M
    vectors) and trained with ~1 sample/cell near the clamp. The cap
    must scale with the request so every Lloyd mean averages >= a few
    vectors and k is never silently reduced."""
    from stream_ingestion_amazon_kinesis_spark.operators.similarity import (
        IVF_TRAIN_CAP,
        ivf_train_cap,
    )

    assert ivf_train_cap(16) == IVF_TRAIN_CAP  # small asks keep the floor
    assert ivf_train_cap(1024) == IVF_TRAIN_CAP
    # past the floor the sample tracks 4x the requested cell count
    assert ivf_train_cap(4096) == 4 * 4096
    assert ivf_train_cap(1_000_000) == 4_000_000
    # monotone: more cells never means fewer training samples
    caps = [ivf_train_cap(k) for k in (1, 10, 1024, 2048, 4096, 10_000)]
    assert caps == sorted(caps)


def test_ivf_kmeans_honors_large_cell_request(spark):
    """k above the old fixed cap must yield k centroids when the corpus
    has enough vectors (the silent min(k, 4096-sample) clamp is gone).
    Uses a tiny synthetic corpus with n_cells > corpus/4 to exercise
    the corpus-bounded branch too."""
    from stream_ingestion_amazon_kinesis_spark.operators.similarity import (
        ivf_centroids_kmeans,
    )

    rows = [(i, [float((i * 7 + j) % 13) for j in range(4)]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = ivf_centroids_kmeans(emb, n_cells=32).count()
    assert got == 32
    # more cells than vectors: clamped to the corpus (cannot exceed n)
    got2 = ivf_centroids_kmeans(emb, n_cells=100).count()
    assert got2 == 64


def test_matryoshka_truncation_recall_bounds(spark, sf_dir):
    """Structural invariants: overlap in [0, k], recall_ppm consistent
    with n_overlap, and checksums positive for every query; truncation
    keeps SOME signal (mean recall above a random-baseline floor)."""
    from stream_ingestion_amazon_kinesis_spark.operators.similarity import (
        TOP_K,
        ann_matryoshka_truncation_recall,
    )

    rows = ann_matryoshka_truncation_recall(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r["n_overlap"] <= TOP_K
        assert r["recall_ppm"] == (1_000_000 * r["n_overlap"]) // TOP_K
        assert r["full_ids_checksum"] > 0
        assert r["trunc_ids_checksum"] > 0
    mean_recall = sum(r["n_overlap"] for r in rows) / (len(rows) * TOP_K)
    assert mean_recall > 0.05  # far above the ~k/N random floor
