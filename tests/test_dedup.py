"""MinHash-LSH recall vs exact Jaccard, and SimHash sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.functions.text import shingles, tokens
from stream_ingestion_amazon_kinesis_spark.operators.dedup import (
    minhash_lsh_neardup,
    minhash_signatures,
    simhash_fingerprints,
)
from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table


def _exact_pairs(spark, sf_dir, threshold=0.8):
    """Brute-force exact shingle-Jaccard ground truth (O(n^2) — test only)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(shingles("text", 3))).alias("token")
    )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    shared = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n_tok") + F.col("sb.n_tok") - F.col("n_shared")
    )
    return (
        shared.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def test_minhash_lsh_recall(spark, sf_dir):
    truth = {
        (r["doc_a"], r["doc_b"]) for r in _exact_pairs(spark, sf_dir).collect()
    }
    found = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_neardup(spark, sf_dir).collect()
    }
    # candidates are verified with exact Jaccard -> no false positives
    assert found <= truth
    # 8 bands x 4 rows at j>=0.8 -> expected recall ~0.996
    assert len(truth) > 0
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"LSH recall too low: {recall:.3f}"


def test_minhash_signature_shape(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    sig = minhash_signatures(docs)
    row = sig.first()
    assert len([c for c in sig.columns if c.startswith("mh_")]) == 32
    assert row["mh_0"] is not None


def test_identical_docs_same_simhash(spark, sf_dir):
    fp = simhash_fingerprints(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # identical texts must collide on the fingerprint
    dup_text = (
        docs.groupBy("text").agg(F.count("*").alias("n"), F.collect_list("doc_id").alias("ids"))
        .filter(F.col("n") > 1)
        .first()
    )
    if dup_text:
        hashes = {
            r["simhash"]
            for r in fp.filter(F.col("doc_id").isin(dup_text["ids"])).collect()
        }
        assert len(hashes) == 1
