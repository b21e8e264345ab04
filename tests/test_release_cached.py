"""registry.release_cached drops localCheckpoint residue between queries.

The full-registry gate runs hundreds of independent queries in one
session; operators that localCheckpoint intermediates (graph edge
relations etc.) leave blocks in the block manager until Python GC
drops the py4j handle. A bare 1 GiB driver OOMed ~316 queries into the
sf0.1 value gate on that residue. This pins the release hook: after a
localCheckpointing query is consumed, release_cached unpersists
everything and a subsequent run of the same query still matches.
"""

from __future__ import annotations

from stream_ingestion_amazon_kinesis_spark.plans.registry import (
    QUERIES,
    _load_all,
    release_cached,
)

_load_all()


def _persistent_count(spark) -> int:
    return len(list(spark.sparkContext._jsc.getPersistentRDDs().values()))


def test_release_cached_unpersists_localcheckpoint_blocks(spark, sf_dir):
    fn = QUERIES["triangle_count_parts"].fn
    first = fn(spark, sf_dir).toPandas()
    assert _persistent_count(spark) > 0  # the two localCheckpoints
    released = release_cached(spark)
    assert released >= 2
    assert _persistent_count(spark) == 0
    # The query rebuilds its lineage from scratch — releasing is safe.
    again = fn(spark, sf_dir).toPandas()
    assert first.equals(again)
    release_cached(spark)
    assert _persistent_count(spark) == 0


def test_bpe_train_memo_hits_and_is_invalidated(spark, sf_dir):
    """ADVICE r10: bpe_encode_token_stats re-ran the full merge training
    that bpe_merge_training had just executed in the same session. The
    memo must (a) return the identical relations on a second call, and
    (b) be CLEARED by release_cached — the memoized DataFrames are
    localCheckpointed, so once their blocks are unpersisted they cannot
    recompute, and a stale memo entry would fail instead of retrain."""
    from stream_ingestion_amazon_kinesis_spark.operators.text_analysis import (
        _BPE_TRAIN_CACHE,
        _bpe_train,
    )

    release_cached(spark)  # start clean
    rules1, seqs1 = _bpe_train(spark, sf_dir)
    assert _BPE_TRAIN_CACHE  # populated
    rules2, seqs2 = _bpe_train(spark, sf_dir)
    assert seqs2 is seqs1 and rules2 is rules1  # memo hit, no retrain
    n1 = seqs1.count()
    release_cached(spark)
    assert not _BPE_TRAIN_CACHE  # hook cleared the memo with the blocks
    rules3, seqs3 = _bpe_train(spark, sf_dir)  # retrains from scratch
    assert seqs3 is not seqs1
    assert seqs3.count() == n1
    release_cached(spark)
