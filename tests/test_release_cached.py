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
