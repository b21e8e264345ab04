"""Property-based round-trip for the kinesis_sim DataSource.

For ANY batch of (partition_key, data) records: write -> batch read
preserves the exact multiset of records, every record lands on the
shard its key hashes to, and per-shard sequence numbers stay dense.
Mirrors tests/test_asof_property.py's strategy of few, large examples
(a Spark job per example).
"""

from __future__ import annotations

import zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_ingestion_amazon_kinesis_spark.sources import kinesis_sim

KEYS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=12
)
DATA = st.text(min_size=0, max_size=40)
RECORDS = st.lists(st.tuples(KEYS, DATA), min_size=1, max_size=200)


@given(records=RECORDS, num_shards=st.integers(min_value=1, max_value=6))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_write_read_roundtrip_multiset(spark, tmp_path_factory, records, num_shards):
    kinesis_sim.register_format(spark)
    path = str(tmp_path_factory.mktemp("ksim_prop") / "stream")
    df = spark.createDataFrame(records, "partition_key string, data string")
    (
        df.write.format("kinesis_sim")
        .option("path", path)
        .option("numShards", str(num_shards))
        .mode("overwrite")
        .save()
    )
    back = spark.read.format("kinesis_sim").option("path", path).load().collect()

    assert sorted((r.partition_key, r.data) for r in back) == sorted(records)
    seqs: dict[str, list[int]] = {}
    for r in back:
        expect = zlib.crc32(r.partition_key.encode("utf-8")) % num_shards
        assert r.shard_id == f"shard-{expect:05d}"
        seqs.setdefault(r.shard_id, []).append(r.sequence_number)
    for got in seqs.values():
        assert sorted(got) == list(range(len(got)))
