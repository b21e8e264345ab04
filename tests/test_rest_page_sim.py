"""Contract tests for the rest_page_sim custom DataSource.

Pin the properties that make an offset-paginated API a *correct* Spark
source: every row exactly once across page boundaries, one task per
page (the parallelism win over a cursor loop), indexed seeks that agree
with a sequential read, and a stream whose per-batch advance respects
the rate limit while still draining the tail.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.sources.rest_page_sim import (
    INDEX_STRIDE,
    PagePartition,
    _ensure_index,
    _read_page,
    documents_api_dir,
    register_format,
)
from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table


def _mk_api(tmp_path, n_rows: int) -> str:
    d = tmp_path / "api"
    d.mkdir()
    with open(d / "data.jsonl", "w", encoding="utf-8") as fh:
        for i in range(n_rows):
            fh.write(json.dumps({"i": i, "k": f"row-{i}"}) + "\n")
    return str(d)


def test_every_row_exactly_once_across_pages(spark, tmp_path):
    # 2557 rows, page 100: 26 pages, last one ragged; stride boundaries
    # (1024, 2048) fall mid-page.
    path = _mk_api(tmp_path, 2557)
    register_format(spark)
    df = (
        spark.read.format("rest_page_sim")
        .option("path", path)
        .option("pageSize", "100")
        .load()
    )
    assert df.rdd.getNumPartitions() == 26
    rows = df.select("offset").collect()
    got = sorted(r.offset for r in rows)
    assert got == list(range(2557))


def test_indexed_seek_matches_sequential_read(spark, tmp_path):
    path = _mk_api(tmp_path, 3 * INDEX_STRIDE + 17)
    _ensure_index(path)
    # A page straddling an index stride boundary, read via seek...
    start, end = INDEX_STRIDE - 5, INDEX_STRIDE + 5
    via_seek = list(_read_page(PagePartition(path, start, end)))
    # ...must equal the naive slice of the file.
    with open(os.path.join(path, "data.jsonl"), encoding="utf-8") as fh:
        lines = [ln.rstrip("\n") for ln in fh]
    assert via_seek == [(i, lines[i]) for i in range(start, end)]


def test_index_rebuilds_on_tail_growth(spark, tmp_path):
    path = _mk_api(tmp_path, 10)
    n, _ = _ensure_index(path)
    assert n == 10
    with open(os.path.join(path, "data.jsonl"), "a", encoding="utf-8") as fh:
        for i in range(10, 25):
            fh.write(json.dumps({"i": i}) + "\n")
    n, _ = _ensure_index(path)
    assert n == 25


def test_stream_rate_limit_and_drain(spark, tmp_path):
    import time

    path = _mk_api(tmp_path, 1000)
    register_format(spark)
    stream = (
        spark.readStream.format("rest_page_sim")
        .option("path", path)
        .option("pageSize", "100")
        .option("maxPagesPerBatch", "3")
        .load()
    )
    seen_batches: list[int] = []

    def sink(batch_df, _bid):
        n = batch_df.count()
        if n:
            seen_batches.append(n)

    # The rate limit caps each latestOffset advance, so draining takes
    # several micro-batches — poll until the tail is consumed.
    q = stream.writeStream.foreachBatch(sink).trigger(processingTime="0 seconds").start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline and sum(seen_batches) < 1000:
            time.sleep(0.2)
    finally:
        q.stop()
    # Rate limit: no batch exceeds 3 pages * 100 rows; drain: total == all.
    assert sum(seen_batches) == 1000
    assert max(seen_batches) <= 300
    assert len(seen_batches) >= 4  # the cap actually forced multiple batches


def test_no_driver_collect_in_module():
    """The API staging used to `.collect()` the whole documents table
    through driver memory; pin the executor-side write."""
    import inspect

    from stream_ingestion_amazon_kinesis_spark.sources import rest_page_sim

    src = inspect.getsource(rest_page_sim)
    assert ".collect()" not in src


def test_index_persisted_and_reused_across_restart(spark, tmp_path):
    """The byte-offset index lives next to the data file and is REUSED:
    a second scan (or a stream restarted from its checkpoint) must not
    rebuild it, and the checkpointed stream must resume exactly where
    it stopped instead of re-reading the prefix."""
    import time

    path = _mk_api(tmp_path, 600)
    _ensure_index(path)
    idx = os.path.join(path, "data.idx")
    stamp = os.stat(idx).st_mtime_ns

    register_format(spark)
    ckpt = str(tmp_path / "ckpt")
    # foreachBatch is at-least-once per EPOCH: if stop() lands between
    # the sink call and the offset commit, the same epoch id replays on
    # restart. The exactly-once contract is "idempotent sink keyed by
    # epoch id" (what streaming/idempotent_sink.py implements) — so the
    # counter here is a dict keyed by batch id, and a replay overwrites
    # instead of double-counting. Epoch ids continue across restarts
    # from the same checkpoint, so the keying is globally consistent.
    totals: dict[int, int] = {}

    def run_until(target: int) -> None:
        stream = (
            spark.readStream.format("rest_page_sim")
            .option("path", path)
            .option("pageSize", "100")
            .option("maxPagesPerBatch", "2")
            .load()
        )

        def sink(batch_df, bid):
            n = batch_df.count()
            if n:
                totals[bid] = n

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline and sum(totals.values()) < target:
                time.sleep(0.2)
        finally:
            q.stop()

    run_until(200)
    assert sum(totals.values()) >= 200
    run_until(600)  # restart from the same checkpoint
    # exactly-once resume: a prefix re-read (offset regression) would
    # push the total PAST 600; a lost offset would stall it below
    assert sum(totals.values()) == 600
    # the persisted index was reused, never rebuilt
    assert os.stat(idx).st_mtime_ns == stamp


def test_fixture_roundtrip_equals_parquet(spark, sf_dir):
    path = documents_api_dir(spark, sf_dir)
    raw = spark.read.format("rest_page_sim").option("path", path).load()
    n_api = raw.count()
    n_pq = load_table(spark, sf_dir, "documents").count()
    assert n_api == n_pq
    # offsets are the API's insertion order: dense 0..n-1
    mx = raw.agg(F.max("offset").alias("m")).collect()[0].m
    assert mx == n_pq - 1
