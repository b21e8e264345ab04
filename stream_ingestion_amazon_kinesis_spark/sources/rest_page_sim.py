"""REST-pagination-simulating custom Python DataSource (PySpark 4).

The reference's ingestion protocol is cursor-style pagination twice
over: ``list_shards`` follows ``NextToken`` (consumer.py:84-92) and the
record loop follows ``NextShardIterator`` with a per-call ``Limit``
(consumer.py:108-195). This source models the OTHER ubiquitous flavor a
data platform ingests from — an offset/limit-paginated JSON API
(``GET /records?offset=N&limit=P``) — and maps it onto Spark contracts:

- page            -> ``InputPartition`` (offset ranges are independent,
                     so a *sequential* client protocol becomes an
                     embarrassingly parallel scan — the thing a
                     driver-side ``while next_token:`` loop can never be)
- total-count probe -> driver-side metadata call in ``partitions()``
                     (like list_shards: cheap, once per plan)
- rate limit      -> ``maxPagesPerBatch`` in the stream reader: each
                     micro-batch advances at most P*K rows, the
                     Limit=200 cap generalized to offset space
- tail growth     -> ``latestOffset`` re-probes the count, so appended
                     records stream in on later batches

The "API" is simulated by a directory holding ``data.jsonl`` (one JSON
record per line). To keep page fetches O(page) instead of O(offset) —
the difference between a scan that parallelizes and one that re-reads
the prefix once per task, quadratic at 100 TB — a byte-offset index of
every ``INDEX_STRIDE``-th line is built once, driver-side, and each
partition ``seek()``s straight to its page.

Reader-only by design: offset-paginated APIs are read surfaces; the
keyed write path lives in ``kinesis_sim``.

Everything inside reader methods is stdlib-only so the pickled class
works on any executor without the package installed.
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "offset bigint, record string"

# One index entry (byte offset) every this-many lines. 1024 keeps the
# index 0.01% of the data while bounding any seek's line overshoot.
INDEX_STRIDE = 1024
_IDX_MAGIC = b"RPS1"


def _data_path(path: str) -> str:
    p = os.path.join(path, "data.jsonl")
    if not os.path.isfile(p):
        raise FileNotFoundError(f"rest_page_sim: {p} not found")
    return p


def _idx_path(path: str) -> str:
    return os.path.join(path, "data.idx")


def _ensure_index(path: str) -> tuple[int, int]:
    """Build (once) the line->byte index; return (n_rows, data_size).

    Layout: magic | uint64 n_rows | uint64 data_size | uint64 offsets...
    where offsets[i] is the byte position of line i*INDEX_STRIDE.
    Rebuilt automatically when the data file has grown (tail append).
    """
    dp, ip = _data_path(path), _idx_path(path)
    size = os.path.getsize(dp)
    if os.path.isfile(ip):
        with open(ip, "rb") as fh:
            if fh.read(4) == _IDX_MAGIC:
                n_rows, indexed_size = struct.unpack("<QQ", fh.read(16))
                if indexed_size == size:
                    return n_rows, size
    offsets, n_rows, pos = [], 0, 0
    with open(dp, "rb") as fh:
        for line in fh:
            if n_rows % INDEX_STRIDE == 0:
                offsets.append(pos)
            pos += len(line)
            n_rows += 1
    tmp = ip + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(_IDX_MAGIC)
        fh.write(struct.pack("<QQ", n_rows, size))
        fh.write(struct.pack(f"<{len(offsets)}Q", *offsets))
    os.replace(tmp, ip)
    return n_rows, size


def _seek_offset(path: str, row: int) -> tuple[int, int]:
    """(byte_pos, rows_to_skip) to reach `row` via the index."""
    ip = _idx_path(path)
    slot = row // INDEX_STRIDE
    with open(ip, "rb") as fh:
        fh.seek(4 + 16 + slot * 8)
        (byte_pos,) = struct.unpack("<Q", fh.read(8))
    return byte_pos, row - slot * INDEX_STRIDE


@dataclass
class PagePartition(InputPartition):
    """One offset/limit page == one Spark read task."""

    path: str
    start: int  # inclusive row offset
    end: int  # exclusive


def _read_page(part: PagePartition):
    """Serve GET /records?offset=start&limit=end-start: seek via the
    index, skip the sub-stride remainder, emit the page."""
    dp = _data_path(part.path)
    byte_pos, skip = _seek_offset(part.path, part.start)
    with open(dp, "rb") as fh:
        fh.seek(byte_pos)
        row = part.start - skip
        for line in fh:
            if row >= part.end:
                break
            if row >= part.start:
                yield (row, line.decode("utf-8").rstrip("\n"))
            row += 1


class RestPageBatchReader(DataSourceReader):
    def __init__(self, path: str, page_size: int):
        self.path = path
        self.page_size = page_size

    def partitions(self):
        # The count probe (GET /count) + index build: once, driver-side.
        n_rows, _ = _ensure_index(self.path)
        return [
            PagePartition(self.path, off, min(off + self.page_size, n_rows))
            for off in range(0, n_rows, self.page_size)
        ] or [PagePartition(self.path, 0, 0)]

    def read(self, partition: PagePartition):
        return _read_page(partition)


class RestPageStreamReader(DataSourceStreamReader):
    """Micro-batch tail of the API: offset = {"row": next_unread}, each
    batch advances at most maxPagesPerBatch pages — the client-side rate
    limit — while latestOffset re-probes the (growing) total count."""

    def __init__(self, path: str, page_size: int, max_pages: int):
        self.path = path
        self.page_size = page_size
        self.max_pages = max_pages

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        cur = getattr(self, "_cursor", None)
        if cur is None:
            cur = self.initialOffset()
        n_rows, _ = _ensure_index(self.path)
        nxt = min(n_rows, cur["row"] + self.page_size * self.max_pages)
        self._cursor = {"row": nxt}
        return self._cursor

    def partitions(self, start: dict, end: dict):
        # Re-sync after checkpoint restart (engine may be ahead of a
        # fresh cursor).
        cur = getattr(self, "_cursor", None) or {"row": 0}
        self._cursor = {"row": max(cur["row"], start["row"], end["row"])}
        s, e = start["row"], end["row"]
        if e <= s:
            return [PagePartition(self.path, 0, 0)]
        return [
            PagePartition(self.path, off, min(off + self.page_size, e))
            for off in range(s, e, self.page_size)
        ]

    def read(self, partition: PagePartition):
        return _read_page(partition)

    def commit(self, end: dict) -> None:
        # The "API" retains records; offsets are recomputable from the
        # checkpoint.
        pass


class RestPageSimDataSource(DataSource):
    """``spark.read/readStream.format("rest_page_sim")``.

    Options:
      path              API directory holding data.jsonl (required)
      pageSize          rows per page/partition, default 1000
      maxPagesPerBatch  stream rate limit, pages per micro-batch, default 5
    """

    @classmethod
    def name(cls) -> str:
        return "rest_page_sim"

    def schema(self) -> str:
        return SCHEMA_DDL

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("rest_page_sim requires option 'path'")
        return path

    def reader(self, schema: StructType) -> RestPageBatchReader:
        return RestPageBatchReader(self._path(), int(self.options.get("pageSize", "1000")))

    def streamReader(self, schema: StructType) -> RestPageStreamReader:
        return RestPageStreamReader(
            self._path(),
            int(self.options.get("pageSize", "1000")),
            int(self.options.get("maxPagesPerBatch", "5")),
        )


def register_format(spark) -> None:
    """Idempotent registration of the rest_page_sim format."""
    spark.dataSource.register(RestPageSimDataSource)


# ---------------------------------------------------------------------------
# Registered query: fixture -> API dir -> paged parallel scan -> decode -> agg
# ---------------------------------------------------------------------------


def _api_cache_path(sf_dir: str) -> str:
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    from .catalog import fixture_fingerprint

    return os.path.join(
        tempfile.gettempdir(),
        "spark_graft_rest_page_sim",
        tag,
        f"documents_{fixture_fingerprint(sf_dir, 'documents')}",
    )


def documents_api_dir(spark, sf_dir: str) -> str:
    """Materialize the documents fixture as the API's backing JSONL once
    per sf+fingerprint (marker makes it idempotent).

    The single ordered file is written EXECUTOR-side: repartition(1) +
    sortWithinPartitions gives a total order inside one task whose
    external sort spills to executor disk, and the text writer streams
    straight to the file — the whole table never transits driver memory
    (collecting rows here would OOM the driver at 100x the fixture).
    One task for one file is inherent to a single-file API backing
    store, and this path is test infra simulating the external API, not
    a registered query plan."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from .catalog import load_table

    register_format(spark)
    path = _api_cache_path(sf_dir)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        docs = load_table(spark, sf_dir, "documents")
        stage = path + ".stage"
        (
            docs.select(
                "doc_id",
                F.to_json(F.struct("doc_id", "lang", "source", "n_chars")).alias(
                    "j"
                ),
            )
            .repartition(1)
            .sortWithinPartitions("doc_id")  # stable offsets: insertion order
            .select("j")
            .write.mode("overwrite")
            .text(stage)
        )
        parts = sorted(glob.glob(os.path.join(stage, "part-*")))
        assert len(parts) == 1, parts
        os.replace(parts[0], os.path.join(path, "data.jsonl"))
        shutil.rmtree(stage, ignore_errors=True)
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("")
    return path


def _register_queries() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..plans.registry import register

    payload = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )

    @register(
        "rest_page_scan_documents",
        oracle="""
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
        FROM documents
        GROUP BY lang, source
        """,
        description="G1/S1-analog as a second custom Python DataSource: an "
        "offset/limit-paginated JSON API scanned as one task per page "
        "(indexed O(page) seeks, no prefix re-read), JSON-decoded and "
        "aggregated; oracle reads the same records from parquet",
    )
    def rest_page_scan_documents(spark, sf_dir: str):
        path = documents_api_dir(spark, sf_dir)
        raw = (
            spark.read.format("rest_page_sim")
            .option("path", path)
            .option("pageSize", "500")
            .load()
        )
        rec = raw.select(F.from_json("record", payload).alias("r")).select("r.*")
        return rec.groupBy("lang", "source").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("doc_id").alias("max_doc_id"),
        )


_register_queries()
