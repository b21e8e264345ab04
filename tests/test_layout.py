"""Z-order layout: Morton key correctness and the file-skipping it buys."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from stream_ingestion_amazon_kinesis_spark.operators.layout import (
    morton_key,
    write_zordered,
)
from stream_ingestion_amazon_kinesis_spark.sources.catalog import load_table


def test_morton_key_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (7, 3), (1, 0), (0, 1), (65535, 0), (0, 65535), (65535, 65535)],
        "x long, y long",
    )
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", morton_key(F.col("x"), F.col("y"))).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1  # x occupies even bits
    assert got[(0, 1)] == 2  # y occupies odd bits
    assert got[(7, 3)] == 31  # 111 interleaved with 011 -> 011111
    assert got[(65535, 0)] == 0x55555555
    assert got[(0, 65535)] == 0xAAAAAAAA
    assert got[(65535, 65535)] == 0xFFFFFFFF


def test_morton_key_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5, 70000)], "x long, y long")
    z = df.select(morton_key(F.col("x"), F.col("y")).alias("z")).collect()[0].z
    # x clamps to 0 (even bits empty), y clamps to 65535 (all odd bits set)
    assert z == 0xAAAAAAAA


def _files_touched(df) -> int:
    return df.select(F.input_file_name().alias("f")).distinct().count()


def test_zorder_box_query_skips_files(spark, sf_dir, tmp_path):
    """The same 2-D box predicate must touch strictly fewer files under
    the Morton-clustered layout than under a round-robin layout of the
    identical rows — that delta IS the scan reduction z-ordering buys at
    100 TB (here measured via which files still contain matching rows;
    the parquet reader skips the rest on min/max stats)."""
    events = load_table(spark, sf_dir, "events")
    z_path = str(tmp_path / "events_z")
    rr_path = str(tmp_path / "events_rr")
    write_zordered(events, "user_id", F.col("value").cast("long"), z_path)
    events.repartition(8).write.parquet(rr_path)

    box = (
        (F.col("user_id") <= 3)
        & (F.col("value") >= 50.0)
        & (F.col("value") < 200.0)
    )
    z_df = spark.read.parquet(z_path).filter(box)
    rr_df = spark.read.parquet(rr_path).filter(box)

    # identical results regardless of layout
    assert z_df.count() == rr_df.count() > 0

    z_files = _files_touched(z_df)
    rr_files = _files_touched(rr_df)
    rr_total = len(glob.glob(os.path.join(rr_path, "part-*.parquet")))
    assert rr_files == rr_total  # round-robin scatters the box everywhere
    assert z_files < rr_files  # clustering concentrates it
