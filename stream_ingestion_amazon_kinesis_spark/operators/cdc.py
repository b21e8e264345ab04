"""CDC / SCD2 upsert emulation (no Delta/Iceberg in this environment —
MERGE INTO is rebuilt from anti-join + union + window, the standard
plain-parquet formulation).

`scd2_merge` maintains a type-2 slowly-changing dimension: each key
keeps a history of rows with [valid_from, valid_to) ranges and a
current flag. Applying an update batch closes the affected current rows
and appends the new versions. Everything is one shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_TIME = "9999-12-31 00:00:00"


def scd2_init(snapshot: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Turn a plain snapshot into SCD2 shape."""
    return snapshot.select(
        "*",
        F.col(ts_col).alias("valid_from"),
        F.lit(END_OF_TIME).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(dim: DataFrame, updates: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    - rows for unaffected keys pass through untouched (anti-join);
    - affected current rows are closed (valid_to = update ts);
    - update rows are appended as the new current versions.

    `updates` carries the same payload columns as the original snapshot
    plus `ts_col` (the change time). One update row per key per batch.
    """
    payload_cols = [c for c in dim.columns if c not in ("valid_from", "valid_to", "is_current")]
    upd = updates.select(*payload_cols)
    upd_keys = upd.select(F.col(key).alias("_uk"), F.col(ts_col).alias("_uts"))

    untouched = dim.join(upd_keys, dim[key] == upd_keys["_uk"], "left_anti")
    closed = (
        dim.join(upd_keys, (dim[key] == upd_keys["_uk"]) & dim["is_current"])
        .withColumn("valid_to", F.col("_uts"))
        .withColumn("is_current", F.lit(False))
        .drop("_uk", "_uts")
    )
    # history rows of affected keys that were already closed
    history = (
        dim.filter(~F.col("is_current"))
        .join(upd_keys, dim[key] == upd_keys["_uk"], "left_semi")
    )
    opened = scd2_init(upd, key, ts_col)
    return untouched.unionByName(history).unionByName(closed).unionByName(opened)
