"""Idempotent foreachBatch sink — exactly-once *output* discipline.

Checkpointing makes source offsets exactly-once, but a foreachBatch
body that appends blindly can still double-write when a batch is
retried after a partial failure (the classic at-least-once hole the
reference has everywhere, consumer.py:76). The standard fix for file
sinks: write each epoch to its own directory, commit atomically by
marker file, and skip epochs already committed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def idempotent_epoch_sink(output_dir: str, fmt: str = "json"):
    """foreachBatch body writing epoch-scoped, marker-committed output.

    Layout: `<output_dir>/epoch=<id>/` + `_COMMITTED` marker. A retried
    epoch sees its marker and becomes a no-op; readers consider only
    committed epochs (`read_committed`)."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        epoch_dir = os.path.join(output_dir, f"epoch={epoch_id}")
        marker = os.path.join(epoch_dir, "_COMMITTED")
        if os.path.exists(marker):
            return  # retried epoch: already durable, skip
        batch.write.mode("overwrite").format(fmt).save(epoch_dir)
        with open(marker, "w") as f:
            f.write("ok")

    return write_batch


def committed_epoch_dirs(output_dir: str) -> list[str]:
    if not os.path.isdir(output_dir):
        return []
    return sorted(
        os.path.join(output_dir, d)
        for d in os.listdir(output_dir)
        if d.startswith("epoch=")
        and os.path.exists(os.path.join(output_dir, d, "_COMMITTED"))
    )
