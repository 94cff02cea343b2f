"""Idempotent foreachBatch sink — exactly-once into plain parquet
(SURVEY.md §7.3 watch list).

The reference's foreachBatch body does a bare Delta append
(reference: Sourcecode/spark/udf.py:52-71), which double-writes when a
micro-batch is replayed after a failure between the write and the
checkpoint commit. Delta fixes this with txnAppId/txnVersion; the same
contract on plain parquet: each batch lands in its own
``batch=<id>/`` subdirectory and a zero-byte ``_committed_<id>``
marker is written AFTER the data. A replayed batch sees its marker and
skips; a half-written batch (data, no marker) is overwritten by the
replay. Readers take only committed batch dirs.

At scale this is the standard write-ahead-marker pattern: one marker
per micro-batch, no global lock, safe under the single-writer-per-
query model Structured Streaming already guarantees.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _marker(sink_dir: str, batch_id: int) -> str:
    return os.path.join(sink_dir, f"_committed_{batch_id}")


def idempotent_foreach_batch(sink_dir: str):
    """foreachBatch body: write batch to ``batch=<id>/`` then commit a
    marker; skip entirely if the marker already exists (replay)."""
    os.makedirs(sink_dir, exist_ok=True)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(_marker(sink_dir, batch_id)):
            return  # replayed batch — already fully committed
        out = os.path.join(sink_dir, f"batch={batch_id}")
        # overwrite handles the data-written-but-not-committed crash
        batch_df.write.mode("overwrite").parquet(out)
        with open(_marker(sink_dir, batch_id), "w"):
            pass

    return _sink


def read_committed(spark: SparkSession, sink_dir: str) -> DataFrame:
    """Read only batches whose commit marker exists."""
    committed = [
        os.path.join(sink_dir, f"batch={m[len('_committed_'):]}")
        for m in os.listdir(sink_dir)
        if m.startswith("_committed_")
    ]
    if not committed:
        raise FileNotFoundError(f"no committed batches under {sink_dir}")
    return spark.read.parquet(*committed)
