"""Exactly-once foreachBatch sink: replayed batches don't double-write,
half-written batches heal, uncommitted data is invisible to readers."""

from __future__ import annotations

import os

import pytest

from lakehouse_for_data_streaming_and_analysis_spark.streaming import exactly_once


def test_replayed_batch_is_skipped(spark, tmp_path):
    sink = str(tmp_path / "sink")
    body = exactly_once.idempotent_foreach_batch(sink)
    df = spark.range(100)
    body(df, 0)
    body(df, 0)  # replay after a post-commit failure
    body(df, 1)
    got = exactly_once.read_committed(spark, sink)
    assert got.count() == 200  # not 300


def test_half_written_batch_heals_on_replay(spark, tmp_path):
    sink = str(tmp_path / "sink")
    body = exactly_once.idempotent_foreach_batch(sink)
    df = spark.range(50)
    # simulate a crash between data write and marker commit
    df.write.mode("overwrite").parquet(os.path.join(sink, "batch=0"))
    assert not os.path.exists(os.path.join(sink, "_committed_0"))
    with pytest.raises(FileNotFoundError):
        exactly_once.read_committed(spark, sink)  # uncommitted => invisible
    body(df, 0)  # the replay
    got = exactly_once.read_committed(spark, sink)
    assert got.count() == 50


def test_streaming_end_to_end_idempotent(spark, tmp_path):
    """Drive it from a real availableNow stream; rows out == rows in."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    spark.range(1000).withColumn("v", F.col("id") * 2).repartition(3).write.parquet(src)
    stream = spark.readStream.schema("id long, v long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    sink = str(tmp_path / "sink")
    q = (
        stream.writeStream.foreachBatch(exactly_once.idempotent_foreach_batch(sink))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert exactly_once.read_committed(spark, sink).count() == 1000
