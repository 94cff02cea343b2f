"""Streaming failure-recovery end-to-end: a StreamingQuery killed
mid-batch — after the sink wrote data but before it committed its
marker/txn — restarts from the Spark checkpoint and converges to
final state identical to an uninterrupted run.

This is the crash window the reference's bare foreachBatch append
double-writes in (Sourcecode/spark/udf.py:52-71); the exactly-once
sinks must heal it, not just the unit-level replay pins in
test_exactly_once.py.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.delta import DeltaishTable
from lakehouse_for_data_streaming_and_analysis_spark.streaming import exactly_once

N_ROWS = 900
N_FILES = 6


def _source(spark, tmp_path):
    src = str(tmp_path / "src")
    if not os.path.exists(src):
        (
            spark.range(N_ROWS)
            .withColumn("v", F.col("id") * 2)
            .repartition(N_FILES)
            .write.parquet(src)
        )
    return spark.readStream.schema("id long, v long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)


def _run(stream, sink_body, ckpt: str, expect_fail: bool = False) -> None:
    q = (
        stream.writeStream.foreachBatch(sink_body)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if expect_fail:
        with pytest.raises(Exception, match="injected crash"):
            q.awaitTermination(300)
    else:
        assert q.awaitTermination(300)


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_parquet_marker_sink_recovers_from_mid_batch_kill(spark, tmp_path):
    """Crash injected after batch 2's DATA write but before its commit
    marker; the restarted query replays batch 2 from the checkpoint,
    overwrites the half-written dir, and the final committed state is
    row-identical to an uninterrupted control run."""
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    inner = exactly_once.idempotent_foreach_batch(sink)
    crashed = {"done": False}

    def crashing(batch_df, batch_id):
        if batch_id == 2 and not crashed["done"]:
            crashed["done"] = True
            # the sink's crash window: data lands, marker does not
            batch_df.write.mode("overwrite").parquet(
                os.path.join(sink, f"batch={batch_id}")
            )
            raise RuntimeError("injected crash before marker")
        inner(batch_df, batch_id)

    _run(_source(spark, tmp_path), crashing, ckpt, expect_fail=True)
    assert crashed["done"]
    # the half-written batch is invisible to readers
    assert not os.path.exists(os.path.join(sink, "_committed_2"))
    got_partial = exactly_once.read_committed(spark, sink)
    assert got_partial.count() < N_ROWS

    # restart from the same checkpoint with the healthy sink body
    _run(_source(spark, tmp_path), inner, ckpt)
    got = exactly_once.read_committed(spark, sink)

    # uninterrupted control run
    ctl_sink = str(tmp_path / "ctl_sink")
    _run(
        _source(spark, tmp_path),
        exactly_once.idempotent_foreach_batch(ctl_sink),
        str(tmp_path / "ctl_ckpt"),
    )
    want = exactly_once.read_committed(spark, ctl_sink)
    assert _rows(got) == _rows(want)
    assert got.count() == N_ROWS


def test_delta_txn_sink_recovers_from_post_commit_kill(spark, tmp_path):
    """Crash injected AFTER the delta append (txn recorded) but before
    foreachBatch returns — the worst window, where the log already has
    the rows but Spark's checkpoint does not. The restart redelivers
    the batch id, the txn watermark skips it, and the final table is
    row-identical to an uninterrupted run (no double append)."""
    ev = spark.range(0).selectExpr("id", "id * 2 AS v")
    t = DeltaishTable.create(spark, str(tmp_path / "t"), ev)
    inner = t.streaming_sink(txn_app_id="recovery_writer")
    crashed = {"done": False}

    def crashing(batch_df, batch_id):
        inner(batch_df, batch_id)
        if batch_id == 2 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash after delta commit")

    ckpt = str(tmp_path / "ckpt")
    _run(_source(spark, tmp_path), crashing, ckpt, expect_fail=True)
    assert crashed["done"]
    n_mid = t.read().count()
    assert 0 < n_mid < N_ROWS

    _run(_source(spark, tmp_path), inner, ckpt)
    assert t.read().count() == N_ROWS

    # control: uninterrupted run lands the identical row set
    t2 = DeltaishTable.create(spark, str(tmp_path / "t2"), ev)
    _run(
        _source(spark, tmp_path),
        t2.streaming_sink(txn_app_id="ctl_writer"),
        str(tmp_path / "ctl_ckpt"),
    )
    assert _rows(t.read()) == _rows(t2.read())
    # and exactly one commit per delivered batch: the redelivered id
    # was skipped, not re-appended
    appends = [h for h in t.history() if h["operation"] == "WRITE"]
    assert len(appends) == N_FILES
