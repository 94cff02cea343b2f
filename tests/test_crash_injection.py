"""Mid-batch crash injection for STATEFUL streaming (VERDICT r7 ask #5).

``test_streaming_recovery.py`` covers stateless sinks; these pins
attack the two stateful operators with the ugliest interleaving — a
kill in the window AFTER the operator's state store committed the
batch version but BEFORE the sink committed its marker (and, for good
measure, after a marker commit but before foreachBatch returned). On
restart Spark redelivers the batch: the stream-stream OUTER join must
re-emit its dangling flush from the rolled-back state without
double-writing it, and the session-window aggregation must emit every
closed session exactly once. Each test fails if the recovery either
DOUBLE-EMITS (duplicate keys in the committed output) or DROPS
dangling/closed rows (committed output ⊂ the uninterrupted control).

Reference analogue: the reference pipeline's restart-on-first-boot
operational note (README.md:46) — its bare foreachBatch append
(Sourcecode/spark/udf.py:52-71) double-writes in exactly this window.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.operators import sessions
from lakehouse_for_data_streaming_and_analysis_spark.streaming import exactly_once


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def _run(stream_df, sink_body, ckpt, output_mode=None, expect_fail=False):
    w = stream_df.writeStream
    if output_mode:
        w = w.outputMode(output_mode)
    q = (
        w.foreachBatch(sink_body)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if expect_fail:
        with pytest.raises(Exception, match="injected crash"):
            q.awaitTermination(300)
    else:
        assert q.awaitTermination(300)


def _pin_replay_order(src: str, ts_col: str = "ts") -> None:
    """FileStreamSource replays in modification-time order with
    path-name tie-breaks; files written milliseconds apart (or in one
    job) can tie, and the UUID part-file names then randomize the
    replay order — which breaks the ascending-event-time premise the
    watermark math relies on. Re-stamp mtimes in min-event-time order
    with 2 s spacing so the replay order is the event-time order,
    deterministically."""
    import pyarrow.parquet as pq

    files = [
        os.path.join(src, f)
        for f in os.listdir(src)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    keyed = sorted(
        (min(pq.read_table(f, columns=[ts_col]).column(ts_col).to_pylist()), f)
        for f in files
    )
    base = int(os.path.getmtime(keyed[0][1]))
    for i, (_, f) in enumerate(keyed):
        os.utime(f, (base + 2 * i, base + 2 * i))


def _crashing_pre_marker(sink_dir, crash_batch):
    """Sink body that, at ``crash_batch``, lands the DATA then dies
    before the marker — state store already committed the batch's
    version when the write action finished, the sink commit never
    happens. Redelivery after restart must converge."""
    inner = exactly_once.idempotent_foreach_batch(sink_dir)
    state = {"crashed": False}

    def _sink(batch_df, batch_id):
        if batch_id == crash_batch and not state["crashed"]:
            state["crashed"] = True
            batch_df.write.mode("overwrite").parquet(
                os.path.join(sink_dir, f"batch={batch_id}")
            )
            raise RuntimeError("injected crash between state and sink commit")
        inner(batch_df, batch_id)

    return _sink, state


# ------------------------------------------------- stream-stream outer


def _outer_join_source_files(spark, tmp_path):
    """Deterministic two-sided replay: 3 ascending time-range files +
    1 far-future sentinel (one row per side) that pushes the watermark
    past every real event so the outer join's dangling flush fires.
    Clicks c0..c29 at minute 10*i; purchases only for even i, 5
    minutes after their click (inside the 1-hour join interval)."""
    src = str(tmp_path / "jsrc")
    if os.path.exists(src):
        return src
    base = "2024-01-01 00:00:00"
    clicks = spark.range(30).select(
        F.lit("click").alias("kind"),
        F.col("id").alias("key"),
        (F.col("id") % 10).alias("user_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(base)) + F.col("id") * 600
        ).alias("ts"),
    )
    purchases = spark.range(30).filter(F.col("id") % 2 == 0).select(
        F.lit("purchase").alias("kind"),
        (F.col("id") + 1000).alias("key"),
        (F.col("id") % 10).alias("user_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(base)) + F.col("id") * 600 + 300
        ).alias("ts"),
    )
    both = clicks.unionByName(purchases)
    both.repartitionByRange(3, "ts").sortWithinPartitions("ts").write.parquet(
        src
    )
    sentinel = spark.range(1).select(
        F.lit("click").alias("kind"),
        F.lit(-1).cast("long").alias("key"),
        F.lit(-1).cast("long").alias("user_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(base)) + F.lit(10 * 24 * 3600)
        ).alias("ts"),
    ).unionByName(
        spark.range(1).select(
            F.lit("purchase").alias("kind"),
            F.lit(-2).cast("long").alias("key"),
            F.lit(-1).cast("long").alias("user_id"),
            F.timestamp_seconds(
                F.unix_timestamp(F.lit(base)) + F.lit(10 * 24 * 3600)
            ).alias("ts"),
        )
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)
    _pin_replay_order(src)
    return src


def _outer_join_stream(spark, src):
    stream = (
        spark.readStream.schema("kind string, key long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    clicks = (
        stream.filter(F.col("kind") == "click")
        .select(
            F.col("key").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        stream.filter(F.col("kind") == "purchase")
        .select(
            F.col("key").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select("click_id", "c_user", "purchase_id")


def test_stream_stream_outer_join_survives_mid_batch_kill(spark, tmp_path):
    src = _outer_join_source_files(spark, tmp_path)

    # control: uninterrupted run
    ctl_sink = str(tmp_path / "ctl_sink")
    _run(
        _outer_join_stream(spark, src),
        exactly_once.idempotent_foreach_batch(ctl_sink),
        str(tmp_path / "ctl_ckpt"),
        output_mode="append",
    )
    want = exactly_once.read_committed(spark, ctl_sink)
    want_rows = _rows(want.filter(F.col("click_id") >= 0))
    # sanity on the control itself: every even click matched, every
    # odd click emitted DANGLING exactly once
    assert want.filter(
        (F.col("click_id") >= 0) & F.col("purchase_id").isNotNull()
    ).count() == 15
    assert want.filter(
        (F.col("click_id") >= 0) & F.col("purchase_id").isNull()
    ).count() == 15

    # crash in the dangling-flush window (the sentinel batch is the
    # last file; batch ids 0..3 — crash at 2, with real state live)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    body, state = _crashing_pre_marker(sink, crash_batch=2)
    _run(
        _outer_join_stream(spark, src), body, ckpt,
        output_mode="append", expect_fail=True,
    )
    assert state["crashed"]
    # restart from the same checkpoint with the healthy sink
    _run(
        _outer_join_stream(spark, src),
        exactly_once.idempotent_foreach_batch(sink),
        ckpt,
        output_mode="append",
    )
    got = exactly_once.read_committed(spark, sink)
    got_real = got.filter(F.col("click_id") >= 0)
    # no DOUBLE-EMIT: every click id appears exactly once
    assert (
        got_real.groupBy("click_id").count().filter(F.col("count") > 1).count()
        == 0
    )
    # no DROPPED dangling rows, no drift from the control at all
    assert _rows(got_real) == want_rows


# --------------------------------------------------- session windows


def _session_source_files(spark, tmp_path):
    """5 users x 3 sessions of 4 events (5-minute strides, 30-minute
    gap between sessions), split into 3 ascending time-range files +
    a far-future sentinel that closes every session."""
    src = str(tmp_path / "ssrc")
    if os.path.exists(src):
        return src
    base = "2024-02-01 00:00:00"
    ev = spark.range(5 * 3 * 4).select(
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(base))
            + (F.col("id") % 5) * 17  # de-sync users a little
            + ((F.col("id") / 5).cast("long") % 3) * 3600  # session block
            + ((F.col("id") / 15).cast("long")) * 300  # 5-min strides
        ).alias("ts"),
    )
    ev.repartitionByRange(3, "ts").sortWithinPartitions("ts").write.parquet(src)
    spark.range(1).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(base)) + F.lit(10 * 24 * 3600)
        ).alias("ts"),
    ).coalesce(1).write.mode("append").parquet(src)
    _pin_replay_order(src)
    return src


def _session_stream(spark, src):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    return sessions.session_window_agg(stream, "user_id", "ts", gap_minutes=30)


def test_session_window_survives_mid_batch_kill(spark, tmp_path):
    src = _session_source_files(spark, tmp_path)

    ctl_sink = str(tmp_path / "ctl_sink")
    _run(
        _session_stream(spark, src),
        exactly_once.idempotent_foreach_batch(ctl_sink),
        str(tmp_path / "ctl_ckpt"),
        output_mode="append",
    )
    want = exactly_once.read_committed(spark, ctl_sink).filter(
        F.col("user_id") >= 0
    )
    want_rows = _rows(want)
    # the streamed sessions must equal the BATCH session-window answer
    batch = sessions.session_window_agg(
        spark.read.parquet(src).filter(F.col("user_id") >= 0),
        "user_id",
        "ts",
        gap_minutes=30,
    )
    assert want_rows == _rows(batch)

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    body, state = _crashing_pre_marker(sink, crash_batch=2)
    _run(
        _session_stream(spark, src), body, ckpt,
        output_mode="append", expect_fail=True,
    )
    assert state["crashed"]
    _run(
        _session_stream(spark, src),
        exactly_once.idempotent_foreach_batch(sink),
        ckpt,
        output_mode="append",
    )
    got = exactly_once.read_committed(spark, sink).filter(
        F.col("user_id") >= 0
    )
    # exactly-once session identity: one row per (user, session_start)
    assert (
        got.groupBy("user_id", "session_start")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )
    # nothing dropped, nothing drifted
    assert _rows(got) == want_rows


# ------------------------------------- custom stateful operator (P3)


def _stateful_source(spark, tmp_path):
    src = str(tmp_path / "stsrc")
    if not os.path.exists(src):
        (
            spark.range(600)
            .selectExpr(
                "cast(id % 7 as string) as k",
                "cast(id as double) as v",
                "timestamp_seconds(1700000000 + id * 60) as ts",
            )
            .repartition(5)
            .write.parquet(src)
        )
    return (
        spark.readStream.schema("k string, v double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _final_per_key(spark, sink_dir):
    """update-mode semantics: the live value per key is its row in the
    LAST committed batch that contained the key."""
    import re

    batches = sorted(
        int(m.group(1))
        for m in (
            re.match(r"_committed_(\d+)$", f) for f in os.listdir(sink_dir)
        )
        if m
    )
    out = {}
    for b in batches:
        for r in spark.read.parquet(
            os.path.join(sink_dir, f"batch={b}")
        ).collect():
            out[r["key"]] = (r["n_rows"], r["total"])
    return out


def test_apply_in_pandas_with_state_survives_mid_batch_kill(spark, tmp_path):
    """Crash injection for the CUSTOM stateful operator
    (applyInPandasWithState running_stats): the state store committed
    the batch's version, the sink marker did not. The redelivered
    batch must fold from the ROLLED-BACK state — a replay folding
    onto post-crash state would double-count every row of the batch
    (n_rows/total inflated), and a dropped redelivery would
    undercount. Final per-key running stats must equal BOTH the
    uninterrupted control and the batch recompute."""
    from lakehouse_for_data_streaming_and_analysis_spark.streaming import stateful

    def stats_stream():
        return stateful.running_stats(
            _stateful_source(spark, tmp_path), "k", "v", "ts"
        )

    ctl_sink = str(tmp_path / "ctl_sink")
    _run(
        stats_stream(),
        exactly_once.idempotent_foreach_batch(ctl_sink),
        str(tmp_path / "ctl_ckpt"),
        output_mode="update",
    )
    want = _final_per_key(spark, ctl_sink)
    # ground truth: the batch recompute over the full input
    truth = {
        r["k"]: (r["n"], r["total"])
        for r in spark.read.parquet(str(tmp_path / "stsrc"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("v"), 6).alias("total"),
        )
        .collect()
    }
    assert want == truth  # control itself is exactly-once

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    body, state = _crashing_pre_marker(sink, crash_batch=2)
    _run(stats_stream(), body, ckpt, output_mode="update", expect_fail=True)
    assert state["crashed"]
    _run(
        stats_stream(),
        exactly_once.idempotent_foreach_batch(sink),
        ckpt,
        output_mode="update",
    )
    got = _final_per_key(spark, sink)
    assert got == want  # no double-fold, no dropped redelivery
