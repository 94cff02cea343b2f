"""Streaming-layer tests (SURVEY.md §2.10): deterministic file-replay
micro-batches through the bronze/fact pipelines.

Covers: update-mode windowed agg refinement (T4 duplicate emission is
part of the spec), watermark late-drop (T1), fact enrichment stream
(J1/P-chain), multi-query runner (T8/T11), commit-log latency
analytics (S6/X11).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_for_data_streaming_and_analysis_spark.maintenance import commitlog
from lakehouse_for_data_streaming_and_analysis_spark.sources import streams
from lakehouse_for_data_streaming_and_analysis_spark.streaming import bronze, fact, runner

BASE_TS = 1704067200  # 2024-01-01 00:00:00 UTC


@pytest.fixture()
def scratch():
    d = tempfile.mkdtemp(dir="/root/repo/.scratch")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _tick_json_df(spark, n=200, step_sec=5):
    """JSON tick payloads exactly as the Kafka producer emits them
    (kafka_producer.py:21-24): {"bitcoin": "<price-str>", "timestamp": unix}."""
    rows = [
        (
            '{"bitcoin": "%s", "timestamp": %s}'
            % (100 + (i % 50) + 0.5, BASE_TS + i * step_sec),
            i,
        )
        for i in range(n)
    ]
    schema = T.StructType(
        [T.StructField("value", T.StringType()), T.StructField("seq", T.LongType())]
    )
    return spark.createDataFrame(rows, schema)


def _replay(spark, df, scratch, n_files, order_col="seq"):
    replay_dir = os.path.join(scratch, "replay")
    streams.write_replay_files(df, replay_dir, n_files, order_col)
    return streams.file_replay(spark, replay_dir, df.schema)


def test_bronze_update_mode_refinement(spark, scratch):
    raw = _tick_json_df(spark, n=200)
    stream_raw = _replay(spark, raw, scratch, n_files=4)
    ticks = streams.parse_ticks(stream_raw, "bitcoin")

    emissions: list[tuple[int, list]] = []

    def sink(batch_df, batch_id):
        emissions.append((batch_id, batch_df.collect()))

    q = bronze.start_bronze_query(
        ticks,
        "bitcoin",
        sink,
        os.path.join(scratch, "ckpt"),
        output_mode="update",
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)

    # final state per window (minute of the emitted last-timestamp)
    final = {}
    for _bid, rows in emissions:
        for r in rows:
            minute = r["timestamp"].replace(second=0, microsecond=0)
            final[minute] = r["average_1minute"]

    batch_ticks = streams.parse_ticks(raw, "bitcoin")
    expected = {
        r["win"]["start"]: r["avg"]
        for r in batch_ticks.groupBy(F.window("timestamp", "1 minute").alias("win"))
        .agg(F.avg("bitcoin").alias("avg"))
        .collect()
    }
    assert final.keys() == expected.keys()
    for k in expected:
        assert final[k] == pytest.approx(expected[k], rel=1e-12)

    # T4: at least one window refined across micro-batches (update mode
    # emits the window once per touching batch)
    emitted_minutes = [
        r["timestamp"].replace(second=0, microsecond=0)
        for _bid, rows in emissions
        for r in rows
    ]
    assert len(emitted_minutes) > len(set(emitted_minutes))


def test_watermark_drops_late_rows(spark, scratch):
    """T1: with a 1-minute watermark and append mode, a row arriving
    after the watermark passed its window must not change the result."""
    schema = T.StructType(
        [T.StructField("price", T.DoubleType()), T.StructField("timestamp", T.TimestampType())]
    )

    def ts(minute, sec):
        return F.timestamp_seconds(F.lit(BASE_TS + minute * 60 + sec)).cast("timestamp")

    b1 = spark.range(1).select(F.lit(10.0).alias("price"), ts(0, 10).alias("timestamp"))
    b2 = spark.range(1).select(F.lit(20.0).alias("price"), ts(10, 0).alias("timestamp"))
    # watermark advancement lags one batch behind the event that raised
    # it (it is applied from stats of the *previous* batch), so a
    # filler batch sits between the advance and the late arrival
    b3 = spark.range(1).select(F.lit(30.0).alias("price"), ts(10, 30).alias("timestamp"))
    late = spark.range(1).select(F.lit(999.0).alias("price"), ts(0, 30).alias("timestamp"))

    replay_dir = os.path.join(scratch, "replay")
    streams.write_replay_batches([b1, b2, b3, late], replay_dir)

    stream = streams.file_replay(spark, replay_dir, schema)
    agg = (
        stream.withWatermark("timestamp", "1 minute")
        .groupBy(F.window("timestamp", "1 minute").alias("win"))
        .agg(F.avg("price").alias("avg_price"), F.count(F.lit(1)).alias("n"))
    )
    out: list = []
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: out.extend(df.collect()))
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    win0 = [r for r in out if r["win"]["start"].minute == 0]
    assert len(win0) == 1
    # late 999.0 must be excluded: closed window still avg=10, n=1
    assert win0[0]["avg_price"] == 10.0 and win0[0]["n"] == 1


def test_fact_stream_enrichment(spark, scratch):
    dim = spark.createDataFrame(
        [(0, "bitcoin", 19_000_000.0), (1, "ethereum", 120_000_000.0)],
        "coin_id int, name string, supply double",
    )
    bronze_rows = spark.range(60).select(
        (F.lit(100.0) + F.col("id")).alias("bitcoin"),
        F.timestamp_seconds(F.lit(BASE_TS) + F.col("id") * 10).alias("timestamp"),
        (F.lit(100.0) + F.col("id")).alias("average_1minute"),
    )
    bronze_dir = os.path.join(scratch, "bronze")
    bronze_rows.write.parquet(bronze_dir)

    stream = streams.file_replay(spark, bronze_dir, bronze_rows.schema, files_per_trigger=10)
    clock = F.timestamp_seconds(F.lit(BASE_TS))
    q = fact.start_fact_query(
        stream,
        dim.filter(F.col("name") == "bitcoin"),
        "bitcoin",
        F.lit(True),
        last_price=100.0,
        out_path=os.path.join(scratch, "fact"),
        checkpoint_dir=os.path.join(scratch, "ckpt"),
        trigger={"availableNow": True},
        clock=clock,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(os.path.join(scratch, "fact"))
    expected = fact.enrich_fact(
        bronze_rows, dim.filter(F.col("name") == "bitcoin"), "bitcoin",
        F.lit(True), last_price=100.0, clock=clock,
    )
    # partition column lands last in the on-disk schema — align by name
    got = got.select(*expected.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
    # partitioned layout on disk (K1 partitionBy coin_id)
    assert any("coin_id=0" in p for p in os.listdir(os.path.join(scratch, "fact")))


def test_multi_query_runner(spark, scratch):
    raw = _tick_json_df(spark, n=60)
    outputs: dict[str, list] = {"a": [], "b": []}

    def make_query(tag):
        stream_raw = _replay(spark, raw, os.path.join(scratch, tag), n_files=2)
        ticks = streams.parse_ticks(stream_raw, "bitcoin")
        return bronze.start_bronze_query(
            ticks,
            "bitcoin",
            lambda df, bid, t=tag: outputs[t].extend(df.collect()),
            os.path.join(scratch, f"ckpt_{tag}"),
            trigger={"availableNow": True},
        )

    r = runner.StreamRunner()
    r.launch(lambda: make_query("a"), lambda: make_query("b"))
    for q in r._queries:
        q.awaitTermination(120)
    r.stop_all()
    assert outputs["a"] and outputs["b"]
    assert all(not q.isActive for q in r._queries)


def test_commitlog_latency_report(spark, scratch):
    raw = _tick_json_df(spark, n=90)
    stream_raw = _replay(spark, raw, scratch, n_files=3)
    ticks = streams.parse_ticks(stream_raw, "bitcoin")
    sink = commitlog.parquet_commit_sink(
        os.path.join(scratch, "out"), os.path.join(scratch, "log")
    )
    q = (
        ticks.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    report = commitlog.latency_report(spark, os.path.join(scratch, "log"))
    rows = report.collect()
    assert len(rows) == 3
    assert all(r["delay_sec"] is not None and r["numRecords"] == 30 for r in rows)
    summary = commitlog.latency_summary(report).collect()[0]
    assert summary["n_commits"] == 3
    assert summary["min_delay"] <= summary["median_delay"] <= summary["max_delay"]


def test_drop_duplicates_within_watermark(spark, scratch):
    """T10: the reference only watermark-drops late rows (SURVEY.md
    §2.10 T10 'no dedup'); the rebuild exposes the missing half —
    dropDuplicatesWithinWatermark removes redelivered events whose
    duplicates arrive inside the watermark window."""
    rows = []
    for i in range(120):
        rows.append((i, BASE_TS + i * 5, 100.0 + i))
        if i % 10 == 0:  # duplicate redelivery close to the original
            rows.append((i, BASE_TS + i * 5, 100.0 + i))
    schema = T.StructType(
        [
            T.StructField("seq", T.LongType()),
            T.StructField("unix", T.LongType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    replay_dir = os.path.join(scratch, "replay_dedup")
    streams.write_replay_files(df, replay_dir, n_files=3, order_col="seq")
    stream = (
        streams.file_replay(spark, replay_dir, schema)
        .withColumn("ts", F.timestamp_seconds("unix"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["seq"])
    )
    sink = os.path.join(scratch, "dedup_out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", os.path.join(scratch, "dedup_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert got.count() == 120  # 12 duplicates dropped
    assert got.select("seq").distinct().count() == 120


def test_streaming_session_window_agg(spark, scratch):
    """Streaming session windows (the streaming twin of the batch
    sessionize_user_events operator): a 2-minute-gap session_window
    aggregate under a watermark, append mode — sessions split where
    the gap exceeds the timeout, merge where activity continues, and
    close (emit) only once the watermark passes their end."""
    schema = T.StructType(
        [
            T.StructField("user", T.StringType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("timestamp", T.TimestampType()),
        ]
    )

    def row(user, amount, minute, sec):
        return spark.range(1).select(
            F.lit(user).alias("user"),
            F.lit(amount).alias("amount"),
            F.timestamp_seconds(F.lit(BASE_TS + minute * 60 + sec)).cast(
                "timestamp"
            ).alias("timestamp"),
        )

    # u1: burst at minutes 0-1 (one session), second burst at minute 10
    # (separate session: gap > 2 min). u2: single event.
    b1 = row("u1", 1.0, 0, 0).union(row("u1", 2.0, 1, 0)).union(row("u2", 5.0, 0, 30))
    b2 = row("u1", 3.0, 10, 0)
    # advance watermark far enough to close everything
    b3 = row("u3", 0.0, 30, 0)
    b4 = row("u3", 0.0, 31, 0)  # filler: watermark applies next batch

    replay_dir = os.path.join(scratch, "sess_replay")
    streams.write_replay_batches([b1, b2, b3, b4], replay_dir)

    stream = streams.file_replay(spark, replay_dir, schema)
    agg = (
        stream.withWatermark("timestamp", "1 minute")
        .groupBy(
            F.session_window("timestamp", "2 minutes").alias("sess"),
            F.col("user"),
        )
        .agg(F.sum("amount").alias("total"), F.count(F.lit(1)).alias("n"))
    )
    out: list = []
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: out.extend(df.collect()))
        .option("checkpointLocation", os.path.join(scratch, "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user"], r["sess"]["start"].minute): (r["total"], r["n"])
        for r in out
        if r["user"] in ("u1", "u2")
    }
    # u1's first two events merged into one session (0:00..1:00+gap),
    # the minute-10 event is its own session, u2 is a singleton
    assert got[("u1", 0)] == (3.0, 2)
    assert got[("u1", 10)] == (3.0, 1)
    assert got[("u2", 0)] == (5.0, 1)
    # session end extends gap past the last event: the merged session
    # spans events at minute 0 and 1, so it must end at minute 3
    ends = {
        (r["user"], r["sess"]["start"].minute): r["sess"]["end"].minute
        for r in out
        if r["user"] == "u1"
    }
    assert ends[("u1", 0)] == 3


def test_live_commit_latency_meets_baseline(spark, scratch):
    """§6 parity bar (BASELINE.md): the reference's fact stream lands
    commits at median 6 s latency (1 s trigger, ~0.7 msg/s). Run a
    live rate-source pipeline through the same foreachBatch commit
    sink at a comparable ingest rate and assert the measured median
    commit delay (commit wall-clock − min event time, the reference's
    own TimeDelay.ipynb metric) beats that bar."""
    import time as _time

    from lakehouse_for_data_streaming_and_analysis_spark.maintenance import commitlog

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "2")
        .load()
        .selectExpr("timestamp", "CAST(value AS DOUBLE) AS price")
    )
    sink = commitlog.parquet_commit_sink(
        os.path.join(scratch, "live_out"), os.path.join(scratch, "live_log")
    )
    q = (
        src.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(scratch, "live_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = _time.time() + 20
    while _time.time() < deadline:
        _time.sleep(1)
    q.stop()
    q.awaitTermination(30)

    report = commitlog.latency_report(spark, os.path.join(scratch, "live_log"))
    summary = commitlog.latency_summary(report).collect()[0]
    assert summary["n_commits"] >= 5, summary
    # Reference bar: median 6 s on local[2]; this engine on local[N]
    # must land within it with margin.
    assert summary["median_delay"] <= 6, summary


def test_complete_mode_emits_full_state_each_batch(spark, scratch):
    """Output-mode matrix completion: the reference uses update
    (bronze agg) and append (fact); complete mode re-emits the ENTIRE
    aggregate every micro-batch. Feed two batches and assert the
    final emission carries every key with totals equal to the batch
    ground truth, and that emission cardinality grows to the full key
    set (not just touched keys, which is update mode's contract)."""
    raw = _tick_json_df(spark, n=60)
    stream_raw = _replay(spark, raw, scratch, n_files=2)
    ticks = streams.parse_ticks(stream_raw, "bitcoin")

    agg = ticks.groupBy(F.window("timestamp", "1 minute")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("bitcoin"), 6).alias("total"),
    )
    sink = os.path.join(scratch, "complete_out")

    emissions = []

    def land(batch_df, batch_id):
        rows = batch_df.collect()
        if rows:
            emissions.append((batch_id, rows))

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(land)
        .option("checkpointLocation", os.path.join(scratch, "complete_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert len(emissions) >= 2
    # complete mode: the last emission IS the whole aggregate
    final = {r["window"]: (r["n"], r["total"]) for r in emissions[-1][1]}
    truth = {
        r["window"]: (r["n"], r["total"])
        for r in streams.parse_ticks(
            raw.select("value"), "bitcoin"
        )  # batch replay of the same parse chain
        .groupBy(F.window("timestamp", "1 minute"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("bitcoin"), 6).alias("total"),
        )
        .collect()
    }
    assert final == truth
    # monotone: later emissions carry >= as many windows as earlier ones
    sizes = [len(rows) for _, rows in emissions]
    assert sizes == sorted(sizes)


def test_kafka_reader_option_contract(spark):
    """S1: the Kafka source option surface (the part testable without
    the spark-sql-kafka jar). Every knob must land under the exact
    documented spark-kafka option name; the kafka source itself is
    absent from this classpath, so attempting to build the reader must
    raise the well-known missing-data-source error — not something
    else (which would mean our reader construction is broken)."""
    opts = streams.kafka_reader_options(
        "ticks",
        brokers="b1:9092,b2:9092",
        starting_offsets="earliest",
        max_offsets_per_trigger=100000,
        fail_on_data_loss=False,
        group_id_prefix="lakehouse",
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "ticks",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "100000",
        "groupIdPrefix": "lakehouse",
    }
    # defaults: latest offsets, loud on data loss, no optional keys
    d = streams.kafka_reader_options("t")
    assert d["startingOffsets"] == "latest"
    assert d["failOnDataLoss"] == "true"
    assert "maxOffsetsPerTrigger" not in d and "groupIdPrefix" not in d

    import pytest as _pytest

    with _pytest.raises(Exception, match="kafka"):
        streams.kafka_ticks(spark, "ticks", "bitcoin")


def test_streaming_session_window_merges_and_closes(spark, scratch):
    """T3 variant: session_window in a real StreamingQuery — events
    within the 5-minute gap merge into one session, a later event
    opens a new one, and append mode emits a session only after the
    watermark passes its (last event + gap) close."""
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
        ]
    )

    def row(user, minute, sec=0):
        return spark.range(1).select(
            F.lit(user).cast("long").alias("user_id"),
            F.timestamp_seconds(F.lit(BASE_TS + minute * 60 + sec)).cast(
                "timestamp"
            ).alias("timestamp"),
        )

    b1 = row(1, 0, 10).union(row(2, 1))
    b2 = row(1, 2)          # merges into user 1's first session (gap < 5m)
    b3 = row(1, 20)         # new session (gap > 5m)
    b4 = row(9, 60)         # sentinel advances the watermark
    b5 = row(9, 61)         # filler: watermark application lags a batch
    replay_dir = os.path.join(scratch, "sess_replay")
    streams.write_replay_batches([b1, b2, b3, b4, b5], replay_dir)

    stream = streams.file_replay(spark, replay_dir, schema)
    agg = (
        stream.withWatermark("timestamp", "1 minute")
        .groupBy(
            F.session_window("timestamp", "5 minutes").alias("sw"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out: list = []
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: out.extend(df.collect()))
        .option("checkpointLocation", os.path.join(scratch, "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    def mins(ts):
        return (ts.timestamp() - BASE_TS) / 60.0

    got = {
        (r["user_id"], mins(r["sw"]["start"]), mins(r["sw"]["end"]), r["n"])
        for r in out
    }
    # session end = last event + gap; u9's sessions stay open (no later
    # watermark passes them) and must NOT be emitted
    assert got == {
        (1, 10 / 60.0, 7.0, 2),   # 0:10 and 2:00 merged, end 2:00+5m
        (2, 1.0, 6.0, 1),
        (1, 20.0, 25.0, 1),
    }


def test_concurrent_topology_commit_latency(spark, scratch):
    """§6 bar under the reference's ACTUAL topology: 2 bronze + 2 fact
    streaming queries live SIMULTANEOUSLY under the FAIR pool
    (streaming_pipeline.py:54-60 shape; the session factory sets
    spark.scheduler.mode=FAIR), not single-pipeline. The commit-latency
    gate (median <= 6 s, the reference's own TimeDelay metric) must
    hold with all four queries contending for executor slots."""
    import time as _time

    dim = spark.createDataFrame(
        [(0, "bitcoin", 19_000_000.0), (1, "ethereum", 120_000_000.0)],
        "coin_id int, name string, supply double",
    )

    def _ticks(coin):
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "2")
            .load()
            .selectExpr(
                "timestamp", f"CAST(value AS DOUBLE) + 100.0 AS {coin}"
            )
        )

    r = runner.StreamRunner()
    logs = []
    # size shuffle/state partitions to the micro-batch volume: 32
    # state partitions per stateful query x 4 queries = 128 state
    # stores maintained per second for a few-KB batch — pure overhead
    # at this volume (in production you size this to cluster width;
    # the streaming checkpoints pin it per-query at first start)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        for coin in ("bitcoin", "ethereum"):
            log_dir = os.path.join(scratch, f"log_{coin}")
            logs.append(log_dir)
            sink = commitlog.parquet_commit_sink(
                os.path.join(scratch, f"bronze_{coin}"), log_dir
            )
            r.add(
                bronze.start_bronze_query(
                    _ticks(coin),
                    coin,
                    sink,
                    os.path.join(scratch, f"ckpt_b_{coin}"),
                    trigger={"processingTime": "1 second"},
                )
            )
            r.add(
                fact.start_fact_query(
                    _ticks(coin).withColumn(
                        "average_1minute", F.col(coin)
                    ),
                    dim.filter(F.col("name") == coin),
                    coin,
                    F.lit(True),
                    last_price=100.0,
                    out_path=os.path.join(scratch, f"fact_{coin}"),
                    checkpoint_dir=os.path.join(scratch, f"ckpt_f_{coin}"),
                )
            )
        assert sum(q.isActive for q in r._queries) == 4
        # long enough that the post-JIT steady state dominates: the
        # first micro-batch of each of the 4 queries pays plan codegen
        deadline = _time.time() + 40
        while _time.time() < deadline:
            _time.sleep(1)
    finally:
        r.stop_all()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    for log_dir in logs:
        report = commitlog.latency_report(spark, log_dir)
        # steady-state gate: the first commit of each pipeline pays
        # plan codegen/JIT, which is startup cost, not commit latency
        # — the reference's own 6 s median is a steady-state number
        first_v = report.agg(F.min("version")).collect()[0][0]
        summary = commitlog.latency_summary(
            report.filter(F.col("version") > first_v)
        ).collect()[0]
        assert summary["n_commits"] >= 4, (log_dir, summary)
        assert summary["median_delay"] <= 6, (log_dir, summary)
    # the fact side landed partitioned appends while bronze committed
    for coin in ("bitcoin", "ethereum"):
        got = spark.read.parquet(os.path.join(scratch, f"fact_{coin}"))
        assert got.count() > 0
        assert "coin_id" in got.columns
