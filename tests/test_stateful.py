"""Custom stateful operator (applyInPandasWithState): state survives
across micro-batches and the final emission equals the batch truth."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse_for_data_streaming_and_analysis_spark.sources import streams
from lakehouse_for_data_streaming_and_analysis_spark.streaming import stateful

BASE_TS = 1704067200


@pytest.fixture()
def scratch():
    os.makedirs("/root/repo/.scratch", exist_ok=True)
    d = tempfile.mkdtemp(dir="/root/repo/.scratch")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events_df(spark, n=300):
    rows = [
        ("k%d" % (i % 3), float(i % 7) + 0.5, BASE_TS + i, i) for i in range(n)
    ]
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("unix", T.LongType()),
            T.StructField("seq", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_seconds("unix")
    )


def test_running_stats_accumulates_across_batches(spark, scratch):
    df = _events_df(spark)
    replay_dir = os.path.join(scratch, "replay")
    streams.write_replay_files(df, replay_dir, n_files=4, order_col="seq")
    stream = streams.file_replay(spark, replay_dir, df.schema).withColumn(
        "ts", F.timestamp_seconds("unix")
    )
    out = stateful.running_stats(stream, "key", "value", "ts")
    sink = os.path.join(scratch, "out")

    def land(batch_df, batch_id):  # K2 foreachBatch: update-mode -> append
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(sink)

    q = (
        out.writeStream.foreachBatch(land)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(sink)

    # multiple emissions per key (one per micro-batch that saw the key)
    per_key = got.groupBy("key").count().collect()
    assert all(r["count"] >= 2 for r in per_key), per_key

    # the emission with the highest n_rows per key == batch ground truth
    final = {
        r["key"]: r
        for r in got.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("key").orderBy(F.desc("n_rows"))
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    truth = {
        r["key"]: r
        for r in df.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 6).alias("total"),
            F.min("unix").cast("double").alias("first_unix"),
            F.max("unix").cast("double").alias("last_unix"),
        )
        .collect()
    }
    assert set(final) == set(truth) == {"k0", "k1", "k2"}
    for k, t in truth.items():
        f = final[k]
        assert f["n_rows"] == t["n_rows"]
        assert abs(f["total"] - t["total"]) < 1e-6
        assert f["first_unix"] == t["first_unix"]
        assert f["last_unix"] == t["last_unix"]

    # running counts are monotone per key across emissions
    for k in truth:
        ns = [
            r["n_rows"]
            for r in got.filter(F.col("key") == k).orderBy("n_rows").collect()
        ]
        assert ns == sorted(ns) and len(set(ns)) == len(ns)


def test_deviation_alerts_transform_with_state(spark, scratch):
    """transformWithStateInPandas: per-key ValueState survives across
    micro-batches, so alerts reference the truly-previous tick even
    when the previous tick arrived in an earlier batch; the alert set
    equals a batch lag() replay. The arbitrary-state API needs
    google.protobuf in the Python workers — skip where absent."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("transformWithState needs google.protobuf in workers")
    rows = []
    vals = {"k0": 100.0, "k1": 200.0}
    seq = 0
    for i in range(40):
        for k in ("k0", "k1"):
            # deterministic walk with occasional big jumps
            v = vals[k] * (1.6 if (seq % 13 == 0) else 1.01)
            vals[k] = v
            rows.append((k, round(v, 6), BASE_TS + seq, seq))
            seq += 1
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("unix", T.LongType()),
            T.StructField("seq", T.LongType()),
        ]
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_seconds("unix")
    )
    import os

    from lakehouse_for_data_streaming_and_analysis_spark.sources import streams

    replay_dir = os.path.join(scratch, "replay")
    streams.write_replay_files(df, replay_dir, n_files=4, order_col="seq")
    stream = streams.file_replay(spark, replay_dir, df.schema).withColumn(
        "ts", F.timestamp_seconds("unix")
    )
    out = stateful.deviation_alerts(
        stream, key_col="key", ts_col="ts", value_col="value", threshold_pct=20.0
    )
    sink = os.path.join(scratch, "alerts")

    def land(batch_df, batch_id):
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(sink)

    q = (
        out.writeStream.foreachBatch(land)
        .option("checkpointLocation", os.path.join(scratch, "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["key"], r["unix_ts"]): r for r in spark.read.parquet(sink).collect()
    }

    w = Window.partitionBy("key").orderBy("unix")
    truth = (
        df.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNotNull())
        .withColumn("pct", (F.col("value") - F.col("prev")) / F.col("prev") * 100)
        .filter(F.abs("pct") > 20.0)
        .collect()
    )
    assert len(truth) > 2
    assert len(got) == len(truth), (len(got), len(truth))
    for t in truth:
        g = got[(t["key"], float(t["unix"]))]
        assert abs(g["prev_value"] - t["prev"]) < 1e-9
        assert abs(g["change_pct"] - round(t["pct"], 4)) < 1e-6
