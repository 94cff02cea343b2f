"""Change-Data-Feed DataSource (sources/cdf_stream.py): batch feed
reads match the engine-side read_change_feed, the streaming feed's
offsets are table versions (incremental, restart-exact), and
unsupported layouts fail loudly at planning time."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table
from lakehouse_for_data_streaming_and_analysis_spark.delta import DeltaishTable
from lakehouse_for_data_streaming_and_analysis_spark.sources import cdf_stream

from .conftest import SF_DIR


def _orders(spark, n=None):
    df = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    return df.limit(n) if n else df


def _feed_rows(df):
    """Comparable view: data cols + change type + version (commit
    timestamps differ at float precision between the two readers)."""
    return sorted(
        (r.o_orderkey, r.o_totalprice, r._change_type, r._commit_version)
        for r in df.collect()
    )


def _build_cdf_table(spark, path):
    src = _orders(spark, 20)
    t = DeltaishTable.create(spark, path, src.limit(12))  # v0
    v1 = t.enable_change_data_feed()
    upd = src.limit(5).withColumn("o_totalprice", F.lit(9.5))
    v2 = t.merge(upd, ["o_orderkey"])  # updates + maybe inserts
    v3 = t.append(
        src.filter(F.col("o_orderkey") > 9000000).limit(0).unionByName(
            src.subtract(src.limit(12)).limit(4)
        )
    )
    return t, (v1, v2, v3)


def test_batch_feed_matches_engine_reader(spark, tmp_path):
    t, (v1, v2, v3) = _build_cdf_table(spark, str(tmp_path / "t"))
    cdf_stream.register(spark)
    got = (
        spark.read.format("deltaish_cdf")
        .option("path", t.path)
        .option("startingVersion", 0)
        .load()
    )
    assert _feed_rows(got) == _feed_rows(t.read_change_feed(-1, v3))
    # bounded range: only the MERGE commit
    merge_only = (
        spark.read.format("deltaish_cdf")
        .option("path", t.path)
        .option("startingVersion", v2)
        .option("endingVersion", v2)
        .load()
    )
    assert _feed_rows(merge_only) == _feed_rows(t.read_change_feed(v1, v2))
    types = {
        r._change_type for r in merge_only.select("_change_type").collect()
    }
    assert "update_preimage" in types and "update_postimage" in types


def test_stream_feed_incremental_and_restartable(spark, tmp_path):
    t, (v1, v2, v3) = _build_cdf_table(spark, str(tmp_path / "t"))
    cdf_stream.register(spark)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def drain():
        # parquet sink: supports checkpoint recovery (the memory sink
        # does not), so each drain is a genuine restart from offsets
        q = (
            spark.readStream.format("deltaish_cdf")
            .option("path", t.path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return spark.read.parquet(out)

    first = drain()
    assert _feed_rows(first) == _feed_rows(t.read_change_feed(-1, v3))

    # restart consumes only the commits past the checkpointed version:
    # the cumulative output grows by exactly feed(v3, v4] — a replay
    # would duplicate the earlier rows and break the multiset equality
    src = _orders(spark, 40)
    v4 = t.append(src.subtract(_orders(spark, 20)).limit(3))
    second = drain()
    assert _feed_rows(second) == _feed_rows(t.read_change_feed(-1, v4))
    assert sorted(
        r._commit_version
        for r in second.collect()
        if r._commit_version == v4
    ) == sorted(
        r._commit_version for r in t.read_change_feed(v3, v4).collect()
    )

    # nothing new -> nothing appended, not a replay
    third = drain()
    assert third.count() == second.count()


def test_planning_guards_fail_loudly(spark, tmp_path):
    cdf_stream.register(spark)
    # partitioned table: partition values are not in the data files
    src = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).limit(10)
    DeltaishTable.create(
        spark, str(tmp_path / "p"), src, partition_by=("o_orderstatus",)
    )
    with pytest.raises(Exception, match="partitioned"):
        spark.read.format("deltaish_cdf").option(
            "path", str(tmp_path / "p")
        ).load().collect()

    # a MERGE from before CDF was enabled cannot be attributed
    t = DeltaishTable.create(spark, str(tmp_path / "m"), _orders(spark, 10))
    t.merge(
        _orders(spark, 3).withColumn("o_totalprice", F.lit(1.0)),
        ["o_orderkey"],
    )
    with pytest.raises(Exception, match="MERGE without cdc"):
        spark.read.format("deltaish_cdf").option(
            "path", str(tmp_path / "m")
        ).load().collect()


def test_starting_timestamp_option(spark, tmp_path):
    """startingTimestamp resolves to the first commit at or after the
    given epoch-millis — Delta's option, on both feed halves."""
    from lakehouse_for_data_streaming_and_analysis_spark.delta import log as dlog

    t, (v1, v2, v3) = _build_cdf_table(spark, str(tmp_path / "t"))
    cdf_stream.register(spark)
    ts = {}
    for v in dlog.list_versions(t.path):
        for a in dlog.read_commit(t.path, v):
            if "commitInfo" in a:
                ts[v] = a["commitInfo"]["timestamp"]
    got = (
        spark.read.format("deltaish_cdf")
        .option("path", t.path)
        .option("startingTimestamp", ts[v2])
        .load()
    )
    want = t.read_change_feed(v2 - 1, v3)
    assert _feed_rows(got) == _feed_rows(want)
    # future timestamp: empty feed
    empty = (
        spark.read.format("deltaish_cdf")
        .option("path", t.path)
        .option("startingTimestamp", ts[v3] + 60_000)
        .load()
    )
    assert empty.count() == 0


def test_streaming_ivm_silver_table(spark, tmp_path):
    """Medallion-with-updates: a silver per-bucket aggregate is
    maintained ONLY from the streaming change feed (foreachBatch
    folds each micro-batch's signed deltas — +insert/+postimage,
    -delete/-preimage — into the silver state). After deletes and
    updates land on bronze, the silver state must hash-equal a direct
    aggregate of the final bronze snapshot; cost per refresh is the
    day's changes, not the table."""
    from pyspark.sql import functions as F

    from lakehouse_for_data_streaming_and_analysis_spark.delta import DeltaishTable

    src = _orders(spark, 40)
    bronze = DeltaishTable.create(spark, str(tmp_path / "bronze"), src)
    bronze.enable_change_data_feed()
    cdf_stream.register(spark)
    silver_path = str(tmp_path / "silver")
    ck = str(tmp_path / "ck")
    bucket = (F.col("o_orderkey") % 7).cast("long").alias("bucket")

    def fold(batch_df, batch_id):
        w = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), 1
        ).otherwise(-1)
        delta = (
            batch_df.withColumn("__w", w)
            .groupBy(bucket)
            .agg(
                F.sum("__w").cast("long").alias("n"),
                F.sum(
                    F.col("__w")
                    * F.col("o_totalprice").cast("decimal(18,2)")
                ).alias("tp"),
            )
        )
        if os.path.isdir(os.path.join(silver_path, "_delta_log")):
            t = DeltaishTable(batch_df.sparkSession, silver_path)
            combined = (
                t.read()
                .unionByName(delta)
                .groupBy("bucket")
                .agg(
                    F.sum("n").cast("long").alias("n"),
                    F.sum("tp")
                    .cast("decimal(18,2)")
                    .alias("tp"),
                )
                .filter(F.col("n") > 0)
                .localCheckpoint(eager=True)
            )
            t.overwrite(combined)
        else:
            DeltaishTable.create(
                batch_df.sparkSession,
                silver_path,
                delta.select(
                    "bucket",
                    "n",
                    F.col("tp").cast("decimal(18,2)").alias("tp"),
                ).localCheckpoint(eager=True),
            )

    def drain():
        q = (
            spark.readStream.format("deltaish_cdf")
            .option("path", bronze.path)
            .load()
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    def silver_state():
        return sorted(
            (r.bucket, r.n, float(r.tp))
            for r in DeltaishTable(spark, silver_path).read().collect()
        )

    def bronze_truth():
        return sorted(
            (r.bucket, r.n, float(r.tp))
            for r in bronze.read()
            .groupBy(bucket)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(18,2)")
                .alias("tp"),
            )
            .collect()
        )

    drain()
    assert silver_state() == bronze_truth()

    # bronze takes a MOR delete and a copy-on-write update; the
    # silver refresh folds only those change rows
    keys = sorted(r.o_orderkey for r in src.collect())
    bronze.delete(
        F.col("o_orderkey").isin(*keys[:5]), mode="merge_on_read"
    )
    bronze.update(
        F.col("o_orderkey").isin(*keys[5:8]),
        {"o_totalprice": F.col("o_totalprice") * 3},
    )
    drain()
    assert silver_state() == bronze_truth()

    # idle drain: no changes, no drift
    drain()
    assert silver_state() == bronze_truth()
