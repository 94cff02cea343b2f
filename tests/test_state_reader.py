"""State-store-as-DataFrame (maintenance/state.py): read a windowed
aggregation's live state, the operator metadata directory, state time
travel by batchId, and the per-operator summary."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.maintenance import state as mstate
from lakehouse_for_data_streaming_and_analysis_spark.sources import pyds


def _write_shard(dirpath, name, ticks):
    p = dirpath / name
    with open(p, "w") as f:
        for price, ts in ticks:
            f.write(json.dumps({"BTC": str(price), "timestamp": ts}) + "\n")


def test_state_reader_windows_metadata_timetravel_summary(spark, tmp_path):
    pyds.register(spark)
    d = tmp_path / "in"
    d.mkdir()
    ck = str(tmp_path / "ck")
    # batch 1: two ticks in one minute-window; batch 2 adds a second window
    _write_shard(
        d, "000.jsonl", [(10.0, 1_700_000_000), (11.0, 1_700_000_010)]
    )

    def start():
        return (
            spark.readStream.format("ticks")
            .option("path", str(d))
            .load()
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "60 seconds"))
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName("state_q")
            .outputMode("update")
            .option("checkpointLocation", ck)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
        _write_shard(d, "001.jsonl", [(12.0, 1_700_000_065)])
        q.processAllAvailable()
    finally:
        q.stop()

    # live state: two windows
    st = mstate.state_store(spark, ck)
    # NOTE: state stores keep the operator's PHYSICAL schema - the
    # aggregate buffer column is `count`, not the query alias `n`
    rows = sorted(
        (str(r.key.window.start), r.value["count"]) for r in st.collect()
    )
    # epoch-aligned minute windows; the 1h watermark keeps both open
    assert rows == [
        ("2023-11-14 22:13:00", 2),
        ("2023-11-14 22:14:00", 1),
    ]

    # operator directory
    md = mstate.state_metadata(spark, ck).collect()
    assert len(md) == 1 and md[0].operatorName == "stateStoreSave"

    # time travel: at the first committed batch only one window existed
    first_batch = int(md[0].minBatchId)
    st0 = mstate.state_store(spark, ck, batch_id=first_batch)
    assert st0.count() == 1

    # summary rollup
    s = mstate.state_summary(spark, ck).collect()
    assert len(s) == 1
    assert s[0].n_keys == 2 and s[0].partitions_with_state >= 1


def test_state_summary_on_stateless_checkpoint_is_empty(spark, tmp_path):
    """A stateless query's checkpoint has no operator rows; the
    summary must be an empty frame, not an IndexError."""
    from lakehouse_for_data_streaming_and_analysis_spark.maintenance.state import state_summary

    src = tmp_path / "in"
    src.mkdir()
    import json as _json

    with open(src / "a.jsonl", "w") as f:
        f.write(_json.dumps({"v": 1}) + "\n")
    ckpt = str(tmp_path / "ckpt_stateless")
    q = (
        spark.readStream.schema("v long")
        .json(str(src))
        .select("v")  # no stateful operator anywhere
        .writeStream.format("memory")
        .queryName("stateless_probe")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = state_summary(spark, ckpt)
    assert out.count() == 0
    assert "operator_name" in out.columns
