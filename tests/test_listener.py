"""StreamingQueryListener progress capture (maintenance/listener.py):
micro-batch metrics land in the typed frame, the per-query summary
rolls up, and detach stops the capture."""

from __future__ import annotations

import time

from lakehouse_for_data_streaming_and_analysis_spark.maintenance.listener import ProgressCapture
from lakehouse_for_data_streaming_and_analysis_spark.sources import pyds

import json


def _write_shard(dirpath, name, ticks):
    p = dirpath / name
    with open(p, "w") as f:
        for price, ts in ticks:
            f.write(json.dumps({"BTC": str(price), "timestamp": ts}) + "\n")


def test_progress_capture_records_batches_and_summary(spark, tmp_path):
    pyds.register(spark)
    d = tmp_path / "in"
    d.mkdir()
    for i in range(3):
        _write_shard(d, f"{i:03d}.jsonl", [(10.0 + i, 1_700_000_000 + i)])
    cap = ProgressCapture()
    spark.streams.addListener(cap)
    try:
        q = (
            spark.readStream.format("ticks")
            .option("path", str(d))
            .load()
            .writeStream.format("memory")
            .queryName("lst_q")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # the listener bus is async: wait for the progress events
        deadline = time.time() + 30
        while time.time() < deadline:
            if cap.to_df(spark).agg({"num_input_rows": "sum"}).collect()[0][0] == 3:
                break
            time.sleep(0.2)
        df = cap.to_df(spark)
        assert df.agg({"num_input_rows": "sum"}).collect()[0][0] == 3
        s = cap.summary(spark).collect()
        assert len(s) == 1
        row = s[0]
        assert row.total_rows == 3 and row.n_batches >= 1
        assert row.max_trigger_ms >= row.p50_trigger_ms >= 0
        assert ("started", str(q.id)) in cap.lifecycle
        deadline = time.time() + 30
        while time.time() < deadline and (
            ("terminated", str(q.id)) not in cap.lifecycle
        ):
            time.sleep(0.2)
        assert ("terminated", str(q.id)) in cap.lifecycle
    finally:
        spark.streams.removeListener(cap)
