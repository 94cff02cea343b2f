"""Spark 4 Python DataSource "ticks" (sources/pyds.py): batch partition
planning, wire-format parsing, synthetic determinism, incremental
micro-batch streaming offsets, and exactly-once resume from a
checkpoint after a kill."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.sources import pyds


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    pyds.register(spark)


def _write_shard(dirpath, name, ticks):
    p = dirpath / name
    with open(p, "w") as f:
        for price, ts in ticks:
            f.write(json.dumps({"BTC": str(price), "timestamp": ts}) + "\n")
    return str(p)


def test_batch_reads_ndjson_with_one_partition_per_file(spark, tmp_path):
    d = tmp_path / "capture"
    d.mkdir()
    _write_shard(d, "a.jsonl", [(101.5, 1_700_000_000), (102.0, 1_700_000_001)])
    _write_shard(d, "b.jsonl", [(103.25, 1_700_000_002)])
    df = spark.read.format("ticks").option("path", str(d)).load()
    assert [f.name for f in df.schema.fields] == ["coin", "price", "ts"]
    rows = sorted((r.price, str(r.ts)) for r in df.collect())
    assert rows == [
        (101.5, "2023-11-14 22:13:20"),
        (102.0, "2023-11-14 22:13:21"),
        (103.25, "2023-11-14 22:13:22"),
    ]
    # one input partition per file: Spark schedules shards in parallel
    n_parts = df.select(F.spark_partition_id()).distinct().count()
    assert n_parts == 2


def test_batch_synthetic_is_deterministic_and_partitioned(spark):
    df = (
        spark.read.format("ticks")
        .option("n_rows", 1000)
        .option("partitions", 8)
        .load()
    )
    a = df.agg(
        F.count(F.lit(1)), F.round(F.sum("price"), 2), F.max("ts")
    ).collect()[0]
    b = (
        spark.read.format("ticks")
        .option("n_rows", 1000)
        .option("partitions", 8)
        .load()
        .agg(F.count(F.lit(1)), F.round(F.sum("price"), 2), F.max("ts"))
        .collect()[0]
    )
    assert tuple(a) == tuple(b)
    assert a[0] == 1000


def test_stream_consumes_arriving_files_incrementally(spark, tmp_path):
    """Files landing between triggers are picked up by later
    micro-batches, exactly once. (Python micro-batch sources support
    neither Trigger.AvailableNow nor admission control, so the
    per-trigger granularity is all-new-files.)"""
    d = tmp_path / "stream"
    d.mkdir()
    for i in range(2):
        _write_shard(
            d, f"{i:03d}.jsonl", [(100.0 + i, 1_700_000_000 + i)]
        )
    q = (
        spark.readStream.format("ticks")
        .option("path", str(d))
        .load()
        .writeStream.format("memory")
        .queryName("pyds_inc")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt_inc")
        )
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql(
            "SELECT COUNT(*) c FROM pyds_inc"
        ).collect()[0].c == 2
        for i in (2, 3):
            _write_shard(
                d, f"{i:03d}.jsonl", [(100.0 + i, 1_700_000_000 + i)]
            )
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT price FROM pyds_inc ORDER BY price"
    ).collect()
    assert [r.price for r in got] == [100.0, 101.0, 102.0, 103.0]
    nonempty = [
        p["numInputRows"] for p in q.recentProgress if p["numInputRows"]
    ]
    assert sum(nonempty) == 4 and len(nonempty) >= 2


def test_stream_restart_resumes_exactly_once(spark, tmp_path):
    d = tmp_path / "stream2"
    d.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt2"
    for i in range(3):
        _write_shard(d, f"{i:03d}.jsonl", [(200.0 + i, 1_700_000_100 + i)])

    def run_once():
        q = (
            spark.readStream.format("ticks")
            .option("path", str(d))
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()  # consumes the first 3 files, then stops
    first = spark.read.parquet(str(out)).count()
    assert first == 3
    # two more shards arrive while the query is down
    _write_shard(d, "003.jsonl", [(203.0, 1_700_000_103)])
    _write_shard(d, "004.jsonl", [(204.0, 1_700_000_104)])
    run_once()  # restart from checkpoint: ONLY the new files
    got = spark.read.parquet(str(out))
    assert got.count() == 5  # no duplicates, no gaps
    assert sorted(r.price for r in got.collect()) == [
        200.0, 201.0, 202.0, 203.0, 204.0,
    ]


def test_wire_parse_matches_reference_semantics():
    coin, price, ts = pyds._parse_line(
        '{"BTC": "42000.50", "timestamp": 1700000000.0}', "BTC"
    )
    assert (coin, price) == ("BTC", 42000.5)
    assert str(ts) == "2023-11-14 22:13:20"
    # null-defaulting: missing price stays NULL (S7's coalesce is the
    # caller's policy, not the source's)
    _, price2, _ = pyds._parse_line('{"timestamp": 1700000000.0}', "BTC")
    assert price2 is None


# ------------------------------------------------------------- writers


def test_batch_write_read_roundtrip(spark, tmp_path):
    src = (
        spark.read.format("ticks")
        .option("n_rows", 200)
        .option("partitions", 4)
        .load()
    )
    out = tmp_path / "sink"
    src.write.format("ticks").option("path", str(out)).mode("append").save()
    # committed shards only; no staging debris
    import os

    names = sorted(os.listdir(out))
    assert all(n.endswith(".jsonl") for n in names)
    back = spark.read.format("ticks").option("path", str(out)).load()
    a = sorted((r.price, str(r.ts)) for r in src.collect())
    b = sorted((r.price, str(r.ts)) for r in back.collect())
    assert a == b


def test_batch_overwrite_replaces(spark, tmp_path):
    out = tmp_path / "sink2"
    one = (
        spark.read.format("ticks").option("n_rows", 50).load()
    )
    one.write.format("ticks").option("path", str(out)).mode("append").save()
    one.write.format("ticks").option("path", str(out)).mode(
        "overwrite"
    ).save()
    back = spark.read.format("ticks").option("path", str(out)).load()
    assert back.count() == 50


def test_stream_write_commits_batches_idempotently(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    out = tmp_path / "sinkdir"
    ckpt = tmp_path / "ckpt_w"
    for i in range(3):
        _write_shard(d, f"{i:03d}.jsonl", [(300.0 + i, 1_700_000_200 + i)])

    def run_once():
        q = (
            spark.readStream.format("ticks")
            .option("path", str(d))
            .load()
            .writeStream.format("ticks")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    back = spark.read.format("ticks").option("path", str(out)).load()
    assert sorted(r.price for r in back.collect()) == [300.0, 301.0, 302.0]
    # add a shard, restart from checkpoint: only the new data lands,
    # and a replayed batch cannot double-write (marker discipline)
    _write_shard(d, "003.jsonl", [(303.0, 1_700_000_203)])
    run_once()
    back2 = spark.read.format("ticks").option("path", str(out)).load()
    assert sorted(r.price for r in back2.collect()) == [
        300.0, 301.0, 302.0, 303.0,
    ]


def test_stream_offset_watermark_detects_early_sorting_file(tmp_path):
    """Count offsets are only valid while new files sort after every
    consumed one. A shard landing with a name that sorts INTO the
    consumed prefix (e.g. batch-*.jsonl beside consumed part-*.jsonl,
    'b' < 'p') shifts the index mapping; the reader must fail loudly
    instead of silently re-reading some files and skipping others."""
    d = tmp_path / "s"
    d.mkdir()
    _write_shard(d, "p1.jsonl", [(1.0, 1_700_000_000)])
    _write_shard(d, "p2.jsonl", [(2.0, 1_700_000_001)])
    r = pyds.TicksStreamReader({"path": str(d)})
    start = r.initialOffset()
    end = r.latestOffset()
    assert end == {"files": 2, "last": "p2.jsonl"}
    assert len(r.partitions(start, end)) == 2
    # out-of-order arrival: sorts before the consumed prefix
    _write_shard(d, "batch-0.jsonl", [(9.0, 1_700_000_002)])
    with pytest.raises(RuntimeError, match="desync"):
        r.partitions(end, r.latestOffset())
    # pre-watermark checkpoints (no "last" field) still replay
    assert len(r.partitions({"files": 0}, {"files": 2})) == 2


def test_batch_writer_derives_index_from_max_part_number(spark, tmp_path):
    """Appending into a directory with gapped part numbers must never
    rename onto an existing committed shard (count-based naming
    would: 2 files named part-00000/part-00005 -> next name
    part-00002 is safe, but a gap at 0 collides)."""
    out = tmp_path / "gappy"
    out.mkdir()
    _write_shard(out, "part-00000.jsonl", [(1.0, 1_700_000_000)])
    _write_shard(out, "part-00005.jsonl", [(2.0, 1_700_000_001)])
    src = (
        spark.read.format("ticks")
        .option("n_rows", 10)
        .option("partitions", 1)
        .load()
    )
    src.write.format("ticks").option("path", str(out)).mode("append").save()
    import os

    names = sorted(os.listdir(out))
    assert "part-00000.jsonl" in names and "part-00005.jsonl" in names
    new = [n for n in names if n not in
           ("part-00000.jsonl", "part-00005.jsonl")]
    assert new and all(n >= "part-00006.jsonl" for n in new)
    back = spark.read.format("ticks").option("path", str(out)).load()
    assert back.count() == 12  # 2 pre-existing rows + 10 appended
