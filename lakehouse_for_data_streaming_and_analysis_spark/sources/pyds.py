"""Spark 4 Python DataSource for the reference's tick ingest (S1/S7/S8).

The reference ingests ticker JSON over WebSocket→Kafka
(Sourcecode/websocket_kafka_producer.py, streaming_pipeline.py:41-42);
this module re-expresses that ingest as a FIRST-CLASS Spark source via
the Spark 4 Python DataSource API (`pyspark.sql.datasource`) instead of
an external producer process:

* ``spark.read.format("ticks")`` — batch scan of an ndjson capture
  directory, one input partition per file (so Spark schedules files in
  parallel and a 100 TB capture reads with full cluster width), or a
  deterministic synthetic tick set when no path is given.
* ``spark.readStream.format("ticks")`` — a micro-batch stream over the
  same directory with real offset semantics: the offset is the count of
  consumed files in sorted order; each trigger admits every new file
  (per-batch admission control is not expressible in the Python
  DataSource API — see latestOffset), and restarts resume exactly from
  the checkpointed offset — no duplicates, no gaps (pinned in
  tests/test_pyds.py including a kill-and-restart).

The wire format is the reference's exact payload
(`{"<coin>": "<price>", "timestamp": <unix-sec>}`, price as a string —
etl.py:16-19), parsed to the same typed columns as
``sources/streams.parse_ticks``.

Registration: ``register(spark)`` once per session, then the format
name ``"ticks"`` works in any reader. Reader classes are module-level
so they pickle to Python workers.
"""

from __future__ import annotations

import json
import os
import re
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "ticks"


def register(spark) -> None:
    """Register the ``ticks`` format on this session (idempotent)."""
    spark.dataSource.register(TicksDataSource)


def _parse_line(line: str, coin: str):
    """One wire payload -> (coin, price, ts) with the reference's
    string-price and unix-seconds semantics (etl.py:20-25)."""
    d = json.loads(line)
    price = d.get(coin)
    ts = d.get("timestamp")
    return (
        coin,
        float(price) if price is not None else None,
        datetime.fromtimestamp(float(ts), tz=timezone.utc).replace(
            tzinfo=None
        )
        if ts is not None
        else None,
    )


def _list_files(path: str) -> list[str]:
    """Sorted ndjson shards — sorted-name order IS the offset order."""
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith((".json", ".jsonl", ".ndjson"))
    )


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class TicksBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        self.coin = options.get("coin", "BTC")
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        if self.path:
            return [_FilePartition(p) for p in _list_files(self.path)]
        step = -(-self.n_rows // self.n_parts)
        return [
            _RangePartition(i, min(i + step, self.n_rows))
            for i in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        # Arrow fast path: one RecordBatch per partition instead of
        # per-row tuples — rows cross into the JVM as columnar Arrow
        # buffers, skipping per-row pickling (the same reason Pandas
        # UDFs beat row UDFs). The stream reader keeps the tuple path:
        # its micro-batches are small and the simple path is clearer.
        import pyarrow as pa

        if isinstance(partition, _FilePartition):
            coins, prices, tss = [], [], []
            with open(partition.path) as f:
                for line in f:
                    if line.strip():
                        c, p, ts = _parse_line(line, self.coin)
                        coins.append(c)
                        prices.append(p)
                        tss.append(ts)
        else:
            # deterministic synthetic ticks: price is a fixed function
            # of the row index (no RNG), one tick per second
            idx = range(partition.start, partition.end)
            coins = [self.coin] * len(idx)
            prices = [100.0 + (i % 97) * 0.25 for i in idx]
            tss = [
                datetime.fromtimestamp(
                    1_700_000_000 + i, tz=timezone.utc
                ).replace(tzinfo=None)
                for i in idx
            ]
        yield pa.record_batch(
            {
                "coin": pa.array(coins, type=pa.string()),
                "price": pa.array(prices, type=pa.float64()),
                "ts": pa.array(tss, type=pa.timestamp("us")),
            }
        )


class TicksStreamReader(DataSourceStreamReader):
    """Micro-batch stream over an ndjson dir: offset = files consumed.

    Count offsets are only valid while new files keep sorting AFTER
    every consumed one; a shard whose name sorts into the consumed
    prefix (e.g. a sink's ``batch-*.jsonl`` landing beside consumed
    ``part-*.jsonl``, since ``'b' < 'p'``) shifts the index mapping —
    silently re-reading some files and permanently skipping others.
    Each offset therefore also carries the NAME of the last file it
    covers, and ``partitions()`` asserts that name still sits at the
    recorded index, failing loudly on any out-of-order arrival
    instead of corrupting the stream."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.coin = options.get("coin", "BTC")

    def initialOffset(self):
        return {"files": 0, "last": ""}

    def latestOffset(self):
        # STATELESS by design: Spark instantiates the Python reader
        # more than once (planning vs execution), so any
        # instance-local high-water mark desynchronizes and replays
        # batches (observed: a second instance reported an older
        # offset and files were consumed twice). The engine owns the
        # [start, end) range from its checkpoint; this just reports
        # the true latest, so each trigger admits every new file —
        # per-batch admission control isn't expressible in the Python
        # DataSource API (no ReadLimit surface); bound ingest by
        # shard-file size instead.
        files = _list_files(self.path)
        return {
            "files": len(files),
            "last": os.path.basename(files[-1]) if files else "",
        }

    @staticmethod
    def _check_watermark(files: list[str], off: dict) -> None:
        n = off["files"]
        # offsets written before the watermark field lack "last";
        # nothing to verify for them (or for the empty prefix)
        last = off.get("last")
        if not last or n == 0:
            return
        if n > len(files) or os.path.basename(files[n - 1]) != last:
            raise RuntimeError(
                f"ticks stream offset desync: offset covers {n} file(s) "
                f"ending at {last!r}, but the directory now has "
                f"{os.path.basename(files[n - 1]) if n <= len(files) else '<missing>'!r} "
                f"at that position — a file sorting before the consumed "
                "prefix appeared (or a consumed file was removed). "
                "Refusing to guess the mapping; write new shards with "
                "names that sort after all consumed ones."
            )

    def partitions(self, start, end):
        files = _list_files(self.path)
        self._check_watermark(files, start)
        self._check_watermark(files, end)
        return [
            _FilePartition(p)
            for p in files[start["files"] : end["files"]]
        ]

    def read(self, partition):
        with open(partition.path) as f:
            for line in f:
                if line.strip():
                    yield _parse_line(line, self.coin)

    def commit(self, end):
        # files are immutable once written; nothing to clean up
        pass

    def stop(self):
        pass


class TicksDataSource(DataSource):
    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        return "coin string, price double, ts timestamp"

    def reader(self, schema):
        return TicksBatchReader(self.options)

    def streamReader(self, schema):
        return TicksStreamReader(self.options)

    def writer(self, schema, overwrite):
        return TicksBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite):
        return TicksStreamWriter(self.options, overwrite)


# ------------------------------------------------------------- writers
#
# The sink half of the format: a two-phase-commit ndjson writer. Tasks
# stage shards under uniquely-named paths and return them as commit
# messages; the driver-side commit renames every staged shard into
# place and drops a manifest marker, so readers (and the reader half
# above, which lists only *.jsonl) never see a partial write. The
# streaming variant is IDEMPOTENT per micro-batch: shards are named by
# batchId and the commit marker is checked first, so a replayed batch
# after a crash-restart cannot double-write (the same discipline as
# streaming/exactly_once.py, expressed inside the DataSource API).
# Local-FS rename semantics; on object stores the rename becomes a
# copy-manifest commit, same protocol.

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _StagedShard(WriterCommitMessage):
    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


def _write_shard_file(path: str, rows, coin: str) -> int:
    n = 0
    with open(path, "w") as f:
        for r in rows:
            ts = r["ts"]
            payload = {
                (r["coin"] or coin): None
                if r["price"] is None
                else repr(r["price"]),
                "timestamp": None
                if ts is None
                else ts.replace(tzinfo=timezone.utc).timestamp(),
            }
            f.write(json.dumps(payload) + "\n")
            n += 1
    return n


class TicksBatchWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.coin = options.get("coin", "BTC")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(
            self.path, f"_staged-{uuid.uuid4().hex}.tmp"
        )
        n = _write_shard_file(staged, iterator, self.coin)
        return _StagedShard(staged, n)

    def commit(self, messages):
        if self.overwrite:
            for f in _list_files(self.path):
                os.remove(f)
        # next index = max existing part number + 1, NOT the file
        # count: a directory with gaps (prior deletion) or mixed
        # batch-*.jsonl shards makes count-based names collide with a
        # committed file and os.rename would silently overwrite it
        nxt = 0
        for f in _list_files(self.path):
            m = re.fullmatch(r"part-(\d+)\.jsonl", os.path.basename(f))
            if m:
                nxt = max(nxt, int(m.group(1)) + 1)
        for i, m in enumerate(m for m in messages if m is not None):
            os.rename(
                m.staged,
                os.path.join(self.path, f"part-{nxt + i:05d}.jsonl"),
            )

    def abort(self, messages):
        for m in messages or []:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class TicksStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.coin = options.get("coin", "BTC")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, f"_commit-{batch_id:020d}")

    def write(self, iterator):
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(
            self.path, f"_staged-{uuid.uuid4().hex}.tmp"
        )
        n = _write_shard_file(staged, iterator, self.coin)
        return _StagedShard(staged, n)

    def commit(self, messages, batchId):
        if os.path.exists(self._marker(batchId)):
            # replayed batch after restart: already committed —
            # discard the re-staged shards instead of double-writing
            self.abort(messages, batchId)
            return
        for i, m in enumerate(m for m in messages if m is not None):
            os.rename(
                m.staged,
                os.path.join(
                    self.path, f"batch-{batchId:020d}-{i:05d}.jsonl"
                ),
            )
        with open(self._marker(batchId), "w") as f:
            f.write(json.dumps({"batchId": batchId}))

    def abort(self, messages, batchId):
        for m in messages or []:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
