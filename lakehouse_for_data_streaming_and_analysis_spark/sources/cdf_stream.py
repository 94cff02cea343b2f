"""Change-Data-Feed as a Spark source (Delta's ``readChangeFeed``).

delta-spark exposes the change feed both ways: a batch read
(``table_changes`` / ``spark.read.option("readChangeFeed", ...)``)
and a STREAMING read whose offsets are table versions, so a
downstream pipeline consumes row-level changes incrementally instead
of re-scanning snapshots. ``delta/table.py::read_change_feed`` covers
the batch half on the engine side; this module makes the feed a
first-class Spark 4 Python DataSource (format ``"deltaish_cdf"``)
covering BOTH halves against the from-spec transaction log:

* ``spark.read.format("deltaish_cdf").option("path", tbl)``
  — batch scan of the change feed over a version range
  (``startingVersion`` inclusive, default 0; ``endingVersion``
  inclusive, default latest).
* ``spark.readStream.format("deltaish_cdf")`` — a micro-batch stream
  whose OFFSET IS THE TABLE VERSION: each trigger admits the commits
  since the checkpointed version, a restart resumes exactly there,
  and every admitted commit becomes one-file input partitions (a
  100 TB feed reads with full cluster width).

Change rows follow Delta's CDF read schema: the table's data columns
plus ``_change_type`` (insert / delete / update_preimage /
update_postimage), ``_commit_version``, ``_commit_timestamp``.
Commits carrying explicit ``cdc`` actions (MERGE under
``delta.enableChangeDataFeed``) are read from their ``_change_data``
files; add/remove-only commits synthesize insert/delete rows from the
file diff — row-accurate for append/overwrite/restore, and a MERGE
from before the property was set raises instead of emitting
rewritten-row noise (read_change_feed's rule, enforced here too).

Workers read the parquet directly with pyarrow (a Python DataSource
partition cannot call back into Spark), so the whole path is
Arrow-columnar. Unsupported layouts fail loudly at planning time:
partitioned tables (partition values are directory-encoded, not in
the files) and column-mapped tables (physical names diverge).

Reference parity: Sourcecode/streaming_pipeline.py consumes its
bronze tables as streams (table-as-stream, sources/streams.py); this
source is the CHANGE-level upgrade of that pattern — deletes and
update pre/post images flow, not just appends.
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

from ..delta import log as dlog

FORMAT_NAME = "deltaish_cdf"

CDF_META = ("_change_type", "_commit_version", "_commit_timestamp")


def register(spark) -> None:
    """Register the ``deltaish_cdf`` format on this session."""
    spark.dataSource.register(CdfDataSource)


# ------------------------------------------------------------ planning

_PRIMITIVE = {
    "string": "string",
    "long": "bigint",
    "integer": "int",
    "short": "smallint",
    "byte": "tinyint",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "binary": "binary",
}


def _field_ddl(f: dict) -> str:
    t = f["type"]
    if isinstance(t, str):
        if t in _PRIMITIVE:
            return f"{f['name']} {_PRIMITIVE[t]}"
        if re.fullmatch(r"decimal\(\s*\d+\s*,\s*\d+\s*\)", t):
            return f"{f['name']} {t}"
    raise NotImplementedError(
        f"deltaish_cdf: unsupported column type {t!r} for "
        f"{f['name']!r} — the feed reader handles primitive types"
    )


def _table_meta(path: str) -> tuple[list[dict], dict]:
    """(data fields, metadata) of the LATEST snapshot, with loud
    guards for layouts the pyarrow-side reader cannot resolve."""
    snap = dlog.replay(path)
    md = snap.metadata
    conf = md.get("configuration", {}) or {}
    if conf.get("delta.columnMapping.mode", "none") not in ("", "none"):
        raise NotImplementedError(
            "deltaish_cdf: column-mapped tables are not supported — "
            "physical parquet names diverge from the logical schema; "
            "read snapshots through DeltaishTable.read instead"
        )
    if md.get("partitionColumns"):
        raise NotImplementedError(
            "deltaish_cdf: partitioned tables are not supported — "
            "partition values are directory-encoded, not present in "
            "the data files this source reads directly"
        )
    return json.loads(md["schemaString"])["fields"], md


class _CdfFilePartition(InputPartition):
    """One parquet file of one commit. ``mode`` is 'cdc' (the file
    already carries _change_type) or the literal synthesized type
    ('insert' / 'delete'). ``dv`` is the deletionVector descriptor in
    effect for this file AT THIS COMMIT (action-level for adds, the
    prior snapshot's for removes) — its positions are filtered out
    worker-side; ``table_path`` resolves 'u'-type DV files."""

    def __init__(
        self,
        path: str,
        mode: str,
        version: int,
        ts_ms: int,
        dv: dict | None = None,
        table_path: str = "",
    ):
        self.path = path
        self.mode = mode
        self.version = version
        self.ts_ms = ts_ms
        self.dv = dv
        self.table_path = table_path


def _commit_partitions(
    table_path: str, v_from: int, v_to: int
) -> list[_CdfFilePartition]:
    """Partitions for every change in (v_from, v_to] — the same
    attribution rules as DeltaishTable.read_change_feed."""
    out: list[_CdfFilePartition] = []
    for v in dlog.list_versions(table_path):
        if v <= v_from or v > v_to:
            continue
        actions = dlog.read_commit(table_path, v)
        op, ts_ms = "", 0
        for a in actions:
            if "commitInfo" in a:
                op = a["commitInfo"].get("operation", "")
                ci = a["commitInfo"]
                ts_ms = int(
                    ci.get("inCommitTimestamp", ci.get("timestamp", 0))
                )
        cdc = [a["cdc"]["path"] for a in actions if "cdc" in a]
        adds = [
            a["add"]
            for a in actions
            if "add" in a and a["add"].get("dataChange", True)
        ]
        removes = [
            a["remove"]["path"]
            for a in actions
            if "remove" in a and a["remove"].get("dataChange", True)
        ]
        if cdc:
            files = [(p, "cdc", None) for p in cdc]
        elif adds and removes and op in ("MERGE", "DELETE", "UPDATE"):
            # rewriting ops can only be attributed per-row by cdc
            raise ValueError(
                f"deltaish_cdf: version {v} is a {op} without cdc "
                "files — delta.enableChangeDataFeed was not set when "
                "it committed; start the feed after it"
            )
        else:
            # DV state at THIS commit: the add action's own
            # descriptor for inserts; for deletes (removed files)
            # whatever the prior snapshot held — rows already dead
            # then must not re-emit as deletes now
            files = [
                (a["path"], "insert", a.get("deletionVector"))
                for a in adds
            ]
            if removes:
                prev = dlog.replay(table_path, until=v - 1).files
                files += [
                    (p, "delete", (prev.get(p) or {}).get("deletionVector"))
                    for p in removes
                ]
        for rel, mode, dv in files:
            full = os.path.join(table_path, rel)
            if not os.path.exists(full):
                raise ValueError(
                    f"deltaish_cdf: version {v} references missing "
                    f"file {rel!r} (vacuumed) — the range has expired"
                )
            out.append(
                _CdfFilePartition(full, mode, v, ts_ms, dv, table_path)
            )
    return out


# ------------------------------------------------------------- readers


class _CdfReadMixin:
    """Worker-side file -> Arrow batch under the CDF read schema.
    ``self.columns`` (data column names, declared order) is set
    driver-side and pickles with the reader."""

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if partition is None:
            # an empty partitions() list reaches read() as one None
            # partition — an empty feed, not an error
            return
        tbl = pq.read_table(partition.path)
        if partition.dv:
            # drop the rows this commit's deletion vector marks dead
            # (decoded here on the worker — pure file IO)
            from ..delta import roaring

            dead = set(
                roaring.read_descriptor(partition.table_path, partition.dv)
            )
            tbl = tbl.take(
                [i for i in range(tbl.num_rows) if i not in dead]
            )
        n = tbl.num_rows
        # parquet columns come back chunked; record_batch wants flat
        cols = {
            name: tbl.column(name).combine_chunks()
            for name in tbl.column_names
        }
        arrays = []
        for name in self.columns:
            if name not in cols:
                raise ValueError(
                    f"deltaish_cdf: file {partition.path!r} lacks "
                    f"declared column {name!r} — schema evolution "
                    "widened the table after this commit; start the "
                    "feed at a version past the evolution"
                )
            arrays.append(cols[name])
        if partition.mode == "cdc":
            arrays.append(cols["_change_type"])
        else:
            arrays.append(
                pa.array([partition.mode] * n, type=pa.string())
            )
        arrays.append(
            pa.array([partition.version] * n, type=pa.int64())
        )
        ts = datetime.fromtimestamp(
            partition.ts_ms / 1000.0, tz=timezone.utc
        ).replace(tzinfo=None)
        arrays.append(pa.array([ts] * n, type=pa.timestamp("us")))
        yield pa.record_batch(
            arrays, names=list(self.columns) + list(CDF_META)
        )


def _starting_version(options: dict) -> int:
    """startingVersion, or startingTimestamp (epoch millis) resolved
    to the first version committed at or after it — Delta's rule."""
    if "startingTimestamp" in options:
        ts = int(options["startingTimestamp"])
        path = options["path"]
        for v in dlog.list_versions(path):
            t = 0
            for a in dlog.read_commit(path, v):
                if "commitInfo" in a:
                    ci = a["commitInfo"]
                    t = int(
                        ci.get(
                            "inCommitTimestamp", ci.get("timestamp", 0)
                        )
                    )
            if t >= ts:
                return v
        versions = dlog.list_versions(path)
        return (versions[-1] + 1) if versions else 0  # future: empty
    return int(options.get("startingVersion", 0))


class CdfBatchReader(_CdfReadMixin, DataSourceReader):
    def __init__(self, options: dict, columns: list[str]):
        self.path = options["path"]
        self.columns = columns
        self.v_from = _starting_version(options) - 1
        self.v_to = (
            int(options["endingVersion"])
            if "endingVersion" in options
            else None
        )

    def partitions(self):
        v_to = self.v_to
        if v_to is None:
            versions = dlog.list_versions(self.path)
            v_to = versions[-1] if versions else -1
        return _commit_partitions(self.path, self.v_from, v_to)


class CdfStreamReader(_CdfReadMixin, DataSourceStreamReader):
    """Offset = the highest table version consumed. Stateless between
    calls (Spark instantiates planning and execution readers
    separately — the pyds.py lesson): latestOffset always reports the
    log's true latest version and the engine owns the consumed range
    via its checkpoint, so restarts resume exactly and commits are
    admitted at most once."""

    def __init__(self, options: dict, columns: list[str]):
        self.path = options["path"]
        self.columns = columns
        self.start_version = _starting_version(options)

    def initialOffset(self):
        return {"version": self.start_version - 1}

    def latestOffset(self):
        versions = dlog.list_versions(self.path)
        return {"version": versions[-1] if versions else -1}

    def partitions(self, start, end):
        return _commit_partitions(
            self.path, start["version"], end["version"]
        )

    def commit(self, end):
        pass

    def stop(self):
        pass


class CdfDataSource(DataSource):
    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        fields, _ = _table_meta(self.options["path"])
        ddl = [_field_ddl(f) for f in fields]
        ddl += [
            "_change_type string",
            "_commit_version bigint",
            "_commit_timestamp timestamp",
        ]
        return ", ".join(ddl)

    def _columns(self) -> list[str]:
        fields, _ = _table_meta(self.options["path"])
        return [f["name"] for f in fields]

    def reader(self, schema):
        return CdfBatchReader(self.options, self._columns())

    def streamReader(self, schema):
        return CdfStreamReader(self.options, self._columns())
