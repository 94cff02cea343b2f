"""Commit-log primitives: action encoding, atomic versioned commits,
snapshot replay (see package docstring for protocol scope)."""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

LOG_SUBDIR = "_delta_log"


class ConcurrentCommitError(Exception):
    """Another writer committed this version first (put-if-absent
    lost). Appends retry automatically; conflicting rewrites surface
    the error to the caller — the same split Delta's OCC makes."""


def log_path(table_path: str) -> str:
    return os.path.join(table_path, LOG_SUBDIR)


def version_file(table_path: str, version: int) -> str:
    return os.path.join(log_path(table_path), f"{version:020d}.json")


def list_versions(table_path: str) -> list[int]:
    d = log_path(table_path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.endswith(".json") and name[:-5].isdigit():
            out.append(int(name[:-5]))
    return sorted(out)


def write_commit(
    table_path: str, version: int, actions: list[dict]
) -> None:
    """Atomically create ``<version>.json`` (O_EXCL put-if-absent —
    the local/HDFS LogStore contract). One JSON action per line, as
    the protocol specifies."""
    os.makedirs(log_path(table_path), exist_ok=True)
    path = version_file(table_path, version)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as e:
        raise ConcurrentCommitError(
            f"version {version} already committed at {path}"
        ) from e
    with os.fdopen(fd, "w") as f:
        for a in actions:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")


def read_commit(table_path: str, version: int) -> list[dict]:
    with open(version_file(table_path, version)) as f:
        return [json.loads(line) for line in f if line.strip()]


def commit_info(operation: str, **params) -> dict:
    return {
        "commitInfo": {
            "timestamp": int(time.time() * 1000),
            "operation": operation,
            "operationParameters": {
                k: json.dumps(v) if not isinstance(v, str) else v
                for k, v in params.items()
            },
        }
    }


@dataclass
class Snapshot:
    version: int = -1
    metadata: dict = field(default_factory=dict)
    protocol: dict = field(default_factory=dict)
    # path -> add action payload (live files only)
    files: dict[str, dict] = field(default_factory=dict)
    # path -> remove action payload (tombstones awaiting vacuum)
    tombstones: dict[str, dict] = field(default_factory=dict)


def replay(table_path: str, until: int | None = None) -> Snapshot:
    """Reconstruct table state by replaying the log in version order
    (production Delta starts from the newest parquet checkpoint; this
    implementation replays from 0 — see package docstring)."""
    snap = Snapshot()
    for v in list_versions(table_path):
        if until is not None and v > until:
            break
        snap.version = v
        for action in read_commit(table_path, v):
            if "metaData" in action:
                snap.metadata = action["metaData"]
            elif "protocol" in action:
                snap.protocol = action["protocol"]
            elif "add" in action:
                add = action["add"]
                snap.files[add["path"]] = add
                snap.tombstones.pop(add["path"], None)
            elif "remove" in action:
                rm = action["remove"]
                snap.files.pop(rm["path"], None)
                snap.tombstones[rm["path"]] = rm
    return snap


def history(table_path: str) -> list[dict]:
    """Per-version operation summary (DESCRIBE HISTORY shape)."""
    out = []
    for v in list_versions(table_path):
        info = {}
        n_add = n_remove = 0
        n_records = 0
        for action in read_commit(table_path, v):
            if "commitInfo" in action:
                info = action["commitInfo"]
            elif "add" in action:
                n_add += 1
                stats = action["add"].get("stats")
                if stats:
                    n_records += json.loads(stats).get("numRecords", 0)
            elif "remove" in action:
                n_remove += 1
        out.append(
            {
                "version": v,
                "operation": info.get("operation", ""),
                "timestamp": info.get("timestamp", 0),
                "n_files_added": n_add,
                "n_files_removed": n_remove,
                "n_records_added": n_records,
            }
        )
    return out


def commit_stats_df(spark, table_path: str, time_col: str):
    """The reference's latency-observability surface (TimeDelay.ipynb
    cell 0): one row per commit with wall-clock and the min/max of
    ``time_col`` over the files added in that commit — read from the
    real ``_delta_log`` JSON, exactly as the notebook does."""
    rows = []
    for v in list_versions(table_path):
        ts = 0
        mins: list[str] = []
        maxs: list[str] = []
        n = 0
        for action in read_commit(table_path, v):
            if "commitInfo" in action:
                ts = action["commitInfo"].get("timestamp", 0)
            elif "add" in action and action["add"].get("stats"):
                s = json.loads(action["add"]["stats"])
                n += s.get("numRecords", 0)
                mv = s.get("minValues", {}).get(time_col)
                xv = s.get("maxValues", {}).get(time_col)
                if mv is not None:
                    mins.append(str(mv))
                if xv is not None:
                    maxs.append(str(xv))
        rows.append(
            {
                "version": v,
                "commit_time": ts / 1000.0,
                "numRecords": n,
                "min_event": min(mins) if mins else None,
                "max_event": max(maxs) if maxs else None,
            }
        )
    return spark.createDataFrame(
        rows,
        schema=(
            "version long, commit_time double, numRecords long, "
            "min_event string, max_event string"
        ),
    )
