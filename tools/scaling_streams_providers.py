#!/usr/bin/env python3
"""State-store provider evidence for the linear-state streaming queries
(VERDICT r8 ask #3).

The registry's real-StreamingQuery runs carry state that grows with
distinct keys (dedup: one row per key; session windows: one per
session): exact semantics, but the per-round evidence ran only on the
memory-backed HDFSBackedStateStoreProvider — fine while state fits the
executor heap, unproven for the 100 TB story where state must SPILL.
This tool re-runs the whole streaming family under
``RocksDBStateStoreProvider`` (+ changelog checkpointing, the
production configuration for large state: RocksDB keeps state
off-heap/on-disk, changelog checkpoints upload per-batch deltas
instead of full snapshots) and pins OUTPUT EQUALITY against the
HDFS-backed runs at every scale — same rows, same values, different
state backend — while recording walls and state sizes.

Output: markdown to stdout + ``scaling_streams_r09.json`` (repo root).

Usage::

    python tools/scaling_streams_providers.py              # all scales
    SPARK_GRAFT_PROVIDER_SCALES=sf1 python tools/scaling_streams_providers.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from lakehouse_for_data_streaming_and_analysis_spark.session import get_spark  # noqa: E402

STREAM_QUERIES = (
    "streaming_bronze_final_state",
    "streaming_dedup_final_state",
    "streaming_session_final_state",
    "stream_stream_attribution_join",
    "stream_stream_outer_attribution",
    "stream_stream_full_outer_attribution",
)

SCALES = (
    ("sf0.001", "/root/testdata/sf0.001"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".scratch", "sf1")),
)

_PKG = "org.apache.spark.sql.execution.streaming.state."
PROVIDERS = {
    "hdfs": {
        "spark.sql.streaming.stateStore.providerClass": (
            _PKG + "HDFSBackedStateStoreProvider"
        ),
    },
    "rocksdb": {
        "spark.sql.streaming.stateStore.providerClass": (
            _PKG + "RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb"
        ".changelogCheckpointing.enabled": "true",
        # r10 (VERDICT r9 ask #7): skip per-put row counting — the
        # production-recommended setting for join state (4 stores per
        # stream-stream join); measured ~2.1x -> ~1.85x on the sf1
        # attribution join. The residual premium is per-instance
        # open/commit/changelog-sync fixed cost on SMALL micro-batches
        # (384 store commits for ~300k rows) — boundedMemoryUsage,
        # write-buffer sizing, compression=none, and changelog-off all
        # measured neutral-to-worse (DECISIONS 52); it amortizes with
        # real per-batch state volume, which is the 100 TB regime.
        "spark.sql.streaming.stateStore.rocksdb"
        ".trackTotalNumberOfRows": "false",
    },
}


class _Capture(StreamingQueryListener):
    """Listener events are delivered ASYNC (a leg's last events can
    arrive after the next leg started); attribution is by runId, with
    a quiet-window flush between legs, never by wall-clock order."""

    def __init__(self):
        self.progress: list[dict] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        try:
            self.progress.append(json.loads(event.progress.json))
        except Exception:  # noqa: BLE001 - metrics only
            pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        try:
            self.terminated.append(str(event.runId))
        except Exception:  # noqa: BLE001 - metrics only
            pass


def _flush_leg(cap: _Capture, n_term_before: int, timeout: float = 30.0):
    """Wait until every query the just-drained leg started has posted
    its terminated event and the bus has gone quiet; return that leg's
    runIds. (The bus is ordered per query, so a terminated event means
    all of that run's progress events have been delivered.)"""
    t0 = time.monotonic()
    while len(cap.terminated) <= n_term_before:
        if time.monotonic() - t0 > timeout:
            raise TimeoutError("no terminated event from the leg's run")
        time.sleep(0.05)
    quiet_since = time.monotonic()
    seen = (len(cap.progress), len(cap.terminated))
    while time.monotonic() - quiet_since < 0.6:
        time.sleep(0.1)
        now = (len(cap.progress), len(cap.terminated))
        if now != seen:
            seen, quiet_since = now, time.monotonic()
    return set(cap.terminated[n_term_before:])


def _summarize(progress: list[dict]) -> dict:
    rows = sum(int(p.get("numInputRows") or 0) for p in progress)
    state_rows = [
        int(s.get("numRowsTotal") or 0)
        for p in progress
        for s in (p.get("stateOperators") or [])
    ]
    used_rocksdb = any(
        "rocksdbGetCount" in (s.get("customMetrics") or {})
        for p in progress
        for s in (p.get("stateOperators") or [])
    )
    state_bytes = [
        int(s.get("stateMemory") or s.get("memoryUsedBytes") or 0)
        for p in progress
        for s in (p.get("stateOperators") or [])
    ]
    return {
        "n_batches": len(progress),
        "input_rows": rows,
        "max_state_rows": max(state_rows) if state_rows else 0,
        "max_state_bytes": max(state_bytes) if state_bytes else 0,
        "used_rocksdb": used_rocksdb,
    }


def _canon(df) -> list[tuple]:
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def main() -> None:
    spark = get_spark("scaling_streams_providers")
    spark.sparkContext.setLogLevel("ERROR")
    cap = _Capture()
    spark.streams.addListener(cap)
    qs = entrymod.queries()
    wanted = os.environ.get("SPARK_GRAFT_PROVIDER_SCALES")
    scales = [
        (n, d)
        for n, d in SCALES
        if os.path.isdir(d) and (not wanted or n in wanted.split(","))
    ]

    from lakehouse_for_data_streaming_and_analysis_spark.queries.pipeline import (
        ensure_replay_dirs,
    )

    for _, sf_dir in scales:
        ensure_replay_dirs(spark, sf_dir)
    # warm JVM/codegen once at the smallest scale (not timed)
    for name in STREAM_QUERIES:
        qs[name](spark, scales[0][1]).count()

    out: list[dict] = []
    print("## State-store provider sweep (HDFS-backed vs RocksDB"
          " + changelog checkpointing)\n")
    print(
        "| query | scale | hdfs wall s | rocksdb wall s | ratio | "
        "max state rows | rocksdb state MB | outputs equal |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for sf_name, sf_dir in scales:
        for name in STREAM_QUERIES:
            res: dict[str, dict] = {}
            rows: dict[str, list] = {}
            for prov, confs in PROVIDERS.items():
                for k, v in confs.items():
                    spark.conf.set(k, v)
                n_term = len(cap.terminated)
                t0 = time.monotonic()
                df = qs[name](spark, sf_dir)
                rows[prov] = _canon(df)
                wall = time.monotonic() - t0
                rids = _flush_leg(cap, n_term)
                s = _summarize(
                    [p for p in cap.progress if p.get("runId") in rids]
                )
                res[prov] = {"wall": round(wall, 2), **s}
            # restore default provider
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
            equal = rows["hdfs"] == rows["rocksdb"]
            h, r = res["hdfs"], res["rocksdb"]
            assert r["used_rocksdb"], (
                f"{name}@{sf_name}: RocksDB conf set but provider "
                "metrics absent — the sweep did not engage RocksDB"
            )
            assert not h["used_rocksdb"], (
                f"{name}@{sf_name}: HDFS leg reported RocksDB metrics"
            )
            ratio = round(r["wall"] / h["wall"], 2) if h["wall"] else 0
            print(
                f"| {name} | {sf_name} | {h['wall']} | {r['wall']} | "
                f"{ratio} | {r['max_state_rows']} | "
                f"{round(r['max_state_bytes'] / 1e6, 1)} | {equal} |"
            )
            out.append(
                {
                    "query": name,
                    "sf": sf_name,
                    "hdfs": h,
                    "rocksdb": r,
                    "wall_ratio_rocksdb_over_hdfs": ratio,
                    "outputs_equal": equal,
                    "n_output_rows": len(rows["hdfs"]),
                }
            )
    dest = os.path.join(REPO, "scaling_streams_r09.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n(written {dest})")
    bad = [o for o in out if not o["outputs_equal"]]
    if bad:
        print(f"OUTPUT MISMATCH under RocksDB: {[o['query'] for o in bad]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
