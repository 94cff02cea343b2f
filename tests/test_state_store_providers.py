"""RocksDB state-store provider gate (VERDICT r8 ask #3).

The linear-state streaming queries (dedup: one state row per distinct
key; session windows: one per open session) must produce IDENTICAL
output under ``RocksDBStateStoreProvider`` + changelog checkpointing —
the production configuration where state spills off-heap/on-disk
instead of living in the executor heap. This is the semantics half of
the 100 TB streaming story; the walls/state-size half is
``tools/scaling_streams_providers.py`` (scaling_streams_r09.json).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

_PKG = "org.apache.spark.sql.execution.streaming.state."
_ROCKS_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        _PKG + "RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb"
    ".changelogCheckpointing.enabled": "true",
    # production join-state setting, same as the sweep (DECISIONS 52):
    # the equality gate must hold on the configuration we recommend
    "spark.sql.streaming.stateStore.rocksdb"
    ".trackTotalNumberOfRows": "false",
}


def _canon(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


@pytest.fixture()
def rocksdb_conf(spark):
    saved = {}
    for k, v in _ROCKS_CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 - unset conf
            saved[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.mark.parametrize(
    "name",
    [
        "streaming_dedup_final_state",  # state rows = distinct keys
        "streaming_session_final_state",  # state rows = open sessions
        "stream_stream_outer_attribution",  # two-sided join state
    ],
)
def test_rocksdb_output_equals_hdfs(spark, name, rocksdb_conf):
    qs = entrymod.queries()
    rocks_rows = _canon(qs[name](spark, SF_DIR))
    # leave the fixture's conf in place for the rocksdb leg above,
    # then explicitly pin the HDFS leg for the comparison run
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        _PKG + "HDFSBackedStateStoreProvider",
    )
    hdfs_rows = _canon(qs[name](spark, SF_DIR))
    assert rocks_rows == hdfs_rows
    assert len(rocks_rows) > 0


def test_rocksdb_provider_actually_engages(spark, rocksdb_conf):
    """Belt-and-braces: the provider conf must reach the state store —
    progress metrics carry rocksdb counters, so a silent fallback to
    the default provider cannot fake the equality test above."""
    import json as _json

    from pyspark.sql.streaming import StreamingQueryListener

    seen = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            try:
                seen.append(_json.loads(event.progress.json))
            except Exception:  # noqa: BLE001
                pass

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    listener = L()
    spark.streams.addListener(listener)
    try:
        entrymod.queries()["streaming_dedup_final_state"](
            spark, SF_DIR
        ).count()
        import time

        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            metrics = [
                s.get("customMetrics") or {}
                for p in seen
                for s in (p.get("stateOperators") or [])
            ]
            if any("rocksdbGetCount" in m for m in metrics):
                break
            time.sleep(0.2)
        assert any("rocksdbGetCount" in m for m in metrics)
    finally:
        spark.streams.removeListener(listener)
