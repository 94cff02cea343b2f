"""Sessionization + connected-components operator tests.

The query-level oracles live in queries/olap.py; these tests pin the
operator semantics that the oracles can't see: the built-in
session_window aggregation produces exactly the gaps-and-islands
result, and min-label propagation finds the true components of a
known graph.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table
from lakehouse_for_data_streaming_and_analysis_spark.operators import graphs, sessions

from .conftest import SF_DIR_001


def test_session_window_equals_islands(spark):
    """Spark's session_window aggregate and the portable lag/sum
    islands formulation must produce identical sessions."""
    ev = load_table(spark, SF_DIR_001, "events").select("user_id", "ts")
    built_in = sessions.session_window_agg(ev, "user_id", "ts", gap_minutes=480)
    islands = sessions.session_stats(ev, "user_id", "ts", gap_minutes=480).drop(
        "session_idx"
    )
    cols = ["user_id", "session_start", "session_end", "n_events", "duration_secs"]
    a = sorted([tuple(str(x) for x in r) for r in built_in.select(cols).collect()])
    b = sorted([tuple(str(x) for x in r) for r in islands.select(cols).collect()])
    assert a == b
    assert len(a) > 0


def test_sessionize_gap_splits(spark):
    """Events 1 min apart share a session; a gap over the threshold
    starts a new one."""
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:01:00"),
        (1, "2024-01-01 09:01:00"),  # 8h gap at 480 min -> new session
        (2, "2024-01-01 00:00:30"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = sessions.session_stats(df, "user_id", "ts", gap_minutes=480)
    got = {
        (r["user_id"], r["session_idx"]): r["n_events"] for r in out.collect()
    }
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_connected_components_known_graph(spark):
    """Two components: {1,2,3,4} chained, {10,11} paired; 20 isolated
    via self-loop-free edge list is absent entirely."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    labels = graphs.connected_components(edges)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    stats = {
        (r["component"], r["n_docs"])
        for r in graphs.component_stats(labels).collect()
    }
    assert stats == {(1, 4), (10, 2)}
