"""Sessionization: group event streams into activity sessions split
at inactivity gaps.

Two formulations with identical semantics, pinned equal by
`tests/test_sessions.py`:

- ``session_window_agg`` — Spark's built-in ``F.session_window``
  (the idiomatic path: one hash-aggregate with session merging inside
  the aggregation, usable unchanged under Structured Streaming with a
  watermark).
- ``sessionize`` — portable gaps-and-islands (lag -> gap flag ->
  running sum), the formulation every SQL engine can express; this is
  what the DuckDB oracle runs.

Scale: both shuffle once on the session key. The islands variant
additionally sorts within each key partition (window function); the
built-in merges sessions inside the aggregate buffer. Gap comparisons
use integer epoch microseconds — no float time arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame, key_col: str, ts_col: str, gap_minutes: int = 480
) -> DataFrame:
    """Tag each row with its session ordinal per key (gaps-and-islands).

    A row starts a new session when it is the key's first row or
    arrives more than ``gap_minutes`` after the previous row.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60_000_000), 1
    ).otherwise(0)
    return df.withColumn("session_idx", F.sum(new_sess).over(w))


def session_stats(
    df: DataFrame, key_col: str, ts_col: str, gap_minutes: int = 480
) -> DataFrame:
    """Per-session rollup from the islands formulation: start, end,
    event count, duration in seconds."""
    tagged = sessionize(df, key_col, ts_col, gap_minutes)
    return tagged.groupBy(key_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        # same integer half-up ms rounding as session_window_agg (the
        # equality pin in tests/test_sessions.py requires it; see the
        # representation-tie note there)
        (
            F.floor(
                (
                    F.max(F.unix_micros(F.col(ts_col)))
                    - F.min(F.unix_micros(F.col(ts_col)))
                    + 500
                )
                / 1000
            ).cast("double")
            / 1000.0
        ).alias("duration_secs"),
    )


def session_window_agg(
    df: DataFrame, key_col: str, ts_col: str, gap_minutes: int = 480
) -> DataFrame:
    """Built-in session-window aggregation — same output columns as
    ``session_stats`` minus the per-key ordinal (session identity is
    the start time). Streaming-ready: add a watermark and this exact
    plan runs under Structured Streaming."""
    return (
        df.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("sw"),
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            # ms-rounded duration via INTEGER half-up, not ROUND(x/1e6,3):
            # a µs diff ending in exactly 500 is a representation tie
            # that double-ROUND breaks differently across engines
            # (observed at sf0.1/sf1 — 33090.8515 flipped the hash);
            # floor((us+500)/1000)/1000 is exact in both
            (
                F.floor(
                    (
                        F.max(F.unix_micros(F.col(ts_col)))
                        - F.min(F.unix_micros(F.col(ts_col)))
                        + 500
                    )
                    / 1000
                ).cast("double")
                / 1000.0
            ).alias("duration_secs"),
        )
        .drop("sw")
    )
