"""M4 observability: the reference's pipeline-latency analytics as
oracle-backed queries (SURVEY.md §2.1 S6, §2.13 X11, §6 baseline).

The reference measures end-to-end latency as (commit wall-clock − min
event time per commit) over _delta_log JSON stats (reference:
Jupiter Notebook/TimeDelay.ipynb cells 0-3, code.ipynb cells 5-11).
The live-streaming equivalent runs in maintenance.commitlog against a
real micro-batch run (tests/test_streaming.py); here the same two
report shapes are computed over a *deterministic* commit log derived
from events — one commit per 1-minute bucket, committed 2 s after its
last event — so the driver can hash-match them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Synthetic commit log: version = epoch minute, commit = max event + 2 s
COMMITLOG_SQL = """
  SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 60) AS BIGINT) AS version,
         COUNT(*) AS num_records,
         MIN(epoch(CAST(ts AS TIMESTAMP))) AS min_event_unix,
         MAX(epoch(CAST(ts AS TIMESTAMP))) + 2 AS commit_unix
  FROM events GROUP BY 1
"""


def _commit_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    unix = F.unix_micros("ts") / 1e6  # fractional epoch seconds, like epoch()
    return ev.groupBy(
        F.floor(unix / 60).cast("long").alias("version")
    ).agg(
        F.count(F.lit(1)).alias("num_records"),
        F.min(unix).alias("min_event_unix"),
        (F.max(unix) + 2).alias("commit_unix"),
    )


@q(
    "commit_latency_summary",
    f"""WITH log AS ({COMMITLOG_SQL}),
       delays AS (
         SELECT commit_unix - min_event_unix AS delay_sec FROM log)
       SELECT ROUND(quantile_cont(delay_sec, 0.5), 4) AS median_delay,
              ROUND(AVG(delay_sec), 4) AS mean_delay,
              ROUND(quantile_cont(delay_sec, 0.9), 4) AS p90_delay,
              ROUND(MIN(delay_sec), 4) AS min_delay,
              ROUND(MAX(delay_sec), 4) AS max_delay,
              COUNT(*) AS n_commits
       FROM delays""",
)
def commit_latency_summary(spark, sf_dir):
    """X11: the §6 latency statistics (median/mean/p90/min/max) over
    per-commit delay = commit time − min event time
    (TimeDelay.ipynb cell 2's summary)."""
    log = _commit_log(spark, sf_dir)
    delay = (F.col("commit_unix") - F.col("min_event_unix")).alias("delay_sec")
    return log.select(delay).agg(
        F.round(F.expr("percentile(delay_sec, 0.5)"), 4).alias("median_delay"),
        F.round(F.avg("delay_sec"), 4).alias("mean_delay"),
        F.round(F.expr("percentile(delay_sec, 0.9)"), 4).alias("p90_delay"),
        F.round(F.min("delay_sec"), 4).alias("min_delay"),
        F.round(F.max("delay_sec"), 4).alias("max_delay"),
        F.count(F.lit(1)).alias("n_commits"),
    )


@q(
    "commit_cadence_gaps",
    f"""WITH log AS ({COMMITLOG_SQL}),
       gaps AS (
         SELECT version,
                commit_unix - LAG(commit_unix) OVER (ORDER BY version) AS gap_sec
         FROM log)
       SELECT COUNT(*) AS n_gaps,
              ROUND(AVG(gap_sec), 4) AS mean_gap,
              ROUND(MIN(gap_sec), 4) AS min_gap,
              ROUND(MAX(gap_sec), 4) AS max_gap
       FROM gaps WHERE gap_sec IS NOT NULL""",
)
def commit_cadence_gaps(spark, sf_dir):
    """X11 (cadence): wall-clock gap between consecutive commits
    (code.ipynb cell 8's time_gap average)."""
    log = _commit_log(spark, sf_dir)
    # bounded-grain: commit-log grain (one row per table version;
    # retention-bounded, ~thousands)
    w = Window.orderBy("version")
    gaps = log.select(
        "version",
        (F.col("commit_unix") - F.lag("commit_unix").over(w)).alias("gap_sec"),
    ).filter(F.col("gap_sec").isNotNull())
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_sec"), 4).alias("mean_gap"),
        F.round(F.min("gap_sec"), 4).alias("min_gap"),
        F.round(F.max("gap_sec"), 4).alias("max_gap"),
    )


@q(
    "table_freshness_report",
    """WITH per_table AS (
         SELECT 'events' AS table_name, COUNT(*) AS n_rows,
                CAST(MAX(ts) AS TIMESTAMP) AS max_event_time
         FROM events
         UNION ALL
         SELECT 'orders', COUNT(*), CAST(MAX(o_orderdate) AS TIMESTAMP)
         FROM orders
         UNION ALL
         SELECT 'lineitem', COUNT(*), CAST(MAX(l_shipdate) AS TIMESTAMP)
         FROM lineitem),
       anchor AS (SELECT MAX(max_event_time) AS newest FROM per_table)
       SELECT p.table_name, p.n_rows, p.max_event_time,
              CAST(FLOOR(epoch(a.newest)) AS BIGINT)
              - CAST(FLOOR(epoch(p.max_event_time)) AS BIGINT)
                AS staleness_secs
       FROM per_table p CROSS JOIN anchor a""",
)
def table_freshness_report(spark, sf_dir):
    """Freshness SLO report: per-table newest event time and its lag
    behind the freshest table in the lakehouse — the check a
    medallion pipeline runs before promoting bronze->silver (a stale
    upstream means the join would silently under-count). Each branch
    is a 1-row scan-aggregate; the anchor is a 1-row cross join.
    Wall-clock-free (anchored to data, not now()) so the report is
    deterministic and testable."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_table = (
        ev.agg(
            F.lit("events").alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.max("ts").cast("timestamp").alias("max_event_time"),
        )
        .unionByName(
            o.agg(
                F.lit("orders").alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.max("o_orderdate").cast("timestamp").alias("max_event_time"),
            )
        )
        .unionByName(
            li.agg(
                F.lit("lineitem").alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.max("l_shipdate").cast("timestamp").alias("max_event_time"),
            )
        )
    )
    anchor = per_table.agg(F.max("max_event_time").alias("newest"))
    secs = (F.unix_micros(F.col("newest")) / 1_000_000).cast("bigint") - (
        F.unix_micros(F.col("max_event_time")) / 1_000_000
    ).cast("bigint")
    return per_table.join(F.broadcast(anchor)).select(
        "table_name", "n_rows", "max_event_time", secs.alias("staleness_secs")
    )
