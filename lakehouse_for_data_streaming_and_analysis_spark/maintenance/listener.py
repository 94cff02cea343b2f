"""Live streaming observability via StreamingQueryListener.

The reference measures pipeline latency offline, by re-reading commit
timestamps from the table after the fact (TimeDelay.ipynb; re-expressed
in-engine by ``maintenance/commitlog.latency_report``). This module is
the LIVE path the engine itself provides: a
``StreamingQueryListener`` that captures every micro-batch's progress
event as it happens — input rows, throughput, trigger duration, state
rows — into a typed DataFrame, so the same latency analytics run
against a running query with zero table re-reads.

Usage::

    cap = ProgressCapture()
    spark.streams.addListener(cap)
    ... run queries ...
    cap.to_df(spark)       # one row per micro-batch
    cap.summary(spark)     # per-query rollup (batches, rows, p50/max)
    spark.streams.removeListener(cap)

The listener runs on the driver's listener bus; the capture buffer
holds one small tuple per micro-batch (bounded by ``max_rows``,
oldest-dropped), so it is safe to leave attached to long-running
queries. At 100 TB the same events would be forwarded to a metrics
sink instead of a list — the extraction logic is identical.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_id string, run_id string, name string, batch_id long, "
    "event_ts string, num_input_rows long, input_rows_per_sec double, "
    "processed_rows_per_sec double, trigger_ms long, state_rows long"
)


class ProgressCapture(StreamingQueryListener):
    """Capture micro-batch progress events into a bounded buffer."""

    def __init__(self, max_rows: int = 10_000):
        self._rows: deque = deque(maxlen=max_rows)
        self._lifecycle: list[tuple[str, str]] = []

    # ---------------------------------------------------- listener API

    def onQueryStarted(self, event):
        self._lifecycle.append(("started", str(event.id)))

    def onQueryProgress(self, event):
        p = event.progress
        state_rows = 0
        for op in p.stateOperators or []:
            state_rows += int(op.numRowsTotal or 0)
        self._rows.append(
            (
                str(p.id),
                str(p.runId),
                p.name,
                int(p.batchId),
                str(p.timestamp),
                int(p.numInputRows or 0),
                float(p.inputRowsPerSecond or 0.0),
                float(p.processedRowsPerSecond or 0.0),
                int((p.durationMs or {}).get("triggerExecution", 0)),
                state_rows,
            )
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self._lifecycle.append(("terminated", str(event.id)))

    # ------------------------------------------------------- analytics

    def to_df(self, spark: SparkSession) -> DataFrame:
        """One row per captured micro-batch."""
        return spark.createDataFrame(list(self._rows), PROGRESS_SCHEMA)

    def summary(self, spark: SparkSession) -> DataFrame:
        """Per-query rollup: the live equivalent of the reference's
        TimeDelay latency table — batches, rows, and the trigger-
        duration distribution (median/p90/max)."""
        df = self.to_df(spark)
        return df.groupBy("query_id", "name").agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("num_input_rows").alias("total_rows"),
            F.round(F.avg("input_rows_per_sec"), 2).alias(
                "avg_input_rows_per_sec"
            ),
            F.expr("percentile(trigger_ms, 0.5)").alias("p50_trigger_ms"),
            F.expr("percentile(trigger_ms, 0.9)").alias("p90_trigger_ms"),
            F.max("trigger_ms").alias("max_trigger_ms"),
            F.max("state_rows").alias("max_state_rows"),
        )

    @property
    def lifecycle(self) -> list[tuple[str, str]]:
        return list(self._lifecycle)
