#!/usr/bin/env python3
"""Per-micro-batch progress breakdown for the streaming drain queries.

Usage: python tools/stream_progress.py [--sf DIR] name

Registers a StreamingQueryListener before invoking the query, then
prints one line per micro-batch: rows, durationMs components
(addBatch / getBatch / latestOffset / queryPlanning / commitOffsets /
walCommit) and state-store metrics. This is the guide-§1 evidence for
where a drain's wall time actually goes (batch count x fixed cost vs
data volume)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from lakehouse_for_data_streaming_and_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("name")
    args = ap.parse_args()

    from pyspark.sql.streaming import StreamingQueryListener

    events = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):
            pass

        def onQueryProgress(self, e):
            events.append(json.loads(e.progress.json))

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            pass

    spark = get_spark("stream_progress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(L())
    qs = entrymod.queries()
    from lakehouse_for_data_streaming_and_analysis_spark.queries.pipeline import (
        ensure_replay_dirs,
    )

    ensure_replay_dirs(spark, args.sf)
    t0 = time.perf_counter()
    qs[args.name](spark, args.sf).count()
    wall = time.perf_counter() - t0
    time.sleep(2)  # let listener drain
    tot = 0
    for ev in events:
        d = ev.get("durationMs", {})
        rows = ev.get("numInputRows", 0)
        tot += d.get("triggerExecution", 0)
        print(
            f"batch={ev.get('batchId')} rows={rows} "
            f"trigger={d.get('triggerExecution')} addBatch={d.get('addBatch')} "
            f"getBatch={d.get('getBatch')} latestOffset={d.get('latestOffset')} "
            f"planning={d.get('queryPlanning')} walCommit={d.get('walCommit')} "
            f"commitOffsets={d.get('commitOffsets')}"
        )
    print(f"batches={len(events)} sum_triggerMs={tot} query_wall={wall:.2f}s")


if __name__ == "__main__":
    main()
