#!/usr/bin/env python3
"""Hot-key skew wall-clock evidence (VERDICT r7 ask #4).

Runs the skew-exposed headline queries on the uniform sf0.1 fixture
and on its same-volume skewed twin (``tools/make_skew.py`` — one key
owning ~30 % of rows on every skew axis), best-of-2 per (query,
fixture), and prints the BASELINE.md markdown rows plus one JSON line.
Because the two fixtures have IDENTICAL row counts, the ratio isolates
what hot keys alone cost the plans; AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in the session factory)
and the map-side partial aggregation built into every groupBy are the
mitigations under test. The acceptance bar from the verdict: ≤2×
inflation at the same volume.

Usage::

    python tools/make_skew.py          # once
    python tools/scaling_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod
from lakehouse_for_data_streaming_and_analysis_spark.session import get_spark

QUERIES = (
    # star join + group-by with hot o_custkey / c_nationkey
    "star_revenue_by_nation_month",
    # one dedup group owning 30 % of the corpus
    "exact_dedup_groups",
    # hot l_suppkey through the salted-join mitigation path
    "salted_skew_join_revenue",
    # hot user_id through the stream-stream state join
    "stream_stream_attribution_join",
)

FIXTURES = (
    ("uniform", "/root/testdata/sf0.1"),
    ("skew30", os.path.join(REPO, ".scratch", "sf0.1skew")),
)


def main() -> None:
    queries = tuple(sys.argv[1:]) or QUERIES
    for _, d in FIXTURES:
        if not os.path.isdir(d):
            raise SystemExit(f"fixture missing: {d} (run tools/make_skew.py)")
    spark = get_spark("scaling_skew", streaming=True)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # warm JVM + codegen per query shape on the small fixture
    for name in queries:
        qs[name](spark, "/root/testdata/sf0.001").count()
    results: dict[str, dict] = {}
    print("| query | uniform sf0.1 (s) | skew30 sf0.1 (s) | ratio | rows u/s |")
    print("|---|---|---|---|---|")
    for name in queries:
        row: dict[str, float] = {}
        counts = {}
        for fixture, d in FIXTURES:
            best, n = float("inf"), None
            for _ in range(2):
                t0 = time.monotonic()
                n = qs[name](spark, d).count()
                best = min(best, time.monotonic() - t0)
            row[fixture] = round(best, 3)
            counts[fixture] = n
        ratio = round(row["skew30"] / row["uniform"], 2)
        results[name] = {**row, "ratio": ratio, "rows": counts}
        print(
            f"| `{name}` | {row['uniform']} | {row['skew30']} | "
            f"{ratio}x | {counts['uniform']}/{counts['skew30']} |"
        )
    print(json.dumps({"skew_pct": 30, "sf": 0.1, "queries": results}))


if __name__ == "__main__":
    main()
