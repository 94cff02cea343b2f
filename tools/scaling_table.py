#!/usr/bin/env python3
"""Headline-query scaling table: wall vs data volume, sf0.001 -> sf1.

Re-runs the BASELINE.md scaling set (10 queries, one per operator
family) at every available scale, best-of-2 per (query, scale), and
prints the markdown table. sf1 is the derived fixture from
``tools/make_sf.py`` (run it first); the three smaller scales are the
driver fixtures.

Usage::

    python tools/make_sf.py          # once
    python tools/scaling_table.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod
from lakehouse_for_data_streaming_and_analysis_spark.session import get_spark

QUERIES = (
    "star_revenue_by_nation_month",
    "tumbling_window_agg",
    "topk_parts_per_nation",
    "exact_dedup_groups",
    "minhash_lsh_neardup",
    "token_counts",
    "large_volume_customers",
    "sole_late_supplier_ranking",
    "pricing_summary_report",
    "tfidf_top_terms",
)

SCALES = (
    ("sf0.001", "/root/testdata/sf0.001"),
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".scratch", "sf1")),
)


def main() -> None:
    global QUERIES
    if len(sys.argv) > 1:  # subset override: scaling_table.py q1 q2 ...
        QUERIES = tuple(sys.argv[1:])
    spark = get_spark("scaling_table")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    scales = [(n, d) for n, d in SCALES if os.path.isdir(d)]
    # warm JVM + codegen once per query shape at the smallest scale
    for name in QUERIES:
        qs[name](spark, scales[0][1]).count()

    best: dict[tuple[str, str], float] = {}
    for sf_name, sf_dir in scales:
        for name in QUERIES:
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                k = (name, sf_name)
                best[k] = min(best.get(k, 1e9), dt)
            print(
                f"# {name} @ {sf_name}: {best[(name, sf_name)]:.2f}s",
                file=sys.stderr,
            )

    hdr = " | ".join(n for n, _ in scales)
    span = 1000 if len(scales) == 4 else 100
    print(f"| query | {hdr} | wall ratio at {span}x data |")
    print("|---|" + "---|" * (len(scales) + 1))
    for name in QUERIES:
        cells = " | ".join(
            f"{best[(name, n)]:.2f} s" for n, _ in scales
        )
        ratio = best[(name, scales[-1][0])] / best[(name, scales[0][0])]
        print(f"| {name} | {cells} | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
