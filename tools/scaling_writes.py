#!/usr/bin/env python3
"""Write-path scaling table: DELETE / UPDATE / MERGE / OPTIMIZE wall
vs table size, sf0.01 -> sf1 (round-5 ask #7 — the §2.11/delta
surface's scaling evidence).

Each scale builds a scratch transaction-logged table from that scale's
``orders`` (range-partitioned into 16 files on o_orderkey so file
statistics are narrow), then times row-level operations whose MATCHED
SET IS CONSTANT across scales (the first 400 keys / 100 fresh keys):

* delete_cow / delete_mor — DELETE of the fixed key range
  (copy-on-write rewrite vs deletion-vector bitmap write)
* update_cow / update_mor — UPDATE of the fixed key range
* merge_upsert — 400 updates + 100 inserts through the key-merge path
* optimize — bin-pack after 4 small appends (NOTE: compaction is
  data-proportional BY DEFINITION — it rewrites the table's bytes;
  the scale story is the incremental trigger, not the rewrite)

Sub-linear wall across the three decades = the find-touched scan is
parallel + footer-pruned and the rewrite cost follows the matched
set, not the table.

Usage::

    python tools/make_sf.py            # once, for sf1
    python tools/scaling_writes.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table  # noqa: E402
from lakehouse_for_data_streaming_and_analysis_spark.delta import DeltaishTable  # noqa: E402
from lakehouse_for_data_streaming_and_analysis_spark.session import get_spark  # noqa: E402

SCALES = (
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".scratch", "sf1")),
)

OPS = (
    "delete_cow",
    "delete_mor",
    "update_cow",
    "update_mor",
    "merge_upsert",
    "optimize",
)

N_MATCH = 400  # constant matched set across scales
N_INSERT = 100


def _build(spark, sf_dir: str, root: str) -> DeltaishTable:
    df = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderpriority",
        )
        .repartitionByRange(16, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
    )
    return DeltaishTable.create(spark, root, df)


def _time_op(spark, sf_dir: str, op: str, scratch: str) -> float:
    root = os.path.join(scratch, op)
    t = _build(spark, sf_dir, root)
    max_key = t.read().agg(F.max("o_orderkey")).collect()[0][0]
    cond = F.col("o_orderkey") <= N_MATCH
    t0 = time.perf_counter()
    if op == "delete_cow":
        t.delete(cond, mode="copy_on_write")
    elif op == "delete_mor":
        t.delete(cond, mode="merge_on_read")
    elif op == "update_cow":
        t.update(cond, {"o_totalprice": F.col("o_totalprice") * 1.1})
    elif op == "update_mor":
        t.update(
            cond,
            {"o_totalprice": F.col("o_totalprice") * 1.1},
            mode="merge_on_read",
        )
    elif op == "merge_upsert":
        upd = (
            t.read()
            .filter(cond)
            .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        )
        ins = upd.limit(N_INSERT).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(int(max_key))
        )
        t.merge(upd.unionByName(ins), keys=["o_orderkey"])
    elif op == "optimize":
        small = t.read().limit(50)
        for _ in range(4):
            t.append(small)
        t0 = time.perf_counter()  # appends are setup, not optimize cost
        t.optimize()
    dt = time.perf_counter() - t0
    shutil.rmtree(root, ignore_errors=True)
    return dt


def main() -> None:
    spark = get_spark("scaling_writes")
    spark.sparkContext.setLogLevel("ERROR")
    # write-path micro-jobs: tiny shuffles at bench volume are pure
    # scheduling overhead at 32 partitions (BASELINE.md r4 note)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    scales = [(n, d) for n, d in SCALES if os.path.isdir(d)]
    results: dict[tuple[str, str], float] = {}
    with tempfile.TemporaryDirectory() as scratch:
        # warm codegen/JVM once with the smallest scale
        _time_op(spark, scales[0][1], "delete_cow", scratch)
        for sf_name, sf_dir in scales:
            for op in OPS:
                dt = _time_op(spark, sf_dir, op, scratch)
                results[(op, sf_name)] = dt
                print(f"# {op} @ {sf_name}: {dt:.2f}s", file=sys.stderr)

    hdr = " | ".join(n for n, _ in scales)
    span = {2: "10", 3: "100"}.get(len(scales), "?")
    print(f"| operation | {hdr} | wall ratio at {span}x table |")
    print("|---|" + "---|" * (len(scales) + 1))
    for op in OPS:
        cells = " | ".join(
            f"{results[(op, n)]:.2f} s" for n, _ in scales
        )
        ratio = results[(op, scales[-1][0])] / results[(op, scales[0][0])]
        print(f"| {op} | {cells} | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
