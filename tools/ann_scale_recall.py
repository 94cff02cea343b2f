#!/usr/bin/env python3
"""ANN recall at 10x vectors (VERDICT r8 ask #7).

The embeddings fixture tops out at 2k base vectors (20k in the sf1
replica, where replicas are EXACT copies — degenerate for ANN: every
query has 25 identical twins). This tool derives a 50,000-vector
corpus with honest geometry — 25 replicas of the sf0.1 vectors, each
non-zero replica perturbed per-component by deterministic hash-noise
(±0.03 on components averaging |x|≈0.1), so each original becomes a
tight 25-vector cluster, the classic ANN workload — then re-measures

* IVF recall@10 vs n_probe (100 centroid cells), and
* hyperplane-LSH recall@10 vs n_tables (10 planes, 1024 buckets),

against the brute-force cosine ground truth, and emits the table
BASELINE.md cites plus ``ann_recall_50k.json``. Minimum-recall gates
at this size live in tests/test_scale.py (same fixture builder).

No RNG anywhere: the noise is a pure function of (vec_id, replica,
component), so the corpus — and therefore the measured recall — is
bit-reproducible across runs and machines.

Usage::

    python tools/ann_scale_recall.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1/embeddings.parquet"
DEST = os.path.join(REPO, ".scratch", "embeddings50k.parquet")
REPLICAS = 25
STRIDE = 100_000
EPS = 0.03
DIM = 64
K = 10
N_QUERIES = 100
IVF_CELLS = 100
LSH_PLANES = 10


def build_fixture(dest: str = DEST) -> str:
    """Derive the 50k-vector corpus (idempotent, deterministic)."""
    if os.path.exists(dest):
        return dest
    import duckdb

    os.makedirs(os.path.dirname(dest), exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT UNNEST(RANGE({REPLICAS})) AS i")
    noise = (
        f"(CAST(hash(e.vec_id * 1000003 + r.i * 8191 + j) % 2001 AS DOUBLE)"
        f" - 1000.0) / 1000.0 * {EPS}"
    )
    con.execute(
        f"""COPY (
          SELECT e.vec_id + r.i * {STRIDE} AS vec_id,
                 CASE WHEN r.i = 0 THEN e.embedding
                      ELSE CAST(list_transform(range(1, {DIM} + 1),
                             j -> e.embedding[j] + {noise}) AS FLOAT[])
                 END AS embedding,
                 e.label
          FROM read_parquet('{SRC}') e, r
        ) TO '{dest}' (FORMAT PARQUET, CODEC SNAPPY)"""
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dest}')"
    ).fetchone()[0]
    assert n == 2000 * REPLICAS, n
    return dest


def _recall(approx, truth) -> float:
    """recall@K: |approx ∩ truth| / |truth| over (qid, vec_id) pairs."""
    hits = approx.join(truth, ["qid", "vec_id"]).count()
    return round(hits / truth.count(), 4)


def main() -> None:
    from lakehouse_for_data_streaming_and_analysis_spark.operators import similarity
    from lakehouse_for_data_streaming_and_analysis_spark.session import get_spark

    from pyspark.sql import functions as F

    build_fixture()
    spark = get_spark("ann_scale_recall")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(DEST).cache()
    n = corpus.count()
    queries = corpus.filter(
        (F.col("vec_id") < 2000) & (F.col("vec_id") % (2000 // N_QUERIES) == 0)
    ).cache()
    nq = queries.count()
    print(f"corpus {n} vectors, {nq} queries, recall@{K}\n")

    t0 = time.monotonic()
    truth = (
        similarity.brute_force_topk(corpus, queries, k=K)
        .select("qid", "vec_id")
        .cache()
    )
    n_truth = truth.count()
    brute_wall = round(time.monotonic() - t0, 1)
    print(f"brute-force ground truth: {n_truth} pairs, {brute_wall}s\n")

    out = {"n_vectors": n, "n_queries": nq, "k": K, "ivf": [], "lsh": []}
    print(f"| IVF n_probe (of {IVF_CELLS} cells) | recall@{K} | wall s |")
    print("|---|---|---|")
    for n_probe in (1, 2, 4, 8, 16):
        t0 = time.monotonic()
        approx = similarity.ivf_topk(
            corpus, queries, k=K, n_centroids=IVF_CELLS, n_probe=n_probe
        ).select("qid", "vec_id")
        rec = _recall(approx, truth)
        wall = round(time.monotonic() - t0, 1)
        print(f"| {n_probe} | {rec} | {wall} |")
        out["ivf"].append({"n_probe": n_probe, "recall": rec, "wall": wall})

    print(f"\n| LSH n_tables ({LSH_PLANES} planes) | recall@{K} | wall s |")
    print("|---|---|---|")
    for n_tables in (1, 2, 4, 8):
        t0 = time.monotonic()
        approx = similarity.lsh_topk(
            corpus,
            queries,
            k=K,
            n_planes=LSH_PLANES,
            n_tables=n_tables,
            dim=DIM,
        ).select("qid", "vec_id")
        rec = _recall(approx, truth)
        wall = round(time.monotonic() - t0, 1)
        print(f"| {n_tables} | {rec} | {wall} |")
        out["lsh"].append(
            {"n_tables": n_tables, "recall": rec, "wall": wall}
        )

    dest = os.path.join(REPO, "ann_recall_50k.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n(written {dest})")


if __name__ == "__main__":
    main()
