"""Oracle matches for the advanced-analytics breadth queries
(queries/advanced.py): regression aggregates, RANGE frames, histogram,
gap-fill, INTERSECT, decorrelated scalar subquery, blocked fuzzy
matching, vector dimension profiles, navigation windows, boolean
aggregates."""

from __future__ import annotations

import pytest

from lakehouse_for_data_streaming_and_analysis_spark.queries import advanced

from .conftest import SF_DIR
from .util import assert_matches_oracle

ORACLE_KEYS = sorted(advanced.ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_advanced_oracle(spark, duck, name):
    assert_matches_oracle(
        advanced.QUERIES[name](spark, SF_DIR), duck, advanced.ORACLES[name]
    )


def test_gap_fill_produces_contiguous_spine(spark):
    """Every (event_type, day) in [min,max] of the sparse daily series
    must appear exactly once, and gap rows must carry the previous
    observed value forward."""
    df = advanced.gap_fill_forward_daily(spark, SF_DIR)
    rows = df.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["d"])
        days = [r["d"] for r in rs]
        assert len(set(days)) == len(days), f"duplicate days for {t}"
        assert (days[-1] - days[0]).days + 1 == len(days), f"holes in spine for {t}"
        prev = None
        for r in rs:
            if r["is_gap"]:
                assert r["filled"] == prev, f"gap not forward-filled for {t}"
            prev = r["filled"]


def test_histogram_counts_cover_table(spark):
    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    df = advanced.histogram_fixed_buckets(spark, SF_DIR)
    rows = df.collect()
    total = load_table(spark, SF_DIR, "events").count()
    assert sum(r["n"] for r in rows) == total
    assert all(0 <= r["bucket"] <= 19 for r in rows)


def test_kmeans_matches_dense_numpy_replay(spark):
    """kmeans_embedding_clusters: replay the exact algorithm (same
    deterministic init, same per-round centroid rounding) in dense
    numpy — cluster sizes must match exactly, inertia and centroid
    norms within rounding tolerance."""
    import numpy as np
    import pyarrow.parquet as pq

    from lakehouse_for_data_streaming_and_analysis_spark.queries.datapipe import (
        kmeans_embedding_clusters,
    )

    k, iters = 8, 4
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    X = np.array([np.asarray(v, dtype=np.float64) for v in t.embedding])
    cents = np.round(X[:k].copy(), 6)
    assign = None
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # first min, same as array_position
        best = d2[np.arange(len(X)), assign]
        for i in range(k):
            if (assign == i).any():
                cents[i] = np.round(X[assign == i].mean(axis=0), 6)
    sizes = {i: int((assign == i).sum()) for i in range(k)}
    inertia = {i: float(best[assign == i].sum()) for i in range(k)}

    rows = kmeans_embedding_clusters(spark, SF_DIR).collect()
    assert len(rows) == k
    for r in rows:
        assert sizes[r.cluster_id] == r.n_members, r
        assert abs(inertia[r.cluster_id] - r.inertia) < 0.05, r
        assert abs(float(np.linalg.norm(cents[r.cluster_id])) - r.centroid_norm) < 1e-3
