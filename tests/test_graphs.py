"""PageRank correctness (operators/graphs.pagerank): pinned against a
dense numpy power iteration on the same edge list, plus invariants
(mass conservation, dangling handling)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.operators import graphs


def _numpy_pagerank(edge_list, alpha, n_iters):
    nodes = sorted({u for e in edge_list for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edge_list:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        nxt = np.zeros(n)
        dangling = r[out == 0].sum()
        for s, t in edge_list:
            nxt[idx[t]] += r[idx[s]] / out[idx[s]]
        r = (1 - alpha) / n + alpha * dangling / n + alpha * nxt
    return {u: r[idx[u]] for u in nodes}


def test_pagerank_matches_dense_reference(spark):
    # small graph with a cycle, a hub, and a dangling node (5)
    edge_list = [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4), (3, 4), (4, 5)]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in graphs.pagerank(edges, n_iters=12).collect()
    }
    want = _numpy_pagerank(edge_list, alpha=0.85, n_iters=12)
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-9, (u, got[u], want[u])
    # ranks are a distribution (dangling mass redistributed, not lost)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # same argmax as the reference (the terminal sink, fed by the hub)
    assert max(got, key=got.get) == max(want, key=want.get)


def test_pagerank_uniform_on_symmetric_cycle(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    got = [r["rank"] for r in graphs.pagerank(edges, n_iters=8).collect()]
    assert all(abs(x - 0.25) < 1e-12 for x in got)


def test_pagerank_query_shape(spark):
    from .conftest import SF_DIR

    import __spark_entry__ as entrymod

    df = entrymod.queries()["pagerank_user_influence"](spark, SF_DIR)
    rows = df.collect()
    assert 0 < len(rows) <= 50
    assert [f.name for f in df.schema.fields] == ["user_id", "rank"]
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)
