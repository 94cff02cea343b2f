"""Distributed connected components by iterative min-label
propagation — the dedup-clustering step that turns near-duplicate
PAIRS into duplicate GROUPS (each doc keeps/drops by its component
representative).

Algorithm (large-star simplification of Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14): every node starts
labeled with its own id; each round every node takes the min label in
its closed neighborhood; stop when no label changes. Rounds needed =
graph diameter (near-dup graphs are unions of small cliques — single
digits).

Scale design: labels and edges are shuffle-partitioned on node id —
each round is one shuffle join + one aggregate. `localCheckpoint`
truncates the lineage every round so the plan does not deepen with
iteration count, and the convergence check is a single count()
aggregate, not a collect of the labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Edges (undirected, any orientation) -> (node, component) with
    component = min node id reachable. Converges in <= diameter
    rounds; raises if ``max_iters`` rounds are not enough."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("label").alias("nlabel"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["node2"], "left")
            .select(
                "node",
                "label",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "new_label"
                ),
            )
            .localCheckpoint()
        )
        changed = updated.filter(F.col("new_label") != F.col("label")).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no convergence in {max_iters} rounds")


def component_stats(labels: DataFrame) -> DataFrame:
    """(component, n_nodes) for non-trivial components — the duplicate
    groups a dedup pass would collapse."""
    return (
        labels.groupBy(F.col("label").alias("component"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
