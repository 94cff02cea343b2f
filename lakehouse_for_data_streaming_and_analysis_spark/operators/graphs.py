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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    alpha: float = 0.85,
    n_iters: int = 10,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list -> (node,
    rank), with uniform teleport and dangling-mass redistribution
    (ranks sum to 1 every iteration).

    Scale design: out-degrees are computed once and fused into the
    edge list (edge weight = 1/outdeg), so each iteration is exactly
    one join (ranks ⋈ edges on src — both sides hash-partitioned on
    the same key) + one groupBy(dst) sum + a 1-row dangling-mass
    aggregate broadcast into the update expression. `localCheckpoint`
    truncates lineage per round, keeping the plan flat across
    iterations — same pattern as connected_components above.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("t").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    # weight edges once: contribution factor 1/outdeg
    we = (
        e.join(outdeg, "s")
        .select("s", "t", (F.lit(1.0) / F.col("deg")).alias("w"))
        .localCheckpoint()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    has_out = we.select(F.col("s").alias("node")).distinct()
    for _ in range(n_iters):
        # mass sitting on dangling nodes (no out-edges) this round —
        # a 1-row aggregate that joins back in by broadcast, so each
        # iteration is ONE action (the eager checkpoint), no driver
        # round-trip for the scalar
        dm = ranks.join(has_out, "node", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        inflow = (
            ranks.join(we, ranks["node"] == we["s"])
            .groupBy(F.col("t").alias("node2"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("m"))
        )
        ranks = (
            nodes.join(inflow, nodes["node"] == inflow["node2"], "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                (
                    F.lit((1.0 - alpha) / n)
                    + F.lit(alpha) * F.col("dm") / F.lit(float(n))
                    + F.lit(alpha) * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
