"""Connected components via min-label propagation — the iterative
operator pattern (dedup clustering: candidate pairs -> duplicate
groups).

Each iteration: every node takes the min of its own label and its
neighbors' labels; converges in O(graph diameter) rounds. All work is
joins + groupBy (shuffles on node id) — no driver-side graph state; the
driver only checks the per-round convergence counter. localCheckpoint
truncates the lineage each round so plan size stays constant (the
classic iterative-algorithm failure mode on Spark is exponential plan
growth, not compute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Label each node in ``nodes`` with the min node id reachable in the
    undirected graph given by ``edges``. Returns (node_col, component).
    Isolated nodes are their own component."""
    bi = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("t")
    ).union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("t")))
    bi = bi.distinct().localCheckpoint()

    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    ).localCheckpoint()

    for _ in range(max_iter):
        neighbor_labels = bi.join(
            labels, bi.s == labels.node
        ).select(F.col("t").alias("node"), "component")
        new_labels = (
            labels.union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            labels.alias("old")
            .join(new_labels.alias("new"), "node")
            .filter(F.col("old.component") != F.col("new.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias(node_col), "component")
