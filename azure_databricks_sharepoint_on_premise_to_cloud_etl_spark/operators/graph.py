"""Iterative graph operators for dedup clustering.

Near-duplicate detection produces candidate PAIRS; deduplication needs
CLUSTERS (connected components) so each group keeps one canonical
document.  This is the standard large-scale CC-by-min-label-propagation
(the simplified form of the large-star/small-star algorithm used for
web-scale dedup): every node repeatedly adopts the minimum label among
itself and its neighbors until fixpoint.

Scale notes: each iteration is one shuffle (join on node) + one
aggregate; iteration count is O(log(diameter)) for typical dup-cluster
graphs (tiny diameters).  The loop is driver-side control flow only —
data never leaves the cluster; convergence is checked with a count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    node_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``edges`` are undirected pairs; ``nodes`` is the full vertex set
    (isolated nodes label themselves).  Returns (node_col, component).
    """
    # symmetrize once; cache — reused every iteration
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .cache()
    )
    # localCheckpoint each generation: iterative plans otherwise embed
    # every previous iteration's joins, so analysis/codegen memory and
    # plan size grow without bound (the classic iterative-Spark trap —
    # this is what blew the heap at sf0.1 before truncation).
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    ).localCheckpoint(eager=True)
    for _ in range(max_iterations):
        # neighbor's current label, min-reduced per node
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        # carry the previous label through the propagation frame so the
        # convergence check is a filter over the checkpointed result,
        # not an extra join per iteration
        new_full = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["a"], "left")
            .select(
                "node",
                F.col("component").alias("prev_component"),
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_full.filter(
            F.col("component") != F.col("prev_component")
        ).count()
        labels = new_full.select("node", "component")
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("node").alias(node_col), "component")
