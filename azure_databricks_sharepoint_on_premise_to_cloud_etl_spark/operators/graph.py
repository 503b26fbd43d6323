"""Iterative graph operators for dedup clustering.

Near-duplicate detection produces candidate PAIRS; deduplication needs
CLUSTERS (connected components) so each group keeps one canonical
document.  Implemented as min-label propagation PLUS pointer jumping
(each round a node adopts the minimum label among itself and its
neighbors, then adopts its label's label) — the pointer-jump halves
chain depth every round, giving O(log diameter) convergence, the
property that makes web-scale CC tractable (the simplified form of the
large-star/small-star algorithm).

Scale notes: each iteration is two keyed shuffles (neighbor join +
jump join) and a convergence count; data never leaves the cluster.
Every generation is eagerly localCheckpointed (iterative plans
otherwise embed all prior joins and exhaust driver/executor memory)
and the PREVIOUS generation's blocks are unpersisted, bounding storage
at two label-table copies.
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
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``edges`` are undirected pairs; ``nodes`` is the full vertex set
    (isolated nodes label themselves).  Returns (node_col, component).
    Raises RuntimeError if ``max_iterations`` rounds don't converge —
    with pointer jumping that bound covers diameters ~2^25, so hitting
    it means something is genuinely wrong; silent wrong components
    (split dup-clusters) are never returned.
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
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iterations):
        # 1. propagate: min label among self and neighbors
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        propagated = labels.join(
            neighbor_min, labels["node"] == neighbor_min["a"], "left"
        ).select(
            "node",
            F.col("component").alias("prev_component"),
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
        )
        # 2. pointer jump: adopt my label's label (halves chain depth,
        #    turning O(diameter) propagation into O(log diameter))
        parents = propagated.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        new_full = (
            propagated.join(
                parents, propagated["component"] == parents["p_node"], "left"
            )
            .select(
                "node",
                "prev_component",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("p_comp"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_full.filter(
            F.col("component") != F.col("prev_component")
        ).count()
        labels.unpersist()  # free the previous generation's blocks
        labels = new_full
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations — graph larger/stranger than the safety bound"
        )
    return labels.select(F.col("node").alias(node_col), "component")
