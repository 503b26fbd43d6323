"""Iterative graph operators for dedup clustering.

Near-duplicate detection produces candidate PAIRS; deduplication needs
CLUSTERS (connected components) so each group keeps one canonical
document.  Implemented as min-label propagation PLUS pointer jumping
(each round a node adopts the minimum label among itself and its
neighbors, then adopts its label's label) — the pointer-jump halves
chain depth every round, giving O(log diameter) convergence, the
property that makes web-scale CC tractable (the simplified form of the
large-star/small-star algorithm).

Scale notes: each iteration is two keyed joins and a convergence
count; data never leaves the cluster.  The edge table and every label
generation are hash-partitioned on their join keys once, so the
per-round joins reuse partitioning instead of re-shuffling both sides.
Every generation is eagerly checkpointed (iterative plans otherwise
embed all prior joins and exhaust driver/executor memory):

- default (``checkpoint_dir=None``): ``localCheckpoint`` — fastest,
  but blocks live on executors only, so a lost executor kills the job;
  fine for tests and on-demand clusters, wrong for preemptible fleets;
- ``checkpoint_dir=...``: reliable ``checkpoint`` to that path —
  generations survive executor loss (set
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` or clean
  the directory afterwards).

The PREVIOUS generation's storage is released each round by
unpersisting the checkpointed RDD itself (reaching through the
``LogicalRDD`` plan node — a plain ``DataFrame.unpersist()`` only
clears cache-manager entries and is a no-op for checkpoints), bounding
local-mode storage at two label-table copies for real.  Release
happens strictly AFTER the next generation is eagerly materialized:
unpersisting a localCheckpoint's blocks is unrecoverable by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpoint-ed DataFrame's blocks NOW.

    ``df.unpersist()`` does not do this — localCheckpoint persists the
    underlying RDD outside the cache manager, and its blocks are
    otherwise only freed when the JVM RDD object is GC'd.  Reach the
    RDD through the analyzed ``LogicalRDD`` node and unpersist it
    directly.  Best-effort: on any reflection surprise we fall back to
    GC-based cleanup (correct, just lazier).
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    node_col: str = "doc_id",
    max_iterations: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``edges`` are undirected pairs; ``nodes`` is the full vertex set
    (isolated nodes label themselves).  Returns (node_col, component).
    ``checkpoint_dir`` selects reliable checkpoints (see module
    docstring) — default localCheckpoint.
    Raises RuntimeError if ``max_iterations`` rounds don't converge —
    with pointer jumping that bound covers diameters ~2^25, so hitting
    it means something is genuinely wrong; silent wrong components
    (split dup-clusters) are never returned.
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def snapshot(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    def release(df: DataFrame) -> None:
        # reliable checkpoint files are reclaimed by Spark's cleaner /
        # the caller; only local blocks need manual release
        if checkpoint_dir is None:
            _release_local_checkpoint(df)

    # symmetrize once; hash-partition on the join key and cache so the
    # per-round neighbor join reuses this layout instead of re-shuffling
    # the (static) edge table every iteration
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .repartition("b")
        .cache()
    )
    labels = snapshot(
        nodes.select(
            F.col(node_col).alias("node"), F.col(node_col).alias("component")
        ).repartition("node")
    )
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
        new_full = snapshot(
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
            # NB: no explicit repartition here — AQE right-sizes the
            # join shuffles each round, and forcing node-partitioning
            # costs an extra exchange per round (measured slower at
            # every scale where the label table fits a shuffle)
        )
        # convergence needs existence, not cardinality: isEmpty() scans
        # until the first changed row instead of counting all 32
        # partitions' worth
        stable = new_full.filter(
            F.col("component") != F.col("prev_component")
        ).isEmpty()
        release(labels)  # new_full is materialized; prev gen never read again
        labels = new_full
        if stable:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations — graph larger/stranger than the safety bound"
        )
    return labels.select(F.col("node").alias(node_col), "component")
