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
count; data never leaves the cluster.  The iteration frontier is the
EDGE-ENDPOINT set only — after LSH candidate generation the endpoints
are a small fraction of the corpus, and nodes outside any pair are
trivially their own component, re-attached by one left join at the
end; carrying the full node set per round would shuffle the
non-duplicate majority every iteration.  The edge table and every
label generation are hash-partitioned on their join keys once, so the
per-round joins reuse partitioning instead of re-shuffling both sides.
Every generation is eagerly checkpointed (iterative plans otherwise
embed all prior joins and exhaust driver/executor memory):

- default (``checkpoint_dir=None``): ``localCheckpoint`` — fastest,
  but blocks live on executors only, so a lost executor kills the job;
  fine for tests and on-demand clusters, wrong for preemptible fleets;
- ``checkpoint_dir=...``: reliable ``checkpoint`` to that path —
  generations survive executor loss; the superseded generation's files
  are deleted as soon as the next one is materialized, and the
  SparkContext's previous checkpoint dir is restored on exit.

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


def _delete_reliable_checkpoint(df: DataFrame) -> None:
    """Delete a reliable-checkpointed DataFrame's files NOW.

    Spark's ReferenceTracking cleaner removes checkpoint files only on
    JVM GC of the RDD object and only when
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` is set; an
    iterative algorithm that checkpoints every round would otherwise
    grow storage linearly with iteration count.  Best-effort: on any
    reflection surprise the files are left for the cleaner/caller.
    """
    try:
        jrdd = df._jdf.queryExecution().analyzed().rdd()
        opt = jrdd.getCheckpointFile()
        if not opt.isDefined():
            return
        sc = df.sparkSession.sparkContext
        path = sc._jvm.org.apache.hadoop.fs.Path(opt.get())
        fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
        fs.delete(path, True)
    except Exception:
        pass


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
    prev_ckpt_dir = None
    if checkpoint_dir is not None:
        # save/restore: setCheckpointDir mutates global SparkContext
        # state that would otherwise leak past this call
        opt = spark.sparkContext._jsc.sc().getCheckpointDir()
        prev_ckpt_dir = opt.get() if opt.isDefined() else None
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def snapshot(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    def release(df: DataFrame) -> None:
        if checkpoint_dir is None:
            _release_local_checkpoint(df)
        else:
            # delete the superseded generation's checkpoint files NOW:
            # Spark's reference-tracking cleaner only reclaims them on
            # JVM GC (and only with cleanCheckpoints=true), so a long
            # CC run otherwise accumulates one generation per round
            _delete_reliable_checkpoint(df)

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
    # Iterate ONLY over edge endpoints: after LSH, candidate pairs
    # touch a small fraction of the corpus, while every node outside
    # any pair is trivially its own component.  Carrying the full node
    # set through every round (as r2 did) shuffles the non-duplicate
    # majority — usually >90% of the corpus — per iteration for no
    # information; isolated nodes are re-attached once at the end with
    # coalesce(component, node).
    endpoints = sym.select("a").distinct()
    labels = snapshot(
        endpoints.select(
            F.col("a").alias("node"), F.col("a").alias("component")
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
    if prev_ckpt_dir is not None:
        spark.sparkContext.setCheckpointDir(prev_ckpt_dir)
    # re-attach isolated nodes: anything outside the edge set is its
    # own component (one left join, no per-round cost)
    return nodes.select(F.col(node_col)).join(
        labels.withColumnRenamed("node", node_col), node_col, "left"
    ).select(
        node_col,
        F.coalesce(F.col("component"), F.col(node_col)).alias("component"),
    )
