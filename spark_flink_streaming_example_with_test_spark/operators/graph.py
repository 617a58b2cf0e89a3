"""Iterative graph operators: connected components over an edge
DataFrame via min-label propagation.

The training-pipeline use is near-duplicate *clustering*: similarity
pairs (MinHash-LSH or exact Jaccard) are edges, and a connected
component is one duplicate cluster from which a single representative
document survives. Pairwise dedup alone can't do this — A~B and B~C
without A~C still must collapse to one cluster.

Scale posture: each iteration is one shuffle on the node key (join
edges-to-labels + min-aggregate); iterations = component diameter,
which for near-dup clusters is small (2-5). Lineage is truncated
every iteration with an eager localCheckpoint so plans don't grow
unboundedly — the standard Spark iterative-algorithm pattern (same
loop GraphX/GraphFrames run internally). At 100 TB the edge list is
the LSH candidate set, orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Return (node, component) where component is the minimum node
    id reachable from ``node`` over the undirected edge set.

    Min-label propagation: every node starts labeled with itself;
    each round, each node takes the min of its own label and its
    neighbors' labels; fixpoint when no label changes. Convergence in
    O(diameter) rounds since labels only decrease and the true
    component minimum floods outward one hop per round.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    try:
        for _ in range(max_iterations):
            propagated = sym.join(
                labels, sym.u == labels.node
            ).select(F.col("v").alias("node"), "label")
            new_labels = (
                labels.unionByName(propagated)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
    finally:
        sym.unpersist()
    if not converged:
        # Unconverged labels silently split one true component into
        # several clusters — surface it instead of returning quietly.
        import warnings

        warnings.warn(
            f"connected_components did not converge within "
            f"{max_iterations} iterations (component diameter exceeds "
            "the budget); labels may split true components — raise "
            "max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.withColumnRenamed("label", "component")
