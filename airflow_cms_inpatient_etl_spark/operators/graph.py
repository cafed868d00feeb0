"""Graph operators for dedup pipelines: connected components over near-dup
pair graphs (pairs → clusters is the step every dedup pipeline needs between
pair generation and representative selection).

Algorithm: iterative min-label propagation — every node starts labeled with
itself; each round a node takes the min of its own label and its neighbors'
labels; converged when no label changes.  Each round is one distributed join
+ aggregation; the driver only coordinates rounds and checks convergence (a
count), which is how iterative algorithms legitimately use the driver (same
shape as GraphX/Pregel supersteps).

Scale notes: rounds needed = graph diameter.  Near-dup components are
shallow (near-dup similarity is close to transitive), so a handful of rounds
suffices; for adversarially long path graphs at 100 TB, swap the propagation
body for the large-star/small-star pair of steps (Kiveris et al., "Connected
Components in MapReduce and Beyond") which converges in O(log n) rounds with
the same join-shape per round.  ``localCheckpoint`` truncates plan lineage
every round (on a real cluster, use a reliable ``checkpoint`` dir so
executor loss cannot lose the only copy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iters: int = 50,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum node id
    of its connected component.  Returns (node, label) — deterministic: min
    over a component does not depend on iteration or partition order."""
    e = pairs.select(F.col(id1).alias("src"), F.col(id2).alias("dst"))
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels.select(F.col("node").alias("dst"), "label"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
            .select(F.col("src").alias("node"), "nmin")
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "node")
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iters} rounds")
