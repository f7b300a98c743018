"""Iterative graph operator: connected components (dedup-group closure).

Near-dup pairs (MinHash/SimHash output) are edges; the duplicate GROUPS
are the connected components — the canonical doc per group is the
minimum id. This is the one genuinely iterative algorithm in the engine:
a DataFrame min-label-propagation loop, converging in O(diameter)
rounds. Near-dup graphs have tiny diameters (clusters are cliques-ish),
so rounds ≈ 2-4 in practice.

Scale notes: each round is one join + one aggregate (both shuffle on the
node id — a stable key, so AQE reuses the layout). ``localCheckpoint``
truncates the lineage each round, keeping the plan O(1) instead of
O(rounds). For adversarial long-chain graphs, swap the loop body for the
large-star/small-star rewrite (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — alternating rounds that contract chains
in O(log n)); the driver fixtures' dup clusters never need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = the
    minimum node id reachable through the undirected edge set."""
    und = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    und = und.distinct().localCheckpoint()

    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_iter):
        # each node adopts min(own label, neighbors' labels)
        msgs = und.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "component")
        new_labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
