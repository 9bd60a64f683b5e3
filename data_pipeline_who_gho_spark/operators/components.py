"""Connected components by iterative min-label propagation — the dedup
clustering step: near-dup PAIRS → one canonical document per duplicate
cluster (keep-min-id), so "drop duplicates" is a single anti-join.

Algorithm: every vertex starts labeled with itself; each round joins
labels across edges and takes the min; stops at fixpoint. Converges in
O(diameter) rounds — at 100 TB each round is one shuffle join + one
aggregate, and dup clusters are shallow (diameter ≤ a few), so 2-4
rounds in practice. This is the standard large-graph CC recipe on
DataFrames (no GraphX dependency, survives arbitrary scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,  # (id)
    edges: DataFrame,  # (src, dst) undirected pairs
    max_iterations: int = 50,
) -> DataFrame:
    """Return (id, component) with component = min id reachable.

    Raises RuntimeError if the fixpoint isn't reached within
    ``max_iterations`` (graph diameter too large) — loud beats silently
    wrong cluster labels."""
    converged = False
    both = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = vertices.select(F.col("id"), F.col("id").alias("component"))

    for _ in range(max_iterations):
        # candidate label for dst = min over incoming neighbors' labels
        neighbor_min = (
            both.join(labels, both.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left_outer")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
        )
        # localCheckpoint truncates the growing lineage each round —
        # without it, iteration k re-executes all k-1 prior joins
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations — graph diameter exceeds the bound; raise max_iterations"
        )
    return labels
