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

    Contract: every edge endpoint must appear in ``vertices`` (all
    callers derive vertices from the edge list; isolates are fine).

    Raises RuntimeError if the fixpoint isn't reached within
    ``max_iterations`` (graph diameter too large) — loud beats silently
    wrong cluster labels.  The sum-based convergence probe needs two
    completed rounds to compare, so ``max_iterations`` must be >= 2
    even for graphs already at fixpoint after round 1 (ADVICE r13;
    every caller uses the default)."""
    converged = False
    both = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    # OPTIMIZATION r13 (same output every iteration, fewer exchanges):
    # min(self-label ∪ neighbor labels) via union + ONE groupBy replaces
    # join → groupBy → left-outer join → least (two joins and an extra
    # exchange per round).  Iteration 1 skips the label join entirely —
    # joining the identity labeling is the identity, so the neighbor
    # candidate for dst is just src.
    #
    # Convergence probe: per-vertex labels are NON-INCREASING, so
    # "no vertex changed" ⟺ "Σ component unchanged" — an exact-decimal
    # scan-agg on the freshly checkpointed labels, replacing the
    # previous new-vs-old join+limit+count (a whole extra join job per
    # iteration).  The first compare happens after round 2, matching
    # the old semantics (round 1 always propagates; on an edgeless
    # graph this costs one extra trivial round before the fixpoint
    # reads equal).
    labels: DataFrame | None = None
    prev_sum = None

    for _ in range(max_iterations):
        if labels is None:
            cand = both.select(
                F.col("dst").alias("id"), F.col("src").alias("component")
            ).unionByName(
                vertices.select(F.col("id"), F.col("id").alias("component"))
            )
        else:
            cand = (
                both.join(labels, both.src == labels.id)
                .select(F.col("dst").alias("id"), "component")
                .unionByName(labels)
            )
        new_labels = cand.groupBy("id").agg(F.min("component").alias("component"))
        # localCheckpoint truncates the growing lineage each round —
        # without it, iteration k re-executes all k-1 prior joins
        new_labels = new_labels.localCheckpoint(eager=True)
        cur_sum = new_labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0][0]
        labels = new_labels
        if prev_sum is not None and cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations — graph diameter exceeds the bound; raise max_iterations"
        )
    return labels
