"""k-means (2 Lloyd iterations) invariants: seed self-assignment,
cluster-id range, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.plans.vector_analytics import (
    KMEANS_K,
    kmeans_assign,
)

SF = "/root/testdata/sf0.001"


def test_kmeans_invariants(spark):
    df = kmeans_assign(spark, SF)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r["cluster_iter1"] < KMEANS_K
        assert 0 <= r["cluster_iter2"] < KMEANS_K
    # a seed vector is distance 0 from itself -> assigned to its own
    # cluster in iteration 1
    seeds = {r["vec_id"]: r["cluster_iter1"] for r in rows if r["vec_id"] < KMEANS_K}
    assert seeds == {i: i for i in range(KMEANS_K)}


def test_kmeans_iteration_moves_some_points(spark):
    """Lloyd updates the centroids, so at least one point should change
    cluster between iterations on non-degenerate data (and the second
    assignment must still use every cluster that kept members)."""
    df = kmeans_assign(spark, SF)
    moved = df.filter(F.col("cluster_iter1") != F.col("cluster_iter2")).count()
    assert moved > 0


def test_kmeans_deterministic(spark):
    a = {tuple(r) for r in kmeans_assign(spark, SF).collect()}
    b = {tuple(r) for r in kmeans_assign(spark, SF).collect()}
    assert a == b


def test_cluster_prototypes_are_nearest_members(spark):
    from data_pipeline_who_gho_spark.plans.vector_analytics import (
        _PROTO_TOPK,
        cluster_prototypes,
    )

    protos = cluster_prototypes(spark, SF).collect()
    assert protos
    by_cluster: dict[int, list] = {}
    for r in protos:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assigned = {r["vec_id"]: r["cluster_iter2"] for r in kmeans_assign(spark, SF).collect()}
    for cluster, rows in by_cluster.items():
        assert len(rows) <= _PROTO_TOPK
        assert [r["proto_rank"] for r in sorted(rows, key=lambda r: r["proto_rank"])] \
            == list(range(1, len(rows) + 1))
        # ranks are ordered by distance
        srt = sorted(rows, key=lambda r: r["proto_rank"])
        assert all(a["d2_centroid"] <= b["d2_centroid"] for a, b in zip(srt, srt[1:]))
        # each prototype belongs to the cluster it represents
        for r in rows:
            assert assigned[r["vec_id"]] == cluster


def test_cluster_prototypes_plan_uses_window_group_limit(spark):
    from data_pipeline_who_gho_spark.plans.vector_analytics import cluster_prototypes

    plan = (
        cluster_prototypes(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan  # top-k never materializes full clusters
