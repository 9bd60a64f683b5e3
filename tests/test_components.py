from __future__ import annotations

from data_pipeline_who_gho_spark.operators.components import connected_components


def _cc(spark, vert_ids, edge_pairs):
    v = spark.createDataFrame([(i,) for i in vert_ids], "id BIGINT")
    e = spark.createDataFrame(edge_pairs, "src BIGINT, dst BIGINT") if edge_pairs else \
        spark.createDataFrame([], "src BIGINT, dst BIGINT")
    return {r["id"]: r["component"] for r in connected_components(v, e).collect()}


def test_two_components_and_isolate(spark):
    out = _cc(spark, [1, 2, 3, 4, 5, 9], [(1, 2), (2, 3), (4, 5)])
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 9: 9}


def test_chain_needs_iterations(spark):
    # a long path exercises multi-round propagation
    n = 12
    out = _cc(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)])
    assert set(out.values()) == {0} and len(out) == n


def test_no_edges(spark):
    out = _cc(spark, [7, 8], [])
    assert out == {7: 7, 8: 8}


def test_triangle_cosupply_matches_python_enumeration(spark):
    """Triangle count, wedge count, and clustering agree with a direct
    python enumeration of the same edge contract."""
    from itertools import combinations

    from data_pipeline_who_gho_spark.plans.extras import (
        _TRI_MIN_SHARED,
        triangle_cosupply,
    )
    from data_pipeline_who_gho_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    li = {
        (r["l_orderkey"], r["l_suppkey"])
        for r in load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .collect()
    }
    by_order: dict = {}
    for o, s in li:
        by_order.setdefault(o, set()).add(s)
    shared: dict = {}
    for supps in by_order.values():
        for a, b in combinations(sorted(supps), 2):
            shared[(a, b)] = shared.get((a, b), 0) + 1
    edges = {p for p, c in shared.items() if c >= _TRI_MIN_SHARED}
    nodes = {s for e in edges for s in e}
    deg: dict = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    n_wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tris = sum(
        1
        for a, b in edges
        for c in nodes
        if b < c and (b, c) in edges and (a, c) in edges
    )
    row = triangle_cosupply(spark, sf).collect()[0]
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tris
    assert row["n_wedges"] == n_wedges
    assert row["closed_permille"] == 3000 * tris // n_wedges


def test_triangle_hot_hub_stays_subquadratic(spark):
    """Adversarial hub regime (the shape that made id-orientation
    quadratic): vertex 0 — the LOWEST id, so id-orientation would give
    it every out-edge — is connected to every spoke, spokes form a
    chain. Degree orientation must (a) count the n-1 hub triangles
    exactly and (b) keep max out-degree within the sqrt(2m) degeneracy
    bound, so wedge candidates stay O(m^1.5) instead of C(n_hub, 2)."""
    import math

    from pyspark.sql import functions as F

    from data_pipeline_who_gho_spark.plans.extras import (
        degree_oriented_edges,
        triangle_stats,
    )

    n = 2000
    hub = [(0, i) for i in range(1, n + 1)]
    chain = [(i, i + 1) for i in range(1, n)]
    e = spark.createDataFrame(hub + chain, "s1 long, s2 long")
    row = triangle_stats(e).collect()[0]
    m = len(hub) + len(chain)
    assert row["n_edges"] == m
    assert row["n_triangles"] == n - 1
    # the hub dominates the undirected wedge count…
    assert row["n_wedges"] >= n * (n - 1) // 2
    # …but the oriented wedge-candidate volume stays near-linear
    out = (
        degree_oriented_edges(e)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .agg(
            F.max("outdeg").alias("max_out"),
            F.sum(F.col("outdeg") * (F.col("outdeg") - 1) / 2)
            .cast("long")
            .alias("candidates"),
        )
        .collect()[0]
    )
    assert out["max_out"] <= math.isqrt(2 * m)
    assert out["candidates"] <= 4 * m  # vs C(2000, 2) ≈ 2.0M id-oriented
