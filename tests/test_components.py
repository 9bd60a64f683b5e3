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
