from __future__ import annotations

from data_pipeline_who_gho_spark.operators.grouped import normalize_per_group


def test_normalize_per_group(spark):
    df = spark.createDataFrame(
        [("a", 0.0), ("a", 5.0), ("a", 10.0), ("b", 7.0), ("b", 7.0)],
        "k STRING, v DOUBLE",
    )
    out = normalize_per_group(df, "k", "v")
    rows = {(r["k"], r["v"]): r["normalized"] for r in out.collect()}
    assert rows[("a", 0.0)] == 0.0
    assert rows[("a", 5.0)] == 0.5
    assert rows[("a", 10.0)] == 1.0
    assert rows[("b", 7.0)] == 0.0  # constant group


def test_normalize_group_count_preserved(spark):
    df = spark.createDataFrame([("g", float(i)) for i in range(50)], "k STRING, v DOUBLE")
    assert normalize_per_group(df, "k", "v").count() == 50


def test_cogroup_coverage(spark):
    from data_pipeline_who_gho_spark.operators.grouped import cogroup_coverage

    left = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 9), ("c", 5)], "k STRING, v INT"
    )
    right = spark.createDataFrame(
        [("a", 2), ("a", 3), ("a", 4), ("b", 1)], "k STRING, w INT"
    )
    rows = {r["k"]: r for r in cogroup_coverage(left, right, "k", "v", "w").collect()}
    assert rows["a"]["n_left"] == 3 and rows["a"]["n_right"] == 3
    assert abs(rows["a"]["coverage"] - 2 / 3) < 1e-12
    assert rows["b"]["coverage"] == 0.0
    # key only on the left: right group arrives empty, not missing
    assert rows["c"]["n_right"] == 0 and rows["c"]["coverage"] == 0.0


def test_cogroup_right_only_key(spark):
    from data_pipeline_who_gho_spark.operators.grouped import cogroup_coverage

    left = spark.createDataFrame([("a", 1)], "k STRING, v INT")
    right = spark.createDataFrame([("a", 1), ("z", 2)], "k STRING, w INT")
    rows = {r["k"]: r for r in cogroup_coverage(left, right, "k", "v", "w").collect()}
    assert rows["z"]["n_left"] == 0 and rows["z"]["coverage"] == 0.0
