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
