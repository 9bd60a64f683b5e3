from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.operators.skew import salted_agg


def test_salted_agg_matches_plain(spark):
    # heavily skewed: 90% of rows share one key
    rows = [("hot", float(i)) for i in range(900)] + [
        (f"k{i % 10}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    salted = salted_agg(
        df,
        ["k"],
        {
            "total": ("sum", F.sum(F.col("v").cast("decimal(18,2)"))),
            "n": ("sum", F.count(F.lit(1))),
            "vmax": ("max", F.max("v")),
        },
        salt_buckets=8,
    )
    plain = df.groupBy("k").agg(
        F.sum(F.col("v").cast("decimal(18,2)")).alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.max("v").alias("vmax"),
    )
    s = {r["k"]: (r["total"], r["n"], r["vmax"]) for r in salted.collect()}
    p = {r["k"]: (r["total"], r["n"], r["vmax"]) for r in plain.collect()}
    assert s == p


def test_salted_agg_spreads_hot_key(spark):
    df = spark.createDataFrame([("hot", 1.0)] * 500, "k STRING, v DOUBLE")
    out = salted_agg(df, ["k"], {"n": ("sum", F.count(F.lit(1)))}, salt_buckets=4)
    assert out.collect() == [("hot", 500)] or out.first()["n"] == 500


def test_salted_join_matches_plain_join(spark):
    from data_pipeline_who_gho_spark.operators.skew import salted_join

    # skewed: 90% of left rows share one key
    left = spark.range(0, 2000).selectExpr(
        "id", "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('k', id % 7) END AS k"
    )
    right = spark.createDataFrame(
        [("hot", 1.5), ("k1", 2.0), ("k3", 3.0), ("absent", 9.9)], "k STRING, w DOUBLE"
    )
    for how in ("inner", "left"):
        want = {(r["id"], r["w"]) for r in left.join(right, "k", how).collect()}
        got = {
            (r["id"], r["w"])
            for r in salted_join(left, right, ["k"], how=how, salt_buckets=8).collect()
        }
        assert got == want, how


def test_salted_join_rejects_right_outer(spark):
    import pytest as _pytest

    from data_pipeline_who_gho_spark.operators.skew import salted_join

    left = spark.range(5).selectExpr("id", "'a' AS k")
    right = spark.createDataFrame([("a", 1.0)], "k STRING, w DOUBLE")
    with _pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="right")


def test_salted_join_spreads_hot_key(spark):
    """The physical join keys include the salt, so a hot key hashes to
    many reducers instead of one."""
    from data_pipeline_who_gho_spark.operators.skew import salted_join

    left = spark.range(0, 1000).selectExpr("id", "'hot' AS k")
    right = spark.createDataFrame([("hot", 1.0)], "k STRING, w DOUBLE")
    plan = salted_join(left, right, ["k"], salt_buckets=8)._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in plan
