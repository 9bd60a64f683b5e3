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
