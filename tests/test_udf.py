from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.functions.udf import (
    make_affine_udf,
    make_ngram_udtf,
    make_weighted_mean_udaf,
    make_winsorize_udf,
)


def test_weighted_mean_udaf(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0)],
        "k STRING, v DOUBLE, w DOUBLE",
    )
    wm = make_weighted_mean_udaf()
    out = {r["k"]: r["wmean"] for r in df.groupBy("k").agg(wm("v", "w").alias("wmean")).collect()}
    assert out["a"] == (10 * 1 + 20 * 3) / 4.0
    assert out["b"] == 5.0


def test_ngram_udtf(spark):
    Bigrams = make_ngram_udtf()
    spark.udtf.register("bigrams", Bigrams)
    rows = spark.sql("SELECT * FROM bigrams('spark')").collect()
    assert [(r["pos"], r["bigram"]) for r in rows] == [
        (0, "sp"), (1, "pa"), (2, "ar"), (3, "rk"),
    ]


def test_affine_udf(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x DOUBLE")
    f = make_affine_udf(2.0, 1.0)
    out = [r["y"] for r in df.select(f("x").alias("y")).orderBy("y").collect()]
    assert out == [3.0, 5.0, 7.0]


def test_winsorized_clips(spark):
    vals = [(float(i),) for i in range(100)] + [(1e9,)]
    df = spark.createDataFrame(vals, "x DOUBLE").coalesce(1)
    w = make_winsorize_udf()
    clipped = df.select(w("x").alias("y")).agg(F.max("y")).first()[0]
    assert clipped < 1e9  # outlier clipped to batch p99
