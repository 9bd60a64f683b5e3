from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.functions.udf import make_affine_udf, make_winsorize_udf


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
