"""Approximate sketches: HLL distinct counts and approx quantiles within
tolerance of exact answers (no oracle possible — engines' sketches
differ; the contract is the error bound)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_tolerance(spark):
    orders = load_table(spark, SF, "orders")
    exact = orders.select(F.countDistinct("o_custkey")).first()[0]
    approx = orders.select(F.approx_count_distinct("o_custkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05


def test_approx_quantile_within_tolerance(spark):
    li = load_table(spark, SF, "lineitem")
    [p50] = li.approxQuantile("l_extendedprice", [0.5], 0.01)
    n = li.count()
    below = li.filter(F.col("l_extendedprice") <= p50).count()
    assert 0.45 < below / n < 0.55
