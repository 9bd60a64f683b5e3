"""Bucketed-warehouse co-location: tables bucketed on the join key join
WITHOUT any shuffle exchange — the at-rest layout strategy for the
recurring big-big joins (fact⋈fact on orderkey) at 100 TB, where a
per-query shuffle of the large side is the dominant cost.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture()
def bucketed(spark, tmp_path):
    names = ["bt_lineitem", "bt_orders"]
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    (
        li.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "bt_lineitem"))
        .mode("overwrite")
        .saveAsTable("bt_lineitem")
    )
    (
        orders.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "bt_orders"))
        .mode("overwrite")
        .saveAsTable("bt_orders")
    )
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bt_lineitem").join(
            spark.table("bt_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located: the bucketed scans satisfy the join's distribution —
        # no Exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
        # results still correct
        n = j.count()
        li = spark.table("bt_lineitem").count()
        assert n == li  # every line has exactly one order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_pruning_on_key_filter(spark, bucketed):
    """Point lookups on the bucket key read only 1/N buckets. (Spark
    auto-disables bucketed scans for queries that don't need the
    distribution, so pin the scan on to observe pruning.)"""
    key = spark.table("bt_orders").agg(F.min("o_orderkey")).collect()[0][0]
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = spark.table("bt_orders").filter(F.col("o_orderkey") == key)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan
        assert q.count() >= 1
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_registered_bucketed_query_is_exchange_free_and_correct(spark):
    """The REGISTERED query (plans/scale_ops.bucketed_colocated_join)
    must run its join without any hash-partitioning exchange — the
    bucketed scans satisfy the SMJ's distribution — and must agree with
    the plain (unbucketed) join+agg."""
    from data_pipeline_who_gho_spark.plans.scale_ops import (
        bucketed_colocated_join,
    )

    df = bucketed_colocated_join(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # the join inputs must be exchange-free: everything BELOW the SMJ
    # reads bucketed scans directly (the agg above it may exchange its
    # 5 groups)
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange hashpartitioning" not in join_part

    got = {r["o_orderpriority"]: (r["n_lines"], round(r["revenue"], 2))
           for r in df.collect()}
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    plain = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,4)")
                   - F.col("l_discount").cast("decimal(18,4)"))
            ).cast("double").alias("revenue"),
        )
    )
    want = {r["o_orderpriority"]: (r["n_lines"], round(r["revenue"], 2))
            for r in plain.collect()}
    assert got == want
