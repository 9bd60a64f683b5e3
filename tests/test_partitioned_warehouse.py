"""Partitioned warehouse layout: upsert with partition_by produces a
hive-partitioned table whose year-filtered scans prune partitions."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.operators.load import read_table, upsert


def test_partitioned_upsert_and_pruning(spark, tmp_path):
    wh = str(tmp_path)
    b1 = spark.createDataFrame(
        [("1", 2018, 1.0), ("2", 2019, 2.0), ("3", 2019, 3.0)],
        "id STRING, time_dim INT, v DOUBLE",
    )
    upsert(spark, b1, wh, "fact", ["id"], partition_by=["time_dim"])

    # hive layout on disk
    assert os.path.isdir(os.path.join(wh, "fact", "time_dim=2019"))

    # partition pruning in the plan
    df = read_table(spark, wh, "fact").filter(F.col("time_dim") == 2019)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(time_dim" in plan
    assert df.count() == 2

    # upsert across partitions stays correct + idempotent
    b2 = spark.createDataFrame([("2", 2020, 20.0)], "id STRING, time_dim INT, v DOUBLE")
    upsert(spark, b2, wh, "fact", ["id"], partition_by=["time_dim"])
    rows = {(r["id"], r["time_dim"], r["v"]) for r in read_table(spark, wh, "fact").collect()}
    assert rows == {("1", 2018, 1.0), ("2", 2020, 20.0), ("3", 2019, 3.0)}
