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


def _partition_bytes(table_dir: str, part: str) -> dict[str, bytes]:
    pdir = os.path.join(table_dir, part)
    out = {}
    for root, _dirs, files in os.walk(pdir):
        for f in files:
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, pdir)] = fh.read()
    return out


def test_upsert_rewrites_only_affected_partitions(spark, tmp_path):
    """An upsert hitting one year must leave every other partition's files
    byte-identical on disk (partition-scoped merge, not full rewrite)."""
    wh = str(tmp_path)
    b1 = spark.createDataFrame(
        [("1", 2018, 1.0), ("2", 2019, 2.0), ("3", 2019, 3.0), ("4", 2020, 4.0)],
        "id STRING, time_dim INT, v DOUBLE",
    )
    upsert(spark, b1, wh, "fact", ["id"], partition_by=["time_dim"])
    table = os.path.join(wh, "fact")
    before_2018 = _partition_bytes(table, "time_dim=2018")
    before_2020 = _partition_bytes(table, "time_dim=2020")
    assert before_2018 and before_2020

    b2 = spark.createDataFrame(
        [("2", 2019, 22.0), ("5", 2019, 5.0)], "id STRING, time_dim INT, v DOUBLE"
    )
    upsert(spark, b2, wh, "fact", ["id"], partition_by=["time_dim"])

    assert _partition_bytes(table, "time_dim=2018") == before_2018
    assert _partition_bytes(table, "time_dim=2020") == before_2020
    rows = {(r["id"], r["v"]) for r in read_table(spark, wh, "fact").collect()}
    assert rows == {("1", 1.0), ("2", 22.0), ("3", 3.0), ("4", 4.0), ("5", 5.0)}


def test_upsert_drops_emptied_partition_on_key_move(spark, tmp_path):
    """A key whose partition value changes must vanish from its old
    partition; if it was the last row there the directory is dropped."""
    wh = str(tmp_path)
    b1 = spark.createDataFrame(
        [("1", 2018, 1.0), ("2", 2019, 2.0)], "id STRING, time_dim INT, v DOUBLE"
    )
    upsert(spark, b1, wh, "fact", ["id"], partition_by=["time_dim"])
    b2 = spark.createDataFrame([("2", 2021, 20.0)], "id STRING, time_dim INT, v DOUBLE")
    upsert(spark, b2, wh, "fact", ["id"], partition_by=["time_dim"])

    table = os.path.join(wh, "fact")
    assert not os.path.exists(os.path.join(table, "time_dim=2019"))
    rows = {(r["id"], r["time_dim"], r["v"]) for r in read_table(spark, wh, "fact").collect()}
    assert rows == {("1", 2018, 1.0), ("2", 2021, 20.0)}
