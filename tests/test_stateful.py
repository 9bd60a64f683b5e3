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
