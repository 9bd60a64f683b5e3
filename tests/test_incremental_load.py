"""Streaming incremental load: foreachBatch + idempotent upsert — the
Structured-Streaming form of the reference's checkpoint/incremental
aspiration (S4/ST1 → readStream + MERGE per micro-batch)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.operators.load import read_table, upsert


def _run_stream_upsert(spark, src, wh):
    stream = spark.readStream.schema("k STRING, v INT").parquet(src)

    def sink(batch_df, batch_id):
        # dedup within the micro-batch (upsert contract), then MERGE
        batch = batch_df.dropDuplicates(["k"])
        upsert(spark, batch, wh, "t", ["k"])

    # stable checkpoint: successive runs process only NEW source files —
    # the streaming form of the reference's checkpoint-resume
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{wh}/ckpt")
        .start()
    )
    q.awaitTermination(120)


def test_stream_upsert_idempotent(spark, tmp_path):
    src, wh = str(tmp_path / "src"), str(tmp_path / "wh")
    spark.createDataFrame([("a", 1), ("b", 2)], "k STRING, v INT").write.parquet(src)

    _run_stream_upsert(spark, src, wh)
    t1 = sorted((r["k"], r["v"]) for r in read_table(spark, wh, "t").collect())
    assert t1 == [("a", 1), ("b", 2)]

    # second batch arrives: update b, insert c
    spark.createDataFrame([("b", 20), ("c", 30)], "k STRING, v INT").write.mode(
        "append"
    ).parquet(src)
    _run_stream_upsert(spark, src, wh)
    t2 = sorted((r["k"], r["v"]) for r in read_table(spark, wh, "t").collect())
    assert t2 == [("a", 1), ("b", 20), ("c", 30)]
