"""Structured Streaming paths driven with the file source + availableNow
trigger into a memory sink (no external broker needed)."""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.streaming import (
    stream_event_counts,
    stream_session_windows,
    stream_validated_split,
)


@pytest.fixture()
def event_stream(spark, tmp_path):
    src = str(tmp_path / "events_src")
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
        (2, "2024-01-01 10:10:00", 1, "click", 2.0),
        (3, "2024-01-01 11:05:00", 2, "view", 3.0),
        (4, "2024-01-01 11:20:00", 2, "view", -1.0),
        (5, "2024-01-01 12:30:00", 1, "click", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(src)
    return (
        spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
        ).parquet(src)
    )


def _run_to_memory(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if sdf.isStreaming and name == "split" else "complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/ckpt-{name}-{uuid.uuid4().hex[:8]}")
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_event_counts(spark, event_stream):
    out = stream_event_counts(event_stream, window="1 hour")
    _run_to_memory(out, "counts")
    rows = {(r["window_start"].hour, r["event_type"]): r["n_events"]
            for r in spark.sql("SELECT * FROM counts").collect()}
    assert rows[(10, "click")] == 2
    assert rows[(11, "view")] == 2
    assert rows[(12, "click")] == 1


def test_stream_session_windows(spark, event_stream):
    out = stream_session_windows(event_stream, gap="30 minutes")
    _run_to_memory(out, "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["n_events"])
    # user 1: events at 10:00+10:10 (one session), 12:30 (another)
    assert sorted(by_user[1]) == [1, 2]
    # user 2: 11:05+11:20 within one 30-min gap session
    assert by_user[2] == [2]


def test_stream_validated_split(spark, event_stream):
    out = stream_validated_split(event_stream)
    q = (
        out.writeStream.format("memory").queryName("split")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/ckpt-split-{uuid.uuid4().hex[:8]}")
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM split").collect()
    bad = [r for r in rows if not r["is_valid"]]
    assert len(rows) == 5 and len(bad) == 1
    assert bad[0]["event_id"] == 4 and "value" in bad[0]["error_details"]


def test_stream_restart_resumes_from_checkpoint_exactly_once(spark, tmp_path):
    """The recovery guarantee the 100 TB posture rests on: a file-source
    stream stopped and restarted against the SAME checkpoint processes
    only files it has not yet committed — no loss, no duplicates in the
    sink across the restart."""
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = "id LONG, user_id LONG"

    def land(lo, hi):
        spark.range(lo, hi).selectExpr("id", "id % 5 AS user_id") \
            .coalesce(1).write.mode("append").parquet(src)

    def drain():
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not drain in time"

    land(0, 100)
    drain()          # run 1 commits the first batch of files
    land(100, 150)
    drain()          # run 2 must pick up ONLY the new files

    got = spark.read.parquet(out)
    assert got.count() == 150                      # no loss, no dupes
    assert got.select("id").distinct().count() == 150


def test_foreachbatch_upsert_idempotent_merge(spark):
    """After multi-batch MERGE apply AND a full fresh-checkpoint replay,
    the warehouse table holds each event exactly once (n_events==n_ids
    per type) and matches the batch distinct rollup."""
    from data_pipeline_who_gho_spark.plans.streaming_queries import (
        stream_upsert_foreachbatch,
    )
    from data_pipeline_who_gho_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = stream_upsert_foreachbatch(spark, sf).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_events"] == r["n_ids"]
    want = {
        (r["event_type"], r["n"])
        for r in load_table(spark, sf, "events")
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {(r["event_type"], r["n_events"]) for r in rows}
    assert got == want


def test_run_to_df_bounds_state_partitions_and_restores_conf(spark):
    """r13/r14 optimization guard: stateful queries run with the bounded
    state-partition count (store commits are per-partition fixed cost;
    OPTIMIZATION_r13.md) while the session conf is restored for batch
    work, and the result is partition-count-independent."""
    from data_pipeline_who_gho_spark.plans.streaming_queries import (
        stream_dedup_events,
    )

    sf = "/root/testdata/sf0.001"
    before = spark.conf.get("spark.sql.shuffle.partitions")
    nodata_before = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", None
    )
    out = stream_dedup_events(spark, sf)
    # confs restored for subsequent batch planning
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert (
        spark.conf.get(
            "spark.sql.streaming.noDataMicroBatches.enabled", None
        )
        == nodata_before
    )
    # the memory-sink table holds the exact distinct set regardless of
    # how many state partitions the dedup ran with
    n = out.count()
    assert n == out.select("event_id").distinct().count()


def test_derived_state_partitions_scale_adaptive():
    """r14: the state-partition bound is volume-adaptive — the local
    floor at tiny input, rising with staged bytes, never above the
    session setting, env override wins."""
    import data_pipeline_who_gho_spark.plans.streaming_queries as SQ

    d = SQ._derived_state_partitions
    assert d(200, 3 << 20) == SQ._STATE_PARTITIONS_LOCAL  # tiny input
    assert d(200, 100 << 30) == 200          # huge input -> session cap
    assert d(200, 640 << 20) == 20           # 640 MB -> 20 partitions
    assert d(4, 640 << 20) == 4              # never above session
    assert d(200, None, compute_floor=8) == 8
    assert d(200, 3 << 20, compute_floor=32) == 32  # python floor wins
    old = SQ._STATE_PARTITIONS_ENV
    try:
        SQ._STATE_PARTITIONS_ENV = "16"
        assert d(200, 3 << 20) == 16         # env override
        assert d(8, 3 << 20) == 8            # env still session-capped
    finally:
        SQ._STATE_PARTITIONS_ENV = old
