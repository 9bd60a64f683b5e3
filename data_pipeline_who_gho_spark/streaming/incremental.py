"""Structured Streaming path (optional per SURVEY §2c — the reference is
strictly batch, but its checkpoint/incremental aspirations (S4/ST1) map
naturally onto streams, and the engine exposes them as first-class).

All builders take a *streaming* DataFrame (``spark.readStream...``) and
return a transformed streaming DataFrame; sinks/triggers are the
caller's. Tests drive them with the file source + ``availableNow`` into a
memory sink — the same plans run against Kafka/rate sources unchanged.

Scale notes: watermark + windowed aggregation is incremental state in the
state store (RocksDB on a real cluster); state size is bounded by the
watermark horizon, not input volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_event_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window event counts with late-data handling: rows later
    than the watermark are dropped from state (bounded-state guarantee)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_hopping_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Hopping (sliding) window counts: each event lands in
    window/slide overlapping windows; state is bounded by the watermark
    exactly as in the tumbling case — the overlap multiplies state rows,
    not retention."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def stream_session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Native session windows (gap-based) — the streaming twin of the
    batch ``sessionize_events`` query (plans/analytics.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_validated_split(events: DataFrame) -> DataFrame:
    """Streaming validate/reject split (V2 on a stream): tags rows instead
    of forking (a stream can't fan out server-side without two sinks; the
    tag keeps it one bounded-state-free map)."""
    ok = F.col("user_id").isNotNull() & F.col("value").isNotNull() & (F.col("value") >= 0)
    return events.withColumn("is_valid", ok).withColumn(
        "error_details",
        F.when(~ok, F.lit("user_id/value required and value >= 0")),
    )
