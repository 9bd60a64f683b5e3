"""Sessionization gap semantics: the 30-min inactivity test must compare
fractional timestamps.  All driver fixture timestamps carry sub-second
parts, so a seconds-truncating cast would flip any session whose gap
straddles 1800s within a fraction (VERDICT r01 item 3)."""

from __future__ import annotations

from datetime import datetime, timedelta

from data_pipeline_who_gho_spark.plans.analytics import sessionize_events


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_fractional_gap_splits_session(spark, tmp_path):
    t0 = datetime(2024, 1, 1, 12, 0, 0, 250_000)
    rows = [
        (1, 7, t0),
        # 1800.5s later: gap > 1800 even though whole-second diff is 1800
        (2, 7, t0 + timedelta(seconds=1800, microseconds=500_000)),
        # 1799.5s after that: same session despite whole-second diff of 1800
        (3, 7, t0 + timedelta(seconds=3600, microseconds=0)),
    ]
    _write_events(spark, tmp_path, rows)
    out = sessionize_events(spark, str(tmp_path)).collect()
    sessions = {r["session_id"]: r["n_events"] for r in out}
    assert sessions == {0: 1, 1: 2}


def test_exact_1800s_gap_stays_in_session(spark, tmp_path):
    t0 = datetime(2024, 1, 1, 12, 0, 0, 123_456)
    rows = [(1, 9, t0), (2, 9, t0 + timedelta(seconds=1800))]
    _write_events(spark, tmp_path, rows)
    out = sessionize_events(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2
