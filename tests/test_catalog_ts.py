"""Fixture timestamp normalization: NTZ reinterpretation must be
session-timezone-independent."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.sources.catalog import load_table, ntz_as_utc

SF = "/root/testdata/sf0.001"


def test_ntz_as_utc_ignores_session_zone(spark):
    """The fallback must yield epoch-micros equal to the stored naive
    value read as UTC, under ANY session timezone (to_utc_timestamp(x,
    'UTC') got this wrong by the session offset)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    expected = int(
        datetime.datetime(
            2024, 3, 1, 12, 0, 0, tzinfo=datetime.timezone.utc
        ).timestamp()
        * 1_000_000
    )
    try:
        for tz in ["UTC", "America/New_York", "Asia/Tokyo"]:
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = spark.sql("SELECT TIMESTAMP_NTZ '2024-03-01 12:00:00' AS ts")
            got = df.select(F.unix_micros(ntz_as_utc(F.col("ts")))).collect()[0][0]
            assert got == expected, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_events_ts_epoch_matches_duckdb(spark):
    """End-to-end: load_table's ts normalization equals DuckDB's epoch_us
    on the same parquet (the oracle-parity contract)."""
    import duckdb

    got = {
        r["event_id"]: r["us"]
        for r in load_table(spark, SF, "events")
        .select("event_id", F.unix_micros("ts").alias("us"))
        .limit(50)
        .collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT event_id, epoch_us(ts) FROM '{SF}/events.parquet' "
            f"WHERE event_id IN ({','.join(map(str, got))})"
        ).fetchall()
    )
    assert got == want
