"""Write-side SCD2 merge: close-and-insert versioning semantics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.operators.scd2 import HIGH_DATE, scd2_merge

SCHEMA_T = "k STRING, seg STRING, valid_from TIMESTAMP, valid_to TIMESTAMP, is_current BOOLEAN"
SCHEMA_C = "k STRING, seg STRING, effective_ts TIMESTAMP"

T0 = datetime(2020, 1, 1)
T1 = datetime(2021, 6, 1)
HIGH = datetime.fromisoformat(HIGH_DATE.replace(" ", "T"))


def snap(df):
    return sorted(
        (
            (r["k"], r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in df.collect()
        ),
        key=lambda t: (t[0], t[1] is not None, t[1] or "", t[2]),
    )


def test_bootstrap_from_empty(spark):
    ch = spark.createDataFrame([("a", "GOLD", T0)], SCHEMA_C)
    out = scd2_merge(None, ch, ["k"], ["seg"])
    assert snap(out) == [("a", "GOLD", T0, HIGH, True)]


def test_change_closes_and_opens(spark):
    target = spark.createDataFrame([("a", "GOLD", T0, HIGH, True)], SCHEMA_T)
    ch = spark.createDataFrame([("a", "SILVER", T1)], SCHEMA_C)
    out = scd2_merge(target, ch, ["k"], ["seg"])
    assert snap(out) == [
        ("a", "GOLD", T0, T1, False),      # closed at effective time
        ("a", "SILVER", T1, HIGH, True),   # new open version
    ]


def test_unchanged_and_new_key(spark):
    target = spark.createDataFrame([("a", "GOLD", T0, HIGH, True)], SCHEMA_T)
    ch = spark.createDataFrame([("a", "GOLD", T1), ("b", "BRONZE", T1)], SCHEMA_C)
    out = scd2_merge(target, ch, ["k"], ["seg"])
    # identical attrs -> NO new version for a; b inserted fresh
    assert snap(out) == [
        ("a", "GOLD", T0, HIGH, True),
        ("b", "BRONZE", T1, HIGH, True),
    ]


def test_replay_idempotent(spark):
    target = spark.createDataFrame([("a", "GOLD", T0, HIGH, True)], SCHEMA_T)
    ch = spark.createDataFrame([("a", "SILVER", T1)], SCHEMA_C)
    once = scd2_merge(target, ch, ["k"], ["seg"])
    twice = scd2_merge(once, ch, ["k"], ["seg"])
    assert snap(once) == snap(twice)


def test_null_transitions_version(spark):
    # NULL -> value and value -> NULL must both count as changes
    target = spark.createDataFrame(
        [("a", None, T0, HIGH, True), ("b", "GOLD", T0, HIGH, True)], SCHEMA_T
    )
    ch = spark.createDataFrame([("a", "GOLD", T1), ("b", None, T1)], SCHEMA_C)
    out = scd2_merge(target, ch, ["k"], ["seg"])
    assert snap(out) == [
        ("a", None, T0, T1, False),
        ("a", "GOLD", T1, HIGH, True),
        ("b", None, T1, HIGH, True),
        ("b", "GOLD", T0, T1, False),
    ]


def test_history_rows_untouched(spark):
    target = spark.createDataFrame(
        [("a", "BRONZE", datetime(2019, 1, 1), T0, False),
         ("a", "GOLD", T0, HIGH, True)],
        SCHEMA_T,
    )
    ch = spark.createDataFrame([("a", "SILVER", T1)], SCHEMA_C)
    out = scd2_merge(target, ch, ["k"], ["seg"])
    assert snap(out) == [
        ("a", "BRONZE", datetime(2019, 1, 1), T0, False),
        ("a", "GOLD", T0, T1, False),
        ("a", "SILVER", T1, HIGH, True),
    ]


def test_late_arriving_change_ignored(spark):
    """A change older than the current version must NOT close it (that
    would set valid_to < valid_from and open an overlapping version)."""
    target = spark.createDataFrame([("a", "SILVER", T1, HIGH, True)], SCHEMA_T)
    stale = spark.createDataFrame([("a", "GOLD", T0)], SCHEMA_C)  # T0 < T1
    out = scd2_merge(target, stale, ["k"], ["seg"])
    assert snap(out) == [("a", "SILVER", T1, HIGH, True)]  # untouched


def test_same_timestamp_correction_updates_in_place(spark):
    """effective_ts == open version's valid_from with different attrs is a
    correction: the open version's attributes are rewritten, no new
    version opens (a zero-width interval would corrupt as-of lookups)."""
    target = spark.createDataFrame([("a", "SILVER", T1, HIGH, True)], SCHEMA_T)
    fix = spark.createDataFrame([("a", "GOLD", T1)], SCHEMA_C)
    out = scd2_merge(target, fix, ["k"], ["seg"])
    assert snap(out) == [("a", "GOLD", T1, HIGH, True)]
    # replaying the correction is a no-op
    again = scd2_merge(out, fix, ["k"], ["seg"])
    assert snap(again) == [("a", "GOLD", T1, HIGH, True)]
