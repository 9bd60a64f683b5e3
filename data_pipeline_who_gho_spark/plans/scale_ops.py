"""Registered hard-signal queries for the skew machinery
(operators/skew.py): salted two-phase aggregation and the salted join,
each pinned to the plain-plan answer by a DuckDB oracle.

Both run over ``events`` grouped by ``event_type`` — 5 values over the
whole corpus, i.e. each group holds ~n/5 of ALL rows. At 100 TB that IS
the pathological-key regime these operators exist for: a plain
``groupBy(event_type)`` with a non-algebraic aggregate (COUNT DISTINCT)
or an unsalted shuffle join on a hot key serializes a fifth of the
corpus through one reducer.

* ``skew_safe_event_rollup``: per-type event counts, value stats, and
  DISTINCT user counts. The algebraic aggregates go through
  ``salted_agg`` (phase 1 per (key, salt) — hot keys spread over 16
  reducers — phase 2 merges partials); the COUNT DISTINCT goes through
  the two-level decomposition (level 1 collapses (key, user) duplicates
  — the hot key spreads over its distinct users — level 2 is a plain
  partial-aggregatable count). Value mass is summed in FIXED POINT
  (Σ floor(value·10⁶) as BIGINT) so the salted re-ordering of the sum
  cannot drift a double across engines.

* ``salted_join_enrich``: every event joined to its user's activity
  profile via ``salted_join`` (big side salted, small side replicated
  ×8, join on keys+salt), rolled up per event type. The oracle is the
  PLAIN join + GROUP BY — salting must be invisible in the result.

The reference has no skew handling (single-process pandas,
etl/transform.py); this extends SURVEY §2c with the scale-out
machinery its semantics imply at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_agg, salted_join
from ..sources.catalog import load_table

_SALT = 16


def skew_safe_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: n_events, n_users (exact distinct), min/max value,
    and fixed-point value mass — every aggregate on a skew-safe plan."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    )
    micro = F.floor(F.col("value") * F.lit(1000000.0)).cast("long")
    algebraic = salted_agg(
        ev.withColumn("value_micro", micro),
        ["event_type"],
        {
            "n_events": ("sum", F.count(F.lit(1))),
            "min_value": ("min", F.min("value")),
            "max_value": ("max", F.max("value")),
            "value_micro_total": ("sum", F.sum("value_micro")),
        },
        salt_buckets=_SALT,
    )
    # two-level exact COUNT DISTINCT: level 1 distributes the hot key
    # across its distinct users; level 2's count partial-aggregates
    distinct_users = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return (
        algebraic.join(distinct_users, "event_type")
        .select(
            "event_type",
            "n_events",
            "n_users",
            "min_value",
            "max_value",
            "value_micro_total",
        )
        .orderBy("event_type")
    )


SKEW_ROLLUP_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
         AS value_micro_total
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def salted_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events enriched with their user's activity profile through the
    salted join, rolled up per type: row count and the summed partner
    profile (how much total activity the joining users carry)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    profile = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_events")
    )
    joined = salted_join(ev, profile, ["user_id"], salt_buckets=8)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("user_events").cast("long").alias("partner_events"),
        )
        .orderBy("event_type")
    )


SALTED_JOIN_SQL = """
WITH profile AS (
  SELECT user_id, COUNT(*) AS user_events FROM events GROUP BY user_id
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(p.user_events) AS BIGINT) AS partner_events
FROM events e JOIN profile p USING (user_id)
GROUP BY e.event_type
ORDER BY e.event_type
"""


SCALE_OPS_QUERIES = {
    "skew_safe_event_rollup": skew_safe_event_rollup,
    "salted_join_enrich": salted_join_enrich,
}

SCALE_OPS_ORACLE_SQL = {
    "skew_safe_event_rollup": SKEW_ROLLUP_SQL,
    "salted_join_enrich": SALTED_JOIN_SQL,
}
