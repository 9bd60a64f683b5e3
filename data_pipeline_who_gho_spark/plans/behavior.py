"""Behavioral analytics over the events stream: funnel conversion and
cohort retention — the query shapes BI layers (the reference's Superset,
README.md:197-213) ask of an events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered two-step funnel: users whose first 'signup' precedes a
    later 'purchase'. Conversion delay averaged from exact epoch-second
    integers (BIGINT sums → identical division in both engines).

    Plan: two filtered min-aggregates over one scan shape, joined on
    user — no window needed, shuffles only user-grain rows.
    """
    ev = load_table(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchase = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    converted = (
        signup.join(purchase, "user_id")
        .filter(F.col("purchase_ts") >= F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("purchase_ts").alias("first_purchase_ts"))
    )
    # µs-exact integer delays (seconds-truncation or fractional-epoch
    # doubles would diverge between engines)
    stats = converted.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.sum(
            F.unix_micros("first_purchase_ts") - F.unix_micros("signup_ts")
        ).alias("total_delay_us"),
    )
    totals = signup.agg(F.count(F.lit(1)).alias("n_signup_users"))
    return totals.crossJoin(stats).select(
        "n_signup_users",
        "n_converted",
        (
            F.col("total_delay_us").cast("double")
            / F.col("n_converted").cast("double")
            / F.lit(1e6)
        ).alias("avg_delay_s"),
    )


FUNNEL_SQL = """
WITH signup AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events WHERE event_type = 'signup' GROUP BY user_id
),
converted AS (
  SELECT s.user_id, s.signup_ts, MIN(e.ts) AS first_purchase_ts
  FROM signup s JOIN events e ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
  GROUP BY s.user_id, s.signup_ts
)
SELECT (SELECT COUNT(*) FROM signup) AS n_signup_users,
       COUNT(*) AS n_converted,
       CAST(SUM(epoch_us(first_purchase_ts) - epoch_us(signup_ts)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) / 1e6 AS avg_delay_s
FROM converted
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    distinct active users per (cohort_day, activity_day)."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = ev.select("user_id", F.date_trunc("day", F.col("ts")).alias("activity_day"))
    return (
        activity.join(first, "user_id")
        .groupBy("cohort_day", "activity_day")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


COHORT_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT cohort_day, CAST(date_trunc('day', ts) AS TIMESTAMP) AS activity_day,
       COUNT(DISTINCT e.user_id) AS n_active_users
FROM events e JOIN first f ON e.user_id = f.user_id
GROUP BY cohort_day, CAST(date_trunc('day', ts) AS TIMESTAMP)
"""


BEHAVIOR_QUERIES = {
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
}

BEHAVIOR_ORACLE_SQL = {
    "funnel_conversion": FUNNEL_SQL,
    "cohort_retention": COHORT_SQL,
}
