"""Behavioral analytics over the events stream: funnel conversion and
cohort retention — the query shapes BI layers (the reference's Superset,
README.md:197-213) ask of an events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered two-step funnel: users whose first 'signup' has a purchase
    at or after it (>= — a same-instant purchase converts with delay 0).
    Conversion delay averaged from µs-exact integers (BIGINT sums →
    identical division in both engines).

    Plan: signup aggregate LEFT-joined to purchases, one final aggregate —
    the signup subtree is referenced once, so events is scanned twice
    (signup filter + purchase filter), with user-grain shuffles only.
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
    per_user = (
        signup.join(
            purchase.withColumnRenamed("user_id", "__p_user"),
            (F.col("user_id") == F.col("__p_user"))
            & (F.col("purchase_ts") >= F.col("signup_ts")),
            "left",
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("purchase_ts").alias("first_purchase_ts"))
    )
    # µs-exact integer delays (seconds-truncation or fractional-epoch
    # doubles would diverge between engines); sum skips null (unconverted)
    return per_user.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.count("first_purchase_ts").alias("n_converted"),
        (
            F.sum(F.unix_micros("first_purchase_ts") - F.unix_micros("signup_ts"))
            .cast("double")
            / F.count("first_purchase_ts").cast("double")
            / F.lit(1e6)
        ).alias("avg_delay_s"),
    )


FUNNEL_SQL = """
WITH signup AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events WHERE event_type = 'signup' GROUP BY user_id
),
per_user AS (
  SELECT s.user_id, s.signup_ts, MIN(e.ts) AS first_purchase_ts
  FROM signup s LEFT JOIN events e
    ON s.user_id = e.user_id AND e.event_type = 'purchase' AND e.ts >= s.signup_ts
  GROUP BY s.user_id, s.signup_ts
)
SELECT COUNT(*) AS n_signup_users,
       COUNT(first_purchase_ts) AS n_converted,
       CAST(SUM(epoch_us(first_purchase_ts) - epoch_us(signup_ts)) AS DOUBLE)
         / CAST(COUNT(first_purchase_ts) AS DOUBLE) / 1e6 AS avg_delay_s
FROM per_user
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


DECAY_LAMBDA = 0.05  # per-hour decay rate
_DECAY_SCALE = 1_000_000.0


def trending_users_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed activity score — the trending
    ranker: score = Σ_events e^(−λ·age_hours), with age measured from the
    corpus max timestamp (deterministic, no wall clock).

    Float discipline: events are bucketed to integer hour ages, the decay
    weight is fixed-pointed to integer micro-units ONCE PER AGE BUCKET
    (≤ ~750 buckets for the month-long fixture), and per-user scores are
    exact integer sums — no order-dependent float aggregation. Plan: one
    1-row broadcast scalar (max ts), two partial-agg'd shuffles keyed
    (user, age) then (user).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    mx = ev.agg(F.max("ts").alias("mx"))
    aged = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.floor(
            (F.unix_micros("mx") - F.unix_micros("ts")) / F.lit(3_600_000_000.0)
        ).alias("age_h"),
    )
    cnt = aged.groupBy("user_id", "age_h").agg(F.count(F.lit(1)).alias("c"))
    w = F.round(
        F.exp(F.lit(-DECAY_LAMBDA) * F.col("age_h").cast("double")) * F.lit(_DECAY_SCALE)
    ).cast("long")
    return cnt.groupBy("user_id").agg(
        F.sum(F.col("c") * w).alias("decayed_micro"),
        F.sum("c").alias("n_events"),
    )


TRENDING_DECAYED_SQL = f"""
WITH mx AS (SELECT MAX(ts) AS mx FROM events),
b AS (
  SELECT user_id,
         CAST(FLOOR((epoch_us(mx.mx) - epoch_us(ts)) / 3600000000.0) AS BIGINT) AS age_h
  FROM events, mx
),
cnt AS (SELECT user_id, age_h, COUNT(*) AS c FROM b GROUP BY user_id, age_h)
SELECT user_id,
       CAST(SUM(c * CAST(ROUND(exp(-{DECAY_LAMBDA} * CAST(age_h AS DOUBLE)) * {_DECAY_SCALE}) AS BIGINT))
         AS BIGINT) AS decayed_micro,
       CAST(SUM(c) AS BIGINT) AS n_events
FROM cnt GROUP BY user_id
"""


BEHAVIOR_QUERIES = {
    "trending_users_decayed": trending_users_decayed,
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
}

BEHAVIOR_ORACLE_SQL = {
    "trending_users_decayed": TRENDING_DECAYED_SQL,
    "funnel_conversion": FUNNEL_SQL,
    "cohort_retention": COHORT_SQL,
}
