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


# ---------------------------------------------------------------------------
# Bucketed-warehouse co-located join
# ---------------------------------------------------------------------------

_BUCKETS = 8
_BT_BUILT: set[tuple[str, str]] = set()


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem/orders ONCE per (app, sf) as warehouse tables
    bucketed+sorted on the join key — the at-rest layout that lets every
    recurring fact⋈fact join run with ZERO exchanges (the strategy for
    the 100 TB case where re-shuffling the big side per query is the
    dominant cost). tests/test_bucketed_join.py pins the no-Exchange
    plan property; this query pins the RESULT under the driver gate."""
    import atexit
    import hashlib
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    t_li, t_ord = f"bt_lineitem_{tag}", f"bt_orders_{tag}"
    key = (spark.sparkContext.applicationId, tag)
    if key not in _BT_BUILT:
        base = tempfile.mkdtemp(prefix="gate-bucketed-")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        for name, df, bkey in ((t_li, li, "l_orderkey"), (t_ord, orders, "o_orderkey")):
            (
                df.write.bucketBy(_BUCKETS, bkey)
                .sortBy(bkey)
                .option("path", f"{base}/{name}")
                .mode("overwrite")
                .saveAsTable(name)
            )
        _BT_BUILT.add(key)
    return t_li, t_ord


def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through the bucketed co-located join:
    both sides pre-bucketed on the key, SMJ forced via the merge hint so
    the bucketed (shuffle-free) path — not a broadcast — is what the
    gate verifies. Money is summed as DECIMAL then cast, the established
    cross-engine-exact pattern."""
    t_li, t_ord = _bucketed_tables(spark, sf_dir)
    li, orders = spark.table(t_li), spark.table(t_ord)
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    )
    return (
        li.hint("merge")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


BUCKETED_JOIN_SQL = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4))))
            AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


SCALE_OPS_QUERIES = {
    "skew_safe_event_rollup": skew_safe_event_rollup,
    "salted_join_enrich": salted_join_enrich,
    "bucketed_colocated_join": bucketed_colocated_join,
}

SCALE_OPS_ORACLE_SQL = {
    "skew_safe_event_rollup": SKEW_ROLLUP_SQL,
    "salted_join_enrich": SALTED_JOIN_SQL,
    "bucketed_colocated_join": BUCKETED_JOIN_SQL,
}
