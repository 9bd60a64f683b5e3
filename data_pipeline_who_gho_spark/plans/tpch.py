"""TPC-H-shaped classics over the fixture star schema (Q1/Q3/Q5 live in
plans/analytics.py and plans/extras.py). Same decimal-exactness rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure filter + scalar aggregate — the pushdown showcase (every
    predicate reaches the parquet scan; no shuffle at all, one partial →
    final agg)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_discount").cast("decimal(8,4)")
    out = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )
    return out


Q6_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04 AND l_quantity < 24
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: join + conditional aggregation by a derived class
    (urgent vs other priority counts per return flag)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.year("l_shipdate") == 1997)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(urgent, 1)).alias("high_priority"),
            F.count(F.when(~urgent, 1)).alias("low_priority"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_priority,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_priority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE year(l_shipdate) = 1997
GROUP BY l_returnflag
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: ratio of promo revenue to total revenue. Both sums are
    exact decimals; the final division is identical IEEE in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,4)")
    agg = (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(F.year("l_shipdate") == 1997)
        .agg(
            F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("decimal(20,6)"))).cast("double").alias("promo_rev"),
            F.sum(rev).cast("double").alias("total_rev"),
        )
    )
    return agg.select(
        "promo_rev",
        "total_rev",
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_pct"),
    )


Q14_SQL = """
WITH agg AS (
  SELECT CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,4))
                   ELSE CAST(0 AS DECIMAL(20,6)) END) AS VARCHAR) AS DOUBLE) AS promo_rev,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS total_rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = 1997
)
SELECT promo_rev, total_rev, 100.0 * promo_rev / total_rev AS promo_pct FROM agg
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING-filtered subaggregate joined back to dims, then
    deterministic top-k."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_name").alias("customer"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("orderkey"))
        .limit(20)
    )


Q18_SQL = """
SELECT c_name AS customer, o_orderkey AS orderkey, o_orderdate AS orderdate,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, orderkey
LIMIT 20
"""


def zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is > 2σ above their event_type mean — moments
    computed decimal-exact, z arithmetic identical IEEE across engines."""
    ev = _t(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(12,2)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum((v * v).cast("decimal(28,4)")).cast("double").alias("ss"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s") / n
    var = (F.col("ss") - F.col("s") * F.col("s") / n) / (n - F.lit(1.0))
    stats = stats.select("event_type", mean.alias("mean"), F.sqrt(var).alias("sd"))
    return (
        ev.join(stats, "event_type")
        .withColumn("z", (F.col("value") - F.col("mean")) / F.col("sd"))
        .filter(F.col("z") > 2.0)
        .select("event_id", "event_type", "value", "z")
    )


ZSCORE_SQL = """
WITH m AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS ss
  FROM events GROUP BY event_type
),
stats AS (
  SELECT event_type, s / CAST(n AS DOUBLE) AS mean,
         sqrt((ss - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS sd
  FROM m
)
SELECT event_id, e.event_type, value, (value - mean) / sd AS z
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE (value - mean) / sd > 2.0
"""


TPCH_QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q14_promo_effect": q14_promo_effect,
    "q18_large_orders": q18_large_orders,
    "zscore_anomalies": zscore_anomalies,
}

TPCH_ORACLE_SQL = {
    "q6_forecast_revenue": Q6_SQL,
    "q12_shipmode_priority": Q12_SQL,
    "q14_promo_effect": Q14_SQL,
    "q18_large_orders": Q18_SQL,
    "zscore_anomalies": ZSCORE_SQL,
}
