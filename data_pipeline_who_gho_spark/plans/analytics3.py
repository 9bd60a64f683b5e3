"""Third analytics batch: rank-family window functions, exact
percentiles/median, per-group mode, exact Pearson correlation, and
calendar gap-filling — rounding out the window/statistics surface of
SURVEY §2c ("windows: ranking/analytic/frames natively").

Cross-engine exactness: percent_rank/cume_dist are rationals of row
counts (identical IEEE division both engines); percentiles interpolate
on integer-valued quantities with dyadic fractions (exact in double);
correlation is assembled from exact decimal moments and divided in
double with an identical expression tree (memory/oracle-parity-rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over customers per market
    segment — the ranking-window family in one pass (single shuffle on
    the partition key, all four functions share one sort)."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.row_number().over(w).alias("rn"),
        )
    )


WINDOW_RANK_FAMILY_SQL = """
SELECT c_custkey, c_mktsegment,
       ntile(4)      OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()   OVER w AS cume,
       row_number()  OVER w AS rn
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles of l_quantity per return flag.
    l_quantity is integer-valued, so lower + (upper-lower)*{.25,.5,.75}
    is exact in IEEE double — safe to hash-compare across engines.
    (Approximate quantiles are covered separately in tests/test_sketches.py
    with tolerance contracts; this is the exact path.)"""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.25).alias("q25"),
            F.percentile("l_quantity", 0.5).alias("q50"),
            F.percentile("l_quantity", 0.75).alias("q75"),
            F.min("l_quantity").alias("qmin"),
            F.max("l_quantity").alias("qmax"),
        )
        .orderBy("l_returnflag")
    )


EXACT_PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5)  AS q50,
       quantile_cont(l_quantity, 0.75) AS q75,
       MIN(l_quantity) AS qmin,
       MAX(l_quantity) AS qmax
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent order priority per order status, deterministic
    tie-break (count desc, then value asc) — mode as count+rank, the
    shuffle-once idiom (no driver-side collect)."""
    counts = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


MODE_SQL = """
SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS n_orders
FROM (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         row_number() OVER (PARTITION BY o_orderstatus ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority
)
WHERE rn = 1
ORDER BY o_orderstatus
"""


def corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return
    flag, from exact decimal moments (n, Σx, Σy, Σx², Σy², Σxy) — the
    one-pass distributed formula; the double arithmetic after the exact
    sums has an identical expression tree in the oracle."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(28,4)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(30,4)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(30,4)")).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    return m.select(
        "l_returnflag",
        "n",
        (cov / (F.sqrt(vx) * F.sqrt(vy))).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


CORR_SQL = """
WITH m AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (sxy - sx * sy / CAST(n AS DOUBLE))
       / (sqrt(sxx - sx * sx / CAST(n AS DOUBLE)) * sqrt(syy - sy * sy / CAST(n AS DOUBLE))) AS corr_qty_price
FROM m
ORDER BY l_returnflag
"""


def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling: a generated January-2024 date spine LEFT
    JOINed to daily event counts, so days with zero events appear
    explicitly (time-series densification; the spine is generated, not
    scanned — broadcast side of the join)."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-31").cast("date"),
            )
        ).alias("day")
    )
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )
    return (
        spine.join(daily, "day", "left_outer")
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
        .orderBy("day")
    )


GAP_FILL_SQL = """
WITH spine AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY)) AS DATE) AS day
),
daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_value
  FROM events GROUP BY 1
)
SELECT spine.day, COALESCE(n_events, 0) AS n_events,
       COALESCE(total_value, 0.0) AS total_value
FROM spine LEFT OUTER JOIN daily ON spine.day = daily.day
ORDER BY spine.day
"""


def rolling_hour_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 1-hour activity per user — a RANGE frame over
    event time (rangeBetween on epoch microseconds; Spark's RANGE only
    takes numeric bounds, DuckDB's takes an INTERVAL — identical frame:
    [ts - 1h, ts] inclusive, peers included). One shuffle on user_id;
    the running sum is decimal-exact."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double").alias("value_1h"),
    )


ROLLING_HOUR_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_1h,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS VARCHAR) AS DOUBLE) AS value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


ANALYTICS3_QUERIES = {
    "window_rank_family": window_rank_family,
    "exact_percentiles": exact_percentiles,
    "mode_per_group": mode_per_group,
    "corr_exact": corr_exact,
    "gap_fill_daily": gap_fill_daily,
    "rolling_hour_window": rolling_hour_window,
}

ANALYTICS3_ORACLE_SQL = {
    "window_rank_family": WINDOW_RANK_FAMILY_SQL,
    "exact_percentiles": EXACT_PERCENTILES_SQL,
    "mode_per_group": MODE_SQL,
    "corr_exact": CORR_SQL,
    "gap_fill_daily": GAP_FILL_SQL,
    "rolling_hour_window": ROLLING_HOUR_SQL,
}
