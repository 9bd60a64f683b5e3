"""Second analytics batch: the rest of the relational operator surface —
outer joins, pivot, lateral explode, exact dispersion stats, GROUPING
SETS, correlated subqueries, window frames (RANGE/ntile/percent_rank),
null-handling and regexp kernels, deterministic array aggregation.

Same oracle conventions as plans/analytics.py (decimal-exact money,
VARCHAR-hop for wide decimals, unique tiebreakers, aliased columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with aggregate: every customer, order count + decimal
    spend (0/null for orderless customers — the outer-join contract)."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total_spend"),
        )
    )


JOIN_LEFT_OUTER_SQL = """
SELECT c_custkey AS custkey, COUNT(o_orderkey) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER between two derived key sets (1995 vs 1997 customers)."""
    orders = _t(spark, sf_dir, "orders")
    y95 = (
        orders.filter(F.year("o_orderdate") == 1995)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_1995"))
    )
    y97 = (
        orders.filter(F.year("o_orderdate") == 1997)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_1997"))
    )
    return y95.join(y97, "custkey", "full_outer").select(
        "custkey",
        F.coalesce("n_1995", F.lit(0)).alias("n_1995"),
        F.coalesce("n_1997", F.lit(0)).alias("n_1997"),
    )


JOIN_FULL_OUTER_SQL = """
WITH y95 AS (SELECT o_custkey AS custkey, COUNT(*) AS n_1995 FROM orders WHERE year(o_orderdate)=1995 GROUP BY 1),
     y97 AS (SELECT o_custkey AS custkey, COUNT(*) AS n_1997 FROM orders WHERE year(o_orderdate)=1997 GROUP BY 1)
SELECT COALESCE(y95.custkey, y97.custkey) AS custkey,
       COALESCE(n_1995, 0) AS n_1995, COALESCE(n_1997, 0) AS n_1997
FROM y95 FULL OUTER JOIN y97 ON y95.custkey = y97.custkey
"""


def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by status per year (fixed pivot values).
    Nulls for absent combinations are coalesced to 0 to match the
    conditional-aggregation oracle."""
    orders = _t(spark, sf_dir, "orders")
    out = (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "order_year",
        F.coalesce("O", F.lit(0)).alias("n_open"),
        F.coalesce("F", F.lit(0)).alias("n_filled"),
        F.coalesce("P", F.lit(0)).alias("n_partial"),
    )


PIVOT_SQL = """
SELECT year(o_orderdate) AS order_year,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_partial
FROM orders GROUP BY year(o_orderdate)
"""


def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode (flatMap shape): part-name word frequencies."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


EXPLODE_SQL = """
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
GROUP BY word
"""


def agg_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion stats computed from decimal-exact moments so both
    engines do the identical IEEE arithmetic on identical inputs:
    var = (Σx² − (Σx)²/n)/(n−1) with Σ, Σx² exact decimals → double."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(12,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(p).cast("double").alias("s"),
        F.sum((p * p).cast("decimal(28,4)")).cast("double").alias("ss"),
    )
    n = F.col("n").cast("double")
    var = (F.col("ss") - F.col("s") * F.col("s") / n) / (n - F.lit(1.0))
    return agg.select(
        "l_returnflag",
        "n",
        F.col("s").alias("sum_price"),
        var.alias("var_price"),
        F.sqrt(var).alias("stddev_price"),
    )


AGG_EXACT_STATS_SQL = """
WITH m AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS ss
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n, s AS sum_price,
       (ss - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var_price,
       sqrt((ss - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS stddev_price
FROM m
"""


def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status, priority), (status), ()) with
    GROUPING() markers."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_priority,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + correlated scalar subquery in one query."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey AS custkey,
               (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        FROM customer
        WHERE EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 300000
        )
        """
    )


CORRELATED_EXISTS_SQL = """
SELECT c_custkey AS custkey,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame variety: ntile, percent_rank, first/last over an
    explicit ROWS frame, and a centered 3-row moving count."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wmov = w.rowsBetween(-1, 1)
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.first("o_orderkey").over(wfull).alias("first_orderkey"),
        F.last("o_orderkey").over(wfull).alias("last_orderkey"),
        F.count(F.lit(1)).over(wmov).alias("mov_count"),
    )


WINDOW_FRAMES_SQL = """
SELECT o_orderkey AS orderkey, o_custkey AS custkey,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_orderkey,
       last_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_orderkey,
       COUNT(*) OVER (w ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS mov_count
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling kernels: coalesce, nullif, ifnull, null-safe equality."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("__redacted__")).alias("type_redacted"),
        F.col("event_type").eqNullSafe(F.lit("error")).alias("is_error"),
    )


NULL_FUNCS_SQL = """
SELECT event_id,
       nullif(event_type, 'error') AS type_or_null,
       coalesce(nullif(event_type, 'error'), '__redacted__') AS type_redacted,
       event_type IS NOT DISTINCT FROM 'error' AS is_error
FROM events
"""


def regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp kernels: extract, replace, match over brand codes."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.col("p_name").rlike("^[bg]").alias("starts_bg"),
    )


REGEXP_SQL = """
SELECT p_partkey AS partkey,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
       regexp_matches(p_name, '^[bg]') AS starts_bg
FROM part
"""


def array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic array aggregation: sorted distinct status list per
    priority (collect_set order pinned by sort_array), emitted as a
    comma-joined string so the gated output holds only scalar columns
    (the external harness cannot hash list-typed cells)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


ARRAY_AGG_SQL = """
SELECT o_orderpriority,
       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def datetime_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic kernels: add_months, date_add, last_day, weekday."""
    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.add_months(d, 3).alias("plus_3m"),
        F.date_add(d, 30).alias("plus_30d"),
        F.last_day(d).alias("month_end"),
        F.weekday(d).alias("weekday_mon0"),
    )


DATETIME_ARITH_SQL = """
SELECT o_orderkey AS orderkey,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus_30d,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       isodow(o_orderdate) - 1 AS weekday_mon0
FROM orders
"""


def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation predicate)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("total_qty"),
        )
        .filter(F.col("n_lines") >= 40)
    )


HAVING_SQL = """
SELECT l_partkey AS partkey, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 40
"""


def case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch CASE + conditional aggregation (count_if/sum-case)."""
    orders = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
            F.sum(
                F.when(F.year("o_orderdate") >= 1997, F.col("o_totalprice").cast("decimal(12,2)"))
                .otherwise(F.lit(0).cast("decimal(12,2)"))
            ).cast("double").alias("recent_total"),
        )
    )


CASE_BUCKETING_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS bucket,
       COUNT(*) AS n_orders,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       CAST(SUM(CASE WHEN year(o_orderdate) >= 1997 THEN CAST(o_totalprice AS DECIMAL(12,2))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS recent_total
FROM orders
GROUP BY CASE WHEN o_totalprice < 50000 THEN 'small'
              WHEN o_totalprice < 200000 THEN 'medium'
              ELSE 'large' END
"""


def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with missing columns (schema-evolution union)."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
    )
    b = orders.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
    )
    return a.unionByName(b, allowMissingColumns=True)


UNION_BY_NAME_SQL = """
SELECT o_orderkey AS orderkey, o_orderstatus AS status, CAST(NULL AS DOUBLE) AS totalprice
FROM orders WHERE year(o_orderdate) = 1995
UNION ALL
SELECT o_orderkey AS orderkey, CAST(NULL AS VARCHAR) AS status, o_totalprice AS totalprice
FROM orders WHERE year(o_orderdate) = 1996
"""


def set_ops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL on multisets of
    (custkey) drawn from order years (duplicates preserved)."""
    orders = _t(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey"))
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    inter = y95.intersectAll(y96).withColumn("op", F.lit("intersect_all"))
    minus = y95.exceptAll(y96).withColumn("op", F.lit("except_all"))
    return inter.unionByName(minus)


SET_OPS_BAG_SQL = """
WITH y95 AS (SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT custkey, 'intersect_all' AS op FROM (SELECT custkey FROM y95 INTERSECT ALL SELECT custkey FROM y96)
UNION ALL
SELECT custkey, 'except_all' AS op FROM (SELECT custkey FROM y95 EXCEPT ALL SELECT custkey FROM y96)
"""


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via integer floor-division bucketing (the
    deterministic cousin of width_bucket)."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 10000).cast("int")
    return (
        li.groupBy(bucket.alias("price_bucket"))
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


AGG_HISTOGRAM_SQL = """
SELECT CAST(floor(l_extendedprice / 10000) AS INT) AS price_bucket, COUNT(*) AS n_items
FROM lineitem GROUP BY 1
"""


def sort_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination: ORDER BY ... LIMIT 20 OFFSET 40 with a
    total order (deterministic page)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(40)
        .limit(20)
        .select(F.col("o_orderkey").alias("orderkey"), F.col("o_totalprice").alias("totalprice"))
    )


SORT_OFFSET_SQL = """
SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 40
"""


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt): customer balance metrics as rows."""
    cust = _t(spark, sf_dir, "customer")
    wide = cust.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey_num"),
    )
    return wide.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey_num"],
        variableColumnName="metric",
        valueColumnName="value",
    ).select(F.col("c_custkey").alias("custkey"), "metric", "value")


UNPIVOT_SQL = """
SELECT c_custkey AS custkey, metric, value FROM (
  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey_num' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
)
"""


def string_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg: deterministic ordered concatenation per group."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias("statuses_csv")
    )


STRING_AGG_SQL = """
SELECT o_orderpriority, string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses_csv
FROM orders GROUP BY o_orderpriority
"""


def bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise kernel coverage: AND/OR/XOR/shifts over integer keys."""
    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return orders.select(
        k.alias("orderkey"),
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(65535)).alias("xored"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
    )


BITWISE_SQL = """
SELECT o_orderkey AS orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, 65535) AS xored,
       o_orderkey << 2 AS shl2,
       o_orderkey >> 3 AS shr3
FROM orders
"""


def width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """width_bucket: equi-width bucketing with explicit bounds (native in
    both engines — identical bucket arithmetic)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "bucket", F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(12))
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# DuckDB has no width_bucket — the oracle mirrors its exact arithmetic:
# below-range → 0, at/above hi → n+1, else floor((x-lo)/((hi-lo)/n)) + 1
WIDTH_BUCKET_SQL = """
SELECT CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 600000.0 THEN 13
            ELSE CAST(floor((o_totalprice - 0.0) / ((600000.0 - 0.0) / 12)) AS BIGINT) + 1
       END AS bucket,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


def printf_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style formatting: printf/format_string with mixed arg types."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.format_string("%s [%d] @ %.2f", F.col("p_name"), F.col("p_size"), F.col("p_retailprice")).alias("label"),
    )


PRINTF_SQL = """
SELECT p_partkey AS partkey, printf('%s [%d] @ %.2f', p_name, p_size, p_retailprice) AS label
FROM part
"""


ANALYTICS2_QUERIES = {
    "unpivot_metrics": unpivot_metrics,
    "string_agg_sorted": string_agg_sorted,
    "bitwise_functions": bitwise_functions,
    "width_bucket_histogram": width_bucket_histogram,
    "printf_formatting": printf_formatting,
    "set_ops_bag": set_ops_bag,
    "agg_histogram": agg_histogram,
    "sort_offset_page": sort_offset_page,
    "join_left_outer": join_left_outer,
    "join_full_outer": join_full_outer,
    "pivot_status_by_year": pivot_status_by_year,
    "explode_words": explode_words,
    "agg_exact_stats": agg_exact_stats,
    "grouping_sets": grouping_sets,
    "correlated_exists": correlated_exists,
    "window_frames": window_frames,
    "null_functions": null_functions,
    "regexp_functions": regexp_functions,
    "array_agg_sorted": array_agg_sorted,
    "datetime_arithmetic": datetime_arithmetic,
    "having_filter": having_filter,
    "case_bucketing": case_bucketing,
    "union_by_name": union_by_name,
}

ANALYTICS2_ORACLE_SQL = {
    "unpivot_metrics": UNPIVOT_SQL,
    "string_agg_sorted": STRING_AGG_SQL,
    "bitwise_functions": BITWISE_SQL,
    "width_bucket_histogram": WIDTH_BUCKET_SQL,
    "printf_formatting": PRINTF_SQL,
    "set_ops_bag": SET_OPS_BAG_SQL,
    "agg_histogram": AGG_HISTOGRAM_SQL,
    "sort_offset_page": SORT_OFFSET_SQL,
    "join_left_outer": JOIN_LEFT_OUTER_SQL,
    "join_full_outer": JOIN_FULL_OUTER_SQL,
    "pivot_status_by_year": PIVOT_SQL,
    "explode_words": EXPLODE_SQL,
    "agg_exact_stats": AGG_EXACT_STATS_SQL,
    "grouping_sets": GROUPING_SETS_SQL,
    "correlated_exists": CORRELATED_EXISTS_SQL,
    "window_frames": WINDOW_FRAMES_SQL,
    "null_functions": NULL_FUNCS_SQL,
    "regexp_functions": REGEXP_SQL,
    "array_agg_sorted": ARRAY_AGG_SQL,
    "datetime_arithmetic": DATETIME_ARITH_SQL,
    "having_filter": HAVING_SQL,
    "case_bucketing": CASE_BUCKETING_SQL,
    "union_by_name": UNION_BY_NAME_SQL,
}
