"""Analytics-SQL surface (SURVEY §2b A1-A5 + the relational operator
inventory the engine must cover: joins, aggregations, windows, set ops,
sorts/top-k, scalar subqueries, string/date/JSON functions).

Every query is a ``(spark, sf_dir) -> DataFrame`` callable with a matching
ANSI-SQL oracle in ``ANALYTICS_ORACLE_SQL`` (run by DuckDB over the same
parquet). Conventions for oracle parity:

- **Decimal-exact money math**: monetary doubles are cast to
  DECIMAL(18,2)/(18,4) *before* aggregation so sums are exact and
  engine-independent (double summation order would otherwise drift);
  final results cast back to DOUBLE (same decimal → nearest-double in
  both engines).
- **Deterministic top-k**: every ORDER BY ... LIMIT carries a unique
  tiebreaker.
- **Aliased columns everywhere** (driver hashes by sorted column name).

Scale notes are inline per query: which side broadcasts, where the
shuffle lands, and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table, spread_by_hash


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _money(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# A1/A2/A3 — star joins with predicates and aliased projection
# ---------------------------------------------------------------------------

def a1_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 analog (TPC-H Q5 shape): revenue per nation inside one region.

    Scale: region/nation/customer/supplier are dimension-sized → Catalyst
    broadcasts them (hint added for the two guaranteed-tiny dims); the only
    real shuffle is the final groupBy on n_name (25 groups, trivially
    partial-agg'd map-side). lineitem⋈orders is the one big join: both
    sides hash-partition on orderkey.
    """
    li, orders = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    cust, nation = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # examined r13: spreading the broadcast-probe side past the
    # single-row-group scan measured WORSE (0.54 -> 0.69 s; the exchange
    # costs more than the one-core probe+agg saves) — left as-is
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter((F.col("r_name") == "ASIA") & (F.year("o_orderdate") == 1996))
        .groupBy("n_name")
        .agg(
            F.sum(_money("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


A1_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
GROUP BY n_name
"""


def a2_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 analog: LIKE-prefix predicate + aliased projection.

    Scale: pure map-side — the StartsWith predicate and the projection
    push into the parquet scan (PushedFilters + pruned ReadSchema).
    """
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").like("PROMO%") & (F.col("p_size") > 20))
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("p_retailprice").alias("retail_price"),
        )
    )


A2_SQL = """
SELECT p_partkey AS partkey, p_name AS part_name, p_retailprice AS retail_price
FROM part WHERE p_type LIKE 'PROMO%' AND p_size > 20
"""


def a4_latest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 analog: latest order per customer (the reference's
    latest-year-per-indicator scalar-subquery idiom, README.md:156-160),
    via the window formulation.

    Scale: one shuffle on custkey; window keeps a single row per group —
    no second scan of the fact, unlike the self-join formulation.
    """
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
        )
    )


A4_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


def scalar_subquery_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 verbatim shape: rows at the global MAX of a column (uncorrelated
    scalar subquery). Spark SQL plans the subquery as a broadcast scalar."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_totalprice AS totalprice
        FROM orders
        WHERE o_orderdate = (SELECT MAX(o_orderdate) FROM orders)
        """
    )


SCALAR_SUBQ_SQL = """
SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_totalprice AS totalprice
FROM orders WHERE o_orderdate = (SELECT MAX(o_orderdate) FROM orders)
"""


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-aggregate groupBy with decimal-exact sums.

    Scale: classic partial+final hash aggregate; 6 groups means the final
    exchange moves ~nothing. Whole plan is one scan + one tiny shuffle.
    """
    li = _t(spark, sf_dir, "lineitem")
    # narrow decimal widths so the 3-factor product stays inside DECIMAL(38)
    # in BOTH engines (DuckDB silently falls back to DOUBLE on overflow,
    # which would break exactness): (12,2)×(8,4)×(8,4) → ≤ (30,10).
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    one_minus_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    one_plus_tax = (F.lit(1) + F.col("l_tax")).cast("decimal(8,4)")
    # single-row-group fixture scan = one task; spread the filtered,
    # projected rows so the decimal partial aggregation parallelizes
    # (no-op at production scale — see catalog.spread_by_hash)
    li = spread_by_hash(
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02")).select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        ),
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * one_minus_disc).cast("double").alias("sum_disc_price"),
            F.sum(price * one_minus_disc * one_plus_tax).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# NOTE the VARCHAR hop on high-scale decimal sums: DuckDB's direct
# decimal→double cast divides in floating point (numerator > 2^53 ⇒ ulp
# drift) while its string→double parse is correctly rounded, matching
# Spark's BigDecimal→double conversion exactly.
AGG_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,4)) * CAST(1 + l_tax AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — Spark expands to a two-phase
    partial-distinct aggregate (no naive global de-dup)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


AGG_DISTINCT_SQL = """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy (subtotals + grand total)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_money("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


AGG_ROLLUP_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two independent dimensions."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_money("o_totalprice")).cast("double").alias("total_price"),
    )


AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (rank window).

    Scale: single shuffle on custkey; rank() prunes inside each partition
    (no global sort). Skewed customers are split by AQE skew handling.
    """
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("price_rank", F.row_number().over(w))
        .filter(F.col("price_rank") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            "price_rank",
        )
    )


WINDOW_TOPN_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice, price_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
  FROM orders
) WHERE price_rank <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order date (cumulative frame).

    Decimal-exact running sum: frame accumulation order is pinned by the
    (date, orderkey) sort so both engines produce identical prefixes.
    """
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.sum(_money("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-over-event value delta (lag analytic function).

    Same-operand double subtraction is IEEE-deterministic → no rounding
    needed for oracle parity.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
    )


WINDOW_LAG_SQL = """
SELECT event_id, user_id,
       value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_delta
FROM events
"""


# ---------------------------------------------------------------------------
# Join variety
# ---------------------------------------------------------------------------

def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers that have at least one urgent order.

    Scale: semi-join needs only the key column from the right side —
    Catalyst prunes orders to o_custkey before the exchange.
    """
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        cust.join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            cust.c_custkey == orders.o_custkey,
            "left_semi",
        ).select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
    )


JOIN_SEMI_SQL = """
SELECT c_custkey AS custkey, c_name AS name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with no urgent order (complement of join_semi)."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return cust.join(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        cust.c_custkey == orders.o_custkey,
        "left_anti",
    ).select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))


JOIN_ANTI_SQL = """
SELECT c_custkey AS custkey, c_name AS name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def join_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join: price-band classification of orders.

    The band table is a literal dim → broadcast nested-loop join, the
    right physical plan for a small-side theta join at any fact scale.
    """
    orders = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 50_000.0), ("mid", 50_000.0, 150_000.0), ("high", 150_000.0, 1e18)],
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_money("o_totalprice")).cast("double").alias("band_total"),
        )
    )


JOIN_RANGE_SQL = """
WITH bands(band, lo, hi) AS (VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0), ('high', 150000.0, 1e18))
SELECT band, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_total
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
"""


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION over customer key sets by order year."""
    orders = _t(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey"))
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    both = y95.intersect(y96).withColumn("segment", F.lit("both"))
    only95 = y95.subtract(y96).withColumn("segment", F.lit("only_1995"))
    return both.unionByName(only95)


SET_OPS_SQL = """
WITH y95 AS (SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT custkey, 'both' AS segment FROM (SELECT custkey FROM y95 INTERSECT SELECT custkey FROM y96)
UNION ALL
SELECT custkey, 'only_1995' AS segment FROM (SELECT custkey FROM y95 EXCEPT SELECT custkey FROM y96)
"""


def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 line items by price (ORDER BY + LIMIT → Spark plans
    TakeOrderedAndProject: per-partition heaps, no global sort)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber"))
        .limit(10)
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.col("l_extendedprice").alias("extendedprice"),
        )
    )


SORT_TOPK_SQL = """
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, l_extendedprice AS extendedprice
FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
"""


# ---------------------------------------------------------------------------
# Scalar function surface: string / date / JSON
# ---------------------------------------------------------------------------

def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String kernel coverage: upper/substr/length/concat/trim/replace."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


STRING_FUNCS_SQL = """
SELECT p_partkey AS partkey, upper(p_brand) AS brand_upper, substr(p_name, 1, 5) AS name_prefix,
       length(p_name) AS name_len, concat_ws('/', p_brand, p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_snake
FROM part
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time kernel coverage: year/month/quarter/trunc/datediff."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_eoy"),
    )


DATE_FUNCS_SQL = """
SELECT o_orderkey AS orderkey, year(o_orderdate) AS order_year, month(o_orderdate) AS order_month,
       quarter(o_orderdate) AS order_quarter,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy
FROM orders
"""


def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the events.props payload column, with a
    grouped aggregate on the extracted value."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


JSON_EXTRACT_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via window functions —
    the batch formulation of a session window; the streaming path uses
    F.session_window (see streaming module).

    Scale: one shuffle on user_id; session ids assigned by a running sum
    of gap markers inside each user partition.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap test in whole microseconds: fixture timestamps carry sub-second
    # parts, so a seconds-truncating cast flips sessions whose gap straddles
    # 1800s within a fraction.  unix_micros ≡ DuckDB epoch_us exactly.
    mus = F.unix_micros(F.col("ts"))
    gap = (
        F.when(
            mus - F.lag(mus).over(w) > 1_800_000_000,
            1,
        )
        .otherwise(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn("session_id", F.sum(gap).over(wsum))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
              THEN 1 ELSE 0 END AS gap
  FROM events
), sessions AS (
  SELECT user_id, ts,
         CAST(SUM(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions GROUP BY user_id, session_id
"""


ANALYTICS_QUERIES = {
    "a1_star_join_revenue": a1_star_join_revenue,
    "a2_filter_like": a2_filter_like,
    "a4_latest_per_group": a4_latest_per_group,
    "scalar_subquery_max": scalar_subquery_max,
    "agg_pricing_summary": agg_pricing_summary,
    "agg_distinct": agg_distinct,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "window_topn_per_group": window_topn_per_group,
    "window_running_sum": window_running_sum,
    "window_lag_delta": window_lag_delta,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_range_bucket": join_range_bucket,
    "set_ops": set_ops,
    "sort_topk": sort_topk,
    "string_functions": string_functions,
    "date_functions": date_functions,
    "json_extraction": json_extraction,
    "sessionize_events": sessionize_events,
}

ANALYTICS_ORACLE_SQL = {
    "a1_star_join_revenue": A1_SQL,
    "a2_filter_like": A2_SQL,
    "a4_latest_per_group": A4_SQL,
    "scalar_subquery_max": SCALAR_SUBQ_SQL,
    "agg_pricing_summary": AGG_PRICING_SQL,
    "agg_distinct": AGG_DISTINCT_SQL,
    "agg_rollup": AGG_ROLLUP_SQL,
    "agg_cube": AGG_CUBE_SQL,
    "window_topn_per_group": WINDOW_TOPN_SQL,
    "window_running_sum": WINDOW_RUNNING_SQL,
    "window_lag_delta": WINDOW_LAG_SQL,
    "join_semi": JOIN_SEMI_SQL,
    "join_anti": JOIN_ANTI_SQL,
    "join_range_bucket": JOIN_RANGE_SQL,
    "set_ops": SET_OPS_SQL,
    "sort_topk": SORT_TOPK_SQL,
    "string_functions": STRING_FUNCS_SQL,
    "date_functions": DATE_FUNCS_SQL,
    "json_extraction": JSON_EXTRACT_SQL,
    "sessionize_events": SESSIONIZE_SQL,
}
