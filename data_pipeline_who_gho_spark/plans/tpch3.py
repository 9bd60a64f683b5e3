"""TPC-H batch 3: the multi-dimension snowflake joins — Q5 (local
supplier volume), Q8 (national market share), Q9 (product-line revenue
by nation and year, adapted: fixtures carry no partsupp/ps_supplycost,
so profit reduces to revenue — SURVEY §2b A1 documents the star-join
surface these extend).

Fixture adaptations: nation names are synthetic (``NATION_<k>``, region
k%5); part types are single words (``PROMO`` etc.); dates span
1995-2001. Filters below are chosen to keep classic selectivity.

Cross-engine exactness: volumes are DECIMAL(12,2)×DECIMAL(8,4) sums
(exact, order-free); every double is produced by the VARCHAR-hop cast
(memory/oracle-parity-rules) and ratios divide identical IEEE operands.

Scale posture (100 TB): all five dimension tables broadcast (region 5
rows … part 0.2 % of fact); the only shuffle in each plan is the final
group-by on (year | nation) — lineitem↔orders joins on the natural
key. AQE handles the orders-side skew if order sizes are pathological.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,4)")


_HOP = "CAST(CAST({} AS VARCHAR) AS DOUBLE)"
_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,4))"


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue from EUROPE customers served by a supplier in the
    *same* nation, by nation, for orders placed in 1996 — the join that
    correlates two dimension paths (c_nationkey = s_nationkey) on top
    of the star. Region/nation/customer/supplier broadcast; one shuffle
    for the 5-key aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = f"""
SELECT n_name,
       {_HOP.format(f"SUM({_REV_SQL})")} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_1's share of PROMO-part volume sold to AMERICA-region
    customers, by order year. Two nation lookups with different roles
    (customer's region gate, supplier's share flag) — both broadcast;
    the conditional share numerator rides the same aggregate as the
    denominator (one pass, no self-join)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n_cust = _t(spark, sf_dir, "nation").alias("nc")
    n_supp = _t(spark, sf_dir, "nation").alias("ns")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    vol = _rev()
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("nc.n_nationkey"))
        .join(F.broadcast(region), F.col("nc.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("ns.n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("ns.n_name") == "NATION_1", vol).otherwise(
                    F.lit(0).cast("decimal(20,6)")
                )
            )
            .cast("double")
            .alias("nation_vol"),
            F.sum(vol).cast("double").alias("total_vol"),
        )
    )
    return agg.select(
        "o_year",
        "nation_vol",
        "total_vol",
        (F.col("nation_vol") / F.col("total_vol")).alias("mkt_share"),
    ).orderBy("o_year")


Q8_SQL = f"""
WITH agg AS (
  SELECT year(o_orderdate) AS o_year,
         {_HOP.format(f"SUM(CASE WHEN ns.n_name = 'NATION_1' THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(20,6)) END)")} AS nation_vol,
         {_HOP.format(f"SUM({_REV_SQL})")} AS total_vol
  FROM lineitem
  JOIN part      ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region    ON nc.n_regionkey = r_regionkey AND r_name = 'AMERICA'
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  GROUP BY year(o_orderdate)
)
SELECT o_year, nation_vol, total_vol, nation_vol / total_vol AS mkt_share
FROM agg ORDER BY o_year
"""


def q9_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 adapted: revenue from 'red' parts by supplier nation × order
    year (no ps_supplycost in fixtures ⇒ profit reduces to revenue).
    The LIKE filter prunes part before its broadcast; nation arrives via
    the supplier path, year via the orders path."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {_HOP.format(f"SUM({_REV_SQL})")} AS revenue
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


TPCH3_QUERIES = {
    "q5_local_supplier": q5_local_supplier,
    "q8_market_share": q8_market_share,
    "q9_part_revenue": q9_part_revenue,
}

TPCH3_ORACLE_SQL = {
    "q5_local_supplier": Q5_SQL,
    "q8_market_share": Q8_SQL,
    "q9_part_revenue": Q9_SQL,
}
