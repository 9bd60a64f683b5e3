"""Final TPC-H-shaped batch: the five remaining classics (Q2, Q11, Q16,
Q20, Q21), adapted to the fixture star schema. The fixtures carry no
partsupp table and no l_receiptdate/l_commitdate, so:

- Q2/Q11/Q16/Q20 derive the part↔supplier relation from lineitem
  (``GROUP BY l_partkey, l_suppkey``) with supply cost
  ``MIN(l_extendedprice / l_quantity)`` — the correlated-min /
  scalar-share / distinct-count / nested-IN shapes are preserved.
- Q21's "kept orders waiting" uses ``l_shipdate > o_orderdate + 60
  days`` as the lateness predicate.

Scale notes (100 TB posture): dims (part/supplier/nation/region) are
broadcast everywhere; the only big-big exchange is lineitem⋈orders in
Q21, and its groupBy reuses the join's hash partitioning on
l_orderkey so the whole query is ONE wide shuffle. Q21 deliberately
avoids the textbook triple self-join of lineitem (three wide shuffles
+ fan-out): per-order aggregation computes "sole late supplier"
directly, which is the plan you'd want at 1000 executors. The oracle
keeps the EXISTS / NOT EXISTS formulation, proving the rewrite.

Cross-engine exactness (memory/oracle-parity-rules): money in
DECIMAL(12,2); decimal→double via the VARCHAR hop; Q11's HAVING
compares BIGINT cents (no decimal-width overflow, no float boundary);
Q2/Q20 compare IEEE doubles built from identical expression trees
(division / 0.5× of exact values), bit-equal across engines.

Reference semantics ancestry: the reference pipeline has no SQL engine
of its own (SURVEY §2b — analytics delegated to Postgres,
README.md:139-162); these queries extend the same star-schema
analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _europe_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in EUROPE with nation name attached (tiny: ≤100 rows)."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each ECONOMY size-15 part, the EUROPE supplier(s)
    offering the minimum derived supply cost. Correlated-MIN expressed
    as a window over the (part, supplier) aggregate — dims broadcast,
    one agg shuffle + one small window shuffle."""
    supp = _europe_suppliers(spark, sf_dir).select(
        "s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY")
    )
    ps = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part.select("p_partkey", "p_name")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "nation")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey"), F.col("s_name"))
        .limit(100)
    )


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name AS nation
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), ranked AS (
  SELECT s_acctbal, s_name, nation, p_partkey, p_name, supply_cost,
         MIN(supply_cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM ps
  JOIN part ON l_partkey = p_partkey
  JOIN eu ON l_suppkey = s_suppkey
  WHERE p_size <= 15 AND p_type = 'ECONOMY'
)
SELECT s_acctbal, s_name, nation, p_partkey, p_name, supply_cost
FROM ranked WHERE supply_cost = min_cost
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose NATION_7-supplied value exceeds 1/500 of
    the nation's total — group-by + HAVING against an uncorrelated
    scalar subquery. The comparison runs in BIGINT cents (decimal→cents
    exact in both engines, immune to decimal-width overflow). The
    scalar total is a 1-row broadcast crossJoin, not a driver collect."""
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("value_dec")
    )
    total = per_part.agg(
        (F.sum("value_dec") * 100).cast("long").alias("total_cents")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter((F.col("value_dec") * 100).cast("long") * 500 > F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_dec").cast("string").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("partkey"))
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT partkey, CAST(CAST(value_dec AS VARCHAR) AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(value_dec * 100 AS BIGINT) * 500 >
      (SELECT CAST(SUM(value_dec) * 100 AS BIGINT) FROM per_part)
ORDER BY part_value DESC, partkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per (brand, type, size) for
    a part subset, excluding "complaint" suppliers via NOT IN →
    broadcast anti-join. countDistinct gives map-side partial dedup;
    the only wide exchange carries (attrs, suppkey) pairs."""
    sizes = [1, 5, 11, 14, 23, 28, 37, 42]
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(sizes)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%7")
    ).select("s_suppkey")
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"),
              "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'ECONOMY'
  AND p_size IN (1, 5, 11, 14, 23, 28, 37, 42)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested-IN chain — EUROPE suppliers that shipped more
    than half of some 'small%' part's total 1997 volume. The correlated
    half-of-total compare is a window over the (part, supplier)
    aggregate; quantities are integer-valued doubles so sums and the
    0.5× compare are exact in both engines."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    ps = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(part.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        ps.withColumn("part_qty", F.sum("qty").over(w))
        .filter(F.col("qty") > F.lit(0.5) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        _europe_suppliers(spark, sf_dir)
        # dominant is ≤ one row per supplier, i.e. dim-sized → broadcast
        .join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"),
              "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_partkey, l_suppkey
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey FROM ps p1
    WHERE qty > 0.5 * (SELECT SUM(qty) FROM ps p2 WHERE p2.l_partkey = p1.l_partkey)
  )
ORDER BY s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who alone shipped late (> order date + 60
    days) on multi-supplier finished orders. Classic formulation is a
    triple lineitem self-join (EXISTS + NOT EXISTS); here ONE per-order
    aggregation computes supplier counts, late-supplier counts, and the
    sole late supplier — the groupBy key equals the join key, so the
    whole query is a single wide shuffle on l_orderkey. The oracle
    keeps the EXISTS/NOT-EXISTS form, proving the rewrite equivalent."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # two-level aggregate instead of two countDistincts: the distinct-count
    # plan would EXPAND the joined rows 3× (grouping-id sets) and add an
    # exchange; per-(order, supplier) partials collapse first, and BOTH
    # groupBys are satisfied by the join's orderkey partitioning
    per_pair = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("has_late"),
             F.sum(F.when(late, 1).otherwise(0)).alias("late_cnt"))
    )
    per_order = (
        per_pair.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("has_late").alias("n_late_supp"),
            F.max(F.when(F.col("has_late") == 1, F.col("l_suppkey"))).alias("sole_late_supp"),
            F.sum(F.when(F.col("has_late") == 1, F.col("late_cnt")).otherwise(0)).alias("late_lines"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    supp = _europe_suppliers(spark, sf_dir).select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(supp),
                       F.col("sole_late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderstatus = 'F'
  AND r_name = 'EUROPE'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


TPCH4_QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_dominant_suppliers": q20_dominant_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

TPCH4_ORACLE_SQL = {
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_parts": Q11_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q20_dominant_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
}
