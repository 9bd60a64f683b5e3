"""Fifth analytics batch: incremental rollup maintenance, behavioral
transition matrices, and edit-distance fuzzy matching.

Reference parity anchors: incremental_rollup_monthly realizes the
incremental-load semantics the reference *declares* but never
implements (`etl/state.py:39-55` watermark dead code, SURVEY §2a ST1
note) at the aggregate level; the other two extend the dedup/behavior
families (SURVEY §2c north-star).

Cross-engine exactness: revenue merges in DECIMAL (order-free);
transition probabilities divide identical BIGINT-derived doubles;
levenshtein is integer-valued and identically defined in Spark and
DuckDB.

Scale posture (100 TB): the rollup refresh aggregates only the delta
batch then merges against the (tiny) rollup state — history is never
rescanned; transitions are one window shuffle on user_id; fuzzy
matching blocks on a prefix key so the quadratic comparison runs inside
buckets only (same blocking discipline as MinHash-LSH banding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.rollup import merge_rollups, rollup_aggregate
from ..sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Incremental rollup maintenance (partial-aggregate merge across batches)
# ---------------------------------------------------------------------------

_ROLLUP_KINDS = {
    "n_orders": "count",
    "revenue": "sum",
    "max_price": "max",
    "min_price": "min",
}


def incremental_rollup_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue rollup per order priority maintained
    *incrementally*: history (orders ≤ 1997) is aggregated into rollup
    state, the delta batch (orders > 1997) is aggregated separately,
    and the two partials merge — exercising the algebraic-merge path an
    incremental materialized view uses. The oracle is the one-shot
    GROUP BY over all rows, so the merge must be exactly lossless.
    """
    orders = _t(spark, sf_dir, "orders")
    keys = ["month", "o_orderpriority"]
    measures = {
        "n_orders": ("count", F.lit(1)),
        "revenue": ("sum", F.col("o_totalprice").cast("decimal(14,2)")),
        "max_price": ("max", F.col("o_totalprice")),
        "min_price": ("min", F.col("o_totalprice")),
    }
    with_month = orders.withColumn("month", F.date_trunc("month", "o_orderdate"))
    # boolean + negation so NULL order dates land in exactly one batch
    # (year(NULL) is NULL — a pair of </> filters would drop such rows)
    is_history = F.coalesce(F.year("o_orderdate") <= 1997, F.lit(False))
    history = with_month.filter(is_history)
    delta = with_month.filter(~is_history)
    state = rollup_aggregate(history, keys, measures)
    delta_state = rollup_aggregate(delta, keys, measures)
    merged = merge_rollups(state, delta_state, keys, _ROLLUP_KINDS)
    return merged.select(
        "month",
        "o_orderpriority",
        "n_orders",
        F.col("revenue").cast("double").alias("revenue"),
        "max_price",
        "min_price",
    ).orderBy("month", "o_orderpriority")


INCREMENTAL_ROLLUP_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
       o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS revenue,
       MAX(o_totalprice) AS max_price,
       MIN(o_totalprice) AS min_price
FROM orders
GROUP BY 1, 2
ORDER BY month, o_orderpriority
"""


# ---------------------------------------------------------------------------
# Behavioral transition matrix (first-order Markov over event streams)
# ---------------------------------------------------------------------------


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type → next event_type) transition counts and
    probabilities per user stream — the first-order Markov summary
    behind path analysis and anomaly-flow detection. One window shuffle
    on user_id; the probability normalizer rides a second tiny window
    over the 25-row transition matrix itself."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "next_type",
        "n",
        (F.col("n") / F.sum("n").over(wt)).alias("p"),
    ).orderBy("from_type", "next_type")


EVENT_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), counted AS (
  SELECT from_type, next_type, COUNT(*) AS n
  FROM pairs WHERE next_type IS NOT NULL
  GROUP BY from_type, next_type
)
SELECT from_type, next_type, n,
       n / SUM(n) OVER (PARTITION BY from_type) AS p
FROM counted
ORDER BY from_type, next_type
"""


# ---------------------------------------------------------------------------
# Edit-distance fuzzy matching with prefix blocking
# ---------------------------------------------------------------------------

_BLOCK_LEN = 12
_PREFIX_LEN = 60
_MAX_DIST = 5

# PassJoin segment geometry: the 48-char suffix past the block splits
# into MAX_DIST+1 = 6 segments of 8; probe substrings shift +/-5
_SEG_N = _MAX_DIST + 1
_SUF_LEN = _PREFIX_LEN - _BLOCK_LEN
_SEG_LEN = _SUF_LEN // _SEG_N
# the pigeonhole argument needs the segments to COVER the suffix — a
# remainder would leave tail chars in no segment and break completeness
assert _SEG_N * _SEG_LEN == _SUF_LEN, "segment geometry must tile the suffix"


def fuzzy_match_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs whose 60-char prefixes are within levenshtein
    distance 5, blocked on the first 12 characters — the fuzzy
    complement of exact / MinHash dedup for short-text (title-style)
    matching.

    Scale shape (rebuilt after the sf1 probe caught the naive
    block-join at ~100x time for 10x data — hot blocks make the pair
    set quadratic): a PassJoin-style segment filter (Li et al., PVLDB
    2011) generates candidates instead of all block pairs. Exactness:
    equal blocks strip as a common prefix without changing the edit
    distance, so lev(prefix) <= 5 implies lev(48-char suffixes) <= 5;
    partitioning one suffix into 6 segments of 8 chars, pigeonhole
    forces >= 1 segment to survive un-edited, i.e. appear EXACTLY in
    the other suffix within +/-5 positions. Candidates = equi-join on
    (block, segment index, 8-char content) — the a-side emits its 6
    canonical segments, the b-side its substrings at the <= 11 shifted
    starts — then the BANDED levenshtein verify (levenshtein(pa, pb,
    5) early-exits past the threshold, O(k*n) per pair). Docs too
    short for a full prefix fall back to the plain block join (they
    are few, and their whole text IS the prefix). Results are
    bit-identical to the quadratic definition the oracle keeps
    (cross-checked pairwise at sf0.001/0.01/1)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, _PREFIX_LEN).alias("prefix"),
        F.substring("text", 1, _BLOCK_LEN).alias("block"),
        F.substring("text", _BLOCK_LEN + 1, _SUF_LEN).alias("suffix"),
    )
    fulls = docs.filter(F.length("prefix") == _PREFIX_LEN)
    shorts = docs.filter(F.length("prefix") < _PREFIX_LEN)

    # a-side: canonical segments (i, suffix[i*8 : (i+1)*8])
    segs = F.array(*[
        F.struct(
            F.lit(i).alias("i"),
            F.substring("suffix", i * _SEG_LEN + 1, _SEG_LEN).alias("seg"),
        )
        for i in range(_SEG_N)
    ])
    a_keys = fulls.select(
        F.col("doc_id").alias("id_a"), "block", F.explode(segs).alias("s")
    ).select("id_a", "block", F.col("s.i").alias("i"), F.col("s.seg").alias("seg"))

    # b-side: probe substrings at every start within +/-MAX_DIST of
    # each canonical segment start (clamped to the suffix), dedup'd at
    # plan-construction time
    probe_idx = sorted({
        (i, max(1, min(_SUF_LEN - _SEG_LEN + 1, i * _SEG_LEN + 1 + s)))
        for i in range(_SEG_N)
        for s in range(-_MAX_DIST, _MAX_DIST + 1)
    })
    probes = F.array(*[
        F.struct(F.lit(i).alias("i"), F.lit(p).alias("p")) for i, p in probe_idx
    ])
    b_keys = fulls.select(
        F.col("doc_id").alias("id_b"), "block", "suffix",
        F.explode(probes).alias("ip"),
    ).select(
        "id_b", "block", F.col("ip.i").alias("i"),
        F.col("suffix").substr(F.col("ip.p"), F.lit(_SEG_LEN)).alias("seg"),
    )

    cand_full = (
        a_keys.join(b_keys, ["block", "i", "seg"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # short-doc fallback: every pair with a short member, via block join
    s_a = shorts.select(F.col("doc_id").alias("id_a"), "block")
    all_b = docs.select(F.col("doc_id").alias("id_b"), "block")
    f_a = fulls.select(F.col("doc_id").alias("id_a"), "block")
    s_b = shorts.select(F.col("doc_id").alias("id_b"), "block")
    cand_short = (
        s_a.join(all_b, "block").select("id_a", "id_b")
        .unionByName(f_a.join(s_b, "block").select("id_a", "id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
    )

    pa = docs.select(F.col("doc_id").alias("id_a"), F.col("prefix").alias("pa"))
    pb = docs.select(F.col("doc_id").alias("id_b"), F.col("prefix").alias("pb"))
    return (
        cand_full.unionByName(cand_short)
        .join(pa, "id_a")
        .join(pb, "id_b")
        .withColumn("dist", F.levenshtein("pa", "pb", _MAX_DIST))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= _MAX_DIST))
        .select("id_a", "id_b", "dist")
        .orderBy("id_a", "id_b")
    )


FUZZY_MATCH_SQL = f"""
WITH d AS (
  SELECT doc_id,
         substring(text, 1, {_PREFIX_LEN}) AS prefix,
         substring(text, 1, {_BLOCK_LEN}) AS block
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.prefix, b.prefix) AS dist
FROM d a JOIN d b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= {_MAX_DIST}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# Exact-moment linear regression (per-group OLS)
# ---------------------------------------------------------------------------


def linreg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (extended price on quantity)
    assembled from exact decimal moments — the distributed one-pass OLS
    that `regr_slope`/`regr_intercept` compute, but with engine-exact
    sums so the result hash-matches across engines (built-in regr_*
    aggregates accumulate in floating point in engine-specific orders;
    the sibling corr_exact query established this moment-assembly
    pattern). One shuffle on the 3-key group."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(28,4)")).cast("double").alias("sxx"),
        F.sum((x * y).cast("decimal(30,4)")).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / n
    )
    return m.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / n).alias("intercept"),
    ).orderBy("l_returnflag")


LINREG_SQL = """
WITH m AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (sxy - sx * sy / CAST(n AS DOUBLE)) / (sxx - sx * sx / CAST(n AS DOUBLE)) AS slope,
       (sy - (sxy - sx * sy / CAST(n AS DOUBLE)) / (sxx - sx * sx / CAST(n AS DOUBLE)) * sx) / CAST(n AS DOUBLE) AS intercept
FROM m ORDER BY l_returnflag
"""


ANALYTICS5_QUERIES = {
    "incremental_rollup_monthly": incremental_rollup_monthly,
    "event_transitions": event_transitions,
    "fuzzy_match_docs": fuzzy_match_docs,
    "linreg_exact": linreg_exact,
}

ANALYTICS5_ORACLE_SQL = {
    "incremental_rollup_monthly": INCREMENTAL_ROLLUP_SQL,
    "event_transitions": EVENT_TRANSITIONS_SQL,
    "fuzzy_match_docs": FUZZY_MATCH_SQL,
    "linreg_exact": LINREG_SQL,
}
