"""Fourth analytics batch: warehouse-maintenance and scan-side
operators the earlier batches didn't cover — SCD2-style islands
collapse (gaps-and-islands), sweep-line interval concurrency,
deterministic hash sampling, exact heavy hitters via a Misra-Gries
candidate pass, int8 embedding quantization, text normalization, and
robust (median/IQR/MAD) statistics.

Reference parity anchors: the reference has no analytics operators
beyond §2b SQL (SURVEY §2c documents the absent categories); these are
north-star scale extensions. Dedup-with-history (islands) generalizes
the reference's keyed dedup `etl/transform.py:45-48` to a *versioned*
dimension (SCD2) instead of keep-first.

Cross-engine exactness: every float expression is either a min/max of
stored values (exact), an identical-operand identical-shape IEEE tree
(bit-equal across engines, memory/oracle-parity-rules), or an exact
dyadic interpolation (quantile_cont over integer-valued doubles).
Deterministic sampling reuses the md5 nibble-fold from
plans/training.py (instr arithmetic — the only hex→int path shared by
both engines).

Scale posture (100 TB): islands and sweep-line are single-shuffle
window plans partitioned by a high-cardinality key (user_id) or a
bounded key with pre-aggregated input (event_type × distinct second);
sampling is map-only (no shuffle at all — the reason hash sampling
beats `TABLESAMPLE` for reproducibility); heavy hitters shuffle only
the candidate re-count (a few hundred keys) instead of the full
vocabulary; quantization broadcasts 64 per-dimension stats rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.sketches import misra_gries_partial
from ..sources.catalog import load_table
from .training import _sql_nibble


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# SCD2 / gaps-and-islands: collapse consecutive runs into validity ranges
# ---------------------------------------------------------------------------


def scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse each user's event stream into SCD2-style versioned rows:
    consecutive events with the same event_type become one row with
    [valid_from, valid_to] and a run length (gaps-and-islands via
    lag + running change-count). One shuffle on user_id; the two window
    functions share the same (user_id | ts, event_id) sort.

    Generalizes the reference's keep-first dedup (etl/transform.py:45-48)
    into dedup-with-history: instead of discarding repeated states it
    records when each state started and ended — the standard SCD2 load.
    """
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    ).cast("int")
    run = ev.withColumn("island", F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    return (
        run.groupBy("user_id", "island", "event_type")
        .agg(
            F.min("ts").alias("valid_from"),
            F.max("ts").alias("valid_to"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("island")
    )


SCD2_USER_STATUS_SQL = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id, event_type, ts,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT user_id, event_type,
       MIN(ts) AS valid_from, MAX(ts) AS valid_to, COUNT(*) AS n_events
FROM runs GROUP BY user_id, island, event_type
"""


# ---------------------------------------------------------------------------
# Sweep-line interval concurrency
# ---------------------------------------------------------------------------


def max_concurrent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event_type, treating each event as active
    for the half-open interval [ts, ts + 10 minutes): classic sweep
    line — ±1 deltas, pre-summed per timestamp so the running-sum
    window sees a unique sort key (deterministic), then max prefix sum.
    Processing ends before starts at a tied instant is exactly the
    half-open semantic, and collapsing a tie to its net delta never
    hides a maximum (the interleaved value prev - ends is a minimum).
    """
    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    deltas = ev.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("d")).unionAll(
        ev.select(
            "event_type",
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    net = deltas.groupBy("event_type", "t").agg(F.sum("d").alias("net"))
    w = Window.partitionBy("event_type").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        net.withColumn("running", F.sum("net").over(w))
        .groupBy("event_type")
        .agg(F.max("running").alias("max_concurrent"))
        .orderBy("event_type")
    )


MAX_CONCURRENT_EVENTS_SQL = """
WITH deltas AS (
  SELECT event_type, ts AS t, 1 AS d FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 10 MINUTE AS t, -1 AS d FROM events
), net AS (
  SELECT event_type, t, SUM(d) AS net FROM deltas GROUP BY event_type, t
)
SELECT event_type,
       CAST(MAX(running) AS BIGINT) AS max_concurrent
FROM (
  SELECT event_type,
         SUM(net) OVER (PARTITION BY event_type ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM net
)
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Deterministic hash sampling (map-only, reshuffle-stable)
# ---------------------------------------------------------------------------

_BUCKET_SQL = (
    f"((({_sql_nibble('h', 1)} * 16 + {_sql_nibble('h', 2)}) * 16 + "
    f"{_sql_nibble('h', 3)}) * 16 + {_sql_nibble('h', 4)}) % 100"
)


def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10 % deterministic Bernoulli sample of orders by md5(o_orderkey)
    bucket, reported per order priority: sampled/total counts and exact
    sampled revenue. Hash sampling (vs TABLESAMPLE) is reproducible
    across runs, engines, and repartitioning — the property training
    splits and A/B scans need. Map-only sample + one aggregation; at
    100 TB the sample never materializes separately from its summary.
    """
    o = _t(spark, sf_dir, "orders").withColumn(
        "h", F.md5(F.col("o_orderkey").cast("string").cast("binary"))
    )
    sampled = F.expr(_BUCKET_SQL) < 10
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(sampled.cast("int")).alias("n_sampled"),
            # decimal-exact sum, surfaced as double (driver canonicalizes
            # Decimal objects differently from DuckDB's float64)
            F.sum(
                F.when(sampled, F.col("o_totalprice").cast("decimal(14,2)")).otherwise(
                    F.lit(None)
                )
            )
            .cast("double")
            .alias("sampled_revenue"),
        )
        .orderBy("o_orderpriority")
    )


SAMPLE_HASH_STRATIFIED_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {_BUCKET_SQL} < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(CAST(SUM(CASE WHEN {_BUCKET_SQL} < 10
                THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS VARCHAR) AS DOUBLE)
         AS sampled_revenue
FROM (SELECT o_orderpriority, o_totalprice,
             md5(CAST(o_orderkey AS VARCHAR)) AS h
      FROM orders)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Exact heavy hitters via Misra-Gries candidates
# ---------------------------------------------------------------------------

_HH_K = 50

_TOKENS_EXPR = r"split(trim(lower(text)), '\\s+')"


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens with frequency > n/k (k=50) and their exact counts.

    Plan: per-partition Misra-Gries summaries (mapInPandas, ≤ k-1
    counters each, plus a sentinel row carrying the partition's exact
    token count — stream length and candidates come from ONE pass) →
    tiny candidate set (provable superset of every global heavy hitter)
    → broadcast semi-join re-count of candidates only → filter by the
    exact threshold. Two corpus scans total (sketch, re-count); the
    full vocabulary is never shuffled; the oracle is the plain exact
    GROUP BY ... HAVING, so the sketch path must reproduce the exact
    answer.
    """
    docs = _t(spark, sf_dir, "documents").select("text")
    tok = docs.select(F.explode(F.expr(_TOKENS_EXPR)).alias("token"))
    # materialize the (tiny: ≤ k rows/partition) summary once — it feeds
    # two branches (candidates + total), and lazily each branch would
    # re-run the whole sketch pass; localCheckpoint storage is reclaimed
    # by the ContextCleaner when the DataFrame is garbage-collected
    summary = tok.mapInPandas(
        misra_gries_partial(_HH_K), "token string, est long, is_total boolean"
    ).localCheckpoint(eager=True)
    candidates = summary.filter(~F.col("is_total")).select("token").distinct()
    total = summary.filter("is_total").groupBy().agg(
        F.sum("est").alias("n_tokens")
    )
    counted = (
        tok.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * _HH_K > F.col("n_tokens"))
        .select("token", "cnt")
        .orderBy(F.desc("cnt"), "token")
    )


HEAVY_HITTERS_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
  FROM documents
)
SELECT token, COUNT(*) AS cnt
FROM tok
GROUP BY token
HAVING COUNT(*) * {_HH_K} > (SELECT COUNT(*) FROM tok)
ORDER BY cnt DESC, token
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization of embeddings
# ---------------------------------------------------------------------------


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization audit: global min/max per
    dimension (pass 1, 64 rows, broadcast back), quantize every value
    to [-128, 127] with floor(x + 0.5) (identical across engines, unlike
    round's engine-specific half-rule), and report per-dimension range,
    quantized extremes, and max reconstruction error. Two scans + one
    broadcast join; no shuffle wider than 64 keys ever happens — the
    vector-compression preprocessing step of an ANN/vector-store
    pipeline at corpus scale.
    """
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
    stats = ex.groupBy("pos").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    j = ex.join(F.broadcast(stats), "pos")
    vd = F.col("v").cast("double")
    lod = F.col("lo").cast("double")
    hid = F.col("hi").cast("double")
    q = F.when(hid == lod, F.lit(0)).otherwise(
        F.floor(((vd - lod) * 255) / (hid - lod) + 0.5) - 128
    )
    dq = lod + ((q + 128).cast("double") * (hid - lod)) / 255
    err = F.abs(vd - dq)
    return (
        j.select("pos", lod.alias("lod"), hid.alias("hid"), q.alias("q"), err.alias("err"))
        .groupBy("pos")
        .agg(
            F.first("lod").alias("lo"),
            F.first("hid").alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
            F.max("err").alias("max_abs_err"),
        )
        .orderBy("pos")
    )


QUANTIZE_EMBEDDINGS_SQL = """
WITH ex AS (
  SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) - 1 AS pos
  FROM embeddings
), st AS (
  SELECT pos, MIN(v) AS lo, MAX(v) AS hi FROM ex GROUP BY pos
), qz AS (
  SELECT ex.pos,
         CAST(lo AS DOUBLE) AS lod,
         CAST(hi AS DOUBLE) AS hid,
         CASE WHEN CAST(hi AS DOUBLE) = CAST(lo AS DOUBLE) THEN 0
              ELSE CAST(floor(((CAST(v AS DOUBLE) - CAST(lo AS DOUBLE)) * 255)
                              / (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) + 0.5) AS BIGINT) - 128
         END AS q,
         CAST(v AS DOUBLE) AS vd
  FROM ex JOIN st USING (pos)
)
SELECT pos,
       MIN(lod) AS lo, MIN(hid) AS hi,
       COUNT(*) AS n,
       MIN(q) AS min_q, MAX(q) AS max_q,
       MAX(abs(vd - (lod + (CAST(q + 128 AS DOUBLE) * (hid - lod)) / 255))) AS max_abs_err
FROM qz
GROUP BY pos
ORDER BY pos
"""


# ---------------------------------------------------------------------------
# Text normalization (cleaning pass)
# ---------------------------------------------------------------------------


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text-cleaning pass: lowercase, strip non-alphanumerics,
    collapse whitespace — reported as a content fingerprint plus
    before/after size stats (the normalize step that feeds exact dedup;
    dedup_exact fingerprints raw text, this is the robust variant).
    Map-only; regexes are RE2-safe (no backtracking constructs) so Java
    and RE2 agree.
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.md5(cleaned.cast("binary")).alias("clean_hash"),
        F.length(cleaned).alias("n_chars_clean"),
        F.col("n_chars").alias("n_chars_raw"),
        F.size(F.regexp_extract_all(cleaned, F.lit("[a-z0-9]+"), F.lit(0))).alias(
            "n_words"
        ),
    )


TEXT_NORMALIZE_SQL = """
SELECT doc_id,
       md5(cleaned) AS clean_hash,
       length(cleaned) AS n_chars_clean,
       n_chars AS n_chars_raw,
       len(regexp_extract_all(cleaned, '[a-z0-9]+')) AS n_words
FROM (
  SELECT doc_id, n_chars,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS cleaned
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# Robust statistics: median / IQR / MAD per group
# ---------------------------------------------------------------------------


def robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median, IQR, and MAD (median absolute deviation) of l_quantity
    per return flag — the outlier-robust complement to the exact-moment
    z-score query. Two aggregation passes (the second over |x - median|)
    joined on a 3-row broadcast key; interpolations land on dyadic
    fractions of integer-valued doubles, so every figure is IEEE-exact
    across engines.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median"),
        (F.percentile("l_quantity", 0.75) - F.percentile("l_quantity", 0.25)).alias("iqr"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("median").alias("median"),
            F.first("iqr").alias("iqr"),
            F.first("n").alias("n"),
            F.percentile(F.abs(F.col("l_quantity") - F.col("median")), 0.5).alias("mad"),
        )
        .orderBy("l_returnflag")
    )


ROBUST_STATS_SQL = """
WITH med AS (
  SELECT l_returnflag,
         quantile_cont(l_quantity, 0.5) AS median,
         quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25) AS iqr,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       MIN(median) AS median,
       MIN(iqr) AS iqr,
       MIN(n) AS n,
       quantile_cont(abs(l.l_quantity - med.median), 0.5) AS mad
FROM lineitem l JOIN med USING (l_returnflag)
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


ANALYTICS4_QUERIES = {
    "scd2_user_status": scd2_user_status,
    "max_concurrent_events": max_concurrent_events,
    "sample_hash_stratified": sample_hash_stratified,
    "heavy_hitters": heavy_hitters,
    "quantize_embeddings": quantize_embeddings,
    "text_normalize": text_normalize,
    "robust_stats": robust_stats,
}

ANALYTICS4_ORACLE_SQL = {
    "scd2_user_status": SCD2_USER_STATUS_SQL,
    "max_concurrent_events": MAX_CONCURRENT_EVENTS_SQL,
    "sample_hash_stratified": SAMPLE_HASH_STRATIFIED_SQL,
    "heavy_hitters": HEAVY_HITTERS_SQL,
    "quantize_embeddings": QUANTIZE_EMBEDDINGS_SQL,
    "text_normalize": TEXT_NORMALIZE_SQL,
    "robust_stats": ROBUST_STATS_SQL,
}
