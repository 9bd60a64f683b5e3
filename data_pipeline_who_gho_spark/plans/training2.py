"""Training-corpus curation operators, batch 2 (north-star extensions
beyond the reference surface): repetition-based quality filtering,
per-domain quota sampling, OHLC time-series downsampling, and greedy
sequence packing. Together with plans/training.py these cover the
curation loop of a large-scale LLM data pipeline: score → filter →
balance → pack.

Scale posture
-------------
- repetition stats: one explode + per-doc aggregation — shuffle keyed by
  doc_id, no skew (a doc never exceeds one task's bigram count).
- domain quota: window row_number per source plans as WindowGroupLimit
  (top-K never materializes whole groups); deterministic md5 order makes
  the sample reshuffle-stable.
- OHLC: single groupBy with min_by/max_by — partial-aggregated, one
  shuffle; the open/close tie-break key is a zero-padded string so both
  engines compare identically.
- sequence packing: inherently sequential WITHIN a stream, so the corpus
  is split into deterministic hash buckets (the parallel unit at 100 TB:
  thousands of buckets ≈ thousands of independent packers) and packed
  per-bucket with applyInPandas — the documented seam for per-partition
  imperative logic. The oracle replays the same greedy fold as a
  recursive CTE.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.rank import global_rank, ntile_from_rank
from ..sources.catalog import load_table, spread_by_hash

# ---------------------------------------------------------------------------
# Gopher-style repetition / quality stats
# ---------------------------------------------------------------------------

# Flag thresholds in the spirit of Gopher's repetition filters (Rae et al.
# 2021, "Scaling Language Models", table A1): documents dominated by a few
# repeated n-grams are boilerplate/spam. Values are fractions of all
# bigram OCCURRENCES.
TOP_BIGRAM_FRAC_MAX = 0.18
DUP_BIGRAM_FRAC_MAX = 0.30


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics over word bigrams: total/distinct
    bigram counts, fraction of occurrences that are repeats, fraction
    held by the single most common bigram, mean word length, and the
    Gopher-style keep/flag verdict. Exact integer counts, one double
    division each → bit-identical across engines."""
    # spread the one-task single-row-group scan before the bigram
    # explode (r13; no-op at production scale — catalog.spread_by_hash)
    docs = spread_by_hash(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    ).select(
        "doc_id", TX.tokens(F.col("text")).alias("w")
    ).filter(F.size("w") >= 2)
    toks = docs.select(
        "doc_id",
        F.size("w").alias("n_tok"),
        # exact integer character sum → one double division at the end
        F.aggregate("w", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).alias(
            "chars"
        ),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.concat_ws(" ", F.element_at("w", i), F.element_at("w", i + 1)),
            )
        ).alias("bigram"),
    )
    per_bigram = toks.groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("n_tok").alias("n_tok"),  # constant per doc
        F.max("chars").alias("chars"),
    )
    stats = per_bigram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.max("cnt").alias("top_cnt"),
        F.max("n_tok").alias("n_tok"),
        F.max("chars").alias("chars"),
    )
    top_frac = F.col("top_cnt").cast("double") / F.col("n_bigrams").cast("double")
    dup_frac = (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double") / F.col(
        "n_bigrams"
    ).cast("double")
    return stats.select(
        "doc_id",
        "n_bigrams",
        "n_distinct_bigrams",
        dup_frac.alias("dup_bigram_frac"),
        top_frac.alias("top_bigram_frac"),
        (F.col("chars").cast("double") / F.col("n_tok").cast("double")).alias(
            "mean_word_len"
        ),
        (
            (top_frac > TOP_BIGRAM_FRAC_MAX) | (dup_frac > DUP_BIGRAM_FRAC_MAX)
        ).alias("flag_repetitive"),
    )


_SQL_W = "regexp_split_to_array(trim(lower(text)), '\\s+')"

REPETITION_SQL = f"""
WITH t AS (
  SELECT doc_id, w, len(w) AS n_tok,
         CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS chars
  FROM (SELECT doc_id, {_SQL_W} AS w FROM documents)
  WHERE len(w) >= 2
),
bg AS (
  SELECT doc_id, n_tok, chars,
         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM t
),
per_bigram AS (
  SELECT doc_id, bigram, COUNT(*) AS cnt, MAX(n_tok) AS n_tok, MAX(chars) AS chars
  FROM bg GROUP BY doc_id, bigram
),
stats AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
         COUNT(*) AS n_distinct_bigrams, MAX(cnt) AS top_cnt,
         MAX(n_tok) AS n_tok, MAX(chars) AS chars
  FROM per_bigram GROUP BY doc_id
)
SELECT doc_id, n_bigrams, n_distinct_bigrams,
       CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         AS dup_bigram_frac,
       CAST(top_cnt AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_bigram_frac,
       CAST(chars AS DOUBLE) / CAST(n_tok AS DOUBLE) AS mean_word_len,
       (CAST(top_cnt AS DOUBLE) / CAST(n_bigrams AS DOUBLE) > {TOP_BIGRAM_FRAC_MAX}
        OR CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
           > {DUP_BIGRAM_FRAC_MAX}) AS flag_repetitive
FROM stats
"""


# ---------------------------------------------------------------------------
# Per-domain quota sampling
# ---------------------------------------------------------------------------

DOMAIN_QUOTA = 50


def domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance the corpus across domains: keep at most DOMAIN_QUOTA docs
    per source, chosen by deterministic md5 order (reshuffle-stable, no
    RNG). The rank filter plans as WindowGroupLimit, so no group is ever
    materialized beyond the quota."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    h = F.md5(F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DOMAIN_QUOTA)
        .select("doc_id", "source", "rk")
    )


DOMAIN_QUOTA_SQL = f"""
SELECT doc_id, source, rk
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
WHERE rk <= {DOMAIN_QUOTA}
"""


# ---------------------------------------------------------------------------
# OHLC hourly downsampling
# ---------------------------------------------------------------------------

def ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsample: per (event_type, hour) the open/high/low/
    close of ``value`` plus volume and exact turnover. One partial-
    aggregated shuffle. Open/close use min_by/max_by on a zero-padded
    "<epoch-µs>:<event_id>" string key — total order, identical
    lexicographic comparison in both engines (event_id breaks same-µs
    ties). Turnover sums decimals (exact), emitted as double."""
    ev = load_table(spark, sf_dir, "events")
    okey = F.format_string("%020d:%012d", F.unix_micros("ts"), F.col("event_id"))
    return (
        ev.withColumn("okey", okey)
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.min_by("value", F.col("okey")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("okey")).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            F.sum(F.col("value").cast("string").cast("decimal(20,6)"))
            .cast("string")
            .cast("double")
            .alias("turnover"),
        )
    )


OHLC_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       arg_min(value, printf('%020d:%012d', epoch_us(ts), event_id)) AS open,
       MAX(value) AS high, MIN(value) AS low,
       arg_max(value, printf('%020d:%012d', epoch_us(ts), event_id)) AS close,
       COUNT(*) AS volume,
       CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(20,6))) AS VARCHAR)
            AS DOUBLE) AS turnover
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


# ---------------------------------------------------------------------------
# Greedy sequence packing
# ---------------------------------------------------------------------------

PACK_CAP = 256          # max tokens per packed training sequence
PACK_BUCKETS = 32       # independent packing streams (the parallel unit)


def seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into training sequences of ≤ PACK_CAP tokens with
    the standard greedy fold: walk docs in deterministic order, start a
    new sequence whenever the next doc would overflow the cap (an
    over-cap doc gets a sequence of its own). Packing is sequential
    within a stream, so the corpus is split into PACK_BUCKETS hash
    buckets packed independently — at 100 TB the bucket count scales
    with the cluster and applyInPandas keeps each stream in one task.
    The oracle replays the identical fold as a recursive CTE."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            TX.token_count("text").alias("n_tok"),
            F.pmod(F.col("doc_id"), F.lit(PACK_BUCKETS)).alias("bucket"),
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, fills = [], []
        seq_no, fill = 0, 0
        for n in pdf["n_tok"]:
            n = int(n)
            if fill > 0 and fill + n > PACK_CAP:
                seq_no += 1
                fill = 0
            fill += n
            seqs.append(seq_no)
            fills.append(fill)
        pdf["seq_no"] = seqs
        pdf["seq_fill"] = fills
        return pdf[["doc_id", "bucket", "n_tok", "seq_no", "seq_fill"]]

    return docs.groupBy("bucket").applyInPandas(
        pack, "doc_id long, bucket long, n_tok int, seq_no long, seq_fill long"
    )


_SQL_NTOK = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    f"ELSE len({_SQL_W}) END"
)

SEQ_PACKING_SQL = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, doc_id % {PACK_BUCKETS} AS bucket,
         CAST({_SQL_NTOK} AS INT) AS n_tok,
         row_number() OVER (PARTITION BY doc_id % {PACK_BUCKETS} ORDER BY doc_id) AS rn
  FROM documents
),
pack AS (
  SELECT bucket, rn, doc_id, n_tok, CAST(0 AS BIGINT) AS seq_no,
         CAST(n_tok AS BIGINT) AS seq_fill
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.bucket, b.rn, b.doc_id, b.n_tok,
         CASE WHEN p.seq_fill > 0 AND p.seq_fill + b.n_tok > {PACK_CAP}
              THEN p.seq_no + 1 ELSE p.seq_no END,
         CASE WHEN p.seq_fill > 0 AND p.seq_fill + b.n_tok > {PACK_CAP}
              THEN CAST(b.n_tok AS BIGINT) ELSE p.seq_fill + b.n_tok END
  FROM pack p JOIN base b ON b.bucket = p.bucket AND b.rn = p.rn + 1
)
SELECT doc_id, bucket, n_tok, seq_no, seq_fill FROM pack
"""


# ---------------------------------------------------------------------------
# Corpus mixing weights + curriculum ordering
# ---------------------------------------------------------------------------

def source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source resampling weights that rebalance the corpus toward a
    uniform domain mix: weight = (total/n_sources)/n_docs — the knob a
    training pipeline multiplies into per-doc sampling probabilities.
    Exact integer counts; the single double division is bit-identical
    across engines. One partial-aggregated shuffle, then a broadcast-size
    result."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            (
                (F.col("total").cast("double") / F.col("n_sources").cast("double"))
                / F.col("n_docs").cast("double")
            ).alias("weight"),
        )
    )


SOURCE_MIX_SQL = """
WITH per AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total, COUNT(*) AS n_sources FROM per)
SELECT source, n_docs,
       (CAST(total AS DOUBLE) / CAST(n_sources AS DOUBLE)) / CAST(n_docs AS DOUBLE)
         AS weight
FROM per CROSS JOIN tot
"""


CURRICULUM_PHASES = 4


def curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: rank documents by a deterministic quality
    proxy (length-normalized distinct-token ratio) and cut the corpus
    into CURRICULUM_PHASES equal phases, low quality first — the
    easy→hard schedule. A naive ``ntile() OVER (ORDER BY ...)`` is a
    single-partition window; here the global rank comes from
    ``operators.rank.global_rank`` (range repartition → parallel local
    rank → broadcast prefix offsets) and the tile from integer
    arithmetic, so no stage ever serializes the corpus through one
    task. The oracle uses plain ntile — same ANSI bucket sizes."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", TX.tokens(F.col("text")).alias("w")
    ).filter(F.size("w") >= 1)
    scored = docs.select(
        "doc_id",
        (
            F.size(F.array_distinct("w")).cast("double") / F.size("w").cast("double")
        ).alias("quality"),
    )
    ranked = global_rank(scored, ["quality", "doc_id"], rank_col="rn")
    total = scored.agg(F.count(F.lit(1)).alias("total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "quality",
            ntile_from_rank(F.col("rn"), F.col("total"), CURRICULUM_PHASES).alias(
                "phase"
            ),
        )
    )


CURRICULUM_SQL = f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS quality
  FROM (SELECT doc_id, {_SQL_W} AS w FROM documents)
  WHERE len(w) >= 1
)
SELECT doc_id, quality,
       ntile({CURRICULUM_PHASES}) OVER (ORDER BY quality, doc_id) AS phase
FROM scored
"""


TRAINING2_QUERIES = {
    "doc_repetition_stats": doc_repetition_stats,
    "domain_quota_sample": domain_quota_sample,
    "ohlc_hourly": ohlc_hourly,
    "seq_packing": seq_packing,
    "source_mix_weights": source_mix_weights,
    "curriculum_phases": curriculum_phases,
}

TRAINING2_ORACLE_SQL = {
    "doc_repetition_stats": REPETITION_SQL,
    "domain_quota_sample": DOMAIN_QUOTA_SQL,
    "ohlc_hourly": OHLC_SQL,
    "seq_packing": SEQ_PACKING_SQL,
    "source_mix_weights": SOURCE_MIX_SQL,
    "curriculum_phases": CURRICULUM_SQL,
}
