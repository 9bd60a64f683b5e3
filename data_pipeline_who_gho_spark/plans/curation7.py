"""Round-5 curation stages, third set: Gopher-style document quality
flags and exact media byte features.

* ``gopher_quality_flags``: the NON-repetition half of the Gopher
  quality rules (Rae et al., 2021 §A1.1) as per-document flags — word
  count bounds, mean-word-length bounds, and the minimum-stopword
  requirement — composed into one keep decision. Complements
  ``curation6.gopher_repetition_flags`` (the repetition ladder) and
  ``curation.corpus_filter_funnel`` (survivor COUNTS through a
  different cascade); this emits the per-doc decision table a curation
  pipeline joins against. Thresholds are adapted to the fixture corpus
  (single-line, alnum-only; symbol/bullet/ellipsis rules are degenerate
  here and documented out) so every flag is LIVE — both values occur —
  at every scale factor. Map-only: one scan, no shuffle; the mean word
  length is ONE integer division per doc so both engines hold the
  identical double.

* ``media_byte_features``: exact byte-level content features computed
  from the raw payload without decoding — total bytes, distinct byte
  values, and the modal byte with its count — via the Arrow-batched
  integer histogram (``operators/multimodal.extract_byte_counts_arrow``,
  mapInArrow: Arrow buffers in and out, no pandas hop). The scalar
  projection is pure array algebra over the 256-bin histogram
  (aggregate/filter/array_position), so the plan stays map-only after
  the UDF and every output is an exact integer. This gives the
  multimodal family a second hard-signal row that exercises the Arrow
  path itself (multimodal_meta covers sniff/meta only).

The reference has no curation or media surface (pandas observation
upserts, etl/transform.py); these extend the training-data-pipeline
family of SURVEY §2c.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.multimodal import attach_binary, extract_byte_counts_arrow
from ..sources.catalog import load_table
from .extensions import _sql_n_tokens, _sql_tokens

# ---------------------------------------------------------------------------
# Gopher quality flags
# ---------------------------------------------------------------------------

# corpus-adapted bounds (fixture docs span 10..99 words, mean word
# length 3.7..5.3): chosen so both pass and fail occur at every sf
_GQ_MIN_WORDS = 20
_GQ_MAX_WORDS = 80
_GQ_MIN_MWL = "3.9"
_GQ_MAX_MWL = "4.9"
_GQ_MIN_STOP = 2

# the union of all language stopword lists: the corpus is multilingual,
# so an en-only list (Gopher's published rule) would conflate language
# with quality
_GQ_STOPWORDS = sorted({w for ws in TX.STOPWORDS.values() for w in ws})


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Gopher quality decision: word-count bounds, mean word
    length bounds, ≥2 distinct stopwords; kept = all three."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    n_words = F.size("toks")
    char_mass = F.aggregate(
        F.transform(F.col("toks"), F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_stop = sum(
        (
            F.array_contains(F.col("toks"), w).cast("int")
            for w in _GQ_STOPWORDS
        ),
        start=F.lit(0),
    )
    flagged = toks.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(char_mass / n_words, 6).alias("mean_word_len"),
        n_stop.cast("long").alias("n_stop_distinct"),
    ).select(
        "*",
        (
            (F.col("n_words") >= _GQ_MIN_WORDS)
            & (F.col("n_words") <= _GQ_MAX_WORDS)
        ).alias("wc_ok"),
        (
            (F.col("mean_word_len") >= float(_GQ_MIN_MWL))
            & (F.col("mean_word_len") <= float(_GQ_MAX_MWL))
        ).alias("mwl_ok"),
        (F.col("n_stop_distinct") >= _GQ_MIN_STOP).alias("stop_ok"),
    )
    return flagged.select(
        "*",
        (F.col("wc_ok") & F.col("mwl_ok") & F.col("stop_ok")).alias("kept"),
    )


def _gq_sql() -> str:
    toks = _sql_tokens()
    n_words = _sql_n_tokens()
    char_mass = f"list_sum(list_transform({toks}, w -> length(w)))"
    n_stop = " + ".join(
        f"CASE WHEN list_contains({toks}, '{w}') THEN 1 ELSE 0 END"
        for w in _GQ_STOPWORDS
    )
    return f"""
WITH flagged AS (
  SELECT doc_id,
         CAST({n_words} AS BIGINT) AS n_words,
         round(CAST({char_mass} AS DOUBLE) / {n_words}, 6) AS mean_word_len,
         CAST({n_stop} AS BIGINT) AS n_stop_distinct
  FROM documents
)
SELECT doc_id, n_words, mean_word_len, n_stop_distinct,
       (n_words >= {_GQ_MIN_WORDS} AND n_words <= {_GQ_MAX_WORDS}) AS wc_ok,
       (mean_word_len >= {_GQ_MIN_MWL} AND mean_word_len <= {_GQ_MAX_MWL}) AS mwl_ok,
       (n_stop_distinct >= {_GQ_MIN_STOP}) AS stop_ok,
       ((n_words >= {_GQ_MIN_WORDS} AND n_words <= {_GQ_MAX_WORDS})
        AND (mean_word_len >= {_GQ_MIN_MWL} AND mean_word_len <= {_GQ_MAX_MWL})
        AND (n_stop_distinct >= {_GQ_MIN_STOP})) AS kept
FROM flagged
"""


GOPHER_QUALITY_SQL = _gq_sql()


# ---------------------------------------------------------------------------
# Media byte features
# ---------------------------------------------------------------------------


def media_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc exact byte features from the 256-bin integer histogram:
    n_bytes, distinct byte values, modal byte (ties → lowest byte
    value) and its count. The histogram is built in ONE Arrow batch
    pass; the projection is array algebra (no explode, no shuffle)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = extract_byte_counts_arrow(attach_binary(docs))
    top = F.array_max("counts")
    return hist.select(
        "doc_id",
        F.aggregate(
            F.col("counts"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("n_bytes"),
        F.size(F.filter(F.col("counts"), lambda c: c > 0)).cast("long").alias(
            "n_distinct_bytes"
        ),
        # array_position returns the FIRST index of the max (1-based),
        # i.e. the lowest byte value among ties
        (F.array_position(F.col("counts"), top) - F.lit(1)).cast("long").alias(
            "top_byte"
        ),
        top.cast("long").alias("top_count"),
    )


# the payload is the utf-8 encoding of ``text``; the fixture corpus is
# pure ASCII (pinned by test_curation7), so byte == codepoint and the
# oracle can rebuild the histogram from characters. The per-byte rollup
# is LEFT-joined back to a documents anchor with zero defaults: the
# Spark path emits an all-zeros row for an empty-text doc (the
# histogram is zeros, array_max/array_position land on byte 0), and the
# unnest path would otherwise drop it (split('','') yields [''], hence
# the c <> '' guard).
MEDIA_BYTE_FEATURES_SQL = """
WITH chars AS (
  SELECT doc_id, ascii(c) AS byte
  FROM documents, unnest(split(text, '')) AS t(c)
  WHERE c <> ''
),
per_byte AS (
  SELECT doc_id, byte, COUNT(*) AS cnt FROM chars GROUP BY doc_id, byte
),
ranked AS (
  SELECT doc_id, byte, cnt,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, byte) AS rn
  FROM per_byte
),
rolled AS (
  SELECT p.doc_id,
         CAST(SUM(p.cnt) AS BIGINT) AS n_bytes,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_bytes,
         CAST(MAX(CASE WHEN r.rn = 1 THEN r.byte END) AS BIGINT) AS top_byte,
         CAST(MAX(CASE WHEN r.rn = 1 THEN r.cnt END) AS BIGINT) AS top_count
  FROM per_byte p
  JOIN ranked r ON p.doc_id = r.doc_id AND p.byte = r.byte
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       COALESCE(n_bytes, 0) AS n_bytes,
       COALESCE(n_distinct_bytes, 0) AS n_distinct_bytes,
       COALESCE(top_byte, 0) AS top_byte,
       COALESCE(top_count, 0) AS top_count
FROM documents d
LEFT JOIN rolled USING (doc_id)
"""




# ---------------------------------------------------------------------------
# Rank-based score calibration
# ---------------------------------------------------------------------------


def quantile_normalize_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile calibration of the quality score: every doc's score
    mapped to its global percentile pct = (rank-1)/(n-1) — the
    calibration step that makes heuristic scores comparable across
    heterogeneous sources before thresholding (raw score distributions
    differ per source; percentiles don't).

    Scale: the global order comes from ``operators/rank.global_rank``
    (range repartition + parallel local rank + broadcast offsets), so
    no single-partition window; n rides in as one broadcast scalar.
    doc_id breaks score ties, so row_number == rank and the oracle's
    identical formula hash-matches.

    Outputs are FLOOR-micro fixed point (floor(x·1e6) as BIGINT), not
    round(x, 6): the raw doubles are bit-identical across engines
    (IEEE expressions in one order), but round-to-6dp DISAGREES when a
    value lands within 1 ulp of the decimal grid midpoint — Spark
    rounds the exact binary expansion (0.48538749999999997 → .485387)
    while DuckDB rounds the scaled product (x·1e6 snaps to 485387.5 →
    .485388). Found live at sf1 (doc 10003541, a tag-injected text
    that only exists in the derived tier); floor of the identically-
    computed product is engine-exact by construction."""
    from ..operators.rank import global_rank

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", TX.quality_score("text", "n_chars").alias("score")
    )
    ranked = global_rank(docs, ["score", "doc_id"], rank_col="rn")
    total = docs.agg(F.count(F.lit(1)).alias("__n"))
    pct = F.when(F.col("__n") == 1, F.lit(0.0)).otherwise(
        (F.col("rn") - 1).cast("double") / (F.col("__n") - 1).cast("double")
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.floor(F.col("score") * F.lit(1_000_000.0)).cast("long").alias(
                "score_micro"
            ),
            F.floor(pct * F.lit(1_000_000.0)).cast("long").alias("pct_micro"),
        )
        .orderBy("doc_id")
    )


def _qn_sql() -> str:
    from .extensions import _sql_quality

    return f"""
WITH scored AS (
  SELECT doc_id, {_sql_quality()} AS score FROM documents
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score, doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM scored
)
SELECT doc_id,
       CAST(floor(score * 1000000.0) AS BIGINT) AS score_micro,
       CAST(floor((CASE WHEN n = 1 THEN 0.0
                        ELSE CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                   END) * 1000000.0) AS BIGINT) AS pct_micro
FROM ranked
ORDER BY doc_id
"""


QUANTILE_NORMALIZE_SQL = _qn_sql()


# ---------------------------------------------------------------------------
# Embedding standardization
# ---------------------------------------------------------------------------

_STD_Q = 1 << 20  # fixed-point scale: floor(x · 2^20)


def embed_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-standardization of the embedding table — the
    whitening step before cosine/k-means treats dimensions equally.
    Components are fixed-pointed (floor(x·2^20) as BIGINT) so the
    per-dimension sums and sums-of-squares are EXACT integers
    (order-free across shuffles); mean/std/z are then single double
    expressions evaluated in the same order by both engines.

    Scale: one partial-aggregated shuffle keyed by dim (64 groups,
    map-side combined), stats broadcast back into a map-only z pass."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    )
    xq = F.floor(F.col("x").cast("double") * F.lit(float(_STD_Q))).cast("long")
    comp = emb.select("vec_id", "pos", xq.alias("xq"))
    stats = comp.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("s"),
        F.sum(F.col("xq") * F.col("xq")).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = F.col("s2").cast("double") / F.col("n").cast("double") - mean * mean
    sd = F.sqrt(var)
    z = F.when(sd > 0, (F.col("xq").cast("double") - mean) / sd)
    # + 0.0 folds IEEE negative zero (xq == mean) to +0.0 — the one
    # double whose SIGN differs between engines after the division
    return (
        comp.join(F.broadcast(stats), "pos")
        .select("vec_id", "pos", (F.round(z, 6) + F.lit(0.0)).alias("z"))
        .orderBy("vec_id", "pos")
    )


EMBED_STANDARDIZE_SQL = f"""
WITH comp AS (
  SELECT vec_id, pos - 1 AS pos,
         CAST(floor(CAST(x AS DOUBLE) * {float(_STD_Q)}) AS BIGINT) AS xq
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings)
),
stats AS (
  SELECT pos, COUNT(*) AS n,
         CAST(SUM(xq) AS BIGINT) AS s,
         CAST(SUM(xq * xq) AS BIGINT) AS s2
  FROM comp GROUP BY pos
)
SELECT c.vec_id, c.pos,
       round(CASE WHEN sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                            - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                              * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) > 0
                  THEN (CAST(c.xq AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       / sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             END, 6) + 0.0 AS z
FROM comp c JOIN stats USING (pos)
ORDER BY c.vec_id, c.pos
"""


CURATION7_QUERIES = {
    "gopher_quality_flags": gopher_quality_flags,
    "media_byte_features": media_byte_features,
    "quantile_normalize_scores": quantile_normalize_scores,
    "embed_standardize": embed_standardize,
}

CURATION7_ORACLE_SQL = {
    "gopher_quality_flags": GOPHER_QUALITY_SQL,
    "media_byte_features": MEDIA_BYTE_FEATURES_SQL,
    "quantile_normalize_scores": QUANTILE_NORMALIZE_SQL,
    "embed_standardize": EMBED_STANDARDIZE_SQL,
}
