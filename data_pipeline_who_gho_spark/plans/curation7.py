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
# oracle can rebuild the histogram from characters
MEDIA_BYTE_FEATURES_SQL = """
WITH chars AS (
  SELECT doc_id, ascii(c) AS byte
  FROM documents, unnest(split(text, '')) AS t(c)
),
per_byte AS (
  SELECT doc_id, byte, COUNT(*) AS cnt FROM chars GROUP BY doc_id, byte
),
ranked AS (
  SELECT doc_id, byte, cnt,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, byte) AS rn
  FROM per_byte
)
SELECT p.doc_id,
       CAST(SUM(p.cnt) AS BIGINT) AS n_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_bytes,
       CAST(MAX(CASE WHEN r.rn = 1 THEN r.byte END) AS BIGINT) AS top_byte,
       CAST(MAX(CASE WHEN r.rn = 1 THEN r.cnt END) AS BIGINT) AS top_count
FROM per_byte p
JOIN ranked r ON p.doc_id = r.doc_id AND p.byte = r.byte
GROUP BY p.doc_id
"""


CURATION7_QUERIES = {
    "gopher_quality_flags": gopher_quality_flags,
    "media_byte_features": media_byte_features,
}

CURATION7_ORACLE_SQL = {
    "gopher_quality_flags": GOPHER_QUALITY_SQL,
    "media_byte_features": MEDIA_BYTE_FEATURES_SQL,
}
