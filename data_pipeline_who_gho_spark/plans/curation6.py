"""Round-5 curation stages, second set: repetition-based quality
flags, cross-source contamination, and tokenizer fertility.

* ``gopher_repetition_flags``: the repetition signals of the Gopher
  quality rules (Rae et al., 2021 §A1.1), adapted to word n-grams
  (the corpus is single-line text, so the line-based variants are
  degenerate here): per document, the fraction of bigram occurrences
  claimed by the single most common bigram and the fraction of
  repeated-trigram occurrences, plus the keep decision at the
  published-style thresholds. Two bounded doc-grain shuffles (n-gram
  grain, then doc grain); every fraction is a ratio of exact integer
  counts so both engines hold identical doubles.

* ``source_overlap_matrix``: pairwise cross-source contamination —
  for every source pair, how many distinct word-5-gram fingerprints
  they share, with the fingerprint-Jaccard of the pair. The join is
  per-fingerprint and each fingerprint carries at most |sources|
  distinct sources, so the pair fan-out is bounded by C(|sources|,2)
  per key — no hot-fingerprint blowup at any corpus size (contrast
  doc-grain near-dup joins, which need the LSH machinery).

* ``tokenizer_fertility``: the per-source tokenizer-efficiency rollup
  a tokenizer-training loop reports — words, BPE tokens, fertility
  (tokens/word), and chars/token under the learned merge table
  (plans/tokenizer._learn). Merge application stays on the
  vocab-bounded symbol table; the corpus-scale stage is one broadcast
  join + one source-grain aggregate.

The reference has no curation surface (its ETL is observation
upserts, etl/load.py:30-52); these extend the training-data-pipeline
family of SURVEY §2c.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources.catalog import load_table
from .extensions import _sql_tokens
from .tokenizer import BPE_STEPS, _bpe_blocks, _learn

# ---------------------------------------------------------------------------
# Gopher-style repetition flags
# ---------------------------------------------------------------------------

# Thresholds adapted to word-grain n-grams (Gopher's published numbers
# are character-fraction thresholds); chosen so the decision is live on
# real corpora rather than vacuously true.
_TOP_BIGRAM_MAX = 0.10
_DUP_TRIGRAM_MAX = 0.05


def _ngrams(toks: F.Column, n: int) -> F.Column:
    """Word n-grams of a token array as space-joined strings; arrays
    shorter than n yield the empty list (guarded — Spark's
    ``sequence(1, 0)`` would otherwise count DOWN)."""
    make = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + k) for k in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, make).otherwise(
        F.array().cast("array<string>")
    )


def _sql_ngrams(toks: str, n: int) -> str:
    parts = " || ' ' || ".join(f"{toks}[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n - 2}), i -> {parts}) "
        f"ELSE [] END"
    )


def gopher_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition signals + keep decision. top_bigram_frac =
    occurrences of the most common bigram / all bigram occurrences
    (ties irrelevant — max count is unique-valued); dup_trigram_frac =
    1 - distinct/total trigram occurrences. Docs too short for a
    bigram report 0.0 and keep = true (every-doc contract)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    bi = toks.select("doc_id", F.explode(_ngrams(F.col("toks"), 2)).alias("g"))
    bi_stats = (
        bi.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("top_bi"),
            F.sum("c").alias("n_bi"),
        )
    )
    tri = toks.select("doc_id", F.explode(_ngrams(F.col("toks"), 3)).alias("g"))
    tri_stats = tri.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tri"),
        F.countDistinct("g").alias("d_tri"),
    )
    top_bi_frac = F.coalesce(
        F.col("top_bi").cast("double") / F.col("n_bi").cast("double"), F.lit(0.0)
    )
    dup_tri_frac = F.coalesce(
        (F.col("n_tri") - F.col("d_tri")).cast("double")
        / F.col("n_tri").cast("double"),
        F.lit(0.0),
    )
    return (
        docs.select("doc_id")
        .join(bi_stats, "doc_id", "left")
        .join(tri_stats, "doc_id", "left")
        .select(
            "doc_id",
            top_bi_frac.alias("top_bigram_frac"),
            dup_tri_frac.alias("dup_trigram_frac"),
            (
                (top_bi_frac <= _TOP_BIGRAM_MAX)
                & (dup_tri_frac <= _DUP_TRIGRAM_MAX)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


GOPHER_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_sql_tokens()} AS toks FROM documents
),
bi AS (
  SELECT doc_id, unnest({_sql_ngrams("toks", 2)}) AS g FROM toks
),
bi_stats AS (
  SELECT doc_id, MAX(c) AS top_bi, CAST(SUM(c) AS BIGINT) AS n_bi
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY doc_id, g)
  GROUP BY doc_id
),
tri AS (
  SELECT doc_id, unnest({_sql_ngrams("toks", 3)}) AS g FROM toks
),
tri_stats AS (
  SELECT doc_id, COUNT(*) AS n_tri, COUNT(DISTINCT g) AS d_tri
  FROM tri GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(CAST(b.top_bi AS DOUBLE) / CAST(b.n_bi AS DOUBLE), 0.0)
         AS top_bigram_frac,
       COALESCE(CAST(t.n_tri - t.d_tri AS DOUBLE) / CAST(t.n_tri AS DOUBLE), 0.0)
         AS dup_trigram_frac,
       COALESCE(CAST(b.top_bi AS DOUBLE) / CAST(b.n_bi AS DOUBLE), 0.0)
           <= {_TOP_BIGRAM_MAX}
         AND COALESCE(CAST(t.n_tri - t.d_tri AS DOUBLE) / CAST(t.n_tri AS DOUBLE),
                      0.0) <= {_DUP_TRIGRAM_MAX} AS keep
FROM (SELECT doc_id FROM documents) d
LEFT JOIN bi_stats b USING (doc_id)
LEFT JOIN tri_stats t USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# cross-source contamination matrix
# ---------------------------------------------------------------------------

_OVERLAP_K = 5


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, shared, jaccard) for every source pair
    sharing at least one distinct word-5-gram fingerprint. The pair
    join is keyed on the fingerprint and each key holds ≤ |sources|
    rows, so fan-out per key is bounded by C(|sources|, 2) regardless
    of how hot the fingerprint is — the scale-safe shape for
    set-overlap rollups."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", TX.tokens(F.col("text")).alias("toks"))
    fs = (
        toks.select(
            "source",
            F.explode(_ngrams(F.col("toks"), _OVERLAP_K)).alias("g"),
        )
        .select("source", F.md5("g").alias("fp"))
        .distinct()
    )
    per_source = fs.groupBy("source").agg(F.count(F.lit(1)).alias("n_fp"))
    a = fs.select(F.col("fp"), F.col("source").alias("source_a"))
    b = fs.select(F.col("fp"), F.col("source").alias("source_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = per_source.select(
        F.col("source").alias("source_a"), F.col("n_fp").alias("n_a")
    )
    nb = per_source.select(
        F.col("source").alias("source_b"), F.col("n_fp").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared",
            (
                F.col("shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


SOURCE_OVERLAP_SQL = f"""
WITH toks AS (
  SELECT source, {_sql_tokens()} AS toks FROM documents
),
fs AS (
  SELECT DISTINCT source, md5(g) AS fp FROM (
    SELECT source, unnest({_sql_ngrams("toks", _OVERLAP_K)}) AS g FROM toks
  )
),
per_source AS (
  SELECT source, COUNT(*) AS n_fp FROM fs GROUP BY source
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM fs a JOIN fs b ON a.fp = b.fp AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT p.source_a, p.source_b, p.shared,
       CAST(p.shared AS DOUBLE)
         / CAST(na.n_fp + nb.n_fp - p.shared AS DOUBLE) AS jaccard
FROM pairs p
JOIN per_source na ON na.source = p.source_a
JOIN per_source nb ON nb.source = p.source_b
ORDER BY p.source_a, p.source_b
"""


# ---------------------------------------------------------------------------
# tokenizer fertility per source
# ---------------------------------------------------------------------------


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer efficiency under the learned BPE merges:
    docs, words, BPE tokens, fertility (tokens per word) and chars per
    token. word → (n_bpe, n_chars) is a property of the vocab-bounded
    symbol table; the corpus-scale stage is one broadcast join + one
    source-grain partial aggregate."""
    _, state = _learn(spark, sf_dir)
    word_stats = state.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_bpe"),
        F.sum(F.length("sym")).alias("n_chars"),
    )
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "source", F.explode(TX.tokens(F.col("text"))).alias("word")
    ).filter(F.length("word") > 0)
    return (
        words.join(F.broadcast(word_stats), "word")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_bpe").cast("long").alias("n_bpe_tokens"),
            (
                F.sum("n_bpe").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("fertility"),
            (
                F.sum("n_chars").cast("double")
                / F.sum("n_bpe").cast("double")
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )


TOKENIZER_FERTILITY_SQL = f"""{_bpe_blocks()},
word_stats AS MATERIALIZED (
  SELECT word, COUNT(*) AS n_bpe, SUM(length(sym)) AS n_chars
  FROM state{BPE_STEPS} GROUP BY word
),
doc_words AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
  FROM documents
)
SELECT source,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_words,
       CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(n_bpe) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fertility,
       CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_bpe) AS DOUBLE)
         AS chars_per_token
FROM doc_words JOIN word_stats USING (word)
WHERE length(word) > 0
GROUP BY source ORDER BY source
"""


CURATION6_QUERIES = {
    "gopher_repetition_flags": gopher_repetition_flags,
    "source_overlap_matrix": source_overlap_matrix,
    "tokenizer_fertility": tokenizer_fertility,
}

CURATION6_ORACLE_SQL = {
    "gopher_repetition_flags": GOPHER_REPETITION_SQL,
    "source_overlap_matrix": SOURCE_OVERLAP_SQL,
    "tokenizer_fertility": TOKENIZER_FERTILITY_SQL,
}
