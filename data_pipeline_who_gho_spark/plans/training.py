"""Training-data pipeline operators (north-star extensions beyond the
reference surface): deterministic hash-based dataset splits, benchmark
contamination detection, fixed-size document chunking, and PII
redaction. The reference (a WHO ETL pipeline) has none of these; they
generalize its cleaning/validation layer toward LLM-corpus curation.

All pure Catalyst expressions — map-only stages except the
contamination join, whose shuffle volume is bounded by shingle document
frequency (inverted-index join), the same scale posture as
plans/extensions.py dedup. At 100 TB: the hash split is embarrassingly
parallel (no shuffle at all); chunking is a per-row explode with output
size proportional to token count (no skew — one doc never exceeds one
task); contamination joins shingle postings, never full documents.

Cross-engine determinism: the split uses md5 (available in both Spark
and DuckDB), with hex nibbles folded to an integer via instr arithmetic
(both engines lack a shared hex→int cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

# ---------------------------------------------------------------------------
# Deterministic hash split (train/val/test)
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def _sql_nibble(h: str, i: int) -> str:
    # instr/substring have identical 1-based semantics in Spark SQL and DuckDB
    return f"(instr('{_HEX}', substring({h}, {i}, 1)) - 1)"


def _nibble(h_name: str, i: int) -> F.Column:
    return F.expr(_sql_nibble(h_name, i))


def train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to train/val/test by md5(doc_id) bucket
    (stable under reshuffling and re-ingestion — the property a
    row_number split lacks), then summarize per split.

    80/10/10 by folding the first 4 hex nibbles into an int mod 10.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    docs = docs.withColumn("h", h)
    bucket = (
        ((_nibble("h", 1) * 16 + _nibble("h", 2)) * 16 + _nibble("h", 3)) * 16
        + _nibble("h", 4)
    ) % 10
    split = (
        F.when(bucket <= 7, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


_SPLIT_BUCKET_SQL = (
    f"((({_sql_nibble('h', 1)} * 16 + {_sql_nibble('h', 2)}) * 16 + "
    f"{_sql_nibble('h', 3)}) * 16 + {_sql_nibble('h', 4)}) % 10"
)

TRAIN_SPLIT_SQL = f"""
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM (
  SELECT *, CASE WHEN {_SPLIT_BUCKET_SQL} <= 7 THEN 'train'
                 WHEN {_SPLIT_BUCKET_SQL} = 8 THEN 'val'
                 ELSE 'test' END AS split
  FROM (SELECT *, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
)
GROUP BY split
ORDER BY split
"""

# ---------------------------------------------------------------------------
# Benchmark contamination check (train ∩ eval n-gram overlap)
# ---------------------------------------------------------------------------

_SHINGLE_K = 5

_TOKENS_EXPR = r"split(trim(lower(text)), '\\s+')"
_SHINGLES_EXPR = (
    f"array_distinct(transform(sequence(1, size(w) - {_SHINGLE_K - 1}), "
    f"i -> array_join(slice(w, i, {_SHINGLE_K}), ' ')))"
)


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) rows of distinct word-5-grams; docs shorter
    than K tokens produce none."""
    return (
        docs.select("doc_id", F.expr(_TOKENS_EXPR).alias("w"))
        .filter(F.size("w") >= _SHINGLE_K)
        .select("doc_id", F.explode(F.expr(_SHINGLES_EXPR)).alias("shingle"))
    )


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect training docs that share word-5-grams with a held-out
    benchmark set (doc_id % 10 == 0) — the standard decontamination
    scan before LLM training. Inverted-index join on shingles (shuffle
    bounded by shingle postings, not |train|×|eval|)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = _doc_shingles(docs)
    ev = sh.filter(F.col("doc_id") % 10 == 0).withColumnRenamed("doc_id", "eval_doc")
    tr = sh.filter(F.col("doc_id") % 10 != 0).withColumnRenamed("doc_id", "train_doc")
    return (
        tr.join(ev, "shingle")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
        .orderBy("train_doc", "eval_doc")
    )


_SQL_TOKENS = "regexp_split_to_array(trim(lower(text)), '\\s+')"

CONTAMINATION_SQL = f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(w) - {_SHINGLE_K} + 2),
           i -> array_to_string(w[i:i+{_SHINGLE_K - 1}], ' ')))) AS shingle
  FROM (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents)
  WHERE len(w) >= {_SHINGLE_K}
)
SELECT tr.doc_id AS train_doc, ev.doc_id AS eval_doc, COUNT(*) AS n_shared_ngrams
FROM (SELECT * FROM sh WHERE doc_id % 10 <> 0) tr
JOIN (SELECT * FROM sh WHERE doc_id % 10 = 0) ev USING (shingle)
GROUP BY train_doc, eval_doc
ORDER BY train_doc, eval_doc
"""

# ---------------------------------------------------------------------------
# Fixed-size token chunking (context-window packing)
# ---------------------------------------------------------------------------

_CHUNK = 16


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into fixed ``_CHUNK``-token chunks (the
    pre-training packing primitive). Output stays small: chunk hash +
    token count, not the chunk text. Per-row explode — scales linearly,
    no shuffle."""
    # NULL text would diverge cross-engine (Spark size(NULL) = -1 makes
    # sequence(0, -1) emit descending garbage; DuckDB range(0, NULL)
    # emits nothing) — normalize to '' so both sides produce one
    # single-empty-token chunk
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    w = docs.select("doc_id", F.expr(_TOKENS_EXPR).alias("w"))
    n_chunks = F.ceil(F.size("w") / F.lit(_CHUNK)).cast("int")
    return (
        w.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "doc_id",
            "chunk_idx",
            F.expr(f"slice(w, chunk_idx * {_CHUNK} + 1, {_CHUNK})").alias("c"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("c").alias("n_chunk_tokens"),
            F.md5(F.array_join("c", " ").cast("binary")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


_STRIDE = 8  # overlap = _CHUNK - _STRIDE tokens between consecutive chunks


def doc_chunking_strided(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (window=16, stride=8): each
    chunk starts _STRIDE tokens after the previous, so consecutive
    chunks share _CHUNK−_STRIDE tokens — the standard long-document
    treatment when truncation at hard boundaries would lose cross-chunk
    context. Same map-only, no-shuffle shape as ``doc_chunking``; chunk
    count per doc is ceil(max(n−overlap, 1)/stride)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    w = docs.select("doc_id", F.expr(_TOKENS_EXPR).alias("w"))
    overlap = _CHUNK - _STRIDE
    n_chunks = F.ceil(
        F.greatest(F.size("w") - F.lit(overlap), F.lit(1)) / F.lit(_STRIDE)
    ).cast("int")
    return (
        w.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "doc_id",
            "chunk_idx",
            F.expr(f"slice(w, chunk_idx * {_STRIDE} + 1, {_CHUNK})").alias("c"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("c").alias("n_chunk_tokens"),
            F.md5(F.array_join("c", " ").cast("binary")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


CHUNKING_STRIDED_SQL = f"""
SELECT doc_id, chunk_idx,
       len(list_slice(w, chunk_idx * {_STRIDE} + 1, chunk_idx * {_STRIDE} + {_CHUNK})) AS n_chunk_tokens,
       md5(array_to_string(list_slice(w, chunk_idx * {_STRIDE} + 1, chunk_idx * {_STRIDE} + {_CHUNK}), ' ')) AS chunk_hash
FROM (
  SELECT doc_id, w,
         unnest(range(0, CAST(ceil(greatest(len(w) - {_CHUNK - _STRIDE}, 1) / {_STRIDE}.0) AS INT))) AS chunk_idx
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(coalesce(text, ''))), '\\s+') AS w
        FROM documents)
)
ORDER BY doc_id, chunk_idx
"""


CHUNKING_SQL = f"""
SELECT doc_id, chunk_idx,
       len(list_slice(w, chunk_idx * {_CHUNK} + 1, chunk_idx * {_CHUNK} + {_CHUNK})) AS n_chunk_tokens,
       md5(array_to_string(list_slice(w, chunk_idx * {_CHUNK} + 1, chunk_idx * {_CHUNK} + {_CHUNK}), ' ')) AS chunk_hash
FROM (
  SELECT doc_id, w, unnest(range(0, CAST(ceil(len(w) / {_CHUNK}.0) AS INT))) AS chunk_idx
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(coalesce(text, ''))), '\\s+') AS w
        FROM documents)
)
ORDER BY doc_id, chunk_idx
"""

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
_PHONE_RE = r"\+1-555-[0-9]{4}"


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub emails/phone numbers from document text (corpus hygiene).
    Fixture text contains no PII, so a deterministic contact line is
    appended per doc first — the redaction then has real work to do and
    the oracle checks both the counts and the redacted payload hash."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    contact = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    aug = docs.select("doc_id", contact.alias("aug"))
    red = F.regexp_replace(
        F.regexp_replace("aug", F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_PHONE_RE),
        F.lit("<PHONE>"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count("aug", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("aug", F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(red.cast("binary")).alias("redacted_hash"),
    )


PII_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(aug, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(aug, '\\+1-555-[0-9]{{4}}')) AS n_phones,
       md5(regexp_replace(regexp_replace(aug, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '\\+1-555-[0-9]{{4}}', '<PHONE>', 'g')) AS redacted_hash
FROM (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary & TF-IDF
# ---------------------------------------------------------------------------

_VOCAB_K = 100


def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary extraction: top-100 tokens by total frequency
    with document frequency — the tokenizer-training / stopword-mining
    primitive. One explode + one aggregation; count-distinct of doc_id
    is partial-aggregated by Catalyst."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(F.expr(_TOKENS_EXPR)).alias("token"))
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf_total"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf_total").desc(), F.col("token"))
        .limit(_VOCAB_K)
    )


VOCAB_SQL = f"""
SELECT token, COUNT(*) AS tf_total, COUNT(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents)
GROUP BY token
ORDER BY tf_total DESC, token
LIMIT {_VOCAB_K}
"""


def tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most characteristic term per document by TF-IDF (tf × ln(N/df)).
    The idf join broadcasts (vocabulary ≪ corpus); scores are doubles
    with an identical expression tree in the oracle, so ranking and
    values hash-match. Deterministic tie-break on the token."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(F.expr(_TOKENS_EXPR)).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("token").alias("top_term"), "tf", "df", "tfidf")
        .orderBy("doc_id")
    )


TFIDF_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
scored AS (
  SELECT doc_id, token, tf, df,
         CAST(tf AS DOUBLE) * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf
  FROM tf JOIN df USING (token)
)
SELECT doc_id, token AS top_term, tf, df, tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn FROM scored)
WHERE rn = 1
ORDER BY doc_id
"""


TRAINING_QUERIES = {
    "train_split_assign": train_split_assign,
    "contamination_check": contamination_check,
    "doc_chunking": doc_chunking,
    "doc_chunking_strided": doc_chunking_strided,
    "pii_redaction": pii_redaction,
    "vocab_top_tokens": vocab_top_tokens,
    "tfidf_top_term": tfidf_top_term,
}

TRAINING_ORACLE_SQL = {
    "train_split_assign": TRAIN_SPLIT_SQL,
    "contamination_check": CONTAMINATION_SQL,
    "doc_chunking": CHUNKING_SQL,
    "doc_chunking_strided": CHUNKING_STRIDED_SQL,
    "pii_redaction": PII_SQL,
    "vocab_top_tokens": VOCAB_SQL,
    "tfidf_top_term": TFIDF_SQL,
}
