"""Corpus export-side operators: deterministic training-order shuffle
and feature-hashed document vectors.

* ``train_order_shuffle``: the seeded global shuffle that fixes the
  order training examples are consumed in. Production trainers need the
  order to be (a) uniform — no residual source/time locality from the
  ingest layout — and (b) reproducible across re-runs and engine
  versions, so it is defined as a *sort*, not an RNG: every document
  gets the key ``md5(seed ∥ doc_id)`` and the training order is the
  total order (key, doc_id). Re-ingesting the same corpus under any
  partitioning yields byte-identical order. The reference has no
  ordering op (its loads are unordered UPSERTs, ``etl/load.py:14-58``);
  this is the export-side complement of ``shard_manifest``
  (plans/curation2.py).
* ``hashed_doc_vectors``: text → dense vector by the hashing trick
  (Weinberger et al., 2009): tokens are hashed into ``_HASH_DIM``
  buckets, per-bucket counts form the raw vector, L2-normalized. This
  is the cheap embedding-generation stage of a curation pipeline — the
  vectors feed the ANN / k-means / semantic-dedup operators
  (plans/extensions.py, plans/vector_analytics.py) when no learned
  encoder is available, and the op doubles as the plumbing template for
  one (swap the hash kernel for a model UDF).

Scale notes
-----------
- train_order_shuffle: the global order comes from
  ``operators.rank.global_rank`` — repartitionByRange on the shuffle
  key, per-partition local rank, broadcast prefix offsets — NOT an
  unpartitioned window, so no single task ever sees the whole corpus.
  One range shuffle + one #partitions-row broadcast: the minimum for a
  total order at 100 TB.
- hashed_doc_vectors: tokenize/hash is map-only; one partial-agg'd
  shuffle on (doc_id, bucket); one narrow per-doc agg to densify.
  Vector assembly builds a 16-entry map per doc — constant state per
  row, no corpus-scale arrays cross any shuffle.

Cross-engine exactness: bucket ids come from the shared md5-nibble
kernel (plans/training.py); norms are sqrt of exact integer sums and
components one double division each, so the doubles are bit-identical
in both engines before the final round(6).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.rank import global_rank
from ..sources.catalog import load_table
from .training import _nibble, _sql_nibble

_SHUFFLE_SEED = "epoch0"
_HASH_DIM = 16


def train_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global training order: position i is the
    rank of md5('epoch0:' ∥ doc_id) with doc_id as tiebreak. Changing
    the seed string re-deals the whole order (a fresh epoch permutation)
    without touching any data."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(
            F.concat(F.lit(_SHUFFLE_SEED + ":"), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    )
    ranked = global_rank(keyed, ["shuffle_key", "doc_id"], rank_col="position")
    return ranked.select("position", "doc_id", "source", "shuffle_key").orderBy(
        "position"
    )


TRAIN_ORDER_SHUFFLE_SQL = f"""
SELECT row_number() OVER (ORDER BY md5('{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id)
         AS position,
       doc_id, source,
       md5('{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM documents
ORDER BY position
"""


def _hashed_token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket, cnt): tokenize, hash each token into
    ``_HASH_DIM`` buckets via the shared md5-nibble kernel, count per
    (doc, bucket). THE single definition of the feature-hashing
    contract — hashed_doc_vectors and quality_classifier_score (and
    their SQL twins via _HASHED_COUNTS_SQL) must agree on it."""
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("word")
    ).filter(F.length("word") > 0)
    return (
        toks.withColumn("h", F.md5("word"))
        .select("doc_id", _nibble("h", 1).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _hashed_counts_sql() -> str:
    """The tok/c CTE pair matching ``_hashed_token_counts``."""
    return f"""tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
  FROM documents
),
c AS (
  SELECT doc_id, {_sql_nibble("md5(word)", 1)} AS bucket, COUNT(*) AS cnt
  FROM tok WHERE length(word) > 0
  GROUP BY doc_id, bucket
)"""


_HASHED_COUNTS_SQL = _hashed_counts_sql()


def hashed_doc_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed document vectors: token → bucket
    ``md5(word)[0]`` (uniform 0..15), per-bucket counts densified to a
    ``_HASH_DIM``-component L2-normalized double vector. Empty docs get
    the zero vector (norm guard), so every doc_id appears."""
    return _hashed_doc_vectors_unsorted(spark, sf_dir).orderBy("doc_id")


def _hashed_doc_vectors_unsorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector pipeline without the presentation sort, so the
    components wrapper below doesn't stack a redundant sort pass under
    its own ORDER BY (Catalyst keeps both when a generator sits
    between)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = _hashed_token_counts(docs)
    per_doc = counts.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "cnt"))).alias("m")
    )
    dense = (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(_HASH_DIM - 1)),
                lambda d: F.coalesce(F.element_at(F.col("m"), d), F.lit(0)).cast(
                    "long"
                ),
            ).alias("counts"),
        )
    )
    # r13: the norm fold is staged as a COLUMN before the normalizing
    # transform — inlined, it re-evaluated the whole interpreted
    # aggregate fold inside the per-element lambda (16× per row).
    # Same doubles, same operations, values identical.
    norm = F.sqrt(
        F.aggregate(
            F.col("counts"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    staged = dense.withColumns(
        {
            "n_tokens": F.aggregate(
                "counts", F.lit(0).cast("long"), lambda a, x: a + x
            ),
            "__norm": norm,
        }
    )
    nc = F.col("__norm")
    return staged.select(
        "doc_id",
        "n_tokens",
        F.transform(
            "counts",
            lambda x: F.round(
                F.when(nc == 0, F.lit(0.0)).otherwise(x.cast("double") / nc),
                6,
            ),
        ).alias("vec"),
    )


def hashed_doc_vector_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DRIVER-REGISTERED form of ``hashed_doc_vectors``: same
    vectors, exploded to one ``(doc_id, n_tokens, dim, component)`` row
    per dimension. The array form is the library API; the registered
    result must carry only scalar columns because the correctness
    harness canonicalizes through a pandas lexsort, where a list cell is
    unhashable (the round-3 driver error)."""
    vecs = _hashed_doc_vectors_unsorted(spark, sf_dir)
    out = vecs.select(
        "doc_id",
        "n_tokens",
        F.posexplode("vec").alias("dim", "component"),
    )
    # materialize before the presentation sort: the global ORDER BY's
    # range-bound sampling otherwise executes the whole vector pipeline
    # a second time (r13: 2.8 s -> 1.9 s; rows identical)
    return out.localCheckpoint(eager=True).orderBy("doc_id", "dim")


HASHED_DOC_VECTORS_SQL = f"""
WITH {_HASHED_COUNTS_SQL},
dims AS (SELECT unnest(range(0, {_HASH_DIM})) AS bucket),
dense AS (
  SELECT i.doc_id, d.bucket, COALESCE(c.cnt, 0) AS cnt
  FROM (SELECT doc_id FROM documents) i
  CROSS JOIN dims d
  LEFT JOIN c ON c.doc_id = i.doc_id AND c.bucket = d.bucket
),
norms AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         sqrt(SUM(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE))) AS norm
  FROM dense GROUP BY doc_id
)
SELECT d.doc_id, n.n_tokens, d.bucket AS dim,
       round(CASE WHEN n.norm = 0 THEN 0.0
                  ELSE CAST(d.cnt AS DOUBLE) / n.norm END, 6) AS component
FROM dense d JOIN norms n USING (doc_id)
ORDER BY d.doc_id, dim
"""


_STRAT_SEED = "strat"
_STRAT_VAL_FRAC = 0.1


def stratified_split_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT stratified train/val split: within every source, precisely
    ⌊0.1·n_source⌋ documents go to val, chosen by the seeded md5 order
    (deterministic, re-ingestion-stable). ``train_split_assign``
    (plans/training.py) is the hash-threshold form — O(0) coordination
    but only *approximate* fractions; this is the exact-quota form a
    small-but-critical eval slice needs.

    Scale shape: the within-source rank does NOT use a per-source
    window (one hot source — e.g. web crawl — would funnel through a
    single task). Instead: one scale-safe global rank over
    (source, key) via ``operators/rank.py``, then within-source
    position = global rank − the source's broadcast min-rank offset.
    Per-source counts and offsets are #sources rows — broadcast."""
    return split_stratified(load_table(spark, sf_dir, "documents"))


def split_stratified(docs: DataFrame) -> DataFrame:
    """The reusable core of ``stratified_split_exact``: takes any
    (doc_id, source, ...) DataFrame. A NULL source is one stratum
    (null-safe offset join), matching SQL PARTITION BY semantics."""
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(
            F.concat(F.lit(_STRAT_SEED + ":"), F.col("doc_id").cast("string"))
        ).alias("h"),
    )
    ranked = global_rank(keyed, ["source", "h", "doc_id"], rank_col="rn")
    per_src = ranked.groupBy("source").agg(
        (F.min("rn") - 1).alias("off"), F.count(F.lit(1)).alias("n_src")
    ).withColumnRenamed("source", "src_key")
    # null-safe join: a NULL source is a legitimate stratum — SQL's
    # PARTITION BY groups NULLs together, and a plain equi-join would
    # silently drop those docs (NULL == NULL is never true)
    within = ranked.join(
        F.broadcast(per_src), F.col("source").eqNullSafe(F.col("src_key"))
    ).select(
        "doc_id",
        "source",
        (F.col("rn") - F.col("off")).alias("within_pos"),
        "n_src",
    )
    quota = F.floor(F.col("n_src") * F.lit(_STRAT_VAL_FRAC)).cast("long")
    return within.select(
        "doc_id",
        "source",
        "within_pos",
        F.when(F.col("within_pos") <= quota, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    ).orderBy("doc_id")


STRATIFIED_SPLIT_EXACT_SQL = f"""
WITH k AS (
  SELECT doc_id, source,
         md5('{_STRAT_SEED}:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS within_pos,
         COUNT(*) OVER (PARTITION BY source) AS n_src
  FROM k
)
SELECT doc_id, source, within_pos,
       CASE WHEN within_pos <= CAST(floor(n_src * {_STRAT_VAL_FRAC}) AS BIGINT)
            THEN 'val' ELSE 'train' END AS split
FROM r ORDER BY doc_id
"""


# Shipped linear-classifier weights over the _HASH_DIM hashed-token
# buckets: a MODEL ARTIFACT, derived deterministically from the seed so
# both engines inline the identical literals (the same convention as
# the LSH hyperplanes). Integer weights in [-1000, 1000] keep every
# score an exact BIGINT — no float parity surface at all.
_QC_SEED = "qw"
_QC_WEIGHTS = [
    int(hashlib.md5(f"{_QC_SEED}:{b}".encode()).hexdigest()[:8], 16) % 2001 - 1000
    for b in range(_HASH_DIM)
]


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the fastText/CCNet-style gate):
    score every document with a fixed linear classifier over hashed
    token features — score = Σ_b count_b · w_b with the shipped integer
    weight vector — and flag the keep decision (score > 0).

    This is the apply-side of learned quality filtering: the weights
    are a broadcast-sized model artifact; scoring is the hashed-count
    aggregate (one partial-agg'd shuffle on (doc_id, bucket)) followed
    by a map-only weighted sum per doc. Swapping in real trained
    weights (or a Pandas-UDF encoder for a nonlinear model) changes
    only the artifact, not the plan."""
    docs = load_table(spark, sf_dir, "documents")
    counts = _hashed_token_counts(docs)
    warr = F.array(*[F.lit(w) for w in _QC_WEIGHTS])
    scored = (
        counts.withColumn("w", F.element_at(warr, F.col("bucket") + 1))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("w")).alias("score"),
        )
    )
    # docs with zero tokens score 0 and are dropped by the gate
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("score", F.lit(0)).alias("score"),
            (F.coalesce("score", F.lit(0)) > 0).alias("kept"),
        )
        .orderBy("doc_id")
    )


QUALITY_CLASSIFIER_SCORE_SQL = f"""
WITH {_HASHED_COUNTS_SQL},
scored AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(cnt * ([{", ".join(str(w) for w in _QC_WEIGHTS)}])[bucket + 1])
              AS BIGINT) AS score
  FROM c GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_tokens, 0) AS n_tokens,
       COALESCE(s.score, 0) AS score,
       COALESCE(s.score, 0) > 0 AS kept
FROM (SELECT doc_id FROM documents) d
LEFT JOIN scored s USING (doc_id)
ORDER BY d.doc_id
"""


CURATION3_QUERIES = {
    "train_order_shuffle": train_order_shuffle,
    "hashed_doc_vectors": hashed_doc_vector_components,
    "stratified_split_exact": stratified_split_exact,
    "quality_classifier_score": quality_classifier_score,
}

CURATION3_ORACLE_SQL = {
    "train_order_shuffle": TRAIN_ORDER_SHUFFLE_SQL,
    "hashed_doc_vectors": HASHED_DOC_VECTORS_SQL,
    "stratified_split_exact": STRATIFIED_SPLIT_EXACT_SQL,
    "quality_classifier_score": QUALITY_CLASSIFIER_SCORE_SQL,
}
