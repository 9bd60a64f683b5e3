"""Vector/embedding analytics beyond nearest-neighbor search: per-label
centroids (class prototypes), per-vector norms, and k-NN majority-vote
classification — the embedding-column toolkit a training-data pipeline
needs next to ANN (plans/extensions.py).

Cross-engine exactness notes:
- Per-vector math (dot, norm) uses left-to-right double folds identical
  to the DuckDB list functions (established by ann_cosine_topk).
- CROSS-vector accumulation (centroids) cannot rely on fold order, so
  components hop float → string → DECIMAL and sum exactly (order-free).
  float→decimal directly is NOT parity-safe (Spark widens the binary
  double expansion, DuckDB rounds the shortest repr — they disagree);
  float→string is the shortest round-trip repr in both engines, so the
  parsed decimal is identical. Scale posture: posexplode + groupBy is
  one shuffle of (label, pos) pairs — no collect, no per-group arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors as VEC
from ..sources.catalog import load_table

_KNN_K = 10
_KNN_PROBE_MOD = 101  # probes = vec_id % 101 == 0 (~1% of corpus)


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elementwise mean embedding per label as (label, pos, centroid)
    rows — the class-prototype primitive (seed for IVF coarse
    quantizers, label drift monitoring). Exact decimal sums make the
    result order-independent, so it hash-matches the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("string").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("label", "pos")
    )


LABEL_CENTROIDS_SQL = """
SELECT label, pos - 1 AS pos,
       CAST(CAST(SUM(CAST(CAST(v AS VARCHAR) AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS centroid,
       COUNT(*) AS n_vectors
FROM (SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos
      FROM embeddings)
GROUP BY label, pos
ORDER BY label, pos
"""


def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm + dimensionality — the embedding-hygiene scan
    (zero/degenerate vectors, un-normalized batches). Map-only, no
    shuffle; the fold is the engine-parity double path."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = VEC.as_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(VEC.norm(v), 6).alias("l2_norm"),
    )


VECTOR_NORMS_SQL = """
SELECT vec_id, label, len(embedding) AS dim,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm
FROM embeddings
"""


def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote label prediction for ~1% probe vectors against
    the full corpus (self excluded): exact cosine, top-10 neighbors,
    vote tie-break by (count desc, label asc). Probe side broadcasts —
    the same exact-kNN plan shape as ann_cosine_topk, plus the vote
    aggregation (one extra narrow shuffle on query_id)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", VEC.as_double(F.col("embedding")).alias("v")
    )
    q = emb.filter(F.col("vec_id") % _KNN_PROBE_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
    )
    joined = F.broadcast(q).join(emb, F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    neighbors = (
        joined.withColumn("cos", VEC.cosine(F.col("qv"), F.col("v")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _KNN_K)
    )
    vw = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), F.col("label"))
    return (
        neighbors.groupBy("query_id", "true_label", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
        .withColumn("vrank", F.row_number().over(vw))
        .filter(F.col("vrank") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("label").alias("predicted_label"),
            "votes",
        )
        .orderBy("query_id")
    )


KNN_CLASSIFY_SQL = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS true_label, v AS qv
      FROM e WHERE vec_id % {_KNN_PROBE_MOD} = 0),
scored AS (
  SELECT query_id, true_label, e.vec_id, e.label,
         list_sum(list_transform(list_zip(qv, v), x -> x[1] * x[2]))
         / (sqrt(list_sum(list_transform(qv, x -> x * x)))
            * sqrt(list_sum(list_transform(v, x -> x * x)))) AS cos
  FROM q JOIN e ON query_id <> e.vec_id
),
ranked AS (
  SELECT query_id, true_label, label,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
),
votes AS (
  SELECT query_id, true_label, label, COUNT(*) AS votes,
         row_number() OVER (PARTITION BY query_id ORDER BY COUNT(*) DESC, label) AS vrank
  FROM ranked WHERE rank <= {_KNN_K}
  GROUP BY query_id, true_label, label
)
SELECT query_id, true_label, label AS predicted_label, votes
FROM votes WHERE vrank = 1
ORDER BY query_id
"""


VECTOR_ANALYTICS_QUERIES = {
    "label_centroids": label_centroids,
    "vector_norms": vector_norms,
    "knn_classify": knn_classify,
}

VECTOR_ANALYTICS_ORACLE_SQL = {
    "label_centroids": LABEL_CENTROIDS_SQL,
    "vector_norms": VECTOR_NORMS_SQL,
    "knn_classify": KNN_CLASSIFY_SQL,
}
