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


KMEANS_K = 8


def _l2(a: F.Column, b: F.Column) -> F.Column:
    """Squared L2 as a left-to-right fold — same element order as the
    oracle's list functions, so the doubles are bit-identical."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means over the embedding table — the
    semantic-clustering primitive (corpus diversity buckets, IVF
    quantizer training). Deterministic end to end: init centroids are
    the first KMEANS_K vectors, assignment breaks distance ties by
    cluster id, and recomputed centroids use exact decimal sums of the
    raw floats (order-independent) re-assembled to identical doubles in
    both engines via the varchar hop.

    Scale shape: each assignment is a map-only broadcast NLJ against K
    centroids; the centroid update is one partial-aggregated shuffle
    keyed by (cluster, dim). Iterations add plan depth, not data
    movement — the classic Spark k-means layout.
    """
    emb, a1, c1 = _kmeans_state(spark, sf_dir)
    a2 = _assign(emb, c1).select(
        "vec_id", F.col("cluster").alias("cluster_iter2")
    )
    return a1.join(a2, "vec_id").select("vec_id", "cluster_iter1", "cluster_iter2")


def _assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """One Lloyd assignment pass: (vec_id, cluster, d2) of the nearest
    centroid — broadcast-NLJ map, ties broken by cluster id. THE single
    definition of the determinism contract (distance fold + tiebreak);
    every assignment in this module must go through it."""
    w = Window.partitionBy("vec_id").orderBy("d2", "cluster")
    return (
        emb.join(F.broadcast(cents), F.lit(True))
        .withColumn("d2", _l2(F.col("v"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster", "d2")
    )


def _kmeans_state(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared first Lloyd iteration: (emb, iter-1 assignment, updated
    centroids c1). Consumed by kmeans_assign and cluster_prototypes."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", VEC.as_double("embedding").alias("v")
    )
    c0 = emb.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("cv")
    )
    a1 = _assign(emb, c0).select(
        "vec_id", F.col("cluster").alias("cluster_iter1")
    )
    # exact decimal per-dimension means of the RAW floats (same
    # float→string→decimal hop as label_centroids), then varchar→double
    # so both engines assemble the same IEEE centroid
    comp = (
        emb.join(a1, "vec_id")
        .select(F.col("cluster_iter1").alias("cluster"), F.posexplode("embedding").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("string").cast("decimal(20,10)"))
                .cast("string")
                .cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
    )
    c1 = comp.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cv")
    )
    return emb, a1, c1


_PROTO_TOPK = 3


def cluster_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototype selection / diversity sampling: the 3 vectors nearest
    each k-means centroid (after one Lloyd update) — the cluster-level
    representative picking step of embedding-space curation (SemDeDup
    keeps one rep per near-dup cluster; prototype corpora keep the most
    central exemplars per semantic bucket).

    Scale shape: assignment is the same broadcast-NLJ map as
    kmeans_assign; the per-cluster top-3 plans as WindowGroupLimit, so
    every task keeps ≤ 3 rows per cluster locally before the K-row
    shuffle — a hot (big) cluster never funnels its membership through
    one task."""
    emb, _, c1 = _kmeans_state(spark, sf_dir)
    assigned = _assign(emb, c1)
    w_proto = Window.partitionBy("cluster").orderBy("d2", "vec_id")
    return (
        assigned.withColumn("proto_rank", F.row_number().over(w_proto))
        .filter(F.col("proto_rank") <= _PROTO_TOPK)
        .select(
            "cluster",
            "proto_rank",
            "vec_id",
            F.round("d2", 6).alias("d2_centroid"),
        )
        .orderBy("cluster", "proto_rank")
    )


_D2 = "list_sum(list_transform(list_zip(e.v, c.cv), x -> (x[1]-x[2])*(x[1]-x[2])))"

# shared CTE chain: embeddings → init centroids → iter-1 assignment →
# exact-decimal centroid update (c1). Both KMEANS_SQL and
# CLUSTER_PROTOTYPES_SQL extend this prefix.
_KM_BLOCKS = f"""
WITH e AS (SELECT vec_id, embedding, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT vec_id AS cluster, v AS cv FROM e WHERE vec_id < {KMEANS_K}),
a1 AS (
  SELECT vec_id, cluster AS cluster_iter1 FROM (
    SELECT e.vec_id, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {_D2}, c.cluster) AS rn
    FROM e CROSS JOIN c0 c
  ) WHERE rn = 1
),
comp AS (
  SELECT a1.cluster_iter1 AS cluster, u.pos - 1 AS pos,
         CAST(CAST(SUM(CAST(CAST(u.x AS VARCHAR) AS DECIMAL(20,10))) AS VARCHAR)
              AS DOUBLE) / COUNT(*) AS c
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos FROM e) u
  JOIN a1 USING (vec_id)
  GROUP BY cluster, pos
),
c1 AS (SELECT cluster, array_agg(c ORDER BY pos) AS cv FROM comp GROUP BY cluster)"""

KMEANS_SQL = f"""{_KM_BLOCKS},
a2 AS (
  SELECT vec_id, cluster AS cluster_iter2 FROM (
    SELECT e.vec_id, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {_D2}, c.cluster) AS rn
    FROM e CROSS JOIN c1 c
  ) WHERE rn = 1
)
SELECT a1.vec_id, cluster_iter1, cluster_iter2 FROM a1 JOIN a2 USING (vec_id)
"""

CLUSTER_PROTOTYPES_SQL = f"""{_KM_BLOCKS},
a2d AS (
  SELECT vec_id, cluster, d2 FROM (
    SELECT e.vec_id, c.cluster, {_D2} AS d2,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {_D2}, c.cluster) AS rn
    FROM e CROSS JOIN c1 c
  ) WHERE rn = 1
),
ranked AS (
  SELECT cluster, vec_id, d2,
         row_number() OVER (PARTITION BY cluster ORDER BY d2, vec_id) AS proto_rank
  FROM a2d
)
SELECT cluster, proto_rank, vec_id, round(d2, 6) AS d2_centroid
FROM ranked WHERE proto_rank <= {_PROTO_TOPK}
ORDER BY cluster, proto_rank
"""


# ---------------------------------------------------------------------------
# ANN index evaluation: recall against the exact answer
# ---------------------------------------------------------------------------

_RECALL_K = 3


def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the approximate indexes against exact brute-force —
    the evaluation every ANN deployment publishes before trading exact
    search for an index. One row per method: query count, top-k hits
    recovered, possible hits, recall.

    The brute_force row is COMPUTED (self-join against the exact set),
    not hardcoded, so a drift in the exact path surfaces here too.
    Scale posture: the per-method sets are k·|Q| rows; every join and
    aggregate below is on data proportional to the query budget, never
    the corpus. The oracle re-derives all three methods in SQL, so even
    the approximation error itself is driver-checked."""
    from .extensions import (
        ann_cosine_topk,
        ann_lsh_multiprobe,
        ann_lsh_multitable,
        ann_lsh_topk,
    )
    from .extras import ann_ivf_nprobe, ann_ivf_search

    # r13: each method's result set is k·|Q| rows (~50); materialize it
    # ONCE via eager localCheckpoint.  Without this the exact plan was
    # re-executed SEVEN times (hits join of every method + possible) and
    # every approximate index twice (hits + n_queries) — 12.6 s at
    # sf0.1, ~4 s after.  Rows are identical; only evaluation count
    # changes.
    def once(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True)

    # r13 (2nd pass): the six method pipelines are INDEPENDENT jobs that
    # each underfill the cluster (probe-expansion joins over k·|Q| rows),
    # and eager checkpoints serialize them — the report's wall time was
    # the SUM of six single evaluations (7.4 s at sf0.1).  Materialize
    # them concurrently: six threads submit their Spark jobs at once and
    # the scheduler interleaves the idle slots (guide §2.7 — concurrent
    # independent actions, not caching).  Each method's rows are computed
    # by exactly the same plan as before; only submission order changes,
    # and every downstream join reads the same checkpointed sets.
    from concurrent.futures import ThreadPoolExecutor

    # r14: the single-probe and multi-probe LSH methods build the
    # IDENTICAL coded relation (16-plane decimal projection + ckpt);
    # one lock-guarded build shares it between their threads — the
    # second arrival reuses the first's checkpointed blocks.  The
    # standalone queries are untouched (they build their own).
    import threading

    from .extensions import _lsh_coded

    _coded_box: dict[str, DataFrame] = {}
    _coded_lock = threading.Lock()

    def shared_coded() -> DataFrame:
        with _coded_lock:
            if "c" not in _coded_box:
                _coded_box["c"] = _lsh_coded(spark, sf_dir)
            return _coded_box["c"]

    builders = [
        ("brute_force", lambda: ann_cosine_topk(spark, sf_dir)
            .filter(F.col("rank") <= _RECALL_K)
            .select("query_id", "neighbor_id")),
        ("ivf_nprobe1", lambda: ann_ivf_search(spark, sf_dir).select("query_id", "neighbor_id")),
        ("ivf_nprobe2", lambda: ann_ivf_nprobe(spark, sf_dir).select("query_id", "neighbor_id")),
        ("lsh_b64", lambda: ann_lsh_topk(spark, sf_dir, _coded=shared_coded())
            .select("query_id", "neighbor_id")),
        ("lsh_b64_mp7", lambda: ann_lsh_multiprobe(spark, sf_dir, _coded=shared_coded())
            .select("query_id", "neighbor_id")),
        ("lsh_mt4x4", lambda: ann_lsh_multitable(spark, sf_dir).select("query_id", "neighbor_id")),
    ]
    with ThreadPoolExecutor(max_workers=len(builders)) as ex:
        futures = [(name, ex.submit(lambda b=b: once(b()))) for name, b in builders]
        methods = [(name, fut.result()) for name, fut in futures]
    exact = methods[0][1]
    possible = exact.agg(F.count(F.lit(1)).alias("possible"))
    reports = []
    for name, approx in methods:
        hits = approx.join(exact, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).alias("hits"),
        )
        nq = approx.agg(F.countDistinct("query_id").alias("n_queries"))
        reports.append(
            nq.crossJoin(hits)
            .crossJoin(possible)
            .select(
                F.lit(name).alias("method"),
                F.col("n_queries").cast("long").alias("n_queries"),
                F.col("hits").cast("long").alias("hits"),
                F.col("possible").cast("long").alias("possible"),
                F.round(
                    F.col("hits").cast("double") / F.col("possible"), 6
                ).alias("recall"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("method")


def _recall_sql() -> str:
    from .extensions import (
        ANN_COSINE_SQL,
        ANN_LSH_MULTIPROBE_SQL,
        ANN_LSH_MULTITABLE_SQL,
        ANN_LSH_TOPK_SQL,
    )
    from .extras import ANN_IVF_NPROBE_SQL, ANN_IVF_SQL

    def method_row(name: str, cte: str) -> str:
        return f"""
SELECT '{name}' AS method,
       CAST((SELECT COUNT(DISTINCT query_id) FROM {cte}) AS BIGINT) AS n_queries,
       CAST((SELECT COUNT(*) FROM {cte} a
             JOIN exact e ON a.query_id = e.query_id
                         AND a.neighbor_id = e.neighbor_id) AS BIGINT) AS hits,
       CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS possible,
       round(CAST((SELECT COUNT(*) FROM {cte} a
                   JOIN exact e ON a.query_id = e.query_id
                               AND a.neighbor_id = e.neighbor_id) AS DOUBLE)
             / (SELECT COUNT(*) FROM exact), 6) AS recall"""

    return f"""
WITH exact AS (
  SELECT query_id, neighbor_id FROM ({ANN_COSINE_SQL}) WHERE rank <= {_RECALL_K}
),
m1 AS (SELECT query_id, neighbor_id FROM ({ANN_IVF_SQL})),
m2 AS (SELECT query_id, neighbor_id FROM ({ANN_IVF_NPROBE_SQL})),
m3 AS (SELECT query_id, neighbor_id FROM ({ANN_LSH_TOPK_SQL})),
m4 AS (SELECT query_id, neighbor_id FROM ({ANN_LSH_MULTIPROBE_SQL})),
m5 AS (SELECT query_id, neighbor_id FROM ({ANN_LSH_MULTITABLE_SQL}))
{method_row('brute_force', 'exact')}
UNION ALL {method_row('ivf_nprobe1', 'm1')}
UNION ALL {method_row('ivf_nprobe2', 'm2')}
UNION ALL {method_row('lsh_b64', 'm3')}
UNION ALL {method_row('lsh_b64_mp7', 'm4')}
UNION ALL {method_row('lsh_mt4x4', 'm5')}
ORDER BY method
"""


ANN_RECALL_SQL = _recall_sql()


VECTOR_ANALYTICS_QUERIES = {
    "label_centroids": label_centroids,
    "vector_norms": vector_norms,
    "knn_classify": knn_classify,
    "kmeans_assign": kmeans_assign,
    "cluster_prototypes": cluster_prototypes,
    "ann_recall_report": ann_recall_report,
}

VECTOR_ANALYTICS_ORACLE_SQL = {
    "label_centroids": LABEL_CENTROIDS_SQL,
    "vector_norms": VECTOR_NORMS_SQL,
    "knn_classify": KNN_CLASSIFY_SQL,
    "kmeans_assign": KMEANS_SQL,
    "cluster_prototypes": CLUSTER_PROTOTYPES_SQL,
    "ann_recall_report": ANN_RECALL_SQL,
}
