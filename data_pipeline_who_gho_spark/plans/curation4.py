"""Round-4 curation stages: perplexity terciles, best-quality cluster
representatives, and the corpus dedup report.

* ``perplexity_buckets``: the CCNet-style head/middle/tail split
  (Wenzek et al., 2020): score every document under the corpus bigram
  LM (plans/extensions2.bigram_lm_score — integer micro-nat sums, so
  both engines hold identical doubles after the single avg division),
  tercile the corpus by fluency, keep head+middle. The tercile is a
  GLOBAL bucket assignment computed without a single-partition window:
  ``operators/rank.global_rank`` + ``ntile_from_rank`` (range shuffle +
  broadcast offsets — the scale-safe ntile).
* ``dedup_cluster_best``: keep-the-BEST-copy canonicalization. The
  reference rule (min doc_id, plans/extensions.dedup_clusters) keeps an
  arbitrary member; a curation pipeline keeps the highest-quality one.
  Per cluster, the representative maximizes (classifier score, then
  min doc_id) — computed as one ``max(struct(...))`` partial-agg'd
  groupBy per component, never a per-cluster window (one mega-cluster
  would otherwise funnel through a single task).
* ``corpus_dedup_report``: the one-row rollup a dedup run publishes —
  corpus size, clustered docs, clusters, droppable duplicates, and the
  token mass those duplicates carry (min-id keep rule). Three
  partial-agg'd scalar aggregates over cluster output + corpus token
  counts; broadcast-combined.

All three run over the SAME injected-hybrid corpus as the dedup family
(plans/extensions._corpus) so cluster structure is non-trivial at every
scale factor. The reference has no corpus curation at all (its ETL is
observation upserts, etl/load.py:30-52); these are engine extensions in
the training-data-pipeline family SURVEY §2c claims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.rank import global_rank, ntile_from_rank
from ..sources.catalog import load_table
from .curation3 import _QC_WEIGHTS
from .extensions import (
    CLUSTERS_CTES,
    _corpus,
    _sql_n_tokens,
    _sql_tokens,
    dedup_clusters,
)
from .extensions2 import BIGRAM_LM_SQL, bigram_lm_score
from .training import _nibble, _sql_nibble

# ---------------------------------------------------------------------------
# perplexity terciles (CCNet head/middle/tail)
# ---------------------------------------------------------------------------

_PPL_TILES = 3


def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head/middle/tail fluency split: tercile of avg bigram log-prob
    (ties broken by doc_id), kept = head ∪ middle. EVERY document gets
    a row — docs too short to form a bigram land in 'unscored' with
    kept = false (the same every-doc contract as ngram_novelty)."""
    scored = bigram_lm_score(spark, sf_dir).select("doc_id", "avg_lp_micronats")
    ranked = global_rank(scored, ["avg_lp_micronats", "doc_id"], rank_col="rn")
    total = scored.agg(F.count(F.lit(1)).alias("__total"))
    tiled = ranked.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "avg_lp_micronats",
        ntile_from_rank(F.col("rn"), F.col("__total"), _PPL_TILES).alias("tile"),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(tiled, "doc_id", "left")
        .select(
            "doc_id",
            "avg_lp_micronats",
            F.when(F.col("tile").isNull(), F.lit("unscored"))
            .when(F.col("tile") == _PPL_TILES, F.lit("head"))
            .when(F.col("tile") == _PPL_TILES - 1, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
            F.coalesce(F.col("tile") >= _PPL_TILES - 1, F.lit(False)).alias("kept"),
        )
        .orderBy("doc_id")
    )


PERPLEXITY_BUCKETS_SQL = f"""
WITH scored AS ({BIGRAM_LM_SQL}),
tiled AS (
  SELECT doc_id, avg_lp_micronats,
         ntile({_PPL_TILES}) OVER (ORDER BY avg_lp_micronats, doc_id) AS tile
  FROM scored
)
SELECT d.doc_id, t.avg_lp_micronats,
       CASE WHEN t.tile IS NULL THEN 'unscored'
            WHEN t.tile = {_PPL_TILES} THEN 'head'
            WHEN t.tile = {_PPL_TILES - 1} THEN 'middle'
            ELSE 'tail' END AS ppl_bucket,
       COALESCE(t.tile >= {_PPL_TILES - 1}, FALSE) AS kept
FROM (SELECT doc_id FROM documents) d
LEFT JOIN tiled t USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# best-quality cluster representatives
# ---------------------------------------------------------------------------


def _corpus_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) over the injected-hybrid corpus: the shipped
    linear classifier from plans/curation3 (md5-bucket hashed counts ·
    integer weights — exact BIGINT scores in both engines)."""
    corpus = _corpus(spark, sf_dir)
    toks = corpus.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("word")
    ).filter(F.length("word") > 0)
    counts = (
        toks.withColumn("h", F.md5("word"))
        .select("doc_id", _nibble("h", 1).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    warr = F.array(*[F.lit(w) for w in _QC_WEIGHTS])
    return (
        counts.withColumn("w", F.element_at(warr, F.col("bucket") + 1))
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("score"))
    )


_QC_SCORE_CTES = f"""tokc AS (
  SELECT doc_id, unnest({_sql_tokens()}) AS word FROM corpus
),
hc AS (
  SELECT doc_id, {_sql_nibble("md5(word)", 1)} AS bucket, COUNT(*) AS cnt
  FROM tokc WHERE length(word) > 0
  GROUP BY doc_id, bucket
),
qscore AS (
  SELECT doc_id,
         CAST(SUM(cnt * ([{", ".join(str(w) for w in _QC_WEIGHTS)}])[bucket + 1])
              AS BIGINT) AS score
  FROM hc GROUP BY doc_id
)"""


def dedup_cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each clustered doc with its cluster's KEEP decision under the
    keep-best-quality rule: representative = argmax(score, then min
    doc_id) within the cluster. One partial-agg'd struct-max per
    component — skew-safe for arbitrarily large clusters."""
    # r13: the clusters CC chain and the quality-score scan are
    # independent pipelines — materialize them concurrently (guide §2.7)
    # and checkpoint the joined scored relation once, since it feeds
    # BOTH the per-cluster argmax and the final join. Values identical.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as ex:
        clusters_f = ex.submit(
            lambda: dedup_clusters(spark, sf_dir).localCheckpoint(eager=True)
        )
        scores_f = ex.submit(
            lambda: _corpus_quality_scores(spark, sf_dir).localCheckpoint(eager=True)
        )
        clusters, qscores = clusters_f.result(), scores_f.result()
    scored = clusters.join(qscores, "doc_id").localCheckpoint(eager=True)
    best = scored.groupBy("canonical_id").agg(
        F.max(F.struct(F.col("score"), (-F.col("doc_id")).alias("nid"))).alias("m")
    ).select(
        "canonical_id",
        (-F.col("m.nid")).alias("rep_id"),
        F.col("m.score").alias("rep_score"),
    )
    return (
        scored.join(best, "canonical_id")
        .select(
            "doc_id",
            F.col("canonical_id").alias("cluster_id"),
            "cluster_size",
            "score",
            "rep_id",
            (F.col("doc_id") == F.col("rep_id")).alias("is_rep"),
        )
        .orderBy("doc_id")
    )


DEDUP_CLUSTER_BEST_SQL = f"""
WITH RECURSIVE {CLUSTERS_CTES},
{_QC_SCORE_CTES},
cj AS (
  SELECT c.doc_id, c.canonical_id, c.cluster_size, q.score
  FROM clusters c JOIN qscore q USING (doc_id)
),
best AS (
  SELECT canonical_id, doc_id AS rep_id, score AS rep_score
  FROM (
    SELECT *, row_number() OVER (PARTITION BY canonical_id
                                 ORDER BY score DESC, doc_id) AS rrn
    FROM cj
  ) WHERE rrn = 1
)
SELECT cj.doc_id, cj.canonical_id AS cluster_id, cj.cluster_size, cj.score,
       b.rep_id, cj.doc_id = b.rep_id AS is_rep
FROM cj JOIN best b ON cj.canonical_id = b.canonical_id
ORDER BY cj.doc_id
"""


# ---------------------------------------------------------------------------
# corpus dedup report
# ---------------------------------------------------------------------------


def corpus_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dedup rollup over the hybrid corpus: total docs, docs in
    near-dup clusters, cluster count, droppable duplicates (everything
    but the min-id representative), the token mass they carry, and the
    doc-level drop rate. The deliverable a production dedup run logs
    before anyone hits 'delete'."""
    corpus = _corpus(spark, sf_dir)
    tok = corpus.select("doc_id", TX.token_count("text").alias("n_tok"))
    totals = corpus.agg(F.count(F.lit(1)).alias("n_docs"))
    clusters = dedup_clusters(spark, sf_dir)
    cstats = clusters.agg(
        F.count(F.lit(1)).alias("n_clustered_docs"),
        F.countDistinct("canonical_id").alias("n_clusters"),
    )
    dropped = clusters.filter(F.col("doc_id") != F.col("canonical_id")).join(
        tok, "doc_id"
    )
    dstats = dropped.agg(
        F.count(F.lit(1)).alias("n_dup_docs"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("dup_tokens"),
    )
    return (
        totals.crossJoin(cstats)
        .crossJoin(dstats)
        .select(
            "n_docs",
            "n_clustered_docs",
            "n_clusters",
            "n_dup_docs",
            "dup_tokens",
            (
                F.col("n_dup_docs").cast("double") / F.col("n_docs").cast("double")
            ).alias("drop_rate"),
        )
    )


CORPUS_DEDUP_REPORT_SQL = f"""
WITH RECURSIVE {CLUSTERS_CTES},
tok AS (SELECT doc_id, {_sql_n_tokens()} AS n_tok FROM corpus),
totals AS (SELECT COUNT(*) AS n_docs FROM corpus),
cstats AS (
  SELECT COUNT(*) AS n_clustered_docs,
         COUNT(DISTINCT canonical_id) AS n_clusters
  FROM clusters
),
dstats AS (
  SELECT COUNT(*) AS n_dup_docs,
         CAST(COALESCE(SUM(t.n_tok), 0) AS BIGINT) AS dup_tokens
  FROM clusters c JOIN tok t USING (doc_id)
  WHERE c.doc_id <> c.canonical_id
)
SELECT n_docs, n_clustered_docs, n_clusters, n_dup_docs, dup_tokens,
       CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS drop_rate
FROM totals, cstats, dstats
"""


CURATION4_QUERIES = {
    "perplexity_buckets": perplexity_buckets,
    "dedup_cluster_best": dedup_cluster_best,
    "corpus_dedup_report": corpus_dedup_report,
}

CURATION4_ORACLE_SQL = {
    "perplexity_buckets": PERPLEXITY_BUCKETS_SQL,
    "dedup_cluster_best": DEDUP_CLUSTER_BEST_SQL,
    "corpus_dedup_report": CORPUS_DEDUP_REPORT_SQL,
}
