"""Corpus-curation workflow operators: incremental dedup against a
historical corpus, the quality-filter funnel report, and table snapshot
diff.

These are the operational glue of a recurring training-data pipeline
(generalizing the reference's single-shot clean→validate→load run,
``/root/reference/etl/transform.py`` / ``load.py``): each ingest batch is
deduplicated against everything already admitted, the filter cascade is
monitored stage by stage, and any two table snapshots can be diffed for
audit.

Scale design
------------
- ``dedup_incremental``: batch ANTI-JOIN historical on the md5
  fingerprint. The shuffle is keyed by fingerprint (uniform by
  construction — no skew); at 100 TB the historical side stays
  partitioned/bucketed by fingerprint so only the (small) batch moves,
  and AQE's runtime bloom filter prunes historical partitions first
  (pinned by tests/test_adaptive.py for this join shape).
- ``corpus_filter_funnel``: ONE scan, one 4-conditional aggregate, then
  a constant-width unpivot — the stage counts never require one pass
  per stage.
- ``table_diff``: full outer join keyed on the primary key — one
  shuffle per side, co-partitioned; at scale both snapshots share the
  warehouse's bucket layout so the diff is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import bounded_persist_cache, register_plan_cache
from ..functions import text as TX
from ..sources.catalog import load_table
from .extensions import _sql_lang_id, _sql_n_tokens, _sql_quality

FUNNEL_MIN_TOKENS = 30
FUNNEL_MIN_QUALITY = 0.45

# ---------------------------------------------------------------------------
# Incremental exact dedup: admit only batch docs unseen in the historical
# corpus. Fixture split: historical = even doc_id; batch = the injected
# re-crawls (source doc_id % 7 == 0, re-keyed +1_000_000), so a batch doc
# collides iff its source was even — roughly half admitted, half rejected.
# ---------------------------------------------------------------------------


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch docs whose fingerprint is NOT already in the historical
    corpus (left-anti join on md5). Intra-batch dups are the province of
    ``dedup_exact``; this is the cross-run incremental admit step."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = docs.filter(F.col("doc_id") % 2 == 0).select(
        TX.fingerprint_md5("text").alias("fingerprint")
    )
    batch = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        TX.fingerprint_md5("text").alias("fingerprint"),
    )
    return batch.join(hist, "fingerprint", "left_anti").select("doc_id", "fingerprint")


def dedup_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup admission — the production shape of recurring
    crawl ingestion: every batch document is checked for word-5-gram
    Jaccard ≥ 0.6 against the HISTORICAL corpus (even base doc_ids, the
    same split as ``dedup_incremental``), not just for exact fingerprint
    collisions. Returns (doc_id, admitted) for the whole batch.

    Plan: the historical side's MinHash signatures/band keys are the
    persisted index artifact (``extensions._cached_signatures`` — at
    100 TB they live bucketed by band key and only the small batch
    shuffles); candidate pairs come from a batch×historical band join
    (one shuffle, payload-free), and exact Jaccard verification against
    the full shingle arrays makes the admit decision exact for every
    candidate. Banding recall at the threshold is the same ≈ 99.96%
    contract as ``dedup_minhash_lsh`` — and certain for the fixture's
    exact-copy re-crawls.
    """
    from .extensions import (
        _band_keys,
        _cached_signatures,
        _corpus,
        _doc_shingle_arrays,
        _verify_candidates,
    )

    sig = _cached_signatures(spark, sf_dir)
    hist_bands = _band_keys(
        sig.filter((F.col("doc_id") < 1000000) & (F.col("doc_id") % 2 == 0))
    )
    batch_bands = _band_keys(sig.filter(F.col("doc_id") >= 1000000))
    cand = (
        batch_bands.alias("a")
        .join(
            hist_bands.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    rejected = (
        _verify_candidates(cand, _doc_shingle_arrays(spark, sf_dir))
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("__rej", F.lit(True))
    )
    batch_ids = _corpus(spark, sf_dir).filter(F.col("doc_id") >= 1000000).select("doc_id")
    return (
        batch_ids.join(rejected, "doc_id", "left")
        .select("doc_id", F.col("__rej").isNull().alias("admitted"))
        .orderBy("doc_id")
    )


def _near_rejected_ctes() -> str:
    """CTE chain ending in ``near_rejected(batch_id)`` — batch docs with
    word-5-gram Jaccard ≥ threshold against any historical doc. ONE
    definition shared by the incremental near-dup oracle and the
    admission-funnel oracle, so a threshold or split-rule change can
    never desynchronize them."""
    from .extensions import _CORPUS_SQL, _SHINGLES_SQL, JACCARD_THRESHOLD

    return f"""corpus AS ({_CORPUS_SQL}),
sh AS ({_SHINGLES_SQL}),
inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
inter AS (
  SELECT b.doc_id AS batch_id, h.doc_id AS hist_id, COUNT(*) AS n_inter
  FROM inv b JOIN inv h ON b.shingle = h.shingle
  WHERE b.doc_id >= 1000000 AND h.doc_id < 1000000 AND h.doc_id % 2 = 0
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
near_rejected AS (
  SELECT DISTINCT batch_id
  FROM inter
  JOIN sizes sb ON sb.doc_id = batch_id
  JOIN sizes sh2 ON sh2.doc_id = hist_id
  WHERE CAST(n_inter AS DOUBLE) / CAST(sb.n_sh + sh2.n_sh - n_inter AS DOUBLE)
        >= {JACCARD_THRESHOLD}
)"""


def _dedup_incremental_neardup_sql() -> str:
    return f"""
WITH {_near_rejected_ctes()}
SELECT c.doc_id, r.batch_id IS NULL AS admitted
FROM (SELECT doc_id FROM corpus WHERE doc_id >= 1000000) c
LEFT JOIN near_rejected r ON c.doc_id = r.batch_id
ORDER BY c.doc_id
"""


DEDUP_INCREMENTAL_NEARDUP_SQL = _dedup_incremental_neardup_sql()


def corpus_admission_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END batch admission report — the cascade a recurring
    ingest run actually executes, composed from this module's operators:
    quality gates (length → quality score), then EXACT dedup against the
    historical corpus (md5 anti-lookup), then NEAR-dup admission
    (``dedup_incremental_neardup``'s MinHash-LSH verdict). Emits the
    survivor count after each cumulative stage — the monitoring funnel
    for the full admit decision, not just the content filters.

    Plan: one scan builds all per-doc flags (the dedup verdicts join in
    as boolean columns — broadcastable at batch scale), one aggregate of
    nested conditional counts, constant-width unpivot. The historical
    fingerprint set and LSH index are the persisted artifacts the
    incremental operators already maintain.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    batch = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "n_chars"
    )
    hist_fp = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(TX.fingerprint_md5("text").alias("fingerprint"))
        .distinct()
        .withColumn("__exact_hit", F.lit(True))
    )
    near = dedup_incremental_neardup(spark, sf_dir).select(
        "doc_id", F.col("admitted").alias("__near_ok")
    )
    b = (
        batch.withColumn("fingerprint", TX.fingerprint_md5("text"))
        .join(hist_fp, "fingerprint", "left")
        .join(near, "doc_id")
    )
    c1 = TX.token_count("text") >= FUNNEL_MIN_TOKENS
    c2 = c1 & (TX.quality_score("text", "n_chars") >= FUNNEL_MIN_QUALITY)
    c3 = c2 & F.col("__exact_hit").isNull()
    c4 = c3 & F.col("__near_ok")
    agg = b.agg(
        F.count(F.lit(1)).alias("n0"),
        F.count_if(c1).alias("n1"),
        F.count_if(c2).alias("n2"),
        F.count_if(c3).alias("n3"),
        F.count_if(c4).alias("n4"),
    )
    return agg.select(
        F.expr(
            "stack(5, 0, 'batch', n0, 1, 'min_tokens', n1, 2, 'quality', n2,"
            " 3, 'exact_dedup', n3, 4, 'near_dedup', n4)"
        ).alias("stage", "filter_name", "n_docs")
    )


def _admission_sql() -> str:
    n_tok = _sql_n_tokens()
    quality = _sql_quality()
    c1 = f"({n_tok} >= {FUNNEL_MIN_TOKENS})"
    c2 = f"({c1} AND ({quality}) >= {FUNNEL_MIN_QUALITY})"
    c3 = f"({c2} AND NOT exact_hit)"
    c4 = f"({c3} AND near_ok)"
    return f"""
WITH {_near_rejected_ctes()},
hist_fp AS (SELECT DISTINCT md5(text) AS fingerprint FROM documents WHERE doc_id % 2 = 0),
b AS (
  SELECT d.doc_id + 1000000 AS doc_id, d.text, d.n_chars,
         md5(d.text) IN (SELECT fingerprint FROM hist_fp) AS exact_hit,
         d.doc_id + 1000000 NOT IN (SELECT batch_id FROM near_rejected) AS near_ok
  FROM documents d WHERE d.doc_id % 7 = 0
),
agg AS (
  SELECT COUNT(*) AS n0,
         COUNT(*) FILTER (WHERE {c1}) AS n1,
         COUNT(*) FILTER (WHERE {c2}) AS n2,
         COUNT(*) FILTER (WHERE {c3}) AS n3,
         COUNT(*) FILTER (WHERE {c4}) AS n4
  FROM b
)
SELECT 0 AS stage, 'batch' AS filter_name, n0 AS n_docs FROM agg
UNION ALL SELECT 1, 'min_tokens', n1 FROM agg
UNION ALL SELECT 2, 'quality', n2 FROM agg
UNION ALL SELECT 3, 'exact_dedup', n3 FROM agg
UNION ALL SELECT 4, 'near_dedup', n4 FROM agg
"""


CORPUS_ADMISSION_SQL = _admission_sql()


DEDUP_INCREMENTAL_SQL = """
WITH hist AS (SELECT md5(text) AS fingerprint FROM documents WHERE doc_id % 2 = 0),
batch AS (SELECT doc_id + 1000000 AS doc_id, md5(text) AS fingerprint
          FROM documents WHERE doc_id % 7 = 0)
SELECT doc_id, fingerprint
FROM batch b
WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fingerprint = b.fingerprint)
"""


# ---------------------------------------------------------------------------
# Quality-filter funnel: survivor counts through the filter cascade
# ---------------------------------------------------------------------------

def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors after each stage of the cumulative filter cascade
    (length → quality → language), plus the unfiltered base — the
    monitoring report every production filter pipeline emits. One scan,
    one aggregate; stages are nested conditional counts, not passes."""
    docs = load_table(spark, sf_dir, "documents")
    c1 = TX.token_count("text") >= FUNNEL_MIN_TOKENS
    c2 = c1 & (TX.quality_score("text", "n_chars") >= FUNNEL_MIN_QUALITY)
    c3 = c2 & (TX.lang_id("text") == "en")
    agg = docs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.count_if(c1).alias("n1"),
        F.count_if(c2).alias("n2"),
        F.count_if(c3).alias("n3"),
    )
    return agg.select(
        F.expr(
            "stack(4, 0, 'all', n0, 1, 'min_tokens', n1,"
            " 2, 'quality', n2, 3, 'lang_en', n3)"
        ).alias("stage", "filter_name", "n_docs")
    )


def _funnel_sql() -> str:
    n_tok = _sql_n_tokens()
    quality = _sql_quality()
    c1 = f"({n_tok} >= {FUNNEL_MIN_TOKENS})"
    c2 = f"({c1} AND ({quality}) >= {FUNNEL_MIN_QUALITY})"
    c3 = f"({c2} AND ({_sql_lang_id()}) = 'en')"
    return f"""
WITH agg AS (
  SELECT COUNT(*) AS n0,
         COUNT(*) FILTER (WHERE {c1}) AS n1,
         COUNT(*) FILTER (WHERE {c2}) AS n2,
         COUNT(*) FILTER (WHERE {c3}) AS n3
  FROM documents
)
SELECT 0 AS stage, 'all' AS filter_name, n0 AS n_docs FROM agg
UNION ALL SELECT 1, 'min_tokens', n1 FROM agg
UNION ALL SELECT 2, 'quality', n2 FROM agg
UNION ALL SELECT 3, 'lang_en', n3 FROM agg
"""


CORPUS_FILTER_FUNNEL_SQL = _funnel_sql()


# ---------------------------------------------------------------------------
# Table snapshot diff
# ---------------------------------------------------------------------------


def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff of two table snapshots (added / removed / changed),
    keyed on the primary key. Snapshots are simulated deterministically
    from orders: v1 omits o_orderkey % 97 == 0; v2 omits % 89 == 0 and
    bumps o_totalprice on % 101 == 0 — so all three statuses occur."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    v1 = orders.filter(F.col("o_orderkey") % 97 != 0)
    v2 = orders.filter(F.col("o_orderkey") % 89 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    status = (
        F.when(F.col("a.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("removed"))
        .when(F.col("a.o_totalprice") != F.col("b.o_totalprice"), F.lit("changed"))
    )
    return (
        j.select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
            status.alias("status"),
        )
        .filter(F.col("status").isNotNull())
    )


TABLE_DIFF_SQL = """
WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 97 != 0),
v2 AS (SELECT o_orderkey,
              CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
                   ELSE o_totalprice END AS o_totalprice
       FROM orders WHERE o_orderkey % 89 != 0)
SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            WHEN a.o_totalprice != b.o_totalprice THEN 'changed' END AS status
FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
WHERE (CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            WHEN a.o_totalprice != b.o_totalprice THEN 'changed' END) IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style): embedding near-dup graph → connected
# components → one canonical representative per semantic cluster
# ---------------------------------------------------------------------------


_SEM_TILE_ROWS = 1024  # target vectors per chunk (bounds the per-row arrays)
_BLOCKED_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = register_plan_cache({})
_BUCKETED_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = register_plan_cache({})


def _tile_gemm(tiles: DataFrame, threshold: float) -> DataFrame:
    """Run one numpy float64 GEMM per tile row and emit the (min,max)-id
    pairs with cosine ≥ threshold. Tile schema: ``diag`` marks a
    self-tile (upper-triangle filter applies there; cross tiles emit
    every pair once). Shared by the exact blocked self-join and the
    LSH-bucketed candidate generator."""
    import numpy as np
    import pandas as pd

    def gemm(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ia = np.asarray(row["ids_a"], dtype=np.int64)
                ib = np.asarray(row["ids_b"], dtype=np.int64)
                ma = np.stack([np.asarray(x, dtype=np.float64) for x in row["vecs_a"]])
                mb = np.stack([np.asarray(x, dtype=np.float64) for x in row["vecs_b"]])
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                cos = (ma @ mb.T) / np.outer(na, nb)
                ii, jj = np.nonzero(cos >= threshold)
                id_a, id_b = ia[ii], ib[jj]
                if row["diag"]:
                    keep = id_a < id_b  # dedupe orientations + self-pairs
                    id_a, id_b, vals = id_a[keep], id_b[keep], cos[ii, jj][keep]
                else:
                    vals = cos[ii, jj]  # distinct chunks: every pair once
                yield pd.DataFrame(
                    {
                        "id_a": np.minimum(id_a, id_b),
                        "id_b": np.maximum(id_a, id_b),
                        "cosine": np.round(vals, 6),
                    }
                )

    return tiles.mapInPandas(gemm, "id_a long, id_b long, cosine double")


def embed_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine ≥ 0.95 pairs via a BLOCKED matrix self-join: vectors
    are grouped into C chunks (map-side hash, one shuffle to assemble
    per-chunk matrices), chunk pairs cross-join (C²/2+C tiles), and each
    task runs one numpy float64 GEMM inside ``mapInPandas`` — the
    vectorized exact form of ``embed_neardup_pairs``' interpreted
    expression-tree nested loop (45 s → sub-second at sf0.1). Work is
    O(n²) either way, but it distributes as dense BLAS tiles with no
    driver-side collect, and C grows with the corpus (≈n/1024, from a
    metadata-cheap count) so a chunk's collect_list stays bounded
    (~1024 × dim doubles) at any corpus size; the task count grows as
    C², which is the honest cost of EXACT all-pairs — the sub-quadratic
    path is ann_lsh_buckets / ann_ivf_*.

    Cross-chunk pairs are emitted as (min, max) id — the upper-triangle
    filter applies only inside diagonal tiles, where both orientations
    of a pair would otherwise both survive. (A plain id_a < id_b filter
    over a.chunk ≤ b.chunk tiling silently drops every cross-chunk pair
    whose smaller id lives in the higher-numbered chunk.)

    Float note: numpy's pairwise-summed dot can differ from a sequential
    fold in the last ulp; at the 0.95 threshold the fixture margins are
    enormous (non-dup pairs ≲ 0.75, injected dups = 1.0), so the emitted
    pair set and round(cos, 6) values are engine-stable.

    Persisted per (application, sf_dir): ``semantic_dedup_reps`` and the
    registered query itself both consume the pair set.
    """
    from .extras import _vec_corpus

    def build() -> DataFrame:
        corpus = _vec_corpus(spark, sf_dir)
        n = corpus.count()  # parquet metadata count — cheap
        n_chunks = max(8, -(-n // _SEM_TILE_ROWS))
        # hash (not raw modulo) chunking: strided/offset id patterns (e.g.
        # injected-dup ids at source_id + 1e6) skew modulo chunks past the
        # ~_SEM_TILE_ROWS bound; xxhash64 spreads any id pattern uniformly
        chunk = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_chunks))
        chunks = corpus.groupBy(chunk.alias("chunk")).agg(
            F.collect_list("vec_id").alias("ids"), F.collect_list("v").alias("vecs")
        )
        a, b = chunks.alias("a"), chunks.alias("b")
        tiles = a.join(b, F.col("a.chunk") <= F.col("b.chunk")).select(
            (F.col("a.chunk") == F.col("b.chunk")).alias("diag"),
            F.col("a.ids").alias("ids_a"),
            F.col("a.vecs").alias("vecs_a"),
            F.col("b.ids").alias("ids_b"),
            F.col("b.vecs").alias("vecs_b"),
        )
        return _tile_gemm(tiles, NEARDUP_COS)

    return bounded_persist_cache(
        _BLOCKED_PAIRS_CACHE, (spark.sparkContext.applicationId, sf_dir), build
    )


def embed_neardup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair generation with LINEAR tile count — the 100 TB path
    ``semantic_dedup_reps`` consumes (``embed_neardup_blocked`` is the
    exact all-pairs baseline whose C² tiling is the honest cost of
    exactness but a scale-killer for web corpora).

    Plan: every vector gets its 16-bit hyperplane LSH code
    (``extensions.lsh_code_column`` — exact decimal projections), hot
    codes are sub-split by hashed id to ≤ ~_SEM_TILE_ROWS rows, and the
    exact GEMM (same ``_tile_gemm`` kernel) runs ONLY on tiles inside a
    bucket. With s_b the size of bucket b and W the tile width, tile
    count is Σ_b ceil(s_b/W)·(ceil(s_b/W)+1)/2 — linear in corpus size
    at fixed bucket width (tests/test_curation.py pins this), vs the
    all-pairs form's quadratic C². Each vector lives in exactly one
    (bucket, sub-chunk), so every candidate pair is examined once and
    the output needs no dedup.

    Recall contract (SemDeDup-style cluster-local dedup): a pair is
    examined iff both vectors share the 16-bit code. A scalar multiple
    never flips a projection sign, so EXACT duplicates always collide —
    recall 1.0 for the fixture's injected dups, hence the exact-pairs
    oracle holds verbatim at test scale. A borderline pair (cosine just
    over the threshold) can straddle buckets with probability
    1-(1-θ/π)^16; production tuning trades that via plane count /
    banding, exactly like ``dedup_minhash_lsh``'s banding parameters.
    """
    def build() -> DataFrame:
        return _tile_gemm(_bucketed_tiles(spark, sf_dir), NEARDUP_COS)

    return bounded_persist_cache(
        _BUCKETED_PAIRS_CACHE, (spark.sparkContext.applicationId, sf_dir), build
    )


def _bucketed_tiles(
    spark: SparkSession, sf_dir: str, tile_rows: int = _SEM_TILE_ROWS
) -> DataFrame:
    """The intra-bucket tile relation ``embed_neardup_bucketed`` feeds to
    the GEMM kernel — exposed so the tile-count-linearity contract is
    testable against the REAL join, not an analytic formula."""
    from .extensions import lsh_code_column
    from .extras import _vec_corpus

    corpus = _vec_corpus(spark, sf_dir).withColumn(
        "bucket", lsh_code_column("v")
    )
    # bucket census (≤ 2^16 rows) broadcasts back to size sub-chunks
    sizes = corpus.groupBy("bucket").agg(F.count(F.lit(1)).alias("s_b"))
    n_sub = F.greatest(F.lit(1), F.ceil(F.col("s_b") / F.lit(tile_rows)))
    chunks = (
        corpus.join(F.broadcast(sizes), "bucket")
        .withColumn("sub", F.pmod(F.xxhash64(F.col("vec_id")), n_sub))
        .groupBy("bucket", "sub")
        .agg(F.collect_list("vec_id").alias("ids"), F.collect_list("v").alias("vecs"))
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    return a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))  # equi-join: bucket-local
        & (F.col("a.sub") <= F.col("b.sub")),
    ).select(
        (F.col("a.sub") == F.col("b.sub")).alias("diag"),
        F.col("a.ids").alias("ids_a"),
        F.col("a.vecs").alias("vecs_a"),
        F.col("b.ids").alias("ids_b"),
        F.col("b.vecs").alias("vecs_b"),
    )


# Output-identical to the expression-tree baseline, so it shares its oracle.
from .extras import EMBED_NEARDUP_SQL, NEARDUP_COS  # noqa: E402

EMBED_NEARDUP_BLOCKED_SQL = EMBED_NEARDUP_SQL


_VEC_COS_SQL = (
    "list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))"
    " / (sqrt(list_sum(list_transform(a.v, x -> x * x)))"
    " * sqrt(list_sum(list_transform(b.v, x -> x * x))))"
)


def _bucketed_pair_ctes() -> str:
    """CTE chain ending in ``bpairs(id_a, id_b, cos)`` — pairs sharing a
    16-bit LSH code, with exact cosine. DuckDB rebuilds the md5-seeded
    integer planes and decimal projections bit-for-bit (same recipe as
    ANN_LSH_BUCKETS_SQL), so the oracle checks the bucketed operator's
    ACTUAL semantics: bucket-local pairs, not the all-pairs superset
    (whose equality on fixtures is a property of exact-copy dups, not a
    contract the oracle should encode)."""
    from .extensions import _LSH_DIMS, _LSH_FOLD, _LSH_PLANES
    from .extras import VEC_CORPUS_SQL

    return f"""{VEC_CORPUS_SQL},
planes AS (
  SELECT j, i, {_LSH_FOLD} - 32768 AS w
  FROM (SELECT j, i, md5('p' || CAST(j AS VARCHAR) || '_' || CAST(i AS VARCHAR)) AS h
        FROM range({_LSH_PLANES}) p(j) CROSS JOIN range({_LSH_DIMS}) d(i))
),
ex AS (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) - 1 AS i FROM corpus),
proj AS (
  SELECT vec_id, j, SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(20,10)) * w) AS p
  FROM ex JOIN planes USING (i) GROUP BY vec_id, j
),
codes AS (
  SELECT vec_id, SUM(CASE WHEN p > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS bucket
  FROM proj GROUP BY vec_id
),
bpairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_VEC_COS_SQL} AS cos
  FROM corpus a
  JOIN codes ca ON ca.vec_id = a.vec_id
  JOIN corpus b ON a.vec_id < b.vec_id
  JOIN codes cb ON cb.vec_id = b.vec_id AND ca.bucket = cb.bucket
)"""


EMBED_NEARDUP_BUCKETED_SQL = f"""
WITH {_bucketed_pair_ctes()}
SELECT id_a, id_b, round(cos, 6) AS cosine FROM bpairs WHERE cos >= {NEARDUP_COS}
"""


def semantic_dedup_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-duplicate clusters over the embedding space: cosine ≥ 0.95
    pairs (``embed_neardup_blocked`` — exact, GEMM-tiled) become edges,
    connected components collapse transitive near-dups, and each clustered
    vector maps to its canonical (min vec_id) representative with the
    cluster size — the keep/drop table of embedding-based corpus dedup.

    Same iterative min-label-propagation vs recursive-CTE-oracle pairing
    as ``dedup_clusters``; edges are localCheckpoint'd because every CC
    iteration re-reads them. Pair generation is the LSH-bucketed linear-
    tile path (``embed_neardup_bucketed``) — identical to the exact
    blocked form on the fixtures (regression-tested), sub-quadratic at
    corpus scale, which is the whole point of semantic dedup.
    """
    from ..operators.components import connected_components

    pairs = (
        embed_neardup_bucketed(spark, sf_dir)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .localCheckpoint(eager=True)
    )
    verts = (
        pairs.select(F.col("src").alias("id"))
        .unionByName(pairs.select(F.col("dst").alias("id")))
        .distinct()
    )
    cc = connected_components(verts, pairs)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "component").select(
        F.col("id").alias("vec_id"),
        F.col("component").alias("canonical_id"),
        "cluster_size",
    )


def _semantic_dedup_sql() -> str:
    # edges come from the BUCKETED pair generator (the path the Spark
    # query consumes), so the oracle tracks its semantics exactly
    return f"""
WITH RECURSIVE {_bucketed_pair_ctes()},
pairs AS (SELECT id_a, id_b FROM bpairs WHERE cos >= {NEARDUP_COS}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
verts AS (SELECT DISTINCT a AS id FROM edges),
reach(src, dst) AS (
  SELECT id, id FROM verts
  UNION
  SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a
),
comp AS (SELECT src AS vec_id, MIN(dst) AS canonical_id FROM reach GROUP BY src)
SELECT c.vec_id, c.canonical_id, s.cluster_size
FROM comp c
JOIN (SELECT canonical_id, COUNT(*) AS cluster_size FROM comp GROUP BY canonical_id) s
  ON c.canonical_id = s.canonical_id
"""


SEMANTIC_DEDUP_SQL = _semantic_dedup_sql()


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis, deterministic)
# ---------------------------------------------------------------------------

WSAMPLE_K = 50


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sample of K documents WITHOUT replacement via
    exponential sort keys: key_i = −ln(u_i) / w_i with u_i a
    deterministic md5-derived uniform — the K smallest keys are exactly
    a weighted sample without replacement (Efraimidis–Spirakis A-Res).
    Here w = n_chars (longer docs proportionally likelier), u seeded
    from md5(doc_id) so the draw is reproducible and oracle-checkable.

    This is the one-pass DISTRIBUTED weighted sampler: no sequential
    cumulative-weight walk, no driver state — each row computes its key
    map-side and a bounded top-k (TakeOrderedAndProject) resolves the
    sample. At 100 TB that is a scan plus a K-row merge.

    Float discipline: −ln(u) is fixed-pointed to integer nano-nats ONCE
    per doc (the repo's per-type rounding rule), and the sort key is
    that integer divided by the integer weight — division of two
    exactly-representable integers is correctly rounded, hence
    bit-identical across engines, so both the rank order at the K
    boundary and the emitted key hash-match.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / F.lit(4294967297.0)
    ln_nano = F.round(-F.log(u) * F.lit(1e9)).cast("long")
    key = ln_nano.cast("double") / F.col("n_chars").cast("double")
    return (
        docs.select("doc_id", "n_chars", key.alias("k"))
        .orderBy("k", "doc_id")
        .limit(WSAMPLE_K)
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         CAST(CAST(ROUND(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
                             / 4294967297.0) * 1e9) AS BIGINT) AS DOUBLE)
           / CAST(n_chars AS DOUBLE) AS k
  FROM documents
)
SELECT doc_id, n_chars, k FROM keyed ORDER BY k, doc_id LIMIT {WSAMPLE_K}
"""



# ---------------------------------------------------------------------------
# Dataset card: the one-row release summary of a corpus
# ---------------------------------------------------------------------------


def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The summary table a corpus release ships with: document / source /
    language cardinalities, token and character volume, and the unique-
    text count (1 - n_unique/n_docs = exact-dup rate). ONE scan, one
    aggregate — every statistic is a partial-agg'd count/sum, and the
    distinct counts are exact (at extreme cardinality swap in
    approx_count_distinct, the HLL path tests/test_sketches.py pins)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(TX.token_count("text")).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct(TX.fingerprint_md5("text")).alias("n_unique_texts"),
    )


def _dataset_card_sql() -> str:
    return f"""
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM({_sql_n_tokens()}) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT md5(text)) AS n_unique_texts
FROM documents
"""


DATASET_CARD_SQL = _dataset_card_sql()


CURATION_QUERIES = {
    "dedup_incremental": dedup_incremental,
    "dedup_incremental_neardup": dedup_incremental_neardup,
    "corpus_admission_pipeline": corpus_admission_pipeline,
    "corpus_filter_funnel": corpus_filter_funnel,
    "table_diff": table_diff,
    "semantic_dedup_reps": semantic_dedup_reps,
    "embed_neardup_blocked": embed_neardup_blocked,
    "embed_neardup_bucketed": embed_neardup_bucketed,
    "weighted_sample_docs": weighted_sample_docs,
    "dataset_card_stats": dataset_card_stats,
}

CURATION_ORACLE_SQL = {
    "dedup_incremental": DEDUP_INCREMENTAL_SQL,
    "dedup_incremental_neardup": DEDUP_INCREMENTAL_NEARDUP_SQL,
    "corpus_admission_pipeline": CORPUS_ADMISSION_SQL,
    "corpus_filter_funnel": CORPUS_FILTER_FUNNEL_SQL,
    "table_diff": TABLE_DIFF_SQL,
    "semantic_dedup_reps": SEMANTIC_DEDUP_SQL,
    "embed_neardup_blocked": EMBED_NEARDUP_BLOCKED_SQL,
    # bucket-aware oracle: checks the bucketed semantics themselves, so
    # the binding survives fixtures with incidental borderline pairs
    "embed_neardup_bucketed": EMBED_NEARDUP_BUCKETED_SQL,
    "weighted_sample_docs": WEIGHTED_SAMPLE_SQL,
    "dataset_card_stats": DATASET_CARD_SQL,
}
