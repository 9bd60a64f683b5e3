"""Round-5 curation stages: the batched model-inference seam and
URL/domain curation.

* ``embed_with_model`` / ``model_ann_topk``: the model-encoder seam
  DEMONSTRATED end-to-end. quality_classifier_score and
  hashed_doc_vectors advertise "swap in a Pandas-UDF encoder"
  (plans/curation3.py) but never actually push a batched model through
  the plumbing; here a deterministic toy encoder — a fixed integer
  projection of the shared hashed-count features — runs as a REAL
  ``pandas_udf`` over Arrow batches (numpy matmul per batch, the exact
  call shape of a sentence-transformer forward pass), and its output
  feeds the existing exact-kNN plan (plans/extensions.ann_cosine_topk
  shape: broadcast query side, streamed candidates, per-query top-k).
  Integer weights keep every feature exact in both engines, so the
  oracle twin is plain SQL (a relational matmul); the encoder itself is
  batch-size invariant by construction and pinned so by test
  (tests/test_curation5.py).

* ``url_normalize_dedup`` / ``domain_stats``: the one standard
  CC-pipeline stage the repo lacked. The corpus carries no URL column,
  so a deterministic dirty URL is DERIVED per document from
  (doc_id, source) — mixed-case scheme/host, default and non-default
  ports, trailing slashes, tracking params, fragments — via ONE shared
  SQL expression text executed verbatim by both engines (the
  training._sql_nibble pattern). Normalization is the standard ladder:
  lowercase scheme+host, strip ``www.``, strip default ports (:80/:443)
  only, path trailing-slash strip (root stays '/'), drop fragments,
  drop ``utm_*``/``fbclid``/``gclid`` params, sort surviving params.
  Everything is map-only Catalyst expressions; dedup is one
  url_norm-grain shuffle and the domain rollup one domain-grain
  shuffle — the 100 TB-safe shape.

The reference has no URL handling or model inference at all (its ETL
is observation upserts, etl/load.py:30-52); these are engine
extensions in the training-data-pipeline family SURVEY §2c claims.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions import vectors as VEC
from ..sources.catalog import load_table
from .curation3 import _HASH_DIM, _HASHED_COUNTS_SQL, _hashed_token_counts
from .extensions import _sql_n_tokens

# ---------------------------------------------------------------------------
# the toy model: a fixed integer random-projection encoder
# ---------------------------------------------------------------------------

_MODEL_DIM = 8
# Deterministic "seeded" weights (Knuth multiplicative hash of the cell
# index) in [-8, 8] — no RNG call, so Spark, DuckDB, and tests all see
# the identical matrix.
_MODEL_W = [
    [((b * 37 + d * 11 + 3) * 2654435761 % 17) - 8 for d in range(_MODEL_DIM)]
    for b in range(_HASH_DIM)
]


def model_project_udf():
    """The batched-inference seam: a ``pandas_udf`` mapping a hashed
    count vector (array<long>, len ``_HASH_DIM``) to a model embedding
    (array<long>, len ``_MODEL_DIM``) via one numpy matmul per Arrow
    batch. A real encoder (e.g. a sentence-transformer forward pass)
    swaps in here with the same signature; everything around it —
    schema, partitioning, batch shape — is production plumbing.
    Row-independent by construction, hence batch-size invariant."""
    import numpy as np

    W = np.array(_MODEL_W, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def project(counts: pd.Series) -> pd.Series:
        if len(counts) == 0:
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(c, dtype=np.int64) for c in counts])
        Y = X @ W
        return pd.Series(list(Y))

    return project


def _dense_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, counts array<long> len _HASH_DIM): the shared hashed
    feature contract densified; empty docs get the zero vector."""
    docs = load_table(spark, sf_dir, "documents")
    counts = _hashed_token_counts(docs)
    per_doc = counts.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "cnt"))).alias("m")
    )
    return (
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


def _model_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, vec array<long> len _MODEL_DIM): every document encoded
    through the pandas_udf seam. Map-only after the one feature-count
    shuffle — the plan a 1000-executor encode job wants."""
    dense = _dense_counts(spark, sf_dir)
    return dense.select("doc_id", model_project_udf()(F.col("counts")).alias("vec"))


def embed_with_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-registered form of the model encoder: the embedding
    exploded to one (doc_id, dim, feat) row per dimension (scalar
    columns only — the array form ``_model_vectors`` is the library
    API, exactly like hashed_doc_vectors). posexplode_OUTER on purpose:
    plain posexplode makes Catalyst insert a non-empty guard on the
    generator input, which re-evaluates the encoder UDF a second time —
    2× inference cost for a real model. The encoder always returns
    ``_MODEL_DIM`` components, so outer semantics change nothing."""
    return (
        _model_vectors(spark, sf_dir)
        .select("doc_id", F.posexplode_outer("vec").alias("dim", "feat"))
        .orderBy("doc_id", "dim")
    )


def _weights_values_sql() -> str:
    rows = ", ".join(
        f"({b}, {d}, {_MODEL_W[b][d]})"
        for b in range(_HASH_DIM)
        for d in range(_MODEL_DIM)
    )
    return f"w(bucket, dim, wt) AS (VALUES {rows})"


_MODEL_PROJ_CTES = f"""{_HASHED_COUNTS_SQL},
{_weights_values_sql()},
proj AS (
  SELECT c.doc_id, w.dim, CAST(SUM(c.cnt * w.wt) AS BIGINT) AS feat
  FROM c JOIN w ON c.bucket = w.bucket
  GROUP BY c.doc_id, w.dim
)"""


EMBED_WITH_MODEL_SQL = f"""
WITH {_MODEL_PROJ_CTES},
dims AS (SELECT unnest(range(0, {_MODEL_DIM})) AS dim)
SELECT i.doc_id, d.dim, CAST(COALESCE(p.feat, 0) AS BIGINT) AS feat
FROM (SELECT doc_id FROM documents) i
CROSS JOIN dims d
LEFT JOIN proj p ON p.doc_id = i.doc_id AND p.dim = d.dim
ORDER BY i.doc_id, d.dim
"""


# ---------------------------------------------------------------------------
# model embeddings → exact kNN (the encoder feeding the ANN stack)
# ---------------------------------------------------------------------------

_N_MODEL_QUERIES = 5
_MODEL_TOP_K = 3


def model_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k over MODEL embeddings: the first
    ``_N_MODEL_QUERIES`` docs as queries vs the full encoded corpus.
    Same plan as plans/extensions.ann_cosine_topk — broadcast query
    side, streamed candidates — proving the pandas_udf encoder output
    drops straight into the existing ANN machinery. Zero-norm (empty)
    docs are excluded on both sides; all dots/norms are exact integer
    sums, so the cosine doubles match DuckDB bit-for-bit."""
    emb = _model_vectors(spark, sf_dir).withColumn(
        "v", VEC.as_double(F.col("vec"))
    )
    nonzero = emb.filter(
        F.aggregate("vec", F.lit(0).cast("long"), lambda a, x: a + x * x) > 0
    )
    q = nonzero.filter(F.col("doc_id") < _N_MODEL_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("v").alias("qv")
    )
    joined = F.broadcast(q).join(
        nonzero, F.col("query_id") != F.col("doc_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("doc_id"))
    return (
        joined.withColumn("cos", VEC.cosine(F.col("qv"), F.col("v")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _MODEL_TOP_K)
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("cosine"),
        )
        .orderBy("query_id", "rank")
    )


MODEL_ANN_TOPK_SQL = f"""
WITH {_MODEL_PROJ_CTES},
norms AS (
  SELECT doc_id, CAST(SUM(feat * feat) AS BIGINT) AS nn
  FROM proj GROUP BY doc_id HAVING SUM(feat * feat) > 0
),
q AS (SELECT p.* FROM proj p JOIN norms USING (doc_id) WHERE doc_id < {_N_MODEL_QUERIES}),
dots AS (
  SELECT q.doc_id AS query_id, p.doc_id AS neighbor_id,
         CAST(SUM(q.feat * p.feat) AS BIGINT) AS dp
  FROM q JOIN proj p ON q.dim = p.dim AND q.doc_id <> p.doc_id
  JOIN norms n2 ON n2.doc_id = p.doc_id
  GROUP BY q.doc_id, p.doc_id
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         CAST(d.dp AS DOUBLE)
           / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nc.nn AS DOUBLE))) AS cos
  FROM dots d
  JOIN norms nq ON nq.doc_id = d.query_id
  JOIN norms nc ON nc.doc_id = d.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {_MODEL_TOP_K}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# URL normalization + per-domain curation
# ---------------------------------------------------------------------------

# ONE expression text, executed verbatim by Spark (F.expr) and DuckDB:
# the deterministic dirty URL derived from (doc_id, source). Only
# ANSI-common pieces (CASE, %, ||, lower/upper, CAST AS STRING).
RAW_URL_EXPR = (
    "CASE doc_id % 4 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'https'"
    "                WHEN 2 THEN 'HTTP' ELSE 'http' END"
    " || '://'"
    " || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END"
    " || CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END"
    " || '.Example.COM'"
    " || CASE WHEN doc_id % 5 = 0 THEN"
    "        (CASE WHEN doc_id % 4 <= 1 THEN ':443' ELSE ':80' END)"
    "      WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END"
    " || '/docs/' || CAST(doc_id % 20 AS STRING)"
    " || CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END"
    " || '?' || CASE WHEN doc_id % 2 = 0 THEN 'utm_source=feed&id='"
    "                ELSE 'id=' END || CAST(doc_id % 50 AS STRING)"
    " || CASE WHEN doc_id % 9 = 0 THEN '&utm_campaign=x' ELSE '' END"
    " || CASE WHEN doc_id % 8 = 0 THEN '#sec2' ELSE '' END"
)

_URL_RE = r"^([A-Za-z]+)://([^/?#]*)([^?#]*)"
_TRACKING_RE = "^(utm_[a-z]+|fbclid|gclid)="


def _norm_url_cols(raw: Column) -> dict[str, Column]:
    """url_norm + domain from a raw URL, all Catalyst expressions.

    Ladder: lowercase scheme+authority; strip ``www.``; strip the
    scheme's DEFAULT port only (:443 https / :80 http — :8080 stays);
    strip path trailing slashes (empty path → '/'); drop the fragment;
    drop tracking params; sort surviving params."""
    scheme = F.lower(F.regexp_extract(raw, _URL_RE, 1))
    auth = F.regexp_replace(
        F.lower(F.regexp_extract(raw, _URL_RE, 2)), r"^www\.", ""
    )
    hostport = (
        F.when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .otherwise(auth)
    )
    path = F.regexp_replace(F.regexp_extract(raw, _URL_RE, 3), "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.regexp_extract(raw, r"\?([^#]*)", 1)
    q_clean = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qs, "&"),
                lambda x: (x != "") & ~x.rlike(_TRACKING_RE),
            )
        ),
        "&",
    )
    url_norm = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(q_clean != "", F.concat(F.lit("?"), q_clean)).otherwise(F.lit("")),
    )
    domain = F.regexp_replace(hostport, ":[0-9]+$", "")
    return {"url_norm": url_norm, "domain": domain}


def _docs_with_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = F.expr(RAW_URL_EXPR)
    cols = _norm_url_cols(raw)
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        "text",
        raw.alias("raw_url"),
        cols["url_norm"].alias("url_norm"),
        cols["domain"].alias("domain"),
    )


def url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical page table after URL normalization: one row per
    normalized URL with its crawl multiplicity and the kept (min
    doc_id) representative. Map-only normalization + ONE url_norm-grain
    shuffle; uniform md5-shaped keys, no skew."""
    urls = _docs_with_urls(spark, sf_dir)
    return (
        urls.groupBy("url_norm", "domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .orderBy("url_norm")
    )


# The normalization ladder as DuckDB SQL over the SAME raw expression.
# Every regexp is anchored (at most one match), so DuckDB's
# replace-first and Spark's replace-all agree by construction.
_URL_NORM_CTES = f"""raw AS (
  SELECT doc_id, source, n_chars, text, {RAW_URL_EXPR} AS raw_url
  FROM documents
),
parts AS (
  SELECT *,
         lower(regexp_extract(raw_url, '{_URL_RE}', 1)) AS scheme,
         regexp_replace(lower(regexp_extract(raw_url, '{_URL_RE}', 2)),
                        '^www\\.', '') AS auth,
         regexp_replace(regexp_extract(raw_url, '{_URL_RE}', 3),
                        '/+$', '') AS path0,
         regexp_extract(raw_url, '\\?([^#]*)', 1) AS qs
  FROM raw
),
normed AS (
  SELECT doc_id, source, n_chars, text,
         scheme || '://' || hostport
           || CASE WHEN path0 = '' THEN '/' ELSE path0 END
           || CASE WHEN q_clean <> '' THEN '?' || q_clean ELSE '' END AS url_norm,
         regexp_replace(hostport, ':[0-9]+$', '') AS domain
  FROM (
    SELECT *,
           CASE WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
                WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
                ELSE auth END AS hostport,
           array_to_string(list_sort(list_filter(string_split(qs, '&'),
             x -> x <> '' AND NOT regexp_matches(x, '{_TRACKING_RE}'))),
             '&') AS q_clean
    FROM parts
  )
)"""


URL_NORMALIZE_DEDUP_SQL = f"""
WITH {_URL_NORM_CTES}
SELECT url_norm, domain, COUNT(*) AS n_docs,
       MIN(doc_id) AS canonical_doc_id
FROM normed
GROUP BY url_norm, domain
ORDER BY url_norm
"""


def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain curation rollup: distinct pages after normalization,
    raw crawl count, duplicate pages droppable, and the char/token mass
    the domain contributes — the table a per-domain quota stage
    (plans/training2.domain_quota_sample) consumes. One domain-grain
    shuffle over ~registrable-domain cardinality."""
    urls = _docs_with_urls(spark, sf_dir)
    per_url = urls.groupBy("domain", "url_norm").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.token_count("text")).alias("n_tok"),
        F.sum("n_chars").alias("n_ch"),
    )
    return (
        per_url.groupBy("domain")
        .agg(
            F.countDistinct("url_norm").alias("n_pages"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            (F.sum("n_docs") - F.count(F.lit(1))).cast("long").alias("n_dup_docs"),
            F.sum("n_ch").cast("long").alias("total_chars"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
        .orderBy("domain")
    )


DOMAIN_STATS_SQL = f"""
WITH {_URL_NORM_CTES},
per_url AS (
  SELECT domain, url_norm, COUNT(*) AS n_docs,
         SUM({_sql_n_tokens()}) AS n_tok,
         SUM(n_chars) AS n_ch
  FROM normed
  GROUP BY domain, url_norm
)
SELECT domain,
       COUNT(DISTINCT url_norm) AS n_pages,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(n_docs) - COUNT(*) AS BIGINT) AS n_dup_docs,
       CAST(SUM(n_ch) AS BIGINT) AS total_chars,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM per_url
GROUP BY domain
ORDER BY domain
"""


CURATION5_QUERIES = {
    "embed_with_model": embed_with_model,
    "model_ann_topk": model_ann_topk,
    "url_normalize_dedup": url_normalize_dedup,
    "domain_stats": domain_stats,
}

CURATION5_ORACLE_SQL = {
    "embed_with_model": EMBED_WITH_MODEL_SQL,
    "model_ann_topk": MODEL_ANN_TOPK_SQL,
    "url_normalize_dedup": URL_NORMALIZE_DEDUP_SQL,
    "domain_stats": DOMAIN_STATS_SQL,
}
