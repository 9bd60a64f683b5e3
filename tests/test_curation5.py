"""Round-5 curation stages (plans/curation5.py): the batched
model-inference seam and URL/domain curation, plus the tokenizer
decode round-trip (plans/tokenizer.bpe_decode_roundtrip)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.plans.curation5 import (
    _HASH_DIM,
    _MODEL_DIM,
    _MODEL_W,
    _dense_counts,
    _model_vectors,
    domain_stats,
    embed_with_model,
    model_ann_topk,
    model_project_udf,
    url_normalize_dedup,
)
from data_pipeline_who_gho_spark.plans.tokenizer import bpe_decode_roundtrip
from data_pipeline_who_gho_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# model encoder seam
# ---------------------------------------------------------------------------


def test_model_encoder_batch_size_invariance(spark):
    """The pandas_udf encoder must produce identical embeddings no
    matter how Arrow slices the batches — the property that lets a real
    model swap in without changing plan semantics."""
    dense = _dense_counts(spark, SF)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    results = {}
    try:
        for batch in ("3", "10000"):
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", batch)
            out = (
                dense.select(
                    "doc_id", model_project_udf()(F.col("counts")).alias("vec")
                )
                .orderBy("doc_id")
                .collect()
            )
            results[batch] = [(r["doc_id"], list(r["vec"])) for r in out]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert results["3"] == results["10000"]
    assert len(results["3"]) > 0


def test_model_encoder_matches_numpy_reference(spark):
    """Spot-check the udf against a driver-side numpy matmul of the
    same counts — the encoder is exactly X @ W, nothing else."""
    rows = _dense_counts(spark, SF).orderBy("doc_id").limit(20).collect()
    encoded = {
        r["doc_id"]: list(r["vec"])
        for r in _model_vectors(spark, SF).orderBy("doc_id").limit(20).collect()
    }
    W = np.array(_MODEL_W, dtype=np.int64)
    for r in rows:
        expect = (np.asarray(r["counts"], dtype=np.int64) @ W).tolist()
        assert encoded[r["doc_id"]] == expect


def test_model_weights_shape_and_range():
    assert len(_MODEL_W) == _HASH_DIM
    assert all(len(row) == _MODEL_DIM for row in _MODEL_W)
    flat = [w for row in _MODEL_W for w in row]
    assert all(-8 <= w <= 8 for w in flat)
    assert len(set(flat)) > 3, "degenerate weight matrix"


def test_embed_with_model_every_doc_every_dim(spark):
    out = embed_with_model(spark, SF)
    n_docs = load_table(spark, SF, "documents").count()
    assert out.count() == n_docs * _MODEL_DIM
    dims = [r["dim"] for r in out.select("dim").distinct().collect()]
    assert sorted(dims) == list(range(_MODEL_DIM))


def test_model_ann_topk_feeds_ann_shape(spark):
    out = model_ann_topk(spark, SF).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) > 0
    for qid, rows in by_q.items():
        ranks = [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert ranks == list(range(1, len(rows) + 1))
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != qid for r in rows)
        assert all(-1.0 <= r["cosine"] <= 1.0 for r in rows)


# ---------------------------------------------------------------------------
# URL normalization
# ---------------------------------------------------------------------------


def test_url_normalization_ladder_unit_cases(spark):
    """Constructed dirty URLs → pinned normalized forms (the
    normalization contract, independent of the derived corpus URLs)."""
    from data_pipeline_who_gho_spark.plans.curation5 import _norm_url_cols

    cases = [
        # (raw, expected url_norm, expected domain)
        ("HTTPS://WWW.Site.COM:443/a/b/?utm_source=x&id=3#frag",
         "https://site.com/a/b?id=3", "site.com"),
        ("http://site.com:80/", "http://site.com/", "site.com"),
        ("http://site.com:8080/p?b=2&utm_campaign=c&a=1",
         "http://site.com:8080/p?a=1&b=2", "site.com"),
        ("https://Site.com", "https://site.com/", "site.com"),
        ("http://www.x.org/docs/?gclid=abc", "http://x.org/docs", "x.org"),
    ]
    df = spark.createDataFrame([(r,) for r, _, _ in cases], ["raw"])
    cols = _norm_url_cols(F.col("raw"))
    got = df.select(
        "raw", cols["url_norm"].alias("u"), cols["domain"].alias("d")
    ).collect()
    by_raw = {r["raw"]: (r["u"], r["d"]) for r in got}
    for raw, exp_u, exp_d in cases:
        assert by_raw[raw] == (exp_u, exp_d), raw


def test_url_dedup_partitions_the_corpus(spark):
    docs = load_table(spark, SF, "documents").count()
    out = url_normalize_dedup(spark, SF).cache()
    total = out.agg(F.sum("n_docs")).first()[0]
    assert total == docs  # every doc lands under exactly one url_norm
    assert out.count() < docs  # normalization actually merges crawls
    # canonical id is a member minimum: no canonical id exceeds doc count
    bad = out.filter(F.col("canonical_doc_id") < 0).count()
    assert bad == 0
    out.unpersist()


def test_domain_stats_consistency(spark):
    out = domain_stats(spark, SF).cache()
    urls = url_normalize_dedup(spark, SF)
    # per-domain page counts agree between the two queries
    pages = {r["domain"]: r["n"] for r in
             urls.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in out.collect():
        assert r["n_pages"] == pages[r["domain"]]
        assert r["n_dup_docs"] == r["n_docs"] - r["n_pages"]
        assert r["total_chars"] > 0
    # domains cover all docs
    n_docs = load_table(spark, SF, "documents").count()
    assert out.agg(F.sum("n_docs")).first()[0] == n_docs
    out.unpersist()


# ---------------------------------------------------------------------------
# tokenizer decode round-trip
# ---------------------------------------------------------------------------


def test_bpe_decode_roundtrip_all_true(spark):
    out = bpe_decode_roundtrip(spark, SF).cache()
    n_docs = load_table(spark, SF, "documents").count()
    assert out.count() == n_docs
    assert out.filter(~F.col("roundtrip_ok")).count() == 0
    # token counts agree with the encode fingerprint query
    from data_pipeline_who_gho_spark.plans.tokenizer import bpe_encode_fingerprint

    enc = {r["doc_id"]: r["n_tokens"]
           for r in bpe_encode_fingerprint(spark, SF).collect()}
    for r in out.collect():
        assert r["n_tokens"] == enc[r["doc_id"]]
    out.unpersist()
