"""Bloom-pruned admission, OOV coverage, PQ→exact rerank, hopping
windows (plans/curation8.py, plans/streaming_queries.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.functions import text as TX
from data_pipeline_who_gho_spark.plans.curation import dedup_incremental
from data_pipeline_who_gho_spark.plans.curation8 import (
    _RERANK_CAND_K,
    ann_pq_rerank,
    bloom_bitmap,
    bloom_probe,
    bloom_prune_incremental,
    oov_rate_per_source,
)
from data_pipeline_who_gho_spark.plans.streaming_queries import (
    stream_hopping_counts,
)
from data_pipeline_who_gho_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _hist(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    return docs.filter(F.col("doc_id") % 2 == 0).select(
        TX.fingerprint_md5("text").alias("fingerprint")
    )


def test_bloom_no_false_negatives(spark):
    """Every key folded INTO the bitmap must probe maybe-present — the
    structural guarantee that makes the prune lossless."""
    hist = _hist(spark)
    probed = bloom_probe(
        hist.withColumn("doc_id", F.monotonically_increasing_id()),
        bloom_bitmap(hist),
        "doc_id",
    )
    assert probed.filter(~F.col("maybe_present")).count() == 0


def test_bloom_actually_prunes(spark):
    """Some batch docs must be definitely-absent (skip the anti-join
    entirely) — otherwise the prefilter is dead weight on this fixture."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    hist = _hist(spark)
    batch = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        TX.fingerprint_md5("text").alias("fingerprint"),
    )
    probed = bloom_probe(batch, bloom_bitmap(hist), "doc_id")
    assert probed.filter(~F.col("maybe_present")).count() > 0


def test_bloom_result_equals_plain_anti_join(spark):
    got = {
        (r["doc_id"], r["fingerprint"])
        for r in bloom_prune_incremental(spark, SF).collect()
    }
    want = {
        (r["doc_id"], r["fingerprint"])
        for r in dedup_incremental(spark, SF).collect()
    }
    assert got == want and len(want) > 0


def test_oov_rate_live_and_consistent(spark):
    rows = oov_rate_per_source(spark, SF).collect()
    assert len(rows) > 1
    assert any(0 < r["n_oov"] < r["n_tokens"] for r in rows)
    for r in rows:
        assert r["oov_permicro"] == r["n_oov"] * 1000000 // r["n_tokens"]


def test_rerank_matches_numpy_exact_order(spark):
    """Within each query's PQ candidate set, the rerank order must be
    the EXACT fixed-point L2 order computed independently in numpy."""
    from data_pipeline_who_gho_spark.plans.curation2 import _pq_approx

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF, "embeddings").collect()
    }
    cand = {}
    for r in _pq_approx(spark, SF, topk=_RERANK_CAND_K).collect():
        cand.setdefault(r["query_id"], []).append(r["vec_id"])
    got = {}
    for r in ann_pq_rerank(spark, SF).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["exact_fx"]))
    assert set(got) == set(cand)
    for q, rows in got.items():
        qv = vecs[q]

        def fx(v):
            d = qv - vecs[v]
            return int(np.floor(d * d * 1e9).astype(np.int64).sum())

        want = sorted(((fx(v), v) for v in cand[q]))[: len(rows)]
        assert [(v, e) for _, v, e in sorted(rows)] == [(v, e) for e, v in want]


def test_hopping_counts_double_count_invariant(spark):
    """2-hour windows hopping hourly: every event is in exactly two
    windows, so the window-sum equals 2× the event count and every
    window spans exactly 2 hours starting on the hour."""
    rows = stream_hopping_counts(spark, SF).collect()
    n_events = load_table(spark, SF, "events").count()
    assert sum(r["n_events"] for r in rows) == 2 * n_events
    for r in rows:
        assert (r["window_end"] - r["window_start"]).total_seconds() == 7200
        assert r["window_start"].minute == 0 and r["window_start"].second == 0
