"""Cross-operator mathematical invariants: relations that must hold
between INDEPENDENTLY-implemented operators (stronger than per-operator
golden values — an error in shared plumbing breaks these in pairs)."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_containment_dominates_jaccard(spark):
    """|A∩B|/min ≥ |A∩B|/union for every pair, so every Jaccard-qualifying
    pair (t=0.6) must also appear in the containment output (t=0.5) with a
    score at least as large."""
    from data_pipeline_who_gho_spark.plans.extensions import dedup_ngram_jaccard
    from data_pipeline_who_gho_spark.plans.extensions2 import dedup_containment

    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, SF).collect()
    }
    con = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup_containment(spark, SF).collect()
    }
    assert jac, "fixture should produce jaccard pairs"
    for pair, j in jac.items():
        assert pair in con and con[pair] >= j - 1e-12, pair


def test_byte_entropy_bounds(spark):
    """0 ≤ H ≤ ln(min(n_distinct, 256)) micro-nats (uniform bound), and
    n_distinct ≤ n_bytes."""
    from data_pipeline_who_gho_spark.plans.extensions2 import byte_entropy_stats

    for r in byte_entropy_stats(spark, SF).collect():
        assert 0 <= r["entropy_micronats"]
        bound = math.log(min(r["n_distinct_bytes"], 256)) * 1_000_000
        # per-term rounding can add at most 0.5 micro-nat per byte type
        assert r["entropy_micronats"] <= bound + r["n_distinct_bytes"]
        assert r["n_distinct_bytes"] <= r["n_bytes"]


def test_decayed_score_bounded_by_counts(spark):
    """0 < decayed score ≤ n_events · 1e6 (each weight ≤ 1)."""
    from data_pipeline_who_gho_spark.plans.behavior import trending_users_decayed

    for r in trending_users_decayed(spark, SF).collect():
        assert 0 < r["decayed_micro"] <= r["n_events"] * 1_000_000


def test_snm_pairs_subset_of_exact_pairs(spark):
    """SNM blocking can only LOSE pairs relative to the exhaustive
    inverted-index join — never invent them — and agreed pairs carry the
    identical exact Jaccard."""
    from data_pipeline_who_gho_spark.plans.extensions import dedup_ngram_jaccard
    from data_pipeline_who_gho_spark.plans.extensions2 import (
        dedup_sorted_neighborhood,
    )

    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, SF).collect()
    }
    snm = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_sorted_neighborhood(spark, SF).collect()
    }
    assert snm
    for pair, j in snm.items():
        assert exact.get(pair) == j, pair


def test_incremental_admits_complement_of_collisions(spark):
    """Admitted + rejected must partition the batch: |admitted| equals
    batch size minus the count of batch docs whose text also exists in
    the historical half."""
    from pyspark.sql import functions as F

    from data_pipeline_who_gho_spark.plans.curation import dedup_incremental

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    batch_src = docs.filter(F.col("doc_id") % 7 == 0)
    hist_texts = {
        r["text"] for r in docs.filter(F.col("doc_id") % 2 == 0).collect()
    }
    expected = sum(
        1 for r in batch_src.collect() if r["text"] not in hist_texts
    )
    assert dedup_incremental(spark, SF).count() == expected
