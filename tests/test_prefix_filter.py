"""Prefix-filtered set-similarity join (extensions.dedup_prefix_filter):
exact-output equivalence with the inverted-index path and the actual
candidate reduction that justifies it as a scale path."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.plans.extensions import (
    JACCARD_THRESHOLD,
    _shingle_table,
    dedup_ngram_jaccard,
    dedup_prefix_filter,
)

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["doc_a"], r["doc_b"], round(r["jaccard"], 9)) for r in df.collect()}


def test_prefix_filter_exactly_matches_inverted_index(spark):
    assert _pairs(dedup_prefix_filter(spark, SF)) == _pairs(
        dedup_ngram_jaccard(spark, SF)
    )


def test_df_cutoff_contract(spark):
    """The skew guard's documented contract: verification recounts the
    true intersection, so surviving pairs carry identical exact Jaccard,
    and the ONLY pairs an aggressive cutoff can lose are those whose
    every shared shingle is hot (df > cutoff). The fixture's default
    cutoff (1000 ≫ max df 4) therefore changes nothing — asserted by
    test_prefix_filter_exactly_matches_inverted_index."""
    full = _pairs(dedup_ngram_jaccard(spark, SF))
    pruned = _pairs(dedup_ngram_jaccard(spark, SF, df_cutoff=3))
    assert pruned <= full
    # every lost pair shares ONLY hot shingles (df > cutoff)
    lost = full - pruned
    assert lost, "fixture should exercise the guard at cutoff=3"
    shf = _shingle_table(spark, SF)  # df_sh is built into the cached table
    for doc_a, doc_b, _ in lost:
        shared_min_df = (
            shf.filter(F.col("doc_id") == doc_a)
            .select("shingle", "df_sh")
            .join(shf.filter(F.col("doc_id") == doc_b).select("shingle"), "shingle")
            .agg(F.min("df_sh"))
            .collect()[0][0]
        )
        assert shared_min_df > 3, (doc_a, doc_b, shared_min_df)


def test_df_cutoff_prunes_hot_postings(spark):
    """The candidate index under a low cutoff is a strict subset of the
    postings — the hottest (biggest-bucket) shuffle keys are the ones
    removed."""
    sh = _shingle_table(spark, SF)  # df_sh is built into the cached table
    hot = sh.filter(F.col("df_sh") > 3).select("shingle").distinct().count()
    assert hot > 0  # the fixture actually exercises the guard
    pruned = sh.filter(F.col("df_sh") <= 3).count()
    assert pruned < sh.count()


def test_prefix_join_moves_fewer_postings(spark):
    """The prefix join's input is a strict subset of the postings: at
    threshold t only ~(1-t) of each doc's shingles survive, and the
    commonest shingles (the biggest join buckets) sort last so they are
    pruned first."""
    sh = _shingle_table(spark, SF)  # df_sh is built into the cached table
    full_postings = sh.count()
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("df_sh", "shingle")
    plen = F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(JACCARD_THRESHOLD)) + 1
    prefix_postings = (
        sh.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= plen)
        .count()
    )
    assert prefix_postings < full_postings * (1 - JACCARD_THRESHOLD) * 1.2
    assert prefix_postings > 0
