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


def test_prefix_join_moves_fewer_postings(spark):
    """The prefix join's input is a strict subset of the postings: at
    threshold t only ~(1-t) of each doc's shingles survive, and the
    commonest shingles (the biggest join buckets) sort last so they are
    pruned first."""
    sh = _shingle_table(spark, SF)
    full_postings = sh.count()
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_sh"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("df_sh", "shingle")
    plen = F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(JACCARD_THRESHOLD)) + 1
    prefix_postings = (
        sh.join(freq, "shingle")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= plen)
        .count()
    )
    assert prefix_postings < full_postings * (1 - JACCARD_THRESHOLD) * 1.2
    assert prefix_postings > 0
