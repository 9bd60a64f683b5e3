"""Round-4 curation stages (plans/curation4.py): CCNet-style
perplexity terciles, keep-best cluster representatives, dedup report."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.plans.curation4 import (
    corpus_dedup_report,
    dedup_cluster_best,
    perplexity_buckets,
)

SF = "/root/testdata/sf0.001"


def test_perplexity_buckets_cover_every_doc_in_terciles(spark):
    out = perplexity_buckets(spark, SF).cache()
    from data_pipeline_who_gho_spark.sources.catalog import load_table

    n_docs = load_table(spark, SF, "documents").count()
    assert out.count() == n_docs  # every-doc contract

    by_bucket = {r["ppl_bucket"]: r["n"] for r in
                 out.groupBy("ppl_bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    scored = sum(v for k, v in by_bucket.items() if k != "unscored")
    # ANSI ntile: tercile sizes differ by at most 1
    sizes = [by_bucket.get(k, 0) for k in ("head", "middle", "tail")]
    assert max(sizes) - min(sizes) <= 1 and sum(sizes) == scored
    # kept = head + middle exactly
    kept = out.filter("kept").count()
    assert kept == by_bucket.get("head", 0) + by_bucket.get("middle", 0)
    # head is the HIGH-fluency tercile: its min avg_lp >= tail's max
    head_min = out.filter("ppl_bucket = 'head'").agg(F.min("avg_lp_micronats")).first()[0]
    tail_max = out.filter("ppl_bucket = 'tail'").agg(F.max("avg_lp_micronats")).first()[0]
    assert head_min >= tail_max
    out.unpersist()


def test_cluster_best_picks_max_score_min_id(spark):
    out = dedup_cluster_best(spark, SF).cache()
    rows = out.collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert by_cluster, "fixture corpus must produce clusters"
    for members in by_cluster.values():
        reps = [m for m in members if m["is_rep"]]
        assert len(reps) == 1
        rep = reps[0]
        best = max(members, key=lambda m: (m["score"], -m["doc_id"]))
        assert rep["doc_id"] == best["doc_id"] == rep["rep_id"]
        assert all(m["cluster_size"] == len(members) for m in members)
    out.unpersist()


def test_dedup_report_consistency(spark):
    r = corpus_dedup_report(spark, SF).first()
    assert r["n_clustered_docs"] >= r["n_clusters"] >= 1
    assert r["n_dup_docs"] == r["n_clustered_docs"] - r["n_clusters"]
    assert r["n_docs"] >= r["n_clustered_docs"]
    assert abs(r["drop_rate"] - r["n_dup_docs"] / r["n_docs"]) < 1e-12
    assert r["dup_tokens"] > 0  # injected hybrids guarantee droppable mass
