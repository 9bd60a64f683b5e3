"""Deterministic HyperLogLog and Count-Min sketches (plans/sketches.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.plans.sketches import (
    _CMS_TOPK,
    _HLL_M,
    cms_bigram_counts,
    hll_distinct_per_source,
    hll_union_total,
)

SF = "/root/testdata/sf0.001"


def test_hll_per_source_within_theory(spark):
    """Raw-regime estimates land within ~4 standard errors of exact
    (σ = 1.04/√m); every source is above the small-range cutoff where
    the raw estimator applies."""
    rows = hll_distinct_per_source(spark, SF).collect()
    assert len(rows) > 0
    sigma = 1.04 / math.sqrt(_HLL_M)
    for r in rows:
        assert r["n_exact"] > 2.5 * _HLL_M, "corpus left the raw-estimator regime"
        rel = abs(r["hll_estimate"] - r["n_exact"]) / r["n_exact"]
        assert rel < 4 * sigma, (r["source"], rel)
        assert 0 <= r["zero_regs"] < _HLL_M


def test_hll_union_merges_registers(spark):
    """The merged-sketch estimate must approximate the CORPUS distinct
    count (not the sum of per-source counts — shingles shared across
    sources collapse)."""
    u = hll_union_total(spark, SF).collect()[0]
    rel = abs(u["hll_estimate"] - u["n_exact"]) / u["n_exact"]
    assert rel < 4 * (1.04 / math.sqrt(_HLL_M))
    per_source = hll_distinct_per_source(spark, SF).agg(
        F.sum("n_exact").alias("s")
    ).collect()[0]["s"]
    assert u["n_exact"] < per_source  # sources genuinely overlap


def test_hll_deterministic_across_runs(spark):
    a = {r["source"]: r["hll_estimate"]
         for r in hll_distinct_per_source(spark, SF).collect()}
    b = {r["source"]: r["hll_estimate"]
         for r in hll_distinct_per_source(spark, SF).collect()}
    assert a == b


def test_cms_never_underestimates(spark):
    """The CMS one-sided error guarantee: estimate ≥ exact for every
    probed key, and collisions are LIVE on this corpus (some key
    overestimates) — otherwise the sketch rows prove nothing."""
    rows = cms_bigram_counts(spark, SF).collect()
    assert len(rows) == _CMS_TOPK
    assert all(r["cms_estimate"] >= r["n_exact"] for r in rows)
    assert all(r["overestimate"] == r["cms_estimate"] - r["n_exact"] for r in rows)
    assert any(r["overestimate"] > 0 for r in rows), "collision-free: sketch vacuous"
    # ordered report: exact count desc, bigram asc tiebreak
    keys = [(-r["n_exact"], r["bigram"]) for r in rows]
    assert keys == sorted(keys)


def test_kmv_overlap_invariants_and_accuracy(spark):
    """KMV algebra invariants hold exactly and the estimates land within
    the k=32 sampling band (generous 3σ bounds)."""
    from data_pipeline_who_gho_spark.plans.sketches import (
        _KMV_K,
        kmv_user_day_overlap,
    )

    rows = kmv_user_day_overlap(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10  # C(5,2) type pairs
    for r in rows:
        assert 0 <= r["in_both"] <= _KMV_K
        assert r["jaccard_est_permille"] == 1000 * r["in_both"] // _KMV_K
        assert r["inter_est"] == r["union_est"] * r["in_both"] // _KMV_K
        assert r["inter_exact"] <= min(r["n_a"], r["n_b"])
        union_exact = r["n_a"] + r["n_b"] - r["inter_exact"]
        # KMV distinct estimate: σ ≈ n/√(k−2) → generous 3σ band
        assert union_exact * 0.4 <= r["union_est"] <= union_exact * 2.5
        j_exact = 1000 * r["inter_exact"] // union_exact
        assert abs(r["jaccard_est_permille"] - j_exact) <= 320


def test_quantile_sketch_sampling_band_and_plan(spark):
    """The bottom-k sample estimates land inside a generous sampling
    band around the exact quantiles, and the bottom-k window is
    rank-limit pruned (WindowGroupLimit), not a full-group sort."""
    from data_pipeline_who_gho_spark.plans.sketches import (
        quantile_sketch_by_flag,
    )

    df = quantile_sketch_by_flag(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    for r in df.collect():
        assert r["k_actual"] == 64  # every flag has >= k rows
        # l_quantity spans 1..50; k=64 quantile σ ≈ p(1-p)/√k of the
        # range — allow a generous ±12 band
        assert abs(r["est_p50"] - r["exact_p50"]) <= 12
        assert abs(r["est_p90"] - r["exact_p90"]) <= 12
