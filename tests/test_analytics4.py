"""Semantic invariants for the fourth analytics batch (plans/analytics4).

The oracle gate already hash-matches outputs against DuckDB; these tests
pin the *algorithmic* properties on the sf0.001 fixtures plus hand-built
micro-inputs where the property is easier to see.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.functions.sketches import misra_gries_partial
from data_pipeline_who_gho_spark.plans.analytics4 import (
    _HH_K,
    _TOKENS_EXPR,
    heavy_hitters,
    max_concurrent_events,
    quantize_embeddings,
    robust_stats,
    sample_hash_stratified,
    scd2_user_status,
)
from data_pipeline_who_gho_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_scd2_islands_partition_events(spark):
    """Versioned rows exactly partition each user's events: run lengths
    sum to the user's event count, and consecutive rows never share an
    event_type (maximal runs)."""
    ev = load_table(spark, SF, "events")
    out = scd2_user_status(spark, SF).cache()
    per_user = out.groupBy("user_id").agg(F.sum("n_events").alias("total"))
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("total"))
    assert per_user.exceptAll(truth).count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    repeats = (
        out.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev") == F.col("event_type"))
        .count()
    )
    assert repeats == 0
    out.unpersist()


def test_sweep_line_matches_brute_force(spark):
    """Max concurrency from the sweep line equals a brute-force check at
    every event-start instant (concurrency can only peak at a start)."""
    out = {r["event_type"]: r["max_concurrent"] for r in max_concurrent_events(spark, SF).collect()}
    ev = load_table(spark, SF, "events").select("event_type", "ts")
    starts = ev.alias("s")
    brute = (
        starts.join(
            ev.alias("e"),
            (F.col("e.event_type") == F.col("s.event_type"))
            & (F.col("e.ts") <= F.col("s.ts"))
            & (F.col("s.ts") < F.col("e.ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .groupBy("s.event_type", "s.ts")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("s.event_type")
        .agg(F.max("c").alias("m"))
        .collect()
    )
    assert {r["event_type"]: r["m"] for r in brute} == out


def test_hash_sample_fraction_and_determinism(spark):
    out1 = sample_hash_stratified(spark, SF).collect()
    out2 = sample_hash_stratified(spark, SF).collect()
    assert out1 == out2  # reshuffle/run stable
    n_total = sum(r["n_total"] for r in out1)
    n_sampled = sum(r["n_sampled"] for r in out1)
    assert 0.04 < n_sampled / n_total < 0.20  # ~10% Bernoulli at small n


def test_misra_gries_superset_guarantee(spark):
    """Candidate union must contain every token with freq > n/k, so the
    final output equals the exact GROUP BY computed Spark-side."""
    docs = load_table(spark, SF, "documents").select("text")
    tok = docs.select(F.explode(F.expr(_TOKENS_EXPR)).alias("token"))
    n = tok.count()
    exact = {
        (r["token"], r["cnt"])
        for r in tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * _HH_K > n)
        .collect()
    }
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(spark, SF).collect()}
    assert got == exact
    assert len(got) > 0


def test_misra_gries_partial_bounds(spark):
    """Per-partition summary keeps < k counters and never overestimates."""
    import pandas as pd

    fn = misra_gries_partial(4)
    data = pd.DataFrame({"token": ["a"] * 10 + ["b"] * 5 + list("cdefgh")})
    (res,) = list(fn(iter([data])))
    sentinel = res[res["is_total"]]
    assert len(sentinel) == 1 and int(sentinel["est"].iloc[0]) == len(data)
    cand = res[~res["is_total"]]
    assert len(cand) <= 3
    counts = dict(zip(cand["token"], cand["est"]))
    assert counts.get("a", 0) <= 10 and counts.get("a", 0) >= 10 - len(data) // 4


def test_quantization_bounds_and_error(spark):
    rows = quantize_embeddings(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert -128 <= r["min_q"] <= r["max_q"] <= 127
        if r["hi"] > r["lo"]:
            # max reconstruction error ≤ half a quantization step
            step = (r["hi"] - r["lo"]) / 255
            assert r["max_abs_err"] <= step / 2 + 1e-12
            assert r["min_q"] == -128 and r["max_q"] == 127  # extremes hit the rails


def test_robust_stats_invariants(spark):
    for r in robust_stats(spark, SF).collect():
        assert r["iqr"] >= 0 and r["mad"] >= 0
        assert r["n"] > 0


@pytest.mark.parametrize("k", [2, 8])
def test_misra_gries_never_negative(k):
    import pandas as pd

    fn = misra_gries_partial(k)
    (res,) = list(fn(iter([pd.DataFrame({"token": list("abcabcxyz")})])))
    assert (res["est"] > 0).all()
    assert int(res[res["is_total"]]["est"].iloc[0]) == 9
