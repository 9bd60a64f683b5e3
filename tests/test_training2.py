"""Training-corpus batch 2 invariants: repetition stats bounds, quota
sampling determinism, OHLC consistency, and the greedy packing contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.plans.training2 import (
    DOMAIN_QUOTA,
    PACK_CAP,
    doc_repetition_stats,
    domain_quota_sample,
    ohlc_hourly,
    seq_packing,
)

SF = "/root/testdata/sf0.001"


def test_repetition_stats_bounds(spark):
    df = doc_repetition_stats(spark, SF)
    bad = df.filter(
        (F.col("dup_bigram_frac") < 0)
        | (F.col("dup_bigram_frac") > 1)
        | (F.col("top_bigram_frac") <= 0)  # top_cnt >= 1
        | (F.col("n_distinct_bigrams") > F.col("n_bigrams"))
        | (F.col("mean_word_len") <= 0)
    ).count()
    assert bad == 0
    assert df.count() > 0


def test_repetition_flag_matches_thresholds(spark):
    df = doc_repetition_stats(spark, SF)
    mismatch = df.filter(
        F.col("flag_repetitive")
        != ((F.col("top_bigram_frac") > 0.18) | (F.col("dup_bigram_frac") > 0.30))
    ).count()
    assert mismatch == 0


def test_domain_quota_enforced_and_deterministic(spark):
    df = domain_quota_sample(spark, SF)
    over = df.groupBy("source").count().filter(F.col("count") > DOMAIN_QUOTA).count()
    assert over == 0
    a = {tuple(r) for r in df.collect()}
    b = {tuple(r) for r in domain_quota_sample(spark, SF).collect()}
    assert a == b  # reshuffle-stable: no RNG anywhere


def test_ohlc_consistency(spark):
    df = ohlc_hourly(spark, SF)
    bad = df.filter(
        (F.col("high") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("close") < F.col("low"))
        | (F.col("volume") < 1)
    ).count()
    assert bad == 0


def test_seq_packing_contract(spark):
    rows = seq_packing(spark, SF).collect()
    by_seq: dict[tuple[int, int], list] = {}
    for r in rows:
        by_seq.setdefault((r["bucket"], r["seq_no"]), []).append(r)
    for (bucket, seq_no), members in by_seq.items():
        total = sum(r["n_tok"] for r in members)
        # a sequence exceeds the cap only when it is a single over-cap doc
        if total > PACK_CAP:
            assert len(members) == 1, (bucket, seq_no)
        # the running fill recorded on the last member equals the total
        assert max(r["seq_fill"] for r in members) == total
    # sequence numbers are contiguous from 0 within each bucket
    for bucket in {b for b, _ in by_seq}:
        seqs = sorted(s for b, s in by_seq if b == bucket)
        assert seqs == list(range(len(seqs)))


def test_seq_packing_greedy_is_maximal(spark):
    """Greedy never starts a new sequence early: whenever seq_no
    increments, the previous fill plus the new doc would have overflowed."""
    rows = sorted(
        seq_packing(spark, SF).collect(), key=lambda r: (r["bucket"], r["doc_id"])
    )
    prev = {}
    for r in rows:
        if r["bucket"] in prev:
            p = prev[r["bucket"]]
            if r["seq_no"] != p["seq_no"]:
                assert r["seq_no"] == p["seq_no"] + 1
                assert p["seq_fill"] + r["n_tok"] > PACK_CAP
        prev[r["bucket"]] = r
