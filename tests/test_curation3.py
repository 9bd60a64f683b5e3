"""Export-side ops: seeded training-order shuffle, hashed doc vectors."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.plans.curation3 import (
    _HASH_DIM,
    _SHUFFLE_SEED,
    _STRAT_VAL_FRAC,
    hashed_doc_vectors,
    stratified_split_exact,
    train_order_shuffle,
)

SF = "/root/testdata/sf0.001"


def _ascii_tokens(text: str) -> list[str]:
    """Match the plan's tokenizer exactly: Spark `trim` strips SPACES
    only and Java-regex \\s is ASCII whitespace — Python str.split()
    honors Unicode whitespace and would silently diverge on NBSP etc."""
    return [
        t
        for t in re.split(r"[ \t\n\x0b\f\r]+", text.strip(" ").lower())
        if t
    ]


def test_shuffle_is_a_permutation(spark):
    rows = train_order_shuffle(spark, SF).collect()
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n
    assert sorted(r["position"] for r in rows) == list(range(1, n + 1))
    assert len({r["doc_id"] for r in rows}) == n


def test_shuffle_matches_driver_side_sort(spark):
    """The order is exactly rank of md5(seed:doc_id) — recompute on the
    driver with hashlib and compare end-to-end."""
    rows = train_order_shuffle(spark, SF).collect()
    expect = sorted(
        (hashlib.md5(f"{_SHUFFLE_SEED}:{r['doc_id']}".encode()).hexdigest(), r["doc_id"])
        for r in rows
    )
    got = [(r["shuffle_key"], r["doc_id"]) for r in sorted(rows, key=lambda r: r["position"])]
    assert got == expect


def test_shuffle_breaks_ingest_locality(spark):
    """Adjacent positions should not be adjacent doc_ids (the point of
    the shuffle): the mean absolute doc_id gap between consecutive
    positions is ~n/3 for a uniform permutation, far above 1."""
    rows = sorted(train_order_shuffle(spark, SF).collect(), key=lambda r: r["position"])
    gaps = [abs(a["doc_id"] - b["doc_id"]) for a, b in zip(rows, rows[1:])]
    assert sum(gaps) / len(gaps) > len(rows) / 10


def test_stratified_split_exact_quotas(spark):
    """Every source gets exactly floor(0.1 * n_source) val docs."""
    rows = stratified_split_exact(spark, SF).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src) > 1
    for src, docs in by_src.items():
        n_val = sum(1 for r in docs if r["split"] == "val")
        assert n_val == int(len(docs) * _STRAT_VAL_FRAC)
        # within_pos is a 1..n permutation per source
        assert sorted(r["within_pos"] for r in docs) == list(range(1, len(docs) + 1))


def test_stratified_split_deterministic_and_seed_ordered(spark):
    """Membership is the seeded md5 order — the lowest-hash docs of each
    source are the val slice, independent of partitioning."""
    import hashlib

    rows = stratified_split_exact(spark, SF).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, docs in by_src.items():
        hashed = sorted(
            (hashlib.md5(f"strat:{r['doc_id']}".encode()).hexdigest(), r["doc_id"])
            for r in docs
        )
        quota = int(len(docs) * _STRAT_VAL_FRAC)
        expect_val = {d for _, d in hashed[:quota]}
        got_val = {r["doc_id"] for r in docs if r["split"] == "val"}
        assert got_val == expect_val


def test_stratified_split_null_source_is_a_stratum(spark):
    """Docs with a NULL source must not vanish: they form their own
    stratum with its own exact quota (regression for the null-safe
    offset join; SQL PARTITION BY groups NULLs together)."""
    from data_pipeline_who_gho_spark.plans.curation3 import split_stratified

    rows = [(i, "web" if i % 3 == 0 else None) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = split_stratified(docs).collect()
    assert len(out) == 40  # nothing dropped
    null_rows = [r for r in out if r["source"] is None]
    assert len(null_rows) == 26
    assert sum(1 for r in null_rows if r["split"] == "val") == int(26 * _STRAT_VAL_FRAC)
    web_rows = [r for r in out if r["source"] == "web"]
    assert sum(1 for r in web_rows if r["split"] == "val") == int(14 * _STRAT_VAL_FRAC)


def test_quality_classifier_matches_driver_side_model(spark):
    """Recompute one doc's score driver-side from raw text + weights."""
    from data_pipeline_who_gho_spark.plans.curation3 import (
        _QC_WEIGHTS,
        quality_classifier_score,
    )

    rows = {r["doc_id"]: r for r in quality_classifier_score(spark, SF).collect()}
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n
    # both classes occur on real data (weights are centered)
    assert any(r["kept"] for r in rows.values())
    assert any(not r["kept"] for r in rows.values())
    doc = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") == 0)
        .collect()[0]
    )
    score = 0
    n_tok = 0
    for w in _ascii_tokens(doc["text"]):
        b = int(hashlib.md5(w.encode()).hexdigest()[0], 16)
        score += _QC_WEIGHTS[b]
        n_tok += 1
    got = rows[0]
    assert got["n_tokens"] == n_tok
    assert got["score"] == score
    assert got["kept"] == (score > 0)


def test_hashed_vectors_shape_and_norm(spark):
    rows = hashed_doc_vectors(spark, SF).collect()
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n
    for r in rows[:50]:
        assert len(r["vec"]) == _HASH_DIM
        norm = math.sqrt(sum(x * x for x in r["vec"]))
        if r["n_tokens"] > 0:
            assert abs(norm - 1.0) < 1e-4  # unit vectors (rounded to 6dp)
        assert all(x >= 0 for x in r["vec"])


def test_hashed_vectors_match_driver_side_hashing(spark):
    """Recompute one doc's vector driver-side from the raw text."""
    doc = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") == 0)
        .collect()[0]
    )
    counts = [0] * _HASH_DIM
    for w in _ascii_tokens(doc["text"]):
        counts[int(hashlib.md5(w.encode()).hexdigest()[0], 16)] += 1
    norm = math.sqrt(sum(c * c for c in counts))
    expect = [round(c / norm, 6) for c in counts]
    got = hashed_doc_vectors(spark, SF).filter(F.col("doc_id") == 0).collect()[0]
    assert got["n_tokens"] == sum(counts)
    assert got["vec"] == expect
