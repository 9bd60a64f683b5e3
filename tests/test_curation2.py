"""Sub-document curation ops: passage dedup, duplicated spans, PQ-ADC."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.plans.curation2 import (
    _PQ_QUERY_MOD,
    _PQ_TOPK,
    _SPAN_K,
    ann_ivf_pq,
    dedup_passages,
    duplicate_spans,
    remove_duplicate_spans,
)

SF = "/root/testdata/sf0.001"


def test_passage_dedup_suppresses_hybrids_keeps_originals(spark):
    rows = dedup_passages(spark, SF).collect()
    base = [r for r in rows if r["doc_id"] < 2000000]
    hybrids = [r for r in rows if r["doc_id"] >= 2000000]
    assert hybrids, "fixture must inject hybrid docs"
    # a hybrid whose prefix source has ≥ 32 tokens is passage-ALIGNED
    # with both sources, so it loses passages to them; a shorter source
    # shifts the window grid and the hybrid's passages are all novel
    n_tok = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n"))
        .collect()
    }
    aligned = [r for r in hybrids if n_tok[r["doc_id"] - 2000000] >= 32]
    assert aligned, "fixture needs at least one aligned hybrid"
    # every aligned-hybrid passage is one of its sources' passages, and
    # both sources precede it in owner order: total suppression
    assert all(r["n_kept"] == 0 for r in aligned)
    # base docs always keep their first-occurrence passages; the corpus
    # generator reuses chunks across docs, so SOME base docs lose later
    # occurrences, but never all of their passages to a later doc
    assert any(r["n_kept"] == r["n_passages"] for r in base)
    # doc 0 owns the smallest okey for every fingerprint it carries
    doc0 = next(r for r in base if r["doc_id"] == 0)
    assert doc0["n_kept"] == doc0["n_passages"]


def test_passage_dedup_conserves_distinct_passages(spark):
    """Each distinct passage is kept at exactly one location: the sum of
    per-doc kept counts equals the corpus-wide distinct-passage count."""
    from data_pipeline_who_gho_spark.plans.curation2 import (
        _PASSAGE_P,
        _corpus2,
        _token_rows,
    )

    rows = dedup_passages(spark, SF).collect()
    tok = _token_rows(_corpus2(spark, SF))
    n_distinct = (
        tok.withColumn("idx", F.floor(F.col("pos") / _PASSAGE_P).cast("int"))
        .groupBy("doc_id", "idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("passage")
        )
        .select("passage")
        .distinct()
        .count()
    )
    assert sum(r["n_kept"] for r in rows) == n_distinct


def test_duplicate_spans_mark_both_sides(spark):
    spans = duplicate_spans(spark, SF).collect()
    assert spans and all(r["span_len"] >= _SPAN_K for r in spans)
    by_doc: dict[int, list] = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append((r["start_pos"], r["span_len"]))
    hybrid_ids = {d for d in by_doc if d >= 2000000}
    assert hybrid_ids
    for h in hybrid_ids:
        # the hybrid's duplicated material must also be flagged in its
        # source docs (span detection is symmetric)
        src = h - 2000000
        assert src in by_doc or (src + 1) in by_doc
        # the 32-token prefix copied from src shows up as an island
        # anchored at position 0
        assert any(s == 0 for s, _ in by_doc[h])


def test_remove_spans_cuts_laters_keeps_firsts(spark):
    rows = {r["doc_id"]: r for r in remove_duplicate_spans(spark, SF).collect()}
    spans = duplicate_spans(spark, SF).collect()
    docs_with_spans = {r["doc_id"] for r in spans}
    # every doc appears, counts are sane
    assert all(0 <= r["n_removed"] <= r["n_tokens"] for r in rows.values())
    # removal only happens in docs the detector flagged
    assert {d for d, r in rows.items() if r["n_removed"] > 0} <= docs_with_spans
    # hybrids copy material from earlier docs, so their copies are cut:
    # every aligned hybrid loses at least one full K-span of tokens
    hybrids = [r for d, r in rows.items() if d >= 2000000]
    assert hybrids and any(r["n_removed"] >= _SPAN_K for r in hybrids)
    # a doc the detector never flagged keeps every token
    clean = [r for d, r in rows.items() if d not in docs_with_spans]
    assert clean and all(r["n_removed"] == 0 for r in clean)
    # corpus-wide each duplicated k-gram keeps exactly its first copy:
    # doc 0 can never lose to a later owner unless covered by a span
    # whose owner lies in doc 0 itself — owners are min keys, so doc 0's
    # first k-gram (pos 0) is always kept
    assert rows[0]["n_removed"] < rows[0]["n_tokens"]


def test_remove_spans_owner_is_kept_exactly_once(spark):
    """The owner occurrence of every duplicated k-gram survives: total
    removals are bounded by sum over duplicated fingerprints of
    (occurrences − 1)·K — the cut budget if ONLY non-owners lose their
    K tokens. A regression that also cuts owners would exceed it."""
    from pyspark.sql import functions as SF_
    from data_pipeline_who_gho_spark.plans.curation2 import (
        _corpus2,
        _kgram_rows,
        _token_rows,
    )

    rows = remove_duplicate_spans(spark, SF).collect()
    total_removed = sum(r["n_removed"] for r in rows)
    assert total_removed > 0
    total_tokens = sum(r["n_tokens"] for r in rows)
    tok = _token_rows(_corpus2(spark, SF))
    assert total_tokens == tok.count()
    budget_row = (
        _kgram_rows(tok)
        .groupBy("fp")
        .agg(SF_.count(SF_.lit(1)).alias("occ"))
        .filter(SF_.col("occ") > 1)
        .agg(SF_.sum((SF_.col("occ") - 1) * _SPAN_K).alias("budget"))
        .collect()[0]
    )
    assert budget_row["budget"] is not None
    assert total_removed <= budget_row["budget"]
    # and at least one duplicated fingerprint's owner demonstrably
    # survives: removals are strictly below the cut-everything total
    cut_everything = (
        _kgram_rows(tok)
        .groupBy("fp")
        .agg(SF_.count(SF_.lit(1)).alias("occ"))
        .filter(SF_.col("occ") > 1)
        .agg(SF_.sum(SF_.col("occ") * _SPAN_K).alias("t"))
        .collect()[0]["t"]
    )
    assert total_removed < cut_everything


def test_pq_structure_and_recall(spark):
    rows = ann_ivf_pq(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["query_id"] % _PQ_QUERY_MOD == 0
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, _PQ_TOPK + 1)
        )
        dist = [r["approx_fx"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert dist == sorted(dist), "approx distance must be monotone in rank"
        assert all(r["vec_id"] != q for r in rs)

    # PQ is approximate, but it must correlate with the exact ranking:
    # average overlap with the exact L2 top-10 strictly positive
    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    overlaps = []
    for q, rs in by_q.items():
        d = {i: float(np.sum((vecs[q] - v) ** 2)) for i, v in vecs.items() if i != q}
        exact = {i for i, _ in sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[:_PQ_TOPK]}
        overlaps.append(len(exact & {r["vec_id"] for r in rs}))
    assert sum(overlaps) / len(overlaps) >= 1.0


def test_ngram_novelty_bounds_and_doc0(spark):
    from data_pipeline_who_gho_spark.plans.curation2 import ngram_novelty

    rows = {r["doc_id"]: r for r in ngram_novelty(spark, SF).collect()}
    assert rows
    for r in rows.values():
        assert 0 <= r["n_novel"] <= r["n_kgrams"]
        assert 0 <= r["novelty_permille"] <= 1000
        assert r["novelty_permille"] == (1000 * r["n_novel"]) // r["n_kgrams"]
    # the smallest okey in the corpus belongs to doc 0: its first k-gram
    # is always novel, and ownership is min-key so doc 0 can only lose
    # k-grams it repeats internally
    assert rows[0]["n_novel"] > 0
    # corpus text reuses chunks across docs, so duplication exists:
    # someone scores below 1000
    assert any(r["novelty_permille"] < 1000 for r in rows.values())
    assert any(r["novelty_permille"] == 1000 for r in rows.values())


def test_okey_guard_raises_on_pos_overflow(spark):
    # ADVICE r03: a pos at/over the 24-bit budget must fail loudly, not
    # silently bleed into doc_id
    from data_pipeline_who_gho_spark.plans.curation2 import _OKEY_POS_BITS, _okey

    ok = spark.createDataFrame([(1, 5)], "doc_id LONG, pos LONG")
    assert ok.select(_okey().alias("k")).first()["k"] == (1 << _OKEY_POS_BITS) + 5

    bad = spark.createDataFrame([(1, 1 << _OKEY_POS_BITS)], "doc_id LONG, pos LONG")
    import pytest as _pytest

    with _pytest.raises(Exception, match="overflows|ASSERT"):
        bad.select(_okey().alias("k")).collect()


def test_ngram_novelty_emits_short_docs(spark, tmp_path):
    # contract (ADVICE r03): every document gets a row; < 10-token docs
    # report 0 kgrams and a NULL permille instead of vanishing
    from data_pipeline_who_gho_spark.plans.curation2 import ngram_novelty

    rows = [
        (0, "tiny doc", "en", "web", 8),
        (1, " ".join(f"w{i}" for i in range(40)), "en", "web", 100),
        (2, " ".join(f"w{i}" for i in range(40)), "en", "web", 100),
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in ngram_novelty(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["n_kgrams"] == 0 and out[0]["novelty_permille"] is None
    # doc 1 owns every shared fingerprint (min doc_id); doc 2 is all-dup
    assert out[1]["novelty_permille"] == 1000
    assert out[2]["novelty_permille"] == 0
