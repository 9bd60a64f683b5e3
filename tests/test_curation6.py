"""Round-5 curation stages, second set (plans/curation6.py):
repetition flags, cross-source contamination, tokenizer fertility."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.plans.curation6 import (
    _DUP_FRAC_MAX,
    _TOP_FRAC_MAX,
    _ngrams,
    gopher_repetition_flags,
    source_overlap_matrix,
    tokenizer_fertility,
)
from data_pipeline_who_gho_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_ngrams_kernel_pinned(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c", "d"],), (["a"],), ([],)], "toks array<string>"
    )
    out = df.select(
        _ngrams(F.col("toks"), 2).alias("bi"), _ngrams(F.col("toks"), 3).alias("tri")
    ).collect()
    assert out[0]["bi"] == ["a b", "b c", "c d"]
    assert out[0]["tri"] == ["a b c", "b c d"]
    assert out[1]["bi"] == [] and out[1]["tri"] == []
    assert out[2]["bi"] == [] and out[2]["tri"] == []


def test_repetition_flags_pinned_on_constructed_docs(spark):
    """A maximally repetitive doc must be flagged; a distinct-word doc
    must be kept; a short doc reports zeros and keeps."""
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six"),
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    import data_pipeline_who_gho_spark.plans.curation6 as c6
    from data_pipeline_who_gho_spark.functions import text as TX

    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    bi = toks.select("doc_id", F.explode(c6._ngrams(F.col("toks"), 2)).alias("g"))
    stats = (
        bi.groupBy("doc_id", "g").count().groupBy("doc_id")
        .agg(F.max("count").alias("top"), F.sum("count").alias("n"))
        .collect()
    )
    by_id = {r["doc_id"]: (r["top"], r["n"]) for r in stats}
    assert by_id[1] == (5, 5)  # all bigrams identical
    assert by_id[2] == (1, 5)  # all distinct
    assert 3 not in by_id  # no bigrams


def test_repetition_flags_every_doc_and_bounds(spark):
    out = gopher_repetition_flags(spark, SF).cache()
    n_docs = load_table(spark, SF, "documents").count()
    assert out.count() == n_docs
    rows = out.collect()
    for r in rows:
        expect = True
        for n, thr in _TOP_FRAC_MAX.items():
            v = r[f"top{n}_frac"]
            assert 0.0 <= v <= 1.0
            expect = expect and v <= thr
        for n, thr in _DUP_FRAC_MAX.items():
            v = r[f"dup{n}_frac"]
            assert 0.0 <= v <= 1.0
            expect = expect and v <= thr
        assert r["keep"] == expect
    # the ladder is monotone: a longer n-gram repeats no more often
    # than the top shorter one in aggregate — spot-check the columns
    # exist in the declared order
    assert [c for c in out.columns if c != "doc_id" and c != "keep"] == [
        "top2_frac", "top3_frac", "top4_frac", "dup5_frac", "dup6_frac",
    ]
    out.unpersist()


def test_source_overlap_symmetric_bounded(spark):
    out = source_overlap_matrix(spark, SF).collect()
    assert len(out) > 0, "synthetic sources must share some 5-grams"
    seen = set()
    for r in out:
        assert r["source_a"] < r["source_b"]  # canonical pair order, no dupes
        assert (r["source_a"], r["source_b"]) not in seen
        seen.add((r["source_a"], r["source_b"]))
        assert r["shared"] >= 1
        assert 0.0 < r["jaccard"] <= 1.0


def test_tokenizer_fertility_rollup(spark):
    out = tokenizer_fertility(spark, SF).collect()
    srcs = {
        r["source"]
        for r in load_table(spark, SF, "documents").select("source").distinct().collect()
    }
    assert {r["source"] for r in out} == srcs
    for r in out:
        # BPE merges only ever shrink the symbol count vs chars and
        # can never go below one token per word
        assert r["fertility"] >= 1.0
        assert r["chars_per_token"] >= 1.0
        assert r["n_bpe_tokens"] >= r["n_words"]
    # corpus-wide word total matches a direct count
    from data_pipeline_who_gho_spark.functions import text as TX

    direct = (
        load_table(spark, SF, "documents")
        .select(F.explode(TX.tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") > 0)
        .count()
    )
    assert sum(r["n_words"] for r in out) == direct
