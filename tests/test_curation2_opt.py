"""r13 optimization guard: the array-domain k-gram builder emits exactly
the window form's rows (OPTIMIZATION_r13.md — the span family's k-gram
shuffle removal is only valid while this equality holds)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_kgram_rows_arr_matches_window_form(spark):
    from data_pipeline_who_gho_spark.plans.curation2 import (
        _corpus2,
        _kgram_rows,
        _kgram_rows_arr,
        _token_rows,
    )

    sf = "/root/testdata/sf0.001"
    corpus = _corpus2(spark, sf)
    want = sorted(
        tuple(r) for r in _kgram_rows(_token_rows(corpus)).collect()
    )
    got = sorted(tuple(r) for r in _kgram_rows_arr(corpus).collect())
    assert len(got) > 0
    assert got == want


def test_kgram_rows_arr_short_and_blank_docs(spark):
    from data_pipeline_who_gho_spark.plans.curation2 import (
        _SPAN_K,
        _kgram_rows_arr,
    )

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(_SPAN_K - 1))),  # too short
            (2, ""),  # blank -> single empty token
            (3, " ".join(f"t{i}" for i in range(_SPAN_K))),  # exactly one
        ],
        "doc_id long, text string",
    )
    rows = _kgram_rows_arr(df).collect()
    assert [(r.doc_id, r.pos) for r in rows] == [(3, 0)]


def test_rep_stats_matches_exploded_groupby(spark):
    """r13: gopher's array-domain sorted-run stats must equal the
    exploded groupBy(doc_id, g) counts they replaced."""
    from pyspark.sql import functions as F

    from data_pipeline_who_gho_spark.functions import text as TX
    from data_pipeline_who_gho_spark.plans.curation6 import _ngrams, _rep_stats
    from data_pipeline_who_gho_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", TX.tokens(F.col("text")).alias("toks")
    )
    for n in (2, 5):
        s = _rep_stats("toks", n)
        got = {
            r["doc_id"]: (r["mx"], r["d"], r["t"])
            for r in docs.select(
                "doc_id", s["mx"].alias("mx"), s["d"].alias("d"), s["t"].alias("t")
            ).collect()
        }
        g = docs.select("doc_id", F.explode(_ngrams(F.col("toks"), n)).alias("g"))
        want = {
            r["doc_id"]: (r["mx"], r["d"], r["t"])
            for r in g.groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("doc_id")
            .agg(
                F.max("c").alias("mx"),
                F.count(F.lit(1)).alias("d"),
                F.sum("c").alias("t"),
            )
            .collect()
        }
        for doc_id, stats in want.items():
            assert got[doc_id] == stats, (n, doc_id, got[doc_id], stats)
        # every-doc contract: docs absent from `want` (too short) read 0
        for doc_id, stats in got.items():
            if doc_id not in want:
                assert stats == (0, 0, 0)


def test_gopher_fractions_guard_short_docs(spark, tmp_path):
    """r14 (ADVICE r13 high): the array-domain fractions divide by t,
    which is 0 for docs shorter than n tokens — under the session's
    ANSI default that raised DIVIDE_BY_ZERO before the when() guard.
    A corpus containing blank / one-word docs must yield 0.0 fractions
    for them, not crash."""
    from data_pipeline_who_gho_spark.plans.curation6 import (
        gopher_repetition_flags,
    )

    src = "/root/testdata/sf0.001"
    sf = str(tmp_path / "sf")
    base = spark.read.parquet(f"{src}/documents.parquet")
    extra = spark.createDataFrame(
        [(900001, "", "en", "synth", 0), (900002, "word", "en", "synth", 4)],
        base.schema,
    )
    base.unionByName(extra).write.parquet(f"{sf}/documents.parquet")

    rows = {
        r["doc_id"]: r for r in gopher_repetition_flags(spark, sf).collect()
    }
    for doc_id in (900001, 900002):
        r = rows[doc_id]
        for c in ("top2_frac", "top3_frac", "top4_frac", "dup5_frac", "dup6_frac"):
            assert r[c] == 0.0, (doc_id, c, r[c])
        assert r["keep"] is True


def test_l2_unrolled_bit_identical_to_fold(spark):
    """r14: the unrolled squared-L2 (whole-stage-codegen-able) must
    produce BIT-IDENTICAL values to the zip_with/aggregate fold it
    replaced in the PQ assign — same left-associated IEEE addition
    order.  (The 64-dim kmeans/rerank recipes KEEP the fold: the
    unrolled form A/B'd slower in those full plans — see
    OPTIMIZATION_r14.md.)"""
    from pyspark.sql import functions as F

    from data_pipeline_who_gho_spark.functions import vectors as VEC
    from data_pipeline_who_gho_spark.plans import curation2 as c2
    from data_pipeline_who_gho_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", VEC.as_double("embedding").alias("v")
    )

    # 16-dim PQ recipe (curation2 subvectors)
    subs = c2._subvectors(emb)
    sother = subs.select(
        (F.col("vec_id") + 1).alias("vec_id"), "m", F.col("sub").alias("cv")
    )
    spairs = subs.join(sother, ["vec_id", "m"])
    assert spairs.count() > 100
    # eqNullSafe: plain == yields NULL (dropped by the filter) if one
    # side ever diverges to NULL, which would pass vacuously
    bad = spairs.select(
        c2._l2(F.col("sub"), F.col("cv")).eqNullSafe(c2._l2u("sub", "cv")).alias("e")
    ).filter(~F.col("e")).count()
    assert bad == 0

    # NULL-on-short-array semantics preserved (ANSI-safe)
    short = spark.createDataFrame(
        [([1.0, 2.0], [1.0, 2.0, 3.0])], "a array<double>, b array<double>"
    )
    r = short.select(
        c2._l2u("a", "b", n=3).alias("u"),
        c2._l2(F.col("a"), F.col("b")).alias("f"),
    ).collect()[0]
    assert r["u"] is None and r["f"] is None
