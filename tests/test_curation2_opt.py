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
