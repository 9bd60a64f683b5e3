"""Gopher quality flags + media byte features (plans/curation7.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.plans.curation7 import (
    gopher_quality_flags,
    media_byte_features,
)
from data_pipeline_who_gho_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_gopher_flags_all_live(spark):
    """Every flag must take BOTH values on the fixture corpus — a
    constant flag proves nothing about the rule."""
    rows = gopher_quality_flags(spark, SF).collect()
    assert len(rows) > 0
    for flag in ("wc_ok", "mwl_ok", "stop_ok", "kept"):
        vals = {r[flag] for r in rows}
        assert vals == {True, False}, f"{flag} is constant: {vals}"
    for r in rows:
        assert r["kept"] == (r["wc_ok"] and r["mwl_ok"] and r["stop_ok"])


def test_gopher_mean_word_len_consistent(spark):
    """mean_word_len · n_words ≈ character mass of the tokens (round-6
    tolerance) and n_stop_distinct counts DISTINCT stopwords."""
    rows = gopher_quality_flags(spark, SF).collect()
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, SF, "documents").collect()}
    for r in rows[:50]:
        toks = docs[r["doc_id"]].strip().lower().split()
        assert r["n_words"] == len(toks)
        mass = sum(len(t) for t in toks)
        assert abs(r["mean_word_len"] - mass / len(toks)) < 1e-6


def test_media_byte_features_match_python(spark):
    """The Arrow-histogram path reproduces a direct python computation,
    and the fixture payload is pure ASCII (the oracle depends on it)."""
    rows = {r["doc_id"]: r for r in media_byte_features(spark, SF).collect()}
    docs = load_table(spark, SF, "documents").collect()
    assert len(rows) == len(docs)
    for d in docs:
        payload = d["text"].encode("utf-8")
        assert all(b < 128 for b in payload), "fixture corpus must be ASCII"
        r = rows[d["doc_id"]]
        assert r["n_bytes"] == len(payload)
        from collections import Counter

        c = Counter(payload)
        assert r["n_distinct_bytes"] == len(c)
        top_count = max(c.values())
        top_byte = min(b for b, n in c.items() if n == top_count)
        assert (r["top_byte"], r["top_count"]) == (top_byte, top_count)


def test_media_byte_features_empty_doc_parity(spark, tmp_path):
    """An empty-text doc must produce an all-zeros row in BOTH engines
    (the Spark histogram emits zeros; the oracle's documents anchor +
    COALESCE reinstates the row the unnest path drops)."""
    import duckdb
    import pandas as pd

    from data_pipeline_who_gho_spark.plans.curation7 import (
        MEDIA_BYTE_FEATURES_SQL,
    )

    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["abca", ""], "lang": ["en", "en"],
         "source": ["s", "s"], "n_chars": [4, 0]}
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_distinct_bytes"], r["top_byte"], r["top_count"])
        for r in media_byte_features(spark, str(tmp_path)).collect()
    }
    assert got[2] == (0, 0, 0, 0)
    assert got[1] == (4, 3, ord("a"), 2)
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = {
        r[0]: tuple(r[1:])
        for r in con.execute(MEDIA_BYTE_FEATURES_SQL).fetchall()
    }
    assert oracle == got


def test_quantile_normalize_is_monotone_and_bounded(spark):
    from data_pipeline_who_gho_spark.plans.curation7 import (
        quantile_normalize_scores,
    )

    rows = quantile_normalize_scores(spark, SF).collect()
    assert all(0 <= r["pct_micro"] <= 1_000_000 for r in rows)
    # a strictly lower (floored-micro) score can never carry a higher
    # pct; micro-equal scores are ordered by the raw score + doc_id
    # inside the query, so only strict inequalities are comparable here
    by_pct = sorted(rows, key=lambda r: r["pct_micro"])
    scores = [r["score_micro"] for r in by_pct]
    assert all(a <= b for a, b in zip(scores, scores[1:]))
    assert by_pct[0]["pct_micro"] == 0 and by_pct[-1]["pct_micro"] == 1_000_000
    assert len({r["pct_micro"] for r in rows}) == len(rows)  # all distinct


def test_embed_standardize_unit_stats(spark):
    """Per-dimension standardized components have mean ≈ 0 and
    population sd ≈ 1 (exact up to the fixed-point floor)."""
    import math
    from collections import defaultdict

    from data_pipeline_who_gho_spark.plans.curation7 import embed_standardize

    dims = defaultdict(list)
    for r in embed_standardize(spark, SF).collect():
        assert r["z"] is not None
        dims[r["pos"]].append(r["z"])
    for pos, zs in dims.items():
        n = len(zs)
        mean = sum(zs) / n
        sd = math.sqrt(sum((z - mean) ** 2 for z in zs) / n)
        assert abs(mean) < 1e-4, (pos, mean)
        assert abs(sd - 1.0) < 1e-4, (pos, sd)
