"""Round-11 statistical language-ID (functions/langid.py,
plans/curation20.py)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-curation20")


def _oracle(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def _py_score(text):
    """Plain-python replay of the scoring model (the third opinion
    besides Spark and DuckDB)."""
    from data_pipeline_who_gho_spark.functions.langid import WEIGHTS

    w: dict = {}
    for tri, lang, wt in WEIGHTS:
        w.setdefault(lang, {})[tri] = wt
    s = text.lower()
    grams = [
        s[i:i + n] for n in (1, 2, 3) for i in range(len(s) - n + 1)
    ]
    return {L: sum(w[L].get(g, 0) for g in grams) for L in w}


def test_classifier_holdout_generalization():
    """Every language's HELD-OUT UDHR Article 2 sentence — text the
    n-gram tables never saw — must classify correctly even with 48
    chars of English noise appended (the query's exact fixture shape)."""
    from data_pipeline_who_gho_spark.functions.langid import (
        HOLDOUT_SAMPLES,
        TRAIN_SAMPLES,
    )

    noise = "the fast key order sort table scan merge part window sma"[:48]
    for lang, sent in HOLDOUT_SAMPLES.items():
        assert sent not in TRAIN_SAMPLES[lang]  # genuinely held out
        scores = _py_score(sent + " " + noise)
        best = max(sorted(scores), key=lambda x: scores[x])
        assert best == lang, (lang, scores)


def test_classify_spark_semantics(spark):
    """Constructed-DF pins: deterministic tie-break by language code,
    'und' on zero table hits, short strings (< 3 chars) still scored
    via unigrams/bigrams, and Spark == plain-python scores."""
    from data_pipeline_who_gho_spark.functions.langid import classify

    rows = [
        (1, "All human beings are born free"),
        (2, "的"),                      # zh unigram only
        (3, "qqq xxx 000"),             # nothing in any table
        (4, ""),                        # empty
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r["doc_id"]: r for r in classify(spark, df).collect()}
    py1 = _py_score(rows[0][1])
    assert got[1]["pred_lang"] == "en"
    assert got[1]["score"] == py1["en"]
    assert got[1]["margin"] == py1["en"] - sorted(py1.values())[-2]
    assert got[2]["pred_lang"] == "zh" and got[2]["score"] > 0
    assert got[3]["pred_lang"] == "und" and got[3]["score"] == 0
    assert got[4]["pred_lang"] == "und" and got[4]["margin"] == 0


def test_classify_plan_shape(spark):
    """The weights join must BROADCAST (no shuffle of the exploded
    n-gram stream against a 900-row table)."""
    from data_pipeline_who_gho_spark.functions.langid import classify

    df = spark.createDataFrame(
        [(1, "hello world")], "doc_id BIGINT, text STRING"
    )
    plan = classify(spark, df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_lang_id_ngram_stats_matches_oracle(spark):
    from data_pipeline_who_gho_spark.plans.curation20 import (
        LANG_ID_NGRAM_STATS_SQL,
        lang_id_ngram_stats,
    )

    got = sorted(
        tuple(r) for r in lang_id_ngram_stats(spark, SF).collect()
    )
    assert got == _oracle(LANG_ID_NGRAM_STATS_SQL)
    assert all(r[2] > 0 for r in got)  # every doc scored something


def test_lang_id_recall_by_lang_matches_oracle_and_is_perfect(spark):
    """Recall vs the lang label: with the held-out sentence dominating
    48 chars of noise, the trigram tables must recover every language
    — including zh, whose unigram path is the designed fix (trigram-
    only scored it 25 vs a ~100 noise floor)."""
    from data_pipeline_who_gho_spark.plans.curation20 import (
        LANG_ID_RECALL_BY_LANG_SQL,
        lang_id_recall_by_lang,
    )

    got = sorted(
        tuple(r) for r in lang_id_recall_by_lang(spark, SF).collect()
    )
    assert got == _oracle(LANG_ID_RECALL_BY_LANG_SQL)
    assert {r[0] for r in got} == {"de", "en", "es", "fr", "zh"}
    assert all(r[3] == 1000000 for r in got), got  # recall 1.0 per lang


def test_classify_spreads_past_scan_splits(spark):
    """The gram stage must not inherit an under-partitioned scan: on a
    1-partition input, classify's scoring stage runs on
    defaultParallelism partitions (the sf1 flat-scaling regression)."""
    from pyspark.sql import functions as F

    from data_pipeline_who_gho_spark.functions.langid import classify

    df = spark.createDataFrame(
        [(i, "All human beings are born free") for i in range(100)],
        "doc_id BIGINT, text STRING",
    ).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    plan = classify(spark, df)._jdf.queryExecution().executedPlan().toString()
    # the round-robin spread shows up as a repartition exchange
    assert "RoundRobinPartitioning" in plan
