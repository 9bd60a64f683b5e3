"""Round-11 curation addition: STATISTICAL LANGUAGE-ID over the
documents table (``functions/langid.py`` — char-trigram affinity
scoring; the credible upgrade over the stopword-argmax
``text_lang_summary``, which stays registered as the cheap tier).

``lang_id_ngram_stats`` — per doc, the classifier runs on a MIXED
short document: the doc's held-out UDHR Article 2 sentence (per its
``lang`` label — text the trigram tables never saw) prepended to the
first 48 chars of the doc's synthetic English-ish body.  The
prediction must recover ``lang`` through that noise; the output
carries prediction, score, margin, and the hit flag, and the oracle
replays the identical integer-weight scoring end to end.

``lang_id_recall_by_lang`` — the aggregate view: per true lang, docs,
hits, and exact fixed-point recall (floor(1e6·hits/docs)) — the gate a
curation pipeline would alarm on.

Scale: trigram explode is map-side JVM ``transform``; the ~400-row
weight table broadcasts; per-(doc, lang) sums partial-aggregate before
the single shuffle; the argmax is one window over 5 rows per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.langid import HOLDOUT_SAMPLES, classify, classify_sql
from ..sources.catalog import load_table

CURATION20_QUERIES: dict = {}
CURATION20_ORACLE_SQL: dict = {}

_BODY_CHARS = 48


def _mixed_text_col() -> F.Column:
    expr = F.lit(None).cast("string")
    for lang, s in HOLDOUT_SAMPLES.items():
        expr = F.when(F.col("lang") == lang, F.lit(s)).otherwise(expr)
    return F.concat(
        expr, F.lit(" "), F.substring(F.col("text"), 1, _BODY_CHARS)
    )


def _mixed_text_sql() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN '" + s.replace("'", "''") + "'"
        for lang, s in HOLDOUT_SAMPLES.items()
    )
    return (
        f"(CASE lang {cases} END) || ' ' || substr(text, 1, {_BODY_CHARS})"
    )


def lang_id_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    mixed = docs.select(
        "doc_id", "lang", _mixed_text_col().alias("stext")
    )
    pred = classify(spark, mixed, text_col="stext")
    return pred.join(mixed.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "pred_lang",
        "score",
        "margin",
        (F.col("pred_lang") == F.col("lang")).alias("hit"),
    )


LANG_ID_NGRAM_STATS_SQL = f"""
WITH pred AS ({classify_sql(_mixed_text_sql())})
SELECT p.doc_id, p.pred_lang, p.score, p.margin,
       p.pred_lang = d.lang AS hit
FROM pred p JOIN documents d USING (doc_id)
"""


def lang_id_recall_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = lang_id_ngram_stats(spark, sf_dir)
    truth = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        per_doc.join(truth, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("hit").cast("long")).cast("long").alias("n_hits"),
            F.floor(
                F.lit(1000000)
                * F.sum(F.col("hit").cast("long"))
                / F.count(F.lit(1))
            ).cast("long").alias("recall_fp6"),
        )
    )


LANG_ID_RECALL_BY_LANG_SQL = f"""
WITH pred AS ({classify_sql(_mixed_text_sql())})
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST(floor(1000000.0
            * SUM(CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END)
            / COUNT(*)) AS BIGINT) AS recall_fp6
FROM pred p JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


CURATION20_QUERIES["lang_id_ngram_stats"] = lang_id_ngram_stats
CURATION20_ORACLE_SQL["lang_id_ngram_stats"] = LANG_ID_NGRAM_STATS_SQL
CURATION20_QUERIES["lang_id_recall_by_lang"] = lang_id_recall_by_lang
CURATION20_ORACLE_SQL["lang_id_recall_by_lang"] = LANG_ID_RECALL_BY_LANG_SQL
