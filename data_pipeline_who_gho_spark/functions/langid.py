"""Statistical character-n-gram language identification.

The r10 VERDICT named the stopword-argmax ``functions/text.py:lang_id``
as too coarse for a load-bearing LLM-curation gate; this module is the
credible tier: per-language character-TRIGRAM affinity weights derived
at import time from embedded public-domain training text (UDHR
Article 1 — the standard tiny-LID corpus), shipped as a closure table
exactly like the BPE vocab, with a held-out sentence set (Article 2)
for generalization testing.

Scoring model: ``score(text, lang) = Σ_positions wt[lang][tri]`` over
every (overlapping) trigram of the lowercased text that appears in the
language's top-K table; prediction is the argmax with deterministic
tie-break by language code, no hit at all → ``'und'``.  Integer
weights only — both engines (Spark and the DuckDB oracle) consume the
SAME precomputed table, so parity is structural, not numeric luck.

Execution shape (100 TB posture): trigram explode is a map-side
``transform``+``explode`` (JVM, no Python), the weights table is a
~400-row BROADCAST join, and the per-(doc, lang) sum partial-aggregates
map-side before the single (doc_id, lang) shuffle — the same shape as
any tokenize-and-score pass.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# UDHR Article 1 (public domain) — training text per language.
TRAIN_SAMPLES: dict[str, str] = {
    "en": (
        "All human beings are born free and equal in dignity and "
        "rights. They are endowed with reason and conscience and "
        "should act towards one another in a spirit of brotherhood."
    ),
    "fr": (
        "Tous les êtres humains naissent libres et égaux en dignité "
        "et en droits. Ils sont doués de raison et de conscience et "
        "doivent agir les uns envers les autres dans un esprit de "
        "fraternité."
    ),
    "es": (
        "Todos los seres humanos nacen libres e iguales en dignidad y "
        "derechos y, dotados como están de razón y conciencia, deben "
        "comportarse fraternalmente los unos con los otros."
    ),
    "de": (
        "Alle Menschen sind frei und gleich an Würde und Rechten "
        "geboren. Sie sind mit Vernunft und Gewissen begabt und "
        "sollen einander im Geist der Brüderlichkeit begegnen."
    ),
    # zh needs more articles than the alphabetic languages: CJK has no
    # word-boundary trigrams shared across sentences, so single-article
    # coverage generalizes far worse (measured: one article scored the
    # held-out sentence 11 vs the ~70 ambient noise floor)
    "zh": (
        "人人生而自由，在尊严和权利上一律平等。他们赋有理性和良心，并应以兄弟关系的精神相对待。"
        "人人有权享有生命、自由和人身安全。"
        "人人在任何地方有权被承认在法律前的人格。"
        "人人有权享受主张和发表意见的自由；此项权利包括持有主张而不受干涉的自由，"
        "和通过任何媒介和不论国界寻求、接受和传递消息和思想的自由。"
        "人人都有受教育的权利，教育应当免费。"
        "人人有权享受为维持他本人和家属的健康和福利所需的生活水准。"
    ),
}

# UDHR Article 2 (public domain) — HELD OUT of training; used by the
# query fixtures so prediction is a generalization test, not a replay.
HOLDOUT_SAMPLES: dict[str, str] = {
    "en": (
        "Everyone is entitled to all the rights and freedoms set "
        "forth in this declaration without distinction of any kind."
    ),
    "fr": (
        "Chacun peut se prévaloir de tous les droits et de toutes les "
        "libertés proclamés dans la présente déclaration sans "
        "distinction aucune."
    ),
    "es": (
        "Toda persona tiene todos los derechos y libertades "
        "proclamados en esta declaración sin distinción alguna."
    ),
    "de": (
        "Jeder hat Anspruch auf alle in dieser Erklärung verkündeten "
        "Rechte und Freiheiten ohne irgendeinen Unterschied."
    ),
    "zh": "人人有资格享有本宣言所载的一切权利和自由，不分种族、肤色、性别、语言、宗教。",
}

LANGS = sorted(TRAIN_SAMPLES)  # deterministic tie-break order
# mixed n-gram orders (the standard LID design: langid.py / CLD use
# 1-4-grams): trigrams carry the load for alphabetic scripts, but an
# UNSEEN CJK sentence shares almost no trigram with a small training
# corpus (measured: 25 vs a ~100 ambient noise floor) while its single
# characters generalize perfectly — so unigrams and bigrams join the
# table, restricted to n-grams containing a non-ASCII char (的, ü, é —
# high-information, script-indicative; ASCII uni/bigrams would only
# add symmetric inter-European noise)
_ORDERS = (1, 2, 3)
_TOP_K = {1: 48, 2: 96, 3: 256}


def _ngram_weights() -> list[tuple[str, str, int]]:
    """(gram, lang, wt) rows: per order, the top-K n-grams of each
    language's lowercased training sample (orders 1-2 only where a
    non-ASCII char is present), weighted 10 + count.  Pure integer
    construction — re-derivable bit-for-bit anywhere."""
    rows: list[tuple[str, str, int]] = []
    for lang in LANGS:
        s = TRAIN_SAMPLES[lang].lower()
        for n in _ORDERS:
            counts = Counter(
                g
                for i in range(len(s) - n + 1)
                if (g := s[i:i + n])
                and (n == 3 or any(ord(c) >= 128 for c in g))
            )
            top = sorted(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )[:_TOP_K[n]]
            rows.extend((g, lang, 10 + c) for g, c in top)
    return rows


WEIGHTS: list[tuple[str, str, int]] = _ngram_weights()


def weights_values_sql() -> str:
    """The weight table as a SQL VALUES list (tri, lang, wt) — the
    oracle consumes the identical integers the engine broadcasts."""
    return ", ".join(
        "('" + tri.replace("'", "''") + f"', '{lang}', {wt})"
        for tri, lang, wt in WEIGHTS
    )


def _gram_arr(low: Column, n: int) -> Column:
    """Overlapping n-grams of ``low`` as an array column.  NOTE the
    closure shape: ``n`` must be captured by this enclosing function,
    NOT a lambda default arg — ``F.transform`` inspects the lambda's
    arity, and ``lambda i, n=n`` reads as the two-parameter
    (element, index) form, silently rebinding ``n`` to the array
    index (observed live: every gram came back as substring(i+1, i))."""
    seq = F.sequence(F.lit(0), F.length(low) - F.lit(n))
    return F.when(
        F.length(low) >= n,
        F.transform(seq, lambda i: F.substring(low, i + F.lit(1), F.lit(n))),
    ).otherwise(F.array().cast("array<string>"))


def _ngrams(col: Column) -> Column:
    """All overlapping 1-, 2-, and 3-grams of an ALREADY-LOWERCASED
    string column (JVM transform — no Python).  The caller must
    materialize ``lower(...)`` in its own projection first: an inline
    ``F.lower(expr)`` here would be re-evaluated for every array
    element inside the transform lambdas (no common-subexpression
    elimination across lambda bodies — measured 3x the whole
    extraction cost at sf1, 21 s -> 7 s).  Extraction is unfiltered;
    the non-ASCII restriction on orders 1-2 lives in the WEIGHTS table
    build, so n-grams outside the table simply drop in the join."""
    return F.concat(*[_gram_arr(col, n) for n in _ORDERS])


def classify(spark, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + ``text_col`` → (doc_id, pred_lang, score, margin):
    argmax language with deterministic tie-break, ``'und'`` when no
    table trigram occurs; margin = best minus runner-up score."""
    weights = spark.createDataFrame(
        WEIGHTS, "tri STRING, lang STRING, wt INT"
    )
    from ..sources.catalog import spread_for_python

    # the lowered text gets its own projection: it is referenced by
    # every transform lambda element, and Catalyst will not collapse a
    # multiply-referenced non-trivial alias into them (keeping lower()
    # evaluated once per row, not once per n-gram).  spread: the gram
    # explode is ~450 rows per input row of JVM work, but it inherits
    # the SCAN's partitioning — a small documents file scans as 1-2
    # splits and caps the whole stage at 1-2 cores (measured: sf1 flat
    # 11.5 s from local[4] to local[32] before the spread)
    low = spread_for_python(
        docs.select("doc_id", F.lower(F.col(text_col)).alias("__low"))
    )
    tris = low.select(
        "doc_id", F.explode(_ngrams(F.col("__low"))).alias("tri")
    )
    scores = (
        tris.join(F.broadcast(weights), "tri")
        .groupBy("doc_id", "lang")
        .agg(F.sum("wt").cast("long").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("lang")
    )
    ranked = scores.select(
        "doc_id", "lang", "score",
        F.row_number().over(w).alias("rn"),
        F.lead("score").over(w).alias("second"),
    ).filter(F.col("rn") == 1)
    return (
        docs.select("doc_id")
        .join(ranked, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("lang"), F.lit("und")).alias("pred_lang"),
            F.coalesce(F.col("score"), F.lit(0)).cast("long")
            .alias("score"),
            F.coalesce(
                F.col("score") - F.coalesce(F.col("second"), F.lit(0)),
                F.lit(0),
            ).cast("long").alias("margin"),
        )
    )


def classify_sql(scored_text_sql: str) -> str:
    """DuckDB twin of :func:`classify` over ``documents`` with the
    scored text given as a SQL expression."""
    return f"""
WITH w(tri, lang, wt) AS (VALUES {weights_values_sql()}),
scored AS (
  SELECT doc_id, lower({scored_text_sql}) AS stext FROM documents
),
tris AS (
  SELECT doc_id, substr(stext, u.i + 1, n.n) AS tri
  FROM scored,
       (VALUES (1), (2), (3)) n(n),
       unnest(generate_series(0, length(stext) - n.n)) u(i)
  WHERE length(stext) >= n.n
),
scores AS (
  SELECT t.doc_id, w.lang, CAST(SUM(w.wt) AS BIGINT) AS score
  FROM tris t JOIN w USING (tri)
  GROUP BY t.doc_id, w.lang
),
ranked AS (
  SELECT doc_id, lang, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn,
         LEAD(score) OVER (PARTITION BY doc_id
                           ORDER BY score DESC, lang) AS second
  FROM scores
)
SELECT d.doc_id,
       COALESCE(r.lang, 'und') AS pred_lang,
       CAST(COALESCE(r.score, 0) AS BIGINT) AS score,
       CAST(COALESCE(r.score - COALESCE(r.second, 0), 0) AS BIGINT)
           AS margin
FROM documents d
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (doc_id)
"""
