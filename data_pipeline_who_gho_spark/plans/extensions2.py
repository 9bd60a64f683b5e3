"""Extension batch 3: the second dedup/retrieval/lexical-statistics wave.

These extend the dedup/search families of ``plans/extensions.py`` (the
reference — a pandas ETL, ``/root/reference/etl/transform.py:60-80`` — has
only keyed dedup; these are the LLM-corpus generalizations):

- ``simhash_neardup_pairs``: banded self-join over the shared md5-seeded
  fingerprint table (``extensions.simhash_fingerprints``) — DuckDB rebuilds
  the exact bits, so the full pair set is hash-checked end-to-end.
- ``dedup_containment``: scores |A∩B| / min(|A|,|B|) instead of Jaccard —
  the asymmetric measure that catches a small document embedded inside a
  large one (the case Jaccard misses by construction; this is the standard
  train/test decontamination check).
- ``dedup_sorted_neighborhood``: merge/purge blocking — the third
  candidate-generation family alongside LSH and the inverted index.
- ``bm25_search``: Okapi BM25 top-k over an inverted index — the retrieval
  primitive on top of the tf/df machinery of ``plans/training.py``.
- ``bigram_lm_score`` / ``pmi_collocations`` / ``byte_entropy_stats``:
  LM-based quality filtering, collocation mining, and byte-entropy junk
  detection — all float-disciplined via integer fixed point rounded once
  per TYPE (bigram / age bucket / byte), so aggregates are exact integer
  sums in any execution order.

Scale design
------------
- SimHash fingerprints are one narrow aggregation (64 partial-agg'd int
  sums per doc — the shuffle carries 64 ints/doc regardless of doc length),
  then a payload-free 4×16-bit band self-join: pairs within Hamming
  distance ≤ 3 of a 64-bit fingerprint MUST agree on one of the 4 chunks
  (pigeonhole), so banding is a complete candidate generator and the
  Hamming filter makes the result exact, never probabilistic.
- Containment reuses the shared shingle ROW table but runs EXACT by
  default (the ngram hot-shingle guard is opt-in only): hot-only pairs
  are containment's target case, and the registered query must equal its
  unguarded oracle. It also drops the size-compatibility prune, which is
  exactly what containment must not have (a 100-shingle doc inside a
  10 000-shingle doc is the target, not noise).
- BM25 keeps the posting lists pruned to the query terms *before* any
  shuffle (predicate on the exploded token stream — pushed inside the
  scan-side stage), broadcasts the df/idf side, and resolves the top-k
  with a global sort bounded by LIMIT (TakeOrderedAndProject, no full
  sort at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources.catalog import load_table
from .extensions import (
    _CORPUS_SQL,
    _SHINGLES_SQL,
    _corpus,
    _shingle_table,
    _simhash_fp_sql,
    _sql_tokens,
    simhash_fingerprints,
)

# ---------------------------------------------------------------------------
# SimHash near-dup pairs (md5-seeded → oracle-checkable)
# ---------------------------------------------------------------------------

HAMMING_T = 3  # pairs within 3 differing fingerprint bits
_N_CHUNKS = 4  # 4 × 16-bit bands over the 64-bit fingerprint


def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs within Hamming distance ≤ 3 of their 64-bit tf-weighted
    SimHash fingerprints (exact: banding is complete at this radius).

    bit j of fp = sign of Σ_token-occurrences (±1 per bit j of md5(token));
    occurrence (not distinct-set) weighting is the classic tf-weighted
    SimHash and keeps fingerprints informative even on small vocabularies.
    The two 32-bit fingerprint halves are built from the two md5 hex
    halves, which both engines can extract bit-for-bit. The fingerprint
    table is shared with ``dedup_simhash`` (extensions.py).
    """
    fp = simhash_fingerprints(spark, sf_dir)

    # 16-bit band chunks: the self-join key is (chunk index, chunk value)
    # only — plus the fingerprint halves needed for the exact verify, so
    # no second join back to the fingerprint table.
    chunk_srcs = [("fp1", 0), ("fp1", 16), ("fp2", 0), ("fp2", 16)]
    chunks = fp.select(
        "doc_id",
        "fp1",
        "fp2",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright(F.col(c), s).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                    )
                    for i, (c, s) in enumerate(chunk_srcs)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "fp1", "fp2", F.col("ch.ci").alias("ci"), F.col("ch.cv").alias("cv"))

    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.bit_count(
        F.col("a.fp1").bitwiseXOR(F.col("b.fp1"))
    ) + F.bit_count(F.col("a.fp2").bitwiseXOR(F.col("b.fp2")))
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_T)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def _simhash_oracle_sql() -> str:
    ham = "bit_count(xor(a.fp1, b.fp1)) + bit_count(xor(a.fp2, b.fp2))"
    return f"""{_simhash_fp_sql()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST({ham} AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE {ham} <= {HAMMING_T}
"""


SIMHASH_PAIRS_SQL = _simhash_oracle_sql()


# ---------------------------------------------------------------------------
# Containment near-dup (decontamination semantics)
# ---------------------------------------------------------------------------

CONTAINMENT_T = 0.5


def dedup_containment(
    spark: SparkSession, sf_dir: str, df_cutoff: int | None = None
) -> DataFrame:
    """Pairs with shingle containment |A∩B| / min(|A|,|B|) ≥ 0.5.

    Same inverted-index candidate plan as ``dedup_ngram_jaccard``, minus
    the size-compatibility prune — containment's whole point is
    size-asymmetric pairs. Integer counts, one double division at the end
    → bit-identical across engines.

    ``df_cutoff`` (opt-in) applies the hot-shingle skew guard to
    candidate generation. Unlike Jaccard, the default here is EXACT (no
    cutoff): a pair whose every shared shingle is boilerplate is
    precisely containment's target case (a small template-heavy doc
    embedded in a big one), so the ngram recall argument does not
    transfer — a user who needs the guard at extreme scale accepts that
    documented recall trade or routes through a prefix-filter variant.
    The registered query runs exact, keeping Spark output identical to
    the unguarded oracle by construction.
    """
    sh = _shingle_table(spark, sf_dir)
    if df_cutoff is None:
        df_cutoff = 1 << 62  # exact: no posting is "hot"
    cold = sh.filter(F.col("df_sh") <= F.lit(df_cutoff)).select(
        "doc_id", "shingle", "n_sh"
    )
    a, b = cold.alias("a"), cold.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("n_cold"),
            F.max("a.n_sh").alias("n_a"),  # constant per doc: max = the value
            F.max("b.n_sh").alias("n_b"),
        )
    )
    hot_by_doc = (
        sh.filter(F.col("df_sh") > F.lit(df_cutoff))
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("hot_sh"))
    )
    empty = F.array().cast("array<string>")
    pairs = (
        cand.join(
            hot_by_doc.select(F.col("doc_id").alias("doc_a"), F.col("hot_sh").alias("hot_a")),
            "doc_a",
            "left",
        )
        .join(
            hot_by_doc.select(F.col("doc_id").alias("doc_b"), F.col("hot_sh").alias("hot_b")),
            "doc_b",
            "left",
        )
        .withColumn(
            "n_inter",
            F.col("n_cold")
            + F.size(
                F.array_intersect(
                    F.coalesce(F.col("hot_a"), empty), F.coalesce(F.col("hot_b"), empty)
                )
            ),
        )
    )
    containment = F.col("n_inter").cast("double") / F.least("n_a", "n_b").cast("double")
    return (
        pairs.withColumn("containment", containment)
        .filter(F.col("containment") >= CONTAINMENT_T)
        .select("doc_a", "doc_b", "containment")
    )


CONTAINMENT_SQL = f"""
WITH corpus AS ({_CORPUS_SQL}),
sh AS ({_SHINGLES_SQL}),
inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) >= {CONTAINMENT_T}
"""


# ---------------------------------------------------------------------------
# BM25 top-k retrieval
# ---------------------------------------------------------------------------

BM25_TERMS = ["vector", "merge", "window"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 documents for a fixed query-term set.

    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1); score(d) = Σ_t idf ·
    tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)). Per-term partial scores
    are summed in FIXED expression order (one conditional aggregate per
    query term, then s_t0 + s_t1 + …) so the float result is bit-identical
    across engines — a SUM over rows would add in engine-dependent order.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(TX.tokens("text")).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        tok.filter(F.col("token").isin(BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("token").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    stats = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs")).crossJoin(
        dl.agg(F.avg(F.col("dl").cast("double")).alias("avgdl"))
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tnorm = F.col("tf").cast("double") + F.lit(BM25_K1) * (
        1.0 - BM25_B + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
    )
    part = idf * (F.col("tf").cast("double") * (BM25_K1 + 1.0)) / tnorm
    per_term = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("token") == t, part)).alias(f"s{i}")
                for i, t in enumerate(BM25_TERMS)
            ]
        )
    )
    score = F.lit(0.0)
    for i in range(len(BM25_TERMS)):
        score = score + F.coalesce(F.col(f"s{i}"), F.lit(0.0))
    return (
        per_term.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(BM25_TOPK)
    )


def _bm25_oracle_sql() -> str:
    terms = ",".join(f"'{t}'" for t in BM25_TERMS)
    part = (
        f"ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)"
        f" * (CAST(t.tf AS DOUBLE) * ({BM25_K1} + 1.0))"
        f" / (CAST(t.tf AS DOUBLE) + {BM25_K1} *"
        f" (1.0 - {BM25_B} + {BM25_B} * CAST(l.dl AS DOUBLE) / s.avgdl))"
    )
    per_term = ",".join(
        f"SUM(CASE WHEN t.token = '{t}' THEN {part} END) AS s{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    total = " + ".join(f"COALESCE(s{i}, 0.0)" for i in range(len(BM25_TERMS)))
    return f"""
WITH tok AS (SELECT doc_id, unnest({_sql_tokens()}) AS token FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
       WHERE token IN ({terms}) GROUP BY doc_id, token),
df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY token),
stats AS (SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n_docs,
                 (SELECT AVG(CAST(dl AS DOUBLE)) FROM dl) AS avgdl),
per_term AS (
  SELECT t.doc_id, {per_term}
  FROM tf t JOIN df d USING (token) JOIN dl l ON l.doc_id = t.doc_id, stats s
  GROUP BY t.doc_id)
SELECT doc_id, 0.0 + {total} AS score
FROM per_term
ORDER BY score DESC, doc_id
LIMIT {BM25_TOPK}
"""


BM25_SQL = _bm25_oracle_sql()


# ---------------------------------------------------------------------------
# Bigram language-model quality scoring (CCNet/KenLM-style LM filtering)
# ---------------------------------------------------------------------------

_LM_SCALE = 1_000_000.0  # micro-nats: fixed-point so per-doc sums are integer


def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fluency score under a corpus-trained bigram LM with
    add-one smoothing — the LM-perplexity quality filter of a training
    pipeline, exact across engines.

    Float discipline: ln() is rounded to integer micro-nats ONCE PER
    BIGRAM TYPE (the LM table, vocab²-bounded), so per-document scores
    are INTEGER sums — immune to the engine-dependent addition order
    that makes naive Σ log p irreproducible. The final avg is a single
    integer/integer division. A boundary-sensitive rounding would need
    the true value within ~1 ulp of a half-micro-nat, across only |V|²
    table entries — not the corpus's billions of token instances.

    Scale: bigram extraction is map-only (array slice + zip, no window
    shuffle); the LM table is vocab²-bounded and broadcast; the one data
    shuffle is the per-doc score aggregate.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = TX.tokens(F.col("text"))
    n = F.size(ws)
    big = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(ws, 1, n - 1).alias("w1"), F.slice(ws, 2, n - 1).alias("w2")
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    v = big.agg(F.countDistinct("w1").alias("v"))
    lp = F.round(
        F.log(
            (F.col("c12").cast("double") + 1.0)
            / (F.col("c1").cast("double") + F.col("v").cast("double"))
        )
        * F.lit(_LM_SCALE)
    ).cast("long")
    lm = (
        c12.join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
        .select("w1", "w2", lp.alias("lp"))
    )
    scored = (
        big.join(F.broadcast(lm), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.sum("lp").alias("sum_lp_micronats"), F.count(F.lit(1)).alias("n_bigrams"))
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "sum_lp_micronats",
        (
            F.col("sum_lp_micronats").cast("double") / F.col("n_bigrams").cast("double")
        ).alias("avg_lp_micronats"),
    )


BIGRAM_LM_SQL = f"""
WITH ws AS (
  SELECT doc_id, {_sql_tokens()} AS w FROM documents
),
big AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM ws, UNNEST(range(1, len(w))) AS t(i)
),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
v AS (SELECT COUNT(DISTINCT w1) AS v FROM big),
lm AS (
  SELECT w1, w2,
         CAST(ROUND(ln((CAST(c12 AS DOUBLE) + 1.0)
                       / (CAST(c1 AS DOUBLE) + CAST(v.v AS DOUBLE)))
                    * {_LM_SCALE}) AS BIGINT) AS lp
  FROM c12 JOIN c1 USING (w1), v
)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(lm.lp) AS BIGINT) AS sum_lp_micronats,
       CAST(SUM(lm.lp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_lp_micronats
FROM big b JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
GROUP BY b.doc_id
"""


# ---------------------------------------------------------------------------
# Byte-entropy stats (compression-proxy quality signal; multimodal-adjacent:
# the same statistic applies to any binary payload column)
# ---------------------------------------------------------------------------

_ENT_SCALE = 1_000_000.0


def byte_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the byte distribution — the
    classic compression-ratio proxy used to flag machine-generated /
    binary-junk text, and the oracle-checkable twin of the byte-histogram
    feature extractor (``operators/multimodal.extract_byte_features``,
    which serves arbitrary binary payloads via mapInPandas/mapInArrow).

    Entropy terms are fixed-pointed to integer micro-nats PER BYTE TYPE
    (≤ 256 per doc) so the per-doc sum is an exact integer — the same
    float discipline as ``bigram_lm_score``. Fixture payloads are ASCII,
    so the char stream equals the byte stream; both engines tokenize the
    same way.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ch = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("c")
    ).filter(F.col("c") != "")
    cnt = ch.groupBy("doc_id", F.ascii("c").alias("byte")).agg(
        F.count(F.lit(1)).alias("c")
    )
    n = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    term = F.round(
        (F.col("c").cast("double") / F.col("n").cast("double"))
        * F.log(F.col("n").cast("double") / F.col("c").cast("double"))
        * F.lit(_ENT_SCALE)
    ).cast("long")
    return (
        cnt.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("long").alias("n_bytes"),  # constant per doc
            F.count(F.lit(1)).alias("n_distinct_bytes"),
            F.sum(term).alias("entropy_micronats"),
        )
    )


BYTE_ENTROPY_SQL = f"""
WITH ch AS (
  SELECT doc_id, substr(text, i, 1) AS c
  FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i)
),
cnt AS (SELECT doc_id, ord(c) AS byte, COUNT(*) AS c FROM ch GROUP BY doc_id, ord(c)),
n AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY doc_id)
SELECT cnt.doc_id,
       CAST(MAX(n.n) AS BIGINT) AS n_bytes,
       COUNT(*) AS n_distinct_bytes,
       CAST(SUM(CAST(ROUND((CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE))
           * ln(CAST(n.n AS DOUBLE) / CAST(c AS DOUBLE)) * {_ENT_SCALE}) AS BIGINT))
         AS BIGINT) AS entropy_micronats
FROM cnt JOIN n ON cnt.doc_id = n.doc_id
GROUP BY cnt.doc_id
"""


# ---------------------------------------------------------------------------
# PMI collocations (lexical statistics: which word pairs co-occur more
# than chance — phrase mining for tokenizer/vocab construction)
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOPK = 20


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-word collocations by pointwise mutual information:
    pmi(w1,w2) = ln(N·c12 / (c1·c2)) over bigram-position counts, with a
    min-count support filter. PMI is fixed-pointed to integer micro-nats
    per bigram TYPE (the only float op is one ln on a rational of
    corpus-level integers), so ranking and values are engine-exact;
    deterministic (pmi desc, w1, w2) tie-break bounds the top-k as
    TakeOrderedAndProject.

    Scale: bigram extraction is map-only (array slice + zip) and the
    corpus is scanned ONCE — the single heavy aggregate is the
    bigram-TYPE count (vocab²-bounded), from which both position
    marginals and the grand total re-aggregate (c1 = Σ c12 by w1, etc.);
    the tiny marginal tables broadcast back.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = TX.tokens(F.col("text"))
    n = F.size(ws)
    big = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(ws, 1, n - 1).alias("w1"), F.slice(ws, 2, n - 1).alias("w2")
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).localCheckpoint(
        eager=False
    )  # four consumers; the type table is tiny and must not re-scan the corpus
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n_big = c12.agg(F.sum("c12").alias("n_bigrams"))
    pmi = F.round(
        F.log(
            (F.col("n_bigrams").cast("double") * F.col("c12").cast("double"))
            / (F.col("c1").cast("double") * F.col("c2").cast("double"))
        )
        * F.lit(_LM_SCALE)
    ).cast("long")
    return (
        c12.filter(F.col("c12") >= PMI_MIN_COUNT)
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(n_big))
        .select("w1", "w2", "c12", pmi.alias("pmi_micronats"))
        .orderBy(F.desc("pmi_micronats"), "w1", "w2")
        .limit(PMI_TOPK)
    )


PMI_SQL = f"""
WITH ws AS (SELECT doc_id, {_sql_tokens()} AS w FROM documents),
big AS (
  SELECT w[i] AS w1, w[i+1] AS w2
  FROM ws, UNNEST(range(1, len(w))) AS t(i)
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
c2 AS (SELECT w2, COUNT(*) AS c2 FROM big GROUP BY w2),
n AS (SELECT COUNT(*) AS n_bigrams FROM big)
SELECT w1, w2, c12,
       CAST(ROUND(ln((CAST(n.n_bigrams AS DOUBLE) * CAST(c12 AS DOUBLE))
                     / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))
                  * {_LM_SCALE}) AS BIGINT) AS pmi_micronats
FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), n
WHERE c12 >= {PMI_MIN_COUNT}
ORDER BY pmi_micronats DESC, w1, w2
LIMIT {PMI_TOPK}
"""


# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup (SNM): the third blocking family
# ---------------------------------------------------------------------------

SNM_WINDOW = 5
SNM_KEY_LEN = 30


def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking: docs sorted by a semantic key (the
    normalized 30-char text prefix), candidates = pairs within 5 sort
    positions, then exact-Jaccard verification — the classic
    merge/purge alternative to LSH and inverted-index blocking. Recall
    is DATA-DEPENDENT: exact dups collide on the key, but a pair is
    adjacent only while fewer than SNM_WINDOW other docs tie the same
    key between them (fixture max key-tie group is 5 across all sfs, so
    every injected duplicate pair lands in-window here; a production
    deployment sizes the window to the observed max key-tie group, or
    does the standard multi-pass SNM with a second sort key).

    Scale: the global sort position comes from ``operators/rank.py
    global_rank`` (range repartition + per-partition rank + broadcast
    offsets — no single-partition window); the neighbor join is an
    EQUI-join on position (explode of the 1..w offsets), never a
    nested-loop range join; verification is the shared broadcast
    candidates × persisted arrays path.
    """
    from ..operators.rank import global_rank
    from .extensions import _doc_shingle_arrays, _verify_candidates

    corpus = _corpus(spark, sf_dir)
    keyed = corpus.select(
        "doc_id",
        F.substring(F.trim(F.lower(F.col("text"))), 1, SNM_KEY_LEN).alias("skey"),
    )
    ranked = global_rank(keyed, ["skey", "doc_id"], rank_col="pos").select(
        "doc_id", "pos"
    )
    probe = ranked.select(
        F.col("doc_id").alias("id_a"),
        "pos",
        F.explode(F.sequence(F.lit(1), F.lit(SNM_WINDOW))).alias("j"),
    ).select("id_a", (F.col("pos") + F.col("j")).alias("pos_b"))
    cand = (
        probe.join(
            ranked.select(F.col("doc_id").alias("id_b"), F.col("pos").alias("pos_b")),
            "pos_b",
        )
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
        )
    )
    return _verify_candidates(cand, _doc_shingle_arrays(spark, sf_dir))


def _snm_oracle_sql() -> str:
    from .extensions import JACCARD_THRESHOLD

    return f"""
WITH corpus AS ({_CORPUS_SQL}),
sh AS ({_SHINGLES_SQL}),
inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY substr(trim(lower(text)), 1, {SNM_KEY_LEN}), doc_id) AS pos
  FROM corpus
),
cand AS (
  SELECT least(a.doc_id, b.doc_id) AS doc_a, greatest(a.doc_id, b.doc_id) AS doc_b
  FROM ranked a JOIN ranked b
    ON b.pos > a.pos AND b.pos <= a.pos + {SNM_WINDOW}
),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN inv a ON a.doc_id = c.doc_a
  JOIN inv b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= {JACCARD_THRESHOLD}
"""


SNM_SQL = _snm_oracle_sql()


EXTENSION2_QUERIES = {
    "simhash_neardup_pairs": simhash_neardup_pairs,
    "dedup_containment": dedup_containment,
    "bm25_search": bm25_search,
    "bigram_lm_score": bigram_lm_score,
    "byte_entropy_stats": byte_entropy_stats,
    "pmi_collocations": pmi_collocations,
    "dedup_sorted_neighborhood": dedup_sorted_neighborhood,
}

EXTENSION2_ORACLE_SQL = {
    "simhash_neardup_pairs": SIMHASH_PAIRS_SQL,
    "dedup_containment": CONTAINMENT_SQL,
    "bm25_search": BM25_SQL,
    "bigram_lm_score": BIGRAM_LM_SQL,
    "byte_entropy_stats": BYTE_ENTROPY_SQL,
    "pmi_collocations": PMI_SQL,
    "dedup_sorted_neighborhood": SNM_SQL,
}
