"""Round-5 curation stages, fourth set: bloom-pruned incremental
admission, tokenizer OOV coverage, and exact reranking over PQ
retrieval.

* ``bloom_prune_incremental``: the 100 TB shape of the incremental
  admit step (``curation.dedup_incremental`` is the plain anti-join).
  The historical corpus's fingerprints are folded into a Bloom bitmap
  held as a TABLE of 64-bit words (k=5 positions per key via seeded
  xxhash64 → explode → ``bit_or`` per word — one bounded shuffle over
  4096 groups), the batch probes it through a broadcast join (map-side
  after the ~32 KB broadcast), and ONLY the maybe-present survivors pay
  the exact anti-join against the historical key set. Definitely-absent
  docs are admitted without touching the big side at all. Bloom false
  positives are harmless (the exact verify rejects them) and false
  negatives are structurally impossible (every historical key sets all
  k of its bits), so the result is EXACTLY the plain anti-join — the
  oracle — while the expensive join runs on a fraction of the batch.
  At 100 TB the bitmap scales by sizing m (~10 bits/key) and stays a
  small broadcast relative to the corpus; the pattern is the standard
  bloom-pruned MERGE prefilter.

* ``oov_rate_per_source``: tokenizer coverage per source — fix the
  vocabulary to the corpus-global top-20 tokens (count desc, token asc:
  deterministic at the tie-prone boundary) and report per source the
  total token volume, the out-of-vocabulary token volume, and the OOV
  rate in exact fixed point (``floor(oov·10⁶ / total)`` — integer
  division, engine-identical). Complements ``tokenizer_fertility``
  (tokens-per-word of a fixed vocab) with the coverage metric that
  actually drives vocab-size decisions. Vocab is a bounded top-K
  (orderBy+limit on the unigram aggregate — the unigram table is
  vocabulary-bounded, not corpus-bounded) broadcast to a map-side
  membership probe: one corpus scan, one bounded shuffle.

* ``ann_pq_rerank``: the production two-stage retrieval missing between
  ``ann_ivf_pq`` (approximate-only) and the exact searches: stage 1
  retrieves CAND_K=20 candidates per query by PQ asymmetric distance
  (the compressed index is all that's scanned), stage 2 recomputes the
  EXACT distance on the raw vectors for those ≤20·|Q| rows only and
  re-ranks to the final top-5. Exact distance is accumulated per
  dimension in integer fixed point (Σ floor((xᵢ−yᵢ)²·10⁹) — order-free,
  bit-identical across engines). The candidate fetch joins a tiny
  candidate list against the vector table (broadcast the candidates),
  so full-precision vectors are read for a vanishing fraction of the
  corpus — the reason PQ+rerank is the standard billion-scale layout.

The reference has no vector or curation surface (pandas observation
upserts, etl/transform.py:1); these extend the training-data-pipeline
family of SURVEY §2c.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions import vectors as VEC
from ..sources.catalog import load_table
from .extensions import _sql_tokens

# ---------------------------------------------------------------------------
# Bloom-pruned incremental dedup
# ---------------------------------------------------------------------------

_BLOOM_WORDS = 4096                  # bitmap = 4096 × 64-bit words (2^18 bits)
_BLOOM_BITS = _BLOOM_WORDS * 64
_BLOOM_K = 5                         # hash functions per key


def _bloom_pos(i: int):
    """Bit position of the i-th hash of ``fingerprint``."""
    return F.pmod(F.xxhash64(F.col("fingerprint"), F.lit(i)), F.lit(_BLOOM_BITS))


def bloom_bitmap(hist: DataFrame) -> DataFrame:
    """Bloom bitmap of ``hist.fingerprint``, folded to ONE row holding a
    word_idx→word map (≤ _BLOOM_WORDS entries, ~32 KB) so the probe can
    broadcast it and stay entirely map-side."""
    pos = F.array(*[_bloom_pos(i) for i in range(_BLOOM_K)])
    words = (
        hist.select(F.explode(pos).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("bm")
    )


def bloom_probe(batch: DataFrame, bitmap: DataFrame, *keep: str) -> DataFrame:
    """Tag each batch row ``maybe_present``: all k bits set in the bitmap.

    The one-row bitmap map is broadcast into a cross join, so the probe
    is a pure projection — no explode, no probe-side shuffle. A missing
    map entry means no key ever touched that word, i.e. the bit is unset.
    """
    probed = batch.join(F.broadcast(bitmap))
    hit = F.lit(True)
    for i in range(_BLOOM_K):
        pos = _bloom_pos(i)
        word = F.coalesce(
            F.element_at(F.col("bm"), (pos / 64).cast("long")), F.lit(0)
        )
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(fingerprint, {i}), "
            f"{_BLOOM_BITS}) % 64 AS INT))"
        )
        hit = hit & (word.bitwiseAND(bit) != 0)
    return probed.select(*keep, "fingerprint", hit.alias("maybe_present"))


def bloom_prune_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental admit with a Bloom prefilter: same contract as
    ``dedup_incremental`` (batch docs whose fingerprint is not in the
    historical corpus), but only maybe-present docs pay the anti-join."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = docs.filter(F.col("doc_id") % 2 == 0).select(
        TX.fingerprint_md5("text").alias("fingerprint")
    )
    batch = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        TX.fingerprint_md5("text").alias("fingerprint"),
    )
    probed = bloom_probe(batch, bloom_bitmap(hist), "doc_id")
    sure_new = probed.filter(~F.col("maybe_present")).select("doc_id", "fingerprint")
    verified = (
        probed.filter(F.col("maybe_present"))
        .select("doc_id", "fingerprint")
        .join(hist, "fingerprint", "left_anti")
        .select("doc_id", "fingerprint")
    )
    return sure_new.unionByName(verified)


# Bloom pruning must be invisible in the result: the oracle is the plain
# anti-join (same contract as DEDUP_INCREMENTAL_SQL, curation.py).
BLOOM_PRUNE_SQL = """
WITH hist AS (SELECT md5(text) AS fingerprint FROM documents WHERE doc_id % 2 = 0),
batch AS (SELECT doc_id + 1000000 AS doc_id, md5(text) AS fingerprint
          FROM documents WHERE doc_id % 7 = 0)
SELECT doc_id, fingerprint
FROM batch b
WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fingerprint = b.fingerprint)
"""


# ---------------------------------------------------------------------------
# Tokenizer OOV coverage per source
# ---------------------------------------------------------------------------

_OOV_VOCAB_K = 20  # corpus vocab is 31 whitespace tokens; K=20 keeps OOV live


def oov_rate_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: token volume, OOV volume vs the corpus-global top-20
    vocabulary, and the exact fixed-point OOV rate (permicro)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    tok = docs.select("source", F.explode(TX.tokens("text")).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(_OOV_VOCAB_K)
        .select("token")
    )
    tagged = tok.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "token", "left"
    )
    return (
        tagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .withColumn(
            "oov_permicro",
            F.floor(F.col("n_oov") * F.lit(1000000) / F.col("n_tokens")).cast("long"),
        )
        .orderBy("source")
    )


OOV_RATE_SQL = f"""
WITH tok AS (
  SELECT source, unnest({_sql_tokens()}) AS token
  FROM documents WHERE length(trim(text)) > 0
),
vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS freq FROM tok GROUP BY token
  ) ORDER BY freq DESC, token ASC LIMIT {_OOV_VOCAB_K}
)
SELECT source,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(floor(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 1000000.0
                  / COUNT(*)) AS BIGINT) AS oov_permicro
FROM tok t LEFT JOIN vocab v USING (token)
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# PQ retrieve → exact rerank
# ---------------------------------------------------------------------------

_RERANK_CAND_K = 20   # stage-1 PQ candidates per query
_RERANK_TOPK = 5      # final exact top-k
_RERANK_FX = int(1e9)


def _l2_fx(a, b):
    """Exact fixed-point squared L2: Σ_d floor((a_d−b_d)²·10⁹) as BIGINT.

    Each term is floored to an integer BEFORE the sum, so the total is
    order-free and bit-identical across engines (float32 differences and
    their squares are exact in double; the ×10⁹ product and floor round
    identically under IEEE 754).
    """
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: F.floor((x - y) * (x - y) * _RERANK_FX).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage search: PQ asymmetric-distance top-20 (compressed index
    only), then exact fixed-point L2 on the raw vectors of those
    candidates, re-ranked to the top-5 per query."""
    from .curation2 import _pq_approx

    cand = _pq_approx(spark, sf_dir, topk=_RERANK_CAND_K).select(
        "query_id", "vec_id"
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VEC.as_double("embedding").alias("v")
    )
    qv = emb.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    scored = (
        emb.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("exact_fx", _l2_fx(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy("exact_fx", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _RERANK_TOPK)
        .select("query_id", "vec_id", "exact_fx", "rank")
        .orderBy("query_id", "rank")
    )


def _rerank_sql() -> str:
    from .curation2 import _pq_sql

    # outer CAST: DuckDB's list_sum over BIGINT yields HUGEINT (→ float64
    # through pandas); pin it back to int64 to match Spark's BIGINT
    d2fx = (
        "CAST(list_sum(list_transform(list_zip(qv, v), "
        f"x -> CAST(floor((x[1]-x[2])*(x[1]-x[2]) * {_RERANK_FX}) AS BIGINT))) "
        "AS BIGINT)"
    )
    return f"""
WITH cand AS (SELECT query_id, vec_id FROM ({_pq_sql(_RERANK_CAND_K)})),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT c.query_id, c.vec_id, {d2fx} AS exact_fx
  FROM cand c
  JOIN e ON e.vec_id = c.vec_id
  JOIN (SELECT vec_id AS query_id, v AS qv FROM e) q USING (query_id)
)
SELECT query_id, vec_id, exact_fx, rank FROM (
  SELECT query_id, vec_id, exact_fx,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY exact_fx, vec_id) AS rank
  FROM scored
) WHERE rank <= {_RERANK_TOPK}
ORDER BY query_id, rank
"""


CURATION8_QUERIES = {
    "bloom_prune_incremental": bloom_prune_incremental,
    "oov_rate_per_source": oov_rate_per_source,
    "ann_pq_rerank": ann_pq_rerank,
}

CURATION8_ORACLE_SQL = {
    "bloom_prune_incremental": BLOOM_PRUNE_SQL,
    "oov_rate_per_source": OOV_RATE_SQL,
    "ann_pq_rerank": _rerank_sql(),
}
