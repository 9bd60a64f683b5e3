"""Sub-document curation operators: passage-level dedup with document
reassembly, duplicated-span detection, and product-quantized ANN.

These extend the doc-level dedup family (plans/extensions.py) to the two
granularities large-corpus curation actually operates at —

* ``dedup_passages``: RefinedWeb/CCNet-style passage dedup. Documents
  are split into fixed token windows ("passages"); a passage seen
  anywhere earlier in the corpus is dropped, and each document is
  reassembled from its surviving passages. The reference's dedup (T6/T8,
  ``etl/transform.py:45-48``) is whole-row; this is the sub-row analog a
  training corpus needs (boilerplate headers/footers repeat across
  pages whose bodies differ).
* ``duplicate_spans``: the substring-dedup diagnostic from "Deduplicating
  Training Data Makes Language Models Better" (Lee et al., 2022) —
  maximal duplicated token spans (length ≥ SPAN_K) across documents,
  found by k-gram fingerprint matching + island merging, the distributed
  approximation of the paper's suffix-array scan.
* ``ann_ivf_pq``: product quantization with asymmetric distance
  computation (ADC) — the memory side of the IVF-PQ architecture every
  web-scale ANN system uses (Jégou et al., 2011). The coarse-quantizer
  half already exists (``ann_ivf_search`` / ``ann_ivf_nprobe``,
  plans/extras.py); this supplies the in-cell compressed-distance half.

Scale notes
-----------
- dedup_passages: one shuffle to group passages, one to pick owners
  (hash-groupBy on the passage fingerprint — same 100 TB shape as
  dedup_exact), one narrow re-agg per doc to reassemble. No arrays of
  passages cross a shuffle; rows are (doc_id, idx, fingerprint).
- duplicate_spans: k-gram fingerprints are rows; the duplicate-mark is
  a groupBy count on the fingerprint (partial-agg friendly); island
  merging is a per-doc window (pos - row_number), so state never leaves
  the doc partition.
- ann_ivf_pq: codebooks are M×K rows (tiny, broadcast); encoding is a
  map-only broadcast NLJ; ADC joins the (vec, m, code) rows to a
  broadcast distance table and reduces with one (query, vec) shuffle.
  At 100 TB the ADC fan-out is bounded per IVF cell, not per corpus —
  compose with ann_ivf_* cell pruning.

Cross-engine exactness: all distance folds are left-to-right double
accumulation (functions/vectors.py parity contract); cross-row sums use
integer fixed point (floor(d2 · 1e9)) so they are order-free and
bit-identical in both engines; codebook means use the established
float→string→decimal→string→double hop (see plans/vector_analytics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions import vectors as VEC
from ..sources.catalog import load_table, spread_by_hash

# ---------------------------------------------------------------------------
# Shared corpus: hybrid documents that duplicate PARTS of two base docs.
# For every doc_id % 11 == 0 (call it d), a hybrid doc (d + 2000000) is
# injected whose text = first 32 tokens of d ∥ full text of d+1. Passage
# dedup should suppress (nearly) all of each hybrid; span detection
# should find the 32-token prefix span and the |d+1|-token suffix span
# on both sides.
# ---------------------------------------------------------------------------

_PASSAGE_P = 16  # tokens per passage window
_SPAN_K = 10     # minimum duplicated span length (tokens)
_HYBRID_TAKE = 2 * _PASSAGE_P  # prefix kept passage-aligned


def _corpus2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("a_id"), F.col("text").alias("a_text")
    )
    b = docs.select(F.col("doc_id").alias("b_id"), F.col("text").alias("b_text"))
    hybrids = a.join(b, F.col("a_id") + 1 == F.col("b_id")).select(
        (F.col("a_id") + 2000000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.array_join(F.slice(TX.tokens(F.col("a_text")), 1, _HYBRID_TAKE), " "),
            F.col("b_text"),
        ).alias("text"),
    )
    return docs.unionByName(hybrids)


_CORPUS2_SQL = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT a.doc_id + 2000000 AS doc_id,
         concat_ws(' ',
           array_to_string(list_slice(regexp_split_to_array(trim(lower(a.text)), '\\s+'),
                                      1, {_HYBRID_TAKE}), ' '),
           b.text) AS text
  FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id
  WHERE a.doc_id % 11 = 0
"""


def _token_rows(corpus: DataFrame) -> DataFrame:
    """(doc_id, pos, tok) with 0-based pos — the row form every
    sub-document operator shares (arrays never cross a shuffle)."""
    return corpus.select(
        "doc_id", F.posexplode(TX.tokens(F.col("text"))).alias("pos", "tok")
    )


_TOKEN_ROWS_SQL = """
  SELECT doc_id,
         generate_subscripts(regexp_split_to_array(trim(lower(text)), '\\s+'), 1) - 1 AS pos,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM corpus
"""


# ---------------------------------------------------------------------------
# Passage-level dedup with reassembly
# ---------------------------------------------------------------------------

def dedup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide passage dedup: split each doc into fixed 16-token
    windows, keep each distinct passage only at its first occurrence
    (min (doc_id, idx)), reassemble every doc from its surviving
    passages. Returns the per-doc audit row: passage counts before and
    after, plus the md5 of the deduplicated text (compact, hashable
    proof of the exact reassembled bytes)."""
    tok = _token_rows(_corpus2(spark, sf_dir))
    passages = (
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
        .withColumn("fp", F.md5(F.col("passage")))
    )
    # first-occurrence owner as a scalar key (doc_id · 1024 + idx): min of
    # a BIGINT is portable where min-of-struct ordering is not
    okey = F.col("doc_id") * 1024 + F.col("idx")
    owned = passages.withColumn(
        "owner", F.min(okey).over(Window.partitionBy("fp"))
    )
    kept = owned.withColumn("is_kept", F.col("owner") == okey)
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.col("is_kept").cast("int")).alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(F.col("is_kept"), F.struct("idx", "passage"))
                            )
                        ),
                        lambda s: s["passage"],
                    ),
                    " ",
                )
            ).alias("clean_fp"),
        )
        .orderBy("doc_id")
    )


DEDUP_PASSAGES_SQL = f"""
WITH corpus AS ({_CORPUS2_SQL}),
tok AS ({_TOKEN_ROWS_SQL}),
passages AS (
  SELECT doc_id, CAST(floor(pos / {_PASSAGE_P}.0) AS INT) AS idx,
         string_agg(tok, ' ' ORDER BY pos) AS passage
  FROM tok GROUP BY doc_id, CAST(floor(pos / {_PASSAGE_P}.0) AS INT)
),
owned AS (
  SELECT doc_id, idx, passage,
         min(doc_id * 1024 + idx) OVER (PARTITION BY md5(passage)) AS owner
  FROM passages
)
SELECT doc_id, COUNT(*) AS n_passages,
       CAST(SUM(CASE WHEN owner = doc_id * 1024 + idx THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       md5(coalesce(string_agg(CASE WHEN owner = doc_id * 1024 + idx THEN passage END,
                               ' ' ORDER BY idx), '')) AS clean_fp
FROM owned GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Duplicated-span detection (Lee et al. 2022, distributed approximation)
# ---------------------------------------------------------------------------

def _kgram_rows(tok: DataFrame) -> DataFrame:
    """(doc_id, pos, fp): md5 fingerprint of every complete K-token
    k-gram — the shared row form of duplicated-span detection AND
    removal. One lead-window pass per doc; incomplete tail k-grams are
    dropped."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, _SPAN_K)]
    return (
        tok.select(
            "doc_id",
            "pos",
            F.md5(F.concat_ws(" ", F.col("tok"), *leads)).alias("fp"),
            leads[-1].isNotNull().alias("__complete"),
        )
        .filter(F.col("__complete"))
        .select("doc_id", "pos", "fp")
    )


def _kgram_rows_arr(corpus: DataFrame) -> DataFrame:
    """(doc_id, pos, fp) — the SAME fingerprints as :func:`_kgram_rows`
    (md5 of each complete K-token k-gram, 0-based start pos) computed in
    the ARRAY domain: one map-only transform over the token array
    replaces the per-doc window (a doc_id shuffle + sort + K−1 lead
    passes over every token row).  r13 optimization, guide §2.2: the
    k-gram build now ships zero bytes to a shuffle; the spread corpus
    scan is the only distribution step.  The token array is bound ONCE
    per row via the one-element-array lambda (Catalyst's CollapseProject
    would otherwise inline the split per reference); incomplete tail
    k-grams are excluded by the sequence bound — exactly the
    ``__complete`` filter.  Equality with the window form is test-pinned
    (tests/test_curation2_opt.py)."""
    kgs = F.expr(
        f"""flatten(transform(array(split(trim(lower(text)), '\\\\s+')), arr ->
          CASE WHEN size(arr) >= {_SPAN_K}
               THEN transform(sequence(0, size(arr) - {_SPAN_K}),
                              p -> md5(concat_ws(' ', slice(arr, p + 1, {_SPAN_K}))))
               ELSE array() END))"""
    )
    return corpus.select("doc_id", F.posexplode(kgs).alias("pos", "fp"))


_KGRAM_BLOCKS_SQL = f"""kg AS (
  SELECT doc_id, pos,
         md5(concat_ws(' ', {", ".join(
             f"lead(tok, {i}) OVER (PARTITION BY doc_id ORDER BY pos)"
             if i else "tok" for i in range(_SPAN_K))})) AS fp,
         lead(tok, {_SPAN_K - 1}) OVER (PARTITION BY doc_id ORDER BY pos)
           IS NOT NULL AS complete
  FROM tok
),
kgc AS (SELECT doc_id, pos, fp FROM kg WHERE complete)"""


def duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token spans of length ≥ 10 across the corpus:
    fingerprint every 10-token k-gram, keep k-grams whose fingerprint
    occurs more than once corpus-wide, merge consecutive duplicated
    start positions per doc into islands (pos − row_number grouping),
    and report each island as (doc_id, start_pos, span_len)."""
    # r13: spread the one-task scan, and materialize the k-gram table
    # once — the duplicate mark references it on BOTH sides (census +
    # join back).  Built in the array domain (_kgram_rows_arr): the
    # window shuffle disappears entirely.  Values identical.
    kgrams = _kgram_rows_arr(
        spread_by_hash(_corpus2(spark, sf_dir), "doc_id")
    ).localCheckpoint(eager=True)
    # duplicate mark via groupBy + join, NOT a count-over-fp window: the
    # groupBy gets map-side partial aggregation (a hot fingerprint sends
    # #partitions pre-counts, not every occurrence, to its reducer) and
    # the join back is AQE-skew-splittable — a skewed window partition
    # is not.
    dup_fps = (
        kgrams.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") > 1)
        .select("fp")
    )
    dup_marks = kgrams.join(dup_fps, "fp")
    w_isl = Window.partitionBy("doc_id").orderBy("pos")
    islands = dup_marks.withColumn(
        "grp", F.col("pos") - F.row_number().over(w_isl)
    )
    return (
        islands.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("start_pos"),
            (F.max("pos") - F.min("pos") + _SPAN_K).cast("long").alias("span_len"),
        )
        .select("doc_id", "start_pos", "span_len")
        .orderBy("doc_id", "start_pos")
    )


DUPLICATE_SPANS_SQL = f"""
WITH corpus AS ({_CORPUS2_SQL}),
tok AS ({_TOKEN_ROWS_SQL}),
{_KGRAM_BLOCKS_SQL},
marks AS (
  SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY fp) AS n_occ
  FROM kgc
),
islands AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM marks WHERE n_occ > 1
)
SELECT doc_id, MIN(pos) AS start_pos,
       MAX(pos) - MIN(pos) + {_SPAN_K} AS span_len
FROM islands GROUP BY doc_id, grp
ORDER BY doc_id, start_pos
"""


# ---------------------------------------------------------------------------
# Duplicated-span REMOVAL with reassembly (the output side of Lee et al.)
# ---------------------------------------------------------------------------

# owner key doc_id·2^24 + pos: pos must fit 24 bits (16 M tokens/doc) and
# doc_id 38 bits — widen the shift before either bound is approached
_OKEY_POS_BITS = 24


def _okey():
    """Packed owner key ``doc_id·2^24 + pos`` with a RUNTIME guard: a
    document with ≥ 2^24 tokens raises ``pos overflows`` instead of
    silently bleeding pos bits into doc_id (which would corrupt
    first-occurrence ownership in remove_duplicate_spans and
    ngram_novelty). ``assert_true`` returns NULL while the predicate
    holds, so coalescing it into the sum keeps the guard inside the
    evaluated expression tree at zero cost to the packed value."""
    guard = F.assert_true(
        F.col("pos") < F.lit(1 << _OKEY_POS_BITS),
        F.lit("pos overflows _OKEY_POS_BITS; widen the owner-key shift"),
    )
    packed = (F.col("doc_id") * (1 << _OKEY_POS_BITS) + F.col("pos")).cast("long")
    return packed + F.coalesce(guard.cast("long"), F.lit(0))


def remove_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup with reassembly: every k-gram occurrence
    that is NOT the corpus-wide first occurrence of its fingerprint has
    its K tokens removed, and documents are rebuilt from the surviving
    tokens. ``duplicate_spans`` is the diagnostic; this is the cleaned
    corpus (Lee et al., 2022 §4 — train on text with duplicated spans
    cut out, keeping one copy corpus-wide).

    Exactly-once semantics per k-gram: the min-(doc_id, pos) occurrence
    keeps its tokens (unless covered by a different foreign duplicate);
    all later occurrences are cut. A token is cut iff ANY of the ≤ K
    k-gram starts covering it is a non-owner duplicate — a per-doc
    ROWS-window max over the dense token sequence, so the decision
    never leaves the doc partition.

    Returns the per-doc audit row (token counts before/after, md5 of
    the reassembled text) — compact, hashable proof of the exact
    surviving bytes."""
    # r13: spread the one-task scan and checkpoint the hybrid corpus
    # once (its join feeds both row forms); the token table materializes
    # for the coverage mark while the k-gram table is built in the ARRAY
    # domain (_kgram_rows_arr — no window shuffle). Values identical.
    corpus = spread_by_hash(_corpus2(spark, sf_dir), "doc_id").localCheckpoint(
        eager=True
    )
    # r14: the r13 token-table checkpoint is gone — the coverage mark is
    # its ONLY consumer, so eagerly materializing it just serialized an
    # extra job ahead of the final one (A/B: 3.06 → see
    # OPTIMIZATION_r14.md); the k-gram table keeps its checkpoint (two
    # consumers of the expensive md5-per-k-gram projection).
    tok = _token_rows(corpus)
    w = Window.partitionBy("doc_id").orderBy("pos")
    kgrams = _kgram_rows_arr(corpus).localCheckpoint(eager=True)
    okey = _okey()
    # first occurrence per fingerprint: partial-agg'd groupBy + join
    # back (AQE-skew-splittable; same shape as duplicate_spans' mark)
    owners = kgrams.groupBy("fp").agg(F.min(okey).alias("owner"))
    cuts = (
        kgrams.join(owners, "fp")
        .filter(okey != F.col("owner"))
        .select("doc_id", "pos", F.lit(1).alias("cut_start"))
    )
    marked = tok.join(cuts, ["doc_id", "pos"], "left")
    # token pos sequences are dense (posexplode), so a ROWS frame of the
    # preceding K−1 rows IS the positions [pos−K+1, pos]
    w_cov = w.rowsBetween(-(_SPAN_K - 1), 0)
    covered = marked.withColumn("cut", F.max("cut_start").over(w_cov) == 1)
    return (
        covered.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("cut").cast("int"), F.lit(0))).alias(
                "n_removed"
            ),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(~F.coalesce(F.col("cut"), F.lit(False)),
                                       F.struct("pos", "tok"))
                            )
                        ),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("clean_fp"),
        )
        .orderBy("doc_id")
    )


REMOVE_DUPLICATE_SPANS_SQL = f"""
WITH corpus AS ({_CORPUS2_SQL}),
tok AS ({_TOKEN_ROWS_SQL}),
{_KGRAM_BLOCKS_SQL},
owners AS (
  SELECT fp, MIN(doc_id * {1 << _OKEY_POS_BITS} + pos) AS owner
  FROM kgc GROUP BY fp
),
cuts AS (
  SELECT k.doc_id, k.pos, 1 AS cut_start
  FROM kgc k JOIN owners o USING (fp)
  WHERE k.doc_id * {1 << _OKEY_POS_BITS} + k.pos <> o.owner
),
covered AS (
  SELECT t.doc_id, t.pos, t.tok,
         MAX(c.cut_start) OVER (PARTITION BY t.doc_id ORDER BY t.pos
           ROWS BETWEEN {_SPAN_K - 1} PRECEDING AND CURRENT ROW) = 1 AS cut
  FROM tok t LEFT JOIN cuts c ON t.doc_id = c.doc_id AND t.pos = c.pos
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       md5(coalesce(string_agg(CASE WHEN cut IS NOT TRUE THEN tok END,
                               ' ' ORDER BY pos), '')) AS clean_fp
FROM covered GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Product quantization with ADC (the compressed half of IVF-PQ)
# ---------------------------------------------------------------------------

_PQ_M = 4        # subspaces
_PQ_W = 16       # dims per subspace (4 × 16 = the 64-dim embeddings)
_PQ_K = 16       # codes per subspace codebook
_PQ_TOPK = 10
_PQ_QUERY_MOD = 61  # queries = vec_id % 61 == 0 (~8 at sf0.01)
_PQ_FX = int(1e9)   # fixed-point scale for order-free distance sums


def _subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, m, sub): each vector split into M W-dim subvectors —
    the row form whose shuffles carry only one subspace at a time."""
    m = F.explode(F.array([F.lit(i) for i in range(_PQ_M)])).alias("m")
    return emb.select("vec_id", m, "v").select(
        "vec_id", "m", F.slice("v", F.col("m") * _PQ_W + 1, _PQ_W).alias("sub")
    )


def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed approximate search with asymmetric distance
    computation. Codebooks: per subspace, K=16 centroids initialized
    from the first 16 vectors' subvectors and refined with one exact
    Lloyd update (decimal-mean hop, engine-identical doubles). Every
    vector is encoded as M=4 code ids (map-only broadcast argmin); each
    query precomputes its M×K distance table; approximate distance =
    Σ_m dtable[m, code_m], accumulated in integer fixed point so the
    sum is order-free and exact. Returns top-10 neighbors per query
    (self excluded) by (approx distance, vec_id)."""
    return _pq_approx(spark, sf_dir, _PQ_TOPK)


def _pq_approx(spark: SparkSession, sf_dir: str, topk: int) -> DataFrame:
    """PQ retrieval, parameterized top-k (reused by ann_pq_rerank)."""
    # (examined r13: spreading the scan measured flat here — the windowed
    # argmin's own exchange already parallelizes the encode — so only the
    # codebook checkpoint below is kept)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VEC.as_double("embedding").alias("v")
    )
    subs = _subvectors(emb)
    cb0 = _subvectors(emb.filter(F.col("vec_id") < _PQ_K)).select(
        "m", F.col("vec_id").alias("code"), F.col("sub").alias("cv")
    )

    def assign(cands: DataFrame, cb: DataFrame) -> DataFrame:
        # r13: argmin via partial-aggregated min(struct(d2, code, sub))
        # instead of a row_number window — same winner (struct ordering
        # compares d2 then code, the window's exact sort key; d2 is a
        # finite sum of squares), but the groupBy gets map-side combine
        # (16 candidates collapse per key before the shuffle) and no
        # per-group sort.  Locally a wash (2.06 -> 1.96 s); kept for the
        # scale posture (guide §2.3).  Output equality verified by
        # sorted-collect comparison against the window form.
        return (
            cands.join(F.broadcast(cb), "m")
            .withColumn("d2", _l2u("sub", "cv"))
            .groupBy("vec_id", "m")
            .agg(F.min(F.struct("d2", "code", "sub")).alias("w"))
            .select(
                "vec_id",
                "m",
                F.col("w.code").alias("code"),
                F.col("w.sub").alias("sub"),
            )
        )

    # one Lloyd refinement: exact decimal per-dimension means of the raw
    # assigned subvector components (float→string→decimal→string→double)
    a0 = assign(subs, cb0).select("vec_id", "m", "code", "sub")
    comp = (
        a0.select("m", "code", F.posexplode("sub").alias("pos", "x"))
        .groupBy("m", "code", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("string").cast("decimal(20,10)"))
                .cast("string")
                .cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
    )
    cb1 = comp.groupBy("m", "code").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cv")
    )
    # r13: the refined codebook (M·K = 64 rows) feeds BOTH the encoding
    # and the distance table — materialize it once instead of re-running
    # the init-assign + Lloyd chain per consumer. Values identical.
    cb1 = cb1.localCheckpoint(eager=True)

    codes = assign(subs, cb1).select("vec_id", "m", "code")
    queries = _subvectors(emb.filter(F.col("vec_id") % _PQ_QUERY_MOD == 0)).select(
        F.col("vec_id").alias("query_id"), "m", F.col("sub").alias("qsub")
    )
    dtable = (
        queries.join(F.broadcast(cb1), "m")
        .withColumn(
            "d2_fx", F.floor(_l2u("qsub", "cv") * _PQ_FX)
        )
        .select("query_id", "m", "code", "d2_fx")
    )
    w_rank = Window.partitionBy("query_id").orderBy("approx_fx", "vec_id")
    return (
        codes.join(F.broadcast(dtable), ["m", "code"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2_fx").alias("approx_fx"))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= topk)
        .select("query_id", "vec_id", "approx_fx", "rank")
        .orderBy("query_id", "rank")
    )


def _l2(a, b):
    """Squared L2, left-to-right fold (oracle-identical element order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _l2u(a: str, b: str, n: int = _PQ_W) -> F.Column:
    """Squared L2 over fixed-width array columns, UNROLLED to plain
    arithmetic (r14, guide §1.2 per-task work): the higher-order
    zip_with/aggregate pair in :func:`_l2` is CodegenFallback —
    interpreted per element — and dominated the PQ assign stage (A/B on
    the 512k-pair assign projection: 0.445 → 0.213 s).  The unrolled
    ``0.0 + t1 + … + tn`` is the same left-associated IEEE addition
    order as the fold, so the doubles are bit-identical (full-corpus
    equality verified, and pinned in tests/test_curation2_opt.py);
    ``try_element_at`` keeps zip_with's NULL-on-short-array semantics
    under ANSI (a malformed short vector yields NULL, not an error).
    Arrays longer than ``n`` would NULL the fold but not the unrolled
    form — impossible here: every caller slices/collects exactly n."""
    terms = " + ".join(
        f"(try_element_at({a}, {i}) - try_element_at({b}, {i}))"
        f" * (try_element_at({a}, {i}) - try_element_at({b}, {i}))"
        for i in range(1, n + 1)
    )
    return F.expr(f"CAST(0.0 AS DOUBLE) + {terms}")


_PQ_D2 = "list_sum(list_transform(list_zip({a}, {b}), x -> (x[1]-x[2])*(x[1]-x[2])))"


def _pq_sql(topk: int) -> str:
    """PQ retrieval SQL twin, parameterized top-k (reused by rerank)."""
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
subs AS (
  SELECT vec_id, m.m, list_slice(v, m.m * {_PQ_W} + 1, (m.m + 1) * {_PQ_W}) AS sub
  FROM e CROSS JOIN (SELECT unnest([{", ".join(str(i) for i in range(_PQ_M))}]) AS m) m
),
cb0 AS (SELECT m, vec_id AS code, sub AS cv FROM subs WHERE vec_id < {_PQ_K}),
a0 AS (
  SELECT vec_id, m, code, sub FROM (
    SELECT s.vec_id, s.m, c.code, s.sub,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {_PQ_D2.format(a="s.sub", b="c.cv")}, c.code) AS rn
    FROM subs s JOIN cb0 c USING (m)
  ) WHERE rn = 1
),
comp AS (
  SELECT m, code, u.pos - 1 AS pos,
         CAST(CAST(SUM(CAST(CAST(u.x AS VARCHAR) AS DECIMAL(20,10))) AS VARCHAR)
              AS DOUBLE) / COUNT(*) AS c
  FROM (SELECT vec_id, m, code, unnest(sub) AS x,
               generate_subscripts(sub, 1) AS pos FROM a0) u
  GROUP BY m, code, pos
),
cb1 AS (SELECT m, code, array_agg(c ORDER BY pos) AS cv FROM comp GROUP BY m, code),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, c.code,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {_PQ_D2.format(a="s.sub", b="c.cv")}, c.code) AS rn
    FROM subs s JOIN cb1 c USING (m)
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, m, sub AS qsub FROM subs
  WHERE vec_id % {_PQ_QUERY_MOD} = 0
),
dtable AS (
  SELECT query_id, m, code,
         CAST(floor({_PQ_D2.format(a="qsub", b="cv")} * {_PQ_FX}) AS BIGINT) AS d2_fx
  FROM queries JOIN cb1 USING (m)
),
approx AS (
  SELECT query_id, vec_id, CAST(SUM(d2_fx) AS BIGINT) AS approx_fx
  FROM codes JOIN dtable USING (m, code)
  WHERE query_id <> vec_id
  GROUP BY query_id, vec_id
)
SELECT query_id, vec_id, approx_fx, rank FROM (
  SELECT query_id, vec_id, approx_fx,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY approx_fx, vec_id) AS rank
  FROM approx
) WHERE rank <= {topk}
ORDER BY query_id, rank
"""


ANN_IVF_PQ_SQL = _pq_sql(_PQ_TOPK)


# ---------------------------------------------------------------------------
# Export shard manifest
# ---------------------------------------------------------------------------

_N_SHARDS = 8


def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment for corpus export: every document
    lands in one of 8 output shards by md5(doc_id) (stable under
    re-ingestion and reshuffling, like train_split_assign), and the
    manifest row per shard carries the doc/token/char volumes a
    downstream training loader needs for balanced reads. Map-only until
    one 8-group aggregate — embarrassingly parallel at any scale."""
    from .training import _nibble

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    docs = docs.withColumn("h", h)
    shard = ((_nibble("h", 1) * 16 + _nibble("h", 2)) % _N_SHARDS).cast("long")
    return (
        docs.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(TX.token_count("text")).alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard")
    )


def _shard_manifest_sql() -> str:
    from .extensions import _sql_n_tokens
    from .training import _sql_nibble

    shard = f"(({_sql_nibble('h', 1)} * 16 + {_sql_nibble('h', 2)}) % {_N_SHARDS})"
    return f"""
SELECT {shard} AS shard, COUNT(*) AS n_docs,
       CAST(SUM({_sql_n_tokens()}) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM (SELECT *, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
GROUP BY shard
ORDER BY shard
"""


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded duplication density: per document, the fraction of its
    10-gram occurrences that are the corpus-wide FIRST occurrence of
    their fingerprint (min (doc_id, pos) ownership — the same contract
    as ``remove_duplicate_spans``). Binary dedup asks "is this doc a
    dup"; training-corpus curation also wants the continuous signal —
    novelty_permille near 1000 = fresh text, near 0 = boilerplate —
    to threshold, stratify, or weight by.

    Runs on the PLAIN documents table (no injected hybrids): real
    corpora carry intrinsic cross-document repetition. Scale shape:
    identical to the span ops — one partial-agg'd fingerprint groupBy
    joined back, one doc_id re-agg; the ratio is integer permille
    (floor(1000·novel/total)) so both engines agree exactly.

    EVERY document gets a row: a doc too short to form a single k-gram
    (< 10 tokens) has no duplication evidence, so it reports
    n_kgrams = 0, n_novel = 0 and a NULL novelty_permille — the
    fraction is undefined, and downstream thresholding can treat NULL
    explicitly instead of silently losing the doc to an inner join."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # r13: spread the one-task scan; materialize the k-gram table once
    # (owners + the ownership join both reference it), built in the
    # array domain (no window shuffle). Values identical.
    kgrams = _kgram_rows_arr(spread_by_hash(docs, "doc_id")).localCheckpoint(
        eager=True
    )
    okey = _okey()
    owners = kgrams.groupBy("fp").agg(F.min(okey).alias("owner"))
    per_doc = (
        kgrams.join(owners, "fp")
        .withColumn("novel", (okey == F.col("owner")).cast("long"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kgrams"),
            F.sum("novel").alias("n_novel"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_kgrams", F.lit(0)).alias("n_kgrams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.floor(
                F.lit(1000) * F.col("n_novel") / F.col("n_kgrams")
            ).cast("long").alias("novelty_permille"),
        )
        .orderBy("doc_id")
    )


NGRAM_NOVELTY_SQL = f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
tok AS ({_TOKEN_ROWS_SQL}),
{_KGRAM_BLOCKS_SQL},
owners AS (
  SELECT fp, MIN(doc_id * {1 << _OKEY_POS_BITS} + pos) AS owner
  FROM kgc GROUP BY fp
),
marked AS (
  SELECT k.doc_id,
         CASE WHEN k.doc_id * {1 << _OKEY_POS_BITS} + k.pos = o.owner
              THEN 1 ELSE 0 END AS novel
  FROM kgc k JOIN owners o USING (fp)
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_kgrams, CAST(SUM(novel) AS BIGINT) AS n_novel
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_kgrams, 0) AS n_kgrams,
       COALESCE(p.n_novel, 0) AS n_novel,
       CAST(floor(1000 * p.n_novel / p.n_kgrams) AS BIGINT) AS novelty_permille
FROM (SELECT doc_id FROM documents) d
LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


CURATION2_QUERIES = {
    "dedup_passages": dedup_passages,
    "duplicate_spans": duplicate_spans,
    "remove_duplicate_spans": remove_duplicate_spans,
    "ngram_novelty": ngram_novelty,
    "ann_ivf_pq": ann_ivf_pq,
    "shard_manifest": shard_manifest,
}

CURATION2_ORACLE_SQL = {
    "dedup_passages": DEDUP_PASSAGES_SQL,
    "duplicate_spans": DUPLICATE_SPANS_SQL,
    "remove_duplicate_spans": REMOVE_DUPLICATE_SPANS_SQL,
    "ngram_novelty": NGRAM_NOVELTY_SQL,
    "ann_ivf_pq": ANN_IVF_PQ_SQL,
    "shard_manifest": _shard_manifest_sql(),
}
