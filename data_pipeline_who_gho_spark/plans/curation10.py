"""Round-7 curation additions (VERDICT r06 items 2-4).

``media_decode_stats`` — the media-decode seam made RUNNABLE in this
container: documents drive deterministic synthetic images (pixel value
a pure function of doc_id/position/channel), encoded to real on-disk
formats (24-bit BMP for 2/3 of docs, binary PPM for the rest), then
decoded by the DEFAULT pure-numpy decoder in ``operators/multimodal``
(header parse + reshape — no external libs) and reduced to exact
integer channel statistics. The oracle recomputes the statistics from
the pixel formula alone, so any decode defect — row-order flip, BGR/RGB
swap, stride-padding error — breaks the hash: per-channel sums catch
channel swaps, the position-weighted sum catches row/column order.
Replaces the last ``NotImplementedError``-only production body
(reference analog: none — the reference pipeline is tabular-only,
etl/transform.py:1).

``boilerplate_strip_audit`` — RefinedWeb-style frequent-line removal:
corpus-wide line fingerprinting, lines whose document frequency crosses
a threshold are stripped from EVERY document, documents reassembled in
line order with an audit row (lines before/removed, md5 of the cleaned
text). Complements ``dedup_passages`` (plans/curation2.py:121), which
drops repeated windows ACROSS docs but keeps first occurrences —
boilerplate headers/footers must instead vanish everywhere. The line
unit is a parameter: production web text splits on newline; the
fixture corpus is single-line, so the registered query uses aligned
10-token chunks as lines (the same windowing dedup_passages uses).

``token_budget_sample`` — token-budget-EXACT sampling per source: docs
ordered by md5(doc_id) within each source, cumulative token count via
the scale-safe ``operators.rank.grouped_running_sum`` (range
repartition + parallel local prefix sums + per-group offsets — no
whole-source-through-one-task window), cut at budget = 1/4 of each
source's total tokens. Boundary rule (pinned by test and oracle): the
straddling document IS included — selection is ``cum_before < budget``,
so the sample always reaches the budget exactly or overshoots by at
most one document, never undershoots. This is the missing op between
``source_mix_weights`` and ``domain_quota_sample`` (plans/training.py)
— real data-mixing runs meter tokens, not rows.

Scale notes: media decode is a map-only Arrow pass (decode never
crosses a partition boundary); the boilerplate line-frequency table is
threshold-filtered to a sliver and broadcast for the anti-join; the
budget cut is one range shuffle + a #partitions×#sources-bounded
offset relation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rank import grouped_running_sum
from ..sources.catalog import load_table, spread_for_python
from .extensions import _sql_tokens

# ---------------------------------------------------------------------------
# media_decode_stats
# ---------------------------------------------------------------------------

# synthetic image geometry + pixel formula — shared by the Spark
# generator and the DuckDB oracle (exact small-integer arithmetic)
_IMG_W = "4 + doc_id % 5"  # 4..8 (5,6,7 exercise BMP row padding)
_IMG_H = "3 + doc_id % 4"  # 3..6
# v(doc_id, y, x, c) = (doc_id*7 + y*31 + x*13 + c*101) % 256
_PX = (7, 31, 13, 101)

_MEDIA_STATS_SCHEMA = (
    "doc_id BIGINT, fmt STRING, h BIGINT, w BIGINT, n_px BIGINT, "
    "sum_r BIGINT, sum_g BIGINT, sum_b BIGINT, wsum BIGINT"
)


def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → REAL decode → exact stats, one Arrow batch pass.

    Per doc: synthesize an (h, w, 3) image from the pixel formula,
    serialize with ``encode_bmp``/``encode_ppm`` (doc_id % 3 picks the
    format), decode with the DEFAULT ``decode_media`` (the pure-numpy
    BMP/PPM parsers), and emit per-channel sums plus a position-weighted
    sum wsum = Σ v·(y·w+x+1)·(c+1) over the DECODED array. Map-only —
    the only thing the oracle shares with this path is the formula."""
    from ..operators.multimodal import decode_media, encode_bmp, encode_ppm, sniff_media_type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        a_id, a_y, a_x, a_c = _PX
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 4 + doc_id % 5, 3 + doc_id % 4
                y = np.arange(h).reshape(h, 1, 1)
                x = np.arange(w).reshape(1, w, 1)
                c = np.arange(3).reshape(1, 1, 3)
                img = ((doc_id * a_id + y * a_y + x * a_x + c * a_c) % 256).astype(
                    np.uint8
                )
                fmt = "ppm" if doc_id % 3 == 0 else "bmp"
                payload = encode_ppm(img) if fmt == "ppm" else encode_bmp(img)
                dec = decode_media(payload, sniff_media_type(payload))
                dec = dec.astype(np.int64)
                wt = (y * w + x + 1) * (c + 1)  # position+channel weight
                rows.append(
                    (
                        doc_id,
                        fmt,
                        h,
                        w,
                        h * w,
                        int(dec[:, :, 0].sum()),
                        int(dec[:, :, 1].sum()),
                        int(dec[:, :, 2].sum()),
                        int((dec * wt).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "h", "w", "n_px",
                    "sum_r", "sum_g", "sum_b", "wsum",
                ],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(run, _MEDIA_STATS_SCHEMA)


MEDIA_DECODE_STATS_SQL = f"""
WITH dims AS (
  SELECT doc_id, {_IMG_W} AS w, {_IMG_H} AS h FROM documents
),
cells AS (
  SELECT doc_id, w, h, unnest(range(0, w * h)) AS g FROM dims
),
chans AS (SELECT c FROM generate_series(0, 2) AS s(c)),
vals AS (
  SELECT doc_id, w, h, c,
         (doc_id * {_PX[0]} + (g // w) * {_PX[1]}
          + (g % w) * {_PX[2]} + c * {_PX[3]}) % 256 AS v,
         ((g // w) * w + (g % w) + 1) * (c + 1) AS wt
  FROM cells CROSS JOIN chans
)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt,
       CAST(h AS BIGINT) AS h,
       CAST(w AS BIGINT) AS w,
       CAST(h * w AS BIGINT) AS n_px,
       CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
       CAST(SUM(v * wt) AS BIGINT) AS wsum
FROM vals
GROUP BY doc_id, h, w
"""


# ---------------------------------------------------------------------------
# boilerplate_strip_audit
# ---------------------------------------------------------------------------

_LINE_TOKENS = 10  # aligned chunk width standing in for '\n' lines
_BOILER_MIN_DOCS = 3  # a line in >= this many distinct docs is boilerplate


def _doc_lines(docs: DataFrame) -> DataFrame:
    """(doc_id, line_no, line): aligned _LINE_TOKENS-token chunks of the
    whitespace tokenization — the fixture's stand-in for newline lines.
    Map-only (split + sequence + slice, all JVM expressions)."""
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    )
    k = _LINE_TOKENS
    nl = F.ceil(F.size("t") / F.lit(k)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda g: F.array_join(F.slice("t", g * k + 1, k), " "),
    )
    return toks.select("doc_id", F.posexplode(chunks).alias("line_no", "line"))


def strip_frequent_lines(
    lines: DataFrame, min_docs: int = _BOILER_MIN_DOCS, joiner: str = " "
) -> DataFrame:
    """Library core of the boilerplate strip, over ANY (doc_id,
    line_no, line) relation — the registered query feeds aligned
    token-chunk lines (single-line fixture); production web text feeds
    ``posexplode(split(text, '\\n'))`` lines and a ``'\\n'`` joiner
    (pinned by test_newline_line_unit). Returns one audit row per doc:
    n_lines, n_removed, cleaned length + md5."""
    boiler = (
        lines.filter(F.col("line") != "")
        .groupBy("line")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("line", F.lit(1).alias("__boiler"))
    )
    # broadcast MARKER join (not anti): one pass then ONE doc_id groupBy
    # computes audit counts and reassembly together — no separate
    # base/clean relations, no documents-anchor join (every doc yields
    # >= 1 line, blank text included, so the groupBy covers all docs;
    # collect_list drops the NULL structs of boilerplate lines)
    marked = lines.join(F.broadcast(boiler), "line", "left")
    kept_struct = F.when(
        F.col("__boiler").isNull(), F.struct("line_no", "line")
    )
    ct = F.array_join(
        F.transform(F.array_sort(F.col("__ls")), lambda s: s["line"]), joiner
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.count("__boiler").cast("long").alias("n_removed"),
            F.collect_list(kept_struct).alias("__ls"),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_removed",
            F.length(ct).cast("long").alias("clean_n_chars"),
            F.md5(ct).alias("clean_md5"),
        )
    )


def boilerplate_strip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip corpus-frequent lines from every doc; audit per doc.

    Plan: one map-side-combined shuffle counts distinct docs per line;
    the >=threshold sliver is BROADCAST as a marker join; ONE doc-grain
    groupBy computes the audit and the order-preserving reassembly
    together (see strip_frequent_lines). Docs whose every line is
    boilerplate survive with empty cleaned text."""
    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return strip_frequent_lines(_doc_lines(docs))


BOILERPLATE_STRIP_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_sql_tokens()} AS t FROM documents
),
dims AS (
  SELECT doc_id, t, CAST(ceil(len(t) / {float(_LINE_TOKENS)}) AS BIGINT) AS nl
  FROM toks
),
lines AS (
  SELECT doc_id, g AS line_no,
         array_to_string(t[(g * {_LINE_TOKENS} + 1):(g * {_LINE_TOKENS} + {_LINE_TOKENS})], ' ') AS line
  FROM (SELECT doc_id, t, unnest(range(0, nl)) AS g FROM dims)
),
boiler AS (
  SELECT line FROM lines WHERE line <> ''
  GROUP BY line HAVING COUNT(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}
),
kept AS (
  SELECT * FROM lines WHERE line NOT IN (SELECT line FROM boiler)
),
clean AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(line, ' ' ORDER BY line_no) AS ct
  FROM kept GROUP BY doc_id
),
base AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT d.doc_id,
       CAST(b.n_lines AS BIGINT) AS n_lines,
       CAST(b.n_lines - COALESCE(c.n_kept, 0) AS BIGINT) AS n_removed,
       CAST(length(COALESCE(c.ct, '')) AS BIGINT) AS clean_n_chars,
       md5(COALESCE(c.ct, '')) AS clean_md5
FROM documents d
JOIN base b USING (doc_id)
LEFT JOIN clean c USING (doc_id)
"""


# ---------------------------------------------------------------------------
# token_budget_sample
# ---------------------------------------------------------------------------

_BUDGET_DENOM = 4  # per-source budget = total source tokens / 4


def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source token-quota sample (budget = 1/4 of the
    source's tokens; md5(doc_id) order; straddling doc INCLUDED —
    selection is cum_before < budget)."""
    from ..functions import text as TX

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        TX.token_count("text").cast("long").alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    )
    budgets = docs.groupBy("source").agg(
        F.expr(f"sum(n_tok) div {_BUDGET_DENOM}").cast("long").alias("budget")
    )
    cum = grouped_running_sum(
        docs, ["source"], ["k", "doc_id"], "n_tok", out_col="cum_before"
    )
    # eqNullSafe: a NULL source is one group to groupBy/windows and must
    # survive the budget attach (oracle uses IS NOT DISTINCT FROM)
    b = F.broadcast(budgets.withColumnRenamed("source", "__bsrc"))
    return (
        cum.join(b, F.col("source").eqNullSafe(F.col("__bsrc")))
        .select(
            "doc_id",
            "source",
            "n_tok",
            "cum_before",
            "budget",
            (F.col("cum_before") < F.col("budget")).alias("selected"),
        )
    )


def _tbs_sql() -> str:
    from .extensions import _sql_n_tokens

    return f"""
WITH d AS (
  SELECT doc_id, source,
         CAST({_sql_n_tokens()} AS BIGINT) AS n_tok,
         md5(CAST(doc_id AS VARCHAR)) AS k
  FROM documents
),
b AS (
  SELECT source, CAST(SUM(n_tok) // {_BUDGET_DENOM} AS BIGINT) AS budget
  FROM d GROUP BY source
),
c AS (
  SELECT doc_id, source, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY k, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum_before
  FROM d
)
SELECT c.doc_id, c.source, c.n_tok, c.cum_before, b.budget,
       c.cum_before < b.budget AS selected
FROM c JOIN b ON c.source IS NOT DISTINCT FROM b.source
"""


TOKEN_BUDGET_SAMPLE_SQL = _tbs_sql()


def dedup_lines_within_doc(
    lines: DataFrame, joiner: str = " "
) -> DataFrame:
    """Intra-document line dedup — the WITHIN-doc half of RefinedWeb
    line cleaning (strip_frequent_lines is the across-corpus half):
    keep each doc's FIRST occurrence of every line, reassemble in
    original order, audit. One doc-grain shuffle; first-occurrence
    selection and reassembly are array algebra inside the aggregate
    (no second window or self-join)."""
    w_first = F.array_sort(F.collect_list(F.struct("line_no", "line")))
    # scan the sorted (line_no, line) structs once, keeping positions
    # whose line has not appeared earlier — aggregate() threads the
    # (seen_lines, kept_structs) state through JVM expressions
    kept = F.aggregate(
        w_first,
        F.struct(
            F.array().cast("array<string>").alias("seen"),
            F.array().cast("array<struct<line_no:int,line:string>>").alias("keep"),
        ),
        lambda acc, s: F.struct(
            F.when(
                F.array_contains(acc["seen"], s["line"]), acc["seen"]
            ).otherwise(F.array_append(acc["seen"], s["line"])).alias("seen"),
            F.when(
                F.array_contains(acc["seen"], s["line"]), acc["keep"]
            ).otherwise(F.array_append(acc["keep"], s)).alias("keep"),
        ),
    )["keep"]
    return (
        lines.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            kept.alias("__k"),
        )
        .select(
            "doc_id",
            "n_lines",
            (F.col("n_lines") - F.size("__k")).cast("long").alias("n_removed"),
            F.length(
                F.array_join(F.transform("__k", lambda s: s["line"]), joiner)
            ).cast("long").alias("clean_n_chars"),
            F.md5(
                F.array_join(F.transform("__k", lambda s: s["line"]), joiner)
            ).alias("clean_md5"),
        )
    )


def intradoc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of dedup_lines_within_doc over the fixture's
    aligned token-chunk lines — registered r08 (oracle below,
    cross-checked in tests)."""
    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return dedup_lines_within_doc(_doc_lines(docs))


INTRADOC_LINE_DEDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_sql_tokens()} AS t FROM documents
),
dims AS (
  SELECT doc_id, t, CAST(ceil(len(t) / {float(_LINE_TOKENS)}) AS BIGINT) AS nl
  FROM toks
),
lines AS (
  SELECT doc_id, g AS line_no,
         array_to_string(t[(g * {_LINE_TOKENS} + 1):(g * {_LINE_TOKENS} + {_LINE_TOKENS})], ' ') AS line
  FROM (SELECT doc_id, t, unnest(range(0, nl)) AS g FROM dims)
),
flagged AS (
  SELECT doc_id, line_no, line,
         row_number() OVER (PARTITION BY doc_id, line ORDER BY line_no) AS occ
  FROM lines
),
clean AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(line, ' ' ORDER BY line_no) AS ct
  FROM flagged WHERE occ = 1 GROUP BY doc_id
),
base AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT b.doc_id,
       CAST(b.n_lines AS BIGINT) AS n_lines,
       CAST(b.n_lines - c.n_kept AS BIGINT) AS n_removed,
       CAST(length(c.ct) AS BIGINT) AS clean_n_chars,
       md5(c.ct) AS clean_md5
FROM base b JOIN clean c USING (doc_id)
"""


# ---------------------------------------------------------------------------
# media_resize_checksum — registered r08 (written in r07; the oracle is
# gate-exact, cross-checked by tests/test_curation10.py)
# ---------------------------------------------------------------------------

_RSZ_H, _RSZ_W = 3, 4  # fixed output geometry of the registered resize

_MEDIA_RESIZE_SCHEMA = (
    "doc_id BIGINT, out_h BIGINT, out_w BIGINT, "
    "sum_r BIGINT, sum_g BIGINT, sum_b BIGINT, wsum BIGINT"
)


def media_resize_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth BMP → ``operators.multimodal.resize_images`` with the
    DEFAULT decoder → exact integer stats of the RESIZED pixels.

    Exercises the real operator composition (encode → decode → index-
    grid resize) across Arrow stages, not a private reimplementation:
    stage 1 synthesizes payloads, stage 2 IS resize_images, stage 3
    reduces the resized buffers. All three are map-only; the oracle
    replays the nearest-neighbor index math on the pixel formula."""
    import numpy as np

    from ..operators.multimodal import encode_bmp, resize_images

    a_id, a_y, a_x, a_c = _PX

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 4 + doc_id % 5, 3 + doc_id % 4
                y = np.arange(h).reshape(h, 1, 1)
                x = np.arange(w).reshape(1, w, 1)
                c = np.arange(3).reshape(1, 1, 3)
                img = ((doc_id * a_id + y * a_y + x * a_x + c * a_c) % 256).astype(
                    np.uint8
                )
                rows.append((doc_id, encode_bmp(img)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yo = np.arange(_RSZ_H).reshape(_RSZ_H, 1, 1)
        xo = np.arange(_RSZ_W).reshape(1, _RSZ_W, 1)
        c = np.arange(3).reshape(1, 1, 3)
        wt = (yo * _RSZ_W + xo + 1) * (c + 1)
        for pdf in batches:
            rows = []
            for doc_id, oh, ow, buf in zip(
                pdf["doc_id"], pdf["out_h"], pdf["out_w"], pdf["pixels"]
            ):
                px = np.frombuffer(bytes(buf), np.uint8).reshape(
                    int(oh), int(ow), 3
                ).astype(np.int64)
                rows.append(
                    (
                        int(doc_id), int(oh), int(ow),
                        int(px[:, :, 0].sum()), int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()), int((px * wt).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "out_h", "out_w", "sum_r", "sum_g", "sum_b", "wsum"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    payloads = docs.mapInPandas(synth, "doc_id BIGINT, payload BINARY")
    resized = resize_images(payloads, _RSZ_H, _RSZ_W)
    return resized.mapInPandas(stats, _MEDIA_RESIZE_SCHEMA)


# nearest-neighbor source index: y = min(yo*h // out_h, h-1) — identical
# integer math to resize_images' index grid
MEDIA_RESIZE_CHECKSUM_SQL = f"""
WITH dims AS (
  SELECT doc_id, {_IMG_W} AS w, {_IMG_H} AS h FROM documents
),
cells AS (
  SELECT doc_id, w, h, unnest(range(0, {_RSZ_H} * {_RSZ_W})) AS g FROM dims
),
chans AS (SELECT c FROM generate_series(0, 2) AS s(c)),
vals AS (
  SELECT doc_id, c,
         (doc_id * {_PX[0]}
          + least((g // {_RSZ_W}) * h // {_RSZ_H}, h - 1) * {_PX[1]}
          + least((g % {_RSZ_W}) * w // {_RSZ_W}, w - 1) * {_PX[2]}
          + c * {_PX[3]}) % 256 AS v,
         ((g // {_RSZ_W}) * {_RSZ_W} + (g % {_RSZ_W}) + 1) * (c + 1) AS wt
  FROM cells CROSS JOIN chans
)
SELECT doc_id,
       CAST({_RSZ_H} AS BIGINT) AS out_h,
       CAST({_RSZ_W} AS BIGINT) AS out_w,
       CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
       CAST(SUM(v * wt) AS BIGINT) AS wsum
FROM vals
GROUP BY doc_id
"""


CURATION10_QUERIES = {
    "media_decode_stats": media_decode_stats,
    "boilerplate_strip_audit": boilerplate_strip_audit,
    "token_budget_sample": token_budget_sample,
    # registered r08 (written + oracle-exact in r07; window discipline)
    "media_resize_checksum": media_resize_checksum,
    "intradoc_line_dedup": intradoc_line_dedup,
}

CURATION10_ORACLE_SQL = {
    "media_decode_stats": MEDIA_DECODE_STATS_SQL,
    "boilerplate_strip_audit": BOILERPLATE_STRIP_SQL,
    "token_budget_sample": TOKEN_BUDGET_SAMPLE_SQL,
    "media_resize_checksum": MEDIA_RESIZE_CHECKSUM_SQL,
    "intradoc_line_dedup": INTRADOC_LINE_DEDUP_SQL,
}
