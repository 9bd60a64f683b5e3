"""Round-8 curation additions (VERDICT r07 items 3 and 6, plus the
round-8 second wave: real audio/video decode and the row-group layout
planner that operationalizes this round's scaling finding).

``media_decode_png_stats`` — the engine decodes a genuinely COMPRESSED
format in-container: documents drive the same deterministic pixel
formula as ``media_decode_stats`` (plans/curation10.py), but encoded as
8-bit RGB PNG via stdlib zlib with a DIFFERENT adaptive filter per row
(``(doc_id + y) % 5`` — None/Sub/Up/Average/Paeth all load-bearing),
then decoded by the DEFAULT ``decode_media`` (chunk walk + CRC check +
inflate + per-row un-filtering, ``operators/multimodal.py``) and
reduced to exact integer channel statistics. The oracle recomputes the
statistics from the pixel formula alone, so any un-filtering defect —
wrong predictor, missed left/up dependency, modular-arithmetic slip —
breaks the hash on the rows whose filters exercise it.

``boilerplate_strip_newline`` — the PRODUCTION line unit of
``strip_frequent_lines`` given a driver row: real multiline text is
synthesized in-plan (the fixture corpus is single-line) by joining each
doc's aligned token chunks with ``'\\n'``, and the query then runs the
production path verbatim — ``posexplode(split(text, '\\n'))`` lines, a
``'\\n'`` reassembly joiner — per VERDICT r07 item 3. The registered
``boilerplate_strip_audit`` keeps covering the parameterized chunk
unit; this covers the newline unit end-to-end.

Scale notes: PNG decode is a map-only Arrow pass (identical plan shape
to media_decode_stats — decode never crosses a partition boundary; at
100 TB the payload column rides parquet BYTE_ARRAY pages and the
per-task working set is one Arrow batch of images). The newline strip
has the same plan as the chunk strip: ONE map-side-combined shuffle for
line document-frequency, a broadcast marker join, ONE doc-grain groupBy
for audit + reassembly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table, spread_for_python
from .curation10 import (
    _BOILER_MIN_DOCS,
    _IMG_H,
    _IMG_W,
    _LINE_TOKENS,
    _MEDIA_STATS_SCHEMA,
    _PX,
    strip_frequent_lines,
)
from .extensions import _sql_tokens

# ---------------------------------------------------------------------------
# media_decode_png_stats
# ---------------------------------------------------------------------------

_PNG_STATS_SCHEMA = _MEDIA_STATS_SCHEMA.replace("fmt STRING, ", "")


def media_decode_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode (zlib, per-row adaptive filters) → REAL decode → exact
    stats, one Arrow batch pass. Row y of doc d is filtered with type
    ``(d + y) % 5``, so every PNG filter's inverse is exercised and
    pinned by the formula oracle."""
    from ..operators.multimodal import decode_media, encode_png, sniff_media_type

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
                payload = encode_png(
                    img, row_filters=[(doc_id + yy) % 5 for yy in range(h)]
                )
                dec = decode_media(payload, sniff_media_type(payload))
                dec = dec.astype(np.int64)
                wt = (y * w + x + 1) * (c + 1)
                rows.append(
                    (
                        doc_id,
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
                columns=["doc_id", "h", "w", "n_px", "sum_r", "sum_g", "sum_b", "wsum"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(run, _PNG_STATS_SCHEMA)


MEDIA_DECODE_PNG_STATS_SQL = f"""
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
# boilerplate_strip_newline
# ---------------------------------------------------------------------------


def boilerplate_strip_newline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The newline-unit production path of strip_frequent_lines, driven
    end-to-end: synthesize real multiline text (each doc's aligned
    10-token chunks joined by '\\n'), then split on '\\n'
    with posexplode and reassemble with the '\\n' joiner — the exact
    path production web text takes."""
    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    )
    k = _LINE_TOKENS
    nl = F.ceil(F.size("t") / F.lit(k)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda g: F.array_join(F.slice("t", g * k + 1, k), " "),
    )
    multiline = toks.select(
        "doc_id", F.array_join(chunks, "\n").alias("text_nl")
    )
    lines = multiline.select(
        "doc_id", F.posexplode(F.split("text_nl", "\n")).alias("line_no", "line")
    )
    return strip_frequent_lines(lines, joiner="\n")


# the chunks contain no '\n' (space-joined whitespace-split tokens), so
# the post-split line relation equals the chunk relation; the oracle
# computes it directly and joins the cleaned text with chr(10)
BOILERPLATE_STRIP_NEWLINE_SQL = f"""
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
         string_agg(line, chr(10) ORDER BY line_no) AS ct
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


CURATION11_QUERIES = {
    "media_decode_png_stats": media_decode_png_stats,
    "boilerplate_strip_newline": boilerplate_strip_newline,
}

CURATION11_ORACLE_SQL = {
    "media_decode_png_stats": MEDIA_DECODE_PNG_STATS_SQL,
    "boilerplate_strip_newline": BOILERPLATE_STRIP_NEWLINE_SQL,
}


# ---------------------------------------------------------------------------
# audio_decode_stats / video_frame_stats — round-8 second pair: with the
# pure-numpy 16-bit-PCM WAV and mono-Y4M decoders, the decode seam is
# real across ALL THREE modalities (image/audio/video). Same contract
# as media_decode_stats: deterministic synthetic signal from a small-
# integer formula, encode to the real on-disk format, decode with the
# DEFAULT decode_media, reduce to exact integer statistics; the oracle
# replays the formula, so any decode defect (endianness, channel
# de-interleave, frame framing) breaks the hash.
# ---------------------------------------------------------------------------

# s(doc_id, i, c) = ((doc_id*11 + i*17 + c*29) % 65536) - 32768  (int16)
_AU = (11, 17, 29)
_AUDIO_STATS_SCHEMA = (
    "doc_id BIGINT, n_samples BIGINT, n_ch BIGINT, rate BIGINT, "
    "sum_all BIGINT, wsum BIGINT"
)


def audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth int16 PCM (mono for even docs, stereo for odd; 40..46
    samples; rate 8000+100·(doc_id%5)) → encode_wav → REAL default
    decode → exact sums. wsum = Σ s·(i+1)·(c+1) catches channel
    de-interleave and sample-order defects the plain sum misses."""
    from ..operators.multimodal import (
        decode_media,
        encode_wav,
        sniff_media_type,
        wav_sample_rate,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        a_id, a_i, a_c = _AU
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 40 + doc_id % 7
                ch = 1 + doc_id % 2
                rate = 8000 + 100 * (doc_id % 5)
                i = np.arange(n).reshape(n, 1)
                c = np.arange(ch).reshape(1, ch)
                s = ((doc_id * a_id + i * a_i + c * a_c) % 65536 - 32768).astype(
                    np.int16
                )
                payload = encode_wav(s, rate=rate)
                dec = decode_media(payload, sniff_media_type(payload)).astype(
                    np.int64
                )
                wt = (i + 1) * (c + 1)
                rows.append(
                    (
                        doc_id,
                        dec.shape[0],
                        dec.shape[1],
                        wav_sample_rate(payload),
                        int(dec.sum()),
                        int((dec * wt).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "n_ch", "rate", "sum_all", "wsum"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(run, _AUDIO_STATS_SCHEMA)


AUDIO_DECODE_STATS_SQL = f"""
WITH dims AS (
  SELECT doc_id, 40 + doc_id % 7 AS n, 1 + doc_id % 2 AS nch,
         8000 + 100 * (doc_id % 5) AS rate
  FROM documents
),
cells AS (
  SELECT doc_id, n, nch, rate, unnest(range(0, n * nch)) AS g FROM dims
),
vals AS (
  SELECT doc_id, n, nch, rate,
         (doc_id * {_AU[0]} + (g // nch) * {_AU[1]}
          + (g % nch) * {_AU[2]}) % 65536 - 32768 AS s,
         ((g // nch) + 1) * ((g % nch) + 1) AS wt
  FROM cells
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(nch AS BIGINT) AS n_ch,
       CAST(rate AS BIGINT) AS rate,
       CAST(SUM(s) AS BIGINT) AS sum_all,
       CAST(SUM(s * wt) AS BIGINT) AS wsum
FROM vals
GROUP BY doc_id, n, nch, rate
"""


# v(doc_id, t, y, x) = (doc_id*5 + t*19 + y*23 + x*3) % 256
_VID = (5, 19, 23, 3)
_VIDEO_EVERY_N = 2  # sample every 2nd frame, the sample_frames contract

_VIDEO_STATS_SCHEMA = (
    "doc_id BIGINT, frame_idx BIGINT, f_sum BIGINT, f_wsum BIGINT"
)


def video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth (T, H, W) luma video → encode_y4m → REAL default decode →
    every-2nd-frame sampling → exact per-frame sums. One row per
    sampled frame (the fan-out batch shape real frame extraction has);
    f_wsum = Σ v·(y·w+x+1) catches frame-framing and row-order
    defects."""
    from ..operators.multimodal import decode_media, encode_y4m, sniff_media_type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        a_id, a_t, a_y, a_x = _VID
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                t_n, h, w = 4 + doc_id % 4, 3 + doc_id % 3, 4 + doc_id % 3
                t = np.arange(t_n).reshape(t_n, 1, 1)
                y = np.arange(h).reshape(1, h, 1)
                x = np.arange(w).reshape(1, 1, w)
                vid = ((doc_id * a_id + t * a_t + y * a_y + x * a_x) % 256).astype(
                    np.uint8
                )
                payload = encode_y4m(vid)
                dec = decode_media(payload, sniff_media_type(payload)).astype(
                    np.int64
                )
                wt = (y * w + x + 1).reshape(h, w)
                for idx in range(0, dec.shape[0], _VIDEO_EVERY_N):
                    rows.append(
                        (
                            doc_id,
                            idx,
                            int(dec[idx].sum()),
                            int((dec[idx] * wt).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "f_sum", "f_wsum"]
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(run, _VIDEO_STATS_SCHEMA)


VIDEO_FRAME_STATS_SQL = f"""
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 4 AS tn, 3 + doc_id % 3 AS h, 4 + doc_id % 3 AS w
  FROM documents
),
frames AS (
  SELECT doc_id, h, w, unnest(range(0, tn)) AS t FROM dims
  WHERE tn > 0
),
sampled AS (
  SELECT * FROM frames WHERE t % {_VIDEO_EVERY_N} = 0
),
cells AS (
  SELECT doc_id, h, w, t, unnest(range(0, h * w)) AS g FROM sampled
),
vals AS (
  SELECT doc_id, t,
         (doc_id * {_VID[0]} + t * {_VID[1]} + (g // w) * {_VID[2]}
          + (g % w) * {_VID[3]}) % 256 AS v,
         (g // w) * w + (g % w) + 1 AS wt
  FROM cells
)
SELECT doc_id,
       CAST(t AS BIGINT) AS frame_idx,
       CAST(SUM(v) AS BIGINT) AS f_sum,
       CAST(SUM(v * wt) AS BIGINT) AS f_wsum
FROM vals
GROUP BY doc_id, t
"""


CURATION11_QUERIES.update(
    {
        "audio_decode_stats": audio_decode_stats,
        "video_frame_stats": video_frame_stats,
    }
)

CURATION11_ORACLE_SQL.update(
    {
        "audio_decode_stats": AUDIO_DECODE_STATS_SQL,
        "video_frame_stats": VIDEO_FRAME_STATS_SQL,
    }
)


# ---------------------------------------------------------------------------
# row_group_layout_plan — the prescription step for the round-8 scaling
# finding (SCALING.md round-8): scan parallelism equals the row-group
# count, independent of file count, so the WRITER must size row groups
# to ~task volume. This op computes that prescription per source from
# corpus stats: rows per group = target group bytes / average doc
# bytes (floored), groups = ceil(docs / rows-per-group) = the scan
# parallelism a rewrite of that source will have. Complements
# compact_shards (which decides what merges into which FILE — the
# orthogonal knob, per the measured row-groups-vs-files table).
# Pure integer arithmetic, one map-side-combined groupBy.
# ---------------------------------------------------------------------------

_RG_TARGET_BYTES = 2000  # in-band at fixture scale: several groups/source
_RG_MIN_ROWS = 4


def row_group_layout_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_bytes"),
    )
    avg = F.expr("n_bytes div n_docs")
    rpg = F.greatest(
        F.lit(_RG_MIN_ROWS).cast("long"),
        F.expr(f"{_RG_TARGET_BYTES} div (n_bytes div n_docs)"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_bytes",
        avg.alias("avg_doc_bytes"),
        rpg.alias("rows_per_group"),
        F.expr(
            f"(n_docs + greatest({_RG_MIN_ROWS}, "
            f"{_RG_TARGET_BYTES} div (n_bytes div n_docs)) - 1) div "
            f"greatest({_RG_MIN_ROWS}, "
            f"{_RG_TARGET_BYTES} div (n_bytes div n_docs))"
        ).cast("long").alias("n_row_groups"),
    )


ROW_GROUP_LAYOUT_PLAN_SQL = f"""
WITH agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS n_bytes
  FROM documents GROUP BY source
),
plan AS (
  SELECT source, n_docs, n_bytes,
         n_bytes // n_docs AS avg_doc_bytes,
         greatest({_RG_MIN_ROWS}, {_RG_TARGET_BYTES} // (n_bytes // n_docs))
           AS rows_per_group
  FROM agg
)
SELECT source, n_docs, n_bytes,
       CAST(avg_doc_bytes AS BIGINT) AS avg_doc_bytes,
       CAST(rows_per_group AS BIGINT) AS rows_per_group,
       CAST((n_docs + rows_per_group - 1) // rows_per_group AS BIGINT)
         AS n_row_groups
FROM plan
"""


CURATION11_QUERIES["row_group_layout_plan"] = row_group_layout_plan
CURATION11_ORACLE_SQL["row_group_layout_plan"] = ROW_GROUP_LAYOUT_PLAN_SQL


# ---------------------------------------------------------------------------
# gzip_roundtrip_stats — container decompression seam: real corpora
# arrive as gzip shards, so the engine must read compressed payloads
# without a staging rewrite. The query compresses each doc's utf-8
# bytes in one Arrow stage (deterministic content; the gzip header
# mtime is pinned to 0) and a SECOND Arrow stage sniffs + decompresses
# with operators.multimodal.decompress_payload and reduces to stats of
# the DECOMPRESSED text. The oracle computes the same stats from the
# plain text column — so any corruption across the compress→decompress
# round trip (charset, truncation, framing) breaks the md5/hash. The
# compressed byte COUNT is deliberately NOT in the result: deflate
# output depends on the zlib build and would make the result
# environment-dependent.
# ---------------------------------------------------------------------------


def gzip_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import gzip

    from ..operators.multimodal import decompress_payload, sniff_media_type

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        gzip.compress(str(t).encode("utf-8"), mtime=0)
                        for t in pdf["text"]
                    ],
                }
            )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = decompress_payload(bytes(payload), sniff_media_type(bytes(payload)))
                text = raw.decode("utf-8")
                toks = [t for t in text.strip().split() if t]
                rows.append(
                    (
                        int(doc_id),
                        len(text),
                        len(toks),
                        hashlib.md5(raw).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_chars", "n_tok", "text_md5"]
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    packed = docs.mapInPandas(pack, "doc_id BIGINT, payload BINARY")
    return packed.mapInPandas(
        unpack, "doc_id BIGINT, n_chars BIGINT, n_tok BIGINT, text_md5 STRING"
    )


# n_tok mirrors the engine's Python str.split() EXACTLY: count
# NON-EMPTY tokens after splitting on runs of Python's whitespace set.
# The earlier trim()+'\s+' form diverged two ways (ADVICE r08): it
# counted empty boundary tokens ("\tA B\n" scored 4 vs split()'s 2),
# and RE2's \s is [\t\n\f\r ] so \v/\x1c-\x1f/U+0085/U+00A0/Unicode
# spaces split on the Python side only.  The explicit class below is
# the full str.isspace() set (fuzz-pinned equal to split() across 208
# randomized mixed-whitespace strings in tests/test_curation11.py).
GZIP_ROUNDTRIP_STATS_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(list_filter(regexp_split_to_array(text,
              '[\\t-\\r \\x{001C}-\\x{001F}\\x{0085}\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+'),
            t -> t <> '')) AS BIGINT) AS n_tok,
       md5(text) AS text_md5
FROM documents
"""


CURATION11_QUERIES["gzip_roundtrip_stats"] = gzip_roundtrip_stats
CURATION11_ORACLE_SQL["gzip_roundtrip_stats"] = GZIP_ROUNDTRIP_STATS_SQL


# ---------------------------------------------------------------------------
# kcenter_coreset — diversity-aware data selection (greedy k-center /
# farthest-point coreset, the classic 2-approximation): pick the
# min-vec_id seed, then k−1 times pick the point FARTHEST (max-min
# squared distance) from everything picked so far. The selection is the
# coreset a diversity-sampling stage feeds to training-data mixing.
#
# EXACTNESS: embeddings are quantized to integer fixed point
# (floor(x·10⁴) — the float→double promotion and multiply are
# IEEE-identical across engines, floor has no midpoint), so every
# distance is an exact BIGINT and the argmax (ties → smaller vec_id)
# is engine-independent. The oracle unrolls the k rounds as chained
# CTEs over the same integer math.
#
# Scale shape: k passes over the embedding table; each round is one
# map (distance to ≤ k broadcast-inlined centers) + a global top-1 —
# the k driver collects are single rows (same bounded posture as the
# BPE/unigram learn loops). At 100 TB this is the standard greedy
# k-center schedule; for k beyond a handful, switch to the bucketed
# ANN machinery for candidate pruning.
# ---------------------------------------------------------------------------

_KC_K = 5
_KC_Q = 10000


def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.expr(
                f"transform(embedding, x -> CAST(floor(x * {_KC_Q}.0) AS BIGINT))"
            ).alias("q"),
        )
        .localCheckpoint(eager=True)  # k consumers: one scan per round
    )

    def dist_expr(center: list[int]):
        lits = ",".join(f"{int(v)}L" for v in center)
        return F.expr(
            f"aggregate(zip_with(q, array({lits}), (a, b) -> (a - b) * (a - b)), "
            "0L, (acc, x) -> acc + x)"
        )

    seed = emb.orderBy("vec_id").limit(1).collect()[0]
    picks = [(1, int(seed["vec_id"]), 0)]
    mind = dist_expr(list(seed["q"]))
    for rnd in range(2, _KC_K + 1):
        top = (
            emb.withColumn("d", mind)
            .orderBy(F.desc("d"), "vec_id")
            .limit(1)
            .collect()[0]
        )
        picks.append((rnd, int(top["vec_id"]), int(top["d"])))
        mind = F.least(mind, dist_expr(list(top["q"])))
    return spark.createDataFrame(
        picks, "pick INT, vec_id BIGINT, dist_sq BIGINT"
    )


def _kcenter_sql() -> str:
    dist = (
        "CAST(list_sum(list_transform(range(1, len(m.qe) + 1), "
        "i -> (m.qe[i] - c.qe[i]) * (m.qe[i] - c.qe[i]))) AS BIGINT)"
    )
    parts = [
        f"""WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(x * {_KC_Q}.0) AS BIGINT)) AS qe
  FROM embeddings
),
c1 AS (SELECT vec_id, qe FROM q ORDER BY vec_id LIMIT 1),
m1 AS (
  SELECT m.vec_id, m.qe, {dist} AS d
  FROM q m, c1 c
)"""
    ]
    for r in range(2, _KC_K + 1):
        parts.append(
            f"""c{r} AS (SELECT vec_id, qe, d FROM m{r - 1} ORDER BY d DESC, vec_id LIMIT 1),
m{r} AS (
  SELECT m.vec_id, m.qe, LEAST(m.d, {dist}) AS d
  FROM m{r - 1} m, c{r} c
)"""
        )
        # (the last m{K} is unused by the SELECT; DuckDB prunes it)
    selects = ["SELECT 1 AS pick, vec_id, CAST(0 AS BIGINT) AS dist_sq FROM c1"] + [
        f"SELECT {r} AS pick, vec_id, CAST(d AS BIGINT) AS dist_sq FROM c{r}"
        for r in range(2, _KC_K + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


KCENTER_CORESET_SQL = _kcenter_sql()


# r09 registration queue (window discipline: the r08 window is exactly
# 10 new + the full 40-query r03 drain; an 11th registration would push
# one r03 row out). Oracle-exact — verified against the chained-CTE
# twin in tests/test_curation11.py and a one-off gate run at sf0.01 —
# so r09 registration is a two-line edit:
CURATION11_QUERIES["kcenter_coreset"] = kcenter_coreset
CURATION11_ORACLE_SQL["kcenter_coreset"] = KCENTER_CORESET_SQL


# ---------------------------------------------------------------------------
# jpeg_decode_stats — r09 registration queue (window discipline, same
# as kcenter_coreset). The LAST image-codec stub retired: baseline JPEG
# decode (operators/jpeg.py — marker walk, canonical Huffman, DC
# prediction, dequant, inverse zig-zag, IDCT) driven end-to-end on
# synthesized payloads whose decode is EXACTLY predictable: the encoder
# writes DC-ONLY quantized coefficient blocks (dc a multiple of 8), so
# every decoded 8×8 block is the flat value dc/8 + 128 and the oracle
# replays the per-block formula in integer SQL. The AC/entropy general
# path is pinned by tests/test_jpeg.py (exact per-coefficient round
# trip); this query makes the Huffman+prediction+IDCT pipeline a
# driver-checked production body.
# ---------------------------------------------------------------------------

# per-block flat value: p(doc, b) = (doc_id*13 + b*29) % 128 + 64
_JP = (13, 29)


def jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.jpeg import encode_jpeg_gray
    from ..operators.multimodal import decode_media, sniff_media_type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        a_id, a_b = _JP
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                by, bx = 1 + doc_id % 2, 1 + doc_id % 3
                coefs = np.zeros((by, bx, 8, 8), dtype=np.int64)
                for b in range(by * bx):
                    v = (doc_id * a_id + b * a_b) % 128 - 64
                    coefs[b // bx, b % bx, 0, 0] = v * 8
                payload = encode_jpeg_gray(
                    coef_blocks=coefs, shape=(by * 8, bx * 8)
                )
                dec = decode_media(payload, sniff_media_type(payload)).astype(
                    np.int64
                )
                bw = np.arange(by * bx).reshape(by, bx) + 1  # block weight b+1
                wt = np.repeat(np.repeat(bw, 8, axis=0), 8, axis=1)
                rows.append(
                    (
                        doc_id,
                        dec.shape[0],
                        dec.shape[1],
                        dec.size,
                        int(dec.sum()),
                        int((dec * wt).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "h", "w", "n_px", "sum_all", "wsum"]
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, h BIGINT, w BIGINT, n_px BIGINT, "
        "sum_all BIGINT, wsum BIGINT",
    )


JPEG_DECODE_STATS_SQL = f"""
WITH dims AS (
  SELECT doc_id, 1 + doc_id % 2 AS by, 1 + doc_id % 3 AS bx FROM documents
),
blocks AS (
  SELECT doc_id, by, bx, unnest(range(0, by * bx)) AS b FROM dims
),
vals AS (
  SELECT doc_id, by, bx, b,
         (doc_id * {_JP[0]} + b * {_JP[1]}) % 128 + 64 AS p
  FROM blocks
)
SELECT doc_id,
       CAST(by * 8 AS BIGINT) AS h,
       CAST(bx * 8 AS BIGINT) AS w,
       CAST(by * bx * 64 AS BIGINT) AS n_px,
       CAST(SUM(64 * p) AS BIGINT) AS sum_all,
       CAST(SUM(64 * p * (b + 1)) AS BIGINT) AS wsum
FROM vals
GROUP BY doc_id, by, bx
"""


# ---------------------------------------------------------------------------
# audio_frame_features — r09 registration queue. The audio analog of
# media_resize_checksum: real operator COMPOSITION over the decoded
# samples (decode → fixed framing → per-frame features), not just a
# decode checksum. Per doc: mono 16-bit PCM synthesized from the _AU
# formula, encode_wav → DEFAULT decode → 16-sample frames → per-frame
# energy (Σ s², exact BIGINT) and zero-crossing count (s_i·s_{i−1} < 0
# within the frame — the integer-exact ZCR definition both engines can
# replay). One row per (doc, frame); map-only Arrow pass.
# ---------------------------------------------------------------------------

_AF_FRAME = 16  # samples per analysis frame


def audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_media, encode_wav, sniff_media_type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        a_id, a_i, _ = _AU
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 32 + 16 * (doc_id % 3)  # 2..4 complete frames
                i = np.arange(n)
                s = ((doc_id * a_id + i * a_i) % 65536 - 32768).astype(np.int16)
                payload = encode_wav(s, rate=16000)
                dec = decode_media(payload, sniff_media_type(payload))
                mono = dec[:, 0].astype(np.int64)
                frames = mono.reshape(-1, _AF_FRAME)
                energy = (frames * frames).sum(axis=1)
                zcr = (frames[:, 1:] * frames[:, :-1] < 0).sum(axis=1)
                for f in range(frames.shape[0]):
                    rows.append((doc_id, f, int(energy[f]), int(zcr[f])))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "energy", "zcr"]
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run, "doc_id BIGINT, frame_idx BIGINT, energy BIGINT, zcr BIGINT"
    )


AUDIO_FRAME_FEATURES_SQL = f"""
WITH dims AS (
  SELECT doc_id, 32 + 16 * (doc_id % 3) AS n FROM documents
),
cells AS (
  SELECT doc_id, unnest(range(0, n)) AS i FROM dims
),
vals AS (
  SELECT doc_id, i, i // {_AF_FRAME} AS f,
         (doc_id * {_AU[0]} + i * {_AU[1]}) % 65536 - 32768 AS s,
         CASE WHEN i % {_AF_FRAME} = 0 THEN NULL
              ELSE (doc_id * {_AU[0]} + (i - 1) * {_AU[1]}) % 65536 - 32768
         END AS sp
  FROM cells
)
SELECT doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(SUM(s * s) AS BIGINT) AS energy,
       CAST(SUM(CASE WHEN s * sp < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zcr
FROM vals
GROUP BY doc_id, f
"""


# ---------------------------------------------------------------------------
# image_blockhash_neardup — r09 registration queue. Perceptual image
# near-dup detection (aHash/blockhash family) composed over the REAL
# decode path, exact integers end-to-end so the oracle can replay it:
#
#   decode (BMP) → grayscale (r+g+b)//3 → 4×4 grid of 4×4-pixel block
#   means (integer //16) → 4-bit quantization (mean//16) → four 16-bit
#   BANDS of 4 packed nibbles → banded self-join (the simhash/LSH
#   OR-amplification posture: candidate pairs share ≥1 band bucket,
#   near-dups keep ≥ _IBH_MIN_BANDS) — never all-pairs.
#
# Synthesis: even docs carry their pair's base image, odd docs the same
# image with ONE block's pixels shifted ±16 — a true near-dup differs
# in exactly one nibble, lands with its partner in 3 of 4 bands, and
# unrelated docs collide only at the ~1/16⁴ per-band rate because each
# block's value band is an independent multiplicative-hash nibble
# (pixels stay in [16h, 16h+15+2+3]: NO mod-256 wraparound, so the
# block mean carries h exactly — the first design wrapped and every
# doc's nibbles collapsed to ~8, degenerating the banding into
# all-pairs; measured at sf0.01: 20 954 pairs with the wrapped linear
# formula → 264 after the no-wrap squared-congruential fix, 250 of
# them the planted ones).
# ---------------------------------------------------------------------------

_IBH_SIZE = 16       # image is 16×16; blocks are a 4×4 grid of 4×4 px
_IBH_MIN_BANDS = 3   # pair survives with >= this many matching bands
# (a planted near-dup differs in exactly ONE block, so it always
# matches exactly 3 of 4 bands; >=3 cuts the sf1 chance tail 372 200 →
# 96 259 pairs while keeping all 25 000 planted. The residual tail is a
# fixture artifact of the quadratic mix over key-shifted copies — what
# matters for scale is the BUCKET bound, and that holds: max 74 docs
# per (band, value) bucket at sf1, 3.3M bounded candidate pairs from
# 50k docs, never all-pairs.)
_IBH_MIX = 131  # per-block offset in the squared-congruential mix


def image_blockhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_media, encode_bmp, sniff_media_type

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        sz = _IBH_SIZE
        y = np.arange(sz).reshape(sz, 1, 1)
        x = np.arange(sz).reshape(1, sz, 1)
        c = np.arange(3).reshape(1, 1, 3)
        blk = (y // 4) * 4 + (x // 4)  # (sz, sz, 1) block index
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                base = doc_id - (doc_id % 2)  # pair partner shares the base
                # squared congruential mix: LINEAR mixes (base·K + blk·k)
                # leave nibble DIFFERENCES constant across blocks for
                # nearby bases, re-collapsing the banding; squaring makes
                # the per-block difference depend on blk
                h = ((base + blk * _IBH_MIX + 7) ** 2 % 65521) // 4096  # 0..15
                img = (16 * h + (y % 4) * 2 + (x % 4) + c).astype(np.int64)
                if doc_id % 2:  # perturb ONE block of the odd partner
                    b = doc_id % 16
                    by, bx = (b // 4) * 4, (b % 4) * 4
                    hb = int(h[by, bx, 0])
                    img[by : by + 4, bx : bx + 4, :] += 16 if hb < 15 else -16
                payload = encode_bmp(img.astype(np.uint8))
                dec = decode_media(payload, sniff_media_type(payload)).astype(
                    np.int64
                )
                gray = dec.sum(axis=2) // 3
                means = gray.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(
                    16, 16
                ).sum(axis=1) // 16
                nibbles = means // 16  # 16 values in 0..15
                for band in range(4):
                    val = 0
                    for j in range(4):
                        val += int(nibbles[band * 4 + j]) * (16 ** j)
                    rows.append((doc_id, band, val))
            yield pd.DataFrame(rows, columns=["doc_id", "band", "val"])

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    # materialize the (tiny, 4-rows-per-doc) fingerprint relation ONCE:
    # the banded self-join otherwise evaluates the mapInPandas on BOTH
    # sides (plan-checked: 2× MapInPandas, no ReusedExchange) — i.e.
    # decodes every image twice, which is real money at corpus scale
    fp = docs.mapInPandas(
        fingerprint, "doc_id BIGINT, band INT, val BIGINT"
    ).localCheckpoint(eager=True)
    a = fp.alias("a")
    b = fp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("matched_bands"))
        .filter(F.col("matched_bands") >= _IBH_MIN_BANDS)
    )
    return pairs


# gray of the UNperturbed pixel is exactly 16h + (y%4)*2 + (x%4) + 1
# (channels are v, v+1, v+2 — no wraparound by construction), so the
# block mean is 16h + 5 and the nibble is h; the oracle replays that
# formula, with the odd doc's one perturbed block shifted ±16
IMAGE_BLOCKHASH_SQL = f"""
WITH cells AS (
  SELECT doc_id, doc_id - (doc_id % 2) AS base,
         g // {_IBH_SIZE} AS y, g % {_IBH_SIZE} AS x,
         ((g // {_IBH_SIZE}) // 4) * 4 + ((g % {_IBH_SIZE}) // 4) AS blk
  FROM (SELECT doc_id, unnest(range(0, {_IBH_SIZE * _IBH_SIZE})) AS g
        FROM documents)
),
gray AS (
  SELECT doc_id, blk,
         16 * ((((base + blk * {_IBH_MIX} + 7) * (base + blk * {_IBH_MIX} + 7)) % 65521) // 4096)
         + (y % 4) * 2 + (x % 4) + 1
         + CASE WHEN doc_id % 2 = 1 AND blk = doc_id % 16
                THEN CASE WHEN (((base + blk * {_IBH_MIX} + 7) * (base + blk * {_IBH_MIX} + 7)) % 65521) // 4096 < 15
                          THEN 16 ELSE -16 END
                ELSE 0 END AS gv
  FROM cells
),
nibs AS (
  SELECT doc_id, blk, (SUM(gv) // 16) // 16 AS nib
  FROM gray GROUP BY doc_id, blk
),
bands AS (
  SELECT doc_id, blk // 4 AS band,
         CAST(SUM(nib * power(16, blk % 4)) AS BIGINT) AS val
  FROM nibs GROUP BY doc_id, blk // 4
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS matched_bands
FROM bands a JOIN bands b
  ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {_IBH_MIN_BANDS}
"""

CURATION11_QUERIES["jpeg_decode_stats"] = jpeg_decode_stats
CURATION11_ORACLE_SQL["jpeg_decode_stats"] = JPEG_DECODE_STATS_SQL
CURATION11_QUERIES["audio_frame_features"] = audio_frame_features
CURATION11_ORACLE_SQL["audio_frame_features"] = AUDIO_FRAME_FEATURES_SQL
CURATION11_QUERIES["image_blockhash_neardup"] = image_blockhash_neardup
CURATION11_ORACLE_SQL["image_blockhash_neardup"] = IMAGE_BLOCKHASH_SQL
