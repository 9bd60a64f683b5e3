"""Round-9 curation additions (VERDICT r08 tasks 3-5): the dominant
real-web JPEG profile and the audio near-dup / compressed-audio arcs.

``jpeg420_decode_stats`` — baseline 4:2:0 JPEG (subsampled chroma +
restart intervals) driven end-to-end as a production body: per doc the
plan synthesizes DC-only quantized coefficient blocks from an integer
formula, writes a REAL interleaved-MCU 4:2:0 stream with a restart
marker between MCUs (``encode_jpeg_subsampled``), decodes it with the
default decoder (marker walk incl. DRI/RSTn, per-component MCU block
order, DC prediction reset at restarts, dequant, IDCT, 2x2 chroma
replication — ``operators/jpeg.py``), and reduces the (16, 32, 3)
YCbCr output to exact integer sums.  Position-WEIGHTED sums pin the
MCU block ORDER and the chroma upsample geometry, not just totals: a
swapped Y block or transposed chroma grid keeps y_sum but breaks
y_wsum.  The oracle replays the per-block closed form (IDCT of a lone
DC is dc/8 flat, so pixel = formula value exactly).

No reference-repo analog (the reference pipeline is tabular-only:
``etl/transform.py`` handles scalar observation rows); this extends
the engine's multimodal seam per the build brief.

Scale notes: a map-only Arrow pass over ``documents`` — same plan
shape as ``jpeg_decode_stats``/``media_decode_png_stats``; decode
never crosses a partition boundary, so at 100 TB parallelism follows
the row-group layout of the payload-bearing table, and per-task memory
is one Arrow batch of 16x32 images.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_table, spread_for_python

CURATION12_QUERIES: dict = {}
CURATION12_ORACLE_SQL: dict = {}

# ---------------------------------------------------------------------------
# jpeg420_decode_stats — REGISTERED r10 (window discipline: the
# r09 window is exactly 4 new + the 46-query r04 drain; a 5th new
# registration would push an r04 row out).  Oracle-exact — pinned by
# tests/test_curation12.py against the closed form — so registration is
# the usual two-line edit:
# ---------------------------------------------------------------------------

# flat per-block values (all kept in [64, 191]: no clamp, exact IDCT):
#   Y block b (raster 0..7 over a 2x4 grid):  (doc_id*13 + b*29) % 128 + 64
#   Cb block j (1x2 grid):                    (doc_id*7  + j*31) % 128 + 64
#   Cr block j (1x2 grid):                    (doc_id*11 + j*37) % 128 + 64
_J420 = {"y": (13, 29), "cb": (7, 31), "cr": (11, 37)}
_J420_H, _J420_W = 16, 32  # 1x2 MCUs of 16x16 -> restart fires mid-image


def jpeg420_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.jpeg import encode_jpeg_subsampled
    from ..operators.multimodal import decode_media, sniff_media_type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        h, w = _J420_H, _J420_W
        # position weights derived from the DECODED geometry, not the
        # formula: Y weighted by raster block index + 1, chroma by the
        # upsampled 16-column band its block covers
        wt_y = np.repeat(np.repeat(np.arange(8).reshape(2, 4) + 1, 8, 0), 8, 1)
        wt_c = np.repeat(np.arange(w // 16) + 1, 16)[None, :]
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                yb = np.zeros((2, 4, 8, 8), dtype=np.int64)
                cb = np.zeros((1, 2, 8, 8), dtype=np.int64)
                cr = np.zeros((1, 2, 8, 8), dtype=np.int64)
                for b in range(8):
                    p = (d * _J420["y"][0] + b * _J420["y"][1]) % 128 + 64
                    yb[b // 4, b % 4, 0, 0] = (p - 128) * 8
                for j in range(2):
                    p = (d * _J420["cb"][0] + j * _J420["cb"][1]) % 128 + 64
                    cb[0, j, 0, 0] = (p - 128) * 8
                    p = (d * _J420["cr"][0] + j * _J420["cr"][1]) % 128 + 64
                    cr[0, j, 0, 0] = (p - 128) * 8
                payload = encode_jpeg_subsampled(
                    yb, cb, cr, (h, w), (2, 2), restart_interval=1
                )
                dec = decode_media(payload, sniff_media_type(payload)).astype(
                    np.int64
                )
                y, cbp, crp = dec[..., 0], dec[..., 1], dec[..., 2]
                rows.append(
                    (
                        d,
                        dec.shape[0],
                        dec.shape[1],
                        int(y.sum()),
                        int((y * wt_y).sum()),
                        int(cbp.sum()),
                        int((cbp * wt_c).sum()),
                        int(crp.sum()),
                        int((crp * wt_c).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "h", "w", "y_sum", "y_wsum",
                         "cb_sum", "cb_wsum", "cr_sum", "cr_wsum"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, h BIGINT, w BIGINT, y_sum BIGINT, y_wsum BIGINT, "
        "cb_sum BIGINT, cb_wsum BIGINT, cr_sum BIGINT, cr_wsum BIGINT",
    )


JPEG420_DECODE_STATS_SQL = f"""
WITH y AS (
  SELECT doc_id,
         CAST(SUM(64 * ((doc_id * {_J420["y"][0]} + b.x * {_J420["y"][1]}) % 128 + 64)) AS BIGINT) AS y_sum,
         CAST(SUM(64 * ((doc_id * {_J420["y"][0]} + b.x * {_J420["y"][1]}) % 128 + 64) * (b.x + 1)) AS BIGINT) AS y_wsum
  FROM documents, range(8) b(x)
  GROUP BY doc_id
),
c AS (
  SELECT doc_id,
         CAST(SUM(256 * ((doc_id * {_J420["cb"][0]} + j.x * {_J420["cb"][1]}) % 128 + 64)) AS BIGINT) AS cb_sum,
         CAST(SUM(256 * ((doc_id * {_J420["cb"][0]} + j.x * {_J420["cb"][1]}) % 128 + 64) * (j.x + 1)) AS BIGINT) AS cb_wsum,
         CAST(SUM(256 * ((doc_id * {_J420["cr"][0]} + j.x * {_J420["cr"][1]}) % 128 + 64)) AS BIGINT) AS cr_sum,
         CAST(SUM(256 * ((doc_id * {_J420["cr"][0]} + j.x * {_J420["cr"][1]}) % 128 + 64) * (j.x + 1)) AS BIGINT) AS cr_wsum
  FROM documents, range(2) j(x)
  GROUP BY doc_id
)
SELECT y.doc_id,
       CAST({_J420_H} AS BIGINT) AS h,
       CAST({_J420_W} AS BIGINT) AS w,
       y_sum, y_wsum, cb_sum, cb_wsum, cr_sum, cr_wsum
FROM y JOIN c USING (doc_id)
"""


# ---------------------------------------------------------------------------
# audio_fingerprint_neardup — REGISTERED r10 (VERDICT r08 task
# 4). Chromaprint-shaped audio near-dup over the REAL decode path,
# integer-exact end-to-end so DuckDB can replay it:
#
#   decode (16-bit PCM WAV) → fixed 16-sample frames → per-frame sum
#   (the integer "loudness level") → 4-bit quantization (sum // 256) →
#   four 16-bit BANDS of 4 packed frame-nibbles → banded self-join
#   (same OR-amplification posture as image_blockhash_neardup:
#   candidates share ≥1 band bucket, near-dups keep ≥ 3 of 4) —
#   never all-pairs.
#
# Synthesis mirrors the image query's no-wrap squared-congruential mix
# (a LINEAR mix keeps nibble differences constant across frames for
# nearby bases and re-collapses the banding): frame f of doc d carries
# samples 16·h_f + (i % 4) with h_f = ((base + f·137 + 7)² % 65521) //
# 4096 ∈ [0, 15], so the frame sum is exactly 256·h_f + 24 and the
# nibble recovers h_f with no rounding. Odd docs perturb ONE frame's
# samples by ±16 (one nibble ±1): a true near-dup matches its partner
# in exactly 3 of 4 bands. Samples stay in [0, 255+16] — far inside
# int16, no clipping anywhere.
#
# Scale: the fingerprint relation (4 rows/doc) is localCheckpoint-ed
# ONCE before the self-join — same plan guard as the image query (the
# join otherwise decodes every payload twice) — and the join is a pure
# (band, val) equi-join whose bucket sizes bound the candidate set.
# Measured at sf1 (50k docs): max 77 docs per (band, val) bucket,
# 3 229 438 bounded candidate pairs vs 1.25e9 all-pairs (387x), all
# 25 000 planted pairs kept at exactly 3 matched bands; the 84 860
# result rows carry the same fixture chance-tail as the image query
# (quadratic mix over key-shifted copies — the scale invariant is the
# bucket bound, and it holds).
# Registration (two-line edit, r10 window):
# ---------------------------------------------------------------------------

_AFP_FRAMES = 16     # frames per doc; 4 bands of 4 frame-nibbles
_AFP_FLEN = 16       # samples per frame
_AFP_MIX = 137       # per-frame offset in the squared-congruential mix
_AFP_MIN_BANDS = 3   # pair survives with >= this many matching bands


def audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.multimodal import decode_media, encode_wav, sniff_media_type

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        nf, fl = _AFP_FRAMES, _AFP_FLEN
        f_idx = np.arange(nf).reshape(nf, 1)
        i_idx = np.arange(fl).reshape(1, fl)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                base = doc_id - (doc_id % 2)  # pair partner shares the base
                h = ((base + f_idx * _AFP_MIX + 7) ** 2 % 65521) // 4096
                samples = 16 * h + (i_idx % 4)
                if doc_id % 2:  # perturb ONE frame of the odd partner
                    f = doc_id % nf
                    hf = int(h[f, 0])
                    samples[f, :] += 16 if hf < 15 else -16
                payload = encode_wav(
                    samples.reshape(-1).astype(np.int16), rate=16000
                )
                dec = decode_media(payload, sniff_media_type(payload))
                sums = dec.reshape(nf, fl).astype(np.int64).sum(axis=1)
                nibbles = sums // 256  # 16 values in 0..15
                for band in range(4):
                    val = 0
                    for j in range(4):
                        val += int(nibbles[band * 4 + j]) * (16 ** j)
                    rows.append((doc_id, band, val))
            yield pd.DataFrame(rows, columns=["doc_id", "band", "val"])

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    fp = docs.mapInPandas(
        fingerprint, "doc_id BIGINT, band INT, val BIGINT"
    ).localCheckpoint(eager=True)
    a = fp.alias("a")
    b = fp.alias("b")
    return (
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
        .filter(F.col("matched_bands") >= _AFP_MIN_BANDS)
    )


# the unperturbed frame sum is exactly 256·h_f + 24, so the oracle
# replays the closed form per (doc, frame) — no per-sample unnest needed
AUDIO_FP_NEARDUP_SQL = f"""
WITH frames AS (
  SELECT doc_id, doc_id - (doc_id % 2) AS base,
         unnest(range(0, {_AFP_FRAMES})) AS f
  FROM documents
),
nibs AS (
  SELECT doc_id, f,
         (((base + f * {_AFP_MIX} + 7) * (base + f * {_AFP_MIX} + 7)) % 65521) // 4096
         + CASE WHEN doc_id % 2 = 1 AND f = doc_id % {_AFP_FRAMES}
                THEN CASE WHEN (((base + f * {_AFP_MIX} + 7) * (base + f * {_AFP_MIX} + 7)) % 65521) // 4096 < 15
                          THEN 1 ELSE -1 END
                ELSE 0 END AS nib
  FROM frames
),
bands AS (
  SELECT doc_id, f // 4 AS band,
         CAST(SUM(nib * power(16, f % 4)) AS BIGINT) AS val
  FROM nibs GROUP BY doc_id, f // 4
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS matched_bands
FROM bands a JOIN bands b
  ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {_AFP_MIN_BANDS}
"""


# ---------------------------------------------------------------------------
# flac_decode_stats — REGISTERED r10 (VERDICT r08 task 5: one
# compressed codec per modality — PNG/zlib for images, now FLAC/Rice
# for audio).  Per doc the plan synthesizes a deterministic int16
# signal, compresses it to a REAL FLAC stream (fixed predictors +
# Rice residuals, operators/flac.py), decodes it with the DEFAULT
# decode_media (bit-level Rice decode, fixed-prediction reconstruction,
# CRC-8/CRC-16/MD5 all verified in-line), and reduces to exact integer
# stats.  The 480-sample signal spans 3 frames at block size 192 — the
# short 96-sample LAST frame is load-bearing (a decoder that pads or
# drops the tail breaks every sum).  The position-weighted sum pins
# sample ORDER across frame boundaries, not just totals.
# Registration (two-line edit, r10 window):
# ---------------------------------------------------------------------------

_FLAC_N = 480          # samples per doc: 2 full frames + a short tail
_FLAC_BS = 192         # encoder block size
_FLAC_FORM = (3, 5)    # s_i = ((doc_id*3 + i*5) % 199) - 99


def flac_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.flac import encode_flac
    from ..operators.multimodal import decode_media, sniff_media_type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        a_d, a_i = _FLAC_FORM
        i_idx = np.arange(_FLAC_N, dtype=np.int64)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                sig = ((d * a_d + i_idx * a_i) % 199 - 99).astype(np.int16)
                payload = encode_flac(sig, rate=16000, block_size=_FLAC_BS)
                dec = decode_media(payload, sniff_media_type(payload))
                s = dec.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        d,
                        len(s),
                        int(s.sum()),
                        int((s * s).sum()),
                        int((s * (i_idx + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "s_sum", "s_sumsq", "s_wsum"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_samples BIGINT, "
        "s_sum BIGINT, s_sumsq BIGINT, s_wsum BIGINT",
    )


# the compressed byte count is deliberately NOT a result column — it is
# not oracle-replayable (DuckDB cannot run the encoder); the pytest
# asserts the compression ratio instead.  The oracle pins the decoded
# samples, which IS the decode contract.
FLAC_DECODE_STATS_SQL = f"""
SELECT doc_id,
       CAST({_FLAC_N} AS BIGINT) AS n_samples,
       CAST(SUM((doc_id * {_FLAC_FORM[0]} + i.x * {_FLAC_FORM[1]}) % 199 - 99) AS BIGINT) AS s_sum,
       CAST(SUM(((doc_id * {_FLAC_FORM[0]} + i.x * {_FLAC_FORM[1]}) % 199 - 99)
              * ((doc_id * {_FLAC_FORM[0]} + i.x * {_FLAC_FORM[1]}) % 199 - 99)) AS BIGINT) AS s_sumsq,
       CAST(SUM(((doc_id * {_FLAC_FORM[0]} + i.x * {_FLAC_FORM[1]}) % 199 - 99) * (i.x + 1)) AS BIGINT) AS s_wsum
FROM documents, range({_FLAC_N}) i(x)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# audio_spectral_features — REGISTERED r10 (closes the VERDICT
# r08 "what's missing" item 4: frequency-domain audio features; the
# queued audio_frame_features covers time-domain energy/ZCR only).
#
# The filterbank is a 4-point DFT, chosen because its twiddle factors
# are exactly 0/±1 — the one DFT size whose bins are INTEGER-exact, so
# DuckDB replays the whole pipeline with no float drift (an 8-point DFT
# needs √2/2; Goertzel needs cos constants whose engine-vs-oracle ulp
# behavior is unpinnable).  Per 16-sample frame, each of the 4
# consecutive 4-sample blocks contributes
#     X0 = x0+x1+x2+x3              (DC)
#     |X1|² = (x0-x2)² + (x1-x3)²   (fs/4 band; X3 is its conjugate)
#     X2 = x0-x1+x2-x3              (Nyquist)
# and the frame's band energies are the sums of squares over blocks.
# Parseval pins the arithmetic: e_dc + 2·e_mid + e_nyq = 4·Σs² — the
# pytest asserts it against audio_frame_features' energy column.
#
# The decode path is FLAC (operators/flac.py) — the compressed audio
# codec composed into a real feature pipeline, exactly as
# media_decode_png_stats did for compressed images.  Map-only Arrow
# pass; one row per (doc, frame).
# Registration (two-line edit, r10 window):
# ---------------------------------------------------------------------------

_ASF_FRAME = 16        # samples per frame; 4 DFT blocks of 4
_ASF_FORM = (9, 23)    # s_i = (doc_id*9 + i*23) % 65536 - 32768


def audio_spectral_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.flac import encode_flac
    from ..operators.multimodal import decode_media, sniff_media_type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        a_d, a_i = _ASF_FORM
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 64 + 16 * (d % 3)  # 4..6 complete frames
                i = np.arange(n)
                sig = ((d * a_d + i * a_i) % 65536 - 32768).astype(np.int16)
                payload = encode_flac(sig, rate=16000, block_size=64)
                dec = decode_media(payload, sniff_media_type(payload))
                blocks = dec[:, 0].astype(np.int64).reshape(-1, 4, 4)
                x0, x1, x2, x3 = (blocks[:, :, k] for k in range(4))
                dc = x0 + x1 + x2 + x3
                mid = (x0 - x2) ** 2 + (x1 - x3) ** 2
                nyq = x0 - x1 + x2 - x3
                e_dc = (dc * dc).sum(axis=1)
                e_mid = mid.sum(axis=1)
                e_nyq = (nyq * nyq).sum(axis=1)
                for f in range(blocks.shape[0]):
                    rows.append(
                        (d, f, int(e_dc[f]), int(e_mid[f]), int(e_nyq[f]))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "e_dc", "e_mid", "e_nyq"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, frame_idx BIGINT, e_dc BIGINT, e_mid BIGINT, "
        "e_nyq BIGINT",
    )


AUDIO_SPECTRAL_SQL = f"""
WITH dims AS (
  SELECT doc_id, 64 + 16 * (doc_id % 3) AS n FROM documents
),
cells AS (
  SELECT doc_id, unnest(range(0, n)) AS i FROM dims
),
vals AS (
  SELECT doc_id, i // 16 AS f, (i % 16) // 4 AS blk, i % 4 AS k,
         (doc_id * {_ASF_FORM[0]} + i * {_ASF_FORM[1]}) % 65536 - 32768 AS s
  FROM cells
),
bins AS (
  SELECT doc_id, f, blk,
         SUM(s) AS dc,
         SUM(CASE WHEN k = 0 THEN s WHEN k = 2 THEN -s ELSE 0 END) AS re1,
         SUM(CASE WHEN k = 1 THEN s WHEN k = 3 THEN -s ELSE 0 END) AS im1,
         SUM(CASE WHEN k % 2 = 0 THEN s ELSE -s END) AS nyq
  FROM vals GROUP BY doc_id, f, blk
)
SELECT doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(SUM(dc * dc) AS BIGINT) AS e_dc,
       CAST(SUM(re1 * re1 + im1 * im1) AS BIGINT) AS e_mid,
       CAST(SUM(nyq * nyq) AS BIGINT) AS e_nyq
FROM bins
GROUP BY doc_id, f
"""


# ---------------------------------------------------------------------------
# jpeg_progressive_decode_stats — REGISTERED r10.  Drives the
# NEW progressive (SOF2) decode path end-to-end as a production body:
# per doc the plan synthesizes quantized coefficient blocks (DC plus
# the F(4,4) checkerboard AC), writes a REAL 6-scan progressive stream
# (DC first at Al=1, split-band AC first at Al=2, cross-band AC
# refinement 2→1, DC refinement, AC refinement 1→0 — every Annex-G
# scan type), decodes it with the default decoder, and reduces to
# exact integer sums.  F(4,4) is the one AC basis whose IDCT is
# EXACTLY ±v/8 per pixel (the cos(π/4)² product is 1/2), so pixels
# stay closed-form integers: pixel(y, x) = p ± w.  The plain sum
# cancels the AC term (the sign grid sums to zero); the sign-grid
# checksum cancels the DC term and isolates 64·w per block — so chk /
# wchk pin that every AC scan (band split, EOB runs, correction bits)
# landed the coefficient exactly, while sum_all / wsum pin the
# DC-scan chain, per block.
#
# Oracle-exact — pinned by tests/test_curation12.py against the closed
# form — so registration is the usual two-line edit:
# ---------------------------------------------------------------------------

# per-block flat value p and checkerboard amplitude w (2x2 block grid):
#   p(doc, b) = (doc_id*13 + b*29) % 128 + 64   (pixels p±w stay unclamped)
#   w(doc, b) = (doc_id*5  + b*3)  % 7   + 1
_JPROG = {"p": (13, 29), "w": (5, 3)}


def jpeg_progressive_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.jpeg import encode_jpeg_progressive
    from ..operators.multimodal import decode_media, sniff_media_type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # sign of cos((2x+1)π/4): the F(4,4) basis over one block
        s = np.array([1, -1, -1, 1, 1, -1, -1, 1])
        sgn = np.tile(np.outer(s, s), (2, 2))
        bw = np.repeat(np.repeat(np.arange(4).reshape(2, 2) + 1, 8, 0), 8, 1)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                coefs = np.zeros((2, 2, 8, 8), dtype=np.int64)
                for b in range(4):
                    p = (d * _JPROG["p"][0] + b * _JPROG["p"][1]) % 128 + 64
                    w = (d * _JPROG["w"][0] + b * _JPROG["w"][1]) % 7 + 1
                    coefs[b // 2, b % 2, 0, 0] = (p - 128) * 8
                    coefs[b // 2, b % 2, 4, 4] = w * 8
                payload = encode_jpeg_progressive(coefs, (16, 16))
                dec = decode_media(payload, sniff_media_type(payload)).astype(
                    np.int64
                )
                rows.append(
                    (
                        d,
                        dec.shape[0],
                        dec.shape[1],
                        int(dec.sum()),
                        int((dec * bw).sum()),
                        int((dec * sgn).sum()),
                        int((dec * sgn * bw).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "h", "w", "sum_all", "wsum", "chk", "wchk"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, h BIGINT, w BIGINT, sum_all BIGINT, wsum BIGINT, "
        "chk BIGINT, wchk BIGINT",
    )


JPEG_PROGRESSIVE_DECODE_STATS_SQL = f"""
WITH vals AS (
  SELECT doc_id, b.x AS b,
         (doc_id * {_JPROG["p"][0]} + b.x * {_JPROG["p"][1]}) % 128 + 64 AS p,
         (doc_id * {_JPROG["w"][0]} + b.x * {_JPROG["w"][1]}) % 7 + 1 AS wac
  FROM documents, range(4) b(x)
)
SELECT doc_id,
       CAST(16 AS BIGINT) AS h,
       CAST(16 AS BIGINT) AS w,
       CAST(SUM(64 * p) AS BIGINT) AS sum_all,
       CAST(SUM(64 * p * (b + 1)) AS BIGINT) AS wsum,
       CAST(SUM(64 * wac) AS BIGINT) AS chk,
       CAST(SUM(64 * wac * (b + 1)) AS BIGINT) AS wchk
FROM vals
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# mp4_container_stats — REGISTERED r10.  The MP4 stub retired
# at its honest boundary: per doc the plan synthesizes a structurally
# valid ISO BMFF container (ftyp + moov/mvhd + 1-3 trak subtrees with
# tkhd/mdhd/hdlr/minf/stbl + mdat) from integer formulas, then PROBES
# it with the real box-tree walker (operators/containers.py: 32/64-bit
# and to-end box sizes, FullBox versions, 16.16 fixed-point dims,
# packed 5-bit language) and emits what the probe returned.  Sample
# decode stays NotImplementedError — this is the ffprobe layer, the
# metadata pass a curation pipeline runs before spending GPU decode.
#
# Oracle-exact (closed form below) — registration is the two-line edit:
# ---------------------------------------------------------------------------

_MP4_LANGS = ("und", "eng", "fra")


def mp4_container_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.containers import build_mp4, probe_mp4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 1 + d % 3
                tracks = [
                    {
                        "track_id": i + 1,
                        "handler": "vide" if i == 0 else "soun",
                        "duration": (d * 37 + i * 101) % 90000 + 1000,
                        "timescale": 600 * (i + 1),
                        "language": _MP4_LANGS[(d + i) % 3],
                        "width": (d % 64 + 1) * 16 if i == 0 else 0,
                        "height": (d % 48 + 1) * 16 if i == 0 else 0,
                    }
                    for i in range(n)
                ]
                payload = build_mp4(
                    1000, (d * 53) % 100000 + 500, tracks,
                    mdat_bytes=(d * 13) % 4096,
                )
                info = probe_mp4(payload)
                ts = info["tracks"]
                rows.append(
                    (
                        d,
                        len(ts),
                        info["duration"],
                        info["mdat_bytes"],
                        ts[0]["width"],
                        ts[0]["height"],
                        sum(t["duration"] for t in ts),
                        sum(t["timescale"] for t in ts),
                        ",".join(t["language"] for t in ts),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_tracks", "duration", "mdat_bytes",
                         "vid_w", "vid_h", "trk_dur_sum", "trk_ts_sum",
                         "langs"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_tracks BIGINT, duration BIGINT, mdat_bytes BIGINT, "
        "vid_w BIGINT, vid_h BIGINT, trk_dur_sum BIGINT, trk_ts_sum BIGINT, "
        "langs STRING",
    )


MP4_CONTAINER_STATS_SQL = """
WITH trk AS (
  SELECT doc_id, i.x AS i,
         (doc_id * 37 + i.x * 101) % 90000 + 1000 AS dur,
         600 * (i.x + 1) AS ts,
         CASE (doc_id + i.x) % 3 WHEN 0 THEN 'und' WHEN 1 THEN 'eng'
              ELSE 'fra' END AS lang
  FROM documents, range(3) i(x)
  WHERE i.x < 1 + doc_id % 3
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tracks,
       CAST((doc_id * 53) % 100000 + 500 AS BIGINT) AS duration,
       CAST((doc_id * 13) % 4096 AS BIGINT) AS mdat_bytes,
       CAST((doc_id % 64 + 1) * 16 AS BIGINT) AS vid_w,
       CAST((doc_id % 48 + 1) * 16 AS BIGINT) AS vid_h,
       CAST(SUM(dur) AS BIGINT) AS trk_dur_sum,
       CAST(SUM(ts) AS BIGINT) AS trk_ts_sum,
       string_agg(lang, ',' ORDER BY i) AS langs
FROM trk
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# mp3_frame_stats — REGISTERED r10.  The MP3 stub retired at
# the same boundary: per doc the plan synthesizes a VBR MPEG-1 Layer
# III stream (ID3v2 tag with syncsafe size, per-frame bitrate/padding
# pattern, optional ID3v1 trailer) and SCANS it with the real frame
# walker (11-bit sync, bitrate/samplerate tables, exact frame-length
# arithmetic) — duration-in-samples, byte and bitrate totals, tag
# accounting, all integer-exact.  The oracle replays the spec's frame
# length formula (144·kbps·1000 // sr + pad) against an inline bitrate
# table.
#
# ---------------------------------------------------------------------------


def mp3_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.containers import build_mp3, scan_mp3_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                frames = [
                    ((d * 3 + i) % 14 + 1, (d + i) % 2)
                    for i in range(8 + d % 6)
                ]
                payload = build_mp3(
                    frames, sr_idx=d % 3,
                    id3v2_payload=(d % 50) * 3, id3v1=d % 2 == 1,
                )
                s = scan_mp3_frames(payload)
                rows.append(
                    (
                        d,
                        s["n_frames"],
                        s["samplerate"],
                        s["samples"],
                        s["frame_bytes"],
                        s["sum_kbps"],
                        s["id3v2_bytes"] + (128 if s["id3v1"] else 0),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "samplerate", "samples",
                         "frame_bytes", "sum_kbps", "tag_bytes"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_frames BIGINT, samplerate BIGINT, samples BIGINT, "
        "frame_bytes BIGINT, sum_kbps BIGINT, tag_bytes BIGINT",
    )


# MPEG-1 Layer III bitrate table, index 1..14 (kbps)
_MP3_BR_SQL = "VALUES " + ", ".join(
    f"({i + 1}, {k})"
    for i, k in enumerate([32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                           224, 256, 320])
)

MP3_FRAME_STATS_SQL = f"""
WITH br(idx, kbps) AS ({_MP3_BR_SQL}),
f AS (
  SELECT d.doc_id, i.x AS i,
         CASE d.doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
              ELSE 32000 END AS sr,
         (d.doc_id * 3 + i.x) % 14 + 1 AS br_idx,
         (d.doc_id + i.x) % 2 AS pad
  FROM documents d, range(14) i(x)
  WHERE i.x < 8 + d.doc_id % 6
)
SELECT f.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(MIN(sr) AS BIGINT) AS samplerate,
       CAST(COUNT(*) * 1152 AS BIGINT) AS samples,
       CAST(SUM(144 * kbps * 1000 // sr + pad) AS BIGINT) AS frame_bytes,
       CAST(SUM(kbps) AS BIGINT) AS sum_kbps,
       CAST(CASE WHEN f.doc_id % 50 = 0 THEN 0
                 ELSE 10 + (f.doc_id % 50) * 3 END
            + CASE WHEN f.doc_id % 2 = 1 THEN 128 ELSE 0 END
            AS BIGINT) AS tag_bytes
FROM f JOIN br ON br.idx = f.br_idx
GROUP BY f.doc_id
"""


# ---------------------------------------------------------------------------
# r10 registrations (VERDICT r09 task 1: drain the whole queue in one
# window).  Every query below was oracle-exact at sf0.001 AND sf0.01 in
# pytest (tests/test_curation12.py) before registration.
# ---------------------------------------------------------------------------
CURATION12_QUERIES["jpeg420_decode_stats"] = jpeg420_decode_stats
CURATION12_ORACLE_SQL["jpeg420_decode_stats"] = JPEG420_DECODE_STATS_SQL
CURATION12_QUERIES["audio_fingerprint_neardup"] = audio_fingerprint_neardup
CURATION12_ORACLE_SQL["audio_fingerprint_neardup"] = AUDIO_FP_NEARDUP_SQL
CURATION12_QUERIES["flac_decode_stats"] = flac_decode_stats
CURATION12_ORACLE_SQL["flac_decode_stats"] = FLAC_DECODE_STATS_SQL
CURATION12_QUERIES["audio_spectral_features"] = audio_spectral_features
CURATION12_ORACLE_SQL["audio_spectral_features"] = AUDIO_SPECTRAL_SQL
CURATION12_QUERIES["jpeg_progressive_decode_stats"] = jpeg_progressive_decode_stats
CURATION12_ORACLE_SQL["jpeg_progressive_decode_stats"] = JPEG_PROGRESSIVE_DECODE_STATS_SQL
CURATION12_QUERIES["mp4_container_stats"] = mp4_container_stats
CURATION12_ORACLE_SQL["mp4_container_stats"] = MP4_CONTAINER_STATS_SQL
CURATION12_QUERIES["mp3_frame_stats"] = mp3_frame_stats
CURATION12_ORACLE_SQL["mp3_frame_stats"] = MP3_FRAME_STATS_SQL
