"""Round-10 curation additions, second set: MODALITY QUALITY GATES —
the filter stage a multimodal corpus runs BEFORE fingerprinting (clipped
or silent audio, blank/low-contrast images, and static video are
dropped or down-weighted long before dedup sees them).

All three queries follow the decode-family contract: synthesize a real
payload from an integer closed form, run the REAL decoder
(operators/multimodal.py), compute the gate features from the DECODED
samples/pixels in exact integer arithmetic, and let the DuckDB oracle
replay the closed form — any decoder, segmentation, or threshold slip
breaks hash parity.

``audio_quality_gates`` — per doc a 16-bit PCM WAV with three regions
(leading near-silence at amplitude ≤ 2, a full-scale clipped burst,
then a bounded pseudo-signal): emits sample/clip/silence counts, the
exact DC sum, and the absolute peak.  Clipping is |s| ≥ 32767 (catches
both int16 rails), silence |s| ≤ 2 — the counts pin both the segment
layout and the decode.

``image_quality_gates`` — per doc a 16×16 RGB BMP: even docs carry a
narrow-range washed image (contrast < 8), odd docs a full-contrast
channel-split image; emits integer luma min/max/mean, distinct-luma
count, and the low-contrast flag at range < 32.

``video_scene_cut_stats`` — per doc a 12-frame mono Y4M cut into
flat-luma scenes of deterministic length (every 7th doc is a single
static scene): emits frame/cut counts, the exact total SAD (sum of
absolute per-pixel frame differences), and the static flag.  A
scene-cut detector that reads frames out of order or misses the decode
changes total_sad exactly.

No reference-repo analog (the reference pipeline is tabular-only:
``etl/transform.py`` handles scalar observation rows); this extends
the engine's multimodal-curation seam per the build brief.

Scale notes: all three are map-only Arrow passes over ``documents``
(spread_for_python below the pass, decode partition-local) — the same
100 TB posture as the rest of the decode family; no joins, no state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_table, spread_for_python

CURATION15_QUERIES: dict = {}
CURATION15_ORACLE_SQL: dict = {}

_AQ_CLIP_T = 32767   # |s| >= this counts as clipped (both int16 rails)
_AQ_SIL_T = 2        # |s| <= this counts as silence


def audio_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_media, encode_wav, sniff_media_type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n_sil = 160 + d % 80
                n_clip = 40 + d % 60
                n_sig = 600 + d % 160
                i = np.arange(n_sil + n_clip + n_sig, dtype=np.int64)
                sil = (d % 3) * (1 - 2 * (i[:n_sil] % 2))
                clip = np.where(
                    (i[n_sil : n_sil + n_clip] - n_sil) % 2 == 0,
                    32767, -32768,
                )
                sig = (d * 7 + i[n_sil + n_clip :] * 13) % 2000 - 1000
                samples = np.concatenate([sil, clip, sig]).astype(np.int16)
                payload = encode_wav(samples, rate=16000)
                dec = decode_media(payload, sniff_media_type(payload))
                s = dec.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        d,
                        len(s),
                        int((np.abs(s) >= _AQ_CLIP_T).sum()),
                        int((np.abs(s) <= _AQ_SIL_T).sum()),
                        int(s.sum()),
                        int(np.abs(s).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "n_clipped", "n_silent",
                         "dc_sum", "peak_abs"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_samples BIGINT, n_clipped BIGINT, "
        "n_silent BIGINT, dc_sum BIGINT, peak_abs BIGINT",
    )


# the oracle replays the three-region sample formula per doc; the
# signal region contributes extra silence wherever |formula| <= 2
AUDIO_QUALITY_GATES_SQL = f"""
WITH spans AS (
  SELECT doc_id,
         160 + doc_id % 80 AS n_sil,
         40 + doc_id % 60 AS n_clip,
         600 + doc_id % 160 AS n_sig
  FROM documents
),
samples AS (
  SELECT doc_id, n_sil, n_clip, i.x AS i,
         CASE
           WHEN i.x < n_sil
             THEN (doc_id % 3) * (1 - 2 * (i.x % 2))
           WHEN i.x < n_sil + n_clip
             THEN CASE WHEN (i.x - n_sil) % 2 = 0 THEN 32767 ELSE -32768 END
           ELSE (doc_id * 7 + i.x * 13) % 2000 - 1000
         END AS s
  FROM spans, range(1100) i(x)
  WHERE i.x < n_sil + n_clip + n_sig
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(CASE WHEN ABS(s) >= {_AQ_CLIP_T} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped,
       CAST(SUM(CASE WHEN ABS(s) <= {_AQ_SIL_T} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_silent,
       CAST(SUM(s) AS BIGINT) AS dc_sum,
       CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs
FROM samples
GROUP BY doc_id
"""


_IQ_LOW_CONTRAST = 32  # luma range below this flags the image


def image_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_media, encode_bmp, sniff_media_type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        y = np.arange(16).reshape(16, 1)
        x = np.arange(16).reshape(1, 16)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 2 == 0:  # washed: narrow luma range, all channels equal
                    L = 4 + d % 4
                    v = 120 + (d + x + y) % L
                    img = np.repeat(v[:, :, None], 3, axis=2)
                else:  # full contrast, channel-split
                    v = (d + 3 * x + 5 * y) % 224 + 16
                    img = np.stack([v, 255 - v, v], axis=2)
                payload = encode_bmp(img.astype(np.uint8))
                dec = decode_media(payload, sniff_media_type(payload)).astype(
                    np.int64
                )
                gray = dec.sum(axis=2) // 3
                rng = int(gray.max() - gray.min())
                rows.append(
                    (
                        d,
                        int(gray.min()),
                        int(gray.max()),
                        int(gray.sum()) // gray.size,
                        int(len(np.unique(gray))),
                        int(rng < _IQ_LOW_CONTRAST),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "luma_min", "luma_max", "luma_mean",
                         "n_distinct", "low_contrast"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, luma_min BIGINT, luma_max BIGINT, luma_mean BIGINT, "
        "n_distinct BIGINT, low_contrast BIGINT",
    )


# gray replay: even docs all channels equal the washed value; odd docs
# luma = (v + (255 - v) + v) // 3 = (v + 255) // 3
IMAGE_QUALITY_GATES_SQL = f"""
WITH px AS (
  SELECT doc_id, g.x % 16 AS x, g.x // 16 AS y
  FROM documents, range(256) g(x)
),
gray AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN 120 + (doc_id + x + y) % (4 + doc_id % 4)
              ELSE ((doc_id + 3 * x + 5 * y) % 224 + 16 + 255) // 3
         END AS gv
  FROM px
)
SELECT doc_id,
       CAST(MIN(gv) AS BIGINT) AS luma_min,
       CAST(MAX(gv) AS BIGINT) AS luma_max,
       CAST(SUM(gv) // 256 AS BIGINT) AS luma_mean,
       CAST(COUNT(DISTINCT gv) AS BIGINT) AS n_distinct,
       CAST(CASE WHEN MAX(gv) - MIN(gv) < {_IQ_LOW_CONTRAST}
                 THEN 1 ELSE 0 END AS BIGINT) AS low_contrast
FROM gray
GROUP BY doc_id
"""


_VSC_FRAMES = 12
_VSC_HW = 16  # 16x16 luma


def video_scene_cut_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_media, encode_y4m, sniff_media_type

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        nf, hw = _VSC_FRAMES, _VSC_HW
        f = np.arange(nf)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                scene_len = 100 if d % 7 == 0 else 2 + d % 3
                scene = f // scene_len
                v = (d + scene * 57) % 240 + 8  # flat luma per scene
                frames = np.broadcast_to(
                    v.reshape(nf, 1, 1), (nf, hw, hw)
                ).astype(np.uint8)
                payload = encode_y4m(np.ascontiguousarray(frames))
                dec = decode_media(payload, sniff_media_type(payload)).astype(
                    np.int64
                )
                sad = np.abs(dec[1:] - dec[:-1]).reshape(nf - 1, -1).sum(axis=1)
                rows.append(
                    (
                        d,
                        nf,
                        int((sad > 0).sum()),
                        int(sad.sum()),
                        int((sad > 0).sum() == 0),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "n_cuts", "total_sad",
                         "is_static"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_frames BIGINT, n_cuts BIGINT, total_sad BIGINT, "
        "is_static BIGINT",
    )


# per-frame flat luma replay; SAD between consecutive frames is
# 256 * |v(f) - v(f-1)| and a cut is any nonzero difference
VIDEO_SCENE_CUT_STATS_SQL = f"""
WITH frames AS (
  SELECT doc_id,
         f.x AS f,
         (doc_id + (f.x // (CASE WHEN doc_id % 7 = 0 THEN 100
                                 ELSE 2 + doc_id % 3 END)) * 57) % 240 + 8 AS v
  FROM documents, range({_VSC_FRAMES}) f(x)
),
diffs AS (
  SELECT a.doc_id, ABS(a.v - b.v) AS dv
  FROM frames a JOIN frames b
    ON a.doc_id = b.doc_id AND b.f = a.f - 1
)
SELECT doc_id,
       CAST({_VSC_FRAMES} AS BIGINT) AS n_frames,
       CAST(SUM(CASE WHEN dv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       CAST(SUM(dv) * {_VSC_HW * _VSC_HW} AS BIGINT) AS total_sad,
       CAST(CASE WHEN SUM(CASE WHEN dv > 0 THEN 1 ELSE 0 END) = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS is_static
FROM diffs
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# r10 registrations (second set) — oracle-exact at sf0.001 AND sf0.01
# in pytest (tests/test_curation15.py) before registration.
# ---------------------------------------------------------------------------
CURATION15_QUERIES["audio_quality_gates"] = audio_quality_gates
CURATION15_ORACLE_SQL["audio_quality_gates"] = AUDIO_QUALITY_GATES_SQL
CURATION15_QUERIES["image_quality_gates"] = image_quality_gates
CURATION15_ORACLE_SQL["image_quality_gates"] = IMAGE_QUALITY_GATES_SQL
CURATION15_QUERIES["video_scene_cut_stats"] = video_scene_cut_stats
CURATION15_ORACLE_SQL["video_scene_cut_stats"] = VIDEO_SCENE_CUT_STATS_SQL
