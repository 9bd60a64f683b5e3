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

from ..sources.catalog import load_table

CURATION12_QUERIES: dict = {}
CURATION12_ORACLE_SQL: dict = {}

# ---------------------------------------------------------------------------
# jpeg420_decode_stats — r10 registration queue (window discipline: the
# r09 window is exactly 4 new + the 46-query r04 drain; a 5th new
# registration would push an r04 row out).  Oracle-exact — pinned by
# tests/test_curation12.py against the closed form — so registration is
# the usual two-line edit:
#   CURATION12_QUERIES["jpeg420_decode_stats"] = jpeg420_decode_stats
#   CURATION12_ORACLE_SQL["jpeg420_decode_stats"] = JPEG420_DECODE_STATS_SQL
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

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
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
