"""Round-10 curation additions (VERDICT r09 task 6): EXIF-orientation-
aware image fingerprinting.

``exif_orientation_neardup`` — the composition real pipelines get
wrong: two copies of the same photo stored at different rotations
(one upright, one rotated with an EXIF orientation tag telling the
viewer how to display it) are the SAME image, but a fingerprinter
that ignores the tag computes rotated block grids and the near-dup
pair silently splits.  Per doc the plan synthesizes a 32×32 grayscale
JPEG (4×4 grid of flat 8×8 blocks, DC-only quantized coefficients so
decode is exact), stores the ODD partner physically transformed under
one of all eight EXIF orientations (flips, rotations, transpose,
transverse — ``store_with_orientation``) with the matching tag in a
real APP1 (which also carries type-7 UNDEFINED ExifVersion, pinning
the full TIFF type table in a registered query), then runs the REAL
arc: decode_jpeg → parse_exif_jpeg → apply_orientation → blockhash
(4-bit block nibbles, four 16-bit bands) → banded self-join with
≥3-of-4 band agreement.  The odd partner additionally perturbs ONE
block ±16, so every planted pair is a true near-dup (exactly one
nibble differs → exactly 3 bands match) and exact-dup shortcuts
cannot fake the result.  The oracle replays the upright closed form —
parity therefore PROVES the orientation round-trip is exact for all
eight tags (without normalization the odd doc's nibble grid is a
rotation of its partner's and the planted pairs vanish; pinned by a
control assertion in tests/test_curation14.py).

No reference-repo analog (the reference pipeline is tabular-only:
``etl/transform.py`` handles scalar observation rows); this extends
the engine's multimodal-curation seam per the build brief.

Scale notes: same posture as ``image_blockhash_neardup``
(plans/curation11.py) — a map-only Arrow pass over ``documents``
produces a 4-rows-per-doc fingerprint relation, localCheckpoint-ed
once so the banded self-join does not decode every image twice; the
join is a bounded-bucket equi-join (never all-pairs).  At 100 TB the
fingerprint relation is ~1/10⁴ the corpus size and the bucket bound
measured at sf1 governs candidate-pair growth.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table, spread_for_python

CURATION14_QUERIES: dict = {}
CURATION14_ORACLE_SQL: dict = {}

_EON_MIX = 137       # per-block offset in the squared-congruential mix
_EON_MIN_BANDS = 3   # pair survives with >= this many matching bands


def exif_orientation_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.exif import (
        TAG_ORIENTATION,
        apply_orientation,
        build_exif_jpeg,
        parse_exif_jpeg,
        store_with_orientation,
    )
    from ..operators.jpeg import decode_jpeg, encode_jpeg_gray

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        blk = np.arange(16).reshape(4, 4)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                base = doc_id - (doc_id % 2)  # pair partner shares the base
                # squared congruential mix (see image_blockhash_neardup's
                # design note: linear mixes collapse nibble differences)
                h = ((base + blk * _EON_MIX + 7) ** 2 % 65521) // 4096
                vals = 16 * h + 5  # flat per-block gray in [5, 245]
                if doc_id % 2:
                    b = doc_id % 16
                    hb = int(h[b // 4, b % 4])
                    vals[b // 4, b % 4] += 16 if hb < 15 else -16
                    tag = (doc_id // 2) % 8 + 1  # all eight orientations
                else:
                    tag = 1
                stored_vals = store_with_orientation(vals, tag)
                coefs = np.zeros((4, 4, 8, 8), dtype=np.int64)
                coefs[:, :, 0, 0] = (stored_vals - 128) * 8  # exact DC-only
                payload = build_exif_jpeg(
                    encode_jpeg_gray(coef_blocks=coefs, shape=(32, 32)),
                    orientation=tag,
                    exif_version=b"0232",
                )
                img = decode_jpeg(payload).astype(np.int64)
                meta = parse_exif_jpeg(payload)
                upright = apply_orientation(
                    img, meta["ifd0"][TAG_ORIENTATION][2]
                )
                nibbles = upright[::8, ::8] // 16  # 4x4 grid, one per block
                for band in range(4):
                    val = 0
                    for j in range(4):
                        val += int(nibbles[band, j]) * (16 ** j)
                    rows.append((doc_id, band, val))
            yield pd.DataFrame(rows, columns=["doc_id", "band", "val"])

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    # materialize the tiny fingerprint relation ONCE (else the self-join
    # decodes every image twice — see image_blockhash_neardup)
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
        .filter(F.col("matched_bands") >= _EON_MIN_BANDS)
    )


# the oracle replays the UPRIGHT closed form: block nibble = h (the odd
# partner's one perturbed block shifts ±1) — so hash parity proves the
# engine's store→tag→decode→normalize round trip is exact for all
# eight orientations
EXIF_ORIENTATION_NEARDUP_SQL = f"""
WITH nibs AS (
  SELECT doc_id, blk,
         (((base + blk * {_EON_MIX} + 7) * (base + blk * {_EON_MIX} + 7)) % 65521) // 4096
         + CASE WHEN doc_id % 2 = 1 AND blk = doc_id % 16
                THEN CASE WHEN (((base + blk * {_EON_MIX} + 7) * (base + blk * {_EON_MIX} + 7)) % 65521) // 4096 < 15
                          THEN 1 ELSE -1 END
                ELSE 0 END AS nib
  FROM (SELECT doc_id, doc_id - (doc_id % 2) AS base,
               unnest(range(0, 16)) AS blk
        FROM documents)
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
HAVING COUNT(*) >= {_EON_MIN_BANDS}
"""


# ---------------------------------------------------------------------------
# r10 registration (VERDICT r09 task 6) — oracle-exact at sf0.001 AND
# sf0.01 in pytest (tests/test_curation14.py) before registration.
# ---------------------------------------------------------------------------
CURATION14_QUERIES["exif_orientation_neardup"] = exif_orientation_neardup
CURATION14_ORACLE_SQL["exif_orientation_neardup"] = EXIF_ORIENTATION_NEARDUP_SQL
