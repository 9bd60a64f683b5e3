"""Round-10 curation additions, fourth set: MPEG-1 Layer I bitstream
decode as a driver-gated query.

``mpeg1_layer1_subband_stats`` — per doc the plan synthesizes a real
mono Layer I frame (allocations, scalefactor indices, and quantized
subband codes from integer closed forms), ENCODES it to the actual
bitstream (operators/mpeg_audio.py), parses it back through the real
bit-level unpack, and emits what the PARSE recovered: active-subband
count, allocation / scalefactor / code sums, the exact rational
requantization numerator sum (2·code + 1 − 2^nb summed over every
coded sample — the spec's s''' numerator), and the md5 of the code
stream in spec read order (sample-major).  A single mis-read bit
anywhere in the variable-width layout shifts every later field and
breaks the md5.

The synthesis filterbank (the float stage) deliberately stays OUT of
the gated query — it is pytest-validated (two independent
implementations cross-checked) per the module-header boundary in
operators/mpeg_audio.py.

No reference-repo analog (the reference pipeline is tabular-only).

Scale notes: map-only Arrow pass over a spread id scan, the same
posture as the rest of the codec family.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_table, spread_for_python

CURATION17_QUERIES: dict = {}
CURATION17_ORACLE_SQL: dict = {}


def _l1_params(d: int):
    """The synthesis closed form shared by engine and oracle docs."""
    n_active = 6 + d % 5
    alloc = [0] * 32
    scf = []
    for j in range(n_active):
        alloc[j] = 1 + (d + j) % 6            # nb = alloc+1 in 2..7
        scf.append((d + 7 * j) % 63)
    codes = [
        [(d * 3 + s * 5 + j * 11) % (1 << (alloc[j] + 1))
         for j in range(n_active)]
        for s in range(12)
    ]
    return alloc, scf, codes


def mpeg1_layer1_subband_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mpeg_audio import build_layer1_frame, parse_layer1_frame

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                alloc, scf, codes = _l1_params(d)
                frame = build_layer1_frame(alloc, scf, codes)
                got = parse_layer1_frame(frame)
                code_stream = ",".join(
                    str(c) for row in got["codes"] for c in row
                )
                rows.append(
                    (
                        d,
                        sum(1 for a in got["alloc"] if a),
                        sum(got["alloc"]),
                        sum(got["scf_idx"]),
                        sum(c for row in got["codes"] for c in row),
                        sum(n for row in got["requant_num"] for n in row),
                        hashlib.md5(code_stream.encode("ascii")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_active", "alloc_sum", "scf_sum",
                         "code_sum", "requant_num_sum", "codes_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_active BIGINT, alloc_sum BIGINT, scf_sum BIGINT, "
        "code_sum BIGINT, requant_num_sum BIGINT, codes_md5 STRING",
    )


# nb = 2 + (doc_id + j) % 6; code = (3d + 5s + 11j) mod 2^nb;
# requant numerator = 2*code + 1 - 2^nb  (exact ISO Layer I rational)
MPEG1_L1_SQL = """
WITH sb AS (
  SELECT doc_id, j.x AS j,
         1 + (doc_id + j.x) % 6 AS a,
         (doc_id + 7 * j.x) % 63 AS scf
  FROM documents, range(11) j(x)
  WHERE j.x < 6 + doc_id % 5
),
smp AS (
  SELECT doc_id, j, a, s.x AS s,
         CAST((doc_id * 3 + s.x * 5 + j * 11)
              % CAST(power(2, a + 1) AS BIGINT) AS BIGINT) AS code
  FROM sb, range(12) s(x)
),
per_sb AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(SUM(a) AS BIGINT) AS alloc_sum,
         CAST(SUM(scf) AS BIGINT) AS scf_sum
  FROM sb GROUP BY doc_id
),
per_code AS (
  SELECT doc_id,
         CAST(SUM(code) AS BIGINT) AS code_sum,
         CAST(SUM(2 * code + 1 - CAST(power(2, a + 1) AS BIGINT)) AS BIGINT)
             AS requant_num_sum,
         md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY s, j))
             AS codes_md5
  FROM smp GROUP BY doc_id
)
SELECT p.doc_id, p.n_active, p.alloc_sum, p.scf_sum,
       c.code_sum, c.requant_num_sum, c.codes_md5
FROM per_sb p JOIN per_code c ON p.doc_id = c.doc_id
"""


# ---------------------------------------------------------------------------
# r10 registration (fourth set) — oracle-exact at sf0.001 AND sf0.01 in
# pytest (tests/test_curation17.py) before registration.
# ---------------------------------------------------------------------------
CURATION17_QUERIES["mpeg1_layer1_subband_stats"] = mpeg1_layer1_subband_stats
CURATION17_ORACLE_SQL["mpeg1_layer1_subband_stats"] = MPEG1_L1_SQL


# ---------------------------------------------------------------------------
# mpeg1_layer2_bitstream_stats (r11) — the Layer II bitstream layer as
# a driver-gated query: per doc, synthesize a mono Layer II frame under
# Table 3-B.2a from integer closed forms (allocation indices across all
# four subband groups including the 2-bit 23-26 range, scfsi-dependent
# scalefactor transmission, 3/5/9-level GROUPED codewords), encode it
# to the real bitstream, parse it back, and emit what the PARSE
# recovered.  A one-bit shift anywhere in the scfsi-conditional layout
# breaks the degrouped-sample md5.  The Table 3-B.4 dequant-constant
# multiply stays outside the hash gate (module-header boundary).
# ---------------------------------------------------------------------------


def _l2_params(d: int):
    """Closed forms shared by engine and oracle."""
    n_lo = 6 + d % 10                      # active subbands 0..n_lo-1
    sbs = list(range(n_lo)) + [23 + d % 4] # + one 2-bit-group subband
    def max_idx(sb):
        return 15 if sb < 11 else (7 if sb < 23 else 3)
    alloc_idx = [0] * 27
    for sb in sbs:
        alloc_idx[sb] = 1 + (d + sb) % max_idx(sb)
    n_tx = [3, 2, 1, 2]
    scfsi = [(d + j) % 4 for j in range(len(sbs))]
    scf = [
        [(d + 5 * j + 17 * k) % 63 for k in range(n_tx[scfsi[j]])]
        for j in range(len(sbs))
    ]
    return sbs, alloc_idx, scfsi, scf


def mpeg1_layer2_bitstream_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mpeg_audio import (
        _GROUPED_BITS,
        _l2_group,
        build_layer2_frame,
        parse_layer2_frame,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                sbs, alloc_idx, scfsi, scf = _l2_params(d)
                levels = [
                    _l2_group(sb)[1][alloc_idx[sb] - 1] for sb in sbs
                ]
                samples = [
                    [
                        tuple(
                            (d * 7 + gr * 5 + j * 3 + t) % levels[j]
                            for t in range(3)
                        )
                        for j in range(len(sbs))
                    ]
                    for gr in range(12)
                ]
                frame = build_layer2_frame(
                    alloc_idx, scfsi, scf, samples, br_idx=14
                )
                got = parse_layer2_frame(frame)
                stream = ",".join(
                    str(v)
                    for row in got["samples"]
                    for tri in row
                    for v in tri
                )
                rows.append(
                    (
                        d,
                        len(got["levels"]),
                        sum(got["alloc_idx"]),
                        sum(got["levels"]),
                        sum(got["scfsi"]),
                        sum(v for p in got["scf_parts"] for v in p),
                        sum(1 for lv in got["levels"] if lv in _GROUPED_BITS),
                        sum(v for row in got["samples"]
                            for tri in row for v in tri),
                        hashlib.md5(stream.encode("ascii")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_active", "alloc_sum", "levels_sum",
                         "scfsi_sum", "scf_parts_sum", "n_grouped",
                         "sample_sum", "samples_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_active BIGINT, alloc_sum BIGINT, "
        "levels_sum BIGINT, scfsi_sum BIGINT, scf_parts_sum BIGINT, "
        "n_grouped BIGINT, sample_sum BIGINT, samples_md5 STRING",
    )


def _l2_levels_values() -> str:
    """Table 3-B.2a level rows as SQL VALUES (grp, idx, lv)."""
    from ..operators.mpeg_audio import _L2_GROUPS

    rows = []
    for grp, (_sbs, _bits, lvs) in enumerate(_L2_GROUPS):
        rows += [f"({grp}, {i + 1}, {lv})" for i, lv in enumerate(lvs)]
    return ", ".join(rows)


# scfsi expansion weights: scf_parts_sum adds each TRANSMITTED value
# once per part it covers — scfsi 0: (1,1,1); 1: (2,1); 2: (3,); 3: (1,2)
MPEG1_L2_SQL = f"""
WITH lvtab(grp, idx, lv) AS (VALUES {{LVTAB}}),
sbs AS (
  SELECT doc_id, j.x AS j, j.x AS sb
  FROM documents, range(16) j(x)
  WHERE j.x < 6 + doc_id % 10
  UNION ALL
  SELECT doc_id, 6 + doc_id % 10 AS j, 23 + doc_id % 4 AS sb
  FROM documents
),
alloc AS (
  SELECT doc_id, j, sb,
         1 + (doc_id + sb) % (CASE WHEN sb < 11 THEN 15
                                   WHEN sb < 23 THEN 7 ELSE 3 END) AS a,
         CASE WHEN sb < 3 THEN 0 WHEN sb < 11 THEN 1
              WHEN sb < 23 THEN 2 ELSE 3 END AS grp
  FROM sbs
),
lv AS (
  SELECT a.doc_id, a.j, a.sb, a.a, t.lv,
         (a.doc_id + a.j) % 4 AS si
  FROM alloc a JOIN lvtab t ON t.grp = a.grp AND t.idx = a.a
),
scf AS (
  SELECT doc_id, j, k.x AS k,
         (doc_id + 5 * j + 17 * k.x) % 63 AS v,
         (doc_id + j) % 4 AS si
  FROM sbs, range(3) k(x)
  WHERE k.x < CASE (doc_id + j) % 4
              WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 2 END
),
scf_sums AS (
  SELECT doc_id,
         CAST(SUM(v * CASE si
             WHEN 0 THEN 1
             WHEN 1 THEN CASE k WHEN 0 THEN 2 ELSE 1 END
             WHEN 2 THEN 3
             ELSE CASE k WHEN 0 THEN 1 ELSE 2 END END) AS BIGINT)
             AS scf_parts_sum
  FROM scf GROUP BY doc_id
),
per_sb AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(SUM(a) AS BIGINT) AS alloc_sum,
         CAST(SUM(lv) AS BIGINT) AS levels_sum,
         CAST(SUM(si) AS BIGINT) AS scfsi_sum,
         CAST(SUM(CASE WHEN lv IN (3, 5, 9) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_grouped
  FROM lv GROUP BY doc_id
),
smp AS (
  SELECT doc_id, gr.x AS gr, j, t.x AS t,
         (doc_id * 7 + gr.x * 5 + j * 3 + t.x) % lv AS code
  FROM lv, range(12) gr(x), range(3) t(x)
),
per_code AS (
  SELECT doc_id,
         CAST(SUM(code) AS BIGINT) AS sample_sum,
         md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY gr, j, t))
             AS samples_md5
  FROM smp GROUP BY doc_id
)
SELECT p.doc_id, p.n_active, p.alloc_sum, p.levels_sum, p.scfsi_sum,
       s.scf_parts_sum, p.n_grouped, c.sample_sum, c.samples_md5
FROM per_sb p
JOIN scf_sums s ON p.doc_id = s.doc_id
JOIN per_code c ON p.doc_id = c.doc_id
"""


def _mpeg1_l2_sql() -> str:
    return MPEG1_L2_SQL.replace("{LVTAB}", _l2_levels_values())


CURATION17_QUERIES["mpeg1_layer2_bitstream_stats"] = (
    mpeg1_layer2_bitstream_stats
)
CURATION17_ORACLE_SQL["mpeg1_layer2_bitstream_stats"] = _mpeg1_l2_sql()
