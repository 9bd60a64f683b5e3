"""MPEG-1 audio bitstream decode as driver-gated queries
(operators/mpeg_audio.py): Layer I (r10), Layer II (r11), and — r12 —
TWO-CHANNEL frames with the spec's (subband, channel) field
interleave, the real §2.4.2.6 allocation-table selection
(3-B.2a vs 3-B.2b by sampling rate and bitrate-per-channel), §2.4.2.3
bitrate/mode legality, and protection_bit=0 CRC alignment.

``mpeg1_layer1_subband_stats`` — per doc the plan synthesizes a real
STEREO Layer I frame (per-channel allocations, scalefactor indices,
and quantized subband codes from integer closed forms; every third
doc also carries a crc_check word), ENCODES it to the actual
bitstream, parses it back through the real bit-level unpack, and
emits what the PARSE recovered: total active-subband count,
allocation / scalefactor / code sums, the exact rational
requantization numerator sum (2·code + 1 − 2^nb — the spec's s'''
numerator), the crc flag, and the md5 of the code stream in spec
read order (sample-major, then subband, then CHANNEL).  A single
mis-read bit anywhere in the variable-width interleaved layout
shifts every later field and breaks the md5.

``mpeg1_layer2_bitstream_stats`` — the same contract one layer up:
stereo Layer II at 384 kbps (a spec-LEGAL two-channel-only rate;
the old mono 384 fixture violated §2.4.2.3 — ADVICE r11), with the
SAMPLING RATE alternating by doc parity so both allocation tables
are exercised through one oracle: even docs 48 kHz → Table 3-B.2a
(sblimit 27), odd docs 44.1 kHz → Table 3-B.2b (sblimit 30, high
subbands 23..29 live).  The ``sblimit`` column pins the table
selection; scfsi-conditional scalefactor transmission and 3/5/9-level
GROUPED codewords are all under the samples_md5.

The synthesis filterbank (the float stage) deliberately stays OUT of
the gated queries — it is pytest-validated (two independent
implementations cross-checked) per the module-header boundary in
operators/mpeg_audio.py.

No reference-repo analog (the reference pipeline is tabular-only).

Scale notes: map-only Arrow passes over a spread id scan, the same
posture as the rest of the codec family.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_table, spread_for_python

CURATION17_QUERIES: dict = {}
CURATION17_ORACLE_SQL: dict = {}


def _l1_params(d: int, c: int):
    """The per-channel synthesis closed form shared by engine and
    oracle docs (channel ``c`` in 0..1)."""
    n_active = 6 + (d + c) % 5
    alloc = [0] * 32
    scf = []
    for j in range(n_active):
        alloc[j] = 1 + (d + j + 9 * c) % 6        # nb = alloc+1 in 2..7
        scf.append((d + 7 * j + 19 * c) % 63)
    codes = [
        [(d * 3 + s * 5 + j * 11 + 23 * c) % (1 << (alloc[j] + 1))
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
                ch = [_l1_params(d, c) for c in (0, 1)]
                crc = (d * 31) % 65536 if d % 3 == 0 else None
                frame = build_layer1_frame(
                    [ch[0][0], ch[1][0]],
                    [ch[0][1], ch[1][1]],
                    [ch[0][2], ch[1][2]],
                    mode=0,
                    crc16=crc,
                )
                got = parse_layer1_frame(frame)
                n_act = [len(got["scf_idx"][c]) for c in (0, 1)]
                # spec read order: sample-major, subband, then channel
                parts = []
                for s in range(12):
                    for sb in range(max(n_act)):
                        for c in (0, 1):
                            if sb < n_act[c]:
                                parts.append(str(got["codes"][c][s][sb]))
                rows.append(
                    (
                        d,
                        sum(n_act),
                        sum(a for al in got["alloc"] for a in al),
                        sum(v for sc in got["scf_idx"] for v in sc),
                        sum(v for cc in got["codes"]
                            for row in cc for v in row),
                        sum(v for cc in got["requant_num"]
                            for row in cc for v in row),
                        1 if got["crc_present"] else 0,
                        hashlib.md5(",".join(parts).encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_active", "alloc_sum", "scf_sum",
                         "code_sum", "requant_num_sum", "crc_flag",
                         "codes_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_active BIGINT, alloc_sum BIGINT, scf_sum BIGINT, "
        "code_sum BIGINT, requant_num_sum BIGINT, crc_flag BIGINT, "
        "codes_md5 STRING",
    )


# per channel c: nb = 2 + (d + j + 9c) % 6; code = (3d + 5s + 11j + 23c)
# mod 2^nb; requant numerator = 2*code + 1 - 2^nb (exact ISO rational);
# read order (s, j, c) — sample-major, subband, channel (§2.4.1.5)
MPEG1_L1_SQL = """
WITH sb AS (
  SELECT doc_id, c.x AS c, j.x AS j,
         1 + (doc_id + j.x + 9 * c.x) % 6 AS a,
         (doc_id + 7 * j.x + 19 * c.x) % 63 AS scf
  FROM documents, range(2) c(x), range(11) j(x)
  WHERE j.x < 6 + (doc_id + c.x) % 5
),
smp AS (
  SELECT doc_id, c, j, a, s.x AS s,
         CAST((doc_id * 3 + s.x * 5 + j * 11 + 23 * c)
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
         md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY s, j, c))
             AS codes_md5
  FROM smp GROUP BY doc_id
)
SELECT p.doc_id, p.n_active, p.alloc_sum, p.scf_sum,
       c.code_sum, c.requant_num_sum,
       CAST(CASE WHEN p.doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS crc_flag,
       c.codes_md5
FROM per_sb p JOIN per_code c ON p.doc_id = c.doc_id
"""


# ---------------------------------------------------------------------------
# r10 registration, r12 re-staled: stereo fixture + crc alignment.
# Oracle-exact at sf0.001 AND sf0.01 in pytest before registration.
# ---------------------------------------------------------------------------
CURATION17_QUERIES["mpeg1_layer1_subband_stats"] = mpeg1_layer1_subband_stats
CURATION17_ORACLE_SQL["mpeg1_layer1_subband_stats"] = MPEG1_L1_SQL


# ---------------------------------------------------------------------------
# mpeg1_layer2_bitstream_stats (r11, re-staled r12) — stereo Layer II
# under the real table selection.  Closed forms below are shared by
# engine and oracle; `j` is the position in the channel's active list
# (0..n_lo-1 for the low run, n_lo for the high subband).
# ---------------------------------------------------------------------------


def _l2_params(d: int, c: int, sblimit: int):
    """Per-channel closed forms; allocation indices are capped at 6
    (subbands < 23) / 2 (the 2-bit group) so worst-case coded bits fit
    the 384 kbps stereo frame budget at both sampling rates."""
    n_lo = 6 + (d + 3 * c) % 10
    hi = 23 + (d + c) % (sblimit - 23)
    sbs = list(range(n_lo)) + [hi]
    alloc_idx = [0] * sblimit
    for sb in sbs:
        alloc_idx[sb] = 1 + (d + sb + 5 * c) % (6 if sb < 23 else 2)
    n_tx = [3, 2, 1, 2]
    scfsi = [(d + j + 2 * c) % 4 for j in range(len(sbs))]
    scf = [
        [(d + 5 * j + 17 * k + 7 * c) % 63 for k in range(n_tx[scfsi[j]])]
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
                # even docs: 48 kHz -> Table 3-B.2a (sblimit 27);
                # odd docs: 44.1 kHz -> Table 3-B.2b (sblimit 30)
                sr_idx = 1 if d % 2 == 0 else 0
                sblimit = 27 if d % 2 == 0 else 30
                per_ch = []
                for c in (0, 1):
                    sbs, alloc_idx, scfsi, scf = _l2_params(d, c, sblimit)
                    levels = [
                        _l2_group(sb, sblimit)[1][alloc_idx[sb] - 1]
                        for sb in sbs
                    ]
                    samples = [
                        [
                            tuple(
                                (d * 7 + gr * 5 + j * 3 + t + 11 * c)
                                % levels[j]
                                for t in range(3)
                            )
                            for j in range(len(sbs))
                        ]
                        for gr in range(12)
                    ]
                    per_ch.append((alloc_idx, scfsi, scf, samples))
                crc = (d * 31) % 65536 if d % 3 == 0 else None
                frame = build_layer2_frame(
                    [per_ch[0][0], per_ch[1][0]],
                    [per_ch[0][1], per_ch[1][1]],
                    [per_ch[0][2], per_ch[1][2]],
                    [per_ch[0][3], per_ch[1][3]],
                    sr_idx=sr_idx,
                    br_idx=14,
                    mode=0,
                    crc16=crc,
                )
                got = parse_layer2_frame(frame)
                actives = [
                    [sb for sb, a in enumerate(got["alloc_idx"][c]) if a]
                    for c in (0, 1)
                ]
                # spec read order: granule, subband, channel, sample
                order = sorted(
                    (sb, c, j)
                    for c in (0, 1)
                    for j, sb in enumerate(actives[c])
                )
                parts = []
                for gr in range(12):
                    for sb, c, j in order:
                        parts.extend(
                            str(v) for v in got["samples"][c][gr][j]
                        )
                rows.append(
                    (
                        d,
                        got["sblimit"],
                        sum(len(a) for a in actives),
                        sum(a for al in got["alloc_idx"] for a in al),
                        sum(v for lv in got["levels"] for v in lv),
                        sum(v for si in got["scfsi"] for v in si),
                        sum(v for ch in got["scf_parts"]
                            for p in ch for v in p),
                        sum(1 for lv in got["levels"]
                            for v in lv if v in _GROUPED_BITS),
                        sum(v for ch in got["samples"]
                            for row in ch for tri in row for v in tri),
                        1 if got["crc_present"] else 0,
                        hashlib.md5(",".join(parts).encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sblimit", "n_active", "alloc_sum",
                         "levels_sum", "scfsi_sum", "scf_parts_sum",
                         "n_grouped", "sample_sum", "crc_flag",
                         "samples_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, sblimit BIGINT, n_active BIGINT, alloc_sum BIGINT, "
        "levels_sum BIGINT, scfsi_sum BIGINT, scf_parts_sum BIGINT, "
        "n_grouped BIGINT, sample_sum BIGINT, crc_flag BIGINT, "
        "samples_md5 STRING",
    )


def _l2_levels_values() -> str:
    """Table 3-B.2a/b level rows as SQL VALUES (grp, idx, lv) — the
    group rows are shared between the two tables (3-B.2b only extends
    the 2-bit group's subband range)."""
    from ..operators.mpeg_audio import _L2_GROUPS

    rows = []
    for grp, (_sbs, _bits, lvs) in enumerate(_L2_GROUPS):
        rows += [f"({grp}, {i + 1}, {lv})" for i, lv in enumerate(lvs)]
    return ", ".join(rows)


# scfsi expansion weights: scf_parts_sum adds each TRANSMITTED value
# once per part it covers — scfsi 0: (1,1,1); 1: (2,1); 2: (3,); 3: (1,2)
MPEG1_L2_SQL = """
WITH lvtab(grp, idx, lv) AS (VALUES {LVTAB}),
dims AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 27 ELSE 30 END AS sblimit
  FROM documents
),
sbs AS (
  SELECT doc_id, sblimit, c.x AS c, j.x AS j, j.x AS sb
  FROM dims, range(2) c(x), range(16) j(x)
  WHERE j.x < 6 + (doc_id + 3 * c.x) % 10
  UNION ALL
  SELECT doc_id, sblimit, c.x AS c,
         6 + (doc_id + 3 * c.x) % 10 AS j,
         23 + (doc_id + c.x) % (sblimit - 23) AS sb
  FROM dims, range(2) c(x)
),
alloc AS (
  SELECT doc_id, sblimit, c, j, sb,
         1 + (doc_id + sb + 5 * c)
             % (CASE WHEN sb < 23 THEN 6 ELSE 2 END) AS a,
         CASE WHEN sb < 3 THEN 0 WHEN sb < 11 THEN 1
              WHEN sb < 23 THEN 2 ELSE 3 END AS grp
  FROM sbs
),
lv AS (
  SELECT a.doc_id, a.sblimit, a.c, a.j, a.sb, a.a, t.lv,
         (a.doc_id + a.j + 2 * a.c) % 4 AS si
  FROM alloc a JOIN lvtab t ON t.grp = a.grp AND t.idx = a.a
),
scf AS (
  SELECT doc_id, c, j, k.x AS k,
         (doc_id + 5 * j + 17 * k.x + 7 * c) % 63 AS v,
         (doc_id + j + 2 * c) % 4 AS si
  FROM sbs, range(3) k(x)
  WHERE k.x < CASE (doc_id + j + 2 * c) % 4
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
         CAST(MAX(sblimit) AS BIGINT) AS sblimit,
         CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(SUM(a) AS BIGINT) AS alloc_sum,
         CAST(SUM(lv) AS BIGINT) AS levels_sum,
         CAST(SUM(si) AS BIGINT) AS scfsi_sum,
         CAST(SUM(CASE WHEN lv IN (3, 5, 9) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_grouped
  FROM lv GROUP BY doc_id
),
smp AS (
  SELECT doc_id, c, j, sb, gr.x AS gr, t.x AS t,
         (doc_id * 7 + gr.x * 5 + j * 3 + t.x + 11 * c) % lv AS code
  FROM lv, range(12) gr(x), range(3) t(x)
),
per_code AS (
  SELECT doc_id,
         CAST(SUM(code) AS BIGINT) AS sample_sum,
         md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY gr, sb, c, t))
             AS samples_md5
  FROM smp GROUP BY doc_id
)
SELECT p.doc_id, p.sblimit, p.n_active, p.alloc_sum, p.levels_sum,
       p.scfsi_sum, s.scf_parts_sum, p.n_grouped, c.sample_sum,
       CAST(CASE WHEN p.doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS crc_flag,
       c.samples_md5
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
