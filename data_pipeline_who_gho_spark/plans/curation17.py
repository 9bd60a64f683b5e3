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
