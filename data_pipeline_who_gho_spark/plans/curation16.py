"""Round-10 curation additions, third set: CONTENT-DEFINED CHUNKING
(CDC) — the Rabin-style rolling-hash segmentation storage systems and
corpus pipelines use to find shared content at sub-document
granularity even when insertions shift every byte offset (fixed-size
blocks break on a single inserted character; content-defined
boundaries re-synchronize).

The chunker: a W=16-character polynomial rolling hash over code
points, H(i) = Σ_{j=0..15} cp(i-j)·K^j mod M (K=131, M=65521), with a
boundary wherever H(i) % 64 == 7 — expected chunk length 64, exact
integer arithmetic both engines replay (DuckDB rebuilds H with a
16-way windowed self-join; the engine computes it as one vectorized
convolution).  No min/max clamps (classic Rabin CDC; FastCDC's
normalized clamping is a tuning layer on the same boundary test —
documented, not implemented).

``cdc_chunk_stats`` — per doc: chunk count, min/max chunk length, and
the md5 of the ordered chunk-md5 concatenation (a boundary off by one
character anywhere in the doc breaks it).

``cdc_shared_chunks`` — the cross-document payoff, over the dedup
corpus (extensions._corpus, which injects doc_id%7 twins): explode one
row per chunk, group by chunk md5, keep chunks appearing in ≥2
distinct docs.  Planted twin docs share EVERY chunk; incidentally
repeated 16+-char substrings across unrelated docs surface too — both
replayed exactly by the oracle.

No reference-repo analog (the reference pipeline is tabular-only:
``etl/transform.py`` handles scalar observation rows); this extends
the engine's dedup family per the build brief.

Scale notes: chunking is a map-only Arrow pass (spread below, chunk
extraction partition-local); ``cdc_shared_chunks`` adds ONE hash
aggregation shuffled on chunk_md5 — rows are (md5, len) pairs, ~1/64
of corpus characters, with map-side partial aggregation.  At 100 TB
this is the standard chunk-index build; the group-by key space is
bounded by corpus content, never |docs|².
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import spread_for_python
from .extensions import _CORPUS_SQL, _corpus

CURATION16_QUERIES: dict = {}
CURATION16_ORACLE_SQL: dict = {}

_CDC_W = 16       # rolling window (code points)
_CDC_K = 131      # polynomial base
_CDC_M = 65521    # modulus
_CDC_DIV = 64     # boundary divisor (expected chunk length)
_CDC_RES = 7      # boundary residue


def _chunk_spans(text: str):
    """[(start, end_inclusive)] chunk spans of ``text`` under the
    rolling-hash boundary rule; the final span always closes at the
    last character."""
    import numpy as np

    n = len(text)
    if n == 0:
        return []
    cp = np.fromiter((ord(c) for c in text), dtype=np.int64, count=n)
    if n >= _CDC_W:
        # pow(K, j, M), not K**j % M: 131**16 overflows int64
        kernel = np.array(
            [pow(_CDC_K, j, _CDC_M) for j in range(_CDC_W)], dtype=np.int64
        )
        h = np.convolve(cp, kernel)[_CDC_W - 1 : n] % _CDC_M
        ends = list(np.nonzero(h % _CDC_DIV == _CDC_RES)[0] + (_CDC_W - 1))
    else:
        ends = []
    if not ends or ends[-1] != n - 1:
        ends.append(n - 1)
    spans = []
    start = 0
    for e in ends:
        spans.append((start, int(e)))
        start = int(e) + 1
    return spans


def cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                text = str(t)
                spans = _chunk_spans(text)
                if not spans:
                    continue
                md5s = [
                    hashlib.md5(text[s : e + 1].encode("utf-8")).hexdigest()
                    for s, e in spans
                ]
                lens = [e - s + 1 for s, e in spans]
                rows.append(
                    (
                        int(doc_id),
                        len(spans),
                        min(lens),
                        max(lens),
                        hashlib.md5("".join(md5s).encode("ascii")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_chunks", "min_len", "max_len",
                         "chunks_md5"],
            )

    docs = spread_for_python(_corpus(spark, sf_dir))
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_chunks BIGINT, min_len BIGINT, max_len BIGINT, "
        "chunks_md5 STRING",
    )


def _cdc_spans_sql() -> str:
    """CTE chain ending in ``chunks(doc_id, s, e, ctext)`` — the exact
    SQL twin of :func:`_chunk_spans` over the dedup corpus."""
    coef = " ".join(
        f"WHEN {j} THEN {(_CDC_K ** j) % _CDC_M}" for j in range(_CDC_W)
    )
    return f"""
WITH corpus AS ({_CORPUS_SQL}),
chars AS (
  -- range bound covers the fixture max doc length (558 chars at the
  -- oracle tiers); the ENGINE has no such limit
  SELECT doc_id, p.x AS i,
         CAST(unicode(substr(text, p.x + 1, 1)) AS BIGINT) AS cv
  FROM corpus, range(600) p(x)
  WHERE p.x < length(text)
),
h AS (
  SELECT a.doc_id, a.i,
         SUM(b.cv * CASE a.i - b.i {coef} END) % {_CDC_M} AS hv
  FROM chars a JOIN chars b
    ON a.doc_id = b.doc_id AND b.i BETWEEN a.i - {_CDC_W - 1} AND a.i
  WHERE a.i >= {_CDC_W - 1}
  GROUP BY a.doc_id, a.i
),
ends AS (
  SELECT doc_id, i AS e FROM h WHERE hv % {_CDC_DIV} = {_CDC_RES}
  UNION
  SELECT doc_id, length(text) - 1 AS e FROM corpus WHERE length(text) > 0
),
spans AS (
  SELECT doc_id, e,
         COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), -1) + 1 AS s
  FROM ends
),
chunks AS (
  SELECT sp.doc_id, sp.s, sp.e, substr(c.text, sp.s + 1, sp.e - sp.s + 1) AS ctext
  FROM spans sp JOIN corpus c ON sp.doc_id = c.doc_id
)"""


CDC_CHUNK_STATS_SQL = _cdc_spans_sql() + """
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(MIN(e - s + 1) AS BIGINT) AS min_len,
       CAST(MAX(e - s + 1) AS BIGINT) AS max_len,
       md5(string_agg(md5(ctext), '' ORDER BY s)) AS chunks_md5
FROM chunks
GROUP BY doc_id
"""


def cdc_shared_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                text = str(t)
                # combine per doc HERE (all of a doc's chunks are in
                # hand): one output row per DISTINCT (doc, chunk) with
                # its occurrence count, so the cross-doc rollup needs a
                # plain count/sum — no countDistinct, whose two-phase
                # expansion would add a second (chunk_md5, doc_id)
                # shuffle to the plan
                per_doc: dict[str, list[int]] = {}
                for s, e in _chunk_spans(text):
                    h = hashlib.md5(text[s : e + 1].encode("utf-8")).hexdigest()
                    if h in per_doc:
                        per_doc[h][1] += 1
                    else:
                        per_doc[h] = [e - s + 1, 1]
                for h, (ln, occ) in per_doc.items():
                    rows.append((int(doc_id), h, ln, occ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_md5", "chunk_len", "occ"]
            )

    docs = spread_for_python(_corpus(spark, sf_dir))
    chunks = docs.mapInPandas(
        run, "doc_id BIGINT, chunk_md5 STRING, chunk_len BIGINT, occ BIGINT"
    )
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("occ").cast("long").alias("n_occ"),
            F.min("chunk_len").alias("chunk_len"),
        )
        .filter(F.col("n_docs") >= 2)
    )


CDC_SHARED_CHUNKS_SQL = _cdc_spans_sql() + """
SELECT md5(ctext) AS chunk_md5,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ,
       CAST(MIN(e - s + 1) AS BIGINT) AS chunk_len
FROM chunks
GROUP BY md5(ctext)
HAVING COUNT(DISTINCT doc_id) >= 2
"""


# ---------------------------------------------------------------------------
# r10 registrations (third set) — oracle-exact at sf0.001 AND sf0.01 in
# pytest (tests/test_curation16.py) before registration.
# ---------------------------------------------------------------------------
CURATION16_QUERIES["cdc_chunk_stats"] = cdc_chunk_stats
CURATION16_ORACLE_SQL["cdc_chunk_stats"] = CDC_CHUNK_STATS_SQL
CURATION16_QUERIES["cdc_shared_chunks"] = cdc_shared_chunks
CURATION16_ORACLE_SQL["cdc_shared_chunks"] = CDC_SHARED_CHUNKS_SQL
