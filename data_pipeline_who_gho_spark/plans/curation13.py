"""Round-9 curation additions, second set: the CRAWL-INGEST ARC.

The full path a web corpus takes from wire to clean text, each stage a
real parser with an exact oracle twin: archive/shard fan-out (tar/zip/
jsonl), multi-codec inflation (gz/bz2/xz), WARC record framing, HTML
extraction + per-block boilerplate classification, encoding repair,
URL canonicalization dedup, robots/sitemap frontier control, blocklist
gating, SRT captions, EXIF GPS stripping, a parquet-footer probe, the
video near-dup fingerprint, and the crawl_ingest_e2e composition
pinning the seams together.  Details live at each query's banner.

``multi_codec_roundtrip_stats`` — corpora ship as .gz/.bz2/.xz shards;
the ingestion seam must sniff and inflate all three.  Per doc the
codec rotates by doc_id, the payload round-trips through the REAL
stdlib decompressors behind ``decompress_payload``, and the emitted
md5/token stats must land on the oracle's view of the original text —
a wrong sniff, a codec mixup, or a lossy inflate all break parity.

``mojibake_repair_stats`` — the ftfy-style UTF-8-read-as-cp1252 repair
(operators/encoding.py) driven as a production body: corrupt a
non-ASCII-bearing text deterministically, repair it, and require the
repaired md5 to equal the oracle's md5 of the ORIGINAL — the repair
must be the exact inverse, not a plausible guess.  The corrupt-side
char count (= the original's UTF-8 byte count) rides along, pinning
the detector fired on every doc.

``parquet_footer_probe`` — writes a doc_id column with a PRESCRIBED
row-group size through the real parquet writer, then parses the
footer back (pyarrow metadata: per-group row counts and column
min/max statistics) and emits what the FOOTER says.  The oracle
derives the same numbers from the data by window arithmetic — so the
query pins that written row-group layout and footer statistics match
the prescription, the machinery every scan-pruning decision at 100 TB
trusts.  The single-group applyInPandas is bounded and documented
(one int64 column of doc ids — 500 rows at the driver's sf0.01, 50k
at sf1); the production form runs the same pyarrow footer read over
existing files, one path per task.

No reference-repo analog (the reference pipeline is tabular-only).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table, spread_for_python

CURATION13_QUERIES: dict = {}
CURATION13_ORACLE_SQL: dict = {}

# the full Python str.isspace() class (see gzip_roundtrip_stats)
_WS_CLASS = (
    "[\\t-\\r \\x{001C}-\\x{001F}\\x{0085}\\x{00A0}\\x{1680}"
    "\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+"
)


# ---------------------------------------------------------------------------
# multi_codec_roundtrip_stats — REGISTERED r10.
# ---------------------------------------------------------------------------


def multi_codec_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decompress_payload, sniff_media_type

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import bz2
        import gzip
        import lzma

        for pdf in batches:
            payloads = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                raw = str(t).encode("utf-8")
                c = int(doc_id) % 3
                if c == 0:
                    payloads.append(gzip.compress(raw, mtime=0))
                elif c == 1:
                    payloads.append(bz2.compress(raw))
                else:
                    payloads.append(lzma.compress(raw))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                mtype = sniff_media_type(payload)  # emitted: pins the sniff
                raw = decompress_payload(payload, mtype)
                text = raw.decode("utf-8")
                toks = [t for t in text.strip().split() if t]
                rows.append(
                    (int(doc_id), mtype, len(text), len(toks),
                     hashlib.md5(raw).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "codec", "n_chars", "n_tok", "text_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    packed = docs.mapInPandas(pack, "doc_id BIGINT, payload BINARY")
    return packed.mapInPandas(
        unpack,
        "doc_id BIGINT, codec STRING, n_chars BIGINT, n_tok BIGINT, "
        "text_md5 STRING",
    )


MULTI_CODEC_ROUNDTRIP_STATS_SQL = f"""
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'application/gzip'
            WHEN 1 THEN 'application/x-bzip2'
            ELSE 'application/x-xz' END AS codec,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(list_filter(regexp_split_to_array(text, '{_WS_CLASS}'),
            t -> t <> '')) AS BIGINT) AS n_tok,
       md5(text) AS text_md5
FROM documents
"""


# ---------------------------------------------------------------------------
# mojibake_repair_stats — REGISTERED r10.
# ---------------------------------------------------------------------------

# appended so every fixture doc carries non-ASCII: 2-byte (é), 3-byte
# (№), and a cp1252-special (— U+2014 -> byte 0x97) sequence
_MOJI_SUFFIX = " café №— "


def mojibake_repair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.encoding import corrupt_double_encoding, fix_double_encoding

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                orig = str(t) + _MOJI_SUFFIX + str(d % 10)
                corrupt = corrupt_double_encoding(orig)
                fixed, repaired = fix_double_encoding(corrupt)
                rows.append(
                    (
                        d,
                        int(repaired),
                        len(corrupt),
                        len(fixed),
                        hashlib.md5(fixed.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "repaired", "n_chars_corrupt",
                         "n_chars_fixed", "fixed_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, repaired BIGINT, n_chars_corrupt BIGINT, "
        "n_chars_fixed BIGINT, fixed_md5 STRING",
    )


# the corrupt text's CHAR count equals the original's UTF-8 BYTE count
# (every byte became one cp1252/latin-1 char) — strlen() in DuckDB
MOJIBAKE_REPAIR_STATS_SQL = f"""
SELECT doc_id,
       CAST(1 AS BIGINT) AS repaired,
       CAST(strlen(text || '{_MOJI_SUFFIX}' || CAST(doc_id % 10 AS VARCHAR))
            AS BIGINT) AS n_chars_corrupt,
       CAST(length(text || '{_MOJI_SUFFIX}' || CAST(doc_id % 10 AS VARCHAR))
            AS BIGINT) AS n_chars_fixed,
       md5(text || '{_MOJI_SUFFIX}' || CAST(doc_id % 10 AS VARCHAR))
           AS fixed_md5
FROM documents
"""


# ---------------------------------------------------------------------------
# parquet_footer_probe — REGISTERED r10.
# ---------------------------------------------------------------------------

_PFP_ROWGROUP = 64


def parquet_footer_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    def probe(pdf: pd.DataFrame) -> pd.DataFrame:
        import os
        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        ids = pdf["doc_id"].astype("int64").sort_values().reset_index(drop=True)
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "probe.parquet")
            pq.write_table(
                pa.table({"doc_id": ids}), path,
                row_group_size=_PFP_ROWGROUP,
            )
            md = pq.ParquetFile(path).metadata
            rows = []
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                st = rg.column(0).statistics
                rows.append(
                    (g, rg.num_rows, int(st.min), int(st.max),
                     md.num_row_groups)
                )
        return pd.DataFrame(
            rows,
            columns=["rg_idx", "n_rows", "min_doc", "max_doc", "n_groups"],
        )

    # NOT spread_for_python: the single-group applyInPandas funnels to
    # one task by design (bounded, documented) — a repartition before
    # it would only add a useless exchange
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.groupBy(F.lit(0).alias("_g"))
        .applyInPandas(
            lambda pdf: probe(pdf),
            "rg_idx BIGINT, n_rows BIGINT, min_doc BIGINT, max_doc BIGINT, "
            "n_groups BIGINT",
        )
    )


PARQUET_FOOTER_PROBE_SQL = f"""
WITH ordered AS (
  SELECT doc_id,
         (row_number() OVER (ORDER BY doc_id) - 1) // {_PFP_ROWGROUP} AS rg_idx
  FROM documents
)
SELECT CAST(rg_idx AS BIGINT) AS rg_idx,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
       (SELECT CAST(CEIL(COUNT(*) / {_PFP_ROWGROUP}.0) AS BIGINT)
        FROM documents) AS n_groups
FROM ordered
GROUP BY rg_idx
"""


# ---------------------------------------------------------------------------
# blocklist_match_stats — REGISTERED r10.  The unsafe-term /
# licence-string / contamination-marker gate: ONE Aho-Corasick
# automaton (operators/automaton.py) matches the whole blocklist per
# doc in a single O(len + matches) pass — the posture that matters
# when the blocklist has 10^4 entries and the corpus 10^9 docs (P
# per-pattern scans would cost P passes; LIKE chains plan as P
# filters).  The automaton is built once from the bounded pattern
# list and shipped by closure capture, like the BPE merge tables.
#
# Patterns are chosen BORDERLESS (no proper prefix that is also a
# suffix), so the automaton's all-occurrences count coincides with the
# oracle's non-overlapping replace()-arithmetic count; nested patterns
# ("scan" inside "filter scan") still count independently on both
# sides.  Severity-weighted totals and the first match position ride
# along, pinning pattern identity and offsets, not just totals.
#
# ---------------------------------------------------------------------------

_BLOCKLIST = [
    ("merge", 1), ("scan", 1), ("vector", 1), ("slow", 2),
    ("big table", 2), ("hash join", 2), ("query a", 2),
    ("filter scan", 3), ("merge group", 3), ("sort data", 3),
    ("window dup", 4), ("stream spark", 4),
]


def blocklist_match_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.automaton import Automaton

    ac = Automaton([p for p, _ in _BLOCKLIST])
    sev = [s for _, s in _BLOCKLIST]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                hits = ac.find_all(str(t))
                first = min((pos for pos, _ in hits), default=-1)
                rows.append(
                    (
                        int(doc_id),
                        len(hits),
                        len({idx for _, idx in hits}),
                        first + 1,  # 1-based like strpos; 0 = none
                        sum(sev[idx] for _, idx in hits),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_matches", "n_patterns", "first_pos",
                         "sev_sum"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_matches BIGINT, n_patterns BIGINT, "
        "first_pos BIGINT, sev_sum BIGINT",
    )


_BLOCKLIST_SQL_VALUES = ", ".join(
    f"('{p}', {s})" for p, s in _BLOCKLIST
)

BLOCKLIST_MATCH_STATS_SQL = f"""
WITH pats(pat, sev) AS (VALUES {_BLOCKLIST_SQL_VALUES}),
per AS (
  SELECT d.doc_id,
         (length(d.text) - length(replace(d.text, p.pat, '')))
           // length(p.pat) AS cnt,
         strpos(d.text, p.pat) AS pos,
         p.sev
  FROM documents d CROSS JOIN pats p
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_matches,
       CAST(SUM(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_patterns,
       CAST(COALESCE(MIN(CASE WHEN pos > 0 THEN pos END), 0) AS BIGINT)
           AS first_pos,
       CAST(SUM(cnt * sev) AS BIGINT) AS sev_sum
FROM per
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# warc_record_stats — REGISTERED r10.  The ingest wire format:
# per doc the plan synthesizes a WARC file (warcinfo + request +
# response + optional metadata records), walks it with the REAL parser
# (version lines, header blocks, Content-Length-framed blocks, CRLF
# separators — operators/warc.py), splits the response record's HTTP
# message, and emits what the PARSE found: record count, HTTP status,
# body bytes and md5 (must equal the oracle's view of the original
# text — any framing slip corrupts the body), metadata block bytes.
#
# ---------------------------------------------------------------------------


def warc_record_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.warc import (
        build_http_response,
        build_warc,
        header,
        parse_warc,
        split_http_response,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                body = str(t).encode("utf-8")
                recs = [
                    ("warcinfo", {}, b"software: engine\r\n"),
                    ("request", {"WARC-Target-URI": "http://x/"},
                     b"GET / HTTP/1.1\r\n\r\n"),
                    ("response", {"WARC-Target-URI": "http://x/"},
                     build_http_response(body)),
                ]
                if d % 2:
                    recs.append(("metadata", {}, b"m" * (d % 37 + 1)))
                parsed = parse_warc(build_warc(recs))
                resp = [r for r in parsed
                        if header(r["headers"], "WARC-Type") == "response"]
                status, _, got_body = split_http_response(resp[0]["block"])
                meta = sum(
                    len(r["block"]) for r in parsed
                    if header(r["headers"], "WARC-Type") == "metadata"
                )
                rows.append(
                    (
                        d,
                        len(parsed),
                        status,
                        len(got_body),
                        meta,
                        hashlib.md5(got_body).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_records", "status", "body_bytes",
                         "meta_bytes", "body_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_records BIGINT, status BIGINT, body_bytes BIGINT, "
        "meta_bytes BIGINT, body_md5 STRING",
    )


WARC_RECORD_STATS_SQL = """
SELECT doc_id,
       CAST(3 + doc_id % 2 AS BIGINT) AS n_records,
       CAST(200 AS BIGINT) AS status,
       CAST(strlen(text) AS BIGINT) AS body_bytes,
       CAST((doc_id % 2) * (doc_id % 37 + 1) AS BIGINT) AS meta_bytes,
       md5(text) AS body_md5
FROM documents
"""


# ---------------------------------------------------------------------------
# html_extract_stats — REGISTERED r10.  The step after WARC:
# per doc the plan synthesizes an HTML page around the (html-escaped)
# text — title with a numeric charref, script/style subtrees that MUST
# contribute nothing, an entity-bearing h1, the escaped body paragraph,
# an anchor — runs the REAL stdlib-parser extraction
# (operators/html.py), and emits the extract's md5 plus link-density
# counters.  The oracle reconstructs the expected extract from the
# original text (escape→unescape must be an exact inverse; whitespace
# normalization uses the shared isspace class).
#
# ---------------------------------------------------------------------------


def html_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html import extract_text, link_stats

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import html as html_mod

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                page = (
                    f"<html><head><title>Doc&#233;{d % 100}</title>"
                    "<style>p{color:red}</style>"
                    '<script>var x = "<p>not text</p>";</script></head>'
                    f"<body><h1>alpha &amp; beta</h1>"
                    f"<p>{html_mod.escape(str(t))}</p>"
                    f'<a href="#">link{d % 10}</a></body></html>'
                )
                extract = extract_text(page)
                n_links, anchor_chars, text_chars = link_stats(page)
                rows.append(
                    (
                        d,
                        n_links,
                        anchor_chars,
                        text_chars,
                        hashlib.md5(extract.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_links", "anchor_chars", "text_chars",
                         "extract_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_links BIGINT, anchor_chars BIGINT, "
        "text_chars BIGINT, extract_md5 STRING",
    )


# norm(text) = collapse isspace runs to single spaces + trim — exactly
# python's ' '.join(s.split()); nonws(s) strips the same class
HTML_EXTRACT_STATS_SQL = f"""
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(text, '{_WS_CLASS}', ' ', 'g')) AS ntext,
         length(regexp_replace(text, '{_WS_CLASS}', '', 'g')) AS text_nonws
  FROM documents
)
SELECT doc_id,
       CAST(1 AS BIGINT) AS n_links,
       CAST(5 AS BIGINT) AS anchor_chars,
       CAST(length('Docé' || CAST(doc_id % 100 AS VARCHAR))
            + length('alpha&beta')
            + text_nonws
            + 5 AS BIGINT) AS text_chars,
       md5('Docé' || CAST(doc_id % 100 AS VARCHAR) || chr(10)
           || 'alpha & beta'
           || CASE WHEN text_nonws > 0 THEN chr(10) || ntext ELSE '' END
           || chr(10)
           || 'link' || CAST(doc_id % 10 AS VARCHAR)) AS extract_md5
FROM norm
"""


# ---------------------------------------------------------------------------
# html_boilerplate_extract — REGISTERED r10.  The step after
# extraction: per-BLOCK boilerplate classification (Kohlschütter-style
# shallow features, exact integer rules: >= 4 non-ws chars AND link
# density < 1/2).  The synthesized page carries blocks that MUST drop
# (a nav link bar and a footer link farm at density 1, a 2-char stub)
# around blocks that MUST survive (title, entity-bearing h1, the
# escaped article text) — the kept-text md5 pins both directions.
#
# ---------------------------------------------------------------------------


def html_boilerplate_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html import boilerplate_extract

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import html as html_mod

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                page = (
                    f"<html><head><title>Doc&#233;{d % 100}</title></head>"
                    '<body><nav><a href="/">home</a> <a href="/a">about</a>'
                    ' <a href="/c">contact</a></nav>'
                    "<h1>alpha &amp; beta</h1>"
                    f"<p>{html_mod.escape(str(t))}</p>"
                    "<div>hi</div>"
                    '<footer><a href="#">all rights reserved</a></footer>'
                    "</body></html>"
                )
                kept, n_blocks, n_kept = boilerplate_extract(page)
                rows.append(
                    (
                        d,
                        n_blocks,
                        n_kept,
                        len(kept),
                        hashlib.md5(kept.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_blocks", "n_kept", "kept_chars",
                         "kept_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_blocks BIGINT, n_kept BIGINT, kept_chars BIGINT, "
        "kept_md5 STRING",
    )


HTML_BOILERPLATE_EXTRACT_SQL = f"""
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(text, '{_WS_CLASS}', ' ', 'g')) AS ntext,
         length(regexp_replace(text, '{_WS_CLASS}', '', 'g')) AS nonws
  FROM documents
),
kept AS (
  SELECT doc_id, nonws,
         CAST(5 + CASE WHEN nonws > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_blocks,
         CAST(2 + CASE WHEN nonws >= 4 THEN 1 ELSE 0 END AS BIGINT)
             AS n_kept,
         'Docé' || CAST(doc_id % 100 AS VARCHAR) || chr(10)
             || 'alpha & beta'
             || CASE WHEN nonws >= 4 THEN chr(10) || ntext ELSE '' END
             AS kept_text
  FROM norm
)
SELECT doc_id, n_blocks, n_kept,
       CAST(length(kept_text) AS BIGINT) AS kept_chars,
       md5(kept_text) AS kept_md5
FROM kept
"""


# ---------------------------------------------------------------------------
# video_fingerprint_neardup — REGISTERED r10.  Completes the
# per-modality near-dup matrix (text: minhash/simhash/…, image:
# blockhash, audio: frame-loudness — video was the gap): REAL Y4M
# decode → per-frame luma sums → 4-bit quantization → four 16-bit
# bands of 4 frame-nibbles → banded self-join at ≥3 of 4 bands, the
# same OR-amplification posture as the image/audio queries, never
# all-pairs.  Frame f of doc d is filled with 16·h_f + (x % 4)
# (h_f = squared-congruential nibble, distinct mix constant from the
# audio fixture), so the 8×8 frame sum is exactly 1024·h_f + 96 and
# quantization recovers h_f with no rounding; odd docs perturb ONE
# frame's pixels by ±16 — a true near-dup matches its partner in
# exactly 3 of 4 bands.  The fingerprint relation (4 rows/doc) is
# localCheckpoint-ed once so videos decode once, not per join side.
#
# ---------------------------------------------------------------------------

_VFP_FRAMES = 16    # frames per video; 4 bands of 4 frame-nibbles
_VFP_HW = 8         # frame height = width
_VFP_MIX = 149      # per-frame offset in the squared-congruential mix
_VFP_MIN_BANDS = 3


def video_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_media, encode_y4m, sniff_media_type

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        nf, hw = _VFP_FRAMES, _VFP_HW
        f_idx = np.arange(nf).reshape(nf, 1, 1)
        x_idx = np.arange(hw).reshape(1, 1, hw)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                base = doc_id - (doc_id % 2)
                h = ((base + f_idx * _VFP_MIX + 7) ** 2 % 65521) // 4096
                frames = (16 * h + (x_idx % 4)) * np.ones(
                    (1, hw, 1), dtype=np.int64
                )
                if doc_id % 2:
                    f = doc_id % nf
                    hf = int(h[f, 0, 0])
                    frames[f] += 16 if hf < 15 else -16
                payload = encode_y4m(frames.astype(np.uint8))
                dec = decode_media(payload, sniff_media_type(payload))
                sums = dec.reshape(nf, -1).astype(np.int64).sum(axis=1)
                nibbles = sums // 1024  # 16 values in 0..15
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
        .filter(F.col("matched_bands") >= _VFP_MIN_BANDS)
    )


VIDEO_FP_NEARDUP_SQL = f"""
WITH frames AS (
  SELECT doc_id, doc_id - (doc_id % 2) AS base,
         unnest(range(0, {_VFP_FRAMES})) AS f
  FROM documents
),
nibs AS (
  SELECT doc_id, f,
         (((base + f * {_VFP_MIX} + 7) * (base + f * {_VFP_MIX} + 7)) % 65521) // 4096
         + CASE WHEN doc_id % 2 = 1 AND f = doc_id % {_VFP_FRAMES}
                THEN CASE WHEN (((base + f * {_VFP_MIX} + 7) * (base + f * {_VFP_MIX} + 7)) % 65521) // 4096 < 15
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
HAVING COUNT(*) >= {_VFP_MIN_BANDS}
"""


# ---------------------------------------------------------------------------
# url_canonical_dedup — REGISTERED r10.  Crawl-level dedup by
# CANONICAL URL: per doc the plan synthesizes one of two messy
# spellings of the same page (even docs: uppercase scheme/host,
# trailing host dot, explicit :443, ./.. dot segments, duplicate
# slashes, utm_/fbclid tracking params, fragment; odd docs: a
# different segment route and gclid), canonicalizes with the REAL
# operator (operators/urls.py), and groups by the canonical string —
# each even/odd pair MUST collapse to one key.  A wrong rule in either
# direction (under-normalizing splits pairs, over-normalizing merges
# bases) breaks the exact group counts.
#
# ---------------------------------------------------------------------------


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.urls import canonicalize_url

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                b = d - d % 2
                if d % 2 == 0:
                    url = (
                        f"HTTPS://WWW.Example{b}.COM.:443//articles/./2024"
                        f"//..//item-{b}?utm_campaign=x&z=9&a=1&fbclid=zz#sec"
                    )
                else:
                    url = (
                        f"https://www.example{b}.com/articles//item-{b}"
                        f"/..//item-{b}?a=1&z=9&gclid=q"
                    )
                rows.append((d, canonicalize_url(url)))
            yield pd.DataFrame(rows, columns=["doc_id", "canon"])

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    canon = docs.mapInPandas(run, "doc_id BIGINT, canon STRING")
    return canon.groupBy("canon").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )


URL_CANONICAL_DEDUP_SQL = """
SELECT 'https://www.example' || CAST(doc_id - doc_id % 2 AS VARCHAR)
           || '.com/articles/item-' || CAST(doc_id - doc_id % 2 AS VARCHAR)
           || '?a=1&z=9' AS canon,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM documents
GROUP BY doc_id - doc_id % 2
"""


# ---------------------------------------------------------------------------
# robots_gate_stats — REGISTERED r10.  Crawl admission control
# (RFC 9309) as a production body: a fixed policy file exercising
# every semantic — group selection by longest user-agent prefix with
# '*' fallback, longest-match rule resolution, Allow-wins-ties,
# '*' wildcards and '$' end anchors — evaluated by the REAL parser
# (operators/robots.py, 20k-case fuzz vs a regex reference in pytest)
# against a per-doc path.  The oracle is the hand-derived RFC truth
# table over the same six path shapes; matched_len pins WHICH rule
# won, not just the verdict.
#
# ---------------------------------------------------------------------------

_ROBOTS_TXT = """# crawl policy
User-agent: engine-bot
Disallow: /private
Allow: /private/public
Disallow: /*.zip$
Allow: /downloads
Disallow: /tmp*x

User-agent: *
Disallow: /

Sitemap: https://h.io/s1.xml
Sitemap: https://h.io/s2.xml
"""

# path by doc_id % 6 → (allowed, winning-pattern octets) per RFC 9309
_ROBOTS_PATHS = [
    "/index.html",          # no rule → allowed, 0
    "/private/data",        # Disallow /private → denied, 8
    "/private/public/x",    # Allow beats shorter Disallow → allowed, 15
    "/downloads/file.zip",  # Allow(10) beats /*.zip$(7) → allowed, 10
    "/file.zip",            # /*.zip$ end anchor → denied, 7
    "/tmp123x/y",           # /tmp*x wildcard → denied, 6
]


def robots_gate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robots import gate, parse_robots

    parsed = parse_robots(_ROBOTS_TXT)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                path = _ROBOTS_PATHS[d % 6]
                allowed, mlen = gate(parsed, "Engine-Bot/2.1", path)
                other, olen = gate(parsed, "stranger-bot", path)
                rows.append(
                    (d, int(allowed), mlen, int(other), olen,
                     len(parsed["sitemaps"]))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "allowed", "matched_len", "other_allowed",
                         "other_len", "n_sitemaps"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, allowed BIGINT, matched_len BIGINT, "
        "other_allowed BIGINT, other_len BIGINT, n_sitemaps BIGINT",
    )


ROBOTS_GATE_STATS_SQL = """
SELECT doc_id,
       CAST(CASE doc_id % 6 WHEN 0 THEN 1 WHEN 1 THEN 0 WHEN 2 THEN 1
            WHEN 3 THEN 1 WHEN 4 THEN 0 ELSE 0 END AS BIGINT) AS allowed,
       CAST(CASE doc_id % 6 WHEN 0 THEN 0 WHEN 1 THEN 8 WHEN 2 THEN 15
            WHEN 3 THEN 10 WHEN 4 THEN 7 ELSE 6 END AS BIGINT) AS matched_len,
       CAST(0 AS BIGINT) AS other_allowed,
       CAST(1 AS BIGINT) AS other_len,
       CAST(2 AS BIGINT) AS n_sitemaps
FROM documents
"""


# ---------------------------------------------------------------------------
# sitemap_frontier_stats — REGISTERED r10.  The other half of
# the crawl frontier (robots admits, sitemaps enumerate): per doc the
# plan synthesizes a sitemaps.org document — a <sitemapindex> of child
# sitemaps every 4th doc, a <urlset> of page entries otherwise, with
# lastmod on alternating entries — parses it with REAL namespace-aware
# stdlib XML (operators/robots.py parse_sitemap), and emits what the
# PARSE found: kind, entry count, lastmod coverage, and the md5 of the
# ordered loc list (a dropped/reordered/mis-namespaced entry breaks
# it).  First XML-format ingestion in the engine.
#
# ---------------------------------------------------------------------------


def sitemap_frontier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robots import build_sitemap, parse_sitemap

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                k = 3 + d % 5
                if d % 4 == 0:
                    kind = "sitemapindex"
                    entries = [
                        {"loc": f"https://ex{d}.com/sitemap{i}.xml"}
                        for i in range(k)
                    ]
                else:
                    kind = "urlset"
                    entries = [
                        {
                            "loc": f"https://ex{d}.com/p/{i}",
                            **({"lastmod": f"2026-0{i % 9 + 1}-01"}
                               if i % 2 == 0 else {}),
                        }
                        for i in range(k)
                    ]
                parsed = parse_sitemap(build_sitemap(kind, entries))
                locs = "\n".join(e["loc"] for e in parsed["entries"])
                rows.append(
                    (
                        d,
                        parsed["kind"],
                        len(parsed["entries"]),
                        sum(1 for e in parsed["entries"] if e["lastmod"]),
                        hashlib.md5(locs.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "n_entries", "n_lastmod",
                         "locs_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, kind STRING, n_entries BIGINT, n_lastmod BIGINT, "
        "locs_md5 STRING",
    )


SITEMAP_FRONTIER_STATS_SQL = """
WITH e AS (
  SELECT doc_id, i.x AS i,
         CASE WHEN doc_id % 4 = 0
              THEN 'https://ex' || CAST(doc_id AS VARCHAR)
                   || '.com/sitemap' || CAST(i.x AS VARCHAR) || '.xml'
              ELSE 'https://ex' || CAST(doc_id AS VARCHAR)
                   || '.com/p/' || CAST(i.x AS VARCHAR) END AS loc,
         CASE WHEN doc_id % 4 <> 0 AND i.x % 2 = 0 THEN 1 ELSE 0 END
             AS has_lastmod
  FROM documents, range(8) i(x)
  WHERE i.x < 3 + doc_id % 5
)
SELECT doc_id,
       CASE WHEN doc_id % 4 = 0 THEN 'sitemapindex' ELSE 'urlset' END AS kind,
       CAST(COUNT(*) AS BIGINT) AS n_entries,
       CAST(SUM(has_lastmod) AS BIGINT) AS n_lastmod,
       md5(string_agg(loc, chr(10) ORDER BY i)) AS locs_md5
FROM e
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# srt_cue_stats — REGISTERED r10.  Caption ingestion for
# video-text pairing: per doc the plan synthesizes an SRT file whose
# cues carry the doc's words (3 words per cue, formula-driven integer
# timings with gaps), parses it with the REAL parser
# (operators/subtitles.py: cue blocks, HH:MM:SS,mmm → exact integer
# milliseconds), and emits what the PARSE recovered — cue count,
# exact speech/total durations, and the md5 of the reassembled
# transcript (must equal the oracle's reconstruction from the text
# column; a timing or text slip breaks it).
#
# ---------------------------------------------------------------------------

_SRT_WPC = 3        # words per cue
_SRT_CUE_MS = 1700  # cue duration
_SRT_GAP_MS = 300   # inter-cue gap


def srt_cue_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.subtitles import build_srt, parse_srt

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                words = str(t).split()
                groups = [
                    " ".join(words[i : i + _SRT_WPC])
                    for i in range(0, len(words), _SRT_WPC)
                ] or ["(silence)"]
                cues = [
                    (
                        i * (_SRT_CUE_MS + _SRT_GAP_MS),
                        i * (_SRT_CUE_MS + _SRT_GAP_MS) + _SRT_CUE_MS,
                        g,
                    )
                    for i, g in enumerate(groups)
                ]
                parsed = parse_srt(build_srt(cues))
                transcript = " ".join(c["text"] for c in parsed)
                speech = sum(c["end_ms"] - c["start_ms"] for c in parsed)
                rows.append(
                    (
                        d,
                        len(parsed),
                        speech,
                        parsed[-1]["end_ms"],
                        hashlib.md5(transcript.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_cues", "speech_ms", "span_ms",
                         "transcript_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_cues BIGINT, speech_ms BIGINT, span_ms BIGINT, "
        "transcript_md5 STRING",
    )


# n_cues = ceil(n_words / 3); the reassembled transcript equals the
# whitespace-normalized text (cues join word triples with single
# spaces, transcript joins cues with single spaces)
SRT_CUE_STATS_SQL = f"""
WITH norm AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '{_WS_CLASS}'),
                     t -> t <> '') AS words
  FROM documents
),
c AS (
  SELECT doc_id,
         CASE WHEN len(words) = 0 THEN 1
              ELSE (len(words) + {_SRT_WPC} - 1) // {_SRT_WPC} END AS n_cues,
         CASE WHEN len(words) = 0 THEN '(silence)'
              ELSE array_to_string(words, ' ') END AS transcript
  FROM norm
)
SELECT doc_id,
       CAST(n_cues AS BIGINT) AS n_cues,
       CAST(n_cues * {_SRT_CUE_MS} AS BIGINT) AS speech_ms,
       CAST((n_cues - 1) * {_SRT_CUE_MS + _SRT_GAP_MS} + {_SRT_CUE_MS}
            AS BIGINT) AS span_ms,
       md5(transcript) AS transcript_md5
FROM c
"""


# ---------------------------------------------------------------------------
# crawl_ingest_e2e — REGISTERED r10.  The whole crawl-ingest
# arc as ONE production body, the way the operators actually compose
# at harvest time: synthesize a WARC response whose HTTP body is an
# HTML page around the (escaped) text → parse_warc → split the HTTP
# message → per-block boilerplate extraction → emit the kept-content
# md5 and the funnel counters at every stage.  Every seam is load-
# bearing: a WARC framing slip corrupts the HTTP body, a header-split
# slip corrupts the HTML, an extraction slip breaks the md5 — one
# query pins the composition, not just the parts.
#
# ---------------------------------------------------------------------------


def crawl_ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html import boilerplate_extract
    from ..operators.warc import (
        build_http_response,
        build_warc,
        header,
        parse_warc,
        split_http_response,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import html as html_mod

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                page = (
                    f"<html><head><title>Doc&#233;{d % 100}</title></head>"
                    '<body><nav><a href="/">home</a> <a href="/a">about</a>'
                    ' <a href="/c">contact</a></nav>'
                    "<h1>alpha &amp; beta</h1>"
                    f"<p>{html_mod.escape(str(t))}</p>"
                    '<footer><a href="#">all rights reserved</a></footer>'
                    "</body></html>"
                )
                shard = build_warc([
                    ("warcinfo", {}, b"software: engine\r\n"),
                    ("response",
                     {"WARC-Target-URI": f"https://ex{d}.com/"},
                     build_http_response(page.encode("utf-8"))),
                ])
                recs = parse_warc(shard)
                resp = [r for r in recs
                        if header(r["headers"], "WARC-Type") == "response"]
                status, _, body = split_http_response(resp[0]["block"])
                kept, n_blocks, n_kept = boilerplate_extract(
                    body.decode("utf-8")
                )
                rows.append(
                    (
                        d,
                        len(recs),
                        status,
                        n_blocks,
                        n_kept,
                        hashlib.md5(kept.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_records", "status", "n_blocks",
                         "n_kept", "kept_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, n_records BIGINT, status BIGINT, n_blocks BIGINT, "
        "n_kept BIGINT, kept_md5 STRING",
    )


# page blocks: title, nav (drops), h1, article <p> (kept when >= 4
# non-ws chars), footer (drops) — no 2-char stub here, so n_blocks is
# 4 + (article non-empty), n_kept is 2 + (article >= 4 non-ws chars)
CRAWL_INGEST_E2E_SQL = f"""
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(text, '{_WS_CLASS}', ' ', 'g')) AS ntext,
         length(regexp_replace(text, '{_WS_CLASS}', '', 'g')) AS nonws
  FROM documents
)
SELECT doc_id,
       CAST(2 AS BIGINT) AS n_records,
       CAST(200 AS BIGINT) AS status,
       CAST(4 + CASE WHEN nonws > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_blocks,
       CAST(2 + CASE WHEN nonws >= 4 THEN 1 ELSE 0 END AS BIGINT) AS n_kept,
       md5('Docé' || CAST(doc_id % 100 AS VARCHAR) || chr(10)
           || 'alpha & beta'
           || CASE WHEN nonws >= 4 THEN chr(10) || ntext ELSE '' END)
           AS kept_md5
FROM norm
"""


# ---------------------------------------------------------------------------
# exif_gps_strip_stats — REGISTERED r10.  Image-side PII
# redaction: per doc the plan builds a real JPEG carrying an Exif APP1
# (byte order alternating II/MM, orientation, GPS latitude/longitude
# as exact rationals), PARSES it (TIFF IFD walk), STRIPS the GPS IFD
# (operators/exif.py — re-serialized APP1, image bytes untouched),
# re-parses to prove the GPS is gone and the orientation survived, and
# decodes the STRIPPED image to prove redaction never re-encodes
# pixels.  Emits the pre-strip coordinates (the evidence a redaction
# audit logs) and the post-strip GPS flag (always 0).
#
# ---------------------------------------------------------------------------


def exif_gps_strip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.exif import (
        TAG_GPS_LAT,
        TAG_GPS_LON,
        TAG_ORIENTATION,
        build_exif_jpeg,
        parse_exif_jpeg,
        strip_gps,
    )
    from ..operators.jpeg import decode_jpeg, encode_jpeg_gray

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                coefs = np.zeros((1, 1, 8, 8), dtype=np.int64)
                coefs[0, 0, 0, 0] = (d % 128 - 64) * 8
                base = encode_jpeg_gray(coef_blocks=coefs, shape=(8, 8))
                tagged = build_exif_jpeg(
                    base,
                    byte_order="II" if d % 2 == 0 else "MM",
                    orientation=d % 8 + 1,
                    gps=(
                        (d % 90, d % 60, d % 60), "N" if d % 4 < 2 else "S",
                        (d % 180, d % 60, d % 60), "E" if d % 3 < 2 else "W",
                    ),
                )
                before = parse_exif_jpeg(tagged)
                stripped = strip_gps(tagged)
                after = parse_exif_jpeg(stripped)
                img = decode_jpeg(stripped).astype(np.int64)
                rows.append(
                    (
                        d,
                        before["byte_order"],
                        after["ifd0"][TAG_ORIENTATION][2],
                        before["gps"][TAG_GPS_LAT][2][0][0],
                        before["gps"][TAG_GPS_LON][2][0][0],
                        int(bool(after["gps"])),
                        int(img.sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "byte_order", "orientation", "lat_deg",
                         "lon_deg", "gps_after", "img_sum"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, byte_order STRING, orientation BIGINT, "
        "lat_deg BIGINT, lon_deg BIGINT, gps_after BIGINT, img_sum BIGINT",
    )


EXIF_GPS_STRIP_STATS_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
       CAST(doc_id % 8 + 1 AS BIGINT) AS orientation,
       CAST(doc_id % 90 AS BIGINT) AS lat_deg,
       CAST(doc_id % 180 AS BIGINT) AS lon_deg,
       CAST(0 AS BIGINT) AS gps_after,
       CAST(64 * (doc_id % 128 + 64) AS BIGINT) AS img_sum
FROM documents
"""


# ---------------------------------------------------------------------------
# id3_metadata_stats — REGISTERED r10.  The audio metadata
# layer (titles/artists are the text half of audio-text pairs): per
# doc the plan builds an ID3v2.4 tag — odd docs carry an accented
# title so the encoding-byte dispatch (latin-1 vs UTF-8) is load-
# bearing — prepends it to a real MPEG stream, parses the FRAMES back
# (syncsafe sizes, padding stop), and re-walks the audio frames to
# prove the tag skip and the frame scan agree on the same bytes.
#
# ---------------------------------------------------------------------------


def id3_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.containers import (
        build_id3v2,
        build_mp3,
        parse_id3_frames,
        scan_mp3_frames,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                title = f"Track {d % 1000}" + (" é" if d % 2 else "")
                tag = build_id3v2(
                    {"TIT2": title, "TPE1": f"Artist {d % 50}",
                     "TALB": f"Album {d % 20}"},
                    padding=d % 9,
                )
                payload = tag + build_mp3([(5, 0)] * (2 + d % 3))
                frames = parse_id3_frames(payload)
                scan = scan_mp3_frames(payload)
                rows.append(
                    (
                        d,
                        frames["TIT2"],
                        frames["TPE1"],
                        frames["TALB"],
                        scan["n_frames"],
                        scan["id3v2_bytes"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "title", "artist", "album", "n_frames",
                         "tag_bytes"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, title STRING, artist STRING, album STRING, "
        "n_frames BIGINT, tag_bytes BIGINT",
    )


# tag_bytes = 10 (header) + Σ frames (10 + 1 + byte-len(text)) + padding:
# frame text is latin-1 for even docs and UTF-8 for odd ('é' = 2 bytes)
ID3_METADATA_STATS_SQL = """
WITH v AS (
  SELECT doc_id,
         'Track ' || CAST(doc_id % 1000 AS VARCHAR)
             || CASE WHEN doc_id % 2 = 1 THEN ' é' ELSE '' END AS title,
         'Artist ' || CAST(doc_id % 50 AS VARCHAR) AS artist,
         'Album ' || CAST(doc_id % 20 AS VARCHAR) AS album
  FROM documents
)
SELECT doc_id, title, artist, album,
       CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
       CAST(10
            + 11 + strlen(title)
            + 11 + strlen(artist)
            + 11 + strlen(album)
            + doc_id % 9 AS BIGINT) AS tag_bytes
FROM v
"""


# ---------------------------------------------------------------------------
# archive_member_stats — REGISTERED r10.  Dataset shards ship
# as tar/zip archives of member files; the ingest seam must explode
# them 1→N before any per-document operator can run.  Per doc the plan
# builds a deterministic archive (tar for even docs, zip for odd —
# BOTH stdlib parsers behind one sniffing list_archive), explodes it
# to one row per member, and emits each member's name, size, and
# content md5 — a dropped, reordered, or corrupted member breaks the
# row set exactly.
#
# ---------------------------------------------------------------------------


def archive_member_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.containers import build_tar, build_zip, list_archive

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                members = [
                    (
                        f"docs/part{i}.txt",
                        (f"m{i}:" + "x" * (d % 50 + i)).encode("ascii"),
                    )
                    for i in range(2 + d % 4)
                ]
                payload = (build_tar if d % 2 == 0 else build_zip)(members)
                kind = "tar" if d % 2 == 0 else "zip"
                for name, content in list_archive(payload):
                    rows.append(
                        (
                            d,
                            kind,
                            name,
                            len(content),
                            hashlib.md5(content).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "name", "n_bytes", "member_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, kind STRING, name STRING, n_bytes BIGINT, "
        "member_md5 STRING",
    )


ARCHIVE_MEMBER_STATS_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'tar' ELSE 'zip' END AS kind,
       'docs/part' || CAST(i.x AS VARCHAR) || '.txt' AS name,
       CAST(2 + strlen(CAST(i.x AS VARCHAR)) + doc_id % 50 + i.x
            AS BIGINT) AS n_bytes,
       md5('m' || CAST(i.x AS VARCHAR) || ':'
           || repeat('x', CAST(doc_id % 50 + i.x AS INT))) AS member_md5
FROM documents, range(6) i(x)
WHERE i.x < 2 + doc_id % 4
"""


# ---------------------------------------------------------------------------
# jsonl_shard_explode — REGISTERED r10.  THE LLM-dataset wire
# format: corpora ship as JSONL shards, one JSON object per line, and
# the ingest seam explodes a shard 1→N with a real JSON parse before
# any per-document operator runs (json_extraction covers Spark-side
# JSON path functions over a column; this is the shard-level fan-out
# with Python's json, escapes and all).  Per doc the plan builds a
# k-line shard whose records carry the doc's text (JSON-escaped — the
# round trip pins escape handling), a nested meta object, and an
# integer id; parses each line back; and emits one row per record
# with the recovered fields.
#
# ---------------------------------------------------------------------------


def jsonl_shard_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import json

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                records = [
                    {
                        "id": d * 10 + i,
                        "text": f'{t} "rec {i}"\n\ttail',
                        "meta": {"source": f"s{d % 5}", "rank": i * i},
                    }
                    for i in range(1 + d % 4)
                ]
                shard = "\n".join(json.dumps(r, ensure_ascii=False)
                                  for r in records)
                # split on '\n' ONLY (the separator build uses):
                # splitlines() would also split on U+2028/U+2029/U+0085,
                # which json.dumps(ensure_ascii=False) leaves unescaped
                # inside strings — a doc containing them would shear a
                # record mid-line
                for line in shard.split("\n"):
                    rec = json.loads(line)
                    rows.append(
                        (
                            d,
                            rec["id"],
                            hashlib.md5(rec["text"].encode("utf-8")).hexdigest(),
                            rec["meta"]["source"],
                            rec["meta"]["rank"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "rec_id", "text_md5", "source", "rank"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, rec_id BIGINT, text_md5 STRING, source STRING, "
        "rank BIGINT",
    )


# the record text embeds quotes, a newline, and a tab — json escape
# round-trip is load-bearing; the oracle reconstructs the unescaped form
JSONL_SHARD_EXPLODE_SQL = """
SELECT doc_id,
       CAST(doc_id * 10 + i.x AS BIGINT) AS rec_id,
       md5(text || ' "rec ' || CAST(i.x AS VARCHAR) || '"' || chr(10)
           || chr(9) || 'tail') AS text_md5,
       's' || CAST(doc_id % 5 AS VARCHAR) AS source,
       CAST(i.x * i.x AS BIGINT) AS rank
FROM documents, range(4) i(x)
WHERE i.x < 1 + doc_id % 4
"""


# ---------------------------------------------------------------------------
# r10 registrations (VERDICT r09 task 1: drain the whole queue in one
# window).  Every query below was oracle-exact at sf0.001 AND sf0.01 in
# pytest (tests/test_curation13.py) before registration.
# ---------------------------------------------------------------------------
CURATION13_QUERIES["multi_codec_roundtrip_stats"] = multi_codec_roundtrip_stats
CURATION13_ORACLE_SQL["multi_codec_roundtrip_stats"] = MULTI_CODEC_ROUNDTRIP_STATS_SQL
CURATION13_QUERIES["mojibake_repair_stats"] = mojibake_repair_stats
CURATION13_ORACLE_SQL["mojibake_repair_stats"] = MOJIBAKE_REPAIR_STATS_SQL
CURATION13_QUERIES["parquet_footer_probe"] = parquet_footer_probe
CURATION13_ORACLE_SQL["parquet_footer_probe"] = PARQUET_FOOTER_PROBE_SQL
CURATION13_QUERIES["blocklist_match_stats"] = blocklist_match_stats
CURATION13_ORACLE_SQL["blocklist_match_stats"] = BLOCKLIST_MATCH_STATS_SQL
CURATION13_QUERIES["warc_record_stats"] = warc_record_stats
CURATION13_ORACLE_SQL["warc_record_stats"] = WARC_RECORD_STATS_SQL
CURATION13_QUERIES["html_extract_stats"] = html_extract_stats
CURATION13_ORACLE_SQL["html_extract_stats"] = HTML_EXTRACT_STATS_SQL
CURATION13_QUERIES["html_boilerplate_extract"] = html_boilerplate_extract
CURATION13_ORACLE_SQL["html_boilerplate_extract"] = HTML_BOILERPLATE_EXTRACT_SQL
CURATION13_QUERIES["video_fingerprint_neardup"] = video_fingerprint_neardup
CURATION13_ORACLE_SQL["video_fingerprint_neardup"] = VIDEO_FP_NEARDUP_SQL
CURATION13_QUERIES["url_canonical_dedup"] = url_canonical_dedup
CURATION13_ORACLE_SQL["url_canonical_dedup"] = URL_CANONICAL_DEDUP_SQL
CURATION13_QUERIES["robots_gate_stats"] = robots_gate_stats
CURATION13_ORACLE_SQL["robots_gate_stats"] = ROBOTS_GATE_STATS_SQL
CURATION13_QUERIES["sitemap_frontier_stats"] = sitemap_frontier_stats
CURATION13_ORACLE_SQL["sitemap_frontier_stats"] = SITEMAP_FRONTIER_STATS_SQL
CURATION13_QUERIES["srt_cue_stats"] = srt_cue_stats
CURATION13_ORACLE_SQL["srt_cue_stats"] = SRT_CUE_STATS_SQL
CURATION13_QUERIES["crawl_ingest_e2e"] = crawl_ingest_e2e
CURATION13_ORACLE_SQL["crawl_ingest_e2e"] = CRAWL_INGEST_E2E_SQL
CURATION13_QUERIES["exif_gps_strip_stats"] = exif_gps_strip_stats
CURATION13_ORACLE_SQL["exif_gps_strip_stats"] = EXIF_GPS_STRIP_STATS_SQL
CURATION13_QUERIES["id3_metadata_stats"] = id3_metadata_stats
CURATION13_ORACLE_SQL["id3_metadata_stats"] = ID3_METADATA_STATS_SQL
CURATION13_QUERIES["archive_member_stats"] = archive_member_stats
CURATION13_ORACLE_SQL["archive_member_stats"] = ARCHIVE_MEMBER_STATS_SQL
CURATION13_QUERIES["jsonl_shard_explode"] = jsonl_shard_explode
CURATION13_ORACLE_SQL["jsonl_shard_explode"] = JSONL_SHARD_EXPLODE_SQL
