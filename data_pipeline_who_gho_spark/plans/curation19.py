"""Round-11 crawl-ingest extension: PDF TEXT EXTRACTION — the named
r10 VERDICT gap (the WARC -> HTML arc stopped at HTML; real crawl
corpora are full of PDFs).  Fixtures are synthesized per doc with the
real writer in ``operators/pdf.py`` (FlateDecode streams, xref,
Tj/TJ/' show ops with escapes and hex strings) and decoded with the
real reader — the same synthesize-encode-decode-oracle contract as
``operators/warc.py``/``html.py``.

``pdf_text_extract_stats`` — per doc: a multi-page PDF built from a
parens-and-backslash title line plus the doc text in 64-char lines,
5 lines per page; the query decodes it and reports page/op counts and
the md5 of the full extracted text, all replayed exactly by the
oracle from the construction rule.  r12 made the fixture mix
alternate LAYOUTS by doc parity (classic PDF 1.4 vs PDF 1.5+
ObjStm/xref-stream); r13 widens it to FOUR layouts by ``doc_id %%4``,
adding ``simplefont`` (WinAnsi + /Differences single-byte hex strings
— the common wild form, decoded through the font's /Encoding) and
``hybrid`` (classic base + PDF 1.5 incremental update whose /Prev
chain mixes an xref STREAM hop with a classic TABLE hop).  Extracted
text must be byte-identical across all four, and the ``layout``
column pins which loader/decoder ran.

``crawl_pdf_funnel`` — the dispatch composition: a WARC per doc with
an ``application/pdf`` response and a ``text/plain`` response; records
route by Content-Type to the matching extractor.  This is the shape a
production funnel has (one scan, per-record format dispatch), with
per-record provenance in the output.

Scale: both are map-only Arrow passes over ``spread_for_python``
partitions — no joins, no state; the per-doc Python cost is the codec
itself, same posture as the JPEG/FLAC decode queries whose 4→32-core
strong scaling is measured in SCALING.md.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_table, spread_for_python

CURATION19_QUERIES: dict = {}
CURATION19_ORACLE_SQL: dict = {}

_LINE_W = 64   # chars of doc text per PDF line
_PAGE_LINES = 5
# doc_id %% 4 -> writer layout; extracted text is layout-invariant
_LAYOUTS = ["classic", "xrefstream", "simplefont", "hybrid"]


def _doc_lines(doc_id: int, lang: str, text: str) -> list[str]:
    """The synthesized line list: a title line exercising literal-
    string escapes (parens + backslash), then 64-char slices."""
    lines = [f"Doc ({doc_id}) \\ {lang}"]
    lines += [text[i:i + _LINE_W] for i in range(0, len(text), _LINE_W)]
    return lines


def _doc_pages(doc_id: int, lang: str, text: str) -> list[list[str]]:
    lines = _doc_lines(doc_id, lang, text)
    return [
        lines[i:i + _PAGE_LINES]
        for i in range(0, len(lines), _PAGE_LINES)
    ]


def pdf_text_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pdf import build_pdf, extract_pdf_text

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf_batch in batches:
            rows = []
            for doc_id, lang, t in zip(
                pdf_batch["doc_id"], pdf_batch["lang"], pdf_batch["text"]
            ):
                d = int(doc_id)
                layout = _LAYOUTS[d % 4]
                payload = build_pdf(
                    _doc_pages(d, str(lang), str(t)), layout=layout
                )
                res = extract_pdf_text(payload)
                full = "\n".join(res["pages"])
                rows.append(
                    (
                        d,
                        layout,
                        res["n_pages"],
                        res["n_show_ops"],
                        len(payload),
                        hashlib.md5(full.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "layout", "n_pages", "n_show_ops",
                         "pdf_bytes", "text_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        )
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, layout STRING, n_pages BIGINT, n_show_ops BIGINT, "
        "pdf_bytes BIGINT, text_md5 STRING",
    ).drop("pdf_bytes")  # zlib-dependent size: useful locally, not pinned


# the oracle replays the construction: title line + 64-char slices,
# one show op per line, ceil(n_lines / 5) pages
PDF_TEXT_EXTRACT_STATS_SQL = f"""
WITH slices AS (
  SELECT doc_id, u.i AS i,
         substr(text, u.i * {_LINE_W} + 1, {_LINE_W}) AS line
  FROM documents,
       unnest(generate_series(
           0, CAST(ceil(length(text) / {_LINE_W}.0) AS BIGINT) - 1)) u(i)
),
body AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS btext,
         COUNT(*) AS n_body
  FROM slices GROUP BY doc_id
)
SELECT d.doc_id,
       CASE d.doc_id % 4 WHEN 0 THEN 'classic' WHEN 1 THEN 'xrefstream'
            WHEN 2 THEN 'simplefont' ELSE 'hybrid' END AS layout,
       CAST(ceil((1 + COALESCE(b.n_body, 0)) / {_PAGE_LINES}.0) AS BIGINT)
           AS n_pages,
       CAST(1 + COALESCE(b.n_body, 0) AS BIGINT) AS n_show_ops,
       md5('Doc (' || CAST(d.doc_id AS VARCHAR) || ') \\ ' || d.lang
           || COALESCE(chr(10) || b.btext, '')) AS text_md5
FROM documents d LEFT JOIN body b USING (doc_id)
"""


def crawl_pdf_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pdf import build_pdf, extract_pdf_text
    from ..operators.warc import (
        build_http_response,
        build_warc,
        header,
        parse_warc,
        split_http_response,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf_batch in batches:
            rows = []
            for doc_id, lang, t in zip(
                pdf_batch["doc_id"], pdf_batch["lang"], pdf_batch["text"]
            ):
                d, text = int(doc_id), str(t)
                site = f"https://site{d % 50}.example"
                pdf_payload = build_pdf(_doc_pages(d, str(lang), text))
                warc = build_warc([
                    (
                        "response",
                        {"WARC-Target-URI": f"{site}/doc{d}.pdf"},
                        build_http_response(
                            pdf_payload, content_type="application/pdf"
                        ),
                    ),
                    (
                        "response",
                        {"WARC-Target-URI": f"{site}/doc{d}.txt"},
                        build_http_response(
                            text.encode("utf-8"),
                            content_type="text/plain; charset=utf-8",
                        ),
                    ),
                ])
                for rec in parse_warc(warc):
                    if rec["headers"].get("WARC-Type") != "response":
                        continue
                    status, hh, body = split_http_response(rec["block"])
                    ctype = (header(hh, "Content-Type") or "").split(";")[0]
                    if ctype == "application/pdf":
                        res = extract_pdf_text(body)
                        extracted = "\n".join(res["pages"])
                        kind, n_pages = "pdf", res["n_pages"]
                    elif ctype == "text/plain":
                        extracted = body.decode("utf-8")
                        kind, n_pages = "plain", 0
                    else:  # funnel contract: unknown types are skipped
                        continue
                    rows.append(
                        (
                            d,
                            rec["headers"].get("WARC-Target-URI", ""),
                            kind,
                            n_pages,
                            hashlib.md5(
                                extracted.encode("utf-8")
                            ).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "url", "kind", "n_pages", "text_md5"],
            )

    docs = spread_for_python(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        )
    )
    return docs.mapInPandas(
        run,
        "doc_id BIGINT, url STRING, kind STRING, n_pages BIGINT, "
        "text_md5 STRING",
    )


CRAWL_PDF_FUNNEL_SQL = f"""
WITH slices AS (
  SELECT doc_id, u.i AS i,
         substr(text, u.i * {_LINE_W} + 1, {_LINE_W}) AS line
  FROM documents,
       unnest(generate_series(
           0, CAST(ceil(length(text) / {_LINE_W}.0) AS BIGINT) - 1)) u(i)
),
body AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS btext,
         COUNT(*) AS n_body
  FROM slices GROUP BY doc_id
)
SELECT d.doc_id,
       'https://site' || CAST(d.doc_id % 50 AS VARCHAR) || '.example/doc'
           || CAST(d.doc_id AS VARCHAR) || '.pdf' AS url,
       'pdf' AS kind,
       CAST(ceil((1 + COALESCE(b.n_body, 0)) / {_PAGE_LINES}.0) AS BIGINT)
           AS n_pages,
       md5('Doc (' || CAST(d.doc_id AS VARCHAR) || ') \\ ' || d.lang
           || COALESCE(chr(10) || b.btext, '')) AS text_md5
FROM documents d LEFT JOIN body b USING (doc_id)
UNION ALL
SELECT doc_id,
       'https://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/doc'
           || CAST(doc_id AS VARCHAR) || '.txt' AS url,
       'plain' AS kind,
       CAST(0 AS BIGINT) AS n_pages,
       md5(text) AS text_md5
FROM documents
"""


CURATION19_QUERIES["pdf_text_extract_stats"] = pdf_text_extract_stats
CURATION19_ORACLE_SQL["pdf_text_extract_stats"] = PDF_TEXT_EXTRACT_STATS_SQL
CURATION19_QUERIES["crawl_pdf_funnel"] = crawl_pdf_funnel
CURATION19_ORACLE_SQL["crawl_pdf_funnel"] = CRAWL_PDF_FUNNEL_SQL
