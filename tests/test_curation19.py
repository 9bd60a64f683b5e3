"""Round-11 PDF text extraction (operators/pdf.py,
plans/curation19.py): writer/reader round-trip, content-stream
tokenizer semantics, and the WARC dispatch funnel."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-curation19")


def _oracle(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_pdf_roundtrip_and_escapes():
    """build -> extract round-trips lines exactly, including the
    literal-string escape set (parens, backslash, control chars),
    nested balanced parens, and non-Latin-1 via hex strings."""
    from data_pipeline_who_gho_spark.operators.pdf import (
        build_pdf,
        extract_pdf_text,
    )

    pages = [
        ["Doc (1) \\ en", "tab\there and (nested (parens)) ok",
         "back\\slash\\es", "café München", "中文 and \U0001f680"],
        ["page two", "short"],
    ]
    res = extract_pdf_text(build_pdf(pages))
    assert res["n_pages"] == 2
    assert res["pages"] == ["\n".join(p) for p in pages]
    # one show op per line
    assert res["n_show_ops"] == sum(len(p) for p in pages)


def test_pdf_roundtrip_fuzz():
    """Random line content (heavy in parens/backslashes/newlines-free
    specials) must survive the writer/reader pair byte-exactly."""
    import random

    from data_pipeline_who_gho_spark.operators.pdf import (
        build_pdf,
        extract_pdf_text,
    )

    rng = random.Random(1901)
    alpha = "ab ()\\%<>[]/.#012\té中"
    for _ in range(40):
        pages = [
            [
                "".join(rng.choice(alpha)
                        for _ in range(rng.randint(1, 60)))
                for _ in range(rng.randint(1, 6))
            ]
            for _ in range(rng.randint(1, 3))
        ]
        got = extract_pdf_text(build_pdf(pages))["pages"]
        assert got == ["\n".join(p) for p in pages]


def test_pdf_content_stream_operator_semantics():
    """Direct tokenizer pins: ' starts a new line then shows, T* breaks
    lines, TJ concatenates string elements ignoring kern numbers,
    octal escapes and line continuations decode, Td with zero vertical
    move does NOT break the line."""
    import zlib

    from data_pipeline_who_gho_spark.operators.pdf import (
        extract_stream_text,
    )

    ops = (
        b"BT /F1 12 Tf 72 720 Td (first) Tj"
        b" 10 0 Td (-same-line) Tj"
        b" 0 -14 TD [(a) -250 (b) 120 (c)] TJ"
        b" (third) '"
        b" T* (fou\\162th \\(q\\)) Tj"
        b" (conti\\\nnued) Tj"
        b" ET"
    )
    lines, n = extract_stream_text(zlib.decompress(zlib.compress(ops)))
    assert lines == ["first-same-line", "abc", "third",
                     "fourth (q)continued"]
    assert n == 6


def test_pdf_error_contracts():
    """Honest boundaries: non-PDF, non-Flate filters, a /Prev that
    points into non-object bytes, encryption, TIFF predictors, and
    font-encoded hex strings fail loudly with the documented
    exception types."""
    from data_pipeline_who_gho_spark.operators.pdf import (
        _stream_data,
        build_pdf,
        extract_pdf_text,
        extract_stream_text,
    )

    with pytest.raises(ValueError):
        extract_pdf_text(b"GIF89a not a pdf")
    with pytest.raises(NotImplementedError):
        _stream_data(
            b"<< /Length 4 /Filter /LZWDecode >>\nstream\nXXXX\nendstream"
        )
    # a malformed ObjStm (no /N or /First) is a loud ValueError
    objstm = (
        b"%PDF-1.5\n1 0 obj\n<< /Type /ObjStm /Length 2 >>\n"
        b"stream\nxx\nendstream\nendobj\n"
    )
    with pytest.raises(ValueError):
        extract_pdf_text(objstm)
    modern = build_pdf([["hello there"]], layout="xrefstream")
    with pytest.raises(ValueError):  # /Prev into non-object bytes
        extract_pdf_text(modern.replace(b"/Type /XRef", b"/Type /XRef /Prev 9"))
    with pytest.raises(NotImplementedError):  # encryption
        extract_pdf_text(
            modern.replace(b"/Type /XRef", b"/Type /XRef /Encrypt 9 0 R")
        )
    with pytest.raises(NotImplementedError):  # TIFF predictor
        extract_pdf_text(modern.replace(b"/Predictor 12", b"/Predictor 2"))
    # hex strings: odd byte count / non-UTF-16BE without a BOM are the
    # single-byte font-encoded edge (ADVICE r11), not a silent misdecode
    with pytest.raises(NotImplementedError):
        extract_stream_text(b"BT <414243> Tj ET")
    with pytest.raises(NotImplementedError):
        extract_stream_text(b"BT <d800d800> Tj ET")  # lone surrogates
    # truncated stream
    pdf = bytearray(build_pdf([["hello there"]]))
    with pytest.raises(ValueError):
        extract_pdf_text(bytes(pdf).replace(b"endstream", b"endstreXm"))


def test_pdf_xrefstream_layout_roundtrip():
    """The PDF 1.5+ writer/reader pair: ObjStm packing + /Type /XRef
    W-field entries under the PNG Up predictor must reproduce the
    exact text the classic layout yields."""
    from data_pipeline_who_gho_spark.operators.pdf import (
        build_pdf,
        extract_pdf_text,
    )

    pages = [
        ["Doc (1) \\ en", "tab\there and (nested (parens)) ok",
         "back\\slash\\es", "café München", "中文 and \U0001f680"],
        ["page two", "short"],
    ]
    classic = extract_pdf_text(build_pdf(pages, layout="classic"))
    modern = extract_pdf_text(build_pdf(pages, layout="xrefstream"))
    assert modern["pages"] == classic["pages"] == ["\n".join(p) for p in pages]
    assert modern["n_pages"] == classic["n_pages"] == 2
    assert modern["n_show_ops"] == classic["n_show_ops"]
    # the modern file adds exactly the ObjStm + XRef stream objects
    assert modern["n_objects"] == classic["n_objects"] + 2


def test_png_unpredict_all_filters():
    """Decode side of the xref-stream predictor: every PNG filter type
    (None/Sub/Up/Average/Paeth) reverses exactly; the writer's Up
    encoder round-trips through it."""
    import random

    from data_pipeline_who_gho_spark.operators.pdf import (
        _png_predict_up,
        _png_unpredict,
    )

    rng = random.Random(1912)
    raw = bytes(rng.randrange(256) for _ in range(6 * 10))
    assert _png_unpredict(_png_predict_up(raw, 6), 6) == raw

    # hand-encode one row per filter type against a known previous row
    def enc(ft, row, prev):
        if ft == 0:
            return bytes(row)
        if ft == 1:
            return bytes((row[i] - (row[i - 1] if i else 0)) & 0xFF
                         for i in range(len(row)))
        if ft == 2:
            return bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        if ft == 3:
            return bytes(
                (row[i] - ((row[i - 1] if i else 0) + prev[i]) // 2) & 0xFF
                for i in range(len(row))
            )
        out = []
        for i in range(len(row)):
            a = row[i - 1] if i else 0
            b, c = prev[i], (prev[i - 1] if i else 0)
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((row[i] - pred) & 0xFF)
        return bytes(out)

    rows = [bytes(rng.randrange(256) for _ in range(5)) for _ in range(5)]
    data = bytearray()
    prev = bytes(5)
    for ft, row in enumerate(rows):
        data.append(ft)
        data += enc(ft, row, prev)
        prev = row
    assert _png_unpredict(bytes(data), 5) == b"".join(rows)


def test_pdf_text_extract_stats_matches_oracle(spark):
    from data_pipeline_who_gho_spark.plans.curation19 import (
        PDF_TEXT_EXTRACT_STATS_SQL,
        pdf_text_extract_stats,
    )

    got = sorted(
        tuple(r) for r in pdf_text_extract_stats(spark, SF).collect()
    )
    assert got == _oracle(PDF_TEXT_EXTRACT_STATS_SQL)
    assert all(r[2] >= 1 and r[3] >= 2 for r in got)  # multi-line docs
    assert {r[1] for r in got} == {"classic", "xrefstream"}  # both loaders


def test_crawl_pdf_funnel_matches_oracle(spark):
    from data_pipeline_who_gho_spark.plans.curation19 import (
        CRAWL_PDF_FUNNEL_SQL,
        crawl_pdf_funnel,
    )

    got = sorted(tuple(r) for r in crawl_pdf_funnel(spark, SF).collect())
    assert got == _oracle(CRAWL_PDF_FUNNEL_SQL)
    kinds = {r[2] for r in got}
    assert kinds == {"pdf", "plain"}  # both branches exercised


def test_pdf_incremental_update_prev_chain():
    """A real in-place update: append a replacement content stream and
    a second xref stream whose /Prev points at the base xref — the
    reader must follow the chain newest-first, so page 1 extracts the
    REVISED text while untouched pages come from the base revision
    (ISO 32000-1 §7.5.6 first-entry-wins)."""
    import re
    import zlib

    from data_pipeline_who_gho_spark.operators.pdf import (
        _show_ops,
        build_pdf,
        extract_pdf_text,
    )

    pages = [["original first page"], ["second page stays"]]
    base = build_pdf(pages, layout="xrefstream")
    base_xref_at = int(
        re.search(rb"startxref\s+(\d+)", base[-256:]).group(1)
    )
    base_size = int(re.search(rb"/Size (\d+)", base).group(1))

    # page 1's /Contents is object 5 (catalog 1, pages 2, font 3,
    # page dicts 4/6, content streams 5/7 — same ids as the writer)
    stream = zlib.compress(_show_ops(["REVISED first page"]), 9)
    obj5 = (
        f"<< /Length {len(stream)} /Filter /FlateDecode >>\n".encode()
        + b"stream\n" + stream + b"\nendstream"
    )
    out = bytearray(base)
    off5 = len(out)
    out += b"5 0 obj\n" + obj5 + b"\nendobj\n"
    xref_num = base_size            # next free object number
    xref_at = len(out)
    rows = bytearray()
    for t, f2, f3 in ((1, off5, 0), (1, xref_at, 0)):
        rows.append(t)
        rows.extend(f2.to_bytes(3, "big"))
        rows.extend(f3.to_bytes(2, "big"))
    xdata = zlib.compress(bytes(rows), 9)   # no predictor: that path too
    out += f"{xref_num} 0 obj\n".encode()
    out += (
        f"<< /Type /XRef /Size {xref_num + 1} /Root 1 0 R /W [1 3 2] "
        f"/Index [5 1 {xref_num} 1] /Filter /FlateDecode "
        f"/Prev {base_xref_at} /Length {len(xdata)} >>\n".encode()
    )
    out += b"stream\n" + xdata + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()

    res = extract_pdf_text(bytes(out))
    assert res["pages"] == ["REVISED first page", "second page stays"]
    # base revision still extracts standalone
    assert extract_pdf_text(base)["pages"] == [
        "original first page", "second page stays"]


def test_pdf_nested_page_tree_and_contents_array():
    """Real-PDF structures the flat writer doesn't emit: intermediate
    /Pages nodes (wide docs balance into trees) and a /Contents ARRAY
    whose parts reassemble into one logical stream.  Handcrafted
    classic file — the offset-free scan ignores xref offsets, so the
    object graph alone defines the document."""
    import zlib

    from data_pipeline_who_gho_spark.operators.pdf import (
        extract_pdf_text,
    )

    def stream_obj(ops: bytes) -> bytes:
        data = zlib.compress(ops, 9)
        return (
            f"<< /Length {len(data)} /Filter /FlateDecode >>\n".encode()
            + b"stream\n" + data + b"\nendstream"
        )

    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        # root -> two intermediate /Pages nodes -> leaves (4, then 6 7)
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 3 >>",
        3: b"<< /Type /Pages /Parent 2 0 R /Kids [4 0 R] /Count 1 >>",
        5: b"<< /Type /Pages /Parent 2 0 R /Kids [6 0 R 7 0 R] /Count 2 >>",
        # leaf with a /Contents ARRAY split mid-page (token-boundary)
        4: b"<< /Type /Page /Parent 3 0 R /Contents [8 0 R 9 0 R] >>",
        6: b"<< /Type /Page /Parent 5 0 R /Contents 10 0 R >>",
        7: b"<< /Type /Page /Parent 5 0 R >>",  # page without contents
        8: stream_obj(b"BT /F1 12 Tf 72 720 Td (part one) Tj"),
        9: stream_obj(b"0 -14 TD (part two) Tj ET"),
        10: stream_obj(b"BT (middle leaf) Tj ET"),
    }
    out = bytearray(b"%PDF-1.4\n")
    for num in sorted(objs):
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n"
    out += b"trailer\n<< /Size 11 /Root 1 0 R >>\n"
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()

    res = extract_pdf_text(bytes(out))
    assert res["n_pages"] == 3
    assert res["pages"] == ["part one\npart two", "middle leaf", ""]
    assert res["n_show_ops"] == 3
