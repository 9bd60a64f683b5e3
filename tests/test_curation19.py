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
    with pytest.raises(NotImplementedError):  # sub-8-bpc predictors
        extract_pdf_text(modern.replace(
            b"/Predictor 12", b"/Predictor 12 /BitsPerComponent 4"))
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
    assert {r[1] for r in got} == {
        "classic", "xrefstream", "simplefont", "hybrid"}  # all loaders


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


# ---------------------------------------------------------------------------
# round 13: simple fonts, hybrid chains, winner-aware ObjStm expansion
# ---------------------------------------------------------------------------


def test_pdf_simplefont_roundtrip_and_wire_form():
    """The simplefont layout emits UNTAGGED single-byte hex strings
    (WinAnsi base + /Differences remapping parens/backslash to control
    codes) — the common wild-PDF form; extraction must round-trip
    through the font's /Encoding, and the wire must actually contain
    the remapped codes (not BOM-tagged UTF-16)."""
    import zlib

    from data_pipeline_who_gho_spark.operators.pdf import (
        _stream_data,
        build_pdf,
        extract_pdf_text,
    )

    pages = [
        ["Doc (9) \\ fr", "plain ascii line", "café — WinAnsi €uro"],
        ["page two (parens) again"],
    ]
    payload = build_pdf(pages, layout="simplefont")
    res = extract_pdf_text(payload)
    assert res["pages"] == ["\n".join(p) for p in pages]
    assert res["n_show_ops"] == sum(len(p) for p in pages)
    # wire check: the first page's content stream (obj 6 — simplefont
    # numbering has the /Encoding dict at 4, pages from 5) holds
    # untagged hex with the /Differences codes 01/02/03 and no BOM
    import re as _re

    m = _re.search(rb"6 0 obj\n(.*?)endobj", payload, _re.S)
    data = _stream_data(m.group(1))
    hexes = _re.findall(rb"<([0-9a-f]+)>", data)
    assert hexes, "simplefont page must use hex strings"
    first = bytes.fromhex(hexes[0].decode())
    assert not first.startswith(b"\xfe\xff")
    assert 1 in first and 2 in first and 3 in first  # ( ) \ remapped


def test_pdf_simplefont_non_winansi_falls_back_to_utf16():
    """Chars with no single-byte code (CJK) fall back to BOM-tagged
    UTF-16BE hex inside a simplefont doc — both forms must decode in
    one stream."""
    from data_pipeline_who_gho_spark.operators.pdf import (
        build_pdf,
        extract_pdf_text,
    )

    pages = [["ascii ok", "中文行 cannot WinAnsi"]]
    assert extract_pdf_text(build_pdf(pages, layout="simplefont"))[
        "pages"
    ] == ["\n".join(pages[0])]


def test_pdf_untagged_hex_never_guessed_as_utf16():
    """ADVICE r12 medium: <41424344> is valid UTF-16BE ('䅂䍄') — with
    no single-byte font map in force it must raise, never silently
    misdecode; with a font map it must decode as font codes."""
    import pytest as _pytest

    from data_pipeline_who_gho_spark.operators.pdf import (
        extract_stream_text,
    )

    ops = b"BT /F1 12 Tf <41424344> Tj ET"
    with _pytest.raises(NotImplementedError):
        extract_stream_text(ops)
    winansi = {c: chr(c) for c in range(32, 127)}
    lines, n = extract_stream_text(ops, fonts={"F1": winansi})
    assert lines == ["ABCD"] and n == 1


def test_pdf_encoding_edges_raise():
    """Unknown glyph names, non-WinAnsi base encodings, and font codes
    with no encoding entry are explicit NotImplementedError edges."""
    import pytest as _pytest

    from data_pipeline_who_gho_spark.operators.pdf import (
        _encoding_map,
        extract_stream_text,
    )

    with _pytest.raises(NotImplementedError):
        _encoding_map(
            {},
            b"<< /Type /Font /Encoding << /BaseEncoding /WinAnsiEncoding"
            b" /Differences [ 5 /glyphXYZZY ] >> >>",
        )
    # MacRoman is implemented (stdlib mac_roman IS the table); an
    # unknown base encoding still raises
    mac = _encoding_map(
        {}, b"<< /Type /Font /Encoding /MacRomanEncoding >>"
    )
    assert mac[0xA5] == "\u2022"     # MacRoman bullet, not yen
    with _pytest.raises(NotImplementedError):
        _encoding_map(
            {}, b"<< /Type /Font /Encoding /PDFDocEncoding >>"
        )
    with _pytest.raises(NotImplementedError):
        # code 0x05 has no WinAnsi entry and no /Differences override
        extract_stream_text(
            b"BT /F1 12 Tf <05> Tj ET",
            fonts={"F1": {c: chr(c) for c in range(32, 127)}},
        )


def test_pdf_hybrid_chain_mixed_sections():
    """layout='hybrid': a classic base (placeholder first page) plus a
    PDF 1.5 incremental update — the /Prev chain mixes an xref STREAM
    hop with a classic TABLE hop, and the update's ObjStm re-emits the
    page dict (type-2 entry in the update section).  The reader must
    extract the REVISED first page; the base alone still extracts the
    placeholder (r12 VERDICT task 7)."""
    from data_pipeline_who_gho_spark.operators.pdf import (
        build_pdf,
        extract_pdf_text,
    )

    pages = [["real first page"], ["second page stays"]]
    payload = build_pdf(pages, layout="hybrid")
    assert extract_pdf_text(payload)["pages"] == [
        "real first page", "second page stays"]
    # the base revision (everything before the update section) still
    # extracts standalone, showing the stale placeholder
    base_end = payload.find(b"%%EOF") + 6
    base = payload[:base_end]
    assert extract_pdf_text(base)["pages"] == [
        "SUPERSEDED stale revision", "second page stays"]


def test_pdf_objstm_supersede_keeps_top_level_winner():
    """ADVICE r12 high: an incremental update replacing an object that
    was PACKED in the base ObjStm must win — a blanket ObjStm
    expansion would resurrect the stale packed copy over the newer
    top-level (type-1) revision."""
    import re
    import zlib

    from data_pipeline_who_gho_spark.operators.pdf import (
        _show_ops,
        append_incremental_update,
        build_pdf,
        extract_pdf_text,
    )

    base = build_pdf(
        [["page one"], ["old second page"]], layout="xrefstream"
    )
    size = max(int(x) for x in re.findall(rb"/Size (\d+)", base))
    new_cid = size
    stream = zlib.compress(_show_ops(["NEW second page"]), 9)
    # page-2 dict is object 6 (catalog 1, pages 2, font 3, page dicts
    # 4/6, content streams 5/7) and sits in the base's ObjStm
    upd = append_incremental_update(base, top_level={
        6: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents "
            + str(new_cid).encode() + b" 0 R >>"),
        new_cid: (
            f"<< /Length {len(stream)} /Filter /FlateDecode >>\n"
            .encode() + b"stream\n" + stream + b"\nendstream"
        ),
    })
    assert extract_pdf_text(upd)["pages"] == [
        "page one", "NEW second page"]
    assert extract_pdf_text(base)["pages"] == [
        "page one", "old second page"]


def test_pdf_classic_scan_objstm_does_not_clobber_top_level():
    """ADVICE r12 low: in a classic/hybrid incremental file the
    offset-free scan keeps the latest top-level revision; an ObjStm
    copy of the same object number must not overwrite it."""
    import zlib

    from data_pipeline_who_gho_spark.operators.pdf import (
        _show_ops,
        extract_pdf_text,
    )

    def stream_obj(ops):
        data = zlib.compress(ops, 9)
        return (
            f"<< /Length {len(data)} /Filter /FlateDecode >>\n".encode()
            + b"stream\n" + data + b"\nendstream"
        )

    # ObjStm packs a STALE copy of the page dict (obj 4) pointing at
    # content 5; the top-level obj 4 (the live revision) points at 6
    stale_page = (b"<< /Type /Page /Parent 2 0 R /Resources "
                  b"<< /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    live_page = (b"<< /Type /Page /Parent 2 0 R /Resources "
                 b"<< /Font << /F1 3 0 R >> >> /Contents 6 0 R >>")
    pair = b"4 0\n"
    stm = zlib.compress(pair + stale_page, 9)
    objstm = (
        f"<< /Type /ObjStm /N 1 /First {len(pair)} /Length {len(stm)} "
        f"/Filter /FlateDecode >>\n".encode()
        + b"stream\n" + stm + b"\nendstream"
    )
    body = b"%PDF-1.4\n"
    out = bytearray(body)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: live_page,
        5: stream_obj(_show_ops(["stale content"])),
        6: stream_obj(_show_ops(["live content"])),
        7: objstm,
    }
    for num, b in objs.items():
        out += f"{num} 0 obj\n".encode() + b + b"\nendobj\n"
    assert extract_pdf_text(bytes(out))["pages"] == ["live content"]


def test_pdf_xrefstm_hybrid_reference_precedence():
    """ISO 32000-1 §7.5.8.4: a classic trailer's /XRefStm entries take
    precedence over that section's own table entries.  Handcrafted
    three-section file: final xref STREAM -> /Prev -> classic TABLE
    whose trailer names an /XRefStm redirecting page-2's content to a
    newer copy."""
    import zlib

    from data_pipeline_who_gho_spark.operators.pdf import (
        _show_ops,
        extract_pdf_text,
    )

    def stream_obj(ops):
        data = zlib.compress(ops, 9)
        return (
            f"<< /Length {len(data)} /Filter /FlateDecode >>\n".encode()
            + b"stream\n" + data + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R 6 0 R] /Count 2 >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: (b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
        5: stream_obj(_show_ops(["page one"])),
        6: (b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 3 0 R >> >> /Contents 7 0 R >>"),
        7: stream_obj(_show_ops(["TABLE copy"])),
    }
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    # newer copy of obj 7, listed only by the /XRefStm stream
    new7_at = len(out)
    out += b"7 0 obj\n" + stream_obj(_show_ops(["XREFSTM WINS"])) + b"\nendobj\n"
    # the /XRefStm xref stream (obj 9): entry for obj 7 -> new copy
    rows = bytearray()
    for t, f2, f3 in ((1, new7_at, 0),):
        rows.append(t)
        rows.extend(f2.to_bytes(3, "big"))
        rows.extend(f3.to_bytes(2, "big"))
    xdata = zlib.compress(bytes(rows), 9)
    xstm_at = len(out)
    out += (
        f"9 0 obj\n<< /Type /XRef /Size 10 /Root 1 0 R /W [1 3 2] "
        f"/Index [7 1] /Filter /FlateDecode /Length {len(xdata)} >>\n"
        .encode() + b"stream\n" + xdata + b"\nendstream\nendobj\n"
    )
    # classic TABLE section: objects 0-7 (obj 7 -> the OLD copy),
    # trailer names the /XRefStm (whose entries must win)
    table_at = len(out)
    out += b"xref\n0 8\n0000000000 65535 f \n"
    for num in range(1, 8):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 10 /Root 1 0 R /XRefStm {xstm_at} >>\n"
        .encode()
    )
    # final section: xref STREAM whose /Prev -> the classic table
    rows2 = bytearray()
    final_at = len(out)
    for t, f2, f3 in ((1, final_at, 0),):
        rows2.append(t)
        rows2.extend(f2.to_bytes(3, "big"))
        rows2.extend(f3.to_bytes(2, "big"))
    x2 = zlib.compress(bytes(rows2), 9)
    out += (
        f"10 0 obj\n<< /Type /XRef /Size 11 /Root 1 0 R /W [1 3 2] "
        f"/Index [10 1] /Filter /FlateDecode /Prev {table_at} "
        f"/Length {len(x2)} >>\n".encode()
        + b"stream\n" + x2 + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{final_at}\n%%EOF\n".encode()
    assert extract_pdf_text(bytes(out))["pages"] == [
        "page one", "XREFSTM WINS"]


def test_pdf_literal_strings_map_through_font_encoding():
    """A literal string under a single-byte /Encoding carries font
    codes, not Latin-1: byte 0x93 under WinAnsi is a left double
    quote (U+201C), under MacRoman a double-quote variant — and with
    no font in force it stays Latin-1 (U+0093).  BOM-tagged literals
    are UTF-16BE regardless."""
    from data_pipeline_who_gho_spark.operators.pdf import (
        extract_stream_text,
    )

    winansi = {0x93: "“", 0x71: "q", 0x75: "u", 0x6F: "o",
               0x74: "t", 0x65: "e"}
    ops = b"BT /F1 12 Tf (\x93quote) Tj ET"
    lines, _ = extract_stream_text(ops, fonts={"F1": winansi})
    assert lines == ["“quote"]
    # no font map: Latin-1 passthrough (the pre-encoding model)
    lines2, _ = extract_stream_text(ops)
    assert lines2 == ["\x93quote"]
    # a font code with no entry is the explicit edge, not a misdecode
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        extract_stream_text(
            b"BT /F1 12 Tf (\x05) Tj ET", fonts={"F1": {0x41: "A"}}
        )
    # BOM-tagged LITERAL is UTF-16BE (spec allows the BOM in either
    # string form)
    lines3, _ = extract_stream_text(
        b"BT (\xfe\xff\x4e\x2d\x00o\x00k) Tj ET"
    )
    assert lines3 == ["中ok"]


def test_pdf_resources_inheritance_from_pages_node():
    """§7.7.3.4: a page with no /Resources of its own inherits the
    nearest ancestor /Pages node's — including through an INDIRECT
    /Resources reference; a page that declares /Resources (even
    without /Font) does NOT merge the ancestor's fonts."""
    import zlib

    from data_pipeline_who_gho_spark.operators.pdf import (
        _SIMPLEFONT_ENCODING,
        extract_pdf_text,
    )

    def stream_obj(ops):
        data = zlib.compress(ops, 9)
        return (
            f"<< /Length {len(data)} /Filter /FlateDecode >>\n".encode()
            + b"stream\n" + data + b"\nendstream"
        )

    # <41> under the WinAnsi simple font = 'A'; page 1 inherits the
    # font from the Pages node (indirect /Resources), page 2 declares
    # its own EMPTY /Resources so the untagged hex must raise
    ops = b"BT /F1 12 Tf <41> Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (b"<< /Type /Pages /Kids [4 0 R] /Count 1 "
            b"/Resources 8 0 R >>"),
        3: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding 9 0 R >>"),
        4: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        5: stream_obj(ops),
        8: b"<< /Font << /F1 3 0 R >> >>",
        9: _SIMPLEFONT_ENCODING,
    }
    out = bytearray(b"%PDF-1.4\n")
    for num, b in objs.items():
        out += f"{num} 0 obj\n".encode() + b + b"\nendobj\n"
    assert extract_pdf_text(bytes(out))["pages"] == ["A"]

    # wholesale (non-merging) inheritance: own /Resources without
    # /Font blocks the ancestor's
    objs[4] = (b"<< /Type /Page /Parent 2 0 R /Resources << >> "
               b"/Contents 5 0 R >>")
    out2 = bytearray(b"%PDF-1.4\n")
    for num, b in objs.items():
        out2 += f"{num} 0 obj\n".encode() + b + b"\nendobj\n"
    with pytest.raises(NotImplementedError):
        extract_pdf_text(bytes(out2))


def test_tiff_predictor2_roundtrip():
    """TIFF Predictor 2 (the last named r12 'missing #4' item):
    horizontal differencing at 8 bpc, single- and multi-component,
    reversed exactly — and an xref stream declaring /Predictor 2
    loads end-to-end."""
    import random
    import re
    import zlib

    from data_pipeline_who_gho_spark.operators.pdf import (
        _tiff_unpredict,
        build_pdf,
        extract_pdf_text,
    )

    rng = random.Random(1933)
    for colors in (1, 3):
        cols = 7
        raw = bytes(rng.randrange(256) for _ in range(cols * colors * 5))
        # forward-difference encode, then decode must round-trip
        enc = bytearray(raw)
        row_w = cols * colors
        for r0 in range(0, len(enc), row_w):
            for i in range(min(r0 + row_w, len(enc)) - 1, r0 + colors - 1,
                           -1):
                enc[i] = (raw[i] - raw[i - colors]) & 0xFF
        assert _tiff_unpredict(bytes(enc), cols, colors) == raw

    # end-to-end: rewrite an xrefstream doc's predictor to TIFF 2
    doc = build_pdf([["tiff predictor page"]], layout="xrefstream")
    m = re.search(
        rb"/DecodeParms << /Predictor 12 /Columns 6 >> /Length (\d+) "
        rb">>\nstream\n", doc)
    assert m is not None
    tail = doc[m.end():]
    old_len = int(m.group(1))
    from data_pipeline_who_gho_spark.operators.pdf import _png_unpredict

    # undo the PNG row filters to get the RAW xref entries, then
    # re-encode them as TIFF horizontal deltas
    flat = bytearray(_png_unpredict(zlib.decompress(tail[:old_len]), 6))
    tiff = bytearray(flat)
    for r0 in range(0, len(tiff), 6):
        for i in range(min(r0 + 6, len(tiff)) - 1, r0, -1):
            tiff[i] = (flat[i] - flat[i - 1]) & 0xFF
    new_stream = zlib.compress(bytes(tiff), 9)
    patched = (
        doc[:m.start()]
        + b"/DecodeParms << /Predictor 2 /Columns 6 >> /Length "
        + str(len(new_stream)).encode() + b" >>\nstream\n"
        + new_stream + tail[old_len:]
    )
    # the xref stream moved by the byte-length delta: startxref and
    # in-dict offsets are unchanged because the xref stream is the
    # LAST object — extraction must still work
    assert extract_pdf_text(patched)["pages"] == ["tiff predictor page"]
