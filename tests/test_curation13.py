"""Round-9 queue queries, second set (plans/curation13.py) + the
encoding-repair and multi-codec operators under them."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-curation13")


def _oracle(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_multi_codec_roundtrip_matches_oracle(spark):
    """gzip / bz2 / xz payloads must sniff to the right type and
    inflate losslessly — codec column comes from the SNIFF, md5 from
    the inflated bytes, so either slipping breaks parity."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        MULTI_CODEC_ROUNDTRIP_STATS_SQL,
        multi_codec_roundtrip_stats,
    )

    got = sorted(
        tuple(r) for r in multi_codec_roundtrip_stats(spark, SF).collect()
    )
    assert got == _oracle(MULTI_CODEC_ROUNDTRIP_STATS_SQL)
    assert len(got) > 0


def test_mojibake_repair_matches_oracle(spark):
    """Repair must be the EXACT inverse of the cp1252 double-encoding
    corruption on every doc (md5 parity with the original), and the
    corrupt char count must equal the original's UTF-8 byte count."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        MOJIBAKE_REPAIR_STATS_SQL,
        mojibake_repair_stats,
    )

    got = sorted(tuple(r) for r in mojibake_repair_stats(spark, SF).collect())
    assert got == _oracle(MOJIBAKE_REPAIR_STATS_SQL)
    assert all(r[1] == 1 for r in got)  # detector fired on every doc


def test_parquet_footer_probe_matches_oracle(spark):
    """What the written file's FOOTER claims (row counts, min/max
    statistics per row group) must equal what window arithmetic derives
    from the data — the trust anchor for scan pruning."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        PARQUET_FOOTER_PROBE_SQL,
        parquet_footer_probe,
    )

    got = sorted(tuple(r) for r in parquet_footer_probe(spark, SF).collect())
    want = _oracle(PARQUET_FOOTER_PROBE_SQL)
    assert got == want
    n_groups = got[0][4]
    assert all(r[4] == n_groups for r in got)
    assert len(got) == n_groups


def test_fix_double_encoding_exact_inverse():
    from data_pipeline_who_gho_spark.operators.encoding import (
        corrupt_double_encoding,
        fix_double_encoding,
    )

    cases = [
        "café №42 — “smart” quotes…",
        "naïve résumé über señor",
        "euro € and ™ and œ ligature",
        "mixed 中文 and ασδφ",
        "emoji 🚀 four-byte",
    ]
    for s in cases:
        fixed, repaired = fix_double_encoding(corrupt_double_encoding(s))
        assert fixed == s and repaired
    # clean text (ASCII or real accents) is an exact fixed point
    for s in ["plain ascii", "", "real café text, already clean"]:
        fixed, repaired = fix_double_encoding(s)
        assert fixed == s and not repaired


def test_fix_double_encoding_two_pass_for_double_corruption():
    from data_pipeline_who_gho_spark.operators.encoding import (
        corrupt_double_encoding,
        fix_double_encoding,
    )

    s = "café"
    twice = corrupt_double_encoding(corrupt_double_encoding(s))
    once, r1 = fix_double_encoding(twice)
    back, r2 = fix_double_encoding(once)
    assert r1 and r2 and back == s


def test_decompress_payload_bz2_xz_and_errors():
    import bz2
    import lzma

    from data_pipeline_who_gho_spark.operators.multimodal import (
        decompress_payload,
        sniff_media_type,
    )

    raw = b"shard contents \xf0\x9f\x9a\x80 bytes"
    for packed, mtype in [
        (bz2.compress(raw), "application/x-bzip2"),
        (lzma.compress(raw), "application/x-xz"),
    ]:
        assert sniff_media_type(packed) == mtype
        assert decompress_payload(packed, mtype) == raw
        assert decompress_payload(packed, None) == raw  # magic dispatch
        with pytest.raises(ValueError):
            decompress_payload(packed[:10], mtype)
    with pytest.raises(NotImplementedError):
        decompress_payload(b"plain", "text/plain")


def test_blocklist_match_stats_matches_oracle(spark):
    """One automaton pass must agree with the oracle's per-pattern
    replace()-arithmetic on counts, distinct patterns, severity totals,
    and the FIRST match position (borderless patterns make overlapping
    and non-overlapping counts coincide; nested patterns count on both
    sides)."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        BLOCKLIST_MATCH_STATS_SQL,
        blocklist_match_stats,
    )

    got = sorted(tuple(r) for r in blocklist_match_stats(spark, SF).collect())
    assert got == _oracle(BLOCKLIST_MATCH_STATS_SQL)
    assert sum(1 for r in got if r[1] > 0) > len(got) // 2  # list is live


def test_automaton_matches_naive_fuzz():
    import random

    from data_pipeline_who_gho_spark.operators.automaton import Automaton

    rng = random.Random(5)
    alpha = "abc "
    for _ in range(150):
        pats = list({
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 5))).strip()
            for _ in range(rng.randint(1, 8))
        } - {""})
        if not pats:
            continue
        text = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 200)))
        got = sorted(Automaton(pats).find_all(text))
        want = sorted(
            (i, k)
            for k, p in enumerate(pats)
            for i in range(len(text) - len(p) + 1)
            if text[i : i + len(p)] == p
        )
        assert got == want


def test_automaton_overlap_and_nesting_semantics():
    from data_pipeline_who_gho_spark.operators.automaton import Automaton

    # all occurrences, including overlapping ones of a bordered pattern
    assert len(Automaton(["abab"]).find_all("ababab")) == 2
    # nested patterns both report at the same position
    assert sorted(Automaton(["scan", "scan join"]).find_all("a scan join b")) \
        == [(2, 0), (2, 1)]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        Automaton([])
    with _pytest.raises(ValueError):
        Automaton(["a", "a"])


def test_warc_record_stats_matches_oracle(spark):
    """WARC framing (Content-Length blocks, CRLF separators) + the HTTP
    split must deliver the response body byte-exactly on every doc."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        WARC_RECORD_STATS_SQL,
        warc_record_stats,
    )

    got = sorted(tuple(r) for r in warc_record_stats(spark, SF).collect())
    assert got == _oracle(WARC_RECORD_STATS_SQL)
    assert all(r[2] == 200 for r in got)


def test_html_extract_stats_matches_oracle(spark):
    """Script/style exclusion, entity+charref decode, block-newline
    joining, and whitespace normalization must all land on the oracle's
    reconstruction of the extract."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        HTML_EXTRACT_STATS_SQL,
        html_extract_stats,
    )

    got = sorted(tuple(r) for r in html_extract_stats(spark, SF).collect())
    assert got == _oracle(HTML_EXTRACT_STATS_SQL)


def test_warc_parse_roundtrip_and_errors():
    import gzip

    from data_pipeline_who_gho_spark.operators.warc import (
        build_http_response,
        build_warc,
        header,
        parse_warc,
        split_http_response,
    )

    body = "hello <b>world</b> café".encode("utf-8")
    recs = [
        ("warcinfo", {}, b"software: engine\r\n"),
        ("request", {"WARC-Target-URI": "http://x/"},
         b"GET / HTTP/1.1\r\n\r\n"),
        ("response", {"WARC-Target-URI": "http://x/"},
         build_http_response(body)),
        ("metadata", {}, b"m" * 17),
    ]
    w = build_warc(recs)
    parsed = parse_warc(w)
    assert [header(r["headers"], "warc-type") for r in parsed] == [
        "warcinfo", "request", "response", "metadata"]
    status, hh, bb = split_http_response(parsed[2]["block"])
    assert status == 200 and bb == body
    # gzip: whole-file and concatenated members (the Common Crawl layout)
    assert parse_warc(gzip.compress(w)) == parsed
    m1 = gzip.compress(build_warc(recs[:2]))
    m2 = gzip.compress(build_warc(recs[2:]))
    assert len(parse_warc(m1 + m2)) == 4
    for bad in (w[:-3], w[:20], b"HTTP/1.1 200\r\n\r\n"):
        with pytest.raises(ValueError):
            parse_warc(bad)


def test_html_extract_rules():
    from data_pipeline_who_gho_spark.operators.html import (
        extract_text,
        link_stats,
    )

    h = (
        "<html><head><title>My Title</title><style>p{color:red}</style>\n"
        '<script>var x="<p>not text</p>";</script></head>\n'
        "<body><h1>Head &amp; line</h1><p>first   para\nwith   spaces</p>"
        '<a href="/x">anchor text</a><div>tail &#233;</div></body></html>'
    )
    assert extract_text(h) == (
        "My Title\nHead & line\nfirst para with spaces\nanchor text\ntail é"
    )
    n_links, anchor_chars, text_chars = link_stats(h)
    assert n_links == 1 and anchor_chars == len("anchortext")
    # broken markup tolerated; empty input fine
    assert extract_text("<p>unclosed <b>bold") == "unclosed bold"
    assert extract_text("") == ""
    # inline tags vanish without block breaks
    assert extract_text("<p>a <b>b</b> <em>c</em> d</p>") == "a b c d"


def test_html_boilerplate_extract_matches_oracle(spark):
    """Per-block classification must drop the nav bar, footer link
    farm, and 2-char stub while keeping title/h1/article on every doc
    (kept-text md5 pins both directions)."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        HTML_BOILERPLATE_EXTRACT_SQL,
        html_boilerplate_extract,
    )

    got = sorted(
        tuple(r) for r in html_boilerplate_extract(spark, SF).collect()
    )
    assert got == _oracle(HTML_BOILERPLATE_EXTRACT_SQL)
    assert all(r[1] == 6 and r[2] == 3 for r in got)  # fixture docs: all full


def test_boilerplate_extract_rules():
    from data_pipeline_who_gho_spark.operators.html import (
        boilerplate_extract,
        extract_blocks,
    )

    page = (
        "<html><body>"
        '<nav><a href="/">home</a> <a href="/a">about</a></nav>'
        "<p>Real article text with substance.</p>"
        "<div>hi</div>"
        '<p>half <a href="#">linked</a></p>'
        '<p>mostly plain text with <a href="#">link</a></p>'
        "</body></html>"
    )
    kept, n_blocks, n_kept = boilerplate_extract(page)
    assert kept == (
        "Real article text with substance.\nmostly plain text with link"
    )
    assert (n_blocks, n_kept) == (5, 2)
    blocks = extract_blocks(page)
    # "half linked" drops at density 0.6 (2*6 >= 10); the mostly-plain
    # block survives at 4/23
    assert blocks[3] == ("half linked", 6, 10)
    assert blocks[4] == ("mostly plain text with link", 4, 23)


def test_video_fingerprint_neardup_matches_oracle_and_recall(spark):
    """The banded self-join over the REAL Y4M decode must agree with
    the closed-form oracle AND find every planted perturbed pair at
    exactly 3 of 4 matched bands."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        VIDEO_FP_NEARDUP_SQL,
        video_fingerprint_neardup,
    )

    got = sorted(
        tuple(r) for r in video_fingerprint_neardup(spark, SF).collect()
    )
    assert got == _oracle(VIDEO_FP_NEARDUP_SQL)
    planted = {(a, b) for a, b, m in got if b == a + 1 and a % 2 == 0}
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert len(planted) == n_docs // 2  # every even/odd pair found
    assert all(m == 3 for a, b, m in got if (a, b) in planted)


def test_video_fingerprint_decodes_payloads_once(spark):
    """The fingerprint relation must be materialized before the
    self-join: no MapInPandas (decode) below the join in the plan."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        video_fingerprint_neardup,
    )

    plan = video_fingerprint_neardup(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    join_at = plan.find("Join")
    assert join_at >= 0
    assert "MapInPandas" not in plan


def test_url_canonical_dedup_matches_oracle(spark):
    """Every even/odd pair of messy spellings must collapse to ONE
    canonical key — both under- and over-normalization break the exact
    group counts."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        URL_CANONICAL_DEDUP_SQL,
        url_canonical_dedup,
    )

    got = sorted(tuple(r) for r in url_canonical_dedup(spark, SF).collect())
    assert got == _oracle(URL_CANONICAL_DEDUP_SQL)
    assert all(r[1] == 2 for r in got)  # fixture doc count is even


def test_canonicalize_url_rules():
    from data_pipeline_who_gho_spark.operators.urls import canonicalize_url

    cases = [
        ("HTTP://Host.ORG.:80//a/./b/../c?utm_x=1&b=2&a=1#f",
         "http://host.org/a/c?a=1&b=2"),
        ("http://host.org:8080/x", "http://host.org:8080/x"),  # kept port
        ("https://h.io", "https://h.io/"),
        ("https://h.io/a/b/../../../c", "https://h.io/c"),  # .. at root
        ("https://h.io/p?b=2&a=1&a=0", "https://h.io/p?a=0&a=1&b=2"),
        ("https://h.io/p?gclid=q&fbclid=z&REF=r&keep=1",
         "https://h.io/p?keep=1"),
        ("https://h.io/p?blank=&x=1", "https://h.io/p?blank=&x=1"),
    ]
    for url, want in cases:
        assert canonicalize_url(url) == want, url
    for bad in ("mailto:x@y.z", "javascript:alert(1)", "ftp://h/x", "https:///p"):
        with pytest.raises(ValueError):
            canonicalize_url(bad)


def test_robots_gate_stats_matches_oracle(spark):
    """RFC 9309 gating — group selection, longest-match, Allow ties,
    wildcards, end anchors — must land on the hand-derived truth table
    for every doc (matched_len pins WHICH rule won)."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        ROBOTS_GATE_STATS_SQL,
        robots_gate_stats,
    )

    got = sorted(tuple(r) for r in robots_gate_stats(spark, SF).collect())
    assert got == _oracle(ROBOTS_GATE_STATS_SQL)


def test_robots_pattern_matcher_fuzz_vs_regex():
    """The wildcard matcher must agree with a regex reference on 20k
    random (pattern, path) cases — including '*' runs and '$' anchors."""
    import random
    import re

    from data_pipeline_who_gho_spark.operators.robots import _pattern_matches

    def ref(pattern, path):
        anchored = pattern.endswith("$")
        core = pattern[:-1] if anchored else pattern
        rx = "".join(".*" if c == "*" else re.escape(c) for c in core)
        return re.match(rx + ("$" if anchored else ""), path) is not None

    rng = random.Random(3)
    for _ in range(20000):
        pat = "".join(rng.choice("ab/.z$*") for _ in range(rng.randint(0, 6)))
        if "$" in pat[:-1]:
            continue  # '$' is only an anchor at the end per RFC
        path = "".join(rng.choice("ab/.z") for _ in range(rng.randint(0, 8)))
        assert _pattern_matches(pat, path) == ref(pat, path), (pat, path)


def test_robots_group_selection():
    from data_pipeline_who_gho_spark.operators.robots import (
        gate,
        parse_robots,
    )

    p = parse_robots(
        "User-agent: bot\nDisallow: /a\n\n"
        "User-agent: bot-special\nDisallow: /b\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    # longest user-agent prefix wins: bot-special/1.0 obeys its group
    assert gate(p, "bot-special/1.0", "/a") == (True, 0)
    assert gate(p, "bot-special/1.0", "/b") == (False, 2)
    assert gate(p, "bot/1.0", "/a") == (False, 2)
    assert gate(p, "unknown", "/anything") == (False, 1)
    # no groups at all -> allowed
    assert gate(parse_robots("Sitemap: x"), "any", "/x") == (True, 0)


def test_sitemap_frontier_stats_matches_oracle(spark):
    """Namespace-aware XML parsing must recover exactly the synthesized
    frontier on every doc — kinds, counts, lastmod coverage, and the
    ordered loc list's md5."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        SITEMAP_FRONTIER_STATS_SQL,
        sitemap_frontier_stats,
    )

    got = sorted(
        tuple(r) for r in sitemap_frontier_stats(spark, SF).collect()
    )
    assert got == _oracle(SITEMAP_FRONTIER_STATS_SQL)
    kinds = {r[1] for r in got}
    assert kinds == {"urlset", "sitemapindex"}


def test_parse_sitemap_rules():
    from data_pipeline_who_gho_spark.operators.robots import (
        build_sitemap,
        parse_sitemap,
    )

    x = build_sitemap("urlset", [
        {"loc": "https://e.com/a", "lastmod": "2026-01-01",
         "priority": "0.8"},
        {"loc": "https://e.com/b"},
    ])
    p = parse_sitemap(x)
    assert p["kind"] == "urlset" and len(p["entries"]) == 2
    assert p["entries"][0]["priority"] == "0.8"
    assert p["entries"][1]["lastmod"] is None
    idx = parse_sitemap(
        build_sitemap("sitemapindex", [{"loc": "https://e.com/s1.xml"}])
    )
    assert idx["kind"] == "sitemapindex"
    # non-namespaced documents are tolerated (crawlers must)
    assert parse_sitemap(
        "<urlset><url><loc>x</loc></url></urlset>"
    )["entries"][0]["loc"] == "x"
    for bad in ("<foo/>", "not xml", "<urlset><url></url></urlset>"):
        with pytest.raises(ValueError):
            parse_sitemap(bad)


def test_srt_cue_stats_matches_oracle(spark):
    """SRT parsing must recover exact integer timings and the full
    transcript on every doc (md5 vs the oracle's reconstruction)."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        SRT_CUE_STATS_SQL,
        srt_cue_stats,
    )

    got = sorted(tuple(r) for r in srt_cue_stats(spark, SF).collect())
    assert got == _oracle(SRT_CUE_STATS_SQL)


def test_parse_srt_rules():
    from data_pipeline_who_gho_spark.operators.subtitles import (
        build_srt,
        format_ts,
        parse_srt,
    )

    srt = build_srt([(0, 1500, "hello world"), (2000, 4250, "two\nlines")])
    cues = parse_srt(srt)
    assert [c["index"] for c in cues] == [1, 2]
    assert cues[0]["end_ms"] == 1500 and cues[1]["start_ms"] == 2000
    assert cues[1]["text"] == "two\nlines"
    assert format_ts(3661042) == "01:01:01,042"
    # dot-decimal timestamps tolerated (WebVTT-style writers)
    assert parse_srt("1\n00:00:00.000 --> 00:00:01.000\nx\n")[0]["end_ms"] == 1000
    for bad in (
        "x\n00:00:00,000 --> 00:00:01,000\nt\n",   # non-numeric index
        "1\n00:00:01,000 --> 00:00:00,000\nt\n",   # end before start
        "1\nno timing\nt\n",
        "1\n00:00:00,000 --> 00:00:01,000\n\n",    # empty text
        "",
    ):
        with pytest.raises(ValueError):
            parse_srt(bad)


def test_crawl_ingest_e2e_matches_oracle(spark):
    """The composed pipeline (WARC framing → HTTP split → HTML
    boilerplate extraction) must land the kept-content md5 on every
    doc — one query pinning every seam of the ingest arc."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        CRAWL_INGEST_E2E_SQL,
        crawl_ingest_e2e,
    )

    got = sorted(tuple(r) for r in crawl_ingest_e2e(spark, SF).collect())
    assert got == _oracle(CRAWL_INGEST_E2E_SQL)
    assert all(r[1] == 2 and r[2] == 200 for r in got)


def test_exif_gps_strip_stats_matches_oracle(spark):
    """TIFF IFD walk (both byte orders), GPS removal, orientation
    survival, and image-byte preservation must all land on the closed
    form for every doc."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        EXIF_GPS_STRIP_STATS_SQL,
        exif_gps_strip_stats,
    )

    got = sorted(tuple(r) for r in exif_gps_strip_stats(spark, SF).collect())
    assert got == _oracle(EXIF_GPS_STRIP_STATS_SQL)
    assert all(r[5] == 0 for r in got)  # GPS gone on every doc


def test_exif_parse_strip_roundtrip():
    import numpy as np

    from data_pipeline_who_gho_spark.operators.exif import (
        TAG_GPS_LAT,
        TAG_GPS_LAT_REF,
        TAG_ORIENTATION,
        build_exif_jpeg,
        parse_exif_jpeg,
        strip_gps,
    )
    from data_pipeline_who_gho_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    coefs = np.zeros((1, 2, 8, 8), np.int64)
    coefs[0, 0, 0, 0] = 40
    coefs[0, 1, 4, 4] = 16
    base = encode_jpeg_gray(coef_blocks=coefs, shape=(8, 16))
    for bo in ("II", "MM"):
        j = build_exif_jpeg(base, byte_order=bo, orientation=6,
                            gps=((51, 30, 26), "N", (0, 7, 39), "W"))
        meta = parse_exif_jpeg(j)
        assert meta["byte_order"] == bo
        assert meta["ifd0"][TAG_ORIENTATION][2] == 6
        assert meta["gps"][TAG_GPS_LAT][2] == ((51, 1), (30, 1), (26, 1))
        assert meta["gps"][TAG_GPS_LAT_REF][2] == "N"
        # decoder passes APP1 unharmed
        assert np.array_equal(decode_jpeg(j), decode_jpeg(base))
        s = strip_gps(j)
        m2 = parse_exif_jpeg(s)
        assert not m2["gps"] and m2["ifd0"][TAG_ORIENTATION][2] == 6
        assert np.array_equal(decode_jpeg(s), decode_jpeg(base))
        assert s.endswith(base[2:])  # image bytes verbatim
        assert strip_gps(s) == s     # idempotent
    assert strip_gps(base) == base   # no APP1 -> unchanged
    with pytest.raises(ValueError):
        parse_exif_jpeg(base)        # no APP1 -> explicit error


def test_spread_for_python_only_acts_when_under_partitioned(spark):
    from data_pipeline_who_gho_spark.sources.catalog import (
        load_table,
        spread_for_python,
    )

    target = spark.sparkContext.defaultParallelism
    narrow = load_table(spark, SF, "documents").select("doc_id")
    assert narrow.rdd.getNumPartitions() < target  # the trap exists
    spread = spread_for_python(narrow)
    assert spread.rdd.getNumPartitions() == target
    # already-wide inputs pass through UNCHANGED (the production no-op:
    # payload-bearing scans with real row-group parallelism)
    wide = narrow.repartition(target + 8)
    assert spread_for_python(wide) is wide


def test_id3_metadata_stats_matches_oracle(spark):
    """Frame parse (syncsafe sizes, encoding dispatch, padding stop)
    and tag-size accounting must land on the closed form — odd docs'
    accented titles force the UTF-8 path."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        ID3_METADATA_STATS_SQL,
        id3_metadata_stats,
    )

    got = sorted(tuple(r) for r in id3_metadata_stats(spark, SF).collect())
    assert got == _oracle(ID3_METADATA_STATS_SQL)


def test_id3_frame_roundtrip_and_encodings():
    from data_pipeline_who_gho_spark.operators.containers import (
        build_id3v2,
        build_mp3,
        parse_id3_frames,
        scan_mp3_frames,
    )

    tag = build_id3v2(
        {"TIT2": "Track 7 é", "TPE1": "Artist 3", "TALB": "Album"},
        padding=16,
    )
    f = parse_id3_frames(tag)
    assert f == {"TIT2": "Track 7 é", "TPE1": "Artist 3", "TALB": "Album"}
    # prepended to a real MPEG stream: frame scan skips exactly the tag
    mp3 = tag + build_mp3([(5, 0)] * 3)
    s = scan_mp3_frames(mp3)
    assert s["n_frames"] == 3 and s["id3v2_bytes"] == len(tag)
    assert parse_id3_frames(mp3) == f
    # v2.3 plain sizes + UTF-16 BOM text
    t16 = (b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 0, 23])
           + b"TIT2" + (13).to_bytes(4, "big") + b"\x00\x00"
           + b"\x01\xff\xfe" + "héllo".encode("utf-16-le"))
    assert parse_id3_frames(t16)["TIT2"] == "héllo"
    for bad in (b"XX", tag[:14]):
        with pytest.raises(ValueError):
            parse_id3_frames(bad)


def test_archive_member_stats_matches_oracle(spark):
    """The 1→N archive fan-out (tar even docs, zip odd) must recover
    every member's name, size, and content md5 exactly."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        ARCHIVE_MEMBER_STATS_SQL,
        archive_member_stats,
    )

    got = sorted(tuple(r) for r in archive_member_stats(spark, SF).collect())
    assert got == _oracle(ARCHIVE_MEMBER_STATS_SQL)
    assert {r[1] for r in got} == {"tar", "zip"}


def test_archive_roundtrip_and_errors():
    from data_pipeline_who_gho_spark.operators.containers import (
        build_tar,
        build_zip,
        list_archive,
    )

    members = [("docs/a.txt", b"hello"),
               ("docs/b.txt", "caf\xe9".encode("utf-8")),
               ("c.bin", bytes(range(70)))]
    for builder in (build_tar, build_zip):
        arc = builder(members)
        assert list_archive(arc) == members
        assert builder(members) == arc  # deterministic bytes
    with pytest.raises(ValueError):
        list_archive(b"junk")
    with pytest.raises(ValueError):
        list_archive(build_zip(members)[:20])


def test_jsonl_shard_explode_matches_oracle(spark):
    """The shard-level 1→N JSON parse must recover every record's
    fields exactly — the embedded quotes/newline/tab make the escape
    round trip load-bearing (an unescaped newline would split the
    line and break the row set)."""
    from data_pipeline_who_gho_spark.plans.curation13 import (
        JSONL_SHARD_EXPLODE_SQL,
        jsonl_shard_explode,
    )

    got = sorted(tuple(r) for r in jsonl_shard_explode(spark, SF).collect())
    assert got == _oracle(JSONL_SHARD_EXPLODE_SQL)
    assert len(got) > len({r[0] for r in got})  # genuinely 1->N


def test_exif_real_world_types_and_ifd1_carry():
    """Real camera APP1s carry type-7 UNDEFINED (ExifVersion), type-1
    BYTE (GPSVersionID), and an IFD1 thumbnail; parsing must accept
    them and strip_gps must carry the IFD1 chain (thumbnail payload
    re-pointed) while removing ONLY the GPS IFD."""
    import numpy as np

    from data_pipeline_who_gho_spark.operators.exif import (
        TAG_JPEG_IF,
        TAG_ORIENTATION,
        build_exif_jpeg,
        parse_exif_jpeg,
        strip_gps,
    )
    from data_pipeline_who_gho_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    coefs = np.zeros((1, 1, 8, 8), np.int64)
    coefs[0, 0, 0, 0] = 24
    base = encode_jpeg_gray(coef_blocks=coefs, shape=(8, 8))
    thumb = b"\xff\xd8THUMBNAIL-PAYLOAD\xff\xd9"
    for bo in ("II", "MM"):
        j = build_exif_jpeg(
            base, byte_order=bo, orientation=3,
            gps=((12, 34, 56), "N", (7, 8, 9), "E"),
            exif_version=b"0232", thumbnail=thumb,
        )
        meta = parse_exif_jpeg(j)
        assert meta["exif"][0x9000] == (7, 4, b"0232")  # UNDEFINED kept raw
        assert meta["gps"][0x0000] == (1, 4, b"\x02\x03\x00\x00")  # BYTE
        assert meta["thumbnail"][TAG_JPEG_IF] == thumb
        s = strip_gps(j)
        m2 = parse_exif_jpeg(s)
        assert not m2["gps"]
        assert m2["ifd0"][TAG_ORIENTATION][2] == 3
        assert m2["exif"][0x9000] == (7, 4, b"0232")
        assert m2["thumbnail"][TAG_JPEG_IF] == thumb  # IFD1 survives
        assert np.array_equal(decode_jpeg(s), decode_jpeg(base))
        assert s.endswith(base[2:])   # image bytes verbatim
        assert strip_gps(s) == s      # idempotent


def test_html_skip_subtree_anchors_not_counted():
    """Anchors and block tags inside noscript/template subtrees (which
    html.parser DOES tokenize, unlike script/style CDATA) must not
    inflate n_links or break blocks."""
    from data_pipeline_who_gho_spark.operators.html import (
        extract_text,
        link_stats,
    )

    h = (
        "<html><body><p>real text</p>"
        '<noscript><a href="/x">hidden</a><p>also hidden</p></noscript>'
        '<template><a href="/y">ghost</a></template>'
        '<a href="/z">seen</a></body></html>'
    )
    assert extract_text(h) == "real text\nseen"
    n_links, anchor_chars, text_chars = link_stats(h)
    assert n_links == 1                       # only the visible anchor
    assert anchor_chars == len("seen")
    assert text_chars == len("realtextseen")


def test_robots_duplicate_groups_merge():
    """RFC 9309 2.2.1: rules from multiple groups naming the same
    user-agent token (and from multiple '*' groups) combine — the
    second group must not silently replace the first."""
    from data_pipeline_who_gho_spark.operators.robots import (
        gate,
        parse_robots,
    )

    p = parse_robots(
        "User-agent: bot\nDisallow: /a\n\n"
        "User-agent: other\nDisallow: /c\n\n"
        "User-agent: bot\nDisallow: /b\n"
    )
    assert gate(p, "bot/1.0", "/a") == (False, 2)  # first group's rule
    assert gate(p, "bot/1.0", "/b") == (False, 2)  # second group's too
    assert gate(p, "bot/1.0", "/c") == (True, 0)   # other group ignored
    p2 = parse_robots(
        "User-agent: *\nDisallow: /x\n\n"
        "User-agent: *\nDisallow: /y\n"
    )
    assert gate(p2, "anyone", "/x") == (False, 2)
    assert gate(p2, "anyone", "/y") == (False, 2)


def test_html_extract_oracle_guards_whitespace_only_doc():
    """A whitespace-only doc text yields an EMPTY article block the
    engine drops entirely; the oracle's CASE guard must drop the same
    newline so extract_md5 parity holds."""
    import hashlib
    import html as html_mod

    import duckdb

    from data_pipeline_who_gho_spark.operators.html import (
        extract_text,
        link_stats,
    )
    from data_pipeline_who_gho_spark.plans.curation13 import (
        HTML_EXTRACT_STATS_SQL,
    )

    for doc_id, text in ((7, " \t  \n "), (8, "plain body"), (9, "")):
        page = (
            f"<html><head><title>Doc&#233;{doc_id % 100}</title>"
            "<style>p{color:red}</style>"
            '<script>var x = "<p>not text</p>";</script></head>'
            f"<body><h1>alpha &amp; beta</h1>"
            f"<p>{html_mod.escape(text)}</p>"
            f'<a href="#">link{doc_id % 10}</a></body></html>'
        )
        extract = extract_text(page)
        n_links, anchor_chars, text_chars = link_stats(page)
        engine_row = (
            doc_id, n_links, anchor_chars, text_chars,
            hashlib.md5(extract.encode("utf-8")).hexdigest(),
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.execute("INSERT INTO documents VALUES (?, ?)", [doc_id, text])
        oracle_row = tuple(con.execute(HTML_EXTRACT_STATS_SQL).fetchone())
        assert engine_row == oracle_row


def test_jsonl_framing_survives_unicode_line_separators():
    """json.dumps(ensure_ascii=False) leaves U+2028/U+2029/U+0085
    unescaped inside strings; shard framing must therefore split on
    '\\n' only — str.splitlines() would shear a record mid-line."""
    import json

    records = [
        {"id": i, "text": f"a\u2028b\u2029c\u0085d rec{i}"}
        for i in range(3)
    ]
    shard = "\n".join(json.dumps(r, ensure_ascii=False) for r in records)
    lines = shard.split("\n")
    assert len(lines) == len(records)
    assert [json.loads(ln)["text"] for ln in lines] == [
        r["text"] for r in records
    ]
    assert len(shard.splitlines()) > len(records)  # why splitlines loses


def test_exif_all_twelve_tiff_types_roundtrip():
    """A hand-built APP1 carrying every TIFF 6.0 field type (BYTE
    through DOUBLE, interpreted or raw) plus a strip-based thumbnail
    IFD1 must parse, strip, and re-parse with every value preserved —
    the shapes real camera firmware emits."""
    from data_pipeline_who_gho_spark.operators.exif import (
        TAG_EXIF_IFD,
        TAG_GPS_IFD,
        TAG_ORIENTATION,
        TAG_STRIP_OFFSETS,
        _serialize_tiff,
        parse_exif_jpeg,
        strip_gps,
    )

    strip_a, strip_b = b"STRIP-A-BYTES", b"STRIP-B!"
    ifd0 = {
        TAG_ORIENTATION: (3, 1, 6),
        0x0100: (4, 1, 640),               # LONG ImageWidth
        0x010E: (2, 12, "descr hello"),    # ASCII
        TAG_EXIF_IFD: (4, 1, ("ifd", 1)),
        TAG_GPS_IFD: (4, 1, ("ifd", 2)),
    }
    exif_ifd = {
        0x9000: (7, 4, b"0232"),           # UNDEFINED
        0x9201: (10, 1, b"\x01\x02\x03\x04\x05\x06\x07\x08"),  # SRATIONAL raw
        0x9203: (8, 2, b"\xff\x7f\x01\x00"),  # SSHORT raw pair
        0x9204: (9, 1, b"\xfe\xff\xff\xff"),  # SLONG raw
        0x9205: (11, 1, b"\x00\x00\x80\x3f"),  # FLOAT raw
        0x9206: (12, 1, b"\x00" * 8),      # DOUBLE raw
        0x9290: (6, 3, b"\x01\xfe\x7f"),   # SBYTE raw
    }
    gps_ifd = {
        0x0000: (1, 4, b"\x02\x03\x00\x00"),  # BYTE (GPSVersionID)
        0x0001: (2, 2, "N"),
        0x0002: (5, 3, ((51, 1), (30, 1), (26, 1))),
    }
    ifd1 = {
        0x0103: (3, 1, 1),
        TAG_STRIP_OFFSETS: (4, 2, ("blobs", [strip_a, strip_b])),
        0x0117: (4, 2, (len(strip_a), len(strip_b))),
    }
    tiff = _serialize_tiff("II", [ifd0, exif_ifd, gps_ifd, ifd1],
                           links=[3, None, None, None])
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    jpeg = b"\xff\xd8" + app1 + b"\xff\xd9"

    meta = parse_exif_jpeg(jpeg)
    assert meta["ifd0"][0x010E] == (2, 12, "descr hello")
    assert meta["exif"][0x9201][2] == b"\x01\x02\x03\x04\x05\x06\x07\x08"
    assert meta["exif"][0x9203][2] == b"\xff\x7f\x01\x00"
    assert meta["exif"][0x9290][2] == b"\x01\xfe\x7f"
    assert meta["gps"][0x0000][2] == b"\x02\x03\x00\x00"
    assert meta["thumbnail"][TAG_STRIP_OFFSETS] == [strip_a, strip_b]

    stripped = strip_gps(jpeg)
    m2 = parse_exif_jpeg(stripped)
    assert not m2["gps"]
    assert m2["ifd0"][TAG_ORIENTATION][2] == 6
    assert m2["exif"] == meta["exif"]                  # every exif value kept
    assert m2["thumbnail"][TAG_STRIP_OFFSETS] == [strip_a, strip_b]
    assert stripped.endswith(b"\xff\xd9")
    assert strip_gps(stripped) == stripped             # idempotent


def test_exif_ascii_count_recomputed_on_rebuild():
    """A NUL-padded ASCII tag (declared count > re-encoded length —
    common in real camera firmware) must re-serialize with the count
    recomputed from the emitted bytes, never a declared count that
    overruns them (r10 ADVICE)."""
    from data_pipeline_who_gho_spark.operators.exif import (
        TAG_GPS_LAT_REF,
        TAG_GPS_IFD,
        _serialize_tiff,
        parse_exif_jpeg,
        strip_gps,
    )

    padded = b"2026:01:01 00:00:00\x00" + b"\x00" * 10  # count 30, text 19
    ifd0 = {
        0x0132: (2, len(padded), padded),
        TAG_GPS_IFD: (4, 1, ("ifd", 1)),
    }
    gps_ifd = {TAG_GPS_LAT_REF: (2, 2, "N")}
    tiff = _serialize_tiff("II", [ifd0, gps_ifd], [None, None])
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    jpeg = b"\xff\xd8" + app1 + b"\xff\xd9"
    meta = parse_exif_jpeg(jpeg)
    assert meta["ifd0"][0x0132] == (2, 30, "2026:01:01 00:00:00")

    stripped = strip_gps(jpeg)
    m2 = parse_exif_jpeg(stripped)
    typ, cnt, val = m2["ifd0"][0x0132]
    assert val == "2026:01:01 00:00:00"
    assert cnt == len(val) + 1  # recomputed: count matches emitted bytes


def test_exif_dangling_ifd1_pointers_dropped_on_rebuild():
    """IFD1 pointer tags whose payload could not be captured
    (JPEGInterchangeFormat without 0x0202; StripOffsets without
    StripByteCounts) must be DROPPED by strip_gps, not re-emitted as
    numeric offsets into the old TIFF layout (r10 ADVICE)."""
    from data_pipeline_who_gho_spark.operators.exif import (
        TAG_GPS_LAT_REF,
        TAG_GPS_IFD,
        TAG_JPEG_IF,
        TAG_JPEG_IF_LENGTH,
        TAG_ORIENTATION,
        TAG_STRIP_BYTE_COUNTS,
        TAG_STRIP_OFFSETS,
        _serialize_tiff,
        parse_exif_jpeg,
        strip_gps,
    )

    for ifd1 in (
        {TAG_JPEG_IF: (4, 1, 9999), 0x0103: (3, 1, 6)},
        {TAG_STRIP_OFFSETS: (4, 2, (100, 200)), 0x0103: (3, 1, 6)},
    ):
        ifd0 = {
            TAG_ORIENTATION: (3, 1, 3),
            TAG_GPS_IFD: (4, 1, ("ifd", 1)),
        }
        gps_ifd = {TAG_GPS_LAT_REF: (2, 2, "N")}
        tiff = _serialize_tiff("II", [ifd0, gps_ifd, dict(ifd1)], [2, None, None])
        body = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
        jpeg = b"\xff\xd8" + app1 + b"\xff\xd9"
        meta = parse_exif_jpeg(jpeg)
        assert meta["ifd1"] and not meta["thumbnail"]  # dangling pointers

        m2 = parse_exif_jpeg(strip_gps(jpeg))
        assert not m2["gps"]
        for ptr in (TAG_JPEG_IF, TAG_JPEG_IF_LENGTH,
                    TAG_STRIP_OFFSETS, TAG_STRIP_BYTE_COUNTS):
            assert ptr not in m2["ifd1"]
        assert m2["ifd1"][0x0103] == (3, 1, 6)  # descriptive tags survive
