"""Round-12 ingestion additions (plans/curation21.py): Avro non-scalar
types through the pure-stdlib container codec, and the XML rowTag scan
with the typed reject posture."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-curation21")


def _oracle(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_avro_enum_fixed_nested_roundtrip():
    """Enum (varint symbol index), fixed (raw size bytes), and
    arrays-of-records / maps nest through encode -> decode exactly,
    under both block codecs; forbidden values fail loudly."""
    from data_pipeline_who_gho_spark.operators.avro import (
        build_avro,
        read_avro,
    )

    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["A", "B", "C"]}},
            {"name": "f", "type": {"type": "fixed", "name": "F4",
                                   "size": 4}},
            {"name": "m", "type": {"type": "map", "values": {
                "type": "record", "name": "Inner",
                "fields": [{"name": "x", "type": "long"}]}}},
            {"name": "a", "type": {"type": "array", "items": {
                "type": "enum", "name": "E2", "symbols": ["P", "Q"]}}},
        ],
    }
    recs = [
        {"e": "B", "f": b"\x00\xff\x10\x20",
         "m": {"k1": {"x": -5}, "k2": {"x": 1 << 40}},
         "a": ["Q", "P", "Q"]},
        {"e": "C", "f": b"abcd", "m": {}, "a": []},
    ]
    for codec in ("null", "deflate"):
        got = read_avro(build_avro(schema, recs, codec=codec))
        assert got["records"] == recs
        assert got["codec"] == codec

    with pytest.raises(ValueError):   # enum value outside symbols
        build_avro(schema, [{**recs[0], "e": "Z"}])
    with pytest.raises(ValueError):   # fixed with the wrong width
        build_avro(schema, [{**recs[0], "f": b"toolong"}])
    got = read_avro(build_avro(schema, recs, codec="snappy"))  # r13
    assert got["records"] == recs
    with pytest.raises(NotImplementedError):  # zstd boundary stated
        build_avro(schema, recs, codec="zstandard")
    # decode-side: an enum index past the symbol list is a loud error
    from data_pipeline_who_gho_spark.operators.avro import (
        _Reader,
        _decode_value,
        write_long,
    )

    with pytest.raises(ValueError):
        _decode_value(
            {"type": "enum", "name": "E", "symbols": ["A"]},
            _Reader(write_long(3)),
        )


def test_avro_complex_scan_stats_matches_oracle(spark):
    from data_pipeline_who_gho_spark.plans.curation21 import (
        AVRO_COMPLEX_SCAN_STATS_SQL,
        avro_complex_scan_stats,
    )

    got = sorted(
        tuple(r) for r in avro_complex_scan_stats(spark, SF).collect()
    )
    assert got == _oracle(AVRO_COMPLEX_SCAN_STATS_SQL)
    # all three enum symbols, both codecs, and non-trivial spans appear
    assert {r[1] for r in got} == {"LOW", "MED", "HIGH"}
    assert {r[7] for r in got} == {"deflate", "null", "snappy"}
    assert any(r[5] > 0 for r in got) and any(r[5] == 0 for r in got)


def test_xml_fragment_parse_semantics():
    """The rowTag scan unit: entity unescaping on good fragments, a
    mismatched inner close tag rejects THAT fragment only, and the
    raw-fragment md5 is computed either way."""
    import hashlib

    # drive the inner parser shape directly through a fabricated file
    good = b'<url id="7"><loc>u7</loc><lang>en</lang><note>a &lt;&amp;&gt; b</note></url>'
    bad = b'<url id="8"><loc>u8</lo><lang>fr</lang><note>x</note></url>'
    content = good + b"\n" + bad + b"\n"

    import re
    import xml.etree.ElementTree as ET

    frags = re.findall(rb"<url\b.*?</url>", content, re.S)
    assert len(frags) == 2
    el = ET.fromstring(frags[0].decode())
    assert el.findtext("note") == "a <&> b"     # entities unescaped
    assert el.findtext("loc") == "u7"
    with pytest.raises(ET.ParseError):
        ET.fromstring(frags[1].decode())
    assert hashlib.md5(frags[1]).hexdigest()    # diagnostics still keyed


def test_xml_scan_reject_split_matches_oracle(spark):
    from data_pipeline_who_gho_spark.plans.curation21 import (
        XML_SCAN_REJECT_SPLIT_SQL,
        xml_scan_reject_split,
    )

    got = sorted(
        tuple(r) for r in xml_scan_reject_split(spark, SF).collect()
    )
    assert got == _oracle(XML_SCAN_REJECT_SPLIT_SQL)
    by_status = {r[1] for r in got}
    assert by_status == {"ok", "rejected"}      # both lanes populated
    for r in got:
        if r[1] == "rejected":
            assert r[2] is None and r[3] is None and r[4] is not None
        else:
            assert " <&> " in r[3]              # unescape proven per row


def test_avro_named_refs_namespace_and_recursion():
    """Spec "Names": a declared record/enum/fixed name reused as a
    type is a reference (short or namespace-qualified, with nested
    declarations inheriting the enclosing namespace), and a recursive
    record schema round-trips through its null-union terminators."""
    from data_pipeline_who_gho_spark.operators.avro import (
        build_avro,
        read_avro,
    )

    schema = {
        "type": "record", "name": "Node", "namespace": "demo",
        "fields": [
            {"name": "tag", "type": {"type": "enum", "name": "Tag",
                                     "symbols": ["X", "Y"]}},
            {"name": "tag2", "type": "Tag"},          # short-name ref
            {"name": "tag3", "type": "demo.Tag"},     # qualified ref
            {"name": "next", "type": ["null", "Node"]},  # recursion
        ],
    }
    recs = [
        {"tag": "X", "tag2": "Y", "tag3": "X",
         "next": {"tag": "Y", "tag2": "Y", "tag3": "Y",
                  "next": {"tag": "X", "tag2": "X", "tag3": "Y",
                           "next": None}}},
        {"tag": "Y", "tag2": "X", "tag3": "Y", "next": None},
    ]
    for codec in ("null", "deflate"):
        got = read_avro(build_avro(schema, recs, codec=codec))
        assert got["records"] == recs


def test_avro_short_name_collision_resolves_in_current_namespace():
    """ADVICE r12: two namespaces declaring the same short name must
    not hijack each other's unqualified references — spec "Names"
    resolves an unqualified reference in the CURRENT namespace first.
    Here both ns1.Tag and ns2.Tag exist; the unqualified 'Tag' ref
    inside ns2.Inner must pick ns2.Tag (a 2-byte fixed), and the
    qualified 'ns1.Tag' ref must pick the enum, regardless of
    declaration order."""
    from data_pipeline_who_gho_spark.operators.avro import (
        build_avro,
        read_avro,
    )

    schema = {
        "type": "record", "name": "Top", "namespace": "ns1",
        "fields": [
            # declares ns1.Tag (an enum)
            {"name": "a", "type": {
                "type": "enum", "name": "Tag", "symbols": ["X", "Y"]}},
            # ns2.Inner declares ns2.Tag (a fixed) AFTER ns1.Tag
            {"name": "b", "type": {
                "type": "record", "name": "Inner", "namespace": "ns2",
                "fields": [
                    {"name": "t", "type": {
                        "type": "fixed", "name": "Tag", "size": 2}},
                    # unqualified ref inside ns2 -> ns2.Tag (fixed)
                    {"name": "t2", "type": "Tag"},
                    # qualified ref -> ns1.Tag (enum)
                    {"name": "e", "type": "ns1.Tag"},
                ]}},
        ],
    }
    recs = [
        {"a": "X", "b": {"t": b"ab", "t2": b"cd", "e": "Y"}},
        {"a": "Y", "b": {"t": b"ef", "t2": b"gh", "e": "X"}},
    ]
    for codec in ("null", "snappy"):
        got = read_avro(build_avro(schema, recs, codec=codec))
        assert got["records"] == recs


def test_avro_schema_resolution():
    """Spec "Schema Resolution" (r13): reader != writer schemas —
    name matching with writer-only drop, reader defaults, numeric and
    string<->bytes promotions, recursive arrays/maps/records,
    null-union rewrap, enum default fallback, and the loud error
    cases (no default, narrowing promotion)."""
    from data_pipeline_who_gho_spark.operators.avro import (
        build_avro,
        read_avro,
    )

    writer = {"type": "record", "name": "Doc", "fields": [
        {"name": "id", "type": "int"},
        {"name": "old", "type": "string"},
        {"name": "score", "type": "float"},
        {"name": "name_b", "type": "string"},
        {"name": "raw", "type": "bytes"},
        {"name": "tags", "type": {"type": "array", "items": "int"}},
        {"name": "meta", "type": {"type": "map", "values": "int"}},
        {"name": "q", "type": {
            "type": "enum", "name": "Q",
            "symbols": ["LOW", "MED", "WEIRD"]}},
        {"name": "inner", "type": {
            "type": "record", "name": "Inner", "fields": [
                {"name": "x", "type": "int"}]}},
        {"name": "maybe", "type": ["null", "int"]},
    ]}
    reader = {"type": "record", "name": "Doc", "fields": [
        {"name": "id", "type": "long"},
        {"name": "score", "type": "double"},
        {"name": "name_b", "type": "bytes"},       # string -> bytes
        {"name": "raw", "type": "string"},         # bytes -> string
        {"name": "tags", "type": {"type": "array", "items": "double"}},
        {"name": "meta", "type": {"type": "map", "values": "long"}},
        {"name": "q", "type": {
            "type": "enum", "name": "Q",
            "symbols": ["LOW", "MED"], "default": "MED"}},
        {"name": "inner", "type": {
            "type": "record", "name": "Inner", "fields": [
                {"name": "x", "type": "long"},
                {"name": "y", "type": "int", "default": 9}]}},
        {"name": "maybe", "type": ["null", "long"]},
        {"name": "added", "type": "string", "default": "dflt"},
    ]}
    recs = [
        {"id": 3, "old": "drop", "score": 1.5, "name_b": "té",
         "raw": "ok".encode(), "tags": [1, 2], "meta": {"a": 7},
         "q": "WEIRD", "inner": {"x": 4}, "maybe": None},
        {"id": -9, "old": "x", "score": -0.5, "name_b": "z",
         "raw": b"\xc3\xa9", "tags": [], "meta": {},
         "q": "MED", "inner": {"x": 0}, "maybe": 41},
    ]
    got = read_avro(build_avro(writer, recs, codec="snappy"),
                    reader_schema=reader)
    assert got["schema"] == reader
    assert got["records"] == [
        {"id": 3, "score": 1.5, "name_b": "té".encode(), "raw": "ok",
         "tags": [1.0, 2.0], "meta": {"a": 7}, "q": "MED",
         "inner": {"x": 4, "y": 9}, "maybe": None, "added": "dflt"},
        {"id": -9, "score": -0.5, "name_b": b"z", "raw": "é",
         "tags": [], "meta": {}, "q": "MED",
         "inner": {"x": 0, "y": 9}, "maybe": 41, "added": "dflt"},
    ]
    payload = build_avro(writer, recs)
    # reader-only field without a default is a loud error
    with pytest.raises(ValueError):
        read_avro(payload, reader_schema={
            "type": "record", "name": "Doc", "fields": [
                {"name": "nope", "type": "int"}]})
    # narrowing promotion (float -> int) is a loud error
    with pytest.raises(ValueError):
        read_avro(payload, reader_schema={
            "type": "record", "name": "Doc", "fields": [
                {"name": "score", "type": "int"}]})
    # enum symbol outside reader without default is a loud error
    with pytest.raises(ValueError):
        read_avro(payload, reader_schema={
            "type": "record", "name": "Doc", "fields": [
                {"name": "q", "type": {
                    "type": "enum", "name": "Q",
                    "symbols": ["LOW", "MED"]}}]})


def test_avro_field_aliases_resolve_renames():
    """Spec "Aliases": a reader field renamed from the writer matches
    under its alias list; an alias that matches nothing still falls
    back to the default/error path."""
    from data_pipeline_who_gho_spark.operators.avro import (
        build_avro,
        read_avro,
    )

    writer = {"type": "record", "name": "R", "fields": [
        {"name": "old_name", "type": "int"},
        {"name": "kept", "type": "string"},
    ]}
    reader = {"type": "record", "name": "R", "fields": [
        {"name": "new_name", "type": "long",
         "aliases": ["ancient_name", "old_name"]},
        {"name": "kept", "type": "string"},
        {"name": "ghost", "type": "int",
         "aliases": ["never_existed"], "default": -1},
    ]}
    recs = [{"old_name": 5, "kept": "a"}, {"old_name": -3, "kept": "b"}]
    got = read_avro(build_avro(writer, recs), reader_schema=reader)
    assert got["records"] == [
        {"new_name": 5, "kept": "a", "ghost": -1},
        {"new_name": -3, "kept": "b", "ghost": -1},
    ]
