"""Round-11 file-format ingestion queries (plans/curation18.py):
messy-CSV scan + reject split, multiline CSV, ORC round-trip."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-curation18")


def _oracle(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_csv_scan_stats_matches_oracle(spark):
    """Spark's real CSV parser over RFC 4180 records with embedded
    commas and doubled-quote escapes: every good row's quoted payload
    must round-trip byte-exactly (md5 parity), every corrupt row must
    be excluded."""
    from data_pipeline_who_gho_spark.plans.curation18 import (
        CSV_SCAN_STATS_SQL,
        csv_scan_stats,
    )

    got = sorted(tuple(r) for r in csv_scan_stats(spark, SF).collect())
    assert got == _oracle(CSV_SCAN_STATS_SQL)
    assert len(got) > 400
    assert all(d % 13 != 5 for d, _, _ in got)  # corrupt rows excluded


def test_csv_reject_split_matches_oracle(spark):
    """The V2 reject posture on a file scan: corrupt rows land in
    _corrupt_record carrying the COMPLETE raw line (md5-pinned), with
    the id re-extracted for quarantine diagnostics."""
    from data_pipeline_who_gho_spark.plans.curation18 import (
        CSV_REJECT_SPLIT_SQL,
        csv_reject_split,
    )

    got = sorted(tuple(r) for r in csv_reject_split(spark, SF).collect())
    assert got == _oracle(CSV_REJECT_SPLIT_SQL)
    assert got and all(d % 13 == 5 for d, _, _ in got)


def test_csv_multiline_stats_matches_oracle(spark):
    """Quoted fields spanning physical lines (multiLine=true): the
    embedded newlines must survive the parse exactly."""
    from data_pipeline_who_gho_spark.plans.curation18 import (
        CSV_MULTILINE_STATS_SQL,
        csv_multiline_stats,
    )

    got = sorted(
        tuple(r) for r in csv_multiline_stats(spark, SF).collect()
    )
    assert got == _oracle(CSV_MULTILINE_STATS_SQL)
    assert all(n >= 3 for _, n, _ in got)  # payload genuinely multi-line


def test_orc_roundtrip_matches_oracle_and_pushes_down(spark):
    """ORC write/read round-trip; the filter must reach the ORC scan
    (PushedFilters) and the projection must prune to the 3 referenced
    columns — same plan discipline as the parquet tests."""
    from data_pipeline_who_gho_spark.plans.curation18 import (
        ORC_ROUNDTRIP_STATS_SQL,
        orc_roundtrip_stats,
    )

    df = orc_roundtrip_stats(spark, SF)
    got = sorted(tuple(r) for r in df.collect())
    assert got == _oracle(ORC_ROUNDTRIP_STATS_SQL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "n_chars" in plan.split("PushedFilters")[1][:200]
    # column pruning: the scan's ReadSchema must not include text/source
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "text" not in read_schema and "source" not in read_schema


def test_csv_parser_handles_pathological_fields(spark):
    """Direct parser-semantics pin on constructed lines: leading/
    trailing quotes, doubled quotes at field edges, commas everywhere,
    and a too-many-fields row rejected (not silently truncated)."""
    import os
    import tempfile

    from data_pipeline_who_gho_spark.plans.curation18 import _read_csv

    d = tempfile.mkdtemp(prefix="csv-patho-")
    lines = [
        '1,en,"a,b,""c"",d"',        # quotes + commas inside
        '2,de,""""',                  # field that IS one quote char
        '3,fr,",starts,with,comma"',
        "4,es,unquoted plain",
        '5,zh,"x","extra-field"',     # too many fields -> corrupt
        "notanum,en,\"y\"",           # bad id -> corrupt
    ]
    with open(os.path.join(d, "part-0.csv"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    rows = {
        r["doc_id"]: r
        for r in _read_csv(spark, d, multiline=False).collect()
        if r["_corrupt_record"] is None
    }
    assert rows[1]["payload"] == 'a,b,"c",d'
    assert rows[2]["payload"] == '"'
    assert rows[3]["payload"] == ",starts,with,comma"
    assert rows[4]["payload"] == "unquoted plain"
    corrupt = [
        r["_corrupt_record"]
        for r in _read_csv(spark, d, multiline=False).collect()
        if r["_corrupt_record"] is not None
    ]
    assert sorted(corrupt) == sorted([lines[4], lines[5]])


def test_avro_container_roundtrip_and_errors():
    """The pure-python Avro codec: zigzag varint edges, both codecs,
    unions/arrays/maps/bytes round-trip, framing validation, and the
    honest NotImplementedError boundary."""
    import pytest as _pt

    from data_pipeline_who_gho_spark.operators.avro import (
        _Reader,
        build_avro,
        read_avro,
        write_long,
    )

    for v in (0, -1, 1, 63, -64, 2**31, -2**35, 2**62, -2**63):
        assert _Reader(write_long(v)).long() == v

    schema = {"type": "record", "name": "doc", "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "lang", "type": "string"},
        {"name": "score", "type": ["null", "double"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "meta", "type": {"type": "map", "values": "long"}},
        {"name": "blob", "type": "bytes"},
        {"name": "ok", "type": "boolean"},
    ]}
    recs = [
        {"doc_id": i, "lang": "zh中" if i % 2 else "en",
         "score": None if i % 3 == 0 else i * 0.5,
         "tags": [f"t{j}" for j in range(i % 4)],
         "meta": {"a": i, "b": -i}, "blob": bytes([i % 256]),
         "ok": bool(i % 2)}
        for i in range(100)
    ]
    for codec in ("null", "deflate"):
        payload = build_avro(schema, recs, codec=codec, block_records=37)
        got = read_avro(payload)
        assert got["records"] == recs
        assert got["n_blocks"] == 3 and got["codec"] == codec

    with _pt.raises(ValueError):
        read_avro(b"PAR1 not avro")
    # snappy is IMPLEMENTED as of r13 (operators/snappy.py + the
    # spec's per-block big-endian CRC32 trailer); zstd is the boundary
    got = read_avro(build_avro(schema, recs, codec="snappy"))
    assert got["records"] == recs and got["codec"] == "snappy"
    with _pt.raises(NotImplementedError):
        build_avro(schema, recs, codec="zstandard")
    # enums and named-type references are IMPLEMENTED as of r12
    # (operators/avro.py); the moved boundary is an UNDECLARED name
    got = read_avro(build_avro(
        {"type": "enum", "name": "e", "symbols": ["A", "B"]}, ["B", "A"]
    ))
    assert got["records"] == ["B", "A"]
    got = read_avro(build_avro(
        {"type": "record", "name": "r", "fields": [
            {"name": "a", "type": {"type": "fixed", "name": "F2",
                                   "size": 2}},
            {"name": "b", "type": "F2"},   # reference by name
        ]},
        [{"a": b"xy", "b": b"zz"}],
    ))
    assert got["records"] == [{"a": b"xy", "b": b"zz"}]
    with _pt.raises(NotImplementedError):
        build_avro(
            {"type": "record", "name": "r", "fields": [
                {"name": "a", "type": "Mystery"},   # never declared
            ]},
            [{"a": 1}],
        )
    # corrupt a sync marker -> hard failure, not silent misparse
    payload = bytearray(build_avro(schema, recs[:5], codec="null"))
    payload[-1] ^= 0xFF
    with _pt.raises(ValueError):
        read_avro(bytes(payload))


def test_avro_scan_stats_matches_oracle(spark):
    """Per-shard Avro container build/decode in a grouped Arrow pass;
    every field (incl. the null-union score) must replay exactly."""
    from data_pipeline_who_gho_spark.plans.curation18 import (
        AVRO_SCAN_STATS_SQL,
        avro_scan_stats,
    )

    got = sorted(
        (r[0], r[1], r[2], r[3], r[4], r[5])
        for r in avro_scan_stats(spark, SF).collect()
    )
    assert got == _oracle(AVRO_SCAN_STATS_SQL)
    assert any(r[3] is None for r in got)      # null branch exercised
    assert any(r[3] is not None for r in got)  # double branch too
    assert all(r[5] >= 2 for r in got)         # multi-block containers


def test_json_scan_reject_split_matches_oracle(spark):
    """spark.read.json with typed PERMISSIVE schema: good rows'
    JSON-escaped payloads (embedded quotes + backslashes) round-trip
    byte-exactly, truncated objects land whole in _corrupt_record with
    diagnostics re-extracted, both sides fused with a status column."""
    from data_pipeline_who_gho_spark.plans.curation18 import (
        JSON_SCAN_REJECT_SPLIT_SQL,
        json_scan_reject_split,
    )

    got = sorted(
        tuple(r) for r in json_scan_reject_split(spark, SF).collect()
    )
    assert got == _oracle(JSON_SCAN_REJECT_SPLIT_SQL)
    by_status = {}
    for _, _, _, status in got:
        by_status[status] = by_status.get(status, 0) + 1
    assert by_status["rejected"] == 39 and by_status["ok"] == 461
    # driver-shape count() works (the corrupt-record pruning contract)
    assert json_scan_reject_split(spark, SF).count() == 500
