"""Pure-stdlib protobuf wire codec (operators/protowire.py) and the
proto_scan_stats query: round-trips, unknown-field skipping, zigzag
edges, error contracts, oracle match at sf0.001."""

from __future__ import annotations

import pytest

from data_pipeline_who_gho_spark.operators.protowire import (
    decode_message,
    encode_message,
    read_varint,
    unzigzag,
    write_varint,
    zigzag,
)

SF = "/root/testdata/sf0.001"

SPAN = {1: ("start", "int"), 2: ("len", "int")}
DOC = {
    1: ("doc_id", "int"),
    2: ("lang", "string"),
    4: ("delta", "sint"),
    5: ("tokens", "packed_int"),
    6: ("spans", ("repeated_message", SPAN)),
    7: ("check", "fixed32"),
    8: ("big", "fixed64"),
    9: ("blob", "bytes"),
    10: ("flag", "bool"),
}


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-protowire")


def test_roundtrip_all_types():
    msg = {
        "doc_id": 1 << 40, "lang": "fr", "delta": -777,
        "tokens": [0, 1, 127, 128, 300000],
        "spans": [{"start": 3, "len": 9}, {"start": 0, "len": 0}],
        "check": 0xFFFFFFFF, "big": (1 << 63) + 17,
        "blob": b"\x00\xffraw", "flag": True,
    }
    assert decode_message(DOC, encode_message(DOC, msg)) == msg


def test_zigzag_and_varint_edges():
    for v in (0, -1, 1, -2, 2, 127, -128, -2**31, 2**31, -2**63,
              2**63 - 1):
        assert unzigzag(zigzag(v)) == v
    for n in (0, 1, 127, 128, 16383, 16384, 2**35, 2**64 - 1):
        data = write_varint(n)
        got, pos = read_varint(data, 0)
        assert got == n and pos == len(data)
    # negative int fields occupy the full 10-byte varint (proto3)
    assert len(write_varint(-1)) == 10


def test_unknown_fields_skipped_by_wire_type():
    msg = {"doc_id": 5, "lang": "en"}
    enc = encode_message(DOC, msg)
    import struct

    extra = (
        enc
        + write_varint(99 << 3) + write_varint(12345)          # varint
        + write_varint((98 << 3) | 2) + write_varint(4) + b"abcd"  # LEN
        + write_varint((97 << 3) | 5) + struct.pack("<I", 7)   # I32
        + write_varint((96 << 3) | 1) + struct.pack("<Q", 7)   # I64
    )
    assert decode_message(DOC, extra) == msg


def test_error_contracts():
    with pytest.raises(ValueError):       # truncated varint
        decode_message(DOC, b"\x08\xff")
    with pytest.raises(ValueError):       # LEN payload overruns
        decode_message(DOC, write_varint((2 << 3) | 2)
                       + write_varint(10) + b"ab")
    with pytest.raises(ValueError):       # wrong wire type for field
        decode_message(DOC, write_varint((1 << 3) | 5) + b"\x00" * 4)
    with pytest.raises(NotImplementedError):   # deprecated group wire
        decode_message(DOC, write_varint((99 << 3) | 3))
    with pytest.raises(NotImplementedError):   # float boundary
        encode_message({1: ("x", "double")}, {"x": 1.5})
    with pytest.raises(ValueError):       # unknown field on encode
        encode_message(DOC, {"nope": 1})


def test_fuzz_roundtrip():
    import random

    rng = random.Random(1309)
    for _ in range(200):
        msg = {
            "doc_id": rng.randrange(1 << 50),
            "lang": "".join(rng.choice("abcdef") for _ in range(
                rng.randint(0, 8))),
            "delta": rng.randint(-10**9, 10**9),
            "tokens": [rng.randrange(1 << 32)
                       for _ in range(rng.randint(0, 10))],
            "spans": [{"start": rng.randrange(1000),
                       "len": rng.randrange(1000)}
                      for _ in range(rng.randint(0, 5))],
            "check": rng.randrange(1 << 32),
            "big": rng.randrange(1 << 64),
            "flag": rng.random() < 0.5,
        }
        if not msg["tokens"]:
            del msg["tokens"]
        if not msg["spans"]:
            del msg["spans"]
        assert decode_message(DOC, encode_message(DOC, msg)) == msg


def test_proto_scan_stats_matches_oracle(spark):
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation22 import (
        PROTO_SCAN_STATS_SQL,
        proto_scan_stats,
    )

    got = sorted(
        tuple(r) for r in proto_scan_stats(spark, SF).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(PROTO_SCAN_STATS_SQL).fetchall()
    )
    assert got == want
    assert any(r[3] < 0 for r in got)     # negative sints in the mix
    assert any(r[6] == 0 for r in got)    # absent repeated field
