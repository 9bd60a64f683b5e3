"""Pure-stdlib Snappy raw-block codec (operators/snappy.py): format
vectors, fuzz round-trips, framing error contracts, and the Avro
container integration (per-block big-endian CRC32 trailer)."""

from __future__ import annotations

import pytest

from data_pipeline_who_gho_spark.operators import snappy


def test_known_format_vectors():
    # literal-only stream: len-10 preamble, literal tag, payload
    assert snappy.decompress(
        bytes([3]) + bytes([2 << 2]) + b"abc"
    ) == b"abc"
    # overlapping copy encodes a run: 'a' + copy(offset=1, len=9)
    run = bytes([10, 0 << 2]) + b"a" + bytes([1 | ((9 - 4) << 2), 1])
    assert snappy.decompress(run) == b"a" * 10
    # 2-byte-offset copy
    two = (bytes([8]) + bytes([3 << 2]) + b"wxyz"
           + bytes([2 | ((4 - 1) << 2)]) + (4).to_bytes(2, "little"))
    assert snappy.decompress(two) == b"wxyzwxyz"
    # 61-byte literal spills its length into one trailing byte
    lit = b"q" * 61
    assert snappy.decompress(bytes([61]) + bytes([60 << 2, 60]) + lit) == lit


def test_compressor_emits_real_copies():
    data = b"the quick brown fox " * 64
    enc = snappy.compress(data)
    assert len(enc) < len(data) // 4  # repetitive input must compress
    assert snappy.decompress(enc) == data


def test_fuzz_roundtrip():
    import random

    rng = random.Random(1301)
    for _ in range(200):
        n = rng.randint(0, 4000)
        alpha = rng.choice([b"ab", b"abcdefgh", bytes(range(256))])
        data = bytes(rng.choice(alpha) for _ in range(n))
        assert snappy.decompress(snappy.compress(data)) == data


def test_error_contracts():
    with pytest.raises(ValueError):  # truncated preamble
        snappy.decompress(b"")
    with pytest.raises(ValueError):  # truncated literal
        snappy.decompress(bytes([5]) + bytes([4 << 2]) + b"ab")
    with pytest.raises(ValueError):  # copy offset before stream start
        snappy.decompress(bytes([4]) + bytes([1 | (0 << 2), 9]))
    with pytest.raises(ValueError):  # length mismatch vs preamble
        snappy.decompress(bytes([9]) + bytes([2 << 2]) + b"abc")


def test_avro_snappy_crc_is_checked():
    from data_pipeline_who_gho_spark.operators.avro import (
        build_avro,
        read_avro,
    )

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": "long"}]}
    recs = [{"x": i} for i in range(100)]
    payload = build_avro(schema, recs, codec="snappy")
    assert read_avro(payload)["records"] == recs
    # flip one byte inside the first block's compressed payload: the
    # per-block CRC32-of-uncompressed trailer must catch it (when the
    # corruption even decodes as valid snappy framing)
    sync_at = payload.index(b"\x00" * 16)
    corrupt = bytearray(payload)
    corrupt[sync_at + 20] ^= 0xFF
    with pytest.raises(ValueError):
        read_avro(bytes(corrupt))
