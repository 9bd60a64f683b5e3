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


def test_framed_stream_roundtrip_and_chunking():
    import random

    rng = random.Random(131)
    for n in (0, 1, 100, 65536, 65537, 200001):
        data = bytes(rng.randrange(256) for _ in range(min(n, 3000))) \
            * (1 if n <= 3000 else (n // 3000 + 1))
        data = data[:n]
        enc = snappy.compress_framed(data, chunk=4096)
        assert enc[:10] == b"\xff\x06\x00\x00sNaPpY"
        assert snappy.decompress_framed(enc) == data


def test_framed_incompressible_uses_uncompressed_chunks():
    import random

    rng = random.Random(137)
    data = bytes(rng.randrange(256) for _ in range(5000))
    enc = snappy.compress_framed(data, chunk=1000)
    # chunk type 0x01 (uncompressed) must appear for random bytes
    pos, types = 10, set()
    while pos < len(enc):
        types.add(enc[pos])
        ln = int.from_bytes(enc[pos + 1:pos + 4], "little")
        pos += 4 + ln
    assert 0x01 in types
    assert snappy.decompress_framed(enc) == data


def test_framed_crc_and_reserved_chunks():
    data = b"the quick brown fox " * 200
    enc = bytearray(snappy.compress_framed(data))
    # flip a payload byte: masked CRC32C must catch it
    enc[-1] ^= 0xFF
    with pytest.raises(ValueError):
        snappy.decompress_framed(bytes(enc))
    # padding chunk (0xfe) and reserved skippable (0x80) are skipped
    ok = snappy.compress_framed(data)
    padded = (ok[:10]
              + bytes([0xFE]) + (3).to_bytes(3, "little") + b"xxx"
              + bytes([0x80]) + (1).to_bytes(3, "little") + b"y"
              + ok[10:])
    assert snappy.decompress_framed(padded) == data
    # reserved UNSKIPPABLE (0x02-0x7f) is a loud error
    bad = (ok[:10]
           + bytes([0x02]) + (1).to_bytes(3, "little") + b"z" + ok[10:])
    with pytest.raises(ValueError):
        snappy.decompress_framed(bad)


def test_crc32c_public_vectors():
    # the widely published check value for the Castagnoli polynomial
    assert snappy.crc32c(b"123456789") == 0xE3069283
    assert snappy.crc32c(b"") == 0
    # 32 bytes of zeros -> 0x8A9136AA (RFC 7143 appendix test pattern)
    assert snappy.crc32c(b"\x00" * 32) == 0x8A9136AA
