"""Round-10 fourth-set query (plans/curation17.py): MPEG-1 Layer I
bitstream decode and the codec operators under it."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-curation17")


def _oracle(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_layer1_bitstream_roundtrip_and_errors():
    """Every field written must read back exactly through the real
    bit-level codec, with the spec's forbidden values rejected."""
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        build_layer1_frame,
        parse_layer1_frame,
    )

    alloc = [0] * 32
    for j, a in enumerate([3, 1, 6, 14, 2]):
        alloc[j * 5] = a
    scf = [0, 17, 34, 62, 5]
    active = [i for i, a in enumerate(alloc) if a]
    codes = [
        [(s * 7 + j * 13) % (1 << (alloc[sb] + 1))
         for j, sb in enumerate(active)]
        for s in range(12)
    ]
    frame = build_layer1_frame(alloc, scf, codes)
    got = parse_layer1_frame(frame)
    assert got["alloc"] == alloc
    assert got["scf_idx"] == scf
    assert got["codes"] == codes
    assert got["sr"] == 44100 and got["kbps"] == 448
    # exact rational requantization: nb=15 full-scale code maps to
    # (2c + 1 - 2^15)/(2^15 - 1)
    nb = 15
    c = codes[0][3]
    assert got["requant_num"][0][3] == 2 * c + 1 - (1 << nb)
    assert got["requant_den"][0][3] == (1 << nb) - 1
    # forbidden values raise
    with pytest.raises(ValueError):
        build_layer1_frame([15] + [0] * 31, [0], [[0]] * 12)
    with pytest.raises(ValueError):
        build_layer1_frame(alloc, [63, 0, 0, 0, 0], codes)
    with pytest.raises(ValueError):
        parse_layer1_frame(b"\x00\x00\x00\x00")
    # Layer II/III sample decode: the explicit honest boundary
    from data_pipeline_who_gho_spark.operators.containers import build_mp3

    l3 = build_mp3([(5, 0)])
    with pytest.raises(NotImplementedError):
        parse_layer1_frame(l3)


def test_layer1_synthesis_two_implementations_agree():
    """The direct matrix form and the shifting-FIFO form of the
    synthesis filterbank must agree to float precision on random
    subband input, and a zero input must synthesize silence."""
    import numpy as np

    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        synthesize_buffered,
        synthesize_direct,
    )

    rng = np.random.default_rng(7)
    s = rng.standard_normal((20, 32))
    a = synthesize_direct(s)
    b = synthesize_buffered(s)
    assert np.allclose(a, b, rtol=0, atol=1e-9)
    assert np.allclose(synthesize_direct(np.zeros((8, 32))), 0.0)
    # energy sanity: output is bounded by input scale (window is 1/32-normalized)
    assert np.isfinite(a).all() and np.abs(a).max() < 1e3


def test_mpeg1_layer1_subband_stats_matches_oracle(spark):
    """The real bitstream unpack must land exactly on the synthesis
    closed form — the variable-width layout means one mis-read bit
    breaks codes_md5 on that doc."""
    from data_pipeline_who_gho_spark.plans.curation17 import (
        MPEG1_L1_SQL,
        mpeg1_layer1_subband_stats,
    )

    got = sorted(
        tuple(r) for r in mpeg1_layer1_subband_stats(spark, SF).collect()
    )
    assert got == _oracle(MPEG1_L1_SQL)
    for _, n_active, alloc_sum, _, _, num_sum, _ in got:
        assert 6 <= n_active <= 10
        assert alloc_sum >= n_active
        # every requant numerator 2c+1-2^nb is odd; 12*n_active of them
        # sum to an even number
        assert num_sum % 2 == 0


def test_layer1_reserved_header_codes_raise_valueerror():
    """Hostile headers with reserved sample-rate index 3 or bitrate
    index 0/15 must raise ValueError (the module's malformed-input
    contract), not leak KeyError/IndexError from the rate tables
    (r10 ADVICE)."""
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        parse_layer1_frame,
    )

    def header(br_idx, sr_idx):
        h = ((0x7FF << 21) | (3 << 19) | (3 << 17) | (1 << 16)
             | (br_idx << 12) | (sr_idx << 10) | (3 << 6))
        return h.to_bytes(4, "big") + bytes(64)

    for br_idx, sr_idx in ((8, 3), (15, 0), (0, 0)):
        with pytest.raises(ValueError):
            parse_layer1_frame(header(br_idx, sr_idx))
    # a valid header still parses
    got = parse_layer1_frame(header(8, 0))
    assert got["sr"] == 44100 and got["kbps"] == 256
