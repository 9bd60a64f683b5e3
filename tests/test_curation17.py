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


def test_layer2_bitstream_roundtrip_and_errors():
    """Layer II: every field written must read back exactly — the
    Table 3-B.2a allocation widths per subband group, scfsi-dependent
    scalefactor expansion, and 3/5/9-level GROUPED codewords — with
    forbidden values rejected and the honest low-bitrate edge raised."""
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        build_layer2_frame,
        parse_layer2_frame,
    )

    alloc = [0] * 27
    alloc[0] = 1    # group 0: levels 3 (grouped, 5-bit codeword)
    alloc[4] = 2    # group 1: levels 5 (grouped, 7-bit)
    alloc[7] = 4    # group 1: levels 9 (grouped, 10-bit)
    alloc[12] = 5   # group 2: levels 15 (ungrouped, 4-bit samples)
    alloc[24] = 3   # group 3: levels 65535 (ungrouped, 16-bit)
    scfsi = [0, 1, 2, 3, 0]
    scf = [[1, 2, 3], [4, 5], [6], [7, 8], [60, 61, 62]]
    samples = [
        [
            (gr % 3, (gr + 1) % 3, (gr + 2) % 3),
            (gr % 5, 4, 0),
            (gr % 9, 8, 1),
            (gr % 15, 14, 7),
            ((gr * 9999) % 65535, 65534, 0),
        ]
        for gr in range(12)
    ]
    frame = build_layer2_frame(alloc, scfsi, scf, samples, br_idx=14)
    got = parse_layer2_frame(frame)
    assert got["alloc_idx"] == alloc
    assert got["levels"] == [3, 5, 9, 15, 65535]
    assert got["scfsi"] == scfsi
    # scfsi expansion: 0 -> a,b,c; 1 -> a,a,b; 2 -> a,a,a; 3 -> a,b,b
    assert got["scf_parts"] == [
        [1, 2, 3], [4, 4, 5], [6, 6, 6], [7, 8, 8], [60, 61, 62]]
    assert got["samples"] == samples
    assert got["sr"] == 44100 and got["kbps"] == 384

    # forbidden / malformed
    import pytest as _pt

    with _pt.raises(ValueError):   # allocation out of group range
        build_layer2_frame(
            [0] * 23 + [4, 0, 0, 0], [0], [[1, 2, 3]],
            [[(0, 0, 0)]] * 12)
    with _pt.raises(ValueError):   # scfsi/scf arity mismatch
        build_layer2_frame(alloc, scfsi, [[1, 2], *scf[1:]], samples)
    with _pt.raises(ValueError):   # sample exceeds levels
        bad = [row[:] for row in samples]
        bad[0] = [(3, 0, 0), *bad[0][1:]]
        build_layer2_frame(alloc, scfsi, scf, bad)
    with _pt.raises(ValueError):   # hostile: Layer I header to L2 parser
        from data_pipeline_who_gho_spark.operators.mpeg_audio import (
            build_layer1_frame,
        )
        l1 = build_layer1_frame([1] + [0] * 31, [0], [[0]] * 12)
        parse_layer2_frame(l1)
    with _pt.raises(NotImplementedError):  # low-bitrate 3-B.2c/d layout
        h = ((0x7FF << 21) | (3 << 19) | (2 << 17) | (1 << 16)
             | (1 << 12) | (0 << 10) | (3 << 6))  # 32 kbps
        parse_layer2_frame(h.to_bytes(4, "big") + bytes(200))
    # Layer I parser routes Layer II frames to the right entry point
    with _pt.raises(NotImplementedError):
        from data_pipeline_who_gho_spark.operators.mpeg_audio import (
            parse_layer1_frame,
        )
        parse_layer1_frame(frame)


def test_mpeg1_layer2_bitstream_stats_matches_oracle(spark):
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation17 import (
        CURATION17_ORACLE_SQL,
        mpeg1_layer2_bitstream_stats,
    )

    got = sorted(
        tuple(r)
        for r in mpeg1_layer2_bitstream_stats(spark, SF).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            CURATION17_ORACLE_SQL["mpeg1_layer2_bitstream_stats"]
        ).fetchall()
    )
    assert got == want
    # grouping is exercised across most of the corpus (a doc whose
    # closed-form allocations all land on ungrouped levels is fine),
    # and every doc covers >= 7 subbands incl. the 2-bit group
    assert sum(1 for r in got if r[6] >= 1) > len(got) // 2
    assert all(r[1] >= 7 for r in got)
