"""MPEG-1 audio queries (plans/curation17.py) and the bitstream codec
under them (operators/mpeg_audio.py) — mono + stereo, Table 3-B.2a/b
selection, bitrate/mode legality, CRC alignment."""

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
    for _, n_active, alloc_sum, _, _, num_sum, crc_flag, _ in got:
        assert 12 <= n_active <= 20          # two channels of 6..10
        assert alloc_sum >= n_active
        # every requant numerator 2c+1-2^nb is odd; 12*n_active of them
        # sum to an even number
        assert num_sum % 2 == 0
        assert crc_flag in (0, 1)
    # both CRC branches exercised across the corpus
    assert {r[6] for r in got} == {0, 1}


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
    # 48 kHz mono 192 kbps: spec-legal (mono max), selects 3-B.2a
    frame = build_layer2_frame(alloc, scfsi, scf, samples,
                               sr_idx=1, br_idx=10)
    got = parse_layer2_frame(frame)
    assert got["alloc_idx"] == alloc
    assert got["levels"] == [3, 5, 9, 15, 65535]
    assert got["scfsi"] == scfsi
    # scfsi expansion: 0 -> a,b,c; 1 -> a,a,b; 2 -> a,a,a; 3 -> a,b,b
    assert got["scf_parts"] == [
        [1, 2, 3], [4, 4, 5], [6, 6, 6], [7, 8, 8], [60, 61, 62]]
    assert got["samples"] == samples
    assert got["sr"] == 48000 and got["kbps"] == 192
    assert got["table"] == "3-B.2a" and got["sblimit"] == 27

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
    # low-bitrate frames now select Table 3-B.2c (r12): an all-silent
    # 32 kbps mono frame parses under sblimit 8
    h = ((0x7FF << 21) | (3 << 19) | (2 << 17) | (1 << 16)
         | (1 << 12) | (0 << 10) | (3 << 6))  # 32 kbps
    low = parse_layer2_frame(h.to_bytes(4, "big") + bytes(200))
    assert low["table"] == "3-B.2c" and low["sblimit"] == 8
    assert low["alloc_idx"] == [0] * 8 and low["levels"] == []
    with _pt.raises(ValueError):  # 384 kbps is two-channel only
        build_layer2_frame(alloc, scfsi, scf, samples,
                           sr_idx=1, br_idx=14)
    with _pt.raises(ValueError):  # 32 kbps is single-channel only
        h = ((0x7FF << 21) | (3 << 19) | (2 << 17) | (1 << 16)
             | (1 << 12) | (0 << 10) | (0 << 6))  # 32 kbps stereo
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
    # and every doc covers >= 14 subbands (two channels of >= 7)
    assert sum(1 for r in got if r[7] >= 1) > len(got) // 2
    assert all(r[2] >= 14 for r in got)
    # both allocation tables AND both CRC branches exercised
    assert {r[1] for r in got} == {27, 30}
    assert {r[9] for r in got} == {0, 1}


def test_layer1_stereo_crc_roundtrip():
    """Two-channel Layer I: the (subband, channel) interleave of
    §2.4.1.5 must round-trip per-channel fields exactly, and a
    protection_bit=0 frame's crc_check word must be consumed so later
    fields stay aligned (ADVICE r11)."""
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        build_layer1_frame,
        parse_layer1_frame,
    )

    a0, a1 = [0] * 32, [0] * 32
    for j, a in enumerate([3, 1, 6]):
        a0[j * 7] = a
    for j in range(5):
        a1[j] = 2 + j % 4
    s0, s1 = [0, 30, 62], [5, 6, 7, 8, 9]
    act0 = [i for i, a in enumerate(a0) if a]
    c0 = [[(s + j) % (1 << (a0[sb] + 1)) for j, sb in enumerate(act0)]
          for s in range(12)]
    c1 = [[(s * 3 + j) % (1 << (a1[j] + 1)) for j in range(5)]
          for s in range(12)]
    for crc in (None, 0xACE5):
        frame = build_layer1_frame(
            [a0, a1], [s0, s1], [c0, c1], mode=0, crc16=crc
        )
        got = parse_layer1_frame(frame)
        assert got["nch"] == 2 and got["mode"] == 0
        assert got["crc_present"] == (crc is not None)
        assert got["alloc"] == [a0, a1]
        assert got["scf_idx"] == [s0, s1]
        assert got["codes"] == [c0, c1]
    # joint stereo (r12): above the intensity bound one allocation and
    # one sample code transmit; channels must agree there.  These
    # channels DIFFER above bound 4, so the builder rejects them
    import pytest as _pt

    with _pt.raises(ValueError):
        build_layer1_frame([a0, a1], [s0, s1], [c0, c1], mode=1,
                           mode_ext=0)


def test_layer2_table_selection_and_stereo():
    """§2.4.2.6 table selection: 48 kHz >= 56 kbps/ch and 44.1/32 kHz
    at 56-80 kbps/ch select 3-B.2a (sblimit 27); 44.1/32 kHz above 80
    kbps/ch select 3-B.2b (sblimit 30) — previously every frame was
    misparsed under 3-B.2a (ADVICE r11, medium).  Stereo frames
    interleave per (subband, channel) and round-trip exactly."""
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        _l2_table_for,
        build_layer2_frame,
        parse_layer2_frame,
    )

    assert _l2_table_for(48000, 192, 1) == ("3-B.2a", 27)
    assert _l2_table_for(44100, 64, 1) == ("3-B.2a", 27)   # 56-80/ch
    assert _l2_table_for(44100, 160, 2) == ("3-B.2a", 27)  # 80/ch
    assert _l2_table_for(44100, 192, 1) == ("3-B.2b", 30)
    assert _l2_table_for(32000, 384, 2) == ("3-B.2b", 30)  # 192/ch
    assert _l2_table_for(48000, 384, 2) == ("3-B.2a", 27)

    # stereo 44.1 @ 384 -> table b: a subband >= 27 is addressable
    al = [0] * 30
    al[0], al[12], al[28] = 2, 3, 1
    scfsi = [0, 2, 3]
    scf = [[1, 2, 3], [4], [5, 6]]
    smp = [[(gr % 7, 0, 6), (gr % 7, 1, 2), (gr % 3, 2, 1)]
           for gr in range(12)]
    al2 = [0] * 30
    al2[5], al2[29] = 4, 2
    scfsi2 = [1, 0]
    scf2 = [[7, 8], [9, 10, 11]]
    smp2 = [[(gr % 9, 8, 0), (gr % 5, 4, 1)] for gr in range(12)]
    frame = build_layer2_frame(
        [al, al2], [scfsi, scfsi2], [scf, scf2], [smp, smp2],
        sr_idx=0, br_idx=14, mode=0, crc16=123,
    )
    got = parse_layer2_frame(frame)
    assert got["table"] == "3-B.2b" and got["sblimit"] == 30
    assert got["nch"] == 2 and got["crc_present"]
    assert got["alloc_idx"] == [al, al2]
    assert got["scfsi"] == [scfsi, scfsi2]
    assert got["samples"] == [smp, smp2]
    assert got["scf_parts"] == [
        [[1, 2, 3], [4, 4, 4], [5, 6, 6]],
        [[7, 7, 8], [9, 10, 11]],
    ]


def test_layer2_low_bitrate_tables_c_and_d():
    """Tables 3-B.2c (44.1/48 kHz, sblimit 8) and 3-B.2d (32 kHz,
    sblimit 12) at <= 48 kbps/ch: 4-bit allocation for subbands 0-1
    over the 9-bearing 15-entry ladder, 3-bit above over its 7-entry
    prefix — full round-trip including grouped 9-level codewords
    (previously an explicit NotImplementedError edge)."""
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        _l2_table_for,
        build_layer2_frame,
        parse_layer2_frame,
    )

    assert _l2_table_for(44100, 32, 1) == ("3-B.2c", 8)
    assert _l2_table_for(48000, 48, 1) == ("3-B.2c", 8)
    assert _l2_table_for(32000, 48, 1) == ("3-B.2d", 12)
    assert _l2_table_for(44100, 96, 2) == ("3-B.2c", 8)   # 48/ch stereo

    # table c: 32 kbps mono at 44.1 kHz (104-byte frame)
    al = [0] * 8
    al[0], al[1], al[3] = 3, 9, 3           # levels 9, 511, 9
    scfsi = [2, 2, 2]                       # 1 transmitted scf each
    scf = [[10], [20], [30]]
    smp = [[(gr % 9, 8, 0), ((gr * 37) % 511, 510, 2), ((gr * 5) % 9, 0, 4)]
           for gr in range(12)]
    frame = build_layer2_frame(al, scfsi, scf, smp, sr_idx=0, br_idx=1)
    got = parse_layer2_frame(frame)
    assert got["table"] == "3-B.2c" and got["sblimit"] == 8
    assert got["alloc_idx"] == al
    assert got["levels"] == [9, 511, 9]
    assert got["samples"] == smp
    assert len(frame) == 144 * 32000 // 44100

    # table d: 48 kbps mono at 32 kHz, high subband 11 live
    al = [0] * 12
    al[1], al[11] = 2, 7                    # levels 5, 127
    scfsi = [0, 3]
    scf = [[1, 2, 3], [4, 5]]
    smp = [[(gr % 5, 4, 0), (gr % 127, 126, 1)] for gr in range(12)]
    frame = build_layer2_frame(al, scfsi, scf, smp, sr_idx=2, br_idx=2)
    got = parse_layer2_frame(frame)
    assert got["table"] == "3-B.2d" and got["sblimit"] == 12
    assert got["levels"] == [5, 127]
    assert got["samples"] == smp
    # 7 is NOT on the c/d ladder: allocation index 3 on subband 2 maps
    # to 9, never 7
    al2 = [0] * 12
    al2[2] = 3
    got2 = parse_layer2_frame(build_layer2_frame(
        al2, [1], [[6, 7]], [[(2, 8, 5)]] * 12, sr_idx=2, br_idx=2))
    assert got2["levels"] == [9]


def test_joint_stereo_intensity_bound_both_layers():
    """Mode 1 (joint stereo): at/above bound = (mode_ext+1)*4,
    allocation and samples transmit ONCE while scalefactors stay
    per-channel (the intensity-stereo wire layout, §2.4.1.5/6) —
    round-tripped for both layers, with the bound clamped to sblimit
    and a mismatch above the bound rejected."""
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        _intensity_bound,
        build_layer2_frame,
        parse_layer2_frame,
    )

    assert _intensity_bound(1, 0, 32) == 4
    assert _intensity_bound(1, 3, 32) == 16
    assert _intensity_bound(1, 3, 8) == 8      # clamped to sblimit
    assert _intensity_bound(0, 3, 32) == 32    # non-joint: no region

    # Layer II joint at 44.1/384 (table b), bound 8
    al0, al1 = [0] * 30, [0] * 30
    al0[0], al1[0] = 2, 4                      # stereo region differs
    al0[9] = al1[9] = 3                        # intensity: must match
    scfsi0, scfsi1 = [0, 2], [1, 3]
    scf0, scf1 = [[1, 2, 3], [4]], [[5, 6], [7, 8]]
    lv0 = [5, 7]                               # group rows: idx2->5, idx3->7
    lv1 = [9, 7]
    sm0 = [[(gr % 5, 4, 0), (gr % 7, 6, 1)] for gr in range(12)]
    sm1 = [[(gr % 9, 8, 2), (gr % 7, 6, 1)] for gr in range(12)]
    frame = build_layer2_frame(
        [al0, al1], [scfsi0, scfsi1], [scf0, scf1], [sm0, sm1],
        sr_idx=0, br_idx=14, mode=1, mode_ext=1,
    )
    got = parse_layer2_frame(frame)
    assert got["mode"] == 1 and got["bound"] == 8
    assert got["alloc_idx"] == [al0, al1]
    assert got["samples"] == [sm0, sm1]
    assert got["scf_parts"] == [
        [[1, 2, 3], [4, 4, 4]], [[5, 5, 6], [7, 8, 8]]]

    import pytest as _pt

    with _pt.raises(ValueError):   # intensity samples must match
        bad = [row[:] for row in sm1]
        bad[0] = [bad[0][0], (0, 0, 0)]
        build_layer2_frame(
            [al0, al1], [scfsi0, scfsi1], [scf0, scf1], [sm0, bad],
            sr_idx=0, br_idx=14, mode=1, mode_ext=1,
        )
