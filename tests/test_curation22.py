"""Round-13 MPEG-1 Layer III spectral decode (operators/mpeg_audio.py
Layer III section, plans/curation22.py): writer/reader round-trip,
scfsi reuse, part2_3_length accounting, honest edges, and the
oracle-matched query at sf0.001 and sf0.01."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-curation22")


def _mk_granule(seed, bv=60, nq=30, comp=13):
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        _GranuleSpec,
    )

    vals = [0] * 576
    for i in range(2 * bv):
        vals[i] = ((seed * 7 + i * 3) % 3) - 1
    for q in range(nq):
        for k in range(4):
            vals[2 * bv + 4 * q + k] = (0, 1, 0, -1)[
                (seed * 5 + q * 7 + k * 3) % 4
            ]
    sf = [(seed + 5 * b) % 8 for b in range(21)]
    return _GranuleSpec(vals, sf, (seed * 13) % 256, comp, bv)


def test_l3_roundtrip_stereo_with_crc():
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        build_layer3_frame,
        parse_layer3_frame,
    )

    grs = [[_mk_granule(1), _mk_granule(2)],
           [_mk_granule(3), _mk_granule(4)]]
    frame = build_layer3_frame(grs, mode=0, crc16=0xBEEF)
    got = parse_layer3_frame(frame)
    assert got["crc_present"] and got["nch"] == 2
    assert got["main_data_begin"] == 0
    for g in range(2):
        for c in range(2):
            assert got["values"][g][c] == grs[g][c].values
            assert got["scalefac"][g][c] == grs[g][c].scalefac
            assert got["side"][g][c]["big_values"] == grs[g][c].big_values
    # frame length is the spec's 144 * bitrate / sr
    assert len(frame) == 144 * 320000 // 44100


def test_l3_scfsi_reuse_and_bit_accounting():
    """scfsi-set groups transmit in granule 0 only; granule 1's
    part2_3_length must shrink by exactly the skipped scalefactor
    bits, and the reader reconstructs the reused values."""
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        _L3_SLEN,
        build_layer3_frame,
        parse_layer3_frame,
    )

    g0, g1 = _mk_granule(7), _mk_granule(9)
    g1.scalefac[:6] = g0.scalefac[:6]        # group 0 (bands 0-5)
    g1.scalefac[16:21] = g0.scalefac[16:21]  # group 3 (bands 16-20)
    base = parse_layer3_frame(
        build_layer3_frame([[g0], [g1]], mode=3)
    )
    shared = parse_layer3_frame(
        build_layer3_frame([[g0], [g1]], mode=3, scfsi=[0b1001])
    )
    assert shared["scalefac"][1][0] == g1.scalefac
    slen1, slen2 = _L3_SLEN[g1.scalefac_compress]
    skipped_bits = 6 * slen1 + 5 * slen2     # 6 bands grp0 + 5 grp3
    assert (base["side"][1][0]["part2_3_length"]
            - shared["side"][1][0]["part2_3_length"]) == skipped_bits
    # granule 0 is untouched by scfsi
    assert (base["side"][0][0]["part2_3_length"]
            == shared["side"][0][0]["part2_3_length"])


def test_l3_trailing_zero_quads_trimmed():
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        _GranuleSpec,
        build_layer3_frame,
        parse_layer3_frame,
    )

    vals = [0] * 576
    vals[0], vals[1] = 1, -1                 # one big-values pair
    vals[2 + 4] = 1                          # second quad nonzero only
    g = _GranuleSpec(vals, [0] * 21, 100, 0, 1)
    got = parse_layer3_frame(build_layer3_frame([[g], [g]], mode=3))
    assert got["values"][0][0] == vals
    assert got["n_count1_quads"][0][0] == 2  # trailing zeros trimmed


def test_l3_requantize_formula():
    """Spec §2.4.3.4.7: global_gain=210, scalefac_scale=0, zero
    scalefactors -> gain exactly 1.0; a scalefactor of 1 at
    scalefac_scale=1 -> 2^-2; |is|^(4/3) on the magnitudes."""
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        requantize_l3,
    )

    side = {"global_gain": 210, "scalefac_scale": 0, "preflag": 0}
    vals = [1, -1, 0] + [0] * 573
    xr = requantize_l3(vals, [0] * 21, side)
    assert xr[:3] == [1.0, -1.0, 0.0]
    side2 = {"global_gain": 210, "scalefac_scale": 1, "preflag": 0}
    xr2 = requantize_l3([1] + [0] * 575, [1] + [0] * 20, side2)
    assert xr2[0] == pytest.approx(2.0 ** -2)


def test_l3_honest_edges():
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        _GranuleSpec,
        build_layer3_frame,
        parse_layer3_frame,
    )

    g = _mk_granule(1)
    frame = bytearray(build_layer3_frame([[g], [g]], mode=3))
    # a big-values magnitude > 1 needs an uncarried Huffman table
    bad = _GranuleSpec([2] + [0] * 575, [0] * 21, 0, 0, 1)
    with pytest.raises(NotImplementedError):
        build_layer3_frame([[bad], [bad]], mode=3)
    # bit reservoir: force main_data_begin != 0 (9 bits right after
    # the 4-byte header in an unprotected frame)
    frame2 = bytearray(frame)
    frame2[4] |= 0x80
    with pytest.raises(NotImplementedError):
        parse_layer3_frame(bytes(frame2))
    # Layer II frame routed here is a loud error
    l2ish = bytearray(frame)
    l2ish[1] = (l2ish[1] & ~0x06) | 0x04     # layer bits -> Layer II
    with pytest.raises(ValueError):
        parse_layer3_frame(bytes(l2ish))
    # 48 kHz scalefactor-band table is not carried
    with pytest.raises(NotImplementedError):
        build_layer3_frame([[g], [g]], mode=3, sr=48000)


def test_l3_fuzz_roundtrip():
    import random

    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        _GranuleSpec,
        build_layer3_frame,
        parse_layer3_frame,
    )

    rng = random.Random(1313)
    for _ in range(25):
        mode = rng.choice([0, 3])
        nch = 2 if mode == 0 else 1
        grs = []
        for _g in range(2):
            chs = []
            for _c in range(nch):
                bv = rng.randint(0, 119)
                nq = rng.randint(0, 30)
                comp = rng.choice([0, 13, 15])
                from data_pipeline_who_gho_spark.operators import (
                    mpeg_audio as ma,
                )

                s1, s2 = ma._L3_SLEN[comp]
                vals = [0] * 576
                for i in range(2 * bv):
                    vals[i] = rng.choice([-1, 0, 1])
                for i in range(2 * bv, min(2 * bv + 4 * nq, 576)):
                    vals[i] = rng.choice([-1, 0, 0, 1])
                sf = [rng.randrange(1 << (s1 if b < 11 else s2))
                      if (s1 if b < 11 else s2) else 0
                      for b in range(21)]
                chs.append(_GranuleSpec(
                    vals, sf, rng.randrange(256), comp, bv,
                    scalefac_scale=rng.randint(0, 1),
                ))
            grs.append(chs)
        got = parse_layer3_frame(build_layer3_frame(grs, mode=mode))
        for g in range(2):
            for c in range(nch):
                assert got["values"][g][c] == grs[g][c].values
                assert got["scalefac"][g][c] == grs[g][c].scalefac


def _oracle(sql, sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_l3_spectral_stats_matches_oracle(spark, sf):
    from data_pipeline_who_gho_spark.plans.curation22 import (
        MPEG1_L3_SQL,
        mpeg1_layer3_spectral_stats,
    )

    got = sorted(
        tuple(r)
        for r in mpeg1_layer3_spectral_stats(spark, sf).collect()
    )
    assert got == _oracle(MPEG1_L3_SQL, sf)
    assert {r[1] for r in got} == {0, 3}      # both modes in the mix
    assert all(r[4] > 0 and r[9] > 0 for r in got)  # bits + nonzeros


def test_l3_bit_reservoir_stream_roundtrip():
    """§2.4.3.1: dense/sparse frames alternate so main_data_begin
    actually walks backward into preceding frames' ancillary space;
    every granule must recover exactly, and a standalone parse of a
    reservoir frame must fail loudly (its data is elsewhere)."""
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        build_layer3_stream,
        parse_layer3_frame,
        parse_layer3_stream,
    )

    frames = [
        [[_mk_granule(i * 2 + g, bv=90 if i % 2 == 0 else 8,
                      nq=25 if i % 2 == 0 else 3)]
         for g in range(2)]
        for i in range(6)
    ]
    stream = build_layer3_stream(frames, mode=3, kbps=64)
    got = parse_layer3_stream(stream)
    assert len(got) == 6
    mdbs = [f["main_data_begin"] for f in got]
    assert mdbs[0] == 0 and any(m > 0 for m in mdbs[1:])
    for i, f in enumerate(got):
        for g in range(2):
            assert f["values"][g][0] == frames[i][g][0].values
            assert f["scalefac"][g][0] == frames[i][g][0].scalefac
    # a reservoir frame alone is undecodable — loud, typed error
    frame_len = len(stream) // 6
    reservoir_frame = stream[frame_len:2 * frame_len]
    assert mdbs[1] > 0
    with pytest.raises(NotImplementedError):
        parse_layer3_frame(reservoir_frame)
    # ...and a stream STARTING at it underruns the reservoir
    with pytest.raises(ValueError):
        parse_layer3_stream(stream[frame_len:])


def test_l3_reservoir_511_cap_and_slot_overflow():
    """The 9-bit main_data_begin reaches at most 511 bytes back — the
    writer pads the gap with ancillary bytes instead of overflowing
    the field; and a frame whose data cannot END inside its own slot
    is a loud error (the reservoir only borrows backward)."""
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        _GranuleSpec,
        build_layer3_stream,
        parse_layer3_stream,
    )

    empty = _GranuleSpec([0] * 576, [0] * 21, 0, 0, 0)
    # 64 kbps mono slots are 187 B: five near-empty frames leave a
    # gap far past 511 — the cap must hold on the wire
    frames = [[[empty], [empty]] for _ in range(6)]
    got = parse_layer3_stream(build_layer3_stream(frames, mode=3, kbps=64))
    assert max(f["main_data_begin"] for f in got) == 511
    # a dense frame at a tiny bitrate cannot fit its own slot
    dense = _mk_granule(1, bv=119, nq=30)
    with pytest.raises(ValueError):
        build_layer3_stream([[[dense], [dense]]], mode=3, kbps=32)


def test_l3_reservoir_stats_matches_oracle(spark):
    from data_pipeline_who_gho_spark.plans.curation22 import (
        MPEG1_L3R_SQL,
        mpeg1_layer3_reservoir_stats,
    )

    for sf in (SF, "/root/testdata/sf0.01"):
        got = sorted(
            tuple(r)
            for r in mpeg1_layer3_reservoir_stats(spark, sf).collect()
        )
        assert got == _oracle(MPEG1_L3R_SQL, sf)
        # the reservoir is genuinely in use across the fixture
        assert any(r[2] > 0 for r in got) and any(r[3] > 100 for r in got)


def test_l3_requantize_preflag_pretab():
    """preflag=1 adds the pretab entry to the scalefactor exponent:
    band 11 has pretab 1, so a line there gains an extra 2^-(ss+1)
    factor relative to preflag=0."""
    from data_pipeline_who_gho_spark.operators.mpeg_audio import (
        _L3_SFB_LONG_44100,
        requantize_l3,
    )

    i = _L3_SFB_LONG_44100[11]           # first line of band 11
    vals = [0] * 576
    vals[i] = 1
    base = {"global_gain": 210, "scalefac_scale": 0, "preflag": 0}
    pre = {"global_gain": 210, "scalefac_scale": 0, "preflag": 1}
    x0 = requantize_l3(vals, [0] * 21, base)[i]
    x1 = requantize_l3(vals, [0] * 21, pre)[i]
    assert x0 == 1.0 and x1 == pytest.approx(0.5)   # pretab[11] == 1
    # band 17 (pretab 3) scales by 2^-3
    j = _L3_SFB_LONG_44100[17]
    vals2 = [0] * 576
    vals2[j] = 1
    assert requantize_l3(vals2, [0] * 21, pre)[j] == pytest.approx(2.0 ** -3)
