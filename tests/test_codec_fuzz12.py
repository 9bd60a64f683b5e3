"""Round-12 randomized round-trip fuzz for the codec surfaces that
grew this round: MPEG-1 Layer II across all tables/modes, Layer I
across modes, and Avro nested schemas with enum/fixed/named refs.

Plain seeded random (house style, cf. test_curation19's PDF fuzz):
each case draws legal parameters, builds the real bitstream/container,
parses it back, and asserts field-exact recovery — one mis-sized field
anywhere in a variable-width layout shifts everything after it."""

from __future__ import annotations

import random

from data_pipeline_who_gho_spark.operators.mpeg_audio import (
    _GROUPED_BITS,
    _intensity_bound,
    _l2_check_mode_bitrate,
    _l2_group,
    _l2_table_for,
    _BR_TABLE_L2,
    _SR_TABLE,
    build_layer1_frame,
    build_layer2_frame,
    parse_layer1_frame,
    parse_layer2_frame,
)

_SCFSI_TX = {0: 3, 1: 2, 2: 1, 3: 2}


def _legal_l2_combos():
    out = []
    for sr_idx in (0, 1, 2):
        for br_idx in range(1, 15):
            for mode in (0, 1, 2, 3):
                nch = 1 if mode == 3 else 2
                try:
                    _l2_check_mode_bitrate(_BR_TABLE_L2[br_idx], nch)
                except ValueError:
                    continue
                out.append((sr_idx, br_idx, mode))
    return out


def _rand_l2_channel(rng, sblimit, budget_bits):
    """Random allocation/scfsi/scf/samples for one channel, with the
    per-channel coded size tracked so the frame budget holds."""
    alloc = [0] * sblimit
    scfsi, scf, levels = [], [], []
    used = 0
    for sb in rng.sample(range(sblimit), k=rng.randint(1, min(6, sblimit))):
        width, lv_row = _l2_group(sb, sblimit)
        idx = rng.randint(1, min(len(lv_row), 6))
        lv = lv_row[idx - 1]
        cost = 12 * (_GROUPED_BITS.get(lv) or
                     3 * (lv + 1).bit_length() - 3)
        if used + cost + 24 > budget_bits:
            continue
        used += cost + 24  # samples + scfsi + worst-case 3 scfs
        alloc[sb] = idx
    active = [sb for sb, a in enumerate(alloc) if a]
    for sb in active:
        _w, lv_row = _l2_group(sb, sblimit)
        levels.append(lv_row[alloc[sb] - 1])
        si = rng.randint(0, 3)
        scfsi.append(si)
        scf.append([rng.randint(0, 62) for _ in range(_SCFSI_TX[si])])
    samples = [
        [tuple(rng.randrange(lv) for _ in range(3)) for lv in levels]
        for _ in range(12)
    ]
    return alloc, scfsi, scf, samples, active


def test_layer2_roundtrip_fuzz_all_tables_and_modes():
    rng = random.Random(1217)
    combos = _legal_l2_combos()
    for _ in range(60):
        sr_idx, br_idx, mode = rng.choice(combos)
        nch = 1 if mode == 3 else 2
        kbps = _BR_TABLE_L2[br_idx]
        _table, sblimit = _l2_table_for(_SR_TABLE[sr_idx], kbps, nch)
        frame_bits = (144 * kbps * 1000 // _SR_TABLE[sr_idx]) * 8
        budget = (frame_bits - 64 - 2 * 94 * nch) // nch
        chans = [
            _rand_l2_channel(rng, sblimit, budget) for _ in range(nch)
        ]
        mode_ext = rng.randint(0, 3)
        if mode == 1:
            # intensity region: force agreement by mirroring channel 0
            bound = _intensity_bound(1, mode_ext, sblimit)
            a0 = chans[0][0]
            a1 = list(chans[1][0])
            for sb in range(bound, sblimit):
                a1[sb] = a0[sb]
            chans[1] = _rebuild_channel(rng, a1, sblimit)
            _mirror_intensity(chans, bound, sblimit)
        crc = rng.choice([None, rng.randrange(1 << 16)])
        kwargs = dict(sr_idx=sr_idx, br_idx=br_idx, mode=mode,
                      crc16=crc, mode_ext=mode_ext)
        if nch == 1:
            al, si, sc, sm, _a = chans[0]
            frame = build_layer2_frame(al, si, sc, sm, **kwargs)
        else:
            frame = build_layer2_frame(
                [c[0] for c in chans], [c[1] for c in chans],
                [c[2] for c in chans], [c[3] for c in chans], **kwargs
            )
        got = parse_layer2_frame(frame)
        assert got["sr"] == _SR_TABLE[sr_idx] and got["kbps"] == kbps
        assert got["mode"] == mode and got["crc_present"] == (crc is not None)
        if nch == 1:
            assert got["alloc_idx"] == chans[0][0]
            assert got["scfsi"] == chans[0][1]
            assert got["samples"] == chans[0][3]
        else:
            assert got["alloc_idx"] == [c[0] for c in chans]
            assert got["scfsi"] == [c[1] for c in chans]
            assert got["samples"] == [c[3] for c in chans]


def _rebuild_channel(rng, alloc, sblimit):
    """Channel fields consistent with a FIXED allocation vector."""
    active = [sb for sb, a in enumerate(alloc) if a]
    levels = [_l2_group(sb, sblimit)[1][alloc[sb] - 1] for sb in active]
    scfsi = [rng.randint(0, 3) for _ in active]
    scf = [
        [rng.randint(0, 62) for _ in range(_SCFSI_TX[si])]
        for si in scfsi
    ]
    samples = [
        [tuple(rng.randrange(lv) for _ in range(3)) for lv in levels]
        for _ in range(12)
    ]
    return alloc, scfsi, scf, samples, active


def _mirror_intensity(chans, bound, sblimit):
    """Copy channel 0's intensity-region samples into channel 1."""
    a0, _s0, _c0, sm0, act0 = chans[0]
    a1, _s1, _c1, sm1, act1 = chans[1]
    at0 = {sb: j for j, sb in enumerate(act0)}
    at1 = {sb: j for j, sb in enumerate(act1)}
    for sb in range(bound, sblimit):
        if a0[sb]:
            for gr in range(12):
                sm1[gr][at1[sb]] = sm0[gr][at0[sb]]


def test_layer1_roundtrip_fuzz_all_modes():
    rng = random.Random(1226)
    for _ in range(60):
        mode = rng.choice([0, 1, 2, 3])
        nch = 1 if mode == 3 else 2
        mode_ext = rng.randint(0, 3)
        bound = _intensity_bound(mode, mode_ext, 32)

        def chan():
            alloc = [0] * 32
            for sb in rng.sample(range(32), k=rng.randint(1, 8)):
                alloc[sb] = rng.randint(1, 7)   # nb 2..8: budget-safe
            act = [sb for sb, a in enumerate(alloc) if a]
            scf = [rng.randint(0, 62) for _ in act]
            codes = [
                [rng.randrange(1 << (alloc[sb] + 1)) for sb in act]
                for _ in range(12)
            ]
            return alloc, scf, codes, act

        chans = [chan() for _ in range(nch)]
        if mode == 1:
            a0, _f0, c0, act0 = chans[0]
            a1 = list(chans[1][0])
            for sb in range(bound, 32):
                a1[sb] = a0[sb]
            act1 = [sb for sb, a in enumerate(a1) if a]
            scf1 = [rng.randint(0, 62) for _ in act1]
            at0 = {sb: j for j, sb in enumerate(act0)}
            codes1 = [
                [
                    c0[s][at0[sb]] if sb >= bound
                    else rng.randrange(1 << (a1[sb] + 1))
                    for sb in act1
                ]
                for s in range(12)
            ]
            chans[1] = (a1, scf1, codes1, act1)
        crc = rng.choice([None, rng.randrange(1 << 16)])
        kwargs = dict(mode=mode, crc16=crc, mode_ext=mode_ext)
        if nch == 1:
            al, sc, co, _a = chans[0]
            frame = build_layer1_frame(al, sc, co, **kwargs)
        else:
            frame = build_layer1_frame(
                [c[0] for c in chans], [c[1] for c in chans],
                [c[2] for c in chans], **kwargs
            )
        got = parse_layer1_frame(frame)
        assert got["crc_present"] == (crc is not None)
        if nch == 1:
            assert got["alloc"] == chans[0][0]
            assert got["codes"] == chans[0][2]
        else:
            assert got["alloc"] == [c[0] for c in chans]
            assert got["scf_idx"] == [c[1] for c in chans]
            assert got["codes"] == [c[2] for c in chans]


def test_avro_nested_schema_fuzz():
    from data_pipeline_who_gho_spark.operators.avro import (
        build_avro,
        read_avro,
    )

    rng = random.Random(1230)
    counter = [0]

    def rand_schema(depth):
        kinds = ["long", "string", "boolean", "bytes", "enum", "fixed"]
        if depth > 0:
            kinds += ["record", "array", "map", "union"]
        k = rng.choice(kinds)
        counter[0] += 1
        n = counter[0]
        if k == "enum":
            return {"type": "enum", "name": f"E{n}",
                    "symbols": [f"S{i}" for i in range(rng.randint(2, 5))]}
        if k == "fixed":
            return {"type": "fixed", "name": f"F{n}",
                    "size": rng.randint(1, 6)}
        if k == "record":
            return {"type": "record", "name": f"R{n}",
                    "fields": [
                        {"name": f"f{i}", "type": rand_schema(depth - 1)}
                        for i in range(rng.randint(1, 3))
                    ]}
        if k == "array":
            return {"type": "array", "items": rand_schema(depth - 1)}
        if k == "map":
            return {"type": "map", "values": rand_schema(depth - 1)}
        if k == "union":
            return ["null", rand_schema(depth - 1)]
        return k

    def rand_value(schema):
        t = schema["type"] if isinstance(schema, dict) else schema
        if isinstance(schema, list):
            branch = rng.choice(schema)
            return None if branch == "null" else rand_value(branch)
        if t == "long":
            return rng.randint(-(1 << 40), 1 << 40)
        if t == "string":
            return "".join(rng.choice("abc中ü ") for _ in range(5))
        if t == "boolean":
            return rng.random() < 0.5
        if t == "bytes":
            return bytes(rng.randrange(256) for _ in range(4))
        if t == "enum":
            return rng.choice(schema["symbols"])
        if t == "fixed":
            return bytes(rng.randrange(256) for _ in range(schema["size"]))
        if t == "record":
            return {f["name"]: rand_value(f["type"])
                    for f in schema["fields"]}
        if t == "array":
            return [rand_value(schema["items"])
                    for _ in range(rng.randint(0, 3))]
        if t == "map":
            return {f"k{i}": rand_value(schema["values"])
                    for i in range(rng.randint(0, 3))}
        raise AssertionError(t)

    for _ in range(40):
        schema = {"type": "record", "name": "Top",
                  "fields": [
                      {"name": f"f{i}", "type": rand_schema(2)}
                      for i in range(rng.randint(1, 4))
                  ]}
        recs = [rand_value(schema) for _ in range(rng.randint(1, 5))]
        codec = rng.choice(["null", "deflate"])
        got = read_avro(build_avro(schema, recs, codec=codec))
        assert got["records"] == recs
