"""Round-13 randomized round-trip fuzz for the codec surfaces that
grew this round: the raw Snappy block codec through the Avro snappy
container path, Avro schema RESOLUTION against randomly perturbed
reader schemas, protobuf wire messages under random schemas, PDF
text across all four writer layouts, and Layer III granules.

Plain seeded random (house style): each case draws legal parameters,
builds the real bitstream/container, parses it back, and asserts
field-exact recovery — one mis-sized field anywhere in a
variable-width layout shifts everything after it."""

from __future__ import annotations

import random


def test_fuzz_avro_snappy_container():
    from data_pipeline_who_gho_spark.operators.avro import (
        build_avro,
        read_avro,
    )

    rng = random.Random(1307)
    schema = {"type": "record", "name": "R", "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
    ]}
    for _ in range(20):
        recs = [
            {
                "k": rng.randint(-2**40, 2**40),
                # repetitive strings force real snappy copy elements
                "s": rng.choice(["ab", "xyz", "long phrase "]) *
                rng.randint(0, 40),
                "b": bytes(rng.randrange(256)
                           for _ in range(rng.randint(0, 64))),
            }
            for _ in range(rng.randint(1, 120))
        ]
        got = read_avro(build_avro(
            schema, recs, codec="snappy",
            block_records=rng.choice([1, 7, 64]),
        ))
        assert got["records"] == recs


def test_fuzz_avro_schema_resolution():
    """Random reader perturbations of a writer schema: drop fields,
    add defaulted fields, promote int->long/double and string->bytes;
    the resolved records must equal the hand-projected expectation."""
    from data_pipeline_who_gho_spark.operators.avro import (
        build_avro,
        read_avro,
    )

    rng = random.Random(1311)
    for _ in range(25):
        n_fields = rng.randint(1, 6)
        wfields = []
        for i in range(n_fields):
            t = rng.choice(["int", "long", "string", "double"])
            wfields.append({"name": f"f{i}", "type": t})
        writer = {"type": "record", "name": "R", "fields": wfields}
        recs = []
        for _ in range(rng.randint(1, 30)):
            rec = {}
            for f in wfields:
                rec[f["name"]] = (
                    rng.randint(-1000, 1000)
                    if f["type"] in ("int", "long")
                    else (rng.random() if f["type"] == "double"
                          else rng.choice(["a", "bb", "ccc"]))
                )
            recs.append(rec)
        rfields, expect_map = [], {}
        for f in wfields:
            roll = rng.random()
            if roll < 0.25:
                continue                      # dropped in reader
            rt = f["type"]
            if rt == "int" and roll < 0.5:
                rt = rng.choice(["long", "double"])
            elif rt == "string" and roll < 0.5:
                rt = "bytes"
            rfields.append({"name": f["name"], "type": rt})
            expect_map[f["name"]] = rt
        rfields.append({"name": "added", "type": "int", "default": 7})
        reader = {"type": "record", "name": "R", "fields": rfields}
        got = read_avro(build_avro(writer, recs),
                        reader_schema=reader)["records"]
        for rec, out in zip(recs, got):
            want = {}
            for name, rt in expect_map.items():
                v = rec[name]
                if rt == "double":
                    v = float(v)
                elif rt == "bytes":
                    v = v.encode()
                want[name] = v
            want["added"] = 7
            assert out == want


def test_fuzz_protowire_random_schemas():
    from data_pipeline_who_gho_spark.operators.protowire import (
        decode_message,
        encode_message,
    )

    rng = random.Random(1319)
    types = ["int", "sint", "bool", "fixed32", "fixed64", "string",
             "bytes", "packed_int"]
    for _ in range(40):
        nums = rng.sample(range(1, 200), rng.randint(1, 8))
        schema = {n: (f"f{n}", rng.choice(types)) for n in nums}
        msg = {}
        for n, (name, t) in schema.items():
            if rng.random() < 0.2:
                continue                      # absent field
            if t == "int":
                msg[name] = rng.randrange(1 << 50)
            elif t == "sint":
                msg[name] = rng.randint(-2**40, 2**40)
            elif t == "bool":
                msg[name] = rng.random() < 0.5
            elif t == "fixed32":
                msg[name] = rng.randrange(1 << 32)
            elif t == "fixed64":
                msg[name] = rng.randrange(1 << 64)
            elif t == "string":
                msg[name] = "".join(
                    rng.choice("aé中z") for _ in range(rng.randint(0, 9)))
            elif t == "bytes":
                msg[name] = bytes(rng.randrange(256)
                                  for _ in range(rng.randint(0, 16)))
            else:
                vals = [rng.randrange(1 << 35)
                        for _ in range(rng.randint(1, 10))]
                msg[name] = vals
        assert decode_message(schema, encode_message(schema, msg)) == msg


def test_fuzz_pdf_all_layouts():
    from data_pipeline_who_gho_spark.operators.pdf import (
        build_pdf,
        extract_pdf_text,
    )

    rng = random.Random(1321)
    alpha = "ab ()\\%<>[]/.#012\té中€—"
    for _ in range(16):
        pages = [
            [
                "".join(rng.choice(alpha)
                        for _ in range(rng.randint(1, 50)))
                for _ in range(rng.randint(1, 5))
            ]
            for _ in range(rng.randint(1, 3))
        ]
        want = ["\n".join(p) for p in pages]
        for layout in ("classic", "xrefstream", "simplefont", "hybrid"):
            got = extract_pdf_text(build_pdf(pages, layout=layout))
            assert got["pages"] == want, layout


def test_fuzz_layer3_scfsi_and_modes():
    from data_pipeline_who_gho_spark.operators import mpeg_audio as ma

    rng = random.Random(1327)
    for _ in range(15):
        mode = rng.choice([0, 3])
        nch = 2 if mode == 0 else 1
        scfsi = [rng.randrange(16) for _ in range(nch)]
        grs = []
        g0_sf = {}
        for g in range(2):
            chs = []
            for c in range(nch):
                comp = rng.choice([0, 5, 13, 15])
                s1, s2 = ma._L3_SLEN[comp]
                sf = [rng.randrange(1 << (s1 if b < 11 else s2))
                      if (s1 if b < 11 else s2) else 0
                      for b in range(21)]
                if g == 0:
                    g0_sf[c] = (sf, comp)
                else:
                    # scfsi-shared groups must carry granule-0 values
                    for grp, (lo, hi) in enumerate(ma._L3_SCFSI_GROUPS):
                        if scfsi[c] >> (3 - grp) & 1:
                            sf[lo:hi] = g0_sf[c][0][lo:hi]
                bv = rng.randint(0, 100)
                vals = [0] * 576
                for i in range(2 * bv):
                    vals[i] = rng.choice([-1, 0, 1])
                for i in range(2 * bv,
                               min(2 * bv + 4 * rng.randint(0, 20), 576)):
                    vals[i] = rng.choice([-1, 0, 0, 1])
                chs.append(ma._GranuleSpec(
                    vals, sf, rng.randrange(256), comp, bv,
                    scalefac_scale=rng.randint(0, 1),
                ))
            grs.append(chs)
        got = ma.parse_layer3_frame(ma.build_layer3_frame(
            grs, mode=mode, scfsi=scfsi,
            crc16=rng.choice([None, 0x1234]),
        ))
        for g in range(2):
            for c in range(nch):
                assert got["values"][g][c] == grs[g][c].values
                assert got["scalefac"][g][c] == grs[g][c].scalefac
