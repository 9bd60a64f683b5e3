"""Round-8 ops: PNG decode query, newline-unit boilerplate strip."""

from __future__ import annotations

import hashlib

from data_pipeline_who_gho_spark.plans.curation11 import (
    boilerplate_strip_newline,
    media_decode_png_stats,
)


def test_png_stats_equal_bmp_ppm_stats(spark):
    """The PNG query shares the pixel formula with media_decode_stats —
    a correct zlib+unfilter decode must therefore produce IDENTICAL
    per-doc statistics to the BMP/PPM decode path (different bytes on
    the wire, same pixels). Any filter-inversion defect shows up as a
    per-row divergence on the rows whose (doc_id + y) % 5 hits it."""
    from data_pipeline_who_gho_spark.plans.curation10 import media_decode_stats

    sf = "/root/testdata/sf0.001"
    png = {r["doc_id"]: r for r in media_decode_png_stats(spark, sf).collect()}
    base = {r["doc_id"]: r for r in media_decode_stats(spark, sf).collect()}
    assert set(png) == set(base) and len(png) > 0
    for d, r in png.items():
        b = base[d]
        for c in ("h", "w", "n_px", "sum_r", "sum_g", "sum_b", "wsum"):
            assert r[c] == b[c], (d, c)


def test_boilerplate_newline_matches_pure_python(spark, tmp_path):
    """End-to-end pin of the newline production path on a constructed
    corpus: multiline synthesis → split('\\n') → strip → '\\n' rejoin
    must equal an independent pure-Python recomputation (including the
    md5 of the newline-joined cleaned text, which differs from the
    chunk-unit query's space-joined md5)."""
    header = " ".join(f"h{i}" for i in range(10))
    uniq = {d: " ".join(f"u{d}x{i}" for i in range(10)) for d in range(4)}
    tail = {d: " ".join(f"t{d}y{i}" for i in range(10)) for d in range(4)}
    rows = [(d, f"{header} {uniq[d]} {tail[d]}") for d in range(3)]
    rows.append((3, f"{uniq[3]} {tail[3]}"))  # no header
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id LONG, text STRING").write.parquet(
        f"{sf}/documents.parquet"
    )
    out = {r["doc_id"]: r for r in boilerplate_strip_newline(spark, sf).collect()}
    for d in range(3):
        clean = "\n".join([uniq[d], tail[d]])
        assert out[d]["n_lines"] == 3
        assert out[d]["n_removed"] == 1
        assert out[d]["clean_n_chars"] == len(clean)
        assert out[d]["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()
    clean3 = "\n".join([uniq[3], tail[3]])
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_md5"] == hashlib.md5(clean3.encode()).hexdigest()


# ---------------------------------------------------------------------------
# WAV / Y4M codecs (round-8 second pair): decode real across modalities
# ---------------------------------------------------------------------------


def test_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from data_pipeline_who_gho_spark.operators.multimodal import (
        decode_media,
        encode_wav,
        sniff_media_type,
        wav_sample_rate,
    )

    rng = np.random.default_rng(42)
    mono = rng.integers(-32768, 32768, 50, dtype=np.int16)
    stereo = rng.integers(-32768, 32768, (30, 2), dtype=np.int16)
    p1 = encode_wav(mono, rate=8000)
    p2 = encode_wav(stereo, rate=44100)
    assert sniff_media_type(p1) == "audio/wav"
    assert (decode_media(p1, "audio/wav") == mono.reshape(-1, 1)).all()
    assert (decode_media(p2, "audio/wav") == stereo).all()
    assert wav_sample_rate(p1) == 8000
    assert wav_sample_rate(p2) == 44100


def test_wav_sample_rate_rejects_truncated_fmt():
    """ADVICE r08: a payload truncated inside the fmt chunk must raise
    like _decode_wav does, not int.from_bytes a short slice into a
    silently-wrong rate (e.g. 0)."""
    import numpy as np
    import pytest

    from data_pipeline_who_gho_spark.operators.multimodal import (
        encode_wav,
        wav_sample_rate,
    )

    good = encode_wav(np.zeros(4, dtype=np.int16), rate=16000)
    fmt_at = good.index(b"fmt ")
    # truncate mid-fmt: header intact (walk reaches the chunk), body cut
    for end in range(fmt_at + 8, fmt_at + 16):
        with pytest.raises(ValueError, match="fmt"):
            wav_sample_rate(good[:end])
    # a fmt chunk whose declared length can't hold the rate field
    bad = bytearray(good)
    bad[fmt_at + 4 : fmt_at + 8] = (4).to_bytes(4, "little")
    with pytest.raises(ValueError, match="fmt"):
        wav_sample_rate(bytes(bad))
    assert wav_sample_rate(good) == 16000


def test_wav_rejects_malformed_and_nonpcm():
    import numpy as np
    import pytest

    from data_pipeline_who_gho_spark.operators.multimodal import (
        decode_media,
        encode_wav,
    )

    good = encode_wav(np.zeros(10, dtype=np.int16))
    with pytest.raises(ValueError):
        decode_media(good[:-3], "audio/wav")  # truncated data chunk
    with pytest.raises(ValueError):
        decode_media(b"RIFF\x00\x00\x00\x00WAVE", "audio/wav")  # no chunks
    with pytest.raises(ValueError):
        decode_media(b"RIFFxxxxNOPE", "audio/wav")
    # float WAV (format 3) stays a stub
    bad = bytearray(good)
    assert bad[20:22] == (1).to_bytes(2, "little")
    bad[20:22] = (3).to_bytes(2, "little")
    with pytest.raises(NotImplementedError):
        decode_media(bytes(bad), "audio/wav")


def test_y4m_roundtrip_and_frame_sampling_with_default_decoder(spark):
    """encode→decode identity for mono Y4M, and the sample_frames
    operator now runs with the DEFAULT decoder on real video bytes —
    the fake-decoder seam is retired for this format."""
    import hashlib

    import numpy as np

    from data_pipeline_who_gho_spark.operators.multimodal import (
        decode_media,
        encode_y4m,
        sample_frames,
        sniff_media_type,
    )

    rng = np.random.default_rng(3)
    vid = rng.integers(0, 256, (5, 4, 6), dtype=np.uint8)
    payload = encode_y4m(vid)
    assert sniff_media_type(payload) == "video/y4m"
    assert (decode_media(payload, "video/y4m") == vid).all()

    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id LONG, payload BINARY"
    )
    got = {(r.doc_id, r.frame_idx): r.frame_sha256
           for r in sample_frames(df, every_n=2).collect()}
    want = {
        (7, i): hashlib.sha256(vid[i].tobytes()).hexdigest()
        for i in range(0, 5, 2)
    }
    assert got == want


def test_y4m_rejects_malformed_and_chroma():
    import numpy as np
    import pytest

    from data_pipeline_who_gho_spark.operators.multimodal import (
        decode_media,
        encode_y4m,
    )

    good = encode_y4m(np.zeros((2, 3, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_media(good[:-2], "video/y4m")  # truncated frame
    with pytest.raises(ValueError):
        decode_media(b"YUV4MPEG2 W4 H3 F25:1 Ip A1:1 Cmono\n", "video/y4m")  # 0 frames
    with pytest.raises(ValueError):
        decode_media(b"YUV4MPEG2 Cmono\n" + b"FRAME\n", "video/y4m")  # no dims
    with pytest.raises(NotImplementedError):  # chroma-carrying colourspace
        decode_media(
            b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420\nFRAME\n" + b"\x00" * 6,
            "video/y4m",
        )


def test_audio_video_stats_rows(spark):
    """Smoke the two registered queries at sf0.001 and spot-check one
    doc against the formula by hand."""
    from data_pipeline_who_gho_spark.plans.curation11 import (
        audio_decode_stats,
        video_frame_stats,
    )

    sf = "/root/testdata/sf0.001"
    au = {r["doc_id"]: r for r in audio_decode_stats(spark, sf).collect()}
    d = sorted(au)[1]
    n, ch = 40 + d % 7, 1 + d % 2
    want_sum = sum(
        (d * 11 + i * 17 + c * 29) % 65536 - 32768
        for i in range(n) for c in range(ch)
    )
    assert au[d]["n_samples"] == n and au[d]["n_ch"] == ch
    assert au[d]["sum_all"] == want_sum

    vf = video_frame_stats(spark, sf).collect()
    assert len(vf) > 0
    r0 = [r for r in vf if r["doc_id"] == d and r["frame_idx"] == 0][0]
    h, w = 3 + d % 3, 4 + d % 3
    want_f0 = sum(
        (d * 5 + 0 * 19 + y * 23 + x * 3) % 256 for y in range(h) for x in range(w)
    )
    assert r0["f_sum"] == want_f0


def test_gzip_roundtrip_stats_and_decompress_guardrails(spark):
    import gzip

    import pytest

    from data_pipeline_who_gho_spark.operators.multimodal import (
        decompress_payload,
        sniff_media_type,
    )
    from data_pipeline_who_gho_spark.plans.curation11 import gzip_roundtrip_stats

    payload = gzip.compress("hello gz world".encode(), mtime=0)
    assert sniff_media_type(payload) == "application/gzip"
    assert decompress_payload(payload) == b"hello gz world"
    with pytest.raises(ValueError):
        decompress_payload(payload[:-2])  # truncated stream
    with pytest.raises(NotImplementedError):
        decompress_payload(b"plain bytes", "text/plain")

    import hashlib

    sf = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in gzip_roundtrip_stats(spark, sf).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf}/documents.parquet").collect()}
    assert set(out) == set(docs)
    for d, t in list(docs.items())[:20]:
        assert out[d]["n_chars"] == len(t)
        assert out[d]["text_md5"] == hashlib.md5(t.encode()).hexdigest()


def test_gzip_ntok_oracle_agrees_with_python_split_everywhere():
    """ADVICE r08: the engine counts tokens with Python split() while
    the old oracle trimmed spaces only and counted empty boundary
    tokens — '\\tA B\\n' scored 2 vs 4 — and RE2's \\s misses \\v and
    Unicode whitespace.  The rewritten oracle's explicit class must
    agree with split() on EVERY whitespace shape: boundary runs, all
    29 str.isspace() code points, and randomized mixes."""
    import random
    import sys

    import duckdb

    from data_pipeline_who_gho_spark.plans.curation11 import (
        GZIP_ROUNDTRIP_STATS_SQL,
    )

    ntok_expr = GZIP_ROUNDTRIP_STATS_SQL.split("AS n_chars,")[1].split(
        "AS n_tok"
    )[0]
    ws = [chr(c) for c in range(sys.maxunicode + 1) if chr(c).isspace()]
    assert len(ws) == 29  # the class below was derived from this set
    rng = random.Random(0)
    cases = ["\tA B\n", "  ", "", "a\n\nb\tc  d ", "one", " x", "x ",
             "\n\t\n", "a\rb", "a\x0bb\x0cc", "a\x1cb\x1dc\x1ed\x1fe",
             "x\x85y", "p\xa0q", "u v　w"]
    cases += ["".join(rng.choice(ws + list("abcXYZ09"))
                      for _ in range(rng.randint(0, 12)))
              for _ in range(194)]
    con = duckdb.connect()
    for t in cases:
        py = len(t.split())
        sql = con.execute(
            f"SELECT {ntok_expr} FROM (SELECT ? AS text)", [t]
        ).fetchone()[0]
        assert sql == py, (repr(t), sql, py)


def test_kcenter_coreset_matches_bruteforce_and_oracle(spark):
    """r09 registration queue: greedy max-min selection must equal an
    independent numpy recomputation AND the chained-CTE DuckDB oracle
    at sf0.001."""
    import duckdb
    import numpy as np

    from data_pipeline_who_gho_spark.plans.curation11 import (
        _KC_K,
        _KC_Q,
        KCENTER_CORESET_SQL,
        kcenter_coreset,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in kcenter_coreset(spark, sf).collect())

    # independent numpy recomputation over the same quantization
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb])
    order = np.argsort(ids)
    ids = ids[order]
    qv = np.floor(
        np.array([r["embedding"] for r in emb], dtype=np.float64)[order] * _KC_Q
    ).astype(np.int64)
    picks = [(1, int(ids[0]), 0)]
    mind = ((qv - qv[0]) ** 2).sum(axis=1)
    for rnd in range(2, _KC_K + 1):
        best = np.lexsort((ids, -mind))[0]  # max d, tie -> min vec_id
        picks.append((rnd, int(ids[best]), int(mind[best])))
        mind = np.minimum(mind, ((qv - qv[best]) ** 2).sum(axis=1))
    assert got == sorted(picks)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    want = sorted(tuple(r) for r in con.sql(KCENTER_CORESET_SQL).fetchall())
    assert got == want


def test_audio_frame_features_matches_oracle(spark):
    """r09 queue: decode -> framing -> energy/ZCR must match the
    formula-replay oracle row for row at sf0.001."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation11 import (
        AUDIO_FRAME_FEATURES_SQL,
        audio_frame_features,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in audio_frame_features(spark, sf).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = sorted(tuple(r) for r in con.sql(AUDIO_FRAME_FEATURES_SQL).fetchall())
    assert len(got) > 0 and got == want


def test_image_blockhash_neardup_finds_planted_pairs(spark):
    """r09 queue: every planted (even, even+1) perturbed pair must be
    found with exactly 3 matching bands (one block differs), spurious
    collisions stay rare, and the result matches the formula-replay
    oracle row for row."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation11 import (
        IMAGE_BLOCKHASH_SQL,
        image_blockhash_neardup,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in image_blockhash_neardup(spark, sf).collect())
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    planted = {(a, a + 1) for a in range(0, n_docs - 1, 2)}
    found = {(a, b) for a, b, m in got}
    assert planted <= found
    for a, b, m in got:
        if (a, b) in planted:
            assert m == 3, (a, b, m)  # exactly one block perturbed
    assert len(got) <= len(planted) + 0.2 * n_docs  # banding stays selective

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = sorted(tuple(r) for r in con.sql(IMAGE_BLOCKHASH_SQL).fetchall())
    assert got == want
