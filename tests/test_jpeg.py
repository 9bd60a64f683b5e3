"""Baseline JPEG codec (operators/jpeg.py): exactness where exactness
is possible (DC-only coefficient path, per-coefficient entropy round
trip), quantization-bounded error on the lossy path, and loud failure
on everything outside the baseline profile."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_who_gho_spark.operators.jpeg import (
    _fdct_block,
    _idct_block,
    decode_jpeg,
    encode_jpeg_gray,
)
from data_pipeline_who_gho_spark.operators.multimodal import (
    decode_media,
    sniff_media_type,
)


def _expected(coef_block: np.ndarray, q: np.ndarray | None = None) -> np.ndarray:
    s = _idct_block(coef_block.astype(float) * (q if q is not None else 1))
    return np.clip(np.trunc(s + 0.5 * np.sign(s)) + 128, 0, 255).astype(np.uint8)


def test_idct_of_dc_only_is_flat_dc_over_8():
    blk = np.zeros((8, 8))
    blk[0, 0] = 80
    assert np.allclose(_idct_block(blk), 10.0)


def test_fdct_idct_inverse():
    rng = np.random.default_rng(0)
    s = rng.random((8, 8)) * 200 - 100
    assert np.allclose(_idct_block(_fdct_block(s)), s)


def test_coefficient_entropy_roundtrip_exact():
    """The marker walk + Huffman + DC-prediction + dequant + inverse
    zig-zag + IDCT pipeline reproduces arbitrary coefficient blocks
    EXACTLY (quant=1): decode equals the local IDCT formula per block,
    including blocks with long zero runs (ZRL) and early EOB."""
    rng = np.random.default_rng(1)
    coefs = np.zeros((2, 3, 8, 8), dtype=np.int64)
    coefs[0, 0] = rng.integers(-80, 80, (8, 8))
    coefs[0, 1, 0, 0] = -300          # DC-only block
    coefs[0, 2, 7, 7] = 5             # one trailing AC: exercises ZRL
    coefs[1, 0, 0, 1] = -1            # minimal-category AC
    # [1][1] all-zero block: EOB immediately after DC
    coefs[1, 2] = rng.integers(-10, 10, (8, 8))
    payload = encode_jpeg_gray(coef_blocks=coefs, shape=(16, 24))
    assert sniff_media_type(payload) == "image/jpeg"
    img = decode_media(payload, "image/jpeg")
    assert img.shape == (16, 24)
    for i in range(2):
        for j in range(3):
            got = img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8]
            assert (got == _expected(coefs[i, j])).all(), (i, j)


def test_dc_only_blocks_are_exact_flat_values():
    coefs = np.zeros((1, 4, 8, 8), dtype=np.int64)
    for j, dc in enumerate((-256, -8, 8, 512)):
        coefs[0, j, 0, 0] = dc
    img = decode_jpeg(encode_jpeg_gray(coef_blocks=coefs, shape=(8, 32)))
    for j, dc in enumerate((-256, -8, 8, 512)):
        want = min(max(dc // 8 + 128, 0), 255)
        assert (img[:, j * 8 : (j + 1) * 8] == want).all(), (j, dc)


def test_lossy_roundtrip_quantization_bounded():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (24, 33), dtype=np.uint8)  # non-multiple-of-8 dims
    q = np.full((8, 8), 4)
    out = decode_jpeg(encode_jpeg_gray(a, quant=q))
    assert out.shape == a.shape
    # worst-case error ~ sum of per-coefficient quantization errors; for a
    # flat quant table q the practical bound is a few times q
    assert np.abs(out.astype(int) - a.astype(int)).max() <= 6 * 4
    # smooth content reconstructs tightly
    y, x = np.mgrid[0:24, 0:33]
    smooth = ((y * 3 + x * 2) % 200 + 20).astype(np.uint8)
    out2 = decode_jpeg(encode_jpeg_gray(smooth, quant=q))
    assert np.abs(out2.astype(int) - smooth.astype(int)).max() <= 4


def test_rejects_malformed_and_unsupported():
    coefs = np.zeros((1, 1, 8, 8), dtype=np.int64)
    coefs[0, 0, 0, 0] = 40
    good = encode_jpeg_gray(coef_blocks=coefs, shape=(8, 8))
    with pytest.raises(ValueError):
        decode_jpeg(good[:-20])  # truncated entropy/EOI
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # hand-flipping SOF0→SOF2 makes the baseline scan header (Ss=0,
    # Se=63) an ILLEGAL progressive DC scan — rejected, not misdecoded
    prog = bytearray(good)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))
    # arithmetic coding (SOF9) raises NotImplementedError
    arith = bytearray(good)
    arith[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(arith))
    # oversized coefficients rejected at encode time
    big = np.zeros((1, 1, 8, 8), dtype=np.int64)
    big[0, 0, 3, 3] = 5000  # AC category 13 > 10
    with pytest.raises(ValueError):
        encode_jpeg_gray(coef_blocks=big, shape=(8, 8))


def test_resize_runs_on_real_jpeg_with_default_decoder(spark):
    """The whole image family now runs the DEFAULT decoder end-to-end,
    JPEG included."""
    from data_pipeline_who_gho_spark.operators.multimodal import resize_images

    coefs = np.zeros((2, 2, 8, 8), dtype=np.int64)
    for i in range(2):
        for j in range(2):
            coefs[i, j, 0, 0] = (i * 2 + j) * 64
    payload = encode_jpeg_gray(coef_blocks=coefs, shape=(16, 16))
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id LONG, payload BINARY")
    out = resize_images(df, 4, 4).collect()[0]
    got = np.frombuffer(bytes(out["pixels"]), np.uint8).reshape(4, 4)
    full = decode_jpeg(payload)
    yi = (np.arange(4) * 16 // 4).clip(0, 15)
    assert (got == full[yi][:, yi]).all()


def test_jpeg_decode_stats_matches_oracle(spark):
    """r09 registration queue: the DC-only JPEG decode query must match
    its formula-replay oracle row for row at sf0.001."""
    import duckdb

    from data_pipeline_who_gho_spark.plans.curation11 import (
        JPEG_DECODE_STATS_SQL,
        jpeg_decode_stats,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in jpeg_decode_stats(spark, sf).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = sorted(tuple(r) for r in con.sql(JPEG_DECODE_STATS_SQL).fetchall())
    assert len(got) > 0 and got == want


def test_color444_three_component_decode_exact():
    """The decoder's interleaved multi-component MCU walk and
    per-component DC prediction, pinned coefficient-exact; plus the
    integer YCbCr->RGB transform on the decoded planes."""
    from data_pipeline_who_gho_spark.operators.jpeg import (
        encode_jpeg_color444,
        ycbcr_to_rgb,
    )

    rng = np.random.default_rng(5)
    coefs = np.zeros((2, 2, 3, 8, 8), dtype=np.int64)
    for i in range(2):
        for j in range(2):
            for c in range(3):
                coefs[i, j, c] = rng.integers(-40, 40, (8, 8))
    payload = encode_jpeg_color444(coefs, shape=(16, 16))
    img = decode_jpeg(payload)
    assert img.shape == (16, 16, 3)
    for i in range(2):
        for j in range(2):
            for c in range(3):
                got = img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8, c]
                assert (got == _expected(coefs[i, j, c])).all(), (i, j, c)
    rgb = ycbcr_to_rgb(img.astype(np.int64))
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8
    # gray pixel (Cb = Cr = 128) maps to R = G = B = Y
    gray = np.full((1, 1, 3), 128, dtype=np.int64)
    gray[0, 0, 0] = 77
    assert (ycbcr_to_rgb(gray) == 77).all()


def test_tolerates_app0_and_comment_segments():
    """Real-world JPEGs carry APP0 (JFIF) and COM segments the encoder
    never writes — the marker walk must skip any length-framed segment
    it does not interpret."""
    coefs = np.zeros((1, 1, 8, 8), dtype=np.int64)
    coefs[0, 0, 0, 0] = 80
    good = encode_jpeg_gray(coef_blocks=coefs, shape=(8, 8))
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe" + (9).to_bytes(2, "big") + b"comment"
    patched = good[:2] + app0 + com + good[2:]
    assert (decode_jpeg(patched) == decode_jpeg(good)).all()


def test_tolerates_marker_fill_bytes():
    """T.81 B.1.1.2 allows any run of 0xFF fill bytes before a marker;
    the walk must not read a segment length out of a fill byte
    (ADVICE r08 — it used to skip a bogus span silently)."""
    coefs = np.zeros((1, 1, 8, 8), dtype=np.int64)
    coefs[0, 0, 0, 0] = 80
    good = encode_jpeg_gray(coef_blocks=coefs, shape=(8, 8))
    want = decode_jpeg(good)
    # fill runs of 1/3/7 bytes immediately after SOI (before the first
    # length-framed segment's own 0xFF)
    for k in (1, 3, 7):
        patched = good[:2] + b"\xff" * k + good[2:]
        assert (decode_jpeg(patched) == want).all(), k
    # fill bytes before a mid-stream marker too: splice before the SOS
    sos = good.index(b"\xff\xda")
    patched = good[:sos] + b"\xff\xff" + good[sos:]
    assert (decode_jpeg(patched) == want).all()
    # a trailing all-fill tail (no real marker) must terminate, not spin
    import pytest

    with pytest.raises(ValueError):
        decode_jpeg(good[:2] + b"\xff" * 6)
