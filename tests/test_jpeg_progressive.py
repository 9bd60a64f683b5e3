"""Progressive (SOF2) JPEG codec tests.

The correctness pin is coefficient-exact equivalence: for the same
quantized coefficient blocks, the progressive encode→decode pixels must
EQUAL the baseline encode→decode pixels (both pipelines share the
dequant/IDCT tail, so pixel equality pins the entropy layer exactly).
The default 6-scan script exercises every progressive scan type: DC
first (Al=1), split-band AC first (Al=2), cross-band AC refinement
(2→1), DC refinement, and final AC refinement (1→0) — including EOB
runs, ZRLs, and buffered correction bits.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_who_gho_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_color444,
    encode_jpeg_gray,
    encode_jpeg_progressive,
)


def _sparse_blocks(rng, by, bx, ncomp=0, zero_p=0.25, mag=220):
    shape = (by, bx, ncomp, 8, 8) if ncomp else (by, bx, 8, 8)
    coefs = np.zeros(shape, dtype=np.int64)
    flat = coefs.reshape(-1, 64)
    for b in range(flat.shape[0]):
        if rng.random() < zero_p:
            continue  # all-zero blocks feed the EOB-run paths
        nnz = int(rng.integers(1, 14))
        flat[b, rng.integers(0, 64, nnz)] = rng.integers(-mag, mag + 1, nnz)
    return coefs


def _roundtrip_equal(coefs, shape, **kw):
    if coefs.ndim == 5:
        base = decode_jpeg(encode_jpeg_color444(coefs, shape))
    else:
        base = decode_jpeg(encode_jpeg_gray(coef_blocks=coefs, shape=shape))
    prog = decode_jpeg(encode_jpeg_progressive(coefs, shape, **kw))
    return np.array_equal(base, prog)


def test_progressive_equals_baseline_gray_fuzz():
    rng = np.random.default_rng(101)
    for _ in range(30):
        by, bx = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        h = by * 8 - int(rng.integers(0, 8))
        w = bx * 8 - int(rng.integers(0, 8))
        coefs = _sparse_blocks(rng, by, bx)
        assert _roundtrip_equal(coefs, (h, w))


def test_progressive_equals_baseline_color_fuzz():
    rng = np.random.default_rng(102)
    for _ in range(12):
        by, bx = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        coefs = _sparse_blocks(rng, by, bx, ncomp=3, mag=90)
        assert _roundtrip_equal(coefs, (by * 8, bx * 8))


@pytest.mark.parametrize(
    "script",
    [
        [(0, 0, 0, 0), (1, 63, 0, 0)],  # pure spectral selection
        [(0, 0, 0, 0), (1, 2, 0, 0), (3, 15, 0, 0), (16, 63, 0, 0)],
        [  # deep successive approximation, 3 bits down
            (0, 0, 0, 3), (1, 63, 0, 3), (1, 63, 3, 2), (0, 0, 3, 2),
            (1, 63, 2, 1), (0, 0, 2, 1), (1, 63, 1, 0), (0, 0, 1, 0),
        ],
    ],
    ids=["spectral_only", "split_bands", "deep_sa"],
)
def test_progressive_scan_scripts(script):
    rng = np.random.default_rng(103)
    for _ in range(8):
        by, bx = int(rng.integers(1, 5)), int(rng.integers(2, 5))
        coefs = _sparse_blocks(rng, by, bx, mag=300)
        h = by * 8 - int(rng.integers(0, 8))
        w = bx * 8 - int(rng.integers(0, 8))
        assert _roundtrip_equal(coefs, (h, w), script=script)


def test_progressive_restart_intervals():
    rng = np.random.default_rng(104)
    for _ in range(10):
        by, bx = int(rng.integers(2, 6)), int(rng.integers(2, 6))
        ri = int(rng.integers(1, 5))
        coefs = _sparse_blocks(rng, by, bx, mag=150)
        assert _roundtrip_equal(coefs, (by * 8, bx * 8), restart_interval=ri)


def test_progressive_dense_blocks():
    """Fully dense coefficients: long correction-bit stretches in every
    refinement scan, no EOB folding."""
    rng = np.random.default_rng(105)
    for _ in range(5):
        coefs = rng.integers(-500, 501, (3, 3, 8, 8)).astype(np.int64)
        assert _roundtrip_equal(coefs, (24, 24))


def test_progressive_eob_run_spans_blocks():
    """A mostly-empty image forces a single EOBn code to cover many
    blocks (the run must survive block boundaries and the final flush)."""
    coefs = np.zeros((6, 6, 8, 8), dtype=np.int64)
    coefs[0, 0, 0, 0] = 96
    coefs[5, 5, 2, 1] = -37  # one late AC so the run is interior too
    assert _roundtrip_equal(coefs, (48, 48))


def test_progressive_dc_only_flat_formula():
    """DC-only progressive payloads decode to EXACT flat blocks —
    the same formula contract jpeg_decode_stats relies on: a lone DC of
    8*p decodes to p+128 across the block (quant all-ones)."""
    coefs = np.zeros((2, 3, 8, 8), dtype=np.int64)
    vals = [-64, -17, 0, 9, 40, 63]
    for b, v in enumerate(vals):
        coefs[b // 3, b % 3, 0, 0] = v * 8
    img = decode_jpeg(encode_jpeg_progressive(coefs, (16, 24)))
    for b, v in enumerate(vals):
        blk = img[(b // 3) * 8 : (b // 3) * 8 + 8, (b % 3) * 8 : (b % 3) * 8 + 8]
        assert (blk.astype(int) == v + 128).all()


def test_progressive_encoder_rejects_bad_scripts():
    coefs = np.zeros((1, 1, 8, 8), dtype=np.int64)
    with pytest.raises(ValueError):  # must start with DC first
        encode_jpeg_progressive(coefs, (8, 8), script=[(1, 63, 0, 0)])
    with pytest.raises(ValueError):  # DC scan with Se != 0
        encode_jpeg_progressive(coefs, (8, 8), script=[(0, 63, 0, 0)])
    with pytest.raises(ValueError):  # refinement must step one bit
        encode_jpeg_progressive(
            coefs, (8, 8), script=[(0, 0, 0, 2), (0, 0, 2, 0)]
        )


def test_progressive_decoder_rejects_malformed_scan_headers():
    coefs = np.zeros((1, 1, 8, 8), dtype=np.int64)
    coefs[0, 0, 0, 0] = 24
    good = encode_jpeg_progressive(coefs, (8, 8), script=[(0, 0, 0, 0), (1, 63, 0, 0)])
    # corrupt the SECOND scan's header: Se=0 with Ss=1 (bad band)
    idx = good.find(bytes([0xFF, 0xDA]), good.find(bytes([0xFF, 0xDA])) + 2)
    bad = bytearray(good)
    bad[idx + 2 + 2 + 1 + 2 + 1] = 0  # Se byte of the 1-component scan
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_progressive_through_default_media_decode():
    """sniff → decode_media routes progressive payloads through the same
    seam as baseline JPEG (no special-casing at the multimodal layer)."""
    from data_pipeline_who_gho_spark.operators.multimodal import (
        decode_media,
        sniff_media_type,
    )

    rng = np.random.default_rng(106)
    coefs = _sparse_blocks(rng, 2, 2)
    payload = encode_jpeg_progressive(coefs, (16, 16))
    assert sniff_media_type(payload) == "image/jpeg"
    out = decode_media(payload, "image/jpeg")
    assert np.array_equal(
        out, decode_jpeg(encode_jpeg_gray(coef_blocks=coefs, shape=(16, 16)))
    )
