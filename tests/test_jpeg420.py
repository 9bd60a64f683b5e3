"""Baseline subsampled-chroma JPEG (4:2:0 / 4:2:2) and restart
intervals — the dominant real-web profile (VERDICT r08 task 3).

The encoder writes QUANTIZED coefficient blocks verbatim (quant table
all-ones), so decode is exactly predictable: each decoded sample is the
IDCT of known integers with the module's fixed round-half-away rule,
and chroma upsampling is sample replication.  The reference
reconstruction below recomputes that pipeline independently of the
entropy/marker layer, so Huffman coding, MCU block order, DC
prediction, and restart handling are what the comparison pins.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_who_gho_spark.operators.jpeg import (
    _idct_block,
    decode_jpeg,
    encode_jpeg_subsampled,
)


def _reference(yb, cb, cr, shape, sampling):
    hy, vy = sampling
    h, w = shape
    planes = []
    for blocks, hi, vi in [(yb, hy, vy), (cb, 1, 1), (cr, 1, 1)]:
        gby, gbx = blocks.shape[:2]
        plane = np.zeros((gby * 8, gbx * 8))
        for i in range(gby):
            for j in range(gbx):
                s = _idct_block(blocks[i, j].astype(np.float64))
                s = np.trunc(s + 0.5 * np.sign(s))
                plane[i * 8 : i * 8 + 8, j * 8 : j * 8 + 8] = np.clip(
                    s + 128, 0, 255
                )
        ch, cw = -(-h * vi // vy), -(-w * hi // hy)
        plane = np.repeat(np.repeat(plane[:ch, :cw], vy // vi, 0), hy // hi, 1)
        planes.append(plane[:h, :w])
    return np.stack(planes, -1).astype(np.uint8)


def _random_mcu_blocks(rng, h, w, sampling):
    hy, vy = sampling
    my, mx = -(-h // (8 * vy)), -(-w // (8 * hy))
    return (
        rng.randint(-40, 40, (my * vy, mx * hy, 8, 8)),
        rng.randint(-40, 40, (my, mx, 8, 8)),
        rng.randint(-40, 40, (my, mx, 8, 8)),
    )


@pytest.mark.parametrize("sampling", [(2, 2), (2, 1), (1, 2)])
def test_subsampled_roundtrip_exact(sampling):
    rng = np.random.RandomState(3)
    for _ in range(8):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        yb, cb, cr = _random_mcu_blocks(rng, h, w, sampling)
        got = decode_jpeg(encode_jpeg_subsampled(yb, cb, cr, (h, w), sampling))
        assert got.shape == (h, w, 3)
        assert (got == _reference(yb, cb, cr, (h, w), sampling)).all()


def test_dc_only_420_is_flat_blocks_with_replicated_chroma():
    """DC-only coefficients make every decoded value a closed-form
    integer (IDCT of a lone DC is dc/8 across the block): the exact
    grid the queued jpeg420_decode_stats oracle replays in SQL."""
    yb = np.zeros((2, 4, 8, 8), dtype=np.int64)
    cb = np.zeros((1, 2, 8, 8), dtype=np.int64)
    cr = np.zeros((1, 2, 8, 8), dtype=np.int64)
    for i in range(2):
        for j in range(4):
            yb[i, j, 0, 0] = 8 * (10 * i + 3 * j - 12)
    for j in range(2):
        cb[0, j, 0, 0] = 8 * (5 * j - 3)
        cr[0, j, 0, 0] = 8 * (7 - 4 * j)
    out = decode_jpeg(encode_jpeg_subsampled(yb, cb, cr, (16, 32), (2, 2)))
    for i in range(2):
        for j in range(4):
            blk = out[8 * i : 8 * i + 8, 8 * j : 8 * j + 8, 0]
            assert (blk == (10 * i + 3 * j - 12) + 128).all()
    for j in range(2):
        cb_blk = out[:, 16 * j : 16 * j + 16, 1]  # 8x8 chroma -> 16x16
        cr_blk = out[:, 16 * j : 16 * j + 16, 2]
        assert (cb_blk == (5 * j - 3) + 128).all()
        assert (cr_blk == (7 - 4 * j) + 128).all()


def test_restart_interval_is_decode_invariant():
    rng = np.random.RandomState(9)
    h, w = 33, 50
    yb, cb, cr = _random_mcu_blocks(rng, h, w, (2, 2))
    base = decode_jpeg(encode_jpeg_subsampled(yb, cb, cr, (h, w), (2, 2)))
    for ri in (1, 2, 3, 5):
        p = encode_jpeg_subsampled(
            yb, cb, cr, (h, w), (2, 2), restart_interval=ri
        )
        assert (decode_jpeg(p) == base).all(), ri


def test_corrupt_restart_marker_raises():
    rng = np.random.RandomState(11)
    yb, cb, cr = _random_mcu_blocks(rng, 16, 48, (2, 2))
    p = encode_jpeg_subsampled(yb, cb, cr, (16, 48), (2, 2), restart_interval=1)
    # find the first RST0 in the entropy stream and break its index
    sos = p.index(b"\xff\xda")
    rst = p.index(b"\xff\xd0", sos)
    bad = p[:rst] + b"\xff\xd4" + p[rst + 2 :]
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bad)


def test_encoder_rejects_inconsistent_grids():
    yb = np.zeros((2, 2, 8, 8), dtype=np.int64)
    cb = np.zeros((1, 1, 8, 8), dtype=np.int64)
    with pytest.raises(ValueError, match="grid"):
        encode_jpeg_subsampled(yb, cb, cb, (64, 64), (2, 2))
    with pytest.raises(ValueError, match="sampling"):
        encode_jpeg_subsampled(yb, cb, cb, (16, 16), (1, 1))


def test_decoder_rejects_non_divisor_sampling():
    """A frame declaring 3x1 luma against 2x1 chroma has no exact
    replication upsampling (3 % 2 != 0) — it must raise at the SOF,
    not interpolate or misread the stream."""
    rng = np.random.RandomState(5)
    yb, cb, cr = _random_mcu_blocks(rng, 16, 16, (2, 2))
    p = bytearray(encode_jpeg_subsampled(yb, cb, cr, (16, 16), (2, 2)))
    sof = bytes(p).index(b"\xff\xc0")
    assert p[sof + 11] == 0x22  # Y sampling byte
    assert p[sof + 14] == 0x11  # Cb sampling byte
    p[sof + 11] = 0x31
    p[sof + 14] = 0x21
    with pytest.raises(NotImplementedError, match="non-divisor"):
        decode_jpeg(bytes(p))
