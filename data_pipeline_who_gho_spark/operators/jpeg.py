"""Baseline JPEG (ITU-T T.81) encode/decode in pure stdlib + numpy —
the LAST image-codec stub retired.

Scope (enough for an honest in-container seam; everything else raises):

* decode: baseline sequential DCT (SOF0), 8-bit, grayscale (1
  component) or YCbCr with any divisor sampling factors — 4:4:4,
  4:2:0, 4:2:2/4:4:0 (interleaved MCU walk per A.2.3, chroma restored
  by sample replication) — plus restart intervals (DRI/RSTn per
  E.2.4); canonical Huffman per Annex C, byte-stuffing-aware bit
  reader, DC predictive + AC run-length entropy decode, dequantize,
  dezigzag, float IDCT with round-half-away + clamp. Progressive
  (SOF2), arithmetic coding, and non-divisor sampling grids raise
  ``NotImplementedError``.
* encode: same profile, quality expressed by the caller's quant table.
  The encoder can either (a) forward-DCT real samples (lossy round
  trip, pinned within a tolerance in tests) or (b) take QUANTIZED
  COEFFICIENT blocks directly — the path a driver registration uses:
  DC-only blocks make the decoded image flat per block with EXACTLY
  predictable integer values (IDCT of a lone DC is dc/8 across the
  block), so the whole marker/Huffman/dequant/IDCT pipeline becomes
  oracle-checkable without floating-point drift.

Reference: ITU-T T.81 (public spec); Huffman tables from Annex K.
No reference-repo analog (the reference pipeline is tabular-only).
"""

from __future__ import annotations

import numpy as np

# zig-zag order: index in the 8x8 block for each of the 64 scan positions
_ZIGZAG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C: value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]):
    """((length, code) -> value map, 8-bit-lookahead LUT) for the reader.

    The LUT resolves every code of length <= 8 from one peek (for the
    Annex-K tables that covers the overwhelming share of symbols); the
    map remains the fallback for longer codes."""
    codes = _canonical_codes(bits, vals)
    mapping = {(length, code): v for v, (code, length) in codes.items()}
    lut: list[tuple[int, int] | None] = [None] * 256
    for v, (code, length) in codes.items():
        if length <= 8:
            base = code << (8 - length)
            for i in range(1 << (8 - length)):
                lut[base + i] = (v, length)
    return mapping, lut


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def raw(self, b: bytes) -> None:
        """Emit marker bytes verbatim (caller must be byte-aligned)."""
        if self.n:
            raise ValueError("raw marker emit while not byte-aligned")
        self.buf.extend(b)

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def restart(self, m: int) -> None:
        """Consume the byte-aligned RSTm marker at a restart boundary
        (T.81 E.2.4): discard pad bits, then expect 0xFF 0xD0+m."""
        self.acc = 0
        self.n = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + m
        ):
            raise ValueError(f"missing or out-of-order restart marker RST{m}")
        self.pos += 2

    def _fill(self) -> bool:
        """Pull one more entropy byte into the accumulator.  Returns
        False — WITHOUT consuming anything — when the stream ends or a
        real marker (e.g. RSTn before a restart boundary) is next, so
        Huffman lookahead can stop cleanly and ``restart()`` still
        finds the marker in place."""
        if self.pos >= len(self.data):
            return False
        byte = self.data[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(self.data):
                return False
            if self.data[self.pos + 1] != 0x00:
                return False  # a real marker: not entropy data
            self.pos += 2  # stuffed byte
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.n += 8
        return True

    def bit(self) -> int:
        if self.n == 0 and not self._fill():
            raise ValueError("truncated JPEG entropy stream")
        self.n -= 1
        b = (self.acc >> self.n) & 1
        self.acc &= (1 << self.n) - 1
        return b

    def bits(self, k: int) -> int:
        while self.n < k:
            if not self._fill():
                raise ValueError("truncated JPEG entropy stream")
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table) -> int:
        mapping, lut = table
        while self.n < 8 and self._fill():
            pass
        if self.n >= 8:
            hit = lut[(self.acc >> (self.n - 8)) & 0xFF]
            if hit is not None:
                v, ln = hit
                self.n -= ln
                self.acc &= (1 << self.n) - 1
                return v
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.bit()
            length += 1
            v = mapping.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in JPEG entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category t, t-bit code)."""
    t = abs(v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _write_block(wbits: _BitWriter, zz, pred: int, dc_codes, ac_codes) -> int:
    """Entropy-encode one zig-zag coefficient vector (T.81 F.1.2: DC
    diff category + magnitude, then AC run/size with ZRL and EOB);
    returns the new DC predictor."""
    diff = int(zz[0]) - pred
    t, mag = _magnitude(diff)
    if t > 11:
        raise ValueError(f"DC diff {diff} exceeds baseline category 11")
    code, ln = dc_codes[t]
    wbits.write(code, ln)
    if t:
        wbits.write(mag, t)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            wbits.write(code, ln)
            run -= 16
        t, mag = _magnitude(v)
        if t > 10:
            raise ValueError(f"AC coefficient {v} exceeds baseline category 10")
        code, ln = ac_codes[(run << 4) | t]
        wbits.write(code, ln)
        wbits.write(mag, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        wbits.write(code, ln)
    return int(zz[0])


def _dct_basis() -> np.ndarray:
    x = np.arange(8)
    cosm = np.cos((2 * x[:, None] + 1) * x[None, :] * np.pi / 16)  # [n, k]
    c = np.where(x == 0, np.sqrt(0.5), 1.0)
    return cosm * c[None, :]


_DCT_M = _dct_basis()  # built once: per-block rebuilds dominated decode


def _idct_block(coef: np.ndarray) -> np.ndarray:
    """Float 2-D IDCT of one 8x8 coefficient block (T.81 A.3.3):
    S(y,x) = 1/4 ΣΣ C(u)C(v) F(v,u) cos((2x+1)uπ/16) cos((2y+1)vπ/16)."""
    return 0.25 * _DCT_M @ coef @ _DCT_M.T


def _fdct_block(samples: np.ndarray) -> np.ndarray:
    """Float 2-D forward DCT of one 8x8 sample block."""
    return 0.25 * _DCT_M.T @ samples @ _DCT_M


def encode_jpeg_gray(
    img=None,
    quant: np.ndarray | None = None,
    coef_blocks: np.ndarray | None = None,
    shape: tuple[int, int] | None = None,
) -> bytes:
    """Baseline grayscale JPEG.

    Either ``img`` (H, W) uint8 — forward-DCT'd and quantized (lossy) —
    or ``coef_blocks`` (by, bx, 8, 8) int QUANTIZED coefficients with
    ``shape`` = (H, W) — written verbatim, which makes the decode
    exactly predictable (the registered-query path)."""
    q = (
        np.asarray(quant, dtype=np.int64)
        if quant is not None
        else np.full((8, 8), 1, dtype=np.int64)
    )
    if not (1 <= q.min() and q.max() <= 255):
        raise ValueError("quant table entries must be in 1..255")
    if coef_blocks is None:
        a = np.asarray(img, dtype=np.uint8)
        h, w = a.shape
        by, bx = -(-h // 8), -(-w // 8)
        padded = np.zeros((by * 8, bx * 8), dtype=np.float64)
        padded[:h, :w] = a
        # replicate edges into the pad (standard practice, bounds ringing)
        padded[h:, :] = padded[h - 1 : h, :]
        padded[:, w:] = padded[:, w - 1 : w]
        coef_blocks = np.zeros((by, bx, 8, 8), dtype=np.int64)
        for i in range(by):
            for j in range(bx):
                blk = padded[i * 8 : i * 8 + 8, j * 8 : j * 8 + 8] - 128.0
                f = _fdct_block(blk)
                coef_blocks[i, j] = np.round(f / q).astype(np.int64)
    else:
        coef_blocks = np.asarray(coef_blocks, dtype=np.int64)
        by, bx = coef_blocks.shape[:2]
        h, w = shape if shape is not None else (by * 8, bx * 8)
        if not (by * 8 - 7 <= h <= by * 8 and bx * 8 - 7 <= w <= bx * 8):
            raise ValueError("shape inconsistent with coef_blocks grid")

    dc_codes = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    wbits = _BitWriter()
    pred = 0
    for i in range(by):
        for j in range(bx):
            zz = coef_blocks[i, j].reshape(64)[_ZIGZAG]
            pred = _write_block(wbits, zz, pred, dc_codes, ac_codes)
    entropy = wbits.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    dqt = seg(0xDB, bytes([0]) + bytes(int(v) for v in q.reshape(64)[_ZIGZAG]))
    sof = seg(
        0xC0,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),  # 1 component, 1x1 sampling, qtable 0
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"


def encode_jpeg_color444(
    coef_blocks: np.ndarray, shape: tuple[int, int]
) -> bytes:
    """Baseline 3-component 4:4:4 JPEG from QUANTIZED coefficient
    blocks (by, bx, 3, 8, 8) — all components share quant table 0 and
    the luminance Huffman tables (legal, and keeps the writer small).
    Interleaved scan: one block per component per MCU, per T.81 A.2.3.
    Exercises the decoder's multi-component MCU walk and per-component
    DC prediction; like the grayscale coefficient path, decode is
    exactly predictable."""
    coef_blocks = np.asarray(coef_blocks, dtype=np.int64)
    by, bx, nc = coef_blocks.shape[:3]
    if nc != 3:
        raise ValueError("encode_jpeg_color444 expects 3 components")
    h, w = shape
    dc_codes = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    wbits = _BitWriter()
    preds = [0, 0, 0]
    for i in range(by):
        for j in range(bx):
            for c in range(3):
                zz = coef_blocks[i, j, c].reshape(64)[_ZIGZAG]
                preds[c] = _write_block(wbits, zz, preds[c], dc_codes, ac_codes)
    entropy = wbits.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    q = np.full(64, 1, dtype=np.uint8)
    dqt = seg(0xDB, bytes([0]) + q.tobytes())
    sof = seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"


def encode_jpeg_subsampled(
    y_blocks: np.ndarray,
    cb_blocks: np.ndarray,
    cr_blocks: np.ndarray,
    shape: tuple[int, int],
    sampling: tuple[int, int] = (2, 2),
    restart_interval: int = 0,
) -> bytes:
    """Baseline 3-component JPEG with subsampled chroma from QUANTIZED
    coefficient blocks — the dominant real-web profile (4:2:0 is
    sampling=(2, 2); 4:2:2 is (2, 1)).

    Y carries sampling factors (hy, vy) and contributes hy*vy blocks
    per MCU in raster order (T.81 A.2.3); Cb and Cr are 1x1 and
    contribute one block each.  ``y_blocks`` is (my*vy, mx*hy, 8, 8)
    and each chroma array is (my, mx, 8, 8) where my/mx is the MCU
    grid for ``shape``.  With ``restart_interval`` = Ri > 0 a DRI
    segment is written and RSTm markers (m cycling 0..7) are emitted
    every Ri MCUs with byte-aligned padding and DC-predictor resets
    (T.81 E.2.4).  All components share quant table 0 and the
    luminance Huffman tables, like encode_jpeg_color444."""
    hy, vy = sampling
    if not (1 <= hy <= 2 and 1 <= vy <= 2) or (hy, vy) == (1, 1):
        raise ValueError("sampling must be (2,2), (2,1) or (1,2)")
    y_blocks = np.asarray(y_blocks, dtype=np.int64)
    cb_blocks = np.asarray(cb_blocks, dtype=np.int64)
    cr_blocks = np.asarray(cr_blocks, dtype=np.int64)
    h, w = shape
    my, mx = -(-h // (8 * vy)), -(-w // (8 * hy))
    if y_blocks.shape[:2] != (my * vy, mx * hy):
        raise ValueError(
            f"y_blocks grid {y_blocks.shape[:2]} != {(my * vy, mx * hy)}"
        )
    if cb_blocks.shape[:2] != (my, mx) or cr_blocks.shape[:2] != (my, mx):
        raise ValueError("chroma block grids must match the MCU grid")

    dc_codes = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    wbits = _BitWriter()
    preds = [0, 0, 0]
    mcu = 0
    for i in range(my):
        for j in range(mx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wbits.pad_to_byte()
                wbits.raw(bytes([0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]))
                preds = [0, 0, 0]
            for v in range(vy):
                for u in range(hy):
                    zz = y_blocks[i * vy + v, j * hy + u].reshape(64)[_ZIGZAG]
                    preds[0] = _write_block(wbits, zz, preds[0], dc_codes, ac_codes)
            for c, blocks in ((1, cb_blocks), (2, cr_blocks)):
                zz = blocks[i, j].reshape(64)[_ZIGZAG]
                preds[c] = _write_block(wbits, zz, preds[c], dc_codes, ac_codes)
            mcu += 1
    entropy = wbits.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    q = np.full(64, 1, dtype=np.uint8)
    dqt = seg(0xDB, bytes([0]) + q.tobytes())
    sof = seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([3, 1, (hy << 4) | vy, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )
    dri = seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + entropy + b"\xff\xd9"


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """JFIF YCbCr → RGB in integer fixed point (×2¹⁶ coefficients,
    round-half-up shift) — deterministic across platforms, unlike a
    float matrix multiply."""
    y = ycc[..., 0].astype(np.int64)
    cb = ycc[..., 1].astype(np.int64) - 128
    cr = ycc[..., 2].astype(np.int64) - 128
    half = 1 << 15
    r = y + ((91881 * cr + half) >> 16)
    g = y - ((22554 * cb + 46802 * cr + half) >> 16)
    b = y + ((116130 * cb + half) >> 16)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W) grayscale or (H, W, 3) YCbCr uint8.

    Handles 4:4:4 and subsampled-chroma frames (4:2:0 / 4:2:2 / any
    divisor factors; subsampled components are restored to full
    resolution by sample replication) and restart intervals.  Output
    is YCbCr component samples for 3-component images (the
    color-transform-to-RGB step is a separate, exactly-specified
    integer op the caller composes if needed); grayscale returns the
    luma plane directly."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos, n = 2, len(payload)
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    scan = None
    dri = 0
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker;
        # skip them so seg_len is never read from a fill byte (ADVICE r08)
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: standalone
            pos += 2
            continue
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = np.frombuffer(b[1:65], np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                b = b[65:]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                tc, th = b[0] >> 4, b[0] & 0xF
                bits = list(b[1:17])
                cnt = sum(bits)
                vals = list(b[17 : 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                b = b[17 + cnt :]
        elif marker == 0xC0:  # SOF0 baseline
            prec = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"illegal sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for cid, hi, vi, tq in comps:
                if hmax % hi or vmax % vi:
                    raise NotImplementedError(
                        f"non-divisor sampling factors {hi}x{vi} (max "
                        f"{hmax}x{vmax}): replication upsampling undefined"
                    )
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential (SOF0) JPEG")
        elif marker == 0xDD:  # DRI
            dri = int.from_bytes(body, "big")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cs, tables >> 4, tables & 0xF))
            scan = (scan_comps, pos + 2 + seg_len)
            break
        pos += 2 + seg_len
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    if h <= 0 or w <= 0:
        raise ValueError("malformed JPEG dimensions")
    scan_comps, data_start = scan
    # entropy data runs until the EOI marker
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("JPEG missing EOI")
    reader = _BitReader(payload[data_start:end])
    samp = {cid: (hi, vi) for cid, hi, vi, _ in comps}
    tq_of = {cid: tq for cid, hi, vi, tq in comps}
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)

    def decode_block(td: int, ta: int, cs: int, preds: dict) -> np.ndarray:
        zz = np.zeros(64, dtype=np.int64)
        t = reader.huff(huff_dc[td])
        diff = _extend(reader.bits(t), t) if t else 0
        preds[cs] += diff
        zz[0] = preds[cs]
        k = 1
        while k < 64:
            rs = reader.huff(huff_ac[ta])
            r, t = rs >> 4, rs & 0xF
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += r
            if k > 63:
                raise ValueError("AC run past end of block")
            zz[k] = _extend(reader.bits(t), t)
            k += 1
        blk = np.zeros(64, dtype=np.int64)
        blk[_ZIGZAG] = zz  # inverse zig-zag: natural[zz_index[k]] = zz[k]
        return blk.reshape(8, 8)

    preds = {cs: 0 for cs, _, _ in scan_comps}
    if len(scan_comps) == 1:
        # non-interleaved scan: the MCU is one block, walking this
        # component's own block grid (T.81 A.2.2)
        cs, td, ta = scan_comps[0]
        hi, vi = samp[cs]
        ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)  # sample dims
        cby, cbx = -(-ch // 8), -(-cw // 8)
        grids = {cs: np.zeros((cby, cbx, 8, 8), dtype=np.int64)}
        mcu_iter = [(cs, i, j) for i in range(cby) for j in range(cbx)]
        per_mcu = 1
    else:
        # interleaved: each MCU carries hi*vi blocks per component in
        # raster order (T.81 A.2.3)
        my, mx = -(-h // (8 * vmax)), -(-w // (8 * hmax))
        grids = {
            cs: np.zeros((my * samp[cs][1], mx * samp[cs][0], 8, 8), np.int64)
            for cs, _, _ in scan_comps
        }
        mcu_iter = []
        for i in range(my):
            for j in range(mx):
                for cs, _, _ in scan_comps:
                    hi, vi = samp[cs]
                    for v in range(vi):
                        for u in range(hi):
                            mcu_iter.append((cs, i * vi + v, j * hi + u))
        per_mcu = sum(samp[cs][0] * samp[cs][1] for cs, _, _ in scan_comps)
    tables = {cs: (td, ta) for cs, td, ta in scan_comps}
    for b, (cs, bi, bj) in enumerate(mcu_iter):
        if dri and b and b % (dri * per_mcu) == 0:
            reader.restart((b // (dri * per_mcu) - 1) % 8)
            preds = {c: 0 for c in preds}
        td, ta = tables[cs]
        grids[cs][bi, bj] = decode_block(td, ta, cs, preds)

    planes = []
    for cs, _, _ in scan_comps:
        q = quant.get(tq_of[cs])
        if q is None:
            raise ValueError(f"missing quant table {tq_of[cs]}")
        hi, vi = samp[cs]
        gby, gbx = grids[cs].shape[:2]
        plane = np.zeros((gby * 8, gbx * 8), dtype=np.uint8)
        for i in range(gby):
            for j in range(gbx):
                s = _idct_block(grids[cs][i, j] * q)
                # round half away from zero, level shift, clamp
                s = np.trunc(s + 0.5 * np.sign(s))
                plane[i * 8 : i * 8 + 8, j * 8 : j * 8 + 8] = np.clip(
                    s + 128, 0, 255
                ).astype(np.uint8)
        # crop to this component's sample dims, then replicate each
        # sample hmax/hi x vmax/vi back to full resolution (box
        # upsampling — the exactly-specified integer choice)
        ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
        plane = plane[:ch, :cw]
        if (hmax // hi, vmax // vi) != (1, 1):
            plane = np.repeat(np.repeat(plane, vmax // vi, 0), hmax // hi, 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    return np.stack(planes, axis=-1)
