"""FLAC (free lossless audio codec) encode/decode in pure stdlib +
numpy — the compressed-audio analog of the stdlib-zlib PNG work:
PNG proved a compressed IMAGE format is in-container tractable
(entropy layer + exact integer reconstruction); FLAC is the audio
counterpart (Rice entropy coding + fixed/LPC linear predictors), per
the public specification (xiph.org / RFC 9639).

Scope (enough for an honest in-container seam; everything else raises):

* decode: 16-bit streams, fixed or variable blocking, any block size,
  1-2 channels with every channel assignment (independent, left/side,
  right/side, mid/side), subframe types CONSTANT / VERBATIM / FIXED
  (orders 0-4) / LPC (any order), wasted bits, partitioned Rice
  residuals (both 4- and 5-bit parameter methods, escape partitions),
  with CRC-8 (header), CRC-16 (frame) and the STREAMINFO MD5 of the
  decoded stream all VERIFIED.  Non-16-bit sample sizes raise
  ``NotImplementedError`` (the encoder below never writes them).
* encode: 16-bit mono/stereo, fixed blocking; per subframe it picks
  the cheapest of CONSTANT / FIXED order 0-4 (optimal single-partition
  Rice parameter, escape when Rice loses) / VERBATIM, and per stereo
  frame the cheapest channel assignment (independent, left/side,
  right/side, mid/side) — so every subframe type, the escape path and
  every decorrelation are load-bearing in round-trip tests.

No reference-repo analog (the reference pipeline is tabular-only);
written from the public spec like operators/jpeg.py was from T.81.
"""

from __future__ import annotations

import hashlib

import numpy as np

# fixed-predictor residual: r[i] = s[i] - sum(coef_j * s[i-1-j])
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _crc_table(_CRC8_POLY, 8)
_CRC16_TABLE = _crc_table(_CRC16_POLY, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    table = _CRC8_TABLE
    for b in data:
        crc = table[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    table = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ table[(crc >> 8) ^ b]
    return crc


def _utf8_number(n: int) -> bytes:
    """UTF-8-style coding of a frame/sample number (spec §9.1.5):
    ``extra`` continuation bytes carry 6 bits each, the head byte
    carries 6 - extra."""
    if n < 0x80:
        return bytes([n])
    for extra in range(1, 7):
        if n < (1 << (5 * extra + 6)):
            head = (0xFF << (7 - extra)) & 0xFF | (n >> (6 * extra))
            tail = [0x80 | ((n >> (6 * k)) & 0x3F) for k in range(extra - 1, -1, -1)]
            return bytes([head] + tail)
    raise ValueError("frame number too large")


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one bit

    def write_rice_run(self, folded, p: int) -> None:
        """Rice-code a run of folded (non-negative) residuals — the
        encoder's hot loop, with the accumulator kept in locals."""
        acc, n, buf = self.acc, self.n, self.buf
        mask = (1 << p) - 1
        for v in folded:
            v = int(v)
            q = v >> p
            acc = (acc << (q + 1 + p)) | (1 << p) | (v & mask)
            n += q + 1 + p
            while n >= 8:
                buf.append((acc >> (n - 8)) & 0xFF)
                n -= 8
            acc &= (1 << n) - 1
        self.acc, self.n = acc, n

    def pad_to_byte(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        if self.n:
            raise ValueError("writer not byte-aligned")
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def unary(self) -> int:
        q = 0
        while True:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC unary code")
            if (self.data[self.byte] >> (7 - self.bit)) & 1:
                self.bit += 1
                if self.bit == 8:
                    self.bit = 0
                    self.byte += 1
                return q
            q += 1
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1

    def read_rice_run(self, cnt: int, p: int) -> list[int]:
        """Decode ``cnt`` Rice codes (unary quotient, p-bit remainder,
        zig-zag unfold) — the decoder's hot loop.  Works on a flat bit
        cursor: the unary scan steps a byte at a time (quotients are
        short by construction of p) and the remainder is one
        int.from_bytes window, instead of per-bit method calls."""
        data = self.data
        n8 = len(data)
        bp = self.byte * 8 + self.bit
        out = []
        mask = (1 << p) - 1
        for _ in range(cnt):
            byte_i = bp >> 3
            if byte_i >= n8:
                raise ValueError("truncated FLAC unary code")
            cur = data[byte_i] & (0xFF >> (bp & 7))
            while cur == 0:
                byte_i += 1
                if byte_i >= n8:
                    raise ValueError("truncated FLAC unary code")
                cur = data[byte_i]
            one_pos = byte_i * 8 + 8 - cur.bit_length()
            q = one_pos - bp
            bp = one_pos + 1
            if p:
                end = (bp + p + 7) >> 3
                if end > n8:
                    raise ValueError("truncated FLAC rice remainder")
                word = int.from_bytes(data[bp >> 3 : end], "big")
                rem = (word >> ((end << 3) - bp - p)) & mask
                bp += p
            else:
                rem = 0
            u = (q << p) | rem
            out.append(u >> 1 if u % 2 == 0 else -((u + 1) >> 1))
        self.byte = bp >> 3
        self.bit = bp & 7
        return out


def _zigzag(r: np.ndarray) -> np.ndarray:
    """Signed residual -> folded non-negative (spec: even = r>=0)."""
    return np.where(r >= 0, 2 * r, -2 * r - 1)


def _signed_width(r: np.ndarray) -> int:
    """Smallest two's-complement bit width holding every value of r."""
    hi = int(r.max()) if len(r) else 0
    lo = int(r.min()) if len(r) else 0
    return max(hi.bit_length(), (-lo - 1).bit_length() if lo < 0 else 0) + 1


def _best_rice(folded: np.ndarray, rawbits: int) -> tuple[int, int]:
    """(parameter, cost) minimizing single-partition Rice size; the
    escape path (parameter 15, residuals raw at ``rawbits``) is
    signalled by returning p=15.  All 15 candidate costs in one
    broadcast shift."""
    n = len(folded)
    ps = np.arange(15)
    costs = (folded[None, :] >> ps[:, None]).sum(axis=1) + n * (1 + ps)
    p = int(costs.argmin())
    c = int(costs[p])
    esc = 5 + n * rawbits
    return (15, esc) if esc < c else (p, c)


def encode_flac(samples, rate: int = 16000, block_size: int = 256) -> bytes:
    """FLAC from (N,) or (N, C<=2) int16 — fixed blocking, independent
    channels, per-subframe choice of CONSTANT / FIXED 0-4 / VERBATIM."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a.reshape(-1, 1)
    n, ch = a.shape
    if not 1 <= ch <= 2:
        raise ValueError("encode_flac supports 1-2 channels")
    if n == 0:
        raise ValueError("empty signal")
    if not 16 <= block_size <= 65535:
        raise ValueError("block size out of range")
    md5 = hashlib.md5(a.astype("<i2").tobytes()).digest()

    out = bytearray(b"fLaC")
    # STREAMINFO, last-metadata-block flag set
    si = _BitWriter()
    si.write(block_size, 16)  # min block size
    si.write(block_size, 16)  # max (last frame may be shorter; spec allows)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(15, 5)  # bits per sample - 1
    si.write(n, 36)
    info = si.bytes() + md5
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info

    for fno, start in enumerate(range(0, n, block_size)):
        blk = a[start : start + block_size]
        bs = blk.shape[0]
        if ch == 1:
            ca = 0
            planned = [(blk[:, 0].astype(np.int64), 16)]
        else:
            # stereo decorrelation: plan all four channel assignments
            # (spec §9.1.3) and keep the cheapest — correlated channels
            # compress through the 17-bit side channel, and the round
            # trip exercises every decoder decorrelation organically
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = left - right
            mid = (left + right) >> 1
            candidates = [
                (1, [(left, 16), (right, 16)]),   # independent
                (0x8, [(left, 16), (side, 17)]),  # left/side
                (0x9, [(side, 17), (right, 16)]),  # right/side
                (0xA, [(mid, 16), (side, 17)]),   # mid/side
            ]
            ca, planned, best = None, None, None
            for code, items in candidates:
                plans = [(s, bps, _plan_subframe(s, bps)) for s, bps in items]
                cost = sum(pl[2] for _, _, pl in plans)
                if best is None or cost < best:
                    ca, planned, best = code, plans, cost
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)  # sync
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking
        hdr.write(7, 4)  # block size: 16-bit value - 1 follows
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        hdr.write(ca, 4)  # channel assignment
        hdr.write(4, 3)  # 16 bits per sample
        hdr.write(0, 1)  # reserved
        head = hdr.bytes() + _utf8_number(fno) + (bs - 1).to_bytes(2, "big")
        head += bytes([_crc8(head)])
        w = _BitWriter()
        for item in planned:
            if len(item) == 3:
                s, bps, plan = item
                _emit_subframe(w, s, bps, plan)
            else:
                s, bps = item
                _write_subframe(w, s, bps)
        w.pad_to_byte()
        frame = head + w.bytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)


def _plan_subframe(s: np.ndarray, bps: int):
    """Pick the cheapest subframe form for one channel of one frame:
    (kind, payload, cost_bits).  kind is 'constant' / 'fixed' /
    'verbatim'; side channels plan at bps=17."""
    bs = len(s)
    if np.all(s == s[0]):
        return ("constant", int(s[0]), 8 + bps)
    best = ("verbatim", None, 8 + bs * bps)
    for order in range(min(5, bs)):
        coefs = _FIXED_COEFS[order]
        r = s[order:].copy()
        for j, cf in enumerate(coefs):
            r = r - cf * s[order - 1 - j : bs - 1 - j]
        rawbits = min(max(_signed_width(r), 1), 31)
        p, cost = _best_rice(_zigzag(r), rawbits)
        cost += 8 + order * bps + 2 + 4 + 4
        if cost < best[2]:
            best = ("fixed", (order, r, p, rawbits), cost)
    return best


def _emit_subframe(w: _BitWriter, s: np.ndarray, bps: int, plan) -> None:
    kind, payload, _ = plan
    if kind == "constant":
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(payload, bps)
        return
    if kind == "verbatim":
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for v in s:
            w.write(int(v), bps)
        return
    order, r, p, rawbits = payload
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED, order
    w.write(0, 1)  # no wasted bits
    for v in s[:order]:
        w.write(int(v), bps)  # warmup
    w.write(0, 2)  # residual method: 4-bit Rice
    w.write(0, 4)  # partition order 0
    if p == 15:
        w.write(15, 4)
        w.write(rawbits, 5)  # raw residual bit width
        for v in r:
            w.write(int(v), rawbits)
    else:
        w.write(p, 4)
        w.write_rice_run(_zigzag(r), p)


def _write_subframe(w: _BitWriter, s: np.ndarray, bps: int = 16) -> None:
    _emit_subframe(w, s, bps, _plan_subframe(s, bps))


_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}


def decode_flac(payload: bytes):
    """FLAC → (N, C) int16. CRC-8/CRC-16/MD5 all verified."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream: bad magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            streaminfo = body
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("FLAC missing STREAMINFO")
    r = _BitReader(streaminfo)
    r.read(16)  # min block size
    r.read(16)  # max block size
    r.read(24)
    r.read(24)
    rate = r.read(20)
    ch = r.read(3) + 1
    bps = r.read(5) + 1
    total = r.read(36)
    md5 = streaminfo[18:34]
    if bps != 16:
        raise NotImplementedError(f"only 16-bit FLAC supported (bps={bps})")
    if rate <= 0 or ch < 1:
        raise ValueError("malformed STREAMINFO")

    chans: list[list[int]] = [[] for _ in range(ch)]
    got = 0
    while got < total:
        frame_start = pos
        rd = _BitReader(payload, pos)
        if rd.read(14) != 0x3FFE:
            raise ValueError(f"bad frame sync at byte {pos}")
        rd.read(1)  # reserved
        rd.read(1)  # blocking strategy
        bs_code = rd.read(4)
        sr_code = rd.read(4)
        ca = rd.read(4)
        ss_code = rd.read(3)
        rd.read(1)
        # UTF-8 coded number: leading-ones count of the head byte
        first = rd.read(8)
        lead = 0
        while lead < 8 and (first << lead) & 0x80:
            lead += 1
        if lead == 1 or lead == 8:
            raise ValueError("malformed UTF-8 frame number")
        for _ in range(max(lead - 1, 0)):
            if rd.read(8) & 0xC0 != 0x80:
                raise ValueError("malformed UTF-8 continuation byte")
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            bs = rd.read(8) + 1
        elif bs_code == 7:
            bs = rd.read(16) + 1
        else:
            bs = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            rd.read(8)
        elif sr_code in (13, 14):
            rd.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        rd.align()
        crc8_val = rd.read(8)
        if _crc8(payload[frame_start : rd.byte - 1]) != crc8_val:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ss_code == 0:
            fbps = bps
        else:
            fbps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
            if fbps is None:
                raise ValueError("reserved sample size code")
        nch = {0x8: 2, 0x9: 2, 0xA: 2}.get(ca, ca + 1 if ca <= 7 else None)
        if nch is None:
            raise ValueError("reserved channel assignment")
        if nch != ch:
            raise ValueError("frame channel count != STREAMINFO")
        subs = []
        for c in range(nch):
            cbps = fbps
            # the side channel carries one extra bit (spec §9.2.2)
            if (ca == 0x8 and c == 1) or (ca == 0x9 and c == 0) or (
                ca == 0xA and c == 1
            ):
                cbps += 1
            subs.append(_read_subframe(rd, bs, cbps))
        rd.align()
        # CRC-16 over the whole frame up to (not incl.) the CRC field
        if _crc16(payload[frame_start : rd.byte]) != int.from_bytes(
            payload[rd.byte : rd.byte + 2], "big"
        ):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = rd.byte + 2
        if ca == 0x8:  # left/side: R = L - S
            left, side = subs
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif ca == 0x9:  # right/side: L = R + S
            side, right = subs
            subs = [[rt + s for rt, s in zip(right, side)], right]
        elif ca == 0xA:  # mid/side
            mid, side = subs
            left, right = [], []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            subs = [left, right]
        take = min(bs, total - got)
        for c in range(ch):
            chans[c].extend(subs[c][:take])
        got += take
    out = np.array(chans, dtype=np.int64).T
    if out.size and (out.max() > 32767 or out.min() < -32768):
        raise ValueError("decoded samples exceed 16-bit range")
    out = out.astype(np.int16)
    if hashlib.md5(out.astype("<i2").tobytes()).digest() != md5:
        raise ValueError("FLAC MD5 signature mismatch")
    return np.ascontiguousarray(out)


def _read_subframe(rd: _BitReader, bs: int, bps: int) -> list[int]:
    if rd.read(1):
        raise ValueError("invalid subframe padding bit")
    stype = rd.read(6)
    wasted = 0
    if rd.read(1):  # wasted bits: unary count - 1
        wasted = rd.unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = rd.signed(bps)
        s = [v] * bs
    elif stype == 1:  # VERBATIM
        s = [rd.signed(bps) for _ in range(bs)]
    elif 8 <= stype <= 12:  # FIXED (orders specialized: the hot path)
        order = stype - 8
        s = [rd.signed(bps) for _ in range(order)]
        resid = _read_residual(rd, bs, order)
        if order == 0:
            s = resid
        elif order == 1:
            a = s[0]
            for rv in resid:
                a = rv + a
                s.append(a)
        elif order == 2:
            a, b = s[1], s[0]
            for rv in resid:
                a, b = rv + 2 * a - b, a
                s.append(a)
        elif order == 3:
            a, b, c = s[2], s[1], s[0]
            for rv in resid:
                a, b, c = rv + 3 * a - 3 * b + c, a, b
                s.append(a)
        else:
            a, b, c, d = s[3], s[2], s[1], s[0]
            for rv in resid:
                a, b, c, d = rv + 4 * a - 6 * b + 4 * c - d, a, b, c
                s.append(a)
    elif stype >= 32:  # LPC, order = low 5 bits + 1
        order = (stype & 31) + 1
        s = [rd.signed(bps) for _ in range(order)]
        prec = rd.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code")
        shift = rd.signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [rd.signed(prec) for _ in range(order)]
        resid = _read_residual(rd, bs, order)
        for i, rv in enumerate(resid):
            pred = sum(
                cf * s[order + i - 1 - j] for j, cf in enumerate(coefs)
            ) >> shift
            s.append(rv + pred)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        s = [v << wasted for v in s]
    return s


def _read_residual(rd: _BitReader, bs: int, order: int) -> list[int]:
    method = rd.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = rd.read(4)
    nparts = 1 << po
    if bs % nparts or (bs >> po) <= order:
        raise ValueError("invalid Rice partition order")
    out: list[int] = []
    for part in range(nparts):
        cnt = (bs >> po) - (order if part == 0 else 0)
        p = rd.read(pbits)
        if p == escape:
            raw = rd.read(5)
            vals = [rd.signed(raw) if raw else 0 for _ in range(cnt)]
        else:
            vals = rd.read_rice_run(cnt, p)
        out.extend(vals)
    return out
