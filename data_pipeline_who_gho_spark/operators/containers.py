"""Container-level probes for MP4 (ISO BMFF) and MP3 — the metadata
layer a curation pipeline runs BEFORE deciding to decode anything.

``probe_mp4`` walks the ISO/IEC 14496-12 box tree (32-bit, 64-bit
``largesize``, and to-end-of-file sizes; FullBox version 0 and 1) and
returns brands, movie timescale/duration, per-track id / handler /
duration / timescale / language / pixel dimensions, and mdat byte
counts.  ``scan_mp3_frames`` walks an MPEG audio stream (ISO 11172-3 /
13818-3): ID3v2 skip (syncsafe size, footer flag), per-frame header
parse (version, layer, bitrate/samplerate tables, padding), exact
frame-length arithmetic, and ID3v1 trailer detection.  This is the
ffprobe layer re-expressed: duration, dimensions, track inventory,
bitrate shape — all integer-exact and oracle-replayable.

SAMPLE decode (H.264/AAC/MP3 audio synthesis) remains an explicit
``NotImplementedError`` in ``decode_media`` — those codecs need
libraries this container lacks; the probes make the honest boundary
precise: containers parse for real, codec payloads stay opaque.

The synthesizers (``build_mp4``, ``build_mp3``) write structurally
valid streams from integer parameters so driver queries get
closed-form oracles, exactly as ``encode_png``/``encode_wav`` do for
the decode family.

No reference-repo analog (the reference pipeline is tabular-only).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# MP4 / ISO BMFF (ISO/IEC 14496-12)
# ---------------------------------------------------------------------------

# container boxes whose payload is a sequence of child boxes
_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts",
                   b"dinf", b"udta", b"mvex"}


def _u(b: bytes) -> int:
    return int.from_bytes(b, "big")


def _iter_boxes(payload: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in
    payload[start:end], handling size==1 (64-bit largesize) and
    size==0 (extends to end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        size = _u(payload[pos : pos + 4])
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize header")
            size = _u(payload[pos + 8 : pos + 16])
            body = pos + 16
            if size < 16:
                raise ValueError("MP4 largesize smaller than its header")
        elif size == 0:
            size = end - pos
        elif size < 8:
            raise ValueError(f"MP4 box size {size} smaller than its header")
        if pos + size > end:
            raise ValueError("MP4 box overruns its container")
        yield btype, body, pos + size
        pos += size


def _full_box(payload: bytes, start: int):
    """(version, flags, body_start) of a FullBox."""
    version = payload[start]
    flags = _u(payload[start + 1 : start + 4])
    return version, flags, start + 4


def _mp4_lang(code: int) -> str:
    """mdhd packed language: three 5-bit letters offset from 0x60."""
    return "".join(
        chr(0x60 + ((code >> s) & 0x1F)) for s in (10, 5, 0)
    )


def probe_mp4(payload: bytes) -> dict:
    """Parse an ISO BMFF container's structural metadata.

    Returns ``{"major_brand", "compatible_brands", "timescale",
    "duration", "mdat_bytes", "tracks": [{"track_id", "handler",
    "duration", "timescale", "language", "width", "height"}]}`` —
    durations in their declaring box's timescale, dimensions from
    tkhd's 16.16 fixed point (integer part).  Raises ValueError on
    malformed box structure; containers without ftyp+moov raise too
    (not a playable MP4)."""
    if len(payload) < 8:
        raise ValueError("not an MP4: too short")
    out: dict = {
        "major_brand": None,
        "compatible_brands": [],
        "timescale": None,
        "duration": None,
        "mdat_bytes": 0,
        "tracks": [],
    }

    def walk(start: int, end: int, track: dict | None) -> None:
        for btype, b0, b1 in _iter_boxes(payload, start, end):
            if btype == b"ftyp":
                out["major_brand"] = payload[b0 : b0 + 4].decode("latin-1")
                out["compatible_brands"] = [
                    payload[p : p + 4].decode("latin-1")
                    for p in range(b0 + 8, b1, 4)
                ]
            elif btype == b"mdat":
                out["mdat_bytes"] += b1 - b0
            elif btype == b"mvhd":
                v, _, p = _full_box(payload, b0)
                if v == 1:
                    out["timescale"] = _u(payload[p + 16 : p + 20])
                    out["duration"] = _u(payload[p + 20 : p + 28])
                else:
                    out["timescale"] = _u(payload[p + 8 : p + 12])
                    out["duration"] = _u(payload[p + 12 : p + 16])
            elif btype == b"tkhd":
                v, _, p = _full_box(payload, b0)
                if v == 1:
                    track["track_id"] = _u(payload[p + 16 : p + 20])
                    track["duration"] = _u(payload[p + 24 : p + 32])
                    p_wh = p + 32
                else:
                    track["track_id"] = _u(payload[p + 8 : p + 12])
                    track["duration"] = _u(payload[p + 16 : p + 20])
                    p_wh = p + 20
                # reserved (8) + layer/group/volume/reserved (8) + matrix (36)
                p_wh += 8 + 8 + 36
                track["width"] = _u(payload[p_wh : p_wh + 4]) >> 16
                track["height"] = _u(payload[p_wh + 4 : p_wh + 8]) >> 16
            elif btype == b"mdhd":
                v, _, p = _full_box(payload, b0)
                if v == 1:
                    track["timescale"] = _u(payload[p + 16 : p + 20])
                    lang_at = p + 28
                else:
                    track["timescale"] = _u(payload[p + 8 : p + 12])
                    lang_at = p + 16
                track["language"] = _mp4_lang(_u(payload[lang_at : lang_at + 2]))
            elif btype == b"hdlr":
                _, _, p = _full_box(payload, b0)
                track["handler"] = payload[p + 4 : p + 8].decode("latin-1")
            elif btype == b"trak":
                t: dict = {
                    "track_id": None, "handler": None, "duration": None,
                    "timescale": None, "language": None,
                    "width": 0, "height": 0,
                }
                out["tracks"].append(t)
                walk(b0, b1, t)
            elif btype in _MP4_CONTAINERS:
                walk(b0, b1, track)
            # leaf boxes we don't interpret (free, stts, stsd, ...) skip

    walk(0, len(payload), None)
    if out["major_brand"] is None or out["timescale"] is None:
        raise ValueError("not an MP4: missing ftyp or moov/mvhd")
    return out


def _box(btype: bytes, body: bytes) -> bytes:
    return (len(body) + 8).to_bytes(4, "big") + btype + body


def _fbox(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + body)


def build_mp4(
    timescale: int,
    duration: int,
    tracks: list[dict],
    mdat_bytes: int = 0,
    brand: str = "isom",
) -> bytes:
    """Synthesize a structurally valid ISO BMFF container: ftyp +
    moov(mvhd + trak(tkhd + mdia(mdhd + hdlr + minf(stbl)))) + mdat.

    Each track dict: ``{"track_id", "handler" ('vide'|'soun'),
    "duration", "timescale", "language" (3 letters), "width",
    "height"}``.  The stbl is an empty-but-well-formed sample table
    (zero-entry stsd/stts/stsc/stsz/stco) and mdat carries
    ``mdat_bytes`` of deterministic filler — the probe layer's target,
    not a decodable presentation."""
    ftyp = _box(b"ftyp", brand.encode("latin-1") + (0).to_bytes(4, "big")
                + b"isom" + b"mp42")
    mvhd = _fbox(
        b"mvhd", 0, 0,
        (0).to_bytes(8, "big")  # creation + modification
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big")  # rate 1.0
        + (0x0100).to_bytes(2, "big")      # volume 1.0
        + bytes(2 + 8)                     # reserved
        + _unit_matrix()
        + bytes(24)                        # pre_defined
        + (len(tracks) + 1).to_bytes(4, "big"),
    )
    traks = []
    for t in tracks:
        tkhd = _fbox(
            b"tkhd", 0, 7,
            (0).to_bytes(8, "big")
            + t["track_id"].to_bytes(4, "big")
            + bytes(4)
            + t["duration"].to_bytes(4, "big")
            + bytes(8)      # reserved
            + bytes(2 + 2)  # layer + alternate_group
            + ((0x0100).to_bytes(2, "big") if t["handler"] == "soun"
               else bytes(2))
            + bytes(2)
            + _unit_matrix()
            + (t["width"] << 16).to_bytes(4, "big")
            + (t["height"] << 16).to_bytes(4, "big"),
        )
        lang = t.get("language", "und")
        code = 0
        for ch in lang:
            code = (code << 5) | (ord(ch) - 0x60)
        mdhd = _fbox(
            b"mdhd", 0, 0,
            (0).to_bytes(8, "big")
            + t["timescale"].to_bytes(4, "big")
            + t["duration"].to_bytes(4, "big")
            + code.to_bytes(2, "big")
            + bytes(2),
        )
        hdlr = _fbox(
            b"hdlr", 0, 0,
            bytes(4) + t["handler"].encode("latin-1") + bytes(12) + b"\x00",
        )
        stbl = _box(
            b"stbl",
            _fbox(b"stsd", 0, 0, (0).to_bytes(4, "big"))
            + _fbox(b"stts", 0, 0, (0).to_bytes(4, "big"))
            + _fbox(b"stsc", 0, 0, (0).to_bytes(4, "big"))
            + _fbox(b"stsz", 0, 0, bytes(8))
            + _fbox(b"stco", 0, 0, (0).to_bytes(4, "big")),
        )
        header = (
            _fbox(b"vmhd", 0, 1, bytes(8))
            if t["handler"] == "vide"
            else _fbox(b"smhd", 0, 0, bytes(4))
        )
        dinf = _box(
            b"dinf",
            _fbox(b"dref", 0, 0, (1).to_bytes(4, "big")
                  + _fbox(b"url ", 0, 1, b"")),
        )
        minf = _box(b"minf", header + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        traks.append(_box(b"trak", tkhd + mdia))
    moov = _box(b"moov", mvhd + b"".join(traks))
    # deterministic non-sync filler (never 0xFF, can't fake a box size
    # that overruns: mdat's own length covers it)
    mdat = _box(b"mdat", bytes(i % 251 for i in range(mdat_bytes)))
    return ftyp + moov + mdat


def _unit_matrix() -> bytes:
    vals = [0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000]
    return b"".join(v.to_bytes(4, "big") for v in vals)


# ---------------------------------------------------------------------------
# MP3 / MPEG audio frame headers (ISO 11172-3, 13818-3)
# ---------------------------------------------------------------------------

# bitrate tables in kbps, index 1..14 (0 = free, 15 = bad)
_MP3_BITRATE = {
    # (version_group, layer): table  — version_group: 1 = MPEG1, 2 = MPEG2/2.5
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_SAMPLERATE = {
    3: [44100, 48000, 32000],   # MPEG1   (version bits 11)
    2: [22050, 24000, 16000],   # MPEG2   (version bits 10)
    0: [11025, 12000, 8000],    # MPEG2.5 (version bits 00)
}
_MP3_VERSION_NAME = {3: "1", 2: "2", 0: "2.5"}


def _id3v2_size(payload: bytes) -> int:
    """Total bytes of a leading ID3v2 tag (0 if absent): 10-byte header
    with a 28-bit syncsafe size, +10 if the footer flag (bit 4) is set."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    flags = payload[5]
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            raise ValueError("ID3v2 size bytes must be syncsafe")
        size = (size << 7) | b
    return 10 + size + (10 if flags & 0x10 else 0)


def scan_mp3_frames(payload: bytes) -> dict:
    """Walk an MPEG audio stream's frame headers (no audio decode).

    Skips a leading ID3v2 tag and a trailing 128-byte ID3v1 tag, then
    requires back-to-back valid frames: 11-bit sync, known version /
    layer / bitrate / samplerate, exact frame length per the spec
    formula (Layer I: (12·br/sr + pad)·4; Layer II/III: 144·br/sr +
    pad, 72·… for MPEG2/2.5 Layer III).  Returns ``{"version",
    "layer", "samplerate", "n_frames", "frame_bytes", "samples",
    "sum_kbps", "id3v2_bytes", "id3v1": bool}`` — mixed-bitrate (VBR)
    streams aggregate exactly; mixed version/layer/samplerate raise
    (not a single stream)."""
    pos = _id3v2_size(payload)
    id3v2 = pos
    end = len(payload)
    id3v1 = end >= pos + 128 and payload[end - 128 : end - 125] == b"TAG"
    if id3v1:
        end -= 128
    version = layer = samplerate = None
    n_frames = frame_bytes = samples = sum_kbps = 0
    while pos < end:
        if pos + 4 > end:
            raise ValueError("truncated MP3 frame header")
        h = _u(payload[pos : pos + 4])
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"lost MP3 frame sync at byte {pos}")
        vbits = (h >> 19) & 3
        lbits = (h >> 17) & 3
        if vbits == 1 or lbits == 0:
            raise ValueError("reserved MPEG version/layer bits")
        lyr = 4 - lbits  # layer bits: 11=I, 10=II, 01=III
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        if br_idx in (0, 15):
            raise ValueError("free-format or invalid bitrate index")
        if sr_idx == 3:
            raise ValueError("reserved samplerate index")
        vgroup = 1 if vbits == 3 else 2
        kbps = _MP3_BITRATE[(vgroup, lyr)][br_idx]
        sr = _MP3_SAMPLERATE[vbits][sr_idx]
        pad = (h >> 9) & 1
        if lyr == 1:
            flen = (12 * kbps * 1000 // sr + pad) * 4
            spf = 384
        elif lyr == 2:
            flen = 144 * kbps * 1000 // sr + pad
            spf = 1152
        else:
            flen = (144 if vgroup == 1 else 72) * kbps * 1000 // sr + pad
            spf = 1152 if vgroup == 1 else 576
        vname = _MP3_VERSION_NAME[vbits]
        if version is None:
            version, layer, samplerate = vname, lyr, sr
        elif (vname, lyr, sr) != (version, layer, samplerate):
            raise ValueError("mixed version/layer/samplerate in one stream")
        if pos + flen > end:
            raise ValueError("MP3 frame overruns the stream")
        n_frames += 1
        frame_bytes += flen
        samples += spf
        sum_kbps += kbps
        pos += flen
    if n_frames == 0:
        raise ValueError("no MPEG audio frames")
    return {
        "version": version,
        "layer": layer,
        "samplerate": samplerate,
        "n_frames": n_frames,
        "frame_bytes": frame_bytes,
        "samples": samples,
        "sum_kbps": sum_kbps,
        "id3v2_bytes": id3v2,
        "id3v1": id3v1,
    }


def build_mp3(
    frames: list[tuple[int, int]],
    sr_idx: int = 0,
    version: int = 1,
    layer: int = 3,
    id3v2_payload: int = 0,
    id3v1: bool = False,
) -> bytes:
    """Synthesize an MPEG audio stream from (bitrate_index, padding)
    pairs — valid headers with deterministic non-0xFF filler bodies
    (the scanner's target; the audio payload is explicitly opaque).
    ``id3v2_payload`` prepends a that-many-byte ID3v2 tag and
    ``id3v1`` appends the 128-byte v1 trailer, so tag skipping is
    exercised."""
    vbits = {1: 3, 2: 2, 25: 0}[version]
    lbits = 4 - layer
    vgroup = 1 if version == 1 else 2
    out = bytearray()
    if id3v2_payload:
        size = id3v2_payload
        if size >= 1 << 28:
            raise ValueError("ID3v2 tag too large for syncsafe size")
        sync = bytes((size >> s) & 0x7F for s in (21, 14, 7, 0))
        out += b"ID3" + bytes([4, 0, 0]) + sync
        out += bytes(i % 127 for i in range(size))
    for br_idx, pad in frames:
        if not 1 <= br_idx <= 14:
            raise ValueError("bitrate index must be 1..14")
        kbps = _MP3_BITRATE[(vgroup, layer)][br_idx]
        sr = _MP3_SAMPLERATE[vbits][sr_idx]
        if layer == 1:
            flen = (12 * kbps * 1000 // sr + pad) * 4
        elif layer == 2:
            flen = 144 * kbps * 1000 // sr + pad
        else:
            flen = (144 if vgroup == 1 else 72) * kbps * 1000 // sr + pad
        h = (
            (0x7FF << 21) | (vbits << 19) | (lbits << 17) | (1 << 16)
            | (br_idx << 12) | (sr_idx << 10) | (pad << 9)
        )
        out += h.to_bytes(4, "big")
        out += bytes((i * 7 + 13) % 251 for i in range(flen - 4))
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


# ---------------------------------------------------------------------------
# ID3v2 frames (id3.org informal standard) — the audio metadata layer
# ---------------------------------------------------------------------------


def _syncsafe(n: int) -> bytes:
    if n >= 1 << 28:
        raise ValueError("value too large for syncsafe encoding")
    return bytes((n >> s) & 0x7F for s in (21, 14, 7, 0))


def build_id3v2(frames: dict[str, str], padding: int = 0) -> bytes:
    """An ID3v2.4 tag carrying text frames (TIT2/TPE1/TALB/...).
    Pure-ASCII values use encoding 0 (latin-1), anything else UTF-8
    (encoding 3) — so the parser's encoding-byte dispatch is load-
    bearing whenever a title carries an accent."""
    body = bytearray()
    for fid, text in frames.items():
        if len(fid) != 4 or not fid.isalnum():
            raise ValueError(f"bad ID3 frame id {fid!r}")
        if text.isascii():
            payload = b"\x00" + text.encode("latin-1")
        else:
            payload = b"\x03" + text.encode("utf-8")
        body += fid.encode("ascii") + _syncsafe(len(payload)) + b"\x00\x00"
        body += payload
    body += bytes(padding)
    return b"ID3" + bytes([4, 0, 0]) + _syncsafe(len(body)) + bytes(body)


def parse_id3_frames(payload: bytes) -> dict[str, str]:
    """Text frames of a leading ID3v2.3/2.4 tag → {frame_id: text}.

    Handles the encoding byte (0 latin-1, 1/2 UTF-16 with/without BOM,
    3 UTF-8), syncsafe (v2.4) vs plain (v2.3) frame sizes, stops at
    padding.  Raises ValueError when no tag is present or a frame
    overruns the tag."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        raise ValueError("no ID3v2 tag")
    ver = payload[3]
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            raise ValueError("ID3v2 size bytes must be syncsafe")
        size = (size << 7) | b
    end = 10 + size
    if end > len(payload):
        raise ValueError("ID3v2 tag overruns the payload")
    frames: dict[str, str] = {}
    pos = 10
    while pos + 10 <= end:
        if payload[pos] == 0:  # padding
            break
        fid = payload[pos : pos + 4].decode("latin-1")
        raw = payload[pos + 4 : pos + 8]
        if ver >= 4:
            fsize = 0
            for b in raw:
                if b & 0x80:
                    raise ValueError("non-syncsafe v2.4 frame size")
                fsize = (fsize << 7) | b
        else:
            fsize = int.from_bytes(raw, "big")
        body_start = pos + 10
        if body_start + fsize > end:
            raise ValueError(f"ID3 frame {fid} overruns the tag")
        body = payload[body_start : body_start + fsize]
        if fid.startswith("T") and body:
            enc, text = body[0], body[1:]
            if enc == 0:
                frames[fid] = text.rstrip(b"\x00").decode("latin-1")
            elif enc == 3:
                frames[fid] = text.rstrip(b"\x00").decode("utf-8")
            elif enc in (1, 2):
                frames[fid] = text.decode(
                    "utf-16" if enc == 1 else "utf-16-be"
                ).rstrip("\x00")
            else:
                raise ValueError(f"unknown ID3 text encoding {enc}")
        pos = body_start + fsize
    return frames


# ---------------------------------------------------------------------------
# TAR / ZIP shard fan-out (stdlib tarfile/zipfile) — dataset archives
# ---------------------------------------------------------------------------


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """An uncompressed POSIX tar of (name, content) members, with
    zeroed timestamps so the bytes are deterministic."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, content in members:
            info = tarfile.TarInfo(name)
            info.size = len(content)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(content))
    return buf.getvalue()


def build_zip(members: list[tuple[str, bytes]]) -> bytes:
    """A stored (uncompressed) zip of (name, content) members with a
    fixed timestamp — deterministic bytes, central directory intact."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
        for name, content in members:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, content)
    return buf.getvalue()


def list_archive(payload: bytes) -> list[tuple[str, bytes]]:
    """Member (name, content) pairs of a tar or zip shard, in archive
    order — the 1→N fan-out an archive-shipped dataset needs before
    any per-document operator can run.  Format is sniffed (zip: PK
    local-file magic; tar: the ustar magic at offset 257); anything
    else raises ValueError."""
    import io

    if payload[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        import zipfile

        try:
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                return [(i.filename, zf.read(i)) for i in zf.infolist()]
        except zipfile.BadZipFile as exc:
            raise ValueError(f"corrupt zip shard: {exc}") from None
    if len(payload) > 262 and payload[257:262] == b"ustar":
        import tarfile

        try:
            with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
                return [
                    (m.name, tf.extractfile(m).read())
                    for m in tf.getmembers()
                    if m.isfile()
                ]
        except tarfile.TarError as exc:
            raise ValueError(f"corrupt tar shard: {exc}") from None
    raise ValueError("not a tar or zip archive")
