"""EXIF (APP1/TIFF) metadata parsing and GPS stripping — the image
side of PII redaction: photos carry GPS coordinates in EXIF, and a
curation pipeline must detect and REMOVE them without touching the
image data (re-encoding would be lossy and expensive).

Structure (public specs — EXIF 2.x over TIFF 6.0, carried in a JPEG
APP1 segment): ``Exif\\0\\0`` + TIFF header (II/MM byte order, magic
42, IFD0 offset) + linked IFDs of 12-byte entries (tag, type, count,
inline value or offset).  IFD0's tag 0x8769 points to the Exif IFD and
0x8825 to the GPS IFD.

* ``parse_exif_jpeg`` walks the APP1 of a JPEG: byte order,
  orientation, per-IFD tag inventory, GPS coordinates as EXACT
  rational integers (no float degrading of evidence).
* ``strip_gps`` re-serializes the APP1 WITHOUT the GPS IFD and its
  IFD0 pointer; every other byte of the JPEG (all other segments, the
  entropy-coded image data) is preserved verbatim — pinned in tests by
  decoded-pixel equality and tail-bytes identity.
* ``build_exif_jpeg`` synthesizes APP1 segments (both byte orders,
  SHORT/LONG/ASCII/RATIONAL types) for oracle-checked driver queries.

All twelve TIFF 6.0 field types are accepted: ASCII/SHORT/LONG/
RATIONAL decode to python values (the fields curation interprets);
the rest — BYTE, SBYTE, UNDEFINED (ExifVersion, MakerNote), SSHORT,
SLONG, SRATIONAL, FLOAT, DOUBLE — are preserved as raw bytes so a
re-serialize round-trips them exactly without pretending to
interpret them.  ``strip_gps`` also carries the IFD1 (thumbnail)
chain and the Exif-IFD's Interop sub-IFD through the rebuild, with
the thumbnail payload bytes (JPEGInterchangeFormat or strip-based)
re-pointed into the new value heap.
No reference-repo analog (the reference pipeline is tabular-only).
"""

from __future__ import annotations

# TIFF 6.0 field types 1-12: BYTE ASCII SHORT LONG RATIONAL SBYTE
# UNDEFINED SSHORT SLONG SRATIONAL FLOAT DOUBLE (element byte widths)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
              9: 4, 10: 8, 11: 4, 12: 8}

TAG_ORIENTATION = 0x0112
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_INTEROP_IFD = 0xA005
TAG_STRIP_OFFSETS = 0x0111
TAG_STRIP_BYTE_COUNTS = 0x0117
TAG_JPEG_IF = 0x0201          # JPEGInterchangeFormat (thumbnail offset)
TAG_JPEG_IF_LENGTH = 0x0202
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002
TAG_GPS_LON_REF = 0x0003
TAG_GPS_LON = 0x0004


def _find_app1(payload: bytes) -> tuple[int, int] | None:
    """(segment_start, segment_end) of the Exif APP1, or None."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos, n = 2, len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        if marker == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return pos, pos + 2 + seg_len
        if marker == 0xDA:  # entropy data: APP1 must precede it
            return None
        pos += 2 + seg_len
    return None


def _parse_ifd(tiff: bytes, off: int, bo: str) -> tuple[dict, int]:
    """One IFD at ``off`` → ({tag: (type, count, value)}, next_ifd_off).
    Values decode per type: ASCII → str (NUL-trimmed), SHORT/LONG →
    int or tuple, RATIONAL → tuple of (num, den) int pairs."""
    def u(b: bytes) -> int:
        return int.from_bytes(b, "little" if bo == "II" else "big")

    if off + 2 > len(tiff):
        raise ValueError("IFD offset past end of TIFF block")
    count = u(tiff[off : off + 2])
    entries: dict = {}
    p = off + 2
    for _ in range(count):
        if p + 12 > len(tiff):
            raise ValueError("truncated IFD entry")
        tag = u(tiff[p : p + 2])
        typ = u(tiff[p + 2 : p + 4])
        cnt = u(tiff[p + 4 : p + 8])
        if typ not in _TYPE_SIZE:
            raise ValueError(f"unsupported TIFF type {typ} (tag 0x{tag:04x})")
        size = _TYPE_SIZE[typ] * cnt
        if size <= 4:
            data = tiff[p + 8 : p + 8 + size]
        else:
            voff = u(tiff[p + 8 : p + 12])
            if voff + size > len(tiff):
                raise ValueError("TIFF value overruns the block")
            data = tiff[voff : voff + size]
        if typ == 2:
            try:
                value: object = data.rstrip(b"\x00").decode("ascii")
            except UnicodeDecodeError:  # spec-violating text: keep bytes
                value = bytes(data)
        elif typ in (3, 4):
            w = _TYPE_SIZE[typ]
            vals = tuple(u(data[i : i + w]) for i in range(0, size, w))
            value = vals[0] if cnt == 1 else vals
        elif typ == 5:  # RATIONAL
            value = tuple(
                (u(data[i : i + 4]), u(data[i + 4 : i + 8]))
                for i in range(0, size, 8)
            )
        else:  # BYTE/SBYTE/UNDEFINED/S*/FLOAT/DOUBLE: preserve, don't interpret
            value = bytes(data)
        entries[tag] = (typ, cnt, value)
        p += 12
    nxt = u(tiff[p : p + 4]) if p + 4 <= len(tiff) else 0
    return entries, nxt


def _thumbnail_blobs(tiff: bytes, ifd1: dict) -> dict:
    """Thumbnail payload bytes referenced by IFD1's pointer tags:
    ``{TAG_JPEG_IF: bytes}`` and/or ``{TAG_STRIP_OFFSETS: [bytes, ...]}``
    (one blob per strip).  Out-of-range pointers raise."""
    blobs: dict = {}
    if TAG_JPEG_IF in ifd1 and TAG_JPEG_IF_LENGTH in ifd1:
        off = ifd1[TAG_JPEG_IF][2]
        ln = ifd1[TAG_JPEG_IF_LENGTH][2]
        if not isinstance(off, int) or not isinstance(ln, int):
            raise ValueError("non-scalar JPEGInterchangeFormat pointer")
        if off + ln > len(tiff):
            raise ValueError("thumbnail JPEG overruns the TIFF block")
        blobs[TAG_JPEG_IF] = tiff[off : off + ln]
    if TAG_STRIP_OFFSETS in ifd1 and TAG_STRIP_BYTE_COUNTS in ifd1:
        offs = ifd1[TAG_STRIP_OFFSETS][2]
        lens = ifd1[TAG_STRIP_BYTE_COUNTS][2]
        offs = offs if isinstance(offs, tuple) else (offs,)
        lens = lens if isinstance(lens, tuple) else (lens,)
        if len(offs) != len(lens):
            raise ValueError("strip offset/count arity mismatch")
        strips = []
        for off, ln in zip(offs, lens):
            if off + ln > len(tiff):
                raise ValueError("thumbnail strip overruns the TIFF block")
            strips.append(tiff[off : off + ln])
        blobs[TAG_STRIP_OFFSETS] = strips
    return blobs


def parse_exif_jpeg(payload: bytes) -> dict:
    """→ ``{"byte_order", "ifd0", "exif", "gps", "interop", "ifd1",
    "thumbnail"}`` (tag→value dicts; absent IFDs are {}; ``thumbnail``
    maps IFD1 pointer tags to their payload bytes so a rebuild can
    re-point them).  Raises ValueError when no Exif APP1 exists."""
    span = _find_app1(payload)
    if span is None:
        raise ValueError("JPEG without an Exif APP1 segment")
    tiff = payload[span[0] + 10 : span[1]]
    bo = tiff[:2].decode("ascii")
    if bo not in ("II", "MM"):
        raise ValueError(f"bad TIFF byte order {bo!r}")

    def u(b: bytes) -> int:
        return int.from_bytes(b, "little" if bo == "II" else "big")

    if u(tiff[2:4]) != 42:
        raise ValueError("bad TIFF magic")
    ifd0, nxt = _parse_ifd(tiff, u(tiff[4:8]), bo)
    out = {"byte_order": bo, "ifd0": ifd0, "exif": {}, "gps": {},
           "interop": {}, "ifd1": {}, "thumbnail": {}}
    for tag, key in ((TAG_EXIF_IFD, "exif"), (TAG_GPS_IFD, "gps")):
        if tag in ifd0:
            out[key], _ = _parse_ifd(tiff, ifd0[tag][2], bo)
    if TAG_INTEROP_IFD in out["exif"]:
        out["interop"], _ = _parse_ifd(
            tiff, out["exif"][TAG_INTEROP_IFD][2], bo
        )
    if nxt:
        out["ifd1"], _ = _parse_ifd(tiff, nxt, bo)
        out["thumbnail"] = _thumbnail_blobs(tiff, out["ifd1"])
    return out


def _serialize_tiff(
    bo: str, ifds: list[dict], links: list[int | None] | None = None
) -> bytes:
    """TIFF block from IFD dicts (ifds[0] = IFD0; pointer tags inside
    any IFD must already reference ifds positions via the sentinel
    value ("ifd", i)).  ``links[i]`` names the ifds index table ``i``'s
    next-IFD pointer references (None → end of chain) — how IFD1
    (thumbnail) survives a rebuild.  Values may also be raw ``bytes``
    (uninterpreted types, emitted verbatim), ``("blob", data)`` (data
    goes to the heap, the entry's value is its offset — the
    JPEGInterchangeFormat thumbnail), or ``("blobs", [data, ...])``
    (one heap placement per element, the entry's values are the
    offsets — strip-based thumbnails)."""
    le = bo == "II"

    def pack(v: int, n: int) -> bytes:
        return v.to_bytes(n, "little" if le else "big")

    header = bo.encode() + pack(42, 2) + pack(8, 4)
    # layout: header | IFD tables | value heap
    table_sizes = [2 + 12 * len(ifd) + 4 for ifd in ifds]
    ifd_offs = []
    off = 8
    for tsz in table_sizes:
        ifd_offs.append(off)
        off += tsz
    heap = bytearray()
    heap_base = off

    def encode_value(typ: int, value) -> bytes:
        if isinstance(value, bytes):
            return value
        if typ == 2:
            return value.encode("ascii") + b"\x00"
        if typ in (3, 4):
            vals = value if isinstance(value, tuple) else (value,)
            return b"".join(pack(v, _TYPE_SIZE[typ]) for v in vals)
        return b"".join(pack(n, 4) + pack(d, 4) for n, d in value)

    def place(data: bytes) -> int:
        heap.extend(data)
        return heap_base + len(heap) - len(data)

    tables = []
    for i, ifd in enumerate(ifds):
        table = bytearray(pack(len(ifd), 2))
        for tag in sorted(ifd):
            typ, cnt, value = ifd[tag]
            if isinstance(value, tuple) and len(value) == 2 and value[0] == "ifd":
                data = pack(ifd_offs[value[1]], 4)
            elif isinstance(value, tuple) and len(value) == 2 \
                    and value[0] == "blob":
                data = pack(place(value[1]), 4)
            elif isinstance(value, tuple) and len(value) == 2 \
                    and value[0] == "blobs":
                data = b"".join(
                    pack(place(b), _TYPE_SIZE[typ]) for b in value[1]
                )
            else:
                data = encode_value(typ, value)
            if typ == 2 and isinstance(value, str):
                # parse rstripped NUL padding from ASCII text, so the
                # original cnt can exceed the re-encoded length
                # (multi-string or padded tags) — recompute so the
                # declared count never overruns the emitted bytes
                cnt = len(data)
            table += pack(tag, 2) + pack(typ, 2) + pack(cnt, 4)
            if len(data) <= 4:
                table += data.ljust(4, b"\x00")
            else:
                table += pack(place(data), 4)
        nxt = links[i] if links is not None else None
        table += pack(ifd_offs[nxt] if nxt is not None else 0, 4)
        tables.append(bytes(table))
    return header + b"".join(tables) + bytes(heap)


def build_exif_jpeg(
    jpeg: bytes,
    byte_order: str = "II",
    orientation: int = 1,
    gps: tuple | None = None,
    datetime_original: str = "2026:01:01 00:00:00",
    exif_version: bytes | None = None,
    thumbnail: bytes | None = None,
) -> bytes:
    """Insert an Exif APP1 right after SOI.  ``gps`` is
    ((lat_d, lat_m, lat_s), "N"|"S", (lon_d, lon_m, lon_s), "E"|"W")
    with integer degree/minute/second numerators over denominator 1.
    ``exif_version`` (e.g. b"0232") adds the type-7 UNDEFINED
    ExifVersion tag plus a type-1 BYTE GPSVersionID — what real camera
    APP1s always carry; ``thumbnail`` adds an IFD1 with the bytes as a
    JPEGInterchangeFormat payload."""
    ifd0 = {
        TAG_ORIENTATION: (3, 1, orientation),
        TAG_EXIF_IFD: (4, 1, ("ifd", 1)),
    }
    exif_ifd = {0x9003: (2, len(datetime_original) + 1, datetime_original)}
    if exif_version is not None:
        exif_ifd[0x9000] = (7, len(exif_version), exif_version)
    ifds = [ifd0, exif_ifd]
    links: list[int | None] = [None, None]
    if gps is not None:
        (lat, lat_ref, lon, lon_ref) = gps
        ifd0[TAG_GPS_IFD] = (4, 1, ("ifd", 2))
        gps_ifd = {
            TAG_GPS_LAT_REF: (2, 2, lat_ref),
            TAG_GPS_LAT: (5, 3, tuple((v, 1) for v in lat)),
            TAG_GPS_LON_REF: (2, 2, lon_ref),
            TAG_GPS_LON: (5, 3, tuple((v, 1) for v in lon)),
        }
        if exif_version is not None:
            gps_ifd[0x0000] = (1, 4, b"\x02\x03\x00\x00")
        ifds.append(gps_ifd)
        links.append(None)
    if thumbnail is not None:
        ifd1 = {
            TAG_JPEG_IF: (4, 1, ("blob", thumbnail)),
            TAG_JPEG_IF_LENGTH: (4, 1, len(thumbnail)),
        }
        links[0] = len(ifds)
        ifds.append(ifd1)
        links.append(None)
    tiff = _serialize_tiff(byte_order, ifds, links)
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    return jpeg[:2] + app1 + jpeg[2:]


def apply_orientation(img, orientation: int):
    """Stored pixel array → upright display array per the EXIF/TIFF
    orientation tag (the transform PIL's ``exif_transpose`` applies):

    1 normal · 2 mirror-horizontal · 3 rotate-180 · 4 mirror-vertical ·
    5 transpose · 6 rotate-90-CW · 7 transverse · 8 rotate-90-CCW.

    Works on (H, W) and (H, W, C) arrays (transforms act on the first
    two axes only).  A pipeline that fingerprints images WITHOUT this
    normalization silently splits near-dup pairs whose copies were
    stored at different rotations.  Unknown tags raise."""
    import numpy as np

    if orientation == 1:
        return img
    if orientation == 2:
        return img[:, ::-1]
    if orientation == 3:
        return img[::-1, ::-1]
    if orientation == 4:
        return img[::-1, :]
    if orientation == 5:
        return img.swapaxes(0, 1)
    if orientation == 6:
        return np.rot90(img, -1, axes=(0, 1))
    if orientation == 7:
        return img.swapaxes(0, 1)[::-1, ::-1]
    if orientation == 8:
        return np.rot90(img, 1, axes=(0, 1))
    raise ValueError(f"unknown EXIF orientation {orientation}")


def store_with_orientation(img, orientation: int):
    """Inverse of ``apply_orientation``: the stored array for which
    ``apply_orientation(stored, orientation)`` returns ``img`` exactly —
    the synthesis side of orientation round-trip tests and fixtures.
    Flips, rotate-180, transpose, and transverse are self-inverse; the
    two quarter-rotations invert each other."""
    _INVERSE = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    return apply_orientation(img, _INVERSE[orientation])


def strip_gps(payload: bytes) -> bytes:
    """Remove the GPS IFD (and its IFD0 pointer) from a JPEG's Exif.
    Every byte OUTSIDE the APP1 segment is preserved verbatim — the
    image data is never re-encoded; within the APP1 the TIFF block is
    re-serialized (normalized layout) carrying the Exif IFD, its
    Interop sub-IFD, and the IFD1 thumbnail (including its JPEG /
    strip payload bytes, re-pointed into the new heap).  JPEGs without
    GPS return unchanged; JPEGs without an APP1 return unchanged too
    (nothing to strip)."""
    span = _find_app1(payload)
    if span is None:
        return payload
    meta = parse_exif_jpeg(payload)
    if not meta["gps"]:
        return payload
    ifd0 = dict(meta["ifd0"])
    del ifd0[TAG_GPS_IFD]
    ifds: list[dict] = [ifd0]
    links: list[int | None] = [None]
    if TAG_EXIF_IFD in ifd0:
        exif_ifd = dict(meta["exif"])
        typ, cnt, _ = ifd0[TAG_EXIF_IFD]
        ifd0[TAG_EXIF_IFD] = (typ, cnt, ("ifd", len(ifds)))
        ifds.append(exif_ifd)
        links.append(None)
        if TAG_INTEROP_IFD in exif_ifd:
            ityp, icnt, _ = exif_ifd[TAG_INTEROP_IFD]
            exif_ifd[TAG_INTEROP_IFD] = (ityp, icnt, ("ifd", len(ifds)))
            ifds.append(dict(meta["interop"]))
            links.append(None)
    if meta["ifd1"]:
        ifd1 = dict(meta["ifd1"])
        # pointer tags whose payload _thumbnail_blobs could NOT capture
        # (JPEGInterchangeFormat without 0x0202, StripOffsets without
        # StripByteCounts) would re-emit numeric offsets into the OLD
        # TIFF layout — drop the dangling pointer and its companion
        if TAG_JPEG_IF in ifd1 and TAG_JPEG_IF not in meta["thumbnail"]:
            ifd1.pop(TAG_JPEG_IF, None)
            ifd1.pop(TAG_JPEG_IF_LENGTH, None)
        if TAG_STRIP_OFFSETS in ifd1 \
                and TAG_STRIP_OFFSETS not in meta["thumbnail"]:
            ifd1.pop(TAG_STRIP_OFFSETS, None)
            ifd1.pop(TAG_STRIP_BYTE_COUNTS, None)
        for tag, blob in meta["thumbnail"].items():
            btyp, bcnt, _ = ifd1[tag]
            sentinel = ("blobs", blob) if isinstance(blob, list) \
                else ("blob", blob)
            ifd1[tag] = (btyp, bcnt, sentinel)
        links[0] = len(ifds)
        ifds.append(ifd1)
        links.append(None)
    tiff = _serialize_tiff(meta["byte_order"], ifds, links)
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    return payload[: span[0]] + app1 + payload[span[1] :]
