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

Supported types: 2 (ASCII), 3 (SHORT), 4 (LONG), 5 (RATIONAL) — the
ones EXIF metadata actually uses for the fields curation reads.
No reference-repo analog (the reference pipeline is tabular-only).
"""

from __future__ import annotations

_TYPE_SIZE = {2: 1, 3: 2, 4: 4, 5: 8}

TAG_ORIENTATION = 0x0112
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
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
            value: object = data.rstrip(b"\x00").decode("ascii")
        elif typ in (3, 4):
            w = _TYPE_SIZE[typ]
            vals = tuple(u(data[i : i + w]) for i in range(0, size, w))
            value = vals[0] if cnt == 1 else vals
        else:  # RATIONAL
            value = tuple(
                (u(data[i : i + 4]), u(data[i + 4 : i + 8]))
                for i in range(0, size, 8)
            )
        entries[tag] = (typ, cnt, value)
        p += 12
    nxt = u(tiff[p : p + 4]) if p + 4 <= len(tiff) else 0
    return entries, nxt


def parse_exif_jpeg(payload: bytes) -> dict:
    """→ ``{"byte_order", "ifd0", "exif", "gps"}`` (tag→value dicts;
    absent IFDs are {}).  Raises ValueError when no Exif APP1 exists."""
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
    ifd0, _ = _parse_ifd(tiff, u(tiff[4:8]), bo)
    out = {"byte_order": bo, "ifd0": ifd0, "exif": {}, "gps": {}}
    for tag, key in ((TAG_EXIF_IFD, "exif"), (TAG_GPS_IFD, "gps")):
        if tag in ifd0:
            out[key], _ = _parse_ifd(tiff, ifd0[tag][2], bo)
    return out


def _serialize_tiff(bo: str, ifds: list[dict]) -> bytes:
    """TIFF block from chained IFD dicts (ifds[0] = IFD0; pointer tags
    inside it must already reference ifds positions 1.. via the
    sentinel value ("ifd", i))."""
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
        if typ == 2:
            return value.encode("ascii") + b"\x00"
        if typ in (3, 4):
            vals = value if isinstance(value, tuple) else (value,)
            return b"".join(pack(v, _TYPE_SIZE[typ]) for v in vals)
        return b"".join(pack(n, 4) + pack(d, 4) for n, d in value)

    tables = []
    for ifd in ifds:
        table = bytearray(pack(len(ifd), 2))
        for tag in sorted(ifd):
            typ, cnt, value = ifd[tag]
            if isinstance(value, tuple) and len(value) == 2 and value[0] == "ifd":
                data = pack(ifd_offs[value[1]], 4)
            else:
                data = encode_value(typ, value)
            table += pack(tag, 2) + pack(typ, 2) + pack(cnt, 4)
            if len(data) <= 4:
                table += data.ljust(4, b"\x00")
            else:
                table += pack(heap_base + len(heap), 4)
                heap += data
        table += pack(0, 4)  # no next IFD
        tables.append(bytes(table))
    return header + b"".join(tables) + bytes(heap)


def build_exif_jpeg(
    jpeg: bytes,
    byte_order: str = "II",
    orientation: int = 1,
    gps: tuple | None = None,
    datetime_original: str = "2026:01:01 00:00:00",
) -> bytes:
    """Insert an Exif APP1 right after SOI.  ``gps`` is
    ((lat_d, lat_m, lat_s), "N"|"S", (lon_d, lon_m, lon_s), "E"|"W")
    with integer degree/minute/second numerators over denominator 1."""
    ifd0 = {
        TAG_ORIENTATION: (3, 1, orientation),
        TAG_EXIF_IFD: (4, 1, ("ifd", 1)),
    }
    exif_ifd = {0x9003: (2, len(datetime_original) + 1, datetime_original)}
    ifds = [ifd0, exif_ifd]
    if gps is not None:
        (lat, lat_ref, lon, lon_ref) = gps
        ifd0[TAG_GPS_IFD] = (4, 1, ("ifd", 2))
        ifds.append({
            TAG_GPS_LAT_REF: (2, 2, lat_ref),
            TAG_GPS_LAT: (5, 3, tuple((v, 1) for v in lat)),
            TAG_GPS_LON_REF: (2, 2, lon_ref),
            TAG_GPS_LON: (5, 3, tuple((v, 1) for v in lon)),
        })
    tiff = _serialize_tiff(byte_order, ifds)
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    return jpeg[:2] + app1 + jpeg[2:]


def strip_gps(payload: bytes) -> bytes:
    """Remove the GPS IFD (and its IFD0 pointer) from a JPEG's Exif,
    leaving EVERY other byte of the file intact — the image data is
    never re-encoded.  JPEGs without GPS return unchanged; JPEGs
    without an APP1 return unchanged too (nothing to strip)."""
    span = _find_app1(payload)
    if span is None:
        return payload
    meta = parse_exif_jpeg(payload)
    if not meta["gps"]:
        return payload
    ifd0 = dict(meta["ifd0"])
    del ifd0[TAG_GPS_IFD]
    ifds = [ifd0]
    if TAG_EXIF_IFD in ifd0:
        ifd0[TAG_EXIF_IFD] = (4, 1, ("ifd", 1))
        ifds.append(meta["exif"])
    tiff = _serialize_tiff(meta["byte_order"], ifds)
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    return payload[: span[0]] + app1 + payload[span[1] :]
