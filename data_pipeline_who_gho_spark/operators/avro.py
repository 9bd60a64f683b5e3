"""Avro Object Container File reader (and the matching writer used to
synthesize fixtures) — pure stdlib, following the public Apache Avro
1.11 specification (container format + binary encoding).

Why hand-rolled: this environment ships Spark WITHOUT the external
``spark-avro`` module jar, so ``spark.read.format("avro")`` is
unavailable; the Spark-idiomatic fallback for a format the built-in
readers lack is exactly what the multimodal stack does — binary
payloads decoded in an Arrow-batched ``mapInPandas`` pass.  The
decoder here is the real wire format: zigzag-varint primitives, the
container magic/metadata/sync-marker framing, null and deflate codecs,
and the schema-driven walk for records, arrays, maps, null-unions,
and — r12 — enums (zigzag-varint symbol index), fixed (raw ``size``
bytes), and NAMED-TYPE REFERENCES (a declared record/enum/fixed name
reused as a type, spec "Names" — the registry is threaded through
the walk in declaration order, which also makes recursive record
schemas work: a linked-list/tree schema encodes and decodes through
its null-union terminators), so arrays-of-records / map-of-record
values nest freely.

r13 adds the SNAPPY block codec (the de-facto production default)
via the pure-stdlib raw-format codec in ``snappy.py``, with the
4-byte big-endian CRC32-of-uncompressed trailer the Avro spec
requires per block; unqualified named-type references now resolve in
the CURRENT namespace first (spec "Names"), so colliding short names
across namespaces pick the enclosing declaration (ADVICE r12).

r13 also implements SCHEMA RESOLUTION (spec "Schema Resolution"):
``read_avro(payload, reader_schema=...)`` projects writer records
onto a different reader schema — fields matched by name, writer-only
fields dropped, reader-only fields filled from their ``default``
(an error without one), the numeric promotions int->long/float/
double, long->float/double, float->double, string<->bytes both ways,
and recursive resolution through records/arrays/maps/null-unions;
an enum symbol absent from the reader resolves to the reader's
enum ``default`` (an error without one).

Field ALIASES resolve too (a renamed reader
field matches the writer under its listed old names).

Honest boundary (same contract as the other codecs): the zstandard
codec (no stdlib binding) and named-TYPE aliases stay out.

No reference-repo analog (the reference ingests a JSON HTTP API only).
"""

from __future__ import annotations

import json
import struct
import zlib

from . import snappy as _snappy

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary encoding primitives (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def write_long(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    z &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("Avro payload truncated")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        z = 0
        shift = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("Avro varint truncated")
            b = self.data[self.pos]
            self.pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("Avro varint too long")
        return (z >> 1) ^ -(z & 1)

    def string(self) -> str:
        return self.read(self.long()).decode("utf-8")

    def bytes_(self) -> bytes:
        return self.read(self.long())


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "string", "bytes"}
_COMPLEX = {"record", "array", "map", "enum", "fixed"}


def _register_name(schema, names, ns):
    """Record/enum/fixed declarations enter the name registry (spec
    "Names") under their FULL name (namespace-qualified when an
    effective namespace exists, bare otherwise); nested declarations
    INHERIT the enclosing namespace unless they declare their own.
    Registered BEFORE walking record fields so recursive schemas
    resolve.  Returns the effective namespace for the declaration's
    children.  (Registering a namespaced declaration under its short
    name too let a later same-short-name declaration in another
    namespace hijack unqualified references — ADVICE r12.)"""
    if isinstance(schema, dict):
        ns = schema.get("namespace", ns)
        if schema.get("type") in ("record", "enum", "fixed") \
                and "name" in schema:
            name = schema["name"]
            names[f"{ns}.{name}" if ns else name] = schema
    return ns


def _resolve_name(t, names, ns):
    """Spec "Names" resolution for a type reference: a dotted name is
    absolute; an unqualified name resolves in the CURRENT (enclosing)
    namespace first, falling back to the null namespace."""
    if "." in t:
        return names.get(t)
    if ns:
        ref = names.get(f"{ns}.{t}")
        if ref is not None:
            return ref
    return names.get(t)


def _encode_value(schema, value, names=None, ns=None) -> bytes:
    if names is None:
        names = {}
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, list):  # union
        for i, branch in enumerate(t):
            bt = branch["type"] if isinstance(branch, dict) else branch
            if (value is None) == (bt == "null"):
                return write_long(i) + _encode_value(
                    branch, value, names, ns
                )
        raise ValueError("no union branch matched")
    if isinstance(t, str) and t not in _PRIMITIVES and t not in _COMPLEX:
        ref = _resolve_name(t, names, ns)
        if ref:  # named-type reference (current-namespace-first)
            return _encode_value(ref, value, names, ns)
        raise NotImplementedError(f"Avro type {t!r} not implemented")
    ns = _register_name(schema, names, ns)
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return write_long(int(value))
    if t == "float":
        return struct.pack("<f", value)
    if t == "double":
        return struct.pack("<d", value)
    if t == "string":
        data = str(value).encode("utf-8")
        return write_long(len(data)) + data
    if t == "bytes":
        return write_long(len(value)) + bytes(value)
    if t == "record":
        return b"".join(
            _encode_value(f["type"], value[f["name"]], names, ns)
            for f in schema["fields"]
        )
    if t == "array":
        out = b""
        if value:
            out += write_long(len(value))
            out += b"".join(
                _encode_value(schema["items"], v, names, ns)
                for v in value
            )
        return out + write_long(0)
    if t == "map":
        out = b""
        if value:
            out += write_long(len(value))
            for k, v in value.items():
                kd = k.encode("utf-8")
                out += write_long(len(kd)) + kd
                out += _encode_value(schema["values"], v, names, ns)
        return out + write_long(0)
    if t == "enum":
        symbols = schema["symbols"]
        if value not in symbols:
            raise ValueError(f"enum value {value!r} not in symbols")
        return write_long(symbols.index(value))
    if t == "fixed":
        size = schema["size"]
        if len(value) != size:
            raise ValueError(f"fixed value must be exactly {size} bytes")
        return bytes(value)
    raise NotImplementedError(f"Avro type {t!r} not implemented")


def _decode_value(schema, r: _Reader, names=None, ns=None):
    if names is None:
        names = {}
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, list):  # union
        idx = r.long()
        if not 0 <= idx < len(t):
            raise ValueError("union branch index out of range")
        return _decode_value(t[idx], r, names, ns)
    if isinstance(t, str) and t not in _PRIMITIVES and t not in _COMPLEX:
        ref = _resolve_name(t, names, ns)
        if ref:  # named-type reference (current-namespace-first)
            return _decode_value(ref, r, names, ns)
        raise NotImplementedError(f"Avro type {t!r} not implemented")
    ns = _register_name(schema, names, ns)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "string":
        return r.string()
    if t == "bytes":
        return r.bytes_()
    if t == "record":
        return {
            f["name"]: _decode_value(f["type"], r, names, ns)
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix (spec-legal)
                r.long()
                n = -n
            out.extend(
                _decode_value(schema["items"], r, names, ns)
                for _ in range(n)
            )
        return out
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                r.long()
                n = -n
            for _ in range(n):
                k = r.string()
                out[k] = _decode_value(schema["values"], r, names, ns)
        return out
    if t == "enum":
        idx = r.long()
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise ValueError(f"enum index {idx} out of range")
        return symbols[idx]
    if t == "fixed":
        return r.read(schema["size"])
    raise NotImplementedError(f"Avro type {t!r} not implemented")


# ---------------------------------------------------------------------------
# object container file framing
# ---------------------------------------------------------------------------


def build_avro(
    schema: dict,
    records: list[dict],
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
    block_records: int = 64,
) -> bytes:
    """An Avro Object Container File: magic, metadata map
    (avro.schema + avro.codec), 16-byte sync marker, then blocks of
    ``block_records`` records each (count, byte length, payload,
    sync)."""
    if codec not in ("null", "deflate", "snappy"):
        raise NotImplementedError(f"codec {codec!r} not implemented")
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    meta = {
        "avro.schema": json.dumps(schema, sort_keys=True).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(_MAGIC)
    out += write_long(len(meta))
    for k, v in sorted(meta.items()):
        kd = k.encode()
        out += write_long(len(kd)) + kd + write_long(len(v)) + v
    out += write_long(0)
    out += sync
    for i in range(0, len(records), block_records):
        chunk = records[i:i + block_records]
        payload = b"".join(_encode_value(schema, rec) for rec in chunk)
        if codec == "deflate":
            # spec: raw deflate, no zlib header/checksum
            payload = zlib.compress(payload, 9)[2:-4]
        elif codec == "snappy":
            # spec: snappy block + 4-byte BIG-ENDIAN CRC32 of the
            # UNCOMPRESSED data
            payload = _snappy.compress(payload) + struct.pack(
                ">I", zlib.crc32(payload) & 0xFFFFFFFF
            )
        out += write_long(len(chunk)) + write_long(len(payload))
        out += payload + sync
    return bytes(out)


def _resolve_value(writer, reader, value, names_w=None, names_r=None):
    """Spec "Schema Resolution": project a value decoded under the
    WRITER schema onto the READER schema.  Operates on decoded values
    (wire-equivalent to streaming resolution: the writer walk already
    consumed the bytes); promotions widen, never narrow."""
    if names_w is None:
        names_w = {}
    if names_r is None:
        names_r = {}
    wt = writer["type"] if isinstance(writer, dict) else writer
    rt = reader["type"] if isinstance(reader, dict) else reader
    # unwrap unions on either side: pick the branch matching the value
    if isinstance(wt, list):
        branch = next(
            b for b in wt
            if (value is None)
            == ((b["type"] if isinstance(b, dict) else b) == "null")
        )
        return _resolve_value(branch, reader, value, names_w, names_r)
    if isinstance(rt, list):
        for b in rt:
            bt = b["type"] if isinstance(b, dict) else b
            if (value is None) == (bt == "null"):
                return _resolve_value(writer, b, value, names_w, names_r)
        raise ValueError("no reader union branch accepts the value")
    if isinstance(wt, str) and wt not in _PRIMITIVES and wt not in _COMPLEX:
        writer = _resolve_name(wt, names_w, None)
        if writer is None:
            raise ValueError(f"unresolved writer type {wt!r}")
        return _resolve_value(writer, reader, value, names_w, names_r)
    if isinstance(rt, str) and rt not in _PRIMITIVES and rt not in _COMPLEX:
        reader = _resolve_name(rt, names_r, None)
        if reader is None:
            raise ValueError(f"unresolved reader type {rt!r}")
        return _resolve_value(writer, reader, value, names_w, names_r)
    _register_name(writer, names_w, None)
    _register_name(reader, names_r, None)
    wt = writer["type"] if isinstance(writer, dict) else writer
    rt = reader["type"] if isinstance(reader, dict) else reader
    _PROMOTE = {
        ("int", "long"), ("int", "float"), ("int", "double"),
        ("long", "float"), ("long", "double"), ("float", "double"),
        ("string", "bytes"), ("bytes", "string"),
    }
    if wt in _PRIMITIVES and rt in _PRIMITIVES:
        if wt == rt:
            return value
        if (wt, rt) not in _PROMOTE:
            raise ValueError(f"cannot promote {wt} to {rt}")
        if rt in ("float", "double"):
            return float(value)
        if rt == "long":
            return int(value)
        if rt == "bytes":
            return value.encode("utf-8")
        return value.decode("utf-8")          # bytes -> string
    if wt == "record" and rt == "record":
        wfields = {f["name"]: f for f in writer["fields"]}
        out = {}
        for rf in reader["fields"]:
            name = rf["name"]
            # field ALIASES (spec "Aliases"): a renamed reader field
            # matches the writer under any of its listed old names
            wname = name if name in wfields else next(
                (a for a in rf.get("aliases", ()) if a in wfields), None
            )
            if wname is not None:
                out[name] = _resolve_value(
                    wfields[wname]["type"], rf["type"], value[wname],
                    names_w, names_r,
                )
            elif "default" in rf:
                out[name] = rf["default"]
            else:
                raise ValueError(
                    f"reader field {name!r} absent from writer and has "
                    "no default"
                )
        return out                             # writer-only fields drop
    if wt == "enum" and rt == "enum":
        if value in reader["symbols"]:
            return value
        if "default" in reader:
            return reader["default"]
        raise ValueError(
            f"enum symbol {value!r} not in reader and no default"
        )
    if wt == "fixed" and rt == "fixed":
        if writer.get("size") != reader.get("size"):
            raise ValueError("fixed size mismatch")
        return value
    if wt == "array" and rt == "array":
        return [
            _resolve_value(writer["items"], reader["items"], v,
                           names_w, names_r)
            for v in value
        ]
    if wt == "map" and rt == "map":
        return {
            k: _resolve_value(writer["values"], reader["values"], v,
                              names_w, names_r)
            for k, v in value.items()
        }
    raise ValueError(f"cannot resolve writer {wt} against reader {rt}")


def read_avro(payload: bytes, reader_schema: dict | None = None) -> dict:
    """→ ``{"schema", "codec", "records", "n_blocks"}`` from an Avro
    Object Container File.  With ``reader_schema``, every record is
    resolved onto it per the spec's Schema Resolution rules (name
    matching, defaults, promotions) and ``schema`` is the reader's."""
    r = _Reader(payload)
    if r.read(4) != _MAGIC:
        raise ValueError("not an Avro container: bad magic")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            r.long()
            n = -n
        for _ in range(n):
            k = r.string()
            meta[k] = r.bytes_()
    if "avro.schema" not in meta:
        raise ValueError("Avro container without avro.schema metadata")
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate", "snappy"):
        raise NotImplementedError(f"codec {codec!r} not implemented")
    sync = r.read(16)
    records = []
    n_blocks = 0
    while r.pos < len(r.data):
        count = r.long()
        size = r.long()
        if count < 0 or size < 0:
            raise ValueError("negative block header")
        data = r.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        elif codec == "snappy":
            if len(data) < 4:
                raise ValueError("snappy block shorter than its CRC")
            data, crc = data[:-4], struct.unpack(">I", data[-4:])[0]
            data = _snappy.decompress(data)
            if zlib.crc32(data) & 0xFFFFFFFF != crc:
                raise ValueError("snappy block CRC mismatch")
        br = _Reader(data)
        for _ in range(count):
            records.append(_decode_value(schema, br))
        if br.pos != len(data):
            raise ValueError("Avro block has trailing bytes")
        if r.read(16) != sync:
            raise ValueError("Avro sync marker mismatch")
        n_blocks += 1
    if reader_schema is not None:
        records = [
            _resolve_value(schema, reader_schema, rec) for rec in records
        ]
        schema = reader_schema
    return {
        "schema": schema,
        "codec": codec,
        "records": records,
        "n_blocks": n_blocks,
    }
