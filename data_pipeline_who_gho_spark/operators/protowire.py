"""Pure-stdlib Protocol Buffers WIRE-FORMAT codec (proto3 binary
encoding, per the public encoding spec at protobuf.dev/programming-
guides/encoding): base-128 varints, ZigZag for ``sint*``, the four
live wire types (VARINT=0, I64=1, LEN=2, I32=5), length-delimited
strings/bytes/nested messages, repeated fields in both expanded and
PACKED form, and unknown-field skipping by wire type — the same
"vendor the ~150-line byte walk" pattern as ``avro.py``/``snappy.py``
(r12 VERDICT task 8: protobuf was the one remaining env-gated format).

Schema model: a message schema is ``{field_number: (name, type)}``
with types ``int``, ``sint``, ``bool``, ``fixed32``, ``fixed64``,
``string``, ``bytes``, ``packed_int``, ``("message", subschema)``,
``("repeated_message", subschema)``.  Deliberately NOT a .proto
parser — the schemas this engine meets are declared in code, like the
Avro fixtures declare theirs as dicts.

Honest boundary: groups (deprecated wire types 3/4), float/double
fields (IEEE payloads are out of the integer-exact oracle surface,
same boundary as the codec family), and .proto-text parsing raise
``NotImplementedError``/``ValueError`` loudly.

No reference-repo analog (the reference ingests a JSON HTTP API only,
``etl/extract.py:30-153``).
"""

from __future__ import annotations

import struct

_VARINT_TYPES = {"int", "sint", "bool", "packed_int"}


def write_varint(n: int) -> bytes:
    if n < 0:
        # proto3: negative int32/int64 values occupy the full 10-byte
        # two's-complement varint
        n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("protobuf: truncated varint")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 63:
            raise ValueError("protobuf: varint longer than 10 bytes")


def zigzag(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1)


def unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def _tag(field: int, wire: int) -> bytes:
    return write_varint((field << 3) | wire)


def encode_message(schema: dict, msg: dict) -> bytes:
    """Serialize ``msg`` (name -> value) under ``schema`` in ascending
    field-number order (the canonical layout encoders emit)."""
    out = bytearray()
    known = {name for name, _t in schema.values()}
    for name in msg:
        if name not in known:
            raise ValueError(f"field {name!r} not in schema")
    for num in sorted(schema):
        name, t = schema[num]
        if name not in msg:
            continue                      # proto3: absent = default
        value = msg[name]
        if t == "int" or t == "bool":
            out += _tag(num, 0) + write_varint(int(value))
        elif t == "sint":
            out += _tag(num, 0) + write_varint(zigzag(int(value)))
        elif t == "fixed32":
            out += _tag(num, 5) + struct.pack("<I", value)
        elif t == "fixed64":
            out += _tag(num, 1) + struct.pack("<Q", value)
        elif t == "string":
            raw = value.encode("utf-8")
            out += _tag(num, 2) + write_varint(len(raw)) + raw
        elif t == "bytes":
            out += _tag(num, 2) + write_varint(len(value)) + value
        elif t == "packed_int":
            body = b"".join(write_varint(int(v)) for v in value)
            out += _tag(num, 2) + write_varint(len(body)) + body
        elif isinstance(t, tuple) and t[0] == "message":
            body = encode_message(t[1], value)
            out += _tag(num, 2) + write_varint(len(body)) + body
        elif isinstance(t, tuple) and t[0] == "repeated_message":
            for item in value:
                body = encode_message(t[1], item)
                out += _tag(num, 2) + write_varint(len(body)) + body
        elif t in ("float", "double"):
            raise NotImplementedError(
                "float/double fields are outside the integer-exact "
                "surface (same boundary as the codec family)"
            )
        else:
            raise ValueError(f"unknown schema type {t!r}")
    return bytes(out)


def _skip_field(data: bytes, pos: int, wire: int) -> int:
    """Skip an unknown field's payload — the forward-compatibility
    behavior every conformant decoder implements."""
    if wire == 0:
        _v, pos = read_varint(data, pos)
        return pos
    if wire == 1:
        return pos + 8
    if wire == 5:
        return pos + 4
    if wire == 2:
        n, pos = read_varint(data, pos)
        return pos + n
    if wire in (3, 4):
        raise NotImplementedError(
            "group wire types (3/4) are deprecated and not implemented"
        )
    raise ValueError(f"protobuf: reserved wire type {wire}")


def decode_message(schema: dict, data: bytes) -> dict:
    """Parse ``data`` under ``schema``; unknown field numbers are
    skipped by wire type, repeated/packed fields accumulate, and a
    payload overrunning the buffer is a loud ValueError."""
    out: dict = {}
    pos = 0
    n = len(data)
    while pos < n:
        key, pos = read_varint(data, pos)
        num, wire = key >> 3, key & 7
        if num not in schema:
            pos = _skip_field(data, pos, wire)
            if pos > n:
                raise ValueError("protobuf: unknown field overruns buffer")
            continue
        name, t = schema[num]
        if t in ("int", "bool", "sint"):
            if wire != 0:
                raise ValueError(f"field {name}: expected varint wire")
            v, pos = read_varint(data, pos)
            out[name] = unzigzag(v) if t == "sint" else (
                bool(v) if t == "bool" else v
            )
        elif t == "fixed32":
            if wire != 5 or pos + 4 > n:
                raise ValueError(f"field {name}: bad fixed32")
            out[name] = struct.unpack("<I", data[pos:pos + 4])[0]
            pos += 4
        elif t == "fixed64":
            if wire != 1 or pos + 8 > n:
                raise ValueError(f"field {name}: bad fixed64")
            out[name] = struct.unpack("<Q", data[pos:pos + 8])[0]
            pos += 8
        elif t in ("string", "bytes") or isinstance(t, tuple) \
                or t == "packed_int":
            if wire != 2:
                raise ValueError(f"field {name}: expected LEN wire")
            ln, pos = read_varint(data, pos)
            if pos + ln > n:
                raise ValueError(f"field {name}: payload overruns buffer")
            raw = data[pos:pos + ln]
            pos += ln
            if t == "string":
                out[name] = raw.decode("utf-8")
            elif t == "bytes":
                out[name] = raw
            elif t == "packed_int":
                vals = []
                p = 0
                while p < ln:
                    v, p = read_varint(raw, p)
                    vals.append(v)
                out.setdefault(name, []).extend(vals)
            elif t[0] == "message":
                out[name] = decode_message(t[1], raw)
            else:                          # repeated_message
                out.setdefault(name, []).append(
                    decode_message(t[1], raw)
                )
        else:
            raise ValueError(f"unknown schema type {t!r}")
    return out
