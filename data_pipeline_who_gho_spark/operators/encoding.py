"""Encoding repair for web-crawl text: the ftfy-style fix for the
single most common corruption, UTF-8 bytes read as Latin-1/Windows-1252
("cafÃ©" for "café" — every non-ASCII char doubles into
its byte pair).  A curation pipeline runs this before tokenization:
mojibake inflates char and token counts and splits identical documents
into distinct dedup keys.

Pure functions (no Spark imports) so they drop into any pandas UDF;
exactness matters — repair must be the EXACT inverse of the corruption
(pinned by md5 parity in the driver query), never a lossy guess.

Public knowledge only: the UTF-8 / ISO-8859-1 / CP1252 tables are
IETF/ISO specs; the repair idiom (re-encode with the wrong codec,
re-decode with the right one) is the standard ftfy approach.
No reference-repo analog (the reference pipeline is tabular-only).
"""

from __future__ import annotations

# Windows-1252 maps bytes 0x80-0x9F to printable characters where
# ISO-8859-1 has control codes; decoders that "read UTF-8 as Latin-1"
# in the wild are overwhelmingly CP1252 readers, so the repair must
# round-trip those five-quote-and-dash characters too.  cp1252 leaves
# 0x81 0x8D 0x8F 0x90 0x9D undefined; latin-1 covers them.  Encoding
# back therefore tries cp1252 first, then latin-1 for the gaps.


def _to_bytes_cp1252(s: str) -> bytes | None:
    """Inverse of a cp1252-with-latin1-gaps read, or None if some char
    can't have come from a single byte."""
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            cp = ord(ch)
            if cp <= 0xFF:
                out.append(cp)
            else:
                return None
    return bytes(out)


def looks_double_encoded(s: str) -> bool:
    """Cheap detector: any UTF-8 lead-byte character (U+00C2-U+00F4)
    immediately followed by a continuation-range character.  Zero false
    negatives for real double-encoded UTF-8 (the lead/continuation
    pair is structural); false positives are possible in principle
    (e.g. genuine 'Ã©' prose) — callers gate on fix_double_encoding
    actually round-tripping."""
    prev_lead = False
    for ch in s:
        cp = ord(ch)
        if prev_lead and 0x80 <= _cp1252_byte(cp) <= 0xBF:
            return True
        prev_lead = 0xC2 <= _cp1252_byte(cp) <= 0xF4
    return False


def _cp1252_byte(cp: int) -> int:
    """Code point -> the single byte a cp1252/latin-1 read produced it
    from (or -1 if it can't be one)."""
    if cp <= 0xFF:
        return cp
    b = _CP1252_REVERSE.get(cp)
    return b if b is not None else -1


# the 27 printable cp1252 specials in 0x80-0x9F
_CP1252_REVERSE = {
    0x20AC: 0x80, 0x201A: 0x82, 0x0192: 0x83, 0x201E: 0x84, 0x2026: 0x85,
    0x2020: 0x86, 0x2021: 0x87, 0x02C6: 0x88, 0x2030: 0x89, 0x0160: 0x8A,
    0x2039: 0x8B, 0x0152: 0x8C, 0x017D: 0x8E, 0x2018: 0x91, 0x2019: 0x92,
    0x201C: 0x93, 0x201D: 0x94, 0x2022: 0x95, 0x2013: 0x96, 0x2014: 0x97,
    0x02DC: 0x98, 0x2122: 0x99, 0x0161: 0x9A, 0x203A: 0x9B, 0x0153: 0x9C,
    0x017E: 0x9E, 0x0178: 0x9F,
}


def fix_double_encoding(s: str) -> tuple[str, bool]:
    """Repair UTF-8-read-as-cp1252/latin-1 mojibake.

    Returns ``(fixed, was_repaired)``.  The repair applies ONLY when
    the inverse read produces bytes that decode as valid UTF-8 AND the
    result is shorter (real double encoding always shrinks: every
    non-ASCII char came from >= 2 chars) — otherwise the input is
    returned unchanged, so pure-ASCII and already-clean text are exact
    fixed points.  Repair is applied once, not iterated: genuinely
    N-times-encoded text (rare) needs the caller to loop, keeping this
    function's behavior predictable."""
    if not looks_double_encoded(s):
        return s, False
    raw = _to_bytes_cp1252(s)
    if raw is None:
        return s, False
    try:
        fixed = raw.decode("utf-8")
    except UnicodeDecodeError:
        return s, False
    if len(fixed) >= len(s):
        return s, False
    return fixed, True


def corrupt_double_encoding(s: str) -> str:
    """The corruption itself (UTF-8 bytes read as cp1252-with-gaps) —
    the test/oracle synthesizer.  fix_double_encoding inverts it
    exactly for any text containing at least one non-ASCII char."""
    out = []
    for b in s.encode("utf-8"):
        if b in (0x81, 0x8D, 0x8F, 0x90, 0x9D):
            out.append(chr(b))  # cp1252 gaps: latin-1 fallback
        else:
            out.append(bytes([b]).decode("cp1252"))
    return "".join(out)
