"""WARC (ISO 28500) record parsing — the wire format web-scale corpora
actually arrive in (Common Crawl ships WARC/WET/WAT), so the ingest
seam must walk it before any text ever reaches a curation operator.

``parse_warc`` walks a WARC file's records: version line, named
headers (case-insensitive lookup, order preserved), a Content-Length
block read VERBATIM (bytes, never charset-decoded here — response
blocks are HTTP messages with their own framing), and the mandatory
CRLF CRLF record separator.  ``split_http_response`` then splits a
response record's block into (status, headers, body).  Gzipped WARCs
(whole-file or per-record concatenated members — the Common Crawl
layout) inflate through stdlib gzip first: ``gzip.decompress`` handles
multi-member streams.

``build_warc`` synthesizes valid records for the driver queries'
closed-form oracles, like the other container builders.

Strictness: malformed version lines, missing Content-Length, short
blocks, and missing separators raise ValueError — a truncated shard
must fail loudly, not yield a silently short corpus.

No reference-repo analog (the reference pipeline is tabular-only).
"""

from __future__ import annotations


def parse_warc(payload: bytes) -> list[dict]:
    """Parse WARC bytes into records: ``{"version", "headers"
    (dict, original-case keys), "block" (bytes)}``.

    Header lookup helper: use :func:`header` for case-insensitive
    access.  A leading gzip magic inflates first (multi-member safe)."""
    if payload[:2] == b"\x1f\x8b":
        import gzip

        payload = gzip.decompress(payload)
    records = []
    pos, n = 0, len(payload)
    while pos < n:
        # tolerate extra blank lines between records (some writers pad)
        while pos < n and payload[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        eol = payload.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        version = payload[pos:eol].decode("latin-1")
        if not version.startswith("WARC/"):
            raise ValueError(f"not a WARC record at byte {pos}: {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = payload.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = payload[pos:eol]
            pos = eol + 2
            if not line:
                break
            if b":" not in line:
                raise ValueError(f"malformed WARC header line {line!r}")
            k, v = line.split(b":", 1)
            headers[k.decode("latin-1").strip()] = v.decode("latin-1").strip()
        clen = header(headers, "Content-Length")
        if clen is None:
            raise ValueError("WARC record missing Content-Length")
        clen = int(clen)
        if pos + clen > n:
            raise ValueError("WARC block overruns the payload")
        block = payload[pos : pos + clen]
        pos += clen
        if payload[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError("WARC record missing CRLF CRLF separator")
        pos += 4
        records.append({"version": version, "headers": headers, "block": block})
    if not records:
        raise ValueError("no WARC records")
    return records


def header(headers: dict[str, str], name: str) -> str | None:
    """Case-insensitive header lookup (WARC names are
    case-insensitive; writers vary)."""
    lname = name.lower()
    for k, v in headers.items():
        if k.lower() == lname:
            return v
    return None


def split_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split an application/http response block into (status_code,
    headers, body)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP message without header/body separator")
    head = block[:sep].decode("latin-1").split("\r\n")
    status_line = head[0].split(" ", 2)
    if len(status_line) < 2 or not status_line[0].startswith("HTTP/"):
        raise ValueError(f"malformed HTTP status line {head[0]!r}")
    status = int(status_line[1])
    headers: dict[str, str] = {}
    for line in head[1:]:
        if ":" not in line:
            raise ValueError(f"malformed HTTP header line {line!r}")
        k, v = line.split(":", 1)
        headers[k.strip()] = v.strip()
    return status, headers, block[sep + 4 :]


def build_warc(records: list[tuple[str, dict[str, str], bytes]]) -> bytes:
    """Synthesize a WARC file from (warc_type, extra_headers, block)
    triples — Content-Length and the separators are computed here."""
    out = bytearray()
    for i, (wtype, extra, block) in enumerate(records):
        out += b"WARC/1.0\r\n"
        out += f"WARC-Type: {wtype}\r\n".encode("latin-1")
        out += f"WARC-Record-ID: <urn:rec:{i}>\r\n".encode("latin-1")
        for k, v in extra.items():
            out += f"{k}: {v}\r\n".encode("latin-1")
        out += f"Content-Length: {len(block)}\r\n".encode("latin-1")
        out += b"\r\n"
        out += block
        out += b"\r\n\r\n"
    return bytes(out)


def build_http_response(body: bytes, content_type: str = "text/html") -> bytes:
    """An HTTP/1.1 200 response block around ``body``."""
    return (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {content_type}\r\n".encode("latin-1")
        + f"Content-Length: {len(body)}\r\n".encode("latin-1")
        + b"\r\n"
        + body
    )
