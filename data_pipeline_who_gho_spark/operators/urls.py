"""URL canonicalization — the key extractor for crawl-level dedup.

The same page arrives under many spellings (scheme/host case, default
ports, dot segments, duplicate slashes, tracking parameters, query
order, fragments); a crawl pipeline dedups on the CANONICAL form, so
the canonicalizer is a correctness-critical operator: too weak and the
corpus keeps duplicates, too aggressive and distinct pages merge.

Rules applied (RFC 3986 §6 normalizations plus the standard crawl
extensions, each deliberate):

* scheme and host lowercase; trailing dot stripped from the host;
* default ports dropped (http:80, https:443) — others kept;
* path dot-segments resolved (RFC 3986 §5.2.4), duplicate slashes
  collapsed, empty path → "/";
* query parsed, TRACKING parameters dropped (utm_*, gclid, fbclid,
  msclkid, ref), remaining pairs sorted by (key, value) and
  re-encoded — order variance never splits a dedup key;
* fragment dropped (never sent to the server).

NOT applied (documented non-choices): "www." stripping and percent-
encoding re-normalization — both can merge or split DISTINCT origins
and belong to site-specific policy, not the generic operator.

Stdlib urllib.parse only.  No reference-repo analog (the reference
pipeline is tabular-only).
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING_EXACT = {"gclid", "fbclid", "msclkid", "ref"}
_TRACKING_PREFIX = ("utm_",)


def _is_tracking(key: str) -> bool:
    k = key.lower()
    return k in _TRACKING_EXACT or k.startswith(_TRACKING_PREFIX)


def _normalize_path(path: str) -> str:
    """Collapse duplicate slashes and resolve ./.. segments; a '..'
    at the root is dropped (RFC 3986 §5.2.4)."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    return "/" + "/".join(out)


def canonicalize_url(url: str) -> str:
    """Canonical form of an absolute http(s) URL (see module rules).
    Non-http(s) schemes raise ValueError — mailto:/javascript:/data:
    links are not crawlable documents."""
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        raise ValueError(f"not a crawlable URL scheme: {parts.scheme!r}")
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        raise ValueError("URL without a host")
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = _normalize_path(parts.path)
    pairs = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not _is_tracking(k)
    ]
    query = urlencode(sorted(pairs))
    return urlunsplit((scheme, netloc, path, query, ""))
