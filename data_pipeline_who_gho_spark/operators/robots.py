"""robots.txt parsing and URL gating (RFC 9309) — the crawl pipeline's
admission control, evaluated billions of times per harvest, so the
semantics must be exact:

* groups = consecutive ``User-agent`` lines followed by rules; a
  crawler obeys the group whose user-agent token is the LONGEST
  case-insensitive substring-prefix match of its own product token,
  falling back to the ``*`` group;
* within the group, the rule whose path pattern achieves the MOST
  OCTETS wins (longest-match); ``Allow`` wins exact ties;
* patterns support ``*`` (any octet run) and a trailing ``$`` (end
  anchor); matching is against the percent-path + query as-is;
* unknown directives are ignored; ``Sitemap:`` lines are collected
  file-wide (they live outside groups).

Pure functions, stdlib only; public spec (RFC 9309, the
Google/IETF robots exclusion protocol).
No reference-repo analog (the reference pipeline is tabular-only).
"""

from __future__ import annotations


def parse_robots(text: str) -> dict:
    """→ ``{"groups": [(agents, rules)], "sitemaps": [...]}`` where
    ``agents`` is a list of lowercase product tokens and ``rules`` is a
    list of ("allow" | "disallow", pattern) in file order."""
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    sitemaps: list[str] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    agents_open = False  # collecting a UA run?

    def flush() -> None:
        nonlocal cur_agents, cur_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules = [], []

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not agents_open:
                flush()
                agents_open = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            agents_open = False
            cur_rules.append((field, value))
        elif field == "sitemap":
            sitemaps.append(value)
        else:
            agents_open = False
    flush()
    return {"groups": groups, "sitemaps": sitemaps}


def _pattern_matches(pattern: str, path: str) -> bool:
    """RFC 9309 path matching: anchored at the start, '*' matches any
    octet run, trailing '$' anchors the end.

    Greedy-leftmost placement of the middle literals is complete (the
    classic wildcard lemma: matching each part at its earliest feasible
    position never blocks later parts); the end anchor is handled by
    requiring the LAST literal to sit flush at the end with enough room
    left."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    if not path.startswith(parts[0]):
        return False
    pos = len(parts[0])
    if len(parts) == 1:  # no '*' at all
        return pos == len(path) if anchored else True
    for part in parts[1:-1]:
        if part:
            idx = path.find(part, pos)
            if idx < 0:
                return False
            pos = idx + len(part)
    last = parts[-1]
    if not last:  # pattern ends with '*': absorbs the rest either way
        return True
    if anchored:
        return path.endswith(last) and len(path) - len(last) >= pos
    return path.find(last, pos) >= 0


def select_group(parsed: dict, agent: str):
    """The rules a crawler named ``agent`` must obey: those of the
    groups whose user-agent token is the longest prefix of ``agent``
    (case-insensitive), else the ``*`` groups, else None (everything
    allowed).  Per RFC 9309 §2.2.1, MULTIPLE groups naming the winning
    token (and multiple ``*`` groups) merge — their rules accumulate
    in file order rather than the last group silently replacing the
    others."""
    agent = agent.lower()
    best_tok, best_len = None, -1
    has_star = False
    for agents, _ in parsed["groups"]:
        for tok in agents:
            if tok == "*":
                has_star = True
            elif agent.startswith(tok) and len(tok) > best_len:
                best_tok, best_len = tok, len(tok)
    want = best_tok if best_tok is not None else ("*" if has_star else None)
    if want is None:
        return None
    merged: list[tuple[str, str]] = []
    for agents, rules in parsed["groups"]:
        if want in agents:
            merged.extend(rules)
    return merged


def gate(parsed: dict, agent: str, path: str) -> tuple[bool, int]:
    """(allowed, winning_pattern_octets) for ``path`` under ``agent``.

    Longest-match wins; Allow wins ties; no matching rule (or no
    applicable group, or an empty-valued rule) → allowed with match
    length 0."""
    rules = select_group(parsed, agent)
    if rules is None:
        return True, 0
    best_len = -1
    best_allow = True
    for kind, pattern in rules:
        if not pattern:
            continue  # 'Disallow:' (empty) = no restriction
        if _pattern_matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and kind == "allow"):
                best_len = plen
                best_allow = kind == "allow"
    if best_len < 0:
        return True, 0
    return best_allow, best_len


def parse_sitemap(xml_text: str) -> dict:
    """Parse a sitemap document (sitemaps.org protocol, the other half
    of the crawl frontier): either a ``<urlset>`` of page entries or a
    ``<sitemapindex>`` of child sitemaps.

    → ``{"kind": "urlset" | "sitemapindex", "entries": [{"loc",
    "lastmod", "changefreq", "priority"}]}`` (absent child fields are
    None; loc is required — entries without one raise).  Real XML
    parsing via stdlib ElementTree, namespace-aware (the 0.9 namespace
    is standard but its absence is tolerated, as crawlers must)."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as exc:
        raise ValueError(f"malformed sitemap XML: {exc}") from None

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    kind = local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap root element: {root.tag!r}")
    child_tag = "url" if kind == "urlset" else "sitemap"
    entries = []
    for el in root:
        if local(el.tag) != child_tag:
            continue
        fields = {local(c.tag): (c.text or "").strip() for c in el}
        if not fields.get("loc"):
            raise ValueError(f"sitemap <{child_tag}> without <loc>")
        entries.append(
            {
                "loc": fields["loc"],
                "lastmod": fields.get("lastmod"),
                "changefreq": fields.get("changefreq"),
                "priority": fields.get("priority"),
            }
        )
    return {"kind": kind, "entries": entries}


def build_sitemap(kind: str, entries: list[dict]) -> str:
    """Synthesize a namespaced sitemap document (the query/test
    builder)."""
    child = "url" if kind == "urlset" else "sitemap"
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<{kind} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for e in entries:
        parts.append(f"<{child}>")
        for k in ("loc", "lastmod", "changefreq", "priority"):
            v = e.get(k)
            if v is not None:
                parts.append(f"<{k}>{v}</{k}>")
        parts.append(f"</{child}>")
    parts.append(f"</{kind}>")
    return "".join(parts)
