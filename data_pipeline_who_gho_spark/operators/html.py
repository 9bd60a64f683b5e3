"""HTML visible-text extraction — the step between a WARC response and
every text operator in the corpus pipeline.

``extract_text`` runs a REAL HTML parse (stdlib html.parser: tags,
attributes, entity and charref unescaping, broken-markup tolerance)
with the extraction rules the curation literature uses:

* ``<script>`` / ``<style>`` / ``<template>`` / ``<noscript>``
  subtrees contribute NOTHING (their text is code, not content);
* block-level boundaries (p, div, h1-h6, li, br, tr, ...) become
  single newlines, inline tags (a, b, span, em, ...) vanish;
* entities decode (``&amp;`` → ``&``, ``&#233;`` → ``é``);
* runs of inter-tag whitespace collapse to one space inside a block,
  and leading/trailing block whitespace is trimmed — the
  deterministic normalization both engines can replay.

``link_stats`` additionally measures anchor-text share — the classic
link-density boilerplate signal (Kohlschütter et al.'s boilerplate
features are built on it).

Stdlib only, spec-public (WHATWG HTML + html.parser semantics).
No reference-repo analog (the reference pipeline is tabular-only).
"""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP_SUBTREES = {"script", "style", "template", "noscript"}
_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "blockquote", "pre", "section", "article",
    "header", "footer", "nav", "aside", "title", "body", "html", "head",
    "form", "figure", "figcaption", "main", "hr",
}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)  # entities decode to text
        self.blocks: list[list[str]] = [[]]
        self.block_anchor: list[int] = [0]  # non-ws anchor chars per block
        self.skip_depth = 0
        self.anchor_depth = 0
        self.n_links = 0
        self.anchor_chars = 0

    def _break_block(self) -> None:
        if self.blocks[-1]:
            self.blocks.append([])
            self.block_anchor.append(0)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_SUBTREES:
            self.skip_depth += 1
            return
        if self.skip_depth:  # tags inside noscript/template: no counting
            return
        if tag == "a":
            self.anchor_depth += 1
            self.n_links += 1
        if tag in _BLOCK_TAGS or tag == "br":
            self._break_block()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_SUBTREES:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        if tag == "a":
            self.anchor_depth = max(0, self.anchor_depth - 1)
        if tag in _BLOCK_TAGS:
            self._break_block()

    def handle_data(self, data: str) -> None:
        if self.skip_depth:
            return
        self.blocks[-1].append(data)
        if self.anchor_depth:
            n = len("".join(data.split()))
            self.anchor_chars += n
            self.block_anchor[-1] += n


def extract_text(html: str) -> str:
    """Visible text: blocks joined by single newlines, whitespace
    collapsed to single spaces within a block, empty blocks dropped."""
    p = _Extractor()
    p.feed(html)
    p.close()
    lines = [" ".join("".join(b).split()) for b in p.blocks]
    return "\n".join(ln for ln in lines if ln)


def link_stats(html: str) -> tuple[int, int, int]:
    """(n_links, anchor_chars, text_chars) — anchor_chars and
    text_chars count non-whitespace visible characters, the ratio being
    the link-density boilerplate signal."""
    p = _Extractor()
    p.feed(html)
    p.close()
    text_chars = sum(len("".join("".join(b).split())) for b in p.blocks)
    return p.n_links, p.anchor_chars, text_chars


def extract_blocks(html: str) -> list[tuple[str, int, int]]:
    """Per-block extraction: (normalized_text, anchor_chars,
    text_chars) for every non-empty block, in document order — the
    input a boilerplate classifier needs (anchor/text counts are
    non-whitespace characters)."""
    p = _Extractor()
    p.feed(html)
    p.close()
    out = []
    for parts, a in zip(p.blocks, p.block_anchor):
        text = " ".join("".join(parts).split())
        if text:
            out.append((text, a, len("".join(text.split()))))
    return out


def boilerplate_extract(
    html: str, min_chars: int = 4
) -> tuple[str, int, int]:
    """Rule-based main-content extraction (the Kohlschütter-style
    shallow-feature classifier): a block survives iff it has at least
    ``min_chars`` non-whitespace characters AND its link density is
    under 1/2 (2 * anchor_chars < text_chars — exact integer test, no
    float ratio).  Returns (kept_text_joined_by_newlines, n_blocks,
    n_kept).  Navigation bars, footer link farms, and stub fragments
    drop; running prose survives."""
    blocks = extract_blocks(html)
    kept = [
        t for t, a, c in blocks if c >= min_chars and 2 * a < c
    ]
    return "\n".join(kept), len(blocks), len(kept)
