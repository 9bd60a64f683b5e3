"""SubRip (SRT) subtitle parsing — the text side of video-text
training pairs (caption corpora ship as .srt/.vtt next to the media).

``parse_srt`` walks cue blocks: numeric index, ``HH:MM:SS,mmm -->
HH:MM:SS,mmm`` timing line (comma decimals per SRT; dot also accepted
— WebVTT writers emit it), then text lines until a blank line.
Timestamps become integer milliseconds, so durations and overlap
checks are exact.  Malformed indices, timing lines, or a cue whose end
precedes its start raise ValueError — a truncated caption file should
fail loudly, not silently shorten the transcript.

``build_srt`` synthesizes files for the driver queries' closed-form
oracles, like the other format builders.

Stdlib only; the SRT format is public/ubiquitous.
No reference-repo analog (the reference pipeline is tabular-only).
"""

from __future__ import annotations

import re

_TS = re.compile(r"^(\d{2,}):([0-5]\d):([0-5]\d)[,.](\d{3})$")


def _parse_ts(ts: str) -> int:
    m = _TS.match(ts.strip())
    if not m:
        raise ValueError(f"malformed SRT timestamp {ts!r}")
    h, mi, s, ms = (int(g) for g in m.groups())
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def format_ts(ms: int) -> str:
    h, rem = divmod(ms, 3600000)
    mi, rem = divmod(rem, 60000)
    s, ms = divmod(rem, 1000)
    return f"{h:02d}:{mi:02d}:{s:02d},{ms:03d}"


def parse_srt(text: str) -> list[dict]:
    """→ list of ``{"index", "start_ms", "end_ms", "text"}`` cues in
    file order (text lines joined by '\\n')."""
    cues: list[dict] = []
    lines = text.splitlines()
    i, n = 0, len(lines)
    while i < n:
        while i < n and not lines[i].strip():
            i += 1
        if i >= n:
            break
        idx_line = lines[i].strip().lstrip("﻿")
        if not idx_line.isdigit():
            raise ValueError(f"malformed SRT cue index {lines[i]!r}")
        index = int(idx_line)
        i += 1
        if i >= n or "-->" not in lines[i]:
            raise ValueError(f"cue {index}: missing timing line")
        start_s, _, end_s = lines[i].partition("-->")
        start, end = _parse_ts(start_s), _parse_ts(end_s)
        if end < start:
            raise ValueError(f"cue {index}: end before start")
        i += 1
        body: list[str] = []
        while i < n and lines[i].strip():
            body.append(lines[i])
            i += 1
        if not body:
            raise ValueError(f"cue {index}: empty text")
        cues.append(
            {"index": index, "start_ms": start, "end_ms": end,
             "text": "\n".join(body)}
        )
    if not cues:
        raise ValueError("no SRT cues")
    return cues


def build_srt(cues: list[tuple[int, int, str]]) -> str:
    """Synthesize an SRT file from (start_ms, end_ms, text) triples
    (indices are 1-based positions, per convention)."""
    blocks = []
    for i, (start, end, text) in enumerate(cues, start=1):
        blocks.append(f"{i}\n{format_ts(start)} --> {format_ts(end)}\n{text}")
    return "\n\n".join(blocks) + "\n"
