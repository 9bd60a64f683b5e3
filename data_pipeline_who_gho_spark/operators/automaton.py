"""Aho-Corasick multi-pattern matching — the blocklist/keyword gate a
curation pipeline runs over every document (unsafe-term filtering,
licence-string detection, contamination markers).

One automaton serves ALL patterns in a single O(len(text) + matches)
pass — the scale property that matters when the blocklist has tens of
thousands of entries and the corpus has billions of documents: P
per-pattern scans (regex loops, LIKE chains) cost P passes; the
automaton costs one.  Built once on the driver (the pattern list is
bounded), shipped to executors by closure capture exactly like the
BPE merge tables, applied inside a batch-at-a-time pandas pass.

Classic algorithm (Aho & Corasick 1975, public): goto trie + BFS fail
links + output-link union.  Matches are reported at every END
position, so overlapping and nested occurrences all count — callers
that need non-overlapping counts (e.g. to mirror a replace()-based
oracle) should use borderless patterns (no proper prefix that is also
a suffix), for which the two counts coincide.

Pure Python on purpose: the per-char loop is the honest cost (a
production deployment swaps in the C-backed pyahocorasick with the
same semantics); docs scan independently, so the pass parallelizes
across partitions like the decode family.

No reference-repo analog (the reference pipeline is tabular-only).
"""

from __future__ import annotations

from collections import deque


class Automaton:
    """Immutable matcher over a fixed pattern list."""

    __slots__ = ("goto", "fail", "out", "plen", "patterns")

    def __init__(self, patterns: list[str]):
        if not patterns:
            raise ValueError("empty pattern list")
        if any(not p for p in patterns):
            raise ValueError("empty pattern")
        if len(set(patterns)) != len(patterns):
            raise ValueError("duplicate patterns")
        self.patterns = list(patterns)
        self.plen = [len(p) for p in patterns]
        goto: list[dict[str, int]] = [{}]
        out: list[list[int]] = [[]]
        for idx, pat in enumerate(patterns):
            node = 0
            for ch in pat:
                nxt = goto[node].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append([])
                    nxt = len(goto) - 1
                    goto[node][ch] = nxt
                node = nxt
            out[node].append(idx)
        fail = [0] * len(goto)
        q: deque[int] = deque()
        for v in goto[0].values():
            q.append(v)  # depth 1: fail -> root
        while q:
            u = q.popleft()
            for ch, v in goto[u].items():
                q.append(v)
                f = fail[u]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[v] = goto[f].get(ch, 0)
                out[v] += out[fail[v]]
        self.goto = goto
        self.fail = fail
        self.out = out

    def find_all(self, text: str) -> list[tuple[int, int]]:
        """All (start, pattern_idx) matches, including overlaps."""
        goto, fail, out, plen = self.goto, self.fail, self.out, self.plen
        node = 0
        hits: list[tuple[int, int]] = []
        for i, ch in enumerate(text):
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                for idx in out[node]:
                    hits.append((i - plen[idx] + 1, idx))
        return hits
