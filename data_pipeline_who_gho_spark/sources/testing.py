"""Fixture fetchers for tests and local runs (SURVEY §7: the oracle/test
path never touches the network). Importable by executors — fetchers used
in ``mapInPandas`` must live in an importable module, not a test file."""

from __future__ import annotations

_TOTAL_PER_KEY = 5


def pages_fetcher(key: str, page: int, page_size: int) -> list[dict]:
    """Deterministic source: each key yields 5 records across pages."""
    start = page * page_size
    return [
        {"key": key, "idx": i}
        for i in range(start, min(start + page_size, _TOTAL_PER_KEY))
    ]


_fail_once: dict = {}


def flaky_fetcher(key: str, page: int, page_size: int) -> list[dict]:
    """Fails the first attempt at every (key, page) — retry-path fixture."""
    if (key, page) not in _fail_once:
        _fail_once[(key, page)] = True
        raise ConnectionError("transient")
    return pages_fetcher(key, page, page_size)
