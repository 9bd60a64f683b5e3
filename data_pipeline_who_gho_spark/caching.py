"""Bounded app-scoped persist cache, shared by plans that reference an
expensive invariant DataFrame several times in one query (the shingle
table across dedup queries, PageRank's edge⋈degree relation across
iterations).

One policy, one place: memoize per (applicationId, sf_dir)-style key,
evict + unpersist the oldest entry beyond ``limit`` so a long-lived
session sweeping many scale factors never pins storage forever.
"""

from __future__ import annotations

from collections.abc import Callable, Hashable, MutableMapping

from pyspark.sql import DataFrame


def bounded_persist_cache(
    cache: MutableMapping,
    key: Hashable,
    build: Callable[[], DataFrame],
    limit: int = 4,
) -> DataFrame:
    """Return ``cache[key]``, building + persisting it on a miss and
    evicting (with unpersist) the oldest entries beyond ``limit``."""
    df = cache.get(key)
    if df is not None:
        return df
    while len(cache) >= limit:
        cache.pop(next(iter(cache))).unpersist()
    df = build().persist()
    cache[key] = df
    return df
