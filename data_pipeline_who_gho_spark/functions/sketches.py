"""Streaming-summary sketches used by plan-level operators.

Misra-Gries heavy-hitter summaries run *per input partition* inside
``mapInPandas`` (importable-module requirement for Arrow workers, see
memory/oracle-parity-rules). The union of per-partition candidate sets
is a superset of every item with global frequency > n/k — the classic
distributed merge guarantee — so an exact re-count of candidates alone
reproduces the exact heavy-hitter answer without a full-vocabulary
aggregation.

Reference parity anchor: the reference has no sketches at all
(SURVEY §2c "Aggregations ... no distinct-agg"); this is a north-star
scale extension (BASELINE.json "design every operator for 100 TB
scale") — at 100 TB the candidate set is a few hundred rows broadcast
back over the token stream, versus a full shuffle of every distinct
token for the naive GROUP BY.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd


def misra_gries_partial(k: int, column: str = "token"):
    """Return a ``mapInPandas`` function emitting the Misra-Gries
    candidate summary (``token``, ``est`` lower-bound count,
    ``is_total`` = false) of each partition with at most ``k - 1``
    counters, plus one sentinel row (``is_total`` = true) carrying the
    partition's exact item count — so the caller gets the stream length
    from the same pass instead of re-scanning the input to count it."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_items = 0
        for pdf in batches:
            n_items += len(pdf)
            for tok in pdf[column]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < k - 1:
                    counters[tok] = 1
                else:
                    dead = [t for t, c in counters.items() if c == 1]
                    for t in counters:
                        counters[t] -= 1
                    for t in dead:
                        del counters[t]
        yield pd.DataFrame(
            {
                "token": list(counters.keys()) + [""],
                "est": list(counters.values()) + [n_items],
                "is_total": [False] * len(counters) + [True],
            }
        )

    return summarize
