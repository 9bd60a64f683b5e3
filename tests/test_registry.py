"""Registry hygiene for the driver contract (__spark_entry__).

The external gate checks only the FIRST ~50 entries of ``queries()``
per round, so the rotation invariants ARE correctness infrastructure:
every query needs an oracle twin, never-driver-green queries must sort
ahead of green ones, and the never-green backlog must fit one window —
otherwise some operator silently never earns a hard-signal row."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

WINDOW = 50


def test_every_query_has_an_oracle_twin():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert qs <= oracles, f"rows-only queries (no oracle): {sorted(qs - oracles)}"


def test_rotation_puts_never_green_first():
    green = set(entrymod._effective_green())
    names = list(entrymod.queries())
    seen_green = False
    for n in names:
        if n in green:
            seen_green = True
        else:
            assert not seen_green, (
                f"never-green query {n!r} sorts after a green one — "
                "the rotation would starve it of a driver row"
            )


def test_never_green_backlog_fits_one_window():
    green = set(entrymod._effective_green())
    backlog = [n for n in entrymod.queries() if n not in green]
    assert len(backlog) <= WINDOW, (
        f"{len(backlog)} never-green queries exceed the ~{WINDOW}-query "
        "driver window; registering more queries now would leave some "
        "without a hard-signal row next round"
    )
