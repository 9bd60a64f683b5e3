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


def test_all_plan_caches_registered():
    """Every module-level *_CACHE dict must be in caching.PLAN_CACHES
    (ADVICE r06): stale_check's hermetic hashing and the gate-boundary
    cleanup iterate the registry, so an unregistered cache would
    silently reintroduce order-dependent plan-hash drift."""
    from data_pipeline_who_gho_spark import caching

    entrymod.queries()  # force-import every plans module
    assert caching.unregistered_caches() == []


def test_stale_ledger_reads_as_live_state():
    """_STALE_SINCE entries self-clear once the driver re-greens them;
    cleared entries must be pruned (VERDICT r06 item 6)."""
    greens = entrymod._green_rounds()
    cleared = sorted(
        n for n, rnd in entrymod._STALE_SINCE.items() if greens.get(n, -1) >= rnd
    )
    assert cleared == [], f"prune self-cleared ledger entries: {cleared}"


def test_never_green_backlog_fits_one_window():
    green = set(entrymod._effective_green())
    backlog = [n for n in entrymod.queries() if n not in green]
    assert len(backlog) <= WINDOW, (
        f"{len(backlog)} never-green queries exceed the ~{WINDOW}-query "
        "driver window; registering more queries now would leave some "
        "without a hard-signal row next round"
    )
