"""Round-close checklist as ONE command.

Runs, in order:

1. ``tools/stale_check.py`` — plan-hash drift vs PLAN_HASHES.json.
   Drift means a query changed after its last driver-green row: make
   sure each changed name is annotated in
   ``__spark_entry__._STALE_SINCE`` (this tool prints the list and, by
   design, does NOT guess the annotations for you).
2. the window-50 gate — ``tools/check_correctness.py`` over exactly the
   FIRST 50 entries of ``queries()`` (what the external driver will
   re-check next round) at sf0.01.
3. with ``--update``: rewrites the PLAN_HASHES.json baseline (run this
   only AFTER annotating _STALE_SINCE for every drifted query).

Usage:
  python tools/round_close.py            # check drift + window gate
  python tools/round_close.py --update   # same, then refresh baseline
  python tools/round_close.py --skip-gate --update   # baseline only

Exit code is non-zero if drift is unannotated-able (stale_check fails)
or any window query fails the gate.
"""

from __future__ import annotations

import subprocess
import sys

sys.path.insert(0, "/root/repo")

WINDOW = 50


def run(cmd: list[str]) -> int:
    print(f"\n=== {' '.join(cmd)} ===", flush=True)
    return subprocess.call(cmd)


def main() -> None:
    update = "--update" in sys.argv
    skip_gate = "--skip-gate" in sys.argv
    rc = 0

    # 1. drift report (non-zero exit = drift or errors; keep going so the
    # gate still runs, but remember the failure)
    drift = run([sys.executable, "tools/stale_check.py"])
    if drift:
        print(
            "stale_check reported drift/errors — annotate "
            "__spark_entry__._STALE_SINCE before --update",
            flush=True,
        )
        rc = rc or drift

    import __spark_entry__ as entrymod

    # 1b. ledger liveness: a _STALE_SINCE entry whose query has since
    # re-earned a driver-green row is self-cleared — prune it so the
    # ledger always reads as live state (VERDICT r06 item 6)
    greens = entrymod._green_rounds()
    cleared = sorted(
        n for n, rnd in entrymod._STALE_SINCE.items() if greens.get(n, -1) >= rnd
    )
    if cleared:
        print(
            f"self-cleared _STALE_SINCE entries (re-greened): {cleared} — "
            "prune them from __spark_entry__ before closing the round",
            flush=True,
        )
        rc = rc or 1

    # 2. window-50 gate at sf0.01 (what the driver will check next round)
    if not skip_gate:
        window = list(entrymod.queries())[:WINDOW]
        gate = run(
            [
                sys.executable,
                "tools/check_correctness.py",
                "/root/testdata/sf0.01",
                *window,
            ]
        )
        rc = rc or gate

    # 3. baseline refresh
    if update:
        upd = run([sys.executable, "tools/stale_check.py", "--update"])
        rc = rc or upd

    sys.exit(rc)


if __name__ == "__main__":
    main()
