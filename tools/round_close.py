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

    # 2. window-50 gate at sf0.01 (what the driver will check next round)
    if not skip_gate:
        import __spark_entry__ as entrymod

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
