"""Oracle-window rotation advisor.

The driver's correctness harness checks only the FIRST 50 entries of
``queries()``.  This tool reads every ``CORRECTNESS_r*.json`` in the
repo root, computes each query's verification history, and prints the
recommended top-50 for the next round:

1. queries with NO green driver row ever (newest registrations first —
   they are the least exercised);
2. queries whose last green row is oldest (stalest re-verification);
3. everything else, freshest-verified last.

Usage: python tools/rotate_window.py [--gate]   (from the repo root)

The output is advisory — apply it by reordering ``queries()`` in
``__spark_entry__.py`` (keep the NOTE comment there in sync).

``--gate`` (used by tools/run_gates.sh) exits non-zero when a
registered query is sitting BELOW the 50-entry checked window while
either (a) it has never had a green driver row, or (b) its last green
row is 2+ rounds old — i.e. a round is about to end with a query that
can silently stay unverified.

Window-saturation exception: a round that registers more NEW queries
than the window has free slots (stale + new > 50) cannot satisfy (a)
for every newcomer.  A never-driver-checked query below the fold is
therefore accepted — loudly, never silently — when LOCAL_CHECK.json
(written by ``tools/check_oracles.py --record``) holds a green verdict
for it recorded at the CURRENT driver round.

Steady state: the 2-round rule gives the 50-slot window a rotation
capacity of 150 queries.  With more registered (153 as of round 6),
``registered - 150`` queries per round overflow the stale set even
with perfect rotation; the stalest-first ranking cycles WHICH queries
overflow, so every query is still driver-verified at least every
``ceil(registered/50)`` rounds, and each overflow round must be
covered by a fresh recorded local check — the gate never lets one go
silently unverified.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as entry

    registered = list(entry.queries())
    oracles = set(entry.oracle_sql())

    last_green: dict[str, int] = {}
    checked_ever: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, rec in rows.items():
            checked_ever.add(name)
            if rec.get("hash_match") or (
                rec.get("rows_match") and name not in oracles
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)

    def sort_key(name: str) -> tuple:
        # never-green first (newest registration = highest index first),
        # then stalest green
        green = last_green.get(name, -1)
        idx = registered.index(name)
        return (green, -idx if green < 0 else idx)

    ranked = sorted(registered, key=sort_key)
    never = [q for q in registered if q not in last_green]
    print(f"{len(registered)} registered; {len(never)} without a green driver row:")
    for q in never:
        status = "never checked" if q not in checked_ever else "checked, not green"
        print(f"  {q}  ({status})")
    print("\nrecommended top-50 for next round:")
    for i, q in enumerate(ranked[:50], 1):
        tag = "" if q in last_green else "  <- needs first green row"
        print(f"  {i:2d}. {q}{tag}")

    if "--gate" in sys.argv:
        latest = max(
            (
                int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
                for p in glob.glob("CORRECTNESS_r*.json")
                if re.search(r"r(\d+)", os.path.basename(p))
            ),
            default=0,
        )
        local_check = {}
        try:
            local_check = json.load(open("LOCAL_CHECK.json"))
        except Exception:
            pass
        below_fold = registered[50:]
        stale = [
            q
            for q in below_fold
            if last_green.get(q, -1) < 0 or last_green[q] <= latest - 2
        ]
        # saturation escape hatch: never-driver-checked newcomers are OK
        # below the fold iff a local oracle check recorded at the
        # current driver round covers them (see module docstring)
        excused = [
            q
            for q in stale
            if last_green.get(q, -1) < 0
            and local_check.get(q, {}).get("ok")
            and local_check.get(q, {}).get("values_checked")
            and local_check.get(q, {}).get("driver_round_at_check", -1) >= latest
        ]
        if excused:
            print(
                f"\ngate: {len(excused)} new below-fold queries pass only by "
                f"recorded local oracle check (driver verification pending "
                f"round {latest + 2} rotation): {', '.join(excused)}"
            )
        stale = [q for q in stale if q not in excused]
        if stale:
            print(
                f"\nGATE FAIL: {len(stale)} below-fold queries are unverified "
                f"or stale (last green <= r{latest - 2}):"
            )
            for q in stale:
                when = last_green.get(q, -1)
                print(f"  {q}  (last green: {'never' if when < 0 else f'r{when}'})")
            print("rotate them into the top-50 window before the round ends.")
            return 1
        print("\ngate: window OK — every below-fold query green within 2 rounds")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
