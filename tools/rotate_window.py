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

``--gate`` (used by tools/run_gates.sh) exits non-zero when

(a) a registered query sits BELOW the 50-entry checked window while
    either never driver-green or 3+ rounds stale (the bound matches
    the 150-query/50-slot rotation arithmetic: the window the driver
    checks is the same ordering the gate inspects, so in steady state
    the below-fold always holds the two cohorts green at ``latest``
    and ``latest-1`` — never older than the bound, and a 2-round bound
    would be structurally unsatisfiable); or
(b) ANY below-fold query lacks a same-round sf0.01 local green in
    LOCAL_CHECK.json (``tools/check_oracles.py --record`` at the
    default sf0.01) — values-checked when the query has an oracle.
    This is the round-10 policy amendment (SURVEY §8.6): the looser
    driver-round bound is paid for with a mandatory every-round local
    oracle re-verification of everything the driver window skips.

Window-saturation exception (for the staleness check only): when more
queries need the window than it has slots (never-green + stale > 50 —
many new registrations in one round, or growth past the 150-query
rotation capacity), the overflow is arithmetically unavoidable.  The
gate then excuses AT MOST ``max(0, pressure - 50)`` below-fold queries
— loudly, never silently, never the same query two rounds in a row —
and only those holding a values-checked green local verdict recorded
at the current driver round.  The cap means a local check can never
excuse a query that rotation could have fit.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def repeat_excuses(excused: list, ledger: dict, latest: int) -> list:
    """Queries riding the saturation excuse two rounds in a row.

    ``ledger`` maps ``"r<N>"`` (driver round) to the list of queries
    excused at that round; the one-round-only contract means the
    current round's excused set must be disjoint from last round's.
    """
    prev = set(ledger.get(f"r{latest - 1}", []))
    return [q for q in excused if q in prev]


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
            if last_green.get(q, -1) < 0 or last_green[q] <= latest - 3
        ]
        # saturation escape hatch, capped at the ARITHMETICALLY
        # unavoidable overflow: with P queries needing the window
        # (never-green or stale) and 50 slots, at most max(0, P-50)
        # may sit below the fold — and only with a values-checked local
        # verdict recorded at the current driver round.  The cap keeps
        # the gate strict: local checks can never excuse a query that
        # rotation COULD have fit.
        pressure = [
            q
            for q in registered
            if last_green.get(q, -1) < 0 or last_green[q] <= latest - 3
        ]
        allowed = max(0, len(pressure) - 50)

        def locally_covered(q: str) -> bool:
            # "same-round": recorded since the previous driver
            # CORRECTNESS landed — during round N the latest file is
            # r(N-1), so a recording made this round carries
            # driver_round_at_check >= latest-1 at the post-round gate.
            rec = local_check.get(q, {})
            values_ok = rec.get("values_checked") or q not in oracles
            return bool(
                rec.get("ok")
                and values_ok
                and "sf0.01" in str(rec.get("sf_dir", ""))
                and rec.get("driver_round_at_check", -1) >= latest - 1
            )

        # round-10 mandatory Tier-B check: EVERY below-fold query needs
        # a same-round sf0.01 local green, stale or not.
        uncovered = [q for q in below_fold if not locally_covered(q)]
        if uncovered:
            print(
                f"\nGATE FAIL: {len(uncovered)} below-fold queries lack a "
                "same-round sf0.01 values-checked local green in "
                "LOCAL_CHECK.json (run tools/check_oracles.py --record):"
            )
            for q in uncovered[:20]:
                print(f"  {q}")
            if len(uncovered) > 20:
                print(f"  ... and {len(uncovered) - 20} more")
            return 1

        excused = [q for q in stale if locally_covered(q)][:allowed]
        # round-over-round disjointness: a query may ride the saturation
        # excuse at most once in a row — if it was excused last round it
        # MUST rotate into the window this round, so local-check coverage
        # can never quietly become permanent for any query.  The ledger
        # lives in WINDOW_EXCUSED.json keyed by driver round.
        ledger = {}
        try:
            ledger = json.load(open("WINDOW_EXCUSED.json"))
        except Exception:
            pass
        repeat = repeat_excuses(excused, ledger, latest)
        if repeat:
            print(
                f"\nGATE FAIL: {len(repeat)} queries would ride the "
                f"saturation excuse two rounds in a row: {', '.join(repeat)}"
                "\nrotate them into the top-50 window — the excuse is "
                "one-round-only by contract."
            )
            return 1
        if excused:
            print(
                f"\ngate: {len(excused)} below-fold queries (of {allowed} "
                f"unavoidable overflow with {len(pressure)} needing the "
                f"50-slot window) pass only by recorded local oracle check: "
                f"{', '.join(excused)}"
            )
        ledger[f"r{latest}"] = sorted(excused)
        with open("WINDOW_EXCUSED.json", "w") as fh:
            json.dump(ledger, fh, indent=1, sort_keys=True)
        stale = [q for q in stale if q not in excused]
        if stale:
            print(
                f"\nGATE FAIL: {len(stale)} below-fold queries are unverified "
                f"or stale (last green <= r{latest - 3}):"
            )
            for q in stale:
                when = last_green.get(q, -1)
                print(f"  {q}  (last green: {'never' if when < 0 else f'r{when}'})")
            print("rotate them into the top-50 window before the round ends.")
            return 1
        print(
            "\ngate: window OK — every below-fold query driver-green within "
            "3 rounds AND locally sf0.01-green this round"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
