"""Driver-stamp ledger: newest driver-green round per registered query.

The driver samples only the first 50 registry names per round
(``registry.DRIVER_WINDOW``), so every query's OFFICIAL correctness
record ages until it is rotated back into the window.  Round 5
introduced the discipline "no stamp older than 3 rounds"; this tool
makes the rotation mechanical instead of a per-round archaeology dig
through CORRECTNESS_r*.json.

Usage:  python tools/stamps.py              # full ledger + staleness buckets
        python tools/stamps.py --window     # suggested next-window candidates
        python tools/stamps.py --plan-next  # simulate the next ledger landing
                                            # and print the window the round
                                            # AFTER it must ship (mandatory +
                                            # suggested pre-rotation fill)

A query is GREEN in a round when rows/schema match and the hash
matches (or the record is rows-only, hash None).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_stamps() -> tuple[dict[str, int], int]:
    """(query -> newest green round, latest round number seen)."""
    stamps: dict[str, int] = {}
    latest = 0
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(f.rsplit("_r", 1)[1].split(".")[0])
        latest = max(latest, r)
        with open(f) as fh:
            doc = json.load(fh)
        for name, rec in doc.items():
            green = (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match") in (True, None)
            )
            if green:
                stamps[name] = max(stamps.get(name, 0), r)
    return stamps, latest


def main() -> int:
    from trafik_etl_modular_spark.registry import DRIVER_WINDOW, all_queries

    names = list(all_queries())
    stamps, latest = newest_stamps()
    never = [n for n in names if n not in stamps]
    by_round: dict[int, list[str]] = {}
    for n in names:
        if n in stamps:
            by_round.setdefault(stamps[n], []).append(n)

    if "--plan-next" in sys.argv:
        # Simulate: the driver stamps the CURRENT window at round
        # latest+1; what must the round-(latest+2) window contain?
        nxt = latest + 1
        cycle = max(4, -(-len(names) // 50))
        sim = dict(stamps)
        for n in DRIVER_WINDOW:
            sim[n] = nxt
        hard = [n for n in names if sim.get(n, -(10**6)) <= nxt - cycle]
        edge = [n for n in names if sim.get(n) == nxt - (cycle - 1)]
        mandatory = sorted(set(hard) | set(edge))
        print(
            f"simulated ledger: r{nxt:02d} stamps the current window; "
            f"N={len(names)}, cycle={cycle}"
        )
        print(f"MANDATORY for the r{nxt + 1:02d}-window ({len(mandatory)}):")
        for n in mandatory:
            print(f"  {n} (r{sim.get(n, 0):02d})")
        print(
            "plus: every query ADDED next round (never-stamped rule) and "
            "every query whose function/oracle CHANGES (hash-manifest rule)."
        )
        free = 50 - len(mandatory)
        pool = sorted(
            (n for n in names if n not in mandatory),
            key=lambda n: (sim.get(n, -(10**6)), n),
        )
        print(f"suggested pre-rotation fill for the ~{free} free slots "
              "(oldest simulated stamps first):")
        for n in pool[:free]:
            print(f"  {n} (r{sim.get(n, 0):02d})")
        return 0

    if "--window" in sys.argv:
        # Rotation suggestion: never-stamped first, then oldest stamps,
        # excluding what is already in the current window (their stamps
        # refresh when the driver next runs) — from BOTH cohorts.
        pool = [n for n in never if n not in DRIVER_WINDOW] + [
            n
            for r in sorted(by_round)
            for n in sorted(by_round[r])
            if n not in DRIVER_WINDOW
        ]
        try:
            for n in pool[:50]:
                print(n, f"(r{stamps[n]:02d})" if n in stamps else "(never)")
        except BrokenPipeError:  # `| head` closed the pipe — fine
            pass
        return 0

    print(f"registered queries: {len(names)}   latest driver round: r{latest:02d}")
    print(f"never driver-stamped: {len(never)}")
    for n in never:
        in_w = "  [in current window]" if n in DRIVER_WINDOW else ""
        print(f"  never  {n}{in_w}")
    for r in sorted(by_round):
        age = latest - r
        tag = "  <-- STALE (>3 rounds)" if age > 3 else ""
        print(f"r{r:02d} ({len(by_round[r])} queries, age {age}){tag}")
        if age > 3 or "--verbose" in sys.argv:
            for n in sorted(by_round[r]):
                in_w = "  [in current window]" if n in DRIVER_WINDOW else ""
                print(f"  {n}{in_w}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
