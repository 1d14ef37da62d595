"""Driver-stamp ledger: newest driver-green round per registered query.

The driver samples only the first 50 registry names per round
(``registry.DRIVER_WINDOW``), so every query's OFFICIAL correctness
record ages until it is rotated back into the window.  Round 5
introduced the discipline "no stamp older than 3 rounds"; this tool
makes the rotation mechanical instead of a per-round archaeology dig
through CORRECTNESS_r*.json.

Round-10 TIERED CADENCE (verdict r09 ask #2 — structural relief for
the window-math squeeze).  With N>200 registered queries a single
staleness cycle makes every round rotation-dominated (round 11 would
have owed 61 mandatory slots in a 50-slot window).  The registry now
rotates on two cadences:

  * ACTIVE  — queries with at most ONE lifetime driver-green stamp.
    Staleness cycle = base = max(4, ceil(N/50)) rounds, the historical
    rule.  A brand-new query is stamped on entry (never-stamped rule)
    and must earn its SECOND stamp within the base cycle.
  * MATURE  — queries with >= 2 lifetime driver-green stamps in
    DISTINCT rounds.  Staleness cycle = 2 * base.  Two independent
    official stamps, the changed-since-stamp hash manifest
    (tools/query_hashes.py — any semantic edit forces the query back
    into the window regardless of tier), and the every-round
    full-registry dual-SF self-sweep (COVERAGE.md) together justify
    the slower OFFICIAL re-certification cadence.

Unchanged absolutes, both tiers: never-stamped queries enter the
window the round they are added; a query whose function/oracle
fingerprint changed since its newest stamp enters the next window
(hash-manifest rule, ``tests/test_contract.py``).

Steady-state load per round with K new queries:  K (entrants)
+ K (the cohort from base-cycle rounds ago earning stamp #2)
+ N_mature / (2*base)  ≈  2K + N/10 — fits the 50-slot window up to
N ≈ 350 even at K = 10, where the old single-cadence math saturated
at N ≈ 200.

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

WINDOW_SIZE = 50


def stamp_history() -> tuple[dict[str, list[int]], int]:
    """(query -> sorted list of ALL green rounds, latest round seen).

    The full history, not just the newest stamp, is load-bearing:
    the ACTIVE/MATURE tier split keys off the COUNT of distinct
    green rounds.
    """
    hist: dict[str, set[int]] = {}
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
                hist.setdefault(name, set()).add(r)
    return {n: sorted(rs) for n, rs in hist.items()}, latest


def newest_stamps() -> tuple[dict[str, int], int]:
    """(query -> newest green round, latest round number seen)."""
    hist, latest = stamp_history()
    return {n: rs[-1] for n, rs in hist.items()}, latest


def base_cycle(n_registered: int) -> int:
    """ACTIVE-tier staleness cycle: max(4, ceil(N/50))."""
    return max(4, -(-n_registered // WINDOW_SIZE))


def query_cycle(name: str, hist: dict[str, list[int]], n_registered: int) -> int:
    """Tier-aware staleness cycle for one query (MATURE = 2x base)."""
    base = base_cycle(n_registered)
    return 2 * base if len(hist.get(name, [])) >= 2 else base


def must_window(
    name: str, hist: dict[str, list[int]], n_registered: int, latest: int
) -> bool:
    """True iff the query belongs in the window shipped at HEAD.

    Covers both the HARD level (stamp already stale: s <= latest - c)
    and the FORCING level (stamp breaches the moment the next ledger
    lands: s == latest + 1 - c); never-stamped is always mandatory.
    """
    rs = hist.get(name)
    if not rs:
        return True
    return rs[-1] <= latest + 1 - query_cycle(name, hist, n_registered)


def main() -> int:
    from trafik_etl_modular_spark.registry import DRIVER_WINDOW, all_queries

    names = list(all_queries())
    hist, latest = stamp_history()
    stamps = {n: rs[-1] for n, rs in hist.items()}
    never = [n for n in names if n not in hist]
    by_round: dict[int, list[str]] = {}
    for n in names:
        if n in stamps:
            by_round.setdefault(stamps[n], []).append(n)

    def fmt_stamp(n: str, s: dict[str, int]) -> str:
        return f"r{s[n]:02d}" if n in s else "never"

    def tier(n: str, h: dict[str, list[int]]) -> str:
        return "mature" if len(h.get(n, [])) >= 2 else "active"

    if "--plan-next" in sys.argv:
        # Simulate: the driver stamps the CURRENT window at round
        # latest+1; what must the round-(latest+2) window contain?
        nxt = latest + 1
        sim = {n: list(rs) for n, rs in hist.items()}
        for n in DRIVER_WINDOW:
            sim.setdefault(n, [])
            if nxt not in sim[n]:
                sim[n].append(nxt)
        mandatory = sorted(
            n for n in names if must_window(n, sim, len(names), nxt)
        )
        print(
            f"simulated ledger: r{nxt:02d} stamps the current window; "
            f"N={len(names)}, base cycle={base_cycle(len(names))} "
            f"(mature {2 * base_cycle(len(names))})"
        )
        print(f"MANDATORY for the r{nxt + 1:02d}-window ({len(mandatory)}):")
        sim_newest = {n: rs[-1] for n, rs in sim.items() if rs}
        for n in mandatory:
            print(f"  {n} ({fmt_stamp(n, sim_newest)}, {tier(n, sim)})")
        print(
            "plus: every query ADDED next round (never-stamped rule) and "
            "every query whose function/oracle CHANGES (hash-manifest rule)."
        )
        free = max(0, WINDOW_SIZE - len(mandatory))
        if len(mandatory) > WINDOW_SIZE:
            print(
                f"OVER CAPACITY: {len(mandatory)} mandatory slots exceed the "
                f"{WINDOW_SIZE}-slot window — the cadence math is broken; "
                "fix the tiers/cycle before shipping the next round."
            )
        pool = sorted(
            (n for n in names if n not in mandatory),
            key=lambda n: (
                # soonest tier-aware deadline first, then name
                sim_newest.get(n, -(10**6))
                + query_cycle(n, sim, len(names)),
                n,
            ),
        )
        print(
            f"suggested pre-rotation fill for the ~{free} free slots "
            "(soonest tier-aware deadline first):"
        )
        for n in pool[:free]:
            print(f"  {n} ({fmt_stamp(n, sim_newest)}, {tier(n, sim)})")
        return 0

    if "--window" in sys.argv:
        # Rotation suggestion: never-stamped first, then soonest
        # tier-aware deadline, excluding what is already in the
        # current window (their stamps refresh when the driver next
        # runs).
        pool = [n for n in never if n not in DRIVER_WINDOW] + sorted(
            (n for n in stamps if n not in DRIVER_WINDOW),
            key=lambda n: (
                stamps[n] + query_cycle(n, hist, len(names)),
                n,
            ),
        )
        try:
            for n in pool[:WINDOW_SIZE]:
                print(n, f"({fmt_stamp(n, stamps)}, {tier(n, hist)})")
        except BrokenPipeError:  # `| head` closed the pipe — fine
            pass
        return 0

    print(f"registered queries: {len(names)}   latest driver round: r{latest:02d}")
    print(
        f"tiers: {sum(1 for n in names if tier(n, hist) == 'mature')} mature "
        f"(cycle {2 * base_cycle(len(names))}), "
        f"{sum(1 for n in names if n in stamps and tier(n, hist) == 'active')} "
        f"active (cycle {base_cycle(len(names))}), {len(never)} never-stamped"
    )
    for n in never:
        in_w = "  [in current window]" if n in DRIVER_WINDOW else ""
        print(f"  never  {n}{in_w}")
    for r in sorted(by_round):
        age = latest - r
        stale = [
            n
            for n in by_round[r]
            if r <= latest - query_cycle(n, hist, len(names))
        ]
        tag = f"  <-- {len(stale)} STALE (tier-aware)" if stale else ""
        print(f"r{r:02d} ({len(by_round[r])} queries, age {age}){tag}")
        if stale or "--verbose" in sys.argv:
            show = stale if stale and "--verbose" not in sys.argv else sorted(by_round[r])
            for n in show:
                in_w = "  [in current window]" if n in DRIVER_WINDOW else ""
                print(f"  {n} ({tier(n, hist)}){in_w}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
