"""Render the round-over-round per-query bench table from the
committed BENCH_LOCAL.json (bench.py writes the full per-query record
there on every run, with the previous run's numbers under "prev" —
the driver's 2000-char stdout tail keeps only ~60 of the per-query
timings, so this file is the complete record).

Usage: python tools/bench_compare.py [sf-key] [top-n]
       (defaults: sf0.1, 20 — rows sorted by |delta| descending)
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    key = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BENCH_LOCAL.json")
    doc = json.load(open(path))
    if key not in doc:
        print(f"no record for {key}; have: {sorted(doc)}")
        return 1
    rec = doc[key]
    prev = rec.get("prev", {})
    prev_q = prev.get("queries", {})
    print(f"# {key}: total {rec['value']}s over {rec['n_queries']} queries"
          + (f" (prev total {prev.get('value')}s)" if prev else " (no previous run)"))
    rows = []
    for name, t in rec["queries"].items():
        p = prev_q.get(name)
        rows.append((abs(t - p) if p is not None else 0.0, name, t, p))
    rows.sort(reverse=True)
    print(f"{'query':44} {'now':>8} {'prev':>8} {'ratio':>7}")
    for _, name, t, p in rows[:top]:
        ratio = f"{t / p:.2f}x" if p else "new"
        print(f"{name:44} {t:8.3f} {p if p is not None else float('nan'):8.3f} {ratio:>7}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
