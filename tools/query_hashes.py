"""Changed-since-stamp ledger (ADVICE r08 item 4).

The driver-stamp rotation rule in ``tools/stamps.py`` is AGE-based: a
query re-enters ``DRIVER_WINDOW`` when its newest green stamp gets
old.  That rule alone lets a query whose FUNCTION or ORACLE SQL was
modified ship without a fresh driver-sampled stamp (round 8 shipped
four such edits — all verified by the builder's own dual-SF sweep,
but the official ledger never saw them).  This tool closes the gap
with a content rule:

    every registered query NOT in the current DRIVER_WINDOW must have
    source + oracle SQL identical to what its newest stamp tested.

Mechanics: each query's fingerprint is sha256 over (a) the AST dump
of its registered function with the docstring stripped — so comment,
formatting, and docstring edits do NOT force a re-stamp, while any
semantic edit does — and (b) its oracle SQL string verbatim.
``tools/stamped_hashes.json`` records the fingerprint each query had
when it was last placed in a stamp-bound window.
``tests/test_contract.py::test_nonwindow_queries_unchanged_since_stamp``
asserts the rule.

Round workflow:
  1. At round start, BEFORE editing DRIVER_WINDOW:
     ``python tools/query_hashes.py --update``   (refreshes the
     outgoing window members at the source the driver just stamped)
  2. Rotate DRIVER_WINDOW, then run ``--update`` again (adds/refreshes
     the incoming members, including brand-new queries).
  3. Mid-round, after editing any window member: run ``--update``
     again (members are exempt from the test while in the window, so
     this can also simply happen at the end of the round).
Editing a NON-window query fails pytest until it is either rotated
into the window (so the next ledger stamps the new behavior) or
reverted.

Known limitation, by design: the fingerprint covers the registered
function body and SQL only — an edit to a shared helper the function
calls does not change the fingerprint.  Helper-level edits are what
the full dual-SF oracle sweep (run every round, COVERAGE.md) exists
to catch.

Seeded at round 9: the round-8 judge independently verified all 188
registered queries at this exact source at BOTH sf0.01 and sf0.1
(VERDICT.md r08), so the initial manifest records current fingerprints
for every query as stamp-faithful.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "tools", "stamped_hashes.json")


def _strip_docstring(node: ast.AST) -> ast.AST:
    for sub in ast.walk(node):
        body = getattr(sub, "body", None)
        if (
            isinstance(body, list)
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            sub.body = body[1:] or [ast.Pass()]
    return node


def _ast_dump(obj) -> str:
    src = textwrap.dedent(inspect.getsource(obj))
    return ast.dump(_strip_docstring(ast.parse(src)))


def query_fingerprint(fn, sql) -> str:
    # DERIVED oracles register a callable sf_dir -> SQL; fingerprint its
    # builder source the same way (rendering would execute Spark jobs)
    sql_part = _ast_dump(sql) if callable(sql) else (sql or "")
    payload = _ast_dump(fn) + "\0" + sql_part
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def current_fingerprints() -> dict[str, str]:
    from trafik_etl_modular_spark.registry import REGISTRY, _load_all

    _load_all()
    return {n: query_fingerprint(q.fn, q.sql) for n, q in REGISTRY.items()}


def load_manifest() -> dict[str, str]:
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as fh:
            return json.load(fh)
    return {}


def main() -> int:
    from trafik_etl_modular_spark.registry import (
        DRIVER_WINDOW,
        PENDING_RESTAMP_R13,
    )

    cur = current_fingerprints()
    manifest = load_manifest()
    # ADVICE r12 item 1: PENDING_RESTAMP_R13 used to be unioned in as
    # window-equivalent, which exempted those 15 names from the
    # changed-since-stamp guard indefinitely.  The r13 rotation put all
    # 15 INSIDE DRIVER_WINDOW (test_pending_restamp_rotates_into_r13
    # asserts it), so the exemption is now exactly the window — any
    # further edit to a query outside it is flagged again.
    assert all(n in DRIVER_WINDOW for n in PENDING_RESTAMP_R13), (
        "pending-restamp names must sit inside DRIVER_WINDOW since the "
        "r13 rotation; do not re-widen the exemption"
    )
    winlike = set(DRIVER_WINDOW)

    if "--seed" in sys.argv:
        # one-time round-9 initialization (judge-verified full surface)
        manifest = dict(sorted(cur.items()))
    elif "--update" in sys.argv:
        for n in winlike:
            manifest[n] = cur[n]
        manifest = dict(sorted(manifest.items()))
    else:
        changed = [
            n
            for n in cur
            if n not in winlike and manifest.get(n) not in (None, cur[n])
        ]
        unknown = [n for n in cur if n not in manifest and n not in winlike]
        print(f"queries: {len(cur)}  manifest: {len(manifest)}")
        print(f"changed-outside-window: {changed or 'none'}")
        print(f"never-fingerprinted-outside-window: {unknown or 'none'}")
        return 1 if (changed or unknown) else 0

    with open(MANIFEST, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {len(manifest)} fingerprints -> {MANIFEST}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
