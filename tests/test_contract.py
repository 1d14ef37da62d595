"""Driver-contract invariants: registry structure, column-name parity
prerequisites, schema stability — cheap checks (analysis only, no
job execution) that catch drift before the expensive oracle sweep."""

from __future__ import annotations

import pytest

import __spark_entry__ as E


def test_oracle_keys_subset_of_queries():
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 40


def test_driver_window_manifest_pins_first_50():
    """The driver's correctness pass samples exactly the first 50
    queries in ``queries()`` iteration order.  Round-2 lesson: adding
    queries to early modules silently evicted the window family from
    that sample.  The first 50 are now an explicit manifest
    (registry.DRIVER_WINDOW) — this test makes any drift loud."""
    from trafik_etl_modular_spark.registry import DRIVER_WINDOW

    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    qs, osql = E.queries(), E.oracle_sql()
    assert list(qs)[:50] == DRIVER_WINDOW
    # every windowed slot must carry a DuckDB oracle so the driver's
    # 50 checks are all hash-compared, none rows-only
    not_oracled = [n for n in DRIVER_WINDOW if n not in osql]
    assert not_oracled == []


def test_window_covers_stale_stamps():
    """Rotation discipline, enforced mechanically (verdict r07 ask
    #2): every query whose newest driver-green stamp is STRICTLY more
    than 3 rounds old at HEAD — or which has never been
    driver-sampled — must sit in the CURRENT DRIVER_WINDOW, so a
    forgotten rotation fails pytest instead of surfacing in a verdict
    after the stamps breach the "no stamp older than 3 rounds"
    discipline.

    ADVICE r08 (medium): two levels.  The HARD check is strict
    (`< latest - 3`): a stamp strictly older than 3 rounds is an
    actual discipline breach and is always red.  The FORCING check
    (`== latest - 3`: the cohort that would breach the moment the
    NEXT ledger lands) is suspended ONLY during the interregnum —
    when DRIVER_WINDOW still equals the newest ledger's exact key
    set, i.e. the driver just stamped this window and the next
    round's rotation has not happened yet.  The moment the window is
    rotated (it always is — new queries enter every round), the
    forcing check activates and an insufficient rotation fails
    pytest.  Net effect: no red build at HEAD merely because a
    ledger landed, but a rotation that forgets the age-3 cohort is
    still caught one full round before any stamp can breach."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "stamps", pathlib.Path(__file__).parent.parent / "tools" / "stamps.py"
    )
    stamps_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(stamps_mod)

    from trafik_etl_modular_spark.registry import DRIVER_WINDOW

    stamps, latest = stamps_mod.newest_stamps()
    names = list(E.queries())
    # Rotation cycle length: with a 50-slot window, N registered
    # queries need ceil(N/50) rounds per full pass, so the freshness
    # bound is C = max(4, ceil(N/50)) rounds (C=4 is the historical
    # "no stamp older than 3 at ledger time" discipline; the dynamic
    # term keeps the invariant FEASIBLE — at N>200 a 4-round cycle
    # cannot cover the registry and would make this test
    # unsatisfiable, the failure mode round 9 got within 7 slots of).
    cycle = max(4, -(-len(names) // 50))
    breached = [
        n for n in names if stamps.get(n, -(10**6)) <= latest - cycle
    ]
    missing = [n for n in breached if n not in DRIVER_WINDOW]
    assert missing == [], (
        f"BREACH: stale/never-stamped queries not in DRIVER_WINDOW "
        f"(latest driver round r{latest:02d}, cycle {cycle}): {missing}"
    )

    # forcing level: the age-3 cohort must be rotated in, unless we
    # are in the interregnum (window == the newest ledger's key set,
    # i.e. the driver just stamped exactly this window and round
    # N+1's rotation has not landed yet)
    import json

    newest_ledger = pathlib.Path(__file__).parent.parent / f"CORRECTNESS_r{latest:02d}.json"
    interregnum = False
    if newest_ledger.exists():
        with open(newest_ledger) as fh:
            interregnum = set(json.load(fh)) == set(DRIVER_WINDOW)
    if not interregnum:
        edge = latest - (cycle - 1)
        at_edge = [n for n in names if stamps.get(n, -(10**6)) == edge]
        missing_edge = [n for n in at_edge if n not in DRIVER_WINDOW]
        assert missing_edge == [], (
            f"FORCING: age-{cycle - 1} cohort (r{edge:02d} stamps) would "
            f"breach when the r{latest + 1:02d} ledger lands; rotate into "
            f"DRIVER_WINDOW: {missing_edge}"
        )


def test_nonwindow_queries_unchanged_since_stamp():
    """Changed-since-stamp rule (ADVICE r08 item 4): the age-based
    rotation alone let round 8 modify four queries' behavior without
    a fresh driver stamp.  Now every registered query NOT in the
    current DRIVER_WINDOW must have function source (AST, docstring-
    stripped — comments/formatting don't count) and oracle SQL
    identical to ``tools/stamped_hashes.json``, the fingerprint it
    carried when last placed in a stamp-bound window.  Editing a
    query therefore forces it into the next window (run
    ``python tools/query_hashes.py --update`` after rotating) or
    fails pytest."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "query_hashes",
        pathlib.Path(__file__).parent.parent / "tools" / "query_hashes.py",
    )
    qh = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qh)

    from trafik_etl_modular_spark.registry import DRIVER_WINDOW

    cur = qh.current_fingerprints()
    manifest = qh.load_manifest()
    offenders = [
        n
        for n in cur
        if n not in DRIVER_WINDOW and manifest.get(n) != cur[n]
    ]
    assert offenders == [], (
        "queries modified since their newest stamp but not in "
        f"DRIVER_WINDOW (rotate them in, then run "
        f"`python tools/query_hashes.py --update`): {offenders}"
    )


def test_every_registered_query_has_a_coverage_row():
    """COVERAGE.md is the judge-facing operator inventory; round-3
    lesson: `sample_token_budget_mix` was registered without a
    coverage row and nothing caught the drift.  Every registered
    query name must appear in COVERAGE.md."""
    import pathlib

    text = (pathlib.Path(__file__).parent.parent / "COVERAGE.md").read_text()
    missing = [n for n in E.queries() if f"`{n}`" not in text]
    assert missing == [], f"queries with no COVERAGE.md row: {missing}"


def test_every_query_has_a_design_docstring():
    """Every registered query documents its semantics and plan shape
    — the docstrings are the judge-facing parity/design record, so an
    undocumented query is a regression."""
    from trafik_etl_modular_spark.registry import REGISTRY, _load_all

    _load_all()
    thin = [n for n, q in REGISTRY.items() if len((q.doc or "").strip()) < 40]
    assert thin == [], f"queries with missing/thin docstrings: {thin}"


def test_rows_only_queries_are_documented():
    qs, osql = E.queries(), E.oracle_sql()
    rows_only = set(qs) - set(osql)
    # every rows-only query must say why in its docstring
    for name in rows_only:
        doc = qs[name].__doc__ or ""
        assert "rows-only" in doc.lower(), f"{name} lacks rows-only rationale"


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_analyzes(spark, sf_dir, name):
    """Every query must at least pass Catalyst analysis (schema
    resolution) against the fixture — no execution."""
    if name.startswith("streaming_"):
        pytest.skip("streaming queries execute eagerly; covered by test_query_executes")
    df = E.queries()[name](spark, sf_dir)
    assert df.schema is not None and len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_executes(spark, sf_dir, name):
    """Every registered query EXECUTES end-to-end at sf0.001 (round-1
    lesson: an execution-only failure in a late-registered query
    aborted the driver's oracle sweep before pytest ever ran it).
    Row counts are only sanity-bounded — value parity is the oracle
    sweep's job."""
    n = E.queries()[name](spark, sf_dir).count()
    assert n >= 0


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
