"""Property tests (hypothesis, pure math — no Spark session) for the
algebraic identities the round-11 operators plan on: the additive
postings fold, the order-statistic percentile index, the System-R
estimator's exact-on-uniform degeneracy, and the gaps-and-islands
anchor."""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = settings(max_examples=300, deadline=None)


@_SETTINGS
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # doc id
            st.lists(
                st.sampled_from("abcdefgh"), min_size=1, max_size=12
            ),  # its tokens
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda d: d[0],
    ),
    n_batches=st.integers(min_value=1, max_value=6),
)
def test_df_fold_is_additive_under_any_batching(docs, n_batches):
    """df(w) over the full corpus equals the sum of per-batch df(w)
    for ANY partition of the docs into batches — the identity
    text_bm25_append's fold_df_table and the 10-batch growth test
    rely on (each doc contributes ≤1 to df per word, and docs land
    in exactly one batch)."""
    full = Counter()
    for _id, toks in docs:
        for w in set(toks):
            full[w] += 1
    folded = Counter()
    for b in range(n_batches):
        batch = [d for d in docs if d[0] % n_batches == b]
        for _id, toks in batch:
            for w in set(toks):
                folded[w] += 1
    assert folded == full


@_SETTINGS
@given(
    n=st.integers(min_value=1, max_value=10**9),
    q=st.sampled_from([10, 25, 50, 75, 90]),
)
def test_percentile_index_is_ceil_and_in_range(n, q):
    """(n·q + 99) // 100 == ⌈n·q/100⌉ and always lands in [1, n] —
    the order-statistic pick agg_exact_percentile_grid plans (an
    out-of-range index would make the CASE pick NULL silently)."""
    idx = (n * q + 99) // 100
    assert idx == -((-n * q) // 100)
    assert 1 <= idx <= n


@_SETTINGS
@given(
    d=st.integers(min_value=1, max_value=200),
    cl=st.integers(min_value=1, max_value=1000),
    cr=st.integers(min_value=1, max_value=1000),
    m=st.integers(min_value=0, max_value=20),
)
def test_sysr_estimator_exact_on_uniform_shared_keys(d, cl, cr, m):
    """When both sides are UNIFORM over the same d keys, the MCV +
    uniform-remainder estimate equals the exact join size for any MCV
    cut m ≤ d — the degeneracy that sanity-pins
    join_cardinality_estimate's formula (skew is where estimate and
    actual may part; uniformity must be exact)."""
    m = min(m, d)
    actual = d * cl * cr
    mcv_rows = m * cl * cr
    n_left, n_right = d * cl, d * cr
    nl_mcv, nr_mcv = m * cl, m * cr
    rest = ((n_left - nl_mcv) * (n_right - nr_mcv)) // max(d - m, d - m, 1)
    est = mcv_rows + rest
    assert est == actual


@_SETTINGS
@given(
    days=st.sets(st.integers(min_value=0, max_value=120), min_size=1, max_size=60)
)
def test_islands_anchor_recovers_maximal_runs(days):
    """Grouping sorted days by (day − rank) yields exactly the maximal
    consecutive runs — the gaps-and-islands anchor
    window_activity_islands plans instead of a self-join."""
    ds = sorted(days)
    groups = defaultdict(list)
    for rank, d in enumerate(ds, start=1):
        groups[d - rank].append(d)
    # every group is one maximal consecutive run
    runs = sorted((min(g), len(g)) for g in groups.values())
    want = []
    start = prev = ds[0]
    for d in ds[1:]:
        if d == prev + 1:
            prev = d
        else:
            want.append((start, prev - start + 1))
            start = prev = d
    want.append((start, prev - start + 1))
    assert runs == sorted(want)


@_SETTINGS
@given(
    keys=st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=30),
    probes=st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=1, max_size=30
    ),
    m_words=st.integers(min_value=2, max_value=64),
)
def test_bloom_membership_never_false_negative(keys, probes, m_words):
    """Any key inserted into the Bloom word table passes its own
    probe — the structural no-false-negative guarantee
    join_bloom_semi_prefilter certifies (bit_or only ever SETS
    bits)."""
    from trafik_etl_modular_spark.functions.neutral_hash import py_nhash

    m = 32 * m_words
    words = defaultdict(int)
    for k in keys:
        h1, h2 = py_nhash(k, "b1"), py_nhash(k, "b2")
        for i in range(5):
            p = (h1 + i * h2) % m
            words[p // 32] |= 1 << (p % 32)
    for k in set(probes) | keys:
        h1, h2 = py_nhash(k, "b1"), py_nhash(k, "b2")
        hit = all(
            (words[((h1 + i * h2) % m) // 32] >> (((h1 + i * h2) % m) % 32)) & 1
            for i in range(5)
        )
        if k in keys:
            assert hit


@_SETTINGS
@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),  # key
            st.sampled_from([1, -1]),  # multiplicity
            st.integers(min_value=-1000, max_value=1000),  # value
        ),
        min_size=0,
        max_size=60,
    ),
    base=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=0,
        max_size=60,
    ),
)
def test_signed_multiplicity_ivm_identity(base, ops):
    """For ANY base state and ANY insert/delete changelog (deletes
    only of present rows), merged = old-view ⊕ Σ(mult, mult·value)
    equals a recompute of the post-state — the counting-algorithm
    identity merge_agg_ivm_deletes plans.  Deletes are constrained to
    rows actually present (a changelog invariant, not an algebra
    one)."""
    from collections import Counter, defaultdict

    present = Counter()
    for k, v in base:
        present[(k, v)] += 1
    applied = []
    for k, m, v in ops:
        if m == -1:
            if present[(k, v)] <= 0:
                continue  # delete of an absent row is not a legal changelog
            present[(k, v)] -= 1
        else:
            present[(k, v)] += 1
        applied.append((k, m, v))
    # view maintenance
    view = defaultdict(lambda: [0, 0])
    for k, v in base:
        view[k][0] += 1
        view[k][1] += v
    for k, m, v in applied:
        view[k][0] += m
        view[k][1] += m * v
    merged = {k: tuple(s) for k, s in view.items() if s[0] > 0}
    # recompute from the post-state
    recomp = defaultdict(lambda: [0, 0])
    for (k, v), c in present.items():
        recomp[k][0] += c
        recomp[k][1] += c * v
    want = {k: tuple(s) for k, s in recomp.items() if s[0] > 0}
    assert merged == want


@_SETTINGS
@given(
    tfs=st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=50)
)
def test_burstiness_rational_equals_vmr(tfs):
    """(df·Σtf² − (Σtf)²) / (df·Σtf) equals population-variance/mean
    exactly — the integer fold vocab_term_burstiness emits (checked
    against the Fraction-exact definition, not floats)."""
    from fractions import Fraction

    df = len(tfs)
    s, s2 = sum(tfs), sum(x * x for x in tfs)
    mean = Fraction(s, df)
    var = Fraction(s2, df) - mean * mean
    want = var / mean
    got = Fraction(df * s2 - s * s, df * s)
    assert got == want
    # and the e6 floor emission is the floor of the exact rational
    assert ((df * s2 - s * s) * 1_000_000) // (df * s) == (want * 1_000_000).__floor__()


@_SETTINGS
@given(
    rows=st.lists(st.integers(min_value=1, max_value=10**4), min_size=1, max_size=8),
    cols=st.lists(st.integers(min_value=1, max_value=10**4), min_size=1, max_size=9),
)
def test_chi2_expected_cells_bounded_and_near_exhaustive(rows, cols):
    """Expected-cell floors (r·c·1e9 div N) never exceed the exact
    rational and their total falls short of N·1e9 by less than the
    cell count — the floor-grid discrepancy bound that keeps the
    dq_chi2_independence statistic within one snap-grid step of the
    real-valued chi-square."""
    n = sum(rows) * 1  # treat rows as row totals of a table whose col
    # totals are scaled to the same grand total
    # construct a consistent table: grand total = sum(rows)*sum(cols)
    grand = sum(rows) * sum(cols)
    total_e9 = 0
    for r in rows:
        for c in cols:
            # row marginal = r*sum(cols), col marginal = c*sum(rows)
            rm, cm = r * sum(cols), c * sum(rows)
            e = (rm * cm * 1_000_000_000) // grand
            assert e <= rm * cm * 1_000_000_000 / grand
            total_e9 += e
    assert grand * 1_000_000_000 - total_e9 < len(rows) * len(cols)
