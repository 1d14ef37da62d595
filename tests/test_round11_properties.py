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
