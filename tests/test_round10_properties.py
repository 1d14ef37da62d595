"""Property tests (hypothesis, pure math — no Spark session) for the
ALGEBRAIC REWRITES the round-10 operators plan on.  Each rewrite lets
a sequential/recursive definition run as declarative joins+windows;
if the identity were wrong for some input, the engine would be wrong
on some data — these pin the identities over the whole input space,
not just the fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = settings(max_examples=300, deadline=None)


@_SETTINGS
@given(
    xs=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60),
    mu=st.integers(min_value=0, max_value=10**12),
)
def test_cusum_prefix_form_equals_recursion(xs, mu):
    """S_t = max(0, S_{t−1} + d_t)  ≡  P_t − min(0, min_{j≤t} P_j)
    — the rewrite dq_cusum_changepoint plans as two cumulative
    windows."""
    s_rec = 0
    p = 0
    min_p = 0
    for x in xs:
        d = x * 1000000 - mu
        s_rec = max(0, s_rec + d)
        p += d
        min_p = min(min_p, p)
        s_prefix = p - min(min_p, 0)
        assert s_prefix == s_rec


_M = 1 << 33


@_SETTINGS
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=1 << 29),  # cnt
            st.integers(min_value=0, max_value=_M - 1),  # lbl
        ),
        min_size=1,
        max_size=30,
    )
)
def test_lpa_mode_packing_argmax(pairs):
    """max(cnt·M + (M−1−lbl)) decodes to (max cnt, min lbl among
    ties) — the single-aggregation mode graph_label_propagation
    plans instead of a count+max+join chain."""
    enc = max(c * _M + (_M - 1 - l) for c, l in pairs)
    got = _M - 1 - (enc % _M)
    best_cnt = max(c for c, _ in pairs)
    want = min(l for c, l in pairs if c == best_cnt)
    assert got == want
    # and the packed value never overflows a signed 64-bit long
    assert enc < (1 << 63)


@_SETTINGS
@given(
    tf=st.integers(min_value=1, max_value=10**4),
    total=st.integers(min_value=1, max_value=10**11),
    dl=st.integers(min_value=1, max_value=10**5),
    n=st.integers(min_value=1, max_value=10**9),
    df=st.integers(min_value=1, max_value=10**9),
)
def test_bm25_integer_folding_bounds_and_shape(tf, total, dl, n, df):
    """Within the DOCUMENTED domain (tf·T < 4.2·10^14 — the bound
    this test originally discovered by failing outside it), the
    folded BM25 integer formulas stay in signed 64 bits, the tf-part
    stays strictly under its 2.2 ceiling (the MaxScore bound), and
    the score is monotone in tf."""
    from hypothesis import assume

    assume(tf * total < 42 * 10**13)
    df = min(df, n)
    idf_num = (2 * (n - df) + 1) * 1000000
    idf_den = 2 * df + 1
    a = idf_num // idf_den
    b_num = 22 * tf * total * 1000
    b_den = 10 * tf * total + 3 * total + 9 * dl * n
    b = b_num // b_den
    contrib = a * b // 1000
    for v in (idf_num, b_num, b_den, a * b):
        assert 0 <= v < (1 << 63)
    assert b < 2200  # strict MaxScore ceiling
    assert contrib <= (a * 2200) // 1000
    # monotone in tf (same doc, same term)
    b2 = (22 * (tf + 1) * total * 1000) // (
        10 * (tf + 1) * total + 3 * total + 9 * dl * n
    )
    assert b2 >= b


@_SETTINGS
@given(
    n_tok=st.integers(min_value=1, max_value=500),
    w=st.integers(min_value=2, max_value=64),
    stride=st.integers(min_value=1, max_value=64),
)
def test_chunk_tiling_covers_iff_stride_le_window(n_tok, w, stride):
    """Stride starts 0, stride, 2·stride … < n_tok with width-w
    windows tile the whole token range exactly when stride ≤ w — the
    invariant behind text_chunk_windows' reaches_end certificate
    (the query pins stride=24 < w=32)."""
    starts = list(range(0, n_tok, stride))
    covered: set[int] = set()
    for s in starts:
        covered.update(range(s, min(s + w, n_tok)))
    last = starts[-1]
    if stride <= w:
        assert covered == set(range(n_tok))
        # and the final chunk reaches the end — the reaches_end
        # certificate is meaningful ONLY under stride ≤ window
        # (stride > window leaves an uncovered tail, which this test
        # originally discovered by asserting it unconditionally)
        assert min(last + w, n_tok) == n_tok
    else:
        # with stride > window a tail can stay uncovered — the shape
        # the query's stride=24 < w=32 pin rules out
        assert len(covered) <= n_tok


@_SETTINGS
@given(
    days=st.lists(
        st.sets(st.integers(min_value=0, max_value=2000), max_size=60),
        min_size=1,
        max_size=12,
    )
)
def test_bitmap_merge_equals_set_union(days):
    """bit_or-merged per-day word tables popcount to exactly the
    union's cardinality — the agg_bitmap_distinct_rollup certificate,
    over arbitrary id sets."""
    def words(ids):
        w: dict[int, int] = {}
        for i in ids:
            w[i // 32] = w.get(i // 32, 0) | (1 << (i % 32))
        return w

    merged: dict[int, int] = {}
    for day in days:
        for k, v in words(day).items():
            merged[k] = merged.get(k, 0) | v
    popcount = sum(bin(v).count("1") for v in merged.values())
    assert popcount == len(set().union(*days))
    # per-day counts exact too
    for day in days:
        assert sum(bin(v).count("1") for v in words(day).values()) == len(day)
