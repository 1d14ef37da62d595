"""Property tests (hypothesis, pure math — no Spark session) for the
algebraic identities the round-12 operators plan on: the SIGNED
postings fold, the counts-of-counts Gini rank moment, Mann–Kendall's
closed forms, the KS supremum's integer exactness, the two-level
distinct-count IVM, and the disjointness of a≠b pair merges."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = settings(max_examples=300, deadline=None)


@_SETTINGS
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda d: d[0],
    ),
    data=st.data(),
)
def test_signed_df_fold_inverts_the_append(docs, data):
    """fold(fold(base, +batch), −batch) == base with zero-df terms
    retired — the involution text_bm25_delete's signed fold and the
    shrink growth-test rely on (delete is the exact inverse of append
    for a disjoint batch)."""
    n = len(docs)
    k = data.draw(st.integers(min_value=0, max_value=n))
    batch, base = docs[:k], docs[k:]

    def df(ds):
        c = Counter()
        for _id, toks in ds:
            for w in set(toks):
                c[w] += 1
        return c

    folded = df(base) + df(batch)  # append
    for w, d in df(batch).items():  # signed delete fold
        folded[w] -= d
    folded = Counter({w: c for w, c in folded.items() if c > 0})
    assert folded == df(base)


@_SETTINGS
@given(
    xs=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60)
)
def test_gini_histogram_moment_equals_per_item_ranks(xs):
    """Σ 2·i·x_i over ascending per-item ranks equals the
    counts-of-counts closed form Σ_v v·(2·g·cum_before + g(g+1)) —
    the identity that lets events_user_gini skip the global
    row_number (perf lesson 9)."""
    xs_sorted = sorted(xs)
    per_item = sum(2 * (i + 1) * x for i, x in enumerate(xs_sorted))
    cc = Counter(xs)
    cum = 0
    hist = 0
    for v in sorted(cc):
        g = cc[v]
        hist += v * (2 * g * cum + g * (g + 1))
        cum += g
    assert per_item == hist


@_SETTINGS
@given(
    xs=st.lists(
        st.integers(min_value=0, max_value=100), min_size=2, max_size=50
    )
)
def test_mann_kendall_closed_forms(xs):
    """S is antisymmetric (reversed series negates it), bounded by
    n(n−1)/2, and EQUAL to the bound on a strictly increasing series;
    the tie-corrected 18·Var(S) is nonnegative and zero iff all
    values tie — the invariants events_mann_kendall_trend plans on."""
    n = len(xs)

    def s_stat(seq):
        m = len(seq)
        return sum(
            (0 if seq[j] == seq[i] else (1 if seq[j] > seq[i] else -1))
            for i in range(m)
            for j in range(i + 1, m)
        )

    s = s_stat(xs)
    assert s == -s_stat(xs[::-1])
    assert abs(s) <= n * (n - 1) // 2
    inc = sorted(set(xs))
    if len(inc) >= 2:
        m = len(inc)
        assert s_stat(inc) == m * (m - 1) // 2
    ties = Counter(xs)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
    )
    assert var18 >= 0
    assert (var18 == 0) == (len(ties) == 1)


@_SETTINGS
@given(
    a=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=40),
    b=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=40),
)
def test_ks_integer_supremum_matches_float_ecdf(a, b):
    """max |f1·n2 − f2·n1| / (n1·n2) over merged values equals the
    float ECDF supremum (computed over the same support), and a
    sample compared to itself gives exactly 0 — dq_ks_two_sample's
    exactness claim."""
    n1, n2 = len(a), len(b)
    support = sorted(set(a) | set(b))
    num = max(
        abs(sum(1 for x in a if x <= v) * n2 - sum(1 for x in b if x <= v) * n1)
        for v in support
    )
    d_float = max(
        abs(
            sum(1 for x in a if x <= v) / n1
            - sum(1 for x in b if x <= v) / n2
        )
        for v in support
    )
    assert abs(num / (n1 * n2) - d_float) < 1e-12
    same = max(
        abs(sum(1 for x in a if x <= v) * n1 - sum(1 for x in a if x <= v) * n1)
        for v in sorted(set(a))
    )
    assert same == 0


@_SETTINGS
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # group
            st.integers(min_value=0, max_value=15),  # user
        ),
        min_size=0,
        max_size=80,
    ),
    data=st.data(),
)
def test_distinct_ivm_two_level_counting(events, data):
    """distinct-after-changelog from the two-level signed state
    equals a recompute over surviving rows, for ANY insert/delete
    split — merge_distinct_ivm's counting algebra."""
    n = len(events)
    k = data.draw(st.integers(min_value=0, max_value=n))
    base, inserts = events[:k], events[k:]
    del_idx = data.draw(
        st.sets(st.integers(min_value=0, max_value=max(k - 1, 0)), max_size=k)
    )
    deletes = [base[i] for i in del_idx if i < k]

    state = Counter(base)
    for e in inserts:
        state[e] += 1
    for e in deletes:
        state[e] -= 1
    ivm = Counter()
    for (g, u), c in state.items():
        if c > 0:
            ivm[g] += 1

    survivors = Counter(base)
    for e in deletes:
        survivors[e] -= 1
    final = [e for e, c in survivors.items() for _ in range(c)] + inserts
    truth = Counter()
    for g in set(gr for gr, _ in final):
        truth[g] = len({u for gr, u in final if gr == g})
    assert ivm == truth


@_SETTINGS
@given(
    toks=st.lists(st.sampled_from("abc"), min_size=0, max_size=30),
    data=st.data(),
)
def test_pair_merge_disjoint_for_distinct_tokens(toks, data):
    """For a pair (a, b) with a ≠ b, adjacent occurrences are
    DISJOINT in token space (overlap forces a = b), so merge-all is
    order-free: greedy left-to-right equals merging every occurrence
    — vocab_bpe_merge_rounds' rewrite contract."""
    a = data.draw(st.sampled_from("abc"))
    b = data.draw(st.sampled_from([c for c in "abc" if c != a]))

    # greedy left-to-right
    out_greedy, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out_greedy.append(a + "_" + b)
            i += 2
        else:
            out_greedy.append(toks[i])
            i += 1

    # merge-every-occurrence (mark all match starts, assert disjoint)
    starts = [
        i
        for i in range(len(toks) - 1)
        if toks[i] == a and toks[i + 1] == b
    ]
    assert all(j - i >= 2 for i, j in zip(starts, starts[1:]))
    out_all, i = [], 0
    sset = set(starts)
    while i < len(toks):
        if i in sset:
            out_all.append(a + "_" + b)
            i += 2
        else:
            out_all.append(toks[i])
            i += 1
    assert out_greedy == out_all


@_SETTINGS
@given(
    periods=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # churned
            st.integers(min_value=0, max_value=50),  # censored
        ).filter(lambda p: p[0] + p[1] > 0),
        min_size=1,
        max_size=30,
    )
)
def test_km_fixed_point_fold_tracks_exact_product(periods):
    """The e9 fixed-point survival fold (events_kaplan_meier) floors
    at most one e-9 unit per step, so it must sit within n_steps
    units BELOW the exact rational product and never above it —
    and both hit 0 exactly together."""
    # derive at-risk counts by reverse accumulation, as the query does
    risks = []
    n_risk = 0
    for d, c in reversed(periods):
        n_risk += d + c
        risks.append((n_risk, d))
    risks.reverse()

    surv = 10**9
    num_exact, den_exact = 1, 1
    for step, (n, d) in enumerate(risks, start=1):
        surv = surv * (n - d) // n
        num_exact *= n - d
        den_exact *= n
        exact_floor = 10**9 * num_exact // den_exact
        assert surv <= exact_floor
        assert exact_floor - surv <= step
        assert (surv == 0) == (num_exact == 0) or surv < step


@_SETTINGS
@given(
    counts=st.dictionaries(
        st.sampled_from("abcde"),
        st.dictionaries(
            st.sampled_from("abcde"),
            st.integers(min_value=1, max_value=1000),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_markov_fixed_point_mass_loss_bounded_by_terms(counts):
    """One power-iteration round in e9 fixed-point loses at most one
    e-9 unit per (i, j) term — the bound events_markov_stationary's
    output-visible Sigma-x documents."""
    states = sorted(counts)
    outdeg = {i: sum(counts[i].values()) for i in states}
    x = {i: 10**9 // len(states) for i in states}
    mass_in = sum(x.values())
    nxt = {}
    n_terms = 0
    for i in states:
        for j, n in counts[i].items():
            nxt[j] = nxt.get(j, 0) + x[i] * n // outdeg[i]
            n_terms += 1
    assert 0 <= mass_in - sum(nxt.values()) <= n_terms


@_SETTINGS
@given(
    n_orders=st.integers(min_value=10, max_value=10**6),
    n_a=st.integers(min_value=1, max_value=10**5),
    n_b=st.integers(min_value=1, max_value=10**5),
    data=st.data(),
)
def test_association_rule_score_inequalities(n_orders, n_a, n_b, data):
    """support <= confidence, and lift >= 1 exactly when co-occurrence
    beats independence — the integer-e6 forms keep both order
    relations (basket_association_rules)."""
    n_a, n_b = min(n_a, n_orders), min(n_b, n_orders)
    hi = min(n_a, n_b)
    n_ab = data.draw(st.integers(min_value=1, max_value=hi))
    support = n_ab * 10**6 // n_orders
    conf = n_ab * 10**6 // n_a
    lift = n_orders * n_ab * 10**6 // (n_a * n_b)
    assert support <= conf
    # e6-floor keeps the >= 1 threshold exact: lift_e6 >= 1e6 iff
    # N*n_ab >= n_a*n_b
    assert (lift >= 10**6) == (n_orders * n_ab >= n_a * n_b)


@_SETTINGS
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=2, max_size=60
    )
)
def test_binseg_gain_numerator_identity(vals):
    """(S1*n2 - S2*n1) == n1*n2*(mean1 - mean2) scaled — the split
    gain's integer numerator (events_changepoint_binseg) is zero
    exactly when the two segment means coincide."""
    n = len(vals)
    for i in range(1, n):
        s1, s2 = sum(vals[:i]), sum(vals[i:])
        n1, n2 = i, n - i
        num = s1 * n2 - s2 * n1
        mean_equal = s1 * n2 == s2 * n1
        assert (num == 0) == mean_equal


def _compress(versions: dict) -> dict:
    """Change-compress a {day: value} observation map."""
    out, prev = {}, object()
    for d in sorted(versions):
        if versions[d] != prev:
            out[d] = versions[d]
            prev = versions[d]
    return out


@_SETTINGS
@given(
    base=st.dictionaries(
        st.integers(min_value=0, max_value=60),
        st.sampled_from("ABCD"),
        min_size=1,
        max_size=25,
    ),
    late=st.dictionaries(
        st.integers(min_value=0, max_value=60),
        st.sampled_from("ABCD"),
        min_size=1,
        max_size=8,
    ),
)
def test_scd2_retro_splice_with_enclosing_window_equals_rebuild(base, late):
    """merge_scd2_retro_correction's maintenance identity: compressed
    view + base observations from each correction's ENCLOSING
    interval + late-wins merge, re-compressed, equals the full
    rebuild.  (The view alone provably does NOT satisfy this — the
    dropped-no-change-day case — which is why the window read
    exists.)"""
    hist = _compress(base)
    hdays = sorted(hist)
    win_facts = {}
    for x in late:
        lo = max((d for d in hdays if d <= x), default=None)
        hi = min((d for d in hdays if d > x), default=None)
        for d, v in base.items():
            if (lo is None or d >= lo) and (hi is None or d < hi):
                win_facts[d] = v
    merged = {**hist, **win_facts, **late}  # late wins its day
    rebuilt = _compress({**base, **late})
    assert _compress(merged) == rebuilt


@_SETTINGS
@given(
    base=st.dictionaries(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=1, max_value=100),
        min_size=1,
        max_size=30,
    ),
    batch=st.dictionaries(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=1, max_value=100),
        max_size=15,
    ),
    k=st.integers(min_value=1, max_value=8),
)
def test_topk_candidate_maintenance_equals_full_recount(base, batch, k):
    """merge_topk_ivm's soundness: for monotone counts, recounting
    ONLY old-top-k ∪ batch-touched keys reproduces the full top-k
    (untouched non-members stay below the nondecreasing k-th bar)."""

    def topk(counts):
        return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    old_top = {u for u, _ in topk(base)}
    cand = old_top | set(batch)
    merged = {u: base.get(u, 0) + batch.get(u, 0) for u in set(base) | set(batch)}
    maintained = topk({u: merged[u] for u in cand if u in merged})
    assert maintained == topk(merged)


@_SETTINGS
@given(
    groups=st.dictionaries(
        st.sampled_from("pqrst"),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10**6),  # key
                st.integers(min_value=0, max_value=10**6),  # value
            ),
            min_size=1,
            max_size=30,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=5,
    ),
    mod=st.integers(min_value=2, max_value=7),
)
def test_minmax_rescan_rule_is_exactly_sufficient(groups, mod):
    """merge_minmax_ivm_rescan's rule: a group's max changes ONLY if
    max(deleted) == stored max, so rescan-on-that-condition always
    reproduces the survivor max, and skipping the rescan otherwise is
    provably safe."""
    for rows in groups.values():
        old_max = max(v for _, v in rows)
        deleted = [(kk, v) for kk, v in rows if kk % mod == 0]
        survivors = [(kk, v) for kk, v in rows if kk % mod != 0]
        if not survivors:
            continue  # group retires entirely; out of scope here
        del_max = max((v for _, v in deleted), default=None)
        rescan = del_max is not None and del_max == old_max
        new_max = (
            max(v for _, v in survivors) if rescan else old_max
        )
        assert new_max == max(v for _, v in survivors)
