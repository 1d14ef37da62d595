"""Round-11 batch: the LPA radix guard, the bigram single-token-doc
guard (ADVICE r10), and model-pinned checks for the round's new
operators."""

from __future__ import annotations

import pytest

from trafik_etl_modular_spark.registry import REGISTRY, _load_all

SF = "/root/testdata/sf0.001"


def _q(name):
    _load_all()
    return REGISTRY[name].fn


def test_lpa_radix_guard_raises_on_oversized_id(spark):
    """A vertex id at/above _LPA_M must raise loudly instead of
    silently colliding packed (count,label) argmax keys."""
    from trafik_etl_modular_spark.queries.graph import _LPA_M, _check_lpa_radix

    bad = spark.createDataFrame([(1, _LPA_M)], "u long, v long")
    with pytest.raises(ValueError, match="packing radix"):
        _check_lpa_radix(bad)
    # ids strictly below the radix pass
    ok = spark.createDataFrame([(1, _LPA_M - 1)], "u long, v long")
    _check_lpa_radix(ok)


def test_bigram_collocations_survive_single_token_docs(spark, tmp_path):
    """ADVICE r10: sequence(1, 0) defaults to step -1 in Spark and
    produced [1, 0] → element_at(w, 0) threw on any 1-token document.
    The guarded explode must yield no bigrams for such docs (matching
    DuckDB's empty range) and still count the multi-token ones."""
    import duckdb

    docs = [
        (1, "solo"),
        (2, ""),
        (3, "alpha beta alpha beta alpha beta alpha beta alpha beta"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    rows = _q("text_bigram_collocations")(spark, d).collect()
    got = {r["bigram"]: r["n"] for r in rows}
    # only "alpha beta" reaches the min count of 5; the 1-token and
    # empty docs contribute nothing (and crash nothing)
    assert got == {"alpha beta": 5}
    # and the DuckDB oracle agrees on the same hostile fixture
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    q = REGISTRY["text_bigram_collocations"]
    drows = con.execute(q.render_sql(d)).fetchall()
    assert {(r[0], r[1]) for r in drows} == {("alpha beta", 5)}


def _duck(sql):
    import duckdb

    con = duckdb.connect()
    for tname in (
        "events orders lineitem customer supplier part documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{SF}/{tname}.parquet')"
        )
    return con.execute(sql).fetchall()


def test_kcore_matches_python_peeling(spark):
    edges = _duck(
        """SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey"""
    )
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = []
    for _ in range(3):
        keep = {x for x, nb in adj.items() if len(nb) >= 3}
        adj = {
            x: {y for y in nb if y in keep} for x, nb in adj.items() if x in keep
        }
        adj = {x: nb for x, nb in adj.items() if True}
        n_edges = sum(len(nb) for nb in adj.values()) // 2
        want.append((len(keep), n_edges))
    rows = _q("graph_kcore_peel")(spark, SF).collect()
    got = [(r["n_vertices"], r["n_edges"]) for r in sorted(rows, key=lambda r: r["round"])]
    assert got == want


def test_hits_matches_python_power_steps(spark):
    edges = _duck(
        """SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey"""
    )
    a1: dict[int, int] = {}
    by_c: dict[int, list[int]] = {}
    for c, s in edges:
        a1[s] = a1.get(s, 0) + 1
        by_c.setdefault(c, []).append(s)
    h1 = {c: sum(a1[s] for s in ss) for c, ss in by_c.items()}
    a2: dict[int, int] = {}
    for c, ss in by_c.items():
        for s in ss:
            a2[s] = a2.get(s, 0) + h1[c]
    want = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = _q("graph_hits_scores")(spark, SF).collect()
    got = [((r["suppkey"] * 2 + 1), r["auth2"]) for r in sorted(rows, key=lambda r: r["rk"])]
    assert got == want
    assert all(
        r["auth1"] == a1[r["suppkey"] * 2 + 1] for r in rows
    )


def test_acf_matches_numpy_lagged_corr(spark):
    import numpy as np

    daily = dict(
        _duck("SELECT CAST(ts AS DATE) d, COUNT(*) FROM events GROUP BY 1")
    )
    days = sorted(daily)
    series = {d: daily[d] for d in days}
    rows = _q("events_autocorrelation")(spark, SF).collect()
    assert [r["lag"] for r in rows] == list(range(1, 8))
    for r in rows:
        k = r["lag"]
        xs, ys = [], []
        for d in days:
            import datetime

            d2 = d + datetime.timedelta(days=k)
            if d2 in series:
                xs.append(series[d])
                ys.append(series[d2])
        assert r["n_pairs"] == len(xs)
        want = float(np.corrcoef(xs, ys)[0, 1])
        assert abs(r["acf_q"] - want) < 1e-6


def test_attribution_matches_python_replay(spark):
    rows = _duck(
        "SELECT user_id, event_id, ts, event_type, value FROM events"
    )
    rows.sort(key=lambda r: (r[0], r[2], r[1]))
    from collections import defaultdict

    last_seen: dict[int, str] = {}
    first_seen: dict[int, str] = {}
    n_last = defaultdict(int)
    n_first = defaultdict(int)
    for uid, _eid, _ts, etype, _v in rows:
        if etype == "purchase":
            n_last[last_seen.get(uid, "none")] += 1
            n_first[first_seen.get(uid, "none")] += 1
        if etype in ("click", "view"):
            last_seen[uid] = etype
            first_seen.setdefault(uid, etype)
    got = {
        r["channel"]: (r["n_last"], r["n_first"])
        for r in _q("events_attribution_touch")(spark, SF).collect()
    }
    for ch in got:
        assert got[ch] == (n_last.get(ch, 0), n_first.get(ch, 0))
    assert sum(v[0] for v in got.values()) == sum(n_last.values())


def test_islands_match_python_streaks(spark):
    pairs = sorted(
        set(_duck("SELECT user_id, CAST(ts AS DATE) FROM events"))
    )
    from collections import defaultdict

    per_user = defaultdict(list)
    for uid, d in pairs:
        per_user[uid].append(d)
    islands = []
    import datetime

    for uid, ds in per_user.items():
        start, prev = ds[0], ds[0]
        for d in ds[1:]:
            if (d - prev).days == 1:
                prev = d
            else:
                islands.append((uid, start, (prev - start).days + 1))
                start = prev = d
        islands.append((uid, start, (prev - start).days + 1))
    top = sorted(islands, key=lambda i: (-i[2], i[0], i[1]))[:20]
    rows = _q("window_activity_islands")(spark, SF).collect()
    got = [
        (r["user_id"], r["streak_start"], r["streak_days"])
        for r in sorted(rows, key=lambda r: r["rk"])
    ]
    assert got == top
    assert all(r["n_total_streaks"] == len(islands) for r in rows)


def test_percentile_grid_matches_order_stats(spark):
    vals = _duck(
        """SELECT event_type, CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT)
           FROM events"""
    )
    from collections import defaultdict

    per_type = defaultdict(list)
    for et, c in vals:
        per_type[et].append(c)
    rows = {r["event_type"]: r for r in _q("agg_exact_percentile_grid")(spark, SF).collect()}
    for et, cs in per_type.items():
        cs.sort()
        n = len(cs)
        r = rows[et]
        assert r["n_events"] == n
        for q in (10, 25, 50, 75, 90):
            idx = (n * q + 99) // 100
            assert r[f"p{q}_cents"] == cs[idx - 1], (et, q)


def test_epoch_shuffle_moves_and_balances(spark):
    from trafik_etl_modular_spark.functions.neutral_hash import py_nhash

    ids = [r[0] for r in _duck("SELECT doc_id FROM documents")]
    rows = {r["epoch"]: r for r in _q("sample_shuffle_epochs")(spark, SF).collect()}
    assert set(rows) == {0, 1, 2}
    # python re-derivation of the epoch-1-vs-0 shard movement
    moved = sum(
        1
        for i in ids
        if py_nhash(f"1:{i}", "shuffle-epoch") % 8 != py_nhash(f"0:{i}", "shuffle-epoch") % 8
    )
    assert rows[1]["n_shard_moved"] == moved
    for e, r in rows.items():
        assert r["n_docs"] == len(ids)
        if e > 0:
            # the permutation genuinely changes between epochs
            assert r["n_order_moved"] > r["n_docs"] // 2


def test_table_diff_matches_python_recompute(spark):
    v1 = {
        k: (pc, st)
        for k, pc, st in _duck(
            """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100
               AS BIGINT), o_orderstatus FROM orders"""
        )
    }
    v2 = {}
    for k, (pc, st) in v1.items():
        if k % 11 == 0:
            continue
        v2[k] = (pc + (100 if k % 7 == 0 else 0), "X" if k % 5 == 0 else st)
    for k, (pc, st) in v1.items():
        if k % 13 == 0:
            v2[k + 1_000_000_000] = (pc, st)
    from collections import Counter

    want = Counter()
    deltas = Counter()
    for k in set(v1) | set(v2):
        if k not in v1:
            want["added"] += 1
        elif k not in v2:
            want["removed"] += 1
        elif v1[k] != v2[k]:
            want["changed"] += 1
            deltas["changed"] += v2[k][0] - v1[k][0]
        else:
            want["identical"] += 1
    rows = {r["change_type"]: r for r in _q("merge_snapshot_table_diff")(spark, SF).collect()}
    assert {c: r["n_rows"] for c, r in rows.items()} == dict(want)
    assert rows["changed"]["price_delta_cents"] == deltas["changed"]
    assert rows["added"]["n_price_changed"] == 0


def test_streaming_bitmap_monitor_equals_batch(spark):
    got = {
        r["day"]: (r["n_users"], r["global_users"])
        for r in _q("streaming_bitmap_distinct_monitor")(spark, SF).collect()
    }
    want = dict(
        _duck(
            """SELECT CAST(ts AS DATE), COUNT(DISTINCT user_id)
               FROM events GROUP BY 1"""
        )
    )
    g = _duck("SELECT COUNT(DISTINCT user_id) FROM events")[0][0]
    assert {d: v[0] for d, v in got.items()} == want
    assert all(v[1] == g for v in got.values())


def test_rolling_median_matches_python_windows(spark):
    daily = dict(_duck("SELECT CAST(ts AS DATE), COUNT(*) FROM events GROUP BY 1"))
    import datetime

    rows = {r["day"]: r for r in _q("window_rolling_median_exact")(spark, SF).collect()}
    assert set(rows) == set(daily)
    for d, r in rows.items():
        win = sorted(
            daily[d2]
            for d2 in (d - datetime.timedelta(days=i) for i in range(7))
            if d2 in daily
        )
        assert r["n_window"] == len(win)
        assert r["median7"] == win[(len(win) + 1) // 2 - 1]
        assert r["mean7_e6"] == sum(win) * 1_000_000 // len(win)
        assert r["n"] == daily[d]


def test_linkpred_matches_python_recompute(spark):
    from collections import Counter, defaultdict

    pr = Counter()
    per_order = defaultdict(list)
    for ok, sk in _duck("SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem"):
        per_order[ok].append(sk)
    for ss in per_order.values():
        ss.sort()
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pr[(ss[i], ss[j])] += 1
    cs = sorted(pr.values())
    k = (len(cs) * 75 + 99) // 100
    thr = cs[k - 1]
    edges = {p for p, c in pr.items() if c > thr}
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    cn = Counter()
    for x, nb in nbrs.items():
        nb = sorted(nb)
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                pair = (nb[i], nb[j])
                cn[pair] += 1
    cand = {p: c for p, c in cn.items() if p not in edges}
    want = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = _q("graph_common_neighbor_linkpred")(spark, SF).collect()
    got = [
        ((r["supp_a"], r["supp_b"]), r["n_common"])
        for r in sorted(rows, key=lambda r: r["rk"])
    ]
    assert got == want
    assert all(r["n_candidates"] == len(cand) for r in rows)


def test_nprobe_sweep_structural_certificates(spark):
    """nprobe = n_centroids must reproduce brute force exactly
    (recall 1.0) and recall must be monotone in nprobe (bucket sets
    nest); candidate volume must strictly grow with nprobe."""
    rows = sorted(
        _q("sim_ivf_nprobe_sweep")(spark, SF).collect(), key=lambda r: r["nprobe"]
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8, 16]
    assert rows[-1]["recall_e6"] == 1_000_000
    assert all(r["monotone_vs_prev"] for r in rows)
    hits = [r["sum_hits"] for r in rows]
    assert hits == sorted(hits)
    vols = [r["n_candidates"] for r in rows]
    assert vols == sorted(vols) and len(set(vols)) == len(vols)


def test_agg_ivm_deletes_matches_python_and_retires_groups(spark):
    rows = _duck(
        """SELECT event_type, CAST(ts AS DATE), event_id,
           CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT) FROM events"""
    )
    from collections import defaultdict

    final = defaultdict(lambda: [0, 0])
    for et, day, eid, cents in rows:
        old = eid % 10 != 0
        keep = (old and eid % 7 != 0) or not old
        if keep:
            k = (et, day)
            final[k][0] += 1
            final[k][1] += cents
    got = {
        (r["event_type"], r["day"]): (r["cnt_ivm"], r["sum_ivm_cents"])
        for r in _q("merge_agg_ivm_deletes")(spark, SF).collect()
    }
    want = {k: tuple(v) for k, v in final.items() if v[0] > 0}
    assert got == want
    all_match = _q("merge_agg_ivm_deletes")(spark, SF).collect()
    assert all(r["ivm_matches"] for r in all_match)


def test_burstiness_is_integer_rational_of_moments(spark):
    from collections import defaultdict

    tf = defaultdict(lambda: [0, 0, 0])
    for doc_id, text in _duck("SELECT doc_id, text FROM documents"):
        from collections import Counter

        for w, c in Counter(x for x in text.split(" ") if x).items():
            tf[w][0] += 1
            tf[w][1] += c
            tf[w][2] += c * c
    scored = {
        w: ((df * s2 - s * s) * 1_000_000) // (df * s)
        for w, (df, s, s2) in tf.items()
        if df >= 5
    }
    want = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = _q("vocab_term_burstiness")(spark, SF).collect()
    assert [(r["term"], r["vmr_e6"]) for r in rows] == want


def test_assortativity_matches_numpy(spark):
    import numpy as np

    edges = _duck(
        """SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey"""
    )
    sym = edges + [(v, u) for u, v in edges]
    deg = {}
    for u, _v in sym:
        deg[u] = deg.get(u, 0) + 1
    xs = np.array([deg[u] for u, v in sym], dtype=np.float64)
    ys = np.array([deg[v] for u, v in sym], dtype=np.float64)
    want = float(np.corrcoef(xs, ys)[0, 1])
    r = _q("graph_degree_assortativity")(spark, SF).collect()[0]
    assert r["n_directed_edges"] == len(sym)
    assert abs(r["assortativity_q"] - want) < 1e-6
    # bipartite purchase graph: hubs attach to leaves
    assert r["assortativity_q"] < 0


def test_chi2_independence_uniform_does_not_reject(spark, tmp_path):
    """A planted perfectly-independent table must not reject; the
    contributions of a zero-deviation cell are 0."""
    import datetime

    rows = []
    eid = 0
    # 4 weeks x 7 days x 5 types x constant count -> exact independence
    for d in range(28):
        day = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
        for et in ("a", "b", "c", "d", "e"):
            for _ in range(3):
                rows.append((eid, day, 1, et, 1.0, "{}"))
                eid += 1
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{d}/events.parquet")
    out = _q("dq_chi2_independence")(spark, d).collect()
    assert len(out) == 35
    assert all(not r["independence_reject"] for r in out)
    assert all(r["chi2_contrib"] == 0.0 for r in out)
