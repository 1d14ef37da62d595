"""Round-10 second batch: MMR re-ranking, JL random projection,
label-propagation communities — each pinned against an independent
driver-side model (the DuckDB oracle already checks cross-engine
parity; these check the ALGORITHM against a from-scratch
reimplementation)."""

from __future__ import annotations

import duckdb

from trafik_etl_modular_spark.registry import REGISTRY, _load_all

SF = "/root/testdata/sf0.001"


def _q(name):
    _load_all()
    return REGISTRY[name].fn


def _embeddings():
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    return {r[0]: [float(x) for x in r[1]] for r in rows}


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    return num / (na * nb)


def test_mmr_matches_greedy_model(spark):
    emb = _embeddings()
    qv = emb[0]
    rel = {i: _cos(v, qv) for i, v in emb.items() if i != 0}
    pool = sorted(rel, key=lambda i: (-rel[i], i))[:10]
    selected = [min(pool, key=lambda i: (-rel[i], i))]
    while len(selected) < 5:
        best = None
        for c in pool:
            if c in selected:
                continue
            ms = max(_cos(emb[c], emb[s]) for s in selected)
            mmr = 0.7 * rel[c] - 0.3 * ms
            key = (-mmr, c)
            if best is None or key < best[0]:
                best = (key, c)
        selected.append(best[1])

    rows = _q("sim_mmr_rerank")(spark, SF).collect()
    assert [r["vec_id"] for r in sorted(rows, key=lambda r: r["step"])] == selected
    # diversification actually engaged: the greedy pick order differs
    # from pure relevance order (else MMR degenerates on this corpus)
    assert selected != pool[:5]


def test_random_projection_matches_numpy(spark):
    import numpy as np

    from trafik_etl_modular_spark.queries.llmdata import _RP_SIGNS

    emb = _embeddings()
    panel = {i: v for i, v in emb.items() if i % 50 == 0}
    R = np.array(_RP_SIGNS, dtype=np.float64)  # (16, 64)
    rows = _q("sim_random_projection_jl")(spark, SF).collect()
    ids = sorted(panel)
    want_pairs = [(a, b) for a in ids for b in ids if a < b]
    assert [(r["id_a"], r["id_b"]) for r in rows] == want_pairs
    for r in rows:
        va, vb = np.array(panel[r["id_a"]]), np.array(panel[r["id_b"]])
        d2o = float(((va - vb) ** 2).sum())
        d2p = float(((R @ va - R @ vb) ** 2).sum())
        # engine values are e9-quantized folds; numpy sums in a
        # different order — compare loosely, the oracle pins exactness
        assert abs(r["d2_orig_q"] - d2o) / d2o < 1e-6
        assert abs(r["d2_proj_scaled_q"] - d2p / 16) / max(d2p / 16, 1e-9) < 1e-6
        assert r["within_10x"]
    # JL at d'=16: the panel's MEDIAN distortion should sit near 1
    ds = sorted(r["distortion_q"] for r in rows)
    assert 0.5 < ds[len(ds) // 2] < 2.0


def test_label_propagation_matches_sync_model(spark):
    edges = duckdb.sql(
        f"""
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM '{SF}/orders.parquet' JOIN '{SF}/lineitem.parquet'
          ON o_orderkey = l_orderkey
        """
    ).fetchall()
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    lbl = {x: x for x in adj}
    for _ in range(3):
        new = {}
        for x, nbrs in adj.items():
            counts: dict[int, int] = {}
            for n in nbrs:
                counts[lbl[n]] = counts.get(lbl[n], 0) + 1
            new[x] = min(
                counts, key=lambda c: (-counts[c], c)
            )  # most frequent, smallest label ties
        lbl = new
    comms: dict[int, list[int]] = {}
    for x, c in lbl.items():
        comms.setdefault(c, []).append(x)
    want = sorted(
        ((c, len(m), min(m), max(m)) for c, m in comms.items()),
        key=lambda t: (-t[1], t[0]),
    )[:20]

    rows = _q("graph_label_propagation")(spark, SF).collect()
    got = [(r["community"], r["n_members"], r["min_member"], r["max_member"]) for r in rows]
    assert got == want
    assert all(r["n_communities"] == len(comms) for r in rows)


def test_cusum_matches_recursive_model_and_flags_plant(spark, tmp_path):
    """The prefix-form CUSUM equals the textbook recursion, and a
    planted level shift flags from the shift onward."""
    import datetime

    base = datetime.date(2024, 3, 4)
    rows, eid = [], 0
    counts = [100] * 20
    for d in range(10, 20):
        counts[d] = 160  # level shift at day 10
    for d, n in enumerate(counts):
        day = base + datetime.timedelta(days=d)
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime.combine(day, datetime.time(9)), eid % 40,
                 "click", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = _q("dq_cusum_changepoint")(spark, str(tmp_path)).collect()
    assert len(out) == 20
    mean_e6 = out[0]["mean_e6"]
    # textbook recursion S_t = max(0, S_{t-1} + (x_t - mu))
    s = 0
    for r in out:
        s = max(0, s + r["n"] * 1000000 - mean_e6)
        assert r["s_e6"] == s
        assert r["changepoint"] == (s > 2 * mean_e6)
    flagged_days = [r["day"].day - base.day for r in out if r["changepoint"]]
    assert flagged_days and min(flagged_days) >= 10


def test_bitmap_rollup_certificates_hold(spark):
    rows = _q("agg_bitmap_distinct_rollup")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["day_matches"] and r["merged_matches"]
        assert r["n_users_exact"] == r["n_users_bitmap"]
    # merged global equals the union of per-day sets, not their sum
    assert rows[0]["global_exact"] <= sum(r["n_users_exact"] for r in rows)


def test_transition_matrix_is_row_stochastic_and_recounts(spark):
    rows = _q("events_transition_matrix")(spark, SF).collect()
    assert rows
    # row-normalization: per prev_type, Σ n == n_out and p_e6 sums to
    # ~1e6 (floor division loses < |types| per row)
    by_prev: dict[str, list] = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, grp in by_prev.items():
        n_out = grp[0]["n_out"]
        assert sum(r["n"] for r in grp) == n_out
        s = sum(r["p_e6"] for r in grp)
        assert 1000000 - len(grp) <= s <= 1000000
        for r in grp:
            assert r["p_e6"] == (r["n"] * 1000000) // n_out
    # independent recount of one cell from the raw events
    seq = duckdb.sql(
        f"""
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
        FROM '{SF}/events.parquet'
        """
    ).fetchall()
    want = sum(1 for _, t_, p in seq if p == rows[0]["prev_type"] and t_ == rows[0]["next_type"])
    assert rows[0]["n"] == want


def test_collocations_match_lift_model(spark):
    toks = [
        r[0].split(" ")
        for r in duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet'").fetchall()
    ]
    uni: dict[str, int] = {}
    bi: dict[str, int] = {}
    for ws in toks:
        for w in ws:
            if w:
                uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[a + " " + b] = bi.get(a + " " + b, 0) + 1
    T = sum(uni.values())
    scored = [
        (g, n, (n * T * 1000000) // (uni[g.split(" ")[0]] * uni[g.split(" ")[1]]))
        for g, n in bi.items()
        if n >= 5
    ]
    want = sorted(scored, key=lambda t: (-t[2], t[0]))[:20]
    rows = _q("text_bigram_collocations")(spark, SF).collect()
    assert [(r["bigram"], r["n"], r["lift_e6"]) for r in rows] == want


def test_temporal_split_partitions_and_leakage(spark):
    rows = _q("sample_temporal_split_leakage")(spark, SF).collect()
    assert [r["split"] for r in rows] == ["test", "train", "val"]
    n_events = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    # splits PARTITION the events exactly
    assert sum(r["n_events"] for r in rows) == n_events
    # leakage recount: users with events in both train and test
    lo = duckdb.sql(
        f"SELECT MIN(CAST(ts AS DATE)) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    spans = duckdb.sql(
        f"""
        SELECT user_id,
               MAX(CASE WHEN CAST(ts AS DATE) - DATE '{lo}' < 24 THEN 1 ELSE 0 END) t1,
               MAX(CASE WHEN CAST(ts AS DATE) - DATE '{lo}' >= 27 THEN 1 ELSE 0 END) t3
        FROM '{SF}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    want = sum(1 for _, a, b in spans if a and b)
    assert all(r["n_users_train_test"] == want for r in rows)
    total_users = len(spans)
    assert rows[0]["train_test_leak_ratio_e6"] == (want * 1000000) // total_users


def test_streaming_cusum_equals_recursion_over_buckets(spark):
    """The per-micro-batch sequential statistic equals the textbook
    recursion over the same bucket volumes — and every staged bucket
    arrived as its own batch, in order."""
    rows = _q("streaming_cusum_monitor")(spark, SF).collect()
    want = duckdb.sql(
        f"""
        WITH lo AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM '{SF}/events.parquet'),
        b AS (SELECT CAST((CAST(ts AS DATE) - lo.d0) // 3 AS BIGINT) AS bucket,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM '{SF}/events.parquet' CROSS JOIN lo GROUP BY 1 ORDER BY 1)
        SELECT bucket, n FROM b
        """
    ).fetchall()
    assert [(r["bucket"], r["n"]) for r in rows] == want
    mu = want[0][1] * 1000000
    s = 0
    for r, (_, n) in zip(rows, want):
        s = max(0, s + n * 1000000 - mu)
        assert r["s_e6"] == s and r["mu_e6"] == mu
        assert r["alarm"] == (s > 2 * mu)


def test_phrase_search_recounts_from_raw_text(spark):
    rows = _q("text_phrase_search")(spark, SF).collect()
    docs = {
        r[0]: r[1].split(" ")
        for r in duckdb.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    }

    def occurrences(phrase, toks):
        a, b = phrase.split(" ")
        return sum(1 for x, y in zip(toks, toks[1:]) if x == a and y == b)

    by_phrase: dict[int, list] = {}
    for r in rows:
        by_phrase.setdefault(r["phrase_id"], []).append(r)
    for pid, grp in by_phrase.items():
        phrase = grp[0]["phrase"]
        model = sorted(
            ((occurrences(phrase, tk), -d) for d, tk in docs.items() if occurrences(phrase, tk) > 0),
            reverse=True,
        )
        want_top = [(-d, n) for n, d in model[: len(grp)]]
        assert [(r["doc_id"], r["n_occurrences"]) for r in sorted(grp, key=lambda r: r["rk"])] == want_top
        assert grp[0]["n_docs_matched"] == len(model)
        assert grp[0]["n_total_occurrences"] == sum(n for n, _ in model)


def test_pearson_matches_numpy(spark):
    import numpy as np

    rows = _q("agg_pearson_correlation")(spark, SF).collect()
    assert len(rows) == 6
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    data = duckdb.sql(
        f"SELECT {', '.join(cols)} FROM '{SF}/lineitem.parquet'"
    ).fetchnumpy()
    for r in rows:
        x, y = data[r["col_x"]], data[r["col_y"]]
        want = float(np.corrcoef(x, y)[0, 1])
        # engine uses exact integer-cents moments; numpy uses float
        # moments on the raw doubles — agreement to 1e-6 suffices
        # (the ORACLE pins cross-engine exactness)
        assert abs(r["corr_q"] - want) < 1e-6, (r, want)
        assert -1.0 <= r["corr_q"] <= 1.0
