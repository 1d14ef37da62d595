"""Benford / spatial / triangle operators added in round 9."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from trafik_etl_modular_spark.queries.dq import dq_benford_digit_test
from trafik_etl_modular_spark.queries.graph import graph_triangle_count
from trafik_etl_modular_spark.queries.spatial import (
    _GRID,
    _R2,
    join_spatial_neighbor_pairs,
)


def test_benford_structure(spark, sf_dir):
    rows = dq_benford_digit_test(spark, sf_dir).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    n = sum(r["n_obs"] for r in rows)
    assert n > 0
    # expected counts follow log10(1 + 1/d) to the e9 grid
    for r in rows:
        want = n * round(math.log10(1 + 1 / r["digit"]) * 1e9)
        assert r["expected_e9"] == want
    # chi2_total equals the exact sum of snapped contributions
    total = sum(round(r["chi2_contrib"] * 1e9) for r in rows) / 1e9
    assert abs(rows[0]["chi2_total"] - total) < 1e-9
    # all rows carry the same verdict
    assert len({r["benford_reject"] for r in rows}) == 1


def test_benford_conforming_population(spark):
    """A geometric population (10^u for uniform u) IS Benford —
    the statistic must accept it, pinning the test's power in both
    directions (the TPC-H fixture rejects)."""
    import trafik_etl_modular_spark.queries.dq as dq

    vals = [(10.0 ** (i / 997.0),) for i in range(997)]
    df = spark.createDataFrame(vals, ["o_totalprice"])
    # reuse the query body against a substituted orders frame
    cents = df.where(F.col("o_totalprice") > 0).select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    )
    obs = (
        cents.select(F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("d"))
        .groupBy("d")
        .count()
        .collect()
    )
    got = {r["d"]: r["count"] for r in obs}
    n = sum(got.values())
    chi2 = sum(
        (got.get(d, 0) - n * math.log10(1 + 1 / d)) ** 2 / (n * math.log10(1 + 1 / d))
        for d in range(1, 10)
    )
    assert chi2 < 15.507, f"geometric population must conform, chi2={chi2:.2f}"


def test_spatial_pairs_exact_bruteforce(spark):
    """Grid-join results equal the O(N^2) brute force at sf0.001 —
    pair completeness (no pair lost at a cell boundary) and no
    duplicates (each pair found via exactly one offset)."""
    sf = "/root/testdata/sf0.001"
    rows = join_spatial_neighbor_pairs(spark, sf).collect()
    from trafik_etl_modular_spark.functions.neutral_hash import py_nhash

    ev = spark.read.parquet(f"{sf}/events.parquet").select("event_id").collect()
    pts = {}
    for r in ev:
        i = r["event_id"]
        pts[i] = (py_nhash(i, "sx") % _GRID, py_nhash(i, "sy") % _GRID)
    brute = []
    ids = sorted(pts)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
            if d2 <= _R2:
                brute.append((d2, a, b))
    brute.sort()
    got = [(r["dist2"], r["id_a"], r["id_b"]) for r in rows]
    assert got == brute[: len(got)]
    assert rows[0]["n_pairs_total"] == len(brute)


def test_triangle_count_exact_bruteforce(spark):
    """Engine (degree-oriented) triangle count equals a brute-force
    recount of the same co-supplier graph at sf0.001."""
    sf = "/root/testdata/sf0.001"
    row = graph_triangle_count(spark, sf).collect()[0]
    li = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .collect()
    )
    by_order = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_suppkey"])
    from collections import Counter

    co = Counter()
    for supps in by_order.values():
        ss = sorted(supps)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                co[(ss[i], ss[j])] += 1
    edges = {p for p, c in co.items() if c >= 3}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tris = 0
    for u, v in edges:
        tris += len(
            {w for w in adj[u] & adj[v] if (min(u, w), max(u, w)) in edges
             and (min(v, w), max(v, w)) in edges and w > v}
        )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    assert row["n_edges"] == len(edges)
    assert row["n_vertices"] == len(adj)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tris
    if wedges:
        assert row["transitivity_e9"] == 3 * tris * 1000000000 // wedges


def test_cdc_tombstone_semantics(spark, sf_dir):
    """Keys whose NEWEST op is a tombstone are absent; re-insert
    after delete survives; every emitted row is non-deleted."""
    from trafik_etl_modular_spark.queries.incremental_views import (
        merge_cdc_apply_tombstones,
    )

    rows = merge_cdc_apply_tombstones(spark, sf_dir).collect()
    assert rows
    got = {r["user_id"]: r for r in rows}
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    for uid, es in by_user.items():
        es.sort(key=lambda e: (e["ts"], e["event_id"]))
        last_deleted = es[-1]["event_type"] == "error"
        if last_deleted:
            assert uid not in got, f"user {uid} has trailing tombstone"
        else:
            assert uid in got, f"user {uid} alive but missing"
            assert got[uid]["last_op"] != "D"
            assert got[uid]["n_deletes_seen"] == sum(
                1 for e in es if e["event_type"] == "error"
            )
    # the fixture must exercise BOTH branches
    assert len(got) < len(by_user) or not any(
        es[-1]["event_type"] == "error" for es in by_user.values()
    )
    assert any(r["n_deletes_seen"] > 0 for r in rows), "no survivable-delete case"


def test_join_ivm_certificate(spark, sf_dir):
    from trafik_etl_modular_spark.queries.incremental_views import merge_join_ivm

    rows = merge_join_ivm(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["ivm_matches_full"] is True
        assert r["n_old"] + r["n_delta"] == r["n_total"]
    # the cursor must split the stream non-trivially
    assert sum(r["n_old"] for r in rows) > 0
    assert sum(r["n_delta"] for r in rows) > 0


def test_spatial_knn_exact_bruteforce(spark):
    """Probe-panel kNN equals the O(|panel|·N) brute force at
    sf0.001 — completeness at cell boundaries, the self-exclusion,
    and the (dist2, id) tiebreak."""
    from trafik_etl_modular_spark.functions.neutral_hash import py_nhash
    from trafik_etl_modular_spark.queries.spatial import (
        _KNN_K,
        _KNN_R2,
        join_spatial_knn_probes,
    )

    sf = "/root/testdata/sf0.001"
    rows = join_spatial_knn_probes(spark, sf).collect()
    ev = spark.read.parquet(f"{sf}/events.parquet").select("event_id").collect()
    pts = {
        r["event_id"]: (
            py_nhash(r["event_id"], "sx") % _GRID,
            py_nhash(r["event_id"], "sy") % _GRID,
        )
        for r in ev
    }
    expect = []
    for pid in sorted(pts):
        if pid % 97 != 0:
            continue
        px, py_ = pts[pid]
        cand = sorted(
            ((px - x) ** 2 + (py_ - y) ** 2, nid)
            for nid, (x, y) in pts.items()
            if nid != pid and (px - x) ** 2 + (py_ - y) ** 2 <= _KNN_R2
        )
        for rk, (d2, nid) in enumerate(cand[:_KNN_K], start=1):
            expect.append((pid, rk, nid, d2))
    got = [(r["probe_id"], r["rk"], r["neighbor_id"], r["dist2"]) for r in rows]
    assert got == expect
    assert expect, "panel must have at least one neighbor at sf0.001"
