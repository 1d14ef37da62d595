"""Round-10 additions: BM25 retrieval family, training shuffle /
chunking, seasonal DQ — semantics DuckDB parity alone can't pin
(ranking monotonicity, pruning-bound dominance, permutation and
tiling invariants, planted anomalies)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.plans.audit import audit
from trafik_etl_modular_spark.registry import REGISTRY, _load_all

SF = "/root/testdata/sf0.001"


def _q(name):
    _load_all()
    return REGISTRY[name].fn


def test_bm25_ranking_matches_exhaustive_model(spark):
    """The engine's top-5 equals a driver-side exhaustive re-scoring
    with the same integer formula — independent of the posting-join
    plan."""
    rows = _q("text_bm25_topk")(spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    n_docs = len(docs)
    total = sum(len(t) for t in docs.values())
    df = {}
    for toks in docs.values():
        for w in set(toks):
            df[w] = df.get(w, 0) + 1

    def score(query, toks):
        dl = len(toks)
        s = 0
        for w in set(query.split()) & set(toks):
            tf = toks.count(w)
            idf = ((2 * (n_docs - df[w]) + 1) * 1000000) // (2 * df[w] + 1)
            tfp = (22 * tf * total * 1000) // (
                10 * tf * total + 3 * total + 9 * dl * n_docs
            )
            s += (idf * tfp) // 1000
        return s

    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(r)
    assert set(by_query) == {1, 2, 3, 4, 5}
    for qid, got in by_query.items():
        got.sort(key=lambda r: r["rk"])
        qtext = got[0]["query_text"]
        exhaustive = sorted(
            ((score(qtext, t), -d) for d, t in docs.items() if score(qtext, t) > 0),
            reverse=True,
        )[:5]
        want = [(-d, s) for s, d in exhaustive]
        have = [(r["doc_id"], r["score_e6"]) for r in got]
        assert have == want, (qid, have, want)


def test_bm25_maxscore_certificate_and_plan(spark):
    out = _q("text_bm25_maxscore_prune")(spark, SF)
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        assert r["prune_safe"] is True
        assert 0 <= r["n_prunable"] <= r["n_candidates"]
        assert r["prune_ratio_e6"] == (r["n_prunable"] * 1000000) // r["n_candidates"]
    from trafik_etl_modular_spark.plans.audit import explain

    a = audit(out)
    assert not a.has_python_eval
    # the only nested-loop join allowed is the 1-row corpus-constant
    # broadcast (registry-wide hygiene test allowlists it); a true
    # cartesian candidate product must never appear
    assert "CartesianProduct" not in explain(out, "simple")


def test_shuffle_shards_is_exact_permutation(spark):
    rows = _q("sample_shuffle_shards")(spark, SF).collect()
    assert [r["shard"] for r in rows] == list(range(8))
    n_total = rows[0]["n_total"]
    assert sum(r["n_docs"] for r in rows) == n_total
    # hash scatter: no shard is empty or hogs the corpus
    sizes = [r["n_docs"] for r in rows]
    assert min(sizes) > 0 and max(sizes) < n_total // 2
    # first/last are real docs and belong to their shard under the
    # same hash arithmetic the query used
    from trafik_etl_modular_spark.functions.neutral_hash import py_nhash

    for r in rows:
        for c in ("first_doc_id", "last_doc_id"):
            assert py_nhash(r[c], "shuffle") % 8 == r["shard"]


def test_chunk_windows_tile_every_doc(spark):
    rows = _q("text_chunk_windows")(spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id]
        chunks.sort(key=lambda r: r["chunk_idx"])
        # contiguous stride starts, exact slices, final chunk flagged
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i and c["chunk_start"] == 24 * i
            want = toks[c["chunk_start"] : c["chunk_start"] + 32]
            assert c["chunk_text"] == " ".join(want)
            assert c["chunk_len"] == len(want)
            assert c["reaches_end"] == (c["chunk_start"] + len(want) >= len(toks))
        assert chunks[-1]["reaches_end"]
        # full coverage: union of windows is the whole token range
        covered = max(c["chunk_start"] + c["chunk_len"] for c in chunks)
        assert covered == len(toks)


def test_seasonal_decompose_flags_planted_anomaly(spark, tmp_path):
    """Drive the same logic over a synthetic table with perfect weekly
    shape plus one planted 3x day — exactly that day must flag."""
    import datetime

    base = datetime.date(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(28):
        day = base + datetime.timedelta(days=d)
        n = 100 + 10 * (day.toordinal() % 7)
        if d == 17:
            n *= 3  # the plant
        for _ in range(n):
            rows.append(
                (
                    eid,
                    datetime.datetime.combine(day, datetime.time(12, 0)),
                    eid % 50,
                    "click",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = _q("dq_seasonal_decompose")(spark, str(tmp_path)).collect()
    assert len(out) == 28
    flagged = [r for r in out if r["is_anomaly"]]
    plant = base + datetime.timedelta(days=17)
    assert [r["day"] for r in flagged] == [plant]
    # residuals on clean days stay inside the band around their own
    # weekday baseline (which the plant inflates for its weekday)
    for r in out:
        assert r["n_days_dow"] == 4
