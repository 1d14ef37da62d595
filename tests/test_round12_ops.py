"""Round-12 batch: the DELETE half of the index lifecycles (verdict
r11 asks #2/#3) plus model-pinned checks for the round's new
operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.catalog import load_table
from trafik_etl_modular_spark.registry import REGISTRY, _load_all

SF = "/root/testdata/sf0.001"


def _q(name):
    _load_all()
    return REGISTRY[name].fn


def _centroids_df(spark, centers):
    return spark.createDataFrame(
        [(i, [float(v) for v in centers[i]]) for i in range(len(centers))],
        "ivf_bucket int, centroid array<double>",
    )


def _probe_vec(emb) -> list[float]:
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]


def test_ivf_tombstone_probe_equals_survivor_index(spark):
    """The tombstone anti-join must be EXACTLY equivalent to probing
    a from-scratch index that never contained the deleted vectors
    (same frozen centroids — training is part of the index identity):
    the logical delete and the physical delete agree result-for-
    result, and no tombstoned id can surface."""
    from trafik_etl_modular_spark.llmdata.similarity import (
        ivf_assign,
        ivf_topk,
        ivf_train,
    )

    emb = load_table(spark, SF, "embeddings")
    centers = ivf_train(emb, n_centroids=8)
    centroids = _centroids_df(spark, centers)
    qvec = _probe_vec(emb)
    tombs = emb.select("vec_id").where(F.col("vec_id") % 5 == 3)

    res_tomb = ivf_topk(
        ivf_assign(emb, centers),
        centroids,
        None,
        k=10,
        nprobe=8,
        query_point=(0, qvec),
        tombstones=tombs,
    ).collect()
    survivors = emb.join(tombs, "vec_id", "left_anti")
    res_surv = ivf_topk(
        ivf_assign(survivors, centers),
        centroids,
        None,
        k=10,
        nprobe=8,
        query_point=(0, qvec),
    ).collect()

    key = lambda rows: [(r["vec_id"], round(r["cosine"], 9)) for r in rows]  # noqa: E731
    assert key(res_tomb) == key(res_surv)
    assert all(r["vec_id"] % 5 != 3 for r in res_tomb)
    assert len(res_tomb) == 10


def test_ivf_purge_physical_roundtrip(spark, tmp_path):
    """In-place physical purge: tombstoned rows leave the layout, all
    survivors stay (row conservation, report masses exact), and a
    post-purge probe equals the pre-purge tombstone-anti-join probe
    — the logical→physical handoff loses nothing."""
    from trafik_etl_modular_spark.llmdata.similarity import (
        ivf_assign,
        ivf_purge,
        ivf_read_index,
        ivf_topk,
        ivf_train,
        ivf_write_index,
    )

    emb = load_table(spark, SF, "embeddings")
    centers = ivf_train(emb, n_centroids=8)
    path = str(tmp_path / "idx")
    ivf_write_index(ivf_assign(emb, centers), _centroids_df(spark, centers), path)
    tombs = emb.select("vec_id").where(F.col("vec_id") % 5 == 3)
    n_tomb = tombs.count()
    qvec = _probe_vec(emb)

    assigned0, cent0 = ivf_read_index(spark, path)
    pre = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_topk(
            assigned0, cent0, None, k=10, nprobe=8,
            query_point=(0, qvec), tombstones=tombs,
        ).collect()
    ]

    report = ivf_purge(spark, path, tombs)
    assert sum(n for _, n in report) == n_tomb

    assigned1, cent1 = ivf_read_index(spark, path)
    assert assigned1.join(tombs, "vec_id", "leftsemi").count() == 0
    assert assigned1.count() == emb.count() - n_tomb
    post = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_topk(
            assigned1, cent1, None, k=10, nprobe=8, query_point=(0, qvec)
        ).collect()
    ]
    assert pre == post


def test_bm25_delete_certificates_all_true(spark):
    """Every *_matches flag in the registered delete certificate must
    hold at the fixture — the signed fold IS the rebuild."""
    out = _q("text_bm25_delete")(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert r["df_matches"] and r["tf_matches"] and r["corpus_matches"]


def test_bpe_merge_rounds_planted_corpus(spark):
    """Pin the exact merge order on a hand-computed corpus: round 1
    merges the dominant pair, later rounds fall back to the pair-ASC
    tiebreak among count-1 pairs; token mass shrinks by pair_count
    each round and the vocabulary evolves exactly as fused tokens
    appear and exhausted parts vanish."""
    from trafik_etl_modular_spark.queries.llmdata import bpe_merge_rounds_frame

    docs = spark.createDataFrame(
        [
            ("the cat sat on the mat",),
            ("the cat ate the cat food",),
            ("a cat the cat",),
        ],
        "text string",
    )
    rows = [tuple(r) for r in bpe_merge_rounds_frame(docs).collect()]
    assert rows == [
        # round, merged_pair, pair_count, n_tokens_after, n_vocab_after
        (1, "the cat", 4, 12, 9),
        (2, "a cat", 1, 11, 8),
        (3, "a_cat the_cat", 1, 10, 8),
    ]


def test_bpe_merge_apply_disjoint_equals_token_merge(spark):
    """The two-pass replace on space-sharing chains merges EVERY
    adjacent (a,b) occurrence — 'a b a b a b' fuses all three — and a
    self-pair can never be selected."""
    from trafik_etl_modular_spark.queries.llmdata import bpe_merge_rounds_frame

    docs = spark.createDataFrame(
        [("a b a b a b",), ("b b b b",)], "text string"
    )
    rows = [tuple(r) for r in bpe_merge_rounds_frame(docs, n_rounds=1).collect()]
    # "b b" (count 3) is a self-pair and excluded; "a b" (count 3)
    # wins; all three occurrences fuse: 10 tokens -> 7, and "a" is
    # exhausted so the vocabulary is exactly {a_b, b}
    assert rows == [(1, "a b", 3, 7, 2)]


def test_watermark_lateness_listener_capture(spark):
    """The MetricsListener surfaces the same per-batch dropped-late
    counts the report is built from, and flags the late batch with a
    warning — the row-volume guard's event-time sibling is live, not
    just post-hoc."""
    import time

    from trafik_etl_modular_spark.streaming.observability import MetricsListener
    from trafik_etl_modular_spark.streaming.pipeline import watermark_lateness_run

    listener = MetricsListener()
    out = watermark_lateness_run(spark, SF, listener=listener).collect()
    assert sum(r["n_dropped_late"] for r in out) > 0
    assert all(r["n_admitted"] > 0 for r in out)

    # listener delivery is async — poll briefly for the data batches
    prog = []
    for _ in range(50):
        prog = [
            e
            for e in listener.events
            if e["stage"] == "progress" and e["num_input_rows"]
        ]
        if len(prog) >= len(out):
            break
        time.sleep(0.2)
    assert sum(e["rows_dropped_by_watermark"] for e in prog) == sum(
        r["n_dropped_late"] for r in out
    )
    warned = [e for e in prog if e["warning"] and "watermark" in e["warning"]]
    assert warned
