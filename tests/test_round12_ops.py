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
