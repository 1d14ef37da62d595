"""Cross-validation for the sketch-based operators whose signatures
are engine-specific (rows-only in the driver check): MinHash-LSH
recall vs exact Jaccard, SimHash behavior on exact dups, multimodal
batch plumbing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from trafik_etl_modular_spark.catalog import load_table
from trafik_etl_modular_spark.llmdata.dedup import (
    jaccard,
    minhash_near_dups,
    shingles,
    simhash_candidate_pairs,
    simhash_signatures,
)
from trafik_etl_modular_spark.llmdata.multimodal import (
    extract_features,
    fake_decode_meta,
    with_binary_payload,
)
from trafik_etl_modular_spark.llmdata.similarity import brute_force_topk


def _exact_pairs(spark, sf_dir, threshold):
    """Ground truth: all-pairs exact Jaccard over the small fixture
    (no blocking — fine at 500 docs)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", shingles("text", 3).alias("s"))
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            jaccard(F.col("a.s"), F.col("b.s")).alias("j"),
        )
        .filter(F.col("j") >= threshold)
    )


def test_minhash_lsh_finds_high_jaccard_pairs(spark, sf_dir):
    truth = {(r["id_a"], r["id_b"]) for r in _exact_pairs(spark, sf_dir, 0.6).collect()}
    found = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dups(
            load_table(spark, sf_dir, "documents"), threshold=0.6
        ).collect()
    }
    assert truth, "fixture should contain at least one near-dup pair"
    # LSH candidates are verified with exact Jaccard, so found ⊆ truth...
    assert found <= truth
    # ...and at 16 bands × 4 rows the S-curve at j≥0.6 gives ~99.9%
    # per-pair recall; on the tiny fixture demand completeness.
    assert found == truth


def test_minhash_jaccard_values_match_exact(spark, sf_dir):
    truth = {
        (r["id_a"], r["id_b"]): r["j"] for r in _exact_pairs(spark, sf_dir, 0.6).collect()
    }
    for r in minhash_near_dups(
        load_table(spark, sf_dir, "documents"), threshold=0.6
    ).collect():
        assert abs(truth[(r["id_a"], r["id_b"])] - r["jaccard"]) < 1e-12


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    """Adversarial hot bucket: N identical docs share every band hash,
    so uncapped candidate volume is N·(N-1)/2 — quadratic in the
    bucket.  With the cap, (1) candidate volume is bounded by
    cap·(cap-1)/2, (2) the truncation is REPORTED by lsh_bucket_stats,
    and (3) normal near-dup pairs outside the hot bucket still
    surface."""
    from trafik_etl_modular_spark.llmdata.dedup import (
        hashed_shingles,
        lsh_bucket_stats,
        lsh_candidate_pairs,
        minhash_near_dups,
        minhash_signature,
    )

    n_dup, cap = 120, 10
    boiler = "identical boilerplate text repeated across the corpus many times over"
    near_a = "the quick brown fox jumps over the lazy dog near the river bank today"
    near_b = "the quick brown fox jumps over the lazy dog near the river bank now"
    rows = [(i, boiler) for i in range(n_dup)] + [(1000, near_a), (1001, near_b)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    signed = docs.select(
        F.col("doc_id"),
        minhash_signature(hashed_shingles(F.col("text")), 64).alias("minhash"),
    ).localCheckpoint()

    capped = lsh_candidate_pairs(signed, max_bucket_size=cap).collect()
    hot_pairs = [r for r in capped if r["id_a"] < 1000 and r["id_b"] < 1000]
    assert len(hot_pairs) <= cap * (cap - 1) // 2
    assert (1000, 1001) in {(r["id_a"], r["id_b"]) for r in capped}

    # the guard is observable: every band's boilerplate bucket reports
    # its overflow
    stats = lsh_bucket_stats(signed, max_bucket_size=cap).collect()
    truncated = [r for r in stats if r["truncated"] > 0]
    assert truncated and all(r["truncated"] == n_dup - cap for r in truncated)

    # full pipeline honors the cap end-to-end
    pairs = minhash_near_dups(docs, threshold=0.6, max_bucket_size=cap).collect()
    assert len(pairs) <= cap * (cap - 1) // 2 + 1


def test_ngram_jaccard_strategies_identical(spark, sf_dir):
    """The count-based and prefix-filtered strategies are two cost
    models for the SAME exact operator — identical pair sets and
    bit-identical Jaccard values."""
    from trafik_etl_modular_spark.llmdata.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    docs = load_table(spark, sf_dir, "documents")
    count_based = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.6).collect()
    }
    prefix_based = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs_prefix(docs, threshold=0.6).collect()
    }
    assert count_based.keys() == prefix_based.keys()
    assert count_based, "fixture should contain near-dup pairs"
    for pair, j in count_based.items():
        assert abs(prefix_based[pair] - j) < 1e-12


@pytest.mark.parametrize("threshold", [0.1, 0.2, 0.5])
def test_ngram_jaccard_prefix_exact_at_float_hostile_thresholds(
    spark, sf_dir, threshold
):
    """Thresholds whose double representation exceeds their rational
    value (0.1, 0.2) used to shorten the prefix at exact integer
    multiples of |s| (ceil(0.1*10) = ceil(1.0000000000000002) = 2) and
    silently DROP qualifying pairs.  The prefix bound now carries a
    downward epsilon; the prefix strategy must stay pair-for-pair
    identical to the count-based exact strategy at any threshold."""
    from trafik_etl_modular_spark.llmdata.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    docs = load_table(spark, sf_dir, "documents")
    count_based = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=threshold).collect()
    }
    prefix_based = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs_prefix(docs, threshold=threshold).collect()
    }
    assert count_based == prefix_based
    assert count_based, "fixture should contain pairs at low thresholds"


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "a completely different sentence here")],
        "doc_id long, text string",
    )
    pairs = simhash_candidate_pairs(simhash_signatures(df)).collect()
    by_pair = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert by_pair[(1, 2)] == 0


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    got = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=5).collect()
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    scored = sorted(
        (
            (float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), vid)
            for vid, v in vecs.items()
            if vid != 0
        ),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [r["vec_id"] for r in got] == [vid for _, vid in scored]
    for r, (c, _) in zip(got, scored):
        assert abs(r["cosine"] - c) < 1e-9


def test_multimodal_resize_binary_roundtrip(spark, sf_dir):
    from trafik_etl_modular_spark.llmdata.multimodal import resize_payloads

    docs = load_table(spark, sf_dir, "documents").limit(10)
    resized = resize_payloads(with_binary_payload(docs), target_bytes=128).collect()
    assert len(resized) == 10
    for r in resized:
        # binary→binary contract: fixed output size, meta updated
        assert len(bytes(r["payload"])) == 128
        assert r["media_meta"]["n_bytes"] == 128


def test_multimodal_frame_sample_one_to_many(spark, sf_dir):
    from trafik_etl_modular_spark.llmdata.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = with_binary_payload(docs)
    frames = sample_frames(media, every_n=2, frame_bytes=32).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    payload_sizes = {r["doc_id"]: len(bytes(r["payload"])) for r in media.collect()}
    for doc_id, rows in by_doc.items():
        expect = len(range(0, payload_sizes[doc_id] // 32, 2))
        assert len(rows) == expect
        assert [r["frame_no"] for r in sorted(rows, key=lambda x: x["frame_no"])] == list(
            range(0, payload_sizes[doc_id] // 32, 2)
        )
        assert all(r["frame_offset"] == r["frame_no"] * 32 for r in rows)


def test_multimodal_batch_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = with_binary_payload(docs)
    # typed metadata struct + binary payload survive the plan
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media).collect()
    assert len(feats) == 20
    one = [r for r in feats if r["n_bytes"] > 0][0]
    payload = [r for r in media.collect() if r["doc_id"] == one["doc_id"]][0]["payload"]
    w, h = fake_decode_meta(bytes(payload))
    assert (one["width"], one["height"]) == (w, h)
    assert one["header"] == bytes(payload)[:8].hex()
    # text payloads aren't decodable images → every row took the
    # deterministic fallback (and says so)
    assert all(r["decode_mode"] == "fake" for r in feats)


def test_multimodal_real_decode_tier_in_container(spark, sf_dir):
    """The REAL decode path must execute in THIS container (no Pillow
    needed): genuine PNG/GIF bytes flow through the Spark plan and the
    pure-Python header parse recovers their true dimensions, labeled
    'header' (or 'pil' where the real codec is installed — never
    'fake')."""
    from trafik_etl_modular_spark.llmdata.multimodal import with_binary_payload

    docs = load_table(spark, sf_dir, "documents").limit(40)
    media = with_binary_payload(docs, with_images=True)
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    png_docs = [d for d in feats if d % 10 == 0]
    gif_docs = [d for d in feats if d % 10 == 2]
    assert png_docs and gif_docs
    for d in png_docs:
        assert feats[d]["decode_mode"] in ("pil", "header")
        assert (feats[d]["width"], feats[d]["height"]) == (320, 240)
    for d in gif_docs:
        # GIF fixture is header-only: Pillow (if present) rejects it,
        # the header tier reads the logical screen descriptor
        assert feats[d]["decode_mode"] == "header"
        assert (feats[d]["width"], feats[d]["height"]) == (128, 96)
    for d in (d for d in feats if d % 10 not in (0, 1, 2)):
        assert feats[d]["decode_mode"] == "fake"


def test_parse_image_header_formats():
    """Pure-function coverage of the header parser across all three
    container formats plus hostile inputs."""
    from trafik_etl_modular_spark.llmdata.multimodal import (
        parse_image_header,
        synthetic_gif,
        synthetic_png,
    )

    assert parse_image_header(synthetic_png(1, 1)) == (1, 1, "png")
    assert parse_image_header(synthetic_png(65535, 3)) == (65535, 3, "png")
    assert parse_image_header(synthetic_gif(640, 480)) == (640, 480, "gif")
    # hand-built JPEG: SOI, APP0 (empty), SOF0 with h=480 w=640
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x02"
        + b"\xff\xc0\x00\x11\x08" + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9
    )
    assert parse_image_header(jpeg) == (640, 480, "jpeg")
    assert parse_image_header(b"plain text payload") is None
    assert parse_image_header(b"") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\n####") is None  # truncated PNG
    assert parse_image_header(b"\xff\xd8\x00\x00garbage") is None  # bad JPEG marker


def test_multimodal_decode_paths(monkeypatch):
    """Both decode paths of try_decode_meta: the Pillow path (faked via
    a stub module when the real lib is absent) and the fallback."""
    from trafik_etl_modular_spark.llmdata import multimodal as mm

    # Fallback path: no Pillow → None (caller then uses the fake)
    monkeypatch.setattr(mm, "_pil_image", lambda: None)
    assert mm.try_decode_meta(b"\x89PNG....") is None
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG....")

    # Real path: a Pillow-shaped stub proves the bytes→(w, h) plumbing
    class _Im:
        width, height = 640, 480

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _Image:
        @staticmethod
        def open(fp):
            if fp.read(4) != b"\x89PNG":
                raise ValueError("not an image")
            return _Im()

    monkeypatch.setattr(mm, "_pil_image", lambda: _Image)
    assert mm.try_decode_meta(b"\x89PNGrest-of-payload") == (640, 480, "pil")
    # undecodable bytes under a present lib → graceful fallback signal
    assert mm.try_decode_meta(b"plain text") is None

    # Header tier under a present-but-failing codec: a complete PNG
    # the stub rejects (it only accepts the 4-byte probe above) still
    # resolves through the pure parse
    monkeypatch.setattr(mm, "_pil_image", lambda: None)
    assert mm.try_decode_meta(mm.synthetic_png(12, 34)) == (12, 34, "header")

    # When the REAL Pillow is importable, exercise it end-to-end
    monkeypatch.undo()
    if mm._pil_image() is not None:
        import io as _io

        from PIL import Image as _PI

        buf = _io.BytesIO()
        _PI.new("RGB", (8, 6)).save(buf, format="PNG")
        assert mm.try_decode_meta(buf.getvalue()) == (8, 6, "pil")


def test_hyperplane_lsh_subset_of_exact(spark, sf_dir):
    import numpy as np

    from trafik_etl_modular_spark.llmdata.similarity import (
        hyperplane_bucket,
        hyperplane_lsh_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0)
    got = hyperplane_lsh_topk(emb, probe, dim=64, k=10, n_planes=6).collect()
    assert got, "probe bucket should not be empty at fixture scale"

    # every returned cosine must equal the exact cosine (LSH prunes
    # candidates, it never changes scores)
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()
    }
    q = vecs[0]
    for r in got:
        v = vecs[r["vec_id"]]
        exact = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        assert abs(r["cosine"] - exact) < 1e-9

    # bucket locality: all results share the probe's bucket id
    buckets = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id", hyperplane_bucket("embedding", 64, 6).alias("b")
        ).collect()
    }
    assert all(buckets[r["vec_id"]] == buckets[0] for r in got)


def test_shingles_edge_cases(spark):
    """Fixture docs are ~55 words — the <k-token and duplicate-shingle
    edges never fire there; pin them explicitly (and identically to
    the oracle's 1-based list semantics)."""
    from trafik_etl_modular_spark.llmdata.dedup import hashed_shingles

    df = spark.createDataFrame(
        [
            (1, "a b"),  # < k tokens → empty
            (2, "a b c"),  # exactly k → one shingle
            (3, "a b c d"),  # two shingles
            (4, "x y x y x y x y"),  # repeats → deduped
            (5, ""),  # empty text
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", shingles("text", 3).alias("s")).collect()
    }
    assert got[1] == [] and got[5] == []
    assert got[2] == ["a b c"]
    assert got[3] == ["a b c", "b c d"]
    # 6 positions but only 2 distinct shingles ("x y x", "y x y")
    assert sorted(got[4]) == ["x y x", "y x y"]

    # hashed variant: same cardinalities on the same inputs
    hashed = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", hashed_shingles("text", 3).alias("s")).collect()
    }
    assert {k: len(v) for k, v in hashed.items()} == {
        k: len(v) for k, v in got.items()
    }


def test_approx_distinct_within_rsd_of_exact(spark, sf_dir):
    """The certificate query must report exact counts matching a
    direct countDistinct, and every group's 5% error certificate must
    hold (the sketch itself is exercised inside the query)."""
    from trafik_etl_modular_spark.registry import REGISTRY, _load_all

    _load_all()
    got = {
        r["event_type"]: r
        for r in REGISTRY["agg_approx_distinct_users"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for k, n in exact.items():
        assert got[k]["exact_users"] == n
        assert got[k]["within_5pct"] is True, (k, got[k])


def test_hll_mergeable_rollup_matches_exact(spark, sf_dir):
    """Unioning per-day HLL sketch partials must satisfy the 5% error
    certificate against the exact per-type distincts, and the partial
    count must equal the number of (day, type) groups."""
    from trafik_etl_modular_spark.registry import REGISTRY, _load_all

    _load_all()
    got = {
        r["event_type"]: r
        for r in REGISTRY["agg_hll_mergeable_rollup"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    days = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct(F.to_date("ts")).alias("d"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for k, n in exact.items():
        assert got[k]["exact_users"] == n
        assert got[k]["within_5pct"] is True, (k, got[k])
        assert got[k]["n_daily_partials"] == days[k]


def test_connected_components_handcrafted(spark):
    """Two components {1,2,3,4} (via chain) and {7,9}; min id wins."""
    from trafik_etl_modular_spark.llmdata.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 9)], ["id_a", "id_b"]
    )
    # Both strategy paths must produce identical labels: the driver
    # union-find (size-gated default) and the distributed loop
    # (forced with driver_threshold=0).
    for thr in (100_000, 0):
        got = {
            (r["id"], r["label"])
            for r in connected_components(edges, driver_threshold=thr).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (7, 7), (9, 7)}, thr


def test_connected_components_string_ids_schema_parity(spark):
    """Both strategy paths must return IDENTICAL schemas for any id
    type (advisor r3: the union-find fast path hardcoded
    'id long, label long', crashing/diverging on string doc ids)."""
    from trafik_etl_modular_spark.llmdata.dedup import connected_components

    edges = spark.createDataFrame(
        [("doc-a", "doc-b"), ("doc-b", "doc-c"), ("doc-x", "doc-y")],
        ["id_a", "id_b"],
    )
    results = {}
    for thr in (100_000, 0):
        df = connected_components(edges, driver_threshold=thr)
        assert [f.dataType.simpleString() for f in df.schema.fields] == [
            "string",
            "string",
        ], thr
        results[thr] = {(r["id"], r["label"]) for r in df.collect()}
    assert results[100_000] == results[0] == {
        ("doc-a", "doc-a"),
        ("doc-b", "doc-a"),
        ("doc-c", "doc-a"),
        ("doc-x", "doc-x"),
        ("doc-y", "doc-x"),
    }


def test_connected_components_path_graph_converges(spark):
    """A 64-node path is the worst case for plain one-hop propagation
    (63 rounds); pointer jumping must resolve it within max_iter=10
    (O(log n))."""
    from trafik_etl_modular_spark.llmdata.dedup import connected_components

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["id_a", "id_b"]
    )
    # driver_threshold=0 forces the DISTRIBUTED loop — this test pins
    # the pointer-jumping round bound, not the union-find fast path.
    labels = connected_components(edges, max_iter=10, driver_threshold=0).collect()
    assert {r["label"] for r in labels} == {0}
    assert len(labels) == n + 1


def test_sampling_stable_under_repartition(spark, sf_dir):
    """The whole point of hash-keyed sampling: identical decisions on
    any partitioning (rand(seed) fails this)."""
    from trafik_etl_modular_spark.llmdata.sampling import assign_split, stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    base = {(r["doc_id"], r["split"]) for r in assign_split(docs).select("doc_id", "split").collect()}
    repart = {
        (r["doc_id"], r["split"])
        for r in assign_split(docs.repartition(13)).select("doc_id", "split").collect()
    }
    assert base == repart and len(base) > 0

    rates = {"en": 500, "de": 800, "es": 800, "fr": 800, "zh": 1000}
    kept = {r["doc_id"] for r in stratified_sample(docs, "lang", rates).collect()}
    kept2 = {r["doc_id"] for r in stratified_sample(docs.repartition(7), "lang", rates).collect()}
    assert kept == kept2
    # zh passes through at 1000 permille; en is downsampled
    n_zh = docs.filter(F.col("lang") == "zh").count()
    assert len([1 for r in docs.filter(F.col("lang") == "zh").collect()]) == n_zh


def test_sampling_families_pairwise_independent(spark, sf_dir):
    """The sampling operators must draw from DIFFERENT hash streams:
    with a shared unsalted bucket, a weighted_sample survivor with
    quality < 0.9 was necessarily a 'train' doc under the 900/50/50
    split (bucket < floor(q*1000) < 900), so composing the two emptied
    val/test.  With per-operator salts, every split must appear among
    survivors of a sub-0.9-weight sample."""
    from trafik_etl_modular_spark.llmdata.sampling import (
        assign_split,
        stratified_sample,
        weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    # constant weight 0.5 < 0.9: under the old shared stream this
    # selected exactly buckets 0..499 — all 'train'
    survivors = assign_split(
        weighted_sample(docs.withColumn("w", F.lit(0.5)), "w")
    )
    splits = {r["split"] for r in survivors.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}, splits

    # stratified keep (en at 500 permille) must likewise span all splits
    strat = assign_split(
        stratified_sample(docs, "lang", {"en": 500}, default_permille=1000)
    )
    splits2 = {r["split"] for r in strat.select("split").distinct().collect()}
    assert splits2 == {"train", "val", "test"}, splits2


def test_assign_split_rejects_bad_weights(spark):
    from trafik_etl_modular_spark.llmdata.sampling import assign_split

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    try:
        assign_split(df, weights=(("a", 500), ("b", 400)))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_pack_bins_invariants(spark, sf_dir):
    """Bins partition the corpus; per pack bucket, bin indices are
    contiguous from 0 and every doc's bin matches its running count."""
    from trafik_etl_modular_spark.llmdata.sampling import pack_bins
    from trafik_etl_modular_spark.llmdata.text import token_count

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", token_count("text").cast("long")
    )
    packed = pack_bins(docs, "n_tok", 512, n_packers=4)
    assert packed.count() == docs.count()
    per_bucket = (
        packed.groupBy("pack_bucket")
        .agg(
            F.countDistinct("bin_idx").alias("n_bins"),
            F.max("bin_idx").alias("max_bin"),
            F.min("bin_idx").alias("min_bin"),
        )
        .collect()
    )
    for r in per_bucket:
        assert r["min_bin"] == 0
        assert r["n_bins"] == r["max_bin"] + 1  # contiguous


def test_grouped_map_matches_native_window(spark, sf_dir):
    """applyInPandas percent rank must equal the JVM F.percent_rank()
    window exactly (same rank ties, same division)."""
    from pyspark.sql import Window

    from trafik_etl_modular_spark.operators.grouped import percent_rank_by_group

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    arrow = {
        (r["doc_id"], r["pct_rank"])
        for r in percent_rank_by_group(docs, "lang", "n_chars").collect()
    }
    w = Window.partitionBy("lang").orderBy("n_chars")
    native = {
        (r["doc_id"], r["pr"])
        for r in docs.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    assert arrow == native


def test_trimmed_mean_udaf_matches_exact_model(spark, sf_dir):
    """GROUPED_AGG pandas UDAF trimmed mean must equal the exact
    driver-side model (sort, drop n//10 from each end, int sum, one
    double division) per group — including a singleton group and one
    exactly at the trim boundary."""
    from trafik_etl_modular_spark.operators.grouped import (
        group_size_agg,
        trimmed_mean_agg,
    )

    rows = (
        [("a", v) for v in [10, 1, 100, 5, 5, 7, 3, 2, 9, 4]]  # n=10 → trims 1+1
        + [("b", 42)]  # singleton → trims nothing
        + [("c", v) for v in [1, 2, 3]]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r["g"], r["n"], r["tm"])
        for r in df.groupBy("g")
        .agg(group_size_agg("v").alias("n"), trimmed_mean_agg("v").alias("tm"))
        .collect()
    }

    def model(vals):
        s = sorted(vals)
        k = len(s) // 10
        core = s[k : len(s) - k]
        return float(sum(core)) / float(len(core))

    want = {
        (g, len(vs), model(vs))
        for g, vs in {
            "a": [10, 1, 100, 5, 5, 7, 3, 2, 9, 4],
            "b": [42],
            "c": [1, 2, 3],
        }.items()
    }
    assert got == want


def test_trimmed_mean_udaf_null_handling(spark):
    """NULLs in the metric column must be DROPPED, never cast (pandas
    delivers nullable int groups as float64+NaN, and a raw int64 cast
    of NaN silently yields an arbitrary integer); an all-NULL group
    aggregates to NULL; a trim fraction ≥ 1/2 is rejected at call
    time (it would empty small groups and divide by zero on an
    executor)."""
    import pytest

    from trafik_etl_modular_spark.operators.grouped import trimmed_mean_agg

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("b", None)], "g string, v long"
    )
    got = {
        (r["g"], r["tm"])
        for r in df.groupBy("g").agg(trimmed_mean_agg("v").alias("tm")).collect()
    }
    assert got == {("a", 2.0), ("b", None)}

    with pytest.raises(ValueError, match="trim fraction"):
        trimmed_mean_agg("v", 1, 2)


def test_trimmed_mean_oracle_agrees_on_null_text(spark, tmp_path):
    """The DuckDB oracle must agree with the Spark UDAF when documents
    carry NULL text (advisor r7: the original oracle ranked NULL rows
    into the trim window and counted kept-NULLs in the divisor — the
    fixture has no NULL text, so the divergence was latent).  Plants
    NULLs, an all-NULL source, and a NULL-free source, then runs BOTH
    engines over the same parquet."""
    import duckdb

    from trafik_etl_modular_spark.queries.llmdata import (
        _TRIMMED_MEAN_SQL,
        text_trimmed_mean_tokens,
    )

    def words(n):
        return " ".join(f"w{j}" for j in range(n))

    rows = (
        # 10 non-NULL (trims 1+1) + 2 NULLs: NULLs must not shift the
        # trim bound or join the kept multiset, but DO count in n_docs.
        [(i, words(n), "mixed") for i, n in enumerate([3, 1, 50, 5, 5, 7, 4, 2, 9, 6])]
        + [(100, None, "mixed"), (101, None, "mixed")]
        + [(200, None, "allnull")]
        + [(300, words(8), "clean"), (301, words(4), "clean")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    d = str(tmp_path / "nulls")
    df.write.parquet(f"{d}/documents.parquet")

    got = {
        (r["source"], r["n_docs"], r["trimmed_mean_tok"])
        for r in text_trimmed_mean_tokens(spark, d).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{d}/documents.parquet/*.parquet')"
    )
    want = {tuple(r) for r in con.execute(_TRIMMED_MEAN_SQL).fetchall()}
    assert got == want
    # and the exact values: mixed keeps [2..9] after trimming 1 and 50
    by_src = {s: (n, tm) for s, n, tm in got}
    assert by_src["mixed"][0] == 12
    assert by_src["mixed"][1] == pytest.approx(sum([3, 5, 5, 7, 4, 2, 9, 6]) / 8.0)
    assert by_src["allnull"] == (1, None)
    assert by_src["clean"] == (2, 6.0)


def test_kmeans_empty_cluster_repair_distinct_seeds():
    """Simultaneously-empty clusters must reseed to DISTINCT points
    (advisor r3: reseeding them all to the single farthest point left
    duplicate centroids → permanently empty IVF buckets).  40 copies
    of one vector + 4 singletons forces multi-empty repair whenever
    init draws ≥3 copies — which happens for most seeds; all 5
    centers must come out pairwise distinct within 3 iterations."""
    import numpy as np

    from trafik_etl_modular_spark.llmdata.similarity import _train_unit_kmeans

    eye = np.eye(5)
    x = np.vstack([np.repeat(eye[:1], 40, axis=0), eye[1:]])
    for seed in range(40):
        c = _train_unit_kmeans(x, 5, seed, max_iter=3)
        gram = c @ c.T
        off_diag = gram - np.diag(gram.diagonal())
        assert not np.any(off_diag > 0.99), f"duplicate centroids, seed={seed}"


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """Probing ALL buckets must reproduce brute force exactly — the
    bucket pruning is the only approximation in IVF."""
    from trafik_etl_modular_spark.llmdata.similarity import (
        brute_force_topk,
        ivf_index,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0)
    assigned, centroids = ivf_index(emb, n_centroids=8)
    full = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_topk(assigned, centroids, probe, k=15, nprobe=8).collect()
    ]
    exact = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in brute_force_topk(emb, probe, k=15).collect()
    ]
    assert sorted(full) == sorted(exact)


def test_ivf_nprobe_recall_on_clustered_data(spark):
    """Recall must be high where the data HAS angular structure: 8
    planted clusters of unit vectors (the fixture's embeddings are
    cosine-noise — its exact top-10 spans ~8 of 10 labels — so recall
    is asserted on constructed data, and exactness on the fixture via
    the full-probe test above)."""
    import numpy as np

    from trafik_etl_modular_spark.llmdata.similarity import (
        brute_force_topk,
        ivf_index,
        ivf_topk,
    )

    rng = np.random.RandomState(0)
    centers = rng.randn(8, 32)
    rows = []
    for ci in range(8):
        for j in range(25):
            v = centers[ci] + 0.15 * rng.randn(32)
            rows.append((ci * 25 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probe = emb.filter(F.col("vec_id") == 0)
    assigned, centroids = ivf_index(emb, n_centroids=8, max_iter=10)
    approx = {
        r["vec_id"]
        for r in ivf_topk(assigned, centroids, probe, k=10, nprobe=2).collect()
    }
    exact = {r["vec_id"] for r in brute_force_topk(emb, probe, k=10).collect()}
    assert len(approx & exact) / len(exact) >= 0.9


def test_ivf_incremental_append_roundtrip(spark, tmp_path, sf_dir):
    """Incremental index maintenance end to end against a PERSISTED
    index: build on the old corpus, ivf_append the held-out batch,
    then (a) the read-back index holds the full corpus with the
    batch's frozen-centroid assignments intact, and (b) a full-nprobe
    probe over the appended index reproduces brute force over the
    WHOLE corpus — appended vectors are probe-visible with no
    retrain."""
    from trafik_etl_modular_spark.llmdata.similarity import (
        brute_force_topk,
        ivf_append,
        ivf_assign,
        ivf_index,
        ivf_read_index,
        ivf_topk,
        ivf_train,
        ivf_write_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    is_batch = F.col("vec_id") % 10 == 7
    old, batch = emb.filter(~is_batch), emb.filter(is_batch)
    path = str(tmp_path / "ivf")
    assigned_old, centroids = ivf_index(old, n_centroids=8)
    ivf_write_index(assigned_old, centroids, path)

    centers = ivf_train(old, n_centroids=8)
    batch_assigned = ivf_assign(batch, centers)
    want_buckets = {
        r["vec_id"]: r["ivf_bucket"] for r in batch_assigned.collect()
    }
    ivf_append(batch_assigned, path)

    assigned2, centroids2 = ivf_read_index(spark, path)
    assert assigned2.count() == emb.count()
    got_buckets = {
        r["vec_id"]: r["ivf_bucket"]
        for r in assigned2.filter(F.col("vec_id") % 10 == 7).collect()
    }
    assert got_buckets == want_buckets

    probe_id = batch.select(F.min("vec_id")).collect()[0][0]
    probe = emb.filter(F.col("vec_id") == probe_id)
    full = {
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_topk(assigned2, centroids2, probe, k=10, nprobe=8).collect()
    }
    exact = {
        (r["vec_id"], round(r["cosine"], 9))
        for r in brute_force_topk(emb, probe, k=10).collect()
    }
    assert full == exact


def test_ivf_compact_preserves_probes(spark, tmp_path, sf_dir):
    """Compaction end to end against a PERSISTED index: build on the
    old corpus, append the held-out batch in two slices (touched
    buckets now hold up to 3 files), compact IN PLACE, then (a) every
    over-threshold bucket collapsed to one file and no bucket grew,
    (b) the corpus row set is byte-identical (vec_id→bucket mapping
    unchanged), (c) a full-nprobe probe returns the IDENTICAL top-k —
    compaction is a layout op, invisible to queries, and (d) a second
    compact is a no-op (idempotent maintenance cadence)."""
    from trafik_etl_modular_spark.llmdata.similarity import (
        ivf_append,
        ivf_assign,
        ivf_bucket_files,
        ivf_compact,
        ivf_index,
        ivf_read_index,
        ivf_topk,
        ivf_train,
        ivf_write_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    is_batch = F.col("vec_id") % 10 == 7
    old, batch = emb.filter(~is_batch), emb.filter(is_batch)
    path = str(tmp_path / "ivf")
    assigned_old, centroids = ivf_index(old, n_centroids=8)
    ivf_write_index(assigned_old, centroids, path)
    centers = ivf_train(old, n_centroids=8)
    for rem in (7, 17):
        ivf_append(
            ivf_assign(batch.filter(F.col("vec_id") % 20 == rem), centers), path
        )

    before = ivf_bucket_files(path)
    assert max(before.values()) > 2, "fixture must have over-threshold buckets"
    a0, c0 = ivf_read_index(spark, path)
    mapping0 = {r["vec_id"]: r["ivf_bucket"] for r in a0.collect()}
    probe_id = batch.select(F.min("vec_id")).collect()[0][0]
    probe = emb.filter(F.col("vec_id") == probe_id)
    top0 = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk(a0, c0, probe, k=10, nprobe=8).collect()
    ]

    report = ivf_compact(spark, path, max_files_per_bucket=2)
    after = ivf_bucket_files(path)
    assert set(after) == set(before)
    for b, fb, fa in report:
        assert fb == before[b] and fa == after[b]
        assert fa == (1 if fb > 2 else fb)
    a1, c1 = ivf_read_index(spark, path)
    assert {r["vec_id"]: r["ivf_bucket"] for r in a1.collect()} == mapping0
    top1 = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk(a1, c1, probe, k=10, nprobe=8).collect()
    ]
    assert top1 == top0

    report2 = ivf_compact(spark, path, max_files_per_bucket=2)
    assert all(fb == fa for _, fb, fa in report2)
    assert ivf_bucket_files(path) == after


def test_perceptual_dedup_catches_reencoded_duplicates(spark, sf_dir):
    """The planted re-encoded-duplicate case (verdict r08 ask #6),
    end to end through the registered query: every image group
    (doc_ids 10k / 10k+1 / 10k+3 present in the corpus) must surface
    the re-encode pair (10k, 10k+1) with Hamming distance EXACTLY 0
    and same_bytes=False — identical pixels, different bytes, i.e.
    the row exact binary dedup misses — and the near-variant pair
    (10k, 10k+3) within the radius-3 pigeonhole bound.  Also pins the
    decode tier: every corpus payload must take the REAL grayscale-
    PNG path, none the labeled fake."""
    from trafik_etl_modular_spark.llmdata.multimodal import (
        perceptual_hash,
        with_perceptual_corpus,
    )
    from trafik_etl_modular_spark.queries.llmdata import multimodal_dedup_perceptual

    docs = load_table(spark, sf_dir, "documents")
    media = with_perceptual_corpus(docs)
    modes = {r["decode_mode"] for r in perceptual_hash(media).collect()}
    assert modes == {"png"}

    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    pairs = {
        (r["id_a"], r["id_b"]): (r["hamming"], r["same_bytes"])
        for r in multimodal_dedup_perceptual(spark, sf_dir).collect()
    }
    groups = [b for b in ids if b % 10 == 0 and b + 1 in ids and b + 3 in ids]
    assert groups, "fixture must contain full image groups"
    for b in groups:
        ham, same = pairs[(b, b + 1)]
        assert ham == 0 and same is False  # re-encode: pixels ==, bytes !=
        ham3, same3 = pairs[(b, b + 3)]
        assert 0 <= ham3 <= 3 and same3 is False  # planted near edit
    # no cross-group noise: every reported pair is within one group
    for a, b in pairs:
        assert b - a in (1, 2, 3) and a // 10 == b // 10


def test_pq_index_roundtrip_and_probe(spark, sf_dir):
    """PQ semantics end to end: (a) pq_assign emits m in-range codes
    per vector and pq_reconstruct concatenates the looked-up
    codebook entries (checked against a numpy reconstruction of the
    same codes); (b) the persisted IVF-PQ artifact round-trips —
    every corpus vector has exactly one code row, bucket-partitioned;
    (c) the ADC ranking is a real approximation: the IVF-PQ probe's
    exact-rerank top-10 overlaps brute-force cosine top-10 on at
    least half its slots (full-nprobe would be exact on the
    shortlist; nprobe=4 + 64× compression legitimately trades some
    recall — the certificate queries grade it; this pins it's not
    garbage)."""
    import numpy as np

    from trafik_etl_modular_spark.llmdata.similarity import (
        PQ_CODES,
        PQ_SUBSPACES,
        brute_force_topk,
        pq_assign,
        pq_reconstruct,
        pq_train,
    )
    from trafik_etl_modular_spark.queries.llmdata import (
        _ivf_ensure_pq,
        sim_ann_ivf_pq_probe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_train(emb, seed=7, max_iter=10)
    assert cb.shape == (PQ_SUBSPACES, PQ_CODES, 64 // PQ_SUBSPACES)
    sample = (
        pq_assign(emb, cb)
        # pq_reconstruct takes a plain column NAME (it splices the name
        # into a rendered SQL expression; ADVICE r12 item 5 made a
        # Column argument a loud TypeError instead of a silent coercion)
        .withColumn("recon", pq_reconstruct("codes", cb))
        .orderBy("vec_id")
        .limit(5)
        .collect()
    )
    for r in sample:
        codes = r["codes"]
        assert len(codes) == PQ_SUBSPACES
        assert all(0 <= c < PQ_CODES for c in codes)
        want = np.concatenate([cb[s, codes[s]] for s in range(PQ_SUBSPACES)])
        assert np.array_equal(np.array(r["recon"]), want)

    path, cb2 = _ivf_ensure_pq(spark, sf_dir)
    assert np.array_equal(cb, cb2)
    codes_df = spark.read.parquet(f"{path}/codes")
    assert codes_df.count() == emb.count()
    assert codes_df.select("vec_id").distinct().count() == emb.count()
    assert set(codes_df.columns) >= {"vec_id", "codes", "ivf_bucket"}

    probe = emb.filter(F.col("vec_id") == 0)
    exact = {r["vec_id"] for r in brute_force_topk(emb.filter(F.col("vec_id") != 0), probe, k=10).collect()}
    got = {r["vec_id"] for r in sim_ann_ivf_pq_probe(spark, sf_dir).collect()}
    assert len(got) == 10
    assert len(got & exact) >= 5


def test_incremental_media_dedup_verdicts(spark, sf_dir):
    """Planted batch-vs-corpus structure, end to end through the
    registered query: every batch doc 20k+7 (a re-encode of corpus
    doc 20k) must come back verdict='reencoded_dup' matched to
    EXACTLY doc 20k with best_hamming=0 — never 'exact_dup' (the
    bytes differ) and never 'novel' (the pixels don't); every batch
    doc 20k+17 (fresh unique pattern) must be 'novel' with NULL
    match.  One verdict row per batch doc, no extras."""
    from trafik_etl_modular_spark.queries.llmdata import multimodal_dedup_incremental

    ids = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    rows = {
        r["doc_id"]: r for r in multimodal_dedup_incremental(spark, sf_dir).collect()
    }
    batch = {d for d in ids if d % 10 == 7}
    assert set(rows) == batch and batch
    for d in batch:
        r = rows[d]
        if d % 20 == 7:
            assert r["verdict"] == "reencoded_dup"
            assert r["matched_id"] == d - 7 and r["best_hamming"] == 0
        else:
            assert r["verdict"] == "novel"
            assert r["matched_id"] is None and r["best_hamming"] is None


def test_simhash_calibration_invariants(spark, sf_dir):
    """Radius-sweep structure: candidates and hits are non-decreasing
    in the radius, hits ≤ min(candidates, truth), truth constant
    across radii, and precision/recall agree with their count
    columns."""
    from trafik_etl_modular_spark.queries.llmdata import dedup_simhash_calibration

    rows = {r["radius"]: r for r in dedup_simhash_calibration(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    assert len({rows[r]["n_true"] for r in rows}) == 1
    for r in (1, 2, 3):
        c = rows[r]
        assert c["n_hits"] <= min(c["n_candidates"], c["n_true"])
        if c["n_candidates"]:
            assert c["precision"] == pytest.approx(c["n_hits"] / c["n_candidates"])
        if c["n_true"]:
            assert c["recall"] == pytest.approx(c["n_hits"] / c["n_true"])
        if r > 1:
            assert c["n_candidates"] >= rows[r - 1]["n_candidates"]
            assert c["n_hits"] >= rows[r - 1]["n_hits"]


def test_quantized_recall_roundtrip_and_certificate(spark, sf_dir):
    """int8 max-abs quantization must (a) reconstruct every component
    within half a quantization step (scale/254 + float slop), and
    (b) produce a report with n_overlap10 ≤ 10 per probe and high
    recall on the fixture (the certificate's own margin)."""
    import numpy as np
    import pyarrow.parquet as pq

    from trafik_etl_modular_spark.queries.llmdata import (
        _embedding_maxabs,
        sim_quantized_recall,
    )

    scale = _embedding_maxabs(sf_dir)
    vecs = np.array(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])[
            "embedding"
        ].to_pylist(),
        dtype=np.float64,
    )
    q = np.clip(np.round(vecs / scale * 127), -127, 127)
    err = np.abs(q * scale / 127 - vecs).max()
    assert err <= scale / 254 + 1e-12

    rows = sim_quantized_recall(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r["n_overlap10"] <= 10 for r in rows)
    assert all(r["recall10_ok"] == (r["n_overlap10"] >= 7) for r in rows)
    # int8 over 64 dims is fine-grained; the fixture panel should sit
    # well above the certificate line
    assert min(r["n_overlap10"] for r in rows) >= 8


def test_embedding_profile_planted_defects(spark, tmp_path):
    """The vector DQ gate must count planted defects exactly: one
    zero vector, one NaN-component vector, one infinite-component
    vector, and a ragged (short) vector moving dim_min."""
    import math

    from trafik_etl_modular_spark.queries.dq import dq_embedding_profile

    good = [float(i % 7) / 7.0 + 0.1 for i in range(64)]
    rows = [
        (0, good),
        (1, [0.0] * 64),
        (2, good[:32] + [float("nan")] + good[33:]),
        (3, good[:10] + [float("inf")] + good[11:]),
        (4, good[:32]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    d = str(tmp_path / "emb")
    df.write.parquet(f"{d}/embeddings.parquet")
    r = dq_embedding_profile(spark, d).collect()[0]
    assert r["n_vectors"] == 5
    assert (r["dim_min"], r["dim_max"]) == (32, 64)
    assert r["n_nonfinite_vectors"] == 2
    assert r["n_zero_vectors"] == 1
    assert r["norm_min"] == 0.0
    assert r["norm_max"] > 0 and not math.isnan(r["norm_mean"])


def test_quantized_probe_tracks_plain_probe(spark, sf_dir):
    """The two-stage quantized probe must (a) return exactly 10 rows
    with strictly-descending (cosine, vec_id) order, and (b) overlap
    the plain exact-scoring IVF probe's top-10 in ≥ 8 of 10 ids —
    int8 over 64 dims is fine-grained enough that the shortlist stage
    rarely perturbs the final rerank."""
    from trafik_etl_modular_spark.queries.llmdata import (
        sim_ann_ivf_probe,
        sim_ann_ivf_quantized_probe,
    )

    qrows = sim_ann_ivf_quantized_probe(spark, sf_dir).collect()
    assert len(qrows) == 10
    keys = [(-r["cosine"], r["vec_id"]) for r in qrows]
    assert keys == sorted(keys)
    plain = {r["vec_id"] for r in sim_ann_ivf_probe(spark, sf_dir).collect()}
    assert len({r["vec_id"] for r in qrows} & plain) >= 8


def test_ivf_centroid_alignment_identity_and_churn():
    """Aligning a centroid set to itself must be the identity (so a
    no-op retrain reports zero churn), and a permuted retrain must
    align back to the original cells — label arbitrariness is exactly
    what the alignment removes."""
    import numpy as np

    from trafik_etl_modular_spark.queries.llmdata import _ivf_centroid_alignment

    rng = np.random.RandomState(3)
    c = rng.randn(8, 16)
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    assert _ivf_centroid_alignment(c, c) == list(range(8))
    perm = [3, 0, 7, 1, 6, 2, 5, 4]
    assert _ivf_centroid_alignment(c[perm], c) == perm


def test_lsh_calibration_matches_driver_model(spark, tmp_path):
    """The calibration report's precision/recall must equal a driver-
    side model on a corpus PLANTED so the numbers are non-degenerate:
    near-dup pairs at graded overlap (some between 0.5 and 0.7, so
    hits shrink as the threshold rises) plus unrelated noise docs.
    Also pins the structural invariants: n_hits ≤ min(n_candidates,
    n_true) and precision non-increasing in the threshold."""
    from trafik_etl_modular_spark.llmdata.dedup import minhash_near_dups
    from trafik_etl_modular_spark.queries.llmdata import dedup_lsh_calibration

    base = [f"tok{i}" for i in range(40)]

    def variant(n_changed, tag):
        words = list(base)
        for j in range(n_changed):
            words[j] = f"sub{tag}{j}"
        return " ".join(words)

    rows = []
    did = 0
    # graded pairs: ~5%, ~15%, ~30% of words substituted → jaccard
    # roughly 0.87 / 0.63 / 0.41 over 3-gram shingles
    for n_changed in (2, 5, 10):
        rows.append((did, " ".join(base), "src"))
        rows.append((did + 1, variant(n_changed, n_changed), "src"))
        did += 2
    for i in range(20):  # unrelated noise
        rows.append((did, " ".join(f"noise{i}w{j}" for j in range(40)), "src"))
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    d = str(tmp_path / "cal")
    df.write.parquet(f"{d}/documents.parquet")

    # driver-side ground truth: all-pairs exact jaccard on 3-gram sets
    def sh(text):
        w = text.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = {r[0]: sh(r[1]) for r in rows}
    truth = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                truth[(a, b)] = inter / (len(sets[a] | sets[b]))

    cands = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_near_dups(
            spark.read.parquet(f"{d}/documents.parquet"), threshold=0.0
        ).collect()
    }
    report = {
        r["threshold"]: r for r in dedup_lsh_calibration(spark, d).collect()
    }
    assert set(report) == {0.5, 0.6, 0.7}
    prev_precision = 2.0
    for t in (0.5, 0.6, 0.7):
        n_true = sum(1 for j in truth.values() if j >= t)
        n_hits = sum(1 for _, _, j in cands if j >= t)
        r = report[t]
        assert r["n_true"] == n_true
        assert r["n_candidates"] == len(cands)
        assert r["n_hits"] == n_hits
        assert r["n_hits"] <= min(r["n_candidates"], r["n_true"])
        p = r["precision"] if r["precision"] is not None else 0.0
        assert p <= prev_precision + 1e-12
        prev_precision = p
        if n_true:
            assert r["recall"] == pytest.approx(n_hits / n_true)
    # the planted grading must actually exercise the interesting
    # regime: strictly fewer hits at 0.7 than at 0.5
    assert report[0.7]["n_hits"] < report[0.5]["n_hits"]


def test_pii_redaction_semantics(spark):
    """Redaction order and counts on PII-bearing strings (the fixture
    corpus has none): emails first, then IPv4, then bare digit runs."""
    from trafik_etl_modular_spark.llmdata.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.com and 10.0.255.1 id 12345678 ok"),
            (2, "no pii here just words 123 and 40"),
            (3, "two mails a@b.io c@d.org ip 1.2.3.4"),
        ],
        "doc_id long, text string",
    )
    counts = pii_counts("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            counts["n_emails"].alias("e"),
            counts["n_ipv4"].alias("ip"),
            counts["n_idnum"].alias("idn"),
            redact_pii("text").alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["ip"], out[1]["idn"]) == (1, 1, 1)
    assert out[1]["red"] == "mail <EMAIL> and <IP> id <ID> ok"
    assert (out[2]["e"], out[2]["ip"], out[2]["idn"]) == (0, 0, 0)
    assert out[2]["red"] == "no pii here just words 123 and 40"
    assert (out[3]["e"], out[3]["ip"]) == (2, 1)
    assert out[3]["red"] == "two mails <EMAIL> <EMAIL> ip <IP>"


def test_repetition_signals_handcrafted(spark):
    """Bigram guard for <2-token docs (Spark sequence(1,0) is
    descending, not empty) and the top-bigram count itself."""
    from trafik_etl_modular_spark.llmdata.text import (
        bigrams,
        distinct_token_fraction,
        top_bigram_count,
    )

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x"), (3, "y y y y")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(bigrams("text")).alias("n_bi"),
            top_bigram_count("text").alias("top"),
            distinct_token_fraction("text").alias("uniq"),
        ).collect()
    }
    # "a b a b c" → bigrams [a b, b a, a b, b c]; top = "a b" ×2
    assert (out[1]["n_bi"], out[1]["top"]) == (4, 2)
    assert out[1]["uniq"] == 3 / 5
    # single token → no bigrams, top count 0
    assert (out[2]["n_bi"], out[2]["top"]) == (0, 0)
    # "y y y y" → [y y, y y, y y]
    assert (out[3]["n_bi"], out[3]["top"]) == (3, 3)


def test_decontamination_handcrafted(spark):
    """Contamination semantics pinned on constructed docs: a train doc
    identical to an eval doc is fully contaminated; a disjoint doc is
    clean; a doc shorter than k has zero n-grams and contamination 0."""
    from trafik_etl_modular_spark.llmdata.decontam import (
        contamination_stats,
        eval_ngrams,
    )

    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # identical
            (2, "completely different words here appearing nowhere else"),
            (3, "tiny doc"),  # < k tokens -> 0 ngrams
            (4, "prefix words then the quick brown fox appears"),  # partial
        ],
        "doc_id long, text string",
    )
    eg = eval_ngrams(eval_docs, k=3)
    out = {
        r["doc_id"]: r
        for r in contamination_stats(train, eg, k=3, threshold=0.2).collect()
    }
    assert out[1]["contamination"] == 1.0 and out[1]["contaminated"]
    assert out[2]["n_hits"] == 0 and not out[2]["contaminated"]
    assert out[3]["n_ngrams"] == 0 and out[3]["contamination"] == 0.0
    # doc 4 shares exactly "the quick brown" and "quick brown fox"
    assert out[4]["n_hits"] == 2
    assert 0.0 < out[4]["contamination"] < 1.0


def test_shuffle_key_stable_and_uniformish(spark, sf_dir):
    """md5 shuffle key is a pure row function: identical across
    repartitionings, and its first-hex-digit shard covers the full
    16-way range on the fixture."""
    from trafik_etl_modular_spark.llmdata.sampling import shuffle_key

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = docs.select("doc_id", shuffle_key("doc_id").alias("k"))
    b = docs.repartition(7).select("doc_id", shuffle_key("doc_id").alias("k"))
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
    shards = {
        r["s"]
        for r in a.select(
            F.expr("instr('0123456789abcdef', substring(k, 1, 1)) - 1").alias("s")
        ).collect()
    }
    assert shards <= set(range(16)) and len(shards) >= 12


def test_quality_quantile_keeps_top_decile(spark, sf_dir):
    """The P90 filter keeps ~10% of documents and every kept score
    dominates every dropped score."""
    from trafik_etl_modular_spark.queries.llmdata import filter_quality_quantile
    from trafik_etl_modular_spark.llmdata.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    kept = filter_quality_quantile(spark, sf_dir)
    k = kept.count()
    assert 0 < k <= max(1, int(n * 0.2))
    min_kept = kept.agg(F.min("quality")).first()[0]
    dropped_max = (
        docs.select("doc_id", quality_score("text").alias("q"))
        .join(kept, "doc_id", "left_anti")
        .agg(F.max("q"))
        .first()[0]
    )
    assert dropped_max <= min_kept


def test_crossdoc_chunk_stats_semantics(spark):
    """Chunk-level cross-doc duplication on a constructed corpus:
    docs 1 and 2 share their first 10-token window exactly (chunk=10,
    stride=5 → window starts at token 1), doc 3 is disjoint, doc 4 is
    shorter than one chunk (whole-doc chunk, unique)."""
    from trafik_etl_modular_spark.llmdata.dedup import crossdoc_chunk_stats

    shared = "a b c d e f g h i j"          # exactly one 10-token window
    docs = spark.createDataFrame(
        [
            (1, shared),
            (2, shared),
            (3, "k l m n o p q r s t"),
            (4, "u v w"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dup_frac_e9"])
        for r in crossdoc_chunk_stats(docs, chunk=10, stride=5).collect()
    }
    assert out[1] == (1, 1, 1_000_000_000)
    assert out[2] == (1, 1, 1_000_000_000)
    assert out[3] == (1, 0, 0)
    assert out[4] == (1, 0, 0)


def test_crossdoc_chunk_partial_overlap(spark):
    """A doc that EMBEDS another doc's 10-token span among unique
    context is flagged on exactly that window: doc 6 = 5 unique tokens
    + doc 5's span + 5 unique tokens, so with stride 5 its window at
    start 6 reproduces doc 5's chunk while its other windows are
    unique — document-level exact dedup would score these 0% similar."""
    from trafik_etl_modular_spark.llmdata.dedup import crossdoc_chunk_stats

    span = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [
            (5, span),
            (6, "x1 x2 x3 x4 x5 " + span + " y1 y2 y3 y4 y5"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"])
        for r in crossdoc_chunk_stats(docs, chunk=10, stride=5).collect()
    }
    # doc 6: 20 tokens → starts 1, 6, 11 → 3 chunks, one shared
    assert out[5] == (1, 1)
    assert out[6] == (3, 1)


def test_remove_repeated_chunks_planted(spark):
    """Chunk-removal rewrite: a chunk repeated across docs (and a doc
    made entirely of another doc's chunks) survives only at its
    globally-first (doc_id, start) occurrence; rewritten text is
    verified via md5 against a Python reconstruction."""
    import hashlib

    from trafik_etl_modular_spark.llmdata.dedup import remove_repeated_chunks

    c1 = "a b c d"      # chunk=4: one full chunk
    c2 = "e f g h"
    docs = spark.createDataFrame(
        [
            (1, c1 + " " + c2),          # owns both chunks
            (2, c2 + " " + c1),          # chunks [e f g h], [a b c d] — both owned by doc 1
            (3, "x y " + c1),            # chunks [x y a b], [c d] — tail chunk 'c d' unique
            (4, c1),                     # exact chunk dup of doc 1's first chunk
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_repeated_chunks(docs, chunk=4).collect()
    }

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    # doc 1 keeps everything
    assert (out[1]["n_chunks"], out[1]["n_kept_chunks"]) == (2, 2)
    assert out[1]["rewritten_md5"] == md5(c1 + " " + c2)
    # doc 2's two chunks are doc 1's chunks → all removed
    assert (out[2]["n_kept_chunks"], out[2]["n_tokens_after"]) == (0, 0)
    assert out[2]["rewritten_md5"] == md5("")
    # doc 3: "x y a b" is novel (different 4-token window), "c d" novel
    assert (out[3]["n_chunks"], out[3]["n_kept_chunks"]) == (2, 2)
    assert out[3]["n_tokens_after"] == 6
    # doc 4 is exactly doc 1's first chunk → removed
    assert (out[4]["n_kept_chunks"], out[4]["rewritten_md5"]) == (0, md5(""))
    # total surviving tokens = distinct chunk contents' tokens
    assert sum(r["n_tokens_after"] for r in out.values()) == 8 + 6

    # stable under repartitioning (ownership is a global min, not
    # partition-order dependent)
    re8 = {
        r["doc_id"]: r["rewritten_md5"]
        for r in remove_repeated_chunks(docs.repartition(8), chunk=4).collect()
    }
    assert re8 == {k: v["rewritten_md5"] for k, v in out.items()}


def test_semantic_dedup_planted_groups(spark):
    """SemDeDup recovers planted near-dup groups: 6 well-separated
    base directions, each with 3 tiny-noise copies (pairwise cosine
    ≈ 1) → every group resolves to one keeper (its min id); the
    separated groups never merge (cross-group cosine ≈ 0)."""
    import numpy as np

    from trafik_etl_modular_spark.llmdata.similarity import semantic_dedup

    rng = np.random.RandomState(7)
    base = rng.randn(6, 32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # orthogonalize so cross-group cosine is ~0
    q, _ = np.linalg.qr(base.T)
    base = q.T[:6]
    rows = []
    for g in range(6):
        for j in range(3):
            v = base[g] + 0.01 * rng.randn(32)
            rows.append((g * 10 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, threshold=0.9, n_clusters=4).collect()
    by_vec = {r["vec_id"]: r for r in out}
    assert len(by_vec) == 18
    for g in range(6):
        ids = [g * 10 + j for j in range(3)]
        groups = {by_vec[i]["group_id"] for i in ids}
        assert groups == {g * 10}, f"group {g} split: {groups}"
        keepers = [i for i in ids if by_vec[i]["is_keeper"]]
        assert keepers == [g * 10]
        assert all(by_vec[i]["group_size"] == 3 for i in ids)


def test_incremental_dedup_verdicts(spark):
    """All three verdicts on a constructed batch: doc 100 is an exact
    copy of corpus doc 1 (verdict exact_dup, matched to the corpus
    keeper), doc 101 shares most shingles with corpus doc 2 (near_dup),
    doc 102 is disjoint (novel)."""
    from trafik_etl_modular_spark.llmdata.dedup import incremental_near_dups

    c2 = "p q r s t u v w x y z"
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, c2),
            (3, "m n o"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, "a b c d e f g h i j"),   # exact copy of doc 1
            (101, c2 + " extra"),            # superset of doc 2's shingles
            (102, "k1 k2 k3 k4 k5 k6"),      # disjoint
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["verdict"], r["matched_id"], r["n_near_matches"])
        for r in incremental_near_dups(corpus, batch, threshold=0.6).collect()
    }
    assert out[100] == ("exact_dup", 1, 1)   # jaccard 1.0 also counts as near
    assert out[101][0] == "near_dup" and out[101][1] == 2
    assert out[102] == ("novel", None, 0)


def test_xxh64_matches_spark(spark):
    """llmdata/xxh64.py is the foundation of the derived sketch
    oracles: every form the sketches use — string, long, chained
    longs, (long, int) lane form — must match Spark's xxhash64
    bit-for-bit."""
    import numpy as np

    from trafik_etl_modular_spark.llmdata import xxh64 as X

    strs = [
        "",
        "a",
        "hello",
        "0123456789abcdef0123456789abcdef-exceeds-32-bytes",
        "åäö unicode ÿ",
    ]
    got = spark.createDataFrame([(s,) for s in strs], "s string").select(
        F.xxhash64("s").alias("h")
    ).collect()
    assert [int(r["h"]) for r in got] == [
        int(np.int64(np.uint64(X.hash_string(s)))) for s in strs
    ]

    longs = [0, 1, -1, 2**62, -(2**63), 123456789123456789]
    got = spark.createDataFrame([(v,) for v in longs], "v long").select(
        F.xxhash64("v").alias("h")
    ).collect()
    assert [int(r["h"]) for r in got] == [
        int(X.to_signed(X.hash_long(np.uint64(v & (2**64 - 1)), X.SPARK_SEED)))
        for v in longs
    ]

    trips = [(1, 2, 3), (-5, 7, -9), (2**40, -(2**40), 17)]
    got = spark.createDataFrame(trips, "a long, b long, c long").select(
        F.xxhash64("a", "b", "c").alias("h")
    ).collect()
    assert [int(r["h"]) for r in got] == [
        int(np.int64(np.uint64(X.chain_longs(list(t_))))) for t_ in trips
    ]

    pairs = [(123, 0), (-99, 5), (2**50, 63)]
    got = spark.createDataFrame(pairs, "h long, s int").select(
        F.xxhash64("h", "s").alias("x")
    ).collect()
    expect = []
    for hv, sv in pairs:
        h1 = X.hash_long(np.uint64(hv & (2**64 - 1)), X.SPARK_SEED)
        expect.append(int(X.to_signed(X.hash_int(np.uint64(sv), h1))))
    assert [int(r["x"]) for r in got] == expect


def test_sketch_oracle_derivations_match_engine(spark, sf_dir):
    """The derived-oracle builders re-run the engine's sketches
    outside Spark; candidate pairs and signatures must be IDENTICAL
    to the engine's own, else the frozen oracle would diverge."""
    from trafik_etl_modular_spark.catalog import load_table
    from trafik_etl_modular_spark.llmdata import sketch_oracle as SO
    from trafik_etl_modular_spark.llmdata.dedup import (
        hashed_shingles,
        lsh_candidate_pairs,
        minhash_signature,
        simhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", hashed_shingles(F.col("text")).alias("sh")).filter(
        F.size("sh") > 0
    )
    signed = sh.select("doc_id", minhash_signature(F.col("sh"), 64).alias("minhash"))
    eng_pairs = sorted(
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(signed, "doc_id", "minhash", 16, 4, 1000).collect()
    )
    assert eng_pairs == SO.derive_minhash_candidates(sf_dir, max_bucket_size=1000)
    SO.check_no_shingle_collisions(sf_dir)

    eng_sig = sorted(
        (r["doc_id"], r["simhash"]) for r in simhash_signatures(docs).collect()
    )
    assert eng_sig == sorted(SO.derive_simhash_signatures(sf_dir))


def test_quality_classifier_planted_and_stable(spark):
    """Hashed linear classifier: score is an exact integer fold over
    planted features (verified against a Python re-computation) and
    identical under any repartitioning (pure per-row function)."""
    import hashlib

    from trafik_etl_modular_spark.llmdata.classifier import score_documents

    texts = ["alpha beta gamma", "single", "x y x y"]
    docs = spark.createDataFrame(
        [(i, t_) for i, t_ in enumerate(texts)], "doc_id long, text string"
    )

    def py_score(text):
        # bigram buckets are DERIVED from unigram buckets
        # ((b_a*31 + b_b) mod 2^16) — one md5 per token, see
        # classifier.unigram_buckets
        ub = [
            int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
            for t in text.split(" ")
        ]

        def w(b):
            return (b * 2654435761) % 1001 - 500

        raw = sum(w(b) for b in ub) + sum(
            w((a * 31 + b) % 65536) for a, b in zip(ub, ub[1:])
        )
        return 2 * len(ub) - 1, raw

    got = {r["doc_id"]: r for r in score_documents(docs).collect()}
    for i, t_ in enumerate(texts):
        n, raw = py_score(t_)
        assert got[i]["n_features"] == n
        assert got[i]["raw_score"] == raw
        # projected score is fquant'd to 1e-9 (integer round-trip,
        # see functions.scalars.fquant) — compare within the quantum
        assert abs(got[i]["score"] - raw / (1000.0 * n)) <= 1e-9
        assert got[i]["label"] == ("keep" if got[i]["score"] >= 0.0 else "drop")

    re32 = {
        r["doc_id"]: (r["raw_score"], r["score"])
        for r in score_documents(docs.repartition(32)).collect()
    }
    assert re32 == {k: (v["raw_score"], v["score"]) for k, v in got.items()}


def test_exact_quota_split_proportions_and_stability(spark):
    """Per group: exactly floor(0.8*n) train rows regardless of n's
    divisibility, and identical assignment under repartitioning."""
    from trafik_etl_modular_spark.llmdata.sampling import exact_quota_split

    rows = [(i, "a") for i in range(13)] + [(100 + i, "b") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = exact_quota_split(df, "lang", "doc_id", 8, 10).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["lang"], []).append(r)
    assert sum(1 for r in by_grp["a"] if r["split"] == "train") == 10  # floor(10.4)
    assert sum(1 for r in by_grp["b"] if r["split"] == "train") == 5  # floor(5.6)

    re_out = {
        r["doc_id"]: r["split"]
        for r in exact_quota_split(df.repartition(16), "lang", "doc_id", 8, 10).collect()
    }
    assert re_out == {r["doc_id"]: r["split"] for r in out}


def test_streaming_incremental_dedup_equals_direct_batch_calls(spark, sf_dir):
    """The streamed verdicts (index carried as foreachBatch state)
    must equal calling incremental_near_dups directly per batch with
    corpus = all strictly-earlier batches — micro-batching is an
    execution detail, not a semantic one."""
    from pyspark.sql import functions as F

    from trafik_etl_modular_spark.llmdata.dedup import incremental_near_dups
    from trafik_etl_modular_spark.queries.common import t
    from trafik_etl_modular_spark.streaming.incremental_dedup import (
        incremental_dedup_stream_run,
    )

    streamed = {
        r["doc_id"]: (r["batch_id"], r["verdict"], r["matched_id"], r["n_near_matches"])
        for r in incremental_dedup_stream_run(spark, sf_dir, n_batches=4).collect()
    }

    docs = t(spark, sf_dir, "documents")
    expected = {}
    for b in range(4):
        batch = docs.filter(F.col("doc_id") % 4 == b)
        if b == 0:
            for r in batch.select("doc_id").collect():
                expected[r["doc_id"]] = (0, "novel", None, 0)
            continue
        corpus = docs.filter(F.col("doc_id") % 4 < b)
        for r in incremental_near_dups(corpus, batch, k=3, threshold=0.6).collect():
            expected[r["doc_id"]] = (
                b,
                r["verdict"],
                r["matched_id"],
                r["n_near_matches"],
            )

    assert streamed == expected


def test_temperature_mix_upweights_small_sources(spark):
    """alpha=1/2 mixing: the small source gets a HIGHER admission
    rate than the big one (that is the point of temperature
    smoothing); thresholds are exact integers, admission is a pure
    integer compare, and the whole report is repartition-stable."""
    import math

    from pyspark.sql import functions as F

    from trafik_etl_modular_spark.llmdata.sampling import (
        temperature_mix_admit,
        temperature_mix_rates,
    )

    rows = [(i, "big", 100) for i in range(900)] + [
        (1000 + i, "small", 100) for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    rates = {r["source"]: r for r in temperature_mix_rates(docs).collect()}

    # fixed-point weight matches the formula exactly
    assert rates["big"]["s_fix"] == math.floor(math.sqrt(90000) * (1 << 20))
    r_big = rates["big"]["thr"] / 2**32
    r_small = rates["small"]["thr"] / 2**32
    assert r_small > r_big
    # p_small = sqrt(10000)/(sqrt(90000)+sqrt(10000)) = 1/4, so the
    # small source's uncapped rate is T·p/n = 50000·0.25/10000 = 1.25
    # → capped at 1.0; big: 50000·0.75/90000 = 0.41666…
    assert r_small == 1.0
    assert abs(r_big - 50000 * 0.75 / 90000) < 1e-6

    # expected admitted tokens ≈ 50% target (md5-uniform admission)
    kept = temperature_mix_admit(docs, temperature_mix_rates(docs))
    tok = kept.agg(F.sum("n_tok")).first()[0]
    assert 0.35 * 100_000 <= tok <= 0.65 * 100_000

    re32 = temperature_mix_admit(
        docs.repartition(32), temperature_mix_rates(docs.repartition(32))
    )
    assert {r["doc_id"] for r in re32.collect()} == {
        r["doc_id"] for r in kept.collect()
    }


# ---------------------------------------------------------------------------
# BPE merge candidates + Gopher rule vector (round-5 additions)
# ---------------------------------------------------------------------------


def test_bpe_merge_candidates_match_python_recount(spark, sf_dir):
    """The distributed pair count equals a driver-side brute recount
    at fixture scale, and the top-1 really is the corpus argmax —
    i.e. one merge iteration would pick the same pair."""
    from collections import Counter

    from trafik_etl_modular_spark.queries.llmdata import vocab_bpe_merge_candidates

    got = {r["pair"]: r["pair_count"] for r in vocab_bpe_merge_candidates(spark, sf_dir).collect()}
    texts = [r["text"] for r in load_table(spark, sf_dir, "documents").select("text").collect()]
    exact = Counter()
    for tx in texts:
        toks = tx.split(" ")
        exact.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert got == dict(top)


def test_bpe_pair_hof_guards_short_docs(spark):
    """Empty and 1-token docs contribute zero pairs (the sequence(1,0)
    descending-range trap is guarded in bigrams())."""
    from trafik_etl_modular_spark.llmdata.text import bigrams

    df = spark.createDataFrame([("",), ("solo",), ("a b",)], ["text"])
    rows = df.select(F.explode_outer(bigrams("text")).alias("p")).collect()
    assert [r["p"] for r in rows] == [None, None, "a b"]


def test_gopher_rules_conjunction_and_bounds(spark, sf_dir):
    """`passes` is exactly the AND of the four rule columns; the
    word-count rule is inclusive on both boundaries; the fixture
    exercises both verdicts of every rule."""
    from trafik_etl_modular_spark.queries.llmdata import text_gopher_rules

    rows = text_gopher_rules(spark, sf_dir).collect()
    for r in rows:
        assert r["passes"] == (
            r["rule_word_count"]
            and r["rule_mean_word_len"]
            and r["rule_symbol_ratio"]
            and r["rule_stopword_frac"]
        )
        assert r["rule_word_count"] == (25 <= r["n_words"] <= 90)
        assert r["rule_stopword_frac"] == (r["stopword_frac"] >= 0.03)
    for col in ("rule_word_count", "rule_mean_word_len", "rule_stopword_frac", "passes"):
        vals = {r[col] for r in rows}
        assert vals == {True, False}, f"{col} never flips on the fixture: {vals}"


def test_hard_negatives_are_cross_label_and_bucket_local(spark, sf_dir):
    """Every mined negative has a different label from its anchor,
    shares the anchor's LSH bucket, and rn orders by cosine desc."""
    from trafik_etl_modular_spark.llmdata.similarity import hyperplane_bucket
    from trafik_etl_modular_spark.queries.llmdata import sim_hard_negatives

    rows = sim_hard_negatives(spark, sf_dir).collect()
    assert rows, "fixture yields no hard negatives"
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id", hyperplane_bucket("embedding", 64, 6).alias("b")
        ).collect()
    }
    by_anchor = {}
    for r in rows:
        assert r["label"] != r["query_label"]
        assert bucket[r["vec_id"]] == bucket[r["query_id"]]
        by_anchor.setdefault(r["query_id"], []).append(r)
    for group in by_anchor.values():
        group.sort(key=lambda r: r["rn"])
        cosines = [r["cosine"] for r in group]
        assert cosines == sorted(cosines, reverse=True)


def test_contrastive_triples_pick_the_per_side_argmax(spark, sf_dir):
    """pos/neg are the bucket-local argmax per side: positive beats
    every other same-label candidate, negative every other-label one
    (ties broken by id), and both sides exclude the anchor itself."""
    from trafik_etl_modular_spark.llmdata.similarity import (
        cosine,
        hyperplane_bucket,
        to_double_array,
    )
    from trafik_etl_modular_spark.queries.llmdata import sample_contrastive_triples

    triples = sample_contrastive_triples(spark, sf_dir).collect()
    assert triples, "fixture yields no triples"
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.select(
        "vec_id", "label", hyperplane_bucket("embedding", 64, 6).alias("b"),
        to_double_array("embedding").alias("v"),
    )
    rows = bucketed.collect()
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    by_id = {r["vec_id"]: r for r in rows}
    for tr in triples:
        a = by_id[tr["anchor_id"]]
        cands = [r for r in rows if r["b"] == a["b"] and r["vec_id"] != a["vec_id"]]
        pos = [r for r in cands if r["label"] == a["label"]]
        neg = [r for r in cands if r["label"] != a["label"]]
        best_pos = max(pos, key=lambda r: (cos(r["v"], a["v"]), -r["vec_id"]))
        best_neg = max(neg, key=lambda r: (cos(r["v"], a["v"]), -r["vec_id"]))
        assert tr["pos_id"] == best_pos["vec_id"]
        assert tr["neg_id"] == best_neg["vec_id"]
        assert tr["pos_cosine"] == pytest.approx(cos(best_pos["v"], a["v"]))
        assert tr["neg_cosine"] == pytest.approx(cos(best_neg["v"], a["v"]))


def test_curriculum_phases_are_quartile_balanced(spark, sf_dir):
    """Phases partition the corpus at the exact quartile thresholds:
    monotone in quality (max quality of phase p ≤ min of phase p+1)
    and roughly N/4 docs per phase (exact up to threshold ties)."""
    from trafik_etl_modular_spark.queries.llmdata import sample_curriculum_phases

    rows = sample_curriculum_phases(spark, sf_dir).collect()
    n = len(rows)
    by_phase = {}
    for r in rows:
        assert 1 <= r["phase"] <= 4 and 0 <= r["within_phase_shard"] <= 3
        by_phase.setdefault(r["phase"], []).append(r["quality"])
    assert set(by_phase) == {1, 2, 3, 4}
    for p in (1, 2, 3):
        assert max(by_phase[p]) <= min(by_phase[p + 1])
    for p in (1, 2, 3, 4):
        assert abs(len(by_phase[p]) - n / 4) <= n * 0.1


def test_bigram_lm_probabilities_sum_to_one_per_prefix(spark, sf_dir):
    """The implied model is a proper conditional distribution: for
    each prefix, Σ_cur c_bi/c_prev over distinct bigrams = 1, and a
    doc repeating one bigram scores ~1.0 while the fixture corpus
    scores strictly lower on average."""
    from collections import Counter

    from trafik_etl_modular_spark.queries.llmdata import text_bigram_lm_score

    texts = [r["text"] for r in load_table(spark, sf_dir, "documents").select("text").collect()]
    c_bi, c_prev = Counter(), Counter()
    for tx in texts:
        toks = tx.split(" ")
        for a, b in zip(toks, toks[1:]):
            c_bi[(a, b)] += 1
            c_prev[a] += 1
    for prev in c_prev:
        s = sum(n / c_prev[prev] for (a, _), n in c_bi.items() if a == prev)
        assert abs(s - 1.0) < 1e-9
    rows = text_bigram_lm_score(spark, sf_dir).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    for d in docs[:25]:
        toks = d["text"].split(" ")
        ratios = [
            c_bi[(a, b)] * 1_000_000_000 // c_prev[a] for a, b in zip(toks, toks[1:])
        ]
        r = by_doc[d["doc_id"]]
        assert r["n_pairs"] == len(ratios)
        assert r["sum_q_e9"] == sum(ratios)
        assert r["mean_bigram_prob_e9"] == sum(ratios) // len(ratios)


def test_curation_v5_manifest_accounts_for_every_survivor(spark, sf_dir):
    """The per-phase manifest partitions exactly the gate∩floor
    survivor set: phase doc counts sum to the survivor count, phases
    are quartile-balanced, and avg_quality increases with phase."""
    from trafik_etl_modular_spark.llmdata.text import bigram_lm_scores
    from trafik_etl_modular_spark.queries.llmdata import (
        curation_pipeline_v5,
        text_gopher_rules,
    )

    rows = sorted(curation_pipeline_v5(spark, sf_dir).collect(), key=lambda r: r["phase"])
    assert [r["phase"] for r in rows] == [1, 2, 3, 4]
    docs = load_table(spark, sf_dir, "documents")
    gate_ids = {r["doc_id"] for r in text_gopher_rules(spark, sf_dir).filter("passes").collect()}
    lm_ids = {
        r["doc_id"]
        for r in bigram_lm_scores(docs).collect()
        if r["mean_bigram_prob_e9"] >= 33_500_000
    }
    n_surv = len(gate_ids & lm_ids)
    assert sum(r["n_docs"] for r in rows) == n_surv
    quals = [r["avg_quality"] for r in rows]
    assert quals == sorted(quals)


def test_contrastive_triples_drop_single_sided_anchors(spark):
    """An anchor whose bucket holds only same-label (or only
    different-label) neighbors yields NO triple — inner semantics,
    no null-padded halves."""
    from trafik_etl_modular_spark.queries import llmdata as Q

    # two clusters on opposite sides of every hyperplane would be
    # fragile to construct; instead reuse the real op end-to-end on a
    # fixture-shaped frame where vec_id 0 (an anchor, 0 % 100 == 0)
    # shares its bucket only with same-label vectors: copies of the
    # same vector always share a bucket and label here.
    import pyspark.sql.functions as F  # noqa: F401

    base = [0.5] * 64
    rows = [(0, base, 1), (1, base, 1), (2, base, 1)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        emb.write.parquet(f"{d}/embeddings.parquet")
        out = Q.sample_contrastive_triples(spark, d).collect()
    assert out == []


def test_gopher_word_count_rule_boundaries(spark, tmp_path):
    """The word-count band is inclusive at 25 and 90 exactly; 24 and
    91 fail — run through the registered query end to end."""
    from trafik_etl_modular_spark.queries.llmdata import text_gopher_rules

    def doc(i, n):
        # 'the' every other word keeps stopword_frac comfortably >0.03
        return (i, " ".join(("the" if j % 2 else "word") for j in range(n)))

    rows = [doc(24, 24), doc(25, 25), doc(90, 90), doc(91, 91)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "gop")
    df.write.parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: r["rule_word_count"] for r in text_gopher_rules(spark, d).collect()}
    assert got == {24: False, 25: True, 90: True, 91: False}


def test_ann_recall_report_certificates_hold(spark, sf_dir):
    """Every probe's IVF recall@10 certificate must hold at nprobe=8,
    and the exact top-1 must agree with an independent brute-force
    rerank of that probe."""
    from trafik_etl_modular_spark.llmdata.similarity import brute_force_topk
    from trafik_etl_modular_spark.queries.llmdata import sim_ann_recall_report

    rows = sim_ann_recall_report(spark, sf_dir).collect()
    assert rows, "probe panel empty"
    assert all(r["recall10_ok"] for r in rows), [
        r["query_id"] for r in rows if not r["recall10_ok"]
    ]
    emb = load_table(spark, sf_dir, "embeddings")
    probe = rows[0]["query_id"]
    top1 = (
        brute_force_topk(
            emb.filter(F.col("vec_id") != probe),
            emb.filter(F.col("vec_id") == probe),
            k=1,
        )
        .collect()[0]["vec_id"]
    )
    assert rows[0]["exact_top1_id"] == top1


def test_novelty_curve_first_doc_fully_novel(spark, sf_dir):
    """The min-doc_id document owns all of its shingles (novelty_e9 ==
    1e9); every doc's n_novel ≤ n_shingles; and Σ n_novel equals the
    number of DISTINCT shingles in the corpus (each distinct shingle
    owned exactly once)."""
    from trafik_etl_modular_spark.llmdata.dedup import hashed_shingles
    from trafik_etl_modular_spark.queries.llmdata import text_novelty_curve

    out = text_novelty_curve(spark, sf_dir).collect()
    by_id = {r["doc_id"]: r for r in out}
    first = min(by_id)
    assert by_id[first]["novelty_e9"] == 1_000_000_000
    assert all(r["n_novel"] <= r["n_shingles"] for r in out)
    docs = load_table(spark, sf_dir, "documents")
    n_distinct = (
        docs.select(F.explode(hashed_shingles("text", 3)).alias("g"))
        .distinct()
        .count()
    )
    assert sum(r["n_novel"] for r in out) == n_distinct


def test_cumulative_distinct_users_matches_direct_count(spark, sf_dir):
    """The running first-touch sum at the last day must equal the
    table's total distinct users, and the series must be strictly
    increasing."""
    from trafik_etl_modular_spark.queries.windows import (
        window_cumulative_distinct_users,
    )

    rows = sorted(
        window_cumulative_distinct_users(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    cums = [r["cum_distinct_users"] for r in rows]
    assert cums == sorted(cums) and len(set(cums)) == len(cums)
    ev = load_table(spark, sf_dir, "events")
    assert cums[-1] == ev.select("user_id").distinct().count()


def test_overlap_matrix_bounded_by_group_distincts(spark, sf_dir):
    """|users(A) ∩ users(B)| ≤ min(|users(A)|, |users(B)|) for every
    pair, and the matrix covers every type pair with any overlap."""
    from trafik_etl_modular_spark.queries.aggregates import (
        agg_distinct_overlap_matrix,
    )

    ev = load_table(spark, sf_dir, "events")
    per_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in agg_distinct_overlap_matrix(spark, sf_dir).collect():
        assert r["type_a"] < r["type_b"]
        assert r["n_shared_users"] <= min(per_type[r["type_a"]], per_type[r["type_b"]])


def test_curation_v6_manifest_partitions_gated_corpus(spark, sf_dir):
    """The v6 manifest's doc counts partition exactly the Gopher-gated
    corpus; token budgets never grow under the rewrite; per-lang train
    quota is exactly floor(0.8·n)."""
    from trafik_etl_modular_spark.queries.llmdata import (
        curation_pipeline_v6,
        text_gopher_rules,
    )

    rows = curation_pipeline_v6(spark, sf_dir).collect()
    n_gated = text_gopher_rules(spark, sf_dir).filter("passes").count()
    assert sum(r["n_docs"] for r in rows) == n_gated
    assert all(r["n_tok_after"] <= r["n_tok_before"] for r in rows)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["split"]] = r["n_docs"]
    for lang, d in by_lang.items():
        n = d.get("train", 0) + d.get("holdout", 0)
        assert d.get("train", 0) == n * 8 // 10


def test_bfs_hops_handcrafted_path(spark):
    """BFS on a handcrafted path 1-2-3-4-5 (undirected): hops from 1
    must be exact, and vertex 5 unreached within 3 rounds."""
    from trafik_etl_modular_spark.queries.graph import bfs_hops

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "u bigint, v bigint"
    )
    ee = e.unionByName(e.selectExpr("v AS u", "u AS v"))
    got = {r["id"]: r["hop"] for r in bfs_hops(spark, ee, source=1, rounds=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_pagerank_conserves_mass_and_ranks_hub_first(spark):
    """On a star graph (hub 0 — leaves 1..4, undirected) the hub must
    out-rank every leaf, leaves tie exactly, and total rank mass stays
    1 (the graph is dangling-free by construction)."""
    from trafik_etl_modular_spark.queries.graph import pagerank

    e = spark.createDataFrame([(0, i) for i in range(1, 5)], "u bigint, v bigint")
    ee = e.unionByName(e.selectExpr("v AS u", "u AS v"))
    rows = {r["u"]: r["rank"] for r in pagerank(spark, ee, rounds=3).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    assert all(rows[0] > rows[i] for i in range(1, 5))
    leaf_ranks = {rows[i] for i in range(1, 5)}
    assert len(leaf_ranks) == 1
    assert abs(sum(rows.values()) - 1.0) < 1e-9
