"""Production (xxhash64) vs notarization (md5) hash lanes for the
sketch family (verdict r09 ask #4).

Every sketch invariant must hold under BOTH lanes, and the physical
plan must be SHAPE-IDENTICAL (same operator sequence, same shuffle
count, no Python nodes) — the lane swaps one codegen expression, not
the plan.  The oracle surface keeps the neutral lane; these tests are
what keeps the xxhash64 path honest without a DuckDB mirror."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from trafik_etl_modular_spark.functions.neutral_hash import HASH_SPACE, nhash
from trafik_etl_modular_spark.plans.audit import audit, explain
from trafik_etl_modular_spark.queries.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    KMV_K,
    bloom_lanes,
    bloom_word_table,
    cms_cell_for,
    kmv_hash,
)

LANES = ("neutral", "xxhash64")


def _node_seq(df) -> list[str]:
    return re.findall(r"^\(\d+\) ([A-Za-z]+)", explain(df, "formatted"), re.M)


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"document number {i} body text") for i in range(300)],
        "doc_id long, text string",
    )


def _bloom_no_false_negative_frame(spark, lane):
    docs = _docs(spark)
    m = 16 * 300
    lanes = bloom_lanes(m, lane)
    words = bloom_word_table(
        docs.select(F.explode(lanes).alias("p")), pos_col="p"
    )
    probe = docs.select("doc_id", F.explode(lanes).alias("p")).select(
        "doc_id",
        (F.col("p") / 32).cast("bigint").alias("word_idx"),
        (F.col("p") % 32).cast("int").alias("bit"),
    )
    hits = probe.join(F.broadcast(words), "word_idx", "left").select(
        "doc_id",
        F.coalesce(
            F.expr("(w & shiftleft(CAST(1 AS BIGINT), bit)) != 0"), F.lit(False)
        ).alias("hit"),
    )
    return hits.groupBy("doc_id").agg(F.min("hit").alias("maybe"))


@pytest.mark.parametrize("lane", LANES)
def test_bloom_no_false_negatives_both_lanes(spark, lane):
    out = _bloom_no_false_negative_frame(spark, lane)
    assert out.where(~F.col("maybe")).count() == 0


def test_bloom_plan_shape_identical_across_lanes(spark):
    frames = {lane: _bloom_no_false_negative_frame(spark, lane) for lane in LANES}
    seqs = {lane: _node_seq(df) for lane, df in frames.items()}
    assert seqs["neutral"] == seqs["xxhash64"]
    audits = {lane: audit(df) for lane, df in frames.items()}
    assert audits["neutral"].n_exchanges == audits["xxhash64"].n_exchanges
    assert not audits["xxhash64"].has_python_eval


def _events(spark):
    # skewed frequencies: user u appears (u % 13 + 1) times
    rows = [(u,) for u in range(120) for _ in range(u % 13 + 1)]
    return spark.createDataFrame(rows, "user_id long")


def _cms_frame(spark, lane):
    ev = _events(spark)
    lanes_arr = F.array(*[F.lit(j) for j in range(CMS_DEPTH)])
    keyed = ev.select("user_id", F.explode(lanes_arr).alias("j")).select(
        "user_id", "j", cms_cell_for(F.col("j"), F.col("user_id"), lane).alias("cell")
    )
    table = keyed.groupBy("j", "cell").agg(F.count("*").cast("bigint").alias("c"))
    exact = ev.groupBy("user_id").agg(F.count("*").cast("bigint").alias("exact_n"))
    probes = exact.select("user_id", "exact_n", F.explode(lanes_arr).alias("j")).select(
        "user_id",
        "exact_n",
        "j",
        cms_cell_for(F.col("j"), F.col("user_id"), lane).alias("cell"),
    )
    return (
        probes.join(table, ["j", "cell"])
        .groupBy("user_id")
        .agg(
            F.any_value("exact_n").alias("exact_n"),
            F.min("c").alias("cms_est"),
        )
    )


@pytest.mark.parametrize("lane", LANES)
def test_cms_never_undercounts_both_lanes(spark, lane):
    est = _cms_frame(spark, lane)
    assert est.where(F.col("cms_est") < F.col("exact_n")).count() == 0
    assert est.count() == 120


def test_cms_plan_shape_identical_across_lanes(spark):
    seqs = {lane: _node_seq(_cms_frame(spark, lane)) for lane in LANES}
    assert seqs["neutral"] == seqs["xxhash64"]


def _kmv_estimate(spark, lane, n_users):
    users = spark.range(n_users).select(F.col("id").alias("user_id"))
    h = users.select(kmv_hash("user_id", lane).alias("h")).distinct()
    sk = (
        h.orderBy("h")
        .limit(KMV_K)
        .agg(F.max("h").alias("hk"), F.count("*").alias("kc"))
        .first()
    )
    if sk["kc"] < KMV_K:
        return n_users  # exact branch
    return (KMV_K - 1) * HASH_SPACE / sk["hk"]


@pytest.mark.parametrize("lane", LANES)
def test_kmv_estimate_both_lanes(spark, lane):
    # exact branch below k
    assert _kmv_estimate(spark, lane, 40) == 40
    # sketch branch: k=64 gives sigma ~ 1/8; accept 4 sigma
    est = _kmv_estimate(spark, lane, 2000)
    assert abs(est - 2000) / 2000 < 0.5


def test_lane_values_differ_but_range_matches(spark):
    """The lanes are genuinely different hash functions over the same
    [0, 2^60) range — a sanity pin that the swap is real."""
    df = spark.range(100).select(
        nhash(F.col("id"), "s", "neutral").alias("hn"),
        nhash(F.col("id"), "s", "xxhash64").alias("hx"),
    )
    row = df.agg(
        F.sum((F.col("hn") == F.col("hx")).cast("int")).alias("n_same"),
        F.min("hn").alias("mn1"),
        F.min("hx").alias("mn2"),
        F.max("hn").alias("mx1"),
        F.max("hx").alias("mx2"),
    ).first()
    assert row["n_same"] == 0
    assert 0 <= row["mn1"] and 0 <= row["mn2"]
    assert row["mx1"] < HASH_SPACE and row["mx2"] < HASH_SPACE


def test_unknown_lane_raises():
    with pytest.raises(ValueError):
        nhash("x", "s", "fnv1a")
