"""Round-13 optimization internals: width sizing is data-derived
(not core-count-tuned) and the packed SimHash vote lanes keep the
exact sign semantics at the field boundaries."""

from __future__ import annotations


class _FakeSC:
    defaultParallelism = 32


class _FakeSpark:
    sparkContext = _FakeSC()


def test_wedge_width_scales_with_adjacency_rows():
    from trafik_etl_modular_spark.queries.graph import (
        _WEDGE_ADJ_ROWS_PER_PARTITION,
        _wedge_width,
    )

    sp = _FakeSpark()
    # tiny graph -> the floor, never 0/1 (the AQE one-partition trap)
    assert _wedge_width(sp, 10) == 4
    # bench-scale adjacency (~219k symmetric rows at sf0.1) -> single
    # digits, NOT the local core count
    w = _wedge_width(sp, 219_000)
    assert 4 <= w <= 12
    # lake-scale graph -> grows linearly until the 4x-parallelism cap
    assert _wedge_width(sp, 100 * _WEDGE_ADJ_ROWS_PER_PARTITION) == 100
    assert _wedge_width(sp, 10**12) == 4 * sp.sparkContext.defaultParallelism


def test_edge_pin_width_formula_matches_contract():
    """The pin coalesces to ~_EDGE_ROWS_PER_PARTITION rows per
    partition with the documented floor/cap — recompute the formula
    here so a silent constant change fails loudly."""
    from trafik_etl_modular_spark.queries.graph import (
        _EDGE_MIN_PARTITIONS,
        _EDGE_ROWS_PER_PARTITION,
    )

    dp = 32

    def width(n_rows: int) -> int:
        return max(
            _EDGE_MIN_PARTITIONS,
            min(-(-n_rows // _EDGE_ROWS_PER_PARTITION), 4 * dp),
        )

    # sf0.1's 1.17M-row table lands at the floor (the measured
    # optimum band, 4-8), not the 32-file scan width
    assert width(1_173_742) == _EDGE_MIN_PARTITIONS
    # ~1.2B rows (SF100-scale) -> hundreds of ~2M-row partitions
    assert width(1_200_000_000) == 128  # capped at 4x parallelism
    assert width(200_000_000) == 100    # below the cap: rows-derived


def test_simhash_packed_vote_sign_boundaries(spark):
    """Exact tie semantics of the packed vote lanes: votes_i = 0
    (equal +1/-1 votes) must leave bit i UNSET, votes_i = +1 must set
    it — the 2*ones > n inequality at its boundary."""
    from pyspark.sql import functions as F

    from trafik_etl_modular_spark.llmdata.dedup import simhash_signatures

    # two tokens whose hashes differ in bit0 -> bit0 vote ties at 0
    docs = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a"])], "doc_id long, toks array<string>"
    ).select(
        "doc_id",
        F.transform("toks", lambda t: F.xxhash64(t)).alias("th"),
    )
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(docs, text_col="th", hashes=True).collect()
    }
    ha, hb = [
        r[0]
        for r in spark.sql(
            "select xxhash64('a') union all select xxhash64('b')"
        ).collect()
    ]
    for i in range(64):
        ba, bb = (ha >> i) & 1, (hb >> i) & 1
        want = 1 if (ba + bb) * 2 > 2 else 0  # doc 1: two votes
        assert ((sigs[1] >> i) & 1) == want, f"doc1 bit {i}"
        assert ((sigs[2] >> i) & 1) == ((ha >> i) & 1), f"doc2 bit {i}"
