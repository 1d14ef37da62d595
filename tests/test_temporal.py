"""Edge semantics of the temporal join operators (boundaries, NULLs,
no-match) on handcrafted frames — the cases the fixture oracle hits
only by accident."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.operators.temporal import asof_join, range_join_buckets


def _ts(df, *cols):
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def test_asof_boundaries_and_no_match(spark):
    left = _ts(
        spark.createDataFrame(
            [
                (1, "k", "2024-01-01 09:00:00"),  # before any right row
                (2, "k", "2024-01-01 10:00:00"),  # exactly equal ts → matches
                (3, "k", "2024-01-01 11:30:00"),  # between rights → earlier one
                (4, "k", "2024-01-02 00:00:00"),  # after all → latest
                (5, "other", "2024-01-01 12:00:00"),  # key with no rights
            ],
            "id long, k string, ts string",
        ),
        "ts",
    )
    right = _ts(
        spark.createDataFrame(
            [
                ("k", "2024-01-01 10:00:00", 100.0),
                ("k", "2024-01-01 12:00:00", 200.0),
            ],
            "k string, rts string, v double",
        ),
        "rts",
    )
    out = {
        r["id"]: r["v_asof"]
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts", value_cols=["v"]
        ).collect()
    }
    assert out == {1: None, 2: 100.0, 3: 100.0, 4: 200.0, 5: None}


def test_range_join_half_open_boundaries(spark):
    events = _ts(
        spark.createDataFrame(
            [
                (1, "k", "2024-01-01 10:00:00"),  # == start → IN
                (2, "k", "2024-01-03 00:00:00"),  # == end → OUT (half-open)
                (3, "k", "2024-01-02 12:00:00"),  # inside, crosses day bucket
                (4, "k", "2024-01-05 00:00:00"),  # outside
            ],
            "id long, k string, ts string",
        ),
        "ts",
    )
    intervals = _ts(
        spark.createDataFrame(
            [("k", "I1", "2024-01-01 10:00:00", "2024-01-03 00:00:00")],
            "k string, iid string, s string, e string",
        ),
        "s",
        "e",
    )
    got = {
        (r["id"], r["iid"])
        for r in range_join_buckets(
            events, intervals, key="k", event_ts="ts", start_ts="s", end_ts="e"
        ).collect()
    }
    assert got == {(1, "I1"), (3, "I1")}


def test_interval_overlap_half_open_and_dedup(spark):
    """Half-open overlap semantics: touching intervals (a.end ==
    b.start) do NOT match; containment and partial overlap do, and an
    interval pair that meets in several buckets surfaces exactly
    once."""
    from trafik_etl_modular_spark.operators.temporal import interval_overlap_join

    a = _ts(
        spark.createDataFrame(
            [
                ("A1", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
                ("A2", "2024-01-01 13:00:00", "2024-01-01 13:30:00"),
                # spans 3 hour-buckets, overlaps B3 in two of them
                ("A3", "2024-01-01 20:30:00", "2024-01-01 22:30:00"),
            ],
            "a_id string, a_start string, a_end string",
        ),
        "a_start",
        "a_end",
    )
    b = _ts(
        spark.createDataFrame(
            [
                ("B1", "2024-01-01 11:00:00", "2024-01-01 12:00:00"),  # touches A1
                ("B2", "2024-01-01 13:10:00", "2024-01-01 13:20:00"),  # inside A2
                ("B3", "2024-01-01 20:45:00", "2024-01-01 22:00:00"),  # 2-bucket overlap with A3
            ],
            "b_id string, b_start string, b_end string",
        ),
        "b_start",
        "b_end",
    )
    rows = interval_overlap_join(
        a, b, "a_start", "a_end", "b_start", "b_end"
    ).collect()
    got = sorted((r["a_id"], r["b_id"]) for r in rows)
    assert got == [("A2", "B2"), ("A3", "B3")]  # once each, no A1-B1


def test_scd2_asof_lookup_edges(spark, sf_dir):
    """Every matched fact gets EXACTLY ONE version, the version's
    interval contains the fact ts, and facts before their entity's
    first version null-pad."""
    from collections import Counter

    from trafik_etl_modular_spark.queries.dedup import join_scd2_asof_lookup

    rows = join_scd2_asof_lookup(spark, sf_dir).collect()
    counts = Counter(r["event_id"] for r in rows)
    assert max(counts.values()) == 1  # one row per fact
    assert any(r["version_id"] is None for r in rows)  # pre-history facts exist
    assert any(r["version_id"] is not None for r in rows)


def test_nearest_join_directions_ties_and_tolerance(spark):
    """nearest_join edge semantics: backward closer, forward closer,
    exact-equal ts (diff 0 via the backward pass), a bd==fd tie
    resolving to the EARLIER right row, candidates outside tolerance
    ignored, and keys with no right rows null-padding."""
    from trafik_etl_modular_spark.operators.temporal import nearest_join

    left = _ts(
        spark.createDataFrame(
            [
                (1, "k", "2024-01-01 10:00:00"),  # == R1 → diff 0
                (2, "k", "2024-01-01 10:04:00"),  # R1 4min back vs R2 6min fwd
                (3, "k", "2024-01-01 10:07:00"),  # R2 3min fwd vs R1 7min back
                (4, "k", "2024-01-01 10:05:00"),  # exact tie → earlier (R1)
                (5, "k", "2024-01-01 11:00:00"),  # nearest is 50min off → NULL
                (6, "lone", "2024-01-01 10:00:00"),  # no rights for key
            ],
            "id long, k string, ts string",
        ),
        "ts",
    )
    right = _ts(
        spark.createDataFrame(
            [
                ("k", "2024-01-01 10:00:00", 100),
                ("k", "2024-01-01 10:10:00", 200),
            ],
            "k string, rts string, v long",
        ),
        "rts",
    )
    rows = nearest_join(
        left,
        right,
        key="k",
        left_ts="ts",
        right_ts="rts",
        value_cols=["v"],
        tolerance_us=5 * 60 * 1_000_000,
    ).collect()
    got = {r["id"]: (r["v_nearest"], r["diff_us_nearest"]) for r in rows}
    assert got == {
        1: (100, 0),
        2: (100, 4 * 60 * 1_000_000),
        3: (200, 3 * 60 * 1_000_000),
        4: (100, 5 * 60 * 1_000_000),  # tie at exactly ±5min → earlier
        5: (None, None),
        6: (None, None),
    }
    assert len(rows) == 6  # left outer: every left row exactly once


def test_containment_asymmetry_and_threshold(spark):
    """A short doc quoted inside a long one is flagged in the
    short→long direction only; sub-threshold overlap and sub-minimum
    shingle counts are dropped."""
    from trafik_etl_modular_spark.llmdata.dedup import shingle_containment_pairs

    quoted = "alpha bravo charlie delta echo foxtrot golf"  # 5 shingles
    long_doc = quoted + " hotel india juliet kilo lima mike november oscar"
    docs = spark.createDataFrame(
        [
            (1, quoted),
            (2, long_doc),
            (3, "zulu yankee xray whiskey victor uniform tango sierra"),
            (4, "tiny doc"),  # 0 shingles at k=3
        ],
        "doc_id long, text string",
    )
    rows = shingle_containment_pairs(
        docs, k=3, threshold_pct=80, min_shingles=5
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["containment_pct"] for r in rows}
    assert got == {(1, 2): 100}  # doc1 fully inside doc2; NOT (2,1)
