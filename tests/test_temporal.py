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
