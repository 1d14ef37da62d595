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
