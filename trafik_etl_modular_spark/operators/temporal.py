"""Temporal join operators Spark has no built-in for: AS-OF join and
bucketed range (interval) join.

Neither exists in the reference (SURVEY.md §2.3 — it has only dim
lookups), but both are table-stakes for event-time analytics over the
incident/event model, and both have exact ANSI oracles (DuckDB has a
native ASOF JOIN; the range join is a plain inequality join at oracle
scale).

Scale design:

* **as-of** — the union trick: tag both sides, sort each key's
  timeline once, carry the latest right-side values forward with
  `last_value(ignoreNulls)`.  ONE shuffle on the key, sort within
  partitions, zero row explosion — vs the naive inequality join whose
  candidate set is |left| × |right-per-key| before picking the max.
  This is how as-of joins scale to 100 TB: it's a merge along the
  event-time axis, which is exactly what a window over
  (key, ts) compiles to.
* **range join** — explode each interval into coarse time buckets
  (intervals are bounded, so ≤ ceil(span/bucket)+1 rows each),
  equi-join on (key, bucket), then apply the exact range predicate.
  The shuffle key is (key, bucket) — candidate volume is
  bucket-local, never |events| × |intervals|. Catalyst alone would
  fall back to BroadcastNestedLoopJoin for the inequality condition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the latest right row with
    ``right_ts <= left_ts`` within the same ``key`` (left outer —
    unmatched left rows keep NULLs).

    Ties on ``right_ts`` within a key must be pre-resolved by the
    caller (dedupe right to one row per (key, ts)) — as-of is only
    well-defined on a keyed time SERIES.
    """
    lhs = left.withColumn("__is_left", F.lit(1))
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    lhs = lhs.withColumn("__ts", F.col(left_ts))
    merged = lhs.unionByName(rhs, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at equal ts (asc __is_left), so
    # a left row at exactly t matches a right row at t (<= semantics).
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc("__ts"), F.asc("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in value_cols
    ]
    out = merged.select(
        *[
            F.col(c)
            for c in merged.columns
            if not c.startswith("__") and not c.endswith(suffix)
        ],
        F.col("__is_left"),
        *carried,
    )
    return out.filter(F.col("__is_left") == 1).drop("__is_left")


def range_join_buckets(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    event_ts: str,
    start_ts: str,
    end_ts: str,
    how: str = "inner",
) -> DataFrame:
    """events ⋈ intervals ON same key AND start <= ts < end, via
    1-day bucket candidates + exact predicate.

    The bucket granularity should be ≳ the typical interval span:
    candidates per event ≈ intervals alive in its bucket. NULL ends
    are treated as end = start (degenerate) — filter upstream if
    open intervals should match everything.
    """
    ev = events.withColumn("__bucket", F.date_trunc("day", F.col(event_ts)))
    # one row per day-bucket the interval overlaps (bounded spans →
    # bounded replication)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col(start_ts)),
                F.date_trunc("day", F.coalesce(F.col(end_ts), F.col(start_ts))),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    joined = ev.join(iv, on=[key, "__bucket"], how=how)
    return joined.filter(
        (F.col(start_ts) <= F.col(event_ts)) & (F.col(event_ts) < F.col(end_ts))
    ).drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket: str = "1 hour",
    bucket_trunc: str = "hour",
) -> DataFrame:
    """INTERVAL × INTERVAL overlap join WITHOUT an equi-key — the
    range-join shape Spark has no native operator for (point-in-range
    is :func:`range_join_buckets`; this is range-vs-range).

    Naive formulation is a cartesian product with a range filter (a
    BroadcastNestedLoopJoin that dies at scale).  The scalable shape:
    explode BOTH sides to the coarse time buckets their interval
    touches, equi-join on the bucket, apply the exact half-open
    overlap predicate (l_start < r_end AND r_start < l_end), and
    dedup the pairs that met in more than one bucket.  Candidate
    volume per bucket ≈ (intervals alive in it)², so pick the bucket
    ≳ the typical interval span; replication per interval is
    span/bucket + 1 rows of (id, bounds) — never payload.

    Columns of both inputs are preserved (prefix-disambiguate before
    calling if names collide); callers compute overlap length from
    the bounds."""
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket_trunc, F.col(l_start)),
                F.date_trunc(bucket_trunc, F.col(l_end)),
                F.expr(f"INTERVAL {bucket}"),
            )
        ),
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket_trunc, F.col(r_start)),
                F.date_trunc(bucket_trunc, F.col(r_end)),
                F.expr(f"INTERVAL {bucket}"),
            )
        ),
    )
    return (
        lb.join(rb, "__bucket")
        .filter(
            (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
        )
        .drop("__bucket")
        .distinct()
    )
