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


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_us: int,
    suffix: str = "_nearest",
) -> DataFrame:
    """For each left row: the right row NEAREST in time within
    ±tolerance on the same key (left outer; ties → the EARLIER right
    row).  The bidirectional generalization of :func:`asof_join` —
    pandas' ``merge_asof(direction='nearest', tolerance=...)``, which
    Spark has no operator for.

    Same single-shuffle shape as the as-of join: union-tag both
    sides, sort each key's timeline once, then TWO window passes over
    the one sorted partition — a backward ``last(ignorenulls)`` carry
    and a forward ``first(ignorenulls)`` frame — and a map-side pick
    of whichever candidate is closer and inside the tolerance.  Zero
    row explosion: the naive form is an interval join whose candidate
    set is every right row within ±tolerance (at 100 TB, a melt for
    dense keys); this is one sort + two window scans.

    Ordering puts right rows BEFORE left rows at equal timestamps, so
    an exact-timestamp match is found by the backward pass (diff 0)
    and the forward pass only sees strictly-later rows.  Right must
    be one row per (key, ts) — same series precondition as as-of.

    Output: left columns + ``{c}{suffix}`` for each value col +
    ``diff_us{suffix}`` (BIGINT microseconds to the chosen row).
    """
    # cast through TIMESTAMP so TIMESTAMP_NTZ inputs get exact micros
    # (session tz is pinned UTC)
    def _us(c: str):
        return F.unix_micros(F.col(c).cast("timestamp"))

    rhs = right.select(
        F.col(key),
        _us(right_ts).alias("__ts_us"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__bk_{c}") for c in value_cols],
        *[F.col(c).alias(f"__fw_{c}") for c in value_cols],
        _us(right_ts).alias("__bk_ts"),
        _us(right_ts).alias("__fw_ts"),
    )
    lhs = left.withColumn("__ts_us", _us(left_ts)).withColumn(
        "__is_left", F.lit(1)
    )
    merged = lhs.unionByName(rhs, allowMissingColumns=True)

    order = [F.asc("__ts_us"), F.asc("__is_left")]
    w_bk = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fw = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = merged.select(
        "*",
        F.last("__bk_ts", ignorenulls=True).over(w_bk).alias("__bk_ts_c"),
        F.first("__fw_ts", ignorenulls=True).over(w_fw).alias("__fw_ts_c"),
        *[
            F.last(f"__bk_{c}", ignorenulls=True).over(w_bk).alias(f"__bk_{c}_c")
            for c in value_cols
        ],
        *[
            F.first(f"__fw_{c}", ignorenulls=True).over(w_fw).alias(f"__fw_{c}_c")
            for c in value_cols
        ],
    ).filter(F.col("__is_left") == 1)

    bd = F.col("__ts_us") - F.col("__bk_ts_c")
    fd = F.col("__fw_ts_c") - F.col("__ts_us")
    bk_ok = F.col("__bk_ts_c").isNotNull() & (bd <= F.lit(tolerance_us))
    fw_ok = F.col("__fw_ts_c").isNotNull() & (fd <= F.lit(tolerance_us))
    # tie (bd == fd) → backward, i.e. the earlier right row
    use_bk = bk_ok & (~fw_ok | (bd <= fd))
    use_fw = fw_ok & ~use_bk

    picked = [
        F.when(use_bk, F.col(f"__bk_{c}_c"))
        .when(use_fw, F.col(f"__fw_{c}_c"))
        .alias(f"{c}{suffix}")
        for c in value_cols
    ]
    diff = (
        F.when(use_bk, bd).when(use_fw, fd).cast("bigint").alias(f"diff_us{suffix}")
    )
    keep = [c for c in left.columns]
    return carried.select(*keep, *picked, diff)


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
