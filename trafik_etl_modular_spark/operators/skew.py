"""Skew-mitigation operators: salted aggregation and salted
(replicated) joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
on in the session factory) handles most runtime skew by splitting
oversized shuffle partitions. These operators are the EXPLICIT forms
for the cases AQE can't fix:

  * `salted_agg` — a hot grouping key whose per-key state is too
    large for one task (e.g. count-distinct over a hot key):
    pre-aggregate on (key, salt), then merge per key.  For plain
    algebraic aggregates Spark's own map-side partial aggregation
    already does this implicitly; the explicit form exists for
    compositions where the partial state itself must be split.
  * `salted_join` — a skewed join key on the big side where the
    small side is too large to broadcast outright: replicate the
    small side `buckets`× (explode), salt the big side
    deterministically, equi-join on (key, salt).  Hot-key rows
    spread over `buckets` tasks; total small-side volume grows
    `buckets`×, so pick buckets ≈ skew factor, not 1000.

Both produce results identical to their unsalted forms — asserted by
the DuckDB oracles of the `agg_skew_salted` / `join_skew_salted`
queries, which run the plain SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# partial-stage expression, merge-stage expression, per supported agg
_ALGEBRAIC = {
    "count": (lambda c: F.count("*"), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column | str, str]],
    buckets: int = 16,
    salt_col: Column | None = None,
) -> DataFrame:
    """Two-stage aggregation over (keys + salt) then (keys).

    ``aggs`` maps output name → (column, fn) with fn in
    {count, sum, min, max} (algebraic — mergeable partials).
    ``salt_col`` defaults to a deterministic hash of all non-key
    columns; any value distribution works, it only spreads rows of
    the same key across partial-stage tasks.
    """
    if salt_col is None:
        non_keys = [c for c in df.columns if c not in keys]
        salt_col = F.pmod(F.xxhash64(*non_keys), F.lit(buckets))
    salted = df.withColumn("__salt", salt_col)

    partials, merges = [], []
    for name, (col, fn) in aggs.items():
        partial_fn, merge_fn = _ALGEBRAIC[fn]
        partials.append(partial_fn(col).alias(f"__p_{name}"))
        merges.append(merge_fn(f"__p_{name}").alias(name))
    return (
        salted.groupBy(*keys, "__salt").agg(*partials).groupBy(*keys).agg(*merges)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
    big_salt: Column | None = None,
) -> DataFrame:
    """Equi-join on (key, salt) with the small side replicated
    ``buckets``× — rows of a hot key on the big side land in
    ``buckets`` different shuffle partitions instead of one.

    The salt on the big side is deterministic (hash of all columns by
    default) but ANY per-row value in [0, buckets) yields the same
    join result — every salt value has a matching small-side replica.
    """
    if big_salt is None:
        big_salt = F.pmod(F.xxhash64(*big.columns), F.lit(buckets))
    b = big.withColumn("__salt", big_salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    # Salting only matters on the SHUFFLE path — if the replicated
    # side still fits the broadcast threshold Spark would broadcast it
    # (at which point you shouldn't be salting at all), so pin the
    # shuffled-hash strategy.
    out = b.join(s.hint("shuffle_hash"), on=[key, "__salt"], how=how)
    return out.drop("__salt")
