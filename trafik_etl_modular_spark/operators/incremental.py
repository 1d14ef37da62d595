"""Incremental aggregate maintenance (materialized-rollup merge).

At 100 TB you do not recompute a daily rollup from the full fact
table when a new batch lands — you aggregate THE BATCH and merge it
into the stored rollup.  That only works for algebraic aggregates
whose state is mergeable: counts and exact decimal sums here (avg =
total/n derived at read; min/max merge the same way).  The merge is a
groupBy-sum over (|rollup| + |delta groups|) rows — independent of
fact-table size, which is the entire point.

State stays DECIMAL(38,s), not double: merging double partials would
reintroduce order-dependent rounding and break both idempotence and
the oracle equality `merge(rollup(old), rollup(delta)) ==
rollup(old ∪ delta)` that the driver checks.

This is the batch form of what Structured Streaming's stateful
aggregation does per micro-batch (state store = the rollup); the
reference's analog is re-running its daily GROUP BY from scratch
(streamlit_app.py:483-485 recomputes on every interaction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_delta(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    scale: int = 4,
) -> DataFrame:
    """Aggregate one batch into mergeable rollup state:
    (keys..., n BIGINT, total DECIMAL(38,scale))."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(F.col(value_col).cast(f"decimal(38,{scale})")).alias("total"),
    )


def merge_rollups(prev: DataFrame, delta: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge two rollup states: union + groupBy-sum on the keys.
    Associative and commutative — batches can arrive in any order,
    and a re-delivered EMPTY batch is a no-op (at-least-once safe
    when upstream batches are deduplicated, e.g. by dedup W3)."""
    return (
        prev.unionByName(delta)
        .groupBy(*keys)
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
    )
