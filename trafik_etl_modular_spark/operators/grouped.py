"""Grouped-map pandas operators (batch `applyInPandas` — the batch
form of the reference's per-group UDF surface, SURVEY.md §2.10 U3).

Execution shape: one hash shuffle on the group key, then each group
arrives as ONE Arrow batch in a Python worker.  That makes two scale
rules non-negotiable:

  * a single group's rows must fit one task's memory (groups here are
    language strata — bounded; never key by something unbounded);
  * anything expressible as a JVM window/agg should be — grouped-map
    pays Arrow serialization both ways plus Python compute.  This
    module exists for logic that genuinely needs imperative per-group
    code; `percent_rank_by_group` is deliberately ALSO expressible as
    `F.percent_rank()` so tests can pin Arrow-path semantics against
    the JVM window byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def percent_rank_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Per-group percent rank via applyInPandas: (rank-1)/(n-1) with
    SQL RANK tie semantics (pandas method='min'), 0.0 for singleton
    groups.  Bit-identical to `PERCENT_RANK() OVER (PARTITION BY
    group ORDER BY value)` — same integer rank, same double division —
    so the DuckDB oracle and the JVM window both cross-check it."""
    # NB: build a NEW StructType — StructType.add mutates in place,
    # and DataFrame.schema is a cached object, so `df.schema.add(...)`
    # corrupts df.columns with a phantom column.
    schema = StructType(list(df.schema.fields) + [StructField(out_col, DoubleType())])

    def add_rank(pdf):
        n = len(pdf)
        r = pdf[value_col].rank(method="min")
        pdf[out_col] = 0.0 if n == 1 else (r - 1.0) / (n - 1.0)
        return pdf

    return df.groupBy(group_col).applyInPandas(add_rank, schema)
