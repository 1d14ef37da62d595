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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def trimmed_mean_agg(col: Column | str, trim_num: int = 1, trim_den: int = 10) -> Column:
    """GROUPED_AGG pandas UDF (SURVEY.md §2.10 — the fourth public UDF
    shape alongside scalar pandas UDF, applyInPandas, and @udtf): a
    per-group TRIMMED MEAN over an integer metric column, dropping the
    lowest and highest ``floor(n·trim_num/trim_den)`` values.

    Why a UDAF at all: a trimmed mean needs the group's sorted value
    multiset, which built-in aggregates can't stream; the Arrow path
    ships each group's metric column (ints only — never the document
    text) into one Python worker.  Execution shape and scale rules are
    the same as grouped-map (one hash shuffle on the group key, group
    must fit a task — group here is a bounded source/language stratum);
    note GROUPED_AGG does NOT partial-aggregate, so keep the shipped
    column narrow.

    Determinism discipline: the trim count is INTEGER arithmetic
    (``n·num // den`` — no float fraction), the kept multiset depends
    only on values (ties are interchangeable under sum), the sum is
    exact int64, and the mean is ONE IEEE double division — the exact
    recipe ``CAST(SUM(core) AS DOUBLE) / COUNT(core)`` any ANSI engine
    reproduces bit-for-bit.

    NULL handling matches SQL aggregates: NULLs are dropped before
    trimming (pandas delivers a nullable int group as float64+NaN,
    and a raw ``.to_numpy(np.int64)`` would cast NaN to an arbitrary
    integer — a silent corruption, not an error); an all-NULL group
    aggregates to NULL.

    Exactness bound: a NULL-FREE group arrives as int64 and the sum
    is exact over the full int64 range.  A NULL-BEARING group arrives
    from Arrow as float64 (precision is lost at the Arrow→pandas
    conversion, before this function runs), so individual values in
    such groups are exact only up to 2^53.  Fine for token counts and
    any metric column; do not feed NULL-bearing groups of >2^53
    identifiers through this aggregate."""
    if not (0 <= 2 * trim_num < trim_den):
        # 2·floor(n·num/den) < n must hold for every n ≥ 1, i.e. the
        # total trimmed fraction must stay under 1 — otherwise a small
        # group trims itself empty and the mean divides by zero on an
        # executor instead of failing here.
        raise ValueError(
            f"trim fraction {trim_num}/{trim_den} must be in [0, 1/2)"
        )

    @F.pandas_udf("double")
    def _trimmed_mean(v: pd.Series) -> float | None:
        a = np.sort(v.dropna().to_numpy(np.int64))
        if len(a) == 0:
            return None
        k = len(a) * trim_num // trim_den
        core = a[k : len(a) - k]
        return float(int(core.sum())) / float(len(core))

    c = F.col(col) if isinstance(col, str) else col
    return _trimmed_mean(c)


def group_size_agg(col: Column | str) -> Column:
    """GROUPED_AGG pandas UDF group size.  Exists because Spark bans
    mixing a group-aggregate pandas UDF with built-in aggregates in
    one ``agg()`` (INVALID_PANDAS_UDF_PLACEMENT) — so any count that
    must sit NEXT TO a pandas UDAF has to ride the same Arrow path.
    Both UDAFs share the one hash shuffle / AggregateInPandas node.
    Counts like COUNT(*) — NULLs in the carrier column included."""

    @F.pandas_udf("long")
    def _n(v: pd.Series) -> int:
        return int(len(v))

    c = F.col(col) if isinstance(col, str) else col
    return _n(c)


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
