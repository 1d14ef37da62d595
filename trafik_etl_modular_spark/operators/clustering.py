"""Z-order clustering: multi-dimensional data skipping for the
pure-Parquet lakehouse layout.

The reference keeps three SQLite B-tree indexes on `incidents`
(/root/reference/src/trv/load_sqlite.py:22-24). Our date partitioning
(pipelines/sink.py) replaces the time index; this module replaces the
OTHER indexes: interleaving the bits of two quantized sort keys makes
rows that are close in BOTH dimensions land in the same files, so
parquet footer min/max stats prune files for 2-dim predicates —
Delta's OPTIMIZE ZORDER BY, expressed as a plain Spark write layout.

Everything is Catalyst expressions (shiftleft / bitwise OR chains stay
inside whole-stage codegen); the only aggregation is one min/max pass
to fit the quantizer, broadcast back as a 1-row cross join. At 100 TB
the min/max pass rides an existing scan (or reads footer stats), and
the clustered write is one range shuffle — the same cost as any
global sort the layout would otherwise need.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16  # per-dimension quantization; 2 dims × 16 bits = 32-bit z-value


def _quantize(col: Column, lo: Column, hi: Column, bits: int = BITS) -> Column:
    """Linear min/max quantization to [0, 2^bits): rank-preserving,
    NULL → 0 (nulls cluster together at the low end)."""
    n = F.lit((1 << bits) - 1)
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    q = F.floor(((col.cast("double") - lo) / span) * n.cast("double"))
    return F.coalesce(F.greatest(F.lit(0), F.least(q, n.cast("long"))), F.lit(0))


def _interleave(a: Column, b: Column, bits: int = BITS) -> Column:
    """Bit-interleave two quantized values: z = ...b1 a1 b0 a0.
    A chain of 2*bits shift/mask/or terms — constant-folded into one
    codegen'd expression, no UDF."""
    terms = []
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        terms.append(F.shiftleft(bit_a, 2 * i))
        terms.append(F.shiftleft(bit_b, 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def with_zvalue(df: DataFrame, col_a: str, col_b: str, out: str = "__z") -> Column:
    """Attach the z-value column: one min/max fitting pass (broadcast
    1-row cross join — no driver round-trip in the plan) + quantize +
    interleave."""
    bounds = df.agg(
        F.min(F.col(col_a).cast("double")).alias("__lo_a"),
        F.max(F.col(col_a).cast("double")).alias("__hi_a"),
        F.min(F.col(col_b).cast("double")).alias("__lo_b"),
        F.max(F.col(col_b).cast("double")).alias("__hi_b"),
    )
    qa = _quantize(F.col(col_a), F.col("__lo_a"), F.col("__hi_a"))
    qb = _quantize(F.col(col_b), F.col("__lo_b"), F.col("__hi_b"))
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out, _interleave(qa, qb))
        .drop("__lo_a", "__hi_a", "__lo_b", "__hi_b")
    )


def cluster_by_zorder(
    df: DataFrame, col_a: str, col_b: str, n_files: int
) -> DataFrame:
    """Lay out `df` so each of the `n_files` output splits covers a
    tight z-range — tight min/max envelopes on BOTH columns per file.
    Range-partition on z (sampled range exchange, skew-proof), sort
    within partitions (files are written per partition), drop the
    helper column. Write with `.write.parquet(...)` as usual."""
    z = with_zvalue(df, col_a, col_b)
    return (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
