"""Partition-shape helpers for CPU-heavy operators.

A single small parquet file scans as ONE partition, which serializes
per-row-expensive compute (sketching, hashing, array transforms) on a
single task no matter how many cores the cluster has — measured 3-4×
of the whole MinHash pipeline at sf0.1 on local[32].  At lake scale
the scan already yields ≥ cores partitions and these helpers no-op,
costing nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer
    partitions than the target (default: cluster parallelism).

    Use immediately before CPU-bound narrow transforms whose input may
    be a handful of small files.  Deliberately NOT applied when the
    input is already wide — an unconditional repartition would add a
    full shuffle of the payload to every well-partitioned lake scan."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
