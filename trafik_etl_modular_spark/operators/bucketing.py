"""Bucketed (pre-partitioned) tables: shuffle-free co-located joins.

The reference joins everything in-memory per request
(/root/reference/src/trv/transform.py dimension lookups); at lake
scale the analogous repeated fact-fact join should not re-shuffle
600 GB of lineitem on every run.  Writing both sides `bucketBy(N,
key)` + `sortBy(key)` fixes the physical layout so an equi-join on
the bucket key plans as a zero-Exchange sort-merge join: each task
reads bucket i of both tables — the co-location is in the FILES, paid
once at write time, amortized over every subsequent join
(`tests/test_plans.py::test_bucketed_join_has_no_shuffle`).

Bucket count is a layout contract: both sides must agree (Spark joins
m×n bucketed sides shuffle-free only when counts match or divide) and
it should track target task size at scale — 100 TB / N buckets ≈
executor-memory-sized units, not the fixture's 8.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from trafik_etl_modular_spark.catalog import load_table


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist `df` bucketed+sorted by `key` (saveAsTable — bucket
    metadata lives in the session catalog; the parquet files land in
    ``path`` if given, else the warehouse dir)."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def ensure_bucketed_orders_lineitem(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[str, str]:
    """Create (once per session) orders/lineitem bucketed on the order
    key — the write-once layout step a lakehouse runs at ingest.
    Returns the two table names.

    Layout notes (round-2 advisor findings):
      * The table tag includes ``n_buckets`` — bucket count is part of
        the physical-layout contract, so a caller asking for a
        different count gets a NEW layout, not the old one silently.
      * Files live under a PER-PROCESS directory.  Bucket metadata
        exists only in this process's in-memory session catalog, so a
        shared on-disk location can never be reused across processes —
        it could only be raced on (one process rmtree'ing files
        another is mid-read).  Per-process paths make the rebuild
        lock-free; an atexit hook removes the directory.  (On a real
        cluster this is moot: the metastore is persistent+shared and
        ensure() becomes a pure catalog lookup.)
    """
    tag = hashlib.sha256(f"{sf_dir}|{n_buckets}".encode()).hexdigest()[:10]
    t_orders, t_lineitem = f"b_orders_{tag}", f"b_lineitem_{tag}"

    def _ensure(table: str, src: str, key: str) -> None:
        if spark.catalog.tableExists(table):
            return
        write_bucketed(
            load_table(spark, sf_dir, src),
            table,
            key,
            n_buckets,
            path=f"{_process_bucket_dir(spark)}/{table}",
        )

    _ensure(t_orders, "orders", "o_orderkey")
    _ensure(t_lineitem, "lineitem", "l_orderkey")
    return t_orders, t_lineitem


def _process_bucket_dir(spark: SparkSession) -> str:
    """This process's private bucketed-table directory (created on
    first use, removed at interpreter exit)."""
    import atexit
    import os
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    d = os.path.join(wh, f"bucketed_pid{os.getpid()}")
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
