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
) -> None:
    """Persist `df` bucketed+sorted by `key` (saveAsTable — bucket
    metadata lives in the session catalog; the parquet files land in
    the warehouse dir)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def ensure_bucketed_orders_lineitem(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[str, str]:
    """Create (once per session) orders/lineitem bucketed on the order
    key — the write-once layout step a lakehouse runs at ingest.
    Returns the two table names."""
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:10]
    t_orders, t_lineitem = f"b_orders_{tag}", f"b_lineitem_{tag}"

    def _ensure(table: str, src: str, key: str) -> None:
        if spark.catalog.tableExists(table):
            return
        # Bucket metadata lives in the (in-memory) session catalog; a
        # new process forgets the table while its warehouse dir
        # persists — saveAsTable then fails LOCATION_ALREADY_EXISTS.
        # The files are useless without the catalog's bucketing spec,
        # so drop the stale location and rewrite.
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        stale = f"{wh}/{table}"
        shutil.rmtree(stale, ignore_errors=True)
        write_bucketed(load_table(spark, sf_dir, src), table, key, n_buckets)

    _ensure(t_orders, "orders", "o_orderkey")
    _ensure(t_lineitem, "lineitem", "l_orderkey")
    return t_orders, t_lineitem
