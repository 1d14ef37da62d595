"""Fixture-table catalog: parquet readers + temp-view registration.

Reads are plain ``spark.read.parquet`` — columnar scans with filter
pushdown and column pruning supplied by Catalyst (the reference's
hand-rolled pushdown, SURVEY.md §2.1 S2, is free here).  At cluster
scale the same call reads a partitioned table; nothing in the query
layer assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from trafik_etl_modular_spark.constants import FIXTURE_TABLES


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Pin runtime-settable confs correctness depends on, so queries
    behave identically under a caller-provided (driver) session that
    wasn't built by :func:`trafik_etl_modular_spark.session.get_spark`:

    * ``nanosAsLong`` — fixture `events.ts` is TIMESTAMP(NANOS), which
      Spark's parquet reader otherwise rejects outright;
    * session timezone UTC — timestamp collection/oracle parity
      (reference normalizes everything to UTC,
      /root/reference/src/trv/transform.py:18-23).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    `events.ts` is stored as TIMESTAMP(NANOS); it arrives as a raw
    nanosecond long (see :func:`_ensure_session_confs`) and is
    converted here to a microsecond timestamp via exact integer
    division (`div`), matching DuckDB's truncation-to-micros of the
    same values.
    """
    _ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read all fixture tables that exist under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in FIXTURE_TABLES:
        if os.path.exists(table_path(sf_dir, name)):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
