"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from trafik_etl_modular_spark.catalog import load_table
from trafik_etl_modular_spark.constants import NOW_UTC


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a fixture table (columnar scan; Catalyst prunes/pushes)."""
    return load_table(spark, sf_dir, name)


def now_ts() -> Column:
    """The injected deterministic `now` as a timestamp literal."""
    return F.lit(NOW_UTC).cast("timestamp")


# SQL fragment for the same literal in DuckDB oracle queries.
SQL_NOW = f"TIMESTAMP '{NOW_UTC}'"
