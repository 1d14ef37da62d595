"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`trafik_etl_modular_spark.registry` — every
operator registers its Spark implementation and DuckDB oracle SQL
together there, so `queries()` and `oracle_sql()` cannot drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trafik_etl_modular_spark import registry
from trafik_etl_modular_spark.constants import DEFAULT_SF_DIR


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    SURVEY.md §7.2's end-to-end slice: incidents per county, ongoing
    vs upcoming, last 30 days — scan → pushdown filter → status
    case-when → broadcast county join → conditional-count agg →
    deterministic top-10.
    """
    from trafik_etl_modular_spark.queries.incidents import inc_flagship

    return inc_flagship(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each SQL-expressible query."""
    return registry.all_oracle_sql()
