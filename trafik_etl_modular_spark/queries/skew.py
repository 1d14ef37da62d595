"""Skew-mitigation queries: the salted forms must produce results
IDENTICAL to their plain forms — the oracle runs the plain SQL.

`l_returnflag` is the genuinely skewed key in the fixtures (3 values
over 600k rows at sf0.1), so the salted aggregation really does fan
its partial state 16× wider before merging 3 final rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from trafik_etl_modular_spark.functions.scalars import oracle_dsum
from trafik_etl_modular_spark.operators.skew import salted_agg, salted_join
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

_SALTED_AGG_SQL = f"""
SELECT l_returnflag,
       COUNT(*) AS n_items,
       {oracle_dsum('l_extendedprice', 2)} AS total_price,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_skew_salted_flags", sql=_SALTED_AGG_SQL, tags=("agg", "skew"))
def agg_skew_salted(spark, sf_dir):
    """Two-stage salted aggregation over the 3-value hot key: partials
    on (l_returnflag, salt) — 48 groups instead of 3 — then an exact
    decimal merge per key. Result provably equals the plain group-by
    (the oracle runs the unsalted SQL)."""
    li = t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n_items": ("l_returnflag", "count"),
            "total_price_dec": (
                F.col("l_extendedprice").cast(T.DecimalType(38, 2)),
                "sum",
            ),
            "max_qty": (F.col("l_quantity").cast("double"), "max"),
        },
        buckets=16,
    )
    return out.select(
        "l_returnflag",
        "n_items",
        F.col("total_price_dec").cast("double").alias("total_price"),
        "max_qty",
    )


_SALTED_JOIN_SQL = f"""
SELECT s_nationkey,
       COUNT(*) AS n_items,
       {oracle_dsum('l_extendedprice', 2)} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


@query("join_skew_salted_supplier", sql=_SALTED_JOIN_SQL, tags=("join", "skew"))
def join_skew_salted(spark, sf_dir):
    """Salted shuffle join: supplier replicated 8×, lineitem salted
    deterministically, equi-join on (l_suppkey==s_suppkey, salt) —
    the explicit skew shape for when the small side can't broadcast
    and AQE's split isn't enough. Aggregated result equals the plain
    join (oracle)."""
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, sup, key="l_suppkey", buckets=8)
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast(T.DecimalType(38, 2)))
        .cast("double")
        .alias("revenue"),
    )
