"""Data-quality expectations: the validation gate an ingest pipeline
runs before publishing a batch (the reference validates row-by-row in
Python during transform — /root/reference/src/trv/transform.py's
None-guards; here the same checks are set-based aggregates).

Shape for scale: each source table contributes ONE aggregation pass
(conditional sums fused into the scan — adding an expectation adds a
column, not a job), plus one anti-join for referential integrity.
The report is a tall (metric, value) frame: tiny, unioned from
scalar legs, trivially publishable as a quality dashboard table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

_DQ_SQL = """
SELECT 'orders_rows' AS metric, COUNT(*) AS value FROM orders
UNION ALL
SELECT 'orders_null_custkey', COUNT(*) FILTER (WHERE o_custkey IS NULL) FROM orders
UNION ALL
SELECT 'orders_dup_pk', COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
UNION ALL
SELECT 'orders_nonpositive_total', COUNT(*) FILTER (WHERE o_totalprice <= 0) FROM orders
UNION ALL
SELECT 'lineitem_rows', COUNT(*) FROM lineitem
UNION ALL
SELECT 'lineitem_bad_qty', COUNT(*) FILTER (WHERE l_quantity <= 0 OR l_quantity > 50)
FROM lineitem
UNION ALL
SELECT 'lineitem_bad_discount', COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
FROM lineitem
UNION ALL
SELECT 'lineitem_bad_returnflag', COUNT(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R'))
FROM lineitem
UNION ALL
SELECT 'lineitem_orphans', COUNT(*)
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
ORDER BY metric
"""


@query("dq_expectations_report", sql=_DQ_SQL, tags=("quality", "agg"))
def dq_expectations_report(spark, sf_dir):
    """Batch data-quality report: row counts, null/duplicate-PK/range
    violations as conditional counts (ONE scan pass per table — an
    expectation is a column in the agg, not another job), plus
    lineitem→orders referential integrity as a LEFT ANTI join count.
    At 100 TB each leg is a partial-agg scan and the anti-join is the
    same shuffle any fact-fact join pays; the output is 9 rows."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")

    def cnt(cond):
        return F.count(F.when(cond, F.lit(1)))

    o = orders.agg(
        F.count("*").alias("orders_rows"),
        cnt(F.col("o_custkey").isNull()).alias("orders_null_custkey"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("orders_dup_pk"),
        cnt(F.col("o_totalprice") <= 0).alias("orders_nonpositive_total"),
    )
    l = li.agg(
        F.count("*").alias("lineitem_rows"),
        cnt((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50)).alias(
            "lineitem_bad_qty"
        ),
        cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias(
            "lineitem_bad_discount"
        ),
        cnt(~F.col("l_returnflag").isin("A", "N", "R")).alias(
            "lineitem_bad_returnflag"
        ),
    )
    orphans = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count("*").alias("lineitem_orphans"))
    )

    def tall(df):
        cols = df.columns
        stacked = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("metric"), F.col(c).cast("long").alias("value")
                        )
                        for c in cols
                    ]
                )
            ).alias("kv")
        )
        return stacked.select("kv.metric", "kv.value")

    return tall(o).unionByName(tall(l)).unionByName(tall(orphans)).orderBy("metric")
