"""Deeper TPC-H query shapes: scalar subqueries, disjunctive
predicates, outer-join histograms, and multi-EXISTS self-joins.

These extend ``queries/tpch.py`` (q1/q3/q4/q5/q10/q12/q18) with the
remaining shapes expressible directly over the driver's fixtures
(q9, q17, q19, q21, q22 are adapted to the available columns while
keeping their canonical plan shapes; q2/q11/q16/q20, which need the
missing ``partsupp`` table, live in ``queries/tpch_partsupp.py``
over a lineitem-derived part–supplier relation).  The reference itself has no
joins beyond dimension lookups (SURVEY.md §2.3) — these queries are
the scale generalization of that same primitive, and each one's
docstring records the plan we expect Catalyst to produce at 100 TB.

Determinism: every float aggregate goes through dsum/davg (exact
decimal sums, see functions/scalars.py); every ratio is written with
identical IEEE operation order in the Spark and DuckDB forms.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.functions.scalars import (
    davg,
    dsum,
    oracle_davg,
    oracle_dsum,
)
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan + filter + scalar agg.
# The whole query is map-side: every predicate reaches the parquet
# scan (PushedFilters on shipdate/discount/quantity), no shuffle at
# all except the 1-row final agg exchange. At 100 TB this is the
# I/O-bound lower bound for the engine — nothing to optimize past
# scan bandwidth + row-group min/max skipping on l_shipdate.
# ---------------------------------------------------------------------------

_Q6_SQL = f"""
SELECT
  {oracle_dsum('l_extendedprice * l_discount', 4)} AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@query("tpch_q6_revenue_forecast", sql=_Q6_SQL, tags=("agg", "tpch"))
def tpch_q6(spark, sf_dir):
    """TPC-H Q6: scan-bound filter + single-row aggregate."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations: 6-way join with a
# disjunctive nation-pair predicate and a derived year key.
# supplier/customer/nation all broadcast (dims), so the only shuffle
# is lineitem⋈orders on orderkey; the nation-pair disjunction is
# evaluated post-broadcast-join, then a tiny 3-key agg.
# ---------------------------------------------------------------------------

_Q7_SQL = f"""
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INTEGER) AS l_year,
  {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
"""


@query("tpch_q7_volume_shipping", sql=_Q7_SQL, tags=("join", "agg", "tpch"))
def tpch_q7(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume by year between a nation pair."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: a conditional-sum / total-sum ratio per
# year. Both sums are exact decimal (dsum), the final division is one
# IEEE double op in both engines — bit-identical. Plan: same star
# join as Q5/Q7 plus broadcast part; one orderkey shuffle + tiny agg.
# ---------------------------------------------------------------------------

_Q8_SQL = f"""
SELECT
  CAST(year(o_orderdate) AS INTEGER) AS o_year,
  ({oracle_dsum("CASE WHEN n2.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4)}
   / {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)}) AS mkt_share
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
GROUP BY o_year
"""


@query("tpch_q8_market_share", sql=_Q8_SQL, tags=("join", "agg", "tpch"))
def tpch_q8(spark, sf_dir):
    """TPC-H Q8: share of PROMO-part revenue in EUROPE supplied by one
    nation, per order year."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0), 4)
                / dsum(vol, 4)
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (adapted: the fixtures have no partsupp, so
# supply cost is modeled as a fixed fraction of p_retailprice; the
# plan shape — part-filtered fact join fanned to supplier nation and
# order year — is unchanged).
# ---------------------------------------------------------------------------

_Q9_SQL = f"""
SELECT
  n_name AS supp_nation,
  CAST(year(o_orderdate) AS INTEGER) AS o_year,
  {oracle_dsum('l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity', 4)} AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY supp_nation, o_year
"""


@query("tpch_q9_product_profit", sql=_Q9_SQL, tags=("join", "agg", "tpch"))
def tpch_q9(spark, sf_dir):
    """TPC-H Q9 shape: profit on 'red' parts by supplier nation and year."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy(F.col("n_name").alias("supp_nation"), F.col("o_year"))
        .agg(dsum(profit, 4).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: LEFT OUTER join with an
# ON-clause filter (customers with zero qualifying orders must
# survive with count 0), then a histogram of the counts. Two
# aggregations: per-customer (shuffle on custkey) then per-count
# (tiny). The outer join's null-extension is the semantic point —
# an inner join would silently drop the zero bucket.
# ---------------------------------------------------------------------------

_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
"""


@query("tpch_q13_order_distribution", sql=_Q13_SQL, tags=("join", "agg", "tpch"))
def tpch_q13(spark, sf_dir):
    """TPC-H Q13: how many customers placed N (non-urgent) orders."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 — promo revenue ratio: broadcast part join + one conditional /
# total ratio. Exact decimal sums; the 100.0* and / are IEEE doubles
# applied in the same order in both engines.
# ---------------------------------------------------------------------------

_Q14_SQL = f"""
SELECT
  (100.0 * {oracle_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4)})
   / {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS promo_revenue,
  COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


@query("tpch_q14_promo_revenue", sql=_Q14_SQL, tags=("join", "agg", "tpch"))
def tpch_q14(spark, sf_dir):
    """TPC-H Q14: percent of March-1996 revenue from PROMO parts."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(0)
    return li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).agg(
        ((100.0 * dsum(promo, 4)) / dsum(vol, 4)).alias("promo_revenue"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier: grouped revenue, then keep the row(s) equal to
# the global max. The max is computed as a 1-row aggregate and
# broadcast-cross-joined back — NOT a global window, which would
# funnel every supplier row through one task at scale.
# ---------------------------------------------------------------------------

_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("tpch_q15_top_supplier", sql=_Q15_SQL, tags=("join", "agg", "tpch"))
def tpch_q15(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.

    Exact-decimal revenue makes the equality-with-max comparison safe
    (double revenue would make ties partition-order dependent).
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: the canonical correlated scalar
# subquery (per-part average) decorrelated into a grouped aggregate +
# join. The per-part threshold uses davg (exact decimal sum / count,
# one double division) so the `<` predicate is bit-identical across
# engines — a raw AVG(double) here could flip row membership.
# Plan: part filter broadcast; per-part avg shuffles lineitem on
# partkey once, then the filtered re-join is broadcast (the avg table
# is |parts-of-brand| rows).
# ---------------------------------------------------------------------------

_Q17_AVG = "(CAST(SUM(CAST((l_quantity) AS DECIMAL(38,2))) AS DOUBLE) / COUNT(l_quantity))"

_Q17_SQL = f"""
SELECT {oracle_dsum('l_extendedprice', 2)} / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS avg_partkey, 0.2 * {_Q17_AVG} AS qty_threshold
  FROM lineitem GROUP BY l_partkey
) pa ON avg_partkey = l_partkey
WHERE p_brand = 'Brand#1' AND p_size < 25
  AND l_quantity < qty_threshold
"""


@query("tpch_q17_small_qty_revenue", sql=_Q17_SQL, tags=("join", "agg", "subquery", "tpch"))
def tpch_q17(spark, sf_dir):
    """TPC-H Q17: revenue lost if small-quantity orders were dropped."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 25)
    )
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (0.2 * davg("l_quantity", 2)).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(per_part), F.col("avg_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (dsum("l_extendedprice", 2) / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 — disjunction of conjunctions (brand × size × quantity bands).
# Catalyst extracts the common `l_partkey = p_partkey` equi-key so
# this still plans as a broadcast hash join with the OR as a residual
# filter — NOT a nested-loop — and pushes the disjunction's
# per-column envelope (quantity between the min/max of all bands)
# into the parquet scan.
# ---------------------------------------------------------------------------

_Q19_SQL = f"""
SELECT {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


@query("tpch_q19_disjunctive_revenue", sql=_Q19_SQL, tags=("join", "agg", "tpch"))
def tpch_q19(spark, sf_dir):
    """TPC-H Q19: OR-of-ANDs over joined fact+dim columns."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    band = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(band("Brand#1", 15, 1, 11) | band("Brand#2", 25, 10, 20) | band("Brand#3", 35, 20, 30))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted: the fixtures have
# no commit/receipt dates, so "late" is shipped >30 days after the
# order date). Shape preserved exactly: fact join + EXISTS (another
# supplier on the order) + NOT EXISTS (no OTHER supplier was late) —
# a left-semi and a left-anti self-join on lineitem, both shuffling
# on orderkey, with the anti side's correlated o_orderdate carried
# through the left input.
# ---------------------------------------------------------------------------

_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY s_name
"""


@query("tpch_q21_waiting_supplier", sql=_Q21_SQL, tags=("join", "agg", "subquery", "tpch"))
def tpch_q21(spark, sf_dir):
    """TPC-H Q21: sole-late-supplier count per supplier on finished
    multi-supplier orders."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = t(spark, sf_dir, "supplier")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")

    l1 = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l2_orderkey") == F.col("l_orderkey"))
            & (F.col("l2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            l3,
            (F.col("l3_orderkey") == F.col("l_orderkey"))
            & (F.col("l3_suppkey") != F.col("l_suppkey"))
            & (F.col("l3_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22 — dormant rich customers (adapted: no phone column, so the
# "country code" grouping is the nation name; "no orders" becomes "no
# orders since 2000", since every fixture customer has some order).
# Shape preserved: uncorrelated scalar AVG subquery (broadcast 1-row
# cross join) + NOT EXISTS anti join + grouped count/sum.
# ---------------------------------------------------------------------------

_Q22_AVG = "(CAST(SUM(CAST((c_acctbal) AS DECIMAL(38,2))) AS DOUBLE) / COUNT(c_acctbal))"

_Q22_SQL = f"""
SELECT n_name AS cntry, COUNT(*) AS numcust,
       {oracle_dsum('c_acctbal', 2)} AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
    SELECT {_Q22_AVG} FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY cntry
"""


@query("tpch_q22_dormant_customers", sql=_Q22_SQL, tags=("join", "agg", "subquery", "tpch"))
def tpch_q22(spark, sf_dir):
    """TPC-H Q22: above-average-balance customers with no recent orders,
    counted per nation."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    recent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal", 2).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
    )
