"""Star-schema analytical queries over the TPC-H-ish fixtures.

The reference's only joins are broadcast dimension lookups (SURVEY.md
§2.3 J1–J3); expressed as Spark joins the same primitive generalizes
to real multi-table equi/semi/anti joins, declared here over the
driver's star schema.  Catalyst picks broadcast-hash for the small
dimensions automatically (AQE re-plans at runtime); we hint
``F.broadcast`` on dims we know are tiny so the plan is stable at any
scale factor.
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
# Q1-style pricing summary: groupBy 2 keys + 8 aggregates.
# Two-phase hash aggregation (partial map-side combine → final) is
# automatic in Spark; at 100 TB the 4-group output means the final
# shuffle is 4 rows — the plan is scan-bound, which is optimal.
# ---------------------------------------------------------------------------

_Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dsum('l_quantity', 2)} AS sum_qty,
  {oracle_dsum('l_extendedprice', 2)} AS sum_base_price,
  {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
  {oracle_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
  {oracle_davg('l_quantity', 2)} AS avg_qty,
  {oracle_davg('l_extendedprice', 2)} AS avg_price,
  {oracle_davg('l_discount', 4)} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_q1_pricing_summary", sql=_Q1_SQL, tags=("agg", "tpch"))
def tpch_q1(spark, sf_dir):
    """TPC-H Q1 shape: scan → filter (pushed to parquet) → 2-key hash agg."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            davg("l_discount", 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3-style shipping priority: 3-way join + agg + deterministic top-k.
# ---------------------------------------------------------------------------

_Q3_SQL = f"""
SELECT
  l_orderkey,
  {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("tpch_q3_shipping_priority", sql=_Q3_SQL, tags=("join", "agg", "topk", "tpch"))
def tpch_q3(spark, sf_dir):
    """customer⋈orders⋈lineitem revenue top-10.

    customer/orders are tiny relative to lineitem at any SF ratio the
    fixtures use, so the filtered customer side is broadcast; the
    orders⋈lineitem join shuffles on orderkey only after both sides
    were filtered (predicate pushdown to parquet).  LIMIT plans as
    TakeOrderedAndProject — no global sort materialization.
    """
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5-style region revenue: 5-way join, dims broadcast.
# ---------------------------------------------------------------------------

_Q5_SQL = f"""
SELECT
  n_name,
  {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('EUROPE', 'ASIA')
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name
"""


@query("tpch_q5_region_revenue", sql=_Q5_SQL, tags=("join", "agg", "tpch"))
def tpch_q5(spark, sf_dir):
    """Fact-to-dims star join; nation/region broadcast (25 / 5 rows),
    so the only shuffle is lineitem⋈orders on orderkey + final agg."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name").isin("EUROPE", "ASIA"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS shapes).
# ---------------------------------------------------------------------------

_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 450000
)
"""


@query("join_semi_customers_with_big_orders", sql=_SEMI_SQL, tags=("join",))
def join_semi(spark, sf_dir):
    """LEFT SEMI join — EXISTS without duplicating the left side."""
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


@query("join_anti_customers_no_urgent_orders", sql=_ANTI_SQL, tags=("join",))
def join_anti(spark, sf_dir):
    """LEFT ANTI join — NOT EXISTS (customers with no urgent orders)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Q10-style: returned-item reporting — who returned the most revenue.
# ---------------------------------------------------------------------------

_Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       {oracle_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@query("tpch_q10_returned_items", sql=_Q10_SQL, tags=("join", "agg", "topk", "tpch"))
def tpch_q10(spark, sf_dir):
    """Q10 shape: 3-way fact join + broadcast nation dim + exact
    decimal revenue + deterministic top-20. The returnflag and date
    predicates reach the lineitem/orders scans (pushdown); nation
    broadcasts; customer⋈orders⋈lineitem shuffles on the join keys
    once each."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q18-style: large-volume customers (HAVING over a grouped subquery).
# ---------------------------------------------------------------------------

_Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, {oracle_dsum('l_quantity', 2)} AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING {oracle_dsum('l_quantity', 2)} > 180
) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 50
"""


@query("tpch_q18_big_orders", sql=_Q18_SQL, tags=("join", "agg", "tpch"))
def tpch_q18(spark, sf_dir):
    """Q18 shape: grouped HAVING subquery (orders whose total quantity
    exceeds a threshold) joined back to its dimensions — aggregate
    FIRST, join the small survivor set after (the order matters at
    scale: the join input shrinks by the selectivity of HAVING)."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", 2).alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS-style correlated semi-join + count by category.
# The fixture lacks l_commitdate/l_receiptdate, so the correlated
# predicate is "some lineitem shipped after the order date" — the same
# plan shape as TPC-H Q4 (left-semi with a non-equi conjunct, then a
# small hash agg).
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority
"""


@query("tpch_q4_priority_count", sql=_Q4_SQL, tags=("join", "agg", "tpch"))
def tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS → left-semi join (equi key +
    non-equi ship-after-order conjunct), then count per priority. The
    semi-join never materializes matched lineitems — only the order
    row survives, so the shuffle after the join is one row per
    qualifying order."""
    o, l = t(spark, sf_dir, "orders").alias("o"), t(spark, sf_dir, "lineitem").alias("l")
    qualified = o.join(
        l,
        (F.col("o.o_orderkey") == F.col("l.l_orderkey"))
        & (F.col("l.l_shipdate") > F.col("o.o_orderdate")),
        "left_semi",
    )
    return qualified.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# ---------------------------------------------------------------------------
# Q12 shape: fact-fact join + conditional (CASE) aggregation.
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate
GROUP BY l.l_returnflag
"""


@query("tpch_q12_priority_lines", sql=_Q12_SQL, tags=("join", "agg", "tpch"))
def tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape: equi-join two facts with a non-equi residual
    filter, then CASE-conditional counts per group — one shuffle per
    side for the SMJ (AQE may flip to shuffled-hash), one row per
    (task, flag) after map-side partial agg."""
    o, l = t(spark, sf_dir, "orders").alias("o"), t(spark, sf_dir, "lineitem").alias("l")
    high = F.col("o.o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o.o_orderkey") == F.col("l.l_orderkey"))
        .filter(F.col("l.l_shipdate") > F.col("o.o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join: the write-once layout that removes the
# per-query shuffle from repeated fact-fact joins.
# ---------------------------------------------------------------------------

_BUCKETED_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       {oracle_dsum('l_extendedprice', 2)} AS total_price
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


@query("join_bucketed_colocated", sql=_BUCKETED_SQL, tags=("join", "bucketing"))
def join_bucketed_colocated(spark, sf_dir):
    """orders ⋈ lineitem on the order key with BOTH sides stored
    bucketBy(8, orderkey) + sortBy (operators/bucketing.py — written
    once per session, the lakehouse ingest-time layout step): the
    equi-join plans as a ZERO-Exchange sort-merge join, each task
    reading bucket i of both tables.  At 100 TB this converts the
    biggest recurring shuffle in the workload into a file-layout
    contract paid once at write time
    (tests/test_plans.py::test_bucketed_join_has_no_shuffle asserts
    the Exchange-free plan).  Results are layout-independent — the
    oracle runs the plain join."""
    from trafik_etl_modular_spark.operators.bucketing import (
        ensure_bucketed_orders_lineitem,
    )

    t_orders, t_lineitem = ensure_bucketed_orders_lineitem(spark, sf_dir)
    orders = spark.table(t_orders)
    li = spark.table(t_lineitem)
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            dsum("l_extendedprice", 2).alias("total_price"),
        )
    )
