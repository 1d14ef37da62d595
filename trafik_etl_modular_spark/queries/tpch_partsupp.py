"""TPC-H q2/q11/q16/q20 — the four queries whose canonical form needs
the ``partsupp`` table, which the fixtures lack.  Re-expressed over a
*derived* part–supplier relation aggregated from ``lineitem``:

    ps(ps_partkey, ps_suppkey,
       ps_availqty   = exact-decimal SUM(l_quantity),
       ps_supplycost = MIN(l_extendedprice))

That derivation is itself the interesting part at 100 TB: it is ONE
shuffle of lineitem on (partkey, suppkey) with full map-side partial
aggregation, and every query here reuses the same grouped relation,
so Catalyst plans scan → partial agg → exchange → final agg → (tiny
broadcast joins).  Each query preserves its canonical TPC-H plan
shape (correlated-min subquery, global-fraction scalar subquery,
NOT-IN anti join + distinct agg, nested per-group threshold), which
is what the reference's dimension-lookup primitive (SURVEY.md §2.3
J1–J3, /root/reference/src/trv/transform.py:78-81) generalizes to at
fact scale.

Determinism: ps_availqty goes through dsum (exact decimal, partition
-order independent); ps_supplycost is MIN (exact on doubles); every
threshold comparison applies the same IEEE double ops in the same
order in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.functions.scalars import dsum, oracle_dsum
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

# The derived part-supplier relation, shared by all four queries.
# SQL form is a CTE so DuckDB computes the identical relation.
_PS_SQL = f"""
ps AS (
  SELECT
    l_partkey AS ps_partkey,
    l_suppkey AS ps_suppkey,
    {oracle_dsum('l_quantity', 2)} AS ps_availqty,
    MIN(l_extendedprice) AS ps_supplycost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
)
"""


# (The Spark legs derive the same relation inline, each over a fact
# scan pre-filtered by its query's broadcast key restrictions — the
# oracle CTE keeps the unfiltered canonical form; restricting whole
# groups by a grouping key commutes with the aggregation.)


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier: for every size-15 part, the EUROPE
# supplier(s) offering it at the region-wide minimum cost.  The
# correlated MIN subquery decorrelates to a per-part grouped MIN over
# the region-filtered ps, joined back on (partkey, cost = min_cost).
# Plan at scale: ps shuffle (the only big exchange) → supplier/nation/
# region broadcast → per-part min re-uses the ps partitioning →
# broadcast the (small) min table back onto the filtered part join.
# MIN-of-double equality is exact, so the tie set is deterministic.
# ---------------------------------------------------------------------------

_Q2_SQL = f"""
WITH {_PS_SQL},
eps AS (
  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_name, s_acctbal, n_name
  FROM ps
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
minc AS (
  SELECT ps_partkey AS m_partkey, MIN(ps_supplycost) AS min_cost
  FROM eps GROUP BY ps_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
FROM part
JOIN eps  ON ps_partkey = p_partkey
JOIN minc ON m_partkey = p_partkey AND ps_supplycost = min_cost
WHERE p_size = 15
"""


@query("tpch_q2_min_cost_supplier", sql=_Q2_SQL, tags=("join", "subquery", "tpch"))
def tpch_q2(spark, sf_dir):
    """TPC-H Q2: cheapest EUROPE supplier per size-15 part
    (correlated-min subquery decorrelated to grouped MIN + equi-join)."""
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") == 15)

    # Pre-filter the FACT SCAN with broadcast semi-joins on both
    # restriction keys before the (partkey, suppkey) aggregation
    # (guide §2.3 / §3.2 — shuffle fewer bytes): every predicate here
    # restricts whole GROUPS by a grouping key (EUROPE suppliers,
    # size-15 parts), so dropping their rows before the groupBy leaves
    # the surviving groups' aggregates untouched.  minc stays correct:
    # it is per-part over EUROPE suppliers, and only size-15 parts can
    # reach the final join anyway.
    eur_supp = supp.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    li = (
        t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(eur_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        dsum("l_quantity", 2).alias("ps_availqty"),
        F.min("l_extendedprice").alias("ps_supplycost"),
    )
    eps = (
        ps.join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    minc = eps.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(minc),
            (F.col("m_partkey") == F.col("ps_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: parts whose inventory value (supplycost ×
# availqty, summed over a two-nation supplier group) exceeds a fixed
# fraction of the group's total value.  The uncorrelated scalar total
# is a 1-row aggregate broadcast-cross-joined back — never a global
# window — and it SUMS THE PER-PART AGGREGATE, not the base relation:
# decimal addition is exact and associative, so Σ(per-part sums) is
# bit-identical to a second full pass over nps while costing one tiny
# re-aggregation of ~|parts| rows instead of re-deriving the whole
# lineitem→ps subtree (which Catalyst does NOT share across scalar-
# subquery branches).  Same restructure on the oracle side.
# ---------------------------------------------------------------------------

_Q11_VALUE = oracle_dsum("ps_supplycost * ps_availqty", 4)

_Q11_SQL = f"""
WITH {_PS_SQL},
nps AS (
  SELECT ps_partkey, ps_supplycost, ps_availqty
  FROM ps
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_7')
),
per_part AS (
  SELECT ps_partkey, {_Q11_VALUE} AS value
  FROM nps GROUP BY ps_partkey
),
tot AS (
  SELECT {oracle_dsum('value', 4)} AS total_value FROM per_part
)
SELECT ps_partkey, value
FROM per_part CROSS JOIN tot
WHERE value > 0.002 * total_value
"""


@query("tpch_q11_important_stock", sql=_Q11_SQL, tags=("agg", "subquery", "tpch"))
def tpch_q11(spark, sf_dir):
    """TPC-H Q11: parts holding > 0.2% of the two-nation inventory
    value (global-fraction scalar subquery as broadcast cross join)."""
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    # same pre-aggregation semi-join pushdown as q2: the two-nation
    # supplier restriction is on a GROUPING key, so filtering the fact
    # rows first shrinks the (partkey, suppkey) shuffle without
    # touching any surviving group's sums
    two_nation = supp.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(two_nation),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        dsum("l_quantity", 2).alias("ps_availqty"),
        F.min("l_extendedprice").alias("ps_supplycost"),
    )
    nps = (
        ps.join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", "ps_supplycost", "ps_availqty")
    )
    value = dsum(F.col("ps_supplycost") * F.col("ps_availqty"), 4)
    per_part = nps.groupBy("ps_partkey").agg(value.alias("value"))
    tot = per_part.agg(dsum("value", 4).alias("total_value"))
    return (
        per_part.join(F.broadcast(tot))
        .filter(F.col("value") > 0.002 * F.col("total_value"))
        .select("ps_partkey", "value")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier-count distribution: how many distinct suppliers ship
# each (brand, type, size) combination, excluding one brand, one type,
# and a NOT-IN supplier set.  The NOT IN (non-null key) is a left-anti
# join; COUNT(DISTINCT) over the already partkey-suppkey-distinct ps
# shuffles once on the grouping key.  part is broadcast.
# ---------------------------------------------------------------------------

_Q16_SQL = """
WITH ps AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
  FROM lineitem
)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%000000001%'
  )
GROUP BY p_brand, p_type, p_size
"""


@query("tpch_q16_supplier_count", sql=_Q16_SQL, tags=("join", "agg", "subquery", "tpch"))
def tpch_q16(spark, sf_dir):
    """TPC-H Q16: distinct-supplier histogram by part attributes with a
    NOT-IN exclusion list (anti join on a broadcast complaint set)."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    excluded = t(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%000000001%")
    ).select("s_suppkey")
    # both restrictions are on the distinct's OWN key columns, so they
    # commute with the distinct — apply them to the fact scan first
    # (broadcast semi/anti) and shrink the distinct's shuffle instead
    # of deduplicating rows the joins would drop anyway
    ps = (
        t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .join(
            F.broadcast(part.select("p_partkey")),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(F.broadcast(excluded), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .distinct()
    )
    return (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 — excess inventory: suppliers in one nation holding 'red' parts
# whose all-time shipped quantity exceeds 8× what they moved in 1996
# (the canonical "availqty > ½ yearly demand" threshold re-based on
# the derived relation: both sides come out of the SAME grouped
# aggregate, as a conditional sum — no second lineitem pass).  The
# qualifying (part, supplier) set reduces to distinct suppkeys and
# semi-joins supplier — at scale the semi side is tiny (≤ |supplier|).
# ---------------------------------------------------------------------------

_Q20_SQL = f"""
WITH ps AS (
  SELECT
    l_partkey AS ps_partkey,
    l_suppkey AS ps_suppkey,
    {oracle_dsum('l_quantity', 2)} AS ps_availqty,
    {oracle_dsum("CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
                 "      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'"
                 " THEN l_quantity ELSE 0 END", 2)} AS qty_1996
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT DISTINCT ps_suppkey
  FROM ps
  JOIN part ON p_partkey = ps_partkey
  WHERE p_name LIKE 'red%' AND ps_availqty > 8.0 * qty_1996
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
  AND s_suppkey IN (SELECT ps_suppkey FROM excess)
"""


@query("tpch_q20_excess_inventory", sql=_Q20_SQL, tags=("join", "subquery", "tpch"))
def tpch_q20(spark, sf_dir):
    """TPC-H Q20: nation-filtered suppliers with excess 'red'-part
    inventory (nested per-group threshold → conditional sum in one
    aggregate, then left-semi join)."""
    red_parts = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    # the red-part restriction is on the grouping key — semi-join the
    # fact scan against the broadcast part list BEFORE the aggregation
    # so the (partkey, suppkey) shuffle carries only red-part rows
    # (guide §3.2; surviving groups' sums are unchanged)
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(red_parts),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    in_1996 = (
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        dsum("l_quantity", 2).alias("ps_availqty"),
        dsum(F.when(in_1996, F.col("l_quantity")).otherwise(0), 2).alias("qty_1996"),
    )
    excess = (
        ps.join(F.broadcast(red_parts), F.col("ps_partkey") == F.col("p_partkey"))
        .filter(F.col("ps_availqty") > 8.0 * F.col("qty_1996"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )
