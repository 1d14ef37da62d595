"""Market-structure analytics: association rules, Pareto/ABC
classification, and revenue-concentration (HHI).

Three operators the merchandising half of an analytics platform runs
over the order book (the reference's dashboard aggregates county
shares — `app.py:64-90` per SURVEY §2.5 — these are the same
share-of-total instinct applied to baskets, rank curves, and market
concentration):

* **Association rules** (Agrawal–Imieliński–Swami 1993, public
  literature) — brand pairs that co-occur in orders, scored by
  support / confidence / lift.  The candidate space is bounded by
  BASKET WIDTH, never by order count: an order with b distinct brands
  contributes b·(b−1)/2 pairs (fixture max 11 brands → ≤55), and the
  output space is at most |brands|² regardless of scale.

* **Pareto / ABC classification** — parts ranked by revenue, split at
  the classic 80 % / 95 % cumulative-share cuts.  The cuts are EXACT
  integer comparisons on cents (cum·100 ≤ total·80), no ratio
  divisions anywhere until the final e6 share grid.

* **HHI concentration** — the Herfindahl–Hirschman index of supplier
  revenue shares per market segment: HHI_e8 = Σᵢ revᵢ² · 10⁸ //
  (Σ rev)², the antitrust-screening statistic, kept as one exact
  HUGEINT/DECIMAL(38,0) rational per segment.

All money flows through the proven double→DECIMAL(38,2)→cents-BIGINT
cast so both engines aggregate identical integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trafik_etl_modular_spark.operators.pinning import pin
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

_CENTS = "CAST(CAST({col} AS DECIMAL(38,2)) * 100 AS BIGINT)"

# ---------------------------------------------------------------------------
# Brand association rules (support / confidence / lift)
# ---------------------------------------------------------------------------

_MIN_PAIR_ORDERS = 5  # noise floor: a rule needs >= 5 supporting orders
_RULES_TOP_K = 20

_RULES_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM baskets),
bc AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_orders_with FROM baskets
       GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM baskets a JOIN baskets b
    ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY a.brand, b.brand
)
SELECT p.brand_a, p.brand_b, p.n_ab,
       ca.n_orders_with AS n_a, cb.n_orders_with AS n_b, n.n_orders,
       CAST(CAST(p.n_ab AS HUGEINT) * 1000000 // n.n_orders AS BIGINT)
         AS support_e6,
       CAST(CAST(p.n_ab AS HUGEINT) * 1000000 // ca.n_orders_with AS BIGINT)
         AS conf_e6,
       CAST(CAST(n.n_orders AS HUGEINT) * p.n_ab * 1000000
            // (CAST(ca.n_orders_with AS HUGEINT) * cb.n_orders_with)
            AS BIGINT) AS lift_e6
FROM pairs p
JOIN bc ca ON ca.brand = p.brand_a
JOIN bc cb ON cb.brand = p.brand_b
CROSS JOIN n
WHERE p.n_ab >= {_MIN_PAIR_ORDERS}
ORDER BY lift_e6 DESC, brand_a, brand_b
LIMIT {_RULES_TOP_K}
"""


@query("basket_association_rules", sql=_RULES_SQL, tags=("analytics", "join"))
def basket_association_rules(spark, sf_dir) -> DataFrame:
    """ASSOCIATION RULES over order baskets (A-priori's scoring layer,
    Agrawal et al. 1993): for every brand pair {A,B} co-occurring in
    ≥{_MIN_PAIR_ORDERS} orders, support = n_AB/N, confidence(A→B) =
    n_AB/n_A, and lift = N·n_AB/(n_A·n_B) — the "customers who bought
    X also bought Y" engine.  Every score is an EXACT integer e6
    floor-division with HUGEINT/DECIMAL(38,0)-widened products (the
    r11 overflow lesson applied from birth: N·n_AB at lake scale
    exceeds both int64 and the 2⁵³ double-exact window).  Top-20 by
    lift with full-order tie-break (lift, brand_a, brand_b).

    Scale: the pair generator is a SELF-EQUI-JOIN on the order key, so
    candidate volume is Σ_orders (b choose 2) — bounded by basket
    WIDTH (≤ 11 brands/order in the fixture), never orders².  The
    brand-count (25 rows) and corpus-N (1 row) sides broadcast; output
    ≤ |brands|² regardless of scale factor."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = pin(
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct(),
        eager=True,  # feeds N, the brand counts, and both pair-join sides
    )
    n = baskets.agg(F.countDistinct("okey").cast("bigint").alias("n_orders"))
    bc = baskets.groupBy("brand").agg(
        F.count("*").cast("bigint").alias("n_orders_with")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.brand") < F.col("b.brand")))
        .groupBy(F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b"))
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= _MIN_PAIR_ORDERS)
    )
    ca = bc.select(F.col("brand").alias("brand_a"), F.col("n_orders_with").alias("n_a"))
    cb = bc.select(F.col("brand").alias("brand_b"), F.col("n_orders_with").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_orders",
            F.expr(
                "CAST(CAST(n_ab AS DECIMAL(38,0)) * 1000000 div n_orders AS BIGINT)"
            ).alias("support_e6"),
            F.expr(
                "CAST(CAST(n_ab AS DECIMAL(38,0)) * 1000000 div n_a AS BIGINT)"
            ).alias("conf_e6"),
            F.expr(
                "CAST(CAST(n_orders AS DECIMAL(38,0)) * n_ab * 1000000"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("lift_e6"),
        )
        .orderBy(F.desc("lift_e6"), "brand_a", "brand_b")
        .limit(_RULES_TOP_K)
    )


# ---------------------------------------------------------------------------
# Pareto / ABC revenue classification
# ---------------------------------------------------------------------------

_ABC_SQL = f"""
WITH rev AS (
  SELECT l_partkey, CAST(SUM({_CENTS.format(col="l_extendedprice")}) AS BIGINT)
           AS rev_cents
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total_cents FROM rev),
ranked AS (
  SELECT l_partkey, rev_cents,
         CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
  FROM rev
),
classed AS (
  SELECT l_partkey, rev_cents,
         CASE WHEN CAST(cum_cents AS HUGEINT) * 100
                   <= CAST(t.total_cents AS HUGEINT) * 80 THEN 'A'
              WHEN CAST(cum_cents AS HUGEINT) * 100
                   <= CAST(t.total_cents AS HUGEINT) * 95 THEN 'B'
              ELSE 'C' END AS abc_class,
         t.total_cents
  FROM ranked CROSS JOIN tot t
)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev_cents) AS BIGINT) AS class_rev_cents,
       CAST(CAST(SUM(rev_cents) AS HUGEINT) * 1000000 // MAX(total_cents)
            AS BIGINT) AS rev_share_e6
FROM classed
GROUP BY abc_class
ORDER BY abc_class
"""


@query("agg_pareto_abc", sql=_ABC_SQL, tags=("agg", "analytics"))
def agg_pareto_abc(spark, sf_dir) -> DataFrame:
    """PARETO / ABC CLASSIFICATION of parts by revenue: rank parts by
    exact-cents revenue, cut the cumulative curve at 80 % (class A)
    and 95 % (class B) of total — the inventory-prioritization rule
    behind "20 % of SKUs carry 80 % of revenue".  Both cuts are EXACT
    integer comparisons (cum·100 ≤ total·80 in HUGEINT/DECIMAL) — the
    80/95 thresholds never touch a float; the per-class share is the
    e6 floor-division grid.

    Scale: revenue folds map-side into the PART DIMENSION (one hash
    agg over the fact table), so the ranked window runs over dim-sized
    data — ~20 k rows at sf0.1, ~2 ·10⁸ at 100 TB.  The single-
    partition cumulative window is the documented dim-frame tradeoff
    (cf. vocab_zipf_rank_curve); at 10⁹-part scale switch to the
    two-pass range-partitioned prefix-sum (partition sums broadcast,
    per-partition windows local)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(_CENTS.format(col="l_extendedprice")).alias("cents"),
    )
    # rank window runs over the UNPINNED aggregate (the bounding
    # Aggregate must stay plan-visible to the global-window
    # invariant); the pin sits ABOVE the window, where both consumers
    # (total + classing) actually branch
    rev = li.groupBy("l_partkey").agg(
        F.sum("cents").cast("bigint").alias("rev_cents")
    )
    w = Window.orderBy(F.desc("rev_cents"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = pin(
        rev.select(
            "l_partkey",
            "rev_cents",
            F.sum("rev_cents").over(w).cast("bigint").alias("cum_cents"),
        ),
        eager=True,
    )
    # the final cumulative value IS the total — no second fact scan
    tot = ranked.agg(F.max("cum_cents").cast("bigint").alias("total_cents"))
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "rev_cents",
        "total_cents",
        F.expr(
            "CASE WHEN CAST(cum_cents AS DECIMAL(38,0)) * 100"
            "          <= CAST(total_cents AS DECIMAL(38,0)) * 80 THEN 'A'"
            "     WHEN CAST(cum_cents AS DECIMAL(38,0)) * 100"
            "          <= CAST(total_cents AS DECIMAL(38,0)) * 95 THEN 'B'"
            "     ELSE 'C' END"
        ).alias("abc_class"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("rev_cents").cast("bigint").alias("class_rev_cents"),
            F.expr(
                "CAST(CAST(SUM(rev_cents) AS DECIMAL(38,0)) * 1000000"
                " div MAX(total_cents) AS BIGINT)"
            ).alias("rev_share_e6"),
        )
        .orderBy("abc_class")
    )


# ---------------------------------------------------------------------------
# HHI revenue concentration per market segment
# ---------------------------------------------------------------------------

# Exactness bound for the single-division e8 grid: the numerator
# Σ revᵢ² · 10⁸ ≤ (Σ rev)² · 10⁸ must fit DECIMAL(38,0)/HUGEINT, so a
# segment's total revenue must stay below 10¹⁵ cents (10 trillion
# dollars — comfortably above any real segment, loudly guarded below
# rather than silently wrapped; the ADVICE-r11 lesson).
_HHI_MAX_SEGMENT_CENTS = 10**15

_HHI_SQL = f"""
WITH seg_supp AS (
  SELECT c.c_mktsegment AS segment, l.l_suppkey,
         CAST(SUM({_CENTS.format(col="l_extendedprice")}) AS BIGINT)
           AS rev_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_mktsegment, l.l_suppkey
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(rev_cents) AS BIGINT) AS segment_rev_cents,
       CAST(SUM(CAST(rev_cents AS HUGEINT) * rev_cents) * 100000000
            // (CAST(SUM(rev_cents) AS HUGEINT) * SUM(rev_cents))
            AS BIGINT) AS hhi_e8
FROM seg_supp
GROUP BY segment
ORDER BY segment
"""


@query("agg_hhi_concentration", sql=_HHI_SQL, tags=("agg", "analytics"))
def agg_hhi_concentration(spark, sf_dir) -> DataFrame:
    """HERFINDAHL–HIRSCHMAN INDEX of supplier revenue concentration
    per market segment: HHI = Σᵢ sᵢ² over supplier revenue shares —
    the antitrust screen (≥ 0.25 ≙ hhi_e8 ≥ 25 000 000 is "highly
    concentrated").  Kept as ONE exact rational per segment:
    Σ revᵢ²·10⁸ // (Σ rev)², every product widened to HUGEINT /
    DECIMAL(38,0).  A loud ValueError guard enforces the documented
    numerator bound (segment revenue < 10¹⁵ cents) instead of letting
    Spark wrap while DuckDB raises — the silent-divergence class the
    r11 ADVICE flagged.

    Scale: one three-table equi-join chain (lineitem⋈orders⋈customer,
    all key-partitioned hash joins; customer's segment column prunes
    to 2 columns), one hash agg to (segment, supplier) — dim-bounded —
    then a 5-row final agg.  The guard collects 5 rows."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.expr(_CENTS.format(col="l_extendedprice")).alias("cents"),
    )
    od = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg_supp = pin(
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "l_suppkey")
        .agg(F.sum("cents").cast("bigint").alias("rev_cents")),
        eager=True,  # feeds the guard scan and the HHI aggregate
    )
    # Loud exactness guard (cf. _check_lpa_radix): 5 bounded rows.
    for row in (
        seg_supp.groupBy("segment")
        .agg(F.sum("rev_cents").cast("bigint").alias("tot"))
        .collect()
    ):
        if row["tot"] >= _HHI_MAX_SEGMENT_CENTS:
            raise ValueError(
                f"agg_hhi_concentration: segment {row['segment']!r} revenue "
                f"{row['tot']} cents exceeds the exact-HHI numerator bound "
                f"{_HHI_MAX_SEGMENT_CENTS}; shrink the e8 grid or split the "
                "division before results silently diverge cross-engine"
            )
    return (
        seg_supp.groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.sum("rev_cents").cast("bigint").alias("segment_rev_cents"),
            F.expr(
                "CAST(SUM(CAST(rev_cents AS DECIMAL(38,0)) * rev_cents)"
                " * 100000000"
                " div (CAST(SUM(rev_cents) AS DECIMAL(38,0)) * SUM(rev_cents))"
                " AS BIGINT)"
            ).alias("hhi_e8"),
        )
        .orderBy("segment")
    )
