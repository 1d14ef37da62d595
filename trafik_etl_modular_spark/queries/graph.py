"""Iterative graph operators over the TPC-H purchase graph.

The reference has no graph surface; this family extends the engine the
same way connected components did (llmdata/dedup.py): ITERATIVE
algorithms expressed as a fixed number of join+aggregate rounds, each
round one Catalyst plan — the shape that scales because every
iteration is an equi-join on the vertex key plus a hash aggregation,
and lineage is cut per round (localCheckpoint locally, a persisted
frontier table on a cluster).

Graph: bipartite customer—supplier edges from purchases (a customer
and a supplier are adjacent iff some order of the customer contains a
lineitem of the supplier).  Vertex ids pack both sides into one
keyspace: customer c → 2c, supplier s → 2s+1 — integer arithmetic
both engines share.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

_EDGE_SQL = """
e AS (
  SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
ee AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e)
"""

_BFS_SQL = f"""
WITH {_EDGE_SQL},
d0 AS (SELECT CAST(2 AS BIGINT) AS id, 0 AS hop),
d1 AS (
  SELECT id, MIN(hop) AS hop FROM (
    SELECT id, hop FROM d0
    UNION ALL
    SELECT ee.v AS id, d0.hop + 1 AS hop FROM d0 JOIN ee ON ee.u = d0.id
  ) GROUP BY id
),
d2 AS (
  SELECT id, MIN(hop) AS hop FROM (
    SELECT id, hop FROM d1
    UNION ALL
    SELECT ee.v AS id, d1.hop + 1 AS hop FROM d1 JOIN ee ON ee.u = d1.id
  ) GROUP BY id
),
d3 AS (
  SELECT id, MIN(hop) AS hop FROM (
    SELECT id, hop FROM d2
    UNION ALL
    SELECT ee.v AS id, d2.hop + 1 AS hop FROM d2 JOIN ee ON ee.u = d2.id
  ) GROUP BY id
)
SELECT CAST(hop AS INTEGER) AS hop,
       CAST(SUM(CASE WHEN id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_suppliers
FROM d3 WHERE hop <= 3
GROUP BY hop ORDER BY hop
"""


def bfs_hops(spark, ee, source: int, rounds: int):
    """Fixed-round BFS distance relaxation over an edge frame
    (u bigint, v bigint): d_{k+1}(x) = min(d_k(x), min_{u→x} d_k(u)+1).
    Returns (id, hop) for every vertex reached within `rounds`."""
    d = spark.createDataFrame([(source, 0)], "id bigint, hop int")
    for _ in range(rounds):
        relaxed = d.unionByName(
            d.join(ee, d.id == ee.u).select(
                F.col("v").alias("id"), (F.col("hop") + 1).alias("hop")
            )
        )
        d = (
            relaxed.groupBy("id")
            .agg(F.min("hop").alias("hop"))
            .localCheckpoint(eager=False)
        )
    return d


def pagerank(spark, ee, rounds: int = 3):
    """Fixed-round damped PageRank over an edge frame (u, v); returns
    (u, deg, rank) with DECIMAL(38,18)-exact per-round contribution
    sums (see graph_pagerank_3iter)."""
    from trafik_etl_modular_spark.functions.scalars import dsum

    deg = ee.groupBy("u").agg(F.count("*").alias("deg")).localCheckpoint(eager=False)
    n_row = deg.agg(F.count("*").alias("n"))
    r = deg.crossJoin(F.broadcast(n_row)).select(
        "u", "deg", (F.lit(1.0) / F.col("n").cast("double")).alias("rank")
    )
    for _ in range(rounds):
        contrib = ee.join(
            r.select("u", (F.col("rank") / F.col("deg")).alias("c")), "u"
        ).select("v", "c")
        summed = contrib.groupBy("v").agg(dsum("c", 18).alias("s"))
        r = (
            deg.join(summed, deg.u == summed.v)
            .crossJoin(F.broadcast(n_row))
            .select(
                deg.u.alias("u"),
                "deg",
                (
                    F.lit(0.15) / F.col("n").cast("double")
                    + F.lit(0.85) * F.col("s")
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return r


def _edges(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    return e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


@query("graph_bfs_3hop", sql=_BFS_SQL, tags=("graph",))
def graph_bfs_3hop(spark, sf_dir):
    """3-hop BFS from customer 1 over the purchase graph — the
    neighborhood-expansion primitive behind fraud rings, supply-chain
    blast radius, and recommendation candidate generation.  Each
    round relaxes distances once: min(previous, neighbor+1) — one
    equi-join on the vertex key plus one min-aggregation, unrolled a
    fixed 3 times; the per-round frontier frame is lineage-cut with
    localCheckpoint (a persisted frontier table on a cluster), so
    plan depth stays constant in the number of rounds.  Edges are
    derived once (distinct (customer, supplier) pairs from the
    orders⋈lineitem join — shuffle on the order key, then on the
    pair) and reused by every round.  All-integer surface: per hop,
    how many customers and suppliers are first reached there.  The
    oracle unrolls the identical three rounds as chained CTEs."""
    ee = _edges(spark, sf_dir).localCheckpoint(eager=False)
    d = bfs_hops(spark, ee, source=2, rounds=3)
    return (
        d.filter(F.col("hop") <= 3)
        .groupBy(F.col("hop").cast("int").alias("hop"))
        .agg(
            F.sum((F.col("id") % 2 == 0).cast("bigint")).alias("n_customers"),
            F.sum((F.col("id") % 2 == 1).cast("bigint")).alias("n_suppliers"),
        )
        .orderBy("hop")
    )


_PR_DSUM = (
    "CAST(SUM(CAST((r.rank / r.deg) AS DECIMAL(38,18))) AS DOUBLE)"
)

_PR_ITER = """
r{next} AS (
  SELECT d.u, d.deg,
         CAST(0.15 AS DOUBLE) / CAST(ANY_VALUE(n.n) AS DOUBLE)
           + CAST(0.85 AS DOUBLE) * {dsum} AS rank
  FROM ee JOIN r{prev} r ON ee.u = r.u
  JOIN deg d ON d.u = ee.v
  CROSS JOIN n
  GROUP BY d.u, d.deg
)"""

_PAGERANK_SQL = (
    f"WITH {_EDGE_SQL},\n"
    "deg AS (SELECT u, COUNT(*) AS deg FROM ee GROUP BY u),\n"
    "n AS (SELECT COUNT(*) AS n FROM deg),\n"
    "r0 AS (SELECT u, deg, CAST(1.0 AS DOUBLE) / CAST(n.n AS DOUBLE) AS rank\n"
    "       FROM deg CROSS JOIN n),"
    + ",".join(
        _PR_ITER.format(next=i + 1, prev=i, dsum=_PR_DSUM) for i in range(3)
    )
    + """
SELECT u AS vertex_id,
       CASE WHEN u % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       (CAST(ROUND(rank * 1e9) AS BIGINT) / 1e9) AS rank_q
FROM r3 ORDER BY rank DESC, u LIMIT 20
"""
)


@query("graph_pagerank_3iter", sql=_PAGERANK_SQL, tags=("graph",))
def graph_pagerank_3iter(spark, sf_dir):
    """PageRank, 3 power iterations with damping 0.85, over the
    undirected purchase graph — vertex-importance scoring (influencer
    suppliers / hub customers).  Each iteration is ONE equi-join (rank
    frame × edges on the source key) plus ONE hash aggregation on the
    target key; contributions are summed as DECIMAL(38,18) (`dsum`),
    so partition-parallel summation is bit-identical to the oracle's
    sequential sum — the only way an iterative float algorithm stays
    cross-engine exact.  Per-iteration frames are lineage-cut; on a
    cluster each is a persisted rank table and iterations are
    successive jobs over it.  The vertex count N is a 1-row broadcast
    scalar (BNLJ allowlist).  Output: top-20 vertices by final rank
    (deterministic id tiebreak), rank quantized through the integer
    round-trip."""
    ee = _edges(spark, sf_dir).localCheckpoint(eager=False)
    r = pagerank(spark, ee, rounds=3)
    return (
        r.orderBy(F.desc("rank"), F.asc("u"))
        .limit(20)
        .select(
            F.col("u").alias("vertex_id"),
            F.when(F.col("u") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            (
                F.round(F.col("rank") * F.lit(1e9)).cast("bigint").cast("double")
                / F.lit(1e9)
            ).alias("rank_q"),
        )
    )
