"""Iterative graph operators over the TPC-H purchase graph.

The reference has no graph surface; this family extends the engine the
same way connected components did (llmdata/dedup.py): ITERATIVE
algorithms expressed as a fixed number of join+aggregate rounds, each
round one Catalyst plan — the shape that scales because every
iteration is an equi-join on the vertex key plus a hash aggregation.
Lineage policy is per-algorithm: BFS cuts per round (an eager
localCheckpoint locally, a persisted frontier table on a cluster)
because its frontier feeds a broadcast; PageRank keeps its 3 unrolled
rounds as one shallow plan and would persist the rank table only as
the round count grows.  The edge table itself is ingest-time work,
built once per snapshot (ensure_edge_table) and scanned per round.

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


# Max rows of a vertex-keyed frame we'll hint into a broadcast: ~5M
# (id, hop) / (u, deg, rank) rows is ~100-200 MB serialized — around
# Spark's practical broadcast ceiling.  Below it, each iterative round
# is a map-side join over the edge scan; above it (a 10⁹-vertex graph
# would OOM the driver and every executor), the rounds shuffle-join
# against the co-partitioned 32-file edge table instead — the gate is
# a runtime row-count condition, not a docstring promise.
BROADCAST_VERTEX_LIMIT = 5_000_000


def count_vertices(ee) -> int:
    """Approximate vertex count of a symmetric edge frame — the gate
    input.  approx_count_distinct is a map-side-combined HLL sketch
    (one scalar to the driver, no exact-distinct shuffle); a ±2% RSD
    is irrelevant to a 5M-row threshold."""
    return int(ee.agg(F.approx_count_distinct("u").alias("n")).first()["n"])


def _vertex_gate(df, n_vertices: int, limit: int):
    """Broadcast-hint a vertex-bounded frame only when the vertex
    count says it fits; otherwise return it unhinted so the round
    plans a shuffle join (and AQE may still locally convert a
    genuinely small runtime side)."""
    return F.broadcast(df) if n_vertices <= limit else df


def bfs_hops(
    spark,
    ee,
    source: int,
    rounds: int,
    n_vertices: int | None = None,
    broadcast_vertex_limit: int = BROADCAST_VERTEX_LIMIT,
    checkpoint: bool = True,
):
    """Fixed-round BFS distance relaxation over an edge frame
    (u bigint, v bigint): d_{k+1}(x) = min(d_k(x), min_{u→x} d_k(u)+1).
    Returns (id, hop) for every vertex reached within `rounds`.
    ``checkpoint=False`` keeps the full round lineage in one plan —
    for plan tests only (production rounds cut lineage eagerly)."""
    if n_vertices is None:
        # Count only when the gate outcome actually depends on it — a
        # non-positive limit forces the shuffle path without paying an
        # edge-frame scan at DataFrame-construction time.
        n_vertices = (
            count_vertices(ee)
            if broadcast_vertex_limit > 0
            else broadcast_vertex_limit + 1
        )
    d = spark.createDataFrame([(source, 0)], "id bigint, hop int")
    for _ in range(rounds):
        # The reached set is VERTEX-bounded — when the whole vertex
        # set fits the broadcast gate, each round is a map-side join
        # over the edge scan and the only shuffle is the min-agg on
        # (id, hop) partials, map-side combined to ~|V| rows per task.
        # Past the gate, the frontier shuffle-joins the edge table.
        relaxed = d.unionByName(
            _vertex_gate(d, n_vertices, broadcast_vertex_limit)
            .join(ee, d.id == ee.u)
            .select(F.col("v").alias("id"), (F.col("hop") + 1).alias("hop"))
        )
        # Eager checkpoint: under broadcast, a LAZY checkpoint is
        # recomputed once for the broadcast collect and again for the
        # final job (measured 3.2× slower at sf0.1); eager pays the
        # ~|V|-row materialization once and keeps plan depth constant
        # in the number of rounds.
        d = relaxed.groupBy("id").agg(F.min("hop").alias("hop"))
        if checkpoint:
            d = d.localCheckpoint(eager=True)
    return d


def pagerank(
    spark,
    ee,
    rounds: int = 3,
    n_vertices: int | None = None,
    broadcast_vertex_limit: int = BROADCAST_VERTEX_LIMIT,
):
    """Fixed-round damped PageRank over an edge frame (u, v); returns
    (u, deg, rank) with exact long-scaled per-round contribution sums
    (see the equivalence-chain comment in the round body)."""
    if n_vertices is None:
        # Same lazy-count rule as bfs_hops: no edge scan when the gate
        # outcome is predetermined.
        n_vertices = (
            count_vertices(ee)
            if broadcast_vertex_limit > 0
            else broadcast_vertex_limit + 1
        )
    # The degree frame feeds EVERY round's join, the vertex-count
    # scalar, and the rank init — pin it once (eager: it sits under
    # broadcasts, the lazy-under-broadcast recompute case) instead of
    # re-running the edge aggregation per plan leg.  Interleaved A/B
    # at sf0.1 (r7, two sessions): deg-pinned median 2.7 s vs 3.2 s
    # unpinned and 3.4 s per-round-checkpointed, identical output.
    # At lake scale this is the persisted degree table every PageRank
    # job starts from.
    deg = ee.groupBy("u").agg(F.count("*").alias("deg")).localCheckpoint(eager=True)
    n_row = deg.agg(F.count("*").alias("n"))
    r = deg.crossJoin(F.broadcast(n_row)).select(
        "u", "deg", (F.lit(1.0) / F.col("n").cast("double")).alias("rank")
    )
    for _ in range(rounds):
        # rank/deg frames are vertex-bounded — under the broadcast
        # gate, both sides of the per-round joins broadcast and each
        # round is one edge scan plus one map-side-combined
        # (v, contribution) shuffle; past the gate every round is a
        # co-partitioned shuffle join against the 32-file edge table
        # (the 1-row vertex-count scalar stays broadcast at any
        # scale).  No per-round lineage cut: 3 unrolled rounds is one
        # shallow Catalyst plan (eager checkpoints measured 2.7×
        # slower — three synchronous materialization stalls); cut
        # lineage into a persisted rank table only when the round
        # count grows.
        # fquant-snap the contribution to the 1e-15 grid as an exact
        # INTEGER k = round(c·10^15) — computed once per VERTEX in the
        # gated rank projection (c = rank/deg is constant per u), not
        # once per edge row as the earlier dsum(fquant(c)) form did —
        # and sum the longs.  Exactness chain, same guarantees as the
        # DECIMAL(38,15) formulation this replaces (§2.3 narrow types,
        # the agg_weighted_median long-cents discipline): k ≤ 10^15
        # (contribution ≤ total rank mass 1), per-vertex sums Σk ≤
        # 10^15 ≪ 2^63 (bounded by MASS, not row count — overflow
        # would need total rank mass > 9000), Σk < 2^53 so the closing
        # long→double cast is exact, and Σk/1e15 (both operands exact
        # doubles, 10^15 = 2^15·5^15 < 2^53) is the one correctly-
        # rounded IEEE division — bit-identical to the oracle's
        # CAST(SUM(DECIMAL(38,15)) AS DOUBLE) of the same snapped
        # terms, which also rounds the exact rational Σk·10⁻¹⁵ to
        # nearest.  Measured 2.9 → 1.6 s for the 3 PPR rounds at
        # sf0.1; the decimal agg was the round's hot spot.
        contrib = ee.join(
            _vertex_gate(
                r.select(
                    "u",
                    F.round((F.col("rank") / F.col("deg")) * F.lit(1e15))
                    .cast("bigint")
                    .alias("ck"),
                ),
                n_vertices,
                broadcast_vertex_limit,
            ),
            "u",
        ).select("v", "ck")
        summed = contrib.groupBy("v").agg(
            (F.sum("ck").cast("double") / F.lit(1e15)).alias("s")
        )
        r = (
            deg.join(
                _vertex_gate(summed, n_vertices, broadcast_vertex_limit),
                deg.u == summed.v,
            )
            .crossJoin(F.broadcast(n_row))
            .select(
                deg.u.alias("u"),
                "deg",
                (
                    F.lit(0.15) / F.col("n").cast("double")
                    + F.lit(0.85) * F.col("s")
                ).alias("rank"),
            )
        )
    return r


def cosupplier_pairs(li) -> "DataFrame":
    """Per-order co-supplier pairs (u, v), u < v, one row per
    (order, unordered pair) — the market-basket projection all the
    co-supplier graph queries start from.

    Built as ONE shuffle: group the line items by order, collect the
    DISTINCT supplier set (sorted), and expand the C(k,2) pairs
    map-side with array higher-order functions.  The previous
    distinct + self-join-on-orderkey formulation paid two extra
    exchanges (the distinct's, then the join re-shuffle of both legs)
    for the identical pair multiset; the expansion here is bounded by
    order width (≤ 7 items → ≤ 21 pairs per order), so the explode
    never amplifies beyond what the join produced.  Measured at
    sf0.1: edges leg 1.82 → 1.47 s isolated; at cluster scale the
    saved exchange is a full pass over the projected fact table."""
    sets = li.select("l_orderkey", "l_suppkey").groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("ss")
    )
    pair_arr = F.expr(
        "flatten(transform(ss, (x, i) -> "
        "transform(slice(ss, i + 2, size(ss) - i - 1), "
        "y -> struct(x AS u, y AS v))))"
    )
    return sets.select(F.explode(pair_arr).alias("e")).select("e.u", "e.v")


def cosupplier_pairs_bucketed(spark, sf_dir: str) -> "DataFrame":
    """:func:`cosupplier_pairs` fed from the lineitem table BUCKETED
    by l_orderkey (`operators/bucketing.py` — the ingest-time layout
    the bench warmup already builds): the per-order `collect_set`
    aggregation reads each bucket pre-clustered by the grouping key,
    so the order-key exchange disappears from the plan (guide §6 /
    §2.4 — bucketed tables persist a partitioning across jobs).
    Identical pair multiset to the plain-scan form (453,588 rows
    compared at sf0.1); measured 2.0 → 0.6 s for the pair-counts leg.
    At lake scale this is the difference between re-shuffling the
    projected fact table per query and reading co-located buckets."""
    from trafik_etl_modular_spark.operators.bucketing import (
        ensure_bucketed_orders_lineitem,
    )

    _, bl = ensure_bucketed_orders_lineitem(spark, sf_dir)
    return cosupplier_pairs(spark.table(bl))


def ensure_edge_table(spark, sf_dir: str) -> str:
    """Build-and-persist the purchase-graph edge table (u, v) —
    directed both ways, distinct — under the session warehouse dir,
    keyed by the source tables' content fingerprint.  Graph BUILD is
    ingest-time work (one orders⋈lineitem shuffle + distinct, paid
    once per snapshot — at lake scale this is the persisted edge
    table every graph job starts from); queries then pay only the
    edge SCAN per iteration.  Concurrent-build safe via the same
    atomic tmp-dir rename the IVF index uses."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    def _fp(name: str) -> str:
        p = os.path.join(sf_dir, f"{name}.parquet")
        st = os.stat(p)
        return f"{st.st_mtime_ns}|{st.st_size}"

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    tag = hashlib.sha256(
        f"{sf_dir}|{_fp('orders')}|{_fp('lineitem')}|v5".encode()
    ).hexdigest()[:12]
    path = os.path.join(wh, "purchase_edges", tag)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
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
    ee = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    tmp = f"{path}.tmp.{os.getpid()}"
    # 32 files so iterative scans keep full local[32] width (at lake
    # scale: one file per target partition of the downstream joins).
    ee.repartition(32).write.mode("overwrite").parquet(tmp)
    # Table-level statistics computed AT INGEST, stored with the table
    # (the ANALYZE TABLE / Delta-stats pattern, layout tag v4): the
    # exact vertex count gates the iterative queries' broadcast
    # decision, and max_id / max_degree are what the LPA packing-radix
    # guard needs — persisting all three here removes per-query
    # counting jobs (the radix guard alone was a measured 1.5 s full
    # edge pass per LPA invocation, guide §1.2 step 1: don't recompute
    # what ingest already knows) AND makes the gates exact instead of
    # sketched.  One grouped pass over the symmetric table yields all
    # three (every vertex appears as u).  Written inside the tmp dir
    # so the atomic rename publishes data + stats together.
    g = (
        spark.read.parquet(tmp)
        .groupBy("u")
        .agg(F.count("*").alias("d"))
        .agg(
            F.count("*").alias("n_vertices"),
            F.max("u").alias("max_id"),
            F.max("d").alias("max_degree"),
            F.sum("d").alias("n_rows"),
        )
        .first()
    )
    import json

    with open(os.path.join(tmp, "_stats.json"), "w") as f:
        json.dump(
            {
                "n_vertices": g["n_vertices"],
                "max_id": g["max_id"],
                "max_degree": g["max_degree"],
                "n_rows": g["n_rows"],
            },
            f,
        )
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost a benign race
    return path


def edge_table_stats(path: str) -> dict:
    """The ingest-time statistics sidecar of a persisted edge table
    (``{}`` for a pre-stats table — callers fall back to counting)."""
    import json
    import os

    p = os.path.join(path, "_stats.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def _edges_and_count(spark, sf_dir):
    """(pinned edge frame, exact vertex count from the ingest-time
    stats sidecar — None for a pre-stats table, in which case the
    iterative operators fall back to their own sketch count)."""
    ee, stats = _edges_count_stats(spark, sf_dir)
    return ee, stats.get("n_vertices")


# Wedge-expansion width: proportional to the ADJACENCY rows feeding
# the Σdeg² self-join (~30k adjacency rows ≈ 6–7M probe pairs per
# task at this graph's degree profile), same floor/cap discipline as
# the edge pin below.  Replaces a hardcoded 32 that only made sense
# as "the local core count": at sf0.1 the interleaved A/B of the
# common-neighbor wedge stage measured 1.76–2.95 s @32 vs
# 1.4–1.8 s @4–8 — near-empty wedge tasks cost more scheduling than
# they buy in overlap, while at lake scale the width now grows with
# the graph instead of freezing at 32.
_WEDGE_ADJ_ROWS_PER_PARTITION = 30_000


def _wedge_width(spark, n_adj_rows: int) -> int:
    return max(
        4,
        min(
            -(-int(n_adj_rows) // _WEDGE_ADJ_ROWS_PER_PARTITION),
            4 * spark.sparkContext.defaultParallelism,
        ),
    )


# Pinned-width sizing for the iterative edge frame: ~2M rows (~32 MB
# raw at 16 B/row) per partition, floored at 4 so tiny fixtures keep a
# minimum of task overlap, capped at 4× cluster parallelism so a huge
# snapshot can't explode the task count.  Derived from the INGEST-TIME
# row count, not the core count (guide §2.2 "fewer, larger partitions"
# / §6.1): at sf0.1 the 32-file scan width gave 32 near-empty
# partitions whose per-task scheduling dominated every iteration —
# an interleaved A/B of the pinned width on PageRank measured
# 2.05 s @32 → 1.32 s @8 → 1.14 s @4 warm.
_EDGE_ROWS_PER_PARTITION = 2_000_000
_EDGE_MIN_PARTITIONS = 4


def _edges_count_stats(spark, sf_dir):
    """(pinned edge frame, full ingest-time stats sidecar dict) — the
    stats-complete sibling of :func:`_edges_and_count` for operators
    that also want max_id / max_degree (the LPA radix guard).  The
    pin coalesces the scan to the rows-adaptive width above (a
    narrow, shuffle-free merge); pre-stats tables (no n_rows) keep
    the raw scan width."""
    path = ensure_edge_table(spark, sf_dir)
    ee = spark.read.parquet(path)
    stats = edge_table_stats(path)
    n_rows = stats.get("n_rows")
    if n_rows:
        width = max(
            _EDGE_MIN_PARTITIONS,
            min(
                -(-n_rows // _EDGE_ROWS_PER_PARTITION),
                4 * spark.sparkContext.defaultParallelism,
            ),
        )
        ee = ee.coalesce(width)
    return ee.localCheckpoint(eager=True), stats


def _edges(spark, sf_dir):
    """Edge frame pinned in executor memory for the iterative rounds —
    the GraphX discipline: an iterative algorithm pins its edge list
    so each round re-reads memory, not the lake.  Row-cache via eager
    localCheckpoint, which measured ~30% faster per round than the
    columnar persist() cache here (every round touches both columns,
    so columnar decode is pure overhead).  Pinned per CALL, not in a
    module cache: the sweep harnesses unpersist all storage between
    queries, and a truncated-lineage checkpoint cannot recompute once
    its blocks are dropped — the ~0.3 s re-pin is the price of being
    safe under any cache-hygiene policy.  The persisted parquet table
    is the durable copy a cluster re-pins from after executor loss."""
    return _edges_and_count(spark, sf_dir)[0]


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
    ee, n_v = _edges_and_count(spark, sf_dir)
    d = bfs_hops(spark, ee, source=2, rounds=3, n_vertices=n_v)
    return (
        d.filter(F.col("hop") <= 3)
        .groupBy(F.col("hop").cast("int").alias("hop"))
        .agg(
            F.sum((F.col("id") % 2 == 0).cast("bigint")).alias("n_customers"),
            F.sum((F.col("id") % 2 == 1).cast("bigint")).alias("n_suppliers"),
        )
        .orderBy("hop")
    )


# mirrors the Spark side's dsum(fquant(c, 15), 15): snap the
# contribution to the 1e-15 grid through the exact integer round-trip,
# THEN cast to DECIMAL(38,15) — both engines recover the identical
# snapped integer, so the decimal cast can never face a half boundary
_PR_DSUM = (
    "CAST(SUM(CAST((CAST(ROUND((r.rank / r.deg) * 1e15) AS BIGINT) / 1e15)"
    " AS DECIMAL(38,15))) AS DOUBLE)"
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
    target key; contributions are fquant-snapped to the 1e-15 grid
    and summed as DECIMAL(38,15) (`dsum`), so partition-parallel
    summation is bit-identical to the oracle's sequential sum AND the
    double→decimal cast provably never faces a half boundary (the
    snap scale equals the sum scale, so the cast recovers the exact
    snapped integer on both engines — closing the last arbitrary-
    double decimal site left latent after ecd4c6e).  Three unrolled iterations stay one shallow
    Catalyst plan (no per-round materialization stall); on a cluster
    with many iterations each round becomes a persisted rank table
    and successive jobs.  The vertex count N is a 1-row broadcast
    scalar (BNLJ allowlist).  Output: top-20 vertices by final rank
    (deterministic id tiebreak), rank quantized through the integer
    round-trip."""
    ee, n_v = _edges_and_count(spark, sf_dir)
    r = pagerank(spark, ee, rounds=3, n_vertices=n_v)
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


# ---------------------------------------------------------------------------
# Triangle counting (degree-oriented) over the co-supplier graph
# ---------------------------------------------------------------------------

# closing-edge broadcast gate (bytes-bounded analog of
# BROADCAST_VERTEX_LIMIT): 5M edges × 16 B ≈ 80 MB, comfortably
# inside a 1-2 GiB executor broadcast budget
_EDGE_BROADCAST_LIMIT = 5_000_000
# (degree, id) packing radix — vertex ids must stay below this.
# 1<<32 (ADVICE r09: 1<<20 silently collided just past SF100's 1M
# suppkeys): ids < 2^31 and degrees < 2^31 keep every packed key —
# d·2^32 + id and id1·2^32 + id2 — inside a signed 64-bit long, and
# the query RAISES if the materialized edge set ever exceeds the
# radix instead of corrupting counts.
_PACK = 1 << 32

_TRIANGLE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
p AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
),
e AS (SELECT u, v FROM p GROUP BY u, v HAVING COUNT(*) >= 3),
deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
  GROUP BY x
),
tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
         CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
  FROM deg
)
SELECT st.n_vertices,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       st.n_wedges,
       tri.n AS n_triangles,
       CAST(CASE WHEN st.n_wedges > 0
                 THEN (3 * tri.n * 1000000000) // st.n_wedges
                 ELSE 0 END AS BIGINT) AS transitivity_e9
FROM st CROSS JOIN tri
"""


@query("graph_triangle_count", sql=_TRIANGLE_SQL, tags=("graph",))
def graph_triangle_count(spark, sf_dir):
    """Triangle count + global transitivity over the CO-SUPPLIER
    graph (suppliers adjacent iff they co-occur in ≥ 3 orders — the
    market-basket projection; the purchase graph itself is bipartite
    and triangle-free).  The engine counts by DEGREE ORIENTATION
    (Chiba–Nishizeki / Schank–Wagner, public literature): orient each
    edge from its (degree, id)-smaller endpoint to the larger, pair
    out-neighbors, and close each wedge with one equi-join — work is
    O(Σ out_deg²) = O(m·α) where α is the arboricity, instead of the
    Σ deg² blowup a hub vertex causes under naive wedge generation.
    The count is strategy-independent, so the oracle verifies it with
    the simpler id-ordered triple join (a<b<c).

    Scale: edge building explodes per-order supplier pairs (bounded
    by order width, never corpus²); the wedge join shuffles on the
    wedge pivot and AQE splits skewed pivots.  All arithmetic is
    integer; transitivity is e9 integer division."""
    pairs = cosupplier_pairs_bucketed(spark, sf_dir)
    edges = (
        pairs.groupBy("u", "v").agg(F.count("*").alias("supp"))
        .where(F.col("supp") >= 3)
        .select("u", "v")
    )
    # the edge frame feeds FOUR consumers (degrees, orientation,
    # wedge closing, the edge count) — pin it once or Catalyst
    # re-derives the distinct + self-join per consumer (the PageRank
    # degree-frame lesson, PINNED.md); on a cluster this is the
    # persisted edge table ensure_edge_table builds
    edges = edges.localCheckpoint(eager=True)
    # one job yields BOTH the broadcast-gate count and the radix
    # guard: ids at/above _PACK would silently collide packed keys,
    # so fail loudly instead (ADVICE r09)
    _e = edges.agg(
        F.count("*").alias("n"), F.max(F.greatest("u", "v")).alias("maxid")
    ).first()
    ecnt = _e["n"]
    if _e["maxid"] is not None and _e["maxid"] >= _PACK:
        raise ValueError(
            f"graph_triangle_count: vertex id {_e['maxid']} exceeds the "
            f"(degree,id) packing radix {_PACK}; widen _PACK"
        )
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    # orient by (degree, id): src = smaller endpoint under that
    # order.  The (degree, id) order PACKS into one long — kt =
    # dt·_PACK + t (vertex ids < _PACK, guarded above) — so the hot
    # wedge comparison is a single long compare instead of a struct
    # compare, and the closing-edge join key packs the same way.
    ed = (
        edges.join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(
                    F.col("u").alias("s"),
                    (F.col("dv") * F.lit(_PACK) + F.col("v")).alias("kt"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("s"),
                    (F.col("du") * F.lit(_PACK) + F.col("u")).alias("kt"),
                )
            )
            .alias("o")
        )
        .select("o.s", "o.kt")
    )
    # explicit width for the wedge expansion: the oriented edge table
    # is SMALL (≲MBs), so AQE coalesces its shuffle to one partition —
    # and then the Σ out_deg² wedge blow-up runs single-threaded.  An
    # explicit repartition pins the expansion (the graph edge-table
    # 32-file lesson, PINNED.md) at the adjacency-derived width
    # (_wedge_width — ecnt oriented rows), and both self-join sides
    # share the partitioning, so no further exchange is inserted.
    ed = ed.repartition(_wedge_width(spark, ecnt), "s")
    w1, w2 = ed.alias("w1"), ed.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.s") == F.col("w2.s")) & (F.col("w1.kt") < F.col("w2.kt")),
    ).select(
        ((F.col("w1.kt") % _PACK) * F.lit(_PACK) + (F.col("w2.kt") % _PACK)).alias("bc")
    )
    closing = ed.select(
        ((F.col("s") * F.lit(_PACK)) + (F.col("kt") % _PACK)).alias("bc")
    )
    # the wedge set is the big intermediate (Σ out_deg² rows);
    # broadcasting the EDGE side keeps it map-side — wedges stream
    # through the closing join and into the partial count without
    # ever being exchanged.  Size-gated like BROADCAST_VERTEX_LIMIT:
    # past the gate it falls back to a shuffle join on bc.
    if ecnt <= _EDGE_BROADCAST_LIMIT:
        closing = F.broadcast(closing)
    tri = wedges.join(closing, "bc").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )
    stats = deg.agg(
        F.count("*").cast("bigint").alias("n_vertices"),
        # d·(d−1) is even; shiftright halves it in exact long math
        F.sum(F.shiftright(F.col("d") * (F.col("d") - 1), 1)).cast("bigint").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count("*").cast("bigint").alias("n_edges"))
    out = stats.crossJoin(n_edges).crossJoin(tri)
    # `div` is exact 64-bit integer division — the numerator can pass
    # 2^53 at scale, where a double floor(x/y) would lose ULPs against
    # the oracle's BIGINT `//`
    return out.withColumn(
        "__num", F.lit(3) * F.col("n_triangles") * F.lit(1000000000)
    ).select(
        "n_vertices",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(F.col("n_wedges") > 0, F.expr("__num div n_wedges"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("transitivity_e9"),
    )


# ---------------------------------------------------------------------------
# Label propagation communities (round 10)
# ---------------------------------------------------------------------------

# mode-packing radix for (count, label) argmax: labels must stay below
# this (packed vertex ids are 2·key+1 — fine to ~4·10^9 source keys);
# counts below 2^30 keep cnt·_LPA_M inside a signed long.
_LPA_M = 1 << 33
_LPA_ITERS = 3

_LPA_ITER_SQL_TMPL = """
c{k} AS (
  SELECT ee.u AS id, l.lbl, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ee JOIN lab{prev} l ON l.id = ee.v
  GROUP BY ee.u, l.lbl
),
lab{k} AS (
  SELECT id,
         CAST({M} - 1 - (MAX(cnt * {M} + ({M} - 1 - lbl)) % {M}) AS BIGINT) AS lbl
  FROM c{k} GROUP BY id
)
"""


def _lpa_sql() -> str:
    iters = "".join(
        "," + _LPA_ITER_SQL_TMPL.format(k=k, prev=k - 1, M=_LPA_M)
        for k in range(1, _LPA_ITERS + 1)
    )
    return f"""
WITH {_EDGE_SQL},
lab0 AS (SELECT DISTINCT u AS id, u AS lbl FROM ee)
{iters},
comm AS (
  SELECT lbl, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(MIN(id) AS BIGINT) AS min_member,
         CAST(MAX(id) AS BIGINT) AS max_member
  FROM lab{_LPA_ITERS} GROUP BY lbl
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_communities FROM comm)
SELECT c.lbl AS community, c.n_members, c.min_member, c.max_member, t.n_communities
FROM comm c CROSS JOIN tot t
ORDER BY c.n_members DESC, c.lbl
LIMIT 20
"""


def _check_lpa_radix(ee, stats: dict | None = None) -> None:
    """Loud radix guard (mirror of the triangle _PACK check above,
    ADVICE r10): labels start as vertex ids, so max(id) must stay
    below _LPA_M or the packed argmax keys silently collide; cnt is
    bounded by the max in-degree, which must stay below 2^30 to keep
    cnt·_LPA_M inside a signed long.  When the edge table's
    ingest-time stats sidecar carries max_id/max_degree (layout v4+),
    the guard is a pure dict lookup; otherwise one small job over the
    pinned edge frame (a per-source aggregate, then a 1-row reduce —
    a measured 1.5 s per invocation at sf0.1, which is why ingest
    now persists the maxima)."""
    if stats and "max_id" in stats and "max_degree" in stats:
        _g = {"maxid": stats["max_id"], "maxdeg": stats["max_degree"]}
    else:
        _g = (
            ee.groupBy("u")
            .agg(F.count("*").alias("d"), F.max("v").alias("mv"))
            .agg(
                F.max(F.greatest(F.col("u"), F.col("mv"))).alias("maxid"),
                F.max("d").alias("maxdeg"),
            )
            .first()
        )
    if _g["maxid"] is not None and _g["maxid"] >= _LPA_M:
        raise ValueError(
            f"graph_label_propagation: vertex id {_g['maxid']} exceeds the "
            f"(count,label) packing radix {_LPA_M}; widen _LPA_M"
        )
    if _g["maxdeg"] is not None and _g["maxdeg"] >= (1 << 30):
        raise ValueError(
            f"graph_label_propagation: neighbor count {_g['maxdeg']} exceeds "
            f"2^30; cnt*_LPA_M would overflow a signed long — widen the packing"
        )


@query("graph_label_propagation", sql=_lpa_sql(), tags=("graph",))
def graph_label_propagation(spark, sf_dir):
    """Synchronous label propagation communities (Raghavan et al.
    2007, public literature), 3 fixed iterations over the bipartite
    purchase graph: every vertex adopts the most frequent label among
    its neighbors, ties to the smallest label — made deterministic
    AND single-aggregation by packing the (count, label) argmax into
    one BIGINT: enc = cnt·M + (M−1−lbl), new label = M−1−(max(enc)
    mod M).  Emits the 20 largest communities plus the community
    count; the oracle re-runs all three iterations from the raw
    edges.

    Scale: each iteration is ONE equi-join (edges ⋈ labels on the
    neighbor key) + one two-key hash aggregation — the classic
    Pregel-in-SQL shape that parallelizes on the vertex key.  Each
    label frame feeds exactly ONE consumer (the next round), so the
    3 unrolled rounds stay in ONE shallow Catalyst plan — the
    PageRank discipline, not the BFS pin-per-round one (interleaved
    A/B ×3 at sf0.1: one-plan 3.4/3.5/3.4 s vs per-round eager pins
    4.6/4.1 s warm — pins are pure materialization overhead when
    nothing re-reads the frame; PINNED.md).  As the round count
    grows the plan deepens linearly and a periodic pin becomes the
    right lineage cut — the same trade PageRank documents.  Fixed
    iteration count keeps the plan static; a convergence-driven
    variant would check the per-round label-change count (one extra
    agg) and stop — same per-round plan."""
    ee, stats = _edges_count_stats(spark, sf_dir)
    _check_lpa_radix(ee, stats)
    n_v = stats.get("n_vertices")
    if n_v is None:
        n_v = count_vertices(ee)
    # Label frames are VERTEX-bounded — under the broadcast gate each
    # round's join is map-side (the PageRank _vertex_gate discipline;
    # previously LPA shuffle-joined the 1.17M-row edge frame against
    # the 16k-row label frame every round).  With the join map-side,
    # clustering the edge frame by the AGGREGATION key u makes the
    # per-round (u, lbl) partial aggregate partition-exact: partials
    # from one u never split across tasks, so the two-level argmax
    # agg shuffles the global distinct (u, lbl) set once instead of
    # per-partition duplicates (guide §2.3 "aggregate before you
    # shuffle" — measured 2.65 → 1.9 s for the 3 rounds at sf0.1).
    # Past the gate the rounds revert to shuffle joins on v, where a
    # u-clustered layout buys nothing — gate both together.  Width =
    # the pin's rows-adaptive width (see _edges_count_stats), not the
    # core count.
    if n_v <= BROADCAST_VERTEX_LIMIT:
        ee = ee.repartition(ee.rdd.getNumPartitions(), "u")
    lab = ee.select(F.col("u").alias("id")).distinct().select(
        "id", F.col("id").alias("lbl")
    )
    for _k in range(_LPA_ITERS):
        cnts = (
            ee.join(
                _vertex_gate(
                    lab.withColumnRenamed("id", "v"), n_v, BROADCAST_VERTEX_LIMIT
                ),
                "v",
            )
            .groupBy("u", "lbl")
            .agg(F.count("*").cast("bigint").alias("cnt"))
        )
        lab = (
            cnts.groupBy("u")
            .agg(
                (
                    F.lit(_LPA_M)
                    - 1
                    - (
                        F.max(
                            F.col("cnt") * F.lit(_LPA_M)
                            + (F.lit(_LPA_M) - 1 - F.col("lbl"))
                        )
                        % F.lit(_LPA_M)
                    )
                )
                .cast("bigint")
                .alias("lbl")
            )
            .withColumnRenamed("u", "id")
        )
    comm = lab.groupBy("lbl").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.min("id").cast("bigint").alias("min_member"),
        F.max("id").cast("bigint").alias("max_member"),
    )
    tot = comm.agg(F.count("*").cast("bigint").alias("n_communities"))
    return (
        comm.crossJoin(F.broadcast(tot))
        .select(
            F.col("lbl").alias("community"),
            "n_members",
            "min_member",
            "max_member",
            "n_communities",
        )
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# k-core decomposition by iterative peeling (round 11)
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 3

_KCORE_ROUND_SQL_TMPL = """
deg{r} AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM g{p} GROUP BY u),
keep{r} AS (SELECT u FROM deg{r} WHERE d >= {K}),
g{r} AS (
  SELECT g.u, g.v FROM g{p} g
  JOIN keep{r} a ON a.u = g.u
  JOIN keep{r} b ON b.u = g.v
)"""


def _kcore_sql() -> str:
    rounds = "".join(
        "," + _KCORE_ROUND_SQL_TMPL.format(r=r, p=r - 1, K=_KCORE_K)
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    legs = " UNION ALL ".join(
        f"""
SELECT {r} AS round,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM keep{r}) AS n_vertices,
       (SELECT CAST(COUNT(*) // 2 AS BIGINT) FROM g{r}) AS n_edges"""
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    return f"""
WITH {_EDGE_SQL},
g0 AS (SELECT u, v FROM ee)
{rounds}
SELECT round, n_vertices, n_edges FROM ({legs})
ORDER BY round
"""


@query("graph_kcore_peel", sql=_kcore_sql(), tags=("graph",))
def graph_kcore_peel(spark, sf_dir):
    """k-core decomposition by iterative peeling (Seidman 1983, public
    literature), k = {k}, {n} fixed rounds: each round drops every
    vertex whose CURRENT degree is below k, then restricts the edge
    set to surviving endpoints — the classic community-density filter
    a data pipeline uses to find the dense interaction core (spam
    rings, power-user subgraphs).  Emits per round the surviving
    vertex and undirected-edge counts; a fixpoint shows as equal
    consecutive rows.  The oracle re-runs all rounds as chained CTEs.

    Scale: each round is one hash aggregation (degrees) + a semi-
    join-shaped double equi-join restricting edges to kept endpoints —
    all vertex-key-partitioned, no global structure.  The kept-vertex
    frame feeds two join legs and the count, and each round's edge
    frame feeds the next round — both pinned, so every round runs
    once (the BFS pin-per-round discipline; rounds shrink the data,
    so pins are cheap and the plan stays shallow)."""
    from trafik_etl_modular_spark.operators.pinning import pin

    ee, _ = _edges_and_count(spark, sf_dir)
    g = ee
    out = None
    for r in range(1, _KCORE_ROUNDS + 1):
        deg = g.groupBy("u").agg(F.count("*").cast("bigint").alias("d"))
        keep = pin(deg.where(F.col("d") >= _KCORE_K).select("u"), eager=True)
        g = pin(
            g.join(keep, "u")
            .join(keep.withColumnRenamed("u", "v"), "v")
            .select("u", "v"),
            eager=True,
        )
        stats = (
            keep.agg(F.count("*").cast("bigint").alias("n_vertices"))
            .crossJoin(
                g.agg(
                    F.expr("CAST(COUNT(*) div 2 AS BIGINT)").alias("n_edges")
                )
            )
            .select(F.lit(r).alias("round"), "n_vertices", "n_edges")
        )
        out = stats if out is None else out.unionAll(stats)
    return out.orderBy("round")


graph_kcore_peel.__doc__ = graph_kcore_peel.__doc__.format(
    k=_KCORE_K, n=_KCORE_ROUNDS
)


# ---------------------------------------------------------------------------
# HITS hubs & authorities (round 11)
# ---------------------------------------------------------------------------

_HITS_TOP = 20

_HITS_SQL = f"""
WITH {_EDGE_SQL},
de AS (SELECT u AS c, v AS s FROM ee WHERE u % 2 = 0),
a1 AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS auth1 FROM de GROUP BY s),
h1 AS (
  SELECT de.c, CAST(SUM(a1.auth1) AS BIGINT) AS hub1
  FROM de JOIN a1 ON a1.s = de.s GROUP BY de.c
),
a2 AS (
  SELECT de.s, CAST(SUM(h1.hub1) AS BIGINT) AS auth2
  FROM de JOIN h1 ON h1.c = de.c GROUP BY de.s
),
ranked AS (
  SELECT CAST((a2.s - 1) // 2 AS BIGINT) AS suppkey, a1.auth1, a2.auth2,
         CAST(ROW_NUMBER() OVER (ORDER BY a2.auth2 DESC, a2.s) AS INTEGER) AS rk
  FROM a2 JOIN a1 ON a1.s = a2.s
)
SELECT rk, suppkey, auth1, auth2 FROM ranked WHERE rk <= {_HITS_TOP}
ORDER BY rk
"""


@query("graph_hits_scores", sql=_HITS_SQL, tags=("graph",))
def graph_hits_scores(spark, sf_dir):
    """HITS hubs & authorities (Kleinberg 1999, public literature),
    two UNNORMALIZED power-iteration steps over the DIRECTED purchase
    graph (customer → supplier; the symmetric edge table's even-id
    side recovers direction): auth₁ = in-degree, hub₁(c) = Σ auth₁ of
    c's suppliers, auth₂(s) = Σ hub₁ of s's customers.  Skipping the
    per-step L2 normalization keeps every score an exact BIGINT (the
    float-hazard rule — normalization only rescales, so rankings are
    identical) — the same trick as the lift-vs-PMI ranking.  Emits the
    top-{_HITS_TOP} suppliers by 2-step authority with deterministic
    tiebreak.

    Scale: each half-step is one equi-join (edges ⋈ scores on the
    vertex key) + one hash aggregation — the Pregel-in-SQL shape; the
    directed-edge frame feeds all three legs and is pinned once.
    Score growth is bounded by (max degree)² per double-step, so
    BIGINT holds to ~10^5 average degree at 10^9 edges; past that the
    same plan runs in DECIMAL(38,0)."""
    from trafik_etl_modular_spark.operators.pinning import pin

    ee, _ = _edges_and_count(spark, sf_dir)
    de = pin(
        ee.where(F.col("u") % 2 == 0).select(
            F.col("u").alias("c"), F.col("v").alias("s")
        ),
        eager=True,
    )
    a1 = de.groupBy("s").agg(F.count("*").cast("bigint").alias("auth1"))
    h1 = (
        de.join(a1, "s")
        .groupBy("c")
        .agg(F.sum("auth1").cast("bigint").alias("hub1"))
    )
    a2 = (
        de.join(h1, "c")
        .groupBy("s")
        .agg(F.sum("hub1").cast("bigint").alias("auth2"))
    )
    from pyspark.sql import Window as W

    # distributed top-k FIRST (TakeOrderedAndProject — per-partition
    # heaps, never a global sort over the supplier dimension), THEN
    # the rank window over the surviving {_HITS_TOP} rows
    top = (
        a2.join(a1, "s")
        .orderBy(F.desc("auth2"), "s")
        .limit(_HITS_TOP)
    )
    ranked = top.select(
        F.expr("CAST((s - 1) div 2 AS BIGINT)").alias("suppkey"),
        "auth1",
        "auth2",
        F.row_number()
        .over(W.orderBy(F.desc("auth2"), "s"))
        .cast("int")
        .alias("rk"),
    )
    return ranked.select("rk", "suppkey", "auth1", "auth2").orderBy("rk")


# ---------------------------------------------------------------------------
# Common-neighbor link prediction (round 11)
# ---------------------------------------------------------------------------

_LINKPRED_TOP = 20
# edge rule: co-occurrence STRICTLY above the exact P75 of the pair-
# count distribution.  A fixed absolute threshold cannot be scale-
# robust here (the co-supplier graph at threshold ≥3 is COMPLETE at
# sf≤0.01 — zero non-adjacent candidates — while at sf0.1 the median
# pair co-occurs only twice); the exact order statistic adapts to the
# distribution and stays a deterministic integer both engines compute
# identically (the agg_exact_percentile_grid trick).
_LINKPRED_PCT = 75

_LINKPRED_SQL = f"""
WITH p AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pr AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM p a JOIN p b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY a.l_suppkey, b.l_suppkey
),
hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS f FROM pr GROUP BY c),
cum AS (
  SELECT c, SUM(f) OVER (ORDER BY c) AS cf,
         (SELECT SUM(f) FROM hist) AS n
  FROM hist
),
thr AS (SELECT MIN(c) AS t FROM cum WHERE cf >= (n * {_LINKPRED_PCT} + 99) // 100),
e AS (SELECT u, v FROM pr CROSS JOIN thr WHERE c > thr.t),
sym AS (SELECT u AS s, v AS t FROM e UNION ALL SELECT v AS s, u AS t FROM e),
cn AS (
  SELECT a.t AS pa, b.t AS pb, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sym a JOIN sym b ON a.s = b.s AND a.t < b.t
  GROUP BY a.t, b.t
),
cand AS (
  SELECT c.pa, c.pb, c.n_common
  FROM cn c LEFT JOIN e ON e.u = c.pa AND e.v = c.pb
  WHERE e.u IS NULL
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand),
ranked AS (
  SELECT pa, pb, n_common,
         CAST(ROW_NUMBER() OVER (ORDER BY n_common DESC, pa, pb) AS INTEGER) AS rk
  FROM cand
)
SELECT r.rk, r.pa AS supp_a, r.pb AS supp_b, r.n_common, t.n_candidates
FROM ranked r CROSS JOIN tot t
WHERE r.rk <= 20
ORDER BY r.rk
"""


@query("graph_common_neighbor_linkpred", sql=_LINKPRED_SQL, tags=("graph",))
def graph_common_neighbor_linkpred(spark, sf_dir):
    """Common-neighbors link prediction (Liben-Nowell & Kleinberg
    2003, public literature) over the co-supplier projection the
    triangle counter also uses: for every NON-adjacent supplier pair,
    count shared market-basket neighbors — the classic
    "who should be connected next" score, integer-exact (Adamic-Adar's
    1/log dampening is a float hazard; raw counts rank the head the
    same way).  Emits the top-20 predicted links plus the candidate
    count; the oracle re-derives projection, threshold, wedges, and
    the adjacency exclusion.  The edge rule keeps pairs co-occurring
    STRICTLY above the exact P75 order statistic (module constant
    note): a fixed absolute cut is not scale-robust on this graph.

    Scale: wedge enumeration is the triangle counter's Σ deg² self-
    join on the middle vertex (same budget — this is triangles'
    sibling, sharing the orientation trick's economics); the
    adjacency exclusion is one anti join on the (pa, pb) key; the
    head is a distributed top-k.  The edge frame is pinned and feeds
    both the wedge sides and the exclusion."""
    from trafik_etl_modular_spark.operators.pinning import pin

    pr = cosupplier_pairs_bucketed(spark, sf_dir)
    counts = pin(
        pr.groupBy("u", "v").agg(F.count("*").cast("bigint").alias("c")),
        eager=True,
    )
    # exact P75 threshold via HISTOGRAM selection: the pair-count
    # VALUES are small integers, so selection runs over the counts-of-
    # counts frame (|distinct c| rows — dozens) instead of ranking all
    # |pairs| rows through one global sort.  One hash agg + one tiny
    # cumulative window: the k-th smallest is the first value whose
    # cumulative frequency reaches k.
    from pyspark.sql import Window as W

    hist = counts.groupBy("c").agg(F.count("*").cast("bigint").alias("f"))
    cum = hist.select(
        "c",
        F.sum("f")
        .over(W.orderBy("c").rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cf"),
    ).crossJoin(
        F.broadcast(hist.agg(F.sum("f").cast("bigint").alias("n")))
    )
    thr = cum.where(
        F.col("cf") >= F.expr(f"(n * {_LINKPRED_PCT} + 99) div 100")
    ).agg(F.min("c").alias("t"))
    e = pin(
        counts.crossJoin(F.broadcast(thr))
        .where(F.col("c") > F.col("t"))
        .select("u", "v"),
        eager=True,
    )
    sym = e.select(F.col("u").alias("s"), F.col("v").alias("t")).unionAll(
        e.select(F.col("v").alias("s"), F.col("u").alias("t"))
    )
    # pin + explicit width for the wedge expansion (the triangle
    # counter's repartition lesson: AQE coalesces the tiny symmetric
    # frame to one partition and the deg² blow-up runs single-threaded);
    # width derived from the pinned adjacency rows, not the core count
    sym = pin(sym, eager=True)
    sym = sym.repartition(_wedge_width(spark, sym.count()), "s")
    w1, w2 = sym.alias("w1"), sym.alias("w2")
    cn = (
        w1.join(
            w2,
            (F.col("w1.s") == F.col("w2.s")) & (F.col("w1.t") < F.col("w2.t")),
        )
        .groupBy(F.col("w1.t").alias("pa"), F.col("w2.t").alias("pb"))
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    cand = pin(
        cn.join(
            e.withColumnRenamed("u", "pa").withColumnRenamed("v", "pb"),
            ["pa", "pb"],
            "left_anti",
        ),
        eager=True,
    )
    tot = cand.agg(F.count("*").cast("bigint").alias("n_candidates"))
    top = cand.orderBy(F.desc("n_common"), "pa", "pb").limit(_LINKPRED_TOP)
    from pyspark.sql import Window as W

    ranked = top.select(
        F.row_number()
        .over(W.orderBy(F.desc("n_common"), "pa", "pb"))
        .cast("int")
        .alias("rk"),
        F.col("pa").alias("supp_a"),
        F.col("pb").alias("supp_b"),
        "n_common",
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select("rk", "supp_a", "supp_b", "n_common", "n_candidates")
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# Degree assortativity (round 11)
# ---------------------------------------------------------------------------

_ASSORT_SQL = f"""
WITH {_EDGE_SQL},
deg AS (SELECT u AS x, CAST(COUNT(*) AS BIGINT) AS d FROM ee GROUP BY u),
pairs AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM ee JOIN deg du ON du.x = ee.u JOIN deg dv ON dv.x = ee.v
),
m AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(dx) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(dy) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(dx * dx) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(dy * dy) AS DECIMAL(38,0)) AS syy,
         CAST(SUM(dx * dy) AS DECIMAL(38,0)) AS sxy
  FROM pairs
),
nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices FROM deg)
SELECT nv.n_vertices,
       CAST(m.n AS BIGINT) AS n_directed_edges,
       (CAST(ROUND((CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
         / sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)
                * CAST(m.n * m.syy - m.sy * m.sy AS DOUBLE))) * 1e9) AS BIGINT) / 1e9)
         AS assortativity_q
FROM m CROSS JOIN nv
"""


@query("graph_degree_assortativity", sql=_ASSORT_SQL, tags=("graph", "analytics"))
def graph_degree_assortativity(spark, sf_dir):
    """Degree assortativity coefficient (Newman 2002, public
    literature): the Pearson correlation of endpoint degrees over the
    directed-edge list (the symmetric table counts each undirected
    edge in both orientations — exactly Newman's summation).  Negative
    on this bipartite purchase graph (hubs attach to leaves), positive
    on social graphs — the one-number mixing diagnostic.  Computed
    with the exact-integer-moment recipe (degrees are BIGINTs, all
    six moments exact DECIMAL(38,0), doubles only in the final
    divide/sqrt, e9-quantized).

    Scale: one degree aggregation + two vertex-key equi-joins
    decorating each edge with its endpoint degrees (the triangle
    counter's first stage), then ONE map-side-combined moment pass —
    no windows, no global sorts, output is 1 row."""
    from pyspark.sql import types as T

    from trafik_etl_modular_spark.functions.scalars import fquant
    from trafik_etl_modular_spark.operators.pinning import pin

    ee, _ = _edges_and_count(spark, sf_dir)
    deg = pin(
        ee.groupBy("u").agg(F.count("*").cast("bigint").alias("d")), eager=True
    )
    pairs = (
        ee.join(deg.withColumnRenamed("u", "__u").withColumnRenamed("d", "dx"),
                F.col("u") == F.col("__u"))
        .join(deg.withColumnRenamed("u", "__v").withColumnRenamed("d", "dy"),
              F.col("v") == F.col("__v"))
        .select("dx", "dy")
    )
    dec = T.DecimalType(38, 0)
    m = pairs.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("dx").cast(dec).alias("sx"),
        F.sum("dy").cast(dec).alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast(dec).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast(dec).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast(dec).alias("sxy"),
    )
    nv = deg.agg(F.count("*").cast("bigint").alias("n_vertices"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.crossJoin(F.broadcast(nv)).select(
        "n_vertices",
        F.col("n").cast("bigint").alias("n_directed_edges"),
        fquant(num / F.sqrt(dx * dy)).alias("assortativity_q"),
    )


# ---------------------------------------------------------------------------
# Per-vertex local clustering coefficient (round 12)
# ---------------------------------------------------------------------------

_LCC_TOP = 20

_LCC_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
p AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
),
e AS (SELECT u, v FROM p GROUP BY u, v HAVING COUNT(*) >= 3),
deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
  GROUP BY x
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
tv AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS t
  FROM (SELECT x AS w FROM tri UNION ALL SELECT y AS w FROM tri
        UNION ALL SELECT z AS w FROM tri)
  GROUP BY w
)
SELECT d.x AS vertex, d.d AS degree,
       CAST(COALESCE(tv.t, 0) AS BIGINT) AS n_triangles,
       CAST((2 * COALESCE(tv.t, 0) * 1000000) // (d.d * (d.d - 1)) AS BIGINT)
         AS clustering_e6
FROM deg d LEFT JOIN tv ON tv.w = d.x
WHERE d.d >= 2
ORDER BY clustering_e6 DESC, vertex
LIMIT {_LCC_TOP}
"""


@query("graph_local_clustering", sql=_LCC_SQL, tags=("graph", "topk"))
def graph_local_clustering(spark, sf_dir):
    """PER-VERTEX local clustering coefficient over the co-supplier
    graph (Watts–Strogatz 1998, public literature): c_v =
    2·T_v / (d_v(d_v−1)) — how close each vertex's neighborhood is to
    a clique, the node-level refinement of graph_triangle_count's
    single global transitivity (a graph can have high transitivity
    driven by a few dense pockets; the per-vertex view finds them).
    The engine enumerates each triangle ONCE by DEGREE ORIENTATION
    (the triangle counter's Chiba–Nishizeki machinery — O(m·α) wedges
    instead of the Σ deg² a naive id-oriented triple join pays;
    measured 12.2 s → ~2.5 s at sf0.1) and credits its three corners;
    the corner MULTISET is strategy-independent, so the oracle
    verifies with the simpler id-ordered join.  The coefficient is e6
    integer division (quotient ≤ 1e6 by c ≤ 1).  Top-{top} vertices
    with degree ≥ 2, deterministic tiebreak.

    Scale: same bounded shapes as the triangle query — per-order
    supplier pairs (order-width-bounded), oriented wedge join closed
    map-side under the edge-broadcast gate; the per-corner credit is
    an explode of the triangle set; degrees and the final join are
    vertex-bounded; the head is a distributed top-k."""
    pairs = cosupplier_pairs(t(spark, sf_dir, "lineitem"))
    edges = (
        pairs.groupBy("u", "v")
        .agg(F.count("*").alias("supp"))
        .where(F.col("supp") >= 3)
        .select("u", "v")
    )
    # feeds degrees + the orientation + the closing join — pin once
    edges = edges.localCheckpoint(eager=True)
    _e = edges.agg(
        F.count("*").alias("n"), F.max(F.greatest("u", "v")).alias("maxid")
    ).first()
    if _e["maxid"] is not None and _e["maxid"] >= _PACK:
        raise ValueError(
            f"graph_local_clustering: vertex id {_e['maxid']} exceeds the "
            f"(degree,id) packing radix {_PACK}; widen _PACK"
        )
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    deg = deg.localCheckpoint(eager=True)  # feeds orientation + output
    ed = (
        edges.join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(
                    F.col("u").alias("s"),
                    (F.col("dv") * F.lit(_PACK) + F.col("v")).alias("kt"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("s"),
                    (F.col("du") * F.lit(_PACK) + F.col("u")).alias("kt"),
                )
            )
            .alias("o")
        )
        .select("o.s", "o.kt")
    )
    ed = ed.repartition(32, "s")  # the triangle counter's width pin
    w1, w2 = ed.alias("w1"), ed.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.s") == F.col("w2.s")) & (F.col("w1.kt") < F.col("w2.kt")),
    ).select(
        F.col("w1.s").alias("x"),
        (F.col("w1.kt") % _PACK).alias("y"),
        (F.col("w2.kt") % _PACK).alias("z"),
        (
            (F.col("w1.kt") % _PACK) * F.lit(_PACK) + (F.col("w2.kt") % _PACK)
        ).alias("bc"),
    )
    closing = ed.select(
        ((F.col("s") * F.lit(_PACK)) + (F.col("kt") % _PACK)).alias("bc")
    )
    if _e["n"] <= _EDGE_BROADCAST_LIMIT:
        closing = F.broadcast(closing)
    tri = wedges.join(closing, "bc").select("x", "y", "z")
    corners = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("t"))
    )
    z = F.lit(0).cast("bigint")
    return (
        deg.where(F.col("d") >= 2)
        .join(corners, deg["x"] == corners["w"], "left")
        .select(
            F.col("x").alias("vertex"),
            F.col("d").alias("degree"),
            F.coalesce("t", z).alias("n_triangles"),
            F.expr(
                "CAST((2 * COALESCE(t, 0) * 1000000) div (d * (d - 1)) AS BIGINT)"
            ).alias("clustering_e6"),
        )
        .orderBy(F.desc("clustering_e6"), F.asc("vertex"))
        .limit(_LCC_TOP)
    )


# ---------------------------------------------------------------------------
# Jaccard link prediction (round 12)
# ---------------------------------------------------------------------------

_JACC_SQL = f"""
WITH p AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pr AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM p a JOIN p b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY a.l_suppkey, b.l_suppkey
),
hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS f FROM pr GROUP BY c),
cum AS (
  SELECT c, SUM(f) OVER (ORDER BY c) AS cf,
         (SELECT SUM(f) FROM hist) AS n
  FROM hist
),
thr AS (SELECT MIN(c) AS t FROM cum WHERE cf >= (n * {_LINKPRED_PCT} + 99) // 100),
e AS (SELECT u, v FROM pr CROSS JOIN thr WHERE c > thr.t),
sym AS (SELECT u AS s, t FROM (SELECT u, v AS t FROM e UNION ALL SELECT v AS u, u AS t FROM e) q(u, t)),
deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY s),
cn AS (
  SELECT a.t AS pa, b.t AS pb, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sym a JOIN sym b ON a.s = b.s AND a.t < b.t
  GROUP BY a.t, b.t
),
cand AS (
  SELECT c.pa, c.pb, c.n_common
  FROM cn c LEFT JOIN e ON e.u = c.pa AND e.v = c.pb
  WHERE e.u IS NULL
),
scored AS (
  SELECT c.pa, c.pb, c.n_common, da.d AS deg_a, db.d AS deg_b,
         CAST((c.n_common * 1000000) // (da.d + db.d - c.n_common) AS BIGINT)
           AS jaccard_e6
  FROM cand c JOIN deg da ON da.s = c.pa JOIN deg db ON db.s = c.pb
),
ranked AS (
  SELECT pa, pb, n_common, deg_a, deg_b, jaccard_e6,
         CAST(ROW_NUMBER() OVER (ORDER BY jaccard_e6 DESC, pa, pb) AS INTEGER)
           AS rk
  FROM scored
)
SELECT rk, pa AS supp_a, pb AS supp_b, n_common, deg_a, deg_b, jaccard_e6
FROM ranked
WHERE rk <= {{top}}
ORDER BY rk
""".format(top=20)


@query("graph_jaccard_linkpred", sql=_JACC_SQL, tags=("graph", "topk"))
def graph_jaccard_linkpred(spark, sf_dir):
    """JACCARD link prediction over the co-supplier projection — the
    degree-normalized sibling of graph_common_neighbor_linkpred:
    J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)| demotes the hub pairs that
    raw common-neighbor counts promote (two hubs share many
    neighbors by mass alone; Jaccard asks what FRACTION of their
    combined neighborhood is shared — the normalization MinHash
    estimates, computed exactly here).  Same exact-P75 edge rule
    (scale-robust threshold), same wedge machinery; the score is the
    pure integer rational (∩·10⁶) div (d_u + d_v − ∩).  Top-20
    non-adjacent pairs, deterministic tiebreak.

    Scale: identical budget to the common-neighbor query plus one
    vertex-bounded degree join; the head is a distributed top-k."""
    from pyspark.sql import Window as W

    pr = (
        cosupplier_pairs_bucketed(spark, sf_dir)
        .groupBy("u", "v")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    pr = pin(pr, eager=True)  # feeds the histogram AND the edge cut
    hist = pr.groupBy("c").agg(F.count("*").cast("bigint").alias("f"))
    wc = W.orderBy("c").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.select(
        "c",
        F.sum("f").over(wc).alias("cf"),
        F.sum("f").over(W.partitionBy()).alias("n"),
    )
    thr = cum.where(
        F.col("cf") >= F.expr(f"(n * {_LINKPRED_PCT} + 99) div 100")
    ).agg(F.min("c").alias("t"))
    e = pin(
        pr.crossJoin(F.broadcast(thr)).where(F.col("c") > F.col("t")).select("u", "v"),
        eager=True,  # feeds sym (twice), the adjacency exclusion
    )
    sym = e.select(F.col("u").alias("s"), F.col("v").alias("t")).unionAll(
        e.select(F.col("v").alias("s"), F.col("u").alias("t"))
    )
    # pin + explicit width (the triangle counter's repartition lesson:
    # AQE coalesces the tiny symmetric frame to ONE partition and the
    # deg² wedge blow-up runs single-threaded without this); width
    # derived from the pinned adjacency rows, not the core count
    sym = pin(sym, eager=True)
    sym = sym.repartition(_wedge_width(spark, sym.count()), "s")
    deg = sym.groupBy("s").agg(F.count("*").cast("bigint").alias("d"))
    sa, sb = sym.alias("sa"), sym.alias("sb")
    cn = (
        sa.join(
            sb,
            (F.col("sa.s") == F.col("sb.s")) & (F.col("sa.t") < F.col("sb.t")),
        )
        .groupBy(F.col("sa.t").alias("pa"), F.col("sb.t").alias("pb"))
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    cand = cn.join(
        e, (e["u"] == cn["pa"]) & (e["v"] == cn["pb"]), "left_anti"
    )
    scored = (
        cand.join(deg.withColumnRenamed("d", "deg_a"), cand["pa"] == deg["s"])
        .drop("s")
        .join(
            deg.withColumnRenamed("d", "deg_b").withColumnRenamed("s", "s2"),
            F.col("pb") == F.col("s2"),
        )
        .drop("s2")
        .select(
            "pa",
            "pb",
            "n_common",
            "deg_a",
            "deg_b",
            F.expr(
                "CAST((n_common * 1000000) div (deg_a + deg_b - n_common)"
                " AS BIGINT)"
            ).alias("jaccard_e6"),
        )
    )
    top = scored.orderBy(F.desc("jaccard_e6"), "pa", "pb").limit(20)
    return (
        top.select(
            F.row_number()
            .over(W.orderBy(F.desc("jaccard_e6"), "pa", "pb"))
            .cast("int")
            .alias("rk"),
            F.col("pa").alias("supp_a"),
            F.col("pb").alias("supp_b"),
            "n_common",
            "deg_a",
            "deg_b",
            "jaccard_e6",
        )
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# Personalized PageRank from a seed panel (round 12)
# ---------------------------------------------------------------------------

# Seed panel: customers 1-5 (vertex ids custkey*2) — the "given these
# known-good accounts, who else matters?" query.
_PPR_SEEDS = tuple(c * 2 for c in range(1, 6))
_PPR_ROUNDS = 3

_PPR_ITER = """
r{next} AS (
  SELECT d.u, d.deg,
         CAST(0.85 AS DOUBLE) * COALESCE(s.s, CAST(0 AS DOUBLE))
         + CASE WHEN d.u IN {seeds}
                THEN CAST(0.15 AS DOUBLE) / CAST({ns} AS DOUBLE)
                ELSE CAST(0 AS DOUBLE) END AS rank
  FROM deg d
  LEFT JOIN (
    SELECT ee.v, {dsum} AS s
    FROM ee JOIN r{prev} r ON ee.u = r.u
    GROUP BY ee.v
  ) s ON s.v = d.u
)"""

_PPR_SQL = (
    f"WITH {_EDGE_SQL},\n"
    "deg AS (SELECT u, COUNT(*) AS deg FROM ee GROUP BY u),\n"
    f"r0 AS (SELECT u, deg, CASE WHEN u IN {_PPR_SEEDS} THEN\n"
    f"         CAST(1.0 AS DOUBLE) / CAST({len(_PPR_SEEDS)} AS DOUBLE)\n"
    "         ELSE CAST(0 AS DOUBLE) END AS rank FROM deg),"
    + ",".join(
        _PPR_ITER.format(
            next=i + 1,
            prev=i,
            dsum=_PR_DSUM,
            seeds=_PPR_SEEDS,
            ns=len(_PPR_SEEDS),
        )
        for i in range(_PPR_ROUNDS)
    )
    + f"""
SELECT u AS vertex_id,
       CASE WHEN u % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       (u IN {_PPR_SEEDS}) AS is_seed,
       (CAST(ROUND(rank * 1e9) AS BIGINT) / 1e9) AS rank_q
FROM r{_PPR_ROUNDS} ORDER BY rank DESC, u LIMIT 20
"""
)


@query("graph_personalized_pagerank", sql=_PPR_SQL, tags=("graph",))
def graph_personalized_pagerank(spark, sf_dir):
    """PERSONALIZED PageRank (Page et al. 1999 §6; the random walk
    with restart of Tong–Faloutsos–Pan 2006): identical damped power
    iteration to graph_pagerank_3iter, except the 0.15 restart mass
    teleports ONLY to a 5-customer seed panel — "given these
    known-good accounts, rank everything by proximity to them", the
    recommendation / fraud-neighborhood primitive global PageRank
    cannot answer.  Differences from the global recipe, both
    load-bearing: rank init is 1/|S| on seeds (0 elsewhere), and the
    per-round join is a LEFT join with COALESCE(s, 0) — a vertex with
    no inbound mass this round must keep its restart share rather
    than drop out (global PR's inner join is only sound because every
    vertex gets 1-ε·n⁻¹ mass unconditionally).  Contributions ride
    the proven fquant-snap + DECIMAL(38,15) dsum, so partition-
    parallel sums are bit-identical cross-engine.

    Scale: per round ONE edge scan + one map-side-combined (v, c)
    shuffle; rank/degree frames are vertex-bounded and broadcast
    under the same gate as PageRank; 3 unrolled rounds = one shallow
    Catalyst plan.  Seed-restricted restart does not change the
    shuffle shape — only the init and the restart literal."""
    ee, n_v = _edges_and_count(spark, sf_dir)
    if n_v is None:
        n_v = count_vertices(ee)
    deg = (
        ee.groupBy("u").agg(F.count("*").alias("deg")).localCheckpoint(eager=True)
    )
    ns = len(_PPR_SEEDS)
    seed = F.col("u").isin(list(_PPR_SEEDS))
    r = deg.select(
        "u",
        "deg",
        F.when(seed, F.lit(1.0) / F.lit(float(ns))).otherwise(F.lit(0.0)).alias(
            "rank"
        ),
    )
    for _ in range(_PPR_ROUNDS):
        # Long-scaled exact contribution sums, snapped once per vertex
        # in the gated projection — see the equivalence-chain comment
        # in :func:`pagerank`; identical output verified row-for-row
        # against the DECIMAL(38,15) formulation at sf0.1.
        contrib = ee.join(
            _vertex_gate(
                r.select(
                    "u",
                    F.round((F.col("rank") / F.col("deg")) * F.lit(1e15))
                    .cast("bigint")
                    .alias("ck"),
                ),
                n_v,
                BROADCAST_VERTEX_LIMIT,
            ),
            "u",
        ).select("v", "ck")
        summed = contrib.groupBy("v").agg(
            (F.sum("ck").cast("double") / F.lit(1e15)).alias("s")
        )
        r = (
            deg.join(
                _vertex_gate(summed, n_v, BROADCAST_VERTEX_LIMIT),
                deg.u == summed.v,
                "left",
            )
            .select(
                deg.u.alias("u"),
                "deg",
                (
                    F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))
                    + F.when(
                        seed, F.lit(0.15) / F.lit(float(ns))
                    ).otherwise(F.lit(0.0))
                ).alias("rank"),
            )
        )
    return (
        r.orderBy(F.desc("rank"), F.asc("u"))
        .limit(20)
        .select(
            F.col("u").alias("vertex_id"),
            F.when(F.col("u") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            F.col("u").isin(list(_PPR_SEEDS)).alias("is_seed"),
            (
                F.round(F.col("rank") * F.lit(1e9)).cast("bigint").cast("double")
                / F.lit(1e9)
            ).alias("rank_q"),
        )
    )
