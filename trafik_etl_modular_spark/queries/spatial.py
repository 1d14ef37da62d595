"""Spatial radius self-join via grid bucketing.

The reference's geo surface is point-lookup shaped (county centroid
join, coordinate imputation — queries/incidents.py); this module adds
the BIG-BIG spatial shape those can't express: "all pairs of points
within distance r", the spatial analog of banded LSH.  The standard
scale technique (Zhang et al., Simba 2016; PostGIS ST_DWithin plans —
public literature) is grid bucketing: with cell size = r, any pair
within r is at most one cell apart, so candidates reduce to an
EQUI-JOIN of each point's cell against its 3×3 neighborhood and the
exact distance predicate only runs inside matched cells — never an
all-pairs cross join.

The fixture has no coordinate table, so points are DERIVED from
events with neutral-hash coordinates (functions/neutral_hash.py —
identical md5 arithmetic on both engines; a linear-congruential
derivation was tried first and produced ZERO close pairs at sf0.001:
LCG points form a lattice whose minimal inter-point distance exceeds
the radius, the classic spectral-test artifact).  Everything after
the hash is exact BIGINT math — cells, distances, and the filter are
all integers, no floating point anywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trafik_etl_modular_spark.functions.neutral_hash import nhash, oracle_nhash
from trafik_etl_modular_spark.operators.pinning import pin
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

# 1000×1000 integer world, radius 10 → 100×100 grid of cell size r.
_R = 10
_R2 = _R * _R
_GRID = 1000

_POINTS_SQL = f"""
  SELECT event_id AS id,
         {oracle_nhash('event_id', 'sx')} % {_GRID} AS x,
         {oracle_nhash('event_id', 'sy')} % {_GRID} AS y
  FROM events
"""

_NEIGHBOR_SQL = f"""
WITH pts AS ({_POINTS_SQL}),
cells AS (
  SELECT id, x, y, x // {_R} AS cx, y // {_R} AS cy FROM pts
),
offsets(dx, dy) AS (
  VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)
),
-- cell coordinates PACK into one integer key so the candidate join is
-- a single-column hash equi-join (an arithmetic join condition sent
-- DuckDB to a nested loop: 188 s -> 0.7 s at sf0.1)
probe AS (
  SELECT id, x, y, (cx + dx) * {_GRID} + (cy + dy) AS k
  FROM cells CROSS JOIN offsets
),
tgt AS (SELECT id, x, y, cx * {_GRID} + cy AS k FROM cells),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
  FROM probe a JOIN tgt b ON a.k = b.k
  WHERE a.id < b.id
    AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_R2}
)
SELECT id_a, id_b, dist2,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_pairs_total
FROM pairs
ORDER BY dist2, id_a, id_b
LIMIT 100
"""


@query("join_spatial_neighbor_pairs", sql=_NEIGHBOR_SQL, tags=("join", "spatial"))
def join_spatial_neighbor_pairs(spark, sf_dir) -> DataFrame:
    """All point pairs within radius r via grid bucketing: cell size
    = r, so candidates are the 3×3 neighbor-cell EQUI-join (each
    qualifying pair matches exactly one (dx,dy) offset — no dedup
    pass needed) and the exact integer distance check runs only
    inside matched cells.  Emits the 100 closest pairs under a total
    (dist2, id_a, id_b) order plus the total qualifying-pair count.

    Scale: the candidate join shuffles on the cell key — work is
    Σ_cells |cell|·|3×3 neighborhood|, not N², and the 9-offset
    expansion is a 9-row broadcast.  Dense cells are the skew risk:
    AQE skew-join splits them, and the cell size is the tuning knob
    (cell = r is the textbook operating point).  All math is exact
    BIGINT — no cross-engine float surface at all."""
    ev = t(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_id").alias("id"),
        (nhash("event_id", "sx") % _GRID).alias("x"),
        (nhash("event_id", "sy") % _GRID).alias("y"),
    )
    cells = pts.select(
        "id", "x", "y",
        F.floor(F.col("x") / _R).alias("cx"),
        F.floor(F.col("y") / _R).alias("cy"),
    )
    # BOTH join legs read the cell frame, and the md5 coordinate
    # derivation is its expensive part — materialize it once instead
    # of once per leg (interleaved A/B at sf0.1: 4.9/5.6 s two-pass
    # vs 3.6/3.5 s checkpointed; at lake scale this is the persisted
    # point table every spatial job starts from)
    cells = cells.localCheckpoint(eager=False)
    # 9-offset expansion as an explode PROJECTION (no join node);
    # packed single-column cell key: one hash shuffle key, and the
    # same shape the oracle uses
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = cells.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        "cx",
        "cy",
        F.explode(offsets).alias("o"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (
            (F.col("cx") + F.col("o.dx")) * _GRID + (F.col("cy") + F.col("o.dy"))
        ).alias("k"),
    )
    b = cells.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        (F.col("cx") * _GRID + F.col("cy")).alias("k"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    pairs = (
        a.join(b, "k")
        .where((F.col("id_a") < F.col("id_b")) & (d2 <= _R2))
        .select("id_a", "id_b", d2.alias("dist2"))
    )
    # the pair frame feeds TWO legs (total count + top-100); pin it
    # lazily so the candidate join runs once, not per leg (interleaved
    # A/B at sf0.1: 5.0 s two-pass vs 3.3 s pinned — PINNED.md).
    # pin() = localCheckpoint locally; set spark.graft.checkpoint.dir
    # on a cluster for a reliable-storage checkpoint that survives
    # executor loss (operators/pinning.py, verdict r09 ask #5)
    pairs = pin(pairs, eager=False)
    # total via a parallel aggregate + 1-row cross join — a global
    # window would move every pair to one partition just to count
    total = pairs.agg(F.count("*").cast("bigint").alias("n_pairs_total"))
    top = pairs.orderBy("dist2", "id_a", "id_b").limit(100)
    return top.crossJoin(F.broadcast(total)).orderBy("dist2", "id_a", "id_b")


# ---------------------------------------------------------------------------
# Radius-bounded k-NN for a probe panel (the query-workload shape)
# ---------------------------------------------------------------------------

_KNN_K = 3
_KNN_R = 25          # probe radius (its own grid: cell size = radius)
_KNN_R2 = _KNN_R * _KNN_R

_KNN_SQL = f"""
WITH pts AS ({_POINTS_SQL}),
cells AS (
  SELECT id, x, y, (x // {_KNN_R}) * {_GRID} + (y // {_KNN_R}) AS k FROM pts
),
offsets(dx, dy) AS (
  VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)
),
probes AS (
  SELECT id, x, y,
         ((x // {_KNN_R}) + dx) * {_GRID} + ((y // {_KNN_R}) + dy) AS k
  FROM pts CROSS JOIN offsets
  WHERE id % 97 = 0
),
cand AS (
  SELECT p.id AS probe_id, b.id AS neighbor_id,
         (p.x - b.x) * (p.x - b.x) + (p.y - b.y) * (p.y - b.y) AS dist2
  FROM probes p JOIN cells b ON p.k = b.k
  WHERE p.id <> b.id
    AND (p.x - b.x) * (p.x - b.x) + (p.y - b.y) * (p.y - b.y) <= {_KNN_R2}
),
ranked AS (
  SELECT probe_id, neighbor_id, dist2,
         ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY dist2, neighbor_id) AS rk
  FROM cand
)
SELECT probe_id, CAST(rk AS INTEGER) AS rk, neighbor_id, dist2
FROM ranked WHERE rk <= {_KNN_K}
ORDER BY probe_id, rk
"""


@query("join_spatial_knn_probes", sql=_KNN_SQL, tags=("join", "spatial"))
def join_spatial_knn_probes(spark, sf_dir) -> DataFrame:
    """Radius-bounded k-NN (k=3 within r=25) for a ~1% probe panel —
    the spatial QUERY-WORKLOAD shape, paired with the all-pairs self
    join the way the sim family pairs brute-force scoring with probe
    panels.  Same grid technique at the probe radius (cell = r, 3×3
    packed-key equi-join, exact BIGINT distances), then one
    per-probe window rank keeps the 3 closest with a total
    (dist2, neighbor_id) tiebreak.  Probes with fewer than k
    neighbors inside r return fewer rows — radius-bounded semantics,
    the ST_DWithin + rank idiom.

    Scale: candidate volume is |probes| · |3×3 neighborhood|, never
    |probes|·N; the rank window shuffles on probe_id (panel-sized).
    At sf0.001 the panel sees ~2 neighbors per probe (under-filled
    ranks exercised), at sf0.1 ~200 (the cut exercised)."""
    ev = t(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_id").alias("id"),
        (nhash("event_id", "sx") % _GRID).alias("x"),
        (nhash("event_id", "sy") % _GRID).alias("y"),
    )
    cells = pts.select(
        "id", "x", "y",
        (F.floor(F.col("x") / _KNN_R) * _GRID + F.floor(F.col("y") / _KNN_R)).alias("k"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probes = (
        pts.where(F.col("id") % 97 == 0)
        .select("id", "x", "y", F.explode(offsets).alias("o"))
        .select(
            F.col("id").alias("probe_id"),
            F.col("x").alias("px"),
            F.col("y").alias("py"),
            (
                (F.floor(F.col("x") / _KNN_R) + F.col("o.dx")) * _GRID
                + (F.floor(F.col("y") / _KNN_R) + F.col("o.dy"))
            ).alias("k"),
        )
    )
    d2 = (F.col("px") - F.col("x")) * (F.col("px") - F.col("x")) + (
        F.col("py") - F.col("y")
    ) * (F.col("py") - F.col("y"))
    cand = (
        probes.join(cells, "k")
        .where((F.col("probe_id") != F.col("id")) & (d2 <= _KNN_R2))
        .select("probe_id", F.col("id").alias("neighbor_id"), d2.alias("dist2"))
    )
    w = Window.partitionBy("probe_id").orderBy("dist2", "neighbor_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _KNN_K)
        .select("probe_id", F.col("rk").cast("int").alias("rk"), "neighbor_id", "dist2")
        .orderBy("probe_id", "rk")
    )
