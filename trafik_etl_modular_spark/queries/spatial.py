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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trafik_etl_modular_spark.functions.neutral_hash import nhash, oracle_nhash
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
    # A/B at sf0.1: 5.0 s two-pass vs 3.3 s pinned — PINNED.md)
    pairs = pairs.localCheckpoint(eager=False)
    # total via a parallel aggregate + 1-row cross join — a global
    # window would move every pair to one partition just to count
    total = pairs.agg(F.count("*").cast("bigint").alias("n_pairs_total"))
    top = pairs.orderBy("dist2", "id_a", "id_b").limit(100)
    return top.crossJoin(F.broadcast(total)).orderBy("dist2", "id_a", "id_b")
