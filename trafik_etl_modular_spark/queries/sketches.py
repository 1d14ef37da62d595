"""Mergeable-sketch operators: Bloom prefilter, Count-Min heavy
hitters, KMV distinct/Jaccard.

These complete the engine's sketch family next to the HLL rollup and
GK percentiles (queries/aggregates.py).  All three are built on the
engine-neutral 60-bit hash (functions/neutral_hash.py), so — unlike
the frozen-candidate MinHash/SimHash oracles — the ENTIRE sketch
pipeline (build, merge, probe) runs independently in BOTH engines and
the DuckDB oracle verifies every stage, not just the relational tail.

Why these matter at 100 TB:

* **Bloom prefilter** — the incremental-dedup admission gate
  (`dedup_incremental_batch`) joins every new batch against a corpus
  index; a Bloom filter over corpus content hashes turns that into a
  map-only scan for the (overwhelming) novel majority, with the
  exact join reserved for the few "maybe" hits.  The filter is a
  bit_or-mergeable word table: building it is ONE reduce keyed by
  word index, appending a batch is the same reduce, and the artifact
  (m/32 words ≈ 2 bits·n/32 rows) broadcasts.
* **Count-Min** — per-key frequency under a fixed memory budget:
  d×w counters, counts ADD, so per-day partials merge into arbitrary
  ranges without re-reading raw events (the HLL argument, but for
  frequencies).  One-sided error: estimates never undercount.
* **KMV** — distinct counting like HLL, but the sketch supports SET
  ALGEBRA: the k minimum hash values of A ∪ B are computable from
  the two sketches, giving intersection / Jaccard estimates HLL
  cannot produce (Beyer et al. 2007; Broder 1997 — public
  literature).

All arithmetic on the comparison surface is integer or
identical-literal IEEE double; no cross-engine float hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trafik_etl_modular_spark.functions.neutral_hash import (
    HASH_SPACE,
    nhash,
    oracle_nhash,
)
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

# ---------------------------------------------------------------------------
# Bloom-filter batch prefilter
# ---------------------------------------------------------------------------

BLOOM_K = 5           # hash lanes (Kirsch–Mitzenmacher from two base hashes)
BLOOM_BITS_PER_KEY = 16  # m = 16·n → theoretical fp ≈ (1−e^{−5/16})^5 ≈ 0.2 %


def _bloom_m(n_corpus: int) -> int:
    return max(64, BLOOM_BITS_PER_KEY * n_corpus)


# Lane-parameterized builders (verdict r09 ask #4): the registered
# queries below call these with the default neutral (md5) lane so the
# DuckDB oracle can rebuild the whole sketch; production pipelines
# pass lane="xxhash64" for the cheaper Spark-native hash — SAME plan
# shape, certified by tests/test_hash_lanes.py across all three
# sketch families.


def bloom_lanes(m: int, lane: str = "neutral", text_col: str = "text"):
    """k=BLOOM_K double-hashed bit positions (Kirsch–Mitzenmacher)."""
    h1, h2 = nhash(text_col, "b1", lane), nhash(text_col, "b2", lane)
    return F.array(*[((h1 + F.lit(i) * h2) % m) for i in range(BLOOM_K)])


def bloom_word_table(pos_df: DataFrame, pos_col: str = "p") -> DataFrame:
    """Pack exploded bit positions into the bit_or-mergeable word
    table (m/32 rows) — ONE reduce keyed by word index."""
    return (
        pos_df.select(
            (F.col(pos_col) / 32).cast("bigint").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({pos_col} % 32 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("w"))
    )


def cms_cell_for(j_col, uid_col, lane: str = "neutral"):
    """Lane-j CMS cell index for a key column (d-way CASE)."""
    c = None
    for j in range(CMS_DEPTH):
        expr = nhash(uid_col, f"c{j}", lane) % CMS_WIDTH
        c = F.when(j_col == j, expr) if c is None else c.when(j_col == j, expr)
    return c


def kmv_hash(uid_col, lane: str = "neutral"):
    """The KMV sketch's single hash lane."""
    return nhash(uid_col, "kmv", lane)


_BLOOM_BATCH_SQL = """
corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
batch_raw AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
batch AS (
  SELECT b.doc_id,
         CASE WHEN b.doc_id % 20 = 0 AND d2.text IS NOT NULL
              THEN d2.text ELSE b.text END AS text
  FROM batch_raw b
  LEFT JOIN documents d2 ON d2.doc_id = b.doc_id + 3
)
"""


def _bloom_oracle_sql(sf_dir: str) -> str:
    """Full-pipeline oracle: DuckDB rebuilds the filter itself (the
    position SET — semantically identical to the engine's packed word
    table) and re-runs the probe + exact verification."""
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet' WHERE doc_id % 10 <> 0"
    ).fetchone()[0]
    m = _bloom_m(int(n))
    h1 = oracle_nhash("text", "b1")
    h2 = oracle_nhash("text", "b2")
    return f"""
WITH {_BLOOM_BATCH_SQL},
lanes(i) AS (VALUES (0), (1), (2), (3), (4)),
cpos AS (
  SELECT DISTINCT ({h1} + i * {h2}) % {m} AS pos
  FROM corpus CROSS JOIN lanes
),
bprobe AS (
  SELECT b.doc_id, ({h1} + i * {h2}) % {m} AS pos
  FROM batch b CROSS JOIN lanes
),
maybe AS (
  SELECT p.doc_id, bool_and(c.pos IS NOT NULL) AS bloom_maybe
  FROM bprobe p LEFT JOIN cpos c ON p.pos = c.pos
  GROUP BY p.doc_id
),
exact AS (SELECT DISTINCT md5(text) AS h FROM corpus)
SELECT b.doc_id,
       m.bloom_maybe,
       (e.h IS NOT NULL) AS is_dup,
       CASE WHEN e.h IS NOT NULL THEN 'dup'
            WHEN m.bloom_maybe THEN 'fp'
            ELSE 'new' END AS status,
       (m.bloom_maybe OR e.h IS NULL) AS no_false_negative
FROM batch b
JOIN maybe m ON m.doc_id = b.doc_id
LEFT JOIN exact e ON md5(b.text) = e.h
ORDER BY b.doc_id
"""


@query("dedup_bloom_prefilter", sql=_bloom_oracle_sql, tags=("sketch", "dedup"))
def dedup_bloom_prefilter(spark, sf_dir) -> DataFrame:
    """Bloom-filter admission gate for incremental dedup, built and
    probed entirely with built-in expressions.  Build: every corpus
    document sets k=5 bit positions (double hashing from two neutral
    hash lanes); positions pack into a word table via ONE
    bit_or-mergeable reduce keyed by word index (m/32 rows — the
    filter artifact a real pipeline persists and broadcasts; m is
    sized at 16 bits/key from the corpus count, the one driver-side
    scalar, which is index METADATA like the IVF centroid count).
    Probe: each batch document's 5 positions join the broadcast word
    table map-only; `bloom_maybe` iff every lane's bit is set.  The
    eval then notarizes the sketch against exact membership: status ∈
    {dup, fp, new} and the structural certificate `no_false_negative`
    (a Bloom filter can say "maybe" wrongly, never "no" wrongly) must
    be literally TRUE on every row — the oracle rebuilds filter,
    probe, and verification independently.

    The batch derivation plants exact duplicates (every 2nd batch doc
    swaps in a corpus text) so both the dup and novel paths execute
    at every SF.  At 100 TB the production path joins ONLY the maybe
    rows against the corpus index (work ∝ dup-rate · batch), while
    the bloom-negative majority passes with zero shuffle; this eval
    computes exact membership for ALL rows only to certify the
    filter, the same pattern as the LSH/SimHash calibration evals."""
    docs = t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    batch_raw = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    donor = docs.select(
        (F.col("doc_id") - 3).alias("doc_id"), F.col("text").alias("donor_text")
    )
    batch = batch_raw.join(donor, "doc_id", "left").select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 20 == 0) & F.col("donor_text").isNotNull(),
            F.col("donor_text"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )

    m = _bloom_m(corpus.count())
    lanes = bloom_lanes(m)

    words = bloom_word_table(
        corpus.select(F.explode(lanes).alias("pos")), pos_col="pos"
    ).withColumnRenamed("w", "word")

    probe = batch.select("doc_id", F.md5("text").alias("bh"), F.explode(lanes).alias("pos"))
    probe = probe.select(
        "doc_id",
        "bh",
        (F.col("pos") / 32).cast("bigint").alias("word_idx"),
        (F.col("pos") % 32).cast("int").alias("bit"),
    )
    hits = probe.join(F.broadcast(words), "word_idx", "left").select(
        "doc_id",
        "bh",
        F.coalesce(
            F.expr("(word & shiftleft(CAST(1 AS BIGINT), bit)) != 0"), F.lit(False)
        ).alias("hit"),
    )
    maybe = hits.groupBy("doc_id", "bh").agg(F.min("hit").alias("bloom_maybe"))

    exact = corpus.select(F.md5("text").alias("bh")).distinct().withColumn(
        "present", F.lit(True)
    )
    out = maybe.join(F.broadcast(exact), "bh", "left").select(
        "doc_id",
        "bloom_maybe",
        F.coalesce(F.col("present"), F.lit(False)).alias("is_dup"),
    )
    return out.select(
        "doc_id",
        "bloom_maybe",
        "is_dup",
        F.when(F.col("is_dup"), "dup")
        .when(F.col("bloom_maybe"), "fp")
        .otherwise(F.lit("new"))
        .alias("status"),
        (F.col("bloom_maybe") | ~F.col("is_dup")).alias("no_false_negative"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Count-Min Sketch heavy hitters
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 512
_PANEL = 10


def _cms_cell_sql(j: int) -> str:
    return f"({oracle_nhash('user_id', f'c{j}')} % {CMS_WIDTH})"


_CMS_SQL = f"""
WITH lanes(j) AS (VALUES (0), (1), (2), (3)),
keyed AS (
  SELECT user_id, CAST(ts AS DATE) AS day, j,
         CASE j WHEN 0 THEN {_cms_cell_sql(0)}
                WHEN 1 THEN {_cms_cell_sql(1)}
                WHEN 2 THEN {_cms_cell_sql(2)}
                ELSE        {_cms_cell_sql(3)} END AS cell
  FROM events CROSS JOIN lanes
),
daily AS (
  SELECT day, j, cell, CAST(COUNT(*) AS BIGINT) AS c
  FROM keyed GROUP BY day, j, cell
),
merged AS (SELECT j, cell, CAST(SUM(c) AS BIGINT) AS c FROM daily GROUP BY j, cell),
globe AS (SELECT j, cell, CAST(COUNT(*) AS BIGINT) AS c FROM keyed GROUP BY j, cell),
panel AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM events GROUP BY user_id
  ORDER BY exact_n DESC, user_id LIMIT {_PANEL}
),
probes AS (
  SELECT p.user_id, p.exact_n, l.j,
         CASE l.j WHEN 0 THEN {_cms_cell_sql(0).replace('user_id', 'p.user_id')}
                  WHEN 1 THEN {_cms_cell_sql(1).replace('user_id', 'p.user_id')}
                  WHEN 2 THEN {_cms_cell_sql(2).replace('user_id', 'p.user_id')}
                  ELSE        {_cms_cell_sql(3).replace('user_id', 'p.user_id')} END AS cell
  FROM panel p CROSS JOIN lanes l
),
est AS (
  SELECT pr.user_id,
         ANY_VALUE(pr.exact_n) AS exact_n,
         MIN(m.c) AS cms_est,
         CAST(SUM(CASE WHEN m.c <> g.c THEN 1 ELSE 0 END) AS BIGINT) AS n_merge_mismatch
  FROM probes pr
  JOIN merged m ON m.j = pr.j AND m.cell = pr.cell
  JOIN globe g ON g.j = pr.j AND g.cell = pr.cell
  GROUP BY pr.user_id
)
SELECT user_id, exact_n, cms_est,
       (cms_est - exact_n) AS overcount,
       (cms_est >= exact_n) AS never_undercounts,
       (n_merge_mismatch = 0) AS merged_eq_global
FROM est
ORDER BY exact_n DESC, user_id
"""


@query("agg_cms_heavy_hitters", sql=_CMS_SQL, tags=("sketch", "agg", "approx"))
def agg_cms_heavy_hitters(spark, sf_dir) -> DataFrame:
    """Count-Min Sketch frequency estimates for the top-10 exact
    heavy hitters (Cormode & Muthukrishnan 2005, public literature):
    a 4×512 counter grid built by ONE hash aggregation over (lane,
    cell) — the shuffle carries d·w partial counters per task, never
    rows — probed with min-over-lanes.  Two certificates the oracle
    recomputes independently: `never_undercounts` (CMS error is
    one-sided — every lane's cell ≥ the true count, so the min is
    too) and `merged_eq_global` (the sketch built by summing per-day
    partial sketches is cell-identical to the one-shot global build —
    counts add, so per-batch partials merge into arbitrary ranges
    without re-reading raw events, the same maintenance story as the
    HLL rollup).  The heavy-hitter PANEL is exact top-k here; at
    100 TB candidates come from a sample and the sketch prices them —
    the probe shape (panel × d broadcast against the d·w table) is
    unchanged."""
    ev = t(spark, sf_dir, "events")
    # d-lane expansion as an explode PROJECTION (no join node on the
    # big side)
    lanes_arr = F.array(*[F.lit(j) for j in range(CMS_DEPTH)])

    # The hash leg is the cost: the fixture scan is ONE parquet split,
    # so without the repartition all d·|events| notarization md5s run
    # in a single task; and BOTH sketch builds (daily-partial and
    # one-shot global) consume the keyed rows, so the lazy checkpoint
    # runs the hashes once instead of once per build (interleaved A/B
    # at sf0.1: ~1.9 s → ~1.5 s warm).  The projection drops user_id
    # before materializing — neither build groups on it.
    keyed = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select("user_id", "day", F.explode(lanes_arr).alias("j"))
        .select(
            "day",
            "j",
            cms_cell_for(F.col("j"), F.col("user_id")).alias("cell"),
        )
        .localCheckpoint(eager=False)
    )
    daily = keyed.groupBy("day", "j", "cell").agg(F.count("*").cast("bigint").alias("c"))
    merged = daily.groupBy("j", "cell").agg(F.sum("c").cast("bigint").alias("c"))
    globe = keyed.groupBy("j", "cell").agg(F.count("*").cast("bigint").alias("c"))

    panel = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(_PANEL)
    )
    probes = panel.select(
        "user_id", "exact_n", F.explode(lanes_arr).alias("j")
    ).select(
        "user_id",
        "exact_n",
        "j",
        cms_cell_for(F.col("j"), F.col("user_id")).alias("cell"),
    )
    est = (
        probes.join(merged.withColumnRenamed("c", "mc"), ["j", "cell"])
        .join(globe.withColumnRenamed("c", "gc"), ["j", "cell"])
        .groupBy("user_id")
        .agg(
            F.any_value("exact_n").alias("exact_n"),
            F.min("mc").alias("cms_est"),
            F.sum(F.when(F.col("mc") != F.col("gc"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_merge_mismatch"),
        )
    )
    return est.select(
        "user_id",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        (F.col("cms_est") >= F.col("exact_n")).alias("never_undercounts"),
        (F.col("n_merge_mismatch") == 0).alias("merged_eq_global"),
    ).orderBy(F.desc("exact_n"), "user_id")


# ---------------------------------------------------------------------------
# KMV distinct / Jaccard sketch
# ---------------------------------------------------------------------------

KMV_K = 64
# (k−1)·2^60 as an exact double (6 significant bits — exactly
# representable); both engines parse the same shortest-repr literal,
# so the estimator division is the identical IEEE operation.
_KMV_NUM = float((KMV_K - 1) * HASH_SPACE)

_KMV_H = oracle_nhash("user_id", "kmv")

_KMV_SQL = f"""
WITH uh AS (
  SELECT DISTINCT event_type, user_id, {_KMV_H} AS h FROM events
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM (SELECT DISTINCT event_type, h FROM uh)
),
kmv AS (SELECT event_type, h, rk FROM ranked WHERE rk <= {KMV_K}),
per_type AS (
  SELECT u.event_type,
         CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS exact_distinct,
         (SELECT MAX(h) FROM kmv k WHERE k.event_type = u.event_type) AS hk,
         (SELECT COUNT(*) FROM kmv k WHERE k.event_type = u.event_type) AS kc
  FROM uh u GROUP BY u.event_type
),
est AS (
  SELECT event_type, exact_distinct,
         CASE WHEN kc < {KMV_K} THEN exact_distinct
              ELSE CAST(FLOOR({_KMV_NUM!r} / CAST(hk AS DOUBLE)) AS BIGINT)
         END AS kmv_distinct_est
  FROM per_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM events) a
  JOIN (SELECT DISTINCT event_type FROM events) b ON a.event_type < b.event_type
),
pair_h AS (
  SELECT p.type_a, p.type_b, k.h,
         MAX(CASE WHEN k.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN k.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p
  JOIN kmv k ON k.event_type IN (p.type_a, p.type_b)
  GROUP BY p.type_a, p.type_b, k.h
),
pair_x AS (
  SELECT type_a, type_b, h, in_a, in_b,
         ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rk
  FROM pair_h
),
pair_est AS (
  SELECT type_a, type_b,
         CAST(COUNT(*) AS BIGINT) AS k_used,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_shared
  FROM pair_x WHERE rk <= {KMV_K}
  GROUP BY type_a, type_b
),
exact_pair AS (
  SELECT p.type_a, p.type_b,
         CAST(COUNT(DISTINCT CASE WHEN ua.user_id IS NOT NULL
                                   AND ub.user_id IS NOT NULL
                                  THEN u.user_id END) AS BIGINT) AS n_inter,
         CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_union
  FROM pairs p
  JOIN (SELECT DISTINCT event_type, user_id FROM events) u
    ON u.event_type IN (p.type_a, p.type_b)
  LEFT JOIN (SELECT DISTINCT event_type, user_id FROM events) ua
    ON ua.event_type = p.type_a AND ua.user_id = u.user_id
  LEFT JOIN (SELECT DISTINCT event_type, user_id FROM events) ub
    ON ub.event_type = p.type_b AND ub.user_id = u.user_id
  GROUP BY p.type_a, p.type_b
)
SELECT pe.type_a, pe.type_b,
       ea.exact_distinct AS exact_distinct_a,
       eb.exact_distinct AS exact_distinct_b,
       ea.kmv_distinct_est AS kmv_est_a,
       eb.kmv_distinct_est AS kmv_est_b,
       CAST((ep.n_inter * 1000000000) // ep.n_union AS BIGINT) AS exact_jaccard_e9,
       CAST((pe.n_shared * 1000000000) // pe.k_used AS BIGINT) AS kmv_jaccard_e9
FROM pair_est pe
JOIN est ea ON ea.event_type = pe.type_a
JOIN est eb ON eb.event_type = pe.type_b
JOIN exact_pair ep ON ep.type_a = pe.type_a AND ep.type_b = pe.type_b
ORDER BY pe.type_a, pe.type_b
"""


@query("agg_kmv_distinct_jaccard", sql=_KMV_SQL, tags=("sketch", "agg", "approx"))
def agg_kmv_distinct_jaccard(spark, sf_dir) -> DataFrame:
    """KMV (k-minimum-values, k=64) sketches per event type, with the
    set-algebra probe HLL cannot answer: for every type pair, the
    union's k smallest hashes are computed FROM THE TWO SKETCHES
    ALONE and the shared fraction estimates Jaccard (Beyer et al.
    2007).  Per-type distinct estimate: (k−1)·2^60 / h_k when the
    sketch is full, the exact count when the domain is smaller than k
    (both branches exercise across SFs: sf0.001 has fewer than 64
    users, the larger SFs more).  Exact companions ride along for
    the report; the sketch is deterministic (neutral hash), so the
    oracle recomputes every estimate itself — no tolerance, no frozen
    values.

    Scale: sketch build is a per-type top-k (ONE shuffle on the
    window key, k rows out per type); pair probes touch only k·|pairs|
    sketch rows — never raw events.  The estimator division is the
    same IEEE double op on both engines (exact-double literal
    numerator, integer h_k)."""
    ev = t(spark, sf_dir, "events")
    uh = ev.select("event_type", "user_id").distinct().select(
        "event_type", "user_id", kmv_hash("user_id").alias("h")
    )
    dh = uh.select("event_type", "h").distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kmv = dh.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= KMV_K)

    per_type = uh.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    sk = kmv.groupBy("event_type").agg(
        F.max("h").alias("hk"), F.count("*").alias("kc")
    )
    est = per_type.join(sk, "event_type").select(
        "event_type",
        "exact_distinct",
        F.when(F.col("kc") < KMV_K, F.col("exact_distinct"))
        .otherwise(
            F.floor(F.lit(_KMV_NUM) / F.col("hk").cast("double")).cast("bigint")
        )
        .alias("kmv_distinct_est"),
    )

    types = ev.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
    )
    pair_h = (
        pairs.join(
            kmv,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)).alias("in_b"),
        )
    )
    wx = Window.partitionBy("type_a", "type_b").orderBy("h")
    pair_est = (
        pair_h.withColumn("rk", F.row_number().over(wx))
        .where(F.col("rk") <= KMV_K)
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").cast("bigint").alias("k_used"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_shared"),
        )
    )

    tu = ev.select("event_type", "user_id").distinct()
    pu = pairs.join(
        tu, (F.col("event_type") == F.col("type_a")) | (F.col("event_type") == F.col("type_b"))
    ).select(
        "type_a",
        "type_b",
        "user_id",
        F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0).alias("ia"),
        F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0).alias("ib"),
    )
    exact_pair = (
        pu.groupBy("type_a", "type_b", "user_id")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.col("ia") * F.col("ib")).cast("bigint").alias("n_inter"),
            F.count("*").cast("bigint").alias("n_union"),
        )
    )

    ea = est.select(
        F.col("event_type").alias("type_a"),
        F.col("exact_distinct").alias("exact_distinct_a"),
        F.col("kmv_distinct_est").alias("kmv_est_a"),
    )
    eb = est.select(
        F.col("event_type").alias("type_b"),
        F.col("exact_distinct").alias("exact_distinct_b"),
        F.col("kmv_distinct_est").alias("kmv_est_b"),
    )
    out = (
        pair_est.join(ea, "type_a")
        .join(eb, "type_b")
        .join(exact_pair, ["type_a", "type_b"])
    )
    return out.select(
        "type_a",
        "type_b",
        "exact_distinct_a",
        "exact_distinct_b",
        "kmv_est_a",
        "kmv_est_b",
        F.expr("(n_inter * 1000000000) div n_union").cast("bigint").alias("exact_jaccard_e9"),
        F.expr("(n_shared * 1000000000) div k_used").cast("bigint").alias("kmv_jaccard_e9"),
    ).orderBy("type_a", "type_b")


# ---------------------------------------------------------------------------
# Bloom filter incremental append (mergeability certificate)
# ---------------------------------------------------------------------------


def _bloom_append_oracle_sql(sf_dir: str) -> str:
    """Oracle rebuilds base, delta, merged, and one-shot-full word
    tables independently and asserts the merge identity per word."""
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet' WHERE doc_id % 10 <> 0"
    ).fetchone()[0]
    m = _bloom_m(int(n))
    h1 = oracle_nhash("text", "b1")
    h2 = oracle_nhash("text", "b2")
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
lanes(i) AS (VALUES (0), (1), (2), (3), (4)),
pos AS (
  SELECT doc_id, ({h1} + i * {h2}) % {m} AS p
  FROM corpus CROSS JOIN lanes
),
words_base AS (
  SELECT p // 32 AS word_idx, bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS w
  FROM pos WHERE doc_id % 10 <= 4 GROUP BY 1
),
words_delta AS (
  SELECT p // 32 AS word_idx, bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS w
  FROM pos WHERE doc_id % 10 >= 5 GROUP BY 1
),
merged AS (
  SELECT word_idx, bit_or(w) AS w
  FROM (SELECT * FROM words_base UNION ALL SELECT * FROM words_delta)
  GROUP BY word_idx
),
full_build AS (
  SELECT p // 32 AS word_idx, bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS w
  FROM pos GROUP BY 1
)
SELECT f.word_idx,
       CAST(bit_count(COALESCE(b.w, 0)) AS INTEGER) AS bits_base,
       CAST(bit_count(COALESCE(d.w, 0)) AS INTEGER) AS bits_delta,
       CAST(bit_count(COALESCE(m2.w, 0)) AS INTEGER) AS bits_merged,
       CAST(bit_count(f.w) AS INTEGER) AS bits_full,
       (COALESCE(m2.w, 0) = f.w) AS merge_matches
FROM full_build f
LEFT JOIN merged m2 ON m2.word_idx = f.word_idx
LEFT JOIN words_base b ON b.word_idx = f.word_idx
LEFT JOIN words_delta d ON d.word_idx = f.word_idx
ORDER BY f.word_idx
"""


@query("dedup_bloom_append", sql=_bloom_append_oracle_sql, tags=("sketch", "dedup", "incremental"))
def dedup_bloom_append(spark, sf_dir) -> DataFrame:
    """Incremental Bloom-filter maintenance — the append lifecycle the
    prefilter's docstring promises: the corpus filter built as
    merge(build(base), build(delta)) must be WORD-IDENTICAL to the
    one-shot full build, because bit_or is associative and commutative
    (the same argument as the HLL/CMS partial merges, here at the
    bit level).  Emits one row per filter word with popcounts from
    all four builds and the per-word `merge_matches` certificate the
    oracle recomputes independently.

    Scale: appending a batch to a persisted filter is ONE reduce over
    the batch's positions followed by a bit_or merge against m/32
    stored words — never a rebuild over history; this query notarizes
    exactly that equivalence.  The same m (sized from the full corpus
    count) frames both paths, mirroring a production filter whose
    capacity is provisioned ahead of appends."""
    docs = t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    m = _bloom_m(corpus.count())
    lanes = bloom_lanes(m)
    pos = corpus.select("doc_id", F.explode(lanes).alias("p"))

    words_base = bloom_word_table(pos.where(F.col("doc_id") % 10 <= 4))
    words_delta = bloom_word_table(pos.where(F.col("doc_id") % 10 >= 5))
    merged = (
        words_base.unionAll(words_delta).groupBy("word_idx").agg(F.bit_or("w").alias("w"))
    )
    full_build = bloom_word_table(pos)
    out = (
        full_build.withColumnRenamed("w", "fw")
        .join(merged.withColumnRenamed("w", "mw"), "word_idx", "left")
        .join(words_base.withColumnRenamed("w", "bw"), "word_idx", "left")
        .join(words_delta.withColumnRenamed("w", "dw"), "word_idx", "left")
    )
    z = F.lit(0).cast("bigint")
    return out.select(
        "word_idx",
        F.bit_count(F.coalesce(F.col("bw"), z)).cast("int").alias("bits_base"),
        F.bit_count(F.coalesce(F.col("dw"), z)).cast("int").alias("bits_delta"),
        F.bit_count(F.coalesce(F.col("mw"), z)).cast("int").alias("bits_merged"),
        F.bit_count(F.col("fw")).cast("int").alias("bits_full"),
        (F.coalesce(F.col("mw"), z) == F.col("fw")).alias("merge_matches"),
    ).orderBy("word_idx")


# ---------------------------------------------------------------------------
# AMS second-moment (F2) sketch (round 12)
# ---------------------------------------------------------------------------

_AMS_LANES = 9  # odd, so the median is a single order statistic


def _ams_sign(uid_col, j: int, lane: str = "neutral"):
    """Lane-j Rademacher ±1 sign from the neutral hash's parity."""
    return (nhash(uid_col, f"ams{j}", lane) % 2) * 2 - 1


def _ams_oracle_sql(sf_dir: str) -> str:
    zsum = ", ".join(
        f"CAST(SUM(({oracle_nhash('user_id', f'ams{j}')} % 2) * 2 - 1)"
        f" AS HUGEINT) AS z{j}"
        for j in range(_AMS_LANES)
    )
    zsq = ", ".join(f"z{j} * z{j}" for j in range(_AMS_LANES))
    return f"""
WITH z AS (SELECT {zsum} FROM events),
est AS (
  SELECT list_sort([{zsq}])[{_AMS_LANES // 2 + 1}] AS f2_est FROM z
),
exact AS (
  SELECT CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS f2_exact,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events
        GROUP BY user_id)
)
SELECT x.n_events, x.n_users,
       CAST(x.f2_exact AS BIGINT) AS f2_exact,
       CAST(e.f2_est AS BIGINT) AS f2_est,
       CAST(ABS(e.f2_est - x.f2_exact) * 1000000 // x.f2_exact AS BIGINT)
         AS rel_err_e6
FROM est e CROSS JOIN exact x
"""


@query("sketch_ams_f2", sql=_ams_oracle_sql, tags=("sketch", "agg", "approx"))
def sketch_ams_f2(spark, sf_dir) -> DataFrame:
    """AMS SECOND-MOMENT sketch (Alon–Matias–Szegedy 1996): estimate
    F₂ = Σ_k c_k² — the self-join size / repeat-rate statistic a cost
    model needs BEFORE planning the join — from {lanes} Rademacher
    sign-sums Z_j = Σ_events sign_j(user), est = median(Z_j²).  Each
    Z_j folds over RAW events with NO per-key aggregation (the whole
    sketch is one map-side projection + one 1-row agg — that is the
    point: F₂ without paying the groupBy), signs come off the
    cross-engine neutral-hash parity, and every square is
    HUGEINT/DECIMAL-widened (Z is event-count-sized; Z² overflows
    int64 at lake scale).  The certificate leg recomputes F₂ exactly
    and reports the e6 relative error.

    Scale: sketch leg is shuffle-free to a 1-row frame; only the
    certificate pays the per-key shuffle — at 100 TB you ship the
    sketch and SAMPLE the certificate.  Median over {lanes} lanes is
    a sorted-array pick, not a sort of data."""
    ev = t(spark, sf_dir, "events").select("user_id")
    dec = "DECIMAL(38,0)"
    z = ev.agg(
        *[
            F.sum(_ams_sign(F.col("user_id"), j)).cast(dec).alias(f"z{j}")
            for j in range(_AMS_LANES)
        ]
    )
    zsq = F.array(*[(F.col(f"z{j}") * F.col(f"z{j}")) for j in range(_AMS_LANES)])
    est = z.select(
        F.sort_array(zsq)[_AMS_LANES // 2].alias("f2_est")
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("c"))
        .agg(
            F.sum(F.expr(f"CAST(c AS {dec}) * c")).alias("f2_exact"),
            F.sum("c").cast("bigint").alias("n_events"),
            F.count("*").cast("bigint").alias("n_users"),
        )
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n_events",
        "n_users",
        F.col("f2_exact").cast("bigint").alias("f2_exact"),
        F.col("f2_est").cast("bigint").alias("f2_est"),
        F.expr(
            "CAST(ABS(f2_est - f2_exact) * 1000000 div f2_exact AS BIGINT)"
        ).alias("rel_err_e6"),
    )


sketch_ams_f2.__doc__ = sketch_ams_f2.__doc__.format(lanes=_AMS_LANES)


# ---------------------------------------------------------------------------
# Count-Min width-parameter sweep (round 12)
# ---------------------------------------------------------------------------

_CMS_SWEEP_WIDTHS = (64, 128, 256)


def _cms_sweep_oracle_sql(sf_dir: str) -> str:
    # lane hashes are width-INDEPENDENT: compute the {depth} md5s once
    # per row, expand over widths afterwards (3x fewer hashes than
    # hashing inside the (width, lane) grid)
    hash_cols = ", ".join(
        f"{oracle_nhash('user_id', f'c{j}')} AS h{j}" for j in range(CMS_DEPTH)
    )
    lane_cell = " ".join(
        f"WHEN {j} THEN (h{j} % wd.w)" for j in range(CMS_DEPTH)
    )
    probe_cell = " ".join(
        f"WHEN {j} THEN ({oracle_nhash('p.user_id', f'c{j}')} % wd.w)"
        for j in range(CMS_DEPTH)
    )
    lanes_vals = ", ".join(f"({j})" for j in range(CMS_DEPTH))
    width_vals = ", ".join(f"({w})" for w in _CMS_SWEEP_WIDTHS)
    return f"""
WITH widths(w) AS (VALUES {width_vals}),
lanes(j) AS (VALUES {lanes_vals}),
hashed AS (SELECT {hash_cols} FROM events),
keyed AS (
  SELECT wd.w, l.j,
         CASE l.j {lane_cell} END AS cell
  FROM hashed CROSS JOIN widths wd CROSS JOIN lanes l
),
cells AS (
  SELECT w, j, cell, CAST(COUNT(*) AS BIGINT) AS c
  FROM keyed GROUP BY w, j, cell
),
panel AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM events GROUP BY user_id
  ORDER BY exact_n DESC, user_id LIMIT 10
),
probes AS (
  SELECT wd.w, p.user_id, p.exact_n, l.j,
         CASE l.j {probe_cell} END AS cell
  FROM panel p CROSS JOIN widths wd CROSS JOIN lanes l
),
est AS (
  SELECT pr.w, pr.user_id, ANY_VALUE(pr.exact_n) AS exact_n,
         MIN(c.c) AS cms_est
  FROM probes pr
  JOIN cells c ON c.w = pr.w AND c.j = pr.j AND c.cell = pr.cell
  GROUP BY pr.w, pr.user_id
)
SELECT CAST(w AS BIGINT) AS width,
       CAST(w * {CMS_DEPTH} AS BIGINT) AS n_cells,
       CAST(COUNT(*) AS BIGINT) AS panel_n,
       CAST(SUM(cms_est - exact_n) AS BIGINT) AS sum_overcount,
       CAST(MAX(cms_est - exact_n) AS BIGINT) AS max_overcount,
       CAST(SUM(cms_est - exact_n) * 1000000 // COUNT(*) AS BIGINT)
         AS mean_overcount_e6,
       (MIN(cms_est - exact_n) >= 0) AS never_undercounts
FROM est
GROUP BY w
ORDER BY width
"""


@query("sketch_cms_width_sweep", sql=_cms_sweep_oracle_sql, tags=("sketch", "agg", "approx"))
def sketch_cms_width_sweep(spark, sf_dir) -> DataFrame:
    """COUNT-MIN WIDTH SWEEP — the tuning-certificate pattern (IVF
    nprobe sweep, LSH banding sweep) applied to the CMS memory/error
    dial: build depth-{d} sketches at widths {widths} from the SAME
    hash lanes, probe the top-10 exact heavy hitters through each,
    and report per width the total/max/mean overcount against exact
    counts — the measured ε-vs-memory curve (theory: E[over] ≤
    2n/w), plus the never-undercounts invariant that makes CMS safe
    as an admission prefilter.  All counts integer; the only division
    is the exact e6 mean.

    Scale: the sweep expands the scan {d}·|widths|× BEFORE the
    map-side combine — a TUNING query run on a sample to pick the
    production width, not a per-batch operator (the banding sweep's
    contract); each (width, lane) plane is cell-bounded after the
    fold.  Production then runs agg_cms_heavy_hitters at the chosen
    width."""
    ev = t(spark, sf_dir, "events").select("user_id")
    # the fixture scan is one parquet split, but the build leg does
    # `depth` md5+conv hashes per row — repartition the 8-byte key
    # column so that work spans the cluster instead of one task; the
    # remaining cost is the notarization hash itself (the xxhash64
    # production lane is ~3x cheaper, module doc), in band with the
    # other sweep queries.  No pin: re-scanning one pruned column
    # twice is cheaper than materializing it.
    hashed_src = ev.repartition(spark.sparkContext.defaultParallelism)
    # lane hashes are width-independent: hash once per row, expand
    # over the (width, lane) grid afterwards.  The grid expansion is a
    # GENERATE over a literal struct array — it stays inside whole-
    # stage codegen next to the hash projection, where a broadcast
    # cross join with a driver-side grid frame planned a
    # BroadcastNestedLoopJoin whose per-row condition/projection runs
    # on the interpreted expression path (measured 8.6 s vs 0.5 s for
    # this leg at sf0.1; the hash projection itself is 0.57 s).
    hashed = hashed_src.select(
        *[
            nhash(F.col("user_id"), f"c{j}").alias(f"h{j}")
            for j in range(CMS_DEPTH)
        ]
    )
    build_grid = F.array(
        *[
            F.struct(
                F.lit(w).cast("int").alias("w"),
                F.lit(j).cast("int").alias("j"),
                (F.col(f"h{j}") % F.lit(w)).alias("cell"),
            )
            for w in _CMS_SWEEP_WIDTHS
            for j in range(CMS_DEPTH)
        ]
    )
    keyed = hashed.select(F.explode(build_grid).alias("e")).select(
        "e.w", "e.j", "e.cell"
    )
    cells = keyed.groupBy("w", "j", "cell").agg(
        F.count("*").cast("bigint").alias("c")
    )
    panel = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(10)
    )
    probe_grid = F.array(
        *[
            F.struct(
                F.lit(w).cast("int").alias("w"),
                F.lit(j).cast("int").alias("j"),
                (
                    (cms_cell_for(F.lit(j), F.col("user_id")) % F.lit(w)).alias(
                        "cell"
                    )
                ),
            )
            for w in _CMS_SWEEP_WIDTHS
            for j in range(CMS_DEPTH)
        ]
    )
    probes = panel.select(
        "user_id", "exact_n", F.explode(probe_grid).alias("e")
    ).select("e.w", "user_id", "exact_n", "e.j", "e.cell")
    est = (
        probes.join(cells, ["w", "j", "cell"])
        .groupBy("w", "user_id")
        .agg(
            F.expr("ANY_VALUE(exact_n)").alias("exact_n"),
            F.min("c").alias("cms_est"),
        )
    )
    return (
        est.groupBy("w")
        .agg(
            F.count("*").cast("bigint").alias("panel_n"),
            F.sum(F.col("cms_est") - F.col("exact_n"))
            .cast("bigint")
            .alias("sum_overcount"),
            F.max(F.col("cms_est") - F.col("exact_n"))
            .cast("bigint")
            .alias("max_overcount"),
            F.expr(
                "CAST(SUM(cms_est - exact_n) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("mean_overcount_e6"),
            (F.min(F.col("cms_est") - F.col("exact_n")) >= 0).alias(
                "never_undercounts"
            ),
        )
        .select(
            F.col("w").cast("bigint").alias("width"),
            (F.col("w") * CMS_DEPTH).cast("bigint").alias("n_cells"),
            "panel_n",
            "sum_overcount",
            "max_overcount",
            "mean_overcount_e6",
            "never_undercounts",
        )
        .orderBy("width")
    )


sketch_cms_width_sweep.__doc__ = sketch_cms_width_sweep.__doc__.format(
    d=CMS_DEPTH, widths=_CMS_SWEEP_WIDTHS
)
