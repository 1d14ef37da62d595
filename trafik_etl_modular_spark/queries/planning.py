"""Optimizer-style statistics operators: join-cardinality estimation,
Bloom semi-join pushdown, blocking quality, and partition-skew audit.

At 100 TB the difference between a good and a catastrophic plan is
usually a CARDINALITY call — these operators expose, as first-class
certified queries, the statistics machinery an engine's optimizer
runs internally:

* **Join-cardinality estimate** — the System-R / Selinger MCV +
  uniform-remainder estimator (public literature): the top-N most
  common join keys contribute exactly (their frequency product), the
  long tail contributes n_l·n_r / max(d_l, d_r).  The certificate
  compares the estimate against the EXACT join size computed from the
  same per-key histograms — all integer arithmetic, no sampling.

* **Bloom semi-join prefilter** — the runtime-filter pushdown every
  warehouse engine (and Spark's own `spark.sql.optimizer.runtimeFilter`)
  applies to selective joins: build a Bloom filter over the small
  side's keys, drop probe rows whose bits miss before the shuffle.
  Certified: zero false negatives (structural — every true match sets
  its bits) and the measured false-positive rate, against the exact
  semi-join the oracle recomputes.

* **Blocking quality** — entity-resolution's standard pair of metrics
  (reduction ratio, pair completeness) for a cheap blocking key:
  how many candidate pairs blocking leaves vs N², and what fraction
  of true duplicate pairs the blocks retain.

* **Partition-skew audit** — per-partition row/byte mass with the
  max/avg skew factor and a 128 MB file-count plan: the layout report
  compaction planning reads before rewriting a table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trafik_etl_modular_spark.functions.neutral_hash import oracle_nhash
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

# ---------------------------------------------------------------------------
# System-R join-cardinality estimate (MCV + uniform remainder)
# ---------------------------------------------------------------------------

_MCV_N = 20

_CARD_EST_SQL = f"""
WITH lh AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS cl FROM events GROUP BY 1),
rh AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cr FROM orders GROUP BY 1),
mcv AS (SELECT k, cl FROM lh ORDER BY cl DESC, k LIMIT {_MCV_N}),
joined AS (SELECT lh.k, lh.cl, rh.cr FROM lh JOIN rh ON rh.k = lh.k),
actual AS (SELECT CAST(COALESCE(SUM(cl * cr), 0) AS BIGINT) AS actual_rows FROM joined),
mcvp AS (
  SELECT CAST(COALESCE(SUM(j.cl * j.cr), 0) AS BIGINT) AS mcv_rows,
         CAST(COALESCE(SUM(j.cr), 0) AS BIGINT) AS nr_mcv,
         CAST(COUNT(j.k) AS BIGINT) AS d_mcv_right
  FROM mcv m LEFT JOIN joined j ON j.k = m.k
),
stats AS (
  SELECT (SELECT CAST(SUM(cl) AS BIGINT) FROM lh) AS n_left,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lh) AS d_left,
         (SELECT CAST(SUM(cr) AS BIGINT) FROM rh) AS n_right,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM rh) AS d_right,
         (SELECT CAST(COALESCE(SUM(cl), 0) AS BIGINT) FROM mcv) AS nl_mcv,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM mcv) AS n_mcv
)
SELECT s.n_left, s.d_left, s.n_right, s.d_right, s.n_mcv,
       a.actual_rows, m.mcv_rows,
       CAST(m.mcv_rows
         + (CAST(s.n_left - s.nl_mcv AS HUGEINT) * (s.n_right - m.nr_mcv))
           // GREATEST(s.d_left - s.n_mcv, s.d_right - m.d_mcv_right, 1)
         AS BIGINT) AS est_rows,
       CAST(((m.mcv_rows
         + (CAST(s.n_left - s.nl_mcv AS HUGEINT) * (s.n_right - m.nr_mcv))
           // GREATEST(s.d_left - s.n_mcv, s.d_right - m.d_mcv_right, 1))
         * 1000000) // GREATEST(a.actual_rows, 1) AS BIGINT) AS est_ratio_e6
FROM stats s CROSS JOIN actual a CROSS JOIN mcvp m
"""


@query("join_cardinality_estimate", sql=_CARD_EST_SQL, tags=("join", "planning"))
def join_cardinality_estimate(spark, sf_dir) -> DataFrame:
    """System-R join-cardinality estimation certificate (module doc)
    for the many-to-many events ⋈ orders on the user/customer key
    (~tens of events × ~ten orders per key — real frequency skew on
    both sides, the case uniform-only estimators get wrong): the
    top-{n} MCV keys
    contribute their exact frequency product; the remainder uses the
    uniform-independence formula n_l·n_r / max(d_l, d_r).  Emits the
    histograms' summary, the exact join size, the estimate, and the
    estimate/actual ratio (e6) — the number an optimizer would feed
    its join-ordering cost model, notarized against ground truth.

    Scale: two per-key hash aggregations (the histograms — the same
    pass ANALYZE TABLE runs), one vocab-bounded histogram equi-join;
    the exact join size comes from Σ cl·cr over the joined histograms
    — never materializing the join itself.  MCV selection is a
    distributed top-{n} (TakeOrderedAndProject), ties broken by key."""
    ev = t(spark, sf_dir, "events")
    orders = t(spark, sf_dir, "orders")
    lh = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count("*").cast("bigint").alias("cl")
    )
    rh = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").cast("bigint").alias("cr")
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    # both histograms feed two legs each (stats + the histogram join)
    lh, rh = pin(lh, eager=True), pin(rh, eager=True)
    mcv = lh.orderBy(F.desc("cl"), "k").limit(_MCV_N)
    joined = pin(lh.join(rh, "k").select("k", "cl", "cr"), eager=True)
    actual = joined.agg(
        F.coalesce(F.sum(F.col("cl") * F.col("cr")), F.lit(0))
        .cast("bigint")
        .alias("actual_rows")
    )
    mcvp = (
        mcv.alias("m")
        .join(joined.alias("j"), "k", "left")
        .agg(
            F.coalesce(F.sum(F.col("j.cl") * F.col("j.cr")), F.lit(0))
            .cast("bigint")
            .alias("mcv_rows"),
            F.coalesce(F.sum("j.cr"), F.lit(0)).cast("bigint").alias("nr_mcv"),
            F.count("j.k").cast("bigint").alias("d_mcv_right"),
        )
    )
    stats = (
        lh.agg(
            F.sum("cl").cast("bigint").alias("n_left"),
            F.count("*").cast("bigint").alias("d_left"),
        )
        .crossJoin(
            rh.agg(
                F.sum("cr").cast("bigint").alias("n_right"),
                F.count("*").cast("bigint").alias("d_right"),
            )
        )
        .crossJoin(
            mcv.agg(
                F.coalesce(F.sum("cl"), F.lit(0)).cast("bigint").alias("nl_mcv"),
                F.count("*").cast("bigint").alias("n_mcv"),
            )
        )
    )
    out = stats.crossJoin(F.broadcast(actual)).crossJoin(F.broadcast(mcvp))
    # the uniform-remainder product multiplies two table-cardinality-
    # sized BIGINTs — widened to DECIMAL(38,0)/HUGEINT (ADVICE r11) so
    # ~1e9-row sides cannot silently wrap; the est_rows QUOTIENT fits
    # int64 whenever the estimate itself does (it is a row count)
    est = F.expr(
        "mcv_rows + (CAST(n_left - nl_mcv AS DECIMAL(38,0)) * (n_right - nr_mcv))"
        " div greatest(d_left - n_mcv, d_right - d_mcv_right, CAST(1 AS BIGINT))"
    )
    return out.select(
        "n_left",
        "d_left",
        "n_right",
        "d_right",
        "n_mcv",
        "actual_rows",
        "mcv_rows",
        est.cast("bigint").alias("est_rows"),
        F.expr(
            "(CAST(mcv_rows + (CAST(n_left - nl_mcv AS DECIMAL(38,0))"
            " * (n_right - nr_mcv))"
            " div greatest(d_left - n_mcv, d_right - d_mcv_right, CAST(1 AS BIGINT))"
            " AS DECIMAL(38,0))"
            " * 1000000) div greatest(actual_rows, CAST(1 AS BIGINT))"
        )
        .cast("bigint")
        .alias("est_ratio_e6"),
    )


join_cardinality_estimate.__doc__ = join_cardinality_estimate.__doc__.format(n=_MCV_N)

# ---------------------------------------------------------------------------
# Bloom semi-join prefilter certificate
# ---------------------------------------------------------------------------


def _bloom_semi_oracle_sql(sf_dir: str) -> str:
    """Oracle rebuilds the filter from the small side and re-runs the
    probe + exact semi-join independently."""
    import duckdb

    from trafik_etl_modular_spark.queries.sketches import BLOOM_K, _bloom_m

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/customer.parquet' WHERE c_acctbal < 0"
    ).fetchone()[0]
    m = _bloom_m(int(n))
    h1b = oracle_nhash("c_custkey", "b1")
    h2b = oracle_nhash("c_custkey", "b2")
    h1p = oracle_nhash("o_custkey", "b1")
    h2p = oracle_nhash("o_custkey", "b2")
    lanes = ", ".join(f"({i})" for i in range(BLOOM_K))
    return f"""
WITH small AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0),
lanes(i) AS (VALUES {lanes}),
words AS (
  SELECT p // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS w
  FROM (SELECT ({h1b} + i * {h2b}) % {m} AS p FROM small CROSS JOIN lanes)
  GROUP BY 1
),
probe AS (
  SELECT o_orderkey, o_custkey, ({h1p} + i * {h2p}) % {m} AS p
  FROM orders CROSS JOIN lanes
),
checked AS (
  SELECT o_orderkey, o_custkey,
         CAST(SUM(CASE WHEN (COALESCE(w.w, 0) >> CAST(p % 32 AS INTEGER)) & 1 = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_set
  FROM probe LEFT JOIN words w ON w.word_idx = p // 32
  GROUP BY o_orderkey, o_custkey
),
flags AS (
  SELECT c.o_orderkey, (c.n_set = {BLOOM_K}) AS passed,
         (s.c_custkey IS NOT NULL) AS actual
  FROM checked c
  LEFT JOIN (SELECT DISTINCT c_custkey FROM small) s ON s.c_custkey = c.o_custkey
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM small) AS n_build_keys,
       CAST(COUNT(*) AS BIGINT) AS n_probe_rows,
       CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
       CAST(SUM(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT) AS n_actual,
       CAST(SUM(CASE WHEN passed AND NOT actual THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_positive,
       CAST((SUM(CASE WHEN passed AND NOT actual THEN 1 ELSE 0 END) * 1000000)
            // GREATEST(SUM(CASE WHEN NOT actual THEN 1 ELSE 0 END), 1) AS BIGINT)
         AS fp_rate_e6,
       (SUM(CASE WHEN actual AND NOT passed THEN 1 ELSE 0 END) = 0)
         AS no_false_negatives
FROM flags
"""


@query("join_bloom_semi_prefilter", sql=_bloom_semi_oracle_sql, tags=("join", "planning", "sketch"))
def join_bloom_semi_prefilter(spark, sf_dir) -> DataFrame:
    """Bloom runtime-filter pushdown certificate (module doc): build a
    Bloom filter over the selective small side (customers with
    negative balance), probe every order's custkey, and compare the
    filter's verdicts against the exact semi-join.  Emits build/probe
    volumes, pass/match counts, the false-positive count and rate
    (e6, over true non-matches), and `no_false_negatives` — the
    structural guarantee (a member's bits are all set by
    construction) the oracle re-proves.

    Scale: this is the shape that turns a shuffle of ALL probe rows
    into a shuffle of matches + ε: the word table is m/32 rows
    (BROADCAST — runtime filters ship to every scan task), the probe
    is a map-side explode of k=5 positions + one aggregation keyed by
    the probe row, and only survivors reach the join.  The same
    neutral-hash construction as the dedup Bloom family, so the
    oracle rebuilds the filter bit-for-bit."""
    from trafik_etl_modular_spark.queries.sketches import (
        BLOOM_K,
        _bloom_m,
        bloom_lanes,
        bloom_word_table,
    )

    cust = t(spark, sf_dir, "customer")
    small = cust.where(F.col("c_acctbal") < 0).select("c_custkey")
    m = _bloom_m(small.count())
    pos = small.select(
        F.explode(bloom_lanes(m, text_col="c_custkey")).alias("p")
    )
    words = bloom_word_table(pos)
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # k PER-LANE broadcast word joins instead of explode + re-group:
    # the exploded form shuffled k·|orders| rows back through an
    # (o_orderkey, o_custkey) hash aggregation just to reassemble the
    # per-row bit count, where k chained BroadcastHashJoins (the word
    # table is m/32 rows and broadcast either way — runtime filters
    # ship to every scan task by definition) keep the whole probe
    # map-side: zero exchanges from the scan to the 1-row aggregate.
    probe = orders.select(
        "o_orderkey",
        "o_custkey",
        bloom_lanes(m, text_col="o_custkey").alias("ps"),
    )
    checked = probe
    bit_cols = []
    for i in range(BLOOM_K):
        wi = words.select(
            F.col("word_idx").alias(f"__wi{i}"), F.col("w").alias(f"__w{i}")
        )
        checked = checked.join(
            F.broadcast(wi),
            F.expr(f"element_at(ps, {i + 1}) div 32") == F.col(f"__wi{i}"),
            "left",
        )
        bit_cols.append(
            F.when(
                F.expr(
                    f"(coalesce(__w{i}, CAST(0 AS BIGINT))"
                    f" >> CAST(element_at(ps, {i + 1}) % 32 AS INT)) & 1"
                )
                == 1,
                1,
            ).otherwise(0)
        )
    n_set = bit_cols[0]
    for c in bit_cols[1:]:
        n_set = n_set + c
    checked = checked.select(
        "o_orderkey", "o_custkey", n_set.cast("bigint").alias("n_set")
    )
    # actual = custkey ∈ small, attached with ONE broadcast join on the
    # customer key — o_orderkey is unique per probe row, so the old
    # semi-join + re-join-by-order-key pair computed exactly this flag
    actual_flag = (
        small.distinct()
        .withColumnRenamed("c_custkey", "o_custkey")
        .withColumn("actual", F.lit(True))
    )
    joined = checked.join(F.broadcast(actual_flag), "o_custkey", "left").select(
        (F.col("n_set") == BLOOM_K).alias("passed"),
        F.coalesce("actual", F.lit(False)).alias("actual"),
    )
    n_build = small.agg(F.count("*").cast("bigint").alias("n_build_keys"))
    agg = joined.agg(
        F.count("*").cast("bigint").alias("n_probe_rows"),
        F.sum(F.when(F.col("passed"), 1).otherwise(0)).cast("bigint").alias("n_passed"),
        F.sum(F.when(F.col("actual"), 1).otherwise(0)).cast("bigint").alias("n_actual"),
        F.sum(F.when(F.col("passed") & ~F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_positive"),
        F.sum(F.when(~F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("_n_nonmatch"),
        (
            F.sum(F.when(F.col("actual") & ~F.col("passed"), 1).otherwise(0)) == 0
        ).alias("no_false_negatives"),
    )
    return (
        F.broadcast(n_build)
        .crossJoin(agg)
        .select(
            "n_build_keys",
            "n_probe_rows",
            "n_passed",
            "n_actual",
            "n_false_positive",
            F.expr(
                "(n_false_positive * 1000000) div greatest(_n_nonmatch, CAST(1 AS BIGINT))"
            )
            .cast("bigint")
            .alias("fp_rate_e6"),
            "no_false_negatives",
        )
    )


# ---------------------------------------------------------------------------
# Blocking quality (entity resolution)
# ---------------------------------------------------------------------------

_BLK_CHARS = 64

_BLOCKING_SQL = f"""
WITH b AS (
  SELECT doc_id, lang || '|' || CAST(n_chars // {_BLK_CHARS} AS VARCHAR) AS blk,
         md5(text) AS h
  FROM documents
),
blocks AS (SELECT blk, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY blk),
cand AS (
  SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT) AS candidate_pairs,
         CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(MAX(n) AS BIGINT) AS max_block_size
  FROM blocks
),
dg AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS g FROM b GROUP BY h),
dp AS (SELECT CAST(COALESCE(SUM(g * (g - 1) // 2), 0) AS BIGINT) AS dup_pairs FROM dg),
dgb AS (SELECT h, blk, CAST(COUNT(*) AS BIGINT) AS gb FROM b GROUP BY h, blk),
cov AS (
  SELECT CAST(COALESCE(SUM(gb * (gb - 1) // 2), 0) AS BIGINT) AS dup_pairs_covered
  FROM dgb
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM b)
SELECT t.n_docs, c.n_blocks, c.max_block_size, c.candidate_pairs,
       CAST(t.n_docs * (t.n_docs - 1) // 2 AS BIGINT) AS total_pairs,
       CAST(((t.n_docs * (t.n_docs - 1) // 2 - c.candidate_pairs) * 1000000)
            // GREATEST(t.n_docs * (t.n_docs - 1) // 2, 1) AS BIGINT)
         AS reduction_ratio_e6,
       d.dup_pairs, v.dup_pairs_covered,
       CAST(CASE WHEN d.dup_pairs > 0
                 THEN (v.dup_pairs_covered * 1000000) // d.dup_pairs
                 ELSE 1000000 END AS BIGINT) AS pair_completeness_e6
FROM tot t CROSS JOIN cand c CROSS JOIN dp d CROSS JOIN cov v
"""


@query("dedup_blocking_quality", sql=_BLOCKING_SQL, tags=("dedup", "planning", "quality"))
def dedup_blocking_quality(spark, sf_dir) -> DataFrame:
    """Blocking-key quality report (module doc) for the cheap
    (lang, ⌊n_chars/{w}⌋) blocking key: reduction ratio — the fraction
    of the N² comparison space blocking eliminates — and pair
    completeness — the fraction of true duplicate pairs (same exact
    content hash) that land in the same block and thus remain
    findable.  The standard Christen entity-resolution metrics,
    computed exactly; the oracle recomputes both from raw documents.

    Scale: candidate mass comes from per-block counts (Σ n·(n−1)/2 —
    one hash aggregation, never the pairs themselves); duplicate
    coverage from (hash, block) group counts.  This is the query you
    run BEFORE committing a blocking scheme to a corpus-scale dedup
    job — an LSH band key slots into `blk` unchanged."""
    docs = t(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id",
        F.concat_ws(
            "|", F.col("lang"), F.expr(f"CAST(n_chars div {_BLK_CHARS} AS STRING)")
        ).alias("blk"),
        F.md5("text").alias("h"),
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    b = pin(b, eager=True)
    blocks = b.groupBy("blk").agg(F.count("*").cast("bigint").alias("n"))
    cand = blocks.agg(
        F.coalesce(F.sum(F.expr("n * (n - 1) div 2")), F.lit(0))
        .cast("bigint")
        .alias("candidate_pairs"),
        F.count("*").cast("bigint").alias("n_blocks"),
        F.max("n").cast("bigint").alias("max_block_size"),
    )
    dg = b.groupBy("h").agg(F.count("*").cast("bigint").alias("g"))
    dp = dg.agg(
        F.coalesce(F.sum(F.expr("g * (g - 1) div 2")), F.lit(0))
        .cast("bigint")
        .alias("dup_pairs")
    )
    dgb = b.groupBy("h", "blk").agg(F.count("*").cast("bigint").alias("gb"))
    cov = dgb.agg(
        F.coalesce(F.sum(F.expr("gb * (gb - 1) div 2")), F.lit(0))
        .cast("bigint")
        .alias("dup_pairs_covered")
    )
    tot = b.agg(F.count("*").cast("bigint").alias("n_docs"))
    out = (
        tot.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(dp))
        .crossJoin(F.broadcast(cov))
    )
    return out.select(
        "n_docs",
        "n_blocks",
        "max_block_size",
        "candidate_pairs",
        F.expr("CAST(n_docs * (n_docs - 1) div 2 AS BIGINT)").alias("total_pairs"),
        F.expr(
            "((n_docs * (n_docs - 1) div 2 - candidate_pairs) * 1000000)"
            " div greatest(n_docs * (n_docs - 1) div 2, CAST(1 AS BIGINT))"
        )
        .cast("bigint")
        .alias("reduction_ratio_e6"),
        "dup_pairs",
        "dup_pairs_covered",
        F.expr(
            "CASE WHEN dup_pairs > 0"
            " THEN (dup_pairs_covered * 1000000) div dup_pairs"
            " ELSE 1000000 END"
        )
        .cast("bigint")
        .alias("pair_completeness_e6"),
    )


dedup_blocking_quality.__doc__ = dedup_blocking_quality.__doc__.format(w=_BLK_CHARS)

# ---------------------------------------------------------------------------
# Partition-skew audit
# ---------------------------------------------------------------------------

_TARGET_FILE_BYTES = 128 * 1024 * 1024
# fixed-width column payload proxy: event_id + user_id + value + ts
_FIXED_ROW_BYTES = 28

_SKEW_SQL = f"""
WITH per_day AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(SUM(strlen(props) + strlen(event_type)
                  + {_FIXED_ROW_BYTES}) AS BIGINT) AS est_bytes
  FROM events GROUP BY CAST(ts AS DATE)
),
g AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
         CAST(MAX(n_rows) AS BIGINT) AS max_rows,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM per_day
)
SELECT p.day, p.n_rows, p.n_users, p.est_bytes,
       CAST((p.n_rows * 1000000) // g.total_rows AS BIGINT) AS share_e6,
       CAST((g.max_rows * g.n_days * 1000000) // g.total_rows AS BIGINT)
         AS skew_factor_e6,
       CAST((p.est_bytes + {_TARGET_FILE_BYTES} - 1) // {_TARGET_FILE_BYTES}
            AS BIGINT) AS n_target_files
FROM per_day p CROSS JOIN g
ORDER BY p.day
"""


@query("dq_partition_skew_audit", sql=_SKEW_SQL, tags=("quality", "planning"))
def dq_partition_skew_audit(spark, sf_dir) -> DataFrame:
    """Partition-layout audit for the date-partitioned events table
    (module doc): per day — row count, distinct users, an exact
    integer byte-mass proxy (variable-width columns by octet length +
    a fixed-width constant), the day's share of total rows (e6), the
    global max/avg skew factor (e6, repeated on every row), and the
    128 MB-target file count compaction would plan for that partition.

    Scale: ONE hash aggregation keyed by the partition value — the
    audit costs one scan regardless of table size, and its output is
    |partitions| rows.  A skew factor near 1e6 means uniform
    partitions; the factor is exactly what sizes AQE's skew-join
    threshold and the compaction batch plan."""
    ev = t(spark, sf_dir, "events")
    per_day = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum(
            F.octet_length("props")
            + F.octet_length("event_type")
            + F.lit(_FIXED_ROW_BYTES)
        )
        .cast("bigint")
        .alias("est_bytes"),
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    per_day = pin(per_day, eager=True)
    g = per_day.agg(
        F.sum("n_rows").cast("bigint").alias("total_rows"),
        F.max("n_rows").cast("bigint").alias("max_rows"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    return (
        per_day.crossJoin(F.broadcast(g))
        .select(
            "day",
            "n_rows",
            "n_users",
            "est_bytes",
            F.expr("(n_rows * 1000000) div total_rows").cast("bigint").alias("share_e6"),
            F.expr("(max_rows * n_days * 1000000) div total_rows")
            .cast("bigint")
            .alias("skew_factor_e6"),
            F.expr(
                f"(est_bytes + {_TARGET_FILE_BYTES} - 1) div {_TARGET_FILE_BYTES}"
            )
            .cast("bigint")
            .alias("n_target_files"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Equi-height histogram range selectivity (round 12)
# ---------------------------------------------------------------------------

_HIST_BUCKETS = 8
_HIST_GRANULE_CENTS = 10_000  # $100 histogram granules
_SEL_LO_G = 500  # predicate: o_totalprice in [$50k, $150k)
_SEL_HI_G = 1_500

_HIST_SEL_SQL = f"""
WITH g AS (
  SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT)
              // {_HIST_GRANULE_CENTS} AS BIGINT) AS granule
  FROM orders
),
gc AS (
  SELECT granule, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY granule
),
cum AS (
  SELECT granule, cnt,
         CAST(SUM(cnt) OVER (ORDER BY granule ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS c_end,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM gc
),
bucketed AS (
  SELECT LEAST((c_end - 1) * {_HIST_BUCKETS} // n, {_HIST_BUCKETS - 1})
           AS bucket,
         granule, cnt, n
  FROM cum
),
hist AS (
  SELECT bucket, MIN(granule) AS lo_g, MAX(granule) AS hi_g,
         CAST(SUM(cnt) AS BIGINT) AS b_rows, MAX(n) AS n
  FROM bucketed GROUP BY bucket
),
est AS (
  SELECT MAX(n) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CAST(SUM(CAST(b_rows AS HUGEINT) * 1000000
                  * GREATEST(0, LEAST(hi_g, {_SEL_HI_G - 1})
                                - GREATEST(lo_g, {_SEL_LO_G}) + 1)
                  // (hi_g - lo_g + 1)) AS BIGINT) AS est_rows_e6
  FROM hist
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_rows
  FROM g WHERE granule >= {_SEL_LO_G} AND granule < {_SEL_HI_G}
)
SELECT e.n_rows, e.n_buckets, e.est_rows_e6, x.exact_rows,
       CAST(ABS(e.est_rows_e6 - x.exact_rows * 1000000) AS BIGINT)
         AS abs_err_e6,
       CAST(ABS(e.est_rows_e6 - x.exact_rows * 1000000) // x.exact_rows
            AS BIGINT) AS rel_err_e6
FROM est e CROSS JOIN exact x
"""


@query("planning_histogram_selectivity", sql=_HIST_SEL_SQL, tags=("planning", "agg"))
def planning_histogram_selectivity(spark, sf_dir) -> DataFrame:
    """EQUI-HEIGHT HISTOGRAM range-selectivity estimate (the
    Piatetsky-Shapiro/Connell 1984 statistic every System-R-style
    optimizer keeps; complements join_cardinality_estimate's MCV
    recipe with the RANGE-predicate half): build an 8-bucket
    equi-height histogram over $100 price granules, estimate
    |σ_[50k,150k)(orders)| by uniform within-bucket interpolation,
    and certify against the exact count.  Bucket boundaries are EXACT
    integer rank cuts ((cum−1)·B // n); the interpolation is the
    exact rational rows·overlap·10⁶ // span per bucket — the whole
    estimate is integer, HUGEINT/DECIMAL-widened.

    Scale: the value frame folds to GRANULES (domain-bounded, ≤5000
    here) in one map-side-combined agg, so the cumulative window runs
    on a bounded frame regardless of row count — the same reason real
    optimizers histogram at granule precision.  The certificate is
    one predicate count (at 100 TB: sample it)."""
    cents = "CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT)"
    g = t(spark, sf_dir, "orders").select(
        F.expr(f"{cents} div {_HIST_GRANULE_CENTS}").alias("granule")
    )
    from trafik_etl_modular_spark.operators.pinning import pin
    from pyspark.sql import Window

    g = pin(g, eager=False)
    gc = g.groupBy("granule").agg(F.count("*").cast("bigint").alias("cnt"))
    w_cum = Window.orderBy("granule").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = gc.select(
        "granule",
        "cnt",
        F.sum("cnt").over(w_cum).cast("bigint").alias("c_end"),
        F.sum("cnt").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    bucketed = cum.select(
        F.least(
            F.expr(f"(c_end - 1) * {_HIST_BUCKETS} div n"),
            F.lit(_HIST_BUCKETS - 1).cast("bigint"),
        ).alias("bucket"),
        "granule",
        "cnt",
        "n",
    )
    hist = bucketed.groupBy("bucket").agg(
        F.min("granule").alias("lo_g"),
        F.max("granule").alias("hi_g"),
        F.sum("cnt").cast("bigint").alias("b_rows"),
        F.max("n").alias("n"),
    )
    est = hist.agg(
        F.max("n").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_buckets"),
        F.expr(
            f"CAST(SUM(CAST(b_rows AS DECIMAL(38,0)) * 1000000"
            f" * GREATEST(0, LEAST(hi_g, {_SEL_HI_G - 1})"
            f"               - GREATEST(lo_g, {_SEL_LO_G}) + 1)"
            f" div (hi_g - lo_g + 1)) AS BIGINT)"
        ).alias("est_rows_e6"),
    )
    exact = g.where(
        (F.col("granule") >= _SEL_LO_G) & (F.col("granule") < _SEL_HI_G)
    ).agg(F.count("*").cast("bigint").alias("exact_rows"))
    return est.crossJoin(F.broadcast(exact)).select(
        "n_rows",
        "n_buckets",
        "est_rows_e6",
        "exact_rows",
        F.expr("CAST(ABS(est_rows_e6 - exact_rows * 1000000) AS BIGINT)").alias(
            "abs_err_e6"
        ),
        F.expr(
            "CAST(ABS(est_rows_e6 - exact_rows * 1000000) div exact_rows"
            " AS BIGINT)"
        ).alias("rel_err_e6"),
    )


# ---------------------------------------------------------------------------
# Greedy join-order selection with exact certificate (round 12)
# ---------------------------------------------------------------------------

_GJO_SEGMENT = "BUILDING"
_GJO_PRIORITY = "1-URGENT"

_GJO_SQL = f"""
WITH l AS (SELECT l_orderkey FROM lineitem),
o AS (SELECT o_orderkey, o_custkey FROM orders
      WHERE o_orderpriority = '{_GJO_PRIORITY}'),
c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = '{_GJO_SEGMENT}'),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM l) AS n_l,
         (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM l) AS d_l_ok,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM o) AS n_o,
         (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM o) AS d_o_ok,
         (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM o) AS d_o_ck,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_c
),
est AS (
  SELECT n_l, n_o, n_c,
         CAST(CAST(n_l AS HUGEINT) * n_o
              // GREATEST(d_l_ok, d_o_ok) AS BIGINT) AS est_lo,
         CAST(CAST(n_o AS HUGEINT) * n_c
              // GREATEST(d_o_ck, n_c) AS BIGINT) AS est_oc
  FROM stats
),
x AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT)
          FROM l JOIN o ON o.o_orderkey = l.l_orderkey) AS exact_lo,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM o JOIN c ON c.c_custkey = o.o_custkey) AS exact_oc,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM l JOIN o ON o.o_orderkey = l.l_orderkey
                 JOIN c ON c.c_custkey = o.o_custkey) AS final_rows
)
SELECT e.n_l AS n_lineitem, e.n_o AS n_orders_filtered,
       e.n_c AS n_customers_filtered,
       e.est_lo, e.est_oc,
       CASE WHEN e.est_lo <= e.est_oc THEN 'lineitem_orders_first'
            ELSE 'orders_customer_first' END AS chosen_first,
       x.exact_lo, x.exact_oc, x.final_rows,
       ((e.est_lo <= e.est_oc) = (x.exact_lo <= x.exact_oc))
         AS choice_correct
FROM est e CROSS JOIN x
"""


@query("planning_greedy_join_order", sql=_GJO_SQL, tags=("planning", "join"))
def planning_greedy_join_order(spark, sf_dir) -> DataFrame:
    """GREEDY JOIN-ORDER selection with an exact certificate — the
    decision System-R's enumerator makes with exactly the statistics
    this family maintains: for the 3-table chain σ(lineitem) ⋈
    σ_urgent(orders) ⋈ σ_building(customer), estimate both first-join
    sizes with the textbook |R|·|S| / max(d_R, d_S) equi-join formula
    (Selinger 1979) and pick the smaller intermediate; the
    certificate recomputes BOTH intermediates exactly and reports
    whether the statistics led to the truly cheaper order.  Every
    estimate is an exact HUGEINT/DECIMAL rational — the estimator's
    own arithmetic is notarized, not just its inputs.

    Scale: the stats legs are count/count-distinct folds (each
    map-side combined); the certificate legs are the two real joins —
    the thing the optimizer exists to avoid running twice, paid here
    by design, ONCE, to grade the estimator.  At 100 TB the
    certificate runs on a sampled extract; the estimator side reads
    only catalog-sized statistics."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    od = t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == _GJO_PRIORITY
    ).select("o_orderkey", "o_custkey")
    cu = t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == _GJO_SEGMENT
    ).select("c_custkey")
    from trafik_etl_modular_spark.operators.pinning import pin

    li, od, cu = pin(li, eager=True), pin(od, eager=True), pin(cu, eager=True)
    stats = (
        li.agg(
            F.count("*").cast("bigint").alias("n_l"),
            F.countDistinct("l_orderkey").cast("bigint").alias("d_l_ok"),
        )
        .crossJoin(
            F.broadcast(
                od.agg(
                    F.count("*").cast("bigint").alias("n_o"),
                    F.countDistinct("o_orderkey").cast("bigint").alias("d_o_ok"),
                    F.countDistinct("o_custkey").cast("bigint").alias("d_o_ck"),
                )
            )
        )
        .crossJoin(
            F.broadcast(cu.agg(F.count("*").cast("bigint").alias("n_c")))
        )
    )
    est = stats.select(
        "n_l",
        "n_o",
        "n_c",
        F.expr(
            "CAST(CAST(n_l AS DECIMAL(38,0)) * n_o"
            " div GREATEST(d_l_ok, d_o_ok) AS BIGINT)"
        ).alias("est_lo"),
        F.expr(
            "CAST(CAST(n_o AS DECIMAL(38,0)) * n_c"
            " div GREATEST(d_o_ck, n_c) AS BIGINT)"
        ).alias("est_oc"),
    )
    lo = li.join(od, li.l_orderkey == od.o_orderkey)
    oc = od.join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
    fin = lo.join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
    x = (
        lo.agg(F.count("*").cast("bigint").alias("exact_lo"))
        .crossJoin(
            F.broadcast(oc.agg(F.count("*").cast("bigint").alias("exact_oc")))
        )
        .crossJoin(
            F.broadcast(fin.agg(F.count("*").cast("bigint").alias("final_rows")))
        )
    )
    return est.crossJoin(F.broadcast(x)).select(
        F.col("n_l").alias("n_lineitem"),
        F.col("n_o").alias("n_orders_filtered"),
        F.col("n_c").alias("n_customers_filtered"),
        "est_lo",
        "est_oc",
        F.when(F.col("est_lo") <= F.col("est_oc"), "lineitem_orders_first")
        .otherwise("orders_customer_first")
        .alias("chosen_first"),
        "exact_lo",
        "exact_oc",
        "final_rows",
        (
            (F.col("est_lo") <= F.col("est_oc"))
            == (F.col("exact_lo") <= F.col("exact_oc"))
        ).alias("choice_correct"),
    )
