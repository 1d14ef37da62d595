"""Data-quality expectations: the validation gate an ingest pipeline
runs before publishing a batch (the reference validates row-by-row in
Python during transform — /root/reference/src/trv/transform.py's
None-guards; here the same checks are set-based aggregates).

Shape for scale: each source table contributes ONE aggregation pass
(conditional sums fused into the scan — adding an expectation adds a
column, not a job), plus one anti-join for referential integrity.
The report is a tall (metric, value) frame: tiny, unioned from
scalar legs, trivially publishable as a quality dashboard table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

_DQ_SQL = """
SELECT 'orders_rows' AS metric, COUNT(*) AS value FROM orders
UNION ALL
SELECT 'orders_null_custkey', COUNT(*) FILTER (WHERE o_custkey IS NULL) FROM orders
UNION ALL
SELECT 'orders_dup_pk', COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
UNION ALL
SELECT 'orders_nonpositive_total', COUNT(*) FILTER (WHERE o_totalprice <= 0) FROM orders
UNION ALL
SELECT 'lineitem_rows', COUNT(*) FROM lineitem
UNION ALL
SELECT 'lineitem_bad_qty', COUNT(*) FILTER (WHERE l_quantity <= 0 OR l_quantity > 50)
FROM lineitem
UNION ALL
SELECT 'lineitem_bad_discount', COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
FROM lineitem
UNION ALL
SELECT 'lineitem_bad_returnflag', COUNT(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R'))
FROM lineitem
UNION ALL
SELECT 'lineitem_orphans', COUNT(*)
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
ORDER BY metric
"""


@query("dq_expectations_report", sql=_DQ_SQL, tags=("quality", "agg"))
def dq_expectations_report(spark, sf_dir):
    """Batch data-quality report: row counts, null/duplicate-PK/range
    violations as conditional counts (ONE scan pass per table — an
    expectation is a column in the agg, not another job), plus
    lineitem→orders referential integrity as a LEFT ANTI join count.
    At 100 TB each leg is a partial-agg scan and the anti-join is the
    same shuffle any fact-fact join pays; the output is 9 rows."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")

    def cnt(cond):
        return F.count(F.when(cond, F.lit(1)))

    o = orders.agg(
        F.count("*").alias("orders_rows"),
        cnt(F.col("o_custkey").isNull()).alias("orders_null_custkey"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("orders_dup_pk"),
        cnt(F.col("o_totalprice") <= 0).alias("orders_nonpositive_total"),
    )
    l = li.agg(
        F.count("*").alias("lineitem_rows"),
        cnt((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50)).alias(
            "lineitem_bad_qty"
        ),
        cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias(
            "lineitem_bad_discount"
        ),
        cnt(~F.col("l_returnflag").isin("A", "N", "R")).alias(
            "lineitem_bad_returnflag"
        ),
    )
    orphans = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count("*").alias("lineitem_orphans"))
    )

    def tall(df):
        cols = df.columns
        stacked = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("metric"), F.col(c).cast("long").alias("value")
                        )
                        for c in cols
                    ]
                )
            ).alias("kv")
        )
        return stacked.select("kv.metric", "kv.value")

    return tall(o).unionByName(tall(l)).unionByName(tall(orphans)).orderBy("metric")


_PROFILE_SQL = """
SELECT 'o_custkey' AS column_name,
       COUNT(*) FILTER (WHERE o_custkey IS NULL) AS n_nulls,
       COUNT(DISTINCT o_custkey) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_orderdate',
       COUNT(*) FILTER (WHERE o_orderdate IS NULL),
       COUNT(DISTINCT o_orderdate),
       strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
       strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
FROM orders
UNION ALL
SELECT 'o_orderkey',
       COUNT(*) FILTER (WHERE o_orderkey IS NULL),
       COUNT(DISTINCT o_orderkey),
       CAST(MIN(o_orderkey) AS VARCHAR),
       CAST(MAX(o_orderkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderpriority',
       COUNT(*) FILTER (WHERE o_orderpriority IS NULL),
       COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority),
       MAX(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_orderstatus',
       COUNT(*) FILTER (WHERE o_orderstatus IS NULL),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus),
       MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_totalprice',
       COUNT(*) FILTER (WHERE o_totalprice IS NULL),
       COUNT(DISTINCT o_totalprice),
       CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
       CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
FROM orders
ORDER BY column_name
"""


@query("dq_profile_columns", sql=_PROFILE_SQL, tags=("quality", "agg"))
def dq_profile_columns(spark, sf_dir):
    """ANALYZE-style column profile of `orders` — null count, EXACT
    distinct count, and canonical-string min/max per column, computed
    in ONE aggregation pass (the multi-distinct agg plans a single
    scan + Expand, not one scan per column; approx profiles swap
    countDistinct for approx_count_distinct and drop the Expand).
    Min/max are canonicalized per type (bigint/string direct,
    timestamp formatted, double via DECIMAL(18,2)) so the tall
    (column, metrics) frame is engine-comparable."""
    o = t(spark, sf_dir, "orders")

    def nulls(c):
        return F.count(F.when(F.col(c).isNull(), F.lit(1)))

    specs = {
        "o_orderkey": (F.min("o_orderkey").cast("string"), F.max("o_orderkey").cast("string")),
        "o_custkey": (F.min("o_custkey").cast("string"), F.max("o_custkey").cast("string")),
        "o_orderstatus": (F.min("o_orderstatus"), F.max("o_orderstatus")),
        "o_totalprice": (
            F.min("o_totalprice").cast("decimal(18,2)").cast("string"),
            F.max("o_totalprice").cast("decimal(18,2)").cast("string"),
        ),
        "o_orderdate": (
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
        ),
        "o_orderpriority": (F.min("o_orderpriority"), F.max("o_orderpriority")),
    }
    # TWO single-row aggregations instead of one combined one — a
    # deliberate plan-shape choice: mixing min(string) (whose agg
    # buffer is not hash-supported) with the multi-distinct rewrite
    # forces the WHOLE Expand output (|cols| × rows) through
    # SortAggregate chains with full-width sorts.  Split, the min/max/
    # null pass is a map-side-combined global agg with no sort, and
    # the distinct pass's Expand aggregates hash-style on long count
    # buffers.  Measured at sf0.1: ~3.0 s → ~1.2 s; at 100 TB the
    # eliminated sorts are O(cols × rows log rows) of pure overhead.
    # The second scan re-reads the same pruned columns — cheaper than
    # sorting the expanded rows even locally, and embarrassingly
    # parallel.  The 1-row × 1-row join is a broadcast-scalar cross
    # join (BNLJ allowlist in tests/test_plans.py).
    stat_aggs = []
    for c, (mn, mx) in specs.items():
        stat_aggs += [
            nulls(c).alias(f"{c}__nulls"),
            mn.alias(f"{c}__min"),
            mx.alias(f"{c}__max"),
        ]
    nd_aggs = [F.countDistinct(c).alias(f"{c}__nd") for c in specs]
    wide = o.agg(*stat_aggs).crossJoin(F.broadcast(o.agg(*nd_aggs)))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                F.col(f"{c}__nd").cast("long").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in specs
        ]
    )
    return (
        wide.select(F.explode(rows).alias("kv"))
        .select("kv.column_name", "kv.n_nulls", "kv.n_distinct", "kv.min_value", "kv.max_value")
        .orderBy("column_name")
    )


_HISTOGRAM_SQL = """
WITH vals AS (SELECT value FROM events WHERE value IS NOT NULL),
mm AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM vals),
binned AS (
  SELECT CASE WHEN mm.hi = mm.lo THEN CAST(0 AS BIGINT)
              ELSE LEAST(CAST(floor((v.value - mm.lo) / (mm.hi - mm.lo) * 20) AS BIGINT),
                         CAST(19 AS BIGINT)) END AS bin,
         v.value
  FROM vals v CROSS JOIN mm
)
SELECT b.bin,
       (mm.lo + CAST(b.bin AS DOUBLE) * ((mm.hi - mm.lo) / 20)) AS bin_lo,
       (mm.lo + (CAST(b.bin AS DOUBLE) + 1) * ((mm.hi - mm.lo) / 20)) AS bin_hi,
       COUNT(*) AS n,
       CAST(SUM(CAST(b.value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
FROM binned b CROSS JOIN mm
GROUP BY b.bin, mm.lo, mm.hi
ORDER BY b.bin
"""


@query("dq_histogram_value", sql=_HISTOGRAM_SQL, tags=("quality", "agg"))
def dq_histogram_value(spark, sf_dir):
    """Equal-width 20-bin histogram of events.value — the profiling
    primitive behind data-drift monitors and ANALYZE histograms.
    Two passes: a global min/max aggregate (1-row broadcast scalar,
    BNLJ allowlist) then one hash aggregation on the bin id; the bin
    edges are derived from (lo, hi, bin) with one fixed expression
    order so both engines emit identical doubles, and the per-bin sum
    is an exact decimal dsum."""
    from trafik_etl_modular_spark.functions.scalars import dsum

    vals = t(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select("value")
    mm = vals.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(20)
    # Degenerate range (all values equal → hi == lo): everything goes
    # to bin 0 instead of dividing by zero, where Spark/DuckDB double
    # semantics (NULL vs inf/NaN) could diverge.  Mirrored as a CASE
    # in the SQL oracle.
    binned = vals.crossJoin(F.broadcast(mm)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * F.lit(20)
                ).cast("bigint"),
                F.lit(19).cast("bigint"),
            )
        )
        .alias("bin"),
        "value",
        "lo",
        "hi",
    )
    return (
        binned.groupBy("bin", "lo", "hi")
        .agg(F.count("*").alias("n"), dsum("value", 4).alias("total_value"))
        .select(
            "bin",
            (F.col("lo") + F.col("bin").cast("double") * width).alias("bin_lo"),
            (F.col("lo") + (F.col("bin").cast("double") + F.lit(1)) * width).alias("bin_hi"),
            "n",
            "total_value",
        )
        .orderBy("bin")
    )


_OUTLIER_SQL = """
WITH vals AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
),
stats AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2
  FROM vals GROUP BY event_type
),
derived AS (
  SELECT event_type, n, s1 / n AS mean,
         CASE WHEN n > 1 THEN sqrt((s2 - s1 * s1 / n) / (n - 1)) END AS std
  FROM stats
)
SELECT d.event_type,
       CAST(d.n AS BIGINT) AS n,
       (CAST(ROUND(d.mean * 1e9) AS BIGINT) / 1e9) AS mean_value,
       (CAST(ROUND(d.std * 1e9) AS BIGINT) / 1e9) AS std_value,
       CAST(COUNT(CASE WHEN abs(v.value - d.mean) > 3 * d.std THEN 1 END)
            AS BIGINT) AS n_outliers
FROM vals v JOIN derived d USING (event_type)
GROUP BY d.event_type, d.n, d.mean, d.std
ORDER BY d.event_type
"""


@query("dq_outlier_report", sql=_OUTLIER_SQL, tags=("quality", "agg"))
def dq_outlier_report(spark, sf_dir):
    """Per-group OUTLIER report (3-sigma rule) — the drift/anomaly
    monitor primitive: mean and std per event_type from EXACT decimal
    first/second moments (partition-order-free; the final mean/std
    are one fixed double-expression each, sqrt is IEEE-exact), then a
    second pass counts values beyond 3 standard deviations using a
    multiplication-form test (no division).  Two hash aggregations +
    one broadcast of the per-group stats; the emitted floats are
    fquant'd."""
    from trafik_etl_modular_spark.functions.scalars import dsum, fquant

    vals = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    stats = vals.groupBy("event_type").agg(
        F.count("*").alias("n"),
        dsum("value", 6).alias("s1"),
        dsum(F.col("value") * F.col("value"), 6).alias("s2"),
    )
    # n == 1 would divide by zero inside the sqrt, where Spark/DuckDB
    # double semantics (NULL vs NaN) diverge — a singleton group gets
    # NULL std (and therefore 0 outliers) on both engines.
    derived = stats.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.when(
            F.col("n") > 1,
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - 1)
            ),
        ).alias("std"),
    )
    return (
        vals.join(F.broadcast(derived), "event_type")
        .groupBy("event_type", "n", "mean", "std")
        .agg(
            F.count(
                F.when(
                    F.abs(F.col("value") - F.col("mean")) > 3 * F.col("std"), 1
                )
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            fquant(F.col("mean")).alias("mean_value"),
            fquant(F.col("std")).alias("std_value"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


_FINGERPRINT_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       bit_xor(('0x' || substring(md5(
         concat_ws('|',
                   COALESCE(CAST(event_id AS VARCHAR), '\\N'),
                   COALESCE(CAST(user_id AS VARCHAR), '\\N'),
                   COALESCE(event_type, '\\N'),
                   COALESCE(strftime(ts, '%Y-%m-%dT%H:%M:%S'), '\\N'),
                   COALESCE(CAST(CAST(value AS DECIMAL(18,4)) AS VARCHAR), '\\N'))
       ), 1, 15))::BIGINT) AS fingerprint
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("dq_table_fingerprint", sql=_FINGERPRINT_SQL, tags=("quality", "agg"))
def dq_table_fingerprint(spark, sf_dir):
    """ORDER-INSENSITIVE table fingerprint per partition key — the
    anti-entropy / replication-verification primitive: every row maps
    to a 60-bit md5-derived hash of its canonical string form, and
    the group fingerprint is their XOR — associative and commutative,
    so ANY partitioning, any engine, any scan order produces the same
    value (and two replicas can be compared by exchanging 5 rows, not
    terabytes).  One map-side-combinable hash aggregation; row
    canonicalization uses only cross-engine-stable formats (integer
    casts, second-truncated ISO timestamp, fixed-scale decimal)."""
    ev = t(spark, sf_dir, "events")
    # concat_ws silently SKIPS nulls in both engines, so rows
    # differing only in WHICH adjacent field is NULL would collide to
    # the same canonical string — coalesce every field to an explicit
    # sentinel first (identically in the oracle).
    nn = lambda c: F.coalesce(c, F.lit("\\N"))  # noqa: E731
    canon = F.concat_ws(
        "|",
        nn(F.col("event_id").cast("string")),
        nn(F.col("user_id").cast("string")),
        nn(F.col("event_type")),
        nn(F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss")),
        nn(F.col("value").cast("decimal(18,4)").cast("string")),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return (
        ev.select("event_type", h.alias("__h"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.expr("bit_xor(__h)").alias("fingerprint"),
        )
        .orderBy("event_type")
    )


_DRIFT_CURSOR = "2024-01-16 00:00:00"

_DRIFT_SQL = f"""
WITH vals AS (
  SELECT event_type, value, (ts < TIMESTAMP '{_DRIFT_CURSOR}') AS is_before
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       COUNT(CASE WHEN is_before THEN value END) AS n_before,
       COUNT(CASE WHEN NOT is_before THEN value END) AS n_after,
       (CAST(SUM(CAST((CASE WHEN is_before THEN value END) AS DECIMAL(38,6))) AS DOUBLE)
          / COUNT(CASE WHEN is_before THEN value END)) AS mean_before,
       (CAST(SUM(CAST((CASE WHEN NOT is_before THEN value END) AS DECIMAL(38,6))) AS DOUBLE)
          / COUNT(CASE WHEN NOT is_before THEN value END)) AS mean_after,
       (abs((CAST(SUM(CAST((CASE WHEN NOT is_before THEN value END) AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(CASE WHEN NOT is_before THEN value END))
            - (CAST(SUM(CAST((CASE WHEN is_before THEN value END) AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(CASE WHEN is_before THEN value END)))
        > CAST(0.05 AS DOUBLE)
          * abs(CAST(SUM(CAST((CASE WHEN is_before THEN value END) AS DECIMAL(38,6))) AS DOUBLE)
                / COUNT(CASE WHEN is_before THEN value END))) AS drifted
FROM vals
GROUP BY event_type
ORDER BY event_type
"""


@query("dq_drift_report", sql=_DRIFT_SQL, tags=("quality", "agg"))
def dq_drift_report(spark, sf_dir):
    """SNAPSHOT-DRIFT monitor — the check a daily ingest runs before
    publishing: split the fact stream at a cursor into before/after
    halves and compare each group's value distribution (counts, exact
    decimal means, a 5%-shift flag).  One conditional-aggregation
    pass over the scan — adding a drift window adds columns, not
    jobs; both means come from exact decimal sums (dsum) so the
    comparison is partition-order-free, and the drift flag is the
    same IEEE expression on both engines."""
    from trafik_etl_modular_spark.functions.scalars import dsum

    cursor = F.lit(_DRIFT_CURSOR).cast("timestamp")
    vals = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "value",
            (F.col("ts").cast("timestamp") < cursor).alias("is_before"),
        )
    )
    before = F.when(F.col("is_before"), F.col("value"))
    after = F.when(~F.col("is_before"), F.col("value"))
    mean_b = dsum(before, 6) / F.count(before)
    mean_a = dsum(after, 6) / F.count(after)
    return (
        vals.groupBy("event_type")
        .agg(
            F.count(before).alias("n_before"),
            F.count(after).alias("n_after"),
            mean_b.alias("mean_before"),
            mean_a.alias("mean_after"),
            (
                F.abs(mean_a - mean_b) > F.lit(0.05) * F.abs(mean_b)
            ).alias("drifted"),
        )
        .orderBy("event_type")
    )


_MAD_SQL = """
WITH vals AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT event_type, COUNT(*) AS n,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
  FROM vals GROUP BY event_type
),
dev AS (
  SELECT v.event_type, m.n, m.med, ABS(v.value - m.med) AS dev
  FROM vals v JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY dev) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(ANY_VALUE(d.n) AS BIGINT) AS n,
       (CAST(ROUND(ANY_VALUE(d.med) * 1e9) AS BIGINT) / 1e9) AS median_value,
       (CAST(ROUND(ANY_VALUE(m.mad) * 1e9) AS BIGINT) / 1e9) AS mad_value,
       CAST(COUNT(CASE WHEN CAST(0.6745 AS DOUBLE) * d.dev
                            > CAST(3.5 AS DOUBLE) * m.mad THEN 1 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


@query("dq_mad_outliers", sql=_MAD_SQL, tags=("quality", "agg", "percentile"))
def dq_mad_outliers(spark, sf_dir):
    """ROBUST per-group outlier report via median absolute deviation
    (Iglewicz–Hoaglin modified z-score: |0.6745·(x − med)/MAD| > 3.5)
    — the companion to dq_outlier_report's 3-sigma rule for columns
    where outliers themselves corrupt mean/std (a single 10⁹ spike
    inflates σ until nothing is an outlier; the median and MAD don't
    move).  Two exact grouped percentiles (F.percentile ↔
    percentile_cont, the bit-identical pair agg_exact_median_iqr
    pins) with the per-group scalars broadcast back between passes;
    the outlier test is multiplication-form (no division, NULL-safe
    when MAD is NULL-degenerate).  Exact per-group median sorts
    within groups — bounded group cardinality here; the sketch path
    at open-ended scale is agg_approx_percentile_value."""
    from trafik_etl_modular_spark.functions.scalars import fquant

    vals = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    med = vals.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.percentile("value", F.lit(0.5)).alias("med"),
    )
    dev = vals.join(F.broadcast(med), "event_type").select(
        "event_type", "n", "med", F.abs(F.col("value") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("n").cast("bigint").alias("n"),
            fquant(F.any_value("med")).alias("median_value"),
            fquant(F.any_value("mad")).alias("mad_value"),
            F.count(
                F.when(
                    F.lit(0.6745) * F.col("dev") > F.lit(3.5) * F.col("mad"), 1
                )
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# Norm over the vector's OWN length (ragged-safe), computed only for
# finite vectors — a NaN/inf component would otherwise poison the
# decimal-exact mean the report publishes.
_EMB_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(1, len(embedding) + 1), "
    "i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)), "
    "(x, y) -> x + y))"
)

_EMB_PROFILE_SQL = f"""
WITH e AS (
  SELECT vec_id,
         len(embedding) AS n_dim,
         len(list_filter(embedding,
             x -> isnan(x::DOUBLE) OR NOT isfinite(x::DOUBLE))) AS n_bad,
         CASE WHEN len(list_filter(embedding,
                  x -> isnan(x::DOUBLE) OR NOT isfinite(x::DOUBLE))) > 0
              THEN NULL ELSE {_EMB_NORM} END AS nrm
  FROM embeddings
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(MIN(n_dim) AS INTEGER) AS dim_min,
       CAST(MAX(n_dim) AS INTEGER) AS dim_max,
       CAST(COUNT(*) FILTER (WHERE n_bad > 0) AS BIGINT) AS n_nonfinite_vectors,
       CAST(COUNT(*) FILTER (WHERE nrm = 0) AS BIGINT) AS n_zero_vectors,
       (CAST(ROUND(MIN(nrm) * 1e9) AS BIGINT) / 1e9) AS norm_min,
       (CAST(ROUND(MAX(nrm) * 1e9) AS BIGINT) / 1e9) AS norm_max,
       CASE WHEN COUNT(nrm) > 0 THEN
         (CAST(ROUND((CAST(SUM(CAST((CAST(ROUND(nrm * 1e9) AS BIGINT) / 1e9)
            AS DECIMAL(38,9))) AS DOUBLE)
            / COUNT(nrm)) * 1e9) AS BIGINT) / 1e9) END AS norm_mean
FROM e
"""


@query("dq_embedding_profile", sql=_EMB_PROFILE_SQL, tags=("dq", "llmdata", "similarity"))
def dq_embedding_profile(spark, sf_dir):
    """VECTOR-COLUMN data quality — the gate an embedding lake runs
    before an index build trusts a new snapshot (every downstream
    similarity operator assumes finite, non-degenerate, fixed-dim
    vectors; this is where that assumption becomes a CHECKED
    expectation): vector count, dimension min/max (a ragged column is
    a pipeline bug), non-finite-component vectors, zero-norm vectors
    (cosine is undefined on them), and the norm min/max/mean.  One
    fused aggregation pass over the corpus — adding an expectation
    adds a column, not a job (same shape as dq_expectations_report).
    Norm mean goes through an exact decimal sum (dsum) so
    partition-parallel summation matches DuckDB's sequential sum;
    norms themselves are the strict-fold dot, parity-pinned by the
    similarity family."""
    from trafik_etl_modular_spark.functions.scalars import dsum, fquant
    from trafik_etl_modular_spark.llmdata.similarity import l2norm, to_double_array

    emb = t(spark, sf_dir, "embeddings")
    v = to_double_array("embedding")
    bad = F.exists(
        v, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    e = emb.select(
        F.size("embedding").alias("n_dim"),
        bad.alias("is_bad"),
        # norm only for finite vectors — NaN/inf must not reach the
        # decimal-exact mean (ANSI decimal cast of NaN is an error,
        # and the report exists precisely because such rows occur)
        F.when(~bad, l2norm(v)).alias("nrm"),
    )
    return e.agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.min("n_dim").cast("int").alias("dim_min"),
        F.max("n_dim").cast("int").alias("dim_max"),
        F.count(F.when(F.col("is_bad"), 1)).cast("bigint").alias("n_nonfinite_vectors"),
        F.count(F.when(F.col("nrm") == 0, 1)).cast("bigint").alias("n_zero_vectors"),
        fquant(F.min("nrm")).alias("norm_min"),
        fquant(F.max("nrm")).alias("norm_max"),
        # fquant-snap before the decimal cast (the
        # sim_centroids_by_label lesson: raw double→decimal casts
        # round half-boundary values differently across engines)
        fquant(
            F.when(
                F.count("nrm") > 0,
                dsum(fquant(F.col("nrm")), 9) / F.count("nrm"),
            )
        ).alias("norm_mean"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit conformance (fraud / synthetic-data screen)
# ---------------------------------------------------------------------------

# log10(1 + 1/d) on the e9 integer grid — identical literals on both
# engines, so expected counts are pure BIGINT arithmetic.
_BENFORD_E9 = [
    (1, 301029996),
    (2, 176091259),
    (3, 124938737),
    (4, 96910013),
    (5, 79181246),
    (6, 66946790),
    (7, 57991947),
    (8, 51152522),
    (9, 45757491),
]

_BENFORD_SQL = f"""
WITH expect(digit, p_e9) AS (
  VALUES {", ".join(f"({d}, {p})" for d, p in _BENFORD_E9)}
),
cents AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
  WHERE o_totalprice > 0
),
obs AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM cents GROUP BY 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cents),
rows_ AS (
  SELECT e.digit,
         COALESCE(o.n_obs, 0) AS n_obs,
         t.n * e.p_e9 AS expected_e9
  FROM expect e LEFT JOIN obs o ON e.digit = o.digit CROSS JOIN tot t
),
contrib AS (
  SELECT digit, n_obs, expected_e9,
         {{fq_contrib}} AS chi2_contrib
  FROM rows_
),
total AS (
  SELECT CAST(SUM(CAST(chi2_contrib AS DECIMAL(38,9))) AS DOUBLE) AS chi2_total
  FROM contrib
)
SELECT digit, n_obs, expected_e9, chi2_contrib,
       t2.chi2_total,
       (t2.chi2_total > CAST(15.507 AS DOUBLE)) AS benford_reject
FROM contrib CROSS JOIN total t2
ORDER BY digit
"""

# dev and exp reconstructed from exact BIGINTs (all < 2^53, so the
# double casts are exact); the division and square are single IEEE
# ops — identical on both engines — and the emitted value is
# fquant-snapped so its decimal cast (for the windowed total) can
# never face a half boundary.
_FQ_CONTRIB = (
    "(CAST(ROUND(((CAST(n_obs * 1000000000 - expected_e9 AS DOUBLE) / 1e9)"
    " * (CAST(n_obs * 1000000000 - expected_e9 AS DOUBLE) / 1e9)"
    " / (CAST(expected_e9 AS DOUBLE) / 1e9)) * 1e9) AS BIGINT) / 1e9)"
)
_BENFORD_SQL = _BENFORD_SQL.replace("{fq_contrib}", _FQ_CONTRIB)


@query("dq_benford_digit_test", sql=_BENFORD_SQL, tags=("quality", "agg"))
def dq_benford_digit_test(spark, sf_dir):
    """Benford first-significant-digit conformance over order totals:
    observed digit counts vs log10(1+1/d) expectation plus the
    chi-square statistic and a reject verdict at the 0.05 / df=8
    critical value (15.507) — the standard screen for fabricated or
    truncated financial populations (Benford 1938; Nigrini 1996,
    public literature).  TPC-H totals are sums of uniformly priced
    parts, NOT Benford-distributed, so the verdict is expected to
    REJECT — the operator's value is the statistic, not a pass.

    Determinism: first digits come from an exact integer-cents
    round-trip (prices are 2-dp doubles, the dsum(…,2) premise), the
    expectation is BIGINT arithmetic on e9-grid literals, each
    chi-square contribution is built from exact-in-double integers
    with two IEEE ops then fquant-snapped, and the total is an exact
    decimal sum of snapped values — no cross-engine float hazard
    anywhere.  Scale: one map-side digit projection + a 9-group
    aggregate; the digit table is a 9-row broadcast and the total a
    1-row broadcast cross join."""
    from trafik_etl_modular_spark.functions.scalars import fquant

    orders = t(spark, sf_dir, "orders")
    cents = orders.where(F.col("o_totalprice") > 0).select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    )
    obs = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit")
    ).groupBy("digit").agg(F.count("*").cast("bigint").alias("n_obs"))
    expect = spark.createDataFrame(_BENFORD_E9, "digit int, p_e9 bigint")
    tot = cents.agg(F.count("*").cast("bigint").alias("n"))
    rows = (
        expect.join(obs, "digit", "left")
        .crossJoin(tot)
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0).cast("bigint")).alias("n_obs"),
            (F.col("n") * F.col("p_e9")).alias("expected_e9"),
        )
    )
    dev = (F.col("n_obs") * F.lit(1000000000) - F.col("expected_e9")).cast("double") / F.lit(1e9)
    exp_d = F.col("expected_e9").cast("double") / F.lit(1e9)
    contrib = rows.select(
        "digit", "n_obs", "expected_e9", fquant(dev * dev / exp_d).alias("chi2_contrib")
    )
    from pyspark.sql import types as T

    # exact decimal total via a parallel aggregate + 1-row cross join
    # (a global window would violate the registry-wide plan invariant,
    # even over 9 rows)
    total = contrib.agg(
        F.sum(F.col("chi2_contrib").cast(T.DecimalType(38, 9)))
        .cast("double")
        .alias("chi2_total")
    )
    return (
        contrib.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            "expected_e9",
            "chi2_contrib",
            "chi2_total",
            (F.col("chi2_total") > F.lit(15.507)).alias("benford_reject"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition anomaly report (day-of-week baseline)
# ---------------------------------------------------------------------------

_SEASONAL_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
keyed AS (
  SELECT day, n,
         CAST((day - DATE '1970-01-01') % 7 AS BIGINT) AS dow
  FROM daily
),
baseline AS (
  SELECT dow,
         CAST((SUM(n) * 1000000) // COUNT(*) AS BIGINT) AS baseline_e6,
         CAST(COUNT(*) AS BIGINT) AS n_days_dow
  FROM keyed GROUP BY dow
)
SELECT k.day, k.dow, k.n, b.n_days_dow, b.baseline_e6,
       CAST(k.n * 1000000 - b.baseline_e6 AS BIGINT) AS residual_e6,
       (abs(k.n * 1000000 - b.baseline_e6) * 2 > b.baseline_e6) AS is_anomaly
FROM keyed k JOIN baseline b ON b.dow = k.dow
ORDER BY k.day
"""


@query("dq_seasonal_decompose", sql=_SEASONAL_SQL, tags=("quality", "agg", "timeseries"))
def dq_seasonal_decompose(spark, sf_dir):
    """Seasonal-baseline anomaly report over the daily event volume:
    decompose each day's count into a DAY-OF-WEEK baseline (the mean
    daily count for that weekday, e6-scaled exact integer division)
    plus a residual, and flag days whose residual exceeds ±50% of
    their weekday's own baseline.  Weekly periodicity is the dominant
    seasonality in event telemetry; a flat global band (the
    etl_job/`check_row_volume` guard, reference cli.py:20-21) false-
    alarms every weekend when traffic has weekly shape — this report
    is the seasonal form of the same plausibility guard.

    Cross-engine notes: day-of-week is computed as epoch-day mod 7
    (Spark's dayofweek() is 1-based Sunday, DuckDB's 0-based — the
    neutral arithmetic sidesteps the convention mismatch), and the
    baseline is an exact integer division, never a float mean.

    Scale: one hash aggregation events→daily (the only shuffle that
    sees data), then a 7-row baseline broadcast back onto ~days rows."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    keyed = daily.withColumn(
        "dow", (F.datediff("day", F.lit("1970-01-01")) % 7).cast("bigint")
    )
    baseline = keyed.groupBy("dow").agg(
        F.expr("CAST((sum(n) * 1000000) div count(*) AS BIGINT)").alias("baseline_e6"),
        F.count("*").cast("bigint").alias("n_days_dow"),
    )
    out = keyed.join(F.broadcast(baseline), "dow")
    resid = (F.col("n") * F.lit(1000000) - F.col("baseline_e6")).cast("bigint")
    return out.select(
        "day",
        "dow",
        "n",
        "n_days_dow",
        "baseline_e6",
        resid.alias("residual_e6"),
        (F.abs(resid) * 2 > F.col("baseline_e6")).alias("is_anomaly"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# CUSUM changepoint detection over the daily series
# ---------------------------------------------------------------------------

_CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
stats AS (
  SELECT CAST((SUM(n) * 1000000) // COUNT(*) AS BIGINT) AS mean_e6 FROM daily
),
dev AS (
  SELECT day, n, s.mean_e6,
         CAST(n * 1000000 - s.mean_e6 AS BIGINT) AS d_e6
  FROM daily CROSS JOIN stats s
),
pfx AS (
  SELECT day, n, mean_e6,
         CAST(SUM(d_e6) OVER (
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS p_e6
  FROM dev
)
SELECT day, n, mean_e6, p_e6,
       CAST(p_e6 - LEAST(MIN(p_e6) OVER (
         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 0) AS BIGINT) AS s_e6,
       (p_e6 - LEAST(MIN(p_e6) OVER (
         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 0) > 2 * mean_e6) AS changepoint
FROM pfx
ORDER BY day
"""


@query("dq_cusum_changepoint", sql=_CUSUM_SQL, tags=("quality", "agg", "timeseries"))
def dq_cusum_changepoint(spark, sf_dir):
    """One-sided CUSUM changepoint detector (Page 1954, public
    literature) over daily event volume: the recursive statistic
    S_t = max(0, S_{t−1} + (x_t − μ)) is rewritten in its PREFIX form
    S_t = P_t − min(0, min_{j≤t} P_j) with P the running sum of
    deviations — recursion becomes two cumulative window functions, so
    the sequential-looking detector is expressible declaratively.  A
    day flags when the cumulative excess exceeds two average days
    (h = 2μ).  All arithmetic is e6-scaled exact integers (μ by exact
    integer division), so both engines agree bit-for-bit.

    Scale: the only data-sized stage is the events→daily hash
    aggregation; the cumulative windows run over the DAILY frame
    (O(days) rows — the benign above-an-aggregate global-window shape
    the plan invariant allows).  For a multi-year series you'd
    partition the window by (metric, year) and chain boundary
    offsets."""
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    stats = daily.agg(
        F.expr("CAST((sum(n) * 1000000) div count(*) AS BIGINT)").alias("mean_e6")
    )
    dev = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n",
        "mean_e6",
        (F.col("n") * F.lit(1000000) - F.col("mean_e6")).cast("bigint").alias("d_e6"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pfx = dev.withColumn("p_e6", F.sum("d_e6").over(w).cast("bigint"))
    s = (F.col("p_e6") - F.least(F.min("p_e6").over(w), F.lit(0).cast("bigint"))).cast(
        "bigint"
    )
    return pfx.select(
        "day",
        "n",
        "mean_e6",
        "p_e6",
        s.alias("s_e6"),
        (s > F.lit(2) * F.col("mean_e6")).alias("changepoint"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Chi-square test of independence (round 11)
# ---------------------------------------------------------------------------

# 0.05 critical value at df = (5 types − 1)(7 dows − 1) = 24
_CHI2_INDEP_CRIT = 36.415

_CHI2_INDEP_SQL = """
WITH base AS (
  SELECT event_type,
         CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT) AS dow
  FROM events
),
obs AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM base GROUP BY event_type, dow
),
rowt AS (SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS r FROM obs GROUP BY event_type),
colt AS (SELECT dow, CAST(SUM(n_obs) AS BIGINT) AS c FROM obs GROUP BY dow),
tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs),
cells AS (
  SELECT rt.event_type, ct.dow,
         COALESCE(o.n_obs, 0) AS n_obs,
         CAST((CAST(rt.r AS HUGEINT) * ct.c * 1000000000) // t.n AS BIGINT)
           AS expected_e9
  FROM rowt rt CROSS JOIN colt ct CROSS JOIN tot t
  LEFT JOIN obs o ON o.event_type = rt.event_type AND o.dow = ct.dow
),
contrib AS (
  SELECT event_type, dow, n_obs, expected_e9,
         (CAST(ROUND(((CAST(n_obs * 1000000000 - expected_e9 AS DOUBLE) / 1e9)
          * (CAST(n_obs * 1000000000 - expected_e9 AS DOUBLE) / 1e9)
          / (CAST(expected_e9 AS DOUBLE) / 1e9)) * 1e9) AS BIGINT) / 1e9)
           AS chi2_contrib
  FROM cells
),
total AS (
  SELECT CAST(SUM(CAST(chi2_contrib AS DECIMAL(38,9))) AS DOUBLE) AS chi2_total
  FROM contrib
)
SELECT c.event_type, c.dow, c.n_obs, c.expected_e9, c.chi2_contrib,
       t2.chi2_total,
       (t2.chi2_total > CAST(36.415 AS DOUBLE)) AS independence_reject
FROM contrib c CROSS JOIN total t2
ORDER BY c.event_type, c.dow
"""


@query("dq_chi2_independence", sql=_CHI2_INDEP_SQL, tags=("quality", "agg"))
def dq_chi2_independence(spark, sf_dir):
    """Chi-square test of INDEPENDENCE between event type and
    day-of-week — the contingency-table companion of the Benford
    goodness-of-fit screen: expected cell counts from the marginal
    products (r·c/N, floored onto the e9 integer grid — identical
    integer division in both engines), per-cell contributions built
    from exact-in-double integers with two IEEE ops then
    fquant-snapped, exact-decimal total, reject verdict at the 0.05 /
    df=24 critical value ({crit}).  A synthetic uniform event stream
    should NOT reject; a real product's signups spiking on Mondays
    would — the drift detector for categorical-mix-by-time.

    Determinism: dow is epoch-day mod 7 (the seasonal-decompose
    lesson — engine weekday builtins disagree on numbering), and the
    whole statistic follows the proven Benford recipe.  Scale: one
    hash aggregation to the |types|×|dows| table; marginals and the
    total are aggregations OF THE CELLS, never rescans; everything
    after is arithmetic on ≤35 rows.  Overflow (ADVICE r11): the
    r·c·1e9 product is computed in DECIMAL(38,0) (Spark) / HUGEINT
    (DuckDB) so it can never wrap; the remaining int64 boundary is
    the expected_e9 QUOTIENT itself (≤ min(r,c)·1e9), loudly guarded
    below at min(max_r, max_c) < 2^63/1e9 ≈ 9.2e9 events per
    smallest-side marginal — past that the e9 grid itself must widen.
    The exact-in-double premise for the contributions holds on the
    same guarded bound."""
    from pyspark.sql import types as T

    from trafik_etl_modular_spark.functions.scalars import fquant
    from trafik_etl_modular_spark.operators.pinning import pin

    ev = t(spark, sf_dir, "events")
    obs = pin(
        ev.select(
            "event_type",
            (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 7)
            .cast("bigint")
            .alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count("*").cast("bigint").alias("n_obs")),
        eager=True,
    )
    rowt = obs.groupBy("event_type").agg(F.sum("n_obs").cast("bigint").alias("r"))
    colt = obs.groupBy("dow").agg(F.sum("n_obs").cast("bigint").alias("c"))
    tot = obs.agg(F.sum("n_obs").cast("bigint").alias("n"))
    # Loud quotient guard (ADVICE r11, the _check_lpa_radix pattern):
    # expected_e9 ≤ min(r,c)·1e9 must fit a signed long on the Spark
    # leg (DuckDB would raise on the BIGINT cast; Spark's `div` wraps
    # silently).  One tiny job over the pinned ≤35-row cell frame.
    _m = rowt.agg(F.max("r").alias("mr")).crossJoin(
        colt.agg(F.max("c").alias("mc"))
    ).first()
    if _m["mr"] is not None and min(_m["mr"], _m["mc"]) >= (1 << 63) // 10**9:
        raise ValueError(
            "dq_chi2_independence: smallest-side marginal "
            f"{min(_m['mr'], _m['mc'])} puts expected_e9 past int64; "
            "widen the e9 grid to DECIMAL(38,9) on both engines"
        )
    cells = (
        rowt.crossJoin(F.broadcast(colt))
        .crossJoin(F.broadcast(tot))
        .join(obs, ["event_type", "dow"], "left")
        .select(
            "event_type",
            "dow",
            F.coalesce("n_obs", F.lit(0).cast("bigint")).alias("n_obs"),
            F.expr("(CAST(r AS DECIMAL(38,0)) * c * 1000000000) div n").alias(
                "expected_e9"
            ),
        )
    )
    dev = (
        F.col("n_obs") * F.lit(1000000000) - F.col("expected_e9")
    ).cast("double") / F.lit(1e9)
    exp_d = F.col("expected_e9").cast("double") / F.lit(1e9)
    contrib = cells.select(
        "event_type",
        "dow",
        "n_obs",
        "expected_e9",
        fquant(dev * dev / exp_d).alias("chi2_contrib"),
    )
    from trafik_etl_modular_spark.operators.pinning import pin as _pin

    contrib = _pin(contrib, eager=False)
    total = contrib.agg(
        F.sum(F.col("chi2_contrib").cast(T.DecimalType(38, 9)))
        .cast("double")
        .alias("chi2_total")
    )
    return (
        contrib.crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "dow",
            "n_obs",
            "expected_e9",
            "chi2_contrib",
            "chi2_total",
            (F.col("chi2_total") > F.lit(_CHI2_INDEP_CRIT)).alias(
                "independence_reject"
            ),
        )
        .orderBy("event_type", "dow")
    )


dq_chi2_independence.__doc__ = dq_chi2_independence.__doc__.format(
    crit=_CHI2_INDEP_CRIT
)


# ---------------------------------------------------------------------------
# Referential-integrity audit (round 11)
# ---------------------------------------------------------------------------

_REF_INTEGRITY_SQL = """
WITH o_orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
),
l_orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
),
c_orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
),
dormant AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
),
vol AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_lineitems,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_customers
)
SELECT v.n_orders, v.n_lineitems, v.n_customers,
       o.n AS n_childless_orders,
       l.n AS n_orphan_lineitems,
       c.n AS n_orders_bad_custkey,
       d.n AS n_dormant_customers,
       (l.n = 0 AND c.n = 0) AS fk_integrity_ok
FROM vol v CROSS JOIN o_orphans o CROSS JOIN l_orphans l
CROSS JOIN c_orphans c CROSS JOIN dormant d
"""


@query("dq_referential_integrity", sql=_REF_INTEGRITY_SQL, tags=("quality", "join"))
def dq_referential_integrity(spark, sf_dir):
    """Referential-integrity audit across the fact/dimension FK paths
    — the lakehouse has no FOREIGN KEY enforcement, so this query IS
    the constraint: orphan lineitems (child without parent — a real
    violation), orders with dangling custkeys (violation), childless
    orders and dormant customers (legal but reported), plus the
    `fk_integrity_ok` verdict over the two true constraints.  The
    audit every ingest pipeline schedules after a backfill.

    Scale: each orphan check is one ANTI join on the key (Spark plans
    left_anti — no row fan-out, shuffle on the key, map-side
    distinct-able); volumes are metadata-cheap counts; output is 1
    row.  On partitioned tables the anti joins prune to the
    backfilled partitions first."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cust = t(spark, sf_dir, "customer")
    o_orphans = orders.join(
        li.select("l_orderkey").distinct(),
        orders["o_orderkey"] == F.col("l_orderkey"),
        "left_anti",
    ).agg(F.count("*").cast("bigint").alias("n_childless_orders"))
    l_orphans = li.join(
        orders.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count("*").cast("bigint").alias("n_orphan_lineitems"))
    c_orphans = orders.join(
        cust.select("c_custkey"),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_anti",
    ).agg(F.count("*").cast("bigint").alias("n_orders_bad_custkey"))
    dormant = cust.join(
        orders.select("o_custkey").distinct(),
        cust["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    ).agg(F.count("*").cast("bigint").alias("n_dormant_customers"))
    vol = (
        orders.agg(F.count("*").cast("bigint").alias("n_orders"))
        .crossJoin(li.agg(F.count("*").cast("bigint").alias("n_lineitems")))
        .crossJoin(cust.agg(F.count("*").cast("bigint").alias("n_customers")))
    )
    return (
        vol.crossJoin(F.broadcast(o_orphans))
        .crossJoin(F.broadcast(l_orphans))
        .crossJoin(F.broadcast(c_orphans))
        .crossJoin(F.broadcast(dormant))
        .select(
            "n_orders",
            "n_lineitems",
            "n_customers",
            "n_childless_orders",
            "n_orphan_lineitems",
            "n_orders_bad_custkey",
            "n_dormant_customers",
            (
                (F.col("n_orphan_lineitems") == 0)
                & (F.col("n_orders_bad_custkey") == 0)
            ).alias("fk_integrity_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Chi-square test of homogeneity (round 12)
# ---------------------------------------------------------------------------

# 0.05 critical value at df = (2 periods − 1)(5 types − 1) = 4
_CHI2_HOMOG_CRIT = 9.488

_CHI2_HOMOG_SQL = """
WITH span AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS dmax FROM events),
base AS (
  SELECT CASE WHEN CAST(e.ts AS DATE) < s.d0 + CAST((s.dmax - s.d0 + 1) // 2 AS INTEGER)
              THEN 'early' ELSE 'late' END AS period,
         e.event_type
  FROM events e CROSS JOIN span s
),
obs AS (
  SELECT period, event_type, CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM base GROUP BY period, event_type
),
rowt AS (SELECT period, CAST(SUM(n_obs) AS BIGINT) AS r FROM obs GROUP BY period),
colt AS (SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS c FROM obs GROUP BY event_type),
tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs),
cells AS (
  SELECT rt.period, ct.event_type,
         COALESCE(o.n_obs, 0) AS n_obs,
         CAST((CAST(rt.r AS HUGEINT) * ct.c * 1000000000) // t.n AS BIGINT)
           AS expected_e9
  FROM rowt rt CROSS JOIN colt ct CROSS JOIN tot t
  LEFT JOIN obs o ON o.period = rt.period AND o.event_type = ct.event_type
),
contrib AS (
  SELECT period, event_type, n_obs, expected_e9,
         (CAST(ROUND(((CAST(n_obs * 1000000000 - expected_e9 AS DOUBLE) / 1e9)
          * (CAST(n_obs * 1000000000 - expected_e9 AS DOUBLE) / 1e9)
          / (CAST(expected_e9 AS DOUBLE) / 1e9)) * 1e9) AS BIGINT) / 1e9)
           AS chi2_contrib
  FROM cells
),
total AS (
  SELECT CAST(SUM(CAST(chi2_contrib AS DECIMAL(38,9))) AS DOUBLE) AS chi2_total
  FROM contrib
)
SELECT c.period, c.event_type, c.n_obs, c.expected_e9, c.chi2_contrib,
       t2.chi2_total,
       (t2.chi2_total > CAST(9.488 AS DOUBLE)) AS drift_reject
FROM contrib c CROSS JOIN total t2
ORDER BY c.period, c.event_type
"""


@query("dq_chi2_homogeneity", sql=_CHI2_HOMOG_SQL, tags=("quality", "agg"))
def dq_chi2_homogeneity(spark, sf_dir):
    """Chi-square test of HOMOGENEITY between the event-type mixes of
    the first and second halves of the day span — the TWO-SAMPLE
    drift test (the log-free stand-in for PSI, whose ln() is banned
    on oracle surfaces): same contingency machinery as
    dq_chi2_independence but with the samples (periods) as the row
    dimension, answering "did the categorical mix CHANGE?" rather
    than "are the dimensions associated?".  Expected counts on the e9
    integer grid with HUGEINT/DECIMAL(38,0) products from birth (the
    ADVICE r11 widening), contributions exact-in-double then
    fquant-snapped, exact-decimal total, verdict at the 0.05 / df=4
    critical value ({crit}).

    Scale: one hash aggregation to the 2×|types| table (the period
    split rides a broadcast 1-row span frame); marginals and the
    total aggregate THE CELLS; arithmetic on ≤10 rows after."""
    from pyspark.sql import types as T

    from trafik_etl_modular_spark.functions.scalars import fquant
    from trafik_etl_modular_spark.operators.pinning import pin

    ev = t(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("dmax")
    )
    obs = pin(
        ev.crossJoin(F.broadcast(span))
        .select(
            F.when(
                F.to_date("ts")
                < F.expr("d0 + CAST((datediff(dmax, d0) + 1) div 2 AS INT)"),
                F.lit("early"),
            )
            .otherwise(F.lit("late"))
            .alias("period"),
            "event_type",
        )
        .groupBy("period", "event_type")
        .agg(F.count("*").cast("bigint").alias("n_obs")),
        eager=True,
    )
    rowt = obs.groupBy("period").agg(F.sum("n_obs").cast("bigint").alias("r"))
    colt = obs.groupBy("event_type").agg(F.sum("n_obs").cast("bigint").alias("c"))
    tot = obs.agg(F.sum("n_obs").cast("bigint").alias("n"))
    cells = (
        rowt.crossJoin(F.broadcast(colt))
        .crossJoin(F.broadcast(tot))
        .join(obs, ["period", "event_type"], "left")
        .select(
            "period",
            "event_type",
            F.coalesce("n_obs", F.lit(0).cast("bigint")).alias("n_obs"),
            F.expr("(CAST(r AS DECIMAL(38,0)) * c * 1000000000) div n").alias(
                "expected_e9"
            ),
        )
    )
    dev = (
        F.col("n_obs") * F.lit(1000000000) - F.col("expected_e9")
    ).cast("double") / F.lit(1e9)
    exp_d = F.col("expected_e9").cast("double") / F.lit(1e9)
    contrib = pin(
        cells.select(
            "period",
            "event_type",
            "n_obs",
            "expected_e9",
            fquant(dev * dev / exp_d).alias("chi2_contrib"),
        ),
        eager=False,
    )
    total = contrib.agg(
        F.sum(F.col("chi2_contrib").cast(T.DecimalType(38, 9)))
        .cast("double")
        .alias("chi2_total")
    )
    return (
        contrib.crossJoin(F.broadcast(total))
        .select(
            "period",
            "event_type",
            "n_obs",
            "expected_e9",
            "chi2_contrib",
            "chi2_total",
            (F.col("chi2_total") > F.lit(_CHI2_HOMOG_CRIT)).alias("drift_reject"),
        )
        .orderBy("period", "event_type")
    )


dq_chi2_homogeneity.__doc__ = dq_chi2_homogeneity.__doc__.format(
    crit=_CHI2_HOMOG_CRIT
)


# ---------------------------------------------------------------------------
# Kolmogorov–Smirnov two-sample test (round 12)
# ---------------------------------------------------------------------------

_KS_SQL = """
WITH span AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS dmax FROM events),
tagged AS (
  SELECT CAST(e.value AS DECIMAL(38,2)) AS v,
         CASE WHEN CAST(e.ts AS DATE)
                   < s.d0 + CAST((s.dmax - s.d0 + 1) // 2 AS INTEGER)
              THEN 1 ELSE 0 END AS early
  FROM events e CROSS JOIN span s
),
hist AS (
  SELECT v,
         CAST(SUM(early) AS BIGINT) AS c1,
         CAST(SUM(1 - early) AS BIGINT) AS c2
  FROM tagged GROUP BY v
),
cum AS (
  SELECT v,
         SUM(c1) OVER (ORDER BY v) AS f1,
         SUM(c2) OVER (ORDER BY v) AS f2,
         (SELECT SUM(c1) FROM hist) AS n1,
         (SELECT SUM(c2) FROM hist) AS n2
  FROM hist
),
d AS (
  SELECT CAST(MAX(n1) AS BIGINT) AS n_early,
         CAST(MAX(n2) AS BIGINT) AS n_late,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_values,
         CAST(MAX((ABS(CAST(f1 AS HUGEINT) * n2 - CAST(f2 AS HUGEINT) * n1)
                   * 1000000)
                  // (CAST(n1 AS HUGEINT) * n2)) AS BIGINT) AS ks_d_e6
  FROM cum
)
SELECT n_early, n_late, n_distinct_values, ks_d_e6,
       (CAST(ROUND((CAST(1.36 AS DOUBLE)
         * sqrt((CAST(n_early AS DOUBLE) + CAST(n_late AS DOUBLE))
                / (CAST(n_early AS DOUBLE) * CAST(n_late AS DOUBLE)))) * 1e9)
         AS BIGINT) / 1e9) AS crit_q,
       (CAST(ks_d_e6 AS DOUBLE) / CAST(1000000 AS DOUBLE)
        > (CAST(ROUND((CAST(1.36 AS DOUBLE)
           * sqrt((CAST(n_early AS DOUBLE) + CAST(n_late AS DOUBLE))
                  / (CAST(n_early AS DOUBLE) * CAST(n_late AS DOUBLE)))) * 1e9)
           AS BIGINT) / 1e9)) AS distributions_differ
FROM d
"""


@query("dq_ks_two_sample", sql=_KS_SQL, tags=("quality", "agg"))
def dq_ks_two_sample(spark, sf_dir):
    """KOLMOGOROV–SMIRNOV two-sample test on the event-value
    distribution, first half of the day span vs the second — the
    CONTINUOUS-column drift detector beside dq_chi2_homogeneity's
    categorical one: D = max |F̂₁(v) − F̂₂(v)| over the merged ECDF,
    computed as the EXACT integer max of |f₁·n₂ − f₂·n₁| over the
    common denominator n₁·n₂ (e6 floor, HUGEINT/DECIMAL(38,0)
    products), so the supremum cannot be blurred by float
    accumulation.  Values land on the cents grid (DECIMAL(38,2)) so
    both engines group and order identically.  Verdict at the
    α=0.05 large-sample critical value 1.36·√((n₁+n₂)/(n₁n₂)) — the
    only doubles, cast/·/√ then the e9 grid.

    Scale: one (value, period) hash agg to the VALUE HISTOGRAM
    (cents-domain-bounded), cumulative windows over that histogram —
    never the raw rows; at lake scale a continuous column pre-bins to
    a fixed grid first and D is exact on the binned ECDF."""
    from pyspark.sql import Window as W

    from trafik_etl_modular_spark.functions.scalars import fquant
    from trafik_etl_modular_spark.operators.pinning import pin

    ev = t(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("dmax")
    )
    tagged = ev.crossJoin(F.broadcast(span)).select(
        F.expr("CAST(value AS DECIMAL(38,2))").alias("v"),
        F.when(
            F.to_date("ts")
            < F.expr("d0 + CAST((datediff(dmax, d0) + 1) div 2 AS INT)"),
            1,
        )
        .otherwise(0)
        .alias("early"),
    )
    # NOT pinned: the histogram has exactly one consumer (the four
    # windows below share one pass), and a lineage cut here would
    # hide the bounding Aggregate from the global-window invariant
    hist = tagged.groupBy("v").agg(
        F.sum("early").cast("bigint").alias("c1"),
        F.sum(F.lit(1) - F.col("early")).cast("bigint").alias("c2"),
    )
    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.select(
        F.sum("c1").over(wv).alias("f1"),
        F.sum("c2").over(wv).alias("f2"),
        F.sum("c1").over(W.partitionBy()).alias("n1"),
        F.sum("c2").over(W.partitionBy()).alias("n2"),
    )
    d = cum.agg(
        F.max("n1").cast("bigint").alias("n_early"),
        F.max("n2").cast("bigint").alias("n_late"),
        F.count("*").cast("bigint").alias("n_distinct_values"),
        F.max(
            F.expr(
                "(ABS(CAST(f1 AS DECIMAL(38,0)) * n2"
                " - CAST(f2 AS DECIMAL(38,0)) * n1) * 1000000)"
                " div (CAST(n1 AS DECIMAL(38,0)) * n2)"
            )
        )
        .cast("bigint")
        .alias("ks_d_e6"),
    )
    crit = fquant(
        F.lit(1.36).cast("double")
        * F.sqrt(
            (F.col("n_early").cast("double") + F.col("n_late").cast("double"))
            / (F.col("n_early").cast("double") * F.col("n_late").cast("double"))
        )
    )
    return d.select(
        "n_early",
        "n_late",
        "n_distinct_values",
        "ks_d_e6",
        crit.alias("crit_q"),
        (
            F.col("ks_d_e6").cast("double") / F.lit(1000000).cast("double") > crit
        ).alias("distributions_differ"),
    )
