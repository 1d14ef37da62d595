"""Event-stream time-series analytics: autocorrelation, inter-arrival
distribution, and marketing-touch attribution.

Three operators the analytics half of a data platform runs over the
same event firehose the training pipeline samples from:

* **Autocorrelation (ACF)** — the seasonality detector that picks the
  window for dq_seasonal_decompose: lag-k Pearson correlation of the
  daily volume series, computed with the exact-integer-moment recipe
  of agg_pearson_correlation (counts are already BIGINT; every moment
  is exact DECIMAL arithmetic; doubles appear only in the final
  divide/sqrt, then the e9 quantization grid).

* **Inter-arrival histogram** — per-user gaps between consecutive
  events, bucketed into fixed 15-minute bands: the distribution that
  sizes session timeouts (cf. window_sessionize) and streaming
  watermarks.  Gap seconds are exact integer epoch differences; the
  bucket rule is integer division — no floats anywhere.

* **First/last-touch attribution** — each purchase credits the first
  and the most recent preceding click/view of the same user (the two
  canonical attribution models); revenue folds through the proven
  double→DECIMAL(38,2) cents cast so both engines sum exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trafik_etl_modular_spark.functions.scalars import fquant
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

# ---------------------------------------------------------------------------
# Daily-volume autocorrelation
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7

_ACF_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
),
lags(k) AS (VALUES {", ".join(f"({k})" for k in range(1, _ACF_MAX_LAG + 1))}),
pairs AS (
  SELECT l.k, a.c AS x, b.c AS y
  FROM lags l
  JOIN daily a ON TRUE
  JOIN daily b ON b.d = a.d + l.k
),
m AS (
  SELECT k,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy,
         CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy
  FROM pairs GROUP BY k
)
SELECT CAST(k AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_pairs,
       (CAST(ROUND((CAST(n * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE))) * 1e9) AS BIGINT) / 1e9)
         AS acf_q
FROM m
ORDER BY lag
"""


@query("events_autocorrelation", sql=_ACF_SQL, tags=("analytics", "timeseries"))
def events_autocorrelation(spark, sf_dir) -> DataFrame:
    """Lag-1..{maxlag} autocorrelation of the daily event-volume
    series (module doc): per lag, the Pearson correlation of (day,
    day+k) count pairs from exact integer moments; a weekly cycle
    surfaces as an acf peak at lag 7.  The oracle recomputes the
    series, the lag pairing, and the moments from raw events.

    Scale: the events scan collapses to |days| rows in ONE hash
    aggregation (map-side combined) — everything after is arithmetic
    on a day-count-bounded frame; the lag expansion is |days|·{maxlag}
    rows.  The series frame feeds all lag legs through one join
    against the tiny lag panel, not {maxlag} rescans."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    daily = pin(daily, eager=True)
    lags = spark.createDataFrame([(k,) for k in range(1, _ACF_MAX_LAG + 1)], "k int")
    b = daily.select(F.col("d").alias("bd"), F.col("c").alias("y"))
    pairs = (
        daily.crossJoin(F.broadcast(lags))
        .join(b, F.col("bd") == F.date_add(F.col("d"), F.col("k")))
        .select("k", F.col("c").alias("x"), "y")
    )
    dec = T.DecimalType(38, 0)
    m = pairs.groupBy("k").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(dec).alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("k").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        fquant(num / F.sqrt(dx * dy)).alias("acf_q"),
    ).orderBy("lag")


events_autocorrelation.__doc__ = events_autocorrelation.__doc__.format(
    maxlag=_ACF_MAX_LAG
)

# ---------------------------------------------------------------------------
# Inter-arrival time histogram
# ---------------------------------------------------------------------------

_GAP_BUCKET_S = 900  # 15-minute bands
_GAP_BUCKET_CAP = 16  # everything past 4 h folds into the top bucket

_INTERARRIVAL_SQL = f"""
WITH gaps AS (
  SELECT user_id,
         date_diff('second',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events
),
g AS (SELECT LEAST(gap_s // {_GAP_BUCKET_S}, {_GAP_BUCKET_CAP}) AS bucket, gap_s
      FROM gaps WHERE gap_s IS NOT NULL)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(bucket * {_GAP_BUCKET_S} AS BIGINT) AS bucket_lo_s,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
       CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s
FROM g GROUP BY bucket
ORDER BY bucket
"""


@query("events_interarrival_histogram", sql=_INTERARRIVAL_SQL, tags=("analytics", "timeseries"))
def events_interarrival_histogram(spark, sf_dir) -> DataFrame:
    """Per-user inter-arrival distribution in {w}-second bands capped
    at bucket {cap} (module doc) — per band: gap count, exact min/max/
    sum of gap seconds.  This is the empirical evidence behind the
    session-timeout constant the sessionize operators hard-code, and
    the tail mass is what a streaming watermark must cover.

    Scale: ONE window pass (lag over the user-partitioned, time-
    ordered stream — the sessionize shuffle, reusable across both),
    then a {cap}+1-bucket hash aggregation; gap seconds are exact
    integer epoch differences, the band rule integer division."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias(
            "gap_s"
        )
    ).where(F.col("gap_s").isNotNull())
    g = gaps.select(
        F.least(
            F.expr(f"gap_s div {_GAP_BUCKET_S}"), F.lit(_GAP_BUCKET_CAP).cast("bigint")
        ).alias("bucket"),
        "gap_s",
    )
    return (
        g.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_gaps"),
            F.min("gap_s").cast("bigint").alias("min_gap_s"),
            F.max("gap_s").cast("bigint").alias("max_gap_s"),
            F.sum("gap_s").cast("bigint").alias("sum_gap_s"),
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            (F.col("bucket") * _GAP_BUCKET_S).cast("bigint").alias("bucket_lo_s"),
            "n_gaps",
            "min_gap_s",
            "max_gap_s",
            "sum_gap_s",
        )
        .orderBy("bucket")
    )


events_interarrival_histogram.__doc__ = events_interarrival_histogram.__doc__.format(
    w=_GAP_BUCKET_S, cap=_GAP_BUCKET_CAP
)

# ---------------------------------------------------------------------------
# First/last-touch attribution
# ---------------------------------------------------------------------------

_TOUCH_TYPES = ("click", "view")
_CONVERSION = "purchase"

_ATTRIB_SQL = f"""
WITH ordered AS (
  SELECT event_type, value,
         LAST_VALUE(CASE WHEN event_type IN {_TOUCH_TYPES} THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch,
         FIRST_VALUE(CASE WHEN event_type IN {_TOUCH_TYPES} THEN event_type END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch
  FROM events
),
conv AS (
  SELECT COALESCE(last_touch, 'none') AS lt,
         COALESCE(first_touch, 'none') AS ft,
         CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT) AS cents
  FROM ordered WHERE event_type = '{_CONVERSION}'
),
lastt AS (
  SELECT lt AS channel, CAST(COUNT(*) AS BIGINT) AS n_last,
         CAST(SUM(cents) AS BIGINT) AS revenue_last_cents
  FROM conv GROUP BY lt
),
firstt AS (
  SELECT ft AS channel, CAST(COUNT(*) AS BIGINT) AS n_first,
         CAST(SUM(cents) AS BIGINT) AS revenue_first_cents
  FROM conv GROUP BY ft
)
SELECT COALESCE(l.channel, f.channel) AS channel,
       CAST(COALESCE(l.n_last, 0) AS BIGINT) AS n_last,
       CAST(COALESCE(l.revenue_last_cents, 0) AS BIGINT) AS revenue_last_cents,
       CAST(COALESCE(f.n_first, 0) AS BIGINT) AS n_first,
       CAST(COALESCE(f.revenue_first_cents, 0) AS BIGINT) AS revenue_first_cents
FROM lastt l FULL OUTER JOIN firstt f ON f.channel = l.channel
ORDER BY channel
"""


@query("events_attribution_touch", sql=_ATTRIB_SQL, tags=("analytics", "timeseries"))
def events_attribution_touch(spark, sf_dir) -> DataFrame:
    """First- and last-touch conversion attribution (module doc):
    every `{conv}` event credits the first and the most recent
    PRECEDING click/view of the same user; purchases with no prior
    touch land in the 'none' channel.  Per channel: conversion counts
    and exact-cents revenue under both models — the pair every
    marketing-mix report starts from.

    Scale: ONE user-partitioned window pass computes both touch
    columns (first_value/last_value IGNORE NULLS over the preceding
    frame — streamable running state, same shuffle as sessionize),
    then two channel-bounded hash aggregations FULL-joined on the
    ≤3-value channel dimension."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type").isin(*_TOUCH_TYPES), F.col("event_type"))
    ordered = ev.select(
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
    )
    conv = ordered.where(F.col("event_type") == _CONVERSION).select(
        F.coalesce("last_touch", F.lit("none")).alias("lt"),
        F.coalesce("first_touch", F.lit("none")).alias("ft"),
        (F.col("value").cast(T.DecimalType(38, 2)) * 100).cast("long").alias("cents"),
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    conv = pin(conv, eager=False)
    lastt = conv.groupBy(F.col("lt").alias("channel")).agg(
        F.count("*").cast("bigint").alias("n_last"),
        F.sum("cents").cast("bigint").alias("revenue_last_cents"),
    )
    firstt = conv.groupBy(F.col("ft").alias("channel")).agg(
        F.count("*").cast("bigint").alias("n_first"),
        F.sum("cents").cast("bigint").alias("revenue_first_cents"),
    )
    z = F.lit(0).cast("bigint")
    return (
        lastt.join(firstt, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("n_last", z).alias("n_last"),
            F.coalesce("revenue_last_cents", z).alias("revenue_last_cents"),
            F.coalesce("n_first", z).alias("n_first"),
            F.coalesce("revenue_first_cents", z).alias("revenue_first_cents"),
        )
        .orderBy("channel")
    )


events_attribution_touch.__doc__ = events_attribution_touch.__doc__.format(
    conv=_CONVERSION
)


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (round 12)
# ---------------------------------------------------------------------------

_MK_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
),
s AS (
  SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1
                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON b.d > a.d
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY c
        HAVING COUNT(*) > 1)
),
v AS (
  SELECT nn.n,
         nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term AS var_s_x18
  FROM nn CROSS JOIN ties
)
SELECT v.n AS n_days, s.s_stat, v.var_s_x18,
       (CAST(ROUND((CAST(s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
                                         WHEN s.s_stat < 0 THEN -1
                                         ELSE 0 END AS DOUBLE)
         / sqrt(CAST(v.var_s_x18 AS DOUBLE) / CAST(18 AS DOUBLE))) * 1e9)
         AS BIGINT) / 1e9) AS z_q,
       (s.s_stat > 0) AS trend_increasing,
       (ABS(CAST(ROUND((CAST(s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
                                             WHEN s.s_stat < 0 THEN -1
                                             ELSE 0 END AS DOUBLE)
         / sqrt(CAST(v.var_s_x18 AS DOUBLE) / CAST(18 AS DOUBLE))) * 1e9)
         AS BIGINT) / 1e9) > CAST(1.96 AS DOUBLE)) AS trend_significant
FROM s CROSS JOIN v
"""


@query("events_mann_kendall_trend", sql=_MK_SQL, tags=("analytics", "timeseries", "quality"))
def events_mann_kendall_trend(spark, sf_dir) -> DataFrame:
    """MANN-KENDALL trend test on the daily event-volume series (Mann
    1945 / Kendall — public literature): S = Σ_{i<j} sign(c_j − c_i)
    over day-ordered pairs, the rank-based monotone-trend detector
    that needs no distributional assumption — the standing question
    every volume dashboard answers ("is traffic actually growing?").
    S and the tie-corrected variance (kept as the EXACT integer
    18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)) are pure BIGINT;
    doubles appear only in the final continuity-corrected z =
    (S∓1)/√(Var) — the ACF recipe — then the e9 grid; verdict at
    |z| > 1.96.

    Scale: ONE hash agg to the daily frame, then an O(days²)
    self-join on the tiny aggregate (900 rows at a 30-day span; for a
    decade-long series switch to the O(n log n) rank formulation —
    S = Σ sign folds to 2·Σrank − pairs under distinct values)."""
    daily = t(spark, sf_dir, "events").groupBy(
        F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    from trafik_etl_modular_spark.operators.pinning import pin

    daily = pin(daily, eager=True)  # feeds the pair join (twice) + n + ties
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(b, F.col("b.d") > F.col("a.d"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    nn = daily.agg(F.count("*").cast("bigint").alias("n"))
    ties = (
        daily.groupBy("c")
        .agg(F.count("*").cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.expr("t * (t - 1) * (2 * t + 5)")), F.lit(0)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    v = nn.crossJoin(F.broadcast(ties)).select(
        "n",
        F.expr("n * (n - 1) * (2 * n + 5) - tie_term").alias("var_s_x18"),
    )
    sadj = F.expr(
        "CAST(s_stat - CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1"
        " ELSE 0 END AS DOUBLE)"
    )
    zq = fquant(
        sadj / F.sqrt(F.col("var_s_x18").cast("double") / F.lit(18).cast("double"))
    )
    return (
        s.crossJoin(F.broadcast(v))
        .select(
            F.col("n").alias("n_days"),
            "s_stat",
            "var_s_x18",
            zq.alias("z_q"),
            (F.col("s_stat") > 0).alias("trend_increasing"),
            (F.abs(zq) > F.lit(1.96)).alias("trend_significant"),
        )
    )


# ---------------------------------------------------------------------------
# Poisson dispersion test (round 12)
# ---------------------------------------------------------------------------

_DISPERSION_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS sum_c,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sum_c2
  FROM daily
)
SELECT n AS n_days, sum_c AS n_events,
       CAST(((n * sum_c2 - CAST(sum_c AS HUGEINT) * sum_c) * 1000000)
            // sum_c AS BIGINT) AS dispersion_e6,
       (CAST(ROUND(((CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))
         + CAST(1.96 AS DOUBLE)
           * sqrt(CAST(2 AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))))
         * 1e9) AS BIGINT) / 1e9) AS crit_q,
       (CAST(CAST(((n * sum_c2 - CAST(sum_c AS HUGEINT) * sum_c) * 1000000)
             // sum_c AS BIGINT) AS DOUBLE) / CAST(1000000 AS DOUBLE)
        > (CAST(ROUND(((CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))
           + CAST(1.96 AS DOUBLE)
             * sqrt(CAST(2 AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))))
           * 1e9) AS BIGINT) / 1e9)) AS overdispersed
FROM m
"""


@query("dq_poisson_dispersion", sql=_DISPERSION_SQL, tags=("quality", "timeseries"))
def dq_poisson_dispersion(spark, sf_dir) -> DataFrame:
    """POISSON DISPERSION test on daily event volumes — the per-day
    sibling of vocab_term_burstiness's VMR: under a Poisson arrival
    model the dispersion statistic D = (n−1)·s²/x̄ folds to the EXACT
    integer rational (n·Σc² − (Σc)²)/Σc ~ χ²(n−1); a bursty or
    campaign-driven feed overdisperses (D ≫ n−1), a rate-limited one
    underdisperses — the modeling-assumption gate for anomaly
    thresholds built on √mean bands.  The statistic is e6 floor
    division with the products widened to DECIMAL(38,0)/HUGEINT (the
    r11 overflow lesson applied from birth); only the Wilson–Hilferty
    style normal-approx critical value (n−1) + 1.96·√(2(n−1)) is
    IEEE double (cast/·/√ only), e9-quantized on both engines.

    Scale: one hash agg to the daily frame; the moments ride the same
    aggregate; everything after is arithmetic on one row."""
    daily = t(spark, sf_dir, "events").groupBy(
        F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    m = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sum_c"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("sum_c2"),
    )
    disp = F.expr(
        "CAST(((n * sum_c2 - CAST(sum_c AS DECIMAL(38,0)) * sum_c) * 1000000)"
        " div sum_c AS BIGINT)"
    )
    crit = fquant(
        (F.col("n").cast("double") - F.lit(1).cast("double"))
        + F.lit(1.96).cast("double")
        * F.sqrt(
            F.lit(2).cast("double")
            * (F.col("n").cast("double") - F.lit(1).cast("double"))
        )
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.col("sum_c").alias("n_events"),
        disp.alias("dispersion_e6"),
        crit.alias("crit_q"),
        (
            disp.cast("double") / F.lit(1000000).cast("double") > crit
        ).alias("overdispersed"),
    )
