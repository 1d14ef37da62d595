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


# ---------------------------------------------------------------------------
# DAU/WAU stickiness (round 12)
# ---------------------------------------------------------------------------

_STICKINESS_SQL = """
WITH day_user AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
daily AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM day_user GROUP BY d
),
weekly_days AS (
  SELECT CAST(date_trunc('week', d) AS DATE) AS week,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(dau) AS BIGINT) AS sum_dau
  FROM daily GROUP BY 1
),
weekly_users AS (
  SELECT CAST(date_trunc('week', d) AS DATE) AS week,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM day_user GROUP BY 1
)
SELECT d.week, d.n_days, d.sum_dau, u.wau,
       CAST(CAST(d.sum_dau AS HUGEINT) * 1000000
            // (CAST(d.n_days AS HUGEINT) * u.wau) AS BIGINT)
         AS stickiness_e6
FROM weekly_days d JOIN weekly_users u ON u.week = d.week
ORDER BY d.week
"""


@query("events_dau_wau_stickiness", sql=_STICKINESS_SQL, tags=("analytics", "timeseries"))
def events_dau_wau_stickiness(spark, sf_dir) -> DataFrame:
    """DAU/WAU STICKINESS per ISO week — mean daily active users over
    weekly active users, the engagement ratio every growth dashboard
    tracks (1/7 ≙ users appear once a week; 1.0 ≙ every user, every
    day).  stickiness = (Σ_day DAU / n_days) / WAU is kept as the ONE
    exact rational Σdau·10⁶ // (n_days·WAU) — no float ever; both
    engines Monday-truncate weeks via date_trunc('week').

    Scale: the (day, user) dedup is one exact distinct over the
    firehose (the same first shuffle window_cumulative_distinct_users
    pays); everything after runs on |days| and |weeks|-sized frames.
    The distinct frame is PINNED because both weekly legs fold from
    it."""
    from trafik_etl_modular_spark.operators.pinning import pin

    day_user = pin(
        t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct(),
        eager=True,  # feeds the daily and the weekly-distinct legs
    )
    daily = day_user.groupBy("d").agg(F.count("*").cast("bigint").alias("dau"))
    week = F.to_date(F.date_trunc("week", F.col("d"))).alias("week")
    weekly_days = daily.groupBy(week).agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("dau").cast("bigint").alias("sum_dau"),
    )
    weekly_users = day_user.groupBy(week).agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    return (
        weekly_days.join(weekly_users, "week")
        .select(
            "week",
            "n_days",
            "sum_dau",
            "wau",
            F.expr(
                "CAST(CAST(sum_dau AS DECIMAL(38,0)) * 1000000"
                " div (CAST(n_days AS DECIMAL(38,0)) * wau) AS BIGINT)"
            ).alias("stickiness_e6"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# New vs returning users per day (round 12)
# ---------------------------------------------------------------------------

_NEW_RETURNING_SQL = """
WITH day_user AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
first_seen AS (
  SELECT user_id, MIN(d) AS first_day FROM day_user GROUP BY user_id
)
SELECT du.d,
       CAST(COUNT(*) AS BIGINT) AS active_users,
       CAST(SUM(CASE WHEN f.first_day = du.d THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(SUM(CASE WHEN f.first_day = du.d THEN 0 ELSE 1 END) AS BIGINT)
         AS returning_users
FROM day_user du JOIN first_seen f ON f.user_id = du.user_id
GROUP BY du.d
ORDER BY du.d
"""


@query("events_new_vs_returning", sql=_NEW_RETURNING_SQL, tags=("analytics", "timeseries"))
def events_new_vs_returning(spark, sf_dir) -> DataFrame:
    """NEW vs RETURNING user split per day — each active day of a user
    is "new" iff it is their first-ever active day (the acquisition /
    retention decomposition of the DAU curve; pairs with
    events_cohort_retention, which follows the same users FORWARD).
    Pure integer counting over an equi-join; no floats.

    Scale: the same (day, user) exact distinct as the stickiness
    query, then a min-agg to the USER dimension and one equi-join
    back — both shuffles are on user_id and fold map-side first.  A
    skewed power user contributes one row per active day, bounded by
    the calendar."""
    from trafik_etl_modular_spark.operators.pinning import pin

    day_user = pin(
        t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct(),
        eager=True,  # feeds first-seen and the join probe
    )
    first_seen = day_user.groupBy("user_id").agg(F.min("d").alias("first_day"))
    return (
        day_user.join(first_seen, "user_id")
        .groupBy("d")
        .agg(
            F.count("*").cast("bigint").alias("active_users"),
            F.sum(F.when(F.col("first_day") == F.col("d"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("first_day") == F.col("d"), 0).otherwise(1))
            .cast("bigint")
            .alias("returning_users"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Truncated-exact EWMA of daily volume (round 12)
# ---------------------------------------------------------------------------

# alpha = 1/4, truncated at K=14 lags; weight(k) = alpha(1-alpha)^k
# \propto 3^k * 4^(K-1-k) over the common denominator 4^K.  The weights
# are INLINED as integer literals so both engines aggregate identical
# BIGINTs (POWER() returns doubles).
_EWMA_K = 14
_EWMA_WEIGHTS = [(k, 3**k * 4 ** (_EWMA_K - 1 - k)) for k in range(_EWMA_K)]

_EWMA_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
),
lags(k, w) AS (VALUES {", ".join(f"({k}, {w})" for k, w in _EWMA_WEIGHTS)}),
pairs AS (
  SELECT a.d, l.k, l.w, b.c
  FROM daily a
  JOIN lags l ON TRUE
  JOIN daily b ON b.d = a.d - l.k
)
SELECT d, CAST(COUNT(*) AS BIGINT) AS n_lags,
       CAST(SUM(CAST(w AS HUGEINT)) AS BIGINT) AS weight_sum,
       CAST(SUM(CAST(c AS HUGEINT) * w) * 1000000
            // SUM(CAST(w AS HUGEINT)) AS BIGINT) AS ewma_e6
FROM pairs GROUP BY d
ORDER BY d
"""


@query("events_ewma_volume", sql=_EWMA_SQL, tags=("analytics", "timeseries"))
def events_ewma_volume(spark, sf_dir) -> DataFrame:
    """EXPONENTIALLY WEIGHTED moving average of daily event volume
    (α = 1/4, truncated at {k} lags — the Roberts 1959 EWMA control
    statistic): the smoother under every "trend line" on a volume
    dashboard and the head of an EWMA control chart.  The geometric
    weights are pre-scaled to the INTEGER lattice 3ᵏ·4^({k}−1−k)
    (common denominator 4^{k}) and inlined as literals, so the whole
    average is ONE exact HUGEINT/DECIMAL rational — truncation error
    is renormalized away by dividing by the sum of the PRESENT
    weights (early days simply average over fewer lags); floats never
    appear, the output rides the e6 grid.

    Scale: the firehose folds to |days| rows in one map-side-combined
    hash agg; the lag expansion is |days|·{k} rows against a
    broadcast 14-row panel (the ACF shape) — everything downstream is
    day-bounded."""
    daily = t(spark, sf_dir, "events").groupBy(
        F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    from trafik_etl_modular_spark.operators.pinning import pin

    daily = pin(daily, eager=True)  # anchor side + contribution side
    lags = spark.createDataFrame(_EWMA_WEIGHTS, "k int, w long")
    b = daily.select(F.col("d").alias("bd"), F.col("c").alias("bc"))
    pairs = (
        daily.crossJoin(F.broadcast(lags))
        .join(b, F.col("d") == F.date_add(F.col("bd"), F.col("k")))
        .select("d", "k", "w", F.col("bc").alias("c"))
    )
    return (
        pairs.groupBy("d")
        .agg(
            F.count("*").cast("bigint").alias("n_lags"),
            F.sum(F.col("w").cast(T.DecimalType(38, 0))).cast("bigint").alias("weight_sum"),
            F.expr(
                "CAST(SUM(CAST(c AS DECIMAL(38,0)) * w) * 1000000"
                " div SUM(CAST(w AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("ewma_e6"),
        )
        .orderBy("d")
    )


events_ewma_volume.__doc__ = events_ewma_volume.__doc__.format(k=_EWMA_K)


# ---------------------------------------------------------------------------
# Theil–Sen robust trend slope (round 12)
# ---------------------------------------------------------------------------

_THEILSEN_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
),
slopes AS (
  SELECT (CAST(ROUND((CAST(b.c - a.c AS DOUBLE)
            / CAST(date_diff('day', a.d, b.d) AS DOUBLE)) * 1e9) AS BIGINT)
          / 1e9) AS slope_q
  FROM daily a JOIN daily b ON b.d > a.d
),
ranked AS (
  SELECT slope_q,
         ROW_NUMBER() OVER (ORDER BY slope_q) AS rn,
         COUNT(*) OVER () AS n
  FROM slopes
)
SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
       (CAST(ROUND(AVG(slope_q) * 1e9) AS BIGINT) / 1e9) AS slope_med_q,
       (AVG(slope_q) > CAST(0 AS DOUBLE)) AS trend_increasing
FROM ranked
WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
"""


@query("events_theil_sen_slope", sql=_THEILSEN_SQL, tags=("analytics", "timeseries"))
def events_theil_sen_slope(spark, sf_dir) -> DataFrame:
    """THEIL–SEN robust trend slope of the daily volume series (Theil
    1950 / Sen 1968, public literature): the MEDIAN of all pairwise
    slopes (c_j−c_i)/(d_j−d_i) — the estimator Mann–Kendall's S only
    signs; 29 % outlier-breakdown vs least squares' zero.  Each pair
    slope is one double divide e9-QUANTIZED AT BIRTH, so the median
    (order statistics ⌊(n+1)/2⌋, ⌈(n+1)/2⌉ over the sorted multiset,
    averaged for even n and re-quantized) selects from integer-derived
    values — both engines sort identical multisets.

    Scale: one hash agg to |days|, then the O(days²) pair join on the
    tiny aggregate (the Mann–Kendall shape — 435 pairs at a 30-day
    span); for decade-long series switch to the repeated-median or
    the O(n log n) randomized selection of Matoušek."""
    daily = t(spark, sf_dir, "events").groupBy(
        F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    # daily is NOT pinned here (unlike Mann–Kendall): the rank window
    # below is unpartitioned, and a lineage cut would hide the
    # bounding Aggregate from the global-window invariant — the
    # twice-computed map-side day fold is cheaper than losing the
    # plan-visible bound
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("b.d") > F.col("a.d")).select(
        fquant(
            (F.col("b.c") - F.col("a.c")).cast("double")
            / F.datediff(F.col("b.d"), F.col("a.d")).cast("double")
        ).alias("slope_q")
    )
    wrank = Window.orderBy("slope_q")
    ranked = slopes.select(
        "slope_q",
        F.row_number().over(wrank).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    mid = ranked.where(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return mid.agg(
        F.max("n").cast("bigint").alias("n_pairs"),
        fquant(F.avg("slope_q")).alias("slope_med_q"),
        (F.avg("slope_q") > F.lit(0.0)).alias("trend_increasing"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast skill (MASE ratio, round 12)
# ---------------------------------------------------------------------------

_MASE_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
),
lags(k) AS (VALUES (1), (7)),
diffs AS (
  SELECT l.k, ABS(a.c - b.c) AS abs_err
  FROM daily a
  JOIN lags l ON TRUE
  JOIN daily b ON b.d = a.d - l.k
),
m AS (
  SELECT CAST(SUM(CASE WHEN k = 1 THEN abs_err END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN k = 7 THEN abs_err END) AS BIGINT) AS s7,
         CAST(SUM(CASE WHEN k = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n7
  FROM diffs
)
SELECT n1 AS n_naive, s1 AS naive_abs_err,
       n7 AS n_seasonal, s7 AS seasonal_abs_err,
       CAST(CAST(s7 AS HUGEINT) * n1 * 1000000
            // (CAST(n7 AS HUGEINT) * s1) AS BIGINT) AS mase_e6,
       (CAST(s7 AS HUGEINT) * n1 < CAST(n7 AS HUGEINT) * s1)
         AS seasonal_beats_naive
FROM m
"""


@query("events_mase_seasonal", sql=_MASE_SQL, tags=("analytics", "timeseries"))
def events_mase_seasonal(spark, sf_dir) -> DataFrame:
    """MASE-style forecast skill of the SEASONAL-NAIVE predictor
    (Hyndman–Koehler 2006's scaled-error recipe): the lag-7 forecast's
    mean absolute error over the lag-1 naive forecast's — the
    one-number answer to "does weekly seasonality actually predict
    this series?" (< 1 ≙ yes; pairs with the lag-7 ACF peak).  Both
    MAEs stay integer sums; the ratio is the exact cross-multiplied
    rational s₇·n₁·10⁶ // (n₇·s₁), and the verdict is the EXACT
    integer comparison s₇·n₁ < n₇·s₁ — no division ever decides it.

    Scale: one hash agg to |days|, a 2-row broadcast lag panel, one
    equi-join back on date arithmetic (the EWMA/ACF shape), one final
    1-row fold."""
    daily = t(spark, sf_dir, "events").groupBy(
        F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    from trafik_etl_modular_spark.operators.pinning import pin

    daily = pin(daily, eager=True)  # anchor and lag sides
    lags = spark.createDataFrame([(1,), (7,)], "k int")
    b = daily.select(F.col("d").alias("bd"), F.col("c").alias("bc"))
    diffs = (
        daily.crossJoin(F.broadcast(lags))
        .join(b, F.col("d") == F.date_add(F.col("bd"), F.col("k")))
        .select("k", F.abs(F.col("c") - F.col("bc")).alias("abs_err"))
    )
    m = diffs.agg(
        F.sum(F.when(F.col("k") == 1, F.col("abs_err"))).cast("bigint").alias("s1"),
        F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("k") == 7, F.col("abs_err"))).cast("bigint").alias("s7"),
        F.sum(F.when(F.col("k") == 7, 1).otherwise(0)).cast("bigint").alias("n7"),
    )
    return m.select(
        F.col("n1").alias("n_naive"),
        F.col("s1").alias("naive_abs_err"),
        F.col("n7").alias("n_seasonal"),
        F.col("s7").alias("seasonal_abs_err"),
        F.expr(
            "CAST(CAST(s7 AS DECIMAL(38,0)) * n1 * 1000000"
            " div (CAST(n7 AS DECIMAL(38,0)) * s1) AS BIGINT)"
        ).alias("mase_e6"),
        F.expr(
            "CAST(s7 AS DECIMAL(38,0)) * n1 < CAST(n7 AS DECIMAL(38,0)) * s1"
        ).alias("seasonal_beats_naive"),
    )


# ---------------------------------------------------------------------------
# Single-changepoint detection by binary segmentation (round 12)
# ---------------------------------------------------------------------------

_BINSEG_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
),
ordered AS (
  SELECT d, c,
         ROW_NUMBER() OVER (ORDER BY d) AS i,
         CAST(SUM(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS s1
  FROM daily
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
  FROM daily
),
scored AS (
  SELECT o.d AS split_day, o.i AS n_left, t.n - o.i AS n_right,
         o.s1 AS sum_left, t.s - o.s1 AS sum_right,
         (CAST(ROUND((CAST(CAST(o.s1 AS HUGEINT) * (t.n - o.i)
                       - CAST(t.s - o.s1 AS HUGEINT) * o.i AS DOUBLE)
                      * CAST(CAST(o.s1 AS HUGEINT) * (t.n - o.i)
                             - CAST(t.s - o.s1 AS HUGEINT) * o.i AS DOUBLE))
                     / (CAST(o.i AS DOUBLE) * CAST(t.n - o.i AS DOUBLE)
                        * CAST(t.n AS DOUBLE)) * 1e9) AS BIGINT) / 1e9)
           AS gain_q
  FROM ordered o CROSS JOIN tot t
  WHERE o.i < t.n
)
SELECT split_day, n_left, n_right,
       CAST(CAST(sum_left AS HUGEINT) * 1000000 // n_left AS BIGINT)
         AS mean_left_e6,
       CAST(CAST(sum_right AS HUGEINT) * 1000000 // n_right AS BIGINT)
         AS mean_right_e6,
       gain_q
FROM scored
ORDER BY gain_q DESC, split_day
LIMIT 1
"""


@query("events_changepoint_binseg", sql=_BINSEG_SQL, tags=("analytics", "timeseries", "quality"))
def events_changepoint_binseg(spark, sf_dir) -> DataFrame:
    """SINGLE-CHANGEPOINT detection by binary segmentation (Scott &
    Knott 1974; the first split of the CUSUM-family segmenters): pick
    the day boundary τ maximizing the between-segment SSE reduction
    Δ(τ) = (S₁·n₂ − S₂·n₁)² / (n₁·n₂·n) — the mean-shift locator that
    complements dq_cusum_changepoint's sequential alarm with an
    offline argmax.  The numerator difference is formed EXACTLY in
    HUGEINT/DECIMAL(38,0) (S·n products overflow int64 at lake
    scale), doubles enter only for the final square-and-divide, e9-
    quantized; the argmax is a full-order sort (gain, then earliest
    day).  Segment means ride the exact e6 grid.

    Scale: one hash agg to |days|, one cumulative window over the
    day-bounded frame, a 1-row (n, S) broadcast, and a top-1
    TakeOrdered — no shuffle touches raw events after the first
    fold."""
    daily = t(spark, sf_dir, "events").groupBy(
        F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    from trafik_etl_modular_spark.operators.pinning import pin

    # windows run over the UNPINNED aggregate (bounding Aggregate
    # stays plan-visible); the pin sits ABOVE them, where the split
    # scan and the (n, S) scalar actually branch — which also makes
    # the total derivable from the cumulative column for free
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered = pin(
        daily.select(
            "d",
            "c",
            F.row_number().over(Window.orderBy("d")).alias("i"),
            F.sum("c").over(w).cast("bigint").alias("s1"),
        ),
        eager=True,
    )
    tot = ordered.agg(
        F.max("i").cast("bigint").alias("n"), F.max("s1").cast("bigint").alias("s")
    )
    num = F.expr(
        "CAST(CAST(s1 AS DECIMAL(38,0)) * (n - i)"
        " - CAST(s - s1 AS DECIMAL(38,0)) * i AS DOUBLE)"
    )
    gain = fquant(
        num
        * num
        / (
            F.col("i").cast("double")
            * (F.col("n") - F.col("i")).cast("double")
            * F.col("n").cast("double")
        )
    )
    scored = (
        ordered.crossJoin(F.broadcast(tot))
        .where(F.col("i") < F.col("n"))
        .select(
            F.col("d").alias("split_day"),
            F.col("i").alias("n_left"),
            (F.col("n") - F.col("i")).alias("n_right"),
            F.expr(
                "CAST(CAST(s1 AS DECIMAL(38,0)) * 1000000 div i AS BIGINT)"
            ).alias("mean_left_e6"),
            F.expr(
                "CAST(CAST(s - s1 AS DECIMAL(38,0)) * 1000000 div (n - i)"
                " AS BIGINT)"
            ).alias("mean_right_e6"),
            gain.alias("gain_q"),
        )
    )
    return scored.orderBy(F.desc("gain_q"), "split_day").limit(1)


# ---------------------------------------------------------------------------
# Kaplan–Meier customer retention curve (round 12)
# ---------------------------------------------------------------------------

_KM_PERIOD_DAYS = 91  # quarterly periods
_KM_ENC = 1 << 31  # (num, den) pair encoding base for the HOF fold
_KM_E9 = 10**9


def _km_sql(sf_dir: str) -> str:
    K, E = _KM_ENC, _KM_E9
    return f"""
WITH spans AS (
  SELECT o_custkey,
         MIN(CAST(o_orderdate AS DATE)) AS first_d,
         MAX(CAST(o_orderdate AS DATE)) AS last_d
  FROM orders GROUP BY o_custkey
),
horizon AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS h FROM orders),
lives AS (
  SELECT date_diff('day', s.first_d, s.last_d) // {_KM_PERIOD_DAYS} AS q,
         (date_diff('day', s.last_d, h.h) < {_KM_PERIOD_DAYS}) AS censored
  FROM spans s CROSS JOIN horizon h
),
periods AS (
  SELECT q,
         CAST(SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS n_churned,
         CAST(SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS n_censored
  FROM lives GROUP BY q
),
risk AS (
  SELECT q, n_churned, n_censored,
         CAST(SUM(n_churned + n_censored)
              OVER (ORDER BY q DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS n_risk
  FROM periods
),
folded AS (
  SELECT q, n_churned, n_censored, n_risk,
         list(CAST(n_risk - n_churned AS HUGEINT) * {K} + n_risk)
           OVER (ORDER BY q ROWS UNBOUNDED PRECEDING) AS factors
  FROM risk
)
SELECT q AS period, n_risk, n_churned, n_censored,
       CAST(list_reduce(list_prepend(CAST({E} AS HUGEINT) * {K} + 1, factors),
                        (a, b) -> ((a // {K}) * (b // {K}) // (b % {K}))
                                  * {K} + 1) // {K} AS BIGINT) AS survival_e9
FROM folded
ORDER BY q
"""


@query("events_kaplan_meier", sql=_km_sql, tags=("analytics", "timeseries"))
def events_kaplan_meier(spark, sf_dir) -> DataFrame:
    """KAPLAN–MEIER retention curve (Kaplan & Meier 1958) over
    CUSTOMER ORDER LIFETIMES in quarters: S(q) = Π_{{v≤q}}
    (n_v − d_v)/n_v with n_v the at-risk count and d_v the churn
    count at quarter v; customers whose last order falls within one
    period of the data horizon are right-CENSORED (they leave the
    risk set without counting as churn) — the moving-horizon
    retention estimator.  The survival product is an e9 FIXED-POINT
    fold: each step is the exact integer floor surv·(n−d) // n, with
    (num, den) pairs packed into one integer (num·2³¹ + den) so both
    engines run the IDENTICAL higher-order reduce — Spark's SQL
    `aggregate` with a BIGINT accumulator, DuckDB's `list_reduce`
    with the init value prepended (its 2-arg fold).  This is the
    repo's ln()/exp()-free cumulative product: per-step values stay
    ≤ 10⁹·2³¹ < 2⁶³, so it scales to ANY period count (unlike a raw
    rational product, which overflows DECIMAL(38,0) past ~9 periods);
    the cost is a ≤|periods| downward floor bias of 1e-9 per step.
    A loud guard pins n_risk < 2³¹ (the encoding base).

    Scale: one min/max fold to the CUSTOMER dimension, one
    ≤|periods| aggregate; the HOF fold runs on a period-bounded frame
    (≤27 rows at the fixture's ~6.7-year span)."""
    spans = t(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("first_d"),
        F.max(F.to_date("o_orderdate")).alias("last_d"),
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    spans = pin(spans, eager=True)  # horizon + lifetime legs
    horizon = spans.agg(F.max("last_d").alias("h"))
    lives = spans.crossJoin(F.broadcast(horizon)).select(
        F.expr(f"datediff(last_d, first_d) div {_KM_PERIOD_DAYS}").alias("q"),
        (F.datediff(F.col("h"), F.col("last_d")) < _KM_PERIOD_DAYS).alias(
            "censored"
        ),
    )
    periods = lives.groupBy("q").agg(
        F.sum(F.when(F.col("censored"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_churned"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_censored"),
    )
    w_rev = Window.orderBy(F.desc("q")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = periods.select(
        "q",
        "n_churned",
        "n_censored",
        F.sum(F.col("n_churned") + F.col("n_censored"))
        .over(w_rev)
        .cast("bigint")
        .alias("n_risk"),
    )
    # Loud encoding guard: bounded 1-row collect.
    mx = risk.agg(F.max("n_risk").alias("m")).collect()[0]["m"]
    if mx is not None and int(mx) >= _KM_ENC:
        raise ValueError(
            f"events_kaplan_meier: n_risk {mx} exceeds the pair-encoding "
            f"base {_KM_ENC}; widen the encoding before the fold silently "
            "corrupts"
        )
    w_fwd = Window.orderBy("q").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    folded = risk.select(
        "q",
        "n_churned",
        "n_censored",
        "n_risk",
        F.collect_list(
            F.expr(f"(n_risk - n_churned) * CAST({_KM_ENC} AS BIGINT) + n_risk")
        )
        .over(w_fwd)
        .alias("factors"),
    )
    return folded.select(
        F.col("q").alias("period"),
        "n_risk",
        "n_churned",
        "n_censored",
        F.expr(
            f"aggregate(factors, CAST({_KM_E9} AS BIGINT),"
            f" (acc, x) -> CAST(acc * (x div {_KM_ENC}) div (x % {_KM_ENC})"
            " AS BIGINT))"
        ).alias("survival_e9"),
    )
