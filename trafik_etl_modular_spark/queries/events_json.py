"""Semi-structured (JSON) extraction + event-time windowing over the
`events` fixture (SURVEY.md §2.9 — the batch forms of the streaming
semantics; the live streaming versions are in streaming/).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.functions.scalars import dsum, oracle_dsum
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

# ---------------------------------------------------------------------------
# JSON field extraction (events.props is a JSON string).
# ---------------------------------------------------------------------------

_JSON_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


@query("json_extract_props", sql=_JSON_SQL, tags=("json", "agg"))
def json_extract_props(spark, sf_dir):
    """get_json_object over the props column, aggregated per type —
    JVM-side JSON path evaluation, no Python. (At scale, parse once
    with from_json into a struct column instead of re-evaluating
    paths per expression.)"""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# from_json → typed struct projection (schema-declared parse).
# ---------------------------------------------------------------------------

_JSON_PROJ_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
"""


@query("json_typed_projection", sql=_JSON_PROJ_SQL, tags=("json", "filter"))
def json_typed_projection(spark, sf_dir):
    """from_json with an explicit schema (parse once, filter on the
    typed field) — the pattern that replaces per-expression path
    evaluation when many fields are consumed."""
    ev = t(spark, sf_dir, "events")
    parsed = ev.withColumn("j", F.from_json(F.col("props"), "k BIGINT"))
    return parsed.filter(F.col("j.k") >= 90).select("event_id", F.col("j.k").alias("k"))


# ---------------------------------------------------------------------------
# Tumbling 1-hour event-time window (batch form).
# ---------------------------------------------------------------------------

_HOURLY_SQL = f"""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n,
       {oracle_dsum('value', 2)} AS total_value
FROM events
GROUP BY 1, 2
"""


@query("events_hourly_tumbling", sql=_HOURLY_SQL, tags=("agg", "window-time", "streaming"))
def events_hourly_tumbling(spark, sf_dir):
    """Tumbling 1-hour window counts — the batch twin of the
    Structured Streaming query in streaming/pipeline.py (same
    semantics; streaming adds the watermark)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), dsum("value", 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


_VARIANT_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
"""


@query("events_variant_projection", sql=_VARIANT_SQL, tags=("json", "variant"))
def events_variant_projection(spark, sf_dir):
    """VariantType path (Spark 4): parse_json once into a variant
    column, typed try_variant_get extraction, filter on the typed
    value. Variant's binary encoding makes repeated path access cheap
    vs re-parsing JSON text per expression — the engine's
    semi-structured scale path; the projected output is plain typed
    columns, so the oracle is ordinary JSON SQL."""
    ev = t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "bigint")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") % 7 == 0)


# ---------------------------------------------------------------------------
# Sliding (overlapping) windows: each event lands in duration/slide
# windows — the trend-smoothing companion to the tumbling form.
# ---------------------------------------------------------------------------

_SLIDING_SQL = f"""
SELECT window_start, event_type, COUNT(*) AS n, {oracle_dsum('value', 2)} AS total_value
FROM (
  SELECT date_trunc('hour', ts) AS window_start, event_type, value FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start, event_type, value
  FROM events
)
GROUP BY window_start, event_type
"""


@query("events_sliding_window", sql=_SLIDING_SQL, tags=("agg", "window-time"))
def events_sliding_window(spark, sf_dir):
    """SLIDING 2-hour window, 1-hour slide: every event contributes to
    exactly duration/slide = 2 windows (Catalyst expands the window
    generator before the hash agg — shuffle volume is slide-factor ×
    tumbling, the inherent cost of overlap; same plan shape
    streaming uses with a watermark).  The oracle mirrors the
    expansion as a UNION ALL of the two shifted hour-truncations."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), dsum("value", 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Product analytics: funnel + cohort retention — the two canonical
# event-log questions every analytics engine must answer.
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CASE WHEN p.t_purchase IS NOT NULL THEN 3
            WHEN c.t_click IS NOT NULL THEN 2
            WHEN v.t_view IS NOT NULL THEN 1
            ELSE 0 END AS funnel_stage,
       v.t_view, c.t_click, p.t_purchase
FROM u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
"""


@query("events_funnel_stages", sql=_FUNNEL_SQL, tags=("agg", "join", "analytics"))
def events_funnel_stages(spark, sf_dir):
    """ORDERED FUNNEL analysis (view → click → purchase): per user,
    the first view, the first click strictly AFTER that view, and the
    first purchase strictly after that click — the sequencing that a
    bare per-type min() gets wrong (a purchase before the first view
    must not count).  Three cascaded min-aggregations, each a hash
    agg on user_id joined back on the same key (the shuffles reuse
    one partitioning); no window over the raw event log and no
    per-user event collection, so a power user with 10^6 events
    costs the same as anyone else."""
    ev = t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        ev.select("user_id")
        .distinct()
        .join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("t_purchase").isNotNull(), F.lit(3))
            .when(F.col("t_click").isNotNull(), F.lit(2))
            .when(F.col("t_view").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("funnel_stage"),
            "t_view",
            "t_click",
            "t_purchase",
        )
    )


_COHORT_SQL = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
  FROM events
)
SELECT f.cohort_week,
       CAST(datediff('week', f.cohort_week, a.active_week) AS INTEGER)
         AS week_offset,
       CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_active_users
FROM first_seen f JOIN activity a ON f.user_id = a.user_id
WHERE datediff('week', f.cohort_week, a.active_week) <= 4
GROUP BY f.cohort_week, week_offset
ORDER BY f.cohort_week, week_offset
"""


@query("events_cohort_retention", sql=_COHORT_SQL, tags=("agg", "join", "analytics"))
def events_cohort_retention(spark, sf_dir):
    """COHORT RETENTION triangle: users grouped by first-seen week,
    distinct actives per (cohort, week-offset) out to 4 weeks — the
    canonical retention report.  One min-agg for cohorts, one
    distinct-projection for activity (both hash shuffles on user_id,
    partitioning reused by the join), then a count-distinct rollup on
    the tiny (cohort, offset) key space.  Week arithmetic is integer
    (truncated week timestamps diffed in whole weeks) — no float
    anywhere."""
    ev = t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    offset = (
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("int")
    return (
        first_seen.join(activity, "user_id")
        .withColumn("week_offset", offset)
        .filter(F.col("week_offset") <= 4)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


_LOCF_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         COUNT(*) AS n, {oracle_dsum('value', 2)} AS rev
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (
  SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM hourly GROUP BY event_type
),
spine AS (
  SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
  FROM bounds
)
SELECT s.event_type, s.hr,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
       h.n IS NULL AS is_gap,
       h2.rev AS rev_filled
FROM spine s
LEFT JOIN hourly h ON s.event_type = h.event_type AND s.hr = h.hr
ASOF LEFT JOIN hourly h2 ON s.event_type = h2.event_type AND s.hr >= h2.hr
"""


@query("events_hourly_locf", sql=_LOCF_SQL, tags=("agg", "window-time", "timeseries"))
def events_hourly_locf(spark, sf_dir):
    """Hourly RESAMPLE with last-observation-carried-forward gap fill
    — the time-series alignment primitive (sensor grids, market
    bars): aggregate to the hour, build each series' hour spine
    engine-side (per-type bounds → sequence + explode, no driver
    collect, no cross join — spine length = span, broadcast-sized),
    left-join the observed hours, and carry the last observed value
    across gaps with one `last(ignorenulls)` window pass per series.
    Complements inc_daily_trend_gapfill (zero-fill): LOCF is the fill
    rule where absence means "unchanged", not "zero".  Hourly sums
    are exact decimal (`dsum`), so the carried doubles are identical
    cross-engine; the oracle derives the same fill via DuckDB's
    native ASOF join onto the spine — two independent formulations
    of LOCF agreeing exactly.  One shuffle per pass; the window sort
    is per-series and spine-sized."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count("*").alias("n"), dsum("value", 2).alias("rev"))
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
    )
    joined = spine.join(hourly, ["event_type", "hr"], "left")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hr",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        F.col("n").isNull().alias("is_gap"),
        F.last("rev", ignorenulls=True).over(w).alias("rev_filled"),
    )


# ---------------------------------------------------------------------------
# First-order event-type transition matrix (round 10)
# ---------------------------------------------------------------------------

_TRANSITION_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
outdeg AS (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_out FROM trans GROUP BY prev_type
)
SELECT t.prev_type, t.next_type, t.n, o.n_out,
       CAST((t.n * 1000000) // o.n_out AS BIGINT) AS p_e6
FROM trans t JOIN outdeg o ON o.prev_type = t.prev_type
ORDER BY t.prev_type, t.next_type
"""


@query("events_transition_matrix", sql=_TRANSITION_SQL, tags=("agg", "analytics"))
def events_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event-type
    sequences: for every (prev → next) event-type pair, the count and
    the row-normalized transition probability (e6-scaled exact integer
    division).  The sequence order is the total (ts, event_id) order
    every windowed query in the engine uses, so consecutive-pair
    extraction is deterministic under ties.  This is the journey/
    clickstream summary the funnel and cohort queries don't cover —
    the input for next-action prediction baselines and for detecting
    broken instrumentation (a transition that should be impossible
    showing nonzero mass).

    Scale: one user-partitioned LAG window (shuffles on user_id — the
    same partitioning the sessionize family uses), then two hash
    aggregations over |types|² rows.  No global window, no driver
    loop; probabilities are integers, so cross-engine exact."""
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    trans = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    outdeg = trans.groupBy("prev_type").agg(F.sum("n").cast("bigint").alias("n_out"))
    return (
        trans.join(outdeg, "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            "n_out",
            F.expr("(n * 1000000) div n_out").cast("bigint").alias("p_e6"),
        )
        .orderBy("prev_type", "next_type")
    )


# ---------------------------------------------------------------------------
# User-concentration Gini (round 12)
# ---------------------------------------------------------------------------

_GINI_SQL = """
WITH ux AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY user_id
),
cc AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS g FROM ux GROUP BY x),
cum AS (
  SELECT x, g,
         COALESCE(SUM(g) OVER (ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
         COALESCE(SUM(g) OVER (ORDER BY x DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cbd
  FROM cc
),
m AS (
  SELECT CAST(SUM(g) AS BIGINT) AS n,
         CAST(SUM(g * x) AS BIGINT) AS sx,
         SUM(CAST(x AS HUGEINT)
             * (2 * CAST(g AS HUGEINT) * cb
                + CAST(g AS HUGEINT) * (g + 1))) AS six2
  FROM cum
),
topd AS (
  SELECT CAST(SUM(LEAST(c.g, GREATEST((m.n + 9) // 10 - c.cbd, 0)) * c.x)
              AS BIGINT) AS top_x
  FROM cum c CROSS JOIN m
)
SELECT m.n AS n_users, m.sx AS n_events,
       CAST(((m.six2 - (CAST(m.n AS HUGEINT) + 1) * m.sx) * 1000000)
            // (CAST(m.n AS HUGEINT) * m.sx) AS BIGINT) AS gini_e6,
       CAST((CAST(t.top_x AS HUGEINT) * 1000000) // m.sx AS BIGINT)
         AS top_decile_share_e6
FROM m CROSS JOIN topd t
"""


@query("events_user_gini", sql=_GINI_SQL, tags=("analytics", "agg"))
def events_user_gini(spark, sf_dir):
    """GINI COEFFICIENT of per-user event concentration plus the
    top-decile share — the Lorenz-curve numbers behind "how much of
    the corpus comes from how few sources", the concentration gauge a
    sampling policy (sample_per_source_cap) is tuned against.
    Everything is EXACT integer: ranks never materialize per user —
    the rank moment folds through the counts-of-counts histogram
    (Σ 2·i·x_i = Σ_x x·(2·g·cum_before + g(g+1)) since tied ranks sum
    to a closed form; perf lesson 9: exact order statistics over
    low-cardinality values ride the histogram, never a global
    row_number), with HUGEINT/DECIMAL(38,0) products so no corpus
    size can wrap.  The top-decile mass takes ⌈n/10⌉ users from the
    descending histogram with an exact partial-group term.

    Scale: one per-user hash agg, one counts-of-counts agg (distinct-
    value-bounded), windows only over the tiny histogram."""
    from pyspark.sql import Window

    from trafik_etl_modular_spark.operators.pinning import pin

    ux = t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("x")
    )
    cc = pin(
        ux.groupBy("x").agg(F.count("*").cast("bigint").alias("g")), eager=True
    )
    z = F.lit(0).cast("bigint")
    w_asc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    w_desc = Window.orderBy(F.desc("x")).rowsBetween(Window.unboundedPreceding, -1)
    cum = pin(
        cc.select(
            "x",
            "g",
            F.coalesce(F.sum("g").over(w_asc), z).alias("cb"),
            F.coalesce(F.sum("g").over(w_desc), z).alias("cbd"),
        ),
        eager=True,
    )
    m = cum.agg(
        F.sum("g").cast("bigint").alias("n"),
        F.sum(F.col("g") * F.col("x")).cast("bigint").alias("sx"),
        F.sum(
            F.expr(
                "CAST(x AS DECIMAL(38,0))"
                " * (2 * CAST(g AS DECIMAL(38,0)) * cb"
                "    + CAST(g AS DECIMAL(38,0)) * (g + 1))"
            )
        ).alias("six2"),
    )
    topd = cum.crossJoin(F.broadcast(m.select("n"))).agg(
        F.sum(
            F.expr("LEAST(g, GREATEST((n + 9) div 10 - cbd, CAST(0 AS BIGINT))) * x")
        )
        .cast("bigint")
        .alias("top_x")
    )
    return m.crossJoin(F.broadcast(topd)).select(
        F.col("n").alias("n_users"),
        F.col("sx").alias("n_events"),
        F.expr(
            "CAST(((six2 - (CAST(n AS DECIMAL(38,0)) + 1) * sx) * 1000000)"
            " div (CAST(n AS DECIMAL(38,0)) * sx) AS BIGINT)"
        ).alias("gini_e6"),
        F.expr(
            "CAST((CAST(top_x AS DECIMAL(38,0)) * 1000000) div sx AS BIGINT)"
        ).alias("top_decile_share_e6"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation (round 12)
# ---------------------------------------------------------------------------

_RFM_SQL = """
WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events),
u AS (
  SELECT e.user_id,
         CAST(a.dmax - MAX(CAST(e.ts AS DATE)) AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(e.value AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS monetary
  FROM events e CROSS JOIN anchor a
  GROUP BY e.user_id, a.dmax
),
scored AS (
  SELECT user_id,
         CAST(NTILE(5) OVER (ORDER BY recency_days DESC, user_id) AS INTEGER)
           AS r_score,
         CAST(NTILE(5) OVER (ORDER BY frequency ASC, user_id) AS INTEGER)
           AS f_score,
         CAST(NTILE(5) OVER (ORDER BY monetary ASC, user_id) AS INTEGER)
           AS m_score
  FROM u
)
SELECT r_score, f_score, m_score, CAST(COUNT(*) AS BIGINT) AS n_users
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


@query("events_rfm_scores", sql=_RFM_SQL, tags=("analytics", "window"))
def events_rfm_scores(spark, sf_dir):
    """RFM SEGMENTATION (recency / frequency / monetary quintiles —
    the classic CRM cell grid): per user, days since last event
    anchored at the corpus max day (data-derived, no wall clock),
    event count, and exact-decimal revenue; each dimension scored
    1–5 by NTILE over a TOTAL order (value, then user_id — quintile
    boundaries cannot drift between engines), higher = better
    (recency sorts DESC so the most recent users land in bucket 5).
    Output is the ≤125-cell segment census a campaign targets.

    Scale: one per-user hash agg; the three NTILEs are global windows
    ABOVE that aggregate (the allowed shape) — at 10⁹ users the same
    scores come from exact quintile thresholds off the counts
    histogram (agg_exact_percentile_grid's recipe) instead of a
    global sort; the cell census is ≤125 rows either way."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.to_date("ts")).alias("dmax"))
    u = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "dmax")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum(F.expr("CAST(value AS DECIMAL(38,2))"))
            .cast("decimal(38,2)")
            .alias("monetary"),
        )
        .select(
            "user_id",
            F.datediff("dmax", "last_day").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    scored = u.select(
        "user_id",
        F.ntile(5)
        .over(Window.orderBy(F.desc("recency_days"), F.asc("user_id")))
        .cast("int")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("frequency"), F.asc("user_id")))
        .cast("int")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("monetary"), F.asc("user_id")))
        .cast("int")
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution by fixed-point iteration (round 12)
# ---------------------------------------------------------------------------

_MARKOV_ROUNDS = 3
_MARKOV_E9 = 10**9

_MARKOV_ITER = """
x{next} AS (
  SELECT t.next_type AS event_type,
         CAST(SUM(x.x_e9 * t.n // o.n_out) AS BIGINT) AS x_e9
  FROM trans t
  JOIN outdeg o ON o.prev_type = t.prev_type
  JOIN x{prev} x ON x.event_type = t.prev_type
  GROUP BY t.next_type
)"""

_MARKOV_SQL = (
    f"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
outdeg AS (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_out FROM trans GROUP BY prev_type
),
nt AS (SELECT CAST(COUNT(DISTINCT prev_type) AS BIGINT) AS k FROM trans),
x0 AS (
  SELECT o.prev_type AS event_type,
         CAST({_MARKOV_E9} // nt.k AS BIGINT) AS x_e9
  FROM outdeg o CROSS JOIN nt
),"""
    + ",".join(
        _MARKOV_ITER.format(next=i + 1, prev=i) for i in range(_MARKOV_ROUNDS)
    )
    + f"""
SELECT a.event_type,
       a.x_e9 AS stationary_e9,
       b.x_e9 AS prev_iter_e9,
       ABS(a.x_e9 - b.x_e9) AS delta_e9
FROM x{_MARKOV_ROUNDS} a
JOIN x{_MARKOV_ROUNDS - 1} b ON b.event_type = a.event_type
ORDER BY a.event_type
"""
)


@query("events_markov_stationary", sql=_MARKOV_SQL, tags=("agg", "analytics"))
def events_markov_stationary(spark, sf_dir):
    """STATIONARY DISTRIBUTION of the event-type Markov chain — 3
    fixed-point power iterations x' = xP over the transition matrix
    events_transition_matrix emits: the long-run share of each event
    type if users keep clicking, the chain's equilibrium load
    forecast (and the PageRank recipe with |types| states instead of
    |vertices|).  State is e9 FIXED-POINT: each term is the exact
    integer floor x_i·n_ij // n_i, so both engines iterate identical
    BIGINTs — no doubles anywhere (contrast PageRank's snapped-double
    lane: with a types-bounded state space the all-integer lane is
    affordable and stricter).  Convergence is visible, not asserted:
    the last two iterates and their per-state |Δ| ship in the output.

    Scale: the chain folds from the firehose in ONE user-partitioned
    LAG window + one |types|² agg (the transition matrix's shape);
    each iteration is an equi-join + agg on |types|²-bounded frames.
    The floor drops at most one e-9 unit of mass per TERM of the
    matrix product (≤|types|² per round) — bounded, deterministic,
    and visible in Σx."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    trans = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    trans = pin(trans, eager=True)  # feeds outdeg + every iteration
    outdeg = trans.groupBy("prev_type").agg(
        F.sum("n").cast("bigint").alias("n_out")
    )
    nt = trans.agg(F.countDistinct("prev_type").cast("bigint").alias("k"))
    x = outdeg.crossJoin(F.broadcast(nt)).select(
        F.col("prev_type").alias("event_type"),
        F.expr(f"CAST({_MARKOV_E9} div k AS BIGINT)").alias("x_e9"),
    )
    tmat = trans.join(outdeg, "prev_type")
    iterates = [x]
    for _ in range(_MARKOV_ROUNDS):
        x = (
            tmat.join(
                F.broadcast(x.withColumnRenamed("event_type", "prev_type")),
                "prev_type",
            )
            .groupBy(F.col("next_type").alias("event_type"))
            .agg(F.expr("CAST(SUM(x_e9 * n div n_out) AS BIGINT)").alias("x_e9"))
        )
        iterates.append(x)
    last, prev = iterates[-1], iterates[-2]
    return (
        last.join(
            prev.select(
                "event_type", F.col("x_e9").alias("prev_iter_e9")
            ),
            "event_type",
        )
        .select(
            "event_type",
            F.col("x_e9").alias("stationary_e9"),
            "prev_iter_e9",
            F.abs(F.col("x_e9") - F.col("prev_iter_e9")).alias("delta_e9"),
        )
        .orderBy("event_type")
    )
