"""Window-function family (SURVEY.md §2.5 context + §7.3 step 5-6).

The reference's only window-shaped computations are its two dedups
(see queries/dedup.py); these queries declare the general forms —
top-N per group, running totals, ranking, lag-based sessionization —
that the same Spark primitive unlocks.

Every window carries a TOTAL order (unique tiebreaker) so results are
deterministic under any partitioning — pandas relied on input order
(SURVEY.md §7.4 W1 caveat); we never do.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

# ---------------------------------------------------------------------------
# Top-N per group.
# ---------------------------------------------------------------------------

_TOP3_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
) WHERE rn <= 3
"""


@query("window_top3_orders_per_customer", sql=_TOP3_SQL, tags=("window", "topk"))
def window_top3(spark, sf_dir):
    """Canonical top-N-per-group: one hash shuffle on the partition
    key, in-partition sort, early row_number cutoff. At skewed scale,
    AQE splits oversized partitions; no global sort ever happens."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# Running (cumulative) total per partition — exact decimal so the
# cumulative sums hash-match a sequential engine at every prefix.
# ---------------------------------------------------------------------------

# ORDER BY must be a TOTAL order for a ROWS cumulative frame: the
# synthetic lineitem does NOT have a unique (l_orderkey, l_linenumber)
# (the sf0.1 sweep found one supplier with two rows tied on
# shipdate+orderkey+linenumber but different prices — the engines
# ordered the tie differently and every prefix after it diverged).
# l_extendedprice as the final key totalizes the order; rows tied on
# ALL four keys are identical in every emitted column, so their
# cumulative multiset is order-invariant.
_RUNNING_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_revenue
FROM lineitem
"""


@query("window_running_revenue_per_supplier", sql=_RUNNING_SQL, tags=("window",))
def window_running(spark, sf_dir):
    """Running (cumulative) revenue per supplier over ship order — a
    ROWS unbounded-preceding frame with a full deterministic order
    tiebreak; exact decimal summation so the cumulative values are
    engine-identical at every row, one hash shuffle on l_suppkey."""
    li = t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.sum(F.col("l_extendedprice").cast(T.DecimalType(38, 2)))
        .over(w)
        .cast("double")
        .alias("running_revenue"),
    )


# ---------------------------------------------------------------------------
# dense_rank with legitimate ties.
# ---------------------------------------------------------------------------

_RANK_SQL = """
SELECT p_brand, p_partkey, p_retailprice, price_rank
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         DENSE_RANK() OVER (
           PARTITION BY p_brand ORDER BY p_retailprice DESC
         ) AS price_rank
  FROM part
) WHERE price_rank <= 5
"""


@query("window_dense_rank_parts", sql=_RANK_SQL, tags=("window",))
def window_dense_rank(spark, sf_dir):
    """dense_rank is tie-stable (equal keys share a rank), so no
    synthetic tiebreaker is needed for determinism — every row with
    rank ≤ 5 appears in both engines."""
    part = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return (
        part.withColumn("price_rank", F.dense_rank().over(w))
        .filter(F.col("price_rank") <= 5)
        .select("p_brand", "p_partkey", "p_retailprice", "price_rank")
    )


_NTILE_SQL = """
SELECT p_brand, p_partkey, p_retailprice,
       NTILE(4) OVER (
         PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey
       ) AS price_quartile,
       CUME_DIST() OVER (
         PARTITION BY p_brand ORDER BY p_retailprice DESC
       ) AS price_cume
FROM part
"""


@query("window_ntile_cume_dist", sql=_NTILE_SQL, tags=("window",))
def window_ntile_cume_dist(spark, sf_dir):
    """Quartile bucketing (ntile) + cumulative distribution
    (cume_dist) per brand — the two ranking window functions the
    family didn't yet demonstrate (rank/dense_rank/percent_rank/
    row_number are covered elsewhere).  Determinism: ntile assigns by
    ROW position, so its ORDER BY carries the (price, partkey) total
    order; cume_dist is tie-stable (peers share a value) and emits the
    exact rational (#rows ≤ peer group)/n — one integer division both
    engines perform identically, no quantization needed.  Same
    single-shuffle window shape as `window_dense_rank_parts`:
    partition-bounded sort, no global window."""
    part = t(spark, sf_dir, "part")
    w_pos = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    w_val = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return part.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.ntile(4).over(w_pos).alias("price_quartile"),
        F.cume_dist().over(w_val).alias("price_cume"),
    )


# ---------------------------------------------------------------------------
# Sessionization: lag-gap flagging + cumulative session ids.
# ---------------------------------------------------------------------------

_SESSION_SQL = """
SELECT user_id,
       CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM (
  SELECT user_id,
         SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                ) <= 1800000000
                THEN 0 ELSE 1 END AS is_new
    FROM events
  )
)
GROUP BY user_id
"""


@query("window_sessionize_users", sql=_SESSION_SQL, tags=("window", "sessionize"))
def window_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → running sum as session id → per-user session counts.
    One shuffle on user_id serves both windows and the final agg
    (same partitioning reused across stages)."""
    ev = t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap (cast-to-long would truncate to seconds and
    # disagree with the oracle at 30:00.x boundaries). unix_micros requires
    # TIMESTAMP, and the events fixture stores TIMESTAMP_NTZ — cast first.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_ok = (ts_us - F.lag(ts_us).over(wo)) <= 1_800_000_000
    flagged = ev.withColumn("is_new", F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)))
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sessioned.groupBy("user_id").agg(
        F.countDistinct("session_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Built-in session_window (the native Spark form of sessionization;
# in streaming it is the watermarked session-window aggregation).
# ---------------------------------------------------------------------------

# Spark's session_window continues a session while ts < prev_ts + gap
# (STRICT <, unlike the lag-based query's <=); the oracle mirrors that.
_SESSION_WINDOW_SQL = """
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM (
  SELECT user_id, ts,
         SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                ) < 1800000000
                THEN 0 ELSE 1 END AS is_new
    FROM events
  )
)
GROUP BY user_id, session_id
"""


@query("window_session_window_native", sql=_SESSION_WINDOW_SQL, tags=("window", "sessionize"))
def window_session_window(spark, sf_dir):
    """groupBy(session_window(ts, '30 minutes'), user_id) — Catalyst's
    native merging session windows (one shuffle on user_id; in
    streaming form the same plan runs with a watermark). The oracle
    reproduces the STRICT-< gap rule with lag + running sum."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


_LEADLAG_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(date_diff('day',
            CAST(LAG(o_orderdate) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
            CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev,
       LEAD(o_orderkey) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
FROM orders
"""


@query("window_lead_lag_order_gaps", sql=_LEADLAG_SQL, tags=("window",))
def window_lead_lag(spark, sf_dir):
    """lead/lag frame navigation: per-customer inter-order gap in days
    and the following order's key. One shuffle on custkey; the
    (o_orderdate, o_orderkey) tiebreak makes offsets deterministic
    under ties — mandatory, since Spark and any oracle engine would
    otherwise disagree on equal-date neighbors."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("int")
        .alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


_TIME_ROLLING_SQL = """
SELECT event_id, user_id, ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(38,4))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
)
"""


@query("window_time_rolling_1h", sql=_TIME_ROLLING_SQL, tags=("window",))
def window_time_rolling_1h(spark, sf_dir):
    """TIME-RANGE rolling frame (RANGE, not ROWS): per user, each
    event sees the count and sum of events in ITS OWN trailing hour —
    the rolling-metric shape dashboards and rate limiters use, where
    a row-count frame is simply wrong under irregular event spacing.
    Spark's rangeBetween needs a numeric order column, so the frame
    runs over unix micros with inclusive [-1h, 0] bounds — identical
    peer semantics to SQL's RANGE (ties included).  The windowed sum
    is an EXACT DECIMAL sum: sliding-frame float aggregation uses
    different incremental structures per engine (add/remove vs
    segment trees), so a double sum would be ULP-unstable across
    engines; decimal is associative and exact under any structure.
    One hash shuffle on user_id serves both window functions."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).cast("bigint").alias("n_1h"),
        F.sum(F.col("value").cast("decimal(38,4)")).over(w).cast("double").alias("sum_1h"),
    )


# ---------------------------------------------------------------------------
# Cumulative distinct via first-touch attribution — the exact
# incremental form of "distinct users to date".
# ---------------------------------------------------------------------------

_CUM_DISTINCT_SQL = """
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
),
d AS (SELECT day, COUNT(*) AS n_new_users FROM f GROUP BY day)
SELECT day, n_new_users,
       CAST(SUM(n_new_users) OVER (
         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_distinct_users
FROM d ORDER BY day
"""


@query("window_cumulative_distinct_users", sql=_CUM_DISTINCT_SQL, tags=("window", "agg"))
def window_cumulative_distinct_users(spark, sf_dir):
    """Running DISTINCT-to-date user counts via FIRST-TOUCH
    attribution — the trick that turns an unbounded distinct-over-
    growing-window (which would re-scan history per day) into two
    hash aggregations plus a tiny running sum: each user contributes
    exactly once, on their first-seen day, and the cumulative distinct
    is the prefix sum of new-user counts.  At 100 TB the first-touch
    table is maintained incrementally (MERGE keeps min(day) per user)
    and the daily rollup never touches raw history again."""
    ev = t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    daily = first.groupBy("day").agg(F.count("*").alias("n_new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).cast("bigint").alias("cum_distinct_users"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Gaps-and-islands: consecutive-day activity streaks (round 11)
# ---------------------------------------------------------------------------

_STREAK_TOP = 20

_ISLANDS_SQL = f"""
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
grp AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER)
           AS anchor
  FROM days
),
islands AS (
  SELECT user_id, MIN(d) AS streak_start, CAST(COUNT(*) AS BIGINT) AS streak_days
  FROM grp GROUP BY user_id, anchor
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total_streaks FROM islands),
ranked AS (
  SELECT user_id, streak_start, streak_days,
         CAST(ROW_NUMBER() OVER (
           ORDER BY streak_days DESC, user_id, streak_start
         ) AS INTEGER) AS rk
  FROM islands
)
SELECT r.rk, r.user_id, r.streak_start, r.streak_days, t.n_total_streaks
FROM ranked r CROSS JOIN tot t
WHERE r.rk <= {_STREAK_TOP}
ORDER BY r.rk
"""


@query("window_activity_islands", sql=_ISLANDS_SQL, tags=("window", "analytics"))
def window_activity_islands(spark, sf_dir):
    """Gaps-and-islands: each user's consecutive-day activity streaks
    via the classic date-minus-row_number anchor (consecutive days
    share an anchor; any gap starts a new island) — the retention
    primitive behind streak badges and churn-risk features.  Emits
    the {top} longest streaks (deterministic tiebreak) plus the
    global streak count on every row; the oracle re-derives the
    islands independently.

    Scale: ONE user-partitioned window pass over the distinct
    (user, day) frame — the anchor trick turns streak detection into
    a plain two-key hash aggregation, no self-join over days and no
    iterative pass; the top-{top} head is a distributed
    TakeOrderedAndProject before the final rank window over {top}
    rows."""
    ev = t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    wrn = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(wrn))
    )
    islands = grp.groupBy("user_id", "anchor").agg(
        F.min("d").alias("streak_start"),
        F.count("*").cast("bigint").alias("streak_days"),
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    islands = pin(islands.drop("anchor"), eager=True)
    tot = islands.agg(F.count("*").cast("bigint").alias("n_total_streaks"))
    top = islands.orderBy(
        F.desc("streak_days"), "user_id", "streak_start"
    ).limit(_STREAK_TOP)
    wr = Window.orderBy(F.desc("streak_days"), "user_id", "streak_start")
    ranked = top.select(
        F.row_number().over(wr).cast("int").alias("rk"),
        "user_id",
        "streak_start",
        "streak_days",
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select("rk", "user_id", "streak_start", "streak_days", "n_total_streaks")
        .orderBy("rk")
    )


window_activity_islands.__doc__ = window_activity_islands.__doc__.format(
    top=_STREAK_TOP
)


# ---------------------------------------------------------------------------
# Exact trailing rolling median (round 11)
# ---------------------------------------------------------------------------

_ROLL_MED_DAYS = 7

_ROLL_MED_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY CAST(ts AS DATE)
),
win AS (
  SELECT a.day, a.n, b.n AS wn
  FROM daily a JOIN daily b
    ON b.day BETWEEN a.day - {_ROLL_MED_DAYS - 1} AND a.day
)
SELECT day, CAST(MAX(n) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_window,
       CAST(list_sort(list(wn))[CAST((COUNT(*) + 1) // 2 AS INTEGER)] AS BIGINT)
         AS median7,
       CAST((SUM(wn) * 1000000) // COUNT(*) AS BIGINT) AS mean7_e6
FROM win GROUP BY day
ORDER BY day
"""


@query("window_rolling_median_exact", sql=_ROLL_MED_SQL, tags=("window", "timeseries"))
def window_rolling_median_exact(spark, sf_dir):
    """EXACT trailing {d}-day rolling median (lower median = the
    ⌈k/2⌉-th smallest) and exact integer rolling mean (e6) of daily
    event volume — the robust smoother volume monitoring wants where
    a mean-based band (dq_seasonal_decompose) chases single-day
    spikes.  Ragged leading windows use however many days exist
    (n_window reports the width).

    Scale: the median runs over the DAILY aggregate, so the range
    self-join is |days|×≤{d} rows — the exact in-group sort costs
    nothing because aggregation happened FIRST; at raw-event scale
    the plan is identical (events collapse to |days| rows in one
    map-side-combined hash agg before any window math).  Spark has no
    exact median window function; the bounded range join + sorted-
    array pick IS the idiomatic exact form."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    daily = pin(daily, eager=True)
    a, b = daily.alias("a"), daily.alias("b")
    win = a.join(
        b,
        (F.col("b.day") >= F.date_sub(F.col("a.day"), _ROLL_MED_DAYS - 1))
        & (F.col("b.day") <= F.col("a.day")),
    ).select(F.col("a.day").alias("day"), F.col("a.n").alias("n"), F.col("b.n").alias("wn"))
    return (
        win.groupBy("day")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.count("*").cast("bigint").alias("n_window"),
            F.expr(
                "CAST(element_at(sort_array(collect_list(wn)),"
                " CAST((count(wn) + 1) div 2 AS INT)) AS BIGINT)"
            ).alias("median7"),
            F.expr("CAST((sum(wn) * 1000000) div count(wn) AS BIGINT)").alias(
                "mean7_e6"
            ),
        )
        .orderBy("day")
    )


window_rolling_median_exact.__doc__ = window_rolling_median_exact.__doc__.format(
    d=_ROLL_MED_DAYS
)


# ---------------------------------------------------------------------------
# Maximum drawdown (round 12)
# ---------------------------------------------------------------------------

_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT c.c_mktsegment AS mktsegment, o.o_orderdate AS d,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_mktsegment, o.o_orderdate
),
curve AS (
  SELECT mktsegment, d,
         SUM(rev) OVER (PARTITION BY mktsegment ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM daily
),
dd AS (
  SELECT mktsegment, d, cum,
         MAX(cum) OVER (PARTITION BY mktsegment ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cum AS drawdown
  FROM curve
),
mx AS (
  SELECT mktsegment, CAST(COUNT(*) AS BIGINT) AS n_days,
         MAX(drawdown) AS max_dd
  FROM dd GROUP BY mktsegment
)
SELECT m.mktsegment AS mktsegment, m.n_days,
       CAST(m.max_dd AS DOUBLE) AS max_drawdown,
       MIN(x.d) AS drawdown_day
FROM mx m JOIN dd x ON x.mktsegment = m.mktsegment AND x.drawdown = m.max_dd
GROUP BY m.mktsegment, m.n_days, m.max_dd
ORDER BY mktsegment
"""


@query("window_max_drawdown", sql=_DRAWDOWN_SQL, tags=("window", "analytics"))
def window_max_drawdown(spark, sf_dir):
    """MAXIMUM DRAWDOWN of the cumulative daily revenue curve per
    market segment — the peak-to-trough window composite (running
    SUM, running MAX over it, their gap, then the per-group max and
    its FIRST day): the risk metric every monitoring dashboard puts
    next to the trend line, and a window shape (window-over-window)
    none of the existing rank/frame queries exercise.  Revenue folds
    through exact DECIMAL(38,2) so the running sums, the running
    peaks, and the max-equality day lookup are bit-identical across
    engines; doubles appear only in the final display cast.

    Scale: one join + daily hash agg, then per-segment windows over
    the DAILY frame (O(segments × days) rows); the day lookup is an
    equi-join on the tiny per-segment max — no second scan of
    orders."""
    from trafik_etl_modular_spark.operators.pinning import pin

    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"), F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(38,2))"))
            .cast(T.DecimalType(38, 2))
            .alias("rev")
        )
    )
    w_cum = (
        Window.partitionBy("mktsegment")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = daily.select("mktsegment", "d", F.sum("rev").over(w_cum).alias("cum"))
    dd = pin(
        curve.select(
            "mktsegment",
            "d",
            (F.max("cum").over(w_cum) - F.col("cum")).alias("drawdown"),
        ),
        eager=True,  # feeds the per-segment max AND the day lookup
    )
    mx = dd.groupBy("mktsegment").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.max("drawdown").alias("max_dd"),
    )
    return (
        mx.join(
            dd.withColumnRenamed("drawdown", "max_dd"),
            ["mktsegment", "max_dd"],
        )
        .groupBy("mktsegment", "n_days", "max_dd")
        .agg(F.min("d").alias("drawdown_day"))
        .select(
            "mktsegment",
            "n_days",
            F.col("max_dd").cast("double").alias("max_drawdown"),
            "drawdown_day",
        )
        .orderBy("mktsegment")
    )


# ---------------------------------------------------------------------------
# Daily OHLC bars over the order book (round 12)
# ---------------------------------------------------------------------------

_OHLC_SQL = """
WITH priced AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY CAST(o_orderdate AS DATE)
                            ORDER BY o_orderdate, o_orderkey) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY CAST(o_orderdate AS DATE)
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d
  FROM orders
)
SELECT d,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
       CAST(MAX(cents) AS BIGINT) AS high_cents,
       CAST(MIN(cents) AS BIGINT) AS low_cents,
       CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
       CAST(SUM(cents) AS BIGINT) AS volume_cents
FROM priced
GROUP BY d
ORDER BY d
"""


@query("window_daily_ohlc", sql=_OHLC_SQL, tags=("window", "agg", "analytics"))
def window_daily_ohlc(spark, sf_dir) -> DataFrame:
    """DAILY OHLC BARS over the order book — open/high/low/close of
    order value plus count and exact-cents volume per order date: the
    candlestick aggregation every market/revenue dashboard draws.
    Open and close are selected by ROW_NUMBER with a FULL deterministic
    tie-break ((timestamp, orderkey), both directions) — never a bare
    first()/last(), whose Spark semantics are partition-order-
    dependent; high/low/volume are plain exact-cents min/max/sum.

    Scale: one window pass partitioned BY DAY (the natural event-time
    partition — parallel across days, no global sort) feeding one hash
    agg on the same key, so Catalyst reuses the day-hash exchange for
    both; everything is integer cents."""
    cents = "CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT)"
    priced = t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        F.expr(cents).alias("cents"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
    )
    wa = Window.partitionBy("d").orderBy("ts", "o_orderkey")
    wd = Window.partitionBy("d").orderBy(F.desc("ts"), F.desc("o_orderkey"))
    ranked = priced.select(
        "d",
        "cents",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        ranked.groupBy("d")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.max(F.when(F.col("rn_a") == 1, F.col("cents")))
            .cast("bigint")
            .alias("open_cents"),
            F.max("cents").cast("bigint").alias("high_cents"),
            F.min("cents").cast("bigint").alias("low_cents"),
            F.max(F.when(F.col("rn_d") == 1, F.col("cents")))
            .cast("bigint")
            .alias("close_cents"),
            F.sum("cents").cast("bigint").alias("volume_cents"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Trailing-window z-score anomaly flags (round 12)
# ---------------------------------------------------------------------------

_ZSCORE_MIN_N = 5
_ZSCORE_FLAG = 2.0

_ZSCORE_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY CAST(ts AS DATE)
),
m AS (
  SELECT d, c,
         CAST(COUNT(c) OVER w AS BIGINT) AS n,
         CAST(SUM(c) OVER w AS BIGINT) AS s,
         CAST(SUM(CAST(c AS HUGEINT) * c) OVER w AS HUGEINT) AS ss
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT d, c, n AS n_window, s AS window_sum,
       (CAST(ROUND((CAST(n * c - s AS DOUBLE)
          / sqrt(CAST((n * ss - CAST(s AS HUGEINT) * s) * n AS DOUBLE)
                 / CAST(n - 1 AS DOUBLE))) * 1e9) AS BIGINT) / 1e9) AS z_q,
       (ABS(CAST(ROUND((CAST(n * c - s AS DOUBLE)
          / sqrt(CAST((n * ss - CAST(s AS HUGEINT) * s) * n AS DOUBLE)
                 / CAST(n - 1 AS DOUBLE))) * 1e9) AS BIGINT) / 1e9)
        > CAST({_ZSCORE_FLAG} AS DOUBLE)) AS anomaly
FROM m
WHERE n >= {_ZSCORE_MIN_N}
ORDER BY d
"""


@query("window_rolling_zscore", sql=_ZSCORE_SQL, tags=("window", "quality", "timeseries"))
def window_rolling_zscore(spark, sf_dir) -> DataFrame:
    """TRAILING-WINDOW Z-SCORE anomaly flags on daily volume: each
    day scored against the mean/stddev of the 7 PRECEDING observed
    days (current day excluded — the leave-one-out control chart that
    complements the EWMA smoother and the CUSUM alarm).  Window
    moments (n, Σ, Σ²) are EXACT integers with the square
    HUGEINT/DECIMAL-widened; z = (n·c − s)/√((n·Σ² − s²)·n/(n−1))
    touches doubles only in the final divide/√, e9-quantized; days
    with fewer than {_ZSCORE_MIN_N} trailing observations are
    excluded rather than scored against noise.

    Scale: the firehose folds to |days| in one map-side-combined agg;
    the trailing frame is ONE window pass over the day-bounded series
    (single-partition on a dim-sized frame — the documented
    tradeoff; range-partition by month at multi-year spans)."""
    daily = t(spark, sf_dir, "events").groupBy(
        F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    w = Window.orderBy("d").rowsBetween(-7, -1)
    m = daily.select(
        "d",
        "c",
        F.count("c").over(w).cast("bigint").alias("n"),
        F.sum("c").over(w).cast("bigint").alias("s"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).over(w).alias("ss"),
    )
    from trafik_etl_modular_spark.functions.scalars import fquant

    z = fquant(
        F.expr("CAST(n * c - s AS DOUBLE)")
        / F.sqrt(
            F.expr("CAST((n * ss - CAST(s AS DECIMAL(38,0)) * s) * n AS DOUBLE)")
            / F.expr("CAST(n - 1 AS DOUBLE)")
        )
    )
    return (
        m.where(F.col("n") >= _ZSCORE_MIN_N)
        .select(
            "d",
            "c",
            F.col("n").alias("n_window"),
            F.col("s").alias("window_sum"),
            z.alias("z_q"),
            (F.abs(z) > F.lit(_ZSCORE_FLAG)).alias("anomaly"),
        )
        .orderBy("d")
    )


window_rolling_zscore.__doc__ = window_rolling_zscore.__doc__.format(
    _ZSCORE_MIN_N=_ZSCORE_MIN_N
)
