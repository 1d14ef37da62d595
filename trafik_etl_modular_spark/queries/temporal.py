"""Temporal join queries: as-of and bucketed range join, both checked
against exact ANSI oracles (DuckDB has a NATIVE ASOF JOIN — the
strongest possible differential check for a hand-built as-of).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.operators.temporal import (
    asof_join,
    nearest_join,
    range_join_buckets,
)
from trafik_etl_modular_spark.pipelines.incidents import build_incidents, incidents_cte_sql
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

# Each event → the user's latest PURCHASE at or before it.
_ASOF_SQL = """
SELECT l.event_id, l.user_id, l.ts,
       r.__ts AS purchase_ts_asof,
       r.purchase_value_asof
FROM events l
ASOF LEFT JOIN (
  SELECT user_id,
         ts AS __ts,
         MAX(value) AS purchase_value_asof
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY user_id, ts
) r ON l.user_id = r.user_id AND l.ts >= r.__ts
"""


@query("join_asof_last_purchase", sql=_ASOF_SQL, tags=("join", "temporal"))
def join_asof(spark, sf_dir):
    """AS-OF join via the union + sorted carry-forward trick (ONE
    shuffle on the key, no row explosion — operators/temporal.py).
    Right side deduped to one row per (user, ts) so the series is
    well-defined; checked against DuckDB's native ASOF JOIN."""
    ev = t(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
        .select("user_id", F.col("ts").alias("p_ts"), "purchase_value")
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases.select("user_id", F.col("p_ts"), "purchase_value"),
        key="user_id",
        left_ts="ts",
        right_ts="p_ts",
        value_cols=["p_ts", "purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("p_ts_asof").alias("purchase_ts_asof"),
        F.col("purchase_value_asof"),
    )


_CTE = "WITH " + incidents_cte_sql()

# Events counted against incidents active at their timestamp in the
# same county (start <= ts < end).
_RANGE_SQL = f"""{_CTE}
SELECT e.event_id,
       COUNT(i.incident_id) AS n_active_incidents
FROM events e
LEFT JOIN incidents i
  ON i.county_no = (e.user_id % 25)
 AND i.start_time_utc <= e.ts
 AND e.ts < i.end_time_utc
GROUP BY e.event_id
"""


@query("join_range_active_incidents", sql=_RANGE_SQL, tags=("join", "temporal"))
def join_range(spark, sf_dir):
    """Interval join via day-bucket candidates + exact range predicate
    (operators/temporal.py) — the shuffle key is (county, day), so
    candidate volume is bucket-local; Catalyst alone would plan the
    inequality as a nested-loop join. Aggregated to active-incident
    counts per event; LEFT semantics preserved by re-joining the
    matched counts onto the full event set."""
    ev = t(spark, sf_dir, "events").select(
        "event_id", (F.col("user_id") % 25).cast("int").alias("county_no"), "ts"
    )
    inc = build_incidents(spark, sf_dir).filter(
        F.col("end_time_utc").isNotNull() & F.col("county_no").isNotNull()
    )
    matched = range_join_buckets(
        ev,
        inc.select("incident_id", "county_no", "start_time_utc", "end_time_utc"),
        key="county_no",
        event_ts="ts",
        start_ts="start_time_utc",
        end_ts="end_time_utc",
    )
    counts = matched.groupBy("event_id").agg(
        F.count("*").alias("n_active_incidents")
    )
    return (
        t(spark, sf_dir, "events")
        .select("event_id")
        .join(counts, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_active_incidents", F.lit(0)).alias("n_active_incidents"),
        )
    )


_OVERLAP_SQL = """
WITH a AS (
  SELECT event_id AS a_id, ts AS a_start, ts + INTERVAL 5 MINUTE AS a_end
  FROM events WHERE event_type = 'error'
),
b AS (
  SELECT event_id AS b_id, ts AS b_start, ts + INTERVAL 5 MINUTE AS b_end
  FROM events WHERE event_type = 'purchase'
)
SELECT a.a_id, b.b_id,
       (epoch_us(LEAST(a.a_end, b.b_end)) -
        epoch_us(GREATEST(a.a_start, b.b_start))) AS overlap_micros
FROM a JOIN b
  ON a.a_start < b.b_end AND b.b_start < a.a_end
"""


@query("join_interval_overlap", sql=_OVERLAP_SQL, tags=("join", "temporal"))
def join_interval_overlap(spark, sf_dir):
    """Keyless INTERVAL × INTERVAL overlap join — error windows
    (ts, ts+5min) against purchase windows (ts, ts+5min), emitting
    every overlapping pair with its exact overlap length in micros
    (an integer difference, engine-exact).  The engine runs the
    bucketed shape (operators/temporal.py::interval_overlap_join):
    both sides explode to the hour buckets they touch, equi-join on
    the bucket, exact half-open predicate, pair dedup — candidate
    volume is per-bucket occupancy², never |A|×|B|.  The oracle runs
    the naive range join DuckDB can afford at fixture scale; the
    plan-hygiene test proves the engine side contains no cartesian
    or BNLJ node."""
    from trafik_etl_modular_spark.operators.temporal import interval_overlap_join

    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTE")).alias("a_end"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTE")).alias("b_end"),
    )
    pairs = interval_overlap_join(a, b, "a_start", "a_end", "b_start", "b_end")
    return pairs.select(
        "a_id",
        "b_id",
        (
            # fixture ts is TIMESTAMP_NTZ; cast through TIMESTAMP for
            # unix_micros (session tz is pinned UTC, so exact)
            F.unix_micros(F.least("a_end", "b_end").cast("timestamp"))
            - F.unix_micros(F.greatest("a_start", "b_start").cast("timestamp"))
        ).alias("overlap_micros"),
    )


# Each ERROR event → the user's nearest CLICK within ±15 minutes
# (nearest by |Δt| in exact microseconds; tie → the earlier click).
_NEAREST_SQL = """
WITH err AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
clk AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
),
cand AS (
  SELECT e.event_id, c.click_id, c.ts AS cts,
         ABS(epoch_us(e.ts) - epoch_us(c.ts)) AS d
  FROM err e JOIN clk c
    ON e.user_id = c.user_id
   AND c.ts BETWEEN e.ts - INTERVAL 15 MINUTE AND e.ts + INTERVAL 15 MINUTE
),
pick AS (
  SELECT event_id, click_id, cts, d,
         ROW_NUMBER() OVER (
           PARTITION BY event_id ORDER BY d, cts, click_id
         ) AS rn
  FROM cand
)
SELECT e.event_id AS error_id, e.user_id, e.ts AS error_ts,
       p.click_id AS click_id_nearest,
       p.cts AS click_ts_nearest,
       CAST(p.d AS BIGINT) AS diff_us_nearest
FROM err e
LEFT JOIN pick p ON e.event_id = p.event_id AND p.rn = 1
"""


@query("join_nearest_click_tolerance", sql=_NEAREST_SQL, tags=("join", "temporal"))
def join_nearest_click_tolerance(spark, sf_dir):
    """NEAREST-in-time join with tolerance (pandas merge_asof
    direction='nearest'): every error event matched to the same
    user's closest click within ±15 minutes, left outer, ties to the
    earlier click.  The engine runs the single-shuffle bidirectional
    carry (operators/temporal.py::nearest_join — one sort per key
    timeline, a backward and a forward window pass, map-side pick);
    the oracle runs the naive ±tolerance interval join + ROW_NUMBER
    pick that DuckDB can afford at fixture scale, so the comparison
    proves the carry trick IS the interval-join semantics.  Exact
    integer microsecond distances — no float time math."""
    ev = t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("error_ts")
    )
    clk = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", F.col("ts").alias("click_ts"), "click_id")
    )
    out = nearest_join(
        err,
        clk,
        key="user_id",
        left_ts="error_ts",
        right_ts="click_ts",
        value_cols=["click_id", "click_ts"],
        tolerance_us=15 * 60 * 1_000_000,
    )
    return out.select(
        "error_id",
        "user_id",
        "error_ts",
        "click_id_nearest",
        "click_ts_nearest",
        "diff_us_nearest",
    )
