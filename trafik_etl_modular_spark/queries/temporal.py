"""Temporal join queries: as-of and bucketed range join, both checked
against exact ANSI oracles (DuckDB has a NATIVE ASOF JOIN — the
strongest possible differential check for a hand-built as-of).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.operators.temporal import asof_join, range_join_buckets
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
