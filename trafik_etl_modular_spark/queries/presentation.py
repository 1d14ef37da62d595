"""Presentation/formatting layer queries (SURVEY.md §2.6 O2–O4, §2.8
F2/F9/F13/F14) and the reference's implicit set operations (§2.7).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trafik_etl_modular_spark.functions.scalars import fmt_utc_z, truncate_ellipsis
from trafik_etl_modular_spark.pipelines.incidents import build_incidents, incidents_cte_sql
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

_CTE = "WITH " + incidents_cte_sql()

# ---------------------------------------------------------------------------
# O3 — user-selected sort + limit (the dashboard table view).
# ---------------------------------------------------------------------------

_TABLE_VIEW_SQL = f"""{_CTE}
SELECT incident_id, message_type, county_name,
       strftime(start_time_utc, '%Y-%m-%d %H:%M:%S') || ' UTC' AS start_str,
       strftime(modified_time_utc, '%Y-%m-%d %H:%M:%S') || ' UTC' AS mod_str
FROM incidents
ORDER BY modified_time_utc DESC, incident_id
LIMIT 100
"""


@query("inc_table_view", sql=_TABLE_VIEW_SQL, tags=("sort", "format"))
def inc_table_view(spark, sf_dir):
    """O3 + F13 — sort by recency, cap at 100 rows (reference
    streamlit_app.py:223-226,468-477), display-formatted timestamps.
    Plans as TakeOrderedAndProject: per-partition top-100, no global
    sort."""
    inc = build_incidents(spark, sf_dir)
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (
        inc.select(
            "incident_id",
            "message_type",
            "county_name",
            F.concat(F.date_format("start_time_utc", fmt), F.lit(" UTC")).alias("start_str"),
            F.concat(F.date_format("modified_time_utc", fmt), F.lit(" UTC")).alias("mod_str"),
            F.col("modified_time_utc").alias("__ord"),
        )
        .orderBy(F.desc("__ord"), F.asc("incident_id"))
        .limit(100)
        .drop("__ord")
    )


# ---------------------------------------------------------------------------
# F2 + F9 + F14 — formatting scalars in one projection.
# ---------------------------------------------------------------------------

_FORMATS_SQL = f"""{_CTE}
SELECT incident_id,
       strftime(start_time_utc, '%Y-%m-%dT%H:%M:%S') || 'Z' AS start_z,
       CASE WHEN length(message) > 12
            THEN substring(message, 1, 12) || '…' ELSE message END AS message_short,
       start_time_utc + INTERVAL 14 DAY AS review_deadline,
       CAST(start_time_utc AS DATE) AS start_date
FROM incidents
"""


@query("inc_display_formats", sql=_FORMATS_SQL, tags=("format", "scalar"))
def inc_display_formats(spark, sf_dir):
    """F2 (Z-suffix UTC format), F9 (ellipsis truncation), F14
    (interval arithmetic), F12 (date extraction) — all JVM-side."""
    inc = build_incidents(spark, sf_dir)
    return inc.select(
        "incident_id",
        fmt_utc_z("start_time_utc").alias("start_z"),
        truncate_ellipsis("message", 12).alias("message_short"),
        F.expr("start_time_utc + INTERVAL 14 DAY").alias("review_deadline"),
        F.to_date("start_time_utc").alias("start_date"),
    )


# ---------------------------------------------------------------------------
# §2.7 — multi-page accumulation as UNION ALL + dedup (S4's implicit
# set op), plus except/intersect shapes the reference lacks.
# ---------------------------------------------------------------------------

_UNION_SQL = """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type FROM events WHERE event_id % 3 = 0
  UNION ALL
  SELECT event_id, user_id, event_type FROM events WHERE event_id % 2 = 0
)
GROUP BY event_id, user_id, event_type
"""


@query("setop_union_pages_dedup", sql=_UNION_SQL, tags=("setop",))
def setop_union_pages(spark, sf_dir):
    """S4's page accumulation: overlapping 'pages' unioned then
    deduped (the reference's seen_ids set during pagination,
    endpoints.py:177-202). unionByName + dropDuplicates — the dedup
    is a hash aggregate on the full row."""
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    page_a = ev.filter(F.col("event_id") % 3 == 0)
    page_b = ev.filter(F.col("event_id") % 2 == 0)
    return page_a.unionByName(page_b).dropDuplicates()


_WINDOW_PRED = "ts < TIMESTAMP '2024-01-04 00:00:00'"

_INTERSECT_SQL = f"""
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND {_WINDOW_PRED}
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND {_WINDOW_PRED}
"""


@query("setop_intersect_users", sql=_INTERSECT_SQL, tags=("setop",))
def setop_intersect(spark, sf_dir):
    """INTERSECT — users who both purchased and errored in the first
    three days (the window keeps the result non-trivial)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp")
    )
    a = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    b = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return a.intersect(b)


_EXCEPT_SQL = f"""
SELECT DISTINCT user_id FROM events WHERE event_type = 'view' AND {_WINDOW_PRED}
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND {_WINDOW_PRED}
"""


@query("setop_except_users", sql=_EXCEPT_SQL, tags=("setop",))
def setop_except(spark, sf_dir):
    """EXCEPT — first-three-day viewers who didn't purchase in that
    window."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp")
    )
    a = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    b = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return a.exceptAll(b).distinct()
