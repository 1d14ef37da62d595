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
