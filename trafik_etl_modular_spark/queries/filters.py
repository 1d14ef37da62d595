"""Projection / filter / predicate family (SURVEY.md §2.2, P1–P10).

Each predicate shape the reference dashboard applies
(/root/reference/src/app/streamlit_app.py:229-251) plus the transform
layer's filters, expressed so Catalyst pushes them into the parquet
scan (verify with .explain → PushedFilters).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from trafik_etl_modular_spark.pipelines.incidents import build_incidents, incidents_cte_sql
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

_CTE = "WITH " + incidents_cte_sql()


# ---------------------------------------------------------------------------
# P4+P5+P6+P7+P9 — the dashboard's whole predicate pipeline in one query
# (§3.3 step 3): status IN, county IN, half-open timestamp range,
# case-insensitive OR-contains free text, geo not-null.
# ---------------------------------------------------------------------------

_PIPELINE_SQL = f"""{_CTE}
SELECT incident_id, message_type, county_name, start_time_utc, status,
       latitude, longitude
FROM incidents
WHERE status IN ('PÅGÅR', 'KOMMANDE')
  AND county_name IN ('NATION_1', 'NATION_4', 'NATION_7', 'Okänt län')
  AND start_time_utc >= TIMESTAMP '2024-01-05 00:00:00'
  AND start_time_utc <  TIMESTAMP '2024-01-25 00:00:00'
  AND (contains(lower(COALESCE(message, '')), '1')
       OR contains(lower(COALESCE(message_type, '')), 'c'))
  AND latitude IS NOT NULL AND longitude IS NOT NULL
"""


@query("filter_dashboard_pipeline", sql=_PIPELINE_SQL, tags=("filter",))
def filter_dashboard_pipeline(spark, sf_dir):
    """The six-widget predicate chain over the cached base relation.

    In the reference each widget re-filters a pandas copy; here the
    conjunction is a single Catalyst Filter node — one scan, all
    predicates evaluated together, simple comparisons pushed to
    parquet row-group pruning.
    """
    inc = build_incidents(spark, sf_dir)
    text_cols = ["message", "message_type"]
    needles = ["1", "c"]
    or_contains = reduce(
        lambda a, b: a | b,
        [
            F.lower(F.coalesce(F.col(c), F.lit(""))).contains(q)
            for c, q in zip(text_cols, needles)
        ],
    )
    return inc.filter(
        F.col("status").isin("PÅGÅR", "KOMMANDE")
        & F.col("county_name").isin("NATION_1", "NATION_4", "NATION_7", "Okänt län")
        & (F.col("start_time_utc") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
        & (F.col("start_time_utc") < F.lit("2024-01-25 00:00:00").cast("timestamp"))
        & or_contains
        & F.col("latitude").isNotNull()
        & F.col("longitude").isNotNull()
    ).select(
        "incident_id",
        "message_type",
        "county_name",
        "start_time_utc",
        "status",
        "latitude",
        "longitude",
    )


# ---------------------------------------------------------------------------
# P7 — multi-column case-insensitive OR-contains over documents.
# ---------------------------------------------------------------------------

_ORCONTAINS_SQL = """
SELECT doc_id, lang, source
FROM documents
WHERE contains(lower(COALESCE(text, '')), 'spark')
   OR contains(lower(COALESCE(source, '')), 'src1')
"""


@query("filter_or_contains_text", sql=_ORCONTAINS_SQL, tags=("filter", "text"))
def filter_or_contains(spark, sf_dir):
    """Null-safe OR of lowercase contains (reference
    streamlit_app.py:239-245)."""
    docs = t(spark, sf_dir, "documents")
    return docs.filter(
        F.lower(F.coalesce(F.col("text"), F.lit(""))).contains("spark")
        | F.lower(F.coalesce(F.col("source"), F.lit(""))).contains("src1")
    ).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# P8 — regex contains (pandas str.contains is regex by default;
# preserved as rlike, SURVEY.md §7.4).
# ---------------------------------------------------------------------------

_RLIKE_SQL = """
SELECT p_partkey, p_name, p_type
FROM part
WHERE regexp_matches(p_type, '(?i)^(sta|sm|pro)')
"""


@query("filter_regex_road", sql=_RLIKE_SQL, tags=("filter",))
def filter_regex(spark, sf_dir):
    """Case-insensitive regex filter (reference P8,
    streamlit_app.py:247-248 — pandas contains == regex search,
    so an UNANCHORED rlike, mirrored by regexp_matches)."""
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type").rlike("(?i)^(sta|sm|pro)"))
        .select("p_partkey", "p_name", "p_type")
    )


# ---------------------------------------------------------------------------
# P6 — half-open timestamp range with IN-list (orders table view).
# ---------------------------------------------------------------------------

_RANGE_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice > 150000
"""


@query("filter_range_inlist_orders", sql=_RANGE_SQL, tags=("filter",))
def filter_range_inlist(spark, sf_dir):
    """Half-open [a,b) event-time range (reference builds end as
    date_to + 1 day, streamlit_app.py:234-236) + IN-list + numeric
    threshold, all pushed to the scan."""
    return (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_totalprice") > 150000)
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# P9 + J3 — geo null-pair drop and broadcast-join imputation.
# ---------------------------------------------------------------------------

# NB: decimal-vs-double literal trap — DuckDB types 0.3 as DECIMAL and
# would compute county_no*0.3 exactly, while Spark's double gives
# 23*0.3 = 6.8999…95; cast the literals so both engines do IEEE math.
_IMPUTE_SQL = f"""{_CTE}
SELECT incident_id, county_name,
       COALESCE(latitude,  55.0 + county_no * CAST(0.3 AS DOUBLE), 62.0) AS lat_display,
       COALESCE(longitude, 11.0 + county_no * CAST(0.2 AS DOUBLE), 15.0) AS lon_display
FROM incidents
"""


@query("inc_geo_imputation", sql=_IMPUTE_SQL, tags=("filter", "join"))
def inc_geo_imputation(spark, sf_dir):
    """J3 — missing coordinates imputed from a per-county center with a
    global fallback. The reference does a row-wise pandas apply over a
    dict (streamlit_app.py:392-399); here it's a coalesce chain — pure
    narrow projection, no Python, no shuffle."""
    inc = build_incidents(spark, sf_dir)
    return inc.select(
        "incident_id",
        "county_name",
        F.coalesce(
            F.col("latitude"), F.lit(55.0) + F.col("county_no") * 0.3, F.lit(62.0)
        ).alias("lat_display"),
        F.coalesce(
            F.col("longitude"), F.lit(11.0) + F.col("county_no") * 0.2, F.lit(15.0)
        ).alias("lon_display"),
    )


# ---------------------------------------------------------------------------
# J3 extension — nearest-center geo classification (the map-domain op
# behind the reference's county click-filter: which county's center is
# this point closest to).
# ---------------------------------------------------------------------------

_CENTERS = [(no, 55.0 + no * 0.3, 11.0 + no * 0.2) for no in range(25)]

_NEAREST_SQL = f"""{_CTE},
pts AS (
  SELECT incident_id, county_no, latitude, longitude FROM incidents
  WHERE latitude IS NOT NULL AND longitude IS NOT NULL
),
centers(c_no, c_lat, c_lon) AS (VALUES
  {", ".join(f"({no}, {lat!r}, {lon!r})" for no, lat, lon in _CENTERS)}
),
scored AS (
  SELECT p.incident_id, p.county_no, c.c_no,
         ROW_NUMBER() OVER (
           PARTITION BY p.incident_id
           ORDER BY (p.latitude - c.c_lat) * (p.latitude - c.c_lat)
                    + (p.longitude - c.c_lon) * (p.longitude - c.c_lon),
                    c.c_no
         ) AS rn
  FROM pts p CROSS JOIN centers c
)
SELECT incident_id, county_no,
       CAST(c_no AS INTEGER) AS nearest_county_no,
       (county_no IS NOT NULL AND county_no = c_no) AS matches_recorded
FROM scored WHERE rn = 1
"""


@query("inc_nearest_center", sql=_NEAREST_SQL, tags=("filter", "join", "geo"))
def inc_nearest_center(spark, sf_dir):
    """Nearest-county-center CLASSIFICATION — the geometric audit of
    the recorded dimension FK (which incidents sit geographically in a
    different county than their tag says; the reference's map/county
    interplay, streamlit_app.py:141-146 + 375-376).  The 25 centers
    are broadcast MODEL LITERALS frozen identically into both plans
    (the hyperplane-LSH pattern), and the argmin is a single
    zero-shuffle projection: an array of 25 (distance, county) structs
    reduced by array_min with the county as tiebreaker — no fan-out
    join, no window, O(rows·25) map work that scales embarrassingly.
    The oracle takes the 25× cross-join + window form; identical
    literals and expression order make the doubles — and therefore
    the argmin — bit-equal."""
    from trafik_etl_modular_spark.pipelines.incidents import build_incidents

    inc = build_incidents(spark, sf_dir)
    pts = inc.filter(
        F.col("latitude").isNotNull() & F.col("longitude").isNotNull()
    ).select("incident_id", "county_no", "latitude", "longitude")
    candidates = F.array(
        *[
            F.struct(
                (
                    (F.col("latitude") - F.lit(lat)) * (F.col("latitude") - F.lit(lat))
                    + (F.col("longitude") - F.lit(lon))
                    * (F.col("longitude") - F.lit(lon))
                ).alias("d"),
                F.lit(no).alias("c"),
            )
            for no, lat, lon in _CENTERS
        ]
    )
    nearest = F.array_min(candidates)["c"].cast("int")
    return pts.select(
        "incident_id",
        "county_no",
        nearest.alias("nearest_county_no"),
        (
            F.col("county_no").isNotNull() & (F.col("county_no") == nearest)
        ).alias("matches_recorded"),
    )
