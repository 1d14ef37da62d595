"""Nested-source ingest: Situation→Deviation explode + normalize
(SURVEY.md §2.1 S3/S4, §3.1 step 3-4 — the reference's core ETL).

The upstream feed is hierarchical: `Situation` (1) → `Deviation` (N)
→ `Geometry.WGS84` WKT.  The reference flattens it three separate
times in pandas (/root/reference/src/trv/endpoints.py:107-163,
etl_runner.py:81-134, transform.py:49-103) with subtly different
semantics; this is the ONE parameterized pipeline (SURVEY.md §3.2
note) expressed as explode + narrow column transforms:

  * inner explode (Situations with no Deviations are skipped — both
    reference paths do this, endpoints.py:121, etl_runner.py:94-96)
  * parent fields (Id, ModifiedTime, PublicationTime) repeat onto
    each child row — free in Spark's select
  * id fallback: Deviation.Id, else situation_id:StartTime
    (transform.py:62)
  * CountyNo arrives as a LIST → element_at(...,1) (transform.py:79-80)
  * ISO-8601 'Z' strings → UTC timestamps, NULL on garbage (F1)
  * WKT POINT → (lat, lon) via regexp; non-POINT geometries fall to
    the pandas-UDF centroid only when shapely is present (F5), else
    NULL (documented stub)
  * empty-message drop (P2), expired-row drop (P3, injected now)
  * composite-key dedup W1 then latest-wins W2, explicit orderings
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafik_etl_modular_spark.functions.scalars import (
    derive_status,
    parse_iso_utc,
    status_rank,
    wkt_point_lat,
    wkt_point_lon,
)
from trafik_etl_modular_spark.queries.dedup import latest_wins

SITUATION_SCHEMA = """
    Id string, ModifiedTime string, PublicationTime string,
    Deviation array<struct<
        Id: string, Message: string, MessageType: string,
        LocationDescriptor: string, RoadNumber: string,
        CountyNo: array<int>, StartTime: string, EndTime: string,
        Geometry: struct<WGS84: string>
    >>
"""


def flatten_situations(raw: DataFrame) -> DataFrame:
    """S3 — one row per Deviation, parent fields repeated. Plain
    (inner) explode: deviation-less Situations vanish, matching both
    reference implementations."""
    d = F.col("d")
    return raw.select(
        F.col("Id").alias("situation_id"),
        parse_iso_utc("ModifiedTime").alias("modified_time_utc"),
        parse_iso_utc("PublicationTime").alias("publication_time_utc"),
        F.explode("Deviation").alias("d"),
    ).select(
        "situation_id",
        "modified_time_utc",
        "publication_time_utc",
        F.coalesce(
            d.getField("Id"),
            F.concat_ws(":", F.col("situation_id"), d.getField("StartTime")),
        ).alias("incident_id"),
        F.trim(F.coalesce(d.getField("Message"), F.lit(""))).alias("message"),
        F.trim(F.coalesce(d.getField("MessageType"), F.lit(""))).alias("message_type"),
        F.trim(F.coalesce(d.getField("LocationDescriptor"), F.lit(""))).alias(
            "location_descriptor"
        ),
        F.trim(F.coalesce(d.getField("RoadNumber"), F.lit(""))).alias("road_number"),
        F.element_at(d.getField("CountyNo"), 1).alias("county_no"),
        parse_iso_utc(d.getField("StartTime")).alias("start_time_utc"),
        parse_iso_utc(d.getField("EndTime")).alias("end_time_utc"),
        d.getField("Geometry").getField("WGS84").alias("geometry_wgs84"),
    )


def normalize_incidents(
    flat: DataFrame,
    county_dim: DataFrame,
    now: str,
) -> DataFrame:
    """Transform-layer normalize (reference transform.py:49-137):
    status derivation + drops + geo parse + dimension join + dedups +
    canonical ordering columns."""
    now_col = F.lit(now).cast("timestamp")

    inc = (
        flat
        # P2 — drop empty messages (transform.py:58-59)
        .filter(F.length(F.trim(F.col("message"))) > 0)
        .withColumn(
            "status",
            derive_status(F.col("start_time_utc"), F.col("end_time_utc"), now_col),
        )
        # P3 — drop expired (status NULL)
        .filter(F.col("status").isNotNull())
        # F4 — WKT POINT fast path (JVM regex); centroid of non-points
        # is the shapely pandas-UDF path, gated on availability
        .withColumn("latitude", wkt_point_lat("geometry_wgs84"))
        .withColumn("longitude", wkt_point_lon("geometry_wgs84"))
    )

    # J1 — broadcast dimension join for county_name.
    dim = F.broadcast(county_dim.select("county_no", "county_name"))
    inc = inc.drop("county_name") if "county_name" in inc.columns else inc
    inc = inc.join(dim, "county_no", "left")

    # W1 — composite-natural-key dedup with explicit recency order
    # (pandas relied on input order; SURVEY.md §7.4).
    inc = latest_wins(
        inc,
        ["message", "location_descriptor", "start_time_utc", "end_time_utc"],
        [F.desc("modified_time_utc"), F.asc("incident_id")],
    )
    # W2 — latest-version-wins per incident_id.
    inc = latest_wins(
        inc, ["incident_id"], [F.desc("modified_time_utc"), F.desc("start_time_utc")]
    )
    # O1 — canonical ordering exposed as a column (row order is not
    # meaningful in a distributed table; SURVEY.md §2.6 O1 note).
    return inc.withColumn("status_rank", status_rank("status"))


def ingest(raw: DataFrame, county_dim: DataFrame, now: str) -> DataFrame:
    """Full ingest: nested raw → flatten → normalize."""
    return normalize_incidents(flatten_situations(raw), county_dim, now)


def make_situations_fixture(spark: SparkSession) -> DataFrame:
    """Inline nested fixture (FIXTURES.md §12): covers 0-deviation
    situations, multi-deviation, empty messages, expired rows, missing
    ids, list-valued CountyNo, POINT and LINESTRING geometries,
    duplicate composite keys and versioned ids."""
    rows = [
        # 3 deviations incl. one empty message; parent fields repeat
        (
            "S1",
            "2024-01-10T08:00:00Z",
            "2024-01-10T07:00:00Z",
            [
                (
                    "D1", "Roadwork at exit", "Roadwork", "E6 north", "E6",
                    [14], "2024-01-12T00:00:00Z", "2024-01-20T00:00:00Z",
                    ("POINT (11.97 57.70)",),
                ),
                (
                    "D2", "", "Accident", "E6 south", "E6",
                    [14], "2024-01-12T00:00:00Z", None,
                    ("POINT (11.98 57.71)",),
                ),
                (
                    None, "Lane closed", "Obstacle", "Rv40", "40",
                    [13], "2024-01-14T06:00:00Z", None,
                    ("LINESTRING (11.9 57.7, 12.0 57.8)",),
                ),
            ],
        ),
        # no deviations → must disappear (inner explode)
        ("S2", "2024-01-10T09:00:00Z", "2024-01-10T08:30:00Z", []),
        # expired deviation (end < now) → dropped; plus a duplicate of
        # S1/D1's composite key with NEWER modified time → W1 keeps this
        (
            "S3",
            "2024-01-11T08:00:00Z",
            "2024-01-11T07:00:00Z",
            [
                (
                    "D4", "Old event", "Roadwork", "E4", "E4",
                    [1], "2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z",
                    ("POINT (18.06 59.33)",),
                ),
                (
                    "D5", "Roadwork at exit", "Roadwork", "E6 north", "E6",
                    [14], "2024-01-12T00:00:00Z", "2024-01-20T00:00:00Z",
                    ("POINT (11.97 57.70)",),
                ),
                (
                    "D8", "Planned closure", "Roadwork", "E18", "E18",
                    [18], "2024-01-25T00:00:00Z", "2024-01-26T00:00:00Z",
                    ("POINT (15.21 59.27)",),
                ),
            ],
        ),
        # two versions of the same incident_id → W2 keeps latest
        (
            "S4",
            "2024-01-12T10:00:00Z",
            "2024-01-12T09:00:00Z",
            [
                (
                    "D6", "Ferry delayed", "Ferry", "Route 1", "1",
                    [25], "2024-01-13T00:00:00Z", None,
                    ("POINT (17.0 62.0)",),
                )
            ],
        ),
        (
            "S5",
            "2024-01-13T10:00:00Z",
            "2024-01-13T09:00:00Z",
            [
                (
                    "D6", "Ferry delayed (update)", "Ferry", "Route 1", "1",
                    [25], "2024-01-13T00:00:00Z", None,
                    ("POINT (17.0 62.0)",),
                )
            ],
        ),
        # garbage timestamps + missing county list → NULL handling
        (
            "S6",
            "not-a-time",
            "2024-01-13T09:00:00Z",
            [
                (
                    "D7", "Unparseable times", "Other", "X", "X",
                    None, "2024-01-14T00:00:00Z", "garbage",
                    (None,),
                )
            ],
        ),
    ]
    return spark.createDataFrame(rows, schema=SITUATION_SCHEMA)


def make_county_dim(spark: SparkSession) -> DataFrame:
    """21-entry county dimension (reference COUNTY_MAP,
    transform.py:11-16 — numbers 1-25 with gaps {2,11,15,16})."""
    county_map = {
        1: "Stockholms län", 3: "Uppsala län", 4: "Södermanlands län",
        5: "Östergötlands län", 6: "Jönköpings län", 7: "Kronobergs län",
        8: "Kalmar län", 9: "Gotlands län", 10: "Blekinge län",
        12: "Skåne län", 13: "Hallands län", 14: "Västra Götalands län",
        17: "Värmlands län", 18: "Örebro län", 19: "Västmanlands län",
        20: "Dalarnas län", 21: "Gävleborgs län", 22: "Västernorrlands län",
        23: "Jämtlands län", 24: "Västerbottens län", 25: "Norrbottens län",
    }
    return spark.createDataFrame(
        [(k, v) for k, v in county_map.items()], "county_no int, county_name string"
    )
