"""The one-shot ETL job: feed → flatten → normalize → MERGE → report
(SURVEY.md §3.1/§3.2 — the reference's `python -m src.cli` and
`run_etl()` entry points, unified into the ONE parameterized pipeline
the reference accidentally split in two).

Reference lifecycle reproduced end-to-end:
  extract   — paginated XML feed via the Python Data Source (S1–S4)
  transform — normalize_incidents: status, geo, dim join, W1+W2 dedup
  load      — partition-scoped MERGE into the date-partitioned table
              (S5/S6; idempotent — re-running the same feed is a
              no-op by latest-wins)
  report    — single-pass KPI aggregation (A4) + row-volume anomaly
              guards (reference cli.py:20-21,94-99: warn when outside
              [expect_min, expect_max]) + wall-clock seconds (F19)

Driver-side observability (the reference's Slack notifier,
notifier.py:43-64) stays OUT of the engine: the returned report dict
is the notification payload; emitting it is the caller's concern.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafik_etl_modular_spark.constants import NOW_UTC
from trafik_etl_modular_spark.functions.scalars import parse_iso_utc
from trafik_etl_modular_spark.pipelines.ingest import normalize_incidents
from trafik_etl_modular_spark.pipelines.sink import (
    conform_schema,
    merge_into_incidents,
    read_incidents,
)
from trafik_etl_modular_spark.sources.xml_feed import register_xml_feed

# The 13-column public schema (reference load_sqlite.py:6-41 — DDL +
# COLS_13), enforced on every write via conform_schema.
INCIDENTS_DDL = (
    "incident_id string, message string, message_type string, "
    "location_descriptor string, road_number string, county_name string, "
    "county_no int, start_time_utc timestamp, end_time_utc timestamp, "
    "modified_time_utc timestamp, latitude double, longitude double, "
    "status string"
)
COLS_13 = [f.split(" ")[0] for f in INCIDENTS_DDL.split(", ")]


def feed_to_flat(raw: DataFrame) -> DataFrame:
    """Adapt the feed source's page rows to the normalize pipeline's
    input contract (the feed already flattened Situation→Deviation;
    this is typing + the reference's id-fallback rule,
    transform.py:62)."""
    return raw.select(
        F.col("situation_id"),
        parse_iso_utc("modified_time").alias("modified_time_utc"),
        parse_iso_utc("publication_time").alias("publication_time_utc"),
        F.coalesce(
            F.col("deviation_id"),
            F.concat_ws(":", F.col("situation_id"), F.col("start_time")),
        ).alias("incident_id"),
        F.trim(F.coalesce(F.col("message"), F.lit(""))).alias("message"),
        F.trim(F.coalesce(F.col("message_type"), F.lit(""))).alias("message_type"),
        F.trim(F.coalesce(F.col("location_descriptor"), F.lit(""))).alias(
            "location_descriptor"
        ),
        F.trim(F.coalesce(F.col("road_number"), F.lit(""))).alias("road_number"),
        F.col("county_no"),
        parse_iso_utc("start_time").alias("start_time_utc"),
        parse_iso_utc("end_time").alias("end_time_utc"),
        F.col("wgs84").alias("geometry_wgs84"),
    )


def run_etl(
    spark: SparkSession,
    feed_dir: str,
    sink_path: str,
    county_dim: DataFrame,
    now: str = NOW_UTC,
    max_pages: int = 20,
    expect_min_rows: int = 50,
    expect_max_rows: int = 2000,
) -> dict:
    """Run the full ETL once; return the run report."""
    t0 = time.perf_counter()
    register_xml_feed(spark)
    raw = (
        spark.read.format("xml_feed")
        .option("path", feed_dir)
        .option("maxPages", str(max_pages))
        .load()
    )
    inc = normalize_incidents(feed_to_flat(raw), county_dim, now)
    # schema enforcement at the write boundary: source drift becomes
    # typed NULLs (caught by the anomaly band), never a corrupt table
    updates = conform_schema(inc, INCIDENTS_DDL)
    # Batch metrics ride the MERGE's own action via observe() —
    # CollectMetrics evaluates as rows stream past, so the update
    # batch is NEVER re-scanned for its row count / null-coord tally
    # (at 100 TB a second pass over the batch is real money).  The
    # dashboard KPI below is different: it measures the PUBLISHED
    # table, so it must read the sink.
    from pyspark.sql import Observation

    obs = Observation("ingest_batch")
    # coalesce inside the observe expression: SUM over an EMPTY batch
    # is NULL (not 0), and int(None) would blow up the report below.
    updates = updates.observe(
        obs,
        F.count(F.lit(1)).alias("batch_rows"),
        F.coalesce(
            F.sum(F.col("latitude").isNull().cast("long")), F.lit(0)
        ).alias("batch_null_coords"),
    )
    merge_into_incidents(spark, sink_path, updates)
    batch_metrics = obs.get if obs.get else {"batch_rows": 0, "batch_null_coords": 0}

    # A4 — one-pass KPI aggregation over the published table.
    kpi = (
        read_incidents(spark, sink_path)
        .agg(
            F.count("*").alias("rows"),
            F.sum(F.when(F.col("status") == "PÅGÅR", 1).otherwise(0)).alias("pagar"),
            F.sum(F.when(F.col("status") == "KOMMANDE", 1).otherwise(0)).alias(
                "kommande"
            ),
        )
        .collect()[0]
    )
    warnings = []
    if kpi["rows"] == 0:
        warnings.append("no rows in table after run")
    elif not (expect_min_rows <= kpi["rows"] <= expect_max_rows):
        warnings.append(
            f"row volume {kpi['rows']} outside expected "
            f"[{expect_min_rows}, {expect_max_rows}]"
        )
    return {
        "rows": kpi["rows"],
        "pagar": kpi["pagar"],
        "kommande": kpi["kommande"],
        "batch_rows": int(batch_metrics.get("batch_rows") or 0),
        "batch_null_coords": int(batch_metrics.get("batch_null_coords") or 0),
        "seconds": round(time.perf_counter() - t0, 2),
        "warnings": warnings,
    }
