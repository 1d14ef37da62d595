"""Ingest pipeline semantics (SURVEY.md §2.1 S3, §3.1) against the
handcrafted nested fixture — the reference-specific behaviors DuckDB
oracle queries can't cover."""

from __future__ import annotations

import pytest

from trafik_etl_modular_spark.pipelines.ingest import (
    flatten_situations,
    ingest,
    make_county_dim,
    make_situations_fixture,
)

NOW = "2024-01-16 00:00:00"


@pytest.fixture(scope="module")
def flat(spark):
    return flatten_situations(make_situations_fixture(spark))


@pytest.fixture(scope="module")
def result(spark):
    return ingest(make_situations_fixture(spark), make_county_dim(spark), NOW).cache()


def test_inner_explode_skips_empty_situations(flat):
    # S2 has no deviations → contributes no rows
    assert flat.filter("situation_id = 'S2'").count() == 0


def test_parent_fields_repeat(flat):
    rows = flat.filter("situation_id = 'S1'").collect()
    assert len(rows) == 3
    assert len({r["modified_time_utc"] for r in rows}) == 1


def test_id_fallback(flat):
    # S1's third deviation has no Id → situation_id:StartTime
    ids = {r["incident_id"] for r in flat.filter("situation_id = 'S1'").collect()}
    assert "S1:2024-01-14T06:00:00Z" in ids


def test_county_list_truncation(flat):
    r = flat.filter("incident_id = 'D1'").collect()[0]
    assert r["county_no"] == 14  # element_at(CountyNo, 1)


def test_empty_message_dropped(result):
    assert result.filter("incident_id = 'D2'").count() == 0  # P2


def test_expired_dropped(result):
    assert result.filter("incident_id = 'D4'").count() == 0  # P3


def test_composite_dedup_keeps_newest(result):
    # D1 (S1, modified 01-10) and D5 (S3, modified 01-11) share the
    # composite natural key → W1 keeps D5
    assert result.filter("incident_id = 'D1'").count() == 0
    assert result.filter("incident_id = 'D5'").count() == 1


def test_latest_wins_per_incident_id(result):
    rows = result.filter("incident_id = 'D6'").collect()
    assert len(rows) == 1
    assert rows[0]["message"] == "Ferry delayed (update)"  # W2: newer version


def test_wkt_point_parsed_and_county_joined(result):
    r = result.filter("incident_id = 'D5'").collect()[0]
    assert (r["longitude"], r["latitude"]) == (11.97, 57.70)
    assert r["county_name"] == "Västra Götalands län"  # J1 broadcast join


def test_unparseable_timestamps_null(result):
    r = result.filter("incident_id = 'D7'").collect()[0]
    assert r["modified_time_utc"] is None  # 'not-a-time'
    assert r["end_time_utc"] is None  # 'garbage'
    assert r["status"] == "PÅGÅR"  # starts 01-14 < now, NULL end → ongoing
    assert r["county_no"] is None  # CountyNo missing


def test_status_rank_column(result):
    ranks = {r["incident_id"]: r["status_rank"] for r in result.collect()}
    assert ranks["D5"] == 0  # started 01-12 < now, ends 01-20 > now → PÅGÅR
    assert ranks["D7"] == 0  # starts 01-14 < now, NULL end → PÅGÅR
    assert ranks["D6"] == 0  # starts 01-13 < now, open-ended → PÅGÅR
    assert ranks["D8"] == 1  # starts 01-25 > now → KOMMANDE
