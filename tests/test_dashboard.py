"""Dashboard fan-out session (SURVEY.md §3.3, S8): six consumers must
share ONE cached base relation — the scan+normalize pipeline runs
once per session, not once per widget."""

from __future__ import annotations

from trafik_etl_modular_spark.pipelines.dashboard import dashboard_session

CONSUMERS = ("kpis", "county_bar", "daily_trend", "type_dist", "map_viewport", "table")


def test_dashboard_consumers_share_cached_base(spark, sf_dir):
    session = dashboard_session(spark, sf_dir)
    try:
        # every consumer's physical plan reads the in-memory relation,
        # not the parquet scan
        for name in CONSUMERS:
            plan = session[name]._jdf.queryExecution().executedPlan().toString()
            assert "InMemoryTableScan" in plan, f"{name} bypasses the cache:\n{plan}"

        kpis = session["kpis"].collect()[0]
        assert kpis["total"] == kpis["pagar"] + kpis["kommande"]

        bar = session["county_bar"].collect()
        assert 0 < len(bar) <= 10
        counts = [r["count"] for r in bar]
        assert counts == sorted(counts, reverse=True)

        trend_total = sum(r["count"] for r in session["daily_trend"].collect())
        dist_total = sum(r["count"] for r in session["type_dist"].collect())
        assert trend_total == dist_total == kpis["total"]

        vp = session["map_viewport"].collect()[0]
        assert vp["lat_min"] <= vp["lat_max"] and vp["lon_min"] <= vp["lon_max"]

        assert len(session["table"].collect()) <= 100
    finally:
        session["__base__"].unpersist()


def test_nearest_center_argmin_matches_python(spark, sf_dir):
    """The array_min struct argmin must equal a per-row Python argmin
    over the same 25 center literals, including the county tiebreak,
    and matches_recorded must be exactly (county_no == nearest)."""
    from trafik_etl_modular_spark.queries.filters import _CENTERS, inc_nearest_center

    rows = inc_nearest_center(spark, sf_dir).collect()
    assert rows
    from trafik_etl_modular_spark.pipelines.incidents import build_incidents

    pts = {
        r["incident_id"]: r
        for r in build_incidents(spark, sf_dir)
        .filter("latitude IS NOT NULL AND longitude IS NOT NULL")
        .select("incident_id", "county_no", "latitude", "longitude")
        .collect()
    }
    assert len(rows) == len(pts)
    for r in rows[:200]:
        p = pts[r["incident_id"]]
        best = min(
            ((p["latitude"] - lat) ** 2 + (p["longitude"] - lon) ** 2, no)
            for no, lat, lon in _CENTERS
        )[1]
        assert r["nearest_county_no"] == best
        assert r["matches_recorded"] == (
            p["county_no"] is not None and p["county_no"] == best
        )
