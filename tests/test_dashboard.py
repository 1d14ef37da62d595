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
