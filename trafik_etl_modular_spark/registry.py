"""Query registry — the single source of truth for the engine's surface.

Every named query/operator registers BOTH its Spark implementation
and (when SQL-expressible) the equivalent DuckDB oracle SQL in one
place, via the :func:`query` decorator.  The driver contract
(``__spark_entry__.queries`` / ``oracle_sql``) is derived from this
registry, so the two can never drift apart structurally.

Determinism rules every registered query must follow (SURVEY.md §7.4):
  * every computed column aliased identically in Spark and SQL;
  * any LIMIT/top-k carries a full deterministic tiebreaker;
  * `now` is the injected :data:`constants.NOW_UTC` literal;
  * floating aggregates over many rows go through
    :func:`trafik_etl_modular_spark.functions.scalars.dsum`
    (exact decimal sums) so partition-parallel summation cannot
    produce a different value than DuckDB's sequential sum.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# An oracle is either a literal SQL string or a BUILDER
# ``(sf_dir) -> str`` for oracles that must be derived from the
# fixture (e.g. the IVF probe freezes the deterministically-trained
# candidate set into an IN-list).  The driver contract surfaces plain
# strings, rendered for the driver's documented sf (DRIVER_SF_DIR);
# tools/oracle_check.py re-renders per sweep sf_dir.
# The scale factor the driver's t2 correctness pass runs at.
DRIVER_SF_DIR = "/root/testdata/sf0.01"


@dataclass
class Query:
    name: str
    fn: QueryFn
    sql: str | Callable[[str], str] | None  # DuckDB oracle; None → rows-only
    tags: tuple[str, ...] = ()
    doc: str = ""

    def render_sql(self, sf_dir: str) -> str | None:
        return self.sql(sf_dir) if callable(self.sql) else self.sql


REGISTRY: dict[str, Query] = {}

# Modules that register queries on import. Order is documentation-only:
# the externally visible iteration order is fixed by DRIVER_WINDOW below.
_QUERY_MODULES = [
    "trafik_etl_modular_spark.queries.tpch",
    "trafik_etl_modular_spark.queries.tpch_deep",
    "trafik_etl_modular_spark.queries.tpch_partsupp",
    "trafik_etl_modular_spark.queries.incidents",
    "trafik_etl_modular_spark.queries.filters",
    "trafik_etl_modular_spark.queries.aggregates",
    "trafik_etl_modular_spark.queries.windows",
    "trafik_etl_modular_spark.queries.dedup",
    "trafik_etl_modular_spark.queries.events_json",
    "trafik_etl_modular_spark.queries.presentation",
    "trafik_etl_modular_spark.queries.llmdata",
    "trafik_etl_modular_spark.queries.streaming",
    "trafik_etl_modular_spark.queries.source_feed",
    "trafik_etl_modular_spark.queries.skew",
    "trafik_etl_modular_spark.queries.temporal",
    "trafik_etl_modular_spark.queries.dq",
    "trafik_etl_modular_spark.queries.graph",
    "trafik_etl_modular_spark.queries.web",
    "trafik_etl_modular_spark.queries.sketches",
    "trafik_etl_modular_spark.queries.spatial",
    "trafik_etl_modular_spark.queries.incremental_views",
]

# The driver's correctness pass checks exactly the FIRST 50 queries in
# registry iteration order.  This manifest pins those 50 slots
# explicitly so (a) families rotate through the official record until
# every oracle-bearing query has a driver-green row in some round, and
# (b) adding a query can never silently evict a family from the checked
# window (a pytest asserts registry[0:50] == DRIVER_WINDOW).  Every
# name here is oracle-bearing.
#
# Round-9 rotation (verdict r08 ask #1; ADVICE r08 item 4), revised
# mid-round when the second round-9 batch landed 8 more queries.
# With N=201 registered, the dynamic staleness cycle is now
# max(4, ceil(201/50)) = 5 rounds — the exact relaxation the cycle
# formula exists for (a 50-slot window cannot cover >200 queries on
# a 4-round cadence).  Slots:
#   * 26 of the 38 r05-stamped queries (the other 12 — the sample_*
#     quartet, the scd2 pair, the vocab pair, the events_* cohort
#     pair, dq_histogram_value, inc_daily_trend_gapfill — stay
#     r05-stamped, which the 5-round cycle permits; they are round
#     10's FORCED rotation: `python tools/stamps.py --plan-next`
#     prints the exact obligation);
#   * 7 queries whose FUNCTION OR ORACLE changed since their newest
#     stamp (r8 diff: curation_pipeline_v5 decimal snap,
#     running-revenue window-order totalization, trimmed-mean oracle
#     rewrite; r9 diff: pagerank decimal hardening, probe qvec
#     row-filtered fetch, _QDOT dim derivation) — enforced by
#     tests/test_contract.py::test_nonwindow_queries_unchanged_since_stamp
#     against tools/stamped_hashes.json;
#   * all 17 never-stamped queries: the five from the first round-9
#     batch (IVF compaction, perceptual + incremental media dedup,
#     IVF-PQ probe + recall), the eight from the second (URL
#     canonical dedup, host policy, Benford, spatial grid join,
#     triangle count, Bloom prefilter, CMS, KMV), and the four from
#     the third (join IVM, CDC tombstones, Bloom append, spatial
#     probe-panel kNN).
# NOTE for round 10 (latest=r09, cycle 5 ⇒ forcing edge r05): the 12
# deferred r05 queries above are mandatory; begin pre-rotating the
# 49-query r06 cohort with the remaining slots so round 11 (when r06
# hits the forcing edge) still has room for its own new queries.
DRIVER_WINDOW: list[str] = [
    # --- entire r05-stamped cohort (stale once r09 ledger lands) ------
    "dedup_simhash_candidates",
    "dedup_snapshot_diff",
    "dq_outlier_report",
    "dq_table_fingerprint",
    "filter_dashboard_pipeline",
    "inc_geo_imputation",
    "inc_kpi_counts",
    "inc_normalize",
    "join_anti_customers_no_urgent_orders",
    "join_bucketed_colocated",
    "join_interval_overlap",
    "join_scd2_asof_lookup",
    "join_semi_customers_with_big_orders",
    "multimodal_dedup_exact",
    "multimodal_extract_features",
    "sim_ann_ivf_build",
    "sim_centroids_by_label",
    "sim_hard_negatives",
    "source_schema_evolution_scan",
    "streaming_incremental_dedup",
    "streaming_interval_join_full_outer",
    "streaming_scd2_enrich",
    "text_gopher_rules",
    "text_quality_classifier",
    "tpch_q1_pricing_summary",
    "window_time_rolling_1h",
    # --- changed since newest stamp (r8/r9 diffs) ---------------------
    "curation_pipeline_v5",
    "window_running_revenue_per_supplier",
    "text_trimmed_mean_tokens",
    "graph_pagerank_3iter",
    "sim_ann_ivf_probe",
    "sim_ann_ivf_quantized_probe",
    "sim_quantized_recall",
    # --- never-stamped: round-9 first batch ----------------------------
    "sim_ann_ivf_pq_probe",
    "sim_pq_recall",
    "multimodal_dedup_incremental",
    "sim_ivf_compact",
    "multimodal_dedup_perceptual",
    # --- never-stamped: round-9 second batch ---------------------------
    "dedup_url_canonical",
    "text_host_quality_policy",
    "dq_benford_digit_test",
    "join_spatial_neighbor_pairs",
    "graph_triangle_count",
    "dedup_bloom_prefilter",
    "agg_cms_heavy_hitters",
    "agg_kmv_distinct_jaccard",
    # --- never-stamped: round-9 third batch (join IVM + CDC deletes,
    # Bloom append mergeability) --------------------------------------
    "merge_join_ivm",
    "merge_cdc_apply_tombstones",
    "dedup_bloom_append",
    "join_spatial_knn_probes",
]


def query(name: str, sql: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, sql=sql, tags=tuple(tags), doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    # Every listed module must exist and import cleanly — a missing
    # module means lost queries, which must fail loudly, not silently
    # shrink the registry (round-1 lesson: a stale entry hid behind a
    # ModuleNotFoundError swallow).
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _apply_driver_window_order()


def _apply_driver_window_order() -> None:
    """Rebuild REGISTRY so iteration starts with DRIVER_WINDOW.

    The driver derives its 50-query correctness sample from
    ``queries()`` dict order, so the order must be an explicit,
    test-guarded contract — not an accident of module import order.
    Idempotent; fails loudly if a manifest name disappears.
    """
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    window = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    rest = {n: q for n, q in REGISTRY.items() if n not in window}
    REGISTRY.clear()
    REGISTRY.update(window)
    REGISTRY.update(rest)


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracle_sql(sf_dir: str = DRIVER_SF_DIR) -> dict[str, str]:
    _load_all()
    return {
        name: q.render_sql(sf_dir)
        for name, q in REGISTRY.items()
        if q.sql is not None
    }
