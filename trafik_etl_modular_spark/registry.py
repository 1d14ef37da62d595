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
]

# The driver's correctness pass checks exactly the FIRST 50 queries in
# registry iteration order.  This manifest pins those 50 slots
# explicitly so (a) families rotate through the official record until
# every oracle-bearing query has a driver-green row in some round, and
# (b) adding a query can never silently evict a family from the checked
# window (a pytest asserts registry[0:50] == DRIVER_WINDOW).  Every
# name here is oracle-bearing.
#
# Round-8 rotation (verdict r07 asks #1/#3/#4).  Slots 1–7: the seven
# queries ADDED this round, never driver-sampled — the IVF index
# maintenance lifecycle (incremental frozen-centroid append + retrain
# reassignment churn, the similarity-side analog of
# dedup_incremental_batch), the two sketch calibration reports
# (MinHash-LSH thresholds, SimHash radii), the int8 quantization
# recall certificate, the composed two-stage quantized probe, and the
# embedding-column DQ profile.
# Slots 8–43: the ENTIRE r04 cohort (36 queries), whose stamps would
# breach the "no stamp older than 3 rounds" discipline after this
# round.  Slots 44–50: the seven oldest r05 stamps (tools/stamps.py
# --window order) so the r05 cohort starts rotating before IT goes
# stale.  test_window_covers_stale_stamps enforces the staleness
# discipline mechanically from the CORRECTNESS_r*.json ledger.
DRIVER_WINDOW: list[str] = [
    # --- new this round, never sampled -----------------------------------
    "sim_ivf_incremental_append",
    "sim_ivf_retrain_reassignment",
    "dedup_lsh_calibration",
    "dedup_simhash_calibration",
    "sim_quantized_recall",
    "sim_ann_ivf_quantized_probe",
    "dq_embedding_profile",
    # --- newest stamp r04 (entire cohort) ---------------------------------
    "dedup_clusters",
    "dedup_composite_key",
    "dedup_distinct_projection",
    "dedup_incremental_batch",
    "dedup_latest_wins",
    "dedup_ngram_jaccard_prefix",
    "filter_quality_quantile",
    "inc_table_view",
    "multimodal_frame_sample",
    "multimodal_payload_stats",
    "pack_materialize_sequences",
    "pack_training_bins",
    "pergroup_percent_rank",
    "sample_per_source_cap",
    "sample_shuffle_shard",
    "sample_split_manifest",
    "sample_stratified_by_lang",
    "sample_token_budget_mix",
    "sample_weighted_by_quality",
    "setop_union_pages_dedup",
    "sim_ann_hyperplane_lsh",
    "sim_ann_ivf_probe",
    "sim_knn_join",
    "sim_topk_cosine_bruteforce",
    "streaming_interval_join",
    "streaming_interval_join_outer",
    "streaming_join_then_window",
    "streaming_session_window_native",
    "streaming_sessionize_stateful",
    "text_bpe_token_stats",
    "text_length_buckets",
    "text_pii_redact",
    "text_repetition_signals",
    "text_token_stats",
    "vocab_top_terms",
    "window_sessionize_users",
    # --- oldest r05 stamps (rotate before they age out) --------------------
    "agg_grouping_sets_flag_status",
    "agg_incremental_rollup",
    "curation_pipeline_v4",
    "dedup_chunk_remove",
    "dedup_fuzzy_name_pairs",
    "dedup_minhash_lsh",
    "dedup_semantic_embeddings",
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
