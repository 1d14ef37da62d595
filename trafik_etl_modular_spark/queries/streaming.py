"""Registered queries that RUN Structured Streaming (file-source
micro-batches driven to completion, memory/foreachBatch sinks) and
return batch frames whose contents are deterministic — so even the
streaming operators get full DuckDB-oracle checks:

  * windowed agg  — same result as the batch tumbling query;
  * streaming dedup — key SET is batch-order independent;
  * foreachBatch upsert — recency-wins state is batch-order
    independent by construction.
"""

from __future__ import annotations

from trafik_etl_modular_spark.functions.scalars import oracle_dsum
from trafik_etl_modular_spark.registry import query
from trafik_etl_modular_spark.streaming.pipeline import (
    dedup_within_watermark,
    hourly_windowed_counts,
    interval_joined_clicks_outer,
    interval_joined_purchases,
    joined_then_windowed,
    session_windowed_native,
    sliding_windowed_counts,
    static_enriched_counts,
    upsert_sink_run,
)
from trafik_etl_modular_spark.streaming.sessionize import streaming_sessionize

_HOURLY_SQL = f"""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n,
       {oracle_dsum('value', 2)} AS total_value
FROM events
GROUP BY 1, 2
"""


@query("streaming_hourly_window", sql=_HOURLY_SQL, tags=("streaming", "agg"))
def streaming_hourly_window(spark, sf_dir):
    """Watermarked tumbling 1-hour window over the event stream —
    complete-mode emission equals the batch group-by, which is exactly
    what the oracle checks."""
    return hourly_windowed_counts(spark, sf_dir)


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


@query("streaming_sliding_window", sql=_SLIDING_SQL, tags=("streaming", "agg"))
def streaming_sliding_window(spark, sf_dir):
    """Watermarked sliding 2h/1h window over the event stream —
    complete-mode emission equals the batch sliding group-by
    (`events_sliding_window` is the batch twin), which is exactly what
    the oracle checks."""
    return sliding_windowed_counts(spark, sf_dir)


_DEDUP_KEYS_SQL = """
SELECT DISTINCT event_id % 700 AS entity_id
FROM events
ORDER BY entity_id
"""


@query("streaming_dedup_within_watermark", sql=_DEDUP_KEYS_SQL, tags=("streaming", "dedup"))
def streaming_dedup(spark, sf_dir):
    """dropDuplicatesWithinWatermark on the entity key (streaming form
    of the reference's seen_ids set). First-arrival rows depend on
    micro-batch order, so the checked result is the deduped KEY SET,
    which doesn't."""
    return dedup_within_watermark(spark, sf_dir)


_UPSERT_SQL = """
SELECT entity_id, event_id, ts, value
FROM (
  SELECT (event_id % 700) AS entity_id, event_id, ts, value,
         ROW_NUMBER() OVER (
           PARTITION BY (event_id % 700)
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1
"""


@query("streaming_foreachbatch_upsert", sql=_UPSERT_SQL, tags=("streaming", "merge"))
def streaming_upsert(spark, sf_dir):
    """foreachBatch keyed upsert with recency-wins MERGE semantics —
    final state must equal the batch latest-wins dedup regardless of
    micro-batching, and the oracle asserts precisely that."""
    return upsert_sink_run(spark, sf_dir)


_ENRICH_SQL = f"""
SELECT c.c_mktsegment AS mktsegment,
       e.event_type,
       COUNT(*) AS n,
       {oracle_dsum('e.value', 2)} AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


@query("streaming_static_enrich", sql=_ENRICH_SQL, tags=("streaming", "join"))
def streaming_static_enrich(spark, sf_dir):
    """Stream-static broadcast enrichment join (dimension lookup per
    micro-batch) + running aggregation — complete-mode emission equals
    the batch join+group-by the oracle runs."""
    return static_enriched_counts(spark, sf_dir)


# Same sessionization SQL as the batch `window_sessionize_users`
# query: the custom stateful operator must converge to the identical
# session set.
_SESSIONIZE_SQL = """
SELECT user_id,
       CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM (
  SELECT user_id,
         SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                ) <= 1800000000
                THEN 0 ELSE 1 END AS is_new
    FROM events
  )
)
GROUP BY user_id
"""


@query(
    "streaming_sessionize_stateful",
    sql=_SESSIONIZE_SQL,
    tags=("streaming", "sessionize", "stateful"),
)
def streaming_sessionize_stateful(spark, sf_dir):
    """applyInPandasWithState gap sessionization over a 4-micro-batch
    time-ordered stream; update emissions reduced to final sessions.
    The oracle is the BATCH sessionization SQL — the stateful operator
    must produce the identical per-user session stats regardless of
    micro-batch boundaries."""
    return streaming_sessionize(spark, sf_dir)


_INTERVAL_JOIN_SQL = f"""
SELECT a.user_id AS user_id,
       COUNT(*) AS n_pairs,
       {oracle_dsum('b.value', 2)} AS purchase_revenue
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
GROUP BY a.user_id
"""


@query(
    "streaming_interval_join",
    sql=_INTERVAL_JOIN_SQL,
    tags=("streaming", "join"),
)
def streaming_interval_join(spark, sf_dir):
    """Stream-stream inner join (click → purchase attribution within
    1 hour, per user) with watermarks on both sides bounding state.
    Inner-join emissions are exactly the batch self-join rows, so the
    oracle is the equivalent batch interval self-join."""
    return interval_joined_purchases(spark, sf_dir)


_JOIN_WINDOW_SQL = """
SELECT date_trunc('hour', a.ts) AS window_start,
       COUNT(*) AS n_attributed
FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') a
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
GROUP BY 1
"""


@query(
    "streaming_join_then_window",
    sql=_JOIN_WINDOW_SQL,
    tags=("streaming", "join", "agg"),
)
def streaming_join_then_window(spark, sf_dir):
    """CHAINED stateful streaming operators — interval join feeding a
    tumbling window aggregation in ONE query, with watermark
    propagation through the join, on the RocksDB state store
    (off-heap state + changelog checkpoint: the 100-TB state
    configuration).  Completed output equals the batch join+group-by
    oracle."""
    return joined_then_windowed(spark, sf_dir)


# Same island-SQL as the batch window_session_window_native oracle
# (session_window's STRICT-< gap rule), emitted with NTZ bounds.
_SESSION_STREAM_SQL = """
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM (
  SELECT user_id, ts,
         SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                ) < 1800000000
                THEN 0 ELSE 1 END AS is_new
    FROM events
  )
)
GROUP BY user_id, session_id
"""


@query(
    "streaming_session_window_native",
    sql=_SESSION_STREAM_SQL,
    tags=("streaming", "sessionize", "agg"),
)
def streaming_session_window_native(spark, sf_dir):
    """Watermarked native session-window aggregation (Catalyst's
    merging session state) driven to completion — append-mode rows
    emit as the watermark closes each session, with the sentinel
    flush batch closing the last ones.  The oracle is the batch
    sessionization island SQL: the streaming session set must equal
    it regardless of micro-batching."""
    return session_windowed_native(spark, sf_dir)


_INTERVAL_OUTER_SQL = f"""
SELECT a.user_id AS user_id,
       COUNT(*) AS n_rows,
       COUNT(b.value) AS n_attributed,
       {oracle_dsum('b.value', 2)} AS purchase_revenue
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') a
LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
GROUP BY a.user_id
"""


_INTERVAL_FULL_SQL = f"""
SELECT COALESCE(a.user_id, b.user_id) AS user_id,
       COUNT(*) AS n_rows,
       COUNT(CASE WHEN a.event_id IS NOT NULL AND b.user_id IS NOT NULL
                  THEN 1 END) AS n_matched,
       COUNT(CASE WHEN b.user_id IS NULL THEN 1 END) AS n_unmatched_clicks,
       COUNT(CASE WHEN a.event_id IS NULL THEN 1 END) AS n_unmatched_purchases,
       {oracle_dsum('CASE WHEN a.event_id IS NOT NULL THEN b.value END', 2)}
         AS matched_revenue
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') a
FULL JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
GROUP BY COALESCE(a.user_id, b.user_id)
"""


@query(
    "streaming_interval_join_full_outer",
    sql=_INTERVAL_FULL_SQL,
    tags=("streaming", "join"),
)
def streaming_interval_join_full_outer(spark, sf_dir):
    """Stream-stream FULL OUTER interval join — the last cell of the
    join-mode matrix: unmatched rows on BOTH sides emit null-padded
    once the shared watermark + range bound proves absence (the same
    bound that evicts state).  Completed-stream output equals the
    batch FULL JOIN, which is the oracle."""
    from trafik_etl_modular_spark.streaming.pipeline import (
        interval_joined_full_outer,
    )

    return interval_joined_full_outer(spark, sf_dir)


@query(
    "streaming_interval_join_outer",
    sql=_INTERVAL_OUTER_SQL,
    tags=("streaming", "join"),
)
def streaming_interval_join_outer(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join: unmatched clicks emit
    null-padded rows once the watermark proves no purchase can still
    arrive — the same watermark+range bound that evicts state also
    makes absence definitive.  Completed-stream output equals the
    batch LEFT JOIN, which is the oracle."""
    return interval_joined_clicks_outer(spark, sf_dir)


_INCR_DEDUP_STREAM_SQL = """
WITH d AS (SELECT doc_id, doc_id % 2 AS batch_id, text FROM documents),
sh AS (
  SELECT doc_id, batch_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2])) AS s
  FROM d
),
inv AS (SELECT doc_id, batch_id, len(s) AS sz, UNNEST(s) AS shingle FROM sh),
shared AS (
  SELECT b.doc_id AS bid, c.doc_id AS cid,
         ANY_VALUE(b.sz) AS sz_b, ANY_VALUE(c.sz) AS sz_c,
         COUNT(*) AS n_shared
  FROM inv b JOIN inv c ON b.shingle = c.shingle AND c.batch_id < b.batch_id
  GROUP BY b.doc_id, c.doc_id
),
near AS (
  SELECT bid, MIN(cid) AS near_match_id, COUNT(*) AS n_near
  FROM shared
  WHERE CAST(n_shared AS DOUBLE) / (sz_b + sz_c - n_shared) >= 0.6
  GROUP BY bid
),
ex AS (
  SELECT b.doc_id AS bid, MIN(c.doc_id) AS exact_match_id
  FROM d b JOIN d c ON md5(b.text) = md5(c.text) AND c.batch_id < b.batch_id
  GROUP BY b.doc_id
)
SELECT d.doc_id, d.batch_id,
       CASE WHEN ex.exact_match_id IS NOT NULL THEN 'exact_dup'
            WHEN near.near_match_id IS NOT NULL THEN 'near_dup'
            ELSE 'novel' END AS verdict,
       COALESCE(ex.exact_match_id, near.near_match_id) AS matched_id,
       CAST(COALESCE(near.n_near, 0) AS BIGINT) AS n_near_matches
FROM d
LEFT JOIN ex ON d.doc_id = ex.bid
LEFT JOIN near ON d.doc_id = near.bid
"""


@query(
    "streaming_incremental_dedup",
    sql=_INCR_DEDUP_STREAM_SQL,
    tags=("streaming", "dedup", "llmdata"),
)
def streaming_incremental_dedup(spark, sf_dir):
    """Continuous-crawl incremental dedup: documents arrive in 2
    micro-batches (batch_id = doc_id mod 2) — the MINIMUM that still
    exercises the incremental shape (batch 1 is classified against
    batch 0's index; deeper accumulation is pinned by the 4-batch
    pytest, tests/test_llmdata.py); each batch is classified
    exact/near/novel against the accumulated inverted-shingle +
    content-hash index of the STRICTLY EARLIER batches, then its
    postings are appended to the index
    (streaming/incremental_dedup.py).  Per-batch work is
    batch-proportional — the index is state, the corpus is never
    re-paired.  Completed-stream verdicts equal the one-pass batch
    SQL with a c.batch_id < b.batch_id predicate, which is the
    oracle."""
    from trafik_etl_modular_spark.streaming.incremental_dedup import (
        incremental_dedup_stream_run,
    )

    return incremental_dedup_stream_run(spark, sf_dir, n_batches=2)


# same comparison surface as the batch point-in-time lookup — the
# completed stream must converge to exactly the batch answer
from trafik_etl_modular_spark.queries.dedup import _SCD2_ASOF_SQL  # noqa: E402


@query(
    "streaming_scd2_enrich",
    sql=_SCD2_ASOF_SQL,
    tags=("streaming", "join", "temporal"),
)
def streaming_scd2_enrich(spark, sf_dir):
    """Stream-static POINT-IN-TIME enrichment: click micro-batches
    look up the SCD2 dimension version valid at each fact's own
    timestamp (streaming/pipeline.py::scd2_enriched_stream) — late
    events pick historical versions, which a plain dimension join
    gets wrong.  Stateless per batch; completed stream equals the
    batch as-of lookup SQL."""
    from trafik_etl_modular_spark.streaming.pipeline import scd2_enriched_stream

    return scd2_enriched_stream(spark, sf_dir)


_CUSUM_STREAM_SQL = """
WITH lo AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
buckets AS (
  SELECT CAST((CAST(ts AS DATE) - lo.d0) // 3 AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events CROSS JOIN lo GROUP BY 1
),
mu AS (SELECT CAST(n * 1000000 AS BIGINT) AS mu_e6 FROM buckets WHERE bucket = 0),
pfx AS (
  SELECT b.bucket, b.n, mu.mu_e6,
         CAST(SUM(b.n * 1000000 - mu.mu_e6) OVER (
           ORDER BY b.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS p_e6
  FROM buckets b CROSS JOIN mu
)
SELECT bucket, n, mu_e6,
       CAST(p_e6 - LEAST(MIN(p_e6) OVER (
         ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 0) AS BIGINT) AS s_e6,
       (p_e6 - LEAST(MIN(p_e6) OVER (
         ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 0) > 2 * mu_e6) AS alarm
FROM pfx
ORDER BY bucket
"""


@query("streaming_cusum_monitor", sql=_CUSUM_STREAM_SQL, tags=("streaming", "quality"))
def streaming_cusum_monitor(spark, sf_dir):
    """Streaming CUSUM volume monitor: per-micro-batch sequential
    update of the one-sided CUSUM statistic over the event feed's
    3-day-bucket volumes, μ frozen from the first (in-control) batch
    — the in-stream form of dq_cusum_changepoint, whose prefix-form
    rewrite the oracle uses to recompute the identical series in one
    batch SQL pass (completed stream ≡ batch)."""
    from trafik_etl_modular_spark.streaming.pipeline import cusum_monitor_run

    return cusum_monitor_run(spark, sf_dir)


_BITMAP_STREAM_SQL = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
day_counts AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_users FROM du GROUP BY day
),
gu AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS global_users FROM events
),
nb AS (
  SELECT CAST(COUNT(DISTINCT (CAST(ts AS DATE) - lo.d0) // 3) AS BIGINT)
    AS n_batches
  FROM events CROSS JOIN (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events) lo
)
SELECT d.day, d.n_users, g.global_users, nb.n_batches
FROM day_counts d CROSS JOIN gu g CROSS JOIN nb
ORDER BY d.day
"""


@query("streaming_bitmap_distinct_monitor", sql=_BITMAP_STREAM_SQL, tags=("streaming", "agg", "sketch"))
def streaming_bitmap_distinct_monitor(spark, sf_dir):
    """Streaming EXACT distinct-user counts via mergeable bitmap
    state (streaming/pipeline.py::bitmap_distinct_monitor_run): each
    3-day micro-batch folds its bitmap partials into the accumulated
    state table by one bit_or merge — executor-side DataFrame state,
    work ∝ batch, the driver sees only the final popcounts.  Per day:
    exact distinct users; globally: the exact merged distinct and the
    batch count.  The oracle recomputes all three straight from raw
    events — completed stream ≡ batch, with NO approximation (the
    exact counterpart of an HLL streaming counter)."""
    from trafik_etl_modular_spark.streaming.pipeline import (
        bitmap_distinct_monitor_run,
    )

    return bitmap_distinct_monitor_run(spark, sf_dir)


_WATERMARK_LATE_SQL = """
WITH span AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS dmax,
         MAX(ts) AS tmax
  FROM events
),
b0 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events e CROSS JOIN span s
  WHERE CAST(e.ts AS DATE) < s.d0 + CAST((s.dmax - s.d0 + 1) // 2 AS INTEGER)
),
b1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events e CROSS JOIN span s
  WHERE CAST(e.ts AS DATE) >= s.d0 + CAST((s.dmax - s.d0 + 1) // 2 AS INTEGER)
),
old AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(CASE WHEN e.ts < s.tmax - INTERVAL 2 DAY
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_late
  FROM events e CROSS JOIN span s WHERE CAST(e.ts AS DATE) <= s.d0 + 1
),
fresh AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(CASE WHEN e.ts < s.tmax - INTERVAL 2 DAY
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_late
  FROM events e CROSS JOIN span s WHERE CAST(e.ts AS DATE) = s.dmax
)
SELECT 0 AS batch_seq, b0.n AS n_input,
       CAST(0 AS BIGINT) AS n_dropped_late, b0.n AS n_admitted FROM b0
UNION ALL
SELECT 1, b1.n, CAST(0 AS BIGINT), b1.n FROM b1
UNION ALL
SELECT 2, o.n + f.n, o.n_late + f.n_late,
       (o.n + f.n) - (o.n_late + f.n_late)
FROM old o CROSS JOIN fresh f
ORDER BY batch_seq
"""


@query(
    "streaming_watermark_lateness",
    sql=_WATERMARK_LATE_SQL,
    tags=("streaming", "quality"),
)
def streaming_watermark_lateness(spark, sf_dir):
    """Watermark-lateness audit (verdict r11 ask #5): an out-of-order
    feed — two on-time halves, then a LATE REPLAY batch mixing
    days-old rows with a within-watermark re-delivery — drives a
    watermarked daily aggregation, and the report is rows admitted vs
    DROPPED-LATE per micro-batch, read from the engine's own
    `numRowsDroppedByWatermark` state-operator metric (per-batch live
    capture via MetricsListener, the row-volume guard's event-time
    sibling).  The oracle recomputes every number from the staged
    feed's DEFINITION and the true watermark rule (row dropped iff
    event time < max-seen − delay) — silent late-data loss becomes a
    certified per-batch number (streaming/pipeline.py::
    watermark_lateness_run)."""
    from trafik_etl_modular_spark.streaming.pipeline import watermark_lateness_run

    return watermark_lateness_run(spark, sf_dir)
