"""Incremental view maintenance and CDC changelog application.

The MERGE family (queries/dedup.py::merge_upsert_latest_wins,
pipelines/sink.py) covers keyed upserts, and agg_incremental_rollup
proves single-table rollup merging.  Two gaps remained for a real
lakehouse maintenance story:

* **IVM across a JOIN** — the standard delta-join identity
  Δ(F ⋈ D) = ΔF ⋈ D for a static dimension (Blakeley et al. 1986;
  the incremental-materialization rule every streaming-SQL engine
  implements).  At 100 TB the view over fact⋈dim is refreshed by
  joining ONLY the fact delta against the dim and merging aggregate
  state — never re-joining history — and the certificate here proves
  that merge lossless against a full recompute.
* **CDC apply with DELETE tombstones** — latest-wins upsert handles
  I/U but a changelog also carries deletes; a key whose newest
  operation is a tombstone must vanish from the applied state, while
  earlier deletes are survivable history (re-insert after delete is
  legal).  This is the Debezium/Delta `MERGE WHEN MATCHED AND op='D'
  THEN DELETE` shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

# fact-stream split point (orders span 1995-01-01 .. 2001-08-01)
_IVM_CURSOR = "2000-01-01 00:00:00"

_JOIN_IVM_SQL = f"""
WITH enriched AS (
  SELECT c.c_mktsegment AS segment, o.o_totalprice,
         (o.o_orderdate < TIMESTAMP '{_IVM_CURSOR}') AS is_old
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
old_state AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS s
  FROM enriched WHERE is_old GROUP BY segment
),
delta_state AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS s
  FROM enriched WHERE NOT is_old GROUP BY segment
),
merged AS (
  SELECT segment, CAST(SUM(n) AS BIGINT) AS n_total, SUM(s) AS s_total
  FROM (SELECT * FROM old_state UNION ALL SELECT * FROM delta_state)
  GROUP BY segment
),
full_recompute AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS s
  FROM enriched GROUP BY segment
)
SELECT m.segment,
       COALESCE(o.n, 0) AS n_old,
       COALESCE(d.n, 0) AS n_delta,
       m.n_total,
       CAST(m.s_total AS DOUBLE) AS total_price,
       (m.n_total = f.n AND m.s_total = f.s) AS ivm_matches_full
FROM merged m
JOIN full_recompute f ON f.segment = m.segment
LEFT JOIN old_state o ON o.segment = m.segment
LEFT JOIN delta_state d ON d.segment = m.segment
ORDER BY m.segment
"""


@query("merge_join_ivm", sql=_JOIN_IVM_SQL, tags=("merge", "incremental", "join"))
def merge_join_ivm(spark, sf_dir) -> DataFrame:
    """Incremental maintenance of a JOIN view: the per-segment order
    rollup over orders ⋈ customer is maintained as
    merge(state(old ⋈ dim), state(Δfact ⋈ dim)) — the Δ(F⋈D) = ΔF⋈D
    identity for a static dimension — and certified per group against
    a full recompute (`ivm_matches_full` literal TRUE).  Aggregate
    state is (count, exact decimal sum), so the merge is a union +
    groupBy-sum and associativity is exact, not float-approximate.

    Scale: the refresh path joins ONLY the delta against the
    (broadcastable) dimension and touches |segments| state rows; the
    full-recompute leg exists to notarize the identity, exactly like
    agg_incremental_rollup's oracle.  One fact scan feeds both halves
    via an is_old flag — the split is a predicate, not two reads."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    cursor = F.lit(_IVM_CURSOR).cast("timestamp")
    enriched = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").cast("decimal(38,2)").alias("p"),
        (F.col("o_orderdate") < cursor).alias("is_old"),
    )

    def state(df):
        return df.groupBy("segment").agg(
            F.count("*").cast("bigint").alias("n"), F.sum("p").alias("s")
        )

    old_state = state(enriched.where("is_old"))
    delta_state = state(enriched.where("NOT is_old"))
    merged = (
        old_state.unionAll(delta_state)
        .groupBy("segment")
        .agg(F.sum("n").cast("bigint").alias("n_total"), F.sum("s").alias("s_total"))
    )
    full = state(enriched).select(
        "segment", F.col("n").alias("fn"), F.col("s").alias("fs")
    )
    out = (
        merged.join(full, "segment")
        .join(old_state.select("segment", F.col("n").alias("n_old")), "segment", "left")
        .join(
            delta_state.select("segment", F.col("n").alias("n_delta")),
            "segment",
            "left",
        )
    )
    return out.select(
        "segment",
        F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
        F.coalesce("n_delta", F.lit(0)).cast("bigint").alias("n_delta"),
        "n_total",
        F.col("s_total").cast("double").alias("total_price"),
        ((F.col("n_total") == F.col("fn")) & (F.col("s_total") == F.col("fs"))).alias(
            "ivm_matches_full"
        ),
    ).orderBy("segment")


# CDC op derivation from the event stream: signups insert, errors are
# tombstones, everything else updates the key's value.
_CDC_OP = """
CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END
"""

_CDC_SQL = f"""
WITH log_ AS (
  SELECT user_id, ts, event_id, value, {_CDC_OP} AS op FROM events
),
ordered AS (
  SELECT user_id, op, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rn
  FROM log_
),
hist AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_ops,
         CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes_seen
  FROM log_ GROUP BY user_id
)
SELECT o.user_id, h.n_ops, h.n_deletes_seen, o.op AS last_op, o.value AS last_value
FROM ordered o JOIN hist h ON h.user_id = o.user_id
WHERE o.rn = 1 AND o.op <> 'D'
ORDER BY o.user_id
"""


@query("merge_cdc_apply_tombstones", sql=_CDC_SQL, tags=("merge", "dedup"))
def merge_cdc_apply_tombstones(spark, sf_dir) -> DataFrame:
    """Apply a CDC changelog WITH delete tombstones: per key, the
    newest operation under the total (ts, event_id) order decides
    liveness — a trailing 'D' removes the key from the applied state
    entirely (it appears in no output row), while earlier deletes are
    survivable history (re-insert after delete is legal, counted in
    `n_deletes_seen`).  This is the `MERGE … WHEN MATCHED AND op='D'
    THEN DELETE` shape a latest-wins upsert cannot express.

    Scale: one window pass keyed by the entity (the same shuffle a
    MERGE shuffles anyway) + one count aggregate on the same key —
    and in a foreachBatch the window runs per-batch against only the
    batch's keys.  The carried `last_value` is selected, never
    computed, so no float arithmetic enters the surface."""
    ev = t(spark, sf_dir, "events")
    log_ = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    ordered = log_.withColumn("rn", F.row_number().over(w))
    hist = log_.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_ops"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0))
        .cast("bigint")
        .alias("n_deletes_seen"),
    )
    return (
        ordered.where((F.col("rn") == 1) & (F.col("op") != "D"))
        .join(hist, "user_id")
        .select(
            "user_id",
            "n_ops",
            "n_deletes_seen",
            F.col("op").alias("last_op"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Snapshot table diff (round 11)
# ---------------------------------------------------------------------------

# deterministic v2 derivation (both engines apply the identical rules,
# so the diff is fully cross-checkable): drop every 11th key, bump
# totalprice by 1.00 on every 7th, flip status to 'X' on every 5th,
# clone every 13th as a new row at key + 10^9
_DIFF_ADD_OFFSET = 1_000_000_000

_TABLE_DIFF_SQL = f"""
WITH v1 AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT) AS price_cents,
         o_orderstatus AS status
  FROM orders
),
v2 AS (
  SELECT k,
         price_cents + CASE WHEN k % 7 = 0 THEN 100 ELSE 0 END AS price_cents,
         CASE WHEN k % 5 = 0 THEN 'X' ELSE status END AS status
  FROM v1 WHERE k % 11 <> 0
  UNION ALL
  SELECT k + {_DIFF_ADD_OFFSET} AS k, price_cents, status
  FROM v1 WHERE k % 13 = 0
),
d AS (
  SELECT COALESCE(a.k, b.k) AS k,
         CASE WHEN a.k IS NULL THEN 'added'
              WHEN b.k IS NULL THEN 'removed'
              WHEN a.price_cents <> b.price_cents OR a.status <> b.status
                THEN 'changed'
              ELSE 'identical' END AS change_type,
         CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                   AND a.price_cents <> b.price_cents THEN 1 ELSE 0 END AS pc,
         CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                   AND a.status <> b.status THEN 1 ELSE 0 END AS sc,
         CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                   THEN b.price_cents - a.price_cents ELSE 0 END AS delta
  FROM v1 a FULL OUTER JOIN v2 b ON b.k = a.k
)
SELECT change_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(pc) AS BIGINT) AS n_price_changed,
       CAST(SUM(sc) AS BIGINT) AS n_status_changed,
       CAST(SUM(delta) AS BIGINT) AS price_delta_cents
FROM d GROUP BY change_type
ORDER BY change_type
"""


@query("merge_snapshot_table_diff", sql=_TABLE_DIFF_SQL, tags=("merge", "quality"))
def merge_snapshot_table_diff(spark, sf_dir) -> DataFrame:
    """Snapshot-to-snapshot table diff — the data-reconciliation
    report behind change-data-feed audits and blue/green migration
    sign-off: a FULL OUTER join of two table versions on the primary
    key classifies every key as added / removed / changed / identical,
    with per-column change counts and the exact net value delta
    (integer cents).  The second version is derived from the first by
    deterministic rules both engines apply identically, so the whole
    diff — classification, column attribution, delta — is
    cross-engine certified.

    Scale: ONE key-partitioned full-outer join (both sides shuffle on
    the key once; on a cluster both snapshot scans prune to changed
    partitions first) + a 4-group aggregation; per-column comparison
    is map-side CASE arithmetic, and the output is |change classes|
    rows regardless of table size."""
    orders = t(spark, sf_dir, "orders")
    from pyspark.sql import types as T

    v1 = orders.select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast(T.DecimalType(38, 2)) * 100)
        .cast("long")
        .alias("price_cents"),
        F.col("o_orderstatus").alias("status"),
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    # v1 feeds both diff sides and the v2 derivation — one scan
    v1 = pin(v1, eager=True)
    # loud radix guard (the graph-packing lesson, applied before the
    # failure exists): cloned "added" keys live at k + offset, so a
    # real key at/above the offset would silently collide with a
    # clone instead of diffing — TPC-H orderkeys pass 10^9 at ~SF170
    _mk = v1.agg(F.max("k").alias("m")).first()["m"]
    if _mk is not None and _mk >= _DIFF_ADD_OFFSET:
        raise ValueError(
            f"merge_snapshot_table_diff: key {_mk} reaches the synthetic-add "
            f"offset {_DIFF_ADD_OFFSET}; widen _DIFF_ADD_OFFSET"
        )
    surv = v1.where(F.col("k") % 11 != 0).select(
        "k",
        (
            F.col("price_cents")
            + F.when(F.col("k") % 7 == 0, 100).otherwise(0)
        ).alias("price_cents"),
        F.when(F.col("k") % 5 == 0, F.lit("X")).otherwise(F.col("status")).alias(
            "status"
        ),
    )
    adds = v1.where(F.col("k") % 13 == 0).select(
        (F.col("k") + _DIFF_ADD_OFFSET).alias("k"), "price_cents", "status"
    )
    v2 = surv.unionByName(adds)
    a, b = v1.alias("a"), v2.alias("b")
    j = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer")
    both = F.col("a.k").isNotNull() & F.col("b.k").isNotNull()
    d = j.select(
        F.when(F.col("a.k").isNull(), "added")
        .when(F.col("b.k").isNull(), "removed")
        .when(
            (F.col("a.price_cents") != F.col("b.price_cents"))
            | (F.col("a.status") != F.col("b.status")),
            "changed",
        )
        .otherwise("identical")
        .alias("change_type"),
        F.when(both & (F.col("a.price_cents") != F.col("b.price_cents")), 1)
        .otherwise(0)
        .alias("pc"),
        F.when(both & (F.col("a.status") != F.col("b.status")), 1)
        .otherwise(0)
        .alias("sc"),
        F.when(both, F.col("b.price_cents") - F.col("a.price_cents"))
        .otherwise(0)
        .alias("delta"),
    )
    return (
        d.groupBy("change_type")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("pc").cast("bigint").alias("n_price_changed"),
            F.sum("sc").cast("bigint").alias("n_status_changed"),
            F.sum("delta").cast("bigint").alias("price_delta_cents"),
        )
        .orderBy("change_type")
    )


# ---------------------------------------------------------------------------
# Aggregate-view IVM with deletes (round 11)
# ---------------------------------------------------------------------------

_AGG_IVM_SQL = """
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day, event_id,
         CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT) AS cents
  FROM events
),
old AS (SELECT * FROM ev WHERE event_id % 10 <> 0),
view_old AS (
  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(cents) AS BIGINT) AS s
  FROM old GROUP BY event_type, day
),
delta AS (
  SELECT event_type, day, 1 AS mult, cents FROM ev WHERE event_id % 10 = 0
  UNION ALL
  SELECT event_type, day, -1 AS mult, cents FROM old WHERE event_id % 7 = 0
),
dagg AS (
  SELECT event_type, day, CAST(SUM(mult) AS BIGINT) AS dm,
         CAST(SUM(mult * cents) AS BIGINT) AS ds
  FROM delta GROUP BY event_type, day
),
merged AS (
  SELECT COALESCE(v.event_type, d.event_type) AS event_type,
         COALESCE(v.day, d.day) AS day,
         COALESCE(v.cnt, 0) + COALESCE(d.dm, 0) AS cnt,
         COALESCE(v.s, 0) + COALESCE(d.ds, 0) AS s
  FROM view_old v FULL OUTER JOIN dagg d
    ON d.event_type = v.event_type AND d.day = v.day
),
final_state AS (
  SELECT * FROM old WHERE event_id % 7 <> 0
  UNION ALL
  SELECT * FROM ev WHERE event_id % 10 = 0
),
recomp AS (
  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(cents) AS BIGINT) AS s
  FROM final_state GROUP BY event_type, day
)
SELECT m.event_type, m.day,
       CAST(m.cnt AS BIGINT) AS cnt_ivm, r.cnt AS cnt_recomputed,
       CAST(m.s AS BIGINT) AS sum_ivm_cents, r.s AS sum_recomputed_cents,
       (m.cnt = r.cnt AND m.s = r.s) AS ivm_matches
FROM merged m JOIN recomp r ON r.event_type = m.event_type AND r.day = m.day
WHERE m.cnt > 0
ORDER BY m.event_type, m.day
"""


@query("merge_agg_ivm_deletes", sql=_AGG_IVM_SQL, tags=("merge", "incremental"))
def merge_agg_ivm_deletes(spark, sf_dir) -> DataFrame:
    """Incremental maintenance of an AGGREGATE view under a changelog
    with INSERTS AND DELETES — the counting algorithm (Blakeley /
    Gupta-Mumick, public literature) the join-IVM query doesn't
    exercise: each delta row carries a signed multiplicity, the delta
    batch folds to per-key (Σ mult, Σ mult·value), and the maintained
    view is old ⊕ delta with zero-count groups retired.  Unlike the
    append-only folds (BM25 df, Bloom bit_or), counts here can
    DECREASE — the algebra needs the signed form, not a semilattice
    merge.  Certified per group against a full recompute of the
    post-state (`ivm_matches`, oracle-recomputed).

    Scale: maintenance cost is one hash agg over the DELTA plus a
    key-partitioned outer merge against the stored view — work ∝
    batch + touched keys, never a fact-table rescan; the recompute
    leg exists only to notarize."""
    from pyspark.sql import types as T

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        "event_id",
        (F.col("value").cast(T.DecimalType(38, 2)) * 100).cast("long").alias("cents"),
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    ev = pin(ev, eager=True)
    old = ev.where(F.col("event_id") % 10 != 0)
    view_old = old.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    delta = ev.where(F.col("event_id") % 10 == 0).select(
        "event_type", "day", F.lit(1).alias("mult"), "cents"
    ).unionByName(
        old.where(F.col("event_id") % 7 == 0).select(
            "event_type", "day", F.lit(-1).alias("mult"), "cents"
        )
    )
    dagg = delta.groupBy("event_type", "day").agg(
        F.sum("mult").cast("bigint").alias("dm"),
        F.sum(F.col("mult") * F.col("cents")).cast("bigint").alias("ds"),
    )
    z = F.lit(0).cast("bigint")
    merged = (
        view_old.alias("v")
        .join(dagg.alias("d"), ["event_type", "day"], "full_outer")
        .select(
            "event_type",
            "day",
            (F.coalesce("cnt", z) + F.coalesce("dm", z)).alias("cnt"),
            (F.coalesce("s", z) + F.coalesce("ds", z)).alias("s"),
        )
    )
    final_state = old.where(F.col("event_id") % 7 != 0).unionByName(
        ev.where(F.col("event_id") % 10 == 0)
    )
    recomp = final_state.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("cnt_recomputed"),
        F.sum("cents").cast("bigint").alias("sum_recomputed_cents"),
    )
    return (
        merged.where(F.col("cnt") > 0)
        .join(recomp, ["event_type", "day"])
        .select(
            "event_type",
            "day",
            F.col("cnt").cast("bigint").alias("cnt_ivm"),
            "cnt_recomputed",
            F.col("s").cast("bigint").alias("sum_ivm_cents"),
            "sum_recomputed_cents",
            (
                (F.col("cnt") == F.col("cnt_recomputed"))
                & (F.col("s") == F.col("sum_recomputed_cents"))
            ).alias("ivm_matches"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# COUNT DISTINCT IVM under inserts + deletes (round 12)
# ---------------------------------------------------------------------------

_DISTINCT_IVM_SQL = """
WITH ev AS (SELECT event_type, user_id, event_id FROM events),
old AS (SELECT * FROM ev WHERE event_id % 10 <> 0),
view_old AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM old GROUP BY event_type, user_id
),
delta AS (
  SELECT event_type, user_id, 1 AS mult FROM ev WHERE event_id % 10 = 0
  UNION ALL
  SELECT event_type, user_id, -1 AS mult FROM old WHERE event_id % 7 = 0
),
dagg AS (
  SELECT event_type, user_id, CAST(SUM(mult) AS BIGINT) AS dm
  FROM delta GROUP BY event_type, user_id
),
merged AS (
  SELECT COALESCE(v.event_type, d.event_type) AS event_type,
         COALESCE(v.user_id, d.user_id) AS user_id,
         COALESCE(v.cnt, 0) + COALESCE(d.dm, 0) AS cnt
  FROM view_old v
  FULL OUTER JOIN dagg d
    ON d.event_type = v.event_type AND d.user_id = v.user_id
),
ivm AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_ivm,
         CAST(SUM(CASE WHEN cnt <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_keys_retired
  FROM merged GROUP BY event_type
),
final_state AS (
  SELECT event_type, user_id FROM old WHERE event_id % 7 <> 0
  UNION ALL
  SELECT event_type, user_id FROM ev WHERE event_id % 10 = 0
),
recomp AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
           AS n_users_recomputed
  FROM final_state GROUP BY event_type
)
SELECT i.event_type, i.n_users_ivm, r.n_users_recomputed, i.n_keys_retired,
       (i.n_users_ivm = r.n_users_recomputed) AS ivm_matches
FROM ivm i JOIN recomp r ON r.event_type = i.event_type
ORDER BY i.event_type
"""


@query("merge_distinct_ivm", sql=_DISTINCT_IVM_SQL, tags=("merge", "incremental"))
def merge_distinct_ivm(spark, sf_dir) -> DataFrame:
    """Incremental maintenance of a COUNT DISTINCT view under inserts
    AND deletes — the aggregate the signed-sum algebra of
    merge_agg_ivm_deletes cannot express directly (distinct is not a
    sum): the standard two-level counting rewrite (Gupta–Mumick)
    keeps an INNER state of per-(group, user) signed multiplicities;
    a delete decrements its key, a key at zero retires, and the
    distinct count is simply the live-key count per group — exact,
    no sketch, fully retractable (the HLL rollup can merge but never
    forget; this view can).  Certified per group against a full
    recompute of the post-changelog state, with the retired-key count
    made visible.

    Scale: maintenance is one hash agg over the DELTA plus a
    key-partitioned outer merge against the stored inner state —
    work ∝ batch + touched (group, user) keys; the per-group distinct
    is an aggregation OF the inner state, never a fact rescan."""
    ev = t(spark, sf_dir, "events").select("event_type", "user_id", "event_id")
    from trafik_etl_modular_spark.operators.pinning import pin

    ev = pin(ev, eager=True)
    old = ev.where(F.col("event_id") % 10 != 0)
    view_old = old.groupBy("event_type", "user_id").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    delta = old.where(F.col("event_id") % 7 == 0).select(
        "event_type", "user_id", F.lit(-1).alias("mult")
    ).unionByName(
        ev.where(F.col("event_id") % 10 == 0).select(
            "event_type", "user_id", F.lit(1).alias("mult")
        )
    )
    dagg = delta.groupBy("event_type", "user_id").agg(
        F.sum("mult").cast("bigint").alias("dm")
    )
    z = F.lit(0).cast("bigint")
    merged = view_old.join(dagg, ["event_type", "user_id"], "full_outer").select(
        "event_type",
        "user_id",
        (F.coalesce("cnt", z) + F.coalesce("dm", z)).alias("cnt"),
    )
    ivm = merged.groupBy("event_type").agg(
        F.sum(F.when(F.col("cnt") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_users_ivm"),
        F.sum(F.when(F.col("cnt") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_keys_retired"),
    )
    final_state = old.where(F.col("event_id") % 7 != 0).unionByName(
        ev.where(F.col("event_id") % 10 == 0)
    )
    recomp = final_state.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users_recomputed")
    )
    return (
        ivm.join(recomp, "event_type")
        .select(
            "event_type",
            "n_users_ivm",
            "n_users_recomputed",
            "n_keys_retired",
            (F.col("n_users_ivm") == F.col("n_users_recomputed")).alias(
                "ivm_matches"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Top-k view maintenance under inserts (round 12)
# ---------------------------------------------------------------------------

_TOPK_K = 10
_TOPK_CUTOFF = "2024-01-26"  # base = days before, insert batch = days from

_TOPK_IVM_SQL = f"""
WITH base AS (
  SELECT user_id FROM events WHERE CAST(ts AS DATE) < DATE '{_TOPK_CUTOFF}'
),
batch AS (
  SELECT user_id FROM events WHERE CAST(ts AS DATE) >= DATE '{_TOPK_CUTOFF}'
),
old_view AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM base GROUP BY user_id
  ORDER BY cnt DESC, user_id LIMIT {_TOPK_K}
),
batch_cnt AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS dc FROM batch GROUP BY user_id
),
cand AS (
  SELECT user_id FROM old_view UNION SELECT user_id FROM batch_cnt
),
cand_base AS (
  SELECT b.user_id, CAST(COUNT(*) AS BIGINT) AS bc
  FROM base b JOIN cand c ON c.user_id = b.user_id
  GROUP BY b.user_id
),
maintained AS (
  SELECT c.user_id,
         COALESCE(cb.bc, 0) + COALESCE(bn.dc, 0) AS cnt
  FROM cand c
  LEFT JOIN cand_base cb ON cb.user_id = c.user_id
  LEFT JOIN batch_cnt bn ON bn.user_id = c.user_id
  ORDER BY cnt DESC, c.user_id LIMIT {_TOPK_K}
),
full_topk AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
  ORDER BY cnt DESC, user_id LIMIT {_TOPK_K}
),
m AS (
  SELECT user_id, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rnk
  FROM maintained
),
f AS (
  SELECT user_id, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rnk
  FROM full_topk
)
SELECT m.rnk AS rank, m.user_id, m.cnt AS n_events,
       (m.user_id IN (SELECT user_id FROM old_view)) AS in_old_topk,
       (f.user_id = m.user_id AND f.cnt = m.cnt) AS matches_full
FROM m JOIN f ON f.rnk = m.rnk
ORDER BY m.rnk
"""


@query("merge_topk_ivm", sql=_TOPK_IVM_SQL, tags=("merge", "incremental"))
def merge_topk_ivm(spark, sf_dir) -> DataFrame:
    """TOP-K VIEW MAINTENANCE under an insert batch: the stored top-10
    most-active users advances to the post-batch state by recounting
    ONLY the candidate set = old top-k keys ∪ batch-touched keys —
    sound for monotone counts because an untouched non-member's count
    is unchanged and was already below the old k-th count, which the
    new k-th count dominates (counts only grow).  This is the
    maintenance rule a leaderboard/trending view actually runs; the
    DELETE case (non-monotone) is merge_agg_ivm_deletes' signed
    algebra followed by threshold re-check.  Every rank row carries a
    maintained≡recomputed certificate against the full-history top-k.

    Scale: maintenance work is ∝ batch + |candidates| — the base
    rescan is key-pruned to the candidate set BEFORE aggregating (a
    broadcast semi-shaped equi-join, since candidates ≤ k + batch
    keys), never a full-history re-aggregation; only the certificate
    leg pays the full recount (drop it in production)."""
    ev = t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    cutoff = F.lit(_TOPK_CUTOFF).cast("date")
    base = ev.where(F.col("d") < cutoff).select("user_id")
    batch = ev.where(F.col("d") >= cutoff).select("user_id")
    old_view = pin(
        base.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "user_id")
        .limit(_TOPK_K),
        eager=True,  # feeds candidates and the in_old_topk flag
    )
    batch_cnt = pin(
        batch.groupBy("user_id").agg(F.count("*").cast("bigint").alias("dc")),
        eager=True,  # feeds candidates and the maintained counts
    )
    cand = (
        old_view.select("user_id").union(batch_cnt.select("user_id")).distinct()
    )
    cand_base = (
        base.join(F.broadcast(cand), "user_id")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("bc"))
    )
    maintained = (
        cand.join(cand_base, "user_id", "left")
        .join(batch_cnt, "user_id", "left")
        .select(
            "user_id",
            (
                F.coalesce(F.col("bc"), F.lit(0))
                + F.coalesce(F.col("dc"), F.lit(0))
            )
            .cast("bigint")
            .alias("cnt"),
        )
        .orderBy(F.desc("cnt"), "user_id")
        .limit(_TOPK_K)
    )
    full_topk = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "user_id")
        .limit(_TOPK_K)
    )
    w = Window.orderBy(F.desc("cnt"), "user_id")
    m = maintained.select(
        "user_id", "cnt", F.row_number().over(w).alias("rnk")
    )
    fk = full_topk.select(
        F.col("user_id").alias("f_user"),
        F.col("cnt").alias("f_cnt"),
        F.row_number().over(w.orderBy(F.desc("cnt"), "user_id")).alias("rnk"),
    )
    old_keys = old_view.select(F.col("user_id").alias("ok_user")).withColumn(
        "is_old", F.lit(True)
    )
    return (
        m.join(fk, "rnk")
        .join(
            F.broadcast(old_keys), m.user_id == old_keys.ok_user, "left"
        )
        .select(
            F.col("rnk").alias("rank"),
            "user_id",
            F.col("cnt").alias("n_events"),
            F.coalesce(F.col("is_old"), F.lit(False)).alias("in_old_topk"),
            (
                (F.col("f_user") == F.col("user_id"))
                & (F.col("f_cnt") == F.col("cnt"))
            ).alias("matches_full"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Min/max view maintenance under deletes (rescan-on-retract, round 12)
# ---------------------------------------------------------------------------

_MINMAX_DEL_MOD = 97  # delete batch: every 97th order

_MINMAX_IVM_SQL = f"""
WITH priced AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
deleted AS (SELECT * FROM priced WHERE o_orderkey % {_MINMAX_DEL_MOD} = 0),
old_view AS (
  SELECT o_orderpriority, CAST(MAX(cents) AS BIGINT) AS max_cents
  FROM priced GROUP BY o_orderpriority
),
del_stats AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_deleted,
         CAST(MAX(cents) AS BIGINT) AS del_max
  FROM deleted GROUP BY o_orderpriority
),
survivors AS (
  SELECT * FROM priced WHERE o_orderkey % {_MINMAX_DEL_MOD} <> 0
),
rescanned AS (
  SELECT s.o_orderpriority, CAST(MAX(s.cents) AS BIGINT) AS rescan_max
  FROM survivors s
  JOIN (SELECT o.o_orderpriority FROM old_view o
        JOIN del_stats d ON d.o_orderpriority = o.o_orderpriority
        WHERE d.del_max = o.max_cents) touched
    ON touched.o_orderpriority = s.o_orderpriority
  GROUP BY s.o_orderpriority
),
full_view AS (
  SELECT o_orderpriority, CAST(MAX(cents) AS BIGINT) AS max_cents
  FROM survivors GROUP BY o_orderpriority
)
SELECT o.o_orderpriority AS priority,
       o.max_cents AS old_max_cents,
       COALESCE(d.n_deleted, 0) AS n_deleted,
       (d.del_max = o.max_cents) AS rescan_needed,
       CASE WHEN d.del_max = o.max_cents THEN r.rescan_max
            ELSE o.max_cents END AS new_max_cents,
       (CASE WHEN d.del_max = o.max_cents THEN r.rescan_max
             ELSE o.max_cents END = f.max_cents) AS matches_full
FROM old_view o
LEFT JOIN del_stats d ON d.o_orderpriority = o.o_orderpriority
LEFT JOIN rescanned r ON r.o_orderpriority = o.o_orderpriority
JOIN full_view f ON f.o_orderpriority = o.o_orderpriority
ORDER BY priority
"""


@query("merge_minmax_ivm_rescan", sql=_MINMAX_IVM_SQL, tags=("merge", "incremental"))
def merge_minmax_ivm_rescan(spark, sf_dir) -> DataFrame:
    """MIN/MAX VIEW MAINTENANCE under a delete batch — the
    NON-INVERTIBLE aggregate case: SUM/COUNT retract with signed
    deltas (merge_agg_ivm_deletes), but MAX cannot — deleting the
    current maximum forces a group RESCAN (Gupta–Mumick's
    self-maintainability boundary: min/max views are not
    self-maintainable under deletions).  The maintenance rule: a
    group rescans iff max(deleted) equals the stored max (deleting
    any smaller row provably leaves the max unchanged — that
    comparison is the whole point); rescans recompute over survivors
    of ONLY the touched groups.  Per-group certificate against the
    full survivor recompute.

    Scale: the delete batch folds to per-group (count, max) in one
    agg; untouched groups are maintained with ZERO base reads; the
    rescan leg reads only touched groups (partition-pruned when the
    sink partitions by the group key, cf. pipelines/sink.py).  The
    certificate leg full-scans by design."""
    priced = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    is_del = F.col("o_orderkey") % _MINMAX_DEL_MOD == 0
    old_view = pin(
        priced.groupBy("o_orderpriority").agg(
            F.max("cents").cast("bigint").alias("max_cents")
        ),
        eager=True,  # touched-group rule + output spine
    )
    del_stats = priced.where(is_del).groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_deleted"),
        F.max("cents").cast("bigint").alias("del_max"),
    )
    survivors = priced.where(~is_del)
    touched = (
        old_view.join(del_stats, "o_orderpriority")
        .where(F.col("del_max") == F.col("max_cents"))
        .select("o_orderpriority")
    )
    rescanned = (
        survivors.join(F.broadcast(touched), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(F.max("cents").cast("bigint").alias("rescan_max"))
    )
    full_view = survivors.groupBy("o_orderpriority").agg(
        F.max("cents").cast("bigint").alias("full_max")
    )
    new_max = F.when(
        F.col("del_max") == F.col("max_cents"), F.col("rescan_max")
    ).otherwise(F.col("max_cents"))
    return (
        old_view.join(del_stats, "o_orderpriority", "left")
        .join(rescanned, "o_orderpriority", "left")
        .join(full_view, "o_orderpriority")
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("max_cents").alias("old_max_cents"),
            F.coalesce(F.col("n_deleted"), F.lit(0)).cast("bigint").alias(
                "n_deleted"
            ),
            (F.col("del_max") == F.col("max_cents")).alias("rescan_needed"),
            new_max.cast("bigint").alias("new_max_cents"),
            (new_max == F.col("full_max")).alias("matches_full"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# SCD2 retro-correction splice (round 12)
# ---------------------------------------------------------------------------

_RETRO_MOD = 113  # late batch: every 113th order arrives after the build

_RETRO_SQL = f"""
WITH base_v AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderpriority AS prio
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
      ORDER BY o_orderkey DESC) AS rn
    FROM orders WHERE o_orderkey % {_RETRO_MOD} <> 0
  ) WHERE rn = 1
),
late_v AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderpriority AS prio
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
      ORDER BY o_orderkey DESC) AS rn
    FROM orders WHERE o_orderkey % {_RETRO_MOD} = 0
  ) WHERE rn = 1
),
touched AS (SELECT DISTINCT o_custkey FROM late_v),
bvt AS (SELECT b.* FROM base_v b JOIN touched t USING (o_custkey)),
base_hist AS (
  SELECT o_custkey, d AS valid_from, prio
  FROM (
    SELECT b.*, LAG(prio) OVER (
      PARTITION BY o_custkey ORDER BY d) AS prev_prio
    FROM bvt b
  ) WHERE prev_prio IS NULL OR prev_prio <> prio
),
win AS (
  SELECT l.o_custkey, l.d AS x,
         MAX(CASE WHEN h.valid_from <= l.d THEN h.valid_from END) AS lo,
         MIN(CASE WHEN h.valid_from > l.d THEN h.valid_from END) AS hi
  FROM late_v l
  LEFT JOIN base_hist h ON h.o_custkey = l.o_custkey
  GROUP BY l.o_custkey, l.d
),
win_facts AS (
  SELECT DISTINCT b.o_custkey, b.d, b.prio
  FROM bvt b
  JOIN win w ON w.o_custkey = b.o_custkey
    AND (w.lo IS NULL OR b.d >= w.lo)
    AND (w.hi IS NULL OR b.d < w.hi)
),
view_plus AS (
  SELECT o_custkey, valid_from AS d, prio FROM base_hist
  UNION
  SELECT o_custkey, d, prio FROM win_facts
),
maintained_v AS (
  SELECT COALESCE(l.o_custkey, v.o_custkey) AS o_custkey,
         COALESCE(l.d, v.d) AS d,
         COALESCE(l.prio, v.prio) AS prio
  FROM view_plus v
  FULL JOIN late_v l ON l.o_custkey = v.o_custkey AND l.d = v.d
),
maintained AS (
  SELECT o_custkey, d AS valid_from, prio
  FROM (
    SELECT m.*, LAG(prio) OVER (
      PARTITION BY o_custkey ORDER BY d) AS prev_prio
    FROM maintained_v m
  ) WHERE prev_prio IS NULL OR prev_prio <> prio
),
rebuilt_v AS (
  SELECT COALESCE(l.o_custkey, b.o_custkey) AS o_custkey,
         COALESCE(l.d, b.d) AS d,
         COALESCE(l.prio, b.prio) AS prio
  FROM bvt b
  FULL JOIN late_v l ON l.o_custkey = b.o_custkey AND l.d = b.d
),
rebuilt AS (
  SELECT o_custkey, d AS valid_from, prio
  FROM (
    SELECT r.*, LAG(prio) OVER (
      PARTITION BY o_custkey ORDER BY d) AS prev_prio
    FROM rebuilt_v r
  ) WHERE prev_prio IS NULL OR prev_prio <> prio
),
matched AS (
  SELECT m.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_match
  FROM maintained m
  JOIN rebuilt r ON r.o_custkey = m.o_custkey
    AND r.valid_from = m.valid_from AND r.prio = m.prio
  GROUP BY m.o_custkey
)
SELECT t.o_custkey AS custkey,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM late_v l
        WHERE l.o_custkey = t.o_custkey) AS n_late_days,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM base_hist h
        WHERE h.o_custkey = t.o_custkey) AS n_intervals_base,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM maintained m
        WHERE m.o_custkey = t.o_custkey) AS n_intervals_new,
       ((SELECT COUNT(*) FROM maintained m WHERE m.o_custkey = t.o_custkey)
        = (SELECT COUNT(*) FROM rebuilt r WHERE r.o_custkey = t.o_custkey)
        AND (SELECT COUNT(*) FROM rebuilt r WHERE r.o_custkey = t.o_custkey)
        = COALESCE((SELECT n_match FROM matched x
                    WHERE x.o_custkey = t.o_custkey), 0))
         AS intervals_match
FROM touched t
ORDER BY custkey
"""


@query("merge_scd2_retro_correction", sql=_RETRO_SQL, tags=("merge", "incremental", "temporal"))
def merge_scd2_retro_correction(spark, sf_dir) -> DataFrame:
    """SCD2 RETRO-CORRECTION splice — the out-of-order half of
    slowly-changing-dimension maintenance scd2_incremental_merge
    cannot do: a LATE batch (orders that arrived after the history
    was built) carries effective dates in the PAST, so each
    correction must splice INSIDE the existing interval chain, not
    append to its end.  Semantics: corrections WIN their effective
    day.  The load-bearing subtlety (caught by this query's own
    certificate during development): the COMPRESSED view alone is NOT
    retro-spliceable — change-compression drops no-change
    observations, and a dropped day becomes a change point again when
    a correction splices a different value before it.  Sound
    maintenance therefore reads the view PLUS the base observations
    inside each correction's ENCLOSING interval ([previous change
    point, next change point) — an interval-pruned fact read), merges
    with late-wins, and re-compresses; intervals may close, split, or
    merge.  Per touched customer: a maintained ≡
    rebuilt-from-all-facts certificate on the (valid_from, value)
    change set (valid_to derives from the valid_from set).

    Scale: maintenance work ∝ batch + touched-interval observations —
    the enclosing-window fact read is an equi-join on the customer
    key with a range residual, partition-prunable when the fact table
    is date-partitioned (pipelines/sink.py); untouched customers are
    never read.  The rebuilt certificate leg re-reads touched
    customers' full history — sampled in production."""
    od = t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderpriority").alias("prio"),
        "o_orderkey",
    )
    from trafik_etl_modular_spark.operators.pinning import pin

    w_day = Window.partitionBy("o_custkey", "d").orderBy(F.desc("o_orderkey"))

    def day_versions(df):
        return (
            df.withColumn("rn", F.row_number().over(w_day))
            .where(F.col("rn") == 1)
            .select("o_custkey", "d", "prio")
        )

    def compress(df):
        w = Window.partitionBy("o_custkey").orderBy("d")
        return (
            df.withColumn("prev_prio", F.lag("prio").over(w))
            .where(
                F.col("prev_prio").isNull()
                | (F.col("prev_prio") != F.col("prio"))
            )
            .select("o_custkey", F.col("d").alias("valid_from"), "prio")
        )

    is_late = F.col("o_orderkey") % _RETRO_MOD == 0
    late_v = pin(day_versions(od.where(is_late)), eager=True)
    touched = late_v.select("o_custkey").distinct()
    # Touched-customer semi-join BELOW the day-version window, not
    # above it: the window partitions by (custkey, day), so dropping
    # whole customers first is identical — and the dedup window then
    # ranks only touched customers' observations (~1/100 of the base
    # rows at _RETRO_MOD=113) instead of the full fact scan.  This is
    # what the docstring's "untouched customers are never read"
    # already promised (guide §2.3: filter before the exchange).
    bvt = pin(
        day_versions(
            od.where(~is_late).join(F.broadcast(touched), "o_custkey")
        ),
        eager=True,  # view build, window-fact read, and the rebuilt leg
    )
    base_hist = pin(compress(bvt), eager=True)
    # enclosing window per late observation, from the VIEW
    win = (
        late_v.select("o_custkey", F.col("d").alias("x"))
        .join(
            base_hist.select("o_custkey", "valid_from"),
            "o_custkey",
            "left",
        )
        .groupBy("o_custkey", "x")
        .agg(
            F.max(
                F.when(F.col("valid_from") <= F.col("x"), F.col("valid_from"))
            ).alias("lo"),
            F.min(
                F.when(F.col("valid_from") > F.col("x"), F.col("valid_from"))
            ).alias("hi"),
        )
    )
    win_facts = (
        bvt.join(
            F.broadcast(win),
            (bvt.o_custkey == win.o_custkey)
            & (win.lo.isNull() | (bvt.d >= win.lo))
            & (win.hi.isNull() | (bvt.d < win.hi)),
        )
        .select(bvt.o_custkey, bvt.d, bvt.prio)
        .distinct()
    )
    view_plus = (
        base_hist.select(
            "o_custkey", F.col("valid_from").alias("d"), "prio"
        )
        .union(win_facts)
        .distinct()
    )
    lv = late_v.select(
        F.col("o_custkey").alias("l_ck"),
        F.col("d").alias("l_d"),
        F.col("prio").alias("l_prio"),
    )

    def late_wins(base_frame):
        return base_frame.join(
            lv,
            (base_frame.o_custkey == F.col("l_ck"))
            & (base_frame.d == F.col("l_d")),
            "full",
        ).select(
            F.coalesce(F.col("l_ck"), base_frame.o_custkey).alias("o_custkey"),
            F.coalesce(F.col("l_d"), base_frame.d).alias("d"),
            F.coalesce(F.col("l_prio"), base_frame.prio).alias("prio"),
        )

    maintained = pin(compress(late_wins(view_plus)), eager=True)
    rebuilt = pin(compress(late_wins(bvt)), eager=True)
    n_late = late_v.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_late_days")
    )
    n_base = base_hist.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_intervals_base")
    )
    n_new = maintained.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_intervals_new")
    )
    n_reb = rebuilt.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_reb")
    )
    n_match = (
        maintained.join(rebuilt, ["o_custkey", "valid_from", "prio"])
        .groupBy("o_custkey")
        .agg(F.count("*").cast("bigint").alias("n_match"))
    )
    return (
        touched.join(n_late, "o_custkey", "left")
        .join(n_base, "o_custkey", "left")
        .join(n_new, "o_custkey", "left")
        .join(n_reb, "o_custkey", "left")
        .join(n_match, "o_custkey", "left")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.coalesce(F.col("n_late_days"), F.lit(0)).cast("bigint").alias(
                "n_late_days"
            ),
            F.coalesce(F.col("n_intervals_base"), F.lit(0))
            .cast("bigint")
            .alias("n_intervals_base"),
            F.coalesce(F.col("n_intervals_new"), F.lit(0))
            .cast("bigint")
            .alias("n_intervals_new"),
            (
                (
                    F.coalesce(F.col("n_intervals_new"), F.lit(0))
                    == F.coalesce(F.col("n_reb"), F.lit(0))
                )
                & (
                    F.coalesce(F.col("n_reb"), F.lit(0))
                    == F.coalesce(F.col("n_match"), F.lit(0))
                )
            ).alias("intervals_match"),
        )
        .orderBy("custkey")
    )
