"""Streaming incremental corpus dedup — the continuous-crawl shape.

A crawl feed lands documents in micro-batches; each batch must be
classified against everything already ingested (exact content hash +
k-shingle Jaccard) BEFORE it joins the corpus.  The reference's
analog is the daily cursor fetch + cross-page id dedup
(/root/reference/src/trv/endpoints.py:166-207); here the check is
content-based and the index is carried as accumulating state.

Scale shape: the state is the INVERTED SHINGLE INDEX
(llmdata.dedup.shingle_postings) plus the content-hash set — per
micro-batch, work is batch-postings ⨝ index on the shingle hash, so
cost is proportional to the BATCH (times index hit rate), never
corpus².  On a lakehouse the two state frames are Delta tables the
foreachBatch body appends to; here they are eagerly
local-checkpointed unions (bounded lineage, same semantics).  The
micro-batched fixture drive mirrors the other streaming queries:
documents split into n deterministic files (batch_id = doc_id mod n)
delivered oldest-mtime-first by the file source.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafik_etl_modular_spark.catalog import _ensure_session_confs, table_path


def _documents_batch_dir(sf_dir: str, n_batches: int) -> str:
    """Stage the documents fixture as ``n_batches`` parquet files
    (batch_id = doc_id % n, ascending mtimes 1 s apart) under /tmp —
    content-keyed like the sentinel stream dir so a regenerated
    fixture can never reuse a stale split."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = table_path(sf_dir, "documents")
    st = os.stat(src)
    key = f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}|{n_batches}"
    d = f"/tmp/trafik_docstream_{hashlib.md5(key.encode()).hexdigest()[:10]}"
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    tbl = pq.read_table(src)
    ids = tbl["doc_id"].to_numpy()
    base = int(os.stat(src).st_mtime) - n_batches - 1
    for i in range(n_batches):
        mask = pa.array(ids % n_batches == i)
        sub = tbl.filter(mask)
        sub = sub.append_column(
            "batch_id", pa.array([i] * sub.num_rows, type=pa.int64())
        )
        path = os.path.join(d, f"batch_{i}.parquet")
        pq.write_table(sub, path)
        os.utime(path, (base + i, base + i))
    with open(done, "w") as f:
        f.write("ok")
    return d


def incremental_dedup_stream_run(
    spark: SparkSession,
    sf_dir: str,
    n_batches: int = 4,
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Drive the documents stream to completion; return one verdict
    row per document: (doc_id, batch_id, verdict, matched_id,
    n_near_matches), where each doc was classified against the
    strictly-earlier batches only (first batch: all novel).

    The batch-equivalence oracle re-derives the same verdicts in one
    SQL pass with a ``c.batch_id < b.batch_id`` predicate — final
    output must be independent of HOW the stream was micro-batched
    beyond the declared batch boundaries."""
    from trafik_etl_modular_spark.llmdata.dedup import (
        content_hashes,
        incremental_verdicts,
        shingle_postings,
    )

    _ensure_session_confs(spark)
    d = _documents_batch_dir(sf_dir, n_batches)
    raw = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(d).schema)
        .option("maxFilesPerTrigger", "1")
        .load(d)
    )

    state: dict[str, DataFrame] = {}

    def apply_batch(bdf: DataFrame, epoch_id: int) -> None:
        bdf = bdf.localCheckpoint(eager=True)
        if bdf.isEmpty():
            return
        state["n_seen"] = state.get("n_seen", 0) + 1
        cinv, chash = state.get("postings"), state.get("hashes")
        # the batch's postings serve BOTH the verdict probe and the
        # index append — shingle once per batch
        binv = shingle_postings(bdf, k=k).localCheckpoint(eager=False)
        if cinv is None:
            verdicts = bdf.select(
                "doc_id",
                "batch_id",
                F.lit("novel").alias("verdict"),
                F.lit(None).cast("bigint").alias("matched_id"),
                F.lit(0).cast("bigint").alias("n_near_matches"),
            )
        else:
            v = incremental_verdicts(bdf, binv, cinv, chash, threshold=threshold)
            verdicts = bdf.select("doc_id", "batch_id").join(v, "doc_id").select(
                "doc_id", "batch_id", "verdict", "matched_id", "n_near_matches"
            )
        # index append — the Delta-append analog, eager-checkpointed so
        # lineage stays one batch deep.  coalesce(8) bounds the state
        # partition count: unions of per-batch checkpoints otherwise
        # accumulate 32 partitions per batch (96-task stages measured
        # at sf0.1 for micro-batch-sized state); at lake scale the
        # Delta append handles file sizing instead.  The append is
        # SKIPPED after the final batch: the accumulated index's only
        # consumer is the NEXT batch's verdict probe, so the last
        # append is dead work here (two eager-materialization jobs) —
        # a real continuous pipeline never hits this because it has
        # no final batch.
        if state["n_seen"] < n_batches:
            new_inv = binv
            new_hash = content_hashes(bdf)
            state["postings"] = (
                (new_inv if cinv is None else cinv.unionByName(new_inv))
                .coalesce(8)
                .localCheckpoint(eager=True)
            )
            state["hashes"] = (
                (new_hash if chash is None else chash.unionByName(new_hash))
                .coalesce(8)
                .localCheckpoint(eager=True)
            )
        # verdicts accumulate LAZILY: they hang off the eagerly
        # checkpointed batch/index frames, so the union materializes
        # once at the final read instead of costing a job per batch
        prev = state.get("result")
        state["result"] = verdicts if prev is None else prev.unionByName(verdicts)

    # per-micro-batch joins/aggs are batch-sized — 8 shuffle
    # partitions, not the session's batch-scale default (same
    # reasoning as pipeline._run_to_memory's state_partitions)
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            raw.writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return state["result"].orderBy("doc_id")
