"""Training-corpus preparation: deterministic global shuffle into
shards, and stride-window document chunking.

Two operators every LLM data pipeline runs between curation and the
trainer, complementing the existing sampling/packing family
(llmdata/sampling.py, pipelines/sink.py::export_training_shards):

* **Deterministic shuffle** — training wants the corpus in a
  reproducible pseudo-random order, sharded for parallel readers.
  Shuffling 100 TB with an RNG permutation means a global sort over
  random keys plus seed-state bookkeeping; hashing gives the same
  statistical scatter with none of that: order key = neutral_hash(id),
  shard = key mod S.  Every property is re-derivable from ids alone
  (resumable, verifiable, stable across reruns and engines), the
  shard assignment needs no shuffle at all (map-side mod), and the
  within-shard order is a per-shard sort — S independent partitions,
  never a single global sort.  The round-robin virtual position
  (pos·S + shard) defines one global order a multi-reader trainer
  consumes without coordination.

* **Stride chunking** — documents longer than the model context are
  split into fixed token windows with overlap (window 32, stride 24
  here; the 100 TB shape is identical with 4k/3k).  Chunking is a
  per-row explode — embarrassingly parallel, no shuffle — and the
  emitted (doc_id, chunk_idx) keys keep provenance for dedup and
  eval-leak tracking downstream.  The `covers_to` / window arithmetic
  certifies every token lands in at least one chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trafik_etl_modular_spark.functions.neutral_hash import nhash, oracle_nhash
from trafik_etl_modular_spark.queries.common import t
from trafik_etl_modular_spark.registry import query

N_SHARDS = 8

_SHUFFLE_H = oracle_nhash("doc_id", "shuffle")

_SHUFFLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, n_chars, {_SHUFFLE_H} AS h
  FROM documents
),
ordered AS (
  SELECT doc_id, n_chars, h, h % {N_SHARDS} AS shard,
         ROW_NUMBER() OVER (PARTITION BY h % {N_SHARDS} ORDER BY h, doc_id) AS pos
  FROM keyed
),
per_shard AS (
  SELECT shard,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         CAST(MIN(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS first_doc_id
  FROM ordered GROUP BY shard
),
last_doc AS (
  SELECT shard, CAST(doc_id AS BIGINT) AS last_doc_id
  FROM ordered o
  WHERE pos = (SELECT MAX(pos) FROM ordered x WHERE x.shard = o.shard)
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents)
SELECT p.shard, p.n_docs, p.sum_chars, p.first_doc_id, l.last_doc_id, t.n_total
FROM per_shard p JOIN last_doc l ON l.shard = p.shard CROSS JOIN total t
ORDER BY p.shard
"""


@query("sample_shuffle_shards", sql=_SHUFFLE_SQL, tags=("llmdata", "sampling"))
def sample_shuffle_shards(spark, sf_dir) -> DataFrame:
    """Deterministic training shuffle: hash-ordered corpus dealt into
    {N_SHARDS} shards (module doc).  Output is the SHARD MANIFEST a
    trainer launch consumes — per shard: size, byte mass, and the
    first/last document under the within-shard order — plus the
    corpus total on every row (Σ n_docs = n_total ⇔ the permutation
    is exactly once per doc; the oracle recomputes the whole
    assignment from ids).

    Scale: shard assignment is a map-side mod on the hash key; the
    within-shard order is a per-shard window — S independent sorted
    partitions instead of one global sort; the manifest is S rows."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    keyed = docs.select(
        "doc_id", "n_chars", nhash("doc_id", "shuffle").alias("h")
    ).withColumn("shard", F.col("h") % N_SHARDS)
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    ordered = keyed.withColumn("pos", F.row_number().over(w))
    per_shard = ordered.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min(F.when(F.col("pos") == 1, F.col("doc_id")))
        .cast("bigint")
        .alias("first_doc_id"),
        F.max_by("doc_id", "pos").cast("bigint").alias("last_doc_id"),
    )
    total = docs.agg(F.count("*").cast("bigint").alias("n_total"))
    return per_shard.crossJoin(F.broadcast(total)).select(
        "shard", "n_docs", "sum_chars", "first_doc_id", "last_doc_id", "n_total"
    ).orderBy("shard")


CHUNK_W = 32
CHUNK_STRIDE = 24

_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
sized AS (
  SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tok FROM toks
),
chunks AS (
  SELECT doc_id, n_tok, CAST(s AS BIGINT) AS chunk_start,
         CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
         list_slice(tk, s + 1, s + {CHUNK_W}) AS ck
  FROM sized, UNNEST(generate_series(0, CAST(n_tok AS INTEGER) - 1, {CHUNK_STRIDE})) AS u(s)
)
SELECT doc_id, chunk_idx, chunk_start,
       CAST(len(ck) AS BIGINT) AS chunk_len,
       array_to_string(ck, ' ') AS chunk_text,
       (chunk_start + CAST(len(ck) AS BIGINT) >= n_tok) AS reaches_end
FROM chunks
ORDER BY doc_id, chunk_idx
"""


@query("text_chunk_windows", sql=_CHUNK_SQL, tags=("llmdata", "text"))
def text_chunk_windows(spark, sf_dir) -> DataFrame:
    """Stride-window chunking: window {CHUNK_W} tokens, stride
    {CHUNK_STRIDE} (8-token overlap), last window ragged.  One row
    per (doc, chunk) with token offset, length, text, and
    `reaches_end` — TRUE exactly on each doc's final chunk, the
    per-row form of the full-coverage certificate (stride < window ⇒
    chunks tile the token sequence with overlap; a gap would surface
    as a missing chunk_idx, which the oracle's independent
    generate_series reconstruction would catch).

    Plan: tokenize + explode is a per-row projection — zero shuffles
    before the presentation sort; chunk volume is ⌈n_tok/stride⌉ per
    doc, linear in corpus tokens."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    sized = docs.select(
        "doc_id", F.split("text", " ").alias("tk")
    ).withColumn("n_tok", F.size("tk").cast("bigint"))
    chunks = sized.select(
        "doc_id",
        "n_tok",
        "tk",
        F.explode(
            F.sequence(F.lit(0), (F.col("n_tok") - 1).cast("int"), F.lit(CHUNK_STRIDE))
        ).alias("s"),
    ).select(
        "doc_id",
        "n_tok",
        F.col("s").cast("bigint").alias("chunk_start"),
        F.expr(f"CAST(s div {CHUNK_STRIDE} AS BIGINT)").alias("chunk_idx"),
        F.slice("tk", F.col("s") + 1, CHUNK_W).alias("ck"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        F.size("ck").cast("bigint").alias("chunk_len"),
        F.array_join("ck", " ").alias("chunk_text"),
        (F.col("chunk_start") + F.size("ck").cast("bigint") >= F.col("n_tok")).alias(
            "reaches_end"
        ),
    ).orderBy("doc_id", "chunk_idx")
