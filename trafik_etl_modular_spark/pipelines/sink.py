"""Storage sink: partitioned parquet table + MERGE-style compaction
(SURVEY.md §2.1 S5/S6 — the lakehouse replacement for SQLite DDL +
B-tree indexes + `INSERT ... ON CONFLICT`).

Layout decisions (§7.1):
  * partition by `event_date = to_date(start_time_utc)` — the
    dashboard's 30-day predicate (S7) becomes partition pruning; the
    reference's `start_time_utc` B-tree index is this, for free.
  * per-partition file sizing via repartition on the partition key
    before write (small-file control); on Delta this would be
    OPTIMIZE/Z-ORDER on `county_name` — parquet min/max stats give
    data skipping on sorted columns.
  * upsert = partition-scoped rewrite: only partitions present in the
    updates batch are rewritten (union + latest-wins within those),
    not the whole table — the pure-parquet equivalent of Delta
    `MERGE INTO`, with rewrite volume ∝ touched partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trafik_etl_modular_spark.queries.dedup import latest_wins


def write_incidents(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Initial load: date-partitioned parquet, one shuffle to co-locate
    partition data (repartition on the partition column so each date
    writes a bounded file count, not one file per task)."""
    (
        df.withColumn("event_date", F.to_date("start_time_utc"))
        .repartition(F.col("event_date"))
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_incidents(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def merge_into_incidents(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str = "incident_id",
    order_cols: tuple[str, ...] = ("modified_time_utc",),
) -> None:
    """Partition-scoped MERGE: rewrite only the event_date partitions
    the updates touch.

    1. derive the touched partition set from the updates (driver-side
       collect of a tiny distinct list);
    2. read ONLY those partitions from the existing table (partition
       pruning via the filter);
    3. union + latest-wins on the key;
    4. dynamic-partition-overwrite those partitions atomically-enough
       for parquet (Delta MERGE is the transactional upgrade).
    """
    upd = updates.withColumn("event_date", F.to_date("start_time_utc")).withColumn(
        "__src", F.lit(1)
    )
    touched = [r[0] for r in upd.select("event_date").distinct().collect()]
    if not touched:
        return

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    merged = upd
    if os.path.exists(path):
        existing = (
            read_incidents(spark, path)
            .filter(F.col("event_date").isin(touched))
            .withColumn("__src", F.lit(0))
        )
        merged = existing.unionByName(upd, allowMissingColumns=True)

    ordering = [F.desc(c) for c in order_cols] + [F.desc("__src")]
    resolved = latest_wins(merged, [key], ordering).drop("__src")
    # Materialize BEFORE the write — the plan reads the same path it
    # overwrites, which Spark (rightly) refuses to run lazily.
    resolved = resolved.localCheckpoint(eager=True)
    (
        resolved.repartition(F.col("event_date"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partitions: list | None = None,
) -> dict:
    """Small-file compaction (the pure-parquet OPTIMIZE): rewrite
    each targeted `event_date` partition into ceil(bytes/target)
    files.

    Small files are the chronic failure mode of frequent MERGEs —
    each micro-batch writes per-partition files, and a year of hourly
    batches makes 10k-file partitions whose scan is seek-bound. The
    rewrite is partition-scoped (same trick as the MERGE): untouched
    partitions keep their files byte-for-byte.

    Returns {partition: n_files_after} for observability.
    """
    import glob as _glob
    import math

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    part_dirs = sorted(_glob.glob(os.path.join(path, "event_date=*")))
    result: dict = {}
    for d in part_dirs:
        pval = os.path.basename(d).split("=", 1)[1]
        if partitions is not None and pval not in partitions:
            continue
        files = [f for f in _glob.glob(os.path.join(d, "*.parquet"))]
        n_bytes = sum(os.path.getsize(f) for f in files)
        n_target = max(1, math.ceil(n_bytes / target_file_bytes))
        if len(files) <= n_target:
            result[pval] = len(files)
            continue
        part_df = spark.read.parquet(path).filter(F.col("event_date") == pval)
        rewritten = part_df.repartition(n_target).localCheckpoint(eager=True)
        (
            rewritten.write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
        result[pval] = n_target
    return result


def conform_schema(df: DataFrame, ddl: str) -> DataFrame:
    """Defensive schema conformance before write (reference
    load_sqlite.py:79-87: missing columns added as NULL, numerics
    coerced with errors='coerce', extras implicitly dropped).

    Spark form: project onto the target schema —
      * missing column → typed NULL,
      * present column → `try_cast` (bad values → NULL, matching
        pandas errors='coerce' under ANSI mode — Spark 4 default —
        where a plain cast would throw),
      * extra columns → dropped by the projection.

    The result ALWAYS matches `ddl` exactly, so upstream schema drift
    (a source adding/renaming fields) cannot corrupt the table — it
    surfaces as NULL counts, which the ETL report's anomaly band
    catches (etl_job.run_etl).
    """
    from pyspark.sql.types import StructType

    target = StructType.fromDDL(ddl)
    cols = []
    have = {f.lower() for f in df.columns}
    for field in target.fields:
        if field.name.lower() in have:
            cols.append(
                F.col(field.name).try_cast(field.dataType).alias(field.name)
            )
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def export_training_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 10_000,
    order_col: str | None = None,
    compression: str | None = None,
) -> dict:
    """Export a training dataset as size-capped JSONL shards — the
    hand-off format for tokenizer/training jobs downstream of the
    pack → materialize pipeline.

    ``maxRecordsPerFile`` caps every shard WITHOUT a global count or
    repartition pass: each write task rolls to a new file at the cap,
    so the write stays one map-only stage at any corpus size (a
    repartition-to-exact-shard-count formulation would add a full
    shuffle of the payload for cosmetic shard numbering).  With
    ``order_col`` the frame is range-partitioned on that column first
    — shard files then hold contiguous key ranges (resumable,
    skippable by range) at the cost of that one shuffle.

    Returns {"n_shards": ..., "n_records": ...} for observability;
    the record count is a line count over the written files (JSONL =
    one record per line, via ``spark.read.text`` — no schema
    inference, no JSON re-parse), so the number reported is the
    number durably on disk.  An empty input writes zero part files;
    that is reported as 0/0 rather than crashing a schema-inferring
    read-back (advisor r3)."""
    writer = df if order_col is None else df.repartitionByRange(F.col(order_col))
    w = writer.write.mode("overwrite").option(
        "maxRecordsPerFile", str(max_records_per_file)
    )
    if compression:
        w = w.option("compression", compression)
    w.json(path)
    import glob as _glob

    n_shards = len(
        [
            f
            for f in _glob.glob(os.path.join(path, "part-*"))
            if not f.endswith(".crc") and os.path.getsize(f) > 0
        ]
    )
    if n_shards == 0:
        return {"n_shards": 0, "n_records": 0}
    n_records = df.sparkSession.read.text(path).count()
    return {"n_shards": n_shards, "n_records": n_records}
