"""Streaming landing-zone sink: a Python ``DataSourceStreamWriter``
with a two-phase commit protocol (SURVEY.md §2.9 — the write-side
completion of the feed source's offset story).

The reference's sink is a batched SQLite upsert with per-batch
commits (/root/reference/src/trv/load_sqlite.py:73-103). At scale the
equivalent guarantee — a reader never sees a torn micro-batch — needs
a commit protocol, not a transaction:

  1. executors write task files UNDER A TEMP NAME and return the
     file list as their :class:`WriterCommitMessage`;
  2. the driver's ``commit(messages, batchId)`` publishes the batch
     by writing a ``_batch_<id>.manifest`` listing exactly those
     files — the manifest write is the atomic commit point;
  3. ``abort()`` deletes the orphan task files; a crash between
     write and commit leaves files no manifest references.

Readers (:func:`read_committed`) list manifests and read ONLY
manifest-referenced files, so uncommitted/aborted output is invisible
— exactly-once delivery on top of at-least-once task execution, the
same contract Delta's transaction log provides, in one directory of
parquet + manifests. Task retries are naturally handled: each task
attempt writes fresh uuid-named files, and only the attempt whose
message reaches ``commit`` is published.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


@dataclass
class _FilesCommitted(WriterCommitMessage):
    files: list[str]


class LandingZoneStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self.dir = options["path"]
        os.makedirs(self.dir, exist_ok=True)

    def write(self, iterator: Iterator) -> _FilesCommitted:
        """Executor-side: buffer the partition into one Arrow table,
        write a uuid-named parquet task file, report it for commit."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(iterator)
        if not rows:
            return _FilesCommitted(files=[])
        cols = rows[0].__fields__
        tbl = pa.table(
            {c: [getattr(r, c) for r in rows] for c in cols}
        )
        fname = f"task-{uuid.uuid4().hex}.parquet"
        pq.write_table(tbl, os.path.join(self.dir, fname))
        return _FilesCommitted(files=[fname])

    def commit(self, messages, batchId: int) -> None:
        """Driver-side atomic publish: one manifest per micro-batch.
        Written via tempfile+rename so a reader never sees a partial
        manifest."""
        files = [f for m in messages if m is not None for f in m.files]
        tmp = os.path.join(self.dir, f".manifest-{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"batch_id": batchId, "files": files}, fh)
        os.rename(tmp, os.path.join(self.dir, f"_batch_{batchId:010d}.manifest"))

    def abort(self, messages, batchId: int) -> None:
        """Failed batch: delete the orphan task files (best-effort —
        even without cleanup they are invisible, no manifest points
        at them)."""
        for m in messages:
            if m is not None:
                for f in m.files:
                    try:
                        os.remove(os.path.join(self.dir, f))
                    except FileNotFoundError:
                        pass


class LandingZoneSink(DataSource):
    """df.writeStream.format("landing_zone").option("path", dir)"""

    @classmethod
    def name(cls) -> str:
        return "landing_zone"

    def streamWriter(self, schema, overwrite: bool) -> LandingZoneStreamWriter:
        return LandingZoneStreamWriter(self.options)


def register_landing_sink(spark: SparkSession) -> None:
    spark.dataSource.register(LandingZoneSink)


def committed_files(path: str, as_of_batch: int | None = None) -> list[str]:
    """Files published by a committed manifest, in batch order.
    ``as_of_batch`` reads the table as of that batch id (inclusive) —
    the manifest log doubles as a version history, so snapshot reads
    and time travel are free."""
    out: list[str] = []
    for mf in sorted(f for f in os.listdir(path) if f.endswith(".manifest")):
        with open(os.path.join(path, mf)) as fh:
            m = json.load(fh)
        if as_of_batch is not None and m["batch_id"] > as_of_batch:
            continue
        out.extend(m["files"])
    return out


def read_committed(
    spark: SparkSession, path: str, as_of_batch: int | None = None
) -> DataFrame:
    """Read ONLY manifest-referenced files — uncommitted task output
    is invisible by construction. ``as_of_batch`` = time travel."""
    files = [os.path.join(path, f) for f in committed_files(path, as_of_batch)]
    if not files:
        raise ValueError(f"no committed batches under {path}")
    return spark.read.parquet(*files)
