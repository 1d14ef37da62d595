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


def iter_listing(
    path: str,
    suffix: str | None = None,
    prefix: str | None = None,
    page_size: int = 1000,
):
    """Bounded-page directory listing — the object-store contract
    (S3 ListObjectsV2 / GCS objects.list: lexicographic order,
    start-after token, max-keys page), backed locally by os.scandir
    with a bounded min-heap per page.  Driver memory is O(page_size),
    never O(files-in-zone): at lake scale a landing zone holds
    millions of task files, and an unbounded listdir on the driver is
    exactly the metadata bottleneck the manifest log exists to avoid.
    On a real object store each loop iteration maps 1:1 to one
    paginated LIST call with ``StartAfter=token``.  Yields names in
    lexicographic order."""
    import heapq

    token = ""
    while True:
        with os.scandir(path) as it:
            page = heapq.nsmallest(
                page_size,
                (
                    e.name
                    for e in it
                    if e.name > token
                    and (suffix is None or e.name.endswith(suffix))
                    and (prefix is None or e.name.startswith(prefix))
                ),
            )
        if not page:
            return
        yield from page
        token = page[-1]


def committed_files(path: str, as_of_batch: int | None = None) -> list[str]:
    """Files published by a committed manifest, in batch order.
    ``as_of_batch`` reads the table as of that batch id (inclusive) —
    the manifest log doubles as a version history, so snapshot reads
    and time travel are free.  Manifests are listed through the
    bounded-page iterator (manifest names sort by batch id)."""
    out: list[str] = []
    for mf in iter_listing(path, suffix=".manifest"):
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


def vacuum_landing_zone(
    path: str, keep_batches: int = 2, orphan_grace_s: float = 3600.0
) -> dict:
    """Retention for the landing zone — the VACUUM half of the
    manifest-log lifecycle.  Two kinds of garbage accumulate:

      * SUPERSEDED HISTORY: manifests (and the task files only they
        reference) older than the newest ``keep_batches`` batches.
        Dropping them bounds the time-travel window, exactly the
        trade Delta's VACUUM makes — snapshot reads older than the
        retained window stop working, current reads are untouched.
      * ORPHANS: task files no manifest references (crashed executors
        whose batch aborted before `abort()` ran).  They are already
        invisible to readers; deletion is pure space reclamation.
        ``orphan_grace_s`` protects files younger than the grace
        period — they may belong to a batch whose manifest commit is
        IN FLIGHT (task files land before the driver publishes).

    Driver-local metadata work (bounded-page listings + json reads,
    no Spark job), same as manifest commit itself.  Memory is
    O(page + kept snapshot metadata), never O(files-in-zone): both
    the manifest scan and the orphan scan stream through
    :func:`iter_listing` pages, so the same loop runs against an
    object store's paginated LIST at lake scale.  Returns counts for
    observability."""
    import collections

    # Pass 1 (streaming): the last keep_batches manifest names via a
    # bounded deque — zero-padded names make lexicographic order the
    # batch order.
    tail: collections.deque[str] = collections.deque(maxlen=max(keep_batches, 0))
    for mf in iter_listing(path, suffix=".manifest"):
        if keep_batches > 0:
            tail.append(mf)
    keep = set(tail)
    # Pre-pass: collect every file a KEPT manifest references, so a
    # file shared across batches can never be deleted while a live
    # manifest still points at it (task files are uuid-per-batch
    # today, but correctness must not depend on that).
    referenced_kept: set[str] = set()
    for mf in keep:
        with open(os.path.join(path, mf)) as fh:
            referenced_kept.update(json.load(fh)["files"])
    removed_manifests = removed_files = removed_orphans = 0
    # Pass 2 (streaming): retire every manifest not in the kept tail.
    # Deleting a yielded name is pagination-safe: it is already behind
    # the page token, so later pages never rescan it.
    for mf in iter_listing(path, suffix=".manifest"):
        if mf in keep:
            continue
        with open(os.path.join(path, mf)) as fh:
            files = json.load(fh)["files"]
        # retire the manifest FIRST so a concurrent reader can never
        # see a manifest whose files are already gone
        os.remove(os.path.join(path, mf))
        removed_manifests += 1
        for f in files:
            if f in referenced_kept:
                continue
            try:
                os.remove(os.path.join(path, f))
                removed_files += 1
            except FileNotFoundError:
                pass
    import time as _time

    now = _time.time()
    # Orphan scan: stream task files page by page; only kept-manifest
    # references (bounded snapshot metadata) are held in memory.
    for f in iter_listing(path, suffix=".parquet", prefix="task-"):
        if f in referenced_kept:
            continue
        fp = os.path.join(path, f)
        try:
            if now - os.path.getmtime(fp) >= orphan_grace_s:
                os.remove(fp)
                removed_orphans += 1
        except FileNotFoundError:
            pass
    return {
        "removed_manifests": removed_manifests,
        "removed_files": removed_files,
        "removed_orphans": removed_orphans,
        "kept_batches": len(keep),
    }
