"""Multi-consumer frame pinning with a reliable-storage option.

Several operators materialize an intermediate frame that feeds two or
more plan legs (the spatial pair frame, curation v3's post-gate
corpus) so the expensive producer runs once, not per leg.  Locally
``localCheckpoint`` is the right tool — blocks land in the executor
block manager, no filesystem round-trip.  Its cost model changes on a
real cluster: localCheckpoint blocks DIE WITH THEIR EXECUTOR, and at
1000 executors the expected number of losses during a long job is not
zero — each loss forces recomputing the full lineage for every leg
that still needs the frame, turning the one-producer optimization
quadratic (verdict r09 ask #5).

:func:`pin` keeps the plan shape identical and switches the storage
tier by configuration: when ``spark.graft.checkpoint.dir`` is set
(runtime-settable; point it at HDFS/S3 on a cluster), the frame goes
through reliable ``DataFrame.checkpoint()`` into that directory and
survives executor loss; unset (the local default), it is
``localCheckpoint`` exactly as before.  Both paths truncate lineage,
so downstream plans are byte-identical — a flag-covered test asserts
result equality across the two tiers (tests/test_pinning.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Runtime-settable session conf selecting the reliable tier.  Unset or
# empty -> localCheckpoint (local default).
CHECKPOINT_DIR_CONF = "spark.graft.checkpoint.dir"


def pin(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize ``df`` once for multi-leg consumption.

    ``eager`` mirrors the localCheckpoint parameter: ``True`` runs the
    producer now; ``False`` defers to first action (right when the
    first consumer leg also wants the rows anyway).
    """
    spark = df.sparkSession
    try:
        ckdir = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    except Exception:  # noqa: BLE001 — conf accessor quirks never break the op
        ckdir = None
    if ckdir:
        sc = spark.sparkContext
        # setCheckpointDir is idempotent for the same path; only call
        # when it actually changes so repeated pins don't churn dirs.
        current = None
        try:
            current = sc.getCheckpointDir()
        except Exception:  # noqa: BLE001
            pass
        if current != ckdir:
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
