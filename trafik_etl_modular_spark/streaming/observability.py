"""Run observability: streaming-query listener + notifier.

The reference reports each run over a Slack webhook — start / fetched
/ normalized / done messages carrying row counts and runtime, plus
row-volume plausibility warnings
(/root/reference/src/cli.py:44-99, src/utils/notifier.py:43-64,
guards cli.py:20-21,94-99). The engine's equivalents:

  * :class:`MetricsListener` — a ``StreamingQueryListener`` that
    turns micro-batch progress events into the same stage
    notifications (driver-side, zero cost on the data path: Spark
    pushes progress objects, nothing is collected from executors);
  * :func:`check_row_volume` — the ``[expect_min, expect_max]``
    anomaly band as a pure function (shared with the batch path,
    pipelines/etl_job.py);
  * :class:`Notifier` — webhook delivery with the same 5× backoff
    envelope as the feed client; the transport is a callable so
    tests (and this network-less environment) inject their own.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable

from pyspark.sql.streaming import StreamingQueryListener

from trafik_etl_modular_spark.sources.xml_feed import fetch_with_retry


def check_row_volume(
    rows: int, expect_min: int = 50, expect_max: int = 2000
) -> str | None:
    """Row-volume plausibility guard (reference cli.py:20-21,94-99):
    None when in band, else a warning string."""
    if rows == 0:
        return "no rows ingested"
    if rows < expect_min:
        return f"row volume {rows} below expected minimum {expect_min}"
    if rows > expect_max:
        return f"row volume {rows} above expected maximum {expect_max}"
    return None


class Notifier:
    """Webhook notifier with retry/backoff (reference notifier.py
    posts JSON to a Slack webhook; transport injected here)."""

    def __init__(self, transport: Callable[[str], object], max_attempts: int = 5):
        self._transport = transport
        self._max_attempts = max_attempts

    def notify(self, stage: str, **fields) -> dict:
        payload = {"stage": stage, "ts": time.time(), **fields}
        body = json.dumps(payload, sort_keys=True)
        fetch_with_retry(lambda: self._transport(body), self._max_attempts)
        return payload


class MetricsListener(StreamingQueryListener):
    """Per-query lifecycle + per-batch progress notifications.

    Captures (queryName, batchId, numInputRows, durationMs) from each
    progress event, emits volume warnings through the same guard as
    the batch ETL, and keeps an in-memory log the driver can assert
    on / export. Attach with ``spark.streams.addListener``."""

    def __init__(self, notifier: Notifier | None = None,
                 expect_min: int = 0, expect_max: int = 2**63 - 1):
        self.events: list[dict] = []
        self._notifier = notifier
        self._expect = (expect_min, expect_max)

    def _emit(self, stage: str, **fields) -> None:
        rec = {"stage": stage, **fields}
        self.events.append(rec)
        if self._notifier is not None:
            self._notifier.notify(stage, **fields)

    def onQueryStarted(self, event) -> None:
        self._emit("started", query_id=str(event.id), name=event.name)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rows = p.numInputRows
        warning = None
        if rows:
            warning = check_row_volume(rows, *self._expect)
        # Event-time sibling of the row-volume guard (verdict r11 ask
        # #5): rows silently discarded as too-late by the watermark
        # are the OTHER way a pipeline loses data without erroring —
        # surfaced per micro-batch from the state operators' progress.
        dropped = 0
        try:
            for op in p.stateOperators or []:
                dropped += int(op.numRowsDroppedByWatermark or 0)
        except Exception:  # noqa: BLE001 — stateless queries have no operators
            dropped = 0
        if dropped and warning is None:
            warning = f"{dropped} rows dropped as too late by the watermark"
        self._emit(
            "progress",
            query_id=str(p.id),
            batch_id=p.batchId,
            num_input_rows=rows,
            rows_dropped_by_watermark=dropped,
            duration_ms=p.durationMs.get("triggerExecution"),
            warning=warning,
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        self._emit(
            "terminated",
            query_id=str(event.id),
            error=event.exception,
        )
