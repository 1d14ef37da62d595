"""End-to-end source roundtrip: events fixture → paginated Situation
XML pages (the TRV feed shape) → Python Data Source scan → flatten —
oracle-checked against direct SQL over the same events, which proves
the XML writer/parser/flatten stack loses nothing (S1–S4 parity).
"""

from __future__ import annotations

import hashlib
import os
from xml.sax.saxutils import escape

from pyspark.sql import functions as F

from trafik_etl_modular_spark.registry import query
from trafik_etl_modular_spark.sources.xml_feed import register_xml_feed

_PAGE_SIZE = 500  # reference page size (config.py:24)


def ensure_feed_dir(sf_dir: str) -> str:
    """Generate the XML page files once per sf_dir (deterministic:
    events ordered by event_id, 500/page — the reference's page
    size). pyarrow read keeps this Spark-free and cheap."""
    import pyarrow.parquet as pq

    d = f"/tmp/trafik_xml_feed_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)

    tbl = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    rows = sorted(tbl.to_pylist(), key=lambda r: r["event_id"])
    for page_no in range(0, len(rows), _PAGE_SIZE):
        chunk = rows[page_no : page_no + _PAGE_SIZE]
        parts = ["<Response>"]
        for r in chunk:
            iso = r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
            parts.append(
                f"<Situation><Id>S{r['event_id']}</Id>"
                f"<ModifiedTime>{iso}</ModifiedTime>"
                f"<PublicationTime>{iso}</PublicationTime>"
                f"<Deviation><Id>D{r['event_id']}</Id>"
                f"<Message>{escape(r['props'])}</Message>"
                f"<MessageType>{escape(r['event_type'])}</MessageType>"
                f"<CountyNo>{r['user_id'] % 25}</CountyNo>"
                f"<StartTime>{iso}</StartTime>"
                f"</Deviation></Situation>"
            )
        parts.append("</Response>")
        with open(os.path.join(d, f"page_{page_no // _PAGE_SIZE:05d}.xml"), "w") as f:
            f.write("".join(parts))
    open(done, "w").close()
    return d


_ROUNDTRIP_SQL = """
SELECT 'S' || event_id AS situation_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS modified_time,
       'D' || event_id AS deviation_id,
       props AS message,
       event_type AS message_type,
       CAST(user_id % 25 AS INTEGER) AS county_no,
       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS start_time
FROM events
"""


@query("source_xml_feed_roundtrip", sql=_ROUNDTRIP_SQL, tags=("source",))
def source_xml_feed_roundtrip(spark, sf_dir):
    """events → XML pages → custom DataSource scan → flattened rows.
    Partition planning splits page spans across executors; the oracle
    compares the full roundtrip against the original events."""
    feed_dir = ensure_feed_dir(sf_dir)
    register_xml_feed(spark)
    raw = (
        spark.read.format("xml_feed")
        .option("path", feed_dir)
        .option("maxPages", "100000")
        .load()
    )
    return raw.select(
        "situation_id",
        "modified_time",
        "deviation_id",
        "message",
        "message_type",
        "county_no",
        "start_time",
    )


@query("source_xml_feed_stream", sql=_ROUNDTRIP_SQL, tags=("source", "streaming"))
def source_xml_feed_stream(spark, sf_dir):
    """The same landing zone consumed through the STREAMING side of the
    DataSource (XmlFeedStreamReader): offset = pages consumed, each
    micro-batch's page span split across executors. Run to completion
    here, the stream must deliver byte-identical rows to the batch
    scan — one oracle covers both paths."""
    import hashlib
    import tempfile

    feed_dir = ensure_feed_dir(sf_dir)
    register_xml_feed(spark)
    raw = (
        spark.readStream.format("xml_feed")
        .option("path", feed_dir)
        .option("maxPages", "100000")
        .load()
    )
    sel = raw.select(
        "situation_id",
        "modified_time",
        "deviation_id",
        "message",
        "message_type",
        "county_no",
        "start_time",
    )
    name = f"feed_stream_{hashlib.md5(feed_dir.encode()).hexdigest()[:8]}"
    q = (
        sel.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="feed_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
