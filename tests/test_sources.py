"""Python Data Source + UDTF paginated XML feed (SURVEY.md S1-S4/U4)
and the partitioned sink with MERGE compaction (S5/S6)."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from trafik_etl_modular_spark.sources.xml_feed import (
    fetch_with_retry,
    make_pages_udtf,
    parse_situation_xml,
    register_xml_feed,
)

PAGE_TMPL = """<Response><Situation>
  <Id>S{p}A</Id><ModifiedTime>2024-01-1{p}T08:00:00Z</ModifiedTime>
  <PublicationTime>2024-01-1{p}T07:00:00Z</PublicationTime>
  <Deviation><Id>D{p}1</Id><Message>Roadwork {p}</Message>
    <MessageType>Roadwork</MessageType><LocationDescriptor>E6</LocationDescriptor>
    <RoadNumber>E6</RoadNumber><CountyNo>14</CountyNo>
    <StartTime>2024-01-1{p}T00:00:00Z</StartTime>
    <Geometry><WGS84>POINT (11.97 57.70)</WGS84></Geometry>
  </Deviation>
  <Deviation><Id>D{p}2</Id><Message>Accident {p}</Message>
    <MessageType>Accident</MessageType><CountyNo>1</CountyNo>
    <StartTime>2024-01-1{p}T06:00:00Z</StartTime>
  </Deviation>
</Situation>
<Situation><Id>S{p}B</Id><ModifiedTime>2024-01-1{p}T09:00:00Z</ModifiedTime>
  <PublicationTime>2024-01-1{p}T08:30:00Z</PublicationTime>
</Situation></Response>"""


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("xml_feed")
    for p in range(1, 5):
        (d / f"page_{p:03d}.xml").write_text(PAGE_TMPL.format(p=p))
    return str(d)


def test_parse_xml_flatten_semantics():
    rows = parse_situation_xml(PAGE_TMPL.format(p=1), page=0)
    # 2 deviations from S1A; S1B (no deviations) vanishes — inner explode
    assert len(rows) == 2
    sids = {r[0] for r in rows}
    assert sids == {"S1A"}
    # parent fields repeated, missing fields None
    assert rows[0][1] == "2024-01-11T08:00:00Z"
    assert rows[1][10] is None  # D12 has no EndTime
    assert rows[0][11] == "POINT (11.97 57.70)"  # nested Geometry/WGS84


def test_fetch_retry_recovers():
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise ConnectionError("503")
        return "<ok/>"

    assert fetch_with_retry(flaky) == "<ok/>"
    assert attempts["n"] == 3

    with pytest.raises(RuntimeError, match="after 5 attempts"):
        fetch_with_retry(lambda: (_ for _ in ()).throw(ConnectionError("down")))


def test_datasource_reads_pages_in_partitions(spark, feed_dir):
    register_xml_feed(spark)
    df = (
        spark.read.format("xml_feed")
        .option("path", feed_dir)
        .option("pagesPerSplit", "2")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 8  # 4 pages × 2 deviations
    assert df.select("page").distinct().count() == 4
    # the source plans multiple partitions (page spans)
    assert df.rdd.getNumPartitions() == 2


def test_udtf_pagination_with_seen_ids(spark, feed_dir):
    spark.udtf.register("read_pages", make_pages_udtf())
    out = spark.sql(f"SELECT * FROM read_pages('{feed_dir}', 20)").collect()
    assert len(out) == 8
    assert {r["deviation_id"] for r in out} == {
        f"D{p}{i}" for p in range(1, 5) for i in (1, 2)
    }


def test_partitioned_sink_and_merge(spark, tmp_path):
    from trafik_etl_modular_spark.pipelines.sink import (
        merge_into_incidents,
        read_incidents,
        write_incidents,
    )

    path = str(tmp_path / "incidents_tbl")
    base = spark.createDataFrame(
        [
            ("A", "2024-01-10 08:00:00", "2024-01-10 08:00:00", 1.0),
            ("B", "2024-01-10 09:00:00", "2024-01-10 09:00:00", 2.0),
            ("C", "2024-01-11 09:00:00", "2024-01-11 09:00:00", 3.0),
        ],
        "incident_id string, start_time_utc string, modified_time_utc string, v double",
    ).withColumn("start_time_utc", F.col("start_time_utc").cast("timestamp"))
    write_incidents(base, path)

    # partition directories exist (date-partitioned layout)
    assert glob.glob(os.path.join(path, "event_date=2024-01-10"))

    updates = spark.createDataFrame(
        [
            ("B", "2024-01-10 09:00:00", "2024-01-12 00:00:00", 20.0),  # newer version
            ("D", "2024-01-10 11:00:00", "2024-01-12 00:00:00", 4.0),  # new key
        ],
        "incident_id string, start_time_utc string, modified_time_utc string, v double",
    ).withColumn("start_time_utc", F.col("start_time_utc").cast("timestamp"))
    merge_into_incidents(spark, path, updates)

    got = {
        r["incident_id"]: r["v"] for r in read_incidents(spark, path).collect()
    }
    assert got == {"A": 1.0, "B": 20.0, "C": 3.0, "D": 4.0}


def test_centroid_udf_and_hybrid(spark):
    from trafik_etl_modular_spark.functions.geo import centroid_lat_lon

    df = spark.createDataFrame(
        [
            ("POINT (11.97 57.70)",),
            ("LINESTRING (10.0 50.0, 12.0 52.0)",),
            ("garbage",),
            (None,),
        ],
        "g string",
    )
    lat, lon = centroid_lat_lon("g")
    out = df.select(lat.alias("lat"), lon.alias("lon")).collect()
    assert (out[0]["lat"], out[0]["lon"]) == (57.70, 11.97)  # JVM fast path
    assert (out[1]["lat"], out[1]["lon"]) == (51.0, 11.0)  # vertex mean
    assert out[2]["lat"] is None and out[3]["lat"] is None


def test_compaction_reduces_files_preserves_data(spark, tmp_path):
    from trafik_etl_modular_spark.pipelines.sink import compact_partitions

    path = str(tmp_path / "fragmented")
    df = spark.createDataFrame(
        [(f"I{i}", "2024-01-10 08:00:00", float(i)) for i in range(500)],
        "incident_id string, start_time_utc string, v double",
    ).withColumn("start_time_utc", F.col("start_time_utc").cast("timestamp"))
    # simulate many-small-files from repeated micro-batch merges
    (
        df.withColumn("event_date", F.to_date("start_time_utc"))
        .repartition(12)
        .write.partitionBy("event_date")
        .parquet(path)
    )
    before = glob.glob(os.path.join(path, "event_date=2024-01-10", "*.parquet"))
    assert len(before) == 12

    report = compact_partitions(spark, path, target_file_bytes=1 << 30)
    after = glob.glob(os.path.join(path, "event_date=2024-01-10", "*.parquet"))
    assert len(after) == 1 and report["2024-01-10"] == 1

    got = spark.read.parquet(path).collect()
    assert len(got) == 500
    assert {r["incident_id"] for r in got} == {f"I{i}" for i in range(500)}


def test_conform_schema_repairs_drift(spark):
    from trafik_etl_modular_spark.pipelines.sink import conform_schema

    drifted = spark.createDataFrame(
        [("A", "not-a-number", 1.5, "extra")],
        "incident_id string, county_no string, latitude double, surprise string",
    )
    out = conform_schema(
        drifted, "incident_id string, county_no int, latitude double, longitude double"
    )
    assert out.columns == ["incident_id", "county_no", "latitude", "longitude"]
    row = out.collect()[0]
    # bad numeric -> NULL (errors='coerce'), missing col -> typed NULL,
    # extra col -> dropped
    assert row["county_no"] is None and row["longitude"] is None
    assert row["incident_id"] == "A" and row["latitude"] == 1.5
    assert dict(out.dtypes)["county_no"] == "int"


def test_datasource_filter_pushdown_prunes_pages(spark, feed_dir):
    register_xml_feed(spark)
    base = (
        spark.read.format("xml_feed")
        .option("path", feed_dir)
        .option("pagesPerSplit", "1")
        .load()
    )
    # page < 2 pushes into the source: only 2 of 4 page files planned
    pruned = base.filter(F.col("page") < 2)
    assert pruned.rdd.getNumPartitions() == 2
    rows = pruned.collect()
    assert len(rows) == 4 and {r["page"] for r in rows} == {0, 1}
    # original page numbering survives pruning (page > 0 keeps 1..3)
    tail = base.filter(F.col("page") > 0).collect()
    assert {r["page"] for r in tail} == {1, 2, 3}
    # non-page predicates are left to Spark and still evaluated
    mixed = base.filter((F.col("page") < 2) & (F.col("message_type") == "Accident"))
    got = mixed.collect()
    assert {(r["page"], r["message_type"]) for r in got} == {
        (0, "Accident"),
        (1, "Accident"),
    }


def test_stream_reader_incremental_offsets(spark, tmp_path):
    """Streaming DataSource: offset == pages consumed. A restarted
    query with the same checkpoint resumes at the committed page —
    newly landed pages arrive as a NEW micro-batch, old pages are
    never re-read (exactly-once incremental ingest, the scale form of
    the reference's cursor pagination)."""
    feed = tmp_path / "feed"
    feed.mkdir()
    for p in range(1, 4):  # pages 0-2
        (feed / f"page_{p:03d}.xml").write_text(PAGE_TMPL.format(p=p))
    register_xml_feed(spark)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("xml_feed")
            .option("path", str(feed))
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    first = spark.read.parquet(out_dir)
    assert first.count() == 6  # 3 pages × 2 deviations
    assert first.select("page").distinct().count() == 3

    # two more pages land; restart resumes from the committed offset
    for p in range(4, 6):  # pages 3-4
        (feed / f"page_{p:03d}.xml").write_text(PAGE_TMPL.format(p=p))
    run_once()
    both = spark.read.parquet(out_dir)
    assert both.count() == 10  # +2 pages × 2 — pages 0-2 NOT re-read
    assert both.select("page").distinct().count() == 5
    # per-page row counts prove no duplicates from the restart
    assert (
        both.groupBy("page").count().filter("count <> 2").count() == 0
    )


def test_stream_reader_rate_limit_bounds_batches(spark, tmp_path):
    """maxPagesPerTrigger caps each micro-batch: a 6-page backfill with
    a 2-page cap needs 3 micro-batches, never one giant batch."""
    feed = tmp_path / "feed"
    feed.mkdir()
    for p in range(1, 7):
        (feed / f"page_{p:03d}.xml").write_text(PAGE_TMPL.format(p=p))
    register_xml_feed(spark)

    q = (
        spark.readStream.format("xml_feed")
        .option("path", str(feed))
        .option("maxPagesPerTrigger", "2")
        .load()
        .writeStream.format("memory")
        .queryName("feed_rate_limited")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = q.lastProgress["batchId"] + 1
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM feed_rate_limited")
    assert out.count() == 12
    assert n_batches >= 3


def test_landing_sink_two_phase_commit(spark, tmp_path):
    """Streaming sink with manifest-based commit: readers see exactly
    the committed micro-batches; stray task files without a manifest
    entry are invisible (torn/aborted batches can't leak)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trafik_etl_modular_spark.sources.landing_sink import (
        committed_files,
        read_committed,
        register_landing_sink,
    )

    register_landing_sink(spark)
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    out_dir = str(tmp_path / "landing")
    # two source files → two micro-batches (maxFilesPerTrigger=1)
    for i in range(2):
        pq.write_table(
            pa.table({"event_id": list(range(i * 10, i * 10 + 10))}),
            str(src_dir / f"part{i}.parquet"),
        )

    q = (
        spark.readStream.schema("event_id bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
        .writeStream.format("landing_zone")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()

    import os

    manifests = [f for f in os.listdir(out_dir) if f.endswith(".manifest")]
    assert len(manifests) == 2  # one atomic publish per micro-batch
    out = read_committed(spark, out_dir)
    assert sorted(r.event_id for r in out.collect()) == list(range(20))

    # a torn write (task file with no manifest entry) stays invisible
    pq.write_table(pa.table({"event_id": [999]}), os.path.join(out_dir, "task-orphan.parquet"))
    assert "task-orphan.parquet" not in committed_files(out_dir)
    assert read_committed(spark, out_dir).count() == 20

    # the manifest log is a version history: as-of batch 0 sees only
    # the first micro-batch (snapshot read / time travel). Which
    # source file became batch 0 is listing-order dependent — assert
    # the snapshot is exactly one whole micro-batch, not which one.
    v0 = read_committed(spark, out_dir, as_of_batch=0)
    got = sorted(r.event_id for r in v0.collect())
    assert got in (list(range(10)), list(range(10, 20)))


def test_export_training_shards_caps_and_roundtrips(spark, tmp_path):
    """JSONL shard export: every shard file holds at most the cap,
    the read-back content equals the input, and range ordering yields
    contiguous shards."""
    import glob
    import json as _json

    from trafik_etl_modular_spark.pipelines.sink import export_training_shards

    df = spark.range(250).select(
        F.col("id").alias("seq_id"), F.concat(F.lit("doc "), F.col("id")).alias("text")
    )
    path = str(tmp_path / "shards")
    stats = export_training_shards(df, path, max_records_per_file=40)
    assert stats["n_records"] == 250
    assert stats["n_shards"] >= 7  # ceil(250/40) at minimum

    seen = []
    for f in sorted(glob.glob(path + "/part-*")):
        with open(f) as fh:
            rows = [_json.loads(line) for line in fh if line.strip()]
        assert len(rows) <= 40
        seen.extend(r["seq_id"] for r in rows)
    assert sorted(seen) == list(range(250))


def test_export_training_shards_empty_input(spark, tmp_path):
    """An empty input (e.g. a fully-filtered curation run) must report
    0 shards / 0 records, not crash the read-back (advisor r3: zero
    part files made a schema-inferring spark.read.json throw)."""
    from trafik_etl_modular_spark.pipelines.sink import export_training_shards

    df = spark.range(10).filter("id < 0").select(F.col("id").alias("seq_id"))
    stats = export_training_shards(df, str(tmp_path / "empty_shards"))
    assert stats == {"n_shards": 0, "n_records": 0}


def test_export_training_shards_range_ordered(spark, tmp_path):
    """With order_col, shard files hold contiguous key ranges: the
    per-file id intervals must not overlap."""
    import glob
    import json as _json

    from trafik_etl_modular_spark.pipelines.sink import export_training_shards

    df = spark.range(300).select(F.col("id").alias("seq_id"))
    path = str(tmp_path / "ordered_shards")
    stats = export_training_shards(
        df, path, max_records_per_file=50, order_col="seq_id"
    )
    assert stats["n_records"] == 300
    intervals = []
    for f in glob.glob(path + "/part-*"):
        with open(f) as fh:
            ids = [_json.loads(line)["seq_id"] for line in fh if line.strip()]
        if ids:
            intervals.append((min(ids), max(ids)))
    intervals.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(intervals, intervals[1:]):
        assert a_hi < b_lo, intervals


def test_landing_zone_vacuum_retention(spark, tmp_path):
    """VACUUM keeps the newest N batches readable, removes superseded
    manifests + their now-unreferenced files, reclaims stale orphans,
    and spares young orphans (in-flight commit protection)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from trafik_etl_modular_spark.sources.landing_sink import (
        read_committed,
        register_landing_sink,
        vacuum_landing_zone,
    )

    register_landing_sink(spark)
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    out_dir = str(tmp_path / "landing")
    for i in range(3):
        pq.write_table(
            pa.table({"event_id": list(range(i * 10, i * 10 + 10))}),
            str(src_dir / f"part{i}.parquet"),
        )
    q = (
        spark.readStream.schema("event_id bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
        .writeStream.format("landing_zone")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()

    # plant one STALE orphan (no manifest references it) and one
    # YOUNG orphan (inside the grace period)
    stale = os.path.join(out_dir, "task-deadbeef.parquet")
    young = os.path.join(out_dir, "task-cafebabe.parquet")
    for p in (stale, young):
        pq.write_table(pa.table({"event_id": [999]}), p)
    os.utime(stale, (time.time() - 7200, time.time() - 7200))

    stats = vacuum_landing_zone(out_dir, keep_batches=1, orphan_grace_s=3600)
    assert stats["removed_manifests"] == 2
    assert stats["removed_files"] == 2          # batches 0 and 1, one file each
    assert stats["removed_orphans"] == 1        # stale only
    assert stats["kept_batches"] == 1
    assert os.path.exists(young) and not os.path.exists(stale)

    # latest batch still reads; retained window holds exactly ONE
    # batch's decade of rows (source-file batch order is mtime-based
    # and not deterministic across runs)
    got = sorted(r["event_id"] for r in read_committed(spark, out_dir).collect())
    assert len(got) == 10 and got == list(range(got[0], got[0] + 10))


def test_sentinel_stream_dir_invalidates_on_fixture_change(tmp_path):
    """The sentinel stream dir is cached on disk; its key must
    identify the fixture CONTENT, not just the path (advisor r3: a
    regenerated fixture at the same path with later timestamps reused
    a stale sentinel whose ts no longer advanced the watermark past
    the new data)."""
    import os
    import time
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    from trafik_etl_modular_spark.streaming.pipeline import _sentinel_stream_dir

    sf_dir = str(tmp_path)
    src = os.path.join(sf_dir, "events.parquet")

    def write_fixture(base_ts):
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2], type=pa.int64()),
                "ts": pa.array(
                    [base_ts, base_ts + timedelta(minutes=5)],
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array([10, 20], type=pa.int64()),
                "event_type": pa.array(["click", "purchase"]),
                "value": pa.array([1.0, 2.0]),
                "props": pa.array(["", ""]),
            }
        )
        pq.write_table(tbl, src)

    write_fixture(datetime(2024, 1, 1))
    d1 = _sentinel_stream_dir(sf_dir)
    sent1 = pq.read_table(os.path.join(d1, "zz_sentinel.parquet"))
    ts1 = max(sent1["ts"].to_pylist())

    # regenerate the fixture at the SAME path with LATER timestamps
    # (force a different mtime even on coarse-granularity filesystems)
    write_fixture(datetime(2030, 6, 1))
    os.utime(src, (time.time() + 5, time.time() + 5))
    d2 = _sentinel_stream_dir(sf_dir)
    sent2 = pq.read_table(os.path.join(d2, "zz_sentinel.parquet"))
    ts2 = max(sent2["ts"].to_pylist())

    assert d2 != d1, "regenerated fixture must get a fresh sentinel dir"
    assert ts2 > datetime(2030, 6, 1), "sentinel must advance past the NEW max ts"
    assert ts1 < datetime(2025, 1, 1)


def test_iter_listing_bounded_pages(tmp_path):
    """The landing zone's listing iterator: lexicographic order,
    complete coverage, and bounded pages (the object-store
    ListObjectsV2 contract) — including deletion of already-yielded
    names mid-iteration, which vacuum relies on."""
    import os

    from trafik_etl_modular_spark.sources.landing_sink import iter_listing

    d = str(tmp_path)
    names = [f"task-{i:04d}.parquet" for i in range(57)]
    for n in names:
        open(os.path.join(d, n), "w").close()
    open(os.path.join(d, "_batch_0000000001.manifest"), "w").close()

    got = list(iter_listing(d, suffix=".parquet", prefix="task-", page_size=10))
    assert got == names  # sorted, complete, manifest excluded

    # deleting yielded names while paginating must not skip anything
    seen = []
    for n in iter_listing(d, suffix=".parquet", prefix="task-", page_size=7):
        seen.append(n)
        os.remove(os.path.join(d, n))
    assert seen == names
