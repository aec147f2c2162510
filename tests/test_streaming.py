"""Streaming semantics (SURVEY §5.3 item 4): file-source micro-batches with
availableNow drain, windowed per-host state, atomic snapshot sink, restart
from checkpoint."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from crawl_streams_spark.sources.jsonl import stream_crawl_log
from crawl_streams_spark.streaming.analysis_job import run_analysis

from .fixtures import crawl_log_path

pytestmark = pytest.mark.skipif(
    crawl_log_path() is None, reason="reference sample not available"
)


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    shutil.copy(crawl_log_path(), d / "batch0.json")
    return str(d)


def test_analysis_stream_snapshot(spark, stream_dir, tmp_path):
    snap = str(tmp_path / "snapshot.json")
    ckpt = str(tmp_path / "ckpt")
    q = run_analysis(
        stream_crawl_log(spark, stream_dir), snap, ckpt, available_now=True
    )
    q.awaitTermination(600)
    assert os.path.exists(snap)
    doc = json.load(open(snap))
    assert doc["hosts"], "snapshot should contain hosts"
    hosts = {h["host"]: h for h in doc["hosts"] if h.get("host")}
    # the busiest host in the fragment (quota-bound crawl of one site)
    assert max(h["total"] for h in doc["hosts"]) > 100
    assert all({"total", "first_timestamp", "last_timestamp"} <= set(h) for h in hosts.values())
    # no stray tmp files left behind by the atomic writer
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_stream_restart_idempotent(spark, stream_dir, tmp_path):
    """W-5: re-running with the same checkpoint reprocesses nothing and the
    snapshot remains valid; adding a new file and re-running picks up only
    the new data."""
    snap = str(tmp_path / "snap.json")
    ckpt = str(tmp_path / "ckpt")
    src = stream_crawl_log(spark, stream_dir)
    q = run_analysis(src, snap, ckpt, available_now=True)
    q.awaitTermination(600)
    first = json.load(open(snap))

    # restart with same checkpoint: no new input → no new snapshot batches
    q2 = run_analysis(src, snap, ckpt, available_now=True)
    q2.awaitTermination(600)
    second = json.load(open(snap))
    assert second == first  # nothing reprocessed

    # new file arrives → another batch lands, snapshot replaced atomically
    shutil.copy(crawl_log_path(), os.path.join(stream_dir, "batch1.json"))
    q3 = run_analysis(src, snap, ckpt, available_now=True)
    q3.awaitTermination(600)
    third = json.load(open(snap))
    assert third["batch_id"] > second["batch_id"]


def test_watermark_drops_late_data(spark, tmp_path):
    """W-3: the reference accepts arbitrarily late events (analysis.py:90);
    the engine's watermark drops them after the configured delay — this
    pins the documented divergence. A row 2 hours older than the watermark
    high-water-mark must not update the aggregate; a fresh row must."""
    import json as _json

    from crawl_streams_spark.schemas import CRAWL_LOG_SCHEMA
    from crawl_streams_spark.streaming.analysis_job import (
        host_stats_stream,
        parsed_events,
    )

    d = tmp_path / "in"
    d.mkdir()

    def write_batch(name, rows):
        with open(d / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    emitted: list = []

    def run(qname):
        # foreachBatch (not memory sink — memory can't RECOVER from a
        # checkpoint, and watermark state continuity is the point here)
        stream = spark.readStream.schema(CRAWL_LOG_SCHEMA).json(str(d))
        agg = host_stats_stream(
            parsed_events(stream, watermark="10 minutes"), window="1 hour"
        )
        batch_rows: list = []

        def sink(bdf, bid):
            batch_rows.extend(bdf.collect())

        q = (
            agg.writeStream.outputMode("append")  # emits only closed windows
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        emitted.clear()
        emitted.extend(batch_rows)

    # batch 0: events in hour 10; high water mark → 12:00 via a later event
    write_batch(
        "b0.json",
        [
            {"url": "https://h1.org/a", "timestamp": "2021-01-16T10:05:00.000Z"},
            {"url": "https://h1.org/b", "timestamp": "2021-01-16T10:20:00.000Z"},
            {"url": "https://h2.org/c", "timestamp": "2021-01-16T12:00:00.000Z"},
        ],
    )
    run("wm1")
    closed = {(r["host"], r["total"]) for r in emitted}
    # hour-10 window closed (watermark 11:50 > 11:00) and emitted with 2 rows
    assert ("h1.org", 2) in closed

    # batch 1: a LATE hour-10 event (watermark already at 11:50) + a fresh one
    write_batch(
        "b1.json",
        [
            {"url": "https://h1.org/late", "timestamp": "2021-01-16T10:40:00.000Z"},
            {"url": "https://h2.org/d", "timestamp": "2021-01-16T14:00:00.000Z"},
        ],
    )
    run("wm2")
    after = {(r["host"], r["total"]) for r in emitted}
    # the late row produced no new hour-10 output; the 12:00 window closed
    # (watermark moved to 13:50) with exactly its one on-time row
    assert ("h1.org", 3) not in after and ("h1.org", 1) not in after
    assert ("h2.org", 1) in after


def test_analysis_scaled_rollup(spark, stream_dir, tmp_path):
    """run_analysis_scaled: the fixture stream folds into a durable
    (hour x host x status) rollup whose totals match batch recomputation,
    and the snapshot is a top-k read of the rollup."""
    import pyspark.sql.functions as F

    from crawl_streams_spark.functions import crawl as C
    from crawl_streams_spark.sources.jsonl import read_crawl_log
    from crawl_streams_spark.streaming.analysis_job import (
        run_analysis_scaled,
        snapshot_from_rollup,
    )

    roll = str(tmp_path / "rollup")
    q = run_analysis_scaled(
        stream_crawl_log(spark, stream_dir),
        roll,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(600)

    batch = read_crawl_log(spark, stream_dir).filter(
        F.to_timestamp("timestamp").isNotNull()
    )
    want = {
        (r[0], r[1]): r[2]
        for r in batch.groupBy(
            C.host_of("url").alias("host"),
            C.status_str(F.col("status_code")).alias("status"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {
        (r[0], r[1]): r[2]
        for r in spark.read.parquet(roll)
        .groupBy("host", "status")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    }
    assert got == want

    snap = str(tmp_path / "snapshot.json")
    snapshot_from_rollup(spark, roll, snap, top_n=10)
    doc = json.load(open(snap))
    assert len(doc["hosts"]) <= 10
    totals = [h["total"] for h in doc["hosts"]]
    assert totals == sorted(totals, reverse=True)
    busiest_total = max(
        v for (h, s), v in want.items()
    )  # busiest (host,status) cell bounds below the busiest host
    assert doc["hosts"][0]["total"] >= busiest_total
