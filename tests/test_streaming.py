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
    q.awaitTermination(120)
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
    q.awaitTermination(120)
    first = json.load(open(snap))

    # restart with same checkpoint: no new input → no new snapshot batches
    q2 = run_analysis(src, snap, ckpt, available_now=True)
    q2.awaitTermination(120)
    second = json.load(open(snap))
    assert second == first  # nothing reprocessed

    # new file arrives → another batch lands, snapshot replaced atomically
    shutil.copy(crawl_log_path(), os.path.join(stream_dir, "batch1.json"))
    q3 = run_analysis(src, snap, ckpt, available_now=True)
    q3.awaitTermination(120)
    third = json.load(open(snap))
    assert third["batch_id"] > second["batch_id"]
