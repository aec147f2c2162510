"""Exact W-1/W-2 state semantics (applyInPandasWithState) — verified
against a pure-Python rerun of the reference's deque/LimitedSizeDict logic
over the same input order."""

from __future__ import annotations

import json
from collections import Counter, deque

import pyspark.sql.functions as F
import pytest

from crawl_streams_spark.functions.crawl import host_of, status_str
from crawl_streams_spark.schemas import CRAWL_LOG_SCHEMA
from crawl_streams_spark.streaming.stateful import (
    host_stats_lru,
    recent_status_counts,
)

from .fixtures import crawl_log_path

pytestmark = pytest.mark.skipif(
    crawl_log_path() is None, reason="reference sample not available"
)


@pytest.fixture(scope="module")
def raw_records():
    with open(crawl_log_path()) as f:
        return [json.loads(line) for line in f if line.strip()]


def _stream(spark, tmp_path, with_cols):
    d = tmp_path / "in"
    d.mkdir()
    import shutil

    shutil.copy(crawl_log_path(), d / "b0.json")
    s = spark.readStream.schema(CRAWL_LOG_SCHEMA).json(str(d))
    return with_cols(s)


def _run(df, tmp_path, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)


def test_recent_status_counts_exact(spark, tmp_path, raw_records):
    n = 300  # smaller than the file so eviction actually happens
    df = _stream(
        spark,
        tmp_path,
        lambda s: s.withColumn("seq", F.col("timestamp")).withColumn(
            "status", status_str(F.col("status_code"))
        ),
    )
    _run(recent_status_counts(df, n=n), tmp_path, "recent")
    got = {
        r["status"]: r["n"]
        for r in spark.sql("SELECT * FROM recent").collect()
    }
    # reference logic: deque(maxlen=n) over arrival order
    ordered = sorted(raw_records, key=lambda r: r["timestamp"])  # stable
    buf = deque((str(r.get("status_code", "-")) for r in ordered), maxlen=n)
    want = dict(Counter(buf))
    assert got == want


def test_host_stats_lru_exact(spark, tmp_path, raw_records):
    cap = 10  # far below the ~40 distinct hosts → forces FIFO eviction
    df = _stream(
        spark,
        tmp_path,
        lambda s: s.withColumn("seq", F.col("timestamp")).withColumn(
            "host", host_of(F.col("url"))
        ),
    )
    _run(host_stats_lru(df, max_hosts=cap), tmp_path, "lru")
    got = {
        r["host"]: (r["total"], r["first_timestamp"], r["last_timestamp"])
        for r in spark.sql("SELECT * FROM lru").collect()
    }

    # reference logic rerun: LimitedSizeDict — FIFO by first insertion,
    # updates don't refresh position (analysis.py:18-31)
    def ref_host(url):
        if url is None:
            return None
        if url.startswith("dns:"):
            return url[4:]
        from urllib.parse import urlsplit

        if url.startswith(("http://", "https://")):
            return urlsplit(url).hostname
        return None  # parse_url yields null for screenshot:/imagemap:/…

    hosts: dict = {}
    for rec in sorted(raw_records, key=lambda r: r["timestamp"]):  # stable
        h = ref_host(rec.get("url"))
        ts = rec["timestamp"]
        if h in hosts:
            st = hosts[h]
            st["total"] += 1
            st["last"] = ts
        else:
            hosts[h] = {"total": 1, "first": ts, "last": ts}
            while len(hosts) > cap:
                hosts.pop(next(iter(hosts)))
    want = {
        h: (v["total"], v["first"], v["last"]) for h, v in hosts.items()
    }
    assert len(got) == cap
    assert got == want


def test_lru_state_survives_restart(spark, tmp_path, raw_records):
    """Second availableNow run over a NEW file continues from checkpointed
    state (totals double for surviving hosts)."""
    import shutil

    df = _stream(
        spark,
        tmp_path,
        lambda s: s.withColumn("seq", F.col("timestamp")).withColumn(
            "host", host_of(F.col("url"))
        ),
    )
    out = host_stats_lru(df, max_hosts=1000)
    _run(out, tmp_path, "lru2")
    first = {
        r["host"]: r["total"] for r in spark.sql("SELECT * FROM lru2").collect()
    }
    shutil.copy(crawl_log_path(), tmp_path / "in" / "b1.json")
    _run(out, tmp_path, "lru2b")
    second = {
        r["host"]: r["total"]
        for r in spark.sql("SELECT * FROM lru2b").collect()
    }
    for h, n in first.items():
        assert second[h] == 2 * n, h


def test_stateful_with_rocksdb_state_store(spark, tmp_path, raw_records):
    """The 100 TB state backend (SCALING.md): the same stateful op runs on
    the RocksDB state store provider and produces identical results."""
    import shutil

    import pyspark.sql.functions as F2

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        d = tmp_path / "in"
        d.mkdir()
        shutil.copy(crawl_log_path(), d / "b0.json")
        s = (
            spark.readStream.schema(CRAWL_LOG_SCHEMA)
            .json(str(d))
            .withColumn("seq", F2.col("timestamp"))
            .withColumn("status", status_str(F2.col("status_code")))
        )
        q = (
            recent_status_counts(s, n=300)
            .writeStream.format("memory")
            .queryName("rocks")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck_rocks"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        got = {
            r["status"]: r["n"]
            for r in spark.sql("SELECT * FROM rocks").collect()
        }
        ordered = sorted(raw_records, key=lambda r: r["timestamp"])
        buf = deque(
            (str(r.get("status_code", "-")) for r in ordered), maxlen=300
        )
        assert got == dict(Counter(buf))
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
