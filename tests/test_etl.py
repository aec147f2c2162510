"""Warehouse ETL (operators/etl.py): typed projection, date-partitioned
clustered layout, batch/streaming equivalence, CLI front door."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from crawl_streams_spark.cli import main
from crawl_streams_spark.operators.etl import (
    stream_warehouse,
    warehouse_rows,
    write_warehouse,
)
from crawl_streams_spark.sources.jsonl import read_crawl_log, stream_crawl_log

from .fixtures import crawl_log_path

pytestmark = pytest.mark.skipif(
    crawl_log_path() is None, reason="reference sample not available"
)


def test_warehouse_rows_typed(spark):
    df = warehouse_rows(read_crawl_log(spark, crawl_log_path()))
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema["log_timestamp"] == "timestamp"
    assert schema["event_date"] == "date"
    assert schema["annotations"].startswith("array")
    rows = df.collect()
    assert len(rows) == 1000  # nothing dropped: all fixture timestamps parse
    assert all(r["host"] for r in rows if r["url"].startswith("http"))
    crawlers = {r["crawler"] for r in rows}
    assert crawlers == {"Heritrix", "WebRender"}


def test_write_warehouse_layout(spark, tmp_path):
    out = str(tmp_path / "wh")
    write_warehouse(read_crawl_log(spark, crawl_log_path()), out)
    dirs = [d for d in os.listdir(out) if d.startswith("event_date=")]
    assert dirs, "expected date partition directories"
    back = spark.read.parquet(out)
    assert back.count() == 1000
    # partition pruning works: one date's scan reads a subset
    one = back.filter(back.event_date == sorted(dirs)[0].split("=")[1])
    assert 0 < one.count() <= 1000


def test_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(crawl_log_path(), src / "b0.json")
    batch_out = str(tmp_path / "batch")
    stream_out = str(tmp_path / "stream")
    write_warehouse(read_crawl_log(spark, str(src)), batch_out)
    q = stream_warehouse(
        stream_crawl_log(spark, str(src)),
        stream_out,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(600)
    a = spark.read.parquet(batch_out)
    b = spark.read.parquet(stream_out)
    key = ["log_timestamp", "url"]
    assert a.count() == b.count()
    assert a.select(*key).subtract(b.select(*key)).count() == 0


def test_etl_cli(capsys, spark, tmp_path):
    out = str(tmp_path / "wh")
    assert main(["etl", "--input", crawl_log_path(), "--output", out]) == 0
    assert "wrote 1000 rows" in capsys.readouterr().out


def test_warehouse_canon_url(spark):
    """The warehouse carries the canonical URL column: fragments, scheme /
    authority case, default ports and query order are normalized away."""
    from .fixtures import crawl_log_path

    df = warehouse_rows(read_crawl_log(spark, crawl_log_path()))
    rows = df.select("url", "canon_url").filter(
        F.col("url").rlike("(?i)^https?://")
    ).collect()
    assert rows
    for r in rows:
        assert "#" not in r["canon_url"]
        scheme_auth = r["canon_url"].split("/", 3)[2]
        assert scheme_auth == scheme_auth.lower()
