"""WARC source (sources/warc.py): strict ISO 28500 record parsing,
per-record-gzip streams, and the Spark 4 Python DataSource integration
(per-file partitions, typed schema, payload truncation flagging)."""

from __future__ import annotations

import gzip
import io
import os

import pytest

from crawl_streams_spark.sources.warc import (
    WarcError,
    iter_warc_records,
    register_warc_source,
    warc_record_bytes,
)

_HTTP = b"HTTP/1.1 404\r\nContent-Type: text/html\r\n\r\nmissing"


def _recs(data: bytes):
    return list(iter_warc_records(io.BufferedReader(io.BytesIO(data))))


def test_parser_roundtrip_multiple_records():
    data = warc_record_bytes(
        "response", _HTTP, target_uri="https://x.example/a",
        content_type="application/http; msgtype=response",
    ) + warc_record_bytes("metadata", b"note")
    got = _recs(data)
    assert len(got) == 2
    h1, p1 = got[0]
    assert h1["warc-type"] == "response"
    assert h1["warc-target-uri"] == "https://x.example/a"
    assert p1 == _HTTP
    assert got[1][0]["warc-type"] == "metadata"
    assert got[1][1] == b"note"


def test_parser_handles_binary_payload_with_crlfs():
    payload = b"\r\n\r\nWARC/1.0\r\n" + bytes(range(256))
    data = warc_record_bytes("resource", payload)
    (h, p), = _recs(data)
    assert p == payload  # Content-Length framing, not delimiter scanning


def test_parser_rejections_are_specific():
    good = warc_record_bytes("metadata", b"x")
    with pytest.raises(WarcError, match="version"):
        _recs(b"WARC/2.0\r\n" + good[10:])
    with pytest.raises(WarcError, match="truncated payload"):
        _recs(good[:-5])  # cut exactly the payload byte + separator
    with pytest.raises(WarcError, match="separator"):
        _recs(good[:-4] + b"XXXX")
    # missing Content-Length
    bad = good.replace(b"Content-Length: 1\r\n", b"")
    with pytest.raises(WarcError, match="Content-Length"):
        _recs(bad)
    with pytest.raises(WarcError, match="header line"):
        _recs(b"WARC/1.0\r\nnocolonhere\r\n\r\n")


def _write_fixture(d: str) -> None:
    rec_ok = warc_record_bytes(
        "response", _HTTP, target_uri="https://x.example/a",
        content_type="application/http; msgtype=response",
    )
    rec_req = warc_record_bytes(
        "request", b"GET /a HTTP/1.1\r\n\r\n",
        target_uri="https://x.example/a",
    )
    big = warc_record_bytes("resource", b"Z" * 4096)
    with open(os.path.join(d, "plain.warc"), "wb") as f:
        f.write(rec_ok + rec_req)
    with open(os.path.join(d, "members.warc.gz"), "wb") as f:
        f.write(gzip.compress(rec_ok))
        f.write(gzip.compress(big))


def test_spark_datasource_reads_plain_and_gzip(spark, tmp_path):
    d = str(tmp_path / "warcs")
    os.makedirs(d)
    _write_fixture(d)
    register_warc_source(spark)
    df = spark.read.format("warc").load(d)
    rows = df.collect()
    assert len(rows) == 4
    assert df.rdd.getNumPartitions() == 2  # one per file
    by_type = {}
    for r in rows:
        by_type.setdefault(r["warc_type"], []).append(r)
    assert len(by_type["response"]) == 2
    assert all(r["http_status"] == 404 for r in by_type["response"])
    assert by_type["request"][0]["http_status"] is None
    assert bytes(by_type["resource"][0]["payload"]) == b"Z" * 4096
    assert not any(r["payload_truncated"] for r in rows)


def test_spark_datasource_truncates_and_flags_oversized_payloads(
    spark, tmp_path
):
    d = str(tmp_path / "warcs2")
    os.makedirs(d)
    _write_fixture(d)
    register_warc_source(spark)
    df = (
        spark.read.format("warc")
        .option("max_payload_bytes", "100")
        .load(os.path.join(d, "members.warc.gz"))
    )
    rows = {r["warc_type"]: r for r in df.collect()}
    big = rows["resource"]
    assert big["payload_truncated"] is True
    assert len(bytes(big["payload"])) == 100
    assert big["content_length"] == 4096  # the DECLARED length survives
    assert rows["response"]["payload_truncated"] is False


def test_spark_datasource_bad_glob_fails_at_planning(spark):
    register_warc_source(spark)
    with pytest.raises(Exception, match="no WARC files match"):
        spark.read.format("warc").load("/nonexistent/*.warc").collect()


def test_spark_datasource_filters_and_aggregates(spark, tmp_path):
    """The source composes with ordinary DataFrame ops — the crawl-log
    shape (per-status counts over responses) straight off the archive."""
    import pyspark.sql.functions as F

    d = str(tmp_path / "warcs3")
    os.makedirs(d)
    _write_fixture(d)
    register_warc_source(spark)
    got = (
        spark.read.format("warc")
        .load(d)
        .filter(F.col("warc_type") == "response")
        .groupBy("http_status")
        .count()
        .collect()
    )
    assert [(r["http_status"], r["count"]) for r in got] == [(404, 2)]


def test_streaming_warc_source_picks_up_new_files_exactly_once(
    spark, tmp_path
):
    """Directory-watch streaming: run 1 ingests the initial file; a
    restart on the same checkpoint after a second file lands ingests
    ONLY the new file — records are never re-emitted (offset = the
    processed-file name set)."""
    d = str(tmp_path / "stream_warcs")
    out = str(tmp_path / "stream_out")
    ck = str(tmp_path / "stream_ck")
    os.makedirs(d)
    register_warc_source(spark)

    def run():
        q = (
            spark.readStream.format("warc")
            .load(d)
            .select("warc_type", "target_uri", "source_file")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    with open(os.path.join(d, "a.warc"), "wb") as f:
        f.write(warc_record_bytes("metadata", b"one"))
        f.write(warc_record_bytes("metadata", b"two"))
    run()
    assert spark.read.parquet(out).count() == 2

    # second file sorts BEFORE the first (name-based offsets must not
    # remap history) and arrives between runs
    with open(os.path.join(d, "0-late.warc"), "wb") as f:
        f.write(warc_record_bytes("resource", b"three"))
    run()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3  # no duplicates of file a's records
    assert sum(1 for r in rows if r["warc_type"] == "resource") == 1
