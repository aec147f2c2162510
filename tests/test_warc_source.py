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
    ONLY the new file — records are never re-emitted (offset =
    mtime watermark + in-window processed-name set)."""
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
        q.awaitTermination(600)
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


# ---------------------------------------------------------------------
# round 9: bounded streaming offsets + permissive quarantine mode
# ---------------------------------------------------------------------


def _stream_reader(path: str, **opts):
    from crawl_streams_spark.sources import warc as W

    options = {"path": path}
    options.update({k: str(v) for k, v in opts.items()})
    return W._WarcStreamReader(options)


def test_stream_offset_is_bounded_by_file_age_window(tmp_path):
    """A long watch must NOT serialize every name ever processed: files
    whose mtime has aged past max_file_age_sec purge from the offset,
    so offset size tracks the in-window count, not history."""
    import time

    d = str(tmp_path / "many")
    os.makedirs(d)
    now = time.time()
    # 40 aged files (mtimes 1000..1039s old) + 3 fresh ones
    for i in range(40):
        p = os.path.join(d, f"old{i:03d}.warc")
        with open(p, "wb") as f:
            f.write(warc_record_bytes("metadata", b"x"))
        os.utime(p, (now - 1000 - i, now - 1000 - i))
    for i in range(3):
        p = os.path.join(d, f"new{i}.warc")
        with open(p, "wb") as f:
            f.write(warc_record_bytes("metadata", b"y"))
        os.utime(p, (now, now))

    r = _stream_reader(d, max_file_age_sec=60)
    off = r.latestOffset()
    assert set(off) == {"wm", "recent"}
    assert abs(off["wm"] - now) < 5
    # only the fresh files survive the window — the 40 aged names are
    # NOT in the offset (bounded), matching FileStreamSource maxFileAge
    assert sorted(os.path.basename(p) for p in off["recent"]) == [
        "new0.warc", "new1.warc", "new2.warc",
    ]
    # and a fresh start processes exactly the in-window files
    parts = r.partitions(r.initialOffset(), off)
    assert sorted(os.path.basename(p.path) for p in parts) == [
        "new0.warc", "new1.warc", "new2.warc",
    ]


def test_stream_offset_horizon_never_readmits_purged_names(tmp_path):
    """A watermark that regressed across a restart (newest files
    deleted) must not re-admit a name that was processed and then
    purged: partitions filters on the START offset's horizon."""
    d = str(tmp_path / "regress")
    os.makedirs(d)
    r = _stream_reader(d, max_file_age_sec=60)
    start = {"wm": 10_000.0, "recent": {}}  # "old.warc" already purged
    end = {"wm": 10_000.0, "recent": {"old.warc": 9_000.0}}
    parts = r.partitions(start, end)
    assert [p.path for p in parts] == [""]  # sentinel only — ignored


def test_stream_offset_legacy_round8_checkpoint_still_works(tmp_path):
    """Checkpoints written by the round-8 full-name-list offset form
    deserialize and diff correctly against the new bounded form."""
    d = str(tmp_path / "legacy")
    os.makedirs(d)
    import time

    now = time.time()
    legacy = {"files": ["a.warc"]}
    end = {"wm": now, "recent": {"a.warc": now, "b.warc": now}}
    r = _stream_reader(d, max_file_age_sec=60)
    parts = r.partitions(legacy, end)
    assert [p.path for p in parts] == ["b.warc"]


def test_batch_permissive_mode_quarantines_corrupt_archive(
    spark, tmp_path
):
    """mode=permissive: records before the corruption stand; the
    corruption becomes one quarantine row (error set, source_file kept);
    other files in the same read are unaffected."""
    d = str(tmp_path / "mixed")
    os.makedirs(d)
    with open(os.path.join(d, "good.warc"), "wb") as f:
        f.write(warc_record_bytes("metadata", b"fine"))
    with open(os.path.join(d, "bad.warc"), "wb") as f:
        f.write(warc_record_bytes("metadata", b"first"))
        f.write(b"NOT A WARC RECORD\r\n")
    register_warc_source(spark)

    # failfast (default) still raises
    with pytest.raises(Exception, match="WarcError"):
        spark.read.format("warc").load(os.path.join(d, "bad.warc")).collect()

    df = (
        spark.read.format("warc")
        .option("mode", "permissive")
        .load(d)
    )
    rows = df.collect()
    ok = [r for r in rows if r["error"] is None]
    bad = [r for r in rows if r["error"] is not None]
    assert len(ok) == 2  # good.warc's record + bad.warc's leading record
    assert len(bad) == 1
    assert bad[0]["source_file"].endswith("bad.warc")
    assert "WarcError" in bad[0]["error"]
    assert bad[0]["warc_type"] is None and bad[0]["payload"] is None


def test_streaming_permissive_poison_file_does_not_kill_the_stream(
    spark, tmp_path
):
    """A corrupt archive landing in the watched directory yields a
    quarantine row and the stream keeps ingesting later files."""
    d = str(tmp_path / "poison_watch")
    out = str(tmp_path / "poison_out")
    ck = str(tmp_path / "poison_ck")
    os.makedirs(d)
    register_warc_source(spark)

    def run():
        q = (
            spark.readStream.format("warc")
            .option("mode", "permissive")
            .load(d)
            .select("warc_type", "source_file", "error")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        q.stop()

    with open(os.path.join(d, "poison.warc"), "wb") as f:
        f.write(b"GARBAGE BYTES THAT ARE NOT A WARC")
    run()
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0]["error"] is not None

    with open(os.path.join(d, "later.warc"), "wb") as f:
        f.write(warc_record_bytes("metadata", b"alive"))
    run()
    got = {r["warc_type"]: r for r in spark.read.parquet(out).collect()}
    assert got["metadata"]["error"] is None  # stream survived the poison
    assert len(got) == 2


def test_stream_reader_rejects_bad_mode_and_age(tmp_path):
    d = str(tmp_path / "opts")
    os.makedirs(d)
    with pytest.raises(WarcError, match="unknown mode"):
        _stream_reader(d, mode="lenient")
    with pytest.raises(WarcError, match="positive"):
        _stream_reader(d, max_file_age_sec=0)


def test_stream_fetch_cap_drains_backlog_across_triggers(tmp_path):
    """max_files_per_trigger: in a running watch (past the exempt
    fresh-process snapshot), a 9-file backlog drains oldest-first in
    bounded latestOffset steps; the watermark never outruns deferred
    files, so nothing is age-skipped mid-drain."""
    import time

    d = str(tmp_path / "backlog")
    os.makedirs(d)
    now = time.time()

    def add(name, age):
        p = os.path.join(d, name)
        with open(p, "wb") as f:
            f.write(warc_record_bytes("metadata", b"x"))
        os.utime(p, (now - age, now - age))

    add("seed.warc", 500)
    r = _stream_reader(d, max_files_per_trigger=4, max_file_age_sec=3600)
    start = r.initialOffset()
    end = r.latestOffset()  # fresh snapshot (exempt): just the seed
    assert [
        os.path.basename(p.path) for p in r.partitions(start, end)
    ] == ["seed.warc"]
    start = end

    for i in range(9):  # the backlog lands mid-watch
        add(f"f{i}.warc", 90 - i * 10)
    seen = []
    for expected in (4, 4, 1):
        end = r.latestOffset()
        parts = [p.path for p in r.partitions(start, end) if p.path]
        assert len(parts) == expected
        # oldest-first drain: each batch's files all older than the next
        seen.extend(sorted(parts))
        start = end
    assert [os.path.basename(p) for p in seen] == [
        f"f{i}.warc" for i in range(9)
    ]
    # drained: the next trigger is a quiet (sentinel-only) batch
    end = r.latestOffset()
    assert [p.path for p in r.partitions(start, end)] == [""]


def test_stream_fetch_cap_end_to_end_exactly_once(spark, tmp_path):
    """With the cap set, availableNow runs stay correct: the fresh
    snapshot is exempt (a capped fresh offer could stall forever on
    names the checkpoint already holds), so each run drains everything
    available, exactly once across restarts."""
    d = str(tmp_path / "cap_watch")
    out = str(tmp_path / "cap_out")
    ck = str(tmp_path / "cap_ck")
    os.makedirs(d)
    for i in range(5):
        with open(os.path.join(d, f"n{i}.warc"), "wb") as f:
            f.write(warc_record_bytes("metadata", f"rec{i}".encode()))
    register_warc_source(spark)

    def run():
        q = (
            spark.readStream.format("warc")
            .option("max_files_per_trigger", "2")
            .load(d)
            .select("source_file")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        q.stop()
        return sorted(
            os.path.basename(r["source_file"])
            for r in spark.read.parquet(out).collect()
        )

    assert run() == [f"n{i}.warc" for i in range(5)]
    with open(os.path.join(d, "n5.warc"), "wb") as f:
        f.write(warc_record_bytes("metadata", b"later"))
    assert run() == [f"n{i}.warc" for i in range(6)]  # no dups, no stall


def test_stream_fetch_cap_option_validation(tmp_path):
    d = str(tmp_path / "opts2")
    os.makedirs(d)
    with pytest.raises(WarcError, match=">= 0"):
        _stream_reader(d, max_files_per_trigger=-1)
