"""Native streaming session windows (streaming/analysis_job.py::
session_stats_stream): gap-merge semantics, exactly-once append
emission on finalization, and watermark-driven closure — pinned with a
file-source stream plus a far-future flush event that advances the
watermark past every real session."""

from __future__ import annotations

import datetime as dt
import time

import pyspark.sql.functions as F

from crawl_streams_spark.streaming.analysis_job import session_stats_stream

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(host, minutes):
    return (host, _T0 + dt.timedelta(minutes=minutes))


def test_streaming_session_windows_gap_merge(spark, tmp_path):
    # host A: events at 0,5,12 min (gaps < 10) → ONE session [0, 22)
    # host B: events at 0 and 40 min → TWO sessions
    real = [
        _mk("a.example", 0),
        _mk("a.example", 5),
        _mk("a.example", 12),
        _mk("b.example", 0),
        _mk("b.example", 40),
    ]
    flush = [_mk("zz.flush", 24 * 60)]  # advances the watermark
    schema = "host_d string, event_ts timestamp"
    src = str(tmp_path / "src")
    spark.createDataFrame(real, schema).coalesce(1).write.parquet(
        src, mode="append"
    )
    spark.createDataFrame(flush, schema).coalesce(1).write.parquet(
        src, mode="append"
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("event_ts", "1 minute")
    )
    out = str(tmp_path / "out")
    q = (
        session_stats_stream(stream, gap="10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    q.stop()
    for _ in range(100):
        if q not in spark.streams.active:
            break
        time.sleep(0.1)

    rows = {
        (r["host_d"], r["session_start"], r["n_events"])
        for r in spark.read.parquet(out)
        .filter(F.col("host_d") != "zz.flush")
        .collect()
    }
    mins = lambda m: _T0 + dt.timedelta(minutes=m)  # noqa: E731
    assert rows == {
        ("a.example", mins(0), 3),
        ("b.example", mins(0), 1),
        ("b.example", mins(40), 1),
    }
    # gap semantics: session end = last event + gap
    ends = {
        (r["host_d"], r["session_start"]): r["session_end"]
        for r in spark.read.parquet(out).collect()
    }
    assert ends[("a.example", mins(0))] == mins(22)
    assert ends[("b.example", mins(40))] == mins(50)


def test_session_log_sink_restart_never_duplicates(spark, tmp_path):
    """The durable session log (session_log_sink, native file sink):
    finalized sessions appended across a query RESTART on the same
    checkpoint are emitted exactly once — the sink's _spark_metadata
    transaction log is the replay protection, no overlay protocol
    needed for append-only facts."""
    from crawl_streams_spark.streaming.analysis_job import session_log_sink

    schema = "host_d string, event_ts timestamp"
    src = str(tmp_path / "log_src")
    out = str(tmp_path / "log_out")
    ck = str(tmp_path / "log_ck")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("event_ts", "1 minute")
        )
        q = session_log_sink(
            stream, out, ck, gap="10 minutes", available_now=True
        )
        q.awaitTermination(600)
        q.stop()

    # run 1: host a's session closes when the flush event advances the
    # watermark past it
    spark.createDataFrame(
        [_mk("a.example", 0), _mk("a.example", 5)], schema
    ).coalesce(1).write.parquet(src, mode="append")
    spark.createDataFrame(
        [_mk("flush.one", 120)], schema
    ).coalesce(1).write.parquet(src, mode="append")
    run()
    first = sorted(
        (r["host_d"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    )
    assert ("a.example", 2) in first

    # run 2 (restart, same checkpoint): new host + a later flush; the
    # previously-emitted sessions must appear exactly once in total
    spark.createDataFrame(
        [_mk("b.example", 200), _mk("b.example", 203)], schema
    ).coalesce(1).write.parquet(src, mode="append")
    spark.createDataFrame(
        [_mk("flush.two", 600)], schema
    ).coalesce(1).write.parquet(src, mode="append")
    run()
    rows = [
        (r["host_d"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    ]
    assert rows.count(("a.example", 2)) == 1, "restart duplicated a session"
    assert rows.count(("b.example", 2)) == 1
