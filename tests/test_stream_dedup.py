"""Streaming dedup (streaming/dedup.py): duplicate suppression within the
watermark window, with bounded state (W-6 generalized)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from crawl_streams_spark.streaming.dedup import dedup_stream

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("launch_ts", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def _write_batch(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_dedup_stream_suppresses_replays(spark, tmp_path):
    """Replayed launch messages (same url+launch_ts, the reference's
    idempotence key) collapse to one row even when the replay arrives in a
    later micro-batch within the watermark delay."""
    src = tmp_path / "in"
    src.mkdir()
    base = "2024-01-01T10:{m:02d}:00.000Z"
    _write_batch(
        src / "b0.jsonl",
        [
            {"url": "http://a/", "launch_ts": "20240101100000",
             "timestamp": base.format(m=0)},
            {"url": "http://a/", "launch_ts": "20240101100000",
             "timestamp": base.format(m=1)},  # in-batch dupe
            {"url": "http://b/", "launch_ts": "20240101100000",
             "timestamp": base.format(m=2)},
        ],
    )
    _write_batch(
        src / "b1.jsonl",
        [
            {"url": "http://a/", "launch_ts": "20240101100000",
             "timestamp": base.format(m=3)},  # cross-batch replay
            {"url": "http://a/", "launch_ts": "20240101110000",
             "timestamp": base.format(m=4)},  # new launch hour → kept
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    deduped = dedup_stream(
        stream, ["url", "launch_ts"], "timestamp", "30 minutes"
    )
    seen: list[tuple[str, str]] = []
    q = (
        deduped.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _id: seen.extend(
                (r["url"], r["launch_ts"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(seen) == [
        ("http://a/", "20240101100000"),
        ("http://a/", "20240101110000"),
        ("http://b/", "20240101100000"),
    ]
    assert len(seen) == len(set(seen))
