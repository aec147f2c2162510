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


def test_stream_near_dedup_admits_only_novel(spark, sf_dir, tmp_path):
    """Streaming near-dup admission (foreachBatch over the persistent
    MinHash index): micro-batch 2's near-copies of batch-1 docs are
    rejected; novel docs admitted; the index is shared with the batch
    pipeline's admission history."""
    import pyspark.sql.functions as F

    from crawl_streams_spark.streaming.dedup import stream_near_dedup
    from crawl_streams_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = tmp_path / "in"
    src.mkdir()
    b1 = docs.filter(F.col("doc_id") < 40)
    b1.coalesce(1).write.mode("overwrite").parquet(str(src / "b0.parquet"))
    near = (
        b1.limit(10)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
    )
    fresh = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 60))
    near.unionByName(fresh).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b1.parquet")
    )

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*.parquet"))
    )
    out, idx, ckpt = (
        str(tmp_path / "out"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )
    q = stream_near_dedup(
        stream, out, idx, ckpt, threshold=0.7, available_now=True
    )
    q.awaitTermination(180)

    admitted = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    planted_admitted = [d for d in admitted if d >= 100000]
    assert len(planted_admitted) <= 2, planted_admitted
    assert len([d for d in admitted if 40 <= d < 60]) >= 18
    assert len([d for d in admitted if d < 40]) >= 35

    # the index doubles as the BATCH pipeline's admission history
    from crawl_streams_spark.operators.dedup import incremental_minhash_dedup

    replay = incremental_minhash_dedup(spark, b1, idx, threshold=0.7)
    assert replay.count() == 0
