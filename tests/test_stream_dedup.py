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
    q.awaitTermination(600)
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
    q.awaitTermination(600)

    admitted = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    planted_admitted = [d for d in admitted if d >= 100000]
    assert len(planted_admitted) <= 2, planted_admitted
    assert len([d for d in admitted if 40 <= d < 60]) >= 18
    assert len([d for d in admitted if d < 40]) >= 35

    # the index doubles as the BATCH pipeline's admission history
    from crawl_streams_spark.operators.dedup import incremental_minhash_dedup

    replay = incremental_minhash_dedup(spark, b1, idx, threshold=0.7)
    assert replay.count() == 0


def test_minhash_crash_between_index_and_output_write(spark, tmp_path):
    """VERDICT r6 item 3, dedup family: the batch_id-stamped index makes
    the two-phase gap safe BY CONSTRUCTION — a crash after the index
    write but before the output write replays to the identical admitted
    set (the anti-join ignores rows stamped with the current batch id,
    and dynamic overwrite rewrites this batch's partitions in place).
    Neither loses nor doubles."""
    import pyspark.sql.functions as F

    from crawl_streams_spark.operators.dedup import incremental_minhash_dedup

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def distinct_text(i):
        return " ".join(f"tok{i}x{j}" for j in range(30))

    b0 = docs([(i, distinct_text(i)) for i in range(8)])
    # batch 1: 4 novel docs + 2 exact copies of batch-0 docs
    b1 = docs(
        [(100 + i, distinct_text(50 + i)) for i in range(4)]
        + [(200, distinct_text(0)), (201, distinct_text(1))]
    )

    def run(batch, batch_id, write_output=True):
        admitted = incremental_minhash_dedup(
            spark, batch, idx, content="text", key="doc_id",
            threshold=0.8, batch_id=batch_id,
        )
        if write_output:
            admitted.withColumn("batch_id", F.lit(str(batch_id))).write.partitionBy(
                "batch_id"
            ).option("partitionOverwriteMode", "dynamic").mode(
                "overwrite"
            ).parquet(out)
        else:
            admitted.count()  # index write already happened inside

    run(b0, 0)
    # CRASH INJECTION: batch 1's index write lands, the output write does
    # not (incremental_minhash_dedup writes the index internally; skipping
    # the output write IS the two-phase gap)
    run(b1, 1, write_output=False)
    index_rows_after_crash = (
        spark.read.parquet(idx).filter(F.col("batch_id") == "1").count()
    )
    assert index_rows_after_crash > 0  # phase 1 is durable
    # restart: the stream replays batch 1 end to end
    run(b1, 1)

    got = sorted(
        r[0] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    # all 8 from batch 0 plus batch 1's 4 novel docs; 200/201 rejected
    assert got == list(range(8)) + [100, 101, 102, 103]
    # the index holds each batch-1 admitted key exactly once per band —
    # no doubled rows from the replay
    per_key_band = (
        spark.read.parquet(idx)
        .filter(F.col("batch_id") == "1")
        .groupBy("doc_id", "band")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert per_key_band == 0


def test_exact_dedup_crash_between_index_and_output_write(spark, tmp_path):
    """Same two-phase-gap injection for the exact digest index."""
    import pyspark.sql.functions as F

    from crawl_streams_spark.operators.dedup import incremental_exact_dedup

    idx = str(tmp_path / "eidx")
    out = str(tmp_path / "eout")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    b0 = docs([(i, f"body {i}") for i in range(6)])
    b1 = docs([(10, "body new A"), (11, "body 0"), (12, "body new B")])

    def run(batch, batch_id, write_output=True):
        admitted = incremental_exact_dedup(
            spark, batch, idx, content="text", key="doc_id",
            batch_id=batch_id,
        )
        if write_output:
            admitted.withColumn("batch_id", F.lit(str(batch_id))).write.partitionBy(
                "batch_id"
            ).option("partitionOverwriteMode", "dynamic").mode(
                "overwrite"
            ).parquet(out)
        else:
            admitted.count()

    run(b0, 0)
    run(b1, 1, write_output=False)  # the gap: index written, output not
    run(b1, 1)  # replay
    got = sorted(
        r[0] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert got == [0, 1, 2, 3, 4, 5, 10, 12]  # 11 = dup of "body 0"
    # index: one row per admitted batch-1 digest, not two
    dup_digests = (
        spark.read.parquet(idx)
        .filter(F.col("batch_id") == "1")
        .groupBy("__digest")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup_digests == 0
