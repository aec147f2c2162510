"""End-to-end archive pipeline: a WARC file of mixed captures (HTML
text, BMP image, WAV audio, FLAC audio) read through the warc source,
payloads routed by content type into the REAL decode families, and text
captures scored by the curation functions — the 'crawl archive in,
curated features out' composition every piece of this engine exists
for."""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F

from crawl_streams_spark.operators.bmp import pattern_bmp
from crawl_streams_spark.operators.flac import encode_flac
from crawl_streams_spark.operators.multimodal import (
    decode_bmp_features,
    decode_flac_features,
    decode_wav,
    wav_bytes,
)
from crawl_streams_spark.sources.warc import (
    register_warc_source,
    warc_record_bytes,
)


def _http(body: bytes, ctype: str) -> bytes:
    return (
        b"HTTP/1.1 200\r\nContent-Type: " + ctype.encode() + b"\r\n\r\n"
        + body
    )


def _strip_http(col):
    """Payload after the first CRLFCRLF — the HTTP body."""
    return F.expr(
        f"substring({col}, instr(string({col}), '\r\n\r\n') + 4, "
        f"length({col}))"
    )


def test_archive_to_features_pipeline(spark, tmp_path):
    d = str(tmp_path / "archive")
    os.makedirs(d)
    html = b"<html><body>hello world this is a page</body></html>"
    bmp = pattern_bmp(3, 16, 8, bits=24)
    wav = wav_bytes(np.arange(-500, 500, dtype=np.int16))
    flac = encode_flac(np.arange(300) % 128, order=2, rice_param=4)
    recs = b"".join(
        warc_record_bytes(
            "response", _http(body, ctype),
            target_uri=f"https://site.example/{name}",
            content_type="application/http; msgtype=response",
        )
        for name, body, ctype in [
            ("page.html", html, "text/html"),
            ("img.bmp", bmp, "image/bmp"),
            ("clip.wav", wav, "audio/wav"),
            ("clip.flac", flac, "audio/flac"),
        ]
    )
    with open(os.path.join(d, "crawl.warc"), "wb") as f:
        f.write(recs)

    register_warc_source(spark)
    captures = (
        spark.read.format("warc")
        .load(d)
        .filter(F.col("http_status") == 200)
        .select(
            F.monotonically_increasing_id().alias("media_id"),
            "target_uri",
            _strip_http("payload").cast("binary").alias("body"),
        )
        .cache()
    )
    assert captures.count() == 4

    # route by suffix (a real pipeline routes on sniffed magic/MIME)
    def route(suffix):
        return captures.filter(
            F.col("target_uri").endswith(suffix)
        ).select("media_id", F.col("body").alias("payload"))

    bmp_feats = decode_bmp_features(route(".bmp")).collect()
    assert len(bmp_feats) == 1 and bmp_feats[0]["error"] is None
    assert (bmp_feats[0]["width"], bmp_feats[0]["height"]) == (16, 8)

    wav_feats = decode_wav(route(".wav")).collect()
    assert len(wav_feats) == 1 and wav_feats[0]["error"] is None
    assert wav_feats[0]["n_samples"] == 1000

    flac_feats = decode_flac_features(route(".flac")).collect()
    assert len(flac_feats) == 1 and flac_feats[0]["error"] is None
    assert flac_feats[0]["n_samples"] == 300

    # text captures through the curation scorers
    from crawl_streams_spark.functions import text as T

    txt = (
        route(".html")
        .select(F.col("payload").cast("string").alias("text"))
        .select(
            T.token_count("text").alias("n_tokens"),
            T.quality_score("text").alias("quality"),
        )
        .collect()
    )
    assert txt[0]["n_tokens"] >= 6
    assert txt[0]["quality"] is not None


def test_streaming_archive_to_features_pipeline(spark, tmp_path):
    """The 'crawl archive in, curated features out' composition UNDER
    STRUCTURED STREAMING: a directory watch ingests WARC archives as
    they land, TIFF captures route through the Arrow-batched decode
    stage (mapInPandas on a streaming DataFrame), and features land in
    a parquet sink — exactly once across a restart that adds a second
    archive."""
    from crawl_streams_spark.operators.multimodal import (
        decode_tiff_features,
    )
    from crawl_streams_spark.operators.tiff import pattern_tiff

    d = str(tmp_path / "s_archive")
    out = str(tmp_path / "s_feats")
    ck = str(tmp_path / "s_ck")
    os.makedirs(d)
    register_warc_source(spark)

    def write_archive(name, media_ids):
        recs = b"".join(
            warc_record_bytes(
                "response",
                _http(pattern_tiff(mid, 9, 6), "image/tiff"),
                target_uri=f"https://site.example/{mid}.tiff",
            )
            for mid in media_ids
        )
        with open(os.path.join(d, name), "wb") as f:
            f.write(recs)

    def run():
        captures = (
            spark.readStream.format("warc")
            .load(d)
            .filter(F.col("http_status") == 200)
            .select(
                # id recovered from the URI so restarts are deterministic
                F.regexp_extract("target_uri", r"/(\d+)\.tiff$", 1)
                .cast("bigint")
                .alias("media_id"),
                _strip_http("payload").cast("binary").alias("payload"),
            )
        )
        q = (
            decode_tiff_features(captures)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        q.stop()

    write_archive("batch1.warc", [1, 2, 3])
    run()
    got = {r["media_id"]: r for r in spark.read.parquet(out).collect()}
    assert sorted(got) == [1, 2, 3]
    assert all(r["error"] is None for r in got.values())
    y = np.arange(6)[:, None]
    x = np.arange(9)[None, :]
    v = (2 * 31 + y * 7 + np.where(y % 2 == 1, x * 13, 0)) % 256
    assert got[2]["sum_rgb"] == 3 * int(v.sum())

    write_archive("batch2.warc", [7])
    run()
    got = {r["media_id"]: r for r in spark.read.parquet(out).collect()}
    assert sorted(got) == [1, 2, 3, 7]  # no re-decodes, no dups


def test_archive_to_txtable_to_cdc_pipeline(spark, tmp_path):
    """The full transactional platform loop, all layers exactly-once
    across restarts: WARC archives land in a watched directory; a
    streaming decode folds TIFF features into a TxTable through the
    token-stamped transactional sink; a SECOND, independent stream
    consumes the table's commit log as CDC (sources/txtable.py) and
    sees each feature row exactly once. The media ids are chosen so
    each micro-batch merges into fresh buckets (pure-add commits) —
    the strict CDC mode's contract; a consumer of a bucket-REWRITING
    fold would run ignore_changes + key-dedup instead (pinned in
    tests/test_txtable_source.py)."""
    from crawl_streams_spark.operators.multimodal import (
        decode_tiff_features,
    )
    from crawl_streams_spark.operators.tiff import pattern_tiff
    from crawl_streams_spark.operators.txlog import TxTable
    from crawl_streams_spark.streaming.txsink import (
        ensure_tx_snapshot,
        read_tx_snapshot,
        tx_fold_writer,
    )
    from crawl_streams_spark.sources.txtable import stream_table_changes

    d = str(tmp_path / "tx_archive")
    tbl = str(tmp_path / "tx_features")
    ck_in = str(tmp_path / "tx_ck_in")
    ck_out = str(tmp_path / "tx_ck_out")
    os.makedirs(d)
    register_warc_source(spark)

    def write_archive(name, media_ids):
        recs = b"".join(
            warc_record_bytes(
                "response",
                _http(pattern_tiff(mid, 9, 6), "image/tiff"),
                target_uri=f"https://site.example/{mid}.tiff",
            )
            for mid in media_ids
        )
        with open(os.path.join(d, name), "wb") as f:
            f.write(recs)

    table = ensure_tx_snapshot(
        spark, tbl, "media_id bigint, sum_rgb bigint", "media_id",
        n_buckets=4,
    )

    def run_ingest():
        captures = (
            spark.readStream.format("warc")
            .load(d)
            .filter(F.col("http_status") == 200)
            .select(
                F.regexp_extract("target_uri", r"/(\d+)\.tiff$", 1)
                .cast("bigint")
                .alias("media_id"),
                _strip_http("payload").cast("binary").alias("payload"),
            )
        )
        feats = decode_tiff_features(captures).select(
            "media_id", F.col("sum_rgb").cast("bigint").alias("sum_rgb")
        )
        q = tx_fold_writer(
            feats, ck_in, "tiff_features", table, "media_id",
            n_buckets=4, available_now=True,
        )
        q.awaitTermination(600)
        q.stop()

    downstream: list = []

    def run_cdc():
        q = (
            stream_table_changes(spark, tbl)
            .writeStream.foreachBatch(
                lambda b, _i: downstream.extend(
                    (r["media_id"], r["sum_rgb"]) for r in b.collect()
                )
            )
            .option("checkpointLocation", ck_out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        q.stop()

    # batch 1: ids 1,2,3 -> xxhash64 buckets 2,3,3 (empty table:
    # pure-add merge)
    write_archive("batch1.warc", [1, 2, 3])
    run_ingest()
    run_cdc()
    assert sorted(m for m, _s in downstream) == [1, 2, 3]
    y = np.arange(6)[:, None]
    x = np.arange(9)[None, :]
    v = (2 * 31 + y * 7 + np.where(y % 2 == 1, x * 13, 0)) % 256
    assert dict(downstream)[2] == 3 * int(v.sum())

    # mid-stream compaction (VERDICT r10 item 2): its commit carries
    # dataChange:false, so the live CDC consumer below must neither
    # fail nor re-see rows 1-3
    assert TxTable(spark, tbl).compact(min_files=1) >= 1

    # restart every layer; batch 2: id 8 -> xxhash64 bucket 1 (fresh
    # again — untouched by batch 1's {2, 3})
    write_archive("batch2.warc", [8])
    run_ingest()
    downstream.clear()
    run_cdc()  # same checkpoint: only the NEW commit arrives
    assert sorted(m for m, _s in downstream) == [8]

    # the table itself agrees with everything the CDC stream delivered
    snap = {
        r["media_id"]: r["sum_rgb"]
        for r in read_tx_snapshot(TxTable(spark, tbl)).collect()
    }
    assert sorted(snap) == [1, 2, 3, 8]
