"""Multimodal plumbing: binary payload column + mapInPandas decode stage
(stubbed codecs, real Spark contract)."""

from __future__ import annotations

import hashlib

from crawl_streams_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    documents_as_media,
    media_summary,
)
from crawl_streams_spark.tables import load_table


def test_decode_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = documents_as_media(docs)
    decoded = decode_media(media)
    assert decoded.schema == DECODED_SCHEMA
    rows = {r["media_id"]: r for r in decoded.collect()}
    for d in docs.collect():
        r = rows[d["doc_id"]]
        payload = d["text"].encode("utf-8")
        assert r["n_bytes"] == len(payload)
        assert r["payload_sha1"] == hashlib.sha1(payload).hexdigest()
        assert 1 <= r["width"] <= 64 and 1 <= r["height"] <= 64
        assert len(r["features"]) == 8


def test_null_payload_passthrough(spark):
    import pyspark.sql.functions as F

    df = spark.range(3).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") == 1, F.lit(b"x")).alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit("image/x-fake").alias("mime"),
    )
    rows = {r["media_id"]: r for r in decode_media(df).collect()}
    assert rows[0]["n_bytes"] is None and rows[0]["features"] is None
    assert rows[1]["n_bytes"] == 1


def test_media_summary(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    s = media_summary(decode_media(documents_as_media(docs))).collect()
    assert len(s) == 1
    row = s[0]
    assert row["n_media"] == 100
    assert row["n_distinct_payloads"] == 100  # sample texts are unique
    assert row["total_bytes"] > 0
