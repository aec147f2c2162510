"""Multimodal column plumbing (north-star extension): image/audio/video as
opaque ``binary`` payloads + typed metadata, with decode / feature-extract
/ resize / frame-sample stages as Arrow-batched pandas functions over
``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are STUBS
behind ``_HAVE_CODECS`` — deterministic fakes with the real Spark-side
contract (schema, batch iteration, partitioning) — plus one honest
``NotImplementedError`` path. Everything around the stub (schemas, Arrow
batch shapes, the mapInPandas plumbing, partition sizing) is real and
tested (tests/test_multimodal.py).

Scale notes: media blobs dominate row width — keep
``spark.sql.files.maxPartitionBytes`` low enough that a partition of blobs
fits executor memory, and never groupBy a blob column (metadata keys only).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # codecs are not installed in this environment — keep the gate honest
    import PIL.Image  # noqa: F401

    _HAVE_CODECS = True
except Exception:  # pragma: no cover
    _HAVE_CODECS = False

#: A media row: opaque payload + typed metadata (FIXTURES-style contract).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("mime", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("payload_sha1", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads so the media
    pipeline is exercisable on the driver tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit("image/x-fake").alias("mime"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real image decode: dimensions and an
    8-dim feature vector derived from the payload digest. Replaced wholesale
    by the codec path when _HAVE_CODECS."""
    digest = hashlib.sha1(payload).digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    feats = [round(b / 255.0, 6) for b in digest[2:10]]
    return width, height, feats


def decode_media(df: DataFrame, batch_hint: int = 64) -> DataFrame:
    """Decode stage over mapInPandas: Arrow batches in, Arrow batches out,
    schema fixed by DECODED_SCHEMA. With codecs installed this is where
    PIL/ffmpeg run; without, the deterministic fake keeps the distributed
    plumbing (batching, schema, null payloads) fully testable."""

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [],
                "payload_sha1": [],
                "width": [],
                "height": [],
                "features": [],
            }
            for payload in pdf["payload"]:
                if payload is None:
                    out["n_bytes"].append(None)
                    out["payload_sha1"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["features"].append(None)
                    continue
                data = bytes(payload)
                if _HAVE_CODECS:  # pragma: no cover — no codecs in container
                    raise NotImplementedError(
                        "real codec decode not wired in this environment"
                    )
                w, h, feats = _fake_decode(data)
                out["n_bytes"].append(len(data))
                out["payload_sha1"].append(hashlib.sha1(data).hexdigest())
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def media_summary(decoded: DataFrame) -> DataFrame:
    """Post-decode rollup: per media_type byte/dimension stats — plain
    grouped aggregation on the metadata (never on payloads)."""
    return decoded.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("width"), 4).alias("avg_width"),
        F.round(F.avg("height"), 4).alias("avg_height"),
        F.countDistinct("payload_sha1").alias("n_distinct_payloads"),
    )
