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


def _fake_decode_impl():
    """Factory for the deterministic decode stand-in (dimensions + an 8-dim
    feature vector from the payload digest). A factory so the returned
    closure cloudpickles by value into executor-side code."""
    import hashlib as _hashlib

    def fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
        digest = _hashlib.sha1(payload).digest()
        width = 1 + digest[0] % 64
        height = 1 + digest[1] % 64
        feats = [round(b / 255.0, 6) for b in digest[2:10]]
        return width, height, feats

    return fake_decode


def decode_media(df: DataFrame, batch_hint: int = 64) -> DataFrame:
    """Decode stage over mapInPandas: Arrow batches in, Arrow batches out,
    schema fixed by DECODED_SCHEMA. With codecs installed this is where
    PIL/ffmpeg run; without, the deterministic fake keeps the distributed
    plumbing (batching, schema, null payloads) fully testable."""

    # capture as locals: closure variables pickle BY VALUE, so executors
    # never need this package importable (module globals would be pickled
    # as references to crawl_streams_spark.*)
    have_codecs = _HAVE_CODECS
    fake_decode = _fake_decode_impl()

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
                if have_codecs:  # pragma: no cover — no codecs in container
                    raise NotImplementedError(
                        "real codec decode not wired in this environment"
                    )
                w, h, feats = fake_decode(data)
                out["n_bytes"].append(len(data))
                out["payload_sha1"].append(hashlib.sha1(data).hexdigest())
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("resized_width", IntegerType(), True),
        StructField("resized_height", IntegerType(), True),
        StructField("scale", FloatType(), True),
    ]
)


def resize_media(
    decoded: DataFrame, max_side: int = 32
) -> DataFrame:
    """Resize stage (aspect-preserving fit to ``max_side``): with codecs
    installed this re-encodes pixels; the stub computes the real geometry
    from the decoded dimensions — the Spark-side contract (schema, batch
    flow, null propagation) is identical either way."""

    have_codecs = _HAVE_CODECS

    def resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "resized_width", "resized_height", "scale")}
            for mid, w, h in zip(pdf["media_id"], pdf["width"], pdf["height"]):
                out["media_id"].append(mid)
                if w is None or h is None or pd.isna(w) or pd.isna(h):
                    for k in ("width", "height", "resized_width", "resized_height", "scale"):
                        out[k].append(None)
                    continue
                if have_codecs:  # pragma: no cover
                    raise NotImplementedError("real resize not wired here")
                w, h = int(w), int(h)
                scale = min(max_side / w, max_side / h, 1.0)
                out["width"].append(w)
                out["height"].append(h)
                out["resized_width"].append(max(1, round(w * scale)))
                out["resized_height"].append(max(1, round(h * scale)))
                out["scale"].append(round(scale, 6))
            yield pd.DataFrame(out)

    return decoded.select("media_id", "width", "height").mapInPandas(
        resize_batches, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame_sha1", StringType(), True),
    ]
)


def sample_frames(
    media: DataFrame, fps: float = 1.0, duration_s: int = 4
) -> DataFrame:
    """Frame-sampling stage — the 1→N row-expanding mapInPandas shape a
    video pipeline needs (each payload yields ``fps·duration`` frame rows).
    The stub derives deterministic per-frame digests from the payload; a
    real decoder swaps in ffmpeg keyframe extraction with the same output
    schema. Frame rows carry no payload by default — at 100 TB you join
    frames back to blobs by media_id only where needed."""
    n_frames = max(1, int(fps * duration_s))

    have_codecs = _HAVE_CODECS

    def frame_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_index", "frame_ts_ms", "frame_sha1")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                if have_codecs:  # pragma: no cover
                    raise NotImplementedError("real frame extraction not wired here")
                base = hashlib.sha1(bytes(payload))
                for i in range(n_frames):
                    fh = base.copy()
                    fh.update(i.to_bytes(4, "little"))
                    out["media_id"].append(mid)
                    out["frame_index"].append(i)
                    out["frame_ts_ms"].append(int(i * 1000 / fps))
                    out["frame_sha1"].append(fh.hexdigest())
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        frame_batches, schema=FRAME_SCHEMA
    )


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
