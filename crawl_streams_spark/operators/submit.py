"""The `submit` command (reference submit.py): enqueue one URI or a file
of URIs as launch messages — the minimal manual-injection path next to the
scheduled launcher.

Reference behavior mapped (submit.py:43-44, 74-105):
  - P-18 scheme normalization (bare authority → http://)
  - one message per URI: isSeed/forceFetch flags from CLI, launch_ts 'now'
    formatted yyyyMMddHHmmss (F-13, enqueue.py:61-70)
  - per-row retry loop → sink-level concern (Spark task retry), not here
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.crawl import launch_ts_format, normalize_uri
from ..functions.hashing import make_mmh3_key_udf


def submit_messages(
    uris: DataFrame,
    now: dt.datetime,
    source: str = "",
    is_seed: bool = False,
    force_fetch: bool = False,
) -> DataFrame:
    """URI DataFrame (column ``uri``) → (uri, key, value) launch messages.

    The message is the same CrawlURI document the launcher builds (P-17,
    enqueue.py:72-124) minus target-derived sheets."""
    launch_ts = now.strftime("%Y%m%d%H%M%S")
    iso_ts = now.strftime("%Y-%m-%dT%H:%M:%SZ")
    d = uris.select(normalize_uri(F.col("uri")).alias("uri"))
    heritable = F.struct(
        F.lit(0).alias("refreshDepth"),
        F.lit(source).alias("source"),
        F.array(F.lit("source"), F.lit("heritable")).alias("heritable"),
        F.array().cast("array<string>").alias("annotations"),
        F.lit(launch_ts).alias("launchTimestamp"),
        F.lit(launch_ts).alias("launch_ts"),
    )
    message = F.struct(
        F.col("uri").alias("url"),
        F.col("uri").alias("parentUrl"),
        F.lit("GET").alias("method"),
        F.lit(is_seed).alias("isSeed"),
        F.lit(force_fetch).alias("forceFetch"),
        F.lit("").alias("hop"),
        F.struct(
            F.lit("").alias("pathFromSeed"),
            heritable.alias("heritableData"),
        ).alias("parentUrlMetadata"),
        F.lit(iso_ts).alias("timestamp"),
    )
    key = make_mmh3_key_udf()
    return d.select(
        "uri",
        key(F.col("uri")).alias("key"),
        F.to_json(message).alias("value"),
    )
