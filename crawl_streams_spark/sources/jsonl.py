"""File sources: JSONL crawl feed / crawl-log fixtures / URI lists.

Replaces the reference's line-by-line ``json.loads`` generators
(launcher.py:142-146 SRC-4; submit.py:89-102 SRC-5) with schema'd Spark
readers: distributed, predicate-pushable, and identical for batch and
streaming (readStream on the same path + schema gives the fixture-dir
streaming mode of SURVEY §7.5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import CRAWL_FEED_SCHEMA, CRAWL_LOG_SCHEMA


def read_crawl_feed(spark: SparkSession, path: str) -> DataFrame:
    """SRC-4 — crawl-feed target specs, one JSON object per line
    (launcher.py:142-146)."""
    return spark.read.schema(CRAWL_FEED_SCHEMA).json(path)


def read_crawl_log(spark: SparkSession, path: str) -> DataFrame:
    """Crawl-log JSONL (e.g. the reference's 1,000-row sample) under the
    union schema; use ``is_heritrix`` for variant dispatch
    (report.py:48-49)."""
    df = spark.read.schema(CRAWL_LOG_SCHEMA).json(path)
    return df.withColumn("is_heritrix", F.col("thread").isNotNull())


def stream_crawl_log(spark: SparkSession, path: str) -> DataFrame:
    """Streaming flavor of read_crawl_log over a directory — the
    no-broker test harness for every streaming operator (SURVEY §7.5)."""
    df = spark.readStream.schema(CRAWL_LOG_SCHEMA).json(path)
    return df.withColumn("is_heritrix", F.col("thread").isNotNull())


def read_uri_list(spark: SparkSession, path: str) -> DataFrame:
    """SRC-5 — one URI per line, trimmed, blanks dropped
    (submit.py:89-102; per-row retry there is sink policy, not scan)."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("uri"))
        .filter(F.col("uri") != "")
    )
