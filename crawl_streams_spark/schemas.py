"""Explicit StructType schemas for the crawl data model (SURVEY.md §1,
FIXTURES.md).

The reference is schemaless — every consumer probes dict keys defensively
(`'thread' in j`, report.py:48; `.get(key, default)`, streamer.py:49-57).
Here the union of both crawl-log variants is ONE explicit schema with every
field nullable; variant dispatch is a boolean column (`thread IS NOT NULL`,
report.py:48-49, 215-219), and unknown nested keys stay open via MapType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


#: Union schema for the crawl-log topic (fc.crawled): Heritrix + WebRender
#: variants in one stream (analysis.py:35-58 docstring; report.py:64-80
#: example; both variants measured on the 1,000-row sample).
CRAWL_LOG_SCHEMA = StructType(
    [
        # -- both variants -------------------------------------------------
        _f("url", StringType()),
        _f("timestamp", StringType()),  # ISO-8601 'Z'; kept raw (string-
        # ordered in the reference); derive TimestampType explicitly.
        _f("status_code", IntegerType()),  # incl. negative Heritrix codes
        _f("host", StringType()),
        _f("content_digest", StringType()),
        _f("content_length", LongType()),
        _f("start_time_plus_duration", StringType()),
        _f("annotations", StringType()),
        _f("warc_filename", StringType()),
        _f("warc_offset", LongType()),
        # -- Heritrix variant (discriminator: thread IS NOT NULL) ----------
        _f("hop_path", StringType()),
        _f("via", StringType()),
        _f("seed", StringType()),
        _f("thread", IntegerType()),
        _f("crawl_name", StringType()),
        _f("mimetype", StringType()),
        _f("size", LongType()),
        _f("extra_info", MapType(StringType(), StringType())),  # open object
        # -- WebRender variant ---------------------------------------------
        _f("http_method", StringType()),
        _f("wire_bytes", LongType()),
        _f("content_type", StringType()),
        _f("warc_type", StringType()),
        _f("warc_id", StringType()),
        _f("warc_length", LongType()),
        _f("warc_content_type", StringType()),
    ]
)

#: Launch-message ("CrawlURI") schema — the nested document built at
#: enqueue.py:72-124; discriminator for the tocrawl stream is
#: parentUrl IS NOT NULL (report.py:108).
HERITABLE_DATA_SCHEMA = StructType(
    [
        _f("refreshDepth", IntegerType()),
        _f("source", StringType()),
        _f("heritable", ArrayType(StringType())),
        _f("annotations", ArrayType(StringType())),
        _f("launchTimestamp", StringType()),
        _f("launch_ts", StringType()),
    ]
)

TOCRAWL_SCHEMA = StructType(
    [
        _f("url", StringType()),
        _f("parentUrl", StringType()),
        _f("method", StringType()),
        _f("isSeed", BooleanType()),
        _f("forceFetch", BooleanType()),
        _f("hop", StringType()),
        _f("sheets", ArrayType(StringType())),
        _f("recrawlInterval", IntegerType()),
        _f(
            "parentUrlMetadata",
            StructType(
                [
                    _f("pathFromSeed", StringType()),
                    _f("heritableData", HERITABLE_DATA_SCHEMA),
                ]
            ),
        ),
        _f("targetSheet", MapType(StringType(), StringType())),
        _f("timestamp", StringType()),
    ]
)

#: Crawl-feed target spec (JSONL input to the launcher) — README.md:16-39,
#: consumed at launcher.py:142-146 with fields used at 55-134, 169-197.
SCHEDULE_SCHEMA = StructType(
    [
        _f("startDate", StringType()),  # "%Y-%m-%d %H:%M:%S" (launcher.py:70)
        _f("endDate", StringType()),
        _f("frequency", StringType()),
    ]
)

CRAWL_FEED_SCHEMA = StructType(
    [
        _f("id", LongType()),
        _f("title", StringType()),
        _f("seeds", ArrayType(StringType())),
        _f("depth", StringType()),
        _f("scope", StringType()),
        _f("ignoreRobotsTxt", BooleanType()),
        _f("schedules", ArrayType(SCHEDULE_SCHEMA)),
        _f("watched", BooleanType()),
    ]
)
