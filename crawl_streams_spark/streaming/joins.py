"""Stream-stream correlation of the to-crawl and crawled topics — the
natural extension SURVEY §2.7 identifies (the reference pairs the topics
operationally, docker-compose.yml:48, but never joins them).

``launch_outcomes`` answers "what happened to each launched URL?": an
event-time-windowed equi-join on url between the tocrawl stream and the
crawl-log stream. Watermarks bound the join state on both sides — at scale
this is the canonical watermarked stream-stream inner join (state is
dropped once a launch can no longer match: launch watermark + the join
range)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def launch_outcomes(
    tocrawl: DataFrame,
    crawled: DataFrame,
    launch_watermark: str = "30 minutes",
    crawl_watermark: str = "30 minutes",
    max_fetch_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join launches to their fetch results within ``max_fetch_delay``.

    tocrawl needs (url, timestamp); crawled needs (url, timestamp,
    status_code). Output: one row per (launch, matching fetch) with the
    fetch latency.

    ``how="leftOuter"`` emits UNMATCHED launches too — null fetch
    columns — once the watermark proves no fetch can still arrive
    (launch_ts + max_fetch_delay passes the crawl-side watermark): the
    "launched but never crawled" alerting stream. Outer results are
    inherently late by the watermark delay; that latency is the price of
    a correct no-match proof, not a bug."""
    launches = (
        tocrawl.select(
            F.col("url").alias("launch_url"),
            F.to_timestamp("timestamp").alias("launch_ts"),
        )
        .withWatermark("launch_ts", launch_watermark)
    )
    fetches = (
        crawled.select(
            F.col("url").alias("fetch_url"),
            F.to_timestamp("timestamp").alias("fetch_ts"),
            F.col("status_code"),
        )
        .withWatermark("fetch_ts", crawl_watermark)
    )
    return launches.join(
        fetches,
        F.expr(
            f"""
            launch_url = fetch_url AND
            fetch_ts >= launch_ts AND
            fetch_ts <= launch_ts + INTERVAL {max_fetch_delay}
            """
        ),
        how,
    ).select(
        F.col("launch_url").alias("url"),
        "launch_ts",
        "fetch_ts",
        "status_code",
        (F.unix_millis(F.col("fetch_ts")) - F.unix_millis(F.col("launch_ts"))).alias(
            "fetch_latency_ms"
        ),
    )
