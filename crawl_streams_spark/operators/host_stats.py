"""Host-stats aggregation family (reference analysis.py — the `analyse`
command) in batch form; streaming/analysis_job.py runs the same expressions
incrementally (SURVEY §3.2).

The reference keeps one nested in-memory dict per host under locks
(analysis.py:105-138); here each histogram is a long-format grouped
DataFrame (shuffle-partial aggregation — scale-safe for unbounded host
cardinality, SURVEY §4.3) and the nested snapshot document is assembled
only at the reporting edge for a bounded top-k of hosts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions import crawl as C


def with_host(df: DataFrame) -> DataFrame:
    """F-1 host derivation (analysis.py:103,143-147)."""
    return df.withColumn("host_d", C.host_of("url"))


def host_totals(df: DataFrame) -> DataFrame:
    """A-1 + A-2 — per-host total and first/last event time
    (analysis.py:110,117-118). Event-time min/max replaces the reference's
    arrival-order first/last (intended semantics, SURVEY §2.5 A-2)."""
    return with_host(df).groupBy(F.col("host_d").alias("host")).agg(
        F.count("*").alias("total"),
        F.min("timestamp").alias("first_timestamp"),
        F.max("timestamp").alias("last_timestamp"),
    )


def host_content_types(df: DataFrame) -> DataFrame:
    """A-3 — per-host content-type histogram after the F-11 fallback chain
    (analysis.py:121-126)."""
    return (
        with_host(df)
        .withColumn(
            "content_type_u",
            C.mimetype_unified(F.col("mimetype"), F.col("content_type")),
        )
        .groupBy(
            F.col("host_d").alias("host"),
            F.col("content_type_u").alias("content_type"),
        )
        .agg(F.count("*").alias("n"))
    )


def host_status_codes(df: DataFrame) -> DataFrame:
    """A-4 — per-host status-code histogram, stringified codes with the
    intended '-' fallback (analysis.py:129-133, F-12)."""
    return (
        with_host(df)
        .withColumn("status", C.status_str(F.col("status_code")))
        .groupBy(F.col("host_d").alias("host"), F.col("status"))
        .agg(F.count("*").alias("n"))
    )


def host_via(df: DataFrame) -> DataFrame:
    """A-5 — per-host referrer-host histogram excluding self-references
    (analysis.py:136-138)."""
    d = with_host(df).withColumn("via_host", C.host_of("via"))
    return (
        d.filter(
            F.col("via_host").isNotNull()
            & (F.col("via_host") != F.col("host_d"))
        )
        .groupBy(F.col("host_d").alias("host"), F.col("via_host"))
        .agg(F.count("*").alias("n"))
    )


def status_code_totals(df: DataFrame) -> DataFrame:
    """A-6/O-1 — global status-code histogram sorted desc
    (analysis.py:149-158). Callers bound it to a recent window first
    (batch: timestamp filter; streaming: watermarked window)."""
    return (
        df.withColumn("status", C.status_str(F.col("status_code")))
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "status")
    )


def screenshots(df: DataFrame, limit: int = 100) -> DataFrame:
    """P-8 + A-10/O-2 — screenshot events: strip the 11-char 'screenshot:'
    prefix, drop empties, keep the latest `limit` by timestamp
    (analysis.py:93-100, 161-164; ring buffer cap analysis.py:73)."""
    return (
        df.filter(F.col("url").startswith("screenshot:"))
        .withColumn("original_url", F.expr("substring(url, 12)"))
        .filter(F.col("original_url") != "")
        .select("original_url", "timestamp")
        .orderBy(F.desc("timestamp"), "original_url")
        .limit(limit)
    )


def write_host_stats_parquet(df: DataFrame, path: str) -> None:
    """The 100 TB sink for the host-stats family (SCALING.md): full
    per-(date, host) aggregates as date-partitioned Parquet — partition
    pruning for time-ranged readers, no driver collect anywhere. The JSON
    snapshot (host_stats_snapshot) stays the bounded top-k reporting edge.
    """
    daily = (
        with_host(df)
        .withColumn("event_date", F.to_date(F.to_timestamp("timestamp")))
        .groupBy("event_date", F.col("host_d").alias("host"))
        .agg(
            F.count("*").alias("total"),
            F.min("timestamp").alias("first_timestamp"),
            F.max("timestamp").alias("last_timestamp"),
        )
    )
    daily.write.mode("overwrite").partitionBy("event_date").parquet(path)


def host_stats_snapshot(
    df: DataFrame, max_hosts: int = 500, max_screenshots: int = 100
) -> dict:
    """SNK-3 — assemble the nested snapshot document
    (analysis.py:160-173 shape, FIXTURES.md §4):

      {last_timestamp, status_codes: [[code, n]…] desc,
       screenshots: [[url, ts]…] desc, hosts: {host: {stats, content_types,
       status_codes, via}}}

    The reference LRU-caps state at 500 hosts (W-2, analysis.py:18-31);
    at scale the full per-host tables stay distributed (write them as
    Parquet) and only the top-`max_hosts` busiest hosts are folded into
    the driver-side JSON document — the driver-collect is bounded by
    construction.
    """
    totals = host_totals(df)
    top_hosts = (
        totals.orderBy(F.desc("total"), "host").limit(max_hosts).cache()
    )

    ct = host_content_types(df).join(
        F.broadcast(top_hosts.select("host")), "host"
    )
    sc = host_status_codes(df).join(
        F.broadcast(top_hosts.select("host")), "host"
    )
    via = host_via(df).join(F.broadcast(top_hosts.select("host")), "host")

    # One normalization for the host key everywhere: only a true NULL maps
    # to "null"; an empty-string host (e.g. host_of('dns:') == '') keys as
    # '' in all four loops.
    def host_key(host: str | None) -> str:
        return host if host is not None else "null"

    hosts: dict[str, dict] = {}
    for r in top_hosts.collect():
        hosts[host_key(r["host"])] = {
            "stats": {
                "first_timestamp": r["first_timestamp"],
                "last_timestamp": r["last_timestamp"],
                "total": r["total"],
            },
            "content_types": {},
            "status_codes": {},
            "via": {},
        }
    for r in ct.collect():
        hosts[host_key(r["host"])]["content_types"][r["content_type"]] = r["n"]
    for r in sc.collect():
        hosts[host_key(r["host"])]["status_codes"][r["status"]] = r["n"]
    for r in via.collect():
        hosts[host_key(r["host"])]["via"][r["via_host"]] = r["n"]

    status_rows = status_code_totals(df).collect()
    shot_rows = screenshots(df, max_screenshots).collect()
    last_ts = df.agg(F.max("timestamp").alias("m")).collect()[0]["m"]
    top_hosts.unpersist()
    return {
        "last_timestamp": last_ts,
        "status_codes": [[r["status"], r["n"]] for r in status_rows],
        "screenshots": [[r["original_url"], r["timestamp"]] for r in shot_rows],
        "hosts": hosts,
    }
