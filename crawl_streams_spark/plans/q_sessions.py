"""Sessionization and sketch aggregates — the event-stream analytics layer
above the crawl-log surface.

Gap-based sessionization is the batch twin of Structured Streaming's
``session_window`` (same semantics the streaming job would use with a
watermark); here it's lag + windowed cumulative sum so the DuckDB oracle
can replay it exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..tables import load_table
from .registry import query

_GAP_SECONDS = 1800  # 30-minute session gap


@query(
    "user_sessions",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id,
                   event_id,
                   CAST(ts AS TIMESTAMP) AS ts,
                   value,
                   CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 0
                        WHEN epoch_us(CAST(ts AS TIMESTAMP))
                             - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w)
                             > {_GAP_SECONDS} * 1000000 THEN 1
                        ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        ),
        tagged AS (
            SELECT user_id, event_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
            FROM ordered
        )
        SELECT user_id,
               session_idx,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               ROUND(SUM(value), 4) AS session_value
        FROM tagged
        GROUP BY user_id, session_idx
    """,
    tags=("session", "window", "streaming-analog"),
    bench=True,
)
def user_sessions(spark, sf_dir):
    """Gap-based sessions (30 min): lag-flag + running sum assigns session
    ids, then a per-session rollup. One shuffle on user_id serves both the
    window and the final aggregation (Catalyst reuses the partitioning)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag(F.col("ts").cast("timestamp")).over(w)
    )
    new_session = (
        F.when(F.lag("ts").over(w).isNull(), 0)
        .when(gap > _GAP_SECONDS * 1_000_000, 1)
        .otherwise(0)
    )
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_idx"),
    )
    return tagged.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


@query(
    "approx_distinct_users",
    oracle=None,  # HLL sketches differ across engines by construction —
    # rows-only check here; the exactness bound is pytest-asserted
    # (tests/test_extensions2.py::test_approx_distinct_error_bound).
    tags=("sketch", "approx", "rows-only"),
)
def approx_distinct_users(spark, sf_dir):
    """HyperLogLog++ distinct-user estimates per event type — the sketch
    path that replaces exact COUNT(DISTINCT) at 100 TB (mergeable partial
    sketches, no giant shuffle of raw user ids)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )
