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
    # HLL++ register values differ across engines by construction, so the
    # raw estimate can never hash-match — but its ERROR BOUND can: the
    # query emits the exact count plus a boolean certifying
    # |approx − exact| ≤ 5·rsd·exact, and the oracle asserts the same
    # shape with the bound hard-coded TRUE. A broken native sketch (or a
    # mis-set rsd) flips the boolean and fails the value hash — the
    # deterministic-HLL trick applied to Spark's native sketch
    # (VERDICT r3 item 5).
    oracle="""
        SELECT event_type,
               COUNT(*)::BIGINT AS n_events,
               COUNT(DISTINCT user_id)::BIGINT AS exact_users,
               TRUE AS within_bound
        FROM events
        GROUP BY event_type
    """,
    tags=("sketch", "approx", "invariant"),
)
def approx_distinct_users(spark, sf_dir):
    """HyperLogLog++ distinct-user estimates per event type — the sketch
    path that replaces exact COUNT(DISTINCT) at 100 TB (mergeable partial
    sketches, no giant shuffle of raw user ids) — gated by its error
    bound: the estimate itself is engine-specific, so the driver-checked
    output carries the exact count and the bound verdict (the estimate
    stays available via the operator, not this gate query)."""
    ev = load_table(spark, sf_dir, "events")
    rsd = 0.02
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.lit(5 * rsd) * F.col("exact_users")
        ).alias("within_bound"),
    )


@query(
    "native_session_window_stats",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id,
                   event_id,
                   CAST(ts AS TIMESTAMP) AS ts,
                   value,
                   CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 0
                        WHEN epoch_us(CAST(ts AS TIMESTAMP))
                             - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w)
                             >= {_GAP_SECONDS} * 1000000 THEN 1
                        ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        ),
        tagged AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
            FROM ordered
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL {_GAP_SECONDS} SECOND AS session_end,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS session_value
        FROM tagged
        GROUP BY user_id, session_idx
    """,
    tags=("session", "window", "native-operator", "extension"),
)
def native_session_window_stats(spark, sf_dir):
    """Spark's NATIVE ``session_window`` aggregate under the value gate
    (round 7): the same 30-minute gap sessions as ``user_sessions``, but
    computed by the built-in session-window operator — the exact
    operator the streaming analysis job's session mode uses
    (streaming/analysis_job.py), certified here in its batch form
    against an independent lag/running-sum SQL derivation.

    Boundary semantics pinned by the oracle: Spark merges a new event
    only while it lands STRICTLY inside the previous window
    (event < last + gap — the window end is exclusive), so the oracle
    splits on ``diff >= gap``, one boundary tighter than user_sessions'
    ``>``; and the window END is last_event + gap, not max(ts). Both
    facts are exactly what a user migrating from hand-rolled
    sessionization to the native operator needs to know."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts").cast("timestamp"), f"{_GAP_SECONDS} seconds")
    return (
        ev.groupBy("user_id", sw.alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
