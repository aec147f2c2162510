"""Interval-join queries under the cross-engine gate
(operators/interval.py): Spark answers through the bucketed equi-join
rewrite, the DuckDB oracle through a plain non-equi range join — the gate
certifies the rewrite (bucketize → equi-join → refine → overlap-start
attribution) emits exactly the true match set, no duplicates, no misses.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators import interval as IV
from ..tables import load_table
from .q_sessions import _GAP_SECONDS, user_sessions
from .registry import query

#: 1-hour buckets — near the p95 session length of the 30-min-gap
#: sessionization, so the per-interval explode factor stays ~1-2.
_WIDTH_US = 3600 * 1_000_000

_DUCK_SESSIONS = f"""
    ordered AS (
        SELECT user_id,
               event_id,
               CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 0
                    WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w)
                         > {_GAP_SECONDS} * 1000000 THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    tagged AS (
        SELECT user_id, event_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
        FROM ordered
    ),
    sessions AS (
        SELECT user_id, session_idx,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end
        FROM tagged
        GROUP BY user_id, session_idx
    )
"""


def _sessions_us(spark, sf_dir):
    """(user_id, session_idx, s0, s1) with closed bounds in unix micros."""
    s = user_sessions(spark, sf_dir)
    return s.select(
        "user_id",
        "session_idx",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("s0"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("s1"),
    )


@query(
    "concurrent_sessions",
    oracle=f"""
        WITH {_DUCK_SESSIONS}
        SELECT a.user_id,
               a.session_idx,
               COUNT(b.user_id) AS n_concurrent
        FROM sessions a
        LEFT JOIN sessions b
          ON b.user_id <> a.user_id
         AND a.session_start <= b.session_end
         AND b.session_start <= a.session_end
        GROUP BY a.user_id, a.session_idx
    """,
    tags=("interval-join", "session", "self-join"),
    bench=True,
)
def concurrent_sessions(spark, sf_dir):
    """Per session: how many sessions of OTHER users overlap it in time —
    an interval-overlap self-join. Spark never sees the O(n²) predicate:
    both sides explode to 1-hour buckets, equi-join on the bucket, refine
    with the exact closed-interval overlap, and attribute each pair to its
    overlap-start bucket (exactly-once, no dedup shuffle). The DuckDB
    oracle runs the naive non-equi join — agreement certifies the
    rewrite.

    r6 shape: count ALL overlapping sessions (self included) and subtract
    one. Same-user sessions are disjoint by construction (the 30-min-gap
    sessionization separates them by more than the gap), so the only
    same-user overlap is the guaranteed self-pair — which also means
    every session appears in the join output, eliminating the zero-count
    outer join that forced a third sessionization branch into the plan
    (the r5 bench watch item: 2 scans + 6 window chains → 2 scans with
    one ReusedExchange and no final join).

    r13: the sessions relation is materialized once with a lazy
    localCheckpoint before the self-join. Before, only the events
    exchange was runtime-shared between the two branches and the whole
    post-shuffle chain (sort + two window passes + session aggregation)
    ran TWICE — once for the probe side, once inside the broadcast
    build. An exchange-reuse barrier (repartition) does not work here:
    the chain stays hash-partitioned on user_id end to end, so any
    repartition on a satisfied key is eliminated as redundant, and an
    unsatisfied key adds a sequential AQE stage that costs more than it
    saves. The checkpoint halves the sessionize work — plan diff: two
    full window chains → one + Scan ExistingRDD, 2 shuffles → 1. At
    sf0.1/local[32] this is wall-neutral (interleaved A/B, 7 rounds:
    min 1.166 → 1.148 s — the duplicate chain ran on otherwise-idle
    cores); at scale cores are not idle, so computing sessions once is
    strictly less work. Conservative: the materialized relation is
    sessions-sized (orders of magnitude smaller than events), guide
    §3.3 / §5 ("localCheckpoint is a cheaper way to cut lineage")."""
    s = _sessions_us(spark, sf_dir).localCheckpoint(eager=False)
    pairs = IV.interval_overlap_join(
        s,
        s,
        left_start="s0",
        left_end="s1",
        right_start="s0",
        right_end="s1",
        width=_WIDTH_US,
    )
    return pairs.groupBy("user_id", "session_idx").agg(
        (F.count(F.lit(1)) - F.lit(1)).cast("bigint").alias("n_concurrent")
    )


@query(
    "active_sessions_at_purchase",
    oracle=f"""
        WITH {_DUCK_SESSIONS},
        purchases AS (
            SELECT event_id, CAST(ts AS TIMESTAMP) AS pts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id,
               COUNT(s.user_id) AS n_active
        FROM purchases p
        LEFT JOIN sessions s
          ON s.session_start <= p.pts AND p.pts <= s.session_end
        GROUP BY p.event_id
    """,
    tags=("interval-join", "point-in-interval", "session"),
)
def active_sessions_at_purchase(spark, sf_dir):
    """Per purchase event: how many sessions (any user) were active at
    that instant — a point-in-interval join. Points carry exactly one
    bucket, intervals explode to covered buckets; the equi-join + exact
    containment refine replaces the nested-loop plan the raw ``BETWEEN``
    predicate would produce."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us")
    )
    s = _sessions_us(spark, sf_dir)
    # LEFT interval join (r13): a gap purchase keeps one null-interval
    # row, so count(non-null interval col) is its zero — the former
    # inner join + count + left join-back re-scanned and re-exchanged
    # purchases just to restore the zeros
    matched = IV.point_in_interval_join(
        purchases,
        s,
        point_col="p_us",
        start_col="s0",
        end_col="s1",
        width=_WIDTH_US,
        how="left",
    )
    return matched.groupBy("event_id").agg(
        F.count("s0").alias("n_active")
    )
