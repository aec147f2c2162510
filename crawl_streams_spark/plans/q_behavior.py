"""Behavioral analytics over the event stream: funnel conversion and
cohort retention — the product-analytics query shapes (Amplitude/GA
style) a general engine must express, both under the cross-engine gate.

Funnel subsequence matching: a session converts iff its time-ordered
event types contain view → click → purchase AS A SUBSEQUENCE (other
events may interleave). Both engines reduce each session to an ordered
type-letter string (total order: ts, then event_id tie-break) and test
``LIKE '%v%c%p%'`` — SQL's LIKE wildcards implement exactly the ordered-
subsequence semantics, JVM-side, no UDF.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..tables import load_table
from .q_sessions import _GAP_SECONDS
from .registry import query

_LETTER = {
    "view": "v",
    "click": "c",
    "purchase": "p",
    "signup": "s",
    "error": "e",
}

_DUCK_SESSION_STRINGS = f"""
    ordered AS (
        SELECT user_id, event_id, event_type,
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
        SELECT user_id, event_id, event_type, ts,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
        FROM ordered
    ),
    sess AS (
        SELECT user_id, session_idx,
               string_agg(CASE event_type
                              WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                              WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                              ELSE 'e' END, '' ORDER BY ts, event_id) AS seq
        FROM tagged
        GROUP BY user_id, session_idx
    )
"""


@query(
    "funnel_conversion_by_user",
    oracle=f"""
        WITH {_DUCK_SESSION_STRINGS}
        SELECT user_id,
               COUNT(*) AS n_sessions,
               COUNT(*) FILTER (WHERE seq LIKE '%v%c%p%')
                   AS n_converted
        FROM sess
        GROUP BY user_id
    """,
    tags=("behavior", "funnel", "session"),
)
def funnel_conversion_by_user(spark, sf_dir):
    """Per user: sessions vs sessions converting through the
    view → click → purchase funnel (ordered subsequence, interleaved
    events allowed). One shuffle on user_id serves sessionization, the
    per-session string fold, AND the final rollup (Catalyst reuses the
    partitioning); the subsequence test is a JVM LIKE over a ≤
    session-length string — no pattern-matching UDF."""
    from pyspark.sql import Window

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
    letter = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _LETTER.items() for x in kv]
        ),
        F.col("event_type"),
    )
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.coalesce(letter, F.lit("e")).alias("letter"),
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_idx"),
    )
    sess = tagged.groupBy("user_id", "session_idx").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"), F.col("event_id"), F.col("letter")
                        )
                    )
                ),
                lambda x: x["letter"],
            ),
        ).alias("seq")
    )
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            F.when(F.col("seq").like("%v%c%p%"), 1).otherwise(0)
        ).cast("bigint").alias("n_converted"),
    )


@query(
    "daily_cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(CAST(ts AS TIMESTAMP)::DATE) AS cohort_day
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT e.user_id,
                   f.cohort_day,
                   date_diff('day', f.cohort_day,
                             CAST(e.ts AS TIMESTAMP)::DATE) AS day_offset
            FROM events e JOIN firsts f USING (user_id)
        )
        SELECT cohort_day, day_offset,
               COUNT(*) AS n_active_users
        FROM activity
        GROUP BY cohort_day, day_offset
    """,
    tags=("behavior", "cohort", "retention"),
)
def daily_cohort_retention(spark, sf_dir):
    """Classic retention triangle: users grouped by first-seen day
    (cohort), counted on each later active day offset. The firsts
    aggregation, the cohort join, and the activity dedup all share the
    user_id partitioning — one exchange serves all three. firsts is one
    row PER USER (the fastest-growing dimension), so it carries NO
    broadcast hint (r6 hint policy, SCALING.md); AQE broadcasts it only
    when genuinely small. Counts are DISTINCT users per (cohort,
    offset) — integer-exact under the gate."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).cast(
                "bigint"
            ).alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@query(
    "user_time_to_convert",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS first_view_ts
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        p AS (
            SELECT e.user_id,
                   MIN(CAST(e.ts AS TIMESTAMP)) AS first_purchase_ts
            FROM events e
            JOIN v ON v.user_id = e.user_id
                  AND CAST(e.ts AS TIMESTAMP) >= v.first_view_ts
            WHERE e.event_type = 'purchase'
            GROUP BY e.user_id
        )
        SELECT v.user_id, v.first_view_ts, p.first_purchase_ts,
               (epoch_us(p.first_purchase_ts) - epoch_us(v.first_view_ts))
                   // 1000000 AS delta_seconds
        FROM v LEFT JOIN p USING (user_id)
    """,
    tags=("behavior", "funnel", "conversion-latency"),
)
def user_time_to_convert(spark, sf_dir):
    """Conversion latency per user: first 'view' and the first 'purchase'
    AT OR AFTER it, with the gap in whole seconds (null = never
    converted) — the time-to-convert distribution behind activation
    dashboards. Two user-keyed aggregates and one user-keyed join (all
    one partitioning); integer-microsecond math end to end, so the gate
    is exact."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    delta = F.expr(
        "(unix_micros(cast(first_purchase_ts as timestamp))"
        " - unix_micros(cast(first_view_ts as timestamp))) div 1000000"
    )
    return (
        v.join(p, "user_id", "left")
        .select(
            "user_id",
            "first_view_ts",
            "first_purchase_ts",
            delta.alias("delta_seconds"),
        )
    )


@query(
    "event_transition_matrix",
    oracle="""
        WITH ord AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ) AS prev
            FROM events
        ),
        t AS (
            SELECT prev, event_type AS next, COUNT(*)::BIGINT AS n_ab
            FROM ord WHERE prev IS NOT NULL GROUP BY 1, 2
        ),
        tot AS (SELECT prev, SUM(n_ab)::BIGINT AS n_a FROM t GROUP BY prev)
        SELECT t.prev, t.next, t.n_ab, tot.n_a,
               ROUND(t.n_ab::DOUBLE / tot.n_a, 6) AS prob
        FROM t JOIN tot USING (prev)
    """,
    tags=("behavior", "markov", "transitions", "window"),
)
def event_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix of user behavior: adjacent
    event-type pairs within each user's (ts, event_id)-ordered stream —
    one user-keyed window — rolled into transition counts and row-
    normalized probabilities (one division per cell, rounded). The
    product-analytics kernel behind 'what do users do next'; the
    (ts, event_id) tie-break makes the adjacency — and therefore every
    count — deterministic."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.expr("cast(ts as timestamp)"), F.col("event_id")
    )
    ordd = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    )
    t = (
        ordd.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    tot = t.groupBy("prev").agg(F.sum("n_ab").alias("n_a"))
    return t.join(F.broadcast(tot), "prev").select(
        "prev",
        "next",
        "n_ab",
        "n_a",
        F.round(F.col("n_ab").cast("double") / F.col("n_a"), 6).alias(
            "prob"
        ),
    )


@query(
    "ab_test_conversion_ztest",
    oracle="""
        WITH assign AS (
            SELECT user_id,
                   CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
                   CASE WHEN COUNT(CASE WHEN event_type = 'purchase'
                                        THEN 1 END) >= 13
                        THEN 1 ELSE 0 END AS converted
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT arm, COUNT(*)::BIGINT AS n,
                   SUM(converted)::BIGINT AS conv
            FROM assign GROUP BY arm
        ),
        wide AS (
            SELECT
                MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
                MAX(CASE WHEN arm = 'A' THEN conv END) AS conv_a,
                MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
                MAX(CASE WHEN arm = 'B' THEN conv END) AS conv_b
            FROM arms
        ),
        stats AS (
            SELECT *,
                   conv_a::DOUBLE / n_a AS p_a,
                   conv_b::DOUBLE / n_b AS p_b,
                   (conv_a + conv_b)::DOUBLE / (n_a + n_b) AS p_pool
            FROM wide
        )
        SELECT n_a, conv_a, ROUND(p_a, 6) AS rate_a,
               n_b, conv_b, ROUND(p_b, 6) AS rate_b,
               ROUND(p_a - p_b, 6) AS rate_diff,
               ROUND((p_a - p_b)
                     / NULLIF(sqrt(p_pool * (1.0 - p_pool)
                                   * (1.0/n_a + 1.0/n_b)), 0.0), 4)
                   AS z_score
        FROM stats
    """,
    tags=("behavior", "experimentation", "ab-test", "statistics"),
)
def ab_test_conversion_ztest(spark, sf_dir):
    """Two-proportion z-test over a deterministic A/B split (user parity
    as the assignment hash): per-arm user counts and conversion rates
    (any 'purchase' event), the rate difference, and the pooled-variance
    z statistic. Counts are integers; every double is one fixed
    expression chain from identical integer inputs — experimentation
    analytics under the exact gate. Per-user conversion is one
    partial-agg'd shuffle; the 2-row arm relation pivots driver-free."""
    ev = load_table(spark, sf_dir, "events")
    # 'any purchase' saturates on this dense stream (every user buys at
    # least once) — use a heavy-buyer threshold at the median count so
    # both arms carry real variance
    assign = ev.groupBy("user_id").agg(
        F.when(
            F.count(F.when(F.col("event_type") == "purchase", 1)) >= 13,
            1,
        ).otherwise(0).alias("converted")
    ).select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        "converted",
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        p_pool * (F.lit(1.0) - p_pool)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    z = (p_a - p_b) / F.nullif(se, F.lit(0.0))
    return wide.select(
        "n_a",
        "conv_a",
        F.round(p_a, 6).alias("rate_a"),
        "n_b",
        "conv_b",
        F.round(p_b, 6).alias("rate_b"),
        F.round(p_a - p_b, 6).alias("rate_diff"),
        F.round(z, 4).alias("z_score"),
    )


@query(
    "purchase_attribution",
    oracle="""
        WITH attr AS (
            SELECT event_type, value,
                   LAST_VALUE(CASE WHEN event_type <> 'purchase'
                                   THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY CAST(ts AS TIMESTAMP), event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS attributed_type
            FROM events
        )
        SELECT COALESCE(attributed_type, '(direct)') AS attributed_type,
               COUNT(*)::BIGINT AS n_purchases,
               ROUND((SUM(value::DECIMAL(18,4)))::DOUBLE, 4)
                   AS attributed_value
        FROM attr
        WHERE event_type = 'purchase'
        GROUP BY 1
    """,
    tags=("behavior", "attribution", "window", "extension"),
)
def purchase_attribution(spark, sf_dir):
    """Last-touch marketing attribution: every purchase is credited to
    the user's most recent PRECEDING non-purchase event type (the
    standard last-touch model; purchases with no prior activity credit
    '(direct)'). One user-keyed window (``last(..., ignorenulls)`` over
    an unbounded-preceding frame — JVM-side, no UDF) plus one tiny
    aggregate; value sums ride DECIMAL so the hash gate is exact.

    Scale: the window shuffles once on user_id — the same partitioning
    every sessionization query reuses; the attribution aggregate is a
    partial-agg'd shuffle over ≤ |event types| rows."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attr = ev.withColumn(
        "attributed_type",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        attr.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("attributed_type", F.lit("(direct)")).alias(
                "attributed_type"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"),
                4,
            ).alias("attributed_value"),
        )
    )


@query(
    "user_interarrival_stats",
    oracle="""
        WITH gaps AS (
            SELECT user_id,
                   epoch_us(CAST(ts AS TIMESTAMP))
                   - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP), event_id)
                       AS gap_us
            FROM events
        ),
        s AS (
            SELECT user_id,
                   COUNT(*)::BIGINT AS n_gaps,
                   SUM(gap_us)::DECIMAL(38,0) AS sum_us,
                   SUM(gap_us::DECIMAL(19,0) * gap_us::DECIMAL(19,0))
                       ::DECIMAL(38,0) AS sumsq_us
            FROM gaps WHERE gap_us IS NOT NULL
            GROUP BY user_id HAVING COUNT(*) >= 2
        )
        SELECT user_id, n_gaps,
               sum_us::DOUBLE / n_gaps / 1000000.0 AS mean_gap_s,
               sqrt((sumsq_us::DOUBLE
                     - sum_us::DOUBLE * sum_us::DOUBLE / n_gaps)
                    / (n_gaps - 1)) / 1000000.0 AS std_gap_s,
               sqrt((sumsq_us::DOUBLE
                     - sum_us::DOUBLE * sum_us::DOUBLE / n_gaps)
                    / (n_gaps - 1))
                   / nullif(sum_us::DOUBLE / n_gaps, 0.0) AS cv
        FROM s
    """,
    tags=("behavior", "timeseries", "burstiness", "extension"),
)
def user_interarrival_stats(spark, sf_dir):
    """Per-user inter-arrival statistics — mean / standard deviation /
    coefficient of variation of the gaps between consecutive events (the
    burstiness profile bot-detection and traffic modeling start from;
    CV ≫ 1 = bursty, CV ≈ 1 = Poisson-like). Gaps are exact integer
    microseconds from one user-keyed lag window; sums and sums of
    squares ride DECIMAL(38,0) so the sufficient statistics are exact
    (a µs gap squared overflows BIGINT), and each output double is the
    same arithmetic expression over identical integers in both engines
    (the qty_price_regression_stats discipline).

    Scale: one user-keyed window shuffle + one partial-agg'd group-by on
    the same key — Catalyst reuses the partitioning."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    s = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("gap_us").cast("decimal(38,0)")).alias("sum_us"),
        F.sum(
            F.col("gap_us").cast("decimal(19,0)")
            * F.col("gap_us").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("sumsq_us"),
    ).filter(F.col("n_gaps") >= 2)
    sum_d = F.col("sum_us").cast("double")
    sumsq_d = F.col("sumsq_us").cast("double")
    n = F.col("n_gaps")
    mean_us = sum_d / n
    std_us = F.sqrt((sumsq_d - sum_d * sum_d / n) / (n - 1))
    # NO final ROUND: both engines derive these doubles from IDENTICAL
    # exact-decimal operands through the same expression tree, so the
    # raw doubles are bit-identical — while ROUND itself is the one step
    # whose implementations diverge near .5 boundaries (Spark rounds the
    # exact BigDecimal, DuckDB a scaled double; measured 1/1500 rows
    # flipped at sf0.1).
    return s.select(
        "user_id",
        "n_gaps",
        (sum_d / n / 1000000.0).alias("mean_gap_s"),
        (std_us / 1000000.0).alias("std_gap_s"),
        (std_us / F.nullif(mean_us, F.lit(0.0))).alias("cv"),
    )


_FUNNEL_WINDOW_S = 86_400  # 24 h: levels 1-3 all occur at the test scales


@query(
    "windowed_funnel_levels",
    oracle=f"""
        WITH se AS (
            SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type IN ('view', 'click', 'purchase')
        ),
        v AS (SELECT * FROM se WHERE event_type = 'view'),
        c AS (SELECT * FROM se WHERE event_type = 'click'),
        p AS (SELECT * FROM se WHERE event_type = 'purchase')
        SELECT u.user_id,
               CASE
                 WHEN EXISTS (
                   SELECT 1 FROM v
                   JOIN c ON c.user_id = v.user_id
                         AND (c.ts > v.ts OR (c.ts = v.ts AND c.event_id > v.event_id))
                   JOIN p ON p.user_id = v.user_id
                         AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
                   WHERE v.user_id = u.user_id
                     AND epoch_us(p.ts) - epoch_us(v.ts)
                         <= {_FUNNEL_WINDOW_S}::BIGINT * 1000000
                 ) THEN 3
                 WHEN EXISTS (
                   SELECT 1 FROM v
                   JOIN c ON c.user_id = v.user_id
                         AND (c.ts > v.ts OR (c.ts = v.ts AND c.event_id > v.event_id))
                   WHERE v.user_id = u.user_id
                     AND epoch_us(c.ts) - epoch_us(v.ts)
                         <= {_FUNNEL_WINDOW_S}::BIGINT * 1000000
                 ) THEN 2
                 WHEN EXISTS (SELECT 1 FROM v WHERE v.user_id = u.user_id)
                 THEN 1
                 ELSE 0
               END::INTEGER AS funnel_level
        FROM (SELECT DISTINCT user_id FROM se) u
    """,
    tags=("behavior", "funnel", "windowed", "extension"),
)
def windowed_funnel_levels(spark, sf_dir):
    """Max funnel level per user through view → click → purchase where
    the whole chain spans ≤ 24 h from its first step (ClickHouse
    windowFunnel semantics; operators/funnel.py::window_funnel). The
    Spark side decides chain existence with a greedy latest-start fold
    over each user's sorted events — exact, one user-key exchange, all
    codegen; the oracle replays it with the declarative EXISTS form
    (chains = ordered joins under the (ts, event_id) total order with a
    span bound), certifying the DP against the specification."""
    from ..operators.funnel import window_funnel

    ev = load_table(spark, sf_dir, "events")
    return window_funnel(
        ev, ["view", "click", "purchase"], _FUNNEL_WINDOW_S
    )
