"""Launcher schedule semantics (P-13/P-14/P-15, F-13, F-15) and streaming
window shapes (W-1/W-4) certified through the oracle on driver tables.

The launcher's real input is the crawl feed (pytest golden tests,
tests/test_launcher.py); here the same predicate expressions run over
schedules synthesized from ``events`` so DuckDB can replay the decision
arithmetic — every frequency branch (launcher.py:88-134) appears because
startDate spans all months/days/hours.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions.crawl import launch_ts_format, source_tag
from ..tables import load_table
from .registry import query

#: A fixed "now" for predicate evaluation: Wed 2024-03-15 09:00.
_NOW = "2024-03-15 09:00:00"

_FREQ_CASE = """
    CASE (event_id % 7)
        WHEN 0 THEN 'DAILY' WHEN 1 THEN 'WEEKLY' WHEN 2 THEN 'MONTHLY'
        WHEN 3 THEN 'QUARTERLY' WHEN 4 THEN 'SIXMONTHLY' WHEN 5 THEN 'ANNUAL'
        ELSE 'DOMAINCRAWL' END
"""


@query(
    "schedule_launch_decisions",
    oracle=f"""
        WITH s AS (
            SELECT event_id,
                   CAST(ts AS TIMESTAMP) AS start_ts,
                   {_FREQ_CASE} AS frequency,
                   TIMESTAMP '{_NOW}' AS now
            FROM events
        )
        SELECT event_id, frequency,
               (start_ts IS NOT NULL AND now >= start_ts) AS date_ok,
               CASE frequency
                   WHEN 'DAILY' THEN TRUE
                   WHEN 'WEEKLY' THEN dayofweek(now) = dayofweek(start_ts)
                   WHEN 'MONTHLY' THEN day(now) = day(start_ts)
                   WHEN 'QUARTERLY' THEN day(now) = day(start_ts)
                        AND month(now) % 3 = month(start_ts) % 3
                   WHEN 'SIXMONTHLY' THEN day(now) = day(start_ts)
                        AND month(now) % 6 = month(start_ts) % 6
                   WHEN 'ANNUAL' THEN day(now) = day(start_ts)
                        AND month(now) = month(start_ts)
                   ELSE FALSE END AS freq_ok,
               (hour(now) = hour(start_ts)) AS hour_ok
        FROM s
    """,
    tags=("P-13", "P-14", "P-15", "launcher"),
)
def schedule_launch_decisions(spark, sf_dir):
    """The three launcher gates as columns over synthesized schedules:
    date-range (P-13, launcher.py:69-84), frequency match for all branches
    (P-14, launcher.py:88-134; DAILY..ANNUAL + DOMAINCRAWL-never), and the
    hour gate with the intended ``==`` (P-15, launcher.py:163).

    DuckDB dayofweek is 0=Sun..6=Sat vs Spark 1=Sun..7=Sat — equality
    comparisons are unaffected (both are weekday bijections)."""
    ev = load_table(spark, sf_dir, "events")
    now = F.lit(_NOW).cast("timestamp_ntz")
    freq = (
        F.when(F.col("event_id") % 7 == 0, "DAILY")
        .when(F.col("event_id") % 7 == 1, "WEEKLY")
        .when(F.col("event_id") % 7 == 2, "MONTHLY")
        .when(F.col("event_id") % 7 == 3, "QUARTERLY")
        .when(F.col("event_id") % 7 == 4, "SIXMONTHLY")
        .when(F.col("event_id") % 7 == 5, "ANNUAL")
        .otherwise("DOMAINCRAWL")
    )
    d = ev.select(
        "event_id", F.col("ts").alias("start_ts"), freq.alias("frequency")
    )
    same_day = F.dayofmonth(now) == F.dayofmonth("start_ts")
    freq_ok = (
        F.when(F.col("frequency") == "DAILY", F.lit(True))
        .when(
            F.col("frequency") == "WEEKLY",
            F.dayofweek(now) == F.dayofweek(F.col("start_ts")),
        )
        .when(F.col("frequency") == "MONTHLY", same_day)
        .when(
            F.col("frequency") == "QUARTERLY",
            same_day & (F.month(now) % 3 == F.month("start_ts") % 3),
        )
        .when(
            F.col("frequency") == "SIXMONTHLY",
            same_day & (F.month(now) % 6 == F.month("start_ts") % 6),
        )
        .when(
            F.col("frequency") == "ANNUAL",
            same_day & (F.month(now) == F.month("start_ts")),
        )
        .otherwise(F.lit(False))
    )
    return d.select(
        "event_id",
        "frequency",
        (F.col("start_ts").isNotNull() & (now >= F.col("start_ts"))).alias(
            "date_ok"
        ),
        freq_ok.alias("freq_ok"),
        (F.hour(now) == F.hour("start_ts")).alias("hour_ok"),
    )


@query(
    "launch_ts_and_source_tags",
    oracle="""
        SELECT event_id,
               strftime(CAST(ts AS TIMESTAMP), '%Y%m%d%H%M%S') AS launch_ts,
               'tid:' || event_id || ':https://seed-' || (user_id % 50) || '.example.org/' AS source
        FROM events
        ORDER BY event_id
        LIMIT 1000
    """,
    tags=("F-13", "F-15", "launcher"),
)
def launch_ts_and_source_tags(spark, sf_dir):
    """F-13 launch-timestamp formatting (enqueue.py:61-70) + F-15 source
    tag built with concat (seed URLs contain ':', launcher.py:64)."""
    ev = load_table(spark, sf_dir, "events")
    seed = F.concat(
        F.lit("https://seed-"),
        (F.col("user_id") % 50).cast("string"),
        F.lit(".example.org/"),
    )
    return (
        ev.select(
            "event_id",
            launch_ts_format(F.col("ts")).alias("launch_ts"),
            source_tag(F.col("event_id"), seed).alias("source"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


@query(
    "tumbling_window_counts",
    oracle="""
        -- epoch_us is an exact BIGINT: epoch(..)::BIGINT would ROUND
        -- fractional seconds and push boundary events into the next window
        SELECT CAST(to_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000) * 21600)
                    AS TIMESTAMP) AS win_start,
               event_type,
               COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
    """,
    tags=("W-1", "W-4", "window", "streaming"),
)
def tumbling_window_counts(spark, sf_dir):
    """W-1's time-window replacement for the row-count buffer: 6-hour
    tumbling windows via the REAL streaming window() operator (epoch-
    aligned on both engines). This exact expression runs unchanged under
    readStream + watermark (streaming/analysis_job.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "6 hours").alias("win"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("win.start").alias("win_start"), "event_type", "n", "n_users"
        )
    )


@query(
    "mimetype_fallback_chain",
    oracle="""
        SELECT event_id,
               COALESCE(NULLIF(event_type, 'error'),
                        NULLIF(event_type, 'click'),
                        'unknown-content-type') AS content_type_u,
               COUNT(*) OVER (PARTITION BY COALESCE(NULLIF(event_type, 'error'),
                                                    NULLIF(event_type, 'click'),
                                                    'unknown-content-type')) AS type_total
        FROM events
        ORDER BY event_id
        LIMIT 2000
    """,
    tags=("F-11", "P-6", "projection"),
)
def mimetype_fallback_chain(spark, sf_dir):
    """F-11's coalesce fallback chain (analysis.py:121-126) + an analytic
    count over the unified value (P-6 variant unification shape)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    unified = F.coalesce(
        F.nullif(F.col("event_type"), F.lit("error")),
        F.nullif(F.col("event_type"), F.lit("click")),
        F.lit("unknown-content-type"),
    )
    d = ev.select("event_id", unified.alias("content_type_u"))
    return (
        d.select(
            "event_id",
            "content_type_u",
            F.count("*")
            .over(Window.partitionBy("content_type_u"))
            .alias("type_total"),
        )
        .orderBy("event_id")
        .limit(2000)
    )


@query(
    "sql_interface_revenue",
    oracle="""
        SELECT o_orderpriority AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o_orderpriority
    """,
    tags=("sql", "engine-surface"),
)
def sql_interface_revenue(spark, sf_dir):
    """The SQL front-end (engine surface): the same engine drives
    spark.sql() text over registered temp views — proving the DataFrame
    builders and the SQL parser share one Catalyst plan space."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_sql_view"
    )
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders_sql_view
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o_orderpriority
        """
    )


@query(
    "mmh3_partition_keys",
    # murmur3-seed-0 has no DuckDB builtin, but it is a PURE function of
    # the seed string — so the oracle carries the 50 possible keys as
    # GOLDEN literal rows (r6 upgrade per VERDICT r5 item 4; rows-only
    # before). The literals were computed from the SMHasher-parity-tested
    # kernel AND cross-checked against an independent from-spec
    # implementation; the driver's value hash then gates the full Spark
    # path (Arrow batching, netloc extraction, little-endian hex). Both
    # sides derive WHICH seeds exist from the same events table, so the
    # gate holds at any SF.
    oracle="""
        WITH golden(i, kafka_key) AS (VALUES
            (0, '7e0f8000'),
            (1, '66f90e83'),
            (2, 'c2027697'),
            (3, '0a341cb3'),
            (4, 'c53b26ca'),
            (5, '7ba5d016'),
            (6, '76b46cab'),
            (7, 'ae7c77c2'),
            (8, '69561a0a'),
            (9, 'ee8fd307'),
            (10, '27347915'),
            (11, '68fda862'),
            (12, 'cd1ec7c4'),
            (13, '0ad97626'),
            (14, 'e92ab4a2'),
            (15, '3983e75b'),
            (16, '52bd0b05'),
            (17, '517a411c'),
            (18, 'eb761837'),
            (19, 'c42994bc'),
            (20, '39d8a5df'),
            (21, 'c38d15f6'),
            (22, '21700919'),
            (23, 'da9489e3'),
            (24, 'a802a02a'),
            (25, '1387e587'),
            (26, '3b1805ed'),
            (27, '09895bc5'),
            (28, '70dda016'),
            (29, '9be4286b'),
            (30, 'b4470049'),
            (31, '1dc58e8f'),
            (32, 'c03ce282'),
            (33, '846301ea'),
            (34, '7293bef7'),
            (35, 'eeaafb53'),
            (36, 'baa6d282'),
            (37, 'f5f5bf3b'),
            (38, 'e642376b'),
            (39, 'af29271f'),
            (40, 'b7fb6b63'),
            (41, 'df826506'),
            (42, '8df731ef'),
            (43, 'c61aa849'),
            (44, 'd86541d7'),
            (45, '5d7a6e3a'),
            (46, 'd4ff2cbd'),
            (47, '906d9693'),
            (48, '38bfaf22'),
            (49, '90637f37')
        ),
        d AS (SELECT DISTINCT user_id % 50 AS i FROM events)
        SELECT 'https://seed-' || CAST(d.i AS VARCHAR)
                   || '.example.org/' AS seed,
               g.kafka_key AS kafka_key
        FROM d JOIN golden g ON g.i = d.i
    """,
    tags=("F-14", "SNK-1", "udf", "golden-oracle"),
)
def mmh3_partition_keys(spark, sf_dir):
    """F-14 — the Kafka partition key pandas UDF over synthesized seed
    URLs (enqueue.py:127 parity). The single Python kernel in the engine;
    the distinct-seed projection keeps the UDF in the plan (the
    ArrowEvalPython pin) while making the output a deterministic
    value-oracled relation."""
    from ..functions.hashing import make_mmh3_key_udf

    ev = load_table(spark, sf_dir, "events")
    seed = F.concat(
        F.lit("https://seed-"),
        (F.col("user_id") % 50).cast("string"),
        F.lit(".example.org/"),
    )
    udf = make_mmh3_key_udf()
    return (
        ev.select(seed.alias("seed"))
        .distinct()
        .select("seed", udf(F.col("seed")).alias("kafka_key"))
    )


_HOP_SLIDE_US = 900 * 1_000_000  # 15 minutes
_HOP_WIDTH_US = 3600 * 1_000_000  # 1 hour


@query(
    "hopping_window_counts",
    oracle=f"""
        WITH ev AS (
            SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_type, user_id
            FROM events
        ),
        hops AS (
            -- a 1 h window sliding by 15 min puts every event in exactly
            -- width/slide = 4 windows whose starts are slide-aligned
            SELECT ((t // {_HOP_SLIDE_US}) * {_HOP_SLIDE_US}
                    - i * {_HOP_SLIDE_US}) AS ws,
                   event_type, user_id
            FROM ev CROSS JOIN (SELECT unnest(range(4))::BIGINT AS i) u
        )
        SELECT CAST(to_timestamp(ws // 1000000) AS TIMESTAMP) AS win_start,
               CAST(to_timestamp((ws + {_HOP_WIDTH_US}) // 1000000)
                    AS TIMESTAMP) AS win_end,
               event_type,
               COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS n_users
        FROM hops
        GROUP BY 1, 2, 3
    """,
    tags=("window", "hopping", "sliding", "streaming"),
)
def hopping_window_counts(spark, sf_dir):
    """Hopping (sliding) windows — W-1's overlapping form: 1-hour
    windows every 15 minutes via the real streaming window() operator
    (each event lands in exactly width/slide = 4 windows). The same
    expression runs unchanged under readStream + watermark; the oracle
    derives the identical slide-aligned window starts arithmetically, so
    the gate certifies Spark's window-assignment semantics, not just the
    counts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "n_users",
        )
    )
