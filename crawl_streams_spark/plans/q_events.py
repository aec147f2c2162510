"""Crawl-log operator semantics replayed over the driver's ``events`` table.

The reference's fact stream is the crawl log (host, status_code, mimetype,
timestamp…). The driver's oracle-checked stand-in is ``events(event_id, ts,
user_id, event_type, value, props)`` (TESTDATA.md / FIXTURES.md §5) — so each
aggregation/projection from SURVEY.md §2 is expressed here over events with
the mapping: host→event_type (grouping key), via-host→user_id, status_code→
props JSON field ``k``, event time→ts.

Scale notes: every groupBy below is a partial-aggregate-then-shuffle plan
(map-side combine for free); scalar-subquery max(ts) computations broadcast a
1-row relation, no second scan of the fact table is needed beyond what the
semantics require.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..tables import load_table
from .registry import query


@query(
    "event_type_stats",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(MIN(ts) AS TIMESTAMP) AS first_ts,
               CAST(MAX(ts) AS TIMESTAMP) AS last_ts,
               ROUND(SUM(value), 4) AS sum_value
        FROM events
        GROUP BY event_type
    """,
    tags=("A-1", "A-2", "agg"),
    bench=True,
)
def event_type_stats(spark, sf_dir):
    """Flagship: per-key total + first/last event time + value rollup —
    A-1/A-2 per-host stats (reference analysis.py:110-118) as one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@query(
    "status_code_histogram",
    oracle="""
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS code,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    """,
    tags=("A-4", "P-1", "agg", "json"),
)
def status_code_histogram(spark, sf_dir):
    """A-4 per-host status-code histogram (analysis.py:129-133), with the
    status code parsed out of the JSON payload (P-1 json deserialize,
    analysis.py:84)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "code", F.get_json_object("props", "$.k").cast("int")
        )
        .groupBy("event_type", "code")
        .agg(F.count("*").alias("n"))
    )


@query(
    "hourly_counts",
    oracle="""
        SELECT event_type,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    """,
    tags=("F-3", "A-3", "agg"),
)
def hourly_counts(spark, sf_dir):
    """F-3 hour bucketing (streamer.py:104-110) feeding an A-3-style
    histogram — the per-(host,hour) rollup shape."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("event_type", "hour")
        .agg(F.count("*").alias("n"))
    )


@query(
    "recent_window_topk",
    oracle="""
        SELECT event_type, COUNT(*) AS n
        FROM events
        WHERE CAST(ts AS TIMESTAMP) >=
              (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 1 DAY FROM events)
        GROUP BY event_type
        ORDER BY n DESC, event_type
    """,
    tags=("A-6", "O-1", "agg", "window"),
)
def recent_window_topk(spark, sf_dir):
    """A-6 recent-events histogram sorted desc (analysis.py:149-158): the
    reference's last-10k-rows buffer becomes a last-day event-time window
    (documented divergence, SURVEY §2.10 W-1). The max-ts lookup is a 1-row
    broadcast join, not a driver collect."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx"))
    return (
        ev.join(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("mx") - F.expr("INTERVAL 1 DAY"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_type")
    )


@query(
    "latest_events_topk",
    oracle="""
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events
        ORDER BY ts DESC, event_id
        LIMIT 100
    """,
    tags=("A-10", "O-2", "O-3", "topk"),
)
def latest_events_topk(spark, sf_dir):
    """A-10/O-2 screenshot ring buffer: last 100 by event time desc
    (analysis.py:73,163-164). Spark plans TakeOrderedAndProject — no global
    sort at scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", "event_type")
        .orderBy(F.desc("ts"), "event_id")
        .limit(100)
    )


@query(
    "windowed_count",
    oracle="""
        SELECT COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        FROM events
        WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
          AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-17 00:00:00'
    """,
    tags=("A-8", "SRC-2", "agg"),
)
def windowed_count(spark, sf_dir):
    """A-8 global count over an event-time range — the streamer/test.py
    range-scan semantics (SRC-2: timestamps pushed to the source; here the
    predicate pushes into the parquet scan)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-17 00:00:00").cast("timestamp_ntz"))
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


@query(
    "per_user_summary",
    oracle="""
        SELECT user_id,
               COUNT(*) AS n,
               MIN_BY(event_type, event_id) AS first_event_type,
               COUNT(DISTINCT event_type) AS n_types
        FROM events
        GROUP BY user_id
    """,
    tags=("A-7", "agg"),
)
def per_user_summary(spark, sf_dir):
    """A-7 per-hostname summary with first-seen attribute (report.py:154-161).
    The reference's arrival-order first() is made deterministic as
    min_by(event_id) — SURVEY §7.7's documented divergence."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.min_by("event_type", "event_id").alias("first_event_type"),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "null_coalesce_projection",
    oracle="""
        SELECT event_id,
               COALESCE(NULLIF(event_type, 'error'), '-') AS event_type_clean,
               COALESCE(CAST(json_extract_string(props, '$.missing') AS VARCHAR), '-') AS missing_field
        FROM events
        ORDER BY event_id
        LIMIT 500
    """,
    tags=("P-3", "P-5", "F-12", "projection"),
)
def null_coalesce_projection(spark, sf_dir):
    """P-3 null→'-' display coalescing (report.py:53-55) and F-12's intended
    missing-value fallback, over a deterministic slice."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.coalesce(
                F.nullif(F.col("event_type"), F.lit("error")), F.lit("-")
            ).alias("event_type_clean"),
            F.coalesce(
                F.get_json_object("props", "$.missing"), F.lit("-")
            ).alias("missing_field"),
        )
        .orderBy("event_id")
        .limit(500)
    )


@query(
    "formatted_log_lines",
    oracle="""
        SELECT event_id,
               printf('%s %6d %10.2f %s', strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S'),
                      user_id, value, event_type) AS line
        FROM events
        ORDER BY event_id
        LIMIT 200
    """,
    tags=("P-4", "SNK-4", "projection"),
)
def formatted_log_lines(spark, sf_dir):
    """P-4 fixed-width crawl-log line rendering (report.py:57) via
    format_string — the console-sink projection."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.format_string(
                "%s %6d %10.2f %s",
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
                F.col("user_id"),
                F.col("value"),
                F.col("event_type"),
            ).alias("line"),
        )
        .orderBy("event_id")
        .limit(200)
    )


@query(
    "wayback_timestamps",
    oracle="""
        SELECT event_id,
               strftime(CAST(ts AS TIMESTAMP), '%Y%m%d%H%M%S') AS wayback_ts,
               strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%dT%H:00:00') AS hour_bucket
        FROM events
        ORDER BY event_id
        LIMIT 500
    """,
    tags=("F-4", "F-3", "projection"),
)
def wayback_timestamps(spark, sf_dir):
    """F-4 wayback 14-digit timestamp (streamer.py:47) + F-3 string hour
    bucket (streamer.py:104-110)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.date_format("ts", "yyyyMMddHHmmss").alias("wayback_ts"),
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd'T'HH:00:00").alias(
                "hour_bucket"
            ),
        )
        .orderBy("event_id")
        .limit(500)
    )


@query(
    "event_type_dist_users",
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    tags=("agg", "distinct"),
)
def event_type_dist_users(spark, sf_dir):
    """Distinct aggregation (engine surface; reference has none — SURVEY
    §2.5 notes no distinct-agg)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


@query(
    "sessionized_set_ops",
    oracle="""
        WITH t AS (
            SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
        )
        SELECT user_id FROM t WHERE event_type = 'click' AND n >= 14
        INTERSECT
        SELECT user_id FROM t WHERE event_type = 'purchase' AND n >= 14
        EXCEPT
        SELECT user_id FROM t WHERE event_type = 'error' AND n >= 16
    """,
    tags=("setop",),
)
def sessionized_set_ops(spark, sf_dir):
    """Set operations (engine surface, SURVEY §2.8): heavy clickers who are
    also heavy purchasers, minus heavy error producers."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    clicks = t.filter((F.col("event_type") == "click") & (F.col("n") >= 14)).select("user_id")
    buys = t.filter((F.col("event_type") == "purchase") & (F.col("n") >= 14)).select("user_id")
    errs = t.filter((F.col("event_type") == "error") & (F.col("n") >= 16)).select("user_id")
    # SQL precedence: INTERSECT binds tighter than EXCEPT, and both are
    # distinct-based — subtract() is Spark's EXCEPT DISTINCT.
    return clicks.intersect(buys).subtract(errs)


@query(
    "rollup_day_reaggregation",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_start,
                   event_type,
                   COUNT(*) AS cnt,
                   SUM(CAST(value AS DECIMAL(18,6))) AS sum_value,
                   MIN(CAST(value AS DECIMAL(18,6))) AS min_value,
                   MAX(CAST(value AS DECIMAL(18,6))) AS max_value
            FROM events
            GROUP BY 1, 2
        )
        SELECT CAST(date_trunc('day', bucket_start) AS TIMESTAMP) AS bucket_start,
               event_type,
               CAST(SUM(cnt) AS BIGINT) AS cnt,
               ROUND(CAST(SUM(sum_value) AS DOUBLE), 4) AS sum_value,
               CAST(MIN(min_value) AS DOUBLE) AS min_value,
               CAST(MAX(max_value) AS DOUBLE) AS max_value,
               ROUND(CAST(SUM(sum_value) AS DOUBLE) / SUM(cnt), 6) AS avg_value
        FROM hourly
        GROUP BY 1, 2
    """,
    tags=("extension", "rollup", "agg"),
)
def rollup_day_reaggregation(spark, sf_dir):
    """Materialized-rollup mergeability as an oracle-checked query: build
    hour-grain associative partials (operators/rollup.py), re-aggregate to
    day grain, derive avg from the partials — the exact computation
    update_rollup + rollup_to_grain run against the stored table, so the
    oracle pins merge(partials) == direct aggregation.

    The metric is cast to DECIMAL(18,6) before the partials so every sum
    is EXACT and therefore order-insensitive: double sums depend on the
    partial-aggregation merge order, and a group whose 6-decimal avg sat
    on a rounding boundary (56.4009375) hash-mismatched DuckDB by 1 ulp.
    Final columns cast back to DOUBLE — deterministic from exact inputs,
    schema unchanged. The rollup operators themselves are type-agnostic;
    production rollups keep native doubles (order sensitivity there is a
    reporting concern, not a merge-correctness one)."""
    from ..operators.rollup import rollup_rows, rollup_to_grain

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    hourly = rollup_rows(ev, "ts", ["event_type"], ["value"], grain="hour")
    daily = rollup_to_grain(hourly, "day", ["event_type"], ["value"])
    return daily.select(
        "bucket_start",
        "event_type",
        "cnt",
        F.round(F.col("sum_value").cast("double"), 4).alias("sum_value"),
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
        F.round(F.col("sum_value").cast("double") / F.col("cnt"), 6).alias(
            "avg_value"
        ),
    )


@query(
    "hist_median_by_type",
    oracle="""
        WITH b AS (
            SELECT event_type,
                   CASE WHEN value IS NULL OR value < 0 THEN 1
                        WHEN value >= 400 THEN 42
                        ELSE CAST(FLOOR(value / 400.0 * 40) AS INT) + 2
                   END AS bin
            FROM events
        ),
        c AS (SELECT event_type, bin, COUNT(*) AS n FROM b GROUP BY 1, 2),
        w AS (
            SELECT event_type, bin,
                   SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
                   SUM(n) OVER (PARTITION BY event_type) AS total
            FROM c
        ),
        sel AS (
            SELECT event_type, MIN(bin) AS bin
            FROM w
            WHERE cum >= CEIL(total * 0.5)
            GROUP BY 1
        )
        SELECT event_type,
               ROUND(CAST(CASE WHEN bin <= 1 THEN 0.0
                               WHEN bin >= 42 THEN 400.0
                               ELSE (bin - 1.5) * 10.0 END AS DOUBLE),
                     6) AS est_median
        FROM sel
    """,
    tags=("extension", "rollup", "histogram", "agg"),
)
def hist_median_by_type(spark, sf_dir):
    """Histogram-partial quantile estimation under the oracle gate: build
    the rollup's mergeable fixed-bin histograms (operators/rollup.py) at
    hour grain, merge them across all buckets per event_type (elementwise
    sum — the rollup merge op), and answer the median from the bins via
    quantile_from_hist. The DuckDB oracle re-derives the identical
    binning/cumulative-count arithmetic in SQL, pinning the estimator
    cross-engine."""
    from ..operators.rollup import quantile_from_hist, rollup_rows

    LO, HI, BINS = 0.0, 400.0, 40
    ev = load_table(spark, sf_dir, "events")
    hourly = rollup_rows(
        ev, "ts", ["event_type"], [], grain="hour", hist={"value": (LO, HI, BINS)}
    )
    merged = hourly.groupBy("event_type").agg(
        F.array(
            *[
                F.sum(F.element_at("hist_value", i))
                for i in range(1, BINS + 3)
            ]
        ).alias("hist_value")
    )
    return merged.select(
        "event_type",
        F.round(
            quantile_from_hist("hist_value", LO, HI, BINS, 0.5), 6
        ).alias("est_median"),
    )


@query(
    "variant_typed_extraction",
    oracle="""
        WITH j AS (
            SELECT event_id,
                   '{"meta": {"status": '
                   || CAST(json_extract(props, '$.k') AS VARCHAR)
                   || ', "host": "h' || CAST(user_id % 50 AS VARCHAR)
                   || '.example"}, "tags": ['
                   || CAST(event_id % 5 AS VARCHAR) || ', '
                   || CAST(event_id % 3 AS VARCHAR) || ']}' AS js
            FROM events
        )
        SELECT event_id,
               json_extract(js, '$.meta.status')::INTEGER AS status,
               json_extract_string(js, '$.meta.host') AS host,
               json_extract(js, '$.tags[1]')::BIGINT AS second_tag
        FROM j
    """,
    tags=("P-1", "json", "variant", "spark4", "extension"),
)
def variant_typed_extraction(spark, sf_dir):
    """P-1 JSON deserialization through Spark 4's VARIANT type: nested
    documents synthesized from event columns are parsed ONCE into a
    variant (``parse_json`` — a binary-encoded semi-structured value,
    not a string re-parsed per path) and then field-extracted with
    typed ``variant_get`` paths, including an array index. The oracle
    walks the identical paths with DuckDB's JSON functions. At 100 TB
    this is the modern shape for ragged crawl metadata: one parse per
    row, per-path extraction in codegen, no per-path string re-parse
    and no UDFs."""
    ev = load_table(spark, sf_dir, "events")
    js = F.concat(
        F.lit('{"meta": {"status": '),
        F.get_json_object("props", "$.k"),
        F.lit(', "host": "h'),
        (F.col("user_id") % 50).cast("string"),
        F.lit('.example"}, "tags": ['),
        (F.col("event_id") % 5).cast("string"),
        F.lit(", "),
        (F.col("event_id") % 3).cast("string"),
        F.lit("]}"),
    )
    v = F.parse_json(js)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.meta.status", "int").alias("status"),
        F.variant_get(v, "$.meta.host", "string").alias("host"),
        F.variant_get(v, "$.tags[1]", "bigint").alias("second_tag"),
    )
