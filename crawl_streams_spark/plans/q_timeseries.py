"""Time-series regularization under the cross-engine gate
(operators/timeseries.py): both engines densify the same per-type hourly
series over each type's own [min, max] span and forward-fill the gaps —
the gate certifies the dense-axis generation (per-key sequence), the
zero-fill, AND the carried-forward values."""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators import timeseries as TS
from ..tables import load_table
from .registry import query

_HOUR_US = 3600 * 1_000_000


@query(
    "hourly_series_filled",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type,
                   (epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US})
                       * {_HOUR_US} AS bucket_us,
                   COUNT(*)::BIGINT AS n_events,
                   ROUND(SUM(value), 4) AS hour_value
            FROM events
            GROUP BY 1, 2
        ),
        spans AS (
            SELECT event_type, MIN(bucket_us) AS lo, MAX(bucket_us) AS hi
            FROM hourly GROUP BY event_type
        ),
        dense AS (
            SELECT s.event_type,
                   unnest(generate_series(s.lo, s.hi, {_HOUR_US})) AS bucket_us
            FROM spans s
        ),
        joined AS (
            SELECT d.event_type, d.bucket_us,
                   COALESCE(h.n_events, 0) AS n_events,
                   h.hour_value
            FROM dense d LEFT JOIN hourly h USING (event_type, bucket_us)
        )
        SELECT event_type, bucket_us, n_events,
               last_value(hour_value IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket_us
                   ROWS UNBOUNDED PRECEDING
               ) AS hour_value_ffill
        FROM joined
    """,
    tags=("timeseries", "gap-fill", "extension"),
)
def hourly_series_filled(spark, sf_dir):
    """Per-event-type hourly counts densified over each type's own span
    (missing hours appear with n_events = 0) and the hourly value sum
    forward-filled across the gaps — the regularized series a dashboard
    or window-feature job consumes. The span agg, densify join, and
    forward-fill window all share the event_type partitioning."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        # integer div, not float division + cast: a double quotient a hair
        # below an integer boundary can round UP and misplace the bucket
        (
            F.expr(f"unix_micros(cast(ts as timestamp)) div {_HOUR_US}")
            * F.lit(_HOUR_US)
        ).alias("bucket_us"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("hour_value"),
    )
    dense = TS.fill_gaps(
        hourly,
        key_cols=["event_type"],
        bucket_col="bucket_us",
        step=_HOUR_US,
        fill={"n_events": 0},
    )
    filled = TS.forward_fill(
        dense,
        key_cols=["event_type"],
        order_col="bucket_us",
        cols=["hour_value"],
    )
    return filled.select(
        "event_type", "bucket_us", "n_events", "hour_value_ffill"
    )


@query(
    "hourly_value_anomalies",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type,
                   (epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US})
                       * {_HOUR_US} AS bucket_us,
                   COUNT(*)::BIGINT AS n_events,
                   CAST(ROUND(SUM(value), 4) AS DECIMAL(18,4)) AS hour_value
            FROM events
            GROUP BY 1, 2
        ),
        spans AS (
            SELECT event_type, MIN(bucket_us) AS lo, MAX(bucket_us) AS hi
            FROM hourly GROUP BY event_type
        ),
        dense AS (
            SELECT s.event_type,
                   unnest(generate_series(s.lo, s.hi, {_HOUR_US})) AS bucket_us
            FROM spans s
        ),
        j AS (
            SELECT d.event_type, d.bucket_us,
                   COALESCE(h.n_events, 0) AS n_events,
                   COALESCE(h.hour_value, CAST(0 AS DECIMAL(18,4)))
                       AS hour_value
            FROM dense d LEFT JOIN hourly h USING (event_type, bucket_us)
        ),
        roll AS (
            SELECT *,
                   COUNT(hour_value) OVER w AS roll_cnt,
                   SUM(hour_value) OVER w AS s1,
                   SUM(hour_value * hour_value) OVER w AS s2
            FROM j
            WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
                         ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        ),
        stats AS (
            SELECT event_type, bucket_us, n_events, hour_value, roll_cnt,
                   CASE WHEN roll_cnt > 0
                        THEN s1::DOUBLE / roll_cnt END AS mean,
                   CASE WHEN roll_cnt > 0
                        THEN greatest((s2::DOUBLE
                                       - (s1::DOUBLE * s1::DOUBLE) / roll_cnt)
                                      / roll_cnt, 0.0) END AS var
            FROM roll
        ),
        fin AS (
            SELECT *,
                   CASE WHEN roll_cnt > 0 AND sqrt(var) > 0
                        THEN (hour_value::DOUBLE - mean) / sqrt(var)
                   END AS z
            FROM stats
        )
        SELECT event_type, bucket_us, n_events,
               hour_value::DOUBLE AS hour_value, roll_cnt,
               ROUND(mean, 6) AS roll_mean,
               ROUND(sqrt(var), 6) AS roll_std,
               ROUND(z, 4) AS zscore,
               COALESCE(abs(z) > 3.0, FALSE)
               OR COALESCE(roll_cnt > 0 AND sqrt(var) = 0
                           AND hour_value::DOUBLE <> mean, FALSE)
                   AS is_anomaly
        FROM fin
    """,
    tags=("timeseries", "anomaly", "window", "extension"),
)
def hourly_value_anomalies(spark, sf_dir):
    """Trailing-24h z-score anomaly detection over each event type's
    densified hourly value series (operators/timeseries.py::
    rolling_anomalies after fill_gaps — missing hours are true zeros and
    SHOULD score anomalous against a busy baseline). The hourly sums are
    DECIMAL-exact so the trailing window partials are order-insensitive;
    every double derives from exact partials through one fixed
    expression chain per row — the discipline that lets a rolling-window
    STATISTIC sit under the cross-engine hash gate. Densify, fill, and
    the rolling window all share the event_type partitioning: one
    exchange for the whole pipeline."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (
            F.expr(f"unix_micros(cast(ts as timestamp)) div {_HOUR_US}")
            * F.lit(_HOUR_US)
        ).alias("bucket_us"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).cast("decimal(18,4)").alias("hour_value"),
    )
    dense = TS.fill_gaps(
        hourly,
        key_cols=["event_type"],
        bucket_col="bucket_us",
        step=_HOUR_US,
        fill={"n_events": 0, "hour_value": 0},
    )
    scored = TS.rolling_anomalies(
        dense,
        key_cols=["event_type"],
        order_col="bucket_us",
        value_col="hour_value",
        lookback=24,
        z_threshold=3.0,
    )
    return scored.select(
        "event_type",
        "bucket_us",
        "n_events",
        F.col("hour_value").cast("double").alias("hour_value"),
        "roll_cnt",
        "roll_mean",
        "roll_std",
        "zscore",
        "is_anomaly",
    )


@query(
    "decayed_event_counts",
    oracle="""
        WITH ref AS (
            SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS ref_us
            FROM events
        ),
        w AS (
            SELECT event_type,
                   ROUND(exp(-((ref_us - epoch_us(CAST(ts AS TIMESTAMP)))
                               ::DOUBLE / 86400000000.0)
                             * 0.6931471805599453), 8)::DECIMAL(12,8) AS wt
            FROM events CROSS JOIN ref
        )
        SELECT event_type,
               COUNT(*)::BIGINT AS n_events,
               ROUND(SUM(wt)::DOUBLE, 4) AS decayed_count
        FROM w
        GROUP BY event_type
    """,
    tags=("timeseries", "decay", "extension"),
)
def decayed_event_counts(spark, sf_dir):
    """Exponentially time-decayed event counts per type with a one-day
    half-life, anchored at the newest event (the freshness-weighted
    popularity counter behind trending rankings: an event contributes
    2^(-age_days), so yesterday's event counts half). The decayed count
    is an ASSOCIATIVE sum — partial-agg'd map-side like any plain count,
    and mergeable across ingest batches by the same algebra the rollup
    family uses — which is why it replaces windowed recount jobs at
    100 TB. Each weight is one exp() per row rounded to 8 and summed as
    DECIMAL, so the cross-engine hash is exact; the anchor rides a
    broadcast single-row cross join (no driver collect)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ref = ev.agg(F.max(us).alias("ref_us"))
    wt = F.round(
        F.exp(
            -((F.col("ref_us") - us).cast("double") / 86400000000.0)
            * 0.6931471805599453
        ),
        8,
    ).cast("decimal(12,8)")
    return (
        ev.crossJoin(F.broadcast(ref))
        .select("event_type", wt.alias("wt"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("wt").cast("double"), 4).alias("decayed_count"),
        )
    )
