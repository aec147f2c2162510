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
