"""Time-series regularization: per-key gap filling (densify a bucketed
series so every step in [min, max] has a row) and forward fill (carry the
last known observation across the gaps).

The dashboard/feature-engineering primitive the rollup family feeds: a
rolled-up series has NO row for an empty bucket, which silently breaks
moving averages, charts, and join-by-time downstream — densification
makes absence explicit (zero or null), and forward fill implements the
last-observation-carried-forward semantics sensor/price series need.

Scale (100 TB of series): the dense axis is generated PER KEY from that
key's own [min, max] span (one partial-agg pass), exploded as slim
(key, bucket) pairs — span/step rows per key, never a global calendar
cross join. The left join back to observations shuffles on (key,
bucket) and the forward-fill window on the key — four bounded exchanges
for the whole densify+ffill pipeline (pinned). Keys with century-long spans at
second granularity explode accordingly — cap the span or coarsen the
step upstream (documented dial, same argument as interval.py's
bucket_width).

No reference counterpart (driver-mandated analytics extension).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["fill_gaps", "forward_fill", "rolling_anomalies"]


def fill_gaps(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    step: int,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Densify an integer-bucketed series per key: one row for EVERY
    ``step``-spaced bucket between that key's min and max observed
    buckets. Missing rows carry NULL for observation columns, overridden
    per column by ``fill`` (e.g. ``{"n": 0}``).

    Buckets must be exact multiples of a common phase per key (true for
    floor-bucketed timestamps); the dense axis is anchored at the
    observed min."""
    spans = df.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    dense = spans.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
        ).alias(bucket_col),
    )
    out = dense.join(df, [*key_cols, bucket_col], "left")
    for col, v in (fill or {}).items():
        out = out.withColumn(
            col, F.coalesce(F.col(col), F.lit(v).cast(dict(df.dtypes)[col]))
        )
    return out


def forward_fill(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    cols: list[str],
    suffix: str = "_ffill",
) -> DataFrame:
    """Last-observation-carried-forward per key: for each listed column,
    add ``<col><suffix>`` = the latest non-null value at or before this
    row in ``order_col`` order (rows before the first observation stay
    null). One window over the key partitioning."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(F.col(c), ignorenulls=True).over(w)
        )
    return out


def rolling_anomalies(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    lookback: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detection per series: each row's
    ``value_col`` is scored against the mean/std of the PREVIOUS
    ``lookback`` rows (the row itself excluded — a spike must not mask
    itself), flagging |z| > ``z_threshold``.

    Adds: roll_cnt, roll_mean, roll_std (rounded 6), zscore (rounded 4,
    null while roll_std is 0 or the window is empty), is_anomaly. A row
    deviating from a ZERO-variance baseline is anomalous even though its
    z is undefined (any deviation from a constant history is infinitely
    many σ); an empty window is never anomalous.

    Determinism under the cross-engine hash gate: ``value_col`` must be a
    DECIMAL — the trailing sum and sum-of-squares are then EXACT
    (order-insensitive; engines disagree on float window-sum association:
    segment trees vs running folds), and every double below derives from
    those exact partials through a fixed expression shape (one division /
    sqrt chain per row). A double value column would flake by ulps.

    Scale: one window over the series-key partitioning — the same
    exchange the densify/ffill pipeline already uses, so composing
    fill_gaps → rolling_anomalies adds NO shuffle. Rows-frame windows
    stream in order per key; lookback bounds the frame memory."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col)
    cnt = F.count(v).over(w)
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    # engines disagree on double x/0 (NaN vs error) — guard empty windows
    mean = F.when(
        cnt > 0, s1.cast("double") / cnt
    )
    var = F.when(
        cnt > 0,
        F.greatest(
            (s2.cast("double") - (s1.cast("double") * s1.cast("double")) / cnt)
            / cnt,
            F.lit(0.0),
        ),
    )
    std = F.sqrt(var)
    z = F.when(
        (cnt > 0) & (std > 0), (v.cast("double") - mean) / std
    )
    # a zero-variance baseline leaves z undefined — but ANY deviation from
    # a perfectly constant history is infinitely many σ, so flag it
    const_break = (cnt > 0) & (std == 0) & (v.cast("double") != mean)
    return (
        df.withColumn("roll_cnt", cnt)
        .withColumn("roll_mean", F.round(mean, 6))
        .withColumn("roll_std", F.round(std, 6))
        .withColumn("zscore", F.round(z, 4))
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(z) > F.lit(z_threshold), F.lit(False))
            | F.coalesce(const_break, F.lit(False)),
        )
    )
