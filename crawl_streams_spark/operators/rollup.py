"""Incremental rollup maintenance — materialized time-grain aggregates kept
up to date per ingest batch (the continuous-aggregate / "hypertable rollup"
pattern).

No reference counterpart: the reference recomputes its host-stats snapshot
from in-memory state on every emit (analysis.py:160-173, 227-236) and its
state is lost on restart. The engine-native durable form is a *rollup
table*: per-(time bucket × dims) partial aggregates stored as
date-partitioned parquet, merged incrementally as batches arrive.

Why partials, not finals: every stored metric is an associative partial
(count / sum / min / max), so

    merge(rollup(A), rollup(B)) == rollup(A ∪ B)

holds exactly and an append-only ingest never rescans history — the cost of
an update is O(batch) + O(rows in the touched date partitions), independent
of table age. Derived metrics that don't merge (avg) are computed at query
time from the partials (sum/cnt).

At 100 TB this is the difference between a dashboard query that scans the
fact table (hours) and one that scans the rollup (seconds): the rollup is
smaller by the bucket×dims cardinality ratio, date-partitioned for pruning,
and clustered by (bucket, dims) for row-group skipping. The same partials
re-aggregate to any coarser grain (hour → day → month) without touching the
fact table (``rollup_to_grain``).

Update flow (``update_rollup``) mirrors ``layout.upsert_partitions`` but
*combines* instead of replacing:

    aggregate batch to grain → touched dates → read those partitions →
    union + re-aggregate partials → dynamic-partition overwrite

Untouched date partitions are never rewritten (their files stay
byte-identical — asserted in tests/test_rollup.py).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .layout import _partition_overwrite, clustered_write

__all__ = [
    "rollup_rows",
    "merge_rollup",
    "write_rollup",
    "update_rollup",
    "stream_rollup",
    "rollup_to_grain",
]

#: partition column (daily directories — pruning unit for maintenance and
#: reads) and bucket column (the rollup grain inside a partition).
_DATE_COL = "bucket_date"
_BUCKET_COL = "bucket_start"


def rollup_rows(
    df: DataFrame,
    ts_col: str,
    dims: list[str],
    metrics: list[str],
    grain: str = "hour",
) -> DataFrame:
    """Aggregate raw rows to (bucket_date, bucket_start, *dims) partials.

    One shuffle on the rollup key; map-side partial aggregation makes the
    exchange carry (key, partial) rows only — constant-size relative to
    input, the property that keeps this viable at 100 TB.
    """
    bucket = F.date_trunc(grain, F.col(ts_col))
    aggs = [F.count("*").alias("cnt")]
    for m in metrics:
        aggs += [
            F.sum(m).alias(f"sum_{m}"),
            F.min(m).alias(f"min_{m}"),
            F.max(m).alias(f"max_{m}"),
        ]
    return df.groupBy(
        F.to_date(bucket).alias(_DATE_COL),
        bucket.alias(_BUCKET_COL),
        *dims,
    ).agg(*aggs)


def merge_rollup(
    a: DataFrame, b: DataFrame, dims: list[str], metrics: list[str]
) -> DataFrame:
    """Combine two rollups over the same key set: re-aggregate the union.
    Exact because every stored column is an associative partial."""
    aggs = [F.sum("cnt").alias("cnt")]
    for m in metrics:
        aggs += [
            F.sum(f"sum_{m}").alias(f"sum_{m}"),
            F.min(f"min_{m}").alias(f"min_{m}"),
            F.max(f"max_{m}").alias(f"max_{m}"),
        ]
    return (
        a.unionByName(b)
        .groupBy(_DATE_COL, _BUCKET_COL, *dims)
        .agg(*aggs)
    )


def write_rollup(
    df: DataFrame,
    path: str,
    ts_col: str,
    dims: list[str],
    metrics: list[str],
    grain: str = "hour",
) -> None:
    """Full (re)build: aggregate and write date-partitioned, clustered by
    (bucket, dims) so grain scans skip row groups."""
    clustered_write(
        rollup_rows(df, ts_col, dims, metrics, grain),
        path,
        partition_by=[_DATE_COL],
        cluster_by=[_BUCKET_COL, *dims],
    )


def update_rollup(
    spark: SparkSession,
    new_events: DataFrame,
    path: str,
    ts_col: str,
    dims: list[str],
    metrics: list[str],
    grain: str = "hour",
) -> int:
    """Incrementally fold a batch of new raw rows into the rollup at
    ``path``. Returns the number of date partitions rewritten.

    The batch is aggregated first (it shrinks by the grain ratio before
    anything touches the table), then merged with only the touched date
    partitions and written back under dynamic partition overwrite —
    untouched dates are never read or rewritten.
    """
    batch = rollup_rows(new_events, ts_col, dims, metrics, grain)
    # The batch rollup is used twice (touched-date listing + merge); cache
    # so the raw-event aggregation runs once.
    batch.persist()
    try:
        dates = [r[0] for r in batch.select(_DATE_COL).distinct().collect()]
        if not dates:
            return 0
        if os.path.exists(path):
            existing = spark.read.parquet(path).filter(
                F.col(_DATE_COL).isin(dates)
            )
            merged = merge_rollup(existing, batch, dims, metrics)
        else:
            merged = batch
        out = merged.repartition(_DATE_COL).sortWithinPartitions(
            _DATE_COL, _BUCKET_COL, *dims
        )
        with _partition_overwrite(spark):
            out.write.mode("overwrite").partitionBy(_DATE_COL).parquet(path)
        return len(dates)
    finally:
        batch.unpersist()


def stream_rollup(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str,
    dims: list[str],
    metrics: list[str],
    grain: str = "hour",
    available_now: bool = False,
    exactly_once: bool = True,
):
    """Streaming maintenance: fold every micro-batch into the rollup via
    foreachBatch → update_rollup. This is the durable replacement for the
    reference's in-memory snapshot loop (analysis.py:227-236): state lives
    in the rollup table (restart-safe via the checkpoint), and each
    trigger's cost is proportional to the micro-batch, not the history.

    foreachBatch alone is at-least-once: a crash between the merge and the
    checkpoint commit replays the batch on restart and double-counts it.
    With ``exactly_once`` a per-batch marker file (inside the checkpoint
    directory, so its lifetime — and the batch-id namespace — is exactly
    the stream's) records completed merges and the replayed batch becomes
    a no-op. The residual window (crash between merge and marker write)
    is the same one Spark's own file sink closes with its transaction log;
    closing it fully needs a transactional table format.
    """
    markers = os.path.join(checkpoint, "applied_rollup_batches")

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(markers, str(batch_id))
        if exactly_once and os.path.exists(marker):
            return
        update_rollup(
            batch_df.sparkSession, batch_df, path, ts_col, dims, metrics, grain
        )
        if exactly_once:
            os.makedirs(markers, exist_ok=True)
            with open(marker, "w"):
                pass

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollup_to_grain(
    rollup: DataFrame,
    grain: str,
    dims: list[str],
    metrics: list[str],
) -> DataFrame:
    """Re-aggregate stored partials to a coarser grain (e.g. hour → day)
    and derive the non-mergeable metrics (avg) from the partials. Never
    touches the fact table."""
    aggs = [F.sum("cnt").alias("cnt")]
    for m in metrics:
        aggs += [
            F.sum(f"sum_{m}").alias(f"sum_{m}"),
            F.min(f"min_{m}").alias(f"min_{m}"),
            F.max(f"max_{m}").alias(f"max_{m}"),
        ]
    out = rollup.groupBy(
        F.date_trunc(grain, F.col(_BUCKET_COL)).alias(_BUCKET_COL), *dims
    ).agg(*aggs)
    for m in metrics:
        out = out.withColumn(f"avg_{m}", F.col(f"sum_{m}") / F.col("cnt"))
    return out
