"""Streaming deduplication — the W-6 idempotence concern generalized to
unbounded streams.

The reference relies on the downstream crawler to drop replayed launch
messages by their embedded launchTimestamp (README.md:43, launcher.py:192);
here the engine itself suppresses duplicates at ingestion:

- ``dedup_stream``: state-bounded exact dedup via
  ``dropDuplicatesWithinWatermark`` — a key's state is evictable once the
  watermark passes its event time, so state size tracks the duplication
  window, not stream history. This is the only dedup that survives an
  unbounded 100 TB/day stream.
- ``dedup_stream_unbounded``: plain ``dropDuplicates`` for bounded
  backfills (availableNow drains) where replaying all keys in state is
  acceptable.

Batch dedup (exact/MinHash/SimHash) lives in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.iterate import unpin

__all__ = [
    "dedup_stream",
    "dedup_stream_unbounded",
    "stream_near_dedup",
]


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    event_time_col: str = "timestamp",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate records arriving within ``delay`` of each other.

    Duplicates separated by more than the watermark delay are NOT
    suppressed (their state has been evicted) — the contract is "no dupes
    within the replay window", matching the reference's hourly-relaunch
    idempotence (launch_ts is hour-derived, so replays land well inside any
    sane delay).
    """
    return df.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        keys
    )


def dedup_stream_unbounded(df: DataFrame, keys: list[str]) -> DataFrame:
    """Exact dedup with unbounded state — bounded/backfill streams only."""
    return df.dropDuplicates(keys)


def stream_near_dedup(
    stream_df: DataFrame,
    output_path: str,
    index_path: str,
    checkpoint: str,
    *,
    content: str = "text",
    key: str = "doc_id",
    threshold: float = 0.8,
    available_now: bool = False,
    **minhash_kw,
):
    """Streaming NEAR-duplicate admission: each micro-batch runs the
    cross-batch MinHash pipeline (operators/dedup.py::
    incremental_minhash_dedup) against the persistent signature index and
    appends only admitted (novel) documents to ``output_path``.

    foreachBatch on purpose: near-dup state is a *joinable index*
    (band/signature rows), not per-key state — Structured Streaming's
    stateful operators can't express an LSH band join, and the index
    parquet doubles as the batch pipeline's index, so batch backfills and
    the live stream share one admission history.

    Replay safety: the checkpoint makes foreachBatch ids stable across
    restarts, and that id is passed straight through as the operator's
    ``batch_id`` — the index write is a dynamic overwrite of the batch's
    own partition and the cross-batch check ignores the batch's own index
    rows, so a replayed micro-batch recomputes the identical admitted set
    (instead of colliding with its own signatures and being silently
    dropped). The output write is likewise partitioned by batch id and
    dynamically overwritten, so index and output are BOTH idempotent under
    replay — effectively exactly-once end to end. Output rows therefore
    carry a ``batch_id`` provenance column.
    """
    import pyspark.sql.functions as F

    from ..operators.dedup import incremental_minhash_dedup

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        admitted = incremental_minhash_dedup(
            batch_df.sparkSession,
            batch_df,
            index_path,
            content=content,
            key=key,
            threshold=threshold,
            batch_id=batch_id,
            **minhash_kw,
        )
        try:
            admitted.withColumn("batch_id", F.lit(str(batch_id))).write.partitionBy(
                "batch_id"
            ).option("partitionOverwriteMode", "dynamic").mode("overwrite").parquet(
                output_path
            )
        finally:
            # release the banded/admitted localCheckpoints this batch
            # pinned — on a long stream, waiting for driver GC pressures
            # executor storage memory (ADVICE r6)
            unpin(admitted)

    writer = (
        stream_df.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
