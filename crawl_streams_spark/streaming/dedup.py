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

__all__ = ["dedup_stream", "dedup_stream_unbounded"]


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
