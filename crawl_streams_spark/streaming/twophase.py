"""Staged two-phase fold: EXACTLY-ONCE foreachBatch state maintenance on
plain parquet, closing the crash window the marker-only protocol left
open (VERDICT r6 item 3).

The marker-only discipline (merge table, then touch a per-batch marker)
has two residual failure modes:

1. **Double-count**: a crash between the merge and the marker replays
   the batch on restart, and a sum-like merge (CMS counts, MG counters,
   MRL weights, rollup partials) re-applies it.
2. **Torn live table**: ``mode("overwrite")`` deletes the existing files
   before writing; a crash mid-write leaves the live table partial, and
   the replayed merge then folds the batch into a table that lost state
   — silent data loss even for idempotent-by-algebra merges (HLL max,
   KMV min), whose idempotence covers re-merging, not torn writes.

This module closes both with a write-ahead *intent* (the classic
two-phase pattern; Spark's own file sink does the same with its
transaction log, and a transactional table format subsumes it — since
round 9 the repo HAS one: operators/txlog.py::TxTable, whose atomic
log claims + ``txn`` idempotence tokens provide the same exactly-once
fold for table-shaped state, and since round 10 the funnel snapshot
RUNS on that path (streaming/txsink.py +
funnel.stream_funnel_snapshot_tx, crash-matrix-proven); this staged
protocol remains for POST-STATE folds that aren't key-mergeable
tables — the sketch folds, whose state is one unkeyed blob):

- **Phase 1 (stage)**: compute the merged POST-STATE of everything the
  batch touches — reading only the live table and the batch — and write
  it to a batch-stamped staging directory inside the stream checkpoint.
  Commit the stage with an atomic ``_COMMITTED`` marker file. The live
  table is not modified in this phase.
- **Phase 2 (apply)**: overwrite the live table FROM the staged
  post-state (never re-merging), touch the applied marker, delete the
  staging directory.

Crash matrix — every cut point recovers to exactly-once:

- mid-stage (no ``_COMMITTED``): the live table is untouched; the replay
  recomputes the stage from scratch (``overwrite`` clears the partial).
- after ``_COMMITTED``, before/during apply (including a TORN live
  table): the replay sees the committed stage and re-applies it
  verbatim — the apply is a pure overwrite of post-state, so repeating
  it is idempotent and a torn table is rebuilt, never read.
- after the applied marker: the replay is a no-op; leftover staging is
  garbage-collected (same batch id, or any older sibling — the stream
  only advances past a batch after its fold returned, so older staging
  dirs are always orphans).
- after the checkpoint commit: no replay; orphan staging (crash between
  marker and cleanup) is collected by the next batch's fold.

Staging cost is O(touched state), not O(history): sketch tables are
sketch-sized by construction, and the rollup stages only the touched
date partitions' merged partials.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession

from ..fs import hadoop_delete, hadoop_exists, hadoop_list, hadoop_touch

__all__ = ["staged_exactly_once_fold", "SimulatedCrash"]

_COMMIT_MARK = "_COMMITTED"


class SimulatedCrash(RuntimeError):
    """Raised by the crash-injection seam (tests only): kills the fold at
    a chosen protocol point so recovery can be proven exactly-once at
    every cut (VERDICT r6 item 3)."""


def _maybe_crash(crash_point: str | None, here: str) -> None:
    if crash_point == here:
        raise SimulatedCrash(here)


def _gc_orphan_staging(spark: SparkSession, staging_root: str, batch_id: int) -> None:
    """Delete staging dirs of batches OLDER than the current one: the
    stream advanced past them, so they are applied-but-uncleaned orphans
    (crash between marker and cleanup) or uncommitted wrecks — both dead."""
    for child in hadoop_list(spark, staging_root):
        try:
            if int(child) < batch_id:
                hadoop_delete(spark, f"{staging_root}/{child}")
        except ValueError:
            continue


def staged_exactly_once_fold(
    spark: SparkSession,
    batch_id: int,
    checkpoint: str,
    name: str,
    stage: Callable[[SparkSession, str], bool],
    apply: Callable[[SparkSession, str], None],
    _crash_point: str | None = None,
) -> bool:
    """Run one micro-batch through the staged two-phase protocol.

    ``stage(spark, staging_path)`` writes the merged post-state parquet
    to ``staging_path`` (overwrite mode; reads the live table + batch;
    must NOT modify the live table) and returns False when the batch
    touches nothing (the fold then short-circuits to a marker).
    ``apply(spark, staging_path)`` overwrites the live state from the
    staged post-state; it must be a pure replay-safe overwrite (no
    merging). Returns True when an apply ran, False on replay no-ops.

    Marker and staging paths live inside the stream checkpoint, so their
    lifetime — and the batch-id namespace — is exactly the stream's.

    ``_crash_point`` is the crash-injection seam for the recovery tests:
    one of ``"after_stage_write"`` / ``"after_commit"`` /
    ``"after_apply"`` / ``"after_marker"`` raises SimulatedCrash at that
    protocol point (never set in production).
    """
    ckpt = checkpoint.rstrip("/")
    marker = f"{ckpt}/applied_{name}/{batch_id}"
    staging_root = f"{ckpt}/staging_{name}"
    staging = f"{staging_root}/{batch_id}"
    _gc_orphan_staging(spark, staging_root, batch_id)
    if hadoop_exists(spark, marker):
        hadoop_delete(spark, staging)
        return False
    if not hadoop_exists(spark, f"{staging}/{_COMMIT_MARK}"):
        if not stage(spark, staging):
            hadoop_touch(spark, marker)
            return False
        _maybe_crash(_crash_point, "after_stage_write")
        hadoop_touch(spark, f"{staging}/{_COMMIT_MARK}")
    _maybe_crash(_crash_point, "after_commit")
    apply(spark, staging)
    _maybe_crash(_crash_point, "after_apply")
    hadoop_touch(spark, marker)
    _maybe_crash(_crash_point, "after_marker")
    hadoop_delete(spark, staging)
    return True
