"""APPLY CHANGES INTO — maintain a downstream replica of a TxTable
from its streaming Change Data Feed, exactly-once.

The missing half of the CDC story: ``sources/txtable.py`` can stream a
table's row-level changes (``read_change_feed=true``), and
``TxTable.merge_into(deletes=...)`` can land upserts AND deletes in one
atomic commit — this module wires them into the standard incremental
materialization pattern (the Delta Live Tables APPLY CHANGES INTO
idea, public semantics): per micro-batch, reduce the feed to its NET
effect per key, then fold that effect into the target table under a
per-batch txn token.

Net-effect reduction (``net_changes``): drop ``update_preimage`` rows
(they never apply), then keep each key's change with the highest
``_commit_version`` — preferring the row-bearing change within a
version, so the file-granular delete+insert pairs a derived
OVERWRITE/RESTORE commit emits for SURVIVING rows net out to an upsert.
One hash shuffle on the key per batch, O(batch).

Exactly-once: the whole net effect lands in ONE ``merge_into`` commit
stamped ``{name}-{batch_id}`` — a replayed batch sees its token and
no-ops, crash-before-claim leaves vacuumable orphans. Restarts resume
from the stream checkpoint's version offsets.

Ordering caveat (documented, inherent to the pattern): the reduction is
per-KEY latest-wins within the batch, so intermediate states of a key
inside one batch are not materialized — the replica converges to the
source's state at each batch boundary, which is exactly the APPLY
CHANGES contract.

Scale: the replica table is partitioned like the source (its partition
columns arrive as ordinary feed columns), our own engine keeps merge
keys partition-stable by construction (cross-partition UPDATE refuses;
MERGE's guard), so the fold's merge stays partition-pruned; the guard
dial is exposed for feeds known partition-stable.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from ..operators.txlog import TxTable
from ..sources.txtable import stream_table_changes

__all__ = ["net_changes", "apply_changes_fold", "replicate_stream",
           "ensure_replica"]


def net_changes(feed: DataFrame, key: list) -> DataFrame:
    """Reduce a slice of the change feed to its net effect per key:
    one row per key, the latest change by ``_commit_version``
    (row-bearing changes outrank the paired file-granular delete at
    the same version), ``update_preimage`` rows dropped. Returns the
    table columns plus ``_change_type`` ∈ {insert, update_postimage,
    delete}."""
    applies = feed.filter(F.col("_change_type") != "update_preimage")
    w = Window.partitionBy(*key).orderBy(
        F.desc("_commit_version"),
        # within one commit: a surviving row's derived delete+insert
        # pair nets to the insert
        F.when(F.col("_change_type") == "delete", 0).otherwise(1).desc(),
    )
    return (
        applies.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "_commit_version", "_commit_timestamp")
    )


def apply_changes_fold(
    target: TxTable,
    feed_batch: DataFrame,
    batch_id: int,
    key: list,
    name: str,
    check_key_containment: bool = True,
) -> None:
    """Fold one micro-batch of change-feed rows into ``target`` in one
    atomic, token-stamped commit. Module-level so crash-matrix tests
    drive the exact production callable."""
    if feed_batch.isEmpty():
        return  # compaction-only range: nothing to apply, no commit
    net = net_changes(feed_batch, key)
    ups = net.filter(
        F.col("_change_type") != "delete"
    ).drop("_change_type")
    dels = net.filter(
        F.col("_change_type") == "delete"
    ).drop("_change_type")
    target.merge_into(
        ups,
        key=key,
        check_key_containment=check_key_containment,
        txn=f"{name}-{batch_id}",
        deletes=dels,
    )


def ensure_replica(
    spark: SparkSession, source_path: str, target_path: str
) -> TxTable:
    """Open the replica at ``target_path``, creating it empty with the
    SOURCE's current schema and partition columns on first use (the
    feed delivers partition columns as ordinary data, so the replica
    partitions itself exactly like the source)."""
    if os.path.isdir(os.path.join(target_path, "_txlog")):
        return TxTable(spark, target_path)
    from pyspark.sql.types import StructType

    src = TxTable(spark, source_path)
    snap = src._snapshot(src.latest_version())
    schema = StructType.fromJson(json.loads(snap["metaData"]["schema"]))
    return TxTable.create(
        spark,
        target_path,
        spark.createDataFrame([], schema),
        partition_by=list(snap["metaData"]["partitionColumns"]),
    )


def replicate_stream(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    key: list,
    checkpoint: str,
    name: str = "replicate",
    available_now: bool = False,
    check_key_containment: bool = True,
    **source_options,
):
    """Start the replication stream: source change feed → net effect →
    one-commit fold into the replica. ``available_now=True`` drains the
    backlog and stops (incremental batch replication); otherwise the
    stream follows the source continuously. Extra ``source_options``
    pass through to the txtable source (e.g. ``starting_version``,
    ``max_files_per_trigger``)."""
    target = ensure_replica(spark, source_path, target_path)
    feed = stream_table_changes(
        spark, source_path, read_change_feed="true", **source_options
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        apply_changes_fold(
            target, batch_df, batch_id, key, name,
            check_key_containment,
        )

    writer = feed.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
