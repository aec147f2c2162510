"""Streaming sketch maintenance: fold micro-batches into persistent
count-min / HyperLogLog / k-minimum-values / Misra-Gries /
MRL-quantile tables via foreachBatch — the sketch analog of
operators/rollup.py::stream_rollup (durable, restart-safe aggregates whose
per-trigger cost is the micro-batch, never the history).

Replay semantics differ BY ALGEBRA: HLL registers merge with max and KMV
with min — both idempotent, so a replayed merge changes nothing — while
CMS counts, MG counters, and MRL weights merge with SUM and double on a
replayed merge. But merge idempotence alone does not survive a crash
MID-OVERWRITE of the live table (``mode("overwrite")`` deletes before it
writes; the replayed merge then reads a torn table and silently loses
state), so with ``exactly_once=True`` (the default) every fold — sum-like
AND idempotent — runs the staged two-phase protocol
(streaming/twophase.py): stage the merged post-state inside the stream
checkpoint, commit atomically, then overwrite the live table from the
stage. Every crash point recovers to exactly-once results; see the
twophase module docstring for the full crash matrix. ``exactly_once=
False`` keeps the direct merge-in-place fold (at-least-once: torn-write
loss and, for the sum-like sketches, replay double-count are the caller's
problem).

All five tables are sketch-sized by construction (≤ groups × m registers
/ d × w counters / k+1 items / c·log2(n/c) summary rows), so staging a
whole post-state per micro-batch costs KBs."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..fs import parquet_if_exists
from ..functions import sketch as S
from ..operators.iterate import unpin
from .twophase import staged_exactly_once_fold

__all__ = [
    "update_hll_table",
    "update_cms_table",
    "update_kmv_table",
    "update_mg_table",
    "update_mrl_table",
    "stream_hll",
    "stream_cms",
    "stream_cms_tx",
    "ensure_cms_txtable",
    "tx_cms_fold",
    "stream_kmv",
    "stream_mg",
    "stream_mg_tx",
    "stream_mrl",
    "stream_mrl_tx",
    "ensure_mg_txtable",
    "ensure_mrl_txtable",
    "read_summary_txtable",
    "tx_mg_fold",
    "tx_mrl_fold",
]

#: merged-state builder: (spark, batch) -> (merged DataFrame, cleanup|None).
#: The cleanup releases any localCheckpoint the plan pinned; callers invoke
#: it after the merged result is durably written.
MergedBuilder = Callable[[SparkSession, DataFrame], tuple[DataFrame, object]]


def _overwrite_summary(merged: DataFrame, table_path: str) -> None:
    """Materialize then overwrite: reading a path and overwriting it in
    one plan is a self-clobber without the localCheckpoint. The blocks
    are released as soon as the write lands — a per-micro-batch
    checkpoint that waited for driver GC pressures executor storage on
    long streams (ADVICE r6)."""
    pinned = merged.localCheckpoint(eager=True)
    try:
        pinned.write.mode("overwrite").parquet(table_path)
    finally:
        unpin(pinned)


def _apply_update(update, table_path: str) -> None:
    merged, cleanup = update
    try:
        _overwrite_summary(merged, table_path)
    finally:
        if cleanup is not None:
            cleanup()


def _stage_apply(builder: MergedBuilder, table_path: str, batch_df: DataFrame):
    """The (stage, apply) pair a sketch fold hands the two-phase
    protocol. Module-level so the crash-matrix tests drive the EXACT
    production callables, not re-implementations."""

    def stage(spark: SparkSession, staging: str) -> bool:
        merged, cleanup = builder(spark, batch_df)
        try:
            # staging ≠ table path, so the read-live/write-staging
            # plan has no self-clobber and needs no localCheckpoint
            merged.write.mode("overwrite").parquet(staging)
        finally:
            if cleanup is not None:
                cleanup()
        return True

    def apply(spark: SparkSession, staging: str) -> None:
        spark.read.parquet(staging).write.mode("overwrite").parquet(
            table_path
        )

    return stage, apply


def _staged_fold_writer(
    stream_df: DataFrame,
    checkpoint: str,
    name: str,
    table_path: str,
    builder: MergedBuilder,
    available_now: bool,
    exactly_once: bool,
    output_mode: str | None = None,
):
    """foreachBatch writer shared by every sketch fold. With
    ``exactly_once`` each micro-batch runs the staged two-phase protocol;
    without it the merged state overwrites the table in place (the
    pre-r7 at-least-once behavior, kept as the cheap dial and as the
    double-count/torn-write contrast the tests pin)."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not exactly_once:
            _apply_update(builder(spark, batch_df), table_path)
            return
        stage, apply = _stage_apply(builder, table_path, batch_df)
        staged_exactly_once_fold(spark, batch_id, checkpoint, name, stage, apply)

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if output_mode is not None:
        # stateful operators (applyInPandasWithState) require the writer's
        # output mode to match theirs even under foreachBatch
        writer = writer.outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --------------------------------------------------------------------------
# HyperLogLog (max-merge, idempotent)
# --------------------------------------------------------------------------


def _hll_builder(
    table_path: str, item_col: str, p: int, group_cols: tuple[str, ...]
) -> MergedBuilder:
    def build(spark: SparkSession, batch: DataFrame):
        regs = S.hll_registers(batch, item_col, p=p, group_cols=group_cols)
        existing = parquet_if_exists(spark, table_path)
        merged = (
            S.hll_merge(existing, regs, group_cols=group_cols)
            if existing is not None
            else regs
        )
        return merged, None

    return build


def update_hll_table(
    spark,
    batch: DataFrame,
    table_path: str,
    item_col: str,
    p: int = 8,
    group_cols: tuple[str, ...] = (),
) -> None:
    """Merge one batch's registers into the persistent HLL table
    (idempotent: re-applying the same batch is a no-op)."""
    _apply_update(
        _hll_builder(table_path, item_col, p, group_cols)(spark, batch),
        table_path,
    )


def stream_hll(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    item_col: str,
    p: int = 8,
    group_cols: tuple[str, ...] = (),
    available_now: bool = False,
    exactly_once: bool = True,
):
    """Continuous distinct-count sketching: every micro-batch folds its
    registers into the table. Max-merge makes REPLAYED merges harmless
    by algebra, but only the staged protocol survives a torn live-table
    overwrite — ``exactly_once`` covers that; disabling it recovers the
    direct merge-in-place fold."""
    return _staged_fold_writer(
        stream_df,
        checkpoint,
        "hll",
        table_path,
        _hll_builder(table_path, item_col, p, group_cols),
        available_now,
        exactly_once,
    )


# --------------------------------------------------------------------------
# Count-min sketch (sum-merge, NOT idempotent)
# --------------------------------------------------------------------------


def _cms_builder(
    table_path: str,
    item_col: str,
    depth: int,
    width: int,
    weight_col: str | None,
) -> MergedBuilder:
    def build(spark: SparkSession, batch: DataFrame):
        sk = S.cms_build(
            batch, item_col, depth=depth, width=width, weight_col=weight_col
        )
        existing = parquet_if_exists(spark, table_path)
        merged = S.cms_merge(existing, sk) if existing is not None else sk
        return merged, None

    return build


def update_cms_table(
    spark,
    batch: DataFrame,
    table_path: str,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> None:
    """Merge one batch's counts into the persistent CMS table (NOT
    idempotent — callers must suppress replays; stream_cms does)."""
    _apply_update(
        _cms_builder(table_path, item_col, depth, width, weight_col)(
            spark, batch
        ),
        table_path,
    )


def stream_cms(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
    available_now: bool = False,
    exactly_once: bool = True,
):
    """Continuous frequency sketching. Sum-merge doubles on a replayed
    merge, so ``exactly_once`` runs the staged two-phase protocol —
    exactly-once at EVERY crash point, including the old
    crash-between-merge-and-marker window (VERDICT r6 item 3)."""
    return _staged_fold_writer(
        stream_df,
        checkpoint,
        "cms",
        table_path,
        _cms_builder(table_path, item_col, depth, width, weight_col),
        available_now,
        exactly_once,
    )


# -- CMS on the TRANSACTIONAL path (VERDICT r10 item 8): the sum-merge
# sketch was the last streaming sink on marker-suppressed staged
# commits; folding into a TxTable with per-batch txn tokens gives the
# same exactly-once with the shorter crash matrix (a torn live table is
# structurally impossible behind the atomic log claim), and retires the
# marker protocol's last user. The table partitions by the depth row
# ``d`` — sketch-sized by construction, so the whole post-state
# overwrite per micro-batch costs KBs, like the staged stage it
# replaces. HLL/KMV stay as they are: idempotent by algebra.

_CMS_SCHEMA = "d int, bucket bigint, cnt bigint"


def ensure_cms_txtable(spark: SparkSession, path: str):
    """Open the CMS TxTable at ``path``, creating it EMPTY on first use
    so every data-bearing commit is token-stamped (the rollup-table
    discipline: no crash point can replay an unstamped create into a
    double-count)."""
    import os

    from ..operators.txlog import TxTable

    if os.path.isdir(os.path.join(path, "_txlog")):
        return TxTable(spark, path)
    empty = spark.createDataFrame([], _CMS_SCHEMA)
    return TxTable.create(spark, path, empty, partition_by=["d"])


def tx_cms_fold(
    table,
    batch_df: DataFrame,
    batch_id: int,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
    name: str = "cms",
) -> None:
    """One micro-batch of the transactional CMS fold: sketch the batch,
    sum-merge with the live counters read through the table SNAPSHOT,
    overwrite in one token-stamped atomic commit. A replay of the same
    (name, batch_id) no-ops on the token — exactly-once without the
    staged two-phase marker protocol. Module-level so the crash-matrix
    tests drive the exact production callable."""
    token = f"{name}-{batch_id}"
    if table.seen_txn(token):
        return
    sk = S.cms_build(
        batch_df, item_col, depth=depth, width=width, weight_col=weight_col
    )
    merged = S.cms_merge(table.read(), sk)
    table.overwrite_partitions(merged, txn=token)


def stream_cms_tx(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
    available_now: bool = False,
    name: str = "cms",
):
    """Continuous frequency sketching on the transactional path (see
    tx_cms_fold)."""
    table = ensure_cms_txtable(stream_df.sparkSession, path)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        tx_cms_fold(table, batch_df, batch_id, item_col, depth, width,
                    weight_col, name=name)

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --------------------------------------------------------------------------
# K-minimum-values (min-merge, idempotent)
# --------------------------------------------------------------------------


def _kmv_builder(
    table_path: str, item_col: str, k: int, group_cols: tuple[str, ...]
) -> MergedBuilder:
    def build(spark: SparkSession, batch: DataFrame):
        sk = S.kmv_table(batch, item_col, k=k, group_cols=group_cols)
        existing = parquet_if_exists(spark, table_path)
        merged = (
            S.kmv_merge(existing, sk, k=k, group_cols=group_cols)
            if existing is not None
            else sk
        )
        return merged, None

    return build


def update_kmv_table(
    spark,
    batch: DataFrame,
    table_path: str,
    item_col: str,
    k: int = 256,
    group_cols: tuple[str, ...] = (),
) -> None:
    """Merge one batch's KMV k-min hashes into the persistent sketch
    table. Min-merge (union + re-take the k smallest distinct hashes) is
    idempotent like HLL's max-merge: replaying a batch unions the same
    hashes and the k-min set is unchanged — the HLL replay argument,
    verbatim."""
    _apply_update(
        _kmv_builder(table_path, item_col, k, group_cols)(spark, batch),
        table_path,
    )


def stream_kmv(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    item_col: str,
    k: int = 256,
    group_cols: tuple[str, ...] = (),
    available_now: bool = False,
    exactly_once: bool = True,
):
    """Continuous KMV distinct-count sketching (idempotent min-merge;
    the maintained table also answers set-intersection questions across
    groups). ``exactly_once`` adds torn-write safety via the staged
    protocol — see stream_hll."""
    return _staged_fold_writer(
        stream_df,
        checkpoint,
        "kmv",
        table_path,
        _kmv_builder(table_path, item_col, k, group_cols),
        available_now,
        exactly_once,
    )


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters (sum-merge, NOT idempotent)
# --------------------------------------------------------------------------


def _mg_builder(table_path: str, item_col: str, k: int) -> MergedBuilder:
    def build(spark: SparkSession, batch: DataFrame):
        parts = S.mg_partition_summaries(batch, item_col, k)
        existing = parquet_if_exists(spark, table_path)
        combined = (
            existing.unionByName(parts) if existing is not None else parts
        )
        # mg_prune consumes its input from three branches (per-item sums,
        # the (k+1)-th-largest probe, the error aggregate) — materialize
        # the tiny combined summary ONCE so the batch's mapInPandas
        # summarization doesn't re-run per branch (code-review r6); the
        # pin is released by the caller's cleanup once the merged result
        # is written (ADVICE r6).
        combined = combined.localCheckpoint(eager=True)
        return S.mg_prune(combined, k), lambda: unpin(combined)

    return build


def update_mg_table(
    spark,
    batch: DataFrame,
    table_path: str,
    item_col: str,
    k: int = 256,
) -> None:
    """Merge one batch's Misra-Gries summaries into the persistent
    heavy-hitters table (``(item, cnt, meta)`` — the partition-summary
    schema, so the table IS a summary and reloads into any MG consumer).
    NOT idempotent (counts sum) — callers must suppress replays;
    stream_mg does."""
    _apply_update(_mg_builder(table_path, item_col, k)(spark, batch), table_path)


def stream_mg(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    item_col: str,
    k: int = 256,
    available_now: bool = False,
    exactly_once: bool = True,
):
    """Continuous heavy-hitters maintenance: every micro-batch folds its
    MG summaries into the table via the mergeable-summaries merge
    (functions/sketch.py::mg_prune), keeping the table ≤ k+1 rows no
    matter the stream length. Sum-merge is NOT idempotent —
    ``exactly_once`` runs the staged two-phase protocol (the stream_cms
    discipline)."""
    return _staged_fold_writer(
        stream_df,
        checkpoint,
        "mg",
        table_path,
        _mg_builder(table_path, item_col, k),
        available_now,
        exactly_once,
    )


# --------------------------------------------------------------------------
# MRL quantile summaries (mass-additive, NOT idempotent)
# --------------------------------------------------------------------------


def _mrl_builder(table_path: str, value_col: str, c: int) -> MergedBuilder:
    def build(spark: SparkSession, batch: DataFrame):
        parts = S.mrl_partition_summaries(batch, value_col, c)
        existing = parquet_if_exists(spark, table_path)
        combined = (
            existing.unionByName(parts) if existing is not None else parts
        )
        return S.mrl_merge(combined, c), None

    return build


def update_mrl_table(
    spark,
    batch: DataFrame,
    table_path: str,
    value_col: str,
    c: int = 200,
) -> None:
    """Merge one batch's MRL quantile summaries into the persistent
    sketch table (``(value, weight, meta)`` — the summary schema; items
    re-enter the compactor at their own weight level, so the table stays
    ≤ c·log2(n/c) rows over any stream length). NOT idempotent (mass
    adds) — stream_mrl suppresses replays."""
    _apply_update(
        _mrl_builder(table_path, value_col, c)(spark, batch), table_path
    )


def stream_mrl(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    value_col: str,
    c: int = 200,
    available_now: bool = False,
    exactly_once: bool = True,
):
    """Continuous quantile-sketch maintenance: the streaming tier of the
    MRL compactor hierarchy. Each fold tree-merges the batch's
    partition summaries with the persistent summary; rank error
    accumulates in the meta row exactly as in the batch path, so
    ``mrl_quantiles`` over the maintained table carries the same
    checkable bound. Mass-additive merge — ``exactly_once`` runs the
    staged two-phase protocol."""
    return _staged_fold_writer(
        stream_df,
        checkpoint,
        "mrl",
        table_path,
        _mrl_builder(table_path, value_col, c),
        available_now,
        exactly_once,
    )


# -- MG / MRL on the TRANSACTIONAL path (r11, completing the CMS move):
# the other two sum-like sketch folds, same discipline — merge the
# batch's summaries with the live state read through the table
# SNAPSHOT, overwrite in one token-stamped atomic commit. With these,
# NO streaming sketch fold depends on the staged marker protocol
# (which remains available as the generic two-phase surface). The
# summary schemas are data-dependent (item/value column types), so the
# tables partition by a constant column and the ensure helpers derive
# the schema from an empty summary of the stream's own schema.

_SUMMARY_P = "__p"


def _ensure_summary_txtable(spark: SparkSession, path: str,
                            empty: DataFrame):
    import os

    from pyspark.sql import functions as F

    from ..operators.txlog import TxTable

    if os.path.isdir(os.path.join(path, "_txlog")):
        return TxTable(spark, path)
    return TxTable.create(
        spark, path,
        empty.limit(0).withColumn(_SUMMARY_P, F.lit(0).cast("int")),
        partition_by=[_SUMMARY_P],
    )


def ensure_mg_txtable(spark: SparkSession, path: str, stream_schema,
                      item_col: str, k: int = 256):
    """Open the MG heavy-hitters TxTable, creating it EMPTY (summary
    schema derived from the stream's own schema) on first use."""
    empty = S.mg_partition_summaries(
        spark.createDataFrame([], stream_schema), item_col, k
    )
    return _ensure_summary_txtable(spark, path, empty)


def ensure_mrl_txtable(spark: SparkSession, path: str, stream_schema,
                       value_col: str, c: int = 200):
    """Open the MRL quantile-summary TxTable, creating it EMPTY on
    first use."""
    empty = S.mrl_partition_summaries(
        spark.createDataFrame([], stream_schema), value_col, c
    )
    return _ensure_summary_txtable(spark, path, empty)


def read_summary_txtable(table) -> DataFrame:
    """The summary without its internal constant partition column —
    loads into any MG/MRL consumer (mg_prune / mrl_quantiles)."""
    return table.read().drop(_SUMMARY_P)


def tx_mg_fold(table, batch_df: DataFrame, batch_id: int, item_col: str,
               k: int = 256, name: str = "mg") -> None:
    """One micro-batch of the transactional Misra-Gries fold (see the
    CMS twin for the protocol). Module-level for the crash-matrix
    tests."""
    from pyspark.sql import functions as F

    token = f"{name}-{batch_id}"
    if table.seen_txn(token):
        return
    parts = S.mg_partition_summaries(batch_df, item_col, k)
    combined = read_summary_txtable(table).unionByName(parts)
    # mg_prune fans its input into three branches — pin the tiny
    # combined summary once (the builder's r6 discipline)
    combined = combined.localCheckpoint(eager=True)
    try:
        merged = S.mg_prune(combined, k).withColumn(
            _SUMMARY_P, F.lit(0).cast("int")
        )
        table.overwrite_partitions(merged, txn=token)
    finally:
        unpin(combined)


def tx_mrl_fold(table, batch_df: DataFrame, batch_id: int,
                value_col: str, c: int = 200, name: str = "mrl") -> None:
    """One micro-batch of the transactional MRL quantile fold."""
    from pyspark.sql import functions as F

    token = f"{name}-{batch_id}"
    if table.seen_txn(token):
        return
    parts = S.mrl_partition_summaries(batch_df, value_col, c)
    combined = read_summary_txtable(table).unionByName(parts)
    merged = S.mrl_merge(combined, c).withColumn(
        _SUMMARY_P, F.lit(0).cast("int")
    )
    table.overwrite_partitions(merged, txn=token)


def stream_mg_tx(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    item_col: str,
    k: int = 256,
    available_now: bool = False,
    name: str = "mg",
):
    """Continuous heavy-hitters maintenance on the transactional path."""
    table = ensure_mg_txtable(stream_df.sparkSession, path,
                              stream_df.schema, item_col, k)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        tx_mg_fold(table, batch_df, batch_id, item_col, k, name=name)

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_mrl_tx(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    value_col: str,
    c: int = 200,
    available_now: bool = False,
    name: str = "mrl",
):
    """Continuous quantile-sketch maintenance on the transactional
    path."""
    table = ensure_mrl_txtable(stream_df.sparkSession, path,
                               stream_df.schema, value_col, c)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        tx_mrl_fold(table, batch_df, batch_id, value_col, c, name=name)

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
