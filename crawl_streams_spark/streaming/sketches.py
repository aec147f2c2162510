"""Streaming sketch maintenance: fold micro-batches into persistent
count-min / HyperLogLog / k-minimum-values / Misra-Gries /
MRL-quantile tables via foreachBatch — the sketch analog of
operators/rollup.py::stream_rollup (durable, restart-safe aggregates whose
per-trigger cost is the micro-batch, never the history).

Replay semantics differ BY ALGEBRA, and the code should reflect that
instead of paying for markers uniformly:

- **HLL registers merge with max** — idempotent. Replaying a micro-batch
  re-maxes the same rhos and changes nothing, so ``stream_hll`` needs no
  marker bookkeeping at all: at-least-once delivery composes with an
  idempotent fold into exactly-once RESULTS for free. **KMV merges with
  min** (union + re-take the k smallest) — idempotent by the same
  argument; ``stream_kmv`` is marker-free too.
- **CMS counts merge with sum** — NOT idempotent. A replayed batch would
  double-count, so ``stream_cms`` stamps per-batch markers inside the
  checkpoint (the stream_rollup discipline: Hadoop-FS probes, never
  driver-local os calls — checkpoints live on HDFS/S3 in deployment).

Both tables are tiny (≤ groups × m registers / d × w counters), so each
fold rewrites the whole table; ``localCheckpoint`` breaks the
read-overwrite lineage cycle (reading a path and overwriting it in one
plan is a self-clobber without materialization)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..fs import hadoop_exists, hadoop_touch, parquet_if_exists
from ..functions import sketch as S
from ..operators.iterate import unpin

__all__ = [
    "update_hll_table",
    "update_cms_table",
    "update_kmv_table",
    "update_mg_table",
    "update_mrl_table",
    "stream_hll",
    "stream_cms",
    "stream_kmv",
    "stream_mg",
    "stream_mrl",
]


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


def _marked_fold_writer(
    stream_df: DataFrame,
    checkpoint: str,
    marker_dirname: str,
    apply_batch,
    available_now: bool,
    exactly_once: bool,
):
    """foreachBatch writer with the per-batch replay-marker protocol
    shared by every MASS-ADDITIVE sketch fold (CMS counts, MG counters,
    MRL weights — sum-like merges double on replay, unlike HLL max /
    KMV min). One implementation so a future fix to the exactly-once
    protocol (e.g. closing the crash-between-merge-and-marker residual
    window with a transactional format) lands once, not three times
    (code-review r6)."""
    markers = checkpoint.rstrip("/") + "/" + marker_dirname

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        marker = f"{markers}/{batch_id}"
        if exactly_once and hadoop_exists(spark, marker):
            return
        apply_batch(spark, batch_df)
        if exactly_once:
            hadoop_touch(spark, marker)

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
    regs = S.hll_registers(batch, item_col, p=p, group_cols=group_cols)
    existing = parquet_if_exists(spark, table_path)
    merged = (
        S.hll_merge(existing, regs, group_cols=group_cols)
        if existing is not None
        else regs
    )
    _overwrite_summary(merged, table_path)


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
    sk = S.cms_build(
        batch, item_col, depth=depth, width=width, weight_col=weight_col
    )
    existing = parquet_if_exists(spark, table_path)
    merged = S.cms_merge(existing, sk) if existing is not None else sk
    _overwrite_summary(merged, table_path)


def stream_hll(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    item_col: str,
    p: int = 8,
    group_cols: tuple[str, ...] = (),
    available_now: bool = False,
):
    """Continuous distinct-count sketching: every micro-batch folds its
    registers into the table. No markers — max-merge makes replays
    harmless (exactly-once results from at-least-once delivery)."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        update_hll_table(
            batch_df.sparkSession, batch_df, table_path, item_col, p, group_cols
        )

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
    """Continuous frequency sketching with replay suppression: per-batch
    markers inside the checkpoint make the sum-merge exactly-once (same
    residual window as stream_rollup — a crash between merge and marker
    re-admits one batch; closing it fully needs a transactional format)."""
    return _marked_fold_writer(
        stream_df,
        checkpoint,
        "applied_cms_batches",
        lambda spark, b: update_cms_table(
            spark, b, table_path, item_col, depth, width, weight_col
        ),
        available_now,
        exactly_once,
    )


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
    sk = S.kmv_table(batch, item_col, k=k, group_cols=group_cols)
    existing = parquet_if_exists(spark, table_path)
    merged = (
        S.kmv_merge(existing, sk, k=k, group_cols=group_cols)
        if existing is not None
        else sk
    )
    _overwrite_summary(merged, table_path)


def stream_kmv(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    item_col: str,
    k: int = 256,
    group_cols: tuple[str, ...] = (),
    available_now: bool = False,
):
    """Continuous KMV distinct-count sketching: idempotent min-merge, no
    markers (the stream_hll shape). Unlike HLL the maintained table also
    answers set-intersection questions across groups (shared-hash
    fractions of the k-min union sample)."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        update_kmv_table(
            batch_df.sparkSession, batch_df, table_path, item_col, k, group_cols
        )

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
    parts = S.mg_partition_summaries(batch, item_col, k)
    existing = parquet_if_exists(spark, table_path)
    combined = (
        existing.unionByName(parts) if existing is not None else parts
    )
    # mg_prune consumes its input from three branches (per-item sums,
    # the (k+1)-th-largest probe, the error aggregate) — materialize the
    # tiny combined summary ONCE so the batch's mapInPandas
    # summarization doesn't re-run per branch (code-review r6), and the
    # final localCheckpoint still breaks the read-overwrite cycle. Both
    # pins are released once the write lands (ADVICE r6).
    combined = combined.localCheckpoint(eager=True)
    try:
        _overwrite_summary(S.mg_prune(combined, k), table_path)
    finally:
        unpin(combined)


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
    matter the stream length. Sum-merge is NOT idempotent, so per-batch
    markers inside the checkpoint make it exactly-once (the stream_cms
    discipline; same one-batch residual window on a crash between merge
    and marker)."""
    return _marked_fold_writer(
        stream_df,
        checkpoint,
        "applied_mg_batches",
        lambda spark, b: update_mg_table(spark, b, table_path, item_col, k),
        available_now,
        exactly_once,
    )


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
    parts = S.mrl_partition_summaries(batch, value_col, c)
    existing = parquet_if_exists(spark, table_path)
    combined = (
        existing.unionByName(parts) if existing is not None else parts
    )
    _overwrite_summary(S.mrl_merge(combined, c), table_path)


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
    checkable bound. Markers for exactly-once (mass-additive merge)."""
    return _marked_fold_writer(
        stream_df,
        checkpoint,
        "applied_mrl_batches",
        lambda spark, b: update_mrl_table(spark, b, table_path, value_col, c),
        available_now,
        exactly_once,
    )
