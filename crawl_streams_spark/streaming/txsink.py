"""TxTable-backed exactly-once streaming sinks.

``twophase.py`` has said since round 9 that a transactional table
format subsumes its staged two-phase fold protocol for TABLE-SHAPED
state, and ``operators/txlog.py`` provides one — this module closes the
loop (VERDICT r9 item 4): a foreachBatch sink that folds each
micro-batch into a ``TxTable`` via ``merge_into`` stamped with a
per-batch ``txn`` idempotence token.

Exactly-once with a SHORTER crash matrix than the staged protocol,
because two of its failure modes cannot exist here:

- **crash before the commit claim** (including mid-write of the data
  files): the files are uncommitted orphans no reader can see; the
  replayed batch recomputes the merge against the unchanged live
  snapshot, and vacuum reaps the orphans after the retention window.
- **crash after the claim, before the stream checkpoint advances**:
  the replay sees the batch's txn token (``seen_txn``) and no-ops —
  the commit was one atomic log claim, so the token is visible iff the
  WHOLE merge landed.
- **a torn live table is impossible**: data files are immutable and
  become visible only through the atomic claim; there is no
  delete-then-rewrite window to tear (the failure mode the staged
  protocol exists to close on bare parquet).

Scale: the snapshot table is BUCKET-partitioned (``pmod(key,
n_buckets)``), so a micro-batch rewrites only the buckets it touches —
O(touched buckets x bucket size), never O(table) — and the bucket is a
pure function of the merge key, so keys are partition-stable by
construction and the merge runs with the containment guard off. The
token check is O(new commits) per batch (txlog's seen_txn cache +
checkpoint-carried token sets).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.txlog import TxError, TxTable

__all__ = [
    "ensure_tx_snapshot",
    "tx_snapshot_fold",
    "read_tx_snapshot",
    "tx_fold_writer",
]

_BUCKET = "__bucket"

#: identifier of the bucket function rows are partitioned by. Bucket
#: assignment is STRUCTURAL: changing it (as round 11 did, pmod(key) ->
#: pmod(abs(xxhash64(key)))) silently re-buckets every key of a table
#: built under the old function — merges then land updates in a bucket
#: the key's existing row doesn't live in, the in-bucket anti-join
#: never removes the old row, and the table accumulates duplicates
#: with no error (ADVICE r11). The id and n_buckets are therefore
#: stamped into the table at create and verified on every open/fold;
#: a table stamped differently (or not at all — pre-stamp tables must
#: be rebuilt) fails loudly instead of corrupting.
_BUCKET_FN = "pmod-abs-xxhash64-v1"


def _check_bucket_stamp(table: TxTable, key_col: str,
                        n_buckets: int) -> None:
    """Fail loudly unless the table's stamped bucket discipline matches
    what this writer is about to assume. Verified once per handle (the
    stamp is immutable, and merge replays a snapshot anyway)."""
    cached = getattr(table, "_txsink_stamp_ok", None)
    want = (_BUCKET_FN, str(n_buckets), key_col)
    if cached == want:
        return
    conf = table.table_configuration()
    got = (
        conf.get("txsink.bucket_fn"),
        conf.get("txsink.n_buckets"),
        conf.get("txsink.key_col"),
    )
    if got != want:
        raise TxError(
            f"tx snapshot at {table.path} was built with bucket stamp "
            f"{got} but this writer assumes {want} — merging would "
            "land keys in buckets their existing rows don't live in "
            "and silently duplicate them. Rebuild the table (or open "
            "it with the stamped parameters). Tables created before "
            "stamping existed carry no stamp and must be rebuilt."
        )
    table._txsink_stamp_ok = want


def ensure_tx_snapshot(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    key_col: str,
    n_buckets: int = 16,
) -> TxTable:
    """Open the snapshot TxTable at ``path``, creating it empty (with
    the bucket partition column appended) on first use. The bucket
    function id, bucket count, and key column are stamped into the
    table at create and VERIFIED on open — see ``_BUCKET_FN``."""
    if os.path.isdir(os.path.join(path, "_txlog")):
        table = TxTable(spark, path)
        _check_bucket_stamp(table, key_col, n_buckets)
        return table
    empty = spark.createDataFrame([], schema_ddl).withColumn(
        _BUCKET, F.lit(0).cast("int")
    )
    try:
        return TxTable.create(
            spark, path, empty, partition_by=[_BUCKET],
            configuration={
                "txsink.bucket_fn": _BUCKET_FN,
                "txsink.n_buckets": n_buckets,
                "txsink.key_col": key_col,
            },
        )
    except TxError:
        # lost the create race to a concurrent first-open: fall back to
        # opening the winner's table — and verify ITS stamp, exactly as
        # the fast path does (the winner may have stamped differently)
        table = TxTable(spark, path)
        _check_bucket_stamp(table, key_col, n_buckets)
        return table


def tx_snapshot_fold(
    table: TxTable,
    batch: DataFrame,
    batch_id: int,
    key_col: str,
    name: str,
    n_buckets: int = 16,
) -> None:
    """Fold one micro-batch of latest-state rows into the snapshot:
    rows matching ``key_col`` are replaced, new keys inserted, untouched
    keys carried forward by construction (their files are never
    rewritten unless their bucket is touched, and the in-bucket
    anti-join keeps them). Module-level so the crash-matrix tests drive
    the EXACT production callable.

    Bucket = pmod(abs(xxhash64(key)), n): deterministic and
    TYPE-AGNOSTIC, so the crawl domain's natural string merge keys
    (content_digest, host, url) work directly — pmod over the raw
    column required a numeric key and raised CAST_INVALID_INPUT on
    strings (VERDICT r10 item 4). Still partition-stable by
    construction: bucket is a pure function of the key, so a key's rows
    always land in (and MERGE only ever touches) one bucket. The
    table's bucket stamp is verified first (ADVICE r11): a table built
    under a different bucket function/count/key would silently
    accumulate duplicates, so a mismatch fails loudly instead."""
    _check_bucket_stamp(table, key_col, n_buckets)
    upd = batch.withColumn(
        _BUCKET,
        F.pmod(F.abs(F.xxhash64(F.col(key_col))), F.lit(n_buckets))
        .cast("int"),
    )
    table.merge_into(
        upd,
        key=[key_col],
        check_key_containment=False,  # bucket = f(key): partition-stable
        txn=f"{name}-{batch_id}",
    )


def read_tx_snapshot(table: TxTable) -> DataFrame:
    """The snapshot without its internal bucket column."""
    return table.read().drop(_BUCKET)


def tx_fold_writer(
    stream_df: DataFrame,
    checkpoint: str,
    name: str,
    table: TxTable,
    key_col: str,
    n_buckets: int = 16,
    available_now: bool = False,
    output_mode: str | None = None,
    maintain: dict | None = None,
):
    """Start a foreachBatch stream folding into ``table`` exactly-once.
    The txn token namespace is ``name`` — one per logical sink, same
    lifetime discipline as the stream checkpoint.

    ``maintain`` (kwargs for :meth:`TxTable.maintain`) runs the table
    lifecycle — compact, log retention, vacuum — after each fold; the
    policy gate inside ``maintain`` makes the per-batch cost a single
    directory listing until it's due, so a year-long fold's commit log
    and file count stay bounded instead of growing one tiny JSON and a
    handful of parquet files per micro-batch."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        tx_snapshot_fold(table, batch_df, batch_id, key_col, name,
                         n_buckets)
        if maintain is not None:
            table.maintain(**maintain)

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint
    )
    if output_mode is not None:
        writer = writer.outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
