"""Streaming windowed funnel: the batch ``operators/funnel.py`` DP as a
continuously-maintained per-user state (applyInPandasWithState), exact
under event-time disorder up to the stream's watermark.

Why this is possible exactly: the batch kernel is a left fold over the
user's (ts, tiebreak)-ordered events with a constant-size accumulator —
``acc[i]`` = the LATEST chain-start time of any chain reaching level
i+1. A fold with persisted accumulator is incrementally resumable iff
events are applied in order, so the streaming form buffers arrivals in
state and folds ONLY the prefix at or below the current watermark (that
region can no longer receive arrivals that Spark admits); events
arriving after their region was folded are counted in ``dropped_late``
instead of silently corrupting the order. In practice Spark's stateful
watermark filter already drops sub-watermark rows before they reach the
fold, so ``dropped_late`` is the belt-and-braces second line (restart
edges, operators upstream rewriting event time); both layers yield the
same guarantee: a finalized level never rewrites.

Each trigger emits, per updated user:

- ``funnel_level``   — finalized: folds only the ≤-watermark prefix;
  never changes retroactively.
- ``provisional_level`` — what the batch kernel would report on ALL
  data seen so far (finalized accumulator + a scratch fold over the
  still-buffered suffix); equals ``operators/funnel.py::window_funnel``
  on the same rows, which is how the parity tests pin bit-exactness.
- ``buffered`` / ``dropped_late`` — state-size and loss accounting.

Scale: state per user is k longs + the buffered suffix (bounded by the
watermark delay × the user's event rate); all users process in
parallel, one state shuffle per trigger — unlike the reference-parity
single-group operators in ``stateful.py``, this one is built for wide
key spaces.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "stream_window_funnel",
    "stream_funnel_snapshot",
    "stream_funnel_snapshot_tx",
    "update_funnel_snapshot",
    "FUNNEL_OUTPUT_SCHEMA",
]

_STATE_SCHEMA = StructType([StructField("blob", StringType(), True)])

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("funnel_level", IntegerType(), False),
        StructField("provisional_level", IntegerType(), False),
        StructField("buffered", IntegerType(), False),
        StructField("dropped_late", LongType(), False),
    ]
)


def _fold(acc: list, events, w_us: int) -> list:
    """The batch DP, verbatim (operators/funnel.py::_advance with
    Spark's null-skipping ``greatest`` semantics): events must be
    (t, tb, step) tuples already sorted by (t, tb)."""
    k = len(acc)
    for t, _tb, step in events:
        if step == 1:
            acc[0] = t if acc[0] is None else max(acc[0], t)
        elif step <= k:
            i = step - 1
            prev = acc[i - 1]
            if prev is not None and t - prev <= w_us:
                acc[i] = prev if acc[i] is None else max(acc[i], prev)
    return acc


def _level(acc: list) -> int:
    for i in range(len(acc) - 1, -1, -1):
        if acc[i] is not None:
            return i + 1
    return 0


def stream_window_funnel(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Continuous funnel levels over a watermarked event stream. The
    input MUST carry a watermark on ``ts_col`` (``withWatermark``) —
    the event-time timeouts that finalize quiet users require one, and
    Spark rejects the query at analysis time otherwise (fail-fast, not
    a silent provisional-only mode)."""
    k = len(steps)
    if k < 2:
        raise ValueError("steps must name at least 2 ordered event types")
    if len(set(steps)) != k:
        raise ValueError("steps must be distinct event types")
    _INT_TYPES = {"int", "bigint", "smallint", "tinyint", "long", "short",
                  "byte"}
    dtypes = dict(events.dtypes)
    for col, role in ((tiebreak_col, "tiebreak_col"), (user_col, "user_col")):
        if dtypes.get(col, "") not in _INT_TYPES:
            raise ValueError(
                f"{role} {col!r} must be an integer column (got "
                f"{dtypes.get(col) or 'missing'}): a non-numeric value "
                "casts to NULL and crashes the state fold mid-stream "
                "instead of failing here (the batch kernel's guard, "
                "operators/funnel.py)"
            )
    w_us = int(window_seconds) * 1_000_000
    step_map = F.create_map(
        *[F.lit(x) for i, s in enumerate(steps) for x in (s, i + 1)]
    )
    slim = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).alias(ts_col),  # watermark column must survive
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
        F.col(tiebreak_col).cast("long").alias("tb"),
        F.element_at(step_map, F.col(type_col)).alias("step"),
    )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {
                "acc": [None] * k,
                "buf": [],
                "folded_to": -1,
                "dropped": 0,
            }
        for pdf in pdfs:
            for t, tb, step in zip(pdf["t"], pdf["tb"], pdf["step"]):
                if int(t) <= st["folded_to"]:
                    st["dropped"] += 1
                else:
                    st["buf"].append([int(t), int(tb), int(step)])
        # Watermark is milliseconds. Fold STRICTLY below it: Spark's
        # late-row filter is strict (late means t < watermark), so an
        # event at exactly t == wm can still legally arrive — folding
        # t <= wm would quarantine that admitted on-time arrival and
        # break batch parity (code-review r6 boundary finding).
        wm_us = state.getCurrentWatermarkMs() * 1000
        if wm_us - 1 > st["folded_to"]:
            st["buf"].sort()
            ready = [e for e in st["buf"] if e[0] < wm_us]
            st["buf"] = [e for e in st["buf"] if e[0] >= wm_us]
            st["acc"] = _fold(st["acc"], ready, w_us)
            st["folded_to"] = wm_us - 1
        provisional = _fold(list(st["acc"]), sorted(st["buf"]), w_us)
        state.update((json.dumps(st),))
        if st["buf"]:
            # a quiet group is only re-invoked by a timeout: arm one at
            # the earliest buffered event so the watermark passing it
            # triggers finalization even with no new rows (Spark runs a
            # zero-input batch when the watermark advances, but calls
            # this function only for timed-out or fed groups)
            min_ms = min(e[0] for e in st["buf"]) // 1000
            state.setTimeoutTimestamp(
                max(min_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(
            [
                (
                    int(key[0]),
                    _level(st["acc"]),
                    _level(provisional),
                    len(st["buf"]),
                    int(st["dropped"]),
                )
            ],
            columns=[f.name for f in FUNNEL_OUTPUT_SCHEMA.fields],
        )

    return slim.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _snapshot_builder(table_path: str):
    """MergedBuilder for the persistent per-user funnel snapshot: the
    micro-batch's rows (update mode emits exactly one row — the newest
    state — per updated user per trigger) overlay the live snapshot;
    untouched users carry forward. The overlay is idempotent (replaying
    a batch rewrites identical rows), but idempotence does not survive a
    TORN overwrite — which is exactly what the staged two-phase protocol
    closes (see twophase.py; VERDICT r7 item 7 extends it from the sketch
    folds to this stateful-operator sink edge)."""
    from ..fs import parquet_if_exists

    def build(spark, batch: DataFrame):
        existing = parquet_if_exists(spark, table_path)
        cols = [f.name for f in FUNNEL_OUTPUT_SCHEMA.fields]
        merged = batch.select(*cols)
        if existing is not None:
            merged = merged.unionByName(
                existing.join(batch.select("user_id"), "user_id", "left_anti")
                .select(*cols)
            )
        return merged, None

    return build


def update_funnel_snapshot(spark, batch: DataFrame, table_path: str) -> None:
    """One-shot (non-streaming) overlay of a batch of funnel rows into
    the snapshot table — the batch twin of the streaming sink below."""
    from .sketches import _apply_update

    _apply_update(_snapshot_builder(table_path)(spark, batch), table_path)


def stream_funnel_snapshot(
    events: DataFrame,
    steps,
    window,
    table_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    available_now: bool = False,
    exactly_once: bool = True,
):
    """End-to-end funnel pipeline with a durable snapshot: the stateful
    per-user DP (stream_window_funnel) feeding a foreachBatch sink that
    maintains the latest-row-per-user parquet snapshot through the staged
    two-phase protocol — the same exactly-once discipline as the sketch
    folds, so a crash at ANY protocol point (including a torn live-table
    overwrite) recovers without losing or doubling a user's state.
    ``exactly_once=False`` keeps the direct overwrite as the cheap dial.

    Scale: the snapshot write is O(users), not O(events) — the stateful
    operator has already reduced the stream; staging doubles only that
    reduced relation inside the checkpoint for the life of one batch."""
    from .sketches import _staged_fold_writer

    updated = stream_window_funnel(
        events,
        steps,
        window,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
        tiebreak_col=tiebreak_col,
    )
    return _staged_fold_writer(
        updated,
        checkpoint,
        "funnel_snapshot",
        table_path,
        _snapshot_builder(table_path),
        available_now,
        exactly_once,
        output_mode="update",
    )


def stream_funnel_snapshot_tx(
    events: DataFrame,
    steps,
    window,
    table_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    available_now: bool = False,
    n_buckets: int = 16,
):
    """The funnel snapshot on the TRANSACTIONAL path (VERDICT r9 item
    4): the same stateful DP, but the sink folds each micro-batch into
    a bucket-partitioned ``TxTable`` via ``merge_into`` with a
    per-batch txn idempotence token instead of the staged two-phase
    overwrite. Exactly-once holds with a shorter crash matrix — a torn
    live table is structurally impossible (immutable data files behind
    an atomic log claim; see streaming/txsink.py) — and the write cost
    drops from O(users) per trigger to O(touched buckets). Read the
    snapshot back with ``txsink.read_tx_snapshot(TxTable(spark,
    table_path))``."""
    from .txsink import ensure_tx_snapshot, tx_fold_writer

    updated = stream_window_funnel(
        events,
        steps,
        window,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
        tiebreak_col=tiebreak_col,
    )
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in FUNNEL_OUTPUT_SCHEMA.fields
    )
    table = ensure_tx_snapshot(
        updated.sparkSession, table_path, schema_ddl, "user_id", n_buckets
    )
    return tx_fold_writer(
        updated,
        checkpoint,
        "funnel_snapshot",
        table,
        "user_id",
        n_buckets=n_buckets,
        available_now=available_now,
        output_mode="update",
    )
