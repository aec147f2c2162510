"""Incremental rollup maintenance (operators/rollup.py): the merge
invariant merge(rollup(A), rollup(B)) == rollup(A ∪ B), batch-order
independence, untouched-partition stability, and coarser-grain
re-aggregation matching a direct query on the raw facts."""

from __future__ import annotations

import glob
import os
import time

import pyspark.sql.functions as F

from crawl_streams_spark.operators.rollup import (
    rollup_rows,
    rollup_to_grain,
    update_rollup,
    write_rollup,
)
from crawl_streams_spark.tables import load_table

DIMS = ["event_type"]
METRICS = ["value"]


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )


def _snapshot(spark, path):
    rows = (
        spark.read.parquet(path)
        .select(
            "bucket_date",
            "bucket_start",
            "event_type",
            "cnt",
            F.round("sum_value", 6).alias("sum_value"),
            "min_value",
            "max_value",
        )
        .collect()
    )
    return sorted(
        (str(r[0]), str(r[1]), r[2], r[3], r[4], r[5], r[6]) for r in rows
    )


def _data_files(partition_dir):
    return sorted(glob.glob(os.path.join(partition_dir, "*.parquet")))


def test_incremental_equals_full(spark, sf_dir, tmp_path):
    """Three arbitrary batches folded in sequentially must equal the
    one-shot rollup of all rows."""
    ev = _events(spark, sf_dir)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    for k in range(3):
        n = update_rollup(
            spark,
            ev.filter(F.col("event_id") % 3 == k),
            inc,
            "ts",
            DIMS,
            METRICS,
        )
        assert n > 0
    write_rollup(ev, full, "ts", DIMS, METRICS)
    assert _snapshot(spark, inc) == _snapshot(spark, full)


def test_batch_order_independence(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for k in (0, 1, 2):
        update_rollup(spark, ev.filter(F.col("event_id") % 3 == k), a, "ts", DIMS, METRICS)
    for k in (2, 0, 1):
        update_rollup(spark, ev.filter(F.col("event_id") % 3 == k), b, "ts", DIMS, METRICS)
    assert _snapshot(spark, a) == _snapshot(spark, b)


def test_untouched_partitions_not_rewritten(spark, sf_dir, tmp_path):
    """A batch confined to one day only rewrites that day's directory;
    every other date partition's files stay byte-identical."""
    ev = _events(spark, sf_dir)
    out = str(tmp_path / "roll")
    update_rollup(spark, ev, out, "ts", DIMS, METRICS)
    dates = sorted(
        d for d in os.listdir(out) if d.startswith("bucket_date=")
    )
    assert len(dates) > 1
    touched_day = dates[0].split("=", 1)[1]
    before = {
        f: (os.path.getmtime(f), os.path.getsize(f))
        for d in dates[1:]
        for f in _data_files(os.path.join(out, d))
    }
    batch = ev.filter(F.to_date("ts") == F.lit(touched_day))
    assert batch.count() > 0
    n = update_rollup(spark, batch, out, "ts", DIMS, METRICS)
    assert n == 1
    after = {
        f: (os.path.getmtime(f), os.path.getsize(f))
        for d in dates[1:]
        for f in _data_files(os.path.join(out, d))
    }
    assert before == after, "untouched date partition was rewritten"
    # and the touched day now double-counts exactly that day's rows
    got = (
        spark.read.parquet(out)
        .filter(F.col("bucket_date") == F.lit(touched_day))
        .agg(F.sum("cnt"))
        .collect()[0][0]
    )
    assert got == 2 * batch.count()


def test_coarser_grain_matches_fact_query(spark, sf_dir, tmp_path):
    """Day-grain re-aggregation of the hourly rollup == aggregating the
    raw facts by day directly, including the derived avg."""
    ev = _events(spark, sf_dir)
    out = str(tmp_path / "roll")
    update_rollup(spark, ev, out, "ts", DIMS, METRICS)
    daily = rollup_to_grain(
        spark.read.parquet(out), "day", DIMS, METRICS
    )
    direct = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("bucket_start"), "event_type"
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("cnt"))
    )

    def key(rows):
        return sorted(
            (
                str(r["bucket_start"]),
                r["event_type"],
                r["cnt"],
                round(r["sum_value"], 6),
                r["min_value"],
                r["max_value"],
                round(r["avg_value"], 9),
            )
            for r in rows
        )

    assert key(daily.collect()) == key(direct.collect())


def test_stream_rollup_matches_batch(spark, sf_dir, tmp_path):
    """File-source streaming with one-file micro-batches folds to the same
    rollup as a one-shot batch build (restart-safe durable aggregates —
    the engine replacement for the reference's volatile snapshot loop)."""
    from crawl_streams_spark.operators.rollup import stream_rollup

    ev = _events(spark, sf_dir)
    src = str(tmp_path / "src")
    # two input files → two micro-batches under maxFilesPerTrigger=1
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="append"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    out, full = str(tmp_path / "roll"), str(tmp_path / "full")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_rollup(
        stream,
        out,
        str(tmp_path / "ckpt"),
        "ts",
        DIMS,
        METRICS,
        available_now=True,
    )
    q.awaitTermination(600)
    write_rollup(spark.read.parquet(src), full, "ts", DIMS, METRICS)
    assert _snapshot(spark, out) == _snapshot(spark, full)


def test_stream_rollup_replay_idempotent(spark, sf_dir, tmp_path):
    """Failure injection: deleting the last checkpoint commit record makes
    Structured Streaming replay that micro-batch on restart. With the
    exactly-once markers the replay is a no-op; without them the replayed
    batch double-counts — both behaviors pinned."""
    from crawl_streams_spark.operators.rollup import stream_rollup

    ev = _events(spark, sf_dir)
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run(out, ckpt, exactly_once):
        q = stream_rollup(
            spark.readStream.schema(schema).parquet(src),
            out,
            ckpt,
            "ts",
            DIMS,
            METRICS,
            available_now=True,
            exactly_once=exactly_once,
        )
        q.awaitTermination(600)
        # availableNow self-terminates, but deregistration can lag and the
        # restart would trip the concurrent-checkpoint guard
        q.stop()
        for _ in range(100):
            if q not in spark.streams.active:
                break
            time.sleep(0.1)

    def inject_replay(ckpt):
        commits = sorted(
            f
            for f in os.listdir(os.path.join(ckpt, "commits"))
            if not f.startswith(".")
        )
        os.remove(os.path.join(ckpt, "commits", commits[-1]))
        # the local FS keeps a hidden checksum twin; a stale one fails the
        # re-written commit's rename
        crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
        if os.path.exists(crc):
            os.remove(crc)

    def total(out):
        return spark.read.parquet(out).agg(F.sum("cnt")).collect()[0][0]

    n = ev.count()
    out1, ckpt1 = str(tmp_path / "safe"), str(tmp_path / "ckpt1")
    run(out1, ckpt1, exactly_once=True)
    assert total(out1) == n
    inject_replay(ckpt1)
    run(out1, ckpt1, exactly_once=True)
    assert total(out1) == n, "replayed batch was double-counted"

    out2, ckpt2 = str(tmp_path / "unsafe"), str(tmp_path / "ckpt2")
    run(out2, ckpt2, exactly_once=False)
    inject_replay(ckpt2)
    run(out2, ckpt2, exactly_once=False)
    assert total(out2) == 2 * n, "expected the at-least-once double-count"


def test_histogram_partials_and_quantiles(spark, sf_dir, tmp_path):
    """Mergeable histogram metric: incremental folds produce bin-exact
    arrays identical to a one-shot build (merge = elementwise sum, no
    sketch error), and the reporting-edge quantile lands within one bin
    width of the exact percentile — without rescanning facts."""
    from crawl_streams_spark.operators.rollup import quantile_from_hist

    HIST = {"value": (0.0, 400.0, 40)}
    ev = _events(spark, sf_dir)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    for k in range(3):
        update_rollup(
            spark,
            ev.filter(F.col("event_id") % 3 == k),
            inc,
            "ts",
            DIMS,
            METRICS,
            hist=HIST,
        )
    write_rollup(ev, full, "ts", DIMS, METRICS, hist=HIST)

    def hists(path):
        return sorted(
            (str(r[0]), r[1], tuple(r[2]))
            for r in spark.read.parquet(path)
            .select("bucket_start", "event_type", "hist_value")
            .collect()
        )

    assert hists(inc) == hists(full)

    # global histogram (all buckets merged) → median within one bin width
    merged = (
        rollup_to_grain(
            spark.read.parquet(inc).withColumn(
                "bucket_start", F.lit("1970-01-01").cast("timestamp")
            ),
            "day",
            [],
            METRICS,
            hist=HIST,
        )
    )
    est = merged.select(
        quantile_from_hist("hist_value", 0.0, 400.0, 40, 0.5).alias("med")
    ).collect()[0]["med"]
    exact = ev.agg(
        F.expr("percentile(value, 0.5)").alias("m")
    ).collect()[0]["m"]
    assert abs(est - exact) <= 400.0 / 40, (est, exact)

    # bin counts account for every row
    total_binned = (
        spark.read.parquet(inc)
        .select(
            F.aggregate(
                "hist_value", F.lit(0).cast("bigint"), lambda a, x: a + x
            ).alias("t")
        )
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    assert total_binned == ev.count()


def test_quantile_from_hist_property(spark):
    """Property: for samples inside [lo, hi) the histogram-quantile
    estimate is within one bin width of the nearest-rank percentile, for
    arbitrary sample multisets and several q values."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawl_streams_spark.operators.rollup import quantile_from_hist

    LO, HI, BINS = 0.0, 100.0, 20
    width = (HI - LO) / BINS

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=0.0, max_value=99.999),
            min_size=1,
            max_size=60,
        ),
        st.sampled_from([0.1, 0.5, 0.9]),
    )
    def check(samples, q):
        import math

        counts = [0] * (BINS + 2)
        for x in samples:
            counts[min(BINS + 1, max(0, int(x // width) + 1))] += 1
        est = (
            spark.range(1)
            .select(
                quantile_from_hist(
                    F.array(*[F.lit(c).cast("bigint") for c in counts]),
                    LO,
                    HI,
                    BINS,
                    q,
                ).alias("est")
            )
            .collect()[0]["est"]
        )
        rank = max(1, math.ceil(q * len(samples)))
        true = sorted(samples)[rank - 1]
        assert abs(est - true) <= width, (est, true, samples, q)

    check()


def test_rollup_crash_matrix_recovers_exactly_once(spark, sf_dir, tmp_path):
    """VERDICT r6 item 3: kill the staged fold at each protocol point,
    replay it, and prove the rollup equals the one-shot build — the old
    marker-only protocol double-counted the touched partitions on a
    crash between merge and marker."""
    import pytest

    from crawl_streams_spark.operators.rollup import (
        _rollup_stage_apply,
        write_rollup,
    )
    from crawl_streams_spark.streaming.twophase import (
        SimulatedCrash,
        staged_exactly_once_fold,
    )

    ev = _events(spark, sf_dir)
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)
    full = str(tmp_path / "full")
    write_rollup(ev, full, "ts", ["event_type"], ["value"], "hour")
    want = _snapshot(spark, full)

    def fold(batch_df, batch_id, path, ckpt, crash=None):
        stage, apply = _rollup_stage_apply(
            batch_df, path, "ts", ["event_type"], ["value"], "hour"
        )
        return staged_exactly_once_fold(
            spark, batch_id, ckpt, "rollup", stage, apply, _crash_point=crash
        )

    for crash in ("after_stage_write", "after_commit", "after_apply",
                  "after_marker"):
        path = str(tmp_path / f"r_{crash}")
        ckpt = str(tmp_path / f"ck_{crash}")
        assert fold(b0, 0, path, ckpt)
        with pytest.raises(SimulatedCrash):
            fold(b1, 1, path, ckpt, crash=crash)
        fold(b1, 1, path, ckpt)  # the restart replay
        assert _snapshot(spark, path) == want, f"{crash} lost or doubled"
        # replaying again after the marker is a no-op
        assert fold(b1, 1, path, ckpt) is False
        assert _snapshot(spark, path) == want


# ---------------------------------------------------------------------------
# Rollup maintenance on the TRANSACTIONAL path (VERDICT r9 item 4, the
# rollup half): token-stamped partition overwrites through TxTable.
# ---------------------------------------------------------------------------


def _tx_snapshot(spark, path):
    from crawl_streams_spark.operators.txlog import TxTable

    rows = (
        TxTable(spark, path)
        .read()
        .select(
            "bucket_date",
            "bucket_start",
            "event_type",
            "cnt",
            F.round("sum_value", 6).alias("sum_value"),
            "min_value",
            "max_value",
        )
        .collect()
    )
    return sorted(
        (str(r[0]), str(r[1]), r[2], r[3], r[4], r[5], r[6]) for r in rows
    )


def test_stream_rollup_tx_matches_batch(spark, sf_dir, tmp_path):
    """The transactional streaming fold converges to the same rollup as
    the one-shot batch build, across a stream restart."""
    from crawl_streams_spark.operators.rollup import stream_rollup_tx

    ev = _events(spark, sf_dir)
    src = str(tmp_path / "src")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="append"
    )
    out, full = str(tmp_path / "txroll"), str(tmp_path / "full")
    schema = spark.read.parquet(src).schema

    def run():
        q = stream_rollup_tx(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            out,
            str(tmp_path / "ckpt"),
            "ts",
            DIMS,
            METRICS,
            available_now=True,
        )
        q.awaitTermination(600)
        q.stop()

    run()
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    run()  # restart on the same checkpoint
    write_rollup(spark.read.parquet(src), full, "ts", DIMS, METRICS)
    assert _tx_snapshot(spark, out) == _snapshot(spark, full)


def test_tx_rollup_tokens_namespaced_per_sink(spark, sf_dir, tmp_path):
    """ADVICE r10 (rollup.py): the txn token hardcoded 'rollup-' as its
    namespace, so two rollup streams folding into one table (or one
    stream after a checkpoint reset restarted batch_ids at 0) collided
    on tokens and silently no-opped data-bearing batches. Tokens now
    carry the sink name, as tx_fold_writer's always did."""
    from crawl_streams_spark.operators.rollup import (
        ensure_rollup_txtable,
        tx_rollup_fold,
    )

    ev = _events(spark, sf_dir).limit(400).cache()
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)
    path, full = str(tmp_path / "ns"), str(tmp_path / "full")
    t = ensure_rollup_txtable(spark, path, ev.schema, "ts", DIMS, METRICS)
    # two logical sinks, SAME batch_id 0 — both must land
    tx_rollup_fold(t, b0, 0, "ts", DIMS, METRICS, name="even-stream")
    tx_rollup_fold(t, b1, 0, "ts", DIMS, METRICS, name="odd-stream")
    write_rollup(ev, full, "ts", DIMS, METRICS)
    assert _tx_snapshot(spark, path) == _snapshot(spark, full)
    # replay under each namespace still no-ops (exactly-once preserved)
    v = t.latest_version()
    tx_rollup_fold(t, b0, 0, "ts", DIMS, METRICS, name="even-stream")
    tx_rollup_fold(t, b1, 0, "ts", DIMS, METRICS, name="odd-stream")
    assert t.latest_version() == v


def test_tx_rollup_crash_matrix_recovers_exactly_once(spark, sf_dir, tmp_path):
    """Kill the transactional fold before and after the log claim and
    prove the replay neither loses nor double-counts — driving the exact
    production callable (tx_rollup_fold)."""
    import pytest

    from crawl_streams_spark.operators.rollup import (
        ensure_rollup_txtable,
        tx_rollup_fold,
    )
    from crawl_streams_spark.streaming.twophase import SimulatedCrash

    ev = _events(spark, sf_dir).limit(600).cache()
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)
    path, full = str(tmp_path / "txcrash"), str(tmp_path / "full")
    t = ensure_rollup_txtable(spark, path, ev.schema, "ts", DIMS, METRICS)
    tx_rollup_fold(t, b0, 0, "ts", DIMS, METRICS)

    # crash BEFORE the claim: data files orphaned, nothing visible
    before = _tx_snapshot(spark, path)
    orig = t._claim

    def dying(version, actions):
        raise SimulatedCrash("before_claim")

    t._claim = dying
    with pytest.raises(SimulatedCrash):
        tx_rollup_fold(t, b1, 1, "ts", DIMS, METRICS)
    t._claim = orig
    assert _tx_snapshot(spark, path) == before
    # replay recomputes against the unchanged snapshot
    tx_rollup_fold(t, b1, 1, "ts", DIMS, METRICS)
    write_rollup(ev, full, "ts", DIMS, METRICS)
    want = _snapshot(spark, full)
    assert _tx_snapshot(spark, path) == want

    # crash AFTER the claim: the token no-ops every replay, including
    # from a fresh handle (driver restart), so no double-count
    v = t.latest_version()
    tx_rollup_fold(t, b1, 1, "ts", DIMS, METRICS)
    from crawl_streams_spark.operators.txlog import TxTable

    tx_rollup_fold(TxTable(spark, path), b1, 1, "ts", DIMS, METRICS)
    assert t.latest_version() == v
    assert _tx_snapshot(spark, path) == want
    # orphans from the injected crash vacuum away without touching state
    assert len(t.vacuum_orphans(min_age_seconds=0)) >= 1
    assert _tx_snapshot(spark, path) == want
