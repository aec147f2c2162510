"""Round-6 ADVICE regression pins: the checkpoint-dir boundary compare
(iterate.pin), the funnel tiebreak dtype exact-match, and the sketch
parameter validation — each a silent-wrong-answer or executor-hang class
caught in review, pinned here so it cannot regress."""

from __future__ import annotations

import pytest


def test_pin_suffix_dir_does_not_false_match(spark, tmp_path):
    """ADVICE r5 (iterate.py): a requested dir 'ckpt' must NOT match an
    existing '/data/myckpt' — the old endswith compare had no
    path-separator boundary, silently landing checkpoints in the wrong
    directory."""
    import os

    from crawl_streams_spark.operators.iterate import pin

    decoy = str(tmp_path / "myckpt")
    mine = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(decoy)
    pin(spark.range(7), checkpoint_dir=mine).count()
    stored = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    parent = stored.rstrip("/").rsplit("/", 1)[0]
    assert parent.endswith("/ckpt"), stored
    assert any(os.scandir(mine))


def test_pin_exact_dir_still_matches_without_reset(spark, tmp_path):
    """The boundary fix must not over-correct: a second pin() into the
    SAME dir must not re-call setCheckpointDir (the ADVICE r4 race)."""
    from crawl_streams_spark.operators.iterate import pin

    mine = str(tmp_path / "ck")
    pin(spark.range(3), checkpoint_dir=mine).count()
    first = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    pin(spark.range(4), checkpoint_dir=mine).count()
    second = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    # same <dir>/<UUID> session subdirectory both times
    assert first == second


def test_window_funnel_rejects_interval_tiebreak(spark):
    """ADVICE r5 (funnel.py): startswith('int') also accepted
    'interval ...' dtypes, which cast('long') to NULL — exactly the
    silent tie-order collapse the guard exists to prevent."""
    import pyspark.sql.functions as F

    from crawl_streams_spark.operators.funnel import window_funnel

    df = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", "view")],
        "user_id bigint, ts string, event_type string",
    ).withColumn("event_id", F.expr("INTERVAL '1' DAY"))
    assert dict(df.dtypes)["event_id"].startswith("interval")
    with pytest.raises(ValueError, match="integer column"):
        window_funnel(df, ["view", "click"], 60)


def test_mrl_rejects_degenerate_compactor_size(spark):
    """ADVICE r5 (sketch.py): c <= 1 spins the compaction loop forever
    (a 1-element buffer can never shrink) — must raise on the driver,
    not hang the executor."""
    from crawl_streams_spark.functions.sketch import (
        mrl_merge,
        mrl_partition_summaries,
    )

    df = spark.range(10).withColumnRenamed("id", "value")
    for bad in (1, 0, -3):
        with pytest.raises(ValueError, match="c must be"):
            mrl_partition_summaries(df, c=bad)
        with pytest.raises(ValueError, match="c must be"):
            mrl_merge(df, c=bad)
    # the valid floor builds (laziness: building the plan is enough)
    mrl_partition_summaries(df, c=2)


def test_mg_rejects_degenerate_counter_budget(spark):
    from crawl_streams_spark.functions.sketch import mg_partition_summaries

    df = spark.range(10).withColumnRenamed("id", "item")
    for bad in (0, -1):
        with pytest.raises(ValueError, match="k must be"):
            mg_partition_summaries(df, k=bad)
    mg_partition_summaries(df, k=1)


def test_pin_absolute_path_is_full_path_compared(spark, tmp_path):
    """Code-review r6: a suffix heuristic let a requested '/data/ckpt'
    falsely match an existing '/srv/data/ckpt'. Absolute requests now
    compare the full scheme-stripped path."""
    import os

    decoy = str(tmp_path / "srv" / "data" / "ckpt")
    mine = str(tmp_path / "data" / "ckpt")
    os.makedirs(decoy, exist_ok=True)
    from crawl_streams_spark.operators.iterate import pin

    spark.sparkContext.setCheckpointDir(decoy)
    pin(spark.range(5), checkpoint_dir=mine).count()
    stored = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    parent = stored.rstrip("/").rsplit("/", 1)[0]
    assert parent.endswith(mine), stored
    assert any(os.scandir(mine))


def test_sketch_params_accept_numpy_ints_reject_bool(spark):
    """Code-review r6: isinstance(int) guards rejected numpy integers
    (a np.int64(200) from config arithmetic) and accepted True as 1."""
    import numpy as np
    import pytest as _pytest

    from crawl_streams_spark.functions.sketch import (
        mg_partition_summaries,
        mrl_partition_summaries,
    )

    vals = spark.range(10).withColumnRenamed("id", "value")
    items = spark.range(10).withColumnRenamed("id", "item")
    # numpy integral parameters build fine (plan construction suffices)
    mrl_partition_summaries(vals, c=np.int64(200))
    mg_partition_summaries(items, k=np.int32(16))
    for bad in (True, False):
        with _pytest.raises(ValueError):
            mrl_partition_summaries(vals, c=bad)
        with _pytest.raises(ValueError):
            mg_partition_summaries(items, k=bad)
