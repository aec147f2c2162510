"""Round-7 ADVICE regression pins: localCheckpoint blocks released once a
streaming fold's write lands (executor storage-memory pressure on long
streams), and the fully-qualified checkpoint-dir compare normalized
through Hadoop Path qualification (equivalent URI spellings no longer
re-call setCheckpointDir every pin)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _live_rdd_ids(spark) -> set:
    """IDs of the RDDs currently holding storage blocks. The residual-
    storage assertions compare SET DIFFERENCES against a before-snapshot,
    not global counts: the driver's ContextCleaner releases blocks of
    unrelated, GC-collected plans (e.g. a prior test's lazy query-path
    localCheckpoint) at nondeterministic times, and under full-suite
    order a global count moves mid-test (VERDICT r13 item 1). An
    unrelated async release only ever REMOVES ids, which the difference
    ignores; a residual pin from the operation under test still shows up
    as a surviving new id, so the assertions keep their meaning."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {infos[i].id() for i in range(len(infos))}


def test_unpin_releases_local_checkpoint_blocks(spark):
    from crawl_streams_spark.operators.iterate import unpin

    before = _live_rdd_ids(spark)
    ck = spark.range(1000).localCheckpoint(eager=True)
    assert len(_live_rdd_ids(spark) - before) == 1
    unpin(ck)
    assert _live_rdd_ids(spark) - before == set()


def test_unpin_walks_derived_plan_to_every_pin(spark):
    """A DataFrame derived from TWO pinned intermediates (the
    incremental-dedup shape: banded ⋈ admitted) must release both pins
    through one unpin() on the derived result."""
    from crawl_streams_spark.operators.iterate import unpin

    before = _live_rdd_ids(spark)
    a = spark.range(100).localCheckpoint(eager=True)
    b = spark.range(50).localCheckpoint(eager=True)
    joined = a.join(b, "id")
    assert joined.count() == 50
    assert len(_live_rdd_ids(spark) - before) == 2
    unpin(joined)
    assert _live_rdd_ids(spark) - before == set()


def test_unpin_is_safe_on_unpinned_plans(spark):
    from crawl_streams_spark.operators.iterate import unpin

    df = spark.range(10).filter(F.col("id") > 3)
    unpin(df)  # no LogicalRDD leaves: must be a silent no-op
    assert df.count() == 6


def test_mg_fold_leaves_no_residual_storage(spark, tmp_path):
    """ADVICE r6 (sketches.py): update_mg_table localCheckpointed twice
    per micro-batch and waited for driver GC — after the fold returns,
    zero checkpoint blocks may remain."""
    from crawl_streams_spark.streaming.sketches import update_mg_table

    table = str(tmp_path / "mg")
    before = _live_rdd_ids(spark)
    batch1 = spark.range(200).select(
        (F.col("id") % 7).cast("string").alias("item")
    )
    update_mg_table(spark, batch1, table, "item", k=8)
    assert _live_rdd_ids(spark) - before == set()
    # second fold exercises the existing-table union branch
    update_mg_table(spark, batch1, table, "item", k=8)
    assert _live_rdd_ids(spark) - before == set()
    assert spark.read.parquet(table).count() > 0


def test_hll_fold_leaves_no_residual_storage(spark, tmp_path):
    """_overwrite_summary is shared by every sketch fold — the release
    must cover the single-pin paths too."""
    from crawl_streams_spark.streaming.sketches import update_hll_table

    table = str(tmp_path / "hll")
    batch = spark.range(300).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("u")
    )
    before = _live_rdd_ids(spark)
    update_hll_table(spark, batch, table, "u", group_cols=("grp",))
    assert _live_rdd_ids(spark) - before == set()


def test_stream_near_dedup_releases_pins_per_batch(spark, tmp_path):
    """The foreachBatch admit path pins banded+admitted intermediates;
    after the stream drains, no checkpoint blocks may remain live."""
    import json
    import os

    from crawl_streams_spark.streaming.dedup import stream_near_dedup

    src = tmp_path / "src"
    os.makedirs(src)
    with open(src / "docs.jsonl", "w") as f:
        for i in range(20):
            words = " ".join(f"w{i}x{j}" for j in range(30))
            f.write(json.dumps({"doc_id": i, "text": words}) + "\n")
    stream_df = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .json(str(src))
    )
    before = _live_rdd_ids(spark)
    q = stream_near_dedup(
        stream_df,
        index_path=str(tmp_path / "idx"),
        output_path=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(600)
    assert _live_rdd_ids(spark) - before == set()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 20


def test_pin_qualified_uri_spellings_do_not_reset(spark, tmp_path):
    """ADVICE r6 (iterate.py): 'file:///a/b' vs the stored 'file:/a/b'
    must compare equal — the old exact-string branch re-called
    setCheckpointDir on every pin, allocating a fresh checkpoint
    subdirectory per iteration."""
    from crawl_streams_spark.operators.iterate import pin

    mine = str(tmp_path / "qck")
    pin(spark.range(3), checkpoint_dir="file://" + mine).count()
    first = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    pin(spark.range(4), checkpoint_dir="file://" + mine).count()
    second = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    assert first == second, "equivalent URI spelling re-set the dir"
    # the one-slash spelling is the stored form itself
    pin(spark.range(5), checkpoint_dir="file:" + mine).count()
    third = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    assert first == third


def test_pin_qualified_different_dir_still_resets(spark, tmp_path):
    """The qualification fix must not over-match: a DIFFERENT qualified
    dir must still re-call setCheckpointDir."""
    from crawl_streams_spark.operators.iterate import pin

    a = str(tmp_path / "qa")
    b = str(tmp_path / "qb")
    pin(spark.range(3), checkpoint_dir="file://" + a).count()
    first = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    pin(spark.range(3), checkpoint_dir="file://" + b).count()
    second = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    assert first != second
    assert "/qb/" in second or second.rstrip("/").rsplit("/", 1)[0].endswith("qb")
