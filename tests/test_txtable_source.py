"""TxTable as a Spark DataSource (sources/txtable.py): batch snapshot
reads for format symmetry, and the STREAMING (CDC) source — version
offsets, exactly-once across restarts, loud failure on rewrites,
partition-value typing, pre-evolution null-fill."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from crawl_streams_spark.operators.txlog import TxTable
from crawl_streams_spark.sources.txtable import (
    register_txtable_source,
    stream_table_changes,
)

_SCHEMA = "id bigint, v string, day string"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


@pytest.fixture()
def table(spark, tmp_path):
    return TxTable.create(
        spark,
        str(tmp_path / "tbl"),
        _df(spark, [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")]),
        partition_by=["day"],
    )


def _drain(spark, path, ckpt, sink, **options):
    q = (
        stream_table_changes(spark, path, **options)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    q.stop()


def test_batch_format_reads_latest_snapshot(spark, table):
    register_txtable_source(spark)
    table.append(_df(spark, [(4, "d", "d3")]))
    got = spark.read.format("txtable").load(table.path)
    assert got.schema.simpleString() == (
        "struct<id:bigint,v:string,day:string>"
    )
    rows = {r["id"]: (r["v"], r["day"]) for r in got.collect()}
    assert rows == {1: ("a", "d1"), 2: ("b", "d1"), 3: ("c", "d2"),
                    4: ("d", "d3")}
    # filters/projections compose like any source
    assert got.filter(F.col("day") == "d1").count() == 2


def test_stream_delivers_appends_exactly_once_across_restart(
    spark, table, tmp_path
):
    """The CDC loop: each availableNow drain delivers exactly the
    commits after the checkpointed version — a restart repeats
    nothing, an idle drain delivers nothing."""
    seen: list = []

    def sink(batch_df, batch_id):
        seen.extend(
            (r["id"], r["v"], r["day"]) for r in batch_df.collect()
        )

    ckpt = str(tmp_path / "ck")
    _drain(spark, table.path, ckpt, sink)
    assert sorted(seen) == [(1, "a", "d1"), (2, "b", "d1"),
                            (3, "c", "d2")]
    table.append(_df(spark, [(4, "d", "d2")]))
    table.append(_df(spark, [(5, "e", "d3")]))
    seen.clear()
    _drain(spark, table.path, ckpt, sink)  # restart, same checkpoint
    assert sorted(seen) == [(4, "d", "d2"), (5, "e", "d3")]
    seen.clear()
    _drain(spark, table.path, ckpt, sink)  # nothing new
    assert seen == []


def test_stream_starting_version_and_latest(spark, table, tmp_path):
    v1 = table.append(_df(spark, [(4, "d", "d2")]))
    seen: list = []

    def sink(batch_df, batch_id):
        seen.extend(r["id"] for r in batch_df.collect())

    # from an explicit version: only commits AFTER it
    _drain(spark, table.path, str(tmp_path / "ck1"), sink,
           starting_version=v1 - 1)
    assert sorted(seen) == [4]
    # from "latest": an immediate drain sees nothing...
    seen.clear()
    _drain(spark, table.path, str(tmp_path / "ck2"), sink,
           starting_version="latest")
    assert seen == []
    # ...and the next append arrives on the same checkpoint
    table.append(_df(spark, [(9, "z", "d1")]))
    _drain(spark, table.path, str(tmp_path / "ck2"), sink,
           starting_version="latest")
    assert seen == [9]


def test_stream_starting_timestamp(spark, table, tmp_path):
    """starting_timestamp (r12): the CDC stream starts AFTER the
    version live at the instant — pairing with a read_at_timestamp
    snapshot seed; a timestamp before the table delivers everything;
    passing both starting options refuses."""
    import time

    import pytest

    time.sleep(0.05)
    mid = time.time()  # after CREATE (v0), before the appends
    time.sleep(0.05)
    table.append(_df(spark, [(4, "d", "d2")]))
    table.append(_df(spark, [(9, "z", "d1")]))
    seen: list = []

    def sink(batch_df, batch_id):
        seen.extend(r["id"] for r in batch_df.collect())

    _drain(spark, table.path, str(tmp_path / "ts1"), sink,
           starting_timestamp=str(mid))
    assert sorted(seen) == [4, 9]  # v0's rows predate mid: skipped
    # before the table existed: the whole table streams
    seen.clear()
    _drain(spark, table.path, str(tmp_path / "ts2"), sink,
           starting_timestamp="1.0")
    assert sorted(seen) == [1, 2, 3, 4, 9]
    with pytest.raises(Exception, match="not both"):
        _drain(spark, table.path, str(tmp_path / "ts3"), sink,
               starting_timestamp=str(mid), starting_version="0")


def test_stream_starting_timestamp_clamps_inverted_mtimes(
    spark, table, tmp_path
):
    """The CDC starting_timestamp resolution mirrors
    TxTable.version_at_timestamp's running-max mtime clamp (VERDICT
    r12 #3): with v2's commit file carrying an earlier mtime than
    v1's, a timestamp between them must resolve to the version BEFORE
    the inversion — the un-clamped loop would have started after v2
    and silently skipped both appends."""
    table.append(_df(spark, [(4, "d", "d2")]))  # v1
    table.append(_df(spark, [(9, "z", "d1")]))  # v2
    log_dir = os.path.join(table.path, "_txlog")
    for v, mt in ((0, 1000.0), (1, 3000.0), (2, 2500.0)):
        os.utime(os.path.join(log_dir, f"{v:020d}.json"), (mt, mt))
    seen: list = []

    def sink(batch_df, batch_id):
        seen.extend(r["id"] for r in batch_df.collect())

    # T=2750: only v0 (mtime 1000) had landed — v1 is at 3000 and v2
    # clamps up to 3000 — so the stream starts after v0 and delivers
    # both appends
    _drain(spark, table.path, str(tmp_path / "inv"), sink,
           starting_timestamp="2750.0")
    assert sorted(seen) == [4, 9]


def test_stream_fails_loudly_on_rewrites_unless_opted_in(
    spark, table, tmp_path
):
    seen: list = []

    def sink(batch_df, batch_id):
        seen.extend(r["id"] for r in batch_df.collect())

    ckpt = str(tmp_path / "ck")
    _drain(spark, table.path, ckpt, sink)
    table.merge_into(_df(spark, [(3, "C", "d2")]), key=["id"])
    q = (
        stream_table_changes(spark, table.path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="rewrote data files"):
        q.awaitTermination(600)
        raise AssertionError("stream must fail on a rewrite commit")
    q.stop()
    # opted in: at-least-once delivery of the merge's add-files
    seen.clear()
    _drain(spark, table.path, ckpt, sink, ignore_changes=True)
    assert 3 in seen


def test_batch_reader_seeds_from_checkpoint(spark, tmp_path, monkeypatch):
    """Query-start planning must be O(checkpoint_interval), not O(log):
    the batch reader seeds its live-file set (and the schema replay its
    metaData) from the latest checkpoint and reads only the commit
    files above it."""
    from crawl_streams_spark.sources import txtable as mod

    t = TxTable.create(
        spark, str(tmp_path / "ckpt_tbl"),
        _df(spark, [(0, "v0", "d0")]), partition_by=["day"],
        checkpoint_interval=5,
    )
    for i in range(1, 12):  # versions 1..11; checkpoints at 5 and 10
        t.append(_df(spark, [(i, f"v{i}", f"d{i % 2}")]))
    reads: list = []
    orig = mod._read_actions

    def counting(log_dir, version):
        reads.append(version)
        return orig(log_dir, version)

    monkeypatch.setattr(mod, "_read_actions", counting)
    ds = mod.TxTableDataSource(options={"path": t.path})
    reader = ds.reader(ds.schema())
    assert reads and min(reads) > 10, (
        f"reader replayed commits at/below the checkpoint: {sorted(set(reads))}"
    )
    got = {}
    for p in reader.partitions():
        for rb in mod._file_batches(p, reader._arrow_schema):
            for r in rb.to_pylist():
                got[r["id"]] = r["v"]
    assert got == {i: f"v{i}" for i in range(12)}


def test_stream_survives_midstream_compaction(spark, table, tmp_path):
    """A compact() between two drains must neither fail the CDC stream
    nor re-deliver the compacted rows (its commit's actions carry
    dataChange:false — VERDICT r10 item 2). Genuine rewrites still fail
    loudly (covered above)."""
    seen: list = []

    def sink(batch_df, batch_id):
        seen.extend(r["id"] for r in batch_df.collect())

    ckpt = str(tmp_path / "ck")
    _drain(spark, table.path, ckpt, sink)
    assert sorted(seen) == [1, 2, 3]
    seen.clear()
    table.append(_df(spark, [(4, "d", "d1")]))
    assert table.compact() >= 1  # mid-stream physical reorganization
    table.append(_df(spark, [(5, "e", "d2")]))
    _drain(spark, table.path, ckpt, sink)
    assert sorted(seen) == [4, 5]  # no failure, no re-delivery
    # post-compaction appends keep flowing on the same checkpoint
    seen.clear()
    table.append(_df(spark, [(6, "f", "d1")]))
    _drain(spark, table.path, ckpt, sink)
    assert seen == [6]


def test_partition_value_typing_and_evolution_nullfill(spark, tmp_path):
    """Int partition values come back as ints (converted from the log's
    directory strings), and files written before a schema evolution
    null-fill the new column in streamed batches."""
    t = TxTable.create(
        spark,
        str(tmp_path / "typed"),
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id bigint, v string, part int"
        ),
        partition_by=["part"],
    )
    t.append(
        spark.createDataFrame(
            [(3, "c", 10, 0.5)],
            "id bigint, v string, part int, score double",
        ),
        merge_schema=True,
    )
    seen: list = []

    def sink(batch_df, batch_id):
        assert batch_df.schema.simpleString() == (
            "struct<id:bigint,v:string,part:int,score:double>"
        )
        seen.extend(
            (r["id"], r["part"], r["score"]) for r in batch_df.collect()
        )

    _drain(spark, t.path, str(tmp_path / "ck"), sink)
    assert sorted(seen) == [(1, 10, None), (2, 20, None), (3, 10, 0.5)]


def test_max_files_per_trigger_paces_backlog(spark, table, tmp_path):
    """Backlog pacing (the WARC source's W-8 discipline): latestOffset
    advances at most ~K added files per call, whole versions only, and
    a restarted reader learns its committed position from partitions()
    before pacing resumes. Driven against the reader object directly —
    trigger mechanics add nothing to the contract."""
    from crawl_streams_spark.sources.txtable import TxTableDataSource

    for i in range(4, 10):  # versions 1..6, one file each
        table.append(_df(spark, [(i, "x", "d1")]).coalesce(1))
    latest = table.latest_version()
    assert latest == 6

    def reader(**opts):
        o = {"path": table.path, **{k: str(v) for k, v in opts.items()}}
        ds = TxTableDataSource(o)
        return ds.streamReader(None)

    # fresh stream: initialOffset anchors the meter, then each
    # latestOffset advances by at most 2 files (here 2 versions)
    r = reader(starting_version=0, max_files_per_trigger=2)
    assert r.initialOffset() == {"version": 0}
    o1 = r.latestOffset()
    assert o1["version"] < latest
    parts = [p for p in r.partitions({"version": 0}, o1) if p.path]
    assert 1 <= len(parts) <= 2
    o2 = r.latestOffset()
    assert o1["version"] < o2["version"] <= latest
    # the meter converges on the head and then idles
    while r.latestOffset()["version"] < latest:
        pass
    assert r.latestOffset() == {"version": latest}

    # restarted process (no initialOffset): first offer is exempt...
    r2 = reader(max_files_per_trigger=2)
    assert r2.latestOffset() == {"version": latest}
    # ...and after partitions() reveals the committed position, pacing
    # resumes from it rather than re-offering history
    r3 = reader(max_files_per_trigger=2)
    r3.partitions({"version": 1}, {"version": 2})
    assert r3.latestOffset()["version"] < latest

    # a single commit larger than the cap still arrives WHOLE
    table.append(
        _df(spark, [(20, "y", "d1"), (21, "y", "d2"), (22, "y", "d3")])
    )
    r4 = reader(starting_version=latest, max_files_per_trigger=1)
    assert r4.initialOffset() == {"version": latest}
    assert r4.latestOffset() == {"version": latest + 1}


def test_reader_yields_arrow_record_batches(spark, table, tmp_path):
    """VERDICT r10 item 3: the read path must hand Spark
    ``pyarrow.RecordBatch``es (Arrow buffers), not per-row Python
    tuples — drive the executor-side generator directly and pin the
    yield type, declared-schema column order, partition-constant
    append, and pre-evolution null-fill."""
    import pyarrow as pa

    from crawl_streams_spark.sources.txtable import (
        TxTableDataSource,
        _file_batches,
    )

    # evolve so one file PREDATES a column (null-fill arm)
    table.append(
        _df(spark, [(4, "d", "d2")]).withColumn(
            "score", F.lit(0.5).cast("double")
        ),
        merge_schema=True,
    )
    ds = TxTableDataSource(options={"path": table.path})
    reader = ds.reader(ds.schema())
    parts = reader.partitions()
    assert parts and all(p.path for p in parts)
    schema_names = [f.name for f in ds.schema().fields]
    got = {}
    for p in parts:
        batches = list(_file_batches(p, reader._arrow_schema))
        assert batches, f"file {p.path} yielded no batches"
        for rb in batches:
            assert isinstance(rb, pa.RecordBatch)
            assert rb.schema.names == schema_names
            # partition column arrives as a constant Arrow array
            assert rb.column(schema_names.index("day")).null_count == 0
            for r in rb.to_pylist():
                got[r["id"]] = (r["v"], r["day"], r["score"])
    assert got == {
        1: ("a", "d1", None),  # pre-evolution file: Arrow null-fill
        2: ("b", "d1", None),
        3: ("c", "d2", None),
        4: ("d", "d2", 0.5),
    }


def test_shared_dataframe_reuse_with_filters_is_correct(spark, tmp_path):
    """The canary for the r11 pushdown investigation: Spark caches a
    reused base DataFrame's planned Python-source scan and does NOT
    re-plan filterless queries, so filter-DEPENDENT partitions() would
    serve one query's pruning to the next (measured: after
    .filter(day='nope').count(), an unfiltered count() on the same df
    returned 0). This test drives many differently-filtered queries
    (plus an unfiltered one) through ONE shared base DataFrame and
    compares each against the plain snapshot read — it must stay green
    under any future pushFilters implementation."""
    from crawl_streams_spark.sources.txtable import register_txtable_source

    t = TxTable.create(
        spark, str(tmp_path / "equiv"),
        _df(spark, [(1, "alpha", "d1"), (2, "beta", "d2")]),
        partition_by=["day"],
    )
    t.append(_df(spark, [(10, "gamma", "d1"), (20, "delta", "d3"),
                         (30, None, "d2")]))
    t.append(_df(spark, [(100, "epsilon", "d1")]))
    register_txtable_source(spark)
    via_source = spark.read.format("txtable").load(t.path)
    plain = t.read()
    predicates = [
        "day = 'd1'", "day != 'd2'", "day in ('d1','d3')",
        "day > 'd1'", "id = 20", "id >= 10 and id < 100",
        "id in (1, 30, 100)", "v is null", "v is not null",
        "v like 'a%'", "day = 'd1' and id > 50", "id < 0",
        "day = 'nope'",  # prunes to zero files under any pushdown
        "id = 10 or day = 'd2'",  # OR: not expressible as conjuncts
        "not (day = 'd1')",
    ]
    for pred in predicates:
        got = sorted(map(tuple, via_source.filter(pred).collect()))
        want = sorted(map(tuple, plain.filter(pred).collect()))
        assert got == want, f"filtered reuse changed results for: {pred}"
    # the unfiltered read AFTER filtered queries — the exact stale-scan
    # reuse arm that silently returned 0 rows under stateful pushdown
    assert via_source.count() == plain.count()


def test_stream_offset_below_log_horizon_fails_loudly(spark, tmp_path):
    """A consumer whose committed offset predates a clean_log horizon
    must fail with the re-seed hint — silently skipping the cleaned
    commits' rows would be data loss."""
    from crawl_streams_spark.sources import txtable as mod

    t = TxTable.create(
        spark, str(tmp_path / "hz"),
        _df(spark, [(0, "a", "d0")]), partition_by=["day"],
        checkpoint_interval=5,
    )
    for i in range(1, 12):
        t.append(_df(spark, [(i, "x", "d0")]))
    assert t.clean_log(min_age_seconds=0)
    ds = mod.TxTableDataSource(options={"path": t.path})
    reader = ds.streamReader(ds.schema())
    with pytest.raises(ValueError, match="predates the log horizon"):
        reader.partitions({"version": 3}, {"version": 11})
    # from the horizon forward the stream is healthy
    parts = reader.partitions({"version": 9}, {"version": 11})
    rows = [
        r["id"]
        for p in parts
        for rb in mod._file_batches(p, reader._arrow_schema)
        for r in rb.to_pylist()
    ]
    assert sorted(rows) == [10, 11]


def test_cdc_feeds_incremental_dedup_pipeline(spark, tmp_path):
    """Composition proof: raw documents land in a TxTable; a CDC stream
    over its commit log feeds the cross-batch exact-dedup index; only
    novel content is admitted downstream, exactly once across restarts
    of the consumer — the ingest→curate backbone, all existing pieces."""
    from crawl_streams_spark.operators.dedup import incremental_exact_dedup

    raw = TxTable.create(
        spark,
        str(tmp_path / "raw_docs"),
        spark.createDataFrame(
            [(1, "alpha text", "d1"), (2, "beta text", "d1")],
            "doc_id bigint, text string, day string",
        ),
        partition_by=["day"],
    )
    index = str(tmp_path / "digest_index")
    admitted_path = str(tmp_path / "admitted")
    ck = str(tmp_path / "ck")

    def fold(batch_df, batch_id):
        novel = incremental_exact_dedup(
            spark, batch_df.select("doc_id", "text"), index,
            batch_id=f"cdc-{batch_id}",
        )
        novel.write.mode("append").parquet(admitted_path)

    def drain():
        q = (
            stream_table_changes(spark, raw.path)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        q.stop()

    drain()
    got = {r["doc_id"] for r in spark.read.parquet(admitted_path).collect()}
    assert got == {1, 2}
    # batch 2 lands in the table: one duplicate of doc 1's text, one novel
    raw.append(
        spark.createDataFrame(
            [(3, "alpha text", "d2"), (4, "gamma text", "d2")],
            "doc_id bigint, text string, day string",
        )
    )
    drain()  # consumer restart on the same checkpoint
    got = {r["doc_id"] for r in spark.read.parquet(admitted_path).collect()}
    assert got == {1, 2, 4}, "duplicate content must not re-admit"
    drain()  # idle drain: nothing re-delivered, nothing re-admitted
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(admitted_path).collect()
    )
    assert got == [1, 2, 4]


def test_stream_change_feed_delivers_row_level_changes(
    spark, tmp_path
):
    """read_change_feed=true (r13): the stream delivers the row-level
    Change Data Feed — inserts from appends, pre/post image pairs from
    UPDATE, delete rows from DELETE — instead of failing loudly at the
    first DML rewrite. Exactly-once across restarts holds because
    offsets are still commit versions."""
    t = TxTable.create(
        spark,
        str(tmp_path / "cdf_src"),
        _df(spark, [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")]),
        partition_by=["day"],
        configuration={"enableChangeDataFeed": "true"},
    )
    t.append(_df(spark, [(4, "d", "d2")]))                      # v1
    assert t.update_where("id = 2", {"v": "'B'"}) == 1          # v2
    assert t.delete_where("id = 1") == 1                        # v3
    seen: list = []

    def sink(batch_df, batch_id):
        seen.extend(
            (r["_commit_version"], r["_change_type"], r["id"], r["v"])
            for r in batch_df.collect()
        )

    _drain(spark, t.path, str(tmp_path / "ckf"), sink,
           read_change_feed="true")
    assert sorted(seen) == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
        (0, "insert", 3, "c"),
        (1, "insert", 4, "d"),
        (2, "update_postimage", 2, "B"),
        (2, "update_preimage", 2, "b"),
        (3, "delete", 1, "a"),
    ]
    # restart replays nothing; the next DML arrives incrementally with
    # the feed's metadata columns intact
    seen.clear()
    t.merge_into(_df(spark, [(3, "C", "d2"), (5, "e", "d2")]),
                 key=["id"])                                    # v4
    _drain(spark, t.path, str(tmp_path / "ckf"), sink,
           read_change_feed="true")
    assert sorted(seen) == [
        (4, "insert", 5, "e"),
        (4, "update_postimage", 3, "C"),
        (4, "update_preimage", 3, "c"),
    ]


def test_stream_change_feed_derives_restore_and_refuses_blind_dml(
    spark, table, tmp_path
):
    """Without recorded change data a DML commit fails the change-feed
    stream loudly (same contract as batch table_changes); RESTORE
    stays derivable file-granularly. ignore_changes does not combine
    with the feed."""
    t2 = TxTable(spark, table.path)
    assert t2.update_where("id = 1", {"v": "'A'"}) == 1         # v1
    seen: list = []

    def sink(batch_df, batch_id):
        seen.extend(batch_df.collect())

    with pytest.raises(Exception, match="without recorded change data"):
        _drain(spark, table.path, str(tmp_path / "ckg"), sink,
               read_change_feed="true")
    with pytest.raises(Exception, match="does not apply"):
        _drain(spark, table.path, str(tmp_path / "ckh"), sink,
               read_change_feed="true", ignore_changes="true")
