"""Data-layout operators (operators/layout.py): clustered partitioned
writes and small-file compaction — layout is the 100 TB readability
contract (partition pruning, row-group skipping, bounded file counts)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from crawl_streams_spark.operators.layout import clustered_write, compact_parquet
from crawl_streams_spark.tables import load_table


def _data_files(root: str) -> list[str]:
    return [
        p
        for p in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
        if os.path.basename(p) != "_SUCCESS"
    ]


def test_clustered_write_layout(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_clustered")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    n = ev.count()
    clustered_write(
        ev,
        out,
        partition_by=["event_type"],
        cluster_by=["user_id"],
        max_records_per_file=500,
    )
    # directory partitioning for pruning
    dirs = [d for d in os.listdir(out) if d.startswith("event_type=")]
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    assert sorted(dirs) == sorted(f"event_type={t}" for t in types)
    # row preservation and file-size bound
    back = spark.read.parquet(out)
    assert back.count() == n
    for f in _data_files(out):
        assert pq.read_metadata(f).num_rows <= 500
    # clustering: within one partition dir, per-file user_id ranges are
    # ordered and non-overlapping (boundary value may straddle), so parquet
    # min/max stats actually skip row groups on user_id predicates
    for d in dirs:
        ranges = []
        for f in _data_files(os.path.join(out, d)):
            t = pq.read_table(f, columns=["user_id"])
            vals = t.column("user_id").to_pylist()
            assert vals == sorted(vals), f"{f} not internally sorted"
            ranges.append((min(vals), max(vals)))
        ranges.sort()
        for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
            assert lo_b >= hi_a, (d, ranges)


def test_clustered_write_bounds_file_count(spark, sf_dir, tmp_path):
    """One writer per partition value: the file count is rows/target per
    directory, not n_tasks × n_partitions (the small-files explosion)."""
    out = str(tmp_path / "events_fanout")
    ev = load_table(spark, sf_dir, "events").repartition(16)
    clustered_write(
        ev.select("event_id", "event_type", "user_id"),
        out,
        partition_by=["event_type"],
        max_records_per_file=100_000,
    )
    for d in os.listdir(out):
        if d.startswith("event_type="):
            assert len(_data_files(os.path.join(out, d))) == 1, d


def test_compact_parquet(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "fragmented")
    compacted = str(tmp_path / "compacted")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n = ev.count()
    ev.repartition(64).write.parquet(frag)
    assert len(_data_files(frag)) == 64  # the problem
    n_files = compact_parquet(
        spark, frag, compacted, target_rows_per_file=max(1, n // 2)
    )
    got = _data_files(compacted)
    assert len(got) <= n_files + 1  # maxRecordsPerFile may split one
    assert len(got) < 64
    assert spark.read.parquet(compacted).count() == n


def test_upsert_partitions(spark, sf_dir, tmp_path):
    """MERGE semantics: updated keys replaced, other rows in touched
    partitions carried over, untouched partitions' files byte-identical."""
    from crawl_streams_spark.operators.layout import upsert_partitions

    out = str(tmp_path / "upsert")
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter("event_id < 100")
    )
    clustered_write(ev, out, partition_by=["event_type"], cluster_by=["event_id"])
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())
    touched, untouched = types[0], types[1]
    before = {
        f: os.path.getmtime(f)
        for f in _data_files(os.path.join(out, f"event_type={untouched}"))
    }
    updates = spark.createDataFrame(
        [(1_000_001, touched, 1.5), (0, touched, 99.0)],
        "event_id bigint, event_type string, value double",
    )
    n = upsert_partitions(
        spark, updates, out, ["event_id"], "event_type", cluster_by=["event_id"]
    )
    assert n == 1
    back = spark.read.parquet(out)
    # replacement is partition-scoped: event_id 0 is only deduplicated if
    # its existing row lives in the touched partition
    replaced = ev.filter(
        (ev.event_id == 0) & (ev.event_type == touched)
    ).count()
    assert back.count() == ev.count() + 2 - replaced
    got = {r["event_id"]: r["value"] for r in back.filter(
        back.event_type == touched).collect()}
    assert got[1_000_001] == 1.5
    if 0 in got:
        assert got[0] == 99.0  # replaced, not duplicated
    after = {
        f: os.path.getmtime(f)
        for f in _data_files(os.path.join(out, f"event_type={untouched}"))
    }
    assert before == after, "untouched partition was rewritten"


def test_range_sorted_write_global_order(spark, sf_dir, tmp_path):
    """range_sorted_write produces one global sort order: per-file
    [min, max] key ranges are non-overlapping and ascending in file order,
    so a key predicate prunes whole files."""
    import pyspark.sql.functions as F

    from crawl_streams_spark.operators.layout import range_sorted_write

    out = str(tmp_path / "ranged")
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    range_sorted_write(ev, out, order_by=["ts"], num_files=4)
    files = sorted(_data_files(out))  # part-NNNNN prefix = partition id
    assert len(files) > 1
    ranges = []
    total = 0
    for f in files:  # part files sort lexically in partition-id order
        part = spark.read.parquet(f)
        lo, hi, n = part.agg(
            F.min("ts"), F.max("ts"), F.count("*")
        ).collect()[0]
        ranges.append((lo, hi))
        total += n
    assert total == ev.count()
    for (prev_lo, prev_hi), (lo, hi) in zip(ranges, ranges[1:]):
        assert prev_hi <= lo, f"overlapping file ranges: {prev_hi} > {lo}"
    # rows inside each file are sorted too (global order = file order +
    # in-file order)
    first = spark.read.parquet(files[0]).select("ts").collect()
    assert [r[0] for r in first] == sorted(r[0] for r in first)
