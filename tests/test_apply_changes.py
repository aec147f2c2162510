"""APPLY CHANGES INTO (streaming/apply_changes.py): a downstream
replica maintained from the source's streaming Change Data Feed —
net-effect reduction, one-commit exactly-once folds, crash replays,
compaction invisibility, and convergence through DML/merge/restore."""

from __future__ import annotations

import pytest

from crawl_streams_spark.operators.txlog import TxTable
from crawl_streams_spark.streaming.apply_changes import (
    apply_changes_fold,
    net_changes,
    replicate_stream,
)

_SCHEMA = "id bigint, v string, day string"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


@pytest.fixture()
def source(spark, tmp_path):
    return TxTable.create(
        spark,
        str(tmp_path / "src"),
        _df(spark, [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")]),
        partition_by=["day"],
        configuration={"enableChangeDataFeed": "true"},
    )


def _rows(t):
    return sorted((r["id"], r["v"]) for r in t.read().collect())


def _drain(spark, source, target_path, ckpt, **kw):
    q = replicate_stream(
        spark, source.path, target_path, key=["id"],
        checkpoint=ckpt, available_now=True, **kw
    )
    q.awaitTermination(600)
    q.stop()
    return TxTable(spark, target_path)


def test_replica_converges_through_dml_merge_restore(
    spark, source, tmp_path
):
    tgt_path = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ck")
    # initial drain: replica == source
    tgt = _drain(spark, source, tgt_path, ckpt)
    assert _rows(tgt) == _rows(source)
    # DML + merge + append on the source, drain incrementally
    source.update_where("id = 2", {"v": "'B'"})
    source.delete_where("id = 1")
    source.merge_into(
        _df(spark, [(3, "C", "d2"), (5, "e", "d2")]), key=["id"]
    )
    source.append(_df(spark, [(7, "g", "d1")]))
    tgt = _drain(spark, source, tgt_path, ckpt)
    assert _rows(tgt) == _rows(source) == [
        (2, "B"), (3, "C"), (5, "e"), (7, "g")
    ]
    # compaction is invisible; restore replicates as derived changes
    source.compact(min_files=2)
    source.restore(2)  # back to the post-update state
    tgt = _drain(spark, source, tgt_path, ckpt)
    assert _rows(tgt) == _rows(source)
    # replica partitions like the source
    snap = tgt._snapshot(tgt.latest_version())
    assert snap["metaData"]["partitionColumns"] == ["day"]


def test_replica_restart_replays_exactly_once(spark, source, tmp_path):
    tgt_path = str(tmp_path / "tgt2")
    ckpt = str(tmp_path / "ck2")
    tgt = _drain(spark, source, tgt_path, ckpt)
    v = tgt.latest_version()
    # re-drain with no new source commits: no new target commits
    tgt = _drain(spark, source, tgt_path, ckpt)
    assert tgt.latest_version() == v
    assert _rows(tgt) == _rows(source)
    # crash-replay of the SAME batch id through a fresh handle no-ops
    # (the token covers the upsert AND delete sides of the fold)
    sv = source.latest_version()
    source.delete_where("id = 1")
    feed = source.table_changes(sv)  # the pending slice, batch-shaped
    apply_changes_fold(TxTable(spark, tgt_path), feed, 99, ["id"],
                       "replicate")
    v2 = TxTable(spark, tgt_path).latest_version()
    apply_changes_fold(TxTable(spark, tgt_path), feed, 99, ["id"],
                       "replicate")
    assert TxTable(spark, tgt_path).latest_version() == v2
    assert _rows(TxTable(spark, tgt_path)) == _rows(source)


def test_net_changes_latest_wins_and_preimage_dropped(spark, source):
    """Multiple changes to one key across commits reduce to the last;
    derived delete+insert pairs at one version net to the insert;
    preimages never apply."""
    source.update_where("id = 2", {"v": "'B'"})      # v1: pre+post
    source.delete_where("id = 2")                    # v2: delete
    source.append(_df(spark, [(2, "b2", "d1")]))     # v3: insert
    net = net_changes(source.table_changes(0), ["id"])
    got = {r["id"]: (r["_change_type"], r["v"])
           for r in net.collect()}
    assert got[2] == ("insert", "b2")
    # a key whose LAST change is the delete stays a delete
    source.delete_where("id = 3")                    # v4
    net = net_changes(source.table_changes(0), ["id"])
    got = {r["id"]: r["_change_type"] for r in net.collect()}
    assert got[3] == "delete"
