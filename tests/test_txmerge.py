"""Conditional MERGE builder (operators/txmerge.py): the Delta
``DeltaTable.merge`` clause surface compiled onto the partition-pruned
key merge. Clause cascade ordering, per-group guards (unreachable
clauses, unknown/key/partition assignments, duplicate source keys),
strict-cast and determinism pre-flights, duplicate-key-target
passthrough, CDF mapping, txn idempotence, and the stale-snapshot
conflict."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from crawl_streams_spark.operators.txlog import TxConflict, TxError, TxTable

_SCHEMA = "id bigint, v string, n bigint, day string"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _rows(t):
    return sorted(
        ((r["id"], r["v"], r["n"], r["day"])
         for r in t.read().collect()),
        key=lambda x: tuple((v is None, v) for v in x),
    )


@pytest.fixture()
def table(spark, tmp_path):
    return TxTable.create(
        spark,
        str(tmp_path / "tbl"),
        _df(spark, [
            (1, "a", 10, "d1"),
            (2, "b", 20, "d1"),
            (3, "c", 30, "d2"),
            (4, "d", 40, "d2"),
        ]),
        partition_by=["day"],
    )


# --------------------------------------------------------------- happy path
def test_upsert_parity_with_merge_into(spark, table):
    """update-all + insert-all == the plain key merge."""
    src = _df(spark, [(2, "B", 200, "d1"), (5, "e", 50, "d2")])
    v = (
        table.merge(src, ["id"])
        .when_matched_update({"v": "s.v", "n": "s.n"})
        .when_not_matched_insert()
        .execute()
    )
    assert v == 1
    assert _rows(table) == [
        (1, "a", 10, "d1"), (2, "B", 200, "d1"), (3, "c", 30, "d2"),
        (4, "d", 40, "d2"), (5, "e", 50, "d2"),
    ]


def test_conditional_update_references_both_sides(spark, table):
    """Condition and RHS over s./t.; non-matching matched rows stay."""
    src = _df(spark, [(1, "A", 100, "d1"), (2, "B", 5, "d1")])
    table.merge(src, ["id"]).when_matched_update(
        {"n": "t.n + s.n"}, condition="s.n > t.n"
    ).execute()
    # id=1: 100 > 10 -> n = 110; id=2: 5 < 20 -> untouched
    assert _rows(table) == [
        (1, "a", 110, "d1"), (2, "b", 20, "d1"), (3, "c", 30, "d2"),
        (4, "d", 40, "d2"),
    ]


def test_clause_cascade_first_true_wins(spark, table):
    """A matched row satisfying clause 1 never reaches clause 2."""
    src = _df(spark, [(1, "x", 0, "d1"), (2, "x", 0, "d1")])
    table.merge(src, ["id"]).when_matched_update(
        {"v": "'first'"}, condition="t.id = 1"
    ).when_matched_delete().execute()
    # id=1 hits the update clause; id=2 falls through to the delete
    assert _rows(table) == [
        (1, "first", 10, "d1"), (3, "c", 30, "d2"), (4, "d", 40, "d2"),
    ]


def test_insert_values_and_condition(spark, table):
    src = _df(spark, [(5, "e", 50, "d1"), (6, "f", 60, "d2")])
    table.merge(src, ["id"]).when_not_matched_insert(
        values={"id": "s.id", "v": "upper(s.v)", "day": "s.day"},
        condition="s.n >= 60",
    ).execute()
    # only id=6 passes; unnamed column n inserts as NULL
    assert _rows(table) == [
        (1, "a", 10, "d1"), (2, "b", 20, "d1"), (3, "c", 30, "d2"),
        (4, "d", 40, "d2"), (6, "F", None, "d2"),
    ]


def test_not_matched_by_source_delete_and_update(spark, table):
    """Reconciliation: rows absent from the source get marked or
    dropped, clause order decides which."""
    src = _df(spark, [(1, "a", 10, "d1"), (3, "c", 30, "d2")])
    table.merge(src, ["id"]).when_not_matched_by_source_delete(
        condition="t.n >= 40"
    ).when_not_matched_by_source_update(
        {"v": "'stale'"}
    ).execute()
    # id=4 (n=40) deleted; id=2 marked stale; 1 and 3 untouched
    assert _rows(table) == [
        (1, "a", 10, "d1"), (2, "stale", 20, "d1"), (3, "c", 30, "d2"),
    ]


def test_mixed_three_group_merge_and_cdf(spark, tmp_path):
    t = TxTable.create(
        spark,
        str(tmp_path / "cdf"),
        _df(spark, [
            (1, "a", 10, "d1"), (2, "b", 20, "d1"), (3, "c", 30, "d2"),
        ]),
        partition_by=["day"],
        configuration={"enableChangeDataFeed": "true"},
    )
    src = _df(spark, [(1, "A", 11, "d1"), (9, "i", 90, "d2")])
    t.merge(src, ["id"]) \
        .when_matched_update({"v": "s.v", "n": "s.n"}) \
        .when_not_matched_insert() \
        .when_not_matched_by_source_delete(condition="t.day = 'd1'") \
        .execute()
    assert _rows(t) == [(1, "A", 11, "d1"), (3, "c", 30, "d2"),
                        (9, "i", 90, "d2")]
    ch = t.table_changes(0, 1).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["_change_type"], []).append(r["id"])
    assert by_type == {
        "update_preimage": [1],
        "update_postimage": [1],
        "insert": [9],
        "delete": [2],
    }


def test_no_clause_matches_is_a_no_op(spark, table):
    src = _df(spark, [(1, "z", 0, "d1")])
    v = table.merge(src, ["id"]).when_matched_update(
        {"v": "'x'"}, condition="t.n > 999"
    ).execute()
    assert v == 0  # no commit happened
    assert [h["operation"] for h in table.history()] == ["CREATE"]


def test_duplicate_key_target_passthrough(spark, tmp_path):
    """A target key with several rows: clause-touched rows change,
    untouched siblings survive byte-identical (the replacement is per
    key, so the builder must carry them through)."""
    t = TxTable.create(
        spark,
        str(tmp_path / "dup"),
        _df(spark, [
            (1, "a", 10, "d1"), (1, "a2", 11, "d1"), (2, "b", 20, "d1"),
        ]),
        partition_by=["day"],
    )
    src = _df(spark, [(1, "hit", 0, "d1")])
    t.merge(src, ["id"]).when_matched_update(
        {"v": "'hit'"}, condition="t.n = 10"
    ).execute()
    assert _rows(t) == [
        (1, "a2", 11, "d1"), (1, "hit", 10, "d1"), (2, "b", 20, "d1"),
    ]
    # and the delete side of the same rule
    t.merge(src, ["id"]).when_matched_delete(
        condition="t.n = 11"
    ).execute()
    assert _rows(t) == [(1, "hit", 10, "d1"), (2, "b", 20, "d1")]


def test_null_keys_match_null_safely(spark, tmp_path):
    t = TxTable.create(
        spark,
        str(tmp_path / "nullkeys"),
        _df(spark, [(None, "a", 10, "d1"), (2, "b", 20, "d1")]),
        partition_by=["day"],
    )
    src = _df(spark, [(None, "A", 100, "d1")])
    t.merge(src, ["id"]).when_matched_update(
        {"v": "s.v", "n": "s.n"}
    ).execute()
    assert _rows(t) == [(2, "b", 20, "d1"), (None, "A", 100, "d1")]


def test_untouched_partition_files_not_rewritten(spark, table):
    before = {
        a["path"]
        for a in table._snapshot(0)["adds"].values()
        if a["partitionValues"]["day"] == "d2"
    }
    src = _df(spark, [(1, "A", 1, "d1")])
    table.merge(src, ["id"]).when_matched_update({"v": "s.v"}).execute()
    after = {
        a["path"]
        for a in table._snapshot(table.latest_version())["adds"].values()
        if a["partitionValues"]["day"] == "d2"
    }
    assert before == after  # d2 never touched


# ------------------------------------------------------------------- guards
def test_unreachable_clause_refused(spark, table):
    b = table.merge(_df(spark, []), ["id"]).when_matched_delete()
    with pytest.raises(TxError, match="unreachable"):
        b.when_matched_update({"v": "'x'"}, condition="t.n > 0")


def test_duplicate_source_keys_refused(spark, table):
    src = _df(spark, [(1, "a", 1, "d1"), (1, "b", 2, "d1")])
    with pytest.raises(TxError, match="multiple source rows"):
        table.merge(src, ["id"]).when_matched_delete().execute()


def test_key_and_partition_assignment_refused(spark, table):
    src = _df(spark, [(1, "a", 1, "d1")])
    with pytest.raises(TxError, match="key columns"):
        table.merge(src, ["id"]).when_matched_update(
            {"id": "s.id + 1"}
        ).execute()
    with pytest.raises(TxError, match="partition columns"):
        table.merge(src, ["id"]).when_matched_update(
            {"day": "'d9'"}
        ).execute()
    with pytest.raises(TxError, match="unknown columns"):
        table.merge(src, ["id"]).when_matched_update(
            {"nope": "1"}
        ).execute()


def test_missing_key_in_source_refused(spark, table):
    src = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(TxError, match="lacks key columns"):
        table.merge(src, ["id"]).when_matched_delete().execute()


def test_no_clauses_refused(spark, table):
    with pytest.raises(TxError, match="no WHEN clauses"):
        table.merge(_df(spark, []), ["id"]).execute()


def test_nondeterministic_clause_refused(spark, table):
    src = _df(spark, [(1, "a", 1, "d1")])
    with pytest.raises(TxError, match="non-deterministic"):
        table.merge(src, ["id"]).when_matched_update(
            {"v": "'x'"}, condition=F.rand() < 0.5
        ).execute()
    with pytest.raises(TxError, match="non-deterministic"):
        table.merge(src, ["id"]).when_matched_update(
            {"n": "unix_millis(now())"}
        ).execute()


def test_cast_to_null_assignment_refused(spark, table):
    src = _df(spark, [(1, "a", 1, "d1")])
    with pytest.raises(TxError, match="does not cast"):
        table.merge(src, ["id"]).when_matched_update(
            {"n": "'not-a-number'"}
        ).execute()
    # a NULL-producing expression is fine (NULL is a value, not a
    # failed cast)
    table.merge(src, ["id"]).when_matched_update(
        {"n": "cast(null as bigint)"}
    ).execute()
    assert _rows(table)[0] == (1, "a", None, "d1")


def test_txn_idempotent_replay(spark, table):
    src = _df(spark, [(1, "A", 1, "d1")])
    v1 = table.merge(src, ["id"]).when_matched_update(
        {"v": "s.v"}
    ).execute(txn="job-1")
    v2 = table.merge(src, ["id"]).when_matched_delete().execute(
        txn="job-1"
    )
    assert v1 == v2  # replayed token: no-op, the delete never ran
    assert (1, "A", 10, "d1") in _rows(table)


def test_stale_snapshot_conflicts(spark, table):
    """merge_into(expected_version=...): a table that advanced past the
    snapshot the frames were computed against conflicts loudly."""
    src = _df(spark, [(1, "A", 1, "d1")])
    table.append(_df(spark, [(9, "z", 90, "d2")]))  # now at version 1
    with pytest.raises(TxConflict, match="advanced past the snapshot"):
        table.merge_into(src, ["id"], expected_version=0)


def test_schema_evolution_through_builder(spark, tmp_path):
    """with_schema_evolution(): a source column the target lacks
    widens the table; pre-existing rows null-fill it, insertAll and
    matched updates populate it."""
    t = TxTable.create(
        spark,
        str(tmp_path / "evo"),
        _df(spark, [(1, "a", 10, "d1"), (2, "b", 20, "d1")]),
        partition_by=["day"],
    )
    src = spark.createDataFrame(
        [(2, "B", 200, "d1", "fresh"), (3, "c", 30, "d1", "new")],
        _SCHEMA + ", tag string",
    )
    (
        t.merge(src, ["id"])
        .with_schema_evolution()
        .when_matched_update({"n": "s.n", "tag": "s.tag"})
        .when_not_matched_insert()
        .execute()
    )
    got = {r["id"]: (r["n"], r["tag"]) for r in t.read().collect()}
    assert got == {1: (10, None), 2: (200, "fresh"), 3: (30, "new")}
    assert "tag" in t.read().schema.fieldNames()


def test_extra_source_column_refused_without_evolution(spark, table):
    src = spark.createDataFrame(
        [(1, "a", 1, "d1", "x")], _SCHEMA + ", tag string"
    )
    with pytest.raises(TxError, match="merge_schema=True"):
        table.merge_into(src, ["id"])


def test_merge_into_schema_evolution_nullfills(spark, table):
    """merge_into(merge_schema=True): the widened commit null-fills
    surviving rows in rewritten partitions AND pre-evolution files in
    untouched partitions."""
    src = spark.createDataFrame(
        [(1, "A", 10, "d1", "t1"), (9, "i", 90, "d1", "t9")],
        _SCHEMA + ", tag string",
    )
    table.merge_into(src, ["id"], merge_schema=True)
    got = {r["id"]: r["tag"] for r in table.read().collect()}
    # 1 and 9 carry the new column; survivor 2 (same rewritten
    # partition) and 3/4 (untouched d2 files) null-fill
    assert got == {1: "t1", 2: None, 3: None, 4: None, 9: "t9"}


def test_check_constraints_gate_merge_output(spark, tmp_path):
    t = TxTable.create(
        spark,
        str(tmp_path / "ck"),
        _df(spark, [(1, "a", 10, "d1")]),
        partition_by=["day"],
    )
    t.set_constraint("n_pos", "n > 0")
    src = _df(spark, [(1, "a", -5, "d1")])
    with pytest.raises(TxError, match="n_pos"):
        t.merge(src, ["id"]).when_matched_update({"n": "s.n"}).execute()
