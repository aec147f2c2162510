"""cluster_duplicates' r14 convergence check: for numeric keys the
per-round "did any label move" verdict comes from a (count, checksum)
scan-aggregate instead of a key-shuffle join — valid because labels are
elementwise non-increasing and the key set is constant. String keys must
keep the join-based check (no checksum exists)."""

from __future__ import annotations

from crawl_streams_spark.operators import dedup as D


def test_numeric_long_chain_exact_fixed_point(spark):
    # a 64-node path needs several propagation+jump rounds; every node
    # must land on the global min label, proving the checksum check
    # never declares convergence early (an early stop would leave
    # mid-chain nodes on a local min)
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["key_a", "key_b"]
    )
    got = {r["key"]: r["cluster"] for r in D.cluster_duplicates(pairs).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_string_keys_use_join_fallback(spark):
    # string labels have no checksum; the join fallback must still
    # converge and produce min-lexicographic cluster labels
    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")], ["key_a", "key_b"]
    )
    got = {r["key"]: r["cluster"] for r in D.cluster_duplicates(pairs).collect()}
    assert got == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}


def test_two_components_do_not_merge(spark):
    # checksum equality must compare per-round totals, not component
    # structure: two components whose label sums coincide with a merged
    # layout would be the dangerous aliasing case — construct disjoint
    # components and assert they stay distinct
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (100, 101), (101, 102)], ["key_a", "key_b"]
    )
    got = {r["key"]: r["cluster"] for r in D.cluster_duplicates(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 100: 100, 101: 100, 102: 100}
