"""q-gram-blocked edit-distance join (operators/fuzzy.py): exactness vs
a brute-force reference (the blocking must lose NO pairs — the q-gram
lemma's whole claim), multiset gram semantics, tiny-string fallback
block. Cross-engine value gate: fuzzy_part_name_pairs."""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from crawl_streams_spark.operators import fuzzy as FZ


def _lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[:], i
        for j, cb in enumerate(b, 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
    return d[-1]


def _check(spark, names, k, q=2):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(names)], "id bigint, s string"
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in FZ.fuzzy_self_join(df, "id", "s", k=k, q=q).collect()
    }
    want = {
        (i, j, _lev(names[i], names[j]))
        for i, j in itertools.combinations(range(len(names)), 2)
        if _lev(names[i], names[j]) <= k
    }
    assert got == want, (got - want, want - got)


def test_fuzzy_join_fixed_corpus_exact(spark):
    _check(
        spark,
        [
            "blue bolt", "blue belt", "small ring", "small king",
            "sm", "s", "tiny", "blue  bolt", "hot gear", "hot bear",
            "aaaa", "aaab", "abab", "bbbb",  # repeated-gram multiset cases
        ],
        k=2,
    )


def test_fuzzy_join_k1_tightens(spark):
    _check(spark, ["abcdefg", "abcdefh", "abcdeXY", "zzzzzzz"], k=1)


def test_fuzzy_join_identical_strings_distance_zero(spark):
    import pyspark.sql.functions as F  # noqa: F401

    _check(spark, ["same name", "same name!", "same name"], k=1)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=8),
        min_size=2,
        max_size=8,
        unique=True,
    ),
    st.sampled_from([1, 2]),
)
def test_fuzzy_join_equals_bruteforce_property(spark, names, k):
    """Random short strings over a tiny alphabet — dense near-pairs,
    repeated grams, empty strings, lengths straddling the tiny-block
    threshold."""
    _check(spark, names, k=k)
