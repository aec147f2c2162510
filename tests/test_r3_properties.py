"""Property-based tests for the round-3-continuation operators: interval
joins vs a brute-force reference on random interval sets, SCD2 vs a
per-key history reconstruction, CMS one-sided guarantee on random
multisets, and weighted-sample determinism under repartitioning.

Spark collect()s inside hypothesis bodies are slow — examples are kept
small and few; the deterministic unit tests in the per-module files carry
the broad coverage, these pin the algebraic properties on adversarial
shapes (touching endpoints, zero-length intervals, gap/reappear version
stacks, duplicate-heavy multisets)."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl_streams_spark.functions import sketch as S
from crawl_streams_spark.operators import diff as D
from crawl_streams_spark.operators import interval as IV

_interval = st.tuples(
    st.integers(min_value=0, max_value=60),
    st.integers(min_value=0, max_value=25),
).map(lambda t: (t[0], t[0] + t[1]))


@settings(max_examples=12, deadline=None)
@given(
    st.lists(_interval, min_size=1, max_size=8),
    st.lists(_interval, min_size=1, max_size=8),
    st.sampled_from([3, 7, 10, 64]),
)
def test_overlap_join_equals_bruteforce_property(spark, left, right, width):
    ldf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(left)], "id bigint, s bigint, e bigint"
    )
    rdf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(right)], "id bigint, s bigint, e bigint"
    )
    got = {
        (r["id"], r["r_id"])
        for r in IV.interval_overlap_join(
            ldf, rdf, "s", "e", "s", "e", width=width
        ).collect()
    }
    want = {
        (i, j)
        for i, (ls, le) in enumerate(left)
        for j, (rs, re_) in enumerate(right)
        if ls <= re_ and rs <= le
    }
    assert got == want


def _scd2_brute(versions_present: dict[int, dict[int, str]]):
    """Reference reconstruction: for each key walk the global version list
    in order, opening/closing runs on change or absence."""
    # operator contract: the version list derives from data rows, so a
    # completely empty snapshot is invisible (documented in scd2_compress)
    all_versions = sorted(v for v, snap in versions_present.items() if snap)
    keys = {k for snap in versions_present.values() for k in snap}
    out = set()
    for k in keys:
        run = None  # (value, valid_from)
        for idx, v in enumerate(all_versions):
            val = versions_present[v].get(k)
            if run is not None and (val is None or val != run[0]):
                out.add((k, run[0], run[1], v, False))
                run = None
            if val is not None and run is None:
                run = (val, v)
            elif val is not None and idx > 0 and k not in versions_present[all_versions[idx - 1]]:
                # unreachable: absence closed the run above
                pass
        if run is not None:
            out.add((k, run[0], run[1], None, True))
    return out


@settings(max_examples=12, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=1, max_value=4),  # version
        st.dictionaries(
            st.integers(min_value=0, max_value=5),  # key
            st.sampled_from(["a", "b"]),
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_scd2_equals_bruteforce_property(spark, snaps):
    rows = [
        (v, k, val)
        for v, snap in snaps.items()
        for k, val in snap.items()
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "version bigint, k bigint, v string")
    got = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in D.scd2_compress(df, ["k"], "version").collect()
    }
    assert got == _scd2_brute(snaps)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.sampled_from(["x", "y", "z", "w", "longer-item"]),
        min_size=1,
        max_size=40,
    )
)
def test_cms_never_underestimates_property(spark, items):
    from collections import Counter

    df = spark.createDataFrame([(i,) for i in items], "item string")
    sk = S.cms_build(df, "item", depth=3, width=16)
    q = spark.createDataFrame([(i,) for i in set(items)], "item string")
    est = {
        r["item"]: r["est_cnt"]
        for r in S.cms_lookup(sk, q, "item", 3, 16).collect()
    }
    true = Counter(items)
    for item, t in true.items():
        assert est[item] >= t


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=1, max_value=8), st.integers(min_value=2, max_value=5))
def test_weighted_sample_invariant_under_partitioning(spark, parts, k):
    from crawl_streams_spark.operators import pipeline as P

    df = spark.createDataFrame(
        [(i, float(1 + i % 9)) for i in range(100)], "id bigint, w double"
    )
    base = sorted(
        r["id"] for r in P.weighted_sample(df, "id", "w", k).collect()
    )
    re = sorted(
        r["id"]
        for r in P.weighted_sample(df.repartition(parts), "id", "w", k).collect()
    )
    assert base == re
