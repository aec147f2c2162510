"""Count-min sketch (functions/sketch.py): one-sided error guarantee,
merge-associativity, weighted builds, absent items, and the bounded
sketch cardinality. Cross-engine value gate: plans/q_sketch.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl_streams_spark.functions import sketch as S

_D, _W = 4, 64


def _items(spark, seq):
    return spark.createDataFrame([(x,) for x in seq], "item string")


def _est(spark, sketch, items):
    q = _items(spark, items)
    rows = S.cms_lookup(sketch, q, "item", _D, _W).collect()
    return {r["item"]: r["est_cnt"] for r in rows}


def test_never_underestimates_and_is_exact_without_collisions(spark):
    data = ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d"]
    sk = S.cms_build(_items(spark, data), "item", _D, _W)
    true = {"a": 50, "b": 20, "c": 5, "d": 1}
    est = _est(spark, sk, list(true))
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
    # 4 distinct items in a 4x64 sketch: overshoot only via collisions,
    # and with depth 4 at least one row is collision-free here
    assert est == true


def test_absent_item_estimates_zero_on_sparse_sketch(spark):
    sk = S.cms_build(_items(spark, ["x", "y"]), "item", _D, _W)
    est = _est(spark, sk, ["nope"])
    assert est["nope"] == 0


def test_merge_equals_single_build(spark):
    a = ["a"] * 10 + ["b"] * 3
    b = ["b"] * 7 + ["c"] * 2
    merged = S.cms_merge(
        S.cms_build(_items(spark, a), "item", _D, _W),
        S.cms_build(_items(spark, b), "item", _D, _W),
    )
    whole = S.cms_build(_items(spark, a + b), "item", _D, _W)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_weighted_build_matches_repeated_rows(spark):
    weighted = spark.createDataFrame(
        [("a", 10), ("b", 3)], "item string, w bigint"
    )
    sk_w = S.cms_build(weighted, "item", _D, _W, weight_col="w")
    sk_r = S.cms_build(_items(spark, ["a"] * 10 + ["b"] * 3), "item", _D, _W)
    assert sorted(map(tuple, sk_w.collect())) == sorted(
        map(tuple, sk_r.collect())
    )


def test_sketch_cardinality_bounded_by_depth_times_width(spark):
    data = [f"item-{i}" for i in range(500)]
    sk = S.cms_build(_items(spark, data), "item", _D, _W)
    assert sk.count() <= _D * _W
    # every depth row present, buckets in range
    rows = sk.collect()
    assert {r["d"] for r in rows} == set(range(_D))
    assert all(0 <= r["bucket"] < _W for r in rows)


# ---- bloom filter ------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    members = [f"m-{i}" for i in range(300)]
    bl = S.bloom_build(_items(spark, members), "item", 2048, 3)
    got = {
        r["item"]: r["maybe_present"]
        for r in S.bloom_probe(
            bl, _items(spark, members), "item", 2048, 3
        ).collect()
    }
    assert all(got[m] for m in members)


def test_bloom_rejects_most_absent_items(spark):
    members = [f"m-{i}" for i in range(100)]
    absent = [f"x-{i}" for i in range(400)]
    bl = S.bloom_build(_items(spark, members), "item", 4096, 3)
    got = S.bloom_probe(bl, _items(spark, absent), "item", 4096, 3).collect()
    fp = sum(1 for r in got if r["maybe_present"])
    # n=100, m=4096, k=3: theoretical fp ~ (1-e^(-300/4096))^3 ~ 3.6e-4;
    # allow generous slack
    assert fp <= 10, fp


def test_bloom_merge_by_union_distinct(spark):
    a = _items(spark, ["a", "b"])
    b = _items(spark, ["c"])
    merged = (
        S.bloom_build(a, "item", 512, 3)
        .unionByName(S.bloom_build(b, "item", 512, 3))
        .distinct()
    )
    whole = S.bloom_build(_items(spark, ["a", "b", "c"]), "item", 512, 3)
    assert sorted(r["pos"] for r in merged.collect()) == sorted(
        r["pos"] for r in whole.collect()
    )


def test_bloom_positions_in_range(spark):
    bl = S.bloom_build(_items(spark, [f"i{i}" for i in range(50)]), "item", 256, 4)
    assert all(0 <= r["pos"] < 256 for r in bl.collect())


# ---- deterministic HyperLogLog -----------------------------------------


def test_hll_small_range_is_near_exact(spark):
    """n=15 distinct at m=256 sits in the linear-counting branch: the
    estimate lands within a fraction of a unit of truth."""
    df = _items(spark, [f"u{i % 15}" for i in range(300)])
    est = S.hll_estimate(S.hll_registers(df, "item")).collect()[0][
        "approx_distinct"
    ]
    assert abs(est - 15) < 1.0, est


def test_hll_large_range_error_bound(spark):
    """n=5000 at m=256: standard error ~1.04/sqrt(256) = 6.5%; assert a
    generous 3-sigma bound."""
    df = _items(spark, [f"user-{i}" for i in range(5000)])
    est = S.hll_estimate(S.hll_registers(df, "item")).collect()[0][
        "approx_distinct"
    ]
    assert abs(est - 5000) / 5000 < 0.20, est


def test_hll_duplicates_do_not_move_the_estimate(spark):
    once = _items(spark, [f"u{i}" for i in range(1000)])
    thrice = _items(spark, [f"u{i}" for i in range(1000)] * 3)
    e1 = S.hll_estimate(S.hll_registers(once, "item")).collect()[0][0]
    e3 = S.hll_estimate(S.hll_registers(thrice, "item")).collect()[0][0]
    assert e1 == e3


def test_hll_merge_equals_single_build(spark):
    a = _items(spark, [f"a{i}" for i in range(400)])
    b = _items(spark, [f"a{i}" for i in range(200, 600)])  # overlap
    merged = S.hll_merge(
        S.hll_registers(a, "item"), S.hll_registers(b, "item")
    )
    whole = S.hll_registers(
        _items(spark, [f"a{i}" for i in range(600)]), "item"
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_grouped_estimates(spark):
    rows = [(f"g{j}", f"u{i}") for j in range(3) for i in range(50 * (j + 1))]
    df = spark.createDataFrame(rows, "g string, item string")
    regs = S.hll_registers(df, "item", group_cols=("g",))
    est = {
        r["g"]: r["approx_distinct"]
        for r in S.hll_estimate(regs, group_cols=("g",)).collect()
    }
    for j, n in (("g0", 50), ("g1", 100), ("g2", 150)):
        assert abs(est[j] - n) / n < 0.25, (j, est[j])


def test_cms_inner_product_upper_bounds_true_join_size(spark):
    import random as _r

    rng = _r.Random(29)
    a_items = [rng.randint(0, 40) for _ in range(300)]
    b_items = [rng.randint(0, 40) for _ in range(200)]
    da = spark.createDataFrame([(x,) for x in a_items], "x bigint")
    db = spark.createDataFrame([(x,) for x in b_items], "x bigint")
    ska = S.cms_build(da, "x", depth=4, width=64)
    skb = S.cms_build(db, "x", depth=4, width=64)
    est = S.cms_inner_product(ska, skb).collect()[0]["est_join_size"]
    from collections import Counter

    ca, cb = Counter(a_items), Counter(b_items)
    true_ip = sum(ca[v] * cb.get(v, 0) for v in ca)
    # one-sided guarantee: hash collisions only ADD mass
    assert est >= true_ip
    # and with 4 rows × 64 buckets on a 41-value domain it stays close
    assert est <= true_ip * 2


def test_cms_inner_product_missing_depth_bounds_to_zero(spark):
    """ADVICE r3: a depth row with zero overlapping buckets has TRUE
    inner product 0 — the tightest upper bound — and must participate in
    the min; fully disjoint sketches must estimate 0, not NULL."""
    a = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 7)], "d int, bucket int, cnt bigint"
    )
    b = spark.createDataFrame([(0, 1, 3)], "d int, bucket int, cnt bigint")
    # depth 0 overlaps (5·3=15) but depth 1 doesn't → min is 0
    assert S.cms_inner_product(a, b).first()["est_join_size"] == 0
    c = spark.createDataFrame(
        [(0, 9, 3), (1, 9, 3)], "d int, bucket int, cnt bigint"
    )
    assert S.cms_inner_product(a, c).first()["est_join_size"] == 0


def test_kmv_ungrouped_pre_reduces_before_global_window(spark):
    """ADVICE r3 medium: ungrouped kmv_table must not funnel every
    distinct hash through one task — the plan pre-reduces per shuffle
    partition (a __part-keyed window) before the tiny global window, and
    the result is still the exact global k-min set."""
    items = _items(spark, [f"item-{i}" for i in range(5000)])
    tab = S.kmv_table(items, "item", k=64)
    plan = tab._jdf.queryExecution().executedPlan().toString()
    assert "__part" in plan
    got = sorted(r["hv"] for r in tab.collect())
    full = sorted(
        r["hv"]
        for r in items.select(S.kmv_hash("item").alias("hv"))
        .distinct()
        .collect()
    )
    assert got == full[:64]


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mg_partition_summaries / mg_summary)


def _mg_stream(spark, values, partitions=4):
    return (
        spark.createDataFrame([(v,) for v in values], "item string")
        .repartition(partitions)
    )


def test_mg_bounds_hold_under_forced_pruning(spark):
    """Zipf-ish stream with domain ≫ k: est ≤ true, true − est ≤
    err_total, err_total ≤ n/(k+1) — the mergeable-summaries
    guarantees, on a stream where pruning genuinely fires."""
    from collections import Counter

    from crawl_streams_spark.functions.sketch import mg_summary

    values = []
    for i in range(2000):
        values.append(f"hot{i % 3}")          # 3 heavy keys
        values.append(f"cold{i}")             # 2000 singletons
    true = Counter(values)
    k = 50
    rows = mg_summary(_mg_stream(spark, values), "item", k=k).collect()
    assert rows, "summary empty"
    err_total = rows[0]["err_total"]
    n = len(values)
    assert 0 < err_total <= n // (k + 1), (err_total, n)
    assert len({r["item"] for r in rows}) == len(rows)
    for r in rows:
        t = true[r["item"]]
        assert r["est"] <= t, (r, t)
        assert t - r["est"] <= err_total, (r, t, err_total)
    # an absent item's true count is bounded by err_total too
    present = {r["item"] for r in rows}
    for it, t in true.items():
        if it not in present:
            assert t <= err_total, (it, t, err_total)


def test_mg_guarantees_presence_of_true_heavy_hitters(spark):
    from crawl_streams_spark.functions.sketch import mg_summary

    # 5 items each with 12% of the stream; 40% spread over 4000 keys
    values = [f"hh{j}" for j in range(5) for _ in range(1200)]
    values += [f"tail{i}" for i in range(4000)]
    k = 49  # threshold n/50 = 200 < 1200
    present = {
        r["item"]
        for r in mg_summary(_mg_stream(spark, values), "item", k=k).collect()
    }
    for j in range(5):
        assert f"hh{j}" in present


def test_mg_exact_when_domain_fits_in_k(spark):
    from collections import Counter

    from crawl_streams_spark.functions.sketch import mg_summary

    values = [f"v{i % 7}" for i in range(700)]
    rows = mg_summary(_mg_stream(spark, values), "item", k=32).collect()
    true = Counter(values)
    assert rows[0]["err_total"] == 0
    assert {r["item"]: r["est"] for r in rows} == dict(true)


def test_mg_null_items_raise(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from crawl_streams_spark.functions.sketch import mg_summary

    df = spark.createDataFrame([("a",), (None,), ("b",)], "item string")
    with _pytest.raises(Exception) as ei:
        mg_summary(df, "item", k=4).collect()
    assert "null items unsupported" in str(ei.value)


# ---------------------------------------------------------------------------
# MRL mergeable quantile sketch (mrl_partition_summaries / mrl_merge /
# mrl_quantiles)


def _mrl_rows(spark, values, c=64, partitions=4):
    from crawl_streams_spark.functions.sketch import (
        mrl_merge,
        mrl_partition_summaries,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in values], "value double"
    ).repartition(partitions)
    return mrl_merge(mrl_partition_summaries(df, "value", c=c), c=c).collect()


def _check_bounds(values, rows, qs):
    import math

    import numpy as np

    from crawl_streams_spark.functions.sketch import mrl_quantiles

    arr = np.asarray(values, dtype=float)
    ests, B, n, w_max = mrl_quantiles(rows, qs)
    assert n == len(values), "weight mass not conserved"
    for q in qs:
        t = max(1, math.ceil(q * n))
        est = ests[q]
        lt = int((arr < est).sum())
        le = int((arr <= est).sum())
        assert le + B >= t, (q, est, le, B, t)
        assert lt <= t + B + w_max, (q, est, lt, B, w_max, t)
    return B


def test_mrl_exact_when_no_compaction(spark):
    import numpy as np

    values = list(np.random.default_rng(0).normal(size=40))
    rows = _mrl_rows(spark, values, c=64, partitions=2)
    assert all(r["weight"] == 1 for r in rows if not r["meta"])
    B = _check_bounds(values, rows, [0.1, 0.5, 0.9])
    assert B == 0
    got = sorted(r["value"] for r in rows if not r["meta"])
    assert got == sorted(values)


def test_mrl_bounds_on_adversarial_orders(spark):
    import numpy as np

    qs = [0.05, 0.25, 0.5, 0.75, 0.95]
    rng = np.random.default_rng(42)
    streams = {
        "sorted": np.arange(20000.0),
        "reversed": np.arange(20000.0)[::-1],
        "heavy_dups": np.repeat([1.0, 2.0, 3.0], [15000, 4000, 1000]),
        "lognormal": rng.lognormal(0, 2, size=20000),
    }
    for name, values in streams.items():
        rows = _mrl_rows(spark, list(values), c=100, partitions=6)
        B = _check_bounds(list(values), rows, qs)
        n = len(values)
        # sanity: the tracked bound stays a small fraction of n
        assert B < 0.1 * n, (name, B, n)
        # and the merged summary stays sketch-sized
        assert len(rows) < 30 * 100, (name, len(rows))


def test_mrl_merge_matches_single_partition_bounds(spark):
    import numpy as np

    values = list(np.random.default_rng(7).uniform(0, 1000, size=30000))
    one = _mrl_rows(spark, values, c=128, partitions=1)
    many = _mrl_rows(spark, values, c=128, partitions=16)
    for rows in (one, many):
        _check_bounds(values, rows, [0.1, 0.5, 0.9])
    # the tracked error mass is schedule-dependent (NOT monotone in the
    # partition count), but both schedules must stay a small fraction of n
    for rows in (one, many):
        b = sum(r["weight"] for r in rows if r["meta"])
        assert 0 < b < 0.05 * len(values), b


def test_mrl_null_values_raise(spark):
    import pytest as _pytest

    from crawl_streams_spark.functions.sketch import mrl_partition_summaries

    df = spark.createDataFrame([(1.0,), (None,), (2.0,)], "value double")
    with _pytest.raises(Exception) as ei:
        mrl_partition_summaries(df, "value", c=8).collect()
    assert "null values unsupported" in str(ei.value)


# ---------------------------------------------------------------------------
# Property tests driving the mapInPandas generators directly (no Spark):
# the Spark stages use the SAME module-level generators.

from hypothesis import given, settings
from hypothesis import strategies as st


def _run_gen(gen, frames):
    out = list(gen(iter(frames)))
    assert len(out) == 1
    return out[0]


@given(
    st.lists(
        st.lists(st.integers(0, 30), min_size=0, max_size=200),
        min_size=1,
        max_size=5,
    ),
    st.integers(2, 12),
)
@settings(max_examples=150, deadline=None)
def test_mg_gen_invariants_property(chunks, k):
    import pandas as pd

    from crawl_streams_spark.functions.sketch import _mg_gen

    frames = [
        pd.DataFrame({"item": [f"i{v}" for v in chunk]}) for chunk in chunks
    ]
    out = _run_gen(_mg_gen(k), frames)
    from collections import Counter

    true = Counter(f"i{v}" for chunk in chunks for v in chunk)
    n = sum(true.values())
    ests = out[~out["meta"]]
    err = int(out.loc[out["meta"], "cnt"].iloc[0])
    assert len(ests) <= k
    assert 0 <= err <= n // (k + 1)
    for _, r in ests.iterrows():
        t = true[r["item"]]
        assert r["cnt"] <= t
        assert t - r["cnt"] <= err
    present = set(ests["item"])
    for it, t in true.items():
        if it not in present:
            assert t <= err, (it, t, err)


@given(
    st.lists(
        st.lists(
            st.floats(
                allow_nan=False, allow_infinity=False, width=32
            ),
            min_size=0,
            max_size=300,
        ),
        min_size=1,
        max_size=4,
    ),
    st.integers(8, 64),
)
@settings(max_examples=100, deadline=None)
def test_mrl_gen_invariants_property(chunks, c):
    import math

    import numpy as np
    import pandas as pd

    from crawl_streams_spark.functions.sketch import _mrl_gen, mrl_quantiles

    values = [v for chunk in chunks for v in chunk]
    frames = [pd.DataFrame({"value": chunk}, dtype=float) for chunk in chunks]
    out = _run_gen(_mrl_gen(c, None), frames)
    rows = [
        {"value": r["value"], "weight": int(r["weight"]), "meta": bool(r["meta"])}
        for _, r in out.iterrows()
    ]
    ests, B, n, w_max = mrl_quantiles(rows, [0.25, 0.5, 0.75])
    assert n == len(values)
    if not values:
        return
    arr = np.asarray(values, dtype=float)
    for q in (0.25, 0.5, 0.75):
        t = max(1, math.ceil(q * n))
        est = ests[q]
        assert int((arr <= est).sum()) + B >= t
        assert int((arr < est).sum()) <= t + B + w_max
