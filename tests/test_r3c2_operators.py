"""Unit/property tests for the round-3 second-continuation operators:
KMV sketch algebra, exact prefix-filter similarity join vs brute force,
bigram PMI against hand math, rolling z-score anomalies, market-basket
lift, and balanced sharding / scalable global rank."""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F

from crawl_streams_spark.functions import sketch as S
from crawl_streams_spark.operators import corpus_stats as CS
from crawl_streams_spark.operators import market as M
from crawl_streams_spark.operators import pipeline as P
from crawl_streams_spark.operators import timeseries as TS
from crawl_streams_spark.operators.fuzzy import prefix_jaccard_self_join

# --- KMV -----------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [(i % 40,) for i in range(400)], "x bigint"
    )
    est = S.kmv_estimate(S.kmv_table(df, "x", k=256)).collect()[0]
    assert est["n_kept"] == 40
    assert est["approx_distinct"] == 40.0


def test_kmv_estimate_accuracy(spark):
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "x bigint")
    est = S.kmv_estimate(S.kmv_table(df, "x", k=256)).collect()[0]
    # k=256 → relative std error ≈ 1/sqrt(k-2) ≈ 6.3%; allow 4σ
    assert abs(est["approx_distinct"] - n) / n < 0.25


def test_kmv_merge_equals_union_sketch(spark):
    a = spark.createDataFrame([(i,) for i in range(0, 3000)], "x bigint")
    b = spark.createDataFrame([(i,) for i in range(1500, 4500)], "x bigint")
    u = a.unionByName(b)
    k = 128
    merged = S.kmv_merge(
        S.kmv_table(a, "x", k=k), S.kmv_table(b, "x", k=k), k=k
    )
    direct = S.kmv_table(u, "x", k=k)
    assert sorted(r["hv"] for r in merged.collect()) == sorted(
        r["hv"] for r in direct.collect()
    )


def test_kmv_partition_invariance(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "x bigint")
    e1 = S.kmv_estimate(S.kmv_table(df.repartition(1), "x", k=64)).collect()
    e17 = S.kmv_estimate(S.kmv_table(df.repartition(17), "x", k=64)).collect()
    assert e1 == e17


# --- prefix-filter similarity join ---------------------------------------


def _brute_pairs(sets, p, q):
    out = set()
    ids = sorted(sets)
    for i, ia in enumerate(ids):
        for ib in ids[i + 1 :]:
            inter = len(sets[ia] & sets[ib])
            uni = len(sets[ia] | sets[ib])
            if q * inter >= p * uni:
                out.add((ia, ib))
    return out


def test_prefix_jaccard_equals_bruteforce(spark):
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(30)]
    sets = {
        i: set(rng.sample(vocab, rng.randint(3, 12))) for i in range(60)
    }
    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in sets.items()],
        "id bigint, toks array<string>",
    )
    for p, q in [(1, 2), (7, 10), (9, 10)]:
        got = {
            (r["id_a"], r["id_b"])
            for r in prefix_jaccard_self_join(df, "id", "toks", p, q).collect()
        }
        assert got == _brute_pairs(sets, p, q), (p, q)


def test_prefix_jaccard_boundary_pair_included(spark):
    # jaccard exactly 1/2: {a,b,c} vs {b,c,d} → inter 2, union 4
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["b", "c", "d"])],
        "id bigint, toks array<string>",
    )
    rows = prefix_jaccard_self_join(df, "id", "toks", 1, 2).collect()
    assert len(rows) == 1 and rows[0]["jaccard"] == 0.5


# --- bigram PMI ----------------------------------------------------------


def test_bigram_pmi_hand_math(spark):
    # corpus: "a b a b" ×3 and "c c" ×2 → unigrams a:6 b:6 c:4 (N=16),
    # bigrams (a,b):6 (b,a):3 (c,c):2 (N_bi=11)
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b a b"), (3, "a b a b"), (4, "c c"), (5, "c c")],
        "doc_id bigint, text string",
    )
    rows = {
        (r["tok_a"], r["tok_b"]): r
        for r in CS.bigram_pmi(df, min_count=2, k=10).collect()
    }
    ab = rows[("a", "b")]
    assert (ab["n_ab"], ab["n_a"], ab["n_b"]) == (6, 6, 6)
    expected = round(math.log((6 * 16 * 16) / (11.0 * 6 * 6)), 6)
    assert ab["pmi"] == expected
    cc = rows[("c", "c")]
    assert cc["n_ab"] == 2
    assert ("b", "a") in rows and rows[("b", "a")]["n_ab"] == 3


# --- rolling anomalies ---------------------------------------------------


def test_rolling_anomalies_flags_spike(spark):
    vals = [10.0] * 30
    vals[20] = 500.0
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)],
        "k string, t bigint, v double",
    ).withColumn("v", F.col("v").cast("decimal(18,4)"))
    out = {
        r["t"]: r
        for r in TS.rolling_anomalies(
            df, ["k"], "t", "v", lookback=10, z_threshold=3.0
        ).collect()
    }
    assert out[20]["is_anomaly"] is True
    # spike sits in later rows' baselines, inflating std — but flat rows
    # right before the spike must be clean, and so must row 0 (empty
    # window → null z, not anomalous)
    assert all(not out[t]["is_anomaly"] for t in range(0, 20))
    assert out[0]["zscore"] is None and out[0]["roll_cnt"] == 0
    # constant window → std 0 → z null
    assert out[5]["roll_std"] == 0.0 and out[5]["zscore"] is None


# --- market basket -------------------------------------------------------


def test_basket_pair_lift_hand_math(spark):
    lines = spark.createDataFrame(
        [
            (1, "x"), (1, "y"),
            (2, "x"), (2, "y"),
            (3, "x"), (3, "z"),
            (4, "y"),
            (1, "x"),  # duplicate line must not double-count the basket
        ],
        "o bigint, i string",
    )
    rows = {
        (r["item_a"], r["item_b"]): r
        for r in M.basket_pair_lift(lines, "o", "i", k=10).collect()
    }
    xy = rows[("x", "y")]
    # n_ab=2 baskets {1,2}; n_x=3, n_y=3, N=4 → lift = 2·4/(3·3)
    assert (xy["n_ab"], xy["n_a"], xy["n_b"]) == (2, 3, 3)
    assert xy["lift"] == round(2 * 4 / 9.0, 6)
    assert rows[("x", "z")]["n_ab"] == 1
    assert ("y", "z") not in rows


# --- balanced shards / global rank ---------------------------------------


def test_global_rank_matches_single_window(spark):
    rng = random.Random(3)
    data = [(i, rng.randint(0, 50)) for i in range(500)]
    df = spark.createDataFrame(data, "id bigint, w bigint")
    ref = {
        i: rk + 1
        for rk, (i, _) in enumerate(
            sorted(data, key=lambda t: (-t[1], t[0]))
        )
    }
    for nparts in (1, 3, 8):
        for pin in ("boundaries", "checkpoint"):
            got = {
                r["id"]: r["rank"]
                for r in P.global_rank(
                    df,
                    [("w", "desc"), "id"],
                    num_partitions=nparts,
                    pin=pin,
                ).collect()
            }
            assert got == ref, (nparts, pin)


def test_global_rank_constant_key_degenerates_correctly(spark):
    # constant leading key: no quantile boundaries exist, every row lands
    # in one bucket, and the rank must still be the plain total-order rank
    df = spark.createDataFrame(
        [(i, 7) for i in range(50)], "id bigint, w bigint"
    )
    got = {
        r["id"]: r["rank"]
        for r in P.global_rank(df, [("w", "desc"), "id"]).collect()
    }
    assert got == {i: i + 1 for i in range(50)}


def test_balanced_shards_balance_bound(spark):
    rng = random.Random(11)
    data = [(i, rng.randint(1, 1000)) for i in range(997)]
    df = spark.createDataFrame(data, "id bigint, w bigint")
    out = (
        P.balanced_shards(df, "w", "id", 8)
        .groupBy("shard")
        .agg(F.sum("w").alias("tot"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(out) == 8
    tots = [r["tot"] for r in out]
    # sorted round-robin dealing: totals telescope, so the spread is
    # bounded by the single largest weight
    assert max(tots) - min(tots) <= max(w for _, w in data)
    ns = [r["n"] for r in out]
    assert max(ns) - min(ns) <= 1


# --- equi-depth bins ------------------------------------------------------


def test_equi_depth_bins_population_and_order(spark):
    rng = random.Random(5)
    data = [(i, rng.uniform(0, 1e6)) for i in range(1003)]
    df = spark.createDataFrame(data, "id bigint, v double")
    out = P.equi_depth_bins(df, "v", "id", 8).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault(r["bin"], []).append(r["v"])
    assert sorted(by_bin) == list(range(8))
    sizes = [len(by_bin[b]) for b in range(8)]
    assert max(sizes) - min(sizes) <= 1
    # bins are value-ordered: every bin's max ≤ next bin's min
    for b in range(7):
        assert max(by_bin[b]) <= min(by_bin[b + 1])


# --- skyline --------------------------------------------------------------


def _brute_skyline(rows):
    out = []
    for r in rows:
        if not any(
            s[1] <= r[1] and s[2] >= r[2] and (s[1] < r[1] or s[2] > r[2])
            for s in rows
        ):
            out.append(r[0])
    return sorted(out)


def test_skyline_matches_bruteforce(spark):
    from crawl_streams_spark.operators.skyline import skyline_2d

    rng = random.Random(9)
    rows = [(i, rng.randint(0, 20), rng.randint(0, 20)) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, cost bigint, gain bigint")
    got = sorted(r["id"] for r in skyline_2d(df, "cost", "gain").collect())
    assert got == _brute_skyline(rows)


def test_skyline_keeps_colocated_duplicates_drops_strict_ties(spark):
    from crawl_streams_spark.operators.skyline import skyline_2d

    rows = [
        (1, 5, 10),
        (2, 5, 10),  # identical point: both survive
        (3, 6, 10),  # same gain, higher cost: dominated by 1/2
        (4, 5, 9),   # same cost, lower gain: dominated
        (5, 4, 3),   # cheaper, low gain: survives
    ]
    df = spark.createDataFrame(rows, "id bigint, cost bigint, gain bigint")
    got = sorted(r["id"] for r in skyline_2d(df, "cost", "gain").collect())
    assert got == [1, 2, 5]


def test_skyline_grouped_is_per_group(spark):
    from crawl_streams_spark.operators.skyline import skyline_2d

    rows = [("g1", 1, 1, 5), ("g1", 2, 2, 9), ("g2", 3, 1, 1)]
    df = spark.createDataFrame(
        rows, "g string, id bigint, cost bigint, gain bigint"
    )
    got = sorted(
        r["id"]
        for r in skyline_2d(df, "cost", "gain", group_cols=("g",)).collect()
    )
    # g2's only row survives in its own group even though g1 dominates it
    assert got == [1, 2, 3]


# --- randomized/property checks ------------------------------------------


def test_rolling_anomalies_matches_decimal_reference(spark):
    from decimal import Decimal

    rng = random.Random(21)
    vals = [round(rng.uniform(-50, 50), 4) for _ in range(60)]
    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(vals)],
        "s string, t bigint, v double",
    ).withColumn("v", F.col("v").cast("decimal(18,4)"))
    got = {
        r["t"]: r
        for r in TS.rolling_anomalies(df, ["s"], "t", "v", lookback=7).collect()
    }
    dvals = [Decimal(str(v)).quantize(Decimal("0.0001")) for v in vals]
    for t in range(len(vals)):
        w = dvals[max(0, t - 7) : t]
        assert got[t]["roll_cnt"] == len(w)
        if not w:
            continue
        s1, s2, cnt = sum(w), sum(x * x for x in w), len(w)
        mean = float(s1) / cnt
        var = max((float(s2) - (float(s1) * float(s1)) / cnt) / cnt, 0.0)
        assert got[t]["roll_mean"] == round(mean, 6), t
        assert got[t]["roll_std"] == round(math.sqrt(var), 6), t


def test_prefix_jaccard_threshold_one_is_exact_duplicates(spark):
    df = spark.createDataFrame(
        [
            (1, ["a", "b"]),
            (2, ["a", "b"]),
            (3, ["a", "b", "c"]),
            (4, ["c"]),
            (5, ["c"]),
        ],
        "id bigint, toks array<string>",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_jaccard_self_join(df, "id", "toks", 1, 1).collect()
    }
    assert got == {(1, 2), (4, 5)}


def test_skyline_ascending_chain_all_survive(spark):
    from crawl_streams_spark.operators.skyline import skyline_2d

    rows = [(i, i, i) for i in range(20)]  # dearer but better: no dominance
    df = spark.createDataFrame(rows, "id bigint, cost bigint, gain bigint")
    assert len(skyline_2d(df, "cost", "gain").collect()) == 20


def test_equi_depth_bins_with_massive_ties(spark):
    df = spark.createDataFrame(
        [(i, 7) for i in range(100)], "id bigint, v bigint"
    )
    out = P.equi_depth_bins(df, "v", "id", 4).collect()
    sizes = {}
    for r in out:
        sizes[r["bin"]] = sizes.get(r["bin"], 0) + 1
    assert sizes == {0: 25, 1: 25, 2: 25, 3: 25}


def test_global_rank_null_desc_leading_key(spark):
    """ADVICE r4: a NULL in a DESCENDING leading key must rank LAST
    (Spark desc() is NULLS LAST), matching the single-window reference —
    the old +inf coalesce bucketed NULL rows at the front."""
    data = [(0, 3.0), (1, None), (2, 1.0), (3, None), (4, 2.0), (5, 1.0)]
    df = spark.createDataFrame(data, "id bigint, w double")
    # desc NULLS LAST, tie-break on id: 3.0, 2.0, 1.0(id2), 1.0(id5),
    # NULL(id1), NULL(id3)
    ref = {0: 1, 4: 2, 2: 3, 5: 4, 1: 5, 3: 6}
    for nparts in (1, 3, 8):
        got = {
            r["id"]: r["rank"]
            for r in P.global_rank(
                df, [("w", "desc"), "id"], num_partitions=nparts
            ).collect()
        }
        assert got == ref, nparts
    # ascending NULLS FIRST still holds too
    ref_asc = {1: 1, 3: 2, 2: 3, 5: 4, 4: 5, 0: 6}
    got_asc = {
        r["id"]: r["rank"]
        for r in P.global_rank(df, ["w", "id"], num_partitions=4).collect()
    }
    assert got_asc == ref_asc


def test_global_rank_wide_bucket_fallback_matches(spark):
    """> 256 boundaries routes through the bounded HOF form (codegen
    method-size guard); values must match the static-chain path."""
    data = [(i, float(i % 977)) for i in range(3000)]
    df = spark.createDataFrame(data, "id bigint, w double")
    ref = {
        i: rk + 1
        for rk, (i, _) in enumerate(sorted(data, key=lambda t: (t[1], t[0])))
    }
    got = {
        r["id"]: r["rank"]
        for r in P.global_rank(
            df, ["w", "id"], num_partitions=400
        ).collect()
    }
    assert got == ref
