"""Round-5 kernels: windowed funnel (greedy latest-start DP),
density-exemplar dedup flags, and incremental SCD2 merge. Cross-engine
value gates: plans/q_behavior.py::windowed_funnel_levels,
plans/q_similarity.py::embedding_density_dedup,
plans/q_diff.py::orders_scd2_incremental."""

from __future__ import annotations

import datetime as dt

import pytest

import pyspark.sql.functions as F
from crawl_streams_spark.operators import diff as D
from crawl_streams_spark.operators.funnel import window_funnel
from crawl_streams_spark.operators.similarity import density_dedup_flags


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (uid, eid, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s), t)
            for uid, eid, s, t in rows
        ],
        "user_id bigint, event_id bigint, ts timestamp, event_type string",
    )


STEPS = ["view", "click", "purchase"]


def _levels(spark, rows, window_s):
    df = window_funnel(_ev(spark, rows), STEPS, window_s)
    return {r["user_id"]: r["funnel_level"] for r in df.collect()}


def test_window_funnel_basic_levels(spark):
    rows = [
        # u1: full chain within window
        (1, 1, 0, "view"), (1, 2, 10, "click"), (1, 3, 20, "purchase"),
        # u2: chain exists but span exceeds window
        (2, 4, 0, "view"), (2, 5, 10, "click"), (2, 6, 500, "purchase"),
        # u3: steps out of order -> only level 1
        (3, 7, 0, "purchase"), (3, 8, 10, "click"), (3, 9, 20, "view"),
        # u4: never saw the first step -> level 0
        (4, 10, 0, "click"), (4, 11, 5, "purchase"),
    ]
    assert _levels(spark, rows, 60) == {1: 3, 2: 2, 3: 1, 4: 0}


def test_window_funnel_greedy_latest_start_is_exact(spark):
    """The case a naive earliest-start scan gets wrong: the only chain
    completing within the window starts at the SECOND view."""
    rows = [
        (1, 1, 0, "view"), (1, 2, 2, "click"),
        (1, 3, 5, "view"), (1, 4, 6, "click"),
        (1, 5, 24, "purchase"),  # 24-5 <= 20 via the second (view,click)
    ]
    assert _levels(spark, rows, 20) == {1: 3}
    # tighten the window below every chain's span: level 2 remains
    # (click@6 - view@5 <= 3)
    assert _levels(spark, rows, 3) == {1: 2}


def test_window_funnel_equal_ts_chains_in_tiebreak_order(spark):
    # same timestamp: event_id order decides subsequence membership
    rows = [(1, 1, 0, "view"), (1, 2, 0, "click"), (1, 3, 0, "purchase")]
    assert _levels(spark, rows, 60) == {1: 3}
    # reversed event_ids at the same ts: no ordered chain
    rows_rev = [(1, 3, 0, "view"), (1, 2, 0, "click"), (1, 1, 0, "purchase")]
    assert _levels(spark, rows_rev, 60) == {1: 1}


def test_window_funnel_rejects_bad_steps(spark):
    df = _ev(spark, [(1, 1, 0, "view")])
    with pytest.raises(ValueError):
        window_funnel(df, ["view"], 60)
    with pytest.raises(ValueError):
        window_funnel(df, ["view", "view"], 60)


# --- density dedup -------------------------------------------------------


def _flags(spark, ids, pairs, thr):
    corpus = spark.createDataFrame([(i,) for i in ids], "vec_id bigint")
    pdf = spark.createDataFrame(
        pairs, "vec_a bigint, vec_b bigint, cos_sim double"
    )
    return {
        r["vec_id"]: (r["density"], r["kept"])
        for r in density_dedup_flags(corpus, pdf, thr).collect()
    }


def test_density_dedup_keeps_densest_exemplar(spark):
    # 1 is the hub (density 3); 2,3,4 each pair only with 1
    pairs = [(1, 2, 0.9), (1, 3, 0.9), (1, 4, 0.9)]
    got = _flags(spark, [1, 2, 3, 4, 5], pairs, 0.8)
    assert got == {
        1: (3, True), 2: (1, False), 3: (1, False), 4: (1, False),
        5: (0, True),  # isolated point: density 0, kept
    }


def test_density_dedup_tie_drops_higher_id(spark):
    got = _flags(spark, [7, 9], [(7, 9, 0.95)], 0.9)
    assert got == {7: (1, True), 9: (1, False)}


def test_density_dedup_sub_threshold_pairs_only_add_density(spark):
    # pair below dup threshold contributes density but no victim
    got = _flags(spark, [1, 2], [(1, 2, 0.5)], 0.8)
    assert got == {1: (1, True), 2: (1, True)}


# --- incremental SCD2 merge ----------------------------------------------


def _snaps(spark, rows):
    return spark.createDataFrame(
        rows, "version bigint, k bigint, val string"
    )


def _hist_set(df):
    # None-tolerant sort key (NULL business keys are legal SCD2 rows)
    return sorted(
        map(tuple, df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_scd2_merge_equals_batch_recompute(spark):
    """Every path in one stack: change (k=1), delete (k=2), insert
    (k=3 at v2), reappearance with identical value (k=4)."""
    stack = [
        (1, 1, "a"), (1, 2, "b"), (1, 4, "d"),
        (2, 1, "a2"), (2, 3, "c"),              # k=2 vanishes, k=3 appears
        (3, 1, "a2"), (3, 3, "c"), (3, 4, "d"),  # k=4 reappears (same val)
    ]
    snaps = _snaps(spark, stack)
    batch = D.scd2_compress(snaps, key_cols=["k"], version_col="version")
    hist12 = D.scd2_compress(
        snaps.filter(F.col("version") <= 2),
        key_cols=["k"],
        version_col="version",
    )
    v3 = snaps.filter(F.col("version") == 3).drop("version")
    merged = D.scd2_merge(hist12, v3, new_version=3, key_cols=["k"])
    assert _hist_set(merged) == _hist_set(batch)
    # the single-pass exchange shape returns identical values
    merged1p = D.scd2_merge(
        hist12, v3, new_version=3, key_cols=["k"], single_pass=True
    )
    assert _hist_set(merged1p) == _hist_set(batch)
    # reappearance opened a NEW run, not an extension across the gap
    k4 = sorted(r for r in _hist_set(merged) if r[0] == 4)
    assert [(r[2], r[3], r[4]) for r in k4] == [
        (1, 2, False),
        (3, None, True),
    ]


def test_scd2_merge_is_replay_idempotent(spark):
    stack = [(1, 1, "a"), (2, 1, "b"), (2, 2, "x")]
    snaps = _snaps(spark, stack)
    hist = D.scd2_compress(
        snaps.filter(F.col("version") <= 1),
        key_cols=["k"],
        version_col="version",
    )
    v2 = snaps.filter(F.col("version") == 2).drop("version")
    once = D.scd2_merge(hist, v2, new_version=2, key_cols=["k"])
    twice = D.scd2_merge(once, v2, new_version=2, key_cols=["k"])
    assert _hist_set(once) == _hist_set(twice)


def test_window_funnel_matches_bruteforce_on_random_streams(spark):
    """Property: the greedy latest-start DP equals brute-force
    enumeration of ordered chains on random event streams (many users,
    duplicate timestamps, all orderings)."""
    import itertools
    import random

    rng = random.Random(17)
    types = ["view", "click", "purchase", "error"]
    rows = []
    eid = 0
    for uid in range(40):
        for _ in range(rng.randint(0, 12)):
            eid += 1
            rows.append(
                (uid, eid, rng.randint(0, 50), rng.choice(types))
            )
    window_s = 20

    def brute(events):
        # events: list of (t, eid, type) for one user, any order
        evs = sorted(
            ((t, e, ty) for _, e, t, ty in events),
            key=lambda x: (x[0], x[1]),
        )
        best = 1 if any(ty == "view" for _, _, ty in evs) else 0
        for k, want in ((2, ("view", "click")),
                        (3, ("view", "click", "purchase"))):
            for combo in itertools.combinations(range(len(evs)), k):
                if all(evs[i][2] == want[j] for j, i in enumerate(combo)):
                    if evs[combo[-1]][0] - evs[combo[0]][0] <= window_s:
                        best = max(best, k)
        return best

    expected = {}
    for uid in {r[0] for r in rows}:
        ue = [r for r in rows if r[0] == uid]
        if any(r[3] in ("view", "click", "purchase") for r in ue):
            expected[uid] = brute(
                [r for r in ue if r[3] in ("view", "click", "purchase")]
            )
    got = _levels(spark, rows, window_s)
    assert got == expected


def test_scd2_merge_matches_batch_on_random_stacks(spark):
    """Property: chaining scd2_merge over versions 2..V equals one
    scd2_compress over the whole stack, on random add/change/delete
    histories."""
    import random

    rng = random.Random(23)
    keys = list(range(12))
    stack = []
    alive = {k: f"v{rng.randint(0, 3)}" for k in keys[:8]}
    for ver in range(1, 5):
        for k, val in alive.items():
            stack.append((ver, k, val))
        # mutate for next version: change / delete / (re)add
        for k in list(alive):
            r = rng.random()
            if r < 0.25:
                alive[k] = f"v{rng.randint(0, 3)}"
            elif r < 0.4:
                del alive[k]
        for k in keys:
            if k not in alive and rng.random() < 0.2:
                alive[k] = f"v{rng.randint(0, 3)}"
    snaps = _snaps(spark, stack)
    batch = D.scd2_compress(snaps, key_cols=["k"], version_col="version")
    hist = D.scd2_compress(
        snaps.filter(F.col("version") == 1),
        key_cols=["k"],
        version_col="version",
    )
    for ver in (2, 3, 4):
        hist = D.scd2_merge(
            hist,
            snaps.filter(F.col("version") == ver).drop("version"),
            new_version=ver,
            key_cols=["k"],
        )
    assert _hist_set(hist) == _hist_set(batch)


def test_scd2_merge_maintains_history_under_streaming(spark, tmp_path):
    """foreachBatch incremental maintenance: each micro-batch (one full
    snapshot) advances a parquet-backed SCD2 history via scd2_merge; the
    final table equals one batch scd2_compress over every version — the
    streaming maintained-dimension pattern."""
    import json
    import time

    src = tmp_path / "in"
    src.mkdir()
    versions = {
        2: [(1, "a2"), (3, "c")],
        3: [(1, "a2"), (3, "c3"), (4, "d")],
        4: [(3, "c3"), (4, "d")],
    }
    v1 = [(1, "a"), (2, "b")]
    all_rows = [(1, k, val) for k, val in v1] + [
        (ver, k, val) for ver, rows in versions.items() for k, val in rows
    ]
    snaps_all = spark.createDataFrame(
        all_rows, "version bigint, k bigint, val string"
    )
    batch = D.scd2_compress(snaps_all, key_cols=["k"], version_col="version")

    hist_dir = {"cur": str(tmp_path / "hist_v1")}
    D.scd2_compress(
        spark.createDataFrame(
            [(1, k, val) for k, val in v1],
            "version bigint, k bigint, val string",
        ),
        key_cols=["k"],
        version_col="version",
    ).write.parquet(hist_dir["cur"])

    for i, ver in enumerate(sorted(versions)):
        with open(src / f"snap_{ver}.jsonl", "w") as f:
            for k, val in versions[ver]:
                f.write(json.dumps({"version": ver, "k": k, "val": val}) + "\n")
        time.sleep(0.05)  # distinct mtimes: file-source batch ordering

    stream = (
        spark.readStream.schema("version bigint, k bigint, val string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )

    def advance(bdf, batch_id):
        vers = sorted(r["version"] for r in bdf.select("version").distinct().collect())
        hist = bdf.sparkSession.read.parquet(hist_dir["cur"])
        for ver in vers:  # one file per trigger => normally a single version
            hist = D.scd2_merge(
                hist,
                bdf.filter(F.col("version") == ver).drop("version"),
                new_version=ver,
                key_cols=["k"],
            )
        out = str(tmp_path / f"hist_b{batch_id}")
        hist.write.parquet(out)
        hist_dir["cur"] = out

    q = (
        stream.writeStream.foreachBatch(advance)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    final = spark.read.parquet(hist_dir["cur"])
    assert _hist_set(final.select(*batch.columns)) == _hist_set(batch)


def test_scd2_merge_null_business_key(spark):
    """NULL keys form one run in scd2_compress (Window.partitionBy groups
    NULL as a value); the merge must match them null-safely — plain
    equality would close-and-reopen the NULL run every merge."""
    stack = [(1, None, "a"), (1, 1, "x"), (2, None, "a"), (2, 1, "x2")]
    snaps = _snaps(spark, stack)
    batch = D.scd2_compress(snaps, key_cols=["k"], version_col="version")
    hist = D.scd2_compress(
        snaps.filter(F.col("version") == 1),
        key_cols=["k"],
        version_col="version",
    )
    v2 = snaps.filter(F.col("version") == 2).drop("version")
    merged = D.scd2_merge(hist, v2, new_version=2, key_cols=["k"])
    assert _hist_set(merged) == _hist_set(batch)
    # the NULL-key run stayed OPEN (unchanged value) — one row, current
    nulls = [r for r in merged.collect() if r["k"] is None]
    assert len(nulls) == 1 and nulls[0]["is_current"]
    # and replay is still a no-op
    again = D.scd2_merge(merged, v2, new_version=2, key_cols=["k"])
    assert _hist_set(again) == _hist_set(merged)


def test_pin_recovers_from_external_checkpoint_dir_change(spark, tmp_path):
    """pin() must re-assert its checkpoint_dir if something else moved
    the session-global dir in between — a stale Python-side memo would
    silently checkpoint into the foreign directory."""
    import os

    from crawl_streams_spark.operators.iterate import pin

    mine = str(tmp_path / "mine")
    other = str(tmp_path / "other")
    df = spark.range(10)
    pin(df, checkpoint_dir=mine).count()
    spark.sparkContext.setCheckpointDir(other)  # external interference
    pin(spark.range(5), checkpoint_dir=mine).count()
    stored = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    assert "/mine" in stored and "/other" not in stored
    assert any(os.scandir(mine))
