"""Training-data pipeline operators: split/sample determinism, packing
invariants, PII scrub goldens (operators/pipeline.py, functions/pii.py)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from crawl_streams_spark.functions import pii
from crawl_streams_spark.functions import text as T
from crawl_streams_spark.operators import pipeline as P
from crawl_streams_spark.plans import REGISTRY
from crawl_streams_spark.tables import load_table

BUDGET = 256


def test_split_matches_reference_md5(spark):
    """Golden: assignment reproduces hashlib.md5 of the salted id, so the
    split is a pure function of the id — stable across runs, engines and
    corpus growth."""
    ids = list(range(200))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = {
        r["doc_id"]: r["split"]
        for r in df.select(
            "doc_id", P.split_assign("doc_id").alias("split")
        ).collect()
    }
    for i in ids:
        bucket = hashlib.md5(f"split:{i}".encode()).hexdigest()[:2]
        want = "train" if bucket < "e6" else ("val" if bucket < "f3" else "test")
        assert got[i] == want, (i, bucket)


def test_split_exhaustive_and_sized(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    counts = dict(
        docs.groupBy(P.split_assign("doc_id").alias("s")).count().collect()
    )
    assert set(counts) <= {"train", "val", "test"}
    total = sum(counts.values())
    assert counts["train"] / total > 0.8  # 90% nominal


def test_hex_threshold_edges():
    assert P.hex_threshold(0.0) == "00"
    assert P.hex_threshold(1.0) == "g"  # sorts above every 2-hex bucket
    assert P.hex_threshold(2.0) == "g"
    assert P.hex_threshold(0.5) == "80"


def test_stratified_rates(spark, sf_dir):
    """rate=1.0 strata keep everything; fractional strata land near their
    nominal rate; decisions are independent of the split hash (different
    salt)."""
    docs = load_table(spark, sf_dir, "documents")
    keep = P.stratified_keep(
        "doc_id", "lang", {"zh": 1.0, "en": 0.5}, default=0.0
    )
    rows = docs.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("kept"),
    ).collect()
    by_lang = {r["lang"]: (r["n"], r["kept"]) for r in rows}
    assert by_lang["zh"][1] == by_lang["zh"][0]
    for lang in ("de", "es", "fr"):
        assert by_lang[lang][1] == 0  # default rate 0
    n, kept = by_lang["en"]
    assert 0.25 <= kept / n <= 0.75  # 0.5 nominal, small-sample slack


def test_pack_budget_invariant(spark, sf_dir):
    """Every pack except a shard's last is 'full': it stops only because
    the next doc crossed the budget, so pack_tokens + (any later doc) would
    exceed it — equivalently each non-final pack's token total reaches the
    budget once its boundary-spanning doc is counted, and no pack starts
    beyond the running total."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "source", "doc_id", T.token_count("text").alias("n_tok")
    )
    packed = staged.select(
        "source",
        "n_tok",
        P.pack_id("n_tok", BUDGET, ["source"], ["doc_id"]).alias("pack_id"),
    )
    per_pack = (
        packed.groupBy("source", "pack_id")
        .agg(F.sum("n_tok").alias("tok"), F.max("pack_id").alias("_"))
        .collect()
    )
    last_pack = {}
    for r in per_pack:
        last_pack[r["source"]] = max(last_pack.get(r["source"], -1), r["pack_id"])
    for r in per_pack:
        if r["pack_id"] != last_pack[r["source"]]:
            # a non-final pack must have crossed its budget boundary
            assert r["tok"] >= 1
    # pack ids are contiguous from 0 per shard (no gaps: running sum)
    by_src: dict[str, set] = {}
    for r in per_pack:
        by_src.setdefault(r["source"], set()).add(r["pack_id"])
    for src, ids in by_src.items():
        assert ids == set(range(len(ids))), src


def test_pack_ids_deterministic_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "source", "doc_id", T.token_count("text").alias("n_tok")
    )
    a = staged.select(
        "doc_id", P.pack_id("n_tok", BUDGET, ["source"], ["doc_id"]).alias("p")
    ).collect()
    b = (
        staged.repartition(7)
        .select(
            "doc_id",
            P.pack_id("n_tok", BUDGET, ["source"], ["doc_id"]).alias("p"),
        )
        .collect()
    )
    assert {r["doc_id"]: r["p"] for r in a} == {r["doc_id"]: r["p"] for r in b}


@pytest.mark.parametrize(
    "raw,clean",
    [
        ("mail bob.smith+x@corp.example.org now", "mail [EMAIL] now"),
        ("at 192.168.0.1 and 10.0.200.55.", "at [IP] and [IP]."),
        ("a@b.co 1.2.3.4 a@b.co", "[EMAIL] [IP] [EMAIL]"),
        ("no pii here", "no pii here"),
    ],
)
def test_scrub_golden(spark, raw, clean):
    df = spark.createDataFrame([(raw,)], "text string")
    assert df.select(pii.scrub("text").alias("t")).first()["t"] == clean


def test_pii_counts_match_scrub(spark, sf_dir):
    """Detection and redaction agree: a scrubbed corpus re-scans to zero."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(
            F.col("text"), F.lit(" ping admin@example.net from 10.1.2.3")
        ).alias("text")
    )
    scrubbed = docs.select(pii.scrub("text").alias("text"))
    leftover = scrubbed.agg(
        F.sum(pii.pii_count("text", "email")).alias("e"),
        F.sum(pii.pii_count("text", "ipv4")).alias("i"),
    ).first()
    assert leftover["e"] == 0 and leftover["i"] == 0


def test_contamination_excludes_benchmark_side(spark, sf_dir):
    rows = REGISTRY["benchmark_contamination"].build(spark, sf_dir).collect()
    assert rows, "contamination check is vacuous on this corpus"
    for r in rows:
        assert r["doc_id"] % 20 != 0
        assert r["n_shared_grams"] >= 1 and r["n_bench_docs"] >= 1


def test_curation_funnel_monotonic(spark, sf_dir):
    """Each stage can only shrink the corpus, and none is vacuous here."""
    r = REGISTRY["corpus_curation_funnel"].build(spark, sf_dir).first()
    chain = [r["n_raw"], r["n_quality"], r["n_lang"], r["n_dedup"],
             r["n_sampled"], r["n_train"]]
    assert all(a >= b for a, b in zip(chain, chain[1:])), chain
    assert chain[-1] > 0


def test_curate_matches_funnel(spark, sf_dir, tmp_path):
    """curate() materializes exactly the documents the funnel counts: the
    written train/val/test corpus sizes equal n_sampled, and the train
    directory equals n_train."""
    from crawl_streams_spark.operators.etl import write_curated
    from crawl_streams_spark.plans.q_pipeline import _DEFAULT_RATE, _RATES

    funnel = REGISTRY["corpus_curation_funnel"].build(spark, sf_dir).first()
    out = str(tmp_path / "curated")
    docs = load_table(spark, sf_dir, "documents")
    write_curated(docs, out, _RATES, default_rate=_DEFAULT_RATE)
    back = spark.read.parquet(out)
    assert back.count() == funnel["n_sampled"]
    assert back.filter(back.split == "train").count() == funnel["n_train"]
    # curated docs keep their source columns and gain the decisions
    assert {"doc_id", "text", "lang", "quality", "plang", "split"} <= set(
        back.columns
    )
    # dedup held: fingerprints are unique (recompute on the survivors)
    from crawl_streams_spark.functions import text as TX

    n_fp = (
        back.select(TX.fingerprint("text").alias("fp")).distinct().count()
    )
    assert n_fp == back.count()


# --- property tests (pure expression math, no Spark round trip) ----------

from hypothesis import given, strategies as st  # noqa: E402


@given(st.floats(min_value=0.0, max_value=1.5, allow_nan=False))
def test_hex_threshold_tracks_fraction(frac):
    """Threshold in bucket space is round(frac*256) clamped, and the
    string compare on two lowercase hex chars realizes exactly that keep
    set."""
    thr = P.hex_threshold(frac)
    n = round(min(max(frac, 0.0), 1.0) * 256)
    kept = sum(1 for b in range(256) if format(b, "02x") < thr)
    assert kept == (256 if n >= 256 else n)


@given(st.floats(0, 1), st.floats(0, 1))
def test_hex_threshold_monotone(a, b):
    lo, hi = sorted([a, b])
    assert P.hex_threshold(lo) <= P.hex_threshold(hi)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50
    )
)
def test_split_partitions_ids(ids):
    """Every id lands in exactly one split and fractions are as pinned by
    the md5 reference (pure-Python mirror of split_assign)."""
    import hashlib as _h

    for i in ids:
        bucket = _h.md5(f"split:{i}".encode()).hexdigest()[:2]
        split = (
            "train" if bucket < P.hex_threshold(0.9)
            else ("val" if bucket < P.hex_threshold(0.95) else "test")
        )
        assert split in {"train", "val", "test"}


def test_shuffled_shards_deterministic_and_uniform(spark, sf_dir, tmp_path):
    """Shard assignment and intra-shard order are pure functions of the id;
    shards are near-uniform; the written order differs from doc_id order
    (it IS a shuffle)."""
    from crawl_streams_spark.operators.pipeline import (
        shuffled_shards,
        write_shuffled_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    a = shuffled_shards(docs, "doc_id", 8).collect()
    b = shuffled_shards(docs.repartition(5), "doc_id", 8).collect()
    key = lambda rows: {r["doc_id"]: (r["shard"], r["shard_pos"]) for r in rows}
    assert key(a) == key(b)
    counts = {}
    for r in a:
        counts[r["shard"]] = counts.get(r["shard"], 0) + 1
    assert len(counts) == 8
    n = len(a)
    assert all(c > n / 8 / 3 for c in counts.values()), counts

    out = str(tmp_path / "shards")
    write_shuffled_shards(docs, out, "doc_id", 4)
    back = spark.read.parquet(out)
    assert back.count() == n
    import os as _os

    shard_dirs = [d for d in _os.listdir(out) if d.startswith("shard=")]
    assert len(shard_dirs) == 4
    # within a shard file, doc_ids are NOT in ascending order (shuffled)
    one = spark.read.parquet(f"{out}/{shard_dirs[0]}")
    ids = [r["doc_id"] for r in one.collect()]
    assert ids != sorted(ids)


def test_curate_repetition_gates(spark, sf_dir):
    """Optional repetition gates subtract exactly the docs whose top-2gram
    / dup-3gram fractions exceed the thresholds; defaults leave the
    funnel's decisions untouched."""
    import pyspark.sql.functions as F

    from crawl_streams_spark.functions import text as T
    from crawl_streams_spark.operators.pipeline import curate
    from crawl_streams_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = curate(docs, rates={}, default_rate=1.0)
    gated = curate(
        docs, rates={}, default_rate=1.0, max_top_2gram=0.12, max_dup_3gram=0.2
    )
    base_ids = {r[0] for r in base.select("doc_id").collect()}
    gated_ids = {r[0] for r in gated.select("doc_id").collect()}
    assert gated_ids <= base_ids

    staged = docs.select(
        "doc_id", T.tokens("text").alias("toks")
    ).select(
        "doc_id",
        T.top_ngram_fraction(T.ngrams_from_tokens(F.col("toks"), 2)).alias("t2"),
        T.dup_ngram_fraction(T.ngrams_from_tokens(F.col("toks"), 3)).alias("d3"),
    )
    bad = {
        r[0]
        for r in staged.filter(
            (F.col("t2") > 0.12) | (F.col("d3") > 0.2)
        ).collect()
    }
    assert gated_ids == base_ids - bad
    assert bad & base_ids, "thresholds should actually gate something"


# ---- weighted sampling (Efraimidis–Spirakis priorities) ----------------


def test_weighted_sample_deterministic_and_sized(spark):
    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(500)], "id bigint, w double"
    )
    a = sorted(r["id"] for r in P.weighted_sample(df, "id", "w", 50).collect())
    b = sorted(r["id"] for r in P.weighted_sample(df, "id", "w", 50).collect())
    assert a == b and len(a) == 50


def test_weighted_sample_excludes_nonpositive_and_null_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "id bigint, w double",
    )
    got = {r["id"] for r in P.weighted_sample(df, "id", "w", 10).collect()}
    assert got == {1, 5}


def test_weighted_sample_favors_heavy_rows(spark):
    """Statistical: two strata, weights 100:1. Across 20 independent salts,
    the heavy stratum must dominate the sample on average (inclusion
    probability ∝ weight)."""
    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    heavy_frac = []
    for s in range(20):
        got = P.weighted_sample(df, "id", "w", 50, salt=f"s{s}").collect()
        heavy_frac.append(sum(1 for r in got if r["id"] < 50) / 50)
    mean = sum(heavy_frac) / len(heavy_frac)
    # 50 heavy rows at weight 100 vs 450 light at weight 1: heavy rows
    # should take the clear majority of a k=50 sample (expected ~0.9).
    assert mean > 0.7, mean


def test_weighted_sample_plans_as_take_ordered(spark):
    df = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(200)], "id bigint, w double"
    )
    plan = (
        P.weighted_sample(df, "id", "w", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort" not in plan.replace("TakeOrderedAndProject", "")


def test_cap_source_share_expected_share_and_passthrough(spark):
    """One hot source holding ~60% of the weight is capped to an expected
    10% share; under-cap sources pass through COMPLETELY (rate 1.0 admits
    every hash)."""
    import pyspark.sql.functions as F

    from crawl_streams_spark.operators.pipeline import cap_source_share

    rows = [(i, "hot", 100) for i in range(3000)]
    rows += [(10_000 + i, f"cold{i % 10}", 20) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    total = 3000 * 100 + 1000 * 20
    kept = cap_source_share(
        df, weight_col="w", max_share=0.10, source_col="source"
    ).cache()
    hot_kept = (
        kept.filter(F.col("source") == "hot").agg(F.sum("w")).first()[0] or 0
    )
    cold_kept = kept.filter(F.col("source") != "hot").count()
    # expected hot weight = 10% of total; allow hash-sampling noise
    want = 0.10 * total
    assert 0.7 * want <= hot_kept <= 1.3 * want, (hot_kept, want)
    assert cold_kept == 1000  # rate 1.0: nothing dropped
    # determinism: same decisions under a different partitioning
    kept2 = cap_source_share(
        df.repartition(13), weight_col="w", max_share=0.10,
        source_col="source",
    )
    a = {r[0] for r in kept.select("doc_id").collect()}
    b = {r[0] for r in kept2.select("doc_id").collect()}
    assert a == b
    kept.unpersist()


def test_take_token_budget_matches_greedy(spark):
    """The distributed budget cut equals the driver-side greedy: sort by
    (w desc, id), take while inclusive cumsum <= budget — exact at the
    boundary."""
    from crawl_streams_spark.operators.pipeline import take_token_budget

    rows = [(i, (i * 37) % 100 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    budget = 9_000
    got = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in take_token_budget(
            df, [("w", "desc"), ("doc_id", "asc")], "w", budget
        ).collect()
    )
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    want, c = [], 0
    for i, w in order:
        c += w
        if c > budget:
            break
        want.append((i, c))
    assert got == sorted(want)
    # the NEXT document would have crossed the budget (cut is tight)
    assert want and want[-1][1] + order[len(want)][1] > budget


def test_take_token_budget_prefix_property(spark):
    """Property (hypothesis): for random weights and budgets, the
    selection is exactly the maximal prefix of the (w desc, id) order
    whose inclusive cumsum fits the budget."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawl_streams_spark.operators.pipeline import take_token_budget

    @settings(max_examples=10, deadline=None)
    @given(
        ws=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=60),
        budget=st.integers(min_value=0, max_value=800),
    )
    def check(ws, budget):
        rows = [(i, w) for i, w in enumerate(ws)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = sorted(
            r["doc_id"]
            for r in take_token_budget(
                df, [("w", "desc"), ("doc_id", "asc")], "w", budget,
                num_partitions=4,
            ).collect()
        )
        order = sorted(rows, key=lambda r: (-r[1], r[0]))
        want, c = [], 0
        for i, w in order:
            c += w
            if c > budget:
                break
            want.append(i)
        assert got == sorted(want)

    check()


def test_cap_source_share_subset_and_weight_monotone(spark):
    """Property: the kept set is a subset of the input, per-source kept
    weight never exceeds the uncapped weight, and tightening the cap
    only shrinks the kept set (monotone in max_share — same salt, same
    hashes, lower rates)."""
    import pyspark.sql.functions as F

    from crawl_streams_spark.operators.pipeline import cap_source_share

    rows = [(i, f"s{i % 5}", (i * 13) % 40 + 1) for i in range(400)]
    rows += [(1_000 + i, "hot", 50) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    loose = {
        r[0]
        for r in cap_source_share(df, "w", 0.30, source_col="source")
        .select("doc_id").collect()
    }
    tight = {
        r[0]
        for r in cap_source_share(df, "w", 0.10, source_col="source")
        .select("doc_id").collect()
    }
    all_ids = {r[0] for r in rows}
    assert tight <= loose <= all_ids
