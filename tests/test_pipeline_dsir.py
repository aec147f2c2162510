"""DSIR importance resampling (operators/pipeline.py::
dsir_importance_weights / dsir_select): behavioral contracts on a
constructed corpus plus hashed-vs-exact feature agreement. The
cross-engine value gate is plans/q_pipeline.py::dsir_selected_docs."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl_streams_spark.operators.pipeline import (
    dsir_importance_weights,
    dsir_select,
)
from crawl_streams_spark.tables import load_table

_SCHEMA = "doc_id bigint, text string, tgt boolean"


def test_target_vocabulary_outranks_raw_vocabulary(spark):
    """Documents written in the target slice's vocabulary must score
    above documents written in the raw-only vocabulary — the defining
    property of the importance ratio."""
    rows = [
        # target slice: speaks 'alpha beta'
        (1, "alpha beta alpha beta", True),
        (2, "beta alpha beta", True),
        # raw-only docs: one echoes the target vocab, one doesn't
        (10, "alpha beta beta alpha", False),
        (11, "gamma delta gamma delta", False),
        (12, "gamma delta delta", False),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    w = {
        r["doc_id"]: r["logw_micro"]
        for r in dsir_importance_weights(df, F.col("tgt")).collect()
    }
    assert w[10] > w[11]
    assert w[10] > w[12]
    # selection at n=3 keeps the target-speaking docs
    picked = {
        r["doc_id"] for r in dsir_select(df, F.col("tgt"), 3).collect()
    }
    assert 10 in picked and 11 not in picked


def test_weights_scale_with_feature_counts(spark):
    """log w is additive in token counts: doubling a document's tokens
    doubles its score (exact integer micro-nat arithmetic)."""
    rows = [
        (1, "alpha beta", True),
        (2, "gamma", False),
        (10, "alpha beta", False),
        (11, "alpha beta alpha beta", False),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    w = {
        r["doc_id"]: r["logw_micro"]
        for r in dsir_importance_weights(df, F.col("tgt")).collect()
    }
    assert w[11] == 2 * w[10]


def test_selected_set_enriches_target_fraction(spark, sf_dir):
    """On the synthetic corpus, the selected set must be richer in the
    target language than the corpus base rate — the whole point of the
    filter."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("lang") == "en").count() / docs.count()
    sel = dsir_select(docs, F.col("lang") == "en", 100)
    got = sel.filter(F.col("lang") == "en").count() / 100
    assert got > base, f"no enrichment: {got:.2f} <= base {base:.2f}"


def test_hashed_features_approximate_exact(spark, sf_dir):
    """The hashed-ngram scale form (bounded λ table) must agree with the
    exact-token form up to collision noise: large bucket count → near-
    identical selections."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        r["doc_id"]
        for r in dsir_select(docs, F.col("lang") == "en", 50).collect()
    }
    hashed = {
        r["doc_id"]
        for r in dsir_select(
            docs, F.col("lang") == "en", 50, hash_buckets=1 << 18
        ).collect()
    }
    overlap = len(exact & hashed) / 50
    assert overlap >= 0.8, f"hashed selection drifted: overlap {overlap:.2f}"


def test_hashed_lambda_table_is_bounded(spark, sf_dir):
    """With hashing, the λ relation is at most hash_buckets rows — the
    broadcastable-by-construction contract the 100 TB shape rests on."""
    docs = load_table(spark, sf_dir, "documents")
    w = dsir_importance_weights(
        docs, F.col("lang") == "en", hash_buckets=64
    )
    # scores still computed for every document
    assert w.count() == docs.count()


# ---------------------------------------------------------------------------
# chunk_documents (context chunking) — stride/overlap contracts
# ---------------------------------------------------------------------------


def test_chunk_documents_covers_every_token_with_overlap(spark):
    from crawl_streams_spark.operators.pipeline import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, ""), (3, "solo")],
        "doc_id bigint, text string",
    )
    rows = sorted(
        map(tuple, chunk_documents(df, chunk_size=4, overlap=2).collect())
    )
    # doc 1: starts 0,2,4,6 -> 4 full chunks; start 8 would begin past
    # n - overlap, so the tail tokens are covered by the last chunk
    d1 = [r for r in rows if r[0] == 1]
    assert [r[2] for r in d1] == [0, 2, 4, 6]
    assert d1[-1][4] == "t6 t7 t8 t9"
    # every token index appears in at least one chunk
    covered = set()
    for _, idx, start, n, _text in d1:
        covered |= set(range(start, start + n))
    assert covered == set(range(10))
    # consecutive chunks share exactly `overlap` tokens
    assert d1[0][4].split()[-2:] == d1[1][4].split()[:2]
    # empty doc -> no chunks; single-token doc -> one short chunk
    assert not [r for r in rows if r[0] == 2]
    d3 = [r for r in rows if r[0] == 3]
    assert len(d3) == 1 and d3[0][3] == 1 and d3[0][4] == "solo"


def test_chunk_documents_rejects_degenerate_stride(spark):
    import pytest as _pytest

    from crawl_streams_spark.operators.pipeline import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_size=4, overlap=4)


# ---------------------------------------------------------------------------
# temperature_mix — n^alpha source resampling contracts
# ---------------------------------------------------------------------------


def test_temperature_mix_flattens_toward_sqrt_shares(spark):
    from crawl_streams_spark.operators.pipeline import temperature_mix

    rows = [(i, "big" if i < 1800 else "small") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    kept = temperature_mix(df, alpha=0.5, budget_docs=800)
    counts = {
        r["source"]: r["count"]
        for r in kept.groupBy("source").count().collect()
    }
    # sqrt weights ~ 42.4 / 14.1 -> target shares 0.75 / 0.25 of 800
    assert abs(counts["big"] - 600) < 60
    assert abs(counts["small"] - 200) < 45
    # natural share of big was 0.9; mixed share must drop toward 0.75
    mixed_share = counts["big"] / (counts["big"] + counts["small"])
    assert mixed_share < 0.85


def test_temperature_mix_default_budget_never_upsamples(spark):
    """Without a budget, rates top out at exactly 1 for the most
    over-target source and stay <= 1 everywhere: downsample-only."""
    from crawl_streams_spark.operators.pipeline import temperature_mix

    rows = [(i, "a" if i < 900 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    kept = temperature_mix(df, alpha=0.5)
    counts = {
        r["source"]: r["count"]
        for r in kept.groupBy("source").count().collect()
    }
    # source b is under natural share vs sqrt share -> rate 1, all kept
    assert counts["b"] == 100
    assert counts["a"] < 900  # a downsampled, never duplicated


def test_temperature_mix_alpha_one_is_identityish(spark):
    """alpha = 1 reproduces natural proportions: with the default
    budget every rate is exactly 1 and nothing is dropped."""
    from crawl_streams_spark.operators.pipeline import temperature_mix

    rows = [(i, f"s{i % 7}") for i in range(700)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    assert temperature_mix(df, alpha=1.0).count() == 700


def test_bigram_features_count_and_ordering(spark):
    """ngram=2: a document contributes len(tokens)-1 features; bigrams
    are ORDERED pairs, so reversing the text changes the feature set
    (target 'alpha beta' must outrank raw-only 'beta alpha')."""
    rows = [
        (1, "alpha beta alpha beta", True),
        (2, "alpha beta", True),
        (10, "alpha beta alpha", False),     # speaks the target bigrams
        (11, "beta alpha", False),           # the REVERSED pair only
        (12, "gamma delta gamma", False),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {
        r["doc_id"]: r
        for r in dsir_importance_weights(
            df, F.col("tgt"), ngram=2
        ).collect()
    }
    assert got[1]["n_feats"] == 3
    assert got[10]["n_feats"] == 2
    assert got[10]["logw_micro"] > got[11]["logw_micro"]
    assert got[10]["logw_micro"] > got[12]["logw_micro"]


def test_bigram_short_docs_produce_no_features(spark):
    """Documents with fewer than two tokens have no bigrams and drop
    out of the weight relation (no NULL scores, no empty-array rows)."""
    rows = [
        (1, "alpha beta gamma", True),
        (2, "solo", False),
        (3, "   ", False),
        (4, "alpha beta", False),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {
        r["doc_id"]: r["n_feats"]
        for r in dsir_importance_weights(
            df, F.col("tgt"), ngram=2
        ).collect()
    }
    assert got == {1: 2, 4: 1}


def test_md5_hasher_matches_spark_hasher_shape(spark, sf_dir):
    """The md5 (oracle-replayable) and spark (production) hashers build
    the same bounded model — identical n_feats everywhere, and bucketed
    scores that agree in rank for the clear-cut top documents."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    # enough buckets that collision noise (hasher-specific) stays small
    # next to the signal — at 256 the bigram vocab aliases heavily and
    # the two models genuinely diverge
    kw = dict(hash_buckets=4096, ngram=2)
    a = {
        r["doc_id"]: (r["n_feats"], r["logw_micro"])
        for r in dsir_importance_weights(
            docs, F.col("lang") == "en", hasher="md5", **kw
        ).collect()
    }
    b = {
        r["doc_id"]: (r["n_feats"], r["logw_micro"])
        for r in dsir_importance_weights(
            docs, F.col("lang") == "en", hasher="spark", **kw
        ).collect()
    }
    assert set(a) == set(b)
    assert all(a[k][0] == b[k][0] for k in a)  # same feature counts
    top_a = sorted(a, key=lambda k: -a[k][1])[:20]
    top_b = sorted(b, key=lambda k: -b[k][1])[:20]
    assert len(set(top_a) & set(top_b)) >= 14  # bucketing noise only
