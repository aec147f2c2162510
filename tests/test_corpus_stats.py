"""Corpus term statistics: hand-computed fixtures for the frequency score
and TF-IDF ranking (operators/corpus_stats.py). Cross-engine value gate:
plans/q_corpus.py."""

from __future__ import annotations

import math

from crawl_streams_spark.operators import corpus_stats as CS


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_doc_freq_stats_hand_computed(spark):
    # corpus counts: a=3, b=2, c=1
    df = _docs(spark, [(1, "a a b"), (2, "a b c")])
    rows = {r["doc_id"]: r for r in CS.doc_freq_stats(df).collect()}
    # doc 1: occurrences a,a,b -> 3+3+2 = 8 over 3 tokens
    assert rows[1]["n_tokens"] == 3 and rows[1]["freq_sum"] == 8
    assert rows[1]["mean_token_freq"] == round(8 / 3, 6)
    # doc 2: a,b,c -> 3+2+1 = 6 over 3 tokens
    assert rows[2]["freq_sum"] == 6 and rows[2]["mean_token_freq"] == 2.0


def test_rare_vocab_scores_lower(spark):
    """A document of corpus-unique tokens scores the minimum (1.0 — each
    occurrence matches only itself); common-word docs score higher."""
    df = _docs(
        spark,
        [
            (1, "the the the cat"),
            (2, "the cat sat here"),
            (3, "zq1 zq2 zq3 zq4"),
        ],
    )
    rows = {r["doc_id"]: r for r in CS.doc_freq_stats(df).collect()}
    assert rows[3]["mean_token_freq"] == 1.0
    assert rows[1]["mean_token_freq"] > rows[2]["mean_token_freq"] > 1.0


def test_tfidf_ranks_distinctive_terms_first(spark):
    """A term present in every doc has idf=0 and never outranks a
    document-specific term; ranking ties break on the term string."""
    df = _docs(
        spark,
        [
            (1, "common apple apple"),
            (2, "common banana banana"),
            (3, "common cherry cherry"),
        ],
    )
    out = CS.doc_tfidf_topk(df, k=2).collect()
    top = {r["doc_id"]: r["tok"] for r in out if r["rnk"] == 1}
    assert top == {1: "apple", 2: "banana", 3: "cherry"}
    for r in out:
        if r["tok"] == "common":
            assert r["tfidf"] == 0.0 and r["rnk"] == 2
        else:
            assert r["tfidf"] == round(2 * math.log(3.0), 6)


def test_tfidf_topk_bounded_and_tie_broken(spark):
    """With more candidate terms than k, exactly k rows per doc emerge and
    equal-score terms appear in lexicographic order."""
    df = _docs(spark, [(1, "w x y z"), (2, "p q r s")])
    out = [r for r in CS.doc_tfidf_topk(df, k=3).collect() if r["doc_id"] == 1]
    assert [r["tok"] for r in sorted(out, key=lambda r: r["rnk"])] == ["w", "x", "y"]


def test_split_hot_join_equivalence_and_plan(spark, sf_dir):
    """The skew-split (broadcast Zipf head + shuffle tail) produces
    exactly the plain-join result, and the head side really plans as a
    broadcast join even with size-based auto-broadcast disabled."""
    from crawl_streams_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plain = {
        (r["doc_id"], r["n_tokens"], r["freq_sum"], r["mean_token_freq"])
        for r in CS.doc_freq_stats(docs).collect()
    }
    split = {
        (r["doc_id"], r["n_tokens"], r["freq_sum"], r["mean_token_freq"])
        for r in CS.doc_freq_stats(docs, hot_terms=8).collect()
    }
    assert split == plain and plain

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tf = CS.term_frequencies(docs)
        stats = CS.term_stats(tf)
        plan = (
            CS.split_hot_join(tf, stats, 8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # two forced broadcasts (hot stats inner + hot-key anti); the tail
    # join stays a shuffle join
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_source_lang_entropy_hand_math(spark):
    import math

    from crawl_streams_spark.plans import REGISTRY

    # build a tiny documents table through the registry path is heavy;
    # check the kernel math directly on a hand corpus instead
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [
            (1, "s1", "en"), (2, "s1", "en"), (3, "s1", "de"),
            (4, "s2", "fr"),
        ],
        "doc_id bigint, source string, lang string",
    )
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    g = c.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("lang", "n"))),
            F.lit(0.0),
            lambda acc, x: acc
            + x["n"].cast("double") * F.log(x["n"].cast("double")),
        ).alias("s"),
    )
    rows = {
        r["source"]: math.log(r["n_docs"]) - r["s"] / r["n_docs"]
        for r in g.collect()
    }
    # s1: {en:2, de:1} → H = ln3 − (2ln2)/3; s2: single lang → 0
    assert abs(rows["s1"] - (math.log(3) - 2 * math.log(2) / 3)) < 1e-12
    assert abs(rows["s2"]) < 1e-12


def test_bigram_lm_scores_hand_computed(spark):
    """Add-1 bigram LM on a 3-doc corpus, checked against hand-computed
    probabilities (V=3; C(a,·) counts prefix occurrences)."""
    import math

    from crawl_streams_spark.operators.corpus_stats import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "c")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in bigram_lm_scores(docs).collect()
    }
    # corpus bigrams: doc1: (a,b),(b,a),(a,b)  doc2: (a,b),(b,c)
    # C2: (a,b)=3 (b,a)=1 (b,c)=1 ; C1: a=3, b=2 ; V=3
    def nll_micro(n_a, n_ab):
        # integer micro-nats: floor(ln(P^-1)*1e6 + 0.5)
        return math.floor(math.log((n_a + 3) / (n_ab + 1)) * 1e6 + 0.5)

    d1 = (2 * nll_micro(3, 3) + 1 * nll_micro(2, 1)) / 3 / 1e6
    d2 = (nll_micro(3, 3) + nll_micro(2, 1)) / 2 / 1e6
    assert got == {1: (3, d1), 2: (2, d2)}  # doc 3: single token, excluded
