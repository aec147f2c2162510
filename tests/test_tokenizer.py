"""BPE merge learning (operators/tokenizer.py): golden merges on the
classic corpus, greedy-merge exactness, determinism, corpus run."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl_streams_spark.operators.tokenizer import (
    END,
    apply_merge,
    learn_bpe_merges,
    word_frequencies,
)
from crawl_streams_spark.tables import load_table


def test_bpe_golden_classic_corpus(spark):
    """The Sennrich toy corpus: 'low'×5 'lower'×2 'newest'×6 'widest'×3.
    Highest-frequency pair is (e, s) from newest+widest (freq 9), then
    (es, t) (9), then (est, </w>) (9)."""
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    merges = learn_bpe_merges(docs, n_merges=3)
    got = [(m["left"], m["right"]) for m in merges]
    assert got == [("e", "s"), ("es", "t"), ("est", END)], merges
    assert merges[0]["freq"] == 9


def test_apply_merge_greedy_left_to_right(spark):
    df = spark.createDataFrame([(["a", "b", "a", "b"],), (["a", "a", "a"],)],
                               "syms array<string>")
    ab = df.select(apply_merge(F.col("syms"), "a", "b").alias("m")).collect()
    assert ab[0]["m"] == ["ab", "ab"]
    aa = df.select(apply_merge(F.col("syms"), "a", "a").alias("m")).collect()
    assert aa[1]["m"] == ["aa", "a"]  # non-overlapping: [aa, a], not [aa, aa]


def test_bpe_deterministic_and_scales_with_vocab(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    m1 = learn_bpe_merges(docs, n_merges=5)
    m2 = learn_bpe_merges(docs.repartition(7), n_merges=5)
    assert m1 == m2
    assert len(m1) == 5
    assert all(m["freq"] > 0 for m in m1)
    # the expensive pass happens once: vocabulary is tiny vs corpus
    vocab = word_frequencies(docs)
    assert vocab.count() < 100
