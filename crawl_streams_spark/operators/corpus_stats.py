"""Corpus-level term statistics: unigram frequency tables, per-document
frequency-based quality scores, and TF-IDF keyword extraction.

The mean-corpus-frequency score is the classic cheap "LM-free perplexity
proxy" quality filter (documents made of common words score high; garbled
or boilerplate-coded text scores low) used by large-corpus curation
pipelines; TF-IDF top-terms is the standard keyword/topic fingerprint.
No counterpart in the reference (training-pipeline extension, SURVEY
§7.6).

Determinism contract (the round-3 lesson: every aggregate under the
cross-engine hash gate must be order-insensitive): all sums here are
INTEGER (term counts and count-weighted sums), every double is produced by
a single division or a single log per output row — never a float
reduction — so results are bit-reproducible on any partitioning.

Scale (100 TB):
- the (doc, term) TF relation aggregates per document BEFORE any global
  shuffle, so each document contributes its distinct terms once, not its
  token stream;
- corpus term counts shuffle on the term — Zipf-skewed, but partial
  aggregation absorbs hot terms (one partial row per map task), the same
  measured argument as the 84%-one-host aggregate (tests/test_skew.py);
- the TF⋈term-stats join is also term-keyed and genuinely skewed (every
  document contains the head of the Zipf curve). AQE's skew-join split
  handles the hot partitions; for a dedicated deployment the head of the
  term table (top ~10⁴ terms ≈ KBs) can be broadcast and only the tail
  shuffle-joined — the composition is left to the caller since the gate
  queries must stay engine-portable;
- scalar corpus totals (N docs, total tokens) ride a broadcast single-row
  cross join, never a driver collect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions import text as T

__all__ = [
    "term_frequencies",
    "term_stats",
    "split_hot_join",
    "doc_freq_stats",
    "doc_tfidf_topk",
    "bigram_counts",
    "bigram_pmi",
    "bigram_lm_scores",
]


def term_frequencies(
    df: DataFrame, content: str = "text", key: str = "doc_id"
) -> DataFrame:
    """(key, tok, tf): per-document term frequencies — one row per
    DISTINCT term of each document. The explode is linear in token count;
    the groupBy keys on (key, tok) whose leading key co-locates with the
    per-document rollups downstream."""
    return (
        df.select(F.col(key).alias("key"), F.explode(T.tokens(content)).alias("tok"))
        .groupBy("key", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def term_stats(tf: DataFrame) -> DataFrame:
    """(tok, cnt, df_docs) from a term-frequency relation: corpus
    occurrence count and document frequency. One term-keyed shuffle;
    partial aggregation absorbs Zipf-head terms."""
    return tf.groupBy("tok").agg(
        F.sum("tf").alias("cnt"), F.count(F.lit(1)).alias("df_docs")
    )


def split_hot_join(
    tf: DataFrame, stats: DataFrame, hot_terms: int
) -> DataFrame:
    """Skew-split inner join of a term-keyed fact against the term-stats
    table: the Zipf HEAD (top ``hot_terms`` by corpus count, ties broken
    on the term) is broadcast — every document contains these terms, so
    they are exactly the keys that skew a shuffle join — and only the
    long TAIL shuffle-joins. Result rows are identical to a plain inner
    join (tested); the hot set is a deterministic bounded top-k
    (TakeOrderedAndProject), never a driver collect."""
    hot = stats.orderBy(F.desc("cnt"), F.asc("tok")).limit(hot_terms)
    hot_part = tf.join(F.broadcast(hot), "tok")
    tail_part = tf.join(F.broadcast(hot.select("tok")), "tok", "left_anti").join(
        stats, "tok"
    )
    return hot_part.unionByName(tail_part)


def doc_freq_stats(
    df: DataFrame,
    content: str = "text",
    key: str = "doc_id",
    hot_terms: int | None = None,
) -> DataFrame:
    """Per-document frequency-based quality score:
    (key, n_tokens, freq_sum, mean_token_freq) where freq_sum counts, for
    every token OCCURRENCE, how often that token occurs in the whole
    corpus (Σ tf·cnt — integer), and mean_token_freq = freq_sum/n_tokens
    (one division, rounded to 6). Low means rare/garbled vocabulary; high
    means common-word text.

    ``hot_terms`` switches the TF⋈stats join to the skew-split form
    (split_hot_join): broadcast the Zipf head, shuffle only the tail —
    same rows, bounded hot partitions. Off by default so the gate query
    stays engine-portable."""
    tf = term_frequencies(df, content, key)
    stats = term_stats(tf)
    if hot_terms is not None:
        joined = split_hot_join(tf, stats, hot_terms)
    else:
        joined = tf.join(stats, "tok")
    per_doc = joined.groupBy("key").agg(
        F.sum("tf").alias("n_tokens"),
        F.sum(F.col("tf") * F.col("cnt")).alias("freq_sum"),
    )
    return per_doc.select(
        F.col("key").alias(key),
        "n_tokens",
        "freq_sum",
        F.round(F.col("freq_sum") / F.col("n_tokens"), 6).alias("mean_token_freq"),
    )


def doc_tfidf_topk(
    df: DataFrame, k: int = 5, content: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Top-k TF-IDF terms per document:
    (key, tok, tf, df_docs, tfidf, rnk), tfidf = tf · ln(N/df) with N the
    total document count — one log per output row, no float reductions.
    Rank orders by (tfidf DESC, tok ASC): ties in tfidf are exact value
    ties (identical tf and df), so the term tie-break makes the top-k set
    reproducible across engines and partitionings."""
    tf = term_frequencies(df, content, key)
    stats = term_stats(tf)
    n_docs = df.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(stats, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "key",
            "tok",
            "tf",
            "df_docs",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df_docs"))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("key").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("key").alias(key),
            "tok",
            "tf",
            "df_docs",
            F.round("tfidf", 6).alias("tfidf"),
            "rnk",
        )
    )


def bigram_counts(df: DataFrame, content: str = "text") -> DataFrame:
    """(tok_a, tok_b, n_ab): CORPUS-WIDE counts of ADJACENT token pairs —
    deliberately not per-document, so no doc-id column is taken (ADVICE
    r3: the former ``key`` parameter was never used and implied
    per-document semantics this kernel doesn't have). The bigram explode
    is linear in token count and stages the token array once through a
    named column (lesson 1); documents with fewer than two tokens
    contribute nothing. One (tok_a, tok_b)-keyed shuffle, partial-agg
    absorbed."""
    staged = df.select(T.tokens(content).alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = staged.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(element_at(toks, i) AS tok_a, "
                "element_at(toks, i + 1) AS tok_b))"
            )
        ).alias("bg")
    )
    return bg.select("bg.tok_a", "bg.tok_b").groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).alias("n_ab")
    )


def bigram_pmi(
    df: DataFrame,
    content: str = "text",
    min_count: int = 5,
    k: int = 30,
) -> DataFrame:
    """Collocation extraction by pointwise mutual information (Church &
    Hanks 1990): the top-k adjacent bigrams by
    PMI = ln( P(a,b) / (P(a)·P(b)) ) = ln( n_ab·N_uni² / (N_bi·n_a·n_b) ),
    restricted to bigrams seen ≥ ``min_count`` times (the standard guard
    against PMI's low-count bias).

    Determinism: every count is an integer aggregate; the PMI is ONE
    float division + ONE log per output row from identical integer
    inputs, rounded to 6 — and the top-k orders by the ROUNDED score with
    a (tok_a, tok_b) tie-break, so the selected set and its order are
    bit-reproducible across engines (the doc_tfidf_topk discipline).

    Scale: two corpus aggregates (unigram, bigram — both partial-agg'd
    Zipf-skew-safe shuffles), two slim joins of the bigram table against
    the unigram table (un-hinted — AQE broadcasts the vocab side only
    while it is genuinely small), scalar totals ride
    broadcast single-row cross joins. The top-k plans as
    TakeOrderedAndProject."""
    toks = df.select(F.explode(T.tokens(content)).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    # identical subtrees on both branches so the runtime reuses one
    # bigram-count exchange (ReuseExchange) instead of scanning twice
    bi_all = bigram_counts(df, content)
    bi = bi_all.filter(F.col("n_ab") >= min_count)
    n_uni = uni.agg(F.sum("cnt").alias("n_uni"))
    n_bi = bi_all.agg(F.sum("n_ab").alias("n_bi"))
    ua = uni.select(F.col("tok").alias("tok_a"), F.col("cnt").alias("n_a"))
    ub = uni.select(F.col("tok").alias("tok_b"), F.col("cnt").alias("n_b"))
    scored = (
        # ua/ub are vocabulary-sized (Heaps-law growth, unbounded) — no
        # broadcast hint (r6 hint policy); AQE broadcasts when small.
        bi.join(ua, "tok_a")
        .join(ub, "tok_b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.log(
                    (F.col("n_ab") * F.col("n_uni") * F.col("n_uni")).cast(
                        "double"
                    )
                    / (
                        F.col("n_bi").cast("double")
                        * F.col("n_a")
                        * F.col("n_b")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), F.asc("tok_a"), F.asc("tok_b")
    ).limit(k)


def bigram_lm_scores(
    df: DataFrame, content: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Per-document n-gram language-model quality score (the
    CCNet / Gopher perplexity signal, self-trained): an add-1-smoothed
    bigram LM is fit on the WHOLE corpus and every document is scored by
    its average negative log-likelihood under it — natural text scores
    low, repetitive or keyword-stuffed junk scores away from the corpus
    mode. Returns (key, n_bigrams, avg_nll); documents with fewer than
    two tokens are excluded (no bigram evidence).

    P(b|a) = (C(a,b) + 1) / (C(a,·) + V), all counts corpus-wide
    integers, V = distinct-token count. Cross-engine float discipline:
    each bigram's −ln P is quantized to INTEGER micro-nats via
    ``floor(x·10⁶ + 0.5)`` — floor of two doubles that agree to the last
    ulp is deterministic to ~10⁻⁹ boundary odds per term, whereas
    ``ROUND(x, 6)`` diverges between engines near .5 boundaries (Spark
    rounds the exact BigDecimal, DuckDB rounds a scaled double —
    measured 2/5000 docs flipped at sf0.1). Sums are then exact BIGINTs
    and the final average is a division of identical exact-integer
    doubles — bit-identical in both engines with no rounding step.

    Scale: the per-doc bigram explode is linear in token count; count
    relations are vocabulary-sized (Zipf-bounded, shrink under AQE to
    broadcasts when small); one (a, b)-keyed shuffle builds C(a,b), the
    prefix totals reduce FROM that (never re-shuffling the exploded
    relation), and the scalar V rides a broadcast cross join. The doc
    relation shuffles once on the bigram key for the probability join
    and once on the doc key for the final rollup."""
    staged = df.select(
        F.col(key), T.tokens(content).alias("toks")
    ).filter(F.size("toks") >= 2)
    bg = staged.select(
        F.col(key),
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(element_at(toks, i) AS tok_a, "
                "element_at(toks, i + 1) AS tok_b))"
            )
        ).alias("bg"),
    ).select(key, "bg.tok_a", "bg.tok_b")
    # per-doc bigram TYPE counts: shrinks the probability join's left side
    doc_bi = bg.groupBy(key, "tok_a", "tok_b").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    c2 = bg.groupBy("tok_a", "tok_b").agg(F.count(F.lit(1)).alias("n_ab"))
    c1 = c2.groupBy("tok_a").agg(F.sum("n_ab").alias("n_a"))
    vocab = (
        df.select(F.explode(T.tokens(content)).alias("t"))
        .agg(F.count_distinct("t").alias("v"))
    )
    nll_micro = F.floor(
        F.log(
            (F.col("n_a") + F.col("v")).cast("double")
            / (F.col("n_ab") + 1).cast("double")
        )
        * 1_000_000.0
        + 0.5
    ).cast("bigint")
    scored = (
        doc_bi.join(c2, ["tok_a", "tok_b"])
        .join(c1, "tok_a")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(key),
            F.col("n_occ"),
            (nll_micro * F.col("n_occ")).alias("__nll_micro"),
        )
    )
    return scored.groupBy(key).agg(
        F.sum("n_occ").alias("n_bigrams"),
        (
            F.sum("__nll_micro").cast("double")
            / F.sum("n_occ")
            / F.lit(1_000_000.0)
        ).alias("avg_nll"),
    )
