"""Substring-level exact dedup: duplicated token-span detection (the
"dedup by repeated n-gram window" pass of Lee et al. 2021,
arXiv:2107.06499 — applied to training corpora so boilerplate shared
across documents can be located and excised, not just whole-document
near-dups).

Pipeline (all built-ins, no Python rows):

  windows   every n-token window of every document as (key, pos, digest)
            — digest, not gram text, so the global shuffle key is a slim
            int64/hex, never the string
  dup set   digests whose window occurs in ≥ min_docs distinct documents
            (partial-agg count-distinct; the dup set is candidate-bounded)
  spans     per document, duplicated window positions gap-merged into
            maximal spans (two windows join one span iff their starts
            differ by ≤ n — touching or overlapping coverage)

Scale: one shuffle keyed on the digest for the dup-set aggregation plus a
semi-join back (same key — AQE reuses the exchange), then one shuffle by
document key for the span merge. Window-position explosion is ~tokens/doc
rows of 3 narrow columns — linear in corpus token count. Very frequent
grams (stopword runs) skew the digest key; at corpus scale cap them with
``max_occurrences`` (a gram in more docs than the cap is boilerplate by
definition — it still marks spans, via the capped HAVING range) or let AQE
split the skewed partitions.

Reference parity: the reference has no substring dedup (crawl-streams
deduplicates by content digest only, analysis.py annotations
`duplicate:digest`); this is a driver-mandated training-pipeline
extension (SURVEY §7.6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions import text as T


def _window_digest(gram: F.Column, hash_impl: str) -> F.Column:
    if hash_impl == "xxhash64":
        return F.xxhash64(gram)
    if hash_impl == "md5":
        return F.md5(gram)
    raise ValueError(f"unknown hash_impl {hash_impl!r} (xxhash64|md5)")


def token_windows(
    df: DataFrame,
    content: str = "text",
    key: str = "doc_id",
    n: int = 5,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Every n-token window as (key, pos, dig): pos is the 1-based start
    token index, dig a digest of the space-joined window. Documents
    shorter than n tokens emit nothing (no whole-text fallback — a span
    detector reports positions, and sub-window docs have no window).

    The gram string dies inside the projection; only the digest crosses
    any exchange. xxhash64 (default) keeps the key an int64; md5 is the
    oracle-replayable dial (same convention as operators/dedup.py)."""
    toks = df.select(F.col(key).alias("key"), T.tokens(content).alias("toks")).filter(
        F.size("toks") >= n
    )
    win = toks.select(
        "key",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                lambda i: F.array_join(F.slice("toks", i, n), " "),
            )
        ).alias("pos0", "gram"),
    )
    return win.select(
        "key",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        _window_digest(F.col("gram"), hash_impl).alias("dig"),
    )


def duplicated_windows(
    windows: DataFrame,
    min_docs: int = 2,
    max_occurrences: int | None = None,
) -> DataFrame:
    """(key, pos) of windows whose digest appears in ≥ min_docs distinct
    documents (≤ max_occurrences if capped — drop universal boilerplate
    grams from span marking when they would only add noise).

    The filtered digest set is pinned (lazy localCheckpoint, r14): the
    semi-join's BUILD side otherwise re-derives the whole corpus-sized
    tokenize→gram→digest chain plus its two-level aggregation — the
    probe side must re-derive the chain regardless (pinning the
    token-level windows relation was tried in r13 and rejected:
    materializing one row per corpus token costs more than recomputing
    a narrow hash chain), but the DUP SET is one slim row per distinct
    duplicated digest, bounded by the duplicate vocabulary, exactly the
    'smallest relation' the pin discipline wants. One corpus chain per
    query instead of two."""
    counts = windows.groupBy("dig").agg(
        F.countDistinct("key").alias("n_docs")
    )
    dup = counts.filter(F.col("n_docs") >= min_docs)
    if max_occurrences is not None:
        dup = dup.filter(F.col("n_docs") <= max_occurrences)
    dup = dup.select("dig").localCheckpoint(eager=False)
    return windows.join(dup, "dig", "left_semi").select("key", "pos")


def merge_spans(hits: DataFrame, n: int) -> DataFrame:
    """Gap-merge duplicated window positions into maximal spans per key.
    Windows starting at p and q (p<q) share a span iff q − p ≤ n (their
    token coverage touches or overlaps). Returns
    (key, span_start, span_end, n_windows) with span_end the last covered
    token index (inclusive). One shuffle by key; integer-only math, so
    results are order-insensitive and oracle-exact."""
    w = Window.partitionBy("key").orderBy("pos")
    isl = hits.select(
        "key",
        "pos",
        F.sum(
            F.when(
                F.col("pos") - F.lag("pos").over(w) <= n, F.lit(0)
            ).otherwise(F.lit(1))
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    return isl.groupBy("key", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (n - 1)).alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).drop("island")


def dup_spans(
    df: DataFrame,
    content: str = "text",
    key: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    max_occurrences: int | None = None,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """End-to-end duplicated-span detection: (key, span_start, span_end,
    n_windows), span bounds in 1-based token indices, end inclusive."""
    win = token_windows(df, content, key, n, hash_impl)
    hits = duplicated_windows(win, min_docs, max_occurrences)
    out = merge_spans(hits, n)
    return out.withColumnRenamed("key", key)


def dup_span_doc_stats(
    df: DataFrame,
    content: str = "text",
    key: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Per-document duplicated-coverage stats — the quality-filter view:
    (key, n_tokens, n_spans, covered_tokens, dup_token_fraction). Spans
    are disjoint after gap-merge, so covered = Σ span lengths exactly;
    the fraction is a single integer/integer division (deterministic).
    Documents with no duplicated span report zeros (left join)."""
    toks = df.select(
        F.col(key).alias("key"), F.size(T.tokens(content)).cast("bigint").alias("n_tokens")
    )
    win = token_windows(df, content, key, n, hash_impl)
    spans = merge_spans(duplicated_windows(win, min_docs), n)
    per_doc = spans.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("covered_tokens"),
    )
    out = (
        toks.join(per_doc, "key", "left")
        .select(
            F.col("key").alias(key),
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.round(
                F.coalesce("covered_tokens", F.lit(0))
                / F.greatest("n_tokens", F.lit(1)),
                6,
            ).alias("dup_token_fraction"),
        )
    )
    return out


def excise_spans(
    df: DataFrame,
    spans: DataFrame,
    content: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Remove every token covered by a duplicated span and reassemble the
    cleaned text — the excision half of the Lee et al. pipeline (detect
    with dup_spans, then cut the boilerplate out rather than dropping the
    whole document).

    ``spans`` is (key, span_start, span_end, …) with 1-based inclusive
    token bounds (dup_spans output). Returns
    (key, n_tokens, kept_tokens, clean_text); a fully-excised document
    keeps an empty string.

    Shape: spans collapse to one per-doc array (collect_list after the
    span pipeline's own key shuffle — same key, exchange reuse), then one
    key-equi-join against the corpus and a per-row HOF filter: for each
    token, ``exists(spans, s -> s.start <= i <= s.end)``. Per-row cost is
    tokens × spans-per-doc (spans are gap-merged and disjoint, so few);
    nothing quadratic crosses a shuffle. The corpus text never moves — the
    join ships only the small span arrays to wherever the docs already
    live."""
    sp = spans.groupBy(F.col(key).alias("__k")).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("__spans")
    )
    toks = df.select(
        F.col(key), T.tokens(content).alias("__toks")
    )
    j = toks.join(sp, toks[key] == sp["__k"], "left").drop("__k")
    spans_type = dict(sp.dtypes)["__spans"]
    j = j.withColumn(
        "__spans", F.coalesce(F.col("__spans"), F.array().cast(spans_type))
    )
    indexed = F.transform(
        F.col("__toks"),
        lambda tok, i: F.struct(tok.alias("t"), (i + 1).alias("i")),
    )
    kept = F.filter(
        indexed,
        lambda x: ~F.exists(
            F.col("__spans"),
            lambda s: (s["s"] <= x["i"]) & (x["i"] <= s["e"]),
        ),
    )
    return j.withColumn("__kept", kept).select(
        F.col(key),
        F.size("__toks").cast("bigint").alias("n_tokens"),
        F.size("__kept").cast("bigint").alias("kept_tokens"),
        F.array_join(
            F.transform(F.col("__kept"), lambda x: x["t"]), " "
        ).alias("clean_text"),
    )
