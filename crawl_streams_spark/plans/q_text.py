"""Text-analysis operators over ``documents`` (training-data-pipeline
extensions: language-ID, quality scoring, token counting, fingerprinting —
BASELINE.json north_star).

All expressions are Spark built-ins (split/filter/aggregate higher-order
functions) — zero Python in the row path. DuckDB oracles replicate each
computation with list lambdas so values hash-match exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions import text as T
from ..tables import load_table
from .registry import query

# Shared DuckDB fragments -------------------------------------------------
# tokens: whitespace-split with empties removed (matches T.tokens).
_DUCK_TOKENS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"


def _duck_stopword_hits(code: str) -> str:
    words = ", ".join(f"'{w}'" for w in T.STOPWORDS[code])
    return (
        f"len(list_filter({_DUCK_TOKENS}, t -> list_contains([{words}], lower(t))))"
    )


@query(
    "doc_token_stats",
    oracle=f"""
        SELECT doc_id,
               len({_DUCK_TOKENS}) AS n_tokens,
               len(list_distinct({_DUCK_TOKENS})) AS n_distinct_tokens,
               length(text) AS n_chars
        FROM documents
    """,
    tags=("text", "extension"),
    bench=True,
)
def doc_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens, distinct tokens, chars."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.distinct_token_count("text").alias("n_distinct_tokens"),
        F.length("text").alias("n_chars"),
    )


@query(
    "doc_quality",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   {_DUCK_TOKENS} AS toks,
                   length(text) AS n,
                   length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS n_punct
            FROM documents
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               ROUND(CASE WHEN n > 0 THEN n_punct::DOUBLE / n ELSE 0.0 END, 6) AS punct_ratio,
               ROUND(
                 (LEAST(len(toks) / 20.0, 1.0)
                  + (CASE WHEN len(toks) > 0
                          AND list_aggregate(list_transform(toks, x -> length(x)), 'sum') / len(toks)::DOUBLE
                              BETWEEN 3.0 AND 10.0
                          THEN 1.0 ELSE 0.5 END)
                  + (1.0 - LEAST((CASE WHEN n > 0 THEN n_punct::DOUBLE / n ELSE 0.0 END) * 4.0, 1.0)))
                 / 3.0, 6) AS quality
        FROM t
    """,
    tags=("text", "extension"),
)
def doc_quality(spark, sf_dir):
    """Quality scoring: length / word-length / punctuation-density composite
    (the cheap pre-filter stage of a training-data pipeline)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        F.round(T.punct_ratio("text"), 6).alias("punct_ratio"),
        T.quality_score("text").alias("quality"),
    )


def _duck_lang_id() -> str:
    pairs = ", ".join(
        f"struct_pack(hits := {_duck_stopword_hits(code)}, lang := '{code}')"
        for code in sorted(T.STOPWORDS)
    )
    # list_max over (hits, lang) structs == Spark array_max over the same
    # struct ordering: max hits, ties → lexicographically greatest lang.
    return (
        f"CASE WHEN list_max([{pairs}])['hits'] > 0 "
        f"THEN list_max([{pairs}])['lang'] ELSE 'und' END"
    )


@query(
    "doc_lang_id",
    oracle=f"""
        SELECT lang AS actual_lang,
               {_duck_lang_id()} AS predicted_lang,
               COUNT(*) AS n
        FROM documents
        GROUP BY 1, 2
    """,
    tags=("text", "extension", "lang-id"),
)
def doc_lang_id(spark, sf_dir):
    """Language-ID (stopword-hit heuristic) confusion matrix against the
    table's ``lang`` label."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("actual_lang"),
            T.lang_id("text").alias("predicted_lang"),
        )
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )


@query(
    "doc_fingerprints",
    oracle=f"""
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct({_DUCK_TOKENS})), ' ')) AS fp,
               md5(text) AS exact_md5
        FROM documents
    """,
    tags=("text", "extension", "fingerprint"),
)
def doc_fingerprints(spark, sf_dir):
    """Document fingerprinting: exact md5 + order-insensitive token-set
    fingerprint (the content_digest analog, reference analysis.py:47)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.fingerprint("text").alias("fp"),
        F.md5("text").alias("exact_md5"),
    )


@query(
    "token_array_ops",
    oracle=f"""
        SELECT doc_id,
               COALESCE(array_to_string(list_sort(list_filter(list_distinct({_DUCK_TOKENS}),
                                                              t -> t LIKE 's%')), ' '), '') AS s_tokens,
               len(list_filter({_DUCK_TOKENS}, t -> length(t) > 5)) AS n_long
        FROM documents
        ORDER BY doc_id
        LIMIT 300
    """,
    tags=("text", "F-7", "higher-order"),
)
def token_array_ops(spark, sf_dir):
    """F-7's split/filter/transform/rejoin annotation-classifier shape
    (report.py:182-201) exercised as higher-order array functions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return (
        docs.select(
            "doc_id",
            F.array_join(
                F.array_sort(
                    F.filter(
                        F.array_distinct(toks), lambda t: t.startswith("s")
                    )
                ),
                " ",
            ).alias("s_tokens"),
            F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long"),
        )
        .orderBy("doc_id")
        .limit(300)
    )


@query(
    "doc_bpe_tokens",
    oracle=r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1)) AS n_bpe_tokens,
               len(list_distinct(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1))) AS n_distinct_bpe,
               regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1)[1] AS first_token
        FROM documents
    """,
    tags=("text", "extension", "tokenizer"),
)
def doc_bpe_tokens(spark, sf_dir):
    """BPE-ish sub-word token counting (GPT-2-pre-tokenizer-style regex
    split: letter runs / digit runs / single symbols) — the cheap
    token-budget estimator of a training pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.bpe_ish_tokens(F.col("text"))
    staged = docs.select("doc_id", toks.alias("toks"))
    return staged.select(
        "doc_id",
        F.size("toks").alias("n_bpe_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct_bpe"),
        F.element_at("toks", 1).alias("first_token"),
    )


@query(
    "lang_source_rollup",
    oracle="""
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               ROUND(AVG(n_chars), 4) AS avg_chars
        FROM documents
        GROUP BY lang, source
    """,
    tags=("text", "agg"),
)
def lang_source_rollup(spark, sf_dir):
    """Corpus composition rollup by (lang, source)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )
