"""Corpus-level term statistics under the cross-engine gate
(operators/corpus_stats.py): frequency-based quality scoring and TF-IDF
keyword extraction. Both engines tokenize identically (q_text
convention); every aggregate is an integer sum and every double comes
from one division / one log per row, so the hash gate is exact.
"""

from __future__ import annotations

from ..operators import corpus_stats as CS
from ..tables import load_table
from .registry import query

_DUCK_TF = r"""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(
                   regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))
                   AS tok
        FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok
    ),
    stats AS (
        SELECT tok, CAST(SUM(tf) AS BIGINT) AS cnt, count(*) AS df_docs
        FROM tf GROUP BY tok
    )
"""


@query(
    "doc_unigram_freq",
    oracle=_DUCK_TF
    + """
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           CAST(SUM(tf.tf * stats.cnt) AS BIGINT) AS freq_sum,
           ROUND(CAST(SUM(tf.tf * stats.cnt) AS BIGINT)
                 / CAST(SUM(tf.tf) AS BIGINT), 6) AS mean_token_freq
    FROM tf JOIN stats USING (tok)
    GROUP BY tf.doc_id
    """,
    tags=("text", "quality", "corpus", "extension"),
)
def doc_unigram_freq(spark, sf_dir):
    """Mean-corpus-frequency quality score per document (the LM-free
    perplexity proxy): for every token occurrence, how common is that
    token corpus-wide. Integer sums only; one division per row."""
    docs = load_table(spark, sf_dir, "documents")
    return CS.doc_freq_stats(docs)


@query(
    "doc_tfidf_topk",
    oracle=_DUCK_TF
    + """
    , n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok, tf.tf, stats.df_docs,
               tf.tf * ln(n.n_docs / stats.df_docs) AS tfidf
        FROM tf JOIN stats USING (tok), n
    )
    SELECT doc_id, tok, tf, df_docs, ROUND(tfidf, 6) AS tfidf, rnk FROM (
        SELECT doc_id, tok, tf, df_docs, tfidf,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rnk
        FROM scored
    ) WHERE rnk <= 5
    """,
    tags=("text", "keywords", "corpus", "extension"),
)
def doc_tfidf_topk(spark, sf_dir):
    """Top-5 TF-IDF terms per document — the keyword/topic fingerprint.
    tfidf = tf·ln(N/df); ties are exact (same tf, df) and break on the
    term string, so the top-k set is engine- and partitioning-stable."""
    docs = load_table(spark, sf_dir, "documents")
    return CS.doc_tfidf_topk(docs, k=5)
