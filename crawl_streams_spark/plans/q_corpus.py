"""Corpus-level term statistics under the cross-engine gate
(operators/corpus_stats.py): frequency-based quality scoring and TF-IDF
keyword extraction. Both engines tokenize identically (q_text
convention); every aggregate is an integer sum and every double comes
from one division / one log per row, so the hash gate is exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F

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


@query(
    "term_posting_lists",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS term,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        ),
        df_counts AS (
            SELECT term, COUNT(DISTINCT doc_id) AS doc_freq
            FROM toks GROUP BY term
        ),
        top_terms AS (
            SELECT term, doc_freq FROM df_counts
            ORDER BY doc_freq DESC, term LIMIT 30
        ),
        postings AS (
            SELECT t.term,
                   tt.doc_freq,
                   COUNT(*)::BIGINT AS total_occurrences,
                   string_agg(
                       t.doc_id || ':' || t.pos, ','
                       ORDER BY t.doc_id, t.pos
                   ) AS posting_digest
            FROM toks t JOIN top_terms tt USING (term)
            GROUP BY t.term, tt.doc_freq
        )
        SELECT term, doc_freq, total_occurrences,
               md5(posting_digest) AS postings_md5
        FROM postings
    """,
    tags=("corpus", "inverted-index", "extension"),
)
def term_posting_lists(spark, sf_dir):
    """Inverted-index construction for the 30 highest-document-frequency
    terms: per term, the full (doc_id, position) posting list in
    canonical order, gated through an md5 of the serialized list — the
    search-index build primitive (the reference's crawl domain feeds
    Solr; this is the engine-side index shape). One term-keyed shuffle
    builds all postings; position lists ride as slim (doc, pos) int
    pairs; Zipf-head skew on top terms is ordinary key skew (AQE or the
    corpus_stats skew-split). The digest keeps the oracle comparator away
    from engine-specific list types (ROUNDLOG r3 lesson)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "term"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    top_terms = (
        toks.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(30)
    )
    joined = toks.join(F.broadcast(top_terms), "term")
    return joined.groupBy("term", "doc_freq").agg(
        F.count(F.lit(1)).alias("total_occurrences"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "pos"))
                    ),
                    lambda x: F.concat_ws(
                        ":", x["doc_id"].cast("string"), x["pos"].cast("string")
                    ),
                ),
            )
        ).alias("postings_md5"),
    )


@query(
    "bigram_pmi_collocations",
    oracle=r"""
        WITH tl AS (
            SELECT doc_id, list_filter(
                       regexp_split_to_array(trim(text), '\s+'), x -> x <> '')
                       AS toks
            FROM documents
        ),
        u AS (SELECT unnest(toks) AS tok FROM tl),
        uni AS (SELECT tok, COUNT(*)::BIGINT AS cnt FROM u GROUP BY tok),
        bg AS (
            SELECT unnest(list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i+1])) AS bigram
            FROM tl WHERE len(toks) >= 2
        ),
        bi AS (
            SELECT split_part(bigram, ' ', 1) AS tok_a,
                   split_part(bigram, ' ', 2) AS tok_b,
                   COUNT(*)::BIGINT AS n_ab
            FROM bg GROUP BY 1, 2
        ),
        tot AS (
            SELECT (SELECT SUM(cnt) FROM uni)::BIGINT AS n_uni,
                   (SELECT SUM(n_ab) FROM bi)::BIGINT AS n_bi
        )
        SELECT b.tok_a, b.tok_b, b.n_ab, ua.cnt AS n_a, ub.cnt AS n_b,
               ROUND(ln((b.n_ab * t.n_uni * t.n_uni)::DOUBLE
                        / (t.n_bi::DOUBLE * ua.cnt * ub.cnt)), 6) AS pmi
        FROM bi b
        JOIN uni ua ON ua.tok = b.tok_a
        JOIN uni ub ON ub.tok = b.tok_b
        CROSS JOIN tot t
        WHERE b.n_ab >= 5
        ORDER BY pmi DESC, tok_a, tok_b
        LIMIT 30
    """,
    tags=("text", "corpus", "collocation", "pmi", "extension"),
)
def bigram_pmi_collocations(spark, sf_dir):
    """Top-30 collocations (adjacent bigrams) by pointwise mutual
    information (operators/corpus_stats.py::bigram_pmi) — the corpus
    phrase-mining kernel: PMI = ln(n_ab·N_uni² / (N_bi·n_a·n_b)) over
    integer counts, one log per output row, ordered by the ROUNDED score
    with a bigram tie-break so the selected set is deterministic. The
    gate certifies the bigram explode, both Zipf-skewed aggregates, and
    the estimator."""
    docs = load_table(spark, sf_dir, "documents")
    return CS.bigram_pmi(docs, min_count=5, k=30)


@query(
    "source_lang_entropy",
    oracle="""
        WITH c AS (
            SELECT source, lang, COUNT(*)::BIGINT AS n
            FROM documents GROUP BY source, lang
        ),
        g AS (
            SELECT source,
                   SUM(n)::BIGINT AS n_docs,
                   COUNT(*)::BIGINT AS n_langs,
                   list_reduce(list(n::DOUBLE * ln(n::DOUBLE)
                                    ORDER BY lang),
                               (a, b) -> a + b) AS nlogn_sum
            FROM c GROUP BY source
        )
        SELECT source, n_docs, n_langs,
               ROUND(CASE WHEN n_docs > 0
                     THEN ln(n_docs::DOUBLE) - nlogn_sum / n_docs
                     END, 6) AS lang_entropy
        FROM g
    """,
    tags=("corpus", "entropy", "diversity", "extension"),
)
def source_lang_entropy(spark, sf_dir):
    """Shannon entropy of each source's language distribution —
    H = ln(N) − (Σ c·ln c)/N — the diversity score a corpus-mixing
    pipeline monitors (0 = monolingual source). Counts are integers;
    each c·ln(c) term is one deterministic double; and the per-source
    term SUM is a SEQUENTIAL fold over the lang-sorted term array on
    both engines (the chi-square discipline: fixed order, not shuffle
    order), so the statistic sits under the exact gate."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    g = c.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_langs"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("lang", "n"))),
            F.lit(0.0),
            lambda acc, x: acc
            + x["n"].cast("double") * F.log(x["n"].cast("double")),
        ).alias("nlogn_sum"),
    )
    return g.select(
        "source",
        "n_docs",
        "n_langs",
        F.round(
            F.when(
                F.col("n_docs") > 0,
                F.log(F.col("n_docs").cast("double"))
                - F.col("nlogn_sum") / F.col("n_docs"),
            ),
            6,
        ).alias("lang_entropy"),
    )


@query(
    "doc_lm_perplexity",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, list_filter(
                       regexp_split_to_array(trim(text), '\s+'),
                       x -> x <> '') AS tk
            FROM documents
        ),
        tokpos AS (
            SELECT doc_id, unnest(tk) AS tok,
                   generate_subscripts(tk, 1) AS pos
            FROM toks
        ),
        bi AS (
            SELECT p.doc_id, p.tok AS tok_a, q.tok AS tok_b
            FROM tokpos p
            JOIN tokpos q ON q.doc_id = p.doc_id AND q.pos = p.pos + 1
        ),
        doc_bi AS (
            SELECT doc_id, tok_a, tok_b, count(*) AS n_occ
            FROM bi GROUP BY doc_id, tok_a, tok_b
        ),
        c2 AS (
            SELECT tok_a, tok_b, count(*) AS n_ab FROM bi
            GROUP BY tok_a, tok_b
        ),
        c1 AS (
            SELECT tok_a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM c2
            GROUP BY tok_a
        ),
        v AS (SELECT count(DISTINCT tok) AS v FROM tokpos)
        SELECT doc_bi.doc_id,
               CAST(SUM(n_occ) AS BIGINT) AS n_bigrams,
               SUM(CAST(FLOOR(ln(((n_a + v.v)::DOUBLE) / ((n_ab + 1)::DOUBLE))
                              * 1000000.0 + 0.5) AS BIGINT) * n_occ)::DOUBLE
                   / SUM(n_occ) / 1000000.0 AS avg_nll
        FROM doc_bi
        JOIN c2 USING (tok_a, tok_b)
        JOIN c1 USING (tok_a)
        CROSS JOIN v
        GROUP BY doc_bi.doc_id
    """,
    tags=("text", "quality", "language-model", "perplexity", "extension"),
)
def doc_lm_perplexity(spark, sf_dir):
    """Per-document bigram-LM quality score
    (operators/corpus_stats.py::bigram_lm_scores): an add-1-smoothed
    bigram model fit on the corpus itself scores every document by
    average negative log-likelihood — the CCNet/Gopher-style perplexity
    filter a training pipeline runs before sampling. Counts are exact
    integers; each −ln P quantizes to integer micro-nats via
    floor(x·10⁶+0.5) (ROUND(x, 6) diverges between engines near .5
    boundaries — Spark rounds the exact BigDecimal, DuckDB a scaled
    double), sums stay BIGINT-exact and the final average divides
    identical exact-integer doubles, so the cross-engine hash gate
    certifies the model's probabilities, not just row counts."""
    docs = load_table(spark, sf_dir, "documents")
    return CS.bigram_lm_scores(docs)
