"""Duplicated token-span detection under the cross-engine gate (the
substring-level exact-dedup extension, operators/spans.py — Lee et al.
2021 style repeated-window marking).

Both engines tokenize identically (whitespace split, empties dropped —
the q_text convention), window identically (n=5, 1-based start), digest
with md5 (the oracle-replayable dial; production defaults to native
xxhash64), and gap-merge with the same ≤ n adjacency rule in pure integer
math — so span sets hash-match exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators import spans as SP
from ..tables import load_table
from .registry import query

_DUCK_WINDOWS = r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    w AS (
        SELECT t.doc_id, gs.pos,
               md5(array_to_string(t.toks[gs.pos:gs.pos+4], ' ')) AS dig
        FROM t, LATERAL (
            SELECT unnest(generate_series(1, len(t.toks) - 4)) AS pos
        ) gs
    ),
    dup AS (
        SELECT dig FROM w GROUP BY dig HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT w.doc_id, w.pos FROM w SEMI JOIN dup USING (dig)),
    isl AS (
        SELECT doc_id, pos,
               SUM(CASE WHEN prev IS NULL OR pos - prev > 5 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM (
            SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM hits
        )
    ),
    spans AS (
        SELECT doc_id, island,
               min(pos) AS span_start,
               max(pos) + 4 AS span_end,
               count(*) AS n_windows
        FROM isl GROUP BY doc_id, island
    )
"""


@query(
    "dup_token_spans",
    oracle=_DUCK_WINDOWS
    + """
    SELECT doc_id, span_start, span_end, n_windows FROM spans
    """,
    tags=("dedup", "spans", "extension"),
)
def dup_token_spans(spark, sf_dir):
    """Maximal duplicated 5-token spans across documents: every window
    shared by ≥2 distinct docs, gap-merged per doc (two windows share a
    span iff their starts differ by ≤ 5). Bounds are 1-based token
    indices, end inclusive."""
    docs = load_table(spark, sf_dir, "documents")
    return SP.dup_spans(docs, n=5, min_docs=2, hash_impl="md5")


@query(
    "dup_span_doc_stats",
    oracle=_DUCK_WINDOWS
    + r"""
    , per_doc AS (
        SELECT doc_id, count(*) AS n_spans,
               CAST(SUM(span_end - span_start + 1) AS BIGINT) AS covered_tokens
        FROM spans GROUP BY doc_id
    ),
    nt AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                               x -> x <> '')) AS n_tokens
        FROM documents
    )
    SELECT nt.doc_id,
           nt.n_tokens,
           COALESCE(per_doc.n_spans, 0) AS n_spans,
           COALESCE(per_doc.covered_tokens, 0) AS covered_tokens,
           ROUND(COALESCE(per_doc.covered_tokens, 0)
                 / GREATEST(nt.n_tokens, 1), 6) AS dup_token_fraction
    FROM nt LEFT JOIN per_doc USING (doc_id)
    """,
    tags=("dedup", "spans", "quality", "extension"),
    bench=True,  # r13: span analytics joined the bench set
)
def dup_span_doc_stats(spark, sf_dir):
    """Per-document duplicated-span coverage — the quality-filter view
    (what fraction of this doc is boilerplate shared with other docs).
    Zero rows for clean docs via left join; single integer/integer
    division so the fraction is order-insensitive."""
    docs = load_table(spark, sf_dir, "documents")
    return SP.dup_span_doc_stats(docs, n=5, min_docs=2, hash_impl="md5")


@query(
    "doc_span_excision",
    oracle=_DUCK_WINDOWS
    + r"""
    , tok_idx AS (
        SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i
        FROM t
    ),
    kept AS (
        SELECT ti.doc_id, ti.tok, ti.i
        FROM tok_idx ti
        ANTI JOIN spans s
          ON s.doc_id = ti.doc_id
         AND s.span_start <= ti.i AND ti.i <= s.span_end
    ),
    reass AS (
        SELECT doc_id,
               COUNT(*)::BIGINT AS kept_tokens,
               md5(string_agg(tok, ' ' ORDER BY i)) AS clean_md5
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           COALESCE(reass.kept_tokens, 0) AS kept_tokens,
           COALESCE(reass.clean_md5, md5('')) AS clean_md5
    FROM t LEFT JOIN reass USING (doc_id)
    """,
    tags=("dedup", "spans", "excision", "extension"),
    bench=True,
)
def doc_span_excision(spark, sf_dir):
    """Cleaned corpus after cutting duplicated 5-token spans out of every
    document (operators/spans.py::excise_spans): per doc, original and
    surviving token counts plus the md5 of the reassembled clean text —
    the digest puts the full reconstruction (token selection AND order)
    under the value gate, not just the counts."""
    docs = load_table(spark, sf_dir, "documents")
    spans = SP.dup_spans(docs, n=5, min_docs=2, hash_impl="md5")
    clean = SP.excise_spans(docs, spans)
    return clean.select(
        "doc_id",
        "n_tokens",
        "kept_tokens",
        F.md5("clean_text").alias("clean_md5"),
    )
