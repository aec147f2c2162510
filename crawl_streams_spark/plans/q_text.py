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
        T.token_count("text").cast("bigint").alias("n_tokens"),
        T.distinct_token_count("text").cast("bigint").alias("n_distinct_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


# Quality-score formula over staged (toks, n, n_punct) columns — shared by
# doc_quality and the curation funnel (q_pipeline) so the two oracles can
# never diverge. Mirrors functions/text.py::quality_score exactly.
_DUCK_PUNCT_STAGE = (
    "length(regexp_replace(text, '[^.,;:!?''\"()\\[\\]{}-]', '', 'g'))"
)


def duck_quality_expr(toks: str = "toks", n: str = "n", n_punct: str = "n_punct") -> str:
    return f"""ROUND(
                 (LEAST(len({toks}) / 20.0, 1.0)
                  + (CASE WHEN len({toks}) > 0
                          AND list_aggregate(list_transform({toks}, x -> length(x)), 'sum') / len({toks})::DOUBLE
                              BETWEEN 3.0 AND 10.0
                          THEN 1.0 ELSE 0.5 END)
                  + (1.0 - LEAST((CASE WHEN {n} > 0 THEN {n_punct}::DOUBLE / {n} ELSE 0.0 END) * 4.0, 1.0)))
                 / 3.0, 6)"""


@query(
    "doc_quality",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   {_DUCK_TOKENS} AS toks,
                   length(text) AS n,
                   {_DUCK_PUNCT_STAGE} AS n_punct
            FROM documents
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               ROUND(CASE WHEN n > 0 THEN n_punct::DOUBLE / n ELSE 0.0 END, 6) AS punct_ratio,
               {duck_quality_expr()} AS quality
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
        T.token_count("text").cast("bigint").alias("n_tokens"),
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
            F.size(F.filter(toks, lambda t: F.length(t) > 5)).cast("bigint").alias("n_long"),
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
        F.size("toks").cast("bigint").alias("n_bpe_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct_bpe"),
        F.element_at("toks", 1).alias("first_token"),
    )


@query(
    "top_tokens",
    oracle=f"""
        SELECT t AS token, COUNT(*) AS n
        FROM (SELECT unnest({_DUCK_TOKENS}) AS t FROM documents)
        GROUP BY t
        ORDER BY n DESC, t
        LIMIT 50
    """,
    tags=("text", "explode", "udtf-shape"),
)
def top_tokens(spark, sf_dir):
    """Corpus vocabulary top-50 via explode (the generator/UDTF shape):
    row-expanding lateral view → count → top-k. At scale: explode is a
    narrow map, the count is partial-aggregated, top-k is
    TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(50)
    )


@query(
    "annotation_regex_classes",
    oracle="""
        WITH a AS (
            SELECT event_id,
                   CASE WHEN event_id % 4 = 0 THEN (event_id % 9) || 't'
                        WHEN event_id % 4 = 1 THEN '10.0.' || (event_id % 256) || '.7'
                        WHEN event_id % 4 = 2 THEN 'dol:' || (event_id % 5)
                        ELSE 'WebRenderStatus:200' END AS annot
            FROM events
        )
        SELECT event_id, annot,
               regexp_matches(annot, '^\\d+t$') AS is_tries,
               regexp_matches(annot, '^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$') AS is_ip,
               regexp_matches(annot, '^dol:\\d+$') AS is_dol
        FROM a
        ORDER BY event_id
        LIMIT 2000
    """,
    tags=("F-7", "regex", "crawl"),
)
def annotation_regex_classes(spark, sf_dir):
    """F-7's regex variants (streamer.py:81-90): tries counter ^\\d+t$,
    bare-IPv4, dol:n — classified with rlike on synthesized annotations."""
    ev = load_table(spark, sf_dir, "events")
    annot = (
        F.when(F.col("event_id") % 4 == 0, F.concat((F.col("event_id") % 9).cast("string"), F.lit("t")))
        .when(F.col("event_id") % 4 == 1, F.concat(F.lit("10.0."), (F.col("event_id") % 256).cast("string"), F.lit(".7")))
        .when(F.col("event_id") % 4 == 2, F.concat(F.lit("dol:"), (F.col("event_id") % 5).cast("string")))
        .otherwise(F.lit("WebRenderStatus:200"))
    )
    d = ev.select("event_id", annot.alias("annot"))
    return (
        d.select(
            "event_id",
            "annot",
            F.col("annot").rlike(r"^\d+t$").alias("is_tries"),
            F.col("annot").rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$").alias("is_ip"),
            F.col("annot").rlike(r"^dol:\d+$").alias("is_dol"),
        )
        .orderBy("event_id")
        .limit(2000)
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


def _duck_grams(toks: str, n: int) -> str:
    """Non-distinct sliding n-grams over a staged token-list column —
    mirror of functions/text.py::ngrams_from_tokens."""
    return (
        f"list_transform(range(1, GREATEST(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )


@query(
    "doc_repetition",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
        ),
        g AS (
            SELECT doc_id,
                   toks,
                   {_duck_grams('toks', 2)} AS g2,
                   {_duck_grams('toks', 3)} AS g3
            FROM t
        ),
        c AS (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   len(list_distinct(toks)) AS n_distinct,
                   list_transform(list_distinct(g2),
                                  d -> len(list_filter(g2, x -> x = d))) AS c2,
                   g3
            FROM g
        )
        SELECT doc_id,
               ROUND(1.0 - n_distinct / n_tokens::DOUBLE, 6) AS dup_token_fraction,
               ROUND(list_aggregate(c2, 'max') /
                     list_aggregate(c2, 'sum')::DOUBLE, 6) AS top_2gram_fraction,
               ROUND(list_aggregate(
                         list_transform(
                             list_transform(list_distinct(g3),
                                            d -> len(list_filter(g3, x -> x = d))),
                             c -> CASE WHEN c > 1 THEN c ELSE 0 END),
                         'sum') /
                     len(g3)::DOUBLE, 6) AS dup_3gram_fraction
        FROM c
    """,
    tags=("text", "extension", "quality"),
)
def doc_repetition(spark, sf_dir):
    """Repetition-quality filters from large-corpus curation practice
    (boilerplate/template detection): duplicate-token fraction, top-2-gram
    fraction, duplicate-3-gram fraction. Narrow map only — gram arrays are
    staged through named columns (HOFs get no subexpression elimination,
    ROUNDLOG lesson 1/8)."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", T.tokens("text").alias("toks")
    ).select(
        "doc_id",
        "toks",
        T.ngrams_from_tokens(F.col("toks"), 2).alias("g2"),
        T.ngrams_from_tokens(F.col("toks"), 3).alias("g3"),
    )
    return staged.select(
        "doc_id",
        F.round(
            1.0 - F.size(F.array_distinct("toks")) / F.size("toks").cast("double"),
            6,
        ).alias("dup_token_fraction"),
        F.round(T.top_ngram_fraction(F.col("g2")), 6).alias("top_2gram_fraction"),
        F.round(T.dup_ngram_fraction(F.col("g3")), 6).alias("dup_3gram_fraction"),
    )


# -- HTML -> text extraction (r10) ------------------------------------------
# The fixture synthesizes a page around each document's text (title with an
# entity, style + comment + script blocks with embedded '<' and '</p>'
# decoys, per-doc links); the oracle replays the IDENTICAL strip/decode
# chain from the shared constants, so the two cannot drift.

_HTML_PREFIX = "<html><head><title>Doc "
_HTML_TITLE_TAIL = (
    "&#8217;s &#8212; &amp; friends</title>"
    "<style>body div</style></head><body><!-- hidden "
)
_HTML_BODY_OPEN = " --><h1>Heading</h1><p>"
_HTML_LINK_OPEN = '</p><a href="https://ex.org/'
_HTML_LINK_TAIL = '">x</a>'
_HTML_ALT_LINK = '<a href="https://ex.org/alt">y</a>'
# suffix arms (VERDICT r10 item 7 — numeric charrefs): decimal + hex
# refs decode; &amp;#39; must yield literal '&#39;' (ampersand class
# decodes LAST, so no double-decode); &amp;#38; and &amp;#x26; must
# yield the literal '&#38;'/'&#x26;' (ADVICE r11 — the class decodes in
# ONE pass, so no double-decode WITHIN the class either); &#37; is
# deliberately unknown and passes through as literal text; &#60;tag&#62;
# decodes AFTER the tag strip, so the '<tag>' it produces is visible
# text, never a tag.
_HTML_SUFFIX = (
    '<script>var x = 1 < 2; s = "</p>";</script>&nbsp;&lt;fin&gt; '
    "It&#8217;s &#8220;fine&#8221; &#8211; 100&#37; &amp;#39; "
    "&amp;#38; &amp;#x26; &#38;x &#x26;y "
    "&#x27;quoted&#x27; &#60;tag&#62;</body></html>"
)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _duck_html_fixture() -> str:
    return (
        f"{_sql_quote(_HTML_PREFIX)} || CAST(doc_id AS VARCHAR) || "
        f"{_sql_quote(_HTML_TITLE_TAIL)} || CAST(doc_id AS VARCHAR) || "
        f"{_sql_quote(_HTML_BODY_OPEN)} || text || "
        f"{_sql_quote(_HTML_LINK_OPEN)} || CAST(doc_id AS VARCHAR) || "
        f"{_sql_quote(_HTML_LINK_TAIL)} || "
        f"CASE WHEN doc_id % 3 = 0 THEN {_sql_quote(_HTML_ALT_LINK)} "
        f"ELSE '' END || {_sql_quote(_HTML_SUFFIX)}"
    )


def _duck_entity_chain(expr: str) -> str:
    # mirror functions/text.py::_decode_entities exactly: literal
    # replaces for the non-ampersand entries, then the whole ampersand
    # class in ONE regexp pass (ADVICE r11 — sequential literal
    # replaces double-decode '&amp;#38;'/'&amp;#x26;' inside the class)
    for ent, ch in T.HTML_ENTITIES:
        if ch == "&":
            continue
        expr = f"replace({expr}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    return (
        f"regexp_replace({expr}, {_sql_quote(T.AMP_CLASS_PATTERN)}, "
        f"'&', 'g')"
    )


def _duck_html_clean(expr: str) -> str:
    for pat in T.HTML_STRIP_PATTERNS:
        expr = f"regexp_replace({expr}, {_sql_quote(pat)}, ' ', 'g')"
    expr = _duck_entity_chain(expr)
    return f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"


def _duck_html_title(expr: str) -> str:
    t = f"regexp_extract({expr}, '(?is)<title[^>]*>(.*?)</title>', 1)"
    t = _duck_entity_chain(t)
    return f"trim(regexp_replace({t}, '\\s+', ' ', 'g'))"


@query(
    "doc_html_extract",
    oracle=f"""
        WITH pages AS (SELECT doc_id, {_duck_html_fixture()} AS html
                       FROM documents)
        SELECT doc_id,
               {_duck_html_title('html')} AS title,
               {_duck_html_clean('html')} AS clean_text,
               CAST(len(regexp_extract_all(html, '(?is)href="([^"]*)"', 1)) AS BIGINT) AS n_links,
               array_to_string(regexp_extract_all(html, '(?is)href="([^"]*)"', 1), '|') AS links_joined
        FROM pages
    """,
    tags=("text", "extension", "html"),
)
def doc_html_extract(spark, sf_dir):
    """HTML -> text extraction (functions/text.py::html_to_text): the
    crawl-pipeline step between a fetched page and every text operator —
    strip script/style/comment blocks (their bodies carry '<' and
    '</p>' decoys), strip tags, decode entities (&amp; last), collapse
    whitespace; plus <title> recovery and href harvesting. Pure
    regexp/replace chain: whole-stage codegen, zero shuffle, 100 TB =
    embarrassingly parallel narrow map. Every pattern is
    RE2-compatible, so the oracle replays the exact chain."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit(_HTML_PREFIX), did,
        F.lit(_HTML_TITLE_TAIL), did,
        F.lit(_HTML_BODY_OPEN), F.col("text"),
        F.lit(_HTML_LINK_OPEN), did,
        F.lit(_HTML_LINK_TAIL),
        F.when(F.col("doc_id") % 3 == 0, F.lit(_HTML_ALT_LINK))
        .otherwise(F.lit("")),
        F.lit(_HTML_SUFFIX),
    )
    pages = docs.select("doc_id", html.alias("html"))
    return pages.select(
        "doc_id",
        T.html_title("html").alias("title"),
        T.html_to_text("html").alias("clean_text"),
        F.size(T.html_links("html")).cast("bigint").alias("n_links"),
        F.concat_ws("|", T.html_links("html")).alias("links_joined"),
    )


# ---------------------------------------------------------------- gopher
# Fixture arms for the Gopher battery gate: doc_id % 8 selects either the
# document's own text (arm 0 — the battery on real data) or a synthetic
# text built to trip a specific rule, so the oracle pins every rule's
# arithmetic (symbol counting, line fractions, stopword hits) against an
# independent engine. Strings are shared verbatim with the DuckDB SQL.
_GOPHER_SENT = "the be to of and that have with"  # all 8 stopwords
_GOPHER_ARMS: tuple[tuple[int, str, int], ...] = (
    # (arm, unit string, repeat count)
    (1, "word ", 60),                       # stopword hits = 0
    (2, "the be " + "a" * 30 + " ", 60),    # mean word len ~11.7 > 10
    (3, "the be 12345 ", 60),               # alpha word frac 2/3 < 0.8
    (4, "the be to of and", 1),             # 5 words < 50
    (5, "* " + _GOPHER_SENT + "\n", 60),    # every line a bullet
    (6, _GOPHER_SENT + "...\n", 60),        # every line ends in ellipsis
    (7, _GOPHER_SENT + " #\n", 60),         # 60 '#' > 0.1 * 540 words
)

_GOPHER_FLAG_ORDER = (
    "word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
    "bullet_lines_ok", "ellipsis_lines_ok", "alpha_words_ok",
    "stopwords_ok", "passes",
)


def _duck_sql_str(s: str) -> str:
    """A DuckDB string literal; newlines spliced in as chr(10) so the
    SQL text itself stays single-line."""
    return " || chr(10) || ".join(f"'{p}'" for p in s.split("\n"))


def _duck_gopher_case() -> str:
    whens = "\n".join(
        f"WHEN {arm} THEN repeat({_duck_sql_str(unit)}, {n})"
        for arm, unit, n in _GOPHER_ARMS
    )
    return f"CASE doc_id % 8\n{whens}\nELSE text END"


_DUCK_GOPHER_STOPS = ", ".join(f"'{w}'" for w in T.GOPHER_STOPWORDS)


@query(
    "doc_gopher_quality",
    oracle=f"""
        WITH src AS (
            SELECT doc_id, {{GCASE}} AS t FROM documents
        ),
        staged AS (
            SELECT doc_id, t,
                   list_filter(regexp_split_to_array(trim(t), '\\s+'),
                               x -> x <> '') AS toks,
                   list_filter(str_split(t, chr(10)),
                               x -> trim(x) <> '') AS lines
            FROM src
        ),
        m AS (
            SELECT doc_id,
                   len(toks) AS n_words,
                   COALESCE(list_aggregate(
                       list_transform(toks, x -> length(x)), 'sum'
                   ), 0) / GREATEST(len(toks), 1)::DOUBLE AS mean_len,
                   length(t) - length(replace(t, '#', ''))
                     + len(str_split_regex(t, '\\.\\.\\.|…')) - 1
                     AS n_symbols,
                   len(list_filter(lines,
                       x -> regexp_matches(trim(x), '^(•|\\*|-|‣)')))
                     / GREATEST(len(lines), 1)::DOUBLE AS bullet_frac,
                   len(list_filter(lines,
                       x -> regexp_matches(trim(x), '(\\.\\.\\.|…)$')))
                     / GREATEST(len(lines), 1)::DOUBLE AS ellipsis_frac,
                   len(list_filter(toks,
                       x -> regexp_matches(x, '[A-Za-z]')))
                     / GREATEST(len(toks), 1)::DOUBLE AS alpha_frac,
                   len(list_intersect([{{STOPS}}],
                       list_transform(toks, x -> lower(x)))) AS stop_hits
            FROM staged
        )
        SELECT doc_id,
               n_words BETWEEN 50 AND 100000 AS word_count_ok,
               mean_len BETWEEN 3.0 AND 10.0 AS mean_word_len_ok,
               n_symbols <= 0.1 * GREATEST(n_words, 1) AS symbol_ratio_ok,
               bullet_frac <= 0.9 AS bullet_lines_ok,
               ellipsis_frac <= 0.3 AS ellipsis_lines_ok,
               alpha_frac >= 0.8 AS alpha_words_ok,
               stop_hits >= 2 AS stopwords_ok,
               (n_words BETWEEN 50 AND 100000)
                 AND (mean_len BETWEEN 3.0 AND 10.0)
                 AND (n_symbols <= 0.1 * GREATEST(n_words, 1))
                 AND (bullet_frac <= 0.9)
                 AND (ellipsis_frac <= 0.3)
                 AND (alpha_frac >= 0.8)
                 AND (stop_hits >= 2) AS passes
        FROM m
    """.replace("{GCASE}", _duck_gopher_case())
       .replace("{STOPS}", _DUCK_GOPHER_STOPS),
    tags=("text", "extension", "gopher"),
)
def doc_gopher_quality(spark, sf_dir):
    """Gopher quality-rule battery (functions/text.py::
    gopher_quality_flags; Rae et al. 2021 §A1.1) as a driver-gated
    query: doc_id %% 8 routes each document through its own text or a
    fixture arm built to trip one specific rule, and the oracle replays
    the full rule arithmetic — token/line splitting, symbol counting,
    per-rule fractions, distinct-stopword hits — in DuckDB SQL
    (VERDICT r10 item 6: the rule arithmetic is exactly the kind of
    per-engine divergence the hash gate exists to pin)."""
    docs = load_table(spark, sf_dir, "documents")
    arm = F.col("doc_id") % 8
    qtext = F.col("text")
    for a, unit, n in _GOPHER_ARMS:
        qtext = F.when(arm == a, F.repeat(F.lit(unit), n)).otherwise(qtext)
    g = T.gopher_quality_flags(qtext)
    return docs.select("doc_id", g.alias("g")).select("doc_id", "g.*")
