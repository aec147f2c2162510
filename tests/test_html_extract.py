"""HTML -> text extraction (functions/text.py::html_to_text/html_title/
html_links): sanitizer-order edge cases the regex chain must get right."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl_streams_spark.functions import text as T


def _one(spark, html: str) -> dict:
    row = (
        spark.createDataFrame([(html,)], "html string")
        .select(
            T.html_to_text("html").alias("text"),
            T.html_title("html").alias("title"),
            T.html_links("html").alias("links"),
        )
        .collect()[0]
    )
    return row.asDict()


def test_script_style_bodies_with_tag_decoys(spark):
    r = _one(
        spark,
        '<title>T</title><style>p > a  </style><p>keep</p>'
        '<script>if (1 < 2) document.write("</p><p>inject");</script>',
    )
    assert r["text"] == "T keep"
    assert "inject" not in r["text"]


def test_entities_decode_in_order_amp_last(spark):
    # '&amp;lt;' must decode to the TEXT '&lt;', never to '<'
    r = _one(spark, "<p>a &amp;lt; b &lt;i&gt; &quot;q&quot; &#39;s&#39;</p>")
    assert r["text"] == "a &lt; b <i> \"q\" 's'"


def test_entity_table_matches_stdlib():
    """Every entity-table entry must decode to exactly what the
    stdlib's html.unescape produces — the guard against codepoint
    typos in the literal table. Sole deliberate divergence: the nbsp
    family maps to a PLAIN space (the text pipeline collapses
    whitespace anyway, and '\\xa0' would leak into tokenization)."""
    import html

    for ent, ch in T.HTML_ENTITIES:
        std = html.unescape(ent)
        if ent in ("&nbsp;", "&#160;", "&#xa0;"):
            assert std == "\xa0" and ch == " "
        else:
            assert std == ch, f"{ent!r}: table {ch!r} != stdlib {std!r}"
    # decode-order invariant: every ampersand-PRODUCING entity sits at
    # the tail, after every other entry (the no-double-decode contract)
    amp_idx = [i for i, (e, c) in enumerate(T.HTML_ENTITIES) if c == "&"]
    assert amp_idx == list(range(len(T.HTML_ENTITIES) - len(amp_idx),
                                 len(T.HTML_ENTITIES)))


def test_numeric_charrefs_decode(spark):
    """VERDICT r10 item 7: real crawl HTML is full of &#NNN;/&#xNN;
    refs. Decimal and lowercase-hex forms of the table's refs decode;
    &amp;#39; yields the literal text '&#39;' (ampersand class decodes
    last — no double decode); unknown refs pass through untouched."""
    r = _one(
        spark,
        "<p>It&#8217;s &#8220;fine&#8221; &#8211; A&#8212;B "
        "&#x27;q&#x27; &#34;d&#34; a&#160;b 100&#37; &amp;#39; "
        "&#60;i&#62; &#1606;</p>",
    )
    assert r["text"] == (
        "It’s “fine” – A—B 'q' \"d\" a b 100&#37; &#39; <i> &#1606;"
    )


def test_amp_class_never_double_decodes_itself(spark):
    """ADVICE r11: the ampersand class decodes in ONE pass, so
    '&amp;#38;' / '&amp;#x26;' yield the LITERAL text '&#38;' /
    '&#x26;' — exactly what html.unescape produces — instead of the
    sequential-chain bug's '&' (('&amp;','&') ran first and fabricated
    fresh '&#38;'/'&#x26;' matches for the later class entries)."""
    import html

    src = "&amp;#38; &amp;#x26; &amp;amp; &#38;x &#x26;y"
    r = _one(spark, f"<p>{src}</p>")
    assert r["text"] == "&#38; &#x26; &amp; &x &y"
    assert r["text"] == html.unescape(src)


def test_decoded_lt_never_fabricates_tags(spark):
    # tags strip BEFORE entities decode: '&lt;script&gt;' is text
    r = _one(spark, "<p>&lt;script&gt;x&lt;/script&gt;</p>")
    assert r["text"] == "<script>x</script>"


def test_title_missing_and_multiline(spark):
    assert _one(spark, "<p>no title</p>")["title"] == ""
    r = _one(spark, "<title>\n  Two\n  Lines &amp; Co\n</title>")
    assert r["title"] == "Two Lines & Co"


def test_links_document_order_and_absence(spark):
    r = _one(
        spark,
        '<a href="https://a.example/1">x</a><b></b>'
        '<A HREF="https://a.example/2">y</A>',
    )
    assert r["links"] == ["https://a.example/1", "https://a.example/2"]
    assert _one(spark, "<p>none</p>")["links"] == []


def test_comments_and_whitespace_collapse(spark):
    r = _one(spark, "a<!-- hidden <p>x</p> -->b\n\n   c\t d")
    assert r["text"] == "a b c d"


def test_block_tags_separate_words(spark):
    # adjacent block elements must not fuse 'one' and 'two'
    assert _one(spark, "<p>one</p><p>two</p>")["text"] == "one two"


# ------------------------------------------------------------- properties
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_soup = st.lists(
    st.sampled_from(
        list("abc <>/&;\"'=!-\n\t") + ["<p>", "</p>", "&amp;", "&lt;",
                                       "<script>", "</script>", "<!--",
                                       "-->", 'href="x"', "<title>"]
    ),
    min_size=0,
    max_size=40,
).map("".join)


@settings(max_examples=25, deadline=None)
@given(_soup)
def test_html_to_text_total_on_arbitrary_soup(spark, soup):
    """Totality: any byte soup — unbalanced tags, truncated comments,
    stray entities — extracts WITHOUT error, and the result is clean:
    no whitespace runs, no leading/trailing space, and a second pass
    through the chain never strips further text content (tag removal is
    what makes the chain non-idempotent only when the INPUT decoded
    into tag-shaped text — the sanitizer-order tests pin that case)."""
    row = (
        spark.createDataFrame([(soup,)], "html string")
        .select(
            T.html_to_text("html").alias("text"),
            T.html_title("html").alias("title"),
            T.html_links("html").alias("links"),
        )
        .collect()[0]
    )
    assert "  " not in row["text"]
    assert row["text"] == row["text"].strip()
    assert "\n" not in row["text"] and "\t" not in row["text"]
    assert isinstance(row["links"], list)
