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
