"""Gopher quality-rule battery (functions/text.py::gopher_quality_flags):
each rule fires on a purpose-built fixture and ONLY that rule; a normal
document passes everything. Thresholds are the published defaults."""

from __future__ import annotations

from crawl_streams_spark.functions import text as T

_GOOD = (
    "The quick brown fox jumps over the lazy dog and then continues "
    "to have quite a pleasant afternoon walking with friends through "
    "the meadow, talking about all of the things that happened during "
    "the long summer weeks and planning what to have for dinner later "
    "that evening when everyone would be hungry again after the walk."
)


def _flags(spark, text, **kw):
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(T.gopher_quality_flags("text", **kw).alias("g"))
        .collect()[0]["g"]
    )
    return row.asDict()


def test_normal_document_passes_all_rules(spark):
    g = _flags(spark, _GOOD)
    assert g["passes"] and all(g.values())


def test_each_rule_fires_alone(spark):
    # too short
    g = _flags(spark, "the words be few to of and that have with here")
    assert not g["word_count_ok"] and not g["passes"]
    assert g["stopwords_ok"]
    # mean word length too high (long pseudo-words, but alphabetic)
    long_words = " ".join(["extraordinarinessly"] * 60) + " the of"
    g = _flags(spark, long_words)
    assert not g["mean_word_len_ok"]
    assert g["word_count_ok"] and g["alpha_words_ok"]
    # symbol ratio: hashes everywhere
    hashy = _GOOD + " " + "# " * 30
    g = _flags(spark, hashy)
    assert not g["symbol_ratio_ok"]
    # bullet lines dominate
    bullets = "\n".join(f"• item {w}" for w in _GOOD.split())
    g = _flags(spark, bullets)
    assert not g["bullet_lines_ok"]
    # ellipsis endings dominate
    dots = "\n".join(f"line {w} ..." for w in _GOOD.split())
    g = _flags(spark, dots)
    assert not g["ellipsis_lines_ok"]
    # numeric soup: too few alphabetic words
    nums = _GOOD + " " + " ".join(str(n) for n in range(80))
    g = _flags(spark, nums)
    assert not g["alpha_words_ok"]
    # no stop words at all
    nostop = " ".join(["zebra", "quartz", "melon", "brick"] * 20)
    g = _flags(spark, nostop)
    assert not g["stopwords_ok"]


def test_thresholds_are_tunable(spark):
    g = _flags(spark, "short but fine when the bar drops", min_words=5,
               min_stopword_hits=1)
    assert g["word_count_ok"] and g["passes"]


def test_empty_and_whitespace_are_rejected_not_errors(spark):
    for t in ("", "   \n\t  "):
        g = _flags(spark, t)
        assert not g["passes"] and not g["word_count_ok"]
