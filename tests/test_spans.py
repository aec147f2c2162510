"""Duplicated token-span detection: planted-fixture behavioral contracts
(operators/spans.py). The cross-engine value gate is plans/q_spans.py."""

from __future__ import annotations

from crawl_streams_spark.operators import spans as SP


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _spans(df, **kw):
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in SP.dup_spans(df, **kw).collect()
    }


def test_shared_run_marked_in_both_docs(spark):
    """An 8-token run shared by two docs yields one span per doc covering
    exactly the run (4 windows of n=5 gap-merge into one span)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = _docs(
        spark,
        [
            (1, f"one two {shared} three four"),
            (2, f"{shared} nine ten eleven twelve"),
        ],
    )
    got = _spans(df, n=5, min_docs=2)
    # doc 1: run starts at token 3, ends at token 10; doc 2: tokens 1-8
    assert got == {(1, 3, 10, 4), (2, 1, 8, 4)}


def test_within_doc_repetition_not_cross_doc(spark):
    """min_docs=2 counts DISTINCT docs — a gram repeated only inside one
    document is not a cross-doc duplicate."""
    df = _docs(
        spark,
        [
            (1, "a b c d e a b c d e"),
            (2, "p q r s t u v w x y"),
        ],
    )
    assert _spans(df, n=5, min_docs=2) == set()


def test_disjoint_runs_stay_separate_spans(spark):
    """Two shared runs separated by > n unique tokens gap-merge into two
    spans, not one."""
    run1 = "r1a r1b r1c r1d r1e"
    run2 = "r2a r2b r2c r2d r2e"
    df = _docs(
        spark,
        [
            (1, f"{run1} u1 u2 u3 u4 u5 u6 {run2}"),
            (2, f"{run1} z1 z2 z3 z4 z5 z6 {run2}"),
        ],
    )
    got = _spans(df, n=5, min_docs=2)
    assert got == {
        (1, 1, 5, 1),
        (1, 12, 16, 1),
        (2, 1, 5, 1),
        (2, 12, 16, 1),
    }


def test_hash_dial_equivalence(spark):
    """xxhash64 (production) and md5 (oracle) digests mark identical
    span sets."""
    df = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over a sleeping cat today"),
            (3, "completely different words with no overlap at all here"),
        ],
    )
    a = _spans(df, n=5, min_docs=2, hash_impl="xxhash64")
    b = _spans(df, n=5, min_docs=2, hash_impl="md5")
    assert a == b and a  # non-empty: docs 1/2 share a 6-token prefix run


def test_max_occurrences_caps_boilerplate(spark):
    """A gram present in MORE docs than max_occurrences is excluded from
    span marking (the boilerplate cap)."""
    boiler = "b1 b2 b3 b4 b5"
    rows = [(i, f"{boiler} unique{i}a unique{i}b") for i in range(1, 6)]
    rows.append((10, "x1 x2 x3 x4 x5 x6"))
    rows.append((11, "x1 x2 x3 x4 x5 x7"))
    df = _docs(spark, rows)
    uncapped = _spans(df, n=5, min_docs=2)
    capped = _spans(df, n=5, min_docs=2, max_occurrences=3)
    assert {d for d, *_ in uncapped} == {1, 2, 3, 4, 5, 10, 11}
    # boilerplate (5 docs) filtered; the 2-doc x-run survives
    assert {d for d, *_ in capped} == {10, 11}


def test_doc_stats_fraction_math(spark):
    """covered_tokens and the fraction follow exactly from the span set;
    clean docs report zeros."""
    shared = "s1 s2 s3 s4 s5 s6"
    df = _docs(
        spark,
        [
            (1, f"{shared} u1 u2 u3 u4"),  # 10 tokens, 6 covered
            (2, f"v1 v2 {shared} v3 v4"),  # 10 tokens, 6 covered
            (3, "c1 c2 c3 c4 c5 c6 c7 c8"),  # clean
        ],
    )
    rows = {
        r["doc_id"]: r
        for r in SP.dup_span_doc_stats(df, n=5, min_docs=2).collect()
    }
    assert rows[1]["covered_tokens"] == 6 and rows[1]["n_spans"] == 1
    assert rows[1]["dup_token_fraction"] == 0.6
    assert rows[2]["covered_tokens"] == 6
    assert rows[3]["n_spans"] == 0 and rows[3]["dup_token_fraction"] == 0.0
    assert rows[3]["covered_tokens"] == 0


def test_gram_string_never_crosses_an_exchange(spark, sf_dir):
    """The 100 TB contract: the raw n-gram string dies inside the window
    projection — every exchange in the span pipeline carries the digest
    (and narrow key/pos columns), never `gram`."""
    import contextlib
    import io

    from crawl_streams_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = SP.dup_spans(docs, n=5, min_docs=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    sections = buf.getvalue().split("\n\n")
    exchanges = [
        s
        for s in sections
        if s.lstrip().startswith("(")
        and (") Exchange" in s.splitlines()[0] or ") BroadcastExchange" in s.splitlines()[0])
    ]
    assert exchanges, "expected shuffle/broadcast exchanges in the span plan"
    for s in exchanges:
        assert "gram#" not in s, f"raw gram string crossed an exchange:\n{s}"


# ---- span excision -----------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_excise_cuts_exact_token_range(spark):
    docs = _docs(spark, [(1, "a b c d e f g h")])
    spans = spark.createDataFrame(
        [(1, 3, 5)], "doc_id bigint, span_start bigint, span_end bigint"
    )
    got = SP.excise_spans(docs, spans).collect()[0]
    assert got["n_tokens"] == 8
    assert got["kept_tokens"] == 5
    assert got["clean_text"] == "a b f g h"


def test_excise_multiple_disjoint_spans(spark):
    docs = _docs(spark, [(1, "a b c d e f g h i j")])
    spans = spark.createDataFrame(
        [(1, 1, 2), (1, 9, 10)],
        "doc_id bigint, span_start bigint, span_end bigint",
    )
    got = SP.excise_spans(docs, spans).collect()[0]
    assert got["clean_text"] == "c d e f g h"


def test_excise_no_spans_keeps_everything(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "x y")])
    spans = spark.createDataFrame(
        [], "doc_id bigint, span_start bigint, span_end bigint"
    )
    got = {r["doc_id"]: r for r in SP.excise_spans(docs, spans).collect()}
    assert got[1]["clean_text"] == "a b c" and got[1]["kept_tokens"] == 3
    assert got[2]["clean_text"] == "x y"


def test_excise_full_document_leaves_empty_string(spark):
    docs = _docs(spark, [(1, "a b c")])
    spans = spark.createDataFrame(
        [(1, 1, 3)], "doc_id bigint, span_start bigint, span_end bigint"
    )
    got = SP.excise_spans(docs, spans).collect()[0]
    assert got["kept_tokens"] == 0 and got["clean_text"] == ""


def test_excise_end_to_end_removes_shared_window(spark):
    """Two docs sharing one 5-token run: after excision with n=5 the
    shared run is gone from both, unique prefixes/suffixes survive."""
    shared = "q w e r t"
    docs = _docs(
        spark,
        [(1, f"one two {shared} three"), (2, f"alpha {shared} beta gamma")],
    )
    spans = SP.dup_spans(docs, n=5, min_docs=2, hash_impl="md5")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in SP.excise_spans(docs, spans).collect()
    }
    assert got[1] == "one two three"
    assert got[2] == "alpha beta gamma"
