"""Property-based parser tests (SURVEY §5.3 item 3): annotation classifier
round trips, compact timestamp parse(format(x)) == x, host extraction vs
urllib over generated URLs."""

from __future__ import annotations

import datetime as dt
from urllib.parse import urlsplit

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl_streams_spark.functions import crawl as C

_host = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z][a-z0-9]{1,6}){1,3}", fullmatch=True)
_path = st.from_regex(r"(/[a-zA-Z0-9_.~-]{0,12}){0,4}", fullmatch=True)


@settings(max_examples=30, deadline=None)
@given(_host, _path, st.sampled_from(["http", "https"]))
def test_host_of_matches_urlsplit(spark, host, path, scheme):
    url = f"{scheme}://{host}{path}"
    got = (
        spark.range(1)
        .select(C.host_of(F.lit(url)).alias("h"))
        .collect()[0]["h"]
    )
    assert got == urlsplit(url).netloc


@settings(max_examples=30, deadline=None)
@given(
    st.datetimes(
        min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2035, 1, 1)
    ),
    st.integers(min_value=0, max_value=999),
)
def test_compact_ts_roundtrip(spark, base, millis):
    """compact_ts(format(ts)) == ts for the 17-digit millisecond form
    (report.py's start_time format)."""
    ts = base.replace(microsecond=millis * 1000)
    raw = ts.strftime("%Y%m%d%H%M%S") + f"{millis:03d}"
    got = (
        spark.range(1)
        .select(C.compact_ts(F.lit(raw)).alias("t"))
        .collect()[0]["t"]
    )
    assert got == ts


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.from_regex(r"[A-Za-z][A-Za-z0-9 ]{0,8}", fullmatch=True),
        min_size=0,
        max_size=5,
    ),
    st.from_regex(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", fullmatch=True),
    st.integers(min_value=0, max_value=9),
)
def test_annotation_classifier_routing(spark, rest, ip, dol):
    """F-7: ip:/dol: routed out; the remainder round-trips with
    spaces→underscores, order preserved, empties dropped."""
    annots = [f"ip:{ip}", f"dol:{dol}", ""] + rest
    packed = ",".join(annots)
    row = (
        spark.range(1)
        .select(C.annotations_array(F.lit(packed)).alias("a"))
        .select(
            C.annotation_ip(F.col("a")).alias("ip"),
            C.annotation_rest(F.col("a")).alias("rest"),
        )
        .collect()[0]
    )
    assert row["ip"] == ip
    want_rest = " ".join(a.replace(" ", "_") for a in rest if a)
    assert row["rest"] == want_rest


@settings(max_examples=20, deadline=None)
@given(
    st.datetimes(
        min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2035, 1, 1)
    ),
    st.integers(min_value=0, max_value=999),
    st.integers(min_value=0, max_value=10**7),
)
def test_start_time_plus_duration_roundtrip(spark, base, millis, dur):
    """F-6: parse(format(ts) + '+' + d) == (ts, d); no '+' → (null, null)
    (report.py:203-209 drops the field when unsplittable)."""
    ts = base.replace(microsecond=millis * 1000)
    raw = ts.strftime("%Y%m%d%H%M%S") + f"{millis:03d}"
    start, duration = C.split_start_time_plus_duration(F.lit(f"{raw}+{dur}"))
    no_start, no_dur = C.split_start_time_plus_duration(F.lit(raw))
    row = (
        spark.range(1)
        .select(
            start.alias("s"),
            duration.alias("d"),
            no_start.alias("ns"),
            no_dur.alias("nd"),
        )
        .collect()[0]
    )
    assert row["s"] == ts and row["d"] == dur
    assert row["ns"] is None and row["nd"] is None


@settings(max_examples=20, deadline=None)
@given(
    st.datetimes(
        min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2035, 1, 1)
    ),
    st.integers(min_value=0, max_value=999),
)
def test_wayback_timestamp_digits_only(spark, base, millis):
    """F-4: wayback form == all digits of the ISO string, 17 chars for the
    millisecond form (streamer.py:47)."""
    import re

    iso = base.replace(microsecond=millis * 1000).strftime(
        "%Y-%m-%dT%H:%M:%S"
    ) + f".{millis:03d}Z"
    got = (
        spark.range(1)
        .select(C.wayback_timestamp(F.lit(iso)).alias("w"))
        .collect()[0]["w"]
    )
    assert got == re.sub(r"\D", "", iso)
    assert len(got) == 17


@settings(max_examples=20, deadline=None)
@given(_host, _path, st.sampled_from(["http://", "https://", ""]))
def test_normalize_uri_scheme_and_idempotence(spark, host, path, scheme):
    """P-18: result always carries an http(s) scheme, schemed inputs pass
    through unchanged, and the op is idempotent (submit.py:43-44)."""
    uri = f"{scheme}{host}{path}"
    once = C.normalize_uri(F.lit(uri))
    twice = C.normalize_uri(once)
    row = spark.range(1).select(once.alias("a"), twice.alias("b")).collect()[0]
    if scheme:
        assert row["a"] == uri
    else:
        assert row["a"] == f"http://{uri}"
    assert row["b"] == row["a"]


@settings(max_examples=20, deadline=None)
@given(
    st.datetimes(
        min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2035, 1, 1)
    ).map(lambda d: d.replace(microsecond=0)),
    st.integers(min_value=-9999, max_value=99999),
    st.text(
        alphabet="abcdefghij:/._-", min_size=0, max_size=20
    ),
)
def test_schedule_launch_source_status_scalars(spark, ts, code, seed):
    """F-16 parse(format) round-trip, F-13 launch-ts formatting, F-15
    colon-safe source tag, F-12 status stringification incl. negative
    Heritrix codes, F-5 hop last-char defaults — one batched check."""
    sched = ts.strftime("%Y-%m-%d %H:%M:%S")
    row = (
        spark.range(1)
        .select(
            C.schedule_ts(F.lit(sched)).alias("sched"),
            C.schedule_ts(F.lit("not a date")).alias("bad"),
            C.launch_ts_format(F.lit(ts)).alias("launch"),
            C.source_tag(F.lit(7), F.lit(f"https://{seed}")).alias("tag"),
            C.status_str(F.lit(code)).alias("st"),
            C.status_str(F.lit(None).cast("int")).alias("st_null"),
            C.hop_last(F.lit("LLE")).alias("hop"),
            C.hop_last(F.lit("")).alias("hop_empty"),
            C.hop_last(F.lit(None).cast("string")).alias("hop_null"),
        )
        .collect()[0]
    )
    assert row["sched"] == ts
    assert row["bad"] is None
    assert row["launch"] == ts.strftime("%Y%m%d%H%M%S")
    assert row["tag"] == f"tid:7:https://{seed}"
    assert row["st"] == str(code)
    assert row["st_null"] == "-"
    assert row["hop"] == "E"
    assert row["hop_empty"] == "_"
    assert row["hop_null"] == "_"


@settings(max_examples=20, deadline=None)
@given(
    st.datetimes(
        min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2035, 1, 1)
    ).map(lambda d: d.replace(microsecond=0)),
    st.integers(min_value=0, max_value=99),
)
def test_annotation_launch_ts_both_widths(spark, ts, frac):
    """F-7: launchTimestamp annotations parse at both observed widths —
    14-digit seconds and 16-digit centiseconds (report.py:190-193 %f)."""
    a14 = f"launchTimestamp:{ts.strftime('%Y%m%d%H%M%S')}"
    a16 = f"launchTimestamp:{ts.strftime('%Y%m%d%H%M%S')}{frac:02d}"
    row = (
        spark.range(1)
        .select(
            C.annotation_launch_ts(F.array(F.lit(a14))).alias("t14"),
            C.annotation_launch_ts(F.array(F.lit(a16))).alias("t16"),
            C.annotation_launch_ts(F.array(F.lit("ip:1.2.3.4"))).alias("none"),
        )
        .collect()[0]
    )
    assert row["t14"] == ts
    assert row["t16"] == ts.replace(microsecond=frac * 10000)
    assert row["none"] is None


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "aa", "x y", ""]),
        min_size=1,
        max_size=30,
    )
)
def test_ngram_repetition_fold_matches_counter(spark, grams):
    """The sorted-run fold behind top_ngram_fraction / dup_ngram_fraction
    (functions/text.py) equals the Counter-based definition on arbitrary
    gram multisets, including all-duplicates and all-distinct extremes."""
    from collections import Counter

    from crawl_streams_spark.functions import text as T

    arr = F.array(*[F.lit(g) for g in grams])
    row = (
        spark.range(1)
        .select(
            T.top_ngram_fraction(arr).alias("top"),
            T.dup_ngram_fraction(arr).alias("dup"),
        )
        .collect()[0]
    )
    counts = Counter(grams)
    want_top = max(counts.values()) / len(grams)
    want_dup = sum(c for c in counts.values() if c > 1) / len(grams)
    assert abs(row["top"] - want_top) < 1e-9
    assert abs(row["dup"] - want_dup) < 1e-9


@settings(max_examples=20, deadline=None)
@given(
    _host,
    _path,
    st.sampled_from(["HTTP", "http", "HTTPS", "https"]),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(
        st.from_regex(r"[a-z]=[0-9]{1,3}", fullmatch=True), max_size=4
    ),
    st.sampled_from(["", "#frag", "#a#b"]),
)
def test_canonical_url_properties(spark, host, path, scheme, port, params, frag):
    """canonical_url: idempotent; result carries a lowercase scheme and
    authority, no fragment, no default port, sorted query params."""
    from urllib.parse import urlsplit

    q = "?" + "&".join(params) if params else ""
    url = f"{scheme}://{host.upper()}{port}{path}{q}{frag}"
    once, twice = C.canonical_url(F.lit(url)), None
    twice = C.canonical_url(once)
    row = spark.range(1).select(once.alias("a"), twice.alias("b")).collect()[0]
    a = row["a"]
    assert row["b"] == a, "not idempotent"
    assert "#" not in a
    parts = urlsplit(a)
    assert parts.scheme == scheme.lower()
    assert parts.netloc == parts.netloc.lower()
    default = {"http": ":80", "https": ":443"}[scheme.lower()]
    if port == default:
        assert ":" not in parts.netloc
    elif port:
        assert parts.netloc.endswith(port)
    if params:
        assert parts.query == "&".join(sorted(params))
    assert parts.path.startswith("/")
