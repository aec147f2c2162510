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
