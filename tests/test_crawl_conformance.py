"""Byte-level conformance against the reference's own 1,000-record sample
(`crawl_log_fragment.json`, read as DATA from the read-only checkout):
variant dispatch, host extraction vs urllib, report projections, Solr ETL,
host-stats aggregates recomputed in pure Python."""

from __future__ import annotations

import json
from collections import Counter
from urllib.parse import urlsplit

import pyspark.sql.functions as F
import pytest

from crawl_streams_spark.operators import host_stats as HS
from crawl_streams_spark.operators import report as R
from crawl_streams_spark.sources.jsonl import read_crawl_log

from .fixtures import crawl_log_path

pytestmark = pytest.mark.skipif(
    crawl_log_path() is None, reason="reference sample not available"
)


@pytest.fixture(scope="module")
def fragment(spark):
    return read_crawl_log(spark, crawl_log_path()).cache()


@pytest.fixture(scope="module")
def raw_records():
    with open(crawl_log_path()) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_variant_split(fragment, raw_records):
    """950 Heritrix / 50 WebRender in the sample (SURVEY §1.1), split by
    the thread discriminator (report.py:48-49)."""
    n_heritrix = fragment.filter("is_heritrix").count()
    n_webrender = fragment.filter("NOT is_heritrix").count()
    want_h = sum(1 for r in raw_records if "thread" in r)
    assert (n_heritrix, n_webrender) == (want_h, len(raw_records) - want_h)
    assert n_heritrix + n_webrender == 1000


def test_status_code_distribution(fragment, raw_records):
    """Negative Heritrix codes survive the IntegerType schema
    (FIXTURES.md: -5003×838 etc.)."""
    got = {
        r["status_code"]: r["n"]
        for r in fragment.groupBy("status_code").agg(F.count("*").alias("n")).collect()
    }
    want = Counter(r.get("status_code") for r in raw_records)
    assert got == dict(want)
    assert got.get(-5003, 0) > 0


def test_host_extraction_matches_urllib(fragment, raw_records):
    """F-1/F-2 vs the reference's urlsplit netloc (analysis.py:143-147) —
    equality required wherever netloc has no port/userinfo (the parse_url
    HOST divergence is ports only, SURVEY §2.4 F-1)."""
    got = {
        r["url"]: r["h"]
        for r in fragment.select("url", HS.C.host_of("url").alias("h")).collect()
    }
    checked = 0
    for rec in raw_records:
        url = rec.get("url")
        if not url or not url.startswith(("http://", "https://")):
            continue
        netloc = urlsplit(url).netloc
        if "@" in netloc or ":" in netloc:
            continue  # port/userinfo: documented divergence
        assert got[url] == netloc, url
        checked += 1
    assert checked > 900


def test_crawl_log_lines_format(fragment, raw_records):
    """P-3/P-4 — 13-field line projection with '-' null-swap
    (report.py:53-57) spot-checked against a hand-built line."""
    lines = {r["url"]: r["line"] for r in R.crawl_log_lines(fragment).collect()}
    heritrix = [r for r in raw_records if "thread" in r]
    sample = heritrix[0]
    line = lines[sample["url"]]
    parts = line.split(" ")
    assert parts[0] == sample["timestamp"]
    assert parts[1] == str(sample["status_code"])
    assert str(sample.get("size", "-") if sample.get("size") is not None else "-") == parts[2]
    assert sample["url"] in line
    # WebRender rows are excluded (P-2)
    assert len(lines) == len({r["url"] for r in heritrix})


def test_summarise_hosts_totals(fragment, raw_records):
    """A-7 per-hostname totals (report.py:154-161) vs a pure-Python rerun
    over http(s) rows."""
    got = {r["hostname"]: r["tot"] for r in R.summarise_hosts(fragment).collect()}
    want: Counter = Counter()
    for rec in raw_records:
        url = rec.get("url") or ""
        if url.startswith("http"):
            host = urlsplit(url).hostname
            want[host] += 1
    # compare over hostnames without ports (divergence exclusion as above)
    for host, n in want.items():
        assert got.get(host) == n, host


def test_solr_documents_projection(fragment, raw_records):
    """F-6..F-10 ETL (report.py:167-224): id format, renames, crawler
    classification, start_time split, annotation routing."""
    docs = {r["id"]: r for r in R.solr_documents(fragment).collect()}
    for rec in raw_records[:200]:
        d = docs[f"crawl-log:{rec['timestamp']}/{rec['url']}"]
        assert d["id"] == f"crawl-log:{rec['timestamp']}/{rec['url']}"
        assert d["log_timestamp"] == rec["timestamp"]
        assert d["crawler"] == ("Heritrix" if "thread" in rec else "WebRender")
        assert d["source"] == rec.get("seed")
        stpd = rec.get("start_time_plus_duration")
        if stpd and "+" in stpd:
            assert d["duration"] == int(stpd.split("+")[1])
            assert d["start_time"] is not None
        else:
            assert d["duration"] is None
        annots = [a for a in (rec.get("annotations") or "").split(",") if a]
        ips = [a[3:] for a in annots if a.startswith("ip:")]
        assert d["ip"] == (ips[0] if ips else None)


def test_solr_documents_schema_golden(fragment):
    """kevals/Solr schema fidelity (report.py:167-224): the exact field
    set the reference indexer emits, pinned name-by-name with types.
    Renamed sources (timestamp→log_timestamp, seed→source), split sources
    (start_time_plus_duration→start_time+duration), routed sources
    (annotations→ip/launch_timestamp/dol/annotations-rest) and dropped
    fields (extra_info, report.py:212; thread, consumed by the crawler
    classifier) must NOT leak through under their original names."""
    docs = R.solr_documents(fragment)
    schema = [(f.name, f.dataType.simpleString()) for f in docs.schema.fields]
    assert schema == [
        ("id", "string"),
        ("log_timestamp", "string"),
        ("url", "string"),
        ("status_code", "int"),
        ("content_length", "bigint"),
        ("source", "string"),
        ("crawler", "string"),
        ("content_type", "string"),
        ("start_time", "timestamp"),
        ("duration", "bigint"),
        ("ip", "string"),
        ("launch_timestamp", "timestamp"),
        ("dol", "string"),
        ("annotations", "string"),
        ("content_digest", "string"),
        ("warc_filename", "string"),
        ("warc_offset", "bigint"),
    ]
    for dropped in (
        "timestamp",
        "seed",
        "extra_info",
        "start_time_plus_duration",
        "thread",
        "mimetype",
    ):
        assert dropped not in docs.columns, dropped


def test_solr_documents_annotation_routing_parity(fragment, raw_records):
    """Full replica of the reference's annotation routing loop
    (report.py:182-201): ip:/launchTimestamp:/dol: extracted, empties
    dropped, remainder space-joined with spaces underscored — compared
    field-by-field over the whole sample."""
    import datetime as dt

    docs = {r["id"]: r for r in R.solr_documents(fragment).collect()}
    for rec in raw_records:
        d = docs[f"crawl-log:{rec['timestamp']}/{rec['url']}"]
        expect_ip = expect_lts = expect_dol = None
        rest = []
        for annot in (rec.get("annotations") or "").split(","):
            if annot.startswith("ip:"):
                expect_ip = annot[3:]
            elif annot.startswith("launchTimestamp:"):
                expect_lts = dt.datetime.strptime(
                    annot[16:], "%Y%m%d%H%M%S%f"
                )
            elif annot.startswith("dol:"):
                expect_dol = annot[4:]
            elif annot == "":
                pass
            else:
                rest.append(annot.replace(" ", "_"))
        assert d["ip"] == expect_ip, rec["annotations"]
        assert d["dol"] == expect_dol, rec["annotations"]
        assert d["launch_timestamp"] == expect_lts, rec["annotations"]
        # reference omits the field when empty; typed column uses ''
        assert (d["annotations"] or "") == " ".join(rest), rec["annotations"]


def test_host_stats_aggregates(fragment, raw_records):
    """A-1..A-5 recomputed in pure Python over the sample."""
    totals = {r["host"]: r for r in HS.host_totals(fragment).collect()}
    want_tot: Counter = Counter()
    first: dict = {}
    last: dict = {}
    for rec in raw_records:
        url = rec.get("url")
        if url and url.startswith("dns:"):
            host = url[4:]
        elif url and url.startswith(("http://", "https://")):
            netloc = urlsplit(url).netloc
            if "@" in netloc or ":" in netloc:
                continue
            host = urlsplit(url).hostname
        else:
            continue  # screenshot:/imagemap:/… parse_url gives null host
        ts = rec["timestamp"]
        want_tot[host] += 1
        first[host] = min(first.get(host, ts), ts)
        last[host] = max(last.get(host, ts), ts)
    for host, n in want_tot.items():
        assert totals[host]["total"] == n, host
        assert totals[host]["first_timestamp"] == first[host]
        assert totals[host]["last_timestamp"] == last[host]


def test_screenshots_ring(fragment, raw_records):
    """P-8/A-10 — screenshot prefix strip + latest-100 ordering
    (analysis.py:93-100, 161-164)."""
    shots = HS.screenshots(fragment).collect()
    raw_shots = [
        (r["url"][11:], r["timestamp"])
        for r in raw_records
        if (r.get("url") or "").startswith("screenshot:") and r["url"][11:]
    ]
    want = sorted(raw_shots, key=lambda t: (t[1], t[0]))
    want = sorted(want, key=lambda t: t[1], reverse=True)[:100]
    got = [(r["original_url"], r["timestamp"]) for r in shots]
    assert len(got) == min(len(raw_shots), 100)
    assert {g[0] for g in got} <= {w[0] for w in raw_shots}


def test_host_stats_snapshot_document(fragment):
    """SNK-3 snapshot shape (FIXTURES.md §4)."""
    snap = HS.host_stats_snapshot(fragment, max_hosts=10)
    assert set(snap) == {"last_timestamp", "status_codes", "screenshots", "hosts"}
    assert len(snap["hosts"]) <= 10
    some_host = next(iter(snap["hosts"].values()))
    assert set(some_host) == {"stats", "content_types", "status_codes", "via"}
    assert snap["status_codes"] == sorted(
        snap["status_codes"], key=lambda p: -p[1]
    )


def test_host_stats_snapshot_empty_host(fragment):
    """Regression: an empty-string host (host_of('dns:') == '') must use ONE
    key normalization across all four assembly loops — previously the
    top-hosts loop keyed it '' but the histogram loops keyed it 'null',
    raising KeyError."""
    import pyspark.sql.functions as F

    empties = fragment.limit(5).withColumn("url", F.lit("dns:"))
    snap = HS.host_stats_snapshot(
        fragment.limit(5).unionByName(empties), max_hosts=10
    )
    assert "" in snap["hosts"]
    # the empty host's histograms were populated, not lost under 'null'
    assert snap["hosts"][""]["status_codes"]
    assert snap["hosts"][""]["stats"]["total"] == 5


def test_jsonl_format_cli(capsys, spark):
    """-F jsonl round-trips records as JSON lines (the reference's raw
    re-emit format)."""
    from crawl_streams_spark.cli import main

    assert main(["report", "--input", crawl_log_path(), "-F", "jsonl", "-M", "5"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 5
    for line in lines:
        doc = json.loads(line)
        assert "url" in doc and "timestamp" in doc


def test_partitioned_parquet_sink(spark, fragment, tmp_path):
    """SCALING.md's scale sink: date-partitioned per-host parquet with
    partition pruning."""
    from crawl_streams_spark.operators.host_stats import write_host_stats_parquet

    out = str(tmp_path / "hs")
    write_host_stats_parquet(fragment, out)
    back = spark.read.parquet(out)
    assert {f.name for f in back.schema.fields} == {
        "event_date", "host", "total", "first_timestamp", "last_timestamp"
    }
    # one partition directory per distinct crawl date in the data
    import os as _os

    want_dates = {
        r["d"]
        for r in fragment.select(
            F.to_date(F.to_timestamp("timestamp")).cast("string").alias("d")
        )
        .distinct()
        .collect()
    }
    parts = {p for p in _os.listdir(out) if p.startswith("event_date=")}
    assert parts == {f"event_date={d}" for d in want_dates}
    # totals agree with the in-memory aggregation
    from crawl_streams_spark.operators import host_stats as HS2

    want = {r["host"]: r["total"] for r in HS2.host_totals(fragment).collect()}
    got = {r["host"]: r["total"] for r in back.collect()}
    assert got == want


def test_annotation_raw_equals_hof(spark, fragment):
    """The regex raw-string F-7 classifiers (annotation_*_raw, the codegen
    fast path used by the ETL/classification queries) agree with the
    array/HOF forms on every sample record plus hand-built edge cases."""
    from crawl_streams_spark.functions import crawl as C

    edge = spark.createDataFrame(
        [
            (None,),
            ("",),
            ("ip:",),
            ("ip:1.2.3.4",),
            ("a b,ip:1.2.3.4,launchTimestamp:20240101120000,dol:2,tail",),
            ("launchTimestamp:2024010112000055,x",),
            ("dolphin:3,xip:4,note:ip:9",),  # near-miss keys stay unclassified
            (",,a,,b,,",),
            ("one two three",),
            ("ip:9.9.9.9,ip:8.8.8.8",),  # first-match wins on both paths
        ],
        "annotations string",
    )
    sample = fragment.select("annotations")
    for df in (edge, sample):
        annots = C.annotations_array(F.col("annotations"))
        rows = (
            df.select(
                C.annotation_ip(annots).alias("ip_hof"),
                C.annotation_ip_raw(F.col("annotations")).alias("ip_raw"),
                C.annotation_launch_ts(annots).alias("lt_hof"),
                C.annotation_launch_ts_raw(F.col("annotations")).alias("lt_raw"),
                C.annotation_rest(annots).alias("rest_hof"),
                C.annotation_rest_raw(F.col("annotations")).alias("rest_raw"),
            )
            .collect()
        )
        for r in rows:
            assert r["ip_hof"] == r["ip_raw"], r
            assert r["lt_hof"] == r["lt_raw"], r
            assert r["rest_hof"] == r["rest_raw"], r
