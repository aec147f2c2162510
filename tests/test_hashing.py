"""Hash-kernel conformance (SURVEY §5.3 item 3): murmur3-32 seed-0 against
published SMHasher vectors + property tests, Spark-vs-Python agreement for
the partition-key UDF, md5→int folding vs DuckDB."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl_streams_spark.functions.hashing import (
    _mmh3_32_numpy,
    make_mmh3_key_udf,
    md5_long,
    minhash_ab,
)

# Published murmur3_32 seed-0 test vectors (SMHasher / public references).
VECTORS = {
    b"": 0x00000000,
    b"test": 0xBA6BD213,
    b"Hello, world!": 0xC0363E43,
    b"The quick brown fox jumps over the lazy dog": 0x2E4FF723,
}


def test_mmh3_known_vectors():
    for data, want in VECTORS.items():
        assert _mmh3_32_numpy([data])[0] == want


@given(st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_mmh3_range_and_determinism(data):
    a = _mmh3_32_numpy([data])[0]
    b = _mmh3_32_numpy([data])[0]
    assert a == b
    assert 0 <= a < 2**32


def test_mmh3_udf_matches_reference_key_format(spark):
    """F-14: hexlify(pack('<I', mmh3.hash(netloc))) — enqueue.py:127."""
    from urllib.parse import urlparse

    uris = [
        "https://www.example.org/page",
        "http://data.webarchive.org.uk:8080/x",
        "https://twitter.com/ukwebarchive",
        "no-scheme.example.com/path",
    ]
    df = spark.createDataFrame([(u,) for u in uris], ["uri"])
    udf = make_mmh3_key_udf()
    got = {r["uri"]: r["k"] for r in df.select("uri", udf("uri").alias("k")).collect()}
    for u in uris:
        h = _mmh3_32_numpy([urlparse(u).netloc.encode()])[0]
        assert got[u] == h.to_bytes(4, "little").hex()


def test_md5_long_matches_duckdb(spark):
    values = ["", "a", "hello world", "日本語", "x" * 100]
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    got = {
        r["v"]: r["h"] for r in df.select("v", md5_long("v").alias("h")).collect()
    }
    con = duckdb.connect()
    for v in values:
        want = con.execute(
            "SELECT (('0x' || substr(md5('0:' || ?), 1, 15))::BIGINT)", [v]
        ).fetchone()[0]
        assert got[v] == want, v


def test_minhash_ab_bounds():
    for a, b in minhash_ab(64):
        assert 0 < a < 2**20 and 0 <= b < 2**20
        assert a % 2 == 1  # odd multipliers


def test_simhash_locality(spark):
    """Property: similar token sets → small Hamming distance, disjoint
    token sets → large."""
    from crawl_streams_spark.functions.hashing import hamming64, simhash64
    from crawl_streams_spark.functions.text import tokens

    rows = [
        ("a", "the quick brown fox jumps over the lazy dog " * 5),
        ("b", "the quick brown fox jumps over the lazy cat " * 5),
        ("c", "completely different vocabulary entirely unrelated words here " * 5),
    ]
    df = spark.createDataFrame(rows, ["k", "text"]).select(
        "k", simhash64(tokens(F.col("text"))).alias("sh")
    )
    fp = {r["k"]: r["sh"] for r in df.collect()}
    near = bin(fp["a"] ^ fp["b"]).count("1")
    far = bin(fp["a"] ^ fp["c"]).count("1")
    assert near < far
    assert near <= 20 and far >= 15
