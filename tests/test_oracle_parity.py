"""Replicates the driver's t2 correctness gate locally: every registered
query's Spark result must hash-match its DuckDB oracle at SF 0.001."""

from __future__ import annotations

import pytest

from crawl_streams_spark.plans import REGISTRY

from .oracle_harness import compare_query, duckdb_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, duck, sf_dir, name):
    q = REGISTRY[name]
    if q.oracle is None:
        df = q.build(spark, sf_dir)
        assert df.count() >= 0  # rows-only check
        return
    ok, msg = compare_query(spark, duck, q, sf_dir)
    assert ok, f"{name}: {msg}"


def test_every_query_has_nonempty_result_at_sf001(spark, duck, sf_dir):
    """Guard against vacuous correctness: at sf0.001 every query should
    produce rows (empty results make the oracle check trivially true).
    dedup_ngram_jaccard is allowed to be sparse but not the rest."""
    sparse_ok = {"dedup_ngram_jaccard"}
    for name, q in REGISTRY.items():
        if name in sparse_ok:
            continue
        n = q.build(spark, sf_dir).count()
        assert n > 0, f"{name} returned 0 rows at {sf_dir}"
