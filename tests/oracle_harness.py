"""Local replica of the driver's Spark-vs-DuckDB correctness comparison.

For each registered query: run the Spark builder and the oracle SQL on the
same sf dir, canonicalize both results (sort columns by name, stringify
values, sort rows), and diff. Used by tests/test_oracle_parity.py and by
`python -m tests.oracle_harness [sf_dir]` for a quick full-suite report.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math
import os

import duckdb

from crawl_streams_spark.tables import TABLE_NAMES


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(round(v, 9))
    if isinstance(v, _dec.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare_query(spark, con, q, sf_dir: str, max_diff_shown: int = 5):
    """Returns (ok, message)."""
    sdf = q.build(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)

    res = con.execute(q.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"

    _, s_canon = _canon_rows(s_cols, s_rows)
    _, d_canon = _canon_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            f"  spark={a}\n  duck ={b}"
            for a, b in zip(s_canon, d_canon)
            if a != b
        ][:max_diff_shown]
        n_diff = sum(1 for a, b in zip(s_canon, d_canon) if a != b)
        return False, f"{n_diff}/{len(s_canon)} rows differ:\n" + "\n".join(diffs)
    return True, f"OK ({len(s_rows)} rows)"


def main(sf_dir: str = "/root/testdata/sf0.001"):
    from crawl_streams_spark.plans import REGISTRY
    from crawl_streams_spark.session import get_spark

    spark = get_spark("oracle-harness", master="local[8]", shuffle_partitions=8)
    con = duckdb_connection(sf_dir)
    n_ok = 0
    for name, q in REGISTRY.items():
        if q.oracle is None:
            print(f"SKIP  {name} (rows-only)")
            continue
        try:
            ok, msg = compare_query(spark, con, q, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(e).__name__}: {str(e)[:400]}"
        print(("PASS " if ok else "FAIL ") + f" {name}: {msg}")
        n_ok += ok
    print(f"\n{n_ok} passed")


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
