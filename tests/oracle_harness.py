"""Local replica of the driver's Spark-vs-DuckDB correctness comparison.

For each registered query: run the Spark builder and the oracle SQL on the
same sf dir, canonicalize both results (sort columns by name, stringify
values, sort rows), and diff. Used by tests/test_oracle_parity.py and by
`python -m tests.oracle_harness [sf_dir] [name,name,...]` for a quick
full-suite (or targeted-subset) report.
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


_SPARK_CANON = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
}

_DUCK_CANON = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
    "HUGEINT": "i128", "DOUBLE": "f64", "FLOAT": "f32", "VARCHAR": "str",
    "BOOLEAN": "bool", "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "DATE": "date",
}


def _canon_type(name: str, table: dict) -> str:
    if name.lower().startswith("decimal"):
        return "decimal"
    return table.get(name, name)


def compare_query(spark, con, q, sf_dir: str, max_diff_shown: int = 5):
    """Returns (ok, message). Checks column names, canonicalized column
    TYPES (an int32-vs-int64 or HUGEINT drift would change a value-hash
    taken over raw buffers), row counts, and order-insensitive values."""
    sdf = q.build(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)
    s_types = {c: _canon_type(t, _SPARK_CANON) for c, t in sdf.dtypes}
    # Deterministically release any lazy query-path localCheckpoint pins
    # (graph/fuzzy/sketch/interval plans) now that the result is
    # collected — a long-lived multi-query session otherwise accumulates
    # executor storage blocks until driver GC notices (ADVICE r13).
    from crawl_streams_spark.operators.iterate import unpin

    unpin(sdf)

    rel = con.sql(q.oracle)
    d_cols = list(rel.columns)
    d_types = {
        c: _canon_type(str(t), _DUCK_CANON) for c, t in zip(rel.columns, rel.types)
    }
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    type_diffs = {
        c: (s_types[c], d_types[c]) for c in s_cols if s_types[c] != d_types[c]
    }
    if type_diffs:
        return False, f"type mismatch: {type_diffs}"
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


def main(sf_dir: str = "/root/testdata/sf0.001", only: set[str] | None = None):
    from crawl_streams_spark.plans import REGISTRY
    from crawl_streams_spark.session import get_spark

    spark = get_spark("oracle-harness", master="local[8]", shuffle_partitions=8)
    con = duckdb_connection(sf_dir)
    n_ok = 0
    for name, q in REGISTRY.items():
        if only is not None and name not in only:
            continue
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

    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None,
    )
