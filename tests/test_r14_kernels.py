"""r14 optimization pins: the Arrow-vectorized _sq_dist twin must be
BIT-IDENTICAL to the HOF form (the ANN oracle gates hash double
distances, so 'close' is not enough), including the NULL/length-mismatch
semantics the HOF gets from zip_with padding."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _hof_reference(x, y):
    """Pure-python replay of zip_with+aggregate left fold semantics."""
    if x is None or y is None:
        return None
    n = max(len(x), len(y))
    acc = 0.0
    for i in range(n):
        xi = x[i] if i < len(x) else None
        yi = y[i] if i < len(y) else None
        if xi is None or yi is None:
            return None
        d = xi - yi
        acc = acc + d * d
    return acc


def test_sq_dist_batch_bit_identical_to_hof(spark):
    from crawl_streams_spark.operators.similarity import (
        _sq_dist,
        _sq_dist_arrow,
    )

    rows = [
        ([0.1, 0.2, 0.3], [0.3, 0.2, 0.1]),
        ([1e-300, -1e300, 0.5], [2e-300, 1e300, -0.5]),
        ([0.0] * 8, [0.0] * 8),
        ([-0.0, 5.5], [0.0, -5.5]),
        # values chosen so summation ORDER matters: a left fold and a
        # pairwise/numpy-sum differ in the last ulp on shapes like this
        ([1e16, 1.0, -1e16, 1.0], [0.0, 0.0, 0.0, 0.0]),
        ([((i * 7) % 16) * 0.03125 - 0.25 for i in range(64)],
         [((i * 13) % 16) * 0.03125 - 0.25 for i in range(64)]),
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    got = df.select(
        _sq_dist(F.col("a"), F.col("b")).alias("hof"),
        _sq_dist_arrow(F.col("a"), F.col("b")).alias("vec"),
    ).collect()
    for r in got:
        assert math.isclose(r["hof"], r["vec"], rel_tol=0.0, abs_tol=0.0), (
            r["hof"].hex(),
            r["vec"].hex(),
        )

    # left-fold order pin: the 1e16 row must NOT equal the numerically
    # 'better' pairwise sum if they differ — assert against the replay
    for r, (x, y) in zip(got, rows):
        ref = _hof_reference(x, y)
        assert r["vec"] == ref, (r["vec"], ref)


def test_sq_dist_batch_null_and_ragged_match_hof(spark):
    from crawl_streams_spark.operators.similarity import (
        _sq_dist,
        _sq_dist_arrow,
    )

    rows = [
        (None, [1.0, 2.0]),
        ([1.0, 2.0], None),
        ([1.0, 2.0, 3.0], [1.0, 2.0]),  # zip_with pads -> NULL result
        ([1.5, 2.5], [0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    got = df.select(
        _sq_dist(F.col("a"), F.col("b")).alias("hof"),
        _sq_dist_arrow(F.col("a"), F.col("b")).alias("vec"),
    ).collect()
    for r in got:
        assert (r["hof"] is None) == (r["vec"] is None)
        if r["hof"] is not None:
            assert r["hof"] == r["vec"]
