"""Vector expressions over ``array<float>`` embedding columns.

Dot products / norms / cosine as higher-order built-ins (zip_with +
aggregate) — computed in DOUBLE, left-fold in array order, so results are
bit-reproducible and match a DuckDB oracle that folds in the same order.

On 100 TB these are narrow per-row maps. The quadratic part of similarity
search is handled in operators/similarity.py (broadcast the small query set;
LSH/IVF bucketing for the big-big case).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_double_array(v: Column | str) -> Column:
    return F.transform(_c(v), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i, double accumulation, array order (left fold)."""
    return F.aggregate(
        F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def sign_bucket(v: Column | str, planes: "list[list[float]]") -> Column:
    """Random-hyperplane LSH bucket id: one bit per plane = sign of v·plane.
    ``planes`` is a small list of unit vectors chosen deterministically by
    the caller (so the oracle can replicate). Bucket = Σ bit_j << j."""
    vd = to_double_array(v)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vd,
                    F.array([F.lit(float(x)) for x in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, val: acc + val,
            )
            >= 0,
            F.lit(1 << j).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for j, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
