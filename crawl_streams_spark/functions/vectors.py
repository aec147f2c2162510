"""Vector expressions over ``array<float>`` embedding columns.

Dot products / norms / cosine as higher-order built-ins (zip_with +
aggregate) — computed in DOUBLE, left-fold in array order, so results are
bit-reproducible and match a DuckDB oracle that folds in the same order.

Performance contract (measured, see plans/q_similarity.py): cast the float
array to double ONCE in a projection below the join (``to_double_array``),
and precompute per-vector norms there too — then the per-pair work is a
single ``dot_raw``. Unrolling the fold into 64 element_at terms was tried
and is ~2.5× SLOWER than the HOF (array element access cost dominates);
the HOF-with-cast-inside form pays the float→double transform per pair.

On 100 TB these are narrow per-row maps. The quadratic part of similarity
search is handled in operators/similarity.py (broadcast the small query
set; LSH/IVF bucketing for the big-big case).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_double_array(v: Column | str) -> Column:
    return F.transform(_c(v), lambda x: x.cast("double"))


def dot_raw(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i over two DOUBLE arrays (no casting — stage
    ``to_double_array`` into a column first). Left fold in array order."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i with inline float→double casts — convenience form for
    one-shot use; hot pair-loops should precast and use dot_raw."""
    return dot_raw(to_double_array(a), to_double_array(b))


def norm_raw(a: Column | str) -> Column:
    return F.sqrt(dot_raw(a, a))


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_from(d: Column, na: Column, nb: Column) -> Column:
    """Cosine from a precomputed dot + norms: d/(na*nb), 0.0 on zero norms.
    Keep the operand order (na*nb) — the DuckDB oracle multiplies in the
    same order, making results bit-identical."""
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is 0. Convenience form —
    hot loops should precompute norms below the join and use cosine_from."""
    return cosine_from(dot(a, b), norm(a), norm(b))


def sign_bucket(v: Column | str, planes: "list[list[float]]") -> Column:
    """Random-hyperplane LSH bucket id: one bit per plane = sign of v·plane.
    ``planes`` is a small list of unit vectors chosen deterministically by
    the caller (so the oracle can replicate). Bucket = Σ bit_j << j.
    Zero planes means one constant bucket (no split) — the lossless
    degenerate case srp_planes_for returns for corpora that fit a single
    verification bucket."""
    if not planes:
        return F.lit(0).cast("bigint")
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
