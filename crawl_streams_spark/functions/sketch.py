"""Mergeable sketches as DataFrame aggregates: count-min (Cormode &
Muthukrishnan 2005) for approximate per-item frequencies, and Bloom
filters (Bloom 1970) for approximate membership — both over
streams/corpora too large for an exact groupBy, both with one-sided
error guarantees (CMS: estimate ≥ true count, overshoot ≤ εN w.p. 1−δ
for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉; Bloom: no false negatives).

Representation: a sketch IS a DataFrame ``(d, bucket, cnt)`` with at most
depth×width rows — small enough to broadcast, cheap to persist, and
mergeable by union + re-sum (the partial-aggregation property Spark's
map-side combine already exploits while building it). No driver-side
state, no UDFs: the bucket hash is the repo's cross-engine md5 kernel
(functions/hashing.py:33 discipline), so DuckDB replays the sketch
bit-for-bit under the driver's hash gate.

Scale (100 TB): building is one narrow map (explode ×depth of slim
(d, bucket) pairs) into a partial-agg'd groupBy whose key space is bounded
by depth×width (thousands), so the reduce side is trivially small no
matter the input row count — this is the sketch's whole point versus the
exact per-item groupBy whose key space is the (possibly billions-deep)
item domain. Point lookups broadcast the sketch.

Reference parity: the reference has no sketches (exact dict counting,
analysis.py); driver-mandated engine extension (SURVEY §2.5 aggregation
family, sketch tier alongside HLL approx_count_distinct).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = [
    "cms_bucket",
    "cms_build",
    "cms_merge",
    "cms_lookup",
    "cms_inner_product",
    "bloom_build",
    "bloom_probe",
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "kmv_hash",
    "kmv_table",
    "kmv_merge",
    "kmv_estimate",
    "mg_partition_summaries",
    "mg_summary",
    "mg_prune",
    "mrl_partition_summaries",
    "mrl_merge",
    "mrl_quantiles",
]


def cms_bucket(item: Column | str, depth_idx: Column, width: int) -> Column:
    """Row-level bucket index for hash row ``depth_idx``: the first 15 hex
    digits of md5(d || ':' || item) parsed base-16, mod width.

    DuckDB equivalent (oracle SQL):
        (('0x' || substr(md5(d || ':' || item), 1, 15))::BIGINT) % width
    (both sides non-negative, so % and pmod agree)."""
    c = F.col(item) if isinstance(item, str) else item
    tagged = F.concat(depth_idx.cast("string"), F.lit(":"), c.cast("string"))
    h = F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(width))


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Sketch a relation of items (one row per occurrence, or weighted
    rows): returns the ``(d, bucket, cnt)`` sketch table.

    The explode stages only (d, bucket[, weight]) — the item string never
    enters the ×depth blow-up or the shuffle."""
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    staged = items.select(
        d, F.col(item_col).alias("__item"), w.alias("__w")
    ).select(
        "d",
        cms_bucket("__item", F.col("d"), width).alias("bucket"),
        "__w",
    )
    return staged.groupBy("d", "bucket").agg(F.sum("__w").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches built with the same (depth, width): counts add."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int,
    width: int,
    estimate_col: str = "est_cnt",
) -> DataFrame:
    """Point-query the sketch for each row of ``queries``: the estimate is
    min over the depth hash rows of the addressed bucket counts. The
    sketch (≤ depth×width rows) broadcasts; queries never shuffle.

    An item whose buckets were never touched gets 0 (true count is 0 —
    empty buckets simply aren't materialized in the sparse sketch)."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    probes = queries.withColumn("d", d).withColumn(
        "bucket", cms_bucket(item_col, F.col("d"), width)
    )
    hit = probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
    group_cols = [c for c in queries.columns]
    return hit.groupBy(*group_cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias(
            estimate_col
        )
    )


def bloom_build(
    items: DataFrame,
    item_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom filter over an item relation, as the DataFrame of its SET bit
    positions (sparse: ≤ min(n·k, m) rows of one bigint). k md5 hash rows
    address one shared m-bit space (the ``cms_bucket`` kernel with the
    hash index as seed, so DuckDB replays it).

    Mergeable by union+distinct; broadcastable at any reasonable m (4 M
    bits ≈ 4 M rows worst case, far less once saturated — and a saturated
    bloom should be resized anyway). The 100 TB role: ship a small
    membership summary of side A to side B's executors and pre-filter
    A⋉B / A▷B joins to candidate rows only — no false negatives, so
    anti-join semantics survive (a 'maybe' just falls through to the
    exact join)."""
    j = F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("j")
    staged = items.select(j, F.col(item_col).alias("__item"))
    return staged.select(
        cms_bucket("__item", F.col("j"), m_bits).alias("pos")
    ).distinct()


def bloom_probe(
    bloom: DataFrame,
    queries: DataFrame,
    item_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
    flag_col: str = "maybe_present",
) -> DataFrame:
    """Membership probe: a query item is 'maybe present' iff ALL of its k
    bit positions are set (no false negatives; false positives at the
    classic (1-e^{-kn/m})^k rate). The bloom broadcasts; queries never
    shuffle (the groupBy re-collapses the ×k explode on the query key,
    partial-agg absorbed)."""
    j = F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("j")
    probes = queries.withColumn("j", j).withColumn(
        "pos", cms_bucket(item_col, F.col("j"), m_bits)
    )
    hit = probes.join(
        F.broadcast(bloom.withColumn("__set", F.lit(1))), ["pos"], "left"
    )
    return hit.groupBy(*queries.columns).agg(
        (
            F.count_distinct(F.when(F.col("__set").isNotNull(), F.col("pos")))
            == F.count_distinct(F.col("pos"))
        ).alias(flag_col)
    )


def hll_registers(
    items: DataFrame,
    item_col: str,
    p: int = 8,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007), deterministic and
    cross-engine-replayable: unlike engine-native HLL sketches (whose
    binary layouts differ), registers here derive from the md5 kernel, so
    Spark and DuckDB build IDENTICAL register tables and the estimate
    goes under the value gate — a distinct-count sketch with an oracle.

    h = 60-bit md5; register index = h mod m (m = 2^p); rho = run length
    of leading zeros + 1 of the remaining 60-p bits, computed EXACTLY via
    the binary-string length (no float log): rho = (60-p+1) - len(bin(w))
    for w > 0, else 60-p+1. Returns (group…, idx, rho) with rho the
    per-register max — mergeable by union + re-max.

    Scale: one partial-agg'd groupBy with key space ≤ groups × m; the raw
    item column never shuffles (same argument as cms_build)."""
    m = 1 << p
    maxrho = 60 - p + 1
    c = F.col(item_col).cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), c)), 1, 15), 16, 10
    ).cast("bigint")
    # integer div, not float division: doubles round above 2^53 and h is
    # a 60-bit value
    staged = items.select(*group_cols, h.alias("__h")).select(
        *group_cols,
        F.pmod(F.col("__h"), F.lit(m)).alias("idx"),
        F.expr(f"__h div {m}").alias("__w"),
    )
    rho = F.when(F.col("__w") == 0, F.lit(maxrho)).otherwise(
        F.lit(maxrho) - F.length(F.bin(F.col("__w")))
    )
    return (
        staged.withColumn("rho", rho.cast("int"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    *register_tables: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge register tables built with the same p: per-register max."""
    if not register_tables:
        raise ValueError("hll_merge needs at least one register table")
    out = register_tables[0]
    for r in register_tables[1:]:
        out = out.unionByName(r)
    return out.groupBy(*group_cols, "idx").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    p: int = 8,
    group_cols: tuple[str, ...] = (),
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Distinct-count estimate from a register table, with the standard
    small-range (linear counting) correction.

    The harmonic sum Σ 2^-M_j is computed as an INTEGER — Σ 2^(maxrho -
    M_j), absent registers contributing 2^maxrho — so it is shuffle-order
    insensitive and bit-identical across engines (a float sum of 2^-M
    terms would depend on reduction order). The only floats are one
    division and (in the small-range branch) one ln, rounded to 3
    decimals in the output."""
    m = 1 << p
    maxrho = 60 - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {maxrho} - rho)"))
        .cast("bigint")
        .alias("__ssum"),
    )
    scale = float(1 << maxrho)
    total = F.col("__ssum") + (F.lit(m) - F.col("__present")) * F.lit(
        1 << maxrho
    ).cast("bigint")
    raw = F.lit(alpha * m * m * scale) / total.cast("double")
    zeros = (F.lit(m) - F.col("__present")).cast("double")
    small = (F.col("__present") < m) & (raw <= F.lit(2.5 * m))
    est = F.when(small, F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)).otherwise(
        raw
    )
    return agg.select(
        *group_cols, F.round(est, 3).alias(estimate_col)
    )


# --- KMV / theta sketch --------------------------------------------------

#: Hash domain size: 60-bit md5 prefixes land uniformly in [0, 2^60).
_KMV_DOMAIN = float(1 << 60)


def kmv_hash(item: Column | str) -> Column:
    """60-bit md5 hash of an item under the 'kmv:' tag — the repo's
    cross-engine kernel (DuckDB: ``('0x'||substr(md5('kmv:'||item),1,15))
    ::BIGINT``), uniform on [0, 2^60)."""
    c = F.col(item) if isinstance(item, str) else item
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv:"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")


def kmv_table(
    items: DataFrame,
    item_col: str,
    k: int = 256,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """K-minimum-values sketch (Bar-Yossef et al. 2002; the theta-sketch
    core): per group, the ≤k SMALLEST distinct 60-bit hashes of the items,
    as rows (group…, hv). Selection of an order statistic is
    shuffle-order-insensitive, so — unlike engine-native theta sketches
    with incompatible binary layouts — a SQL oracle reproduces the sketch
    bit for bit.

    Mergeable: union two tables and re-take the k smallest
    (``kmv_merge``), which is how per-partition partials combine at scale;
    the distinct + top-k here is one partial-agg'd shuffle keyed by
    (group…, hv) and a per-group window over ≤ distinct-count rows.
    Compared to HLL the sketch is bigger (k × 8 bytes vs 2^p registers)
    but supports set intersection: the k-min set is a uniform sample of
    the union, so shared-hash fractions estimate Jaccard."""
    hv = kmv_hash(item_col).alias("hv")
    return _kmv_take(items.select(*group_cols, hv), k, group_cols)


def kmv_merge(
    *tables: DataFrame, k: int = 256, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge KMV tables built with the same hash: union, dedupe, re-take
    the k smallest per group. The union's sketch — exact, not an
    approximation of a sketch."""
    if not tables:
        raise ValueError("kmv_merge needs at least one table")
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return _kmv_take(out, k, group_cols)


def _kmv_take(
    hashed: DataFrame, k: int, group_cols: tuple[str, ...]
) -> DataFrame:
    """k smallest distinct hv per group of an already-hashed relation.

    Grouped: one distinct + per-group window — parallel by key. UNGROUPED
    (``group_cols=()``): a bare global window would funnel every distinct
    hash of the whole relation through one task (ADVICE r3 medium), so
    the relation is pre-reduced first — k smallest distinct hv per
    shuffle partition (a parallel per-partition window) — leaving
    ≤ num_partitions·k rows for the final single-task window. Any
    pre-partitioning is valid: the global k-min of per-partition k-mins
    is exact regardless of row placement, so the result stays
    deterministic and oracle-replayable."""
    dist = hashed.select(*group_cols, "hv").distinct()
    if not group_cols:
        wp = Window.partitionBy("__part").orderBy("hv")
        dist = (
            dist.withColumn("__part", F.spark_partition_id())
            .withColumn("__prn", F.row_number().over(wp))
            .filter(F.col("__prn") <= k)
            .drop("__part", "__prn")
        )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("hv")
    return (
        dist.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(
    table: DataFrame,
    k: int = 256,
    group_cols: tuple[str, ...] = (),
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Distinct-count estimate from a KMV table: with R = (kth smallest
    hash)/2^60, the unbiased estimator is (k−1)/R; when the group holds
    fewer than k distinct hashes the sketch IS the distinct set and the
    count is exact. One float division per group from integer inputs —
    deterministic, rounded to 3 decimals (the hll_estimate discipline)."""
    agg = table.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("hv").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1) * _KMV_DOMAIN) / F.col("kth_hash").cast("double")
    )
    return agg.select(
        *group_cols,
        "n_kept",
        "kth_hash",
        F.round(est, 3).alias(estimate_col),
    )


def cms_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """Join-size estimate from two count-min sketches built with the same
    (depth, width) over the two join columns: the equi-join cardinality
    |A ⋈ B| = Σ_v c_A(v)·c_B(v) is UPPER-bounded by, and estimated as,
    min over hash rows of Σ_bucket a_d·b_d (Cormode & Muthukrishnan's
    inner-product query). Returns one row (est_join_size) — BIGINT
    arithmetic end to end, so the estimate is exact-reproducible.

    The optimizer credential: estimate a join's output size from two
    KB-sized sketches without touching either table — the sketch analog
    of column-level NDV statistics, but correct under skew (a hot key's
    square shows up in the product)."""
    aa = a.select(F.col("d"), F.col("bucket"), F.col("cnt").alias("ca"))
    bb = b.select(F.col("d"), F.col("bucket"), F.col("cnt").alias("cb"))
    per_row = (
        aa.join(bb, ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    )
    # A depth row whose buckets never overlap has TRUE inner product 0 —
    # the tightest upper bound — but an inner join drops it, loosening
    # the min (and yielding NULL when NO buckets overlap). Re-seat the
    # estimate on the full depth domain of sketch ``a`` and coalesce
    # missing depths to 0, so disjoint sketches estimate 0, not NULL
    # (ADVICE r3).
    depths = a.select("d").distinct()
    # per_row is ≤ depth rows by construction; the hint matters when the
    # sketch side arrives as a checkpointed relation whose size statistics
    # are unknown (the planner would fall back to a sort-merge join of two
    # depth-sized relations — harmless at runtime once AQE converts it, but
    # the broadcast is the right static plan).
    full = depths.join(F.broadcast(per_row), "d", "left").select(
        F.coalesce(F.col("ip"), F.lit(0).cast("bigint")).alias("ip")
    )
    return full.agg(
        F.coalesce(F.min("ip"), F.lit(0).cast("bigint")).alias(
            "est_join_size"
        )
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (Misra & Gries 1982; merge analysis per
# Agarwal et al. 2013, "Mergeable Summaries").


def mg_partition_summaries(df: DataFrame, item: str = "item", k: int = 256) -> DataFrame:
    """One-pass per-partition Misra-Gries summaries via mapInPandas: each
    partition emits at most ``k`` counter rows (item, cnt, meta=false)
    plus ONE meta row (null, d_p, meta=true) carrying the partition's
    total decrement mass d_p. No shuffle; the whole point versus the
    exact per-item groupBy is that the reduce side sees ≤ (k+1)·P slim
    rows no matter the stream length — this is the frequency analog of
    the KMV/HLL distinct sketches above.

    The inner loop is NOT a per-row Python loop: each Arrow batch is
    counted exactly with pandas ``value_counts`` (C-speed), merged into
    the running counter dict, and pruned ONCE per batch by subtracting
    the (k+1)-th largest count m from every counter (dropping ≤ 0).
    Each prune removes ≥ (k+1)·m mass, and removed mass never exceeds
    the n_p items seen, so Σm = d_p ≤ n_p/(k+1) — the classic bound
    survives batching. Guarantee per partition, for every item x:
    true_p(x) − d_p ≤ est_p(x) ≤ true_p(x).

    Null items are NOT supported (the meta row uses the null slot) —
    filter them upstream; a null item raises here rather than corrupting
    the error accounting."""
    k = _check_sketch_param("Misra-Gries counter budget k", k, 1)
    return df.select(F.col(item).cast("string").alias("item")).mapInPandas(
        _mg_gen(k), schema="item string, cnt bigint, meta boolean"
    )


def _mg_gen(k: int):
    """The Misra-Gries mapInPandas generator, module-level (like
    ``_mrl_gen``) so property tests can drive it with plain pandas
    batches — the Spark stage and the tests exercise the identical
    code path."""

    def gen(batches):
        import pandas as pd

        counts: dict = {}
        err = 0
        for pdf in batches:
            if pdf["item"].isna().any():
                raise ValueError(
                    "mg_partition_summaries: null items unsupported — "
                    "filter upstream"
                )
            for it, c in pdf["item"].value_counts().items():
                counts[it] = counts.get(it, 0) + int(c)
            if len(counts) > k:
                m = sorted(counts.values(), reverse=True)[k]
                err += m
                counts = {
                    key: c - m for key, c in counts.items() if c - m > 0
                }
        rows = [(it, c, False) for it, c in counts.items()]
        rows.append((None, err, True))
        yield pd.DataFrame(rows, columns=["item", "cnt", "meta"])

    return gen


def mg_summary(df: DataFrame, item: str = "item", k: int = 256) -> DataFrame:
    """Merged Misra-Gries summary: (item, est, err_total) with the
    mergeable-summaries guarantee — for EVERY item x over the whole
    input, true(x) − err_total ≤ est(x) ≤ true(x) (absent items have
    est 0), where err_total = Σ_p d_p ≤ n/(k+1). Hence any item with
    true frequency above n/(k+1) is guaranteed present.

    Merge is a tiny groupBy over ≤ (k+1)·P summary rows; the scalar
    err_total rides along as a broadcast cross join so downstream
    bound checks stay row-parallel."""
    parts = mg_partition_summaries(df, item, k)
    ests = (
        parts.filter(~F.col("meta"))
        .groupBy("item")
        .agg(F.sum("cnt").alias("est"))
    )
    errs = parts.filter(F.col("meta")).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("err_total")
    )
    return ests.crossJoin(F.broadcast(errs))


def mg_prune(parts: DataFrame, k: int = 256) -> DataFrame:
    """Combine any number of ``(item, cnt, meta)`` Misra-Gries summaries
    into ONE summary in the same schema, pruned back to ≤ k counter rows
    plus a single meta row — the mergeable-summaries merge (Agarwal,
    Cormode, Huang, Phillips, Wei, Yi 2012): counts sum per item,
    decrement masses sum, then one prune subtracts the (k+1)-th largest
    combined count m from every counter (dropping ≤ 0) and adds m to the
    error mass. The guarantee survives merging: for every item,
    true − err_total ≤ est ≤ true with err_total ≤ n/(k+1) over the
    union of everything the inputs summarized — which is what makes a
    PERSISTENT heavy-hitters table maintainable one micro-batch at a
    time (streaming/sketches.py::stream_mg).

    Scale: the combined relation is ≤ (k+1)·(#summaries) slim rows; the
    (k+1)-th largest comes from a TakeOrderedAndProject over it (no
    data-sized global window), and the scalar rides a broadcast cross
    join."""
    k = _check_sketch_param("Misra-Gries counter budget k", k, 1)
    ests = (
        parts.filter(~F.col("meta"))
        .groupBy("item")
        .agg(F.sum("cnt").alias("cnt"))
    )
    err = parts.filter(F.col("meta")).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("__e")
    )
    top = ests.orderBy(F.desc("cnt"), F.asc("item")).limit(k + 1)
    m = top.agg(
        F.when(F.count(F.lit(1)) == k + 1, F.min("cnt"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("__m")
    )
    counters = (
        ests.crossJoin(F.broadcast(m))
        .select(
            "item",
            (F.col("cnt") - F.col("__m")).cast("bigint").alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
        .withColumn("meta", F.lit(False))
    )
    meta = err.crossJoin(F.broadcast(m)).select(
        F.lit(None).cast("string").alias("item"),
        (F.col("__e") + F.col("__m")).cast("bigint").alias("cnt"),
        F.lit(True).alias("meta"),
    )
    return counters.unionByName(meta)


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (Munro-Paterson / Manku-Rajagopalan-Lindsay
# style deterministic compactors; runtime-tracked error in the spirit of
# Karnin-Lang-Liberty 2016). Completes the sketch family: CMS for
# frequencies, HLL/KMV for distincts, Misra-Gries for heavy hitters,
# this for ranks/quantiles.


def _check_sketch_param(label: str, value, floor: int) -> int:
    """ADVICE r5 + code-review r6: validate integer sketch parameters on
    the driver (a degenerate value hangs or corrupts an executor).
    Accepts anything integral (numpy ints included, via __index__),
    rejects bools (True would silently mean 1)."""
    import operator

    if isinstance(value, bool):
        raise ValueError(f"{label} must be an int >= {floor}, got {value!r}")
    try:
        ivalue = operator.index(value)
    except TypeError:
        raise ValueError(
            f"{label} must be an int >= {floor}, got {value!r}"
        ) from None
    if ivalue < floor:
        raise ValueError(f"{label} must be an int >= {floor}, got {value!r}")
    return ivalue


def _check_mrl_c(c: int) -> int:
    """c <= 1 makes the compaction loop spin forever (a 1-element buffer
    can never shrink) — a caller typo must raise on the driver, not hang
    the executor."""
    return _check_sketch_param("MRL compactor size c", c, 2)


def _mrl_gen(c: int, weight_of_input):
    """Build the mapInPandas generator shared by the partition and merge
    stages: a hierarchy of buffers where level l holds items of weight
    2**l; a full buffer sorts, keeps alternate elements (parity flips
    per compaction — deterministic, no RNG), and promotes them one
    level up. Every compaction of level l shifts any value's cumulative
    weighted rank by at most 2**l, and that exact mass is accumulated
    into the emitted error row — the bound downstream checks is the
    ACTUAL run's error, not the worst case.

    ``weight_of_input``: None for raw-value streams (everything enters
    at level 0), or a column name carrying power-of-two weights from a
    prior stage (items re-enter at their own level — the tree-merge
    path that keeps the final summary bounded without a driver-side
    union)."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        buffers: dict = {}
        parity: dict = {}
        err = 0

        def compact(level: int) -> None:
            nonlocal err
            buf = np.sort(np.concatenate(buffers[level]))
            take = len(buf) - (len(buf) % 2)
            p = parity.get(level, 0)
            parity[level] = 1 - p
            kept = buf[p:take:2]
            leftover = buf[take:]
            buffers[level] = [leftover] if len(leftover) else []
            buffers.setdefault(level + 1, []).append(kept)
            err += 1 << level

        def add(level: int, vals) -> None:
            buffers.setdefault(level, []).append(
                np.asarray(vals, dtype=np.float64)
            )
            full = True
            while full:
                full = False
                for lvl in sorted(buffers):
                    if sum(len(a) for a in buffers[lvl]) >= c:
                        compact(lvl)
                        full = True
                        break

        for pdf in batches:
            if weight_of_input is None:
                add(0, pdf["value"].to_numpy(dtype=np.float64))
            else:
                if bool(pdf["meta"].any()):
                    err += int(pdf.loc[pdf["meta"], "weight"].sum())
                    pdf = pdf[~pdf["meta"]]
                for w, grp in pdf.groupby("weight"):
                    level = int(w).bit_length() - 1
                    if (1 << level) != int(w):
                        raise ValueError(
                            f"non-power-of-two summary weight {w}"
                        )
                    add(level, grp["value"].to_numpy(dtype=np.float64))

        rows = [
            (float(v), 1 << lvl, False)
            for lvl, bufs in buffers.items()
            for arr in bufs
            for v in arr
        ]
        rows.append((None, err, True))
        yield pd.DataFrame(rows, columns=["value", "weight", "meta"])

    return gen


_MRL_SCHEMA = "value double, weight bigint, meta boolean"


def mrl_partition_summaries(
    df: DataFrame, value: str = "value", c: int = 200
) -> DataFrame:
    """One-pass per-partition quantile summaries: ≤ c·log2(n_p/c) items
    plus one meta row carrying the partition's accumulated rank-error
    mass. No shuffle; null values are rejected (they have no rank)."""
    c = _check_mrl_c(c)
    src = df.select(F.col(value).cast("double").alias("value"))

    def guard(batches):
        import pandas as pd  # noqa: F401

        inner = _mrl_gen(c, None)

        def checked(it):
            for pdf in it:
                if pdf["value"].isna().any():
                    raise ValueError(
                        "mrl_partition_summaries: null values unsupported"
                        " — filter upstream"
                    )
                yield pdf

        yield from inner(checked(batches))

    return src.mapInPandas(guard, schema=_MRL_SCHEMA)


def mrl_merge(parts: DataFrame, c: int = 200) -> DataFrame:
    """Tree-merge the per-partition summaries into ONE bounded summary:
    items re-enter the compactor at their own weight level, so the
    output stays ≤ c·log2(n/c) rows no matter how many partitions fed
    it — the scale path that keeps the driver-side quantile lookup O(c
    log n), not O(P·c log n). Single-partition stage by construction
    (the input is already sketch-sized)."""
    c = _check_mrl_c(c)
    one = parts.repartition(1)
    return one.mapInPandas(_mrl_gen(c, "weight"), schema=_MRL_SCHEMA)


def mrl_quantiles(summary_rows, qs):
    """Driver-side estimator over a COLLECTED summary (bounded rows):
    returns (ests: {q: value}, err_total, n, w_max). For each q the
    estimate is the smallest summary value whose cumulative weight
    reaches ceil(q·n). Guarantee (checkable, and checked, in SQL): with
    B = err_total and t = ceil(q·n),
    count(x < est) ≤ t + B + w_max  and  count(x ≤ est) ≥ t − B."""
    items = sorted(
        (r["value"], r["weight"]) for r in summary_rows if not r["meta"]
    )
    err_total = sum(r["weight"] for r in summary_rows if r["meta"])
    n = sum(w for _, w in items)
    w_max = max((w for _, w in items), default=0)
    ests = {}
    import math

    for q in qs:
        t = max(1, int(math.ceil(q * n)))
        cum = 0
        est = items[-1][0] if items else None
        for v, w in items:
            cum += w
            if cum >= t:
                est = v
                break
        ests[q] = est
    return ests, err_total, n, w_max
