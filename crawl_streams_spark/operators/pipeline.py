"""Training-data pipeline operators: deterministic corpus splitting,
stratified sampling, and fixed-budget sequence packing.

No counterpart in the reference (extension family per SURVEY.md §7.6 /
BASELINE.json north_star). Every decision bottoms out in md5 of a salted
record id, so:

- assignments are **stable under growth** — a document keeps its split /
  sample decision when the corpus is re-processed with more data (hash of
  the id, not of row position or an RNG stream);
- the DuckDB oracle reproduces every decision bit-for-bit (md5 is identical
  in both engines; thresholds compare two lowercase hex chars, which sort
  numerically).

Scale notes (100 TB):
- split/sample are stateless narrow maps — zero shuffle, trivially
  parallel, and pushed filters stay above the parquet scan;
- packing needs a running token sum, i.e. an ordered window. A single
  global ordering would serialize the corpus through one partition, so
  packs are scoped to a shard key (``source`` here) by design: one shuffle
  on the shard key, parallel across shards, and pack ids are reproducible
  because the intra-shard order (``doc_id``) is total.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, Window

__all__ = [
    "hash_bucket",
    "hex_threshold",
    "split_assign",
    "leakage_safe_split",
    "stratified_keep",
    "cap_source_share",
    "take_token_budget",
    "pack_id",
    "sample_priority",
    "weighted_sample",
    "global_rank",
    "partitioned_cumsum",
    "balanced_shards",
    "equi_depth_bins",
    "rank_normalize",
    "dsir_importance_weights",
    "dsir_select",
    "chunk_documents",
    "temperature_mix",
]

_BUCKETS = 256  # two hex chars of md5


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hash_bucket(id_col: Column | str, salt: str) -> Column:
    """First two hex chars of md5("<salt>:<id>") — 256 uniform buckets.

    Different salts give independent bucketings, so the train/test split
    and the sampling decision of the same document are uncorrelated.
    """
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"), _c(id_col).cast("string"))), 1, 2
    )


def hex_threshold(frac: float) -> str:
    """Bucket-space threshold for a keep-fraction: a bucket is kept iff
    ``bucket < hex_threshold(frac)``. Lowercase hex sorts numerically, and
    'g' > 'ff' covers frac >= 1.0 exactly."""
    n = round(max(0.0, frac) * _BUCKETS)
    return "g" if n >= _BUCKETS else format(n, "02x")


def split_assign(
    id_col: Column | str,
    train: float = 0.9,
    val: float = 0.05,
    salt: str = "split",
) -> Column:
    """Deterministic train/val/test assignment ('test' gets the rest)."""
    b = hash_bucket(id_col, salt)
    return (
        F.when(b < F.lit(hex_threshold(train)), F.lit("train"))
        .when(b < F.lit(hex_threshold(train + val)), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def hash_uniform(id_col: Column | str, salt: str) -> Column:
    """Deterministic md5-derived uniform in [0, 1): the first 60 bits of
    md5("<salt>:<id>") over 2^60 — the same replayable-uniform recipe
    sample_priority uses, exposed for rate comparisons finer than the
    256-bucket hash_bucket quantization. Cross-engine: DuckDB computes
    the identical double from the identical hex digits."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), _c(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return h.cast("double") / F.lit(1152921504606846976.0)


def cap_source_share(
    df: DataFrame,
    weight_col: str,
    max_share: float,
    source_col: str = "source",
    key: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Cap any single source's share of the corpus WEIGHT (tokens, chars,
    bytes) at ``max_share`` by deterministic downsampling — the domain-
    capping pass every large-scale training mix runs so one boilerplate-
    heavy domain cannot dominate the data.

    Per-source keep rate = min(1, max_share · total_weight / source
    weight); a document survives iff its salted hash-uniform < its
    source's rate, so the EXPECTED kept share of every over-cap source is
    exactly ``max_share`` of the corpus total, under-cap sources pass
    through whole, and the decision is stable under reprocessing,
    partitioning, and corpus growth (hash of the id, never position or
    RNG state).

    Scale: one partial-aggregated shuffle for the per-source totals
    (rows ∝ #sources), a rate join, and a stateless narrow filter. The
    grand total rides a broadcast 1-row relation (bounded — hint
    policy); the rate relation carries NO hint: at web-domain
    cardinality (~10⁸ sources) it outgrows any broadcast, and AQE's
    dynamic selection broadcasts it while genuinely small, falling back
    to a source-keyed shuffle join with skew-split at domain scale.
    There is no per-source ordering, so a hot domain costs the same per
    row as a cold one (the exact greedy form — keep in hash order until
    the budget fills — needs a per-source cumsum whose hot-source window
    is the very bottleneck this pass exists to remove)."""
    totals = df.groupBy(source_col).agg(
        F.sum(_c(weight_col)).alias("__src_w")
    )
    grand = totals.agg(F.sum("__src_w").alias("__tot_w"))
    rates = totals.crossJoin(F.broadcast(grand)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(float(max_share))
            * F.col("__tot_w").cast("double")
            / F.col("__src_w").cast("double"),
        ).alias("__rate"),
    )
    return (
        df.join(rates, source_col)
        .filter(hash_uniform(key, salt) < F.col("__rate"))
        .drop("__rate")
    )


def take_token_budget(
    df: DataFrame,
    order_cols: list,
    token_col: str,
    budget: int,
    num_partitions: int = 32,
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Best-first data selection under a token budget: order the corpus
    by ``order_cols`` (quality descending, id tiebreak — a TOTAL order)
    and keep rows while the INCLUSIVE running token total stays within
    ``budget`` — "take the best N tokens", the selection step of every
    budgeted training run.

    Built on partitioned_cumsum, so the global running total never
    funnels the relation through a single-partition window: sort-
    contiguous buckets, per-bucket offsets (a ≤ num_partitions-row
    window), one intra-bucket keyed window. Integer token counts make
    the cut exact and oracle-replayable. Adds ``cum_col``."""
    cum = partitioned_cumsum(
        df, order_cols, [token_col], num_partitions, prefix="__tb_"
    )
    return cum.filter(F.col(f"__tb_{token_col}") <= budget).withColumnRenamed(
        f"__tb_{token_col}", cum_col
    )


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    key: str = "doc_id",
    train: float = 0.9,
    val: float = 0.05,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment keyed by the DUPLICATE-CLUSTER
    representative, not the document id: every member of a (near-)
    duplicate cluster lands in the SAME split, closing the eval-leakage
    hole a per-document split leaves open — a near-copy of a test
    document sitting in train inflates every benchmark it touches.

    ``clusters`` is (key, cluster) from ``dedup.cluster_duplicates``
    (LSH pairs → connected components; the exact-dup digest groups work
    too — any assignment where duplicates share a label). Documents
    absent from ``clusters`` are singletons and hash on their own key,
    so the operator degrades to ``split_assign`` exactly when there is
    no duplication. Deterministic and stable under corpus growth (hash
    of the cluster label, never position); the fractions hold over
    CLUSTERS, so heavy duplication skews realized per-document fractions
    toward its clusters' splits — that is the point, not a bug.

    Scale: one left join on the key (clusters ∝ duplicated docs only,
    usually a small fraction of the corpus) plus the stateless hash map.
    Returns ``df`` + ``split_col``."""
    lbl = clusters.select(
        F.col(clusters.columns[0]).alias(key)
        if clusters.columns[0] != key
        else F.col(key),
        F.col("cluster").alias("__lss_cluster"),
    )
    joined = df.join(lbl, key, "left")
    rep = F.coalesce(F.col("__lss_cluster"), _c(key))
    return joined.withColumn(
        split_col, split_assign(rep, train, val, salt)
    ).drop("__lss_cluster")


def stratified_keep(
    id_col: Column | str,
    stratum_col: Column | str,
    rates: dict[str, float],
    default: float = 0.0,
    salt: str = "sample",
) -> Column:
    """Boolean keep-decision with a per-stratum sampling rate (language
    rebalancing, source capping). Unlisted strata get ``default``."""
    b = hash_bucket(id_col, salt)
    thr: Column | None = None
    for stratum, rate in sorted(rates.items()):
        cond = _c(stratum_col) == stratum
        lit = F.lit(hex_threshold(rate))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr_col = (
        thr.otherwise(F.lit(hex_threshold(default)))
        if thr is not None
        else F.lit(hex_threshold(default))
    )
    return b < thr_col


def pack_id(
    token_count_col: Column | str,
    budget: int,
    partition_by: list[str],
    order_by: list[str],
) -> Column:
    """Contiguous sequence-packing id: documents are laid out in the given
    intra-shard order and a new pack starts whenever the running token
    total crosses a multiple of ``budget`` (a boundary-spanning document
    belongs to the pack it started in). floor over exact integer-valued
    doubles, so both engines agree bit-for-bit."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = _c(token_count_col)
    cum = F.sum(tok).over(w)
    return F.floor((cum - tok) / F.lit(float(budget))).cast("bigint")


def curate(
    docs,
    rates: dict[str, float],
    default_rate: float = 0.1,
    quality_min: float = 0.5,
    train: float = 0.9,
    val: float = 0.05,
    max_top_2gram: float | None = None,
    max_dup_3gram: float | None = None,
):
    """Materializable curation pipeline: the corpus_curation_funnel's
    decisions as columns on the surviving documents — quality gate,
    language gate, fingerprint dedup (keep lowest doc_id), stratified
    sample, split assignment. Returns the curated DataFrame (original
    columns + plang/quality/split) ready for a split-partitioned
    clustered write.

    Same shapes as the funnel: one narrow scoring pass, one fingerprint
    shuffle for the dedup window, stateless hash decisions everywhere
    else."""
    from pyspark.sql import Window as _W

    from ..functions import text as T

    scored = docs.select(
        "*",
        T.quality_score("text").alias("quality"),
        T.lang_id("text").alias("plang"),
        T.fingerprint("text").alias("fp"),
        stratified_keep("doc_id", "lang", rates, default=default_rate).alias(
            "_keep"
        ),
        split_assign("doc_id", train, val).alias("split"),
    )
    surviving = scored.filter(
        (F.col("quality") >= quality_min) & (F.col("plang") != "und")
    )
    # optional repetition gates (boilerplate / looping-text filters);
    # None = off, keeping the funnel oracle's decisions unchanged. Gram
    # arrays are staged through named columns (ROUNDLOG lesson 1/8).
    if max_top_2gram is not None or max_dup_3gram is not None:
        staged = surviving.withColumn("_toks", T.tokens("text"))
        if max_top_2gram is not None:
            staged = staged.withColumn(
                "_g2", T.ngrams_from_tokens(F.col("_toks"), 2)
            ).filter(T.top_ngram_fraction(F.col("_g2")) <= max_top_2gram)
        if max_dup_3gram is not None:
            staged = staged.withColumn(
                "_g3", T.ngrams_from_tokens(F.col("_toks"), 3)
            ).filter(T.dup_ngram_fraction(F.col("_g3")) <= max_dup_3gram)
        surviving = staged.drop("_toks", "_g2", "_g3")
    deduped = (
        surviving.withColumn(
            "_rn", F.row_number().over(_W.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("_rn") == 1)
        .filter(F.col("_keep"))
    )
    return deduped.drop("_rn", "_keep", "fp")


def shuffled_shards(
    df,
    id_col: str,
    n_shards: int,
    salt: str = "shuffle",
):
    """Deterministic global shuffle + sharding for training export: every
    row gets a shard (uniform, salted-md5 of the id) and rows within a
    shard are ordered by a second hash — a reproducible pseudo-random
    permutation with no RNG state and no global sort. Re-running over a
    grown corpus preserves the relative order of surviving rows.

    Returns (shard, shard_pos)-annotated DataFrame; write with
    ``.repartition("shard").sortWithinPartitions("shard", "shard_pos")``
    partitioned by shard — one writer per shard, no global ordering
    bottleneck (same argument as pack_id)."""
    order_hex = F.md5(
        F.concat(F.lit(salt + "-pos:"), _c(id_col).cast("string"))
    )
    shard = (
        F.conv(F.substring(order_hex, 1, 8), 16, 10).cast("bigint")
        % n_shards
    ).cast("int")
    return df.withColumn("shard", shard).withColumn(
        "shard_pos", F.substring(order_hex, 9, 16)
    )


def write_shuffled_shards(
    df,
    path: str,
    id_col: str,
    n_shards: int,
    salt: str = "shuffle",
) -> None:
    """Materialize the shuffled export: one directory per shard, rows in
    shuffled order inside each file."""
    out = shuffled_shards(df, id_col, n_shards, salt)
    (
        out.repartition("shard")
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def sample_priority(
    id_col: Column | str, weight_col: Column | str, salt: str
) -> Column:
    """Efraimidis–Spirakis sampling priority ln(u)/w (monotone transform
    of the classic u^(1/w); Efraimidis & Spirakis 2006, "Weighted random
    sampling with a reservoir"): the k rows with the LARGEST priority form
    a weighted sample without replacement, inclusion probability
    proportional to weight.

    u is a deterministic md5-derived uniform in (0, 1] — hash of the
    salted id, not an RNG stream — so the sample is stable under
    reprocessing and partitioning, and the DuckDB oracle replays it:

        ln(((('0x' || substr(md5('<salt>:' || id), 1, 15))::BIGINT + 1)
             / 1152921504606846976.0)) / w
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), _c(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(1152921504606846976.0)
    return F.log(u) / _c(weight_col).cast("double")


def weighted_sample(
    df,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
):
    """Deterministic weighted sample WITHOUT replacement of k rows
    (A-Res): keep the top-k rows by sampling priority. Rows with null or
    non-positive weight are excluded (ln(u)/w needs w > 0).

    Scale: the top-k plans as TakeOrderedAndProject — per-partition heaps
    then a k-row merge at the driver side of the exchange, never a global
    sort; the priority itself is a narrow stateless map. This is the
    100 TB replacement for RAND()-ordered sampling (non-reproducible) and
    for df.sample (unweighted)."""
    pri = sample_priority(id_col, weight_col, salt)
    return (
        df.filter(_c(weight_col).isNotNull() & (_c(weight_col) > 0))
        .orderBy(pri.desc(), _c(id_col).asc())
        .limit(k)
    )


def _norm_order(order_cols: list) -> list:
    """Normalize an order spec into [(Column, ascending)]. Elements are a
    column name / Column (ascending) or a ``(col, "desc"|"asc")`` tuple —
    explicit direction tuples instead of pre-built sort expressions,
    because the boundary sampler below needs the bare column AND its
    direction, which a SortOrder Column no longer exposes."""
    spec = []
    for item in order_cols:
        if isinstance(item, tuple):
            col, direction = item
            asc = str(direction).lower() != "desc"
        else:
            col, asc = item, True
        spec.append((_c(col), asc))
    return spec


def _order_buckets(
    df, spec: list, num_partitions: int, bounds: list | None
):
    """Attach the sort-contiguous deterministic bucket column ``__gb``:
    sample ≤ num_partitions−1 quantile boundaries of the leading order
    column once (unless ``bounds`` is supplied), embed them as an array
    literal, and count boundaries passed — a pure row function, so every
    re-evaluation agrees (no checkpoint), rows with equal leading keys
    share a bucket, and buckets are contiguous in sort order. The shared
    core of ``global_rank`` and ``partitioned_cumsum``."""
    first, first_asc = spec[0]
    # NULL maps to -inf in BOTH directions: Spark's asc() is NULLS FIRST
    # (NULL = minimal element, -inf passes no `v > b` boundary -> bucket
    # 0, the front) and desc() is NULLS LAST (NULL is again the minimal
    # element, -inf passes every `v < b` boundary -> the LAST bucket).
    # Coalescing to +inf for desc put NULLs in bucket 0 while the
    # within-bucket desc window sorted them last, breaking the total
    # order (ADVICE r4).
    v = F.coalesce(first.cast("double"), F.lit(float("-inf")))
    if bounds is None:
        probs = [i / num_partitions for i in range(1, num_partitions)]
        bounds = (
            df.select(v.alias("__gr_v")).approxQuantile("__gr_v", probs, 0.01)
            if probs
            else []
        )
    bounds = sorted({b for b in bounds if b == b})  # drop NaN, dedupe
    part = df.withColumn("__gr_v", v)
    vcol = F.col("__gr_v")
    if not bounds:  # empty input or constant leading key: one bucket
        part = part.withColumn("__gb", F.lit(0))
    elif len(bounds) <= 256:
        # STATIC sum of per-boundary predicates, not an F.aggregate HOF
        # over an array literal: higher-order functions evaluate
        # interpreted (outside whole-stage codegen) per row — measured
        # 7× slower than this codegen'd chain on the same data. The
        # boundaries are driver-side floats, so the chain is free to
        # build.
        terms = [
            F.when((vcol > b) if first_asc else (vcol < b), 1).otherwise(0)
            for b in bounds
        ]
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        part = part.withColumn("__gb", acc)
    else:
        # very wide bucket counts: a thousands-term chain risks the JVM
        # method-size limit (codegen would fall back to interpreting the
        # WHOLE projection); the HOF form stays interpreted per row but
        # bounded, and at that scale the shuffle dominates anyway
        part = part.withColumn(
            "__gb",
            F.aggregate(
                F.lit(bounds),
                F.lit(0),
                lambda acc, b: acc
                + F.when(
                    (vcol > b) if first_asc else (vcol < b), 1
                ).otherwise(0),
            ),
        )
    return part.drop("__gr_v")


def global_rank(
    df,
    order_cols: list,
    rank_col: str = "rank",
    num_partitions: int = 32,
    pin: str = "boundaries",
    bounds: list | None = None,
):
    """1-based dense global row rank under a TOTAL order, computed
    WITHOUT a single-partition window (the scalable zipWithIndex
    pattern) and WITHOUT materializing the relation.

    ``pin="boundaries"`` (default): sample ≤ num_partitions−1 quantile
    boundaries of the leading order column ONCE (approxQuantile, one
    pass over a single projected column — the same sampling pass
    repartitionByRange hides inside itself), embed them as an array
    LITERAL, and derive each row's bucket as a pure function of its
    leading key (count of boundaries passed). Rows with equal leading
    keys always share a bucket, and buckets are contiguous in sort
    order, so rank = broadcast cumulative bucket offset + row_number
    within the bucket. Because the bucket is deterministic per row, the
    two consumers (bucket counts and the rank window) agree under ANY
    re-evaluation — no checkpoint needed, lineage-based recovery is
    preserved, and nothing is pinned into executor storage (the VERDICT
    r3 durability finding against the eager localCheckpoint form). The
    only single-task step is the offsets window over ≤ num_partitions
    aggregated rows.

    ``pin="checkpoint"``: the round-3 form — range-repartition then
    eagerly localCheckpoint to freeze the sampled boundaries (kept as a
    fallback for non-numeric leading keys, where quantile boundaries
    can't be computed and every row degenerates into one bucket).

    ``order_cols`` must be a total order (include a unique tie-break
    column; see ``_norm_order`` for the element forms) — the rank is
    then deterministic for ANY boundary placement, which is what lets a
    SQL oracle replay it with a plain row_number. Approximate quantiles
    only affect bucket BALANCE, never values; heavy ties on the leading
    key concentrate in one bucket exactly as they would in one range
    partition.

    ``bounds``: optional precomputed quantile boundaries of the leading
    key (as doubles) — callers ranking several metrics of the same
    relation can fetch all boundary sets in ONE multi-column
    approxQuantile pass and skip the per-rank sampling job."""
    spec = _norm_order(order_cols)
    sort_exprs = [c.asc() if asc else c.desc() for c, asc in spec]
    if pin == "checkpoint":
        part = df.repartitionByRange(num_partitions, *sort_exprs)
        part = part.sortWithinPartitions(*sort_exprs).withColumn(
            "__gb", F.spark_partition_id()
        )
        # freeze the sampled range boundaries: the relation is consumed
        # twice and repartitionByRange re-samples per evaluation
        # (ROUNDLOG round-3 lesson 6)
        part = part.localCheckpoint(eager=True)
    else:
        part = _order_buckets(df, spec, num_partitions, bounds)
    counts = part.groupBy("__gb").agg(F.count(F.lit(1)).alias("__n"))
    w_off = (
        Window.orderBy("__gb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__gb",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset"),
    )
    w_in = Window.partitionBy("__gb").orderBy(*sort_exprs)
    return (
        part.join(F.broadcast(offsets), "__gb")
        .withColumn(
            rank_col,
            (F.col("__offset") + F.row_number().over(w_in)).cast("bigint"),
        )
        .drop("__gb", "__offset")
    )


def partitioned_cumsum(
    df,
    order_cols: list,
    value_cols: list,
    num_partitions: int = 32,
    prefix: str = "cum_",
):
    """Globally-ordered INCLUSIVE running totals of one or more columns
    under a TOTAL order, without a single-partition window — the
    ``global_rank`` pattern generalized from counting rows to summing
    values (rank is the cumsum of 1s): deterministic sort-contiguous
    buckets (``_order_buckets``), per-bucket totals cumulated into
    exclusive offsets (a tiny ≤ num_partitions-row window), broadcast
    back, plus an intra-bucket running sum from ONE keyed window shared
    by every value column. The primitive behind exact ECDFs,
    Kolmogorov–Smirnov statistics, Lorenz curves, and cumulative-share
    reports at 100 TB — all of which would otherwise funnel the relation
    through one task.

    Adds ``<prefix><col>`` per value column; same total-order contract
    and oracle-replayability argument as ``global_rank``."""
    spec = _norm_order(order_cols)
    sort_exprs = [c.asc() if asc else c.desc() for c, asc in spec]
    part = _order_buckets(df, spec, num_partitions, None)
    totals = part.groupBy("__gb").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in value_cols]
    )
    w_off = Window.orderBy("__gb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__gb",
        *[
            F.coalesce(F.sum(f"__t_{c}").over(w_off), F.lit(0)).alias(
                f"__o_{c}"
            )
            for c in value_cols
        ],
    )
    w_in = (
        Window.partitionBy("__gb")
        .orderBy(*sort_exprs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = part.join(F.broadcast(offsets), "__gb")
    for c in value_cols:
        out = out.withColumn(
            f"{prefix}{c}", F.col(f"__o_{c}") + F.sum(c).over(w_in)
        )
    return out.drop("__gb", *[f"__o_{c}" for c in value_cols])


def balanced_shards(
    df,
    weight_col: str,
    tiebreak_col: str,
    n_shards: int,
    shard_col: str = "shard",
):
    """Weight-balanced shard assignment (the sorted round-robin / LPT
    heuristic): rows ranked by (weight DESC, tiebreak) and dealt
    shard = (rank−1) mod n_shards — consecutive heavy rows land on
    DIFFERENT shards, so per-shard weight totals differ by at most one
    row's weight per dealing round. The balance a training export needs
    (equal work per reader) that hash sharding (``shuffled_shards``,
    uniform in COUNT but not in weight) can't give when row weights are
    heavy-tailed.

    Built on ``global_rank`` — no single-partition sort; deterministic
    because (weight, tiebreak) is total."""
    ranked = global_rank(
        df,
        [(weight_col, "desc"), tiebreak_col],
        rank_col="__grank",
    )
    return ranked.withColumn(
        shard_col, ((F.col("__grank") - 1) % n_shards).cast("int")
    ).drop("__grank")


def equi_depth_bins(
    df,
    value_col: str,
    tiebreak_col: str,
    n_bins: int,
    bin_col: str = "bin",
    bounds: list | None = None,
):
    """Equi-depth (equal-frequency) binning: rows ranked by
    (value, tiebreak) and assigned bin = (rank−1)·n_bins div N — bin
    populations differ by at most one row, whatever the value
    distribution (the quantile-bucketing feature-engineering primitive;
    equal-WIDTH binning collapses under heavy tails).

    Built on ``global_rank`` (range repartition + broadcast offsets), so
    no single-partition sort; the scalar row count rides a broadcast
    single-row cross join. Deterministic because (value, tiebreak) is
    total — the same integer formula replays in a SQL oracle over a
    plain row_number."""
    ranked = global_rank(
        df,
        [value_col, tiebreak_col],
        rank_col="__grank",
        bounds=bounds,
    )
    n_rows = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(n_rows))
        .withColumn(
            bin_col,
            F.expr(f"(__grank - 1) * {n_bins} div __n").cast("int"),
        )
        .drop("__grank", "__n")
    )


def rank_normalize(
    df,
    value_col: str,
    tiebreak_col: str,
    out_col: str = "qnorm",
):
    """Quantile (rank) normalization: each value maps to its empirical
    quantile (rank−1)/(N−1) ∈ [0, 1] under the (value, tiebreak) total
    order — the rank transform feature pipelines use to force a uniform
    marginal regardless of the input distribution (robust to outliers
    where min-max scaling saturates). Single-row corpora map to 0.0.

    Built on ``global_rank`` (no single-partition sort); one float
    division per row from integer rank and count, rounded to 6 — exact
    under a plain row_number SQL oracle."""
    ranked = global_rank(
        df,
        [value_col, tiebreak_col],
        rank_col="__qr",
    )
    n_rows = df.agg(F.count(F.lit(1)).alias("__n"))
    q = F.when(
        F.col("__n") > 1,
        F.round(
            (F.col("__qr") - 1).cast("double") / (F.col("__n") - 1), 6
        ),
    ).otherwise(F.lit(0.0))
    return (
        ranked.crossJoin(F.broadcast(n_rows))
        .withColumn(out_col, q)
        .withColumnRenamed("__qr", "rank")
        .drop("__n")
    )


def dsir_importance_weights(
    df: "DataFrame",
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_buckets: int | None = None,
    ngram: int = 1,
    hasher: str = "spark",
) -> "DataFrame":
    """Per-document importance weights for Data Selection via Importance
    Resampling (DSIR, Xie et al. 2023, arXiv:2302.03169): fit add-1
    unigram bag models over a TARGET subset (``is_target`` predicate,
    e.g. a trusted high-quality slice) and the RAW corpus, then score
    every document by the log importance ratio

        log w(x) = Σ_f c_f(x) · [ln p_target(f) − ln p_raw(f)]

    Returns (id_col, n_feats, logw_micro): the per-feature log-ratio is
    quantized to integer MICRO-NATS — floor(λ·10⁶ + 0.5) — so the
    per-document sums are BIGINT-exact and order-independent (the
    perplexity gate's float discipline; a raw double Σ would diverge
    between engines on fold order).

    ``hash_buckets``: None keeps exact token features (vocab-sized λ
    relation, unhinted joins — Heaps-law growth forbids a broadcast
    hint; AQE judges at runtime). An integer hashes features into that
    many buckets — the published DSIR formulation and the 100 TB shape:
    the λ relation becomes a BOUNDED broadcastable table and the
    per-doc join is map-side.

    ``ngram``: 1 (unigram bags) or 2 — the paper's fidelity claim rests
    on HASHED BIGRAMS (arXiv:2302.03169 §3: hashed n-gram features),
    built as consecutive space-joined token pairs.

    ``hasher`` (only with ``hash_buckets``): ``"spark"`` buckets with
    the native murmur ``F.hash`` — the production path, cheapest, but
    engine-specific; ``"md5"`` buckets through the cross-engine-stable
    md5→60-bit-int idiom (functions/hashing.py::shingle_hashes31 /
    plans/q_dedup.py::_duck_hash60), so a DuckDB oracle replays the
    bucketed model bit-for-bit — the same production-vs-oracle hash
    split as the MinHash family (operators/dedup.py::_hash_fns).

    Scale: two partial-agg shuffles for the count tables (feature-keyed,
    combiner-friendly), one feature join + one id-keyed rollup for the
    scores. Nothing quadratic; the corpus text never shuffles (only
    exploded (id, feat) slim rows)."""
    from ..functions import text as T

    if ngram not in (1, 2):
        raise ValueError(f"ngram must be 1 or 2, got {ngram}")
    # tokens as a NAMED column: the bigram transform references the
    # array once per element, and an inline tokenize subtree would be
    # re-evaluated each time (the shingle_hashes31 lesson)
    base = df.select(
        _c(id_col).alias("__id"),
        is_target.alias("__tgt"),
        T.tokens(text_col).alias("__toks"),
    )
    if ngram == 1:
        feat_arr = F.col("__toks")
    else:
        # consecutive space-joined token pairs; < 2 tokens → no features
        feat_arr = F.when(
            F.size("__toks") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("__toks"), i),
                    F.element_at(F.col("__toks"), i + 1),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    if hasher == "spark":
        def bucket(c):
            return F.pmod(F.hash(c), F.lit(hash_buckets))
    elif hasher == "md5":
        def bucket(c):
            return F.pmod(
                F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast(
                    "bigint"
                ),
                F.lit(hash_buckets),
            )
    else:
        raise ValueError(f"unknown hasher {hasher!r} (spark|md5)")

    tok = base.select(
        "__id", "__tgt", F.explode(feat_arr).alias("feat")
    )
    rcnt = tok.groupBy("feat").agg(
        F.count(F.lit(1)).alias("rc"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("tc"),
    )
    if hash_buckets is not None:
        tok = tok.withColumn("feat", bucket(F.col("feat")))
        rcnt = (
            rcnt.withColumn("feat", bucket(F.col("feat")))
            .groupBy("feat")
            .agg(F.sum("rc").alias("rc"), F.sum("tc").alias("tc"))
        )
    tot = rcnt.agg(
        F.sum("rc").alias("rtot"),
        F.sum("tc").alias("ttot"),
        F.count(F.lit(1)).alias("v"),
    )
    lam = rcnt.crossJoin(F.broadcast(tot)).select(
        "feat",
        F.floor(
            (
                F.log((F.col("tc") + 1).cast("double"))
                - F.log((F.col("rc") + 1).cast("double"))
                + F.log((F.col("rtot") + F.col("v")).cast("double"))
                - F.log((F.col("ttot") + F.col("v")).cast("double"))
            )
            * 1000000.0
            + 0.5
        )
        .cast("bigint")
        .alias("lam_micro"),
    )
    joined = tok.join(
        F.broadcast(lam) if hash_buckets is not None else lam, "feat"
    )
    return (
        joined.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lam_micro").alias("logw_micro"),
        )
        .select(F.col("__id").alias(id_col), "n_feats", "logw_micro")
    )


def dsir_select(
    df: "DataFrame",
    is_target: Column,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_buckets: int | None = None,
    ngram: int = 1,
    hasher: str = "spark",
) -> "DataFrame":
    """Deterministic DSIR selection: the ``n`` raw documents with the
    highest importance weights (ties on the id). The published method
    Gumbel-samples ∝ w to preserve diversity; the deterministic top-n is
    the temperature→0 limit and the form a reproducibility-first
    pipeline wants — swap in ``sample_priority`` over
    ``logw_micro/1e6 + gumbel(hash_uniform)`` for the sampled variant.

    Scale: the weight join is id-keyed; the top-n plans as
    TakeOrderedAndProject (per-partition partial top-n, no global
    window)."""
    w = dsir_importance_weights(
        df, is_target, text_col=text_col, id_col=id_col,
        hash_buckets=hash_buckets, ngram=ngram, hasher=hasher,
    )
    return (
        df.join(w, id_col)
        .orderBy(F.desc("logw_micro"), F.asc(id_col))
        .limit(n)
    )


def chunk_documents(
    df: "DataFrame",
    chunk_size: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Split documents into overlapping token-window chunks — the
    context-chunking pass an embedding/retrieval pipeline runs before
    vectorizing. Chunk k covers tokens [k·stride, k·stride + chunk_size)
    with stride = chunk_size − overlap; the last chunk may be short;
    token-less documents produce no chunks. Returns
    (id_col, chunk_idx, chunk_start, n_chunk_tokens, chunk_text).

    Pure built-ins: tokenize → sequence/explode over the chunk count →
    array slice → join. One narrow explode (fan-out ≈ n_tokens/stride
    per doc), no shuffle at all — chunking is embarrassingly parallel
    and the text never leaves its partition."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    from ..functions import text as T

    stride = chunk_size - overlap
    toks = df.select(
        _c(id_col).alias(id_col), T.tokens(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    # number of chunks: ceil(max(n - overlap, 0) / stride), 0 when n == 0
    n_chunks = F.when(F.col("__n") <= 0, F.lit(0)).otherwise(
        F.greatest(
            F.lit(1),
            F.ceil((F.col("__n") - F.lit(overlap)) / F.lit(stride)).cast(
                "int"
            ),
        )
    )
    out = (
        toks.withColumn("__k", n_chunks)
        .filter(F.col("__k") > 0)
        .select(
            id_col,
            "__toks",
            F.explode(F.sequence(F.lit(0), F.col("__k") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx") * stride).alias("chunk_start"),
            F.slice(
                "__toks", F.col("chunk_idx") * stride + 1, chunk_size
            ).alias("__chunk"),
        )
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.size("__chunk").cast("bigint").alias("n_chunk_tokens"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    )


def temperature_mix(
    df: "DataFrame",
    alpha: float = 0.5,
    budget_docs: int | None = None,
    source_col: str = "source",
    key: str = "doc_id",
    salt: str = "mix",
) -> "DataFrame":
    """Temperature-based source resampling — the n^α mixing recipe large
    training runs use to flatten source imbalance (α = 1 keeps natural
    proportions, α → 0 approaches uniform-over-sources; multilingual and
    multi-corpus recipes typically run α ≈ 0.3-0.7).

    Target share of source s ∝ n_s^α. With a ``budget_docs`` total, the
    per-source keep rate is min(1, budget · share_s / n_s); without one,
    the budget defaults to the largest total that needs no rate above 1
    (the corpus is only ever downsampled, never upsampled — duplication
    is dedup's enemy). Admission is the salted md5 uniform, so every
    individual decision is growth-stable and oracle-replayable
    (cap_source_share's discipline — that operator caps the heavy tail,
    this one reshapes the WHOLE mixture).

    Scale: one source-keyed partial-agg shuffle (rows ∝ #sources), an
    unhinted rate join (AQE broadcasts while small, shuffles at
    web-domain cardinality), a stateless narrow filter. α = 0.5 keeps
    the share math on sqrt — correctly rounded IEEE on every engine."""
    if alpha != 0.5:
        # other temperatures need pow(), whose cross-engine last-ulp
        # behavior is unpinned; the operator supports them, the value
        # gate runs at 0.5
        weight = F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
    else:
        weight = F.sqrt(F.col("__n").cast("double"))
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    weights = counts.select(source_col, "__n", weight.alias("__w"))
    tot = weights.agg(
        F.sum("__w").alias("__tot_w"), F.sum("__n").alias("__tot_n")
    )
    rates = weights.crossJoin(F.broadcast(tot)).select(
        source_col,
        "__n",
        (F.col("__w") / F.col("__tot_w")).alias("__share"),
    )
    if budget_docs is None:
        # largest budget with every rate <= 1: min over sources of
        # n_s / share_s, floored to an integer so the gate is exact
        budget_col = rates.agg(
            F.floor(F.min(F.col("__n") / F.col("__share")))
            .cast("bigint")
            .alias("__budget")
        )
        rates = rates.crossJoin(F.broadcast(budget_col))
    else:
        rates = rates.withColumn(
            "__budget", F.lit(int(budget_docs)).cast("bigint")
        )
    rates = rates.select(
        source_col,
        F.least(
            F.lit(1.0),
            F.col("__budget").cast("double")
            * F.col("__share")
            / F.col("__n").cast("double"),
        ).alias("__rate"),
    )
    return (
        df.join(rates, source_col)
        .filter(hash_uniform(key, salt) < F.col("__rate"))
        .drop("__rate")
    )
