"""Count-min sketch under the cross-engine gate (functions/sketch.py):
both engines build the same (d, bucket, cnt) sketch over the corpus token
stream with the md5 bucket kernel, then point-query it for the top-20 true
tokens — the gate certifies the bucket addressing, the mergeable-count
build, AND the min-over-depth estimator bit-for-bit (est_cnt values, not
just error bounds)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions import sketch as S
from ..tables import load_table
from .registry import query

_DEPTH = 4
_WIDTH = 512


@query(
    "cms_token_estimates",
    oracle=f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ),
        counts AS (
            SELECT tok, COUNT(*)::BIGINT AS true_cnt FROM toks GROUP BY tok
        ),
        top AS (
            SELECT tok, true_cnt FROM counts
            ORDER BY true_cnt DESC, tok LIMIT 20
        ),
        depths AS (SELECT unnest(range({_DEPTH}))::BIGINT AS d),
        sketch AS (
            SELECT d,
                   (('0x' || substr(md5(d || ':' || tok), 1, 15))::BIGINT)
                       % {_WIDTH} AS bucket,
                   COUNT(*)::BIGINT AS cnt
            FROM toks CROSS JOIN depths
            GROUP BY 1, 2
        )
        SELECT t.tok,
               t.true_cnt,
               MIN(s.cnt) AS est_cnt
        FROM top t
        CROSS JOIN depths dd
        JOIN sketch s
          ON s.d = dd.d
         AND s.bucket = (('0x' || substr(md5(dd.d || ':' || t.tok), 1, 15))::BIGINT)
                            % {_WIDTH}
        GROUP BY t.tok, t.true_cnt
    """,
    tags=("sketch", "cms", "approx"),
)
def cms_token_estimates(spark, sf_dir):
    """Count-min estimates for the corpus's top-20 tokens, next to their
    true counts. The sketch build's reduce key space is depth×width
    (2048) regardless of corpus size — the 100 TB replacement for an
    exact token groupBy when the item domain itself is huge; lookups
    broadcast the sketch. CMS guarantee (visible in the result): est_cnt
    ≥ true_cnt, overshoot bounded by collisions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    sketch = S.cms_build(toks, "tok", depth=_DEPTH, width=_WIDTH)
    true_top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("tok"))
        .limit(20)
    )
    return S.cms_lookup(sketch, true_top, "tok", _DEPTH, _WIDTH)


_BLOOM_M = 2048
_BLOOM_K = 3


@query(
    "bloom_part_membership",
    oracle=f"""
        WITH sel AS (
            SELECT DISTINCT l_partkey FROM lineitem
            WHERE l_quantity = 50 AND l_discount >= 0.08
        ),
        hashes AS (SELECT unnest(range({_BLOOM_K}))::BIGINT AS j),
        bloom AS (
            SELECT DISTINCT
                   (('0x' || substr(md5(j || ':' || l_partkey), 1, 15))::BIGINT)
                       % {_BLOOM_M} AS pos
            FROM sel CROSS JOIN hashes
        ),
        probe AS (
            SELECT p.p_partkey, h.j,
                   (('0x' || substr(md5(h.j || ':' || p.p_partkey), 1, 15))::BIGINT)
                       % {_BLOOM_M} AS pos
            FROM part p CROSS JOIN hashes h
        ),
        agg AS (
            SELECT p_partkey,
                   COUNT(DISTINCT pos) AS n_req,
                   COUNT(DISTINCT CASE WHEN pos IN (SELECT pos FROM bloom)
                                       THEN pos END) AS n_hit
            FROM probe GROUP BY p_partkey
        )
        SELECT a.p_partkey,
               (n_hit = n_req) AS maybe_present,
               (sel.l_partkey IS NOT NULL) AS actually_present
        FROM agg a LEFT JOIN sel ON sel.l_partkey = a.p_partkey
    """,
    tags=("sketch", "bloom", "membership"),
)
def bloom_part_membership(spark, sf_dir):
    """Bloom-filter membership pre-check, false positives on display:
    build a 2048-bit / 3-hash bloom over the part keys selling at
    quantity 50 with ≥8% discount, probe EVERY part key, and emit the
    bloom's verdict next to ground truth. The gate certifies the bit
    addressing, the all-k-positions-set rule, AND the exact set of false
    positives (maybe=true, actually=false rows) — while every
    actually=true row must show maybe=true (no false negatives, the
    property that makes bloom pre-filters safe for join pruning)."""
    li = load_table(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_quantity") == 50) & (F.col("l_discount") >= 0.08)
    ).select("l_partkey")
    bloom = S.bloom_build(sel, "l_partkey", _BLOOM_M, _BLOOM_K)
    parts = load_table(spark, sf_dir, "part").select("p_partkey")
    probed = S.bloom_probe(bloom, parts, "p_partkey", _BLOOM_M, _BLOOM_K)
    truth = sel.distinct().withColumn("__actual", F.lit(True))
    return (
        probed.join(
            truth, probed["p_partkey"] == truth["l_partkey"], "left"
        )
        .select(
            "p_partkey",
            "maybe_present",
            F.coalesce(F.col("__actual"), F.lit(False)).alias(
                "actually_present"
            ),
        )
    )


_HLL_P = 8
_HLL_M = 1 << _HLL_P  # 256 registers
_HLL_MAXRHO = 60 - _HLL_P + 1  # 53
_HLL_SCALE = 1 << _HLL_MAXRHO
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(_HLL_SCALE)


@query(
    "hll_distinct_users",
    oracle=f"""
        WITH h AS (
            SELECT event_type,
                   (('0x' || substr(md5('hll:' || user_id), 1, 15))::BIGINT)
                       AS hv
            FROM events
        ),
        regs AS (
            SELECT event_type,
                   hv % {_HLL_M} AS idx,
                   MAX(CASE WHEN hv // {_HLL_M} = 0 THEN {_HLL_MAXRHO}
                            ELSE {_HLL_MAXRHO}
                                 - length(bin(hv // {_HLL_M})) END) AS rho
            FROM h GROUP BY event_type, hv % {_HLL_M}
        ),
        agg AS (
            SELECT event_type,
                   COUNT(*) AS present,
                   SUM(1::BIGINT << ({_HLL_MAXRHO} - rho))::BIGINT AS ssum
            FROM regs GROUP BY event_type
        ),
        est AS (
            SELECT event_type, present,
                   ssum + ({_HLL_M} - present) * (1::BIGINT << {_HLL_MAXRHO})
                       AS total
            FROM agg
        ),
        exact AS (
            SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               ROUND(CASE WHEN e.present < {_HLL_M}
                           AND {_HLL_NUM!r} / e.total <= {2.5 * _HLL_M}
                     THEN {float(_HLL_M)!r}
                          * ln({float(_HLL_M)!r} / ({_HLL_M} - e.present))
                     ELSE {_HLL_NUM!r} / e.total END, 3) AS approx_users,
               exact.exact_users
        FROM est e JOIN exact USING (event_type)
    """,
    tags=("sketch", "hll", "approx"),
    bench=True,
)
def hll_distinct_users(spark, sf_dir):
    """Per-event-type distinct users through a DETERMINISTIC HyperLogLog
    (functions/sketch.py::hll_registers/hll_estimate) next to the exact
    count. Engine-native HLLs (approx_count_distinct) can't be oracled —
    their sketch layouts differ; this one's md5-derived registers and
    integer-scaled harmonic sum make both engines compute the identical
    estimate to the last rounded digit, putting a sketch ESTIMATOR (not
    just its inputs) under the value gate.

    r13 (guide §2.4/§2.3): one source scan instead of two. Both branches
    are functions of the DISTINCT (event_type, user_id) pairs — HLL
    registers are a groupBy-MAX (multiplicity-invariant) and the exact
    branch was count_distinct — so dedup once and derive both: the
    deduped relation's exchange is byte-identical in the two branches
    and runtime exchange reuse executes it once. count("user_id") on the
    deduped pairs equals the old count_distinct exactly (at most one
    NULL pair per type survives the distinct and count(col) skips it,
    matching count_distinct's NULL handling)."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select("event_type", "user_id").distinct()
    regs = S.hll_registers(
        pairs, "user_id", p=_HLL_P, group_cols=("event_type",)
    )
    est = S.hll_estimate(
        regs, p=_HLL_P, group_cols=("event_type",), estimate_col="approx_users"
    )
    exact = pairs.groupBy("event_type").agg(
        F.count("user_id").alias("exact_users")
    )
    return est.join(exact, "event_type")


_KMV_K = 256
_KMV_DOM = float(1 << 60)  # 60-bit md5 hash domain


@query(
    "kmv_distinct_users",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT event_type,
                   (('0x' || substr(md5('kmv:' || user_id), 1, 15))::BIGINT)
                       AS hv
            FROM events
        ),
        rk AS (
            SELECT event_type, hv,
                   row_number() OVER (PARTITION BY event_type ORDER BY hv)
                       AS rn
            FROM h
        ),
        kmv AS (SELECT event_type, hv FROM rk WHERE rn <= {_KMV_K}),
        mrk AS (
            SELECT hv, row_number() OVER (ORDER BY hv) AS rn
            FROM (SELECT DISTINCT hv FROM kmv)
        ),
        allkmv AS (
            SELECT * FROM kmv
            UNION ALL
            SELECT '__all__' AS event_type, hv FROM mrk WHERE rn <= {_KMV_K}
        ),
        agg AS (
            SELECT event_type, COUNT(*)::BIGINT AS n_kept,
                   MAX(hv) AS kth_hash
            FROM allkmv GROUP BY event_type
        ),
        exact AS (
            SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
            FROM events GROUP BY event_type
            UNION ALL
            SELECT '__all__', COUNT(DISTINCT user_id) FROM events
        )
        SELECT a.event_type, a.n_kept, a.kth_hash,
               ROUND(CASE WHEN a.n_kept < {_KMV_K} THEN a.n_kept::DOUBLE
                     ELSE ({float(_KMV_K - 1)!r} * {_KMV_DOM!r}) / a.kth_hash
                     END, 3) AS approx_users,
               e.exact_users
        FROM agg a JOIN exact e USING (event_type)
    """,
    tags=("sketch", "kmv", "theta", "approx"),
)
def kmv_distinct_users(spark, sf_dir):
    """Per-event-type distinct users through a KMV (theta) sketch
    (functions/sketch.py::kmv_table/kmv_estimate) next to the exact
    count, PLUS an '__all__' row whose sketch is the MERGE of the five
    per-type sketches — the union-mergeability that makes KMV a partial
    aggregate at 100 TB. Selecting the k smallest hashes is
    shuffle-order-insensitive, so — unlike engine-native theta sketches —
    the estimator itself sits under the cross-engine value gate
    ((k−1)·2⁶⁰ / kth_hash, one deterministic float division).

    r13 (guide §2.3/§2.4, the hll_distinct_users treatment): one source
    scan instead of four. Every branch is a function of the distinct
    (event_type, user_id) pairs — the sketch dedups (group, hv) anyway,
    and both exact arms were count_distinct — so dedup once; the pairs
    exchange is byte-identical under all three consumers and runtime
    exchange reuse executes it once. The ≤ k·|types| sketch relation is
    additionally pinned (lazy localCheckpoint) because the '__all__'
    merge consumes it a second time with a different downstream shape
    that exchange reuse does not cover."""
    ev = load_table(spark, sf_dir, "events")
    pairs = (
        ev.select("event_type", "user_id").distinct()
        .localCheckpoint(eager=False)
    )
    per = S.kmv_table(
        pairs, "user_id", k=_KMV_K, group_cols=("event_type",)
    ).localCheckpoint(eager=False)
    merged = S.kmv_merge(
        per.select(F.lit("__all__").alias("event_type"), "hv"),
        k=_KMV_K,
        group_cols=("event_type",),
    )
    est = S.kmv_estimate(
        per.unionByName(merged),
        k=_KMV_K,
        group_cols=("event_type",),
        estimate_col="approx_users",
    )
    exact = pairs.groupBy("event_type").agg(
        F.count("user_id").alias("exact_users")
    ).unionByName(
        pairs.agg(
            F.count_distinct("user_id").alias("exact_users")
        ).select(F.lit("__all__").alias("event_type"), "exact_users")
    )
    return est.join(exact, "event_type")


def _duck_kmv_est(n_kept: str, kth: str) -> str:
    return (
        f"ROUND(CASE WHEN {n_kept} < {_KMV_K} THEN ({n_kept})::DOUBLE "
        f"ELSE ({float(_KMV_K - 1)!r} * {_KMV_DOM!r}) / {kth} END, 3)"
    )


@query(
    "kmv_user_overlap",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT event_type,
                   (('0x' || substr(md5('kmv:' || user_id), 1, 15))::BIGINT)
                       AS hv
            FROM events
        ),
        rk AS (
            SELECT event_type, hv,
                   row_number() OVER (PARTITION BY event_type ORDER BY hv)
                       AS rn
            FROM h
        ),
        kmv AS (SELECT event_type, hv FROM rk WHERE rn <= {_KMV_K}),
        singles AS (
            SELECT event_type, COUNT(*)::BIGINT AS n_kept, MAX(hv) AS kth
            FROM kmv GROUP BY event_type
        ),
        est AS (
            SELECT event_type,
                   {_duck_kmv_est('n_kept', 'kth')} AS approx
            FROM singles
        ),
        types AS (SELECT DISTINCT event_type FROM events),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b
            FROM types a JOIN types b ON a.event_type < b.event_type
        ),
        uni0 AS (
            SELECT p.type_a, p.type_b, k.hv
            FROM pairs p JOIN kmv k ON k.event_type = p.type_a
            UNION
            SELECT p.type_a, p.type_b, k.hv
            FROM pairs p JOIN kmv k ON k.event_type = p.type_b
        ),
        urk AS (
            SELECT type_a, type_b, hv,
                   row_number() OVER (PARTITION BY type_a, type_b
                                      ORDER BY hv) AS rn
            FROM uni0
        ),
        usingles AS (
            SELECT type_a, type_b, COUNT(*)::BIGINT AS n_kept,
                   MAX(hv) AS kth
            FROM urk WHERE rn <= {_KMV_K} GROUP BY type_a, type_b
        ),
        uest AS (
            SELECT type_a, type_b,
                   {_duck_kmv_est('n_kept', 'kth')} AS approx_union
            FROM usingles
        ),
        du AS (SELECT DISTINCT event_type, user_id FROM events),
        exact AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*)::BIGINT AS exact_overlap
            FROM du a JOIN du b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT p.type_a, p.type_b,
               COALESCE(x.exact_overlap, 0) AS exact_overlap,
               ea.approx AS approx_a,
               eb.approx AS approx_b,
               u.approx_union,
               ROUND(ea.approx + eb.approx - u.approx_union, 3)
                   AS approx_overlap
        FROM pairs p
        JOIN est ea ON ea.event_type = p.type_a
        JOIN est eb ON eb.event_type = p.type_b
        JOIN uest u USING (type_a, type_b)
        LEFT JOIN exact x USING (type_a, type_b)
    """,
    tags=("sketch", "kmv", "set-algebra", "approx"),
)
def kmv_user_overlap(spark, sf_dir):
    """Sketch SET ALGEBRA: estimated user overlap between every pair of
    event types by inclusion–exclusion over KMV sketches —
    |A∩B| ≈ est(A) + est(B) − est(A ∪ B), where the union sketch is the
    exact k-min merge of the two per-type sketches — next to the true
    overlap. This is the capability HLL lacks cheaply and the reason a
    KMV/theta sketch earns its extra bytes: audience-overlap /
    cross-segment questions answered from pre-built per-segment
    sketches, never rescanning the data. All selection is
    order-statistic math, so the whole pipeline sits under the exact
    gate.

    r13 (guide §2.3/§2.4): one source scan instead of three. The sketch
    input, the type universe and the exact-overlap relation are all
    functions of the distinct (event_type, user_id) pairs, so every
    branch derives from one deduped relation (the kmv hash-dedup and
    the inner self-join on user_id are multiplicity- and NULL-identical
    on it); the ≤ k·|types| sketch is pinned because est/ua/ub consume
    it three ways no exchange reuse covers."""
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.select("event_type", "user_id").distinct()
        .localCheckpoint(eager=False)
    )
    sk = S.kmv_table(
        du, "user_id", k=_KMV_K, group_cols=("event_type",)
    ).localCheckpoint(eager=False)
    est = S.kmv_estimate(
        sk, k=_KMV_K, group_cols=("event_type",), estimate_col="approx"
    ).select("event_type", "approx")
    types = du.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .crossJoin(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    ua = pairs.join(
        sk.select(F.col("event_type").alias("type_a"), "hv"), "type_a"
    ).select("type_a", "type_b", "hv")
    ub = pairs.join(
        sk.select(F.col("event_type").alias("type_b"), "hv"), "type_b"
    ).select("type_a", "type_b", "hv")
    merged = S.kmv_merge(ua, ub, k=_KMV_K, group_cols=("type_a", "type_b"))
    uest = S.kmv_estimate(
        merged,
        k=_KMV_K,
        group_cols=("type_a", "type_b"),
        estimate_col="approx_union",
    ).select("type_a", "type_b", "approx_union")
    exact = (
        du.select(F.col("event_type").alias("type_a"), "user_id")
        .join(
            du.select(F.col("event_type").alias("type_b"), "user_id"),
            "user_id",
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    ea = est.select(F.col("event_type").alias("type_a"), F.col("approx").alias("approx_a"))
    eb = est.select(F.col("event_type").alias("type_b"), F.col("approx").alias("approx_b"))
    return (
        pairs.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .join(F.broadcast(uest), ["type_a", "type_b"])
        .join(F.broadcast(exact), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("exact_overlap", F.lit(0)).alias("exact_overlap"),
            "approx_a",
            "approx_b",
            "approx_union",
            F.round(
                F.col("approx_a") + F.col("approx_b") - F.col("approx_union"),
                3,
            ).alias("approx_overlap"),
        )
    )


@query(
    "cms_join_size_estimate",
    oracle=f"""
        WITH depths AS (SELECT unnest(range({_DEPTH}))::BIGINT AS d),
        ska AS (
            SELECT d,
                   (('0x' || substr(md5(d || ':' || l_orderkey), 1, 15))::BIGINT)
                       % {_WIDTH} AS bucket,
                   COUNT(*)::BIGINT AS ca
            FROM lineitem CROSS JOIN depths GROUP BY 1, 2
        ),
        skb AS (
            SELECT d,
                   (('0x' || substr(md5(d || ':' || o_orderkey), 1, 15))::BIGINT)
                       % {_WIDTH} AS bucket,
                   COUNT(*)::BIGINT AS cb
            FROM orders CROSS JOIN depths GROUP BY 1, 2
        ),
        ip AS (
            SELECT a.d, SUM(a.ca * b.cb)::BIGINT AS ip
            FROM ska a JOIN skb b ON a.d = b.d AND a.bucket = b.bucket
            GROUP BY a.d
        ),
        -- depths with zero overlapping buckets have true inner product 0
        -- (the tightest bound): re-seat on the full depth domain so the
        -- min sees them, mirroring cms_inner_product
        ip_full AS (
            SELECT depths.d, COALESCE(ip.ip, 0)::BIGINT AS ip
            FROM depths LEFT JOIN ip ON depths.d = ip.d
        ),
        exact AS (
            SELECT COUNT(*)::BIGINT AS true_join_size
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        SELECT COALESCE((SELECT MIN(ip) FROM ip_full), 0)::BIGINT
                   AS est_join_size,
               exact.true_join_size
        FROM exact
    """,
    tags=("sketch", "cms", "join-size", "optimizer", "approx"),
)
def cms_join_size_estimate(spark, sf_dir):
    """Equi-join cardinality estimation from two count-min sketches
    (functions/sketch.py::cms_inner_product): |lineitem ⋈ orders| on the
    order key estimated as min-over-depth of the sketch inner product,
    next to the true join size. BIGINT arithmetic end to end — the gate
    certifies the estimator itself. The optimizer credential: the
    estimate needs only two KB-sized sketches (never the tables), is an
    upper bound by construction, and stays correct under key skew where
    NDV-based estimates collapse."""
    # r13 (guide §2.5): spread_on parallelizes the ×depth bucket-hash map
    # (2.4M md5-mod evaluations at sf0.1 ran on the scan's 3 splits — 7.5
    # of this query's ~9 core-seconds; the guard makes it a no-op at any
    # real scale).
    li = load_table(spark, sf_dir, "lineitem", spread_on=("l_orderkey",))
    o = load_table(spark, sf_dir, "orders", spread_on=("o_orderkey",))
    # r13 (guide §3.3): the ≤ depth×width sketches are pinned so the
    # inner-product consumers derive each ONCE — the true-join branch
    # keeps its own (inherent) scan of both tables; measured source
    # reads drop from 3×lineitem + 2×orders to 2 + 2.
    ska = S.cms_build(
        li, "l_orderkey", depth=_DEPTH, width=_WIDTH
    ).localCheckpoint(eager=False)
    skb = S.cms_build(
        o, "o_orderkey", depth=_DEPTH, width=_WIDTH
    ).localCheckpoint(eager=False)
    est = S.cms_inner_product(ska, skb)
    exact = li.join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).agg(F.count(F.lit(1)).alias("true_join_size"))
    return est.crossJoin(F.broadcast(exact))


@query(
    "heavy_hitter_keys",
    oracle="""
        WITH s AS (
            SELECT doc_id, n_chars // 10 AS L FROM documents
            WHERE n_chars >= 10
        ),
        it AS (
            SELECT ((doc_id * 7919 + i.i * 104729) % 65536) AS h
            FROM s, unnest(range(0, L)) i(i)
        ),
        kk AS (
            SELECT 'v' ||
                   (CASE WHEN h = 0 THEN 0 ELSE h & (-h) END) ||
                   '#' || ((h // 256) % 128) AS item
            FROM it
        ),
        c AS (SELECT item, COUNT(*)::BIGINT AS n_exact FROM kk GROUP BY item),
        tot AS (SELECT COUNT(*)::BIGINT AS n FROM kk)
        SELECT c.item, c.n_exact,
               true AS sketch_found,
               true AS bound_ok
        FROM c, tot
        WHERE c.n_exact * 360 > tot.n
    """,
    tags=("sketch", "heavy-hitters", "misra-gries", "extension"),
)
def heavy_hitter_keys(spark, sf_dir):
    """Misra-Gries heavy hitters under the VALUE gate, via the
    error-bound-invariant pattern (the approx_distinct_users /
    host_graph_kcore trick): a deterministic skewed key stream is
    synthesized from documents (trailing-bit geometric skew × a
    high-bit uniform subkey — domain ≈ 1000, verified ≥ +12%/−9%
    margins around the n/360 threshold at sf 0.001/0.01/0.1, so the
    heavy-hitter set is the same 128 keys at every scale), sketched
    with k=359 counters per partition (functions/sketch.py::mg_summary —
    genuine pruning, domain > k), and the candidates exactly recounted.

    The output is provably deterministic — the true heavy hitters with
    their exact counts — while flowing THROUGH the sketch: a dropped
    true heavy hitter loses a row (row-count gate), sketch_found comes
    from a left join against the summary (false would hash-mismatch the
    oracle's guaranteed `true`), and bound_ok checks the mergeable-MG
    inequality est ≤ exact ≤ est + err_total with the ACTUAL accumulated
    decrement mass, not the worst-case bound.

    Scale: the sketch pass is one mapInPandas scan emitting ≤ 360 rows
    per partition (no shuffle); the recount shuffles only
    candidate-matched rows after a broadcast semi-join; n_total and
    err_total ride as broadcast scalars. Two scans of the base table —
    at 100 TB, persist the exploded stream or fuse with an existing
    pass."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .filter(F.col("n_chars") >= 10)
    )
    stream = docs.select(
        F.explode(
            F.sequence(F.lit(0), (F.col("n_chars") / F.lit(10)).cast("long") - 1)
        ).alias("i"),
        "doc_id",
    ).select(
        ((F.col("doc_id") * 7919 + F.col("i") * 104729) % 65536).alias("h")
    )
    keyed = stream.select(
        F.concat(
            F.lit("v"),
            F.when(F.col("h") == 0, F.lit(0)).otherwise(
                F.expr("h & -h")
            ).cast("string"),
            F.lit("#"),
            F.expr("(h div 256) % 128").cast("string"),
        ).alias("item")
    )
    # the summary (≤ domain rows) feeds three consumers — pin it so the
    # sketch scan runs once, not per consumer (the pin_pairs pattern,
    # similarity.py::density_dedup_flags)
    summary = S.mg_summary(keyed, "item", k=359).localCheckpoint(eager=False)
    exact = (
        keyed.join(F.broadcast(summary.select("item")), "item")
        .groupBy("item")
        .agg(F.count("*").alias("n_exact"))
    )
    tot = keyed.agg(F.count("*").alias("n_tot"))
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("n_exact") * 360 > F.col("n_tot"))
        .join(F.broadcast(summary), "item", "left")
        .select(
            "item",
            "n_exact",
            F.col("est").isNotNull().alias("sketch_found"),
            (
                (F.col("est") <= F.col("n_exact"))
                & (F.col("n_exact") - F.col("est") <= F.col("err_total"))
            ).alias("bound_ok"),
        )
    )


_MRL_QS = (0.1, 0.25, 0.5, 0.75, 0.9)


@query(
    "price_quantile_sketch",
    oracle="""
        SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9])::DOUBLE AS q,
               true AS rank_ok,
               true AS mass_conserved
    """,
    tags=("sketch", "quantiles", "mrl", "extension"),
)
def price_quantile_sketch(spark, sf_dir):
    """Mergeable quantile sketch under the error-bound-invariant gate
    (the approx_distinct_users pattern): l_extendedprice flows through
    per-partition MRL compactors (functions/sketch.py — one pass, no
    shuffle, deterministic alternating-parity compaction) into a single
    tree-merged summary whose ACCUMULATED rank-error mass B rides along;
    the estimates' true ranks are then checked distributively in one
    conditional-aggregate scan against the PROVABLE inequality
    count(≤est) + B ≥ ⌈q·n⌉ and count(<est) ≤ ⌈q·n⌉ + B + w_max, plus
    exact weight-mass conservation (Σ summary weights == count(*)).
    Both booleans are mathematically guaranteed, so the oracle emits
    constants — while a compactor bug (lost mass, broken bound
    accounting, mis-leveled merge) flips a value and fails the hash.

    NOTE build() is EAGER (two Spark jobs): collecting the bounded
    summary for driver-side quantile lookup is the boundary-literal
    pattern global_rank uses for bucket bounds (documented per ADVICE
    r4 on eager builders).

    Scale: the partition pass emits c·log2(n_p/c) rows per partition;
    the tree merge re-compacts P summaries into ONE c·log2(n/c)-row
    summary worker-side, so the driver never sees O(P) data; the rank
    check is a single whole-stage-codegen scan with no shuffle."""
    import math

    from ..functions import sketch as SK

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("value")
    )
    parts = SK.mrl_partition_summaries(li, "value", c=200)
    merged = SK.mrl_merge(parts, c=200)
    ests, B, n_sketch, w_max = SK.mrl_quantiles(merged.collect(), _MRL_QS)

    aggs = [F.count("*").alias("n_true")]
    for i, q in enumerate(_MRL_QS):
        e = float(ests[q])
        aggs.append(
            F.sum((F.col("value") < e).cast("long")).alias(f"lt{i}")
        )
        aggs.append(
            F.sum((F.col("value") <= e).cast("long")).alias(f"le{i}")
        )
    stats = li.agg(*aggs)

    structs = []
    for i, q in enumerate(_MRL_QS):
        t = max(1, int(math.ceil(q * n_sketch)))
        structs.append(
            F.struct(
                F.lit(float(q)).alias("q"),
                (
                    (F.col(f"le{i}") + F.lit(B) >= F.lit(t))
                    & (F.col(f"lt{i}") <= F.lit(t + B + w_max))
                ).alias("rank_ok"),
                (F.col("n_true") == F.lit(n_sketch)).alias(
                    "mass_conserved"
                ),
            )
        )
    return stats.select(
        F.explode(F.array(*structs)).alias("s")
    ).select("s.q", "s.rank_ok", "s.mass_conserved")
