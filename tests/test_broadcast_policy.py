"""Mechanical enforcement of the broadcast-hint policy (SCALING.md,
VERDICT r5 item 2): an explicit ``F.broadcast()`` bypasses AQE's size
judgment and hard-fails past the 8 GB broadcast limit, so a hint is only
allowed on a PROVABLY BOUNDED relation. Every call site in the package
must appear below with its boundedness justification; adding a hint
without consciously extending this list fails the suite. Pure AST scan —
no SparkSession.
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "crawl_streams_spark",
)

#: (relative path, enclosing function) -> (site count, why it is bounded)
ALLOWED: dict[tuple[str, str], tuple[int, str]] = {
    # -- sketch relations: O(depth*width) / O(m_bits) / O(k) / O(c log n)
    ("functions/sketch.py", "cms_lookup"): (1, "CMS table <= depth*width rows"),
    ("functions/sketch.py", "cms_inner_product"): (1, "per-depth-row products <= depth rows"),
    ("functions/sketch.py", "bloom_probe"): (1, "bloom <= m_bits rows"),
    ("functions/sketch.py", "mg_summary"): (1, "1-row error scalar"),
    ("functions/sketch.py", "mg_prune"): (2, "1-row (k+1)-th-count and error scalars"),
    # -- bounded top-k / skew-head sets (TakeOrderedAndProject)
    ("operators/corpus_stats.py", "split_hot_join"): (2, "top-hot_terms head, limit-ed"),
    ("operators/host_stats.py", "host_stats_snapshot"): (3, "top-k host set, limit-ed"),
    # -- 1-row scalar aggregates
    ("operators/corpus_stats.py", "doc_tfidf_topk"): (1, "1-row n_docs scalar"),
    ("operators/corpus_stats.py", "bigram_pmi"): (2, "1-row corpus totals"),
    ("operators/corpus_stats.py", "bigram_lm_scores"): (1, "1-row vocab-size scalar"),
    ("operators/graph.py", "pagerank"): (1, "1-row dangling-mass scalar"),
    ("operators/market.py", "basket_pair_lift"): (1, "1-row basket-count scalar"),
    ("plans/q_events.py", "recent_window_topk"): (1, "1-row max-ts scalar"),
    ("plans/q_timeseries.py", "decayed_event_counts"): (1, "1-row reference-ts scalar"),
    ("plans/q_pipeline.py", "brand_target_encoding"): (1, "1-row global mean"),
    ("plans/q_sql_extra.py", "orders_in_top_segments"): (1, "1-row avg-price scalar"),
    ("plans/q_joins_advanced.py", "important_part_value"): (1, "1-row total scalar"),
    ("plans/q_joins_advanced.py", "idle_rich_customers"): (1, "1-row avg-balance scalar"),
    # -- per-category aggregates over enum-like keys
    ("plans/q_sql_extra.py", "price_mad_by_flag"): (1, "per-returnflag medians (3 rows)"),
    ("plans/q_sql_extra.py", "returnflag_status_chisq"): (4, "per-flag/status margins + scalars"),
    ("plans/q_behavior.py", "event_transition_matrix"): (1, "per-event-type totals (5 rows)"),
    # -- bounded dimension tables (nation=25, region=5, hour grid)
    ("plans/q_tpch.py", "regional_revenue"): (2, "nation(25)/region(5)"),
    ("plans/q_tpch2.py", "nation_trade_volume"): (2, "nation(25) twice"),
    ("plans/q_tpch2.py", "nation_market_share"): (3, "nation(25)/region(5) semis"),
    ("plans/q_tpch2.py", "nation_product_profit"): (1, "nation(25)"),
    ("plans/q_tpch3.py", "returned_item_customers"): (1, "nation(25)"),
    ("plans/q_tpch3.py", "top_revenue_supplier"): (1, "1-row max-revenue scalar"),
    ("operators/launcher.py", "backfill_launches"): (1, "24-8760-row hour grid"),
    # -- query sets / centroids / codebooks (caller-bounded inputs)
    ("operators/similarity.py", "knn_bruteforce"): (1, "bounded query set"),
    ("operators/similarity.py", "knn_lsh"): (1, "bucketed bounded query set"),
    ("operators/similarity.py", "knn_ivf"): (2, "centroids (k rows) + query set"),
    ("operators/similarity.py", "assign_cells"): (1, "centroids (k rows)"),
    ("operators/similarity.py", "kmeans_train"): (1, "centroids (k rows)"),
    ("operators/similarity.py", "kmeans_inertia"): (1, "centroids (k rows)"),
    ("operators/similarity.py", "pq_train"): (1, "per-subspace centroids (m*k rows)"),
    ("operators/similarity.py", "pq_encode"): (1, "codebook (m*k rows)"),
    ("operators/similarity.py", "pq_knn"): (2, "|Q|*m*k distance table + query set"),
    ("operators/similarity.py", "pq_knn_rerank"): (2, "shortlist probe + query set"),
    ("operators/similarity.py", "ivf_assign"): (1, "centroids (k rows)"),
    ("operators/similarity.py", "knn_ivf_pq"): (
        5,
        "centroids (k rows) + codebook (m*k rows) + |Q|*n_probe*m*k "
        "distance tables + shortlist probe + query set",
    ),
    ("plans/q_similarity.py", "knn_bruteforce"): (1, "bounded query set"),
    ("plans/q_similarity.py", "label_centroid_sim"): (1, "per-label centroids"),
    ("plans/q_similarity.py", "pq_codes_fixed_book"): (1, "fixed codebook"),
    # -- sketch-backed queries
    ("plans/q_sketch.py", "cms_join_size_estimate"): (1, "CMS tables"),
    ("plans/q_sketch.py", "heavy_hitter_keys"): (3, "MG summary (<= k+1 rows) + scalars"),
    ("plans/q_sketch.py", "kmv_user_overlap"): (4, "KMV k-min tables + scalars"),
    ("plans/q_corpus.py", "term_posting_lists"): (1, "top-30 terms, limit-ed"),
    # -- sampled-size-guarded (the dedup.py:150 pattern: estimate first,
    # -- shuffled fallback when the estimate exceeds the budget)
    ("operators/dedup.py", "minhash_lsh_candidates"): (2, "pair set, sampled-size-guarded"),
    # -- bounded-by-version/partition-key domains
    ("operators/diff.py", "scd2_compress"): (2, "distinct snapshot versions"),
    ("operators/layout.py", "upsert_partitions"): (1, "update batch's distinct partition keys"),
    # -- per-bucket boundary relations (<= #buckets rows after aggregate)
    ("operators/pipeline.py", "global_rank"): (1, "per-bucket offsets"),
    ("operators/pipeline.py", "equi_depth_bins"): (1, "per-bucket offsets"),
    ("operators/pipeline.py", "partitioned_cumsum"): (1, "per-partition offsets"),
    ("operators/pipeline.py", "rank_normalize"): (1, "1-row count scalar"),
    ("operators/pipeline.py", "cap_source_share"): (1, "1-row grand-total scalar; the per-source rate relation is UNHINTED (unbounded at domain scale)"),
    ("operators/pipeline.py", "temperature_mix"): (
        2,
        "1-row weight-total scalar + 1-row derived-budget scalar; the "
        "per-source rate relation is UNHINTED (unbounded at domain scale)",
    ),
    ("operators/pipeline.py", "dsir_importance_weights"): (
        2,
        "1-row totals scalar + the λ table ONLY in hashed mode (bounded "
        "by hash_buckets); the exact-token λ relation is UNHINTED "
        "(vocab-sized, Heaps-law growth)",
    ),
}


def _scan() -> dict[tuple[str, str], int]:
    found: dict[tuple[str, str], int] = {}
    aliases: list[str] = []
    for dirpath, _, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, PKG)
            tree = ast.parse(open(path).read())
            stack: list[str] = []

            class V(ast.NodeVisitor):
                def visit_ImportFrom(self, node):
                    for a in node.names:
                        if a.name == "broadcast" and a.asname not in (
                            None,
                            "broadcast",
                        ):
                            aliases.append(f"{rel}: import as {a.asname}")
                    self.generic_visit(node)

                def visit_Assign(self, node):
                    v = node.value
                    if (
                        isinstance(v, ast.Attribute)
                        and v.attr == "broadcast"
                    ) or (
                        isinstance(v, ast.Name) and v.id == "broadcast"
                    ):
                        aliases.append(f"{rel}: rebinding broadcast")
                    self.generic_visit(node)

                def visit_FunctionDef(self, node):
                    stack.append(node.name)
                    self.generic_visit(node)
                    stack.pop()

                visit_AsyncFunctionDef = visit_FunctionDef

                def visit_Call(self, node):
                    f = node.func
                    name = (
                        f.attr
                        if isinstance(f, ast.Attribute)
                        else getattr(f, "id", "")
                    )
                    if name == "broadcast":
                        key = (rel, stack[-1] if stack else "<module>")
                        found[key] = found.get(key, 0) + 1
                    self.generic_visit(node)

            V().visit(tree)
    return found, aliases


def test_every_broadcast_hint_is_allowlisted_as_bounded():
    found, aliases = _scan()
    assert not aliases, (
        f"broadcast aliased/rebound ({aliases}): aliasing would let a "
        "hint bypass this allowlist — call F.broadcast directly"
    )
    allowed_counts = {k: c for k, (c, _) in ALLOWED.items()}
    new = {k: v for k, v in found.items() if k not in allowed_counts}
    assert not new, (
        f"new F.broadcast() sites {new}: a hint is only allowed on a "
        "provably bounded relation (SCALING.md hint policy) — justify "
        "and allowlist it in tests/test_broadcast_policy.py, or drop the "
        "hint and let AQE judge the size at runtime"
    )
    drifted = {
        k: (found[k], allowed_counts[k])
        for k in found
        if found[k] != allowed_counts[k]
    }
    assert not drifted, (
        f"broadcast site counts drifted (found, allowed): {drifted} — "
        "update the allowlist deliberately"
    )
    stale = set(allowed_counts) - set(found)
    assert not stale, f"allowlist entries with no remaining site: {stale}"
