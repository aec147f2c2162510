"""Query registry: every operator from SURVEY.md §2 exposed as a named
(spark builder, DuckDB oracle SQL) pair — the driver-contract surface.

Importing this package populates ``REGISTRY`` from the per-domain modules,
then reorders it so the first ``DRIVER_WINDOW`` entries form a covering set
of every operator family (the external correctness harness verifies a
bounded prefix of the registry; round 1 proved only the first 50 entries
get driver verdicts, leaving 43 queries with local-only evidence).

Ordering policy (round 13 — planner-generated via
``python -m scripts.plan_rotation 13`` at the 191-query registry
(184 + the seven new oracle gates below), then seven filler slots
donated from the END to round-13 additions, per the planner's own
donation rule):

- Slots 1-9 (MUST): the nine r8-verdict queries the planner, the r12
  judge, and the rotation guard's projection all pre-enumerated —
  they age past the 4-round freshness bound at r13 if left
  un-windowed (``returnflag_status_chisq`` … ``windowed_count``; the
  r12 judge's full 184/184 harness run re-oracled all 9 green, so
  this is pure rotation execution — VERDICT r12 item 1).
- Slots 10-26: one representative per family the MUST set misses,
  oldest verdicts first. ``parts_bought_together`` /
  ``orders_validation_report`` are sole members of their families and
  recur every round by construction.
- Slots 27-33: round-13 NEW gates, in-window at birth. First the last
  conformance-only §2 crawl ops (VERDICT r12 item 2):
  ``referrer_host_histogram`` (A-5 self-exclusion),
  ``screenshot_strip_ring`` (P-8 + A-10 strip/ring over the real
  operator), ``solr_etl_projection`` (the F-6/F-8/F-9/F-10 crawl-db
  ETL projection as one DuckDB-replayable gate). Then the previously
  pytest-only TRANSACTIONAL family (q_tx): ``tx_dml_merge_state``
  (row-level DML + the r13 four-clause MergeBuilder),
  ``tx_cdf_change_counts`` (Change Data Feed accounting),
  ``tx_time_travel_counts`` (snapshot isolation + RESTORE),
  ``tx_generated_dml_state`` (generated columns incl. the partition
  column, recompute under DML). Registry 191 ≤ 196.
- Slots 34-50: oldest-verdict fillers (r9); seven filler slots
  donated to the new gates above (the planner's last three —
  ``media_png_features``, ``media_wav_features``,
  ``null_coalesce_projection`` — plus ``lang_source_rollup``,
  ``media_jpeg_features``, ``media_png16_features``,
  ``knn_ivf_pq_fixed``).
- The rotation debt guard (tests/test_registry_order.py::
  test_no_query_strands_beyond_k_rounds) asserts zero strands at the
  max CHECKED-IN CORRECTNESS round (the enforceable end-of-round
  invariant — VERDICT r5 item 1) and reports the next-round projection
  as a non-failing warning; the bound constant lives in
  scripts/plan_rotation.py (``FRESHNESS_BOUND = 4``).

Retired windows (rounds 1-9) are recorded in ROUNDLOG.md and git history.
"""

from .registry import REGISTRY, Query, query  # noqa: F401

# Populate the registry (import order = registration order; display order is
# fixed up below).
from . import q_events  # noqa: E402,F401
from . import q_tpch  # noqa: E402,F401
from . import q_text  # noqa: E402,F401
from . import q_dedup  # noqa: E402,F401
from . import q_similarity  # noqa: E402,F401
from . import q_crawl  # noqa: E402,F401
from . import q_schedule  # noqa: E402,F401
from . import q_sql_extra  # noqa: E402,F401
from . import q_pivot  # noqa: E402,F401
from . import q_sessions  # noqa: E402,F401
from . import q_joins_advanced  # noqa: E402,F401
from . import q_tpch2  # noqa: E402,F401
from . import q_tpch3  # noqa: E402,F401
from . import q_pipeline  # noqa: E402,F401
from . import q_spans  # noqa: E402,F401
from . import q_corpus  # noqa: E402,F401
from . import q_graph  # noqa: E402,F401
from . import q_diff  # noqa: E402,F401
from . import q_interval  # noqa: E402,F401
from . import q_sketch  # noqa: E402,F401
from . import q_validate  # noqa: E402,F401
from . import q_behavior  # noqa: E402,F401
from . import q_timeseries  # noqa: E402,F401
from . import q_market  # noqa: E402,F401
from . import q_tx  # noqa: E402,F401

#: Size of the external harness's verification prefix (empirical, round 1).
DRIVER_WINDOW = 50

#: Names pinned to the front of the registry, in order. Everything not
#: listed keeps its registration order after these.
PRIORITY: tuple[str, ...] = (
    # -- MUST: r8-verdict queries aging past the bound (planner sect. 1)
    "returnflag_status_chisq",  # q_sql_extra, r8
    "rollup_order_priority",  # q_tpch, r8
    "source_lang_entropy",  # q_corpus, r8
    "temperature_mixed_counts",  # q_pipeline, r8
    "top_orders_per_customer",  # q_tpch, r8
    "url_host_extraction",  # q_crawl, r8
    "user_time_to_convert",  # q_behavior, r8
    "variant_typed_extraction",  # q_events, r8
    "windowed_count",  # q_events, r8
    # -- family reps, oldest verdicts first (planner section 2) ----------
    "dedup_minhash_lsh_pairs",  # q_dedup, r9
    "orders_scd2_incremental",  # q_diff, r9
    "host_graph_kcore",  # q_graph, r9
    "active_sessions_at_purchase",  # q_interval, r11
    "clicks_before_purchase",  # q_joins_advanced, r9
    "parts_bought_together",  # q_market, r12 — sole member, recurs
    "unpivot_lineitem_metrics",  # q_pivot, r11
    "launch_ts_and_source_tags",  # q_schedule, r9
    "user_sessions",  # q_sessions, r10
    "embedding_density_dedup",  # q_similarity, r9
    "cms_token_estimates",  # q_sketch, r9
    "dup_token_spans",  # q_spans, r10
    "annotation_regex_classes",  # q_text, r9
    "hourly_value_anomalies",  # q_timeseries, r10
    "disjunctive_part_revenue",  # q_tpch2, r9
    "discount_revenue_forecast",  # q_tpch3, r9
    "orders_validation_report",  # q_validate, r12 — sole member, recurs
    # -- round-13 NEW gates, in-window at birth (VERDICT r12 item 2) -----
    "referrer_host_histogram",  # q_crawl, NEW — A-5 self-exclusion
    "screenshot_strip_ring",  # q_crawl, NEW — P-8 + A-10 over the operator
    "solr_etl_projection",  # q_crawl, NEW — F-6/F-8/F-9/F-10 ETL in one gate
    # -- round-13 NEW tx-family gates (previously pytest-only surface) ---
    "tx_dml_merge_state",  # q_tx, NEW — DML + 4-clause MergeBuilder
    "tx_cdf_change_counts",  # q_tx, NEW — Change Data Feed accounting
    "tx_time_travel_counts",  # q_tx, NEW — snapshots + RESTORE
    "tx_generated_dml_state",  # q_tx, NEW — generated columns + DML
    # -- oldest-verdict fillers (planner section 3): all r9-verdict ------
    "balanced_shard_stats",  # q_pipeline, r9
    "customer_order_left_join",  # q_tpch, r9
    "customers_with_open_orders",  # q_tpch, r9
    "customers_without_orders",  # q_tpch, r9
    "dedup_ngram_jaccard",  # q_dedup, r9
    "doc_fingerprints",  # q_text, r9
    "doc_lang_id",  # q_text, r9
    "doc_lm_perplexity",  # q_corpus, r9
    "doc_quality",  # q_text, r9
    "dsir_bigram_selected_docs",  # q_pipeline, r9
    "dsir_selected_docs",  # q_pipeline, r9
    "embedding_norms",  # q_similarity, r9
    "equi_depth_price_bins",  # q_sql_extra, r9
    "event_type_dist_users",  # q_events, r9
    "formatted_log_lines",  # q_events, r9
    "heavy_hitter_keys",  # q_sketch, r9
    "hist_median_by_type",  # q_events, r9
)


def _reorder() -> None:
    missing = [n for n in PRIORITY if n not in REGISTRY]
    assert not missing, f"PRIORITY names not registered: {missing}"
    assert len(set(PRIORITY)) == len(PRIORITY), "duplicate PRIORITY names"
    ordered = {n: REGISTRY[n] for n in PRIORITY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
