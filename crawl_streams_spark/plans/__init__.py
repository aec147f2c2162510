"""Query registry: every operator from SURVEY.md §2 exposed as a named
(spark builder, DuckDB oracle SQL) pair — the driver-contract surface.

Importing this package populates ``REGISTRY`` from the per-domain modules,
then reorders it so the first ``DRIVER_WINDOW`` entries form a covering set
of every operator family (the external correctness harness verifies a
bounded prefix of the registry; round 1 proved only the first 50 entries
get driver verdicts, leaving 43 queries with local-only evidence).

Ordering policy (round 9 — planner-generated via
``python -m scripts.plan_rotation 9`` at the 181-query registry, after
the round-9 additions were registered; VERDICT r8 item 2 plus the
ADVICE note to regenerate at the final registry state):

- Slots 1-3 (MUST): the round-9 additions, in-window from birth —
  ``dsir_bigram_selected_docs`` (hashed-bigram DSIR, the paper's
  fidelity form, md5-bucketed so DuckDB replays the model),
  ``media_flac_stereo_features`` (all four stereo channel assignments
  under the value gate), ``media_tiff_features`` (baseline TIFF, the
  eleventh real codec: both byte orders, PackBits, WhiteIsZero).
- Slots 4-6 are also NEW r9 — ``knn_opq_fixed`` (the OPQ rotate+PQ
  pipeline against a fixed 2x2-block rotation),
  ``media_tiff_lzw_features`` (TIFF §13 LZW: MSB-first codes,
  early-change widths, clear-reset) and
  ``media_adpcm_stereo_features`` (stereo IMA: per-channel headers,
  4-byte channel-group interleave).
- Slots 9-12: round-9 implementation changes (plus the
  ``media_png_features`` filler below, whose 8-bit decode path was
  refactored for the 16-bit support) re-windowed for
  post-change verdicts (the round-6/7 hint-drop precedent):
  ``dsir_selected_docs`` (dsir_importance_weights restructured for
  ngram/hasher), ``knn_ivf_pq_fixed`` (ADC loud-failure guard),
  ``media_adpcm_features`` / ``media_ms_adpcm_features``
  (wSamplesPerBlock now required — ADVICE r8).
- Slots 13-34: one representative per family the MUST set misses,
  oldest verdicts first (16 of them r5-verdict — the aging cohort the
  round-8 close pre-enumerated). ``parts_bought_together`` /
  ``status_pivot`` / ``orders_validation_report`` are sole members of
  their families; the first and last recur here, ``status_pivot``'s
  family (q_pivot) is covered by ``unpivot_lineitem_metrics``.
- Slots 35-50: oldest-verdict fillers — 16 more r5-verdict queries.
  29 of the 39 r5-verdict queries land in this window; the other ten
  (``windowed_funnel_levels``, ``status_code_histogram``,
  ``order_value_running``, ``price_quantile_sketch``,
  ``recent_window_topk``, ``sessionized_set_ops``, ``token_array_ops``,
  ``top_tokens``, ``user_interarrival_stats``, ``wayback_timestamps``)
  are the planner's projected round-10 MUST entries (the printed
  projection — guaranteed slots next round because MUST precedes reps
  and fillers; 10 + reps fits the window with ~19 slots to spare).
- The rotation debt guard (tests/test_registry_order.py::
  test_no_query_strands_beyond_k_rounds) asserts zero strands at the
  max CHECKED-IN CORRECTNESS round (the enforceable end-of-round
  invariant — VERDICT r5 item 1) and reports the next-round projection
  as a non-failing warning; the bound constant lives in
  scripts/plan_rotation.py (``FRESHNESS_BOUND = 4``).

Retired windows (rounds 1-7) are recorded in ROUNDLOG.md and git history.
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

#: Size of the external harness's verification prefix (empirical, round 1).
DRIVER_WINDOW = 50

#: Names pinned to the front of the registry, in order. Everything not
#: listed keeps its registration order after these.
PRIORITY: tuple[str, ...] = (
    # -- MUST: round-9 additions, in-window from birth (planner sect. 1)
    "dsir_bigram_selected_docs",  # q_pipeline: NEW r9 — hashed-bigram DSIR
    "media_flac_stereo_features",  # q_crawl: NEW r9 — 4 stereo assignments
    "media_tiff_features",  # q_crawl: NEW r9 — TIFF, the 11th codec
    "knn_opq_fixed",  # q_similarity: NEW r9 — OPQ rotate+PQ pipeline
    "media_tiff_lzw_features",  # q_crawl: NEW r9 — TIFF LZW arm
    "media_adpcm_stereo_features",  # q_crawl: NEW r9 — stereo IMA ADPCM
    "media_png16_features",  # q_crawl: NEW r9 — 16-bit PNG (bpp 2/6 filters)
    "media_ms_adpcm_stereo_features",  # q_crawl: NEW r9 — stereo MS ADPCM
    # -- round-9 implementation changes re-windowed (post-change verdicts)
    "dsir_selected_docs",  # dsir_importance_weights restructured (ngram)
    "knn_ivf_pq_fixed",  # ADC lookup-miss loud-failure guard added
    "media_adpcm_features",  # wSamplesPerBlock now required (IMA)
    "media_ms_adpcm_features",  # wSamplesPerBlock now required (MS)
    # -- family reps, oldest verdicts first (planner section 2) ----------
    "purchase_attribution",  # q_behavior, r5
    "doc_lm_perplexity",  # q_corpus, r5
    "dedup_minhash_lsh_pairs",  # q_dedup, r5
    "orders_scd2_incremental",  # q_diff, r5
    "event_type_dist_users",  # q_events, r5
    "host_graph_kcore",  # q_graph, r5
    "active_sessions_at_purchase",  # q_interval, r7
    "clicks_before_purchase",  # q_joins_advanced, r6
    "parts_bought_together",  # q_market, r8 — sole member, recurs
    "unpivot_lineitem_metrics",  # q_pivot, r7
    "launch_ts_and_source_tags",  # q_schedule, r5
    "native_session_window_stats",  # q_sessions, r7
    "embedding_density_dedup",  # q_similarity, r5
    "cms_token_estimates",  # q_sketch, r5
    "doc_span_excision",  # q_spans, r6
    "equi_depth_price_bins",  # q_sql_extra, r5
    "annotation_regex_classes",  # q_text, r5
    "hourly_series_filled",  # q_timeseries, r6
    "customer_order_left_join",  # q_tpch, r5
    "disjunctive_part_revenue",  # q_tpch2, r6
    "discount_revenue_forecast",  # q_tpch3, r5
    "orders_validation_report",  # q_validate, r8 — sole member, recurs
    # -- oldest-verdict fillers (planner section 3): 16 r5-verdict -------
    "balanced_shard_stats",  # q_pipeline, r5
    "customers_with_open_orders",  # q_tpch, r5
    "customers_without_orders",  # q_tpch, r5
    "dedup_ngram_jaccard",  # q_dedup, r5
    "doc_fingerprints",  # q_text, r5
    "doc_lang_id",  # q_text, r5
    "doc_quality",  # q_text, r5
    "embedding_norms",  # q_similarity, r5
    "formatted_log_lines",  # q_events, r5
    "heavy_hitter_keys",  # q_sketch, r5
    "hist_median_by_type",  # q_events, r5
    "lang_source_rollup",  # q_text, r5
    "media_jpeg_features",  # q_crawl, r5
    "media_png_features",  # q_crawl, r5
    "media_wav_features",  # q_crawl, r5
    "null_coalesce_projection",  # q_events, r5
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
