"""Pin the registry ordering contract: the external harness verifies only a
bounded prefix of the registry (DRIVER_WINDOW entries), so that prefix must
cover every operator family and every implementation changed this round.

No SparkSession needed — pure registry introspection.
"""

from crawl_streams_spark.plans import DRIVER_WINDOW, PRIORITY, REGISTRY


def _family(name: str) -> str:
    return REGISTRY[name].build.__module__.rsplit(".", 1)[-1]


def test_priority_names_all_registered():
    assert set(PRIORITY) <= set(REGISTRY)
    assert len(set(PRIORITY)) == len(PRIORITY)


def test_priority_is_registry_prefix():
    assert tuple(REGISTRY)[: len(PRIORITY)] == PRIORITY
    assert len(PRIORITY) == DRIVER_WINDOW


def test_driver_window_covers_every_family():
    all_families = {_family(n) for n in REGISTRY}
    window_families = {_family(n) for n in list(REGISTRY)[:DRIVER_WINDOW]}
    assert window_families == all_families


def test_round_changed_queries_in_window():
    window = set(list(REGISTRY)[:DRIVER_WINDOW])
    # Implementations touched in round 3 must be re-verified by the driver,
    # and r2-new queries need their FIRST driver verdict.
    for name in (
        "dedup_minhash_lsh_pairs",  # r3: verify-join slim-broadcast restructure
        "dedup_minhash_est_jaccard",  # r2-new: no driver verdict yet
        "zorder_curve",  # r3-new: Z-order layout key math
        "pq_codes_fixed_book",  # r3-new: PQ encoding kernel
        "semantic_dedup_pairs",  # r3-new: SemDeDup kernel
        "dup_token_spans",  # r3-new: substring-level dedup spans
        "dup_span_doc_stats",  # r3-new: duplicated-coverage fractions
        "doc_unigram_freq",  # r3-new: corpus-frequency quality score
        "doc_tfidf_topk",  # r3-new: TF-IDF keyword extraction
        "host_graph_degrees",  # r3-new: link-graph degrees
        "graph_unit_propagation",  # r3-new: iterative propagation kernel
        "orders_snapshot_diff",  # r3-new: keyed CDC diff
        "snapshot_diff_summary",  # r3-new: reconciliation report
        "concurrent_sessions",  # r3-new: interval-overlap bucketed join
        "active_sessions_at_purchase",  # r3-new: point-in-interval join
        "cms_token_estimates",  # r3-new: count-min sketch kernel
        "weighted_sample_orders",  # r3-new: weighted sampling kernel
        "orders_scd2_history",  # r3-new: SCD2 run compression
        "doc_span_excision",  # r3-new: span excision + text rebuild
        "bloom_part_membership",  # r3-new: bloom build + probe kernel
        "per_source_doc_sample",  # r3-new: per-group sampling kernel
        "orders_validation_report",  # r3-new: data-quality rule report
        "host_graph_triangles",  # r3-new: triangle-counting kernel
        "hll_distinct_users",  # r3-new: oracled HLL estimator
        "media_wav_features",  # r3-new: real WAV decode path
        "funnel_conversion_by_user",  # r3-new: funnel kernel
        "daily_cohort_retention",  # r3-new: cohort retention kernel
        "term_posting_lists",  # r3-new: inverted-index kernel
        "fuzzy_part_name_pairs",  # r3-new: fuzzy similarity join
        "hourly_series_filled",  # r3-new: time-series regularization
        "kmv_distinct_users",  # r3-new: KMV/theta sketch estimator
        "dedup_cluster_assignment",  # r3-new: gated connected components
        "prefix_filter_jaccard_pairs",  # r3-new: exact prefix-filter join
        "bigram_pmi_collocations",  # r3-new: PMI collocation kernel
        "hourly_value_anomalies",  # r3-new: rolling z-score kernel
        "parts_bought_together",  # r3-new: market-basket lift kernel
        "balanced_shard_stats",  # r3-new: balanced sharding kernel
        "equi_depth_price_bins",  # r3-new: equal-frequency binning kernel
        "cluster_golden_records",  # r3-new: survivorship kernel
        "pareto_price_size_parts",  # r3-new: grouped skyline kernel
        "lineitem_price_asof_scd2",  # r3-new: point-in-time SCD2 join
        "qty_price_regression_stats",  # r3-new: exact corr/OLS kernel
    ):
        assert name in window, name


def test_no_query_lost_by_reorder():
    # 148 registered queries as of the round-3 second continuation;
    # update deliberately when adding.
    assert len(REGISTRY) >= 148
