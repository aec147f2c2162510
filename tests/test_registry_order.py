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
    # Queries that have never had a driver verdict (round-4-close
    # additions) plus implementations changed in round 5 must sit in the
    # driver's verification prefix.
    for name in (
        # never driver-verified — first verdicts this round
        "purchase_attribution",
        "user_interarrival_stats",
        "decayed_event_counts",
        # added in round 5 — in-window from birth
        "windowed_funnel_levels",
        "embedding_density_dedup",
        "orders_scd2_incremental",
        "media_jpeg_features",
        "media_png_features",  # round-5 continuation — in-window from birth
        "heavy_hitter_keys",  # round-5 continuation — in-window from birth
        "doc_lm_perplexity",
        "media_wav_features",  # round-free decode + analytic oracle
        # round-5-changed implementations
        "host_graph_kcore",  # value-oracled via unrolled 40-round peel
        "host_graph_distances",  # bfs fixed-point-at-cap re-check
        "dedup_cluster_assignment",  # CC fixed-point-at-cap re-check
        "dedup_minhash_lsh_pairs",  # raw-table estimate sample + memo
        "balanced_shard_stats",  # global_rank NULL-desc bucket fix
        "equi_depth_price_bins",  # global_rank NULL-desc bucket fix
        # (customer_rfm_scores and doc_length_quantile_norm — the 3rd
        # and 4th global_rank consumers — yielded their slots to
        # heavy_hitter_keys and price_quantile_sketch: both r4-verified,
        # primitive still re-verified by one consumer per module family)
        "price_quantile_sketch",  # round-5 continuation — in-window from birth
    ):
        assert name in window, name


def _last_verdict_rounds() -> tuple[int, dict[str, int]]:
    """(current build round, query -> latest driver-verdict round), derived
    from the checked-in CORRECTNESS_r*.json files the driver writes."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    max_round = 0
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        with open(path) as f:
            for name in json.load(f):
                last[name] = max(last.get(name, 0), rnd)
    return max_round + 1, last


def test_no_query_strands_beyond_k_rounds():
    """Rotation debt guard (VERDICT r3 item 8): with a 50-slot window over
    148+ queries the rotation cycle is 3 rounds — any registered query NOT
    in the current window must hold a driver verdict at most 3 rounds old,
    otherwise this round's PRIORITY strands it the way round 3's
    continuation additions were stranded."""
    current, last = _last_verdict_rounds()
    window = set(list(REGISTRY)[:DRIVER_WINDOW])
    stranded = sorted(
        name
        for name in REGISTRY
        if name not in window and current - last.get(name, -999) > 3
    )
    assert not stranded, (
        f"round-{current} window strands {len(stranded)} queries past the "
        f"3-round verdict-freshness bound: {stranded} — rotate them into "
        "PRIORITY (crawl_streams_spark/plans/__init__.py)"
    )


def test_no_query_lost_by_reorder():
    # 156 registered queries as of round 5; update deliberately when
    # adding.
    assert len(REGISTRY) >= 156
