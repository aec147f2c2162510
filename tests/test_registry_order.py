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
    # Implementations changed in rounds 6-7 that still lack a
    # post-change driver verdict must sit in the verification prefix
    # (additions take a slot from birth — the round-4 lesson).
    for name in (
        # round-6 hint-policy touches verified only locally at r6 close
        # (VERDICT r6 item 1): re-verify under the driver now
        "nation_trade_volume",
        "nation_product_profit",
        "top_unshipped_orders",
        "nation_market_share",
        "pareto_price_size_parts",
        # round-7 pointer-jump rewrite in cluster_duplicates
        "dedup_cluster_assignment",
        "cluster_golden_records",
        # round-7 ADDITION — in-window from birth (round-4 lesson)
        "dedup_collapsed_lsh_pairs",
        "leakage_safe_split_assign",
        "source_share_capped_counts",
        "token_budget_selection",
        "media_bmp_features",
        "native_session_window_stats",
        "unpivot_lineitem_metrics",
        "media_g711_features",
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
    return max_round, last


def test_no_query_strands_beyond_k_rounds():
    """Rotation debt guard (VERDICT r3 item 8, re-specced per VERDICT r5
    item 1): with a 50-slot window over 150+ queries the rotation cycle
    is 3 rounds — any registered query NOT in the current window must
    hold a driver verdict at most 3 rounds old.

    The HARD assertion evaluates at the max CHECKED-IN CORRECTNESS round
    (the state the driver actually verified), so end-of-round states stay
    green both before AND after the driver's artifact lands. The
    next-round projection — what the NEXT rotation must pick up — is
    surfaced as a non-failing warning instead of an assert: the old
    `current = max + 1` assert made every end-of-round state red the
    moment the driver's file landed, which no rotation timing could
    avoid (rotating earlier would have un-windowed the in-flight round)."""
    import warnings

    max_round, last = _last_verdict_rounds()
    window = set(list(REGISTRY)[:DRIVER_WINDOW])

    def stranded_at(rnd: int) -> list[str]:
        return sorted(
            name
            for name in REGISTRY
            if name not in window and rnd - last.get(name, -999) > 3
        )

    stranded = stranded_at(max_round)
    assert not stranded, (
        f"at checked-in round {max_round} the window strands "
        f"{len(stranded)} queries past the 3-round verdict-freshness "
        f"bound: {stranded} — rotate them into PRIORITY "
        "(crawl_streams_spark/plans/__init__.py)"
    )
    projection = stranded_at(max_round + 1)
    if projection:
        warnings.warn(
            f"round-{max_round + 1} rotation must window "
            f"{len(projection)} queries aging past the freshness bound: "
            f"{projection}",
            stacklevel=1,
        )


def test_no_query_lost_by_reorder():
    # 166 registered queries as of round 7 (collapsed LSH, leakage-safe
    # split, domain capping, token-budget selection, BMP decode, native
    # session_window gate, unpivot gate, G.711 decode added).
    assert len(REGISTRY) >= 168


def test_rotation_planner_invariants():
    """scripts/plan_rotation.py must propose a full, family-covering
    window whose MUST set equals the rotation guard's projection — the
    tool future rounds build PRIORITY from cannot drift from the
    enforced policy."""
    from scripts.plan_rotation import plan

    max_round, last = _last_verdict_rounds()
    # plan the round AFTER the in-flight one (max checked-in + 1 is the
    # round currently being verified; the planner models its pending
    # verdicts for the current window)
    next_round = max_round + 2
    p = plan(next_round)
    assert len(p["window"]) == DRIVER_WINDOW
    assert len(set(p["window"])) == DRIVER_WINDOW
    fams = {_family(n) for n in REGISTRY}
    assert {_family(n) for n in p["window"]} == fams
    # MUST == the guard's projection with the in-flight round credited
    # to the current window
    window_now = set(list(REGISTRY)[:DRIVER_WINDOW])
    eff = dict(last)
    for n in window_now:
        eff[n] = max(eff.get(n, 0), next_round - 1)
    projected = sorted(
        n for n in REGISTRY if next_round - eff.get(n, -999) > 3
    )
    assert p["must"] == projected
    # the proposed window leaves nothing stranded at next_round itself
    wset = set(p["window"])
    stranded = [
        n
        for n in REGISTRY
        if n not in wset and next_round - eff.get(n, -999) > 3
    ]
    assert not stranded
