"""Rotation planner: compute the recommended next-round PRIORITY window.

    python -m scripts.plan_rotation [next_round]

Reads the checked-in CORRECTNESS_r*.json verdicts and the live REGISTRY,
then reproduces the rotation policy the round logs describe:

1. MUST: every query whose latest driver verdict would age past the
   freshness bound at ``next_round`` if left un-windowed, ordered
   OLDEST VERDICT FIRST. If MUST plus the family reps exceed the
   window, the YOUNGEST must-entries are deferred (reported in
   ``deferred`` — a loud over-capacity signal, never a silent
   truncation); family coverage is non-negotiable.
2. REPS: one representative per family the kept MUST set misses,
   preferring the OLDEST verdicts (pays the following round's debt down
   early); sole-member families recur every round by construction.
   Reps are inserted INSIDE the window cap, before any filler.
3. FILLERS: oldest-verdict queries to fill the window to DRIVER_WINDOW,
   again shrinking the following round's aging set.

Policy history: rounds 1-7 ran a 3-round bound; at 168 registered
queries that bound is mathematically unsatisfiable (168 > 50 slots x 3
rounds = 150 capacity), so round 8 adopted the 4-round bound
(capacity 200) the round-7 judge prescribed. The guard in
tests/test_registry_order.py enforces the same constant via
``FRESHNESS_BOUND`` below.

Changes/additions made during the round still have to be swapped in by
hand (the planner cannot know what you changed) — the printed plan
reserves nothing for them, so treat FILLERS as the donation pool, last
entries first. Prints the slot list with verdict ages plus the projected
aging set ONE round further out under the recommended window.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl_streams_spark.plans import DRIVER_WINDOW, REGISTRY  # noqa: E402

#: Freshness bound (rounds) the rotation guard enforces. 4 rounds gives
#: 50 x 4 = 200 slots of steady-state capacity over the registry; raise
#: it (or tier the policy) before the registry passes that size.
FRESHNESS_BOUND = 4


def _last_verdicts(root: str) -> tuple[int, dict[str, int]]:
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


def _family(name: str) -> str:
    return REGISTRY[name].build.__module__.rsplit(".", 1)[-1]


def plan(
    next_round: int,
    _verdicts: tuple[int, dict[str, int]] | None = None,
) -> dict:
    """Compute the recommended window. ``_verdicts`` overrides the
    checked-in (max_round, last-verdict map) — the seam the overflow
    stress tests use to simulate MUST sets larger than the window."""
    if _verdicts is not None:
        max_round, last = _verdicts[0], dict(_verdicts[1])
    else:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        max_round, last = _last_verdicts(root)
    # The in-flight round's verdicts have not landed yet, but the CURRENT
    # window's queries WILL receive them — model that, or every
    # just-verified query looks stale and the plan re-windows the whole
    # current prefix.
    in_flight = next_round - 1
    if in_flight > max_round:
        for n in list(REGISTRY)[:DRIVER_WINDOW]:
            last[n] = max(last.get(n, 0), in_flight)

    def age(n: str) -> int:
        return next_round - last.get(n, -999)

    by_oldest = sorted(REGISTRY, key=lambda n: (last.get(n, 0), n))
    all_fams = {_family(n) for n in REGISTRY}

    # MUST, oldest verdict first — if the window overflows, the youngest
    # (least urgent) entries defer, never the oldest.
    must = [n for n in by_oldest if age(n) > FRESHNESS_BOUND]

    # Fix-point: family reps depend on which MUST entries are kept, and
    # the keep count depends on how many reps are needed. Shrink the
    # kept-MUST prefix until kept + reps fit the window.
    def reps_for(kept: list[str]) -> list[str]:
        covered = {_family(n) for n in kept}
        return [
            next(n for n in by_oldest if _family(n) == fam)
            for fam in sorted(all_fams - covered)
        ]

    keep = min(len(must), DRIVER_WINDOW)
    while keep > 0:
        reps = reps_for(must[:keep])
        if keep + len(reps) <= DRIVER_WINDOW:
            break
        keep -= 1
    else:
        reps = reps_for([])
    kept_must = must[:keep]
    deferred = must[keep:]
    assert len(kept_must) + len(reps) <= DRIVER_WINDOW, (
        "family coverage alone exceeds DRIVER_WINDOW — the window is "
        "structurally too small for the registry's family count"
    )

    window = kept_must + reps
    wset = set(window)
    fillers = []
    for n in by_oldest:
        if len(window) >= DRIVER_WINDOW:
            break
        if n not in wset:
            fillers.append(n)
            window.append(n)
            wset.add(n)

    assert len(window) == min(DRIVER_WINDOW, len(REGISTRY))
    assert {_family(n) for n in window} == all_fams, (
        "planned window fails family coverage — planner bug"
    )
    next_next = sorted(
        n
        for n in REGISTRY
        if n not in wset
        and (next_round + 1) - last.get(n, -999) > FRESHNESS_BOUND
    )
    return {
        "must": must,
        "kept_must": kept_must,
        "deferred": deferred,
        "reps": reps,
        "fillers": fillers,
        "window": window,
        "projection_next": next_next,
        "last": last,
    }


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    max_round, _ = _last_verdicts(root)
    next_round = int(sys.argv[1]) if len(sys.argv) > 1 else max_round + 1
    p = plan(next_round)
    last = p["last"]

    def show(names, label):
        print(f"\n# {label} ({len(names)})")
        for n in names:
            print(f"    \"{n}\",  # {_family(n)}, r{last.get(n, '?')}")

    print(f"recommended round-{next_round} window "
          f"({len(p['window'])}/{DRIVER_WINDOW} slots):")
    show(p["kept_must"], f"MUST — age past the {FRESHNESS_BOUND}-round "
                         "bound (oldest verdicts first)")
    if p["deferred"]:
        show(p["deferred"], "DEFERRED — over capacity, could not be "
                            "windowed; the freshness policy is "
                            "unsatisfiable this round")
    show(p["reps"], "family reps (oldest verdicts)")
    show(p["fillers"], "fillers (oldest verdicts; donate slots to "
                       "round changes/additions from the END)")
    print(f"\nprojected round-{next_round + 1} aging set under this window "
          f"({len(p['projection_next'])}):")
    print("  " + ", ".join(p["projection_next"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
