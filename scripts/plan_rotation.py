"""Rotation planner: compute the recommended next-round PRIORITY window.

    python -m scripts.plan_rotation [next_round]

Reads the checked-in CORRECTNESS_r*.json verdicts and the live REGISTRY,
then reproduces the rotation policy the round logs describe:

1. MUST: every query whose latest driver verdict would age past the
   3-round freshness bound at ``next_round`` if left un-windowed.
2. REPS: one representative per family the MUST set misses, preferring
   the OLDEST verdicts (pays the following round's debt down early);
   sole-member families recur every round by construction.
3. FILLERS: oldest-verdict queries to fill the window to DRIVER_WINDOW,
   again shrinking the following round's aging set.

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

_BOUND = 3  # freshness bound (rounds) the rotation guard enforces


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


def plan(next_round: int) -> dict:
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

    must = sorted(n for n in REGISTRY if age(n) > _BOUND)
    window = list(must)
    covered = {_family(n) for n in window}
    by_oldest = sorted(REGISTRY, key=lambda n: (last.get(n, 0), n))
    reps = []
    for fam in sorted({_family(n) for n in REGISTRY} - covered):
        pick = next(n for n in by_oldest if _family(n) == fam)
        reps.append(pick)
        window.append(pick)
    fillers = []
    for n in by_oldest:
        if len(window) >= DRIVER_WINDOW:
            break
        if n not in window:
            fillers.append(n)
            window.append(n)
    window = window[:DRIVER_WINDOW]
    wset = set(window)
    next_next = sorted(
        n
        for n in REGISTRY
        if n not in wset and (next_round + 1) - last.get(n, -999) > _BOUND
    )
    return {
        "must": must,
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
    show(p["must"], f"MUST — age past the {_BOUND}-round bound")
    show(p["reps"], "family reps (oldest verdicts)")
    show(p["fillers"], "fillers (oldest verdicts; donate slots to "
                       "round changes/additions from the END)")
    print(f"\nprojected round-{next_round + 1} aging set under this window "
          f"({len(p['projection_next'])}):")
    print("  " + ", ".join(p["projection_next"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
