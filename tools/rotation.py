#!/usr/bin/env python
"""Propose the next round's MANIFEST ordering from driver history.

Reads every CORRECTNESS_r*.json in the repo root, computes each query's
most recent hard signal (the round whose file contains a green row for
it), and prints a freshness-ordered manifest:

    1. never driver-verified (registration order preserved)
    2. stalest signal first among the verified
    3. ties keep current MANIFEST order (stable)

The first DRIVER_CAP entries are the proposed hard-signal slots. This
does NOT modify registry.py — paste the output and update
tests/test_registry_manifest.py tiers deliberately; rotation is a
reviewed decision, not a side effect.

    python tools/rotation.py [--cap 50]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def last_green_round(name: str, history: dict[int, dict]) -> int | None:
    best = None
    for rnd, rows in history.items():
        v = rows.get(name)
        if v and v.get("rows_match") and v.get("schema_match"):
            best = rnd if best is None else max(best, rnd)
    return best


def main() -> int:
    cap = 50
    if "--cap" in sys.argv:
        cap = int(sys.argv[sys.argv.index("--cap") + 1])

    from real_time_data_warehouse_spark.registry import MANIFEST

    history: dict[int, dict] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            history[int(m.group(1))] = json.load(f)

    order = {name: i for i, name in enumerate(MANIFEST)}
    keyed = []
    for name in MANIFEST:
        rnd = last_green_round(name, history)
        # never-verified sort first (freshness -1), then stalest round
        keyed.append(((rnd is not None, rnd or 0, order[name]), name, rnd))
    keyed.sort()

    print(f"# proposed manifest (cap={cap}; rounds seen: "
          f"{sorted(history)})")
    for i, (_, name, rnd) in enumerate(keyed):
        marker = " # --- slot boundary ---" if i == cap else ""
        signal = f"r{rnd}" if rnd is not None else "NEVER"
        print(f'    "{name}",  # {signal}{marker}')
    never = [n for _, n, rnd in keyed if rnd is None]
    print(f"# never-verified: {len(never)}; in-cap: "
          f"{sum(1 for _, n, rnd in keyed[:cap] if rnd is None)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
