#!/usr/bin/env python
"""Driver simulation — the t2 correctness gate run locally.

Mirrors the driver: vanilla SparkSession, ``entry()`` smoke, every
``queries()`` entry at sf0.01 compared against its ``oracle_sql()`` via
DuckDB (sorted-column, order-insensitive value comparison). Exit 0 iff
everything matches.

    python tools/driver_sim.py [sf_dir] [query_substring ...]

Optional query_substring args filter the sweep to matching query names
(e.g. `python tools/driver_sim.py /root/testdata/sf0.01 a13 d2c`) for
fast iteration on a single operator.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()

    import __spark_entry__ as entry_mod
    from conftest import make_duck
    from parity import compare

    rows = entry_mod.entry(spark).collect()
    print(f"ENTRY: {len(rows)} rows")
    assert len(rows) > 0

    qmap, omap = entry_mod.queries(), entry_mod.oracle_sql()
    con = make_duck(sf_dir)
    fails: list[str] = []
    t0 = time.time()
    for name, fn in sorted(qmap.items()):
        if only and not any(sub in name for sub in only):
            continue
        tq = time.time()
        df = fn(spark, sf_dir)
        if name not in omap:
            n = df.count()
            print(f"  {name}: rows-only, {n} rows  [{time.time() - tq:5.1f}s]")
            continue
        ok, msg = compare(df, con, omap[name])
        dt = time.time() - tq
        if ok:
            print(f"  ok {name}  [{dt:5.1f}s]")
        else:
            fails.append(name)
            print(f"  FAIL {name} [{dt:5.1f}s]: {msg[:300]}")
    n_run = len(qmap) if not only else sum(
        1 for n in qmap if any(sub in n for sub in only)
    )
    print(f"TOTAL {n_run} queries, {len(fails)} fails, {time.time() - t0:.1f}s")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
