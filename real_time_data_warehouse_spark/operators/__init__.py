"""Operator modules. Importing a module registers its queries."""

from __future__ import annotations

import importlib

# Registration order == the order the driver's correctness harness visits
# queries. The round-1 run truncated partway (everything after the 50th
# registered query got no correctness row), so the families that r01 left
# unverified (dedup/similarity/text/multimodal/sql apps) now register
# FIRST: if a truncation recurs, the driver signal lands on the queries
# that never had one, instead of re-proving the p*/j* rows r01 already
# verified. Local tests sort alphabetically and are order-independent.
_MODULES = (
    "dedup",
    "similarity",
    "textanalysis",
    "multimodal",
    "sql_apps",
    "curation",  # composes d7/t1/t2/t3 — must load after them
    "projections",
    "joins",
    "aggregations",
    "stateful",
    "fanout",
    "scalar",
    "serving",
)

_loaded = False


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(f"real_time_data_warehouse_spark.operators.{mod}")
    _loaded = True
