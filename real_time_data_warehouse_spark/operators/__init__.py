"""Operator modules. Importing a module registers its queries."""

from __future__ import annotations

import importlib

_MODULES = (
    "projections",
    "joins",
    "aggregations",
    "stateful",
    "fanout",
    "scalar",
    "serving",
    "dedup",
    "similarity",
    "textanalysis",
    "multimodal",
    "sql_apps",
)

_loaded = False


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(f"real_time_data_warehouse_spark.operators.{mod}")
    _loaded = True
