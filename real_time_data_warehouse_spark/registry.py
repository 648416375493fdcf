"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions)
registers here a Spark callable ``(spark, sf_dir) -> DataFrame`` and,
when SQL-expressible, an equivalent ANSI-SQL string for the DuckDB oracle.
``__spark_entry__.py::queries()/oracle_sql()`` and the pytest parity suite
are both thin views over this registry.

Contract invariants enforced by design here and asserted in tests:
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before hashing);
- aggregates over double measures go through DECIMAL(18,2) so the result is
  associativity-independent and engine-independent, then cast back to
  DOUBLE for a stable schema.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    survey: str  # SURVEY.md §2 row id(s), e.g. "J1" or "A1,W1,W7"
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERY_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    *,
    oracle: str | None,
    survey: str,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERY_REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        QUERY_REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, survey=survey,
            doc=doc or (fn.__doc__ or ""), tags=tags,
        )
        return fn
    return deco


def _load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from real_time_data_warehouse_spark import operators  # noqa: F401

    operators.load_all()


def query_map() -> dict[str, QueryFn]:
    _load_all()
    return {name: q.fn for name, q in QUERY_REGISTRY.items()}


def oracle_map() -> dict[str, str]:
    _load_all()
    return {
        name: q.oracle for name, q in QUERY_REGISTRY.items() if q.oracle is not None
    }
