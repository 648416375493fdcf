"""Table loading for the synthetic star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under an sf dir.

Scale notes (100 TB posture):
- Fact tables (``lineitem``, ``orders``, ``events``, ``documents``) are read
  as plain scans; filters/projections in the operators reach the parquet
  reader via Catalyst pushdown (verified by ``plans.audit``).
- Dim tables (``region nation customer supplier part``) are small by star-
  schema construction; operators wrap them in ``broadcast()`` at the join
  site (SURVEY.md §2.3 J5-J7) so no shuffle is induced on the fact side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from real_time_data_warehouse_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dims that are always broadcast-safe (bounded cardinality by schema design).
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Session-scoped plan cache: (applicationId, sf_dir, table) → DataFrame.
# A loaded table is an immutable logical plan over an immutable fixture
# dir (the driver regenerates /root/testdata only BETWEEN rounds, never
# inside a process), so rebuilding it per query call pays a fresh file
# listing + a dtype-probe analysis roundtrip for nothing — measured
# 0.13-0.27 s per table at sf0.1, which made the 5-table j6 dim chain
# spend ~1.7 s CONSTRUCTING a 1.0 s query (round-12 j6 drift
# adjudication; the regression was driver-side, not the plan). Entries
# are keyed by applicationId so a stopped-and-recreated session never
# serves dead JVM references. NOT for mutable dirs: anything with
# update-in-place semantics (j16's refreshed dim store, the LWW dim
# stores) must keep re-reading its directory per batch — this cache is
# exactly the stale-file-listing trap j16 exists to avoid, safe here
# only because the fixture tables are frozen for the process lifetime.
_LOAD_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    tune(spark)
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _LOAD_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # W6 "ts unit normalization" discipline (SURVEY.md §2.5): the reference
    # mixes epoch seconds and millis per topic; the fixture generator has
    # emitted both TIMESTAMP(NANOS) (rounds 1-3, arrives as bigint nanos
    # under nanosAsLong) and plain TIMESTAMP micros (round 4+, arrives as
    # TIMESTAMP_NTZ under inferTimestampNTZ). Normalize every time-typed
    # column to session-TZ TimestampType (UTC session → identical values)
    # so downstream operators see ONE type regardless of generator vintage.
    from pyspark.sql import functions as F

    for col, dtype in df.dtypes:
        if col == "ts" and dtype == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    _LOAD_CACHE[key] = df
    return df


class Tables:
    """Lazy accessor: ``t = Tables(spark, sf_dir); t.lineitem``."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = tune(spark)
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in self._cache:
            self._cache[name] = load(self.spark, self.sf_dir, name)
        return self._cache[name]

    def register_views(self) -> None:
        """Register every table as a temp view (for spark.sql queries)."""
        for name in TABLES:
            getattr(self, name).createOrReplaceTempView(name)
