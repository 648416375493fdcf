"""PySpark-native real-time data-warehouse engine.

A brand-new engine with the query/data-processing capabilities of the
reference real-time data warehouse (LQJ233/Real-time-data-warehouse, a
Flink 1.17 layered streaming DW — see SURVEY.md), re-expressed Spark-first:

- DataFrame/SQL on Catalyst for every projection, filter, join, window and
  aggregation (the reference's per-record Flink plumbing maps onto
  declarative plans; Catalyst/Tungsten pick the physical strategy).
- Structured Streaming (watermarks, ``dropDuplicates`` state,
  ``applyInPandasWithState``) for the stateful record-at-a-time operators.
- Parquet lakehouse tables (Delta-ready: the sink layer upgrades to Delta
  MERGE/CDF when ``delta-spark`` is on the classpath) in place of
  HBase/Doris/upsert-Kafka.

Layout:
- ``registry``   — single source of truth: every operator registers a Spark
  callable + a DuckDB oracle SQL string; ``__spark_entry__.py`` and the test
  suite both derive from it.
- ``operators/`` — pure DataFrame→DataFrame query functions (SURVEY.md §2).
- ``functions/`` — reusable Column-expression helpers (time, hashing, text).
- ``sources/``   — CDC envelopes, Kafka/file source builders.
- ``streaming/`` — Structured Streaming shells for the pipeline topologies.
- ``plans/``     — plan-audit helpers (explain, broadcast/pushdown checks).
"""

from real_time_data_warehouse_spark.registry import (  # noqa: F401
    QUERY_REGISTRY,
    oracle_map,
    query_map,
)

__version__ = "0.1.0"
