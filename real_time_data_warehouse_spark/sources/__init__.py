"""Source builders: CDC envelopes, Kafka (gated), streaming file sources."""

from real_time_data_warehouse_spark.sources.cdc import (  # noqa: F401
    DEBEZIUM_SCHEMA,
    MAXWELL_SCHEMA,
    parse_debezium,
    parse_maxwell,
    synthetic_cdc_json,
)
