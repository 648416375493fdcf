"""Source builders: CDC envelopes, Kafka (gated), streaming file sources."""

from real_time_data_warehouse_spark.sources.cdc import (  # noqa: F401
    DEBEZIUM_SCHEMA,
    MAXWELL_SCHEMA,
    parse_debezium,
    parse_maxwell,
    synthetic_cdc_json,
)
from real_time_data_warehouse_spark.sources.files import (  # noqa: F401
    EVENTS_FILE_SCHEMA,
    read_events_csv,
    read_events_jsonl,
    stream_events_jsonl,
    write_events_jsonl,
)
