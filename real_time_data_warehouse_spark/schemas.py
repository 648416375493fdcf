"""Central schema registry (SURVEY.md §7.1: "all StructTypes from §1").

Single import point for every fixed schema in the engine — the reference
hand-declares these per app (DDL strings / POJOs); here each is declared
once and re-exported where used.
"""

from real_time_data_warehouse_spark.operators.multimodal import (  # noqa: F401
    EXTRACT_SCHEMA,
    MEDIA_SCHEMA,
)
from real_time_data_warehouse_spark.operators.projections import (  # noqa: F401
    PROPS_MAP,
)
from real_time_data_warehouse_spark.sources.cdc import (  # noqa: F401
    DEBEZIUM_SCHEMA,
    MAXWELL_SCHEMA,
)
from real_time_data_warehouse_spark.streaming.pipelines import (  # noqa: F401
    EVENTS_RAW_SCHEMA,
)
from real_time_data_warehouse_spark.streaming.stateful import (  # noqa: F401
    RETURNING_OUTPUT,
    VISITOR_OUTPUT,
)
