"""Reusable Column-expression helpers (all JVM-side built-ins; no Python
UDFs in any hot path — SURVEY.md §2.8/§2.9 maps the reference's scalar
functions and the IK-tokenizer UDTF onto Catalyst expressions)."""

from real_time_data_warehouse_spark.functions.money import dec, dec_sum  # noqa: F401
from real_time_data_warehouse_spark.functions.text import (  # noqa: F401
    poly_hash,
    poly_hash_sql,
    tokenize,
    tokenize_sql,
)
from real_time_data_warehouse_spark.functions.time import (  # noqa: F401
    tumble,
    window_meta,
)
