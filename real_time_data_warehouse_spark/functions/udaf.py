"""Pandas GROUPED_AGG UDAFs (the U3 surface).

Deliberately NO ``from __future__ import annotations`` here: pandas_udf
infers the UDF kind (scalar vs grouped-agg) from evaluated type hints,
and postponed evaluation turns them into unresolvable strings
(UNSUPPORTED_SIGNATURE). Keep any pandas_udf needing hint inference in
a module like this one.

The UDAFs fold exact INTEGER partials so their merge is associativity-
independent — the property that makes a custom aggregate oracle-
checkable bit-for-bit (see operators/aggregations.py::u3).
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def weighted_cents_sum(v: pd.Series, w: pd.Series) -> int:
    """Exact integer partial: sum(w * round(v*100)) — the fixture's
    values are 2-decimal, so round(v*100) is the exact cent count in
    every engine."""
    return int((v.mul(100).round().astype("int64") * w).sum())


@pandas_udf("long")
def weight_sum(w: pd.Series) -> int:
    return int(w.sum())
