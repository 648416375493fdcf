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

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def weighted_cents_sum(v: pd.Series, w: pd.Series) -> int:
    """Exact integer partial: sum(w * floor(v*100 + 0.5)).

    floor(x+0.5) is the repo's quantization idiom (half-UP, identical
    in numpy, Spark and DuckDB) — pandas ``Series.round`` would be
    half-to-EVEN, which agrees with DuckDB ROUND only when the input
    is exactly 2-decimal; a true half-cent value would diverge
    silently, so the lattice op is made explicit on both sides."""
    cents = np.floor(v.mul(100).add(0.5)).astype("int64")
    return int((cents * w).sum())


@pandas_udf("long")
def weight_sum(w: pd.Series) -> int:
    return int(w.sum())
