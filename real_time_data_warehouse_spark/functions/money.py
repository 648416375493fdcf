"""Decimal-stable money math.

The reference does money math in BigDecimal / decimal(16,2)
(TradeSkuOrderBean.java:47-55, DwdTradeOrderDetail.java:40-41). We mirror
that discipline for a second reason: decimal addition is exact and
associative, so a Spark partial-aggregate tree and DuckDB's single-threaded
sum produce bit-identical results — double sums would differ in the last
ulps depending on reduction order. Aggregate in DECIMAL(18,2), then cast the
*final* value back to DOUBLE so both engines expose a plain float64 column
with an identical value (< 2^53, exact conversion).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL_T = "decimal(18,2)"

# Scale for *computed* doubles (e.g. price × (1-discount), two 2-decimal
# factors → exact 4-decimal product). Casting at the exact scale means no
# rounding happens in either engine; casting a computed double at scale 2
# WOULD round, and Spark (BigDecimal of the shortest string repr, HALF_UP)
# and DuckDB (binary value, round-half-even) can disagree by one ulp of the
# target scale. Raw 2-decimal columns are safe at scale 2 for the same
# reason: the cast is exact.
DECIMAL_EXACT_T = "decimal(18,4)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DECIMAL_T)


def dec4(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DECIMAL_EXACT_T)


def dec_sum(col: Column | str, alias: str) -> Column:
    """sum over decimal(18,2), surfaced as double. Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS alias``."""
    return F.sum(dec(col)).cast("double").alias(alias)


def oracle_dec_sum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"
