"""Event-time windowing helpers.

The reference's DWS layer uses 10 s tumbling event-time windows everywhere
(DwsTradeSkuOrderWindow.java:274 etc.) and stamps window metadata stt/edt/
cur_date as formatted strings via ProcessWindowFunction + DateFormatUtil
(SURVEY.md §2.5 W1/W7). Spark's ``window()`` expression is the native
equivalent; metadata comes from ``window.start``/``window.end``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumble(ts_col: str, duration: str = "10 seconds") -> Column:
    return F.window(F.col(ts_col), duration)


def window_meta(df: DataFrame) -> DataFrame:
    """Replace the ``window`` struct with reference-style stt/edt/cur_date
    string columns (DateFormatUtil.tsToDateTime/tsToDate analog)."""
    return (
        df.withColumn("stt", F.date_format("window.start", "yyyy-MM-dd HH:mm:ss"))
        .withColumn("edt", F.date_format("window.end", "yyyy-MM-dd HH:mm:ss"))
        .withColumn("cur_date", F.date_format("window.start", "yyyy-MM-dd"))
        .drop("window")
    )


def oracle_tumble(ts_expr: str, seconds: int) -> str:
    """DuckDB twin of ``window(ts, 'N seconds').start`` (epoch flooring —
    unambiguous, unlike time_bucket's origin conventions)."""
    return f"to_timestamp(floor(epoch({ts_expr}) / {seconds}) * {seconds})::TIMESTAMP"
