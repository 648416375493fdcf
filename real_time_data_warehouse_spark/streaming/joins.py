"""Streaming joins — the J-family operators in their streaming forms
(SURVEY.md §2.3; batch twins live in operators/joins.py).

- Interval join (J4, DwdTradeOrderPaySucDetail.java:74-98): stream-stream
  inner join with watermarks on BOTH sides plus the event-time range
  condition. Spark uses the range bound to size the join state — the
  idle-state-TTL knob the reference sets manually
  (tEnv.getConfig().setIdleStateRetention) falls out of the predicate.
- Lookup join (J5, DwdInteractionCommentInfo.java:42-52): stream ⋈ static
  table. The static side is re-read each micro-batch — that *is* the
  FOR SYSTEM_TIME AS OF proctime semantics; broadcast keeps it
  shuffle-free on the stream side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_purchases(
    events: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "10 seconds",
) -> DataFrame:
    """For each purchase, prior same-user events within [ts-lookback, ts).

    Both sides carry watermarks; the range predicate bounds state on each
    side (events kept only `lookback` past the watermark)."""
    pay = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("pay_id"),
            F.col("user_id").alias("pay_user"),
            F.col("ts").alias("pay_ts"),
        )
    )
    ev = events.select(
        F.col("event_id").alias("prior_id"), "user_id", "ts"
    )
    if events.isStreaming:
        pay = pay.withWatermark("pay_ts", watermark)
        ev = ev.withWatermark("ts", watermark)
    return pay.join(
        ev,
        (F.col("pay_user") == F.col("user_id"))
        & (F.col("ts") >= F.col("pay_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("ts") < F.col("pay_ts")),
        "inner",
    ).select("pay_id", "prior_id", "pay_user", "pay_ts", "ts")


def lookup_join_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static broadcast join (the HBase lookup-join replacement)."""
    return stream.join(F.broadcast(dim), on, "left")


def left_outer_stream_join(
    orders: DataFrame,
    payments: DataFrame,
    pay_window: str = "30 minutes",
    watermark: str = "10 seconds",
) -> DataFrame:
    """J2 streaming form: order ⟕ payment within [order.ts, order.ts +
    pay_window] (DwdTradeOrderDetail.java:105-108's left joins).

    This is the operator where Flink and Spark diverge hardest
    (SURVEY.md §7.4.1): Flink emits +I(order,null) immediately and
    retracts it (-D/+I) when the payment arrives — the downstream must
    cancel the storm. Spark holds the unmatched row in state and emits the
    null-padded result ONCE, only after the watermark proves no payment
    can still arrive. Net results identical; no retraction machinery to
    port. Both sides need watermarks; the time-range bound sizes the
    state.
    """
    o = orders.select(
        F.col("event_id").alias("order_id"),
        F.col("user_id").alias("o_user"),
        F.col("ts").alias("o_ts"),
    )
    p = payments.select(
        F.col("event_id").alias("pay_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    if orders.isStreaming:
        o = o.withWatermark("o_ts", watermark)
        p = p.withWatermark("p_ts", watermark)
    return o.join(
        p,
        (F.col("o_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("o_ts"))
        & (F.col("p_ts") <= F.col("o_ts") + F.expr(f"INTERVAL {pay_window}")),
        "leftOuter",
    ).select("order_id", "o_user", "o_ts", "pay_id", "p_ts")
