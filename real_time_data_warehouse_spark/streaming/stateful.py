"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the two reference operators whose semantics genuinely need keyed state
(SURVEY.md §7.3): ST5 returning-user (8-day gap) and ST3 visitor-flag
repair. Everything else stateful maps onto watermarked dropDuplicates /
window aggregates.

Arrow-batched (grouped pandas), keyed by user — state per key is one date
string, so 100 TB-scale cardinality (~billions of keys) costs tens of GB
across the cluster's state stores. Both operators accept an opt-in
idle-state TTL (processing-time timeout): a key with no activity for that
long has its state dropped (the reference's ST5 keeps state forever —
DwsUserUserLoginWindow.java:80-124). TTL is off by default because
registered timeouts keep availableNow replays alive; long-lived production
queries pass idle_ttl_ms and pair with the RocksDB state store.

Within a micro-batch, events are processed in event-time order (sorted in
the pandas function); across micro-batches the source must be
roughly time-ordered — the same assumption the reference's keyed streams
make.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Idle-state TTL (opt-in): keys silent this long get their state evicted
# (processing-time timeout — the StateTtlConfig analog). OFF by default:
# registered timeouts keep an availableNow query alive to service them, so
# bounded replays/tests run without TTL and long-lived production queries
# opt in via the `idle_ttl_ms` parameter.
DEFAULT_IDLE_TTL_MS = 90 * 24 * 3600 * 1000

RETURNING_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cur_date", StringType()),
        StructField("is_uu", IntegerType()),
        StructField("is_back", IntegerType()),
    ]
)
_RETURNING_STATE = StructType([StructField("last_login_date", StringType())])


def _make_returning_user_fn(idle_ttl_ms: int | None):
    """Build the state function with the TTL captured in the closure (a
    module global would not survive pickling to the Python workers)."""

    def _returning_user_fn(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per-user: emit one row per new login date; is_back=1 when the
        gap since the previous login date ≥ 8 days
        (DwsUserUserLoginWindow.java:80-124)."""
        if state.hasTimedOut:
            state.remove()  # idle key: drop the per-user date state
            yield pd.DataFrame(columns=["user_id", "cur_date", "is_uu", "is_back"])
            return
        (user_id,) = key
        last = state.get[0] if state.exists else None
        out: list[tuple[int, str, int, int]] = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts")
            for d in pdf["ts"].dt.strftime("%Y-%m-%d"):
                # skip same-day AND late older-day events: regressing state
                # to an earlier date would re-emit already-counted dates
                # with is_uu=1 on the next batch (double-counted UU)
                if last is not None and d <= last:
                    continue
                is_back = 0
                if last is not None:
                    gap = (pd.Timestamp(d) - pd.Timestamp(last)).days
                    if gap >= 8:
                        is_back = 1
                out.append((user_id, d, 1, is_back))
                last = d
        state.update((last,))
        if idle_ttl_ms:
            state.setTimeoutDuration(idle_ttl_ms)
        yield pd.DataFrame(out, columns=["user_id", "cur_date", "is_uu", "is_back"])

    return _returning_user_fn


def returning_user(logins: DataFrame, idle_ttl_ms: int | None = None) -> DataFrame:
    """ST5 streaming form: logins (user_id, ts) → per-(user, date) rows
    with uu/back flags. Works on a streaming DataFrame (update mode).
    Pass ``idle_ttl_ms`` (e.g. DEFAULT_IDLE_TTL_MS) on long-lived
    production queries to bound state; leave None for bounded replays —
    registered timeouts keep an availableNow query alive."""
    return (
        logins.groupBy("user_id")
        .applyInPandasWithState(
            _make_returning_user_fn(idle_ttl_ms),
            outputStructType=RETURNING_OUTPUT,
            stateStructType=_RETURNING_STATE,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_ttl_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


VISITOR_OUTPUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("visit_date", StringType()),
        StructField("is_new", IntegerType()),
    ]
)
_VISITOR_STATE = StructType([StructField("first_visit_date", StringType())])


def _make_visitor_fix_fn(idle_ttl_ms: int | None):
    def _visitor_fix_fn(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """ST3 (DwdBaseLog.java:121-188): is_new stays 1 only on the
        first-ever visit date of the mid; later dates are repaired to 0."""
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["event_id", "user_id", "visit_date", "is_new"])
            return
        (user_id,) = key
        first = state.get[0] if state.exists else None
        out: list[tuple[int, int, str, int]] = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts")
            dates = pdf["ts"].dt.strftime("%Y-%m-%d")
            for eid, d in zip(pdf["event_id"], dates):
                if first is None:
                    first = d
                out.append((int(eid), user_id, d, 1 if d == first else 0))
        state.update((first,))
        if idle_ttl_ms:
            state.setTimeoutDuration(idle_ttl_ms)
        yield pd.DataFrame(out, columns=["event_id", "user_id", "visit_date", "is_new"])

    return _visitor_fix_fn


def visitor_fix(events: DataFrame, idle_ttl_ms: int | None = None) -> DataFrame:
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_visitor_fix_fn(idle_ttl_ms),
            outputStructType=VISITOR_OUTPUT,
            stateStructType=_VISITOR_STATE,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_ttl_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
