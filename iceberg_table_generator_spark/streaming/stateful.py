"""Custom stateful streaming operator: sessionization with GroupState.

The batch twin (`operators/relational.py::events_sessionize`) computes
sessions with windows; unbounded streams need explicit per-key state —
this is the `applyInPandasWithState` path the build brief calls out for
custom stateful operators.

State per user: the open session (start, last ts, event count).  Each
micro-batch: sort the user's new events by time, extend or close sessions
on the 30-min gap, emit closed sessions immediately and the open session as
a provisional row (update semantics).  State is O(1) per user — at 100 TB
of history the state store holds only open sessions, and event-time
timeouts (GroupStateTimeout.EventTimeTimeout + watermark) evict idle users;
the test path uses NoTimeout because availableNow drains a finite input.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from iceberg_table_generator_spark.functions.sessions import SESSION_GAP_SECONDS

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("closed", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _sessionize_user(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start_us, last_us, n_events = state.get
    else:
        start_us = last_us = None
        n_events = 0

    out: list[tuple] = []
    for pdf in pdfs:
        # Arrival order within a batch is arbitrary — order by event time.
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if last_us is not None and ts_us - last_us > SESSION_GAP_SECONDS * 1_000_000:
                out.append(
                    (user_id, pd.Timestamp(start_us * 1000), pd.Timestamp(last_us * 1000), n_events, True)
                )
                start_us, n_events = ts_us, 0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            n_events += 1

    if start_us is not None:
        state.update((start_us, last_us, n_events))
        # provisional open session (update semantics: re-emitted as it grows)
        out.append(
            (user_id, pd.Timestamp(start_us * 1000), pd.Timestamp(last_us * 1000), n_events, False)
        )
    yield pd.DataFrame(
        out, columns=["user_id", "session_start", "session_end", "n_events", "closed"]
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Stateful sessionization over a streaming events DataFrame."""
    return events.select("user_id", "event_id", "ts").groupBy("user_id").applyInPandasWithState(
        _sessionize_user,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _sessionize_user_evicting(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """EventTimeTimeout variant: emits ONLY closed sessions; open sessions
    are evicted (closed + emitted) when the watermark passes their gap
    deadline, so state holds just the genuinely-open tail of users."""
    (user_id,) = key
    cols = ["user_id", "session_start", "session_end", "n_events", "closed"]
    if state.hasTimedOut:
        start_us, last_us, n_events = state.get
        state.remove()
        yield pd.DataFrame(
            [(user_id, pd.Timestamp(start_us * 1000), pd.Timestamp(last_us * 1000), n_events, True)],
            columns=cols,
        )
        return

    if state.exists:
        start_us, last_us, n_events = state.get
    else:
        start_us = last_us = None
        n_events = 0
    out: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if last_us is not None and ts_us - last_us > SESSION_GAP_SECONDS * 1_000_000:
                out.append(
                    (user_id, pd.Timestamp(start_us * 1000), pd.Timestamp(last_us * 1000), n_events, True)
                )
                start_us, n_events = ts_us, 0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            n_events += 1
    if start_us is not None:
        state.update((start_us, last_us, n_events))
        # Evict when event-time reaches last event + gap.
        state.setTimeoutTimestamp(last_us // 1000 + SESSION_GAP_SECONDS * 1000)
    yield pd.DataFrame(out, columns=cols)


def sessionize_stream_evicting(events: DataFrame, late_threshold: str = "10 seconds") -> DataFrame:
    """Watermarked sessionization with event-time state eviction — the
    unbounded-stream production shape: state size tracks only open
    sessions; everything older is finalized and dropped."""
    return (
        events.select("user_id", "event_id", "ts")
        .withWatermark("ts", late_threshold)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_user_evicting,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
