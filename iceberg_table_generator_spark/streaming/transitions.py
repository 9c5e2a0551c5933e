"""Stateful streaming Markov transition counter.

The streaming twin of `operators/sequences.py::events_markov_transitions`:
an unbounded event stream needs one remembered event per user (the
previous event) to emit (from_type, to_type) transition pairs — O(1)
state per user, the cheapest possible stateful operator, via
`applyInPandasWithState` exactly like the sessionizer in `stateful.py`.

Each micro-batch sorts the user's new events by (ts, event_id), chains
them onto the remembered last event, and emits the batch's transition
counts as APPEND deltas (summing emitted deltas over the whole stream
equals the batch query's transition counts — the parity test asserts
this).  State is (last_ts_us, last_event_id, last_type); at 100 TB of
history the state store holds one row per ever-seen user, and the same
watermark-eviction option as the sessionizer applies to idle users.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

TRANSITION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
        StructField("n", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _transitions_user(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_type = None
    if state.exists:
        _last_ts_us, _last_event_id, last_type = state.get

    counts: dict[tuple[str, str], int] = {}
    last_ts_us, last_event_id = None, None
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, event_id, etype in zip(
            pdf["ts"], pdf["event_id"], pdf["event_type"]
        ):
            if last_type is not None:
                pair = (last_type, etype)
                counts[pair] = counts.get(pair, 0) + 1
            last_type = etype
            last_ts_us = int(pd.Timestamp(ts).value // 1000)
            last_event_id = int(event_id)

    if last_ts_us is not None:
        state.update((last_ts_us, last_event_id, last_type))
    yield pd.DataFrame(
        [(user_id, a, b, n) for (a, b), n in sorted(counts.items())],
        columns=["user_id", "from_type", "to_type", "n"],
    )


def transitions_stream(events: DataFrame) -> DataFrame:
    """Per-user transition-count deltas over a streaming events frame."""
    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _transitions_user,
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
