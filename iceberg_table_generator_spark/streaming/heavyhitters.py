"""Streaming heavy hitters: Misra-Gries summaries under bounded state.

The batch engine answers "top items" exactly (`text_word_freq`,
`topk_global`); an unbounded ingest stream cannot — per-item exact counts
grow with the key universe, which for URLs/shingles/tokens at 100 TB is
effectively unbounded.  The standard answer is a mergeable ε-approximate
summary: Misra-Gries with capacity m guarantees every item whose true
frequency exceeds n/(m+1) is present, with count underestimated by at
most (n - Σ̂)/(m+1) ≤ n/(m+1), using O(m) state — INDEPENDENT of both
stream length and universe size.

Sharding: items hash into N buckets (`item % n_buckets`), one GroupState
per bucket, so state parallelism scales horizontally like every keyed
stateful op; each bucket's guarantee applies to its own substream, and
bucket summaries are mergeable downstream (MG merge = counter add + joint
decrement), so a global report is a tiny batch fold over n_buckets·m rows.

This is the `applyInPandasWithState` path of the build brief (same harness
as `stateful.py` sessionization); state per bucket is two parallel arrays
(items, counts) + processed-count + emission seq.  Each micro-batch emits
the bucket's FULL current summary tagged with a monotone `seq`, so a
consumer (and the test) takes the max-seq row set per bucket — update
semantics without deletes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

MG_CAPACITY = 8  # counters per bucket (m): coverage threshold is n/(m+1)
N_BUCKETS = 8  # state-parallelism shards

_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("processed", LongType()),
        StructField("seq", LongType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("item", LongType()),
        StructField("mg_count", LongType()),
        StructField("processed", LongType()),
        StructField("seq", LongType()),
    ]
)


def _mg_update(summary: dict[int, int], item: int, cap: int) -> None:
    """One Misra-Gries step, in place."""
    if item in summary:
        summary[item] += 1
    elif len(summary) < cap:
        summary[item] = 1
    else:
        # Decrement-all: the step that buys the n/(m+1) guarantee.
        for k in list(summary):
            summary[k] -= 1
            if summary[k] == 0:
                del summary[k]


def _bucket_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    bucket = key[0]
    if state.exists:
        items, counts, processed, seq = state.get
        summary = dict(zip(items, counts))
    else:
        summary, processed, seq = {}, 0, 0
    for pdf in pdfs:
        for item in pdf["item"]:
            _mg_update(summary, int(item), MG_CAPACITY)
            processed += 1
    seq += 1
    state.update((list(summary), list(summary.values()), processed, seq))
    yield pd.DataFrame(
        {
            "bucket": [bucket] * len(summary),
            "item": list(summary),
            "mg_count": list(summary.values()),
            "processed": [processed] * len(summary),
            "seq": [seq] * len(summary),
        }
    )


def heavy_hitters_stream(items_stream: DataFrame) -> DataFrame:
    """items_stream must carry a LONG column `item`; returns the streaming
    summary frame (bucket, item, mg_count, processed, seq)."""
    import pyspark.sql.functions as F

    return (
        items_stream.select(
            F.col("item"), F.pmod("item", F.lit(N_BUCKETS)).alias("bucket")
        )
        .groupBy("bucket")
        .applyInPandasWithState(
            _bucket_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
