"""Session-level registry for persisted intermediate DataFrames.

Several operators persist bounded intermediates (DISK_ONLY, recomputable
lineage) because their plan re-reads them — iteration leaves (PageRank's
edge relation, MMR's per-round selections), band/posting-list relations,
version snapshots.  Inside ONE query that is the right call; in a
long-lived session that runs all 153 registered queries back-to-back
(scripts/check_oracle.py, bench.py, the driver's correctness sweep) the
blocks otherwise accumulate until Spark's context cleaner happens to GC
them (r7 advice).  Operators therefore persist through
:func:`persist_tracked`, and the harnesses call :func:`release_tracked`
after each query's terminal action.

``release_tracked`` only unpersists — every tracked frame has
recomputable lineage, so a subsequent re-execution of the same returned
DataFrame stays CORRECT (it just recomputes), which is exactly Spark's
own executor-loss story for DISK_ONLY blocks.  This contract briefly did
NOT hold in r9, when `with_global_order` relied on its internal persist
for rank/offset branch consistency (the nondeterministic range sampler);
the r10 redesign made the bucket assignment a deterministic literal-
boundary expression, so every tracked persist — including that one — is
again performance-only and recompute-safe.
"""

from __future__ import annotations

import contextlib
from collections.abc import Callable, Iterator

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []

#: Evaluation-scoped shared-relation memo (r12 verdict #1).  Some queries
#: COMPOSE other registered queries (`similarity_compression_frontier`
#: runs eight ranking pipelines, four of which each rebuild the exact-
#: cosine ground truth internally) — without sharing, the same bounded
#: relation is recomputed per composition arm.  `memo_relation` builds it
#: once per harness-timed evaluation; the memo is cleared by
#: `release_tracked`/`tracked_scope`, so sharing NEVER crosses a query
#: boundary — standalone pins and in-bench timings stay honest (the first
#: and only toucher inside one evaluation pays the full build).
_MEMO: dict[tuple, DataFrame] = {}

#: Keys whose frame has been pinned by an explicit eager count.  Kept
#: separate from ``_MEMO`` so the first (possibly only) consumer of a
#: relation skips the count entirely — see :func:`memo_relation`.
_MEMO_PINNED: set[tuple] = set()


def memo_relation(
    key: tuple,
    builder: Callable[[], DataFrame],
    level: StorageLevel = StorageLevel.DISK_ONLY,
    eager: bool = False,
) -> DataFrame:
    """Build-once-per-evaluation shared relation.

    `key` must identify the relation AND its inputs (include the session's
    applicationId and sf_dir).  The built frame is persisted through
    :func:`persist_tracked`, so release semantics are unchanged: after
    `release_tracked` the memo is empty and a later evaluation rebuilds.
    Only deterministic relations may be memoized (same contract as
    re-execution after executor loss).

    Materialization is FIRST-READER-LAZY (r13 verdict #1): sharing —
    and hence the persist + the eager pin count that guards the
    multi-branch recompute hazard (Spark computing a persisted-but-
    unmaterialized relation once per concurrent branch of one job, the
    wave14 band-sweep lesson) — only pays once a SECOND consumer hits
    the key.  For a sole consumer both the DISK_ONLY write and the pin
    job are pure overhead over simply inlining the relation into its
    plan (the r13 matryoshka regression: 1.21 → 1.36 s in-bench; a
    same-host A/B this round measured the persist-on-first-hit variant
    no better than eager).  Therefore:

    - first hit (cold key): build and return the frame UNPERSISTED —
      the sole-consumer cost is exactly the r12 inline-composition
      cost, zero memo overhead;
    - second and later hits (the relation is now provably shared):
      persist THE SAME DataFrame object + pin with one eager count.
      Spark's CacheManager substitutes cached plan subtrees at action
      time, so the first consumer's already-composed plan also reads
      the pinned blocks when its own action eventually runs;
    - ``eager=True`` forces persist+pin on the first hit — REQUIRED for
      a caller that fans the returned frame into multiple branches of
      its OWN job (it would otherwise recompute the unpersisted
      relation once per branch).

    Within one harness evaluation every hit happens during plan
    composition, before the query's single terminal action — so a
    shared relation is always pinned before anything reads it.
    Memoize only bounded relations; the pin count is then
    metadata-cheap."""
    if key not in _MEMO:
        _MEMO[key] = builder()
        if not eager:
            return _MEMO[key]
    df = _MEMO[key]
    if key not in _MEMO_PINNED:
        persist_tracked(df, level)
        df.count()
        _MEMO_PINNED.add(key)
    return df


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.DISK_ONLY
) -> DataFrame:
    """Persist ``df`` and register it for harness-level release."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame (blocking=False); returns the count."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — a dead session must not mask others
            pass
    _TRACKED.clear()
    _MEMO.clear()
    _MEMO_PINNED.clear()
    return n


@contextlib.contextmanager
def tracked_scope() -> Iterator[None]:
    """Deterministic-release scope for ad-hoc callers (r7 advice).

    The module-global ``_TRACKED`` list otherwise retains DataFrame
    references (and their DISK_ONLY blocks) until a harness calls
    :func:`release_tracked` — harnesses (`bench.py`,
    `scripts/check_oracle.py`, the driver sweep) do, but a user composing
    operators directly in a long-lived session would accumulate blocks.
    Wrap each query's terminal action instead::

        with tracked_scope():
            all_queries()["dedup_minhash_lsh"](spark, sf_dir).count()
        # every intermediate persisted during the block is now released

    Frames persisted BEFORE entering the scope are untouched: the scope
    releases only what was tracked inside it.
    """
    start = len(_TRACKED)
    try:
        yield
    finally:
        tail = _TRACKED[start:]
        del _TRACKED[start:]
        for df in tail:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — same contract as release_tracked
                pass
        # Memo entries may reference frames released above; entries created
        # before the scope are dropped too — a later rebuild just re-persists
        # (wasted-but-correct, same recompute contract as release_tracked).
        _MEMO.clear()
        _MEMO_PINNED.clear()
