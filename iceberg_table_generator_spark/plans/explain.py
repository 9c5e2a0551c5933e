"""Physical-plan introspection: assert the plan we designed is the plan we got.

"Correct but mis-planned" regressions (lost pushdown, surprise sort-merge
join, full-width scans) don't fail correctness tests — they fail at 100 TB.
These helpers make plan properties assertable in the test suite, so a plan
regression is a red test, not a production incident.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_text(df)):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists each parquet scan actually reads (pruning evidence)."""
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_text(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def plan_nodes(df: DataFrame) -> list[str]:
    """Physical operator names, one per node (from the formatted detail
    headers `(N) OperatorName`, which list each node exactly once)."""
    return re.findall(r"^\(\d+\) (\w+)", plan_text(df), flags=re.MULTILINE)


def join_kinds(df: DataFrame) -> dict[str, int]:
    nodes = plan_nodes(df)
    return {
        kind: nodes.count(kind)
        for kind in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
        )
    }


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the initial plan (AQE may later coalesce).
    BroadcastExchange is excluded — broadcasts are not shuffles."""
    return plan_nodes(df).count("Exchange")


def keyed_exchange_count(df: DataFrame) -> int:
    """Exchanges that move KEYED data (hash/range/single-partition).

    Excludes round-robin repartitions: `sources.tables.spread()` inserts
    one only when the LOCAL scan is under-split (it is a no-op whenever
    the source already yields ≥ defaultParallelism splits — i.e. always
    at scale), so a round-robin exchange is not a data-shuffle plan
    regression the zero-shuffle tests exist to catch."""
    text = plan_text(df, mode="simple")
    return sum(
        1
        for line in text.splitlines()
        if "ReusedExchange" not in line
        and re.search(
            r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)",
            line,
        )
    )


def roundrobin_exchange_count(df: DataFrame) -> int:
    """Round-robin repartition exchanges in the plan (the spread() shape).

    Complements `keyed_exchange_count` (r15, ADVICE r14 #2): the
    zero-keyed-shuffle tests additionally bound THIS count at one, so an
    accidental corpus-wide `.repartition()` regression cannot hide
    behind the single spread()-inserted exchange the keyed count
    ignores."""
    text = plan_text(df, mode="simple")
    return sum(
        1
        for line in text.splitlines()
        if "ReusedExchange" not in line
        and re.search(r"\bExchange RoundRobinPartitioning", line)
    )


def has_operator(df: DataFrame, name: str) -> bool:
    return name in plan_text(df)


def broadcast_subtrees(df: DataFrame) -> list[str]:
    """The physical subtree under each BroadcastExchange, as text.

    What feeds a broadcast decides whether the plan survives scale-up:
    a broadcast of a `.limit(k)` / scalar aggregate / literal relation is
    bounded by construction, while a broadcast of a corpus-correlated
    relation (the `dedup_keep_canonical` r5 finding) blows the driver at
    100 TB.  Parses the simple-mode tree: a node's subtree is every
    following line whose tree-art indent is strictly deeper."""
    text = plan_text(df, mode="simple")
    lines = text.splitlines()

    def depth(line: str) -> int:
        # tree-art prefix: spaces and the :- +- | connectors
        return len(re.match(r"^[\s:+\-|]*", line).group(0))

    out: list[str] = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        # a ReusedExchange node NAMES the BroadcastExchange it reuses but
        # has no subtree of its own — the origin exchange is classified
        # where it appears in full
        if "ReusedExchange" in line:
            continue
        d = depth(line)
        sub: list[str] = []
        for nxt in lines[i + 1:]:
            if not nxt.strip():
                break
            if depth(nxt) <= d:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def _top_level_bracket_groups(line: str) -> list[str]:
    """Top-level ``[...]`` groups of one plan line (brackets may nest)."""
    groups: list[str] = []
    depth = 0
    start = -1
    for i, ch in enumerate(line):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]" and depth:
            depth -= 1
            if depth == 0:
                groups.append(line[start + 1 : i])
    return groups


def global_window_subtrees(df: DataFrame) -> list[tuple[str, str]]:
    """(window line, child subtree text) for every UNPARTITIONED Window.

    A Window node prints ``Window [functions], [partition], [order]``; a
    global (no partitionBy) window omits the partition group, which Spark
    executes by moving ALL input rows to a single partition — fine over a
    bounded post-aggregation relation, a scale-killer over a corpus.  The
    two-group form is detected by the second group being an ORDER spec
    (contains a sort direction); a partition-only window (no orderBy) has a
    plain column list there and is partitioned, i.e. scale-safe.
    """
    text = plan_text(df, mode="simple")
    lines = text.splitlines()

    def depth(line: str) -> int:
        return len(re.match(r"^[\s:+\-|]*", line).group(0))

    out: list[tuple[str, str]] = []
    for i, line in enumerate(lines):
        stripped = re.sub(r"^[\s:+\-|*()\d]*", "", line)
        if not stripped.startswith("Window "):
            continue
        groups = _top_level_bracket_groups(line)
        if len(groups) >= 3:
            continue  # [functions], [partition], [order] — partitioned
        if len(groups) == 2 and not re.search(
            r"\b(ASC|DESC)\b", groups[1]
        ):
            continue  # [functions], [partition] — partitioned, no order
        d = depth(line)
        sub: list[str] = []
        for nxt in lines[i + 1 :]:
            if not nxt.strip() or depth(nxt) <= d:
                break
            sub.append(nxt)
        out.append((line.strip(), "\n".join(sub)))
    return out


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of whole-stage codegen regions (wider regions = fewer ids).
    Simple mode marks each fused region's operators with `*(N)`; formatted
    mode uses `[codegen id : N]` — count distinct ids across both."""
    text = plan_text(df, mode="simple")
    ids = set(re.findall(r"\*\((\d+)\)", text))
    ids |= set(re.findall(r"\[codegen id : (\d+)\]", text))
    return len(ids)
