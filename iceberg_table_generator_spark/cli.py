"""CLI scenario runner — the Spark-native twin of the reference's Main.

Reference: `Main.java:85-134` — JCommander parses `--warehouse`/`--conf`,
builds a Hadoop Configuration, then runs whichever generation scenarios are
enabled.  Here: argparse → `get_spark(extra_conf=…)` → scenario functions
from sources/scenarios.py, each a sequence of single-operation snapshots.

    python -m iceberg_table_generator_spark.cli \
        --warehouse /tmp/wh --scenario products_with_deletes \
        --conf spark.sql.shuffle.partitions=16
"""

from __future__ import annotations

import argparse
import sys

from iceberg_table_generator_spark.session import get_spark
from iceberg_table_generator_spark.sources import scenarios as S

SCENARIOS = {
    "small_orders": S.create_small_orders,
    "unpartitioned_orders_with_deletes": S.create_unpartitioned_orders_with_deletes,
    "products_with_deletes": S.products_with_deletes,
    "products_with_schema_evolution": S.products_with_schema_evolution,
    "orders_with_partition_evolution": S.orders_with_partition_evolution,
    "wide_metrics": S.wide_metrics_table,
    "multi_rowgroup_orders_with_deletes": S.multi_rowgroup_orders_with_deletes,
    "orders_with_long_paths": S.orders_with_long_paths,
    "small_orders_with_deletes": S.small_orders_with_deletes,
}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--warehouse", required=True, help="table root directory")
    ap.add_argument(
        "--scenario",
        action="append",
        required=True,
        choices=sorted(SCENARIOS),
        help="scenario to run (repeatable)",
    )
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="K=V",
        help="extra Spark conf (repeatable), mirrors the reference's --conf",
    )
    args = ap.parse_args(argv)

    extra = {}
    for kv in args.conf:
        if "=" not in kv:
            ap.error(f"--conf expects K=V, got {kv!r}")
        k, v = kv.split("=", 1)
        extra[k] = v

    spark = get_spark("itg_cli", extra_conf=extra)
    for name in args.scenario:
        table = SCENARIOS[name](spark, f"{args.warehouse}/{name}")
        snaps = table.snapshots()
        rows = table.read().count()
        print(
            f"{name}: {len(snaps)} snapshots "
            f"({', '.join(s.operation for s in snaps)}), {rows} visible rows"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
