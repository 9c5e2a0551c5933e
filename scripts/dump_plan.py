"""Dump `.explain("formatted")` for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/dump_plan.py <suffix> [sf_dir] query [query ...]

suffix is typically `before` or `after`; files land in plans/r15/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from iceberg_table_generator_spark import all_queries, get_spark  # noqa: E402
from iceberg_table_generator_spark.plans.explain import plan_text  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    if len(args) < 2:
        sys.exit("usage: dump_plan.py <suffix> [sf_dir] query [query ...]")
    suffix = args.pop(0)
    sf_dir = (
        args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    )
    queries = all_queries()
    unknown = [a for a in args if a not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    spark = get_spark("dump_plan")
    os.makedirs("plans/r15", exist_ok=True)
    for name in args:
        df = queries[name](spark, sf_dir)
        path = f"plans/r15/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan_text(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
