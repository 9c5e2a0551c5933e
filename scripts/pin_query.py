"""Standalone pin for one or more queries: cold + median of 5 steady runs.

The BENCH_NOTES_r11 §4 protocol: a fresh session per invocation, one
untimed scan warmup, then for each named query one cold run and five
steady runs (noop write, release_tracked between runs); report the cold
time and the median of the five.

Usage: python scripts/pin_query.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from iceberg_table_generator_spark import all_queries, get_spark  # noqa: E402
from iceberg_table_generator_spark.functions.cache import (  # noqa: E402
    release_tracked,
)


def main() -> None:
    args = sys.argv[1:]
    # A leading existing-directory argument (absolute OR relative) is the
    # sf_dir; everything else must be a registered query name (r13 advice:
    # "testdata/sf0.1" was silently treated as a query and KeyError'd).
    sf_dir = (
        args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    )
    queries = all_queries()
    unknown = [a for a in args if a not in queries]
    if not args or unknown:
        sys.exit(
            f"usage: pin_query.py [sf_dir] query [query ...]\n"
            f"unknown queries: {unknown or '(none given)'} — "
            f"registry has {len(queries)} names (see REGISTRY.md)"
        )
    spark = get_spark("pin_query")
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_tracked()
    for name in args:
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.time() - t0
        release_tracked()
        runs = []
        for _ in range(5):
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
            release_tracked()
        print(
            f"{name}: cold {cold:.3f}  runs {runs}  "
            f"median {statistics.median(runs):.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
