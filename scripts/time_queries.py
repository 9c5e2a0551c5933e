"""Spark-side wall time for every registered query at one SF → JSON.

The input for the measured runtime-scaling exponents in SCALING.md (r12
verdict #2): the plan-shape inventory proves every plan is bounded, but a
query can be accidentally super-linear inside bounded shapes (e.g. a
candidate-pair explosion under the invariant radar).  Timing the same
query at two SFs and taking the log-slope catches that class.

Runs each query's noop write twice (after one scan warmup) and records
the MIN of the two — the scaling signal wants the least-noise estimate,
not a load-bearing benchmark (bench.py remains the benchmark).  DuckDB
is not involved, so timings are free of oracle contention.

Usage:  python scripts/time_queries.py [sf_dir] [out.json]
Writes TIMINGS_<sfname>.json at the repo root by default.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from iceberg_table_generator_spark import all_queries, get_spark  # noqa: E402
from iceberg_table_generator_spark.functions.cache import (  # noqa: E402
    release_tracked,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    out = sys.argv[2] if len(sys.argv) > 2 else f"TIMINGS_{sf_name}.json"
    queries = all_queries()
    spark = get_spark("time_queries")
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_tracked()
    timings: dict[str, float] = {}
    for name, fn in queries.items():
        runs = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            release_tracked()
        timings[name] = round(min(runs), 3)
        print(f"{name}: {timings[name]}s", flush=True)
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "queries": timings}, f, indent=1)
        f.write("\n")
    print(f"wrote {out} ({len(timings)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
