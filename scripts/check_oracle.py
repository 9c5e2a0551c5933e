"""Run every registered query against its DuckDB oracle and report.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from iceberg_table_generator_spark import all_oracles, all_queries, get_spark
from iceberg_table_generator_spark.functions.cache import release_tracked
from iceberg_table_generator_spark.plans.compare import compare_query


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    queries = all_queries()
    oracles = all_oracles()
    spark = get_spark("oracle_check")
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                print(f"  rows-only {name}: {n} rows  [{time.time()-t0:.1f}s]")
            except Exception as e:  # noqa: BLE001
                failures += 1
                print(f"✗ {name}: EXCEPTION {e}")
            continue
        try:
            res = compare_query(name, spark, sf_dir, fn, oracles[name])
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"✗ {name}: EXCEPTION {type(e).__name__}: {e}")
            continue
        mark = "✓" if res.ok else "✗"
        if not res.ok:
            failures += 1
        print(f"{mark} {name}: spark={res.spark_rows} oracle={res.oracle_rows} [{time.time()-t0:.1f}s]")
        for d in res.detail:
            print(f"    {d}")
        # Drop this query's persisted intermediates before the next one —
        # a 153-query session otherwise accumulates DISK_ONLY blocks.
        release_tracked()
    print(f"\n{failures} failures / {len(queries)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
