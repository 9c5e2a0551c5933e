"""One-off stage probes for round-14 optimization targets (approx_sketches,
wide_metrics_feature_hash, dedup_connected_components).  Not part of the
bench; timings are noop-sink wall seconds after one warmup scan.

Usage: python scripts/probe_r14.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from iceberg_table_generator_spark import get_spark  # noqa: E402
from iceberg_table_generator_spark.functions.cache import release_tracked  # noqa: E402
from iceberg_table_generator_spark.sources.tables import load_table  # noqa: E402


def t(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {label:<50s} {time.time() - t0:6.2f}s")
    release_tracked()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe_r14")

    li = load_table(spark, sf_dir, "lineitem")
    li.select("l_returnflag").write.format("noop").mode("overwrite").save()  # warmup

    print("approx_sketches decomposition:")
    t("scan only (3 cols)", li.select("l_returnflag", "l_partkey", "l_extendedprice"))
    t("exact countDistinct", li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey")))
    t("approx_count_distinct", li.groupBy("l_returnflag").agg(F.approx_count_distinct("l_partkey", 0.02)))
    t("exact percentile", li.groupBy("l_returnflag").agg(F.expr("percentile(l_extendedprice, 0.5)")))
    t("approx_percentile", li.groupBy("l_returnflag").agg(F.expr("approx_percentile(l_extendedprice, 0.5, 1000)")))
    t(
        "all four together",
        li.groupBy("l_returnflag").agg(
            F.countDistinct("l_partkey"),
            F.approx_count_distinct("l_partkey", 0.02),
            F.expr("percentile(l_extendedprice, 0.5)"),
            F.expr("approx_percentile(l_extendedprice, 0.5, 1000)"),
        ),
    )

    print("wide_metrics_feature_hash decomposition:")
    from iceberg_table_generator_spark.operators.wide import (
        _FH_TERMS,
        _wide_fixture,
        FEATURE_HASH_DIM,
    )

    path = _wide_fixture(spark)
    df = spark.read.parquet(path)
    t("scan id only", df.select("id"))
    t("scan all columns", df)
    feats_fold = [
        F.aggregate(
            F.array(*[F.col(c) * F.lit(s) for c, s in _FH_TERMS[j]]),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"f{j}")
        for j in range(FEATURE_HASH_DIM)
    ]
    t("hof array fold (current)", df.select("id", *feats_fold))

    def chain(j):
        acc = F.lit(0.0)
        for c, s in _FH_TERMS[j]:
            acc = acc + F.col(c) * F.lit(s)
        return acc.alias(f"f{j}")

    t("plain + chain", df.select("id", *[chain(j) for j in range(FEATURE_HASH_DIM)]))


if __name__ == "__main__":
    main()
