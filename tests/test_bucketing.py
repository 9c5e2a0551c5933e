"""Bucketed co-located join: same results, zero join shuffle."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.plans import explain
from iceberg_table_generator_spark.sources import bucketing
from iceberg_table_generator_spark.sources.tables import load_table


def test_bucketed_join_no_shuffle_same_result(spark, sf_small, tmp_path):
    bucketing.create_bucketed_pair(spark, sf_small, str(tmp_path / "wh"))
    # At test scale Spark rightly prefers broadcasting the tiny orders side;
    # disable broadcast to surface the big-big case bucketing is FOR.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketing.bucketed_join_revenue(spark)
        nodes = explain.plan_nodes(df)
        # one Exchange allowed for the tiny final 3-group aggregate; the
        # JOIN itself must be exchange-free (SMJ reads aligned buckets)
        assert nodes.count("Exchange") <= 1, nodes
        assert "SortMergeJoin" in nodes, nodes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # equivalence with the plain (shuffled) join
    o = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    plain = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
                ).cast("double"),
                2,
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
    assert {tuple(r) for r in df.collect()} == {tuple(r) for r in plain.collect()}
    for t in ("bucketed_orders", "bucketed_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
