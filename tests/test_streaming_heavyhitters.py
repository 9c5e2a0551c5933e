"""Misra-Gries streaming heavy hitters: bounded state, provable coverage.

The MG guarantees verified against exact batch counts, across micro-batch
boundaries (the same arrivals split into two batches must produce the same
final summary state as one):

- coverage: every item with true count > n_bucket/(m+1) is in the summary;
- bounds:   mg_count <= true count <= mg_count + n_bucket/(m+1);
- state:    <= m counters per bucket, regardless of universe size.
"""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from iceberg_table_generator_spark.sources.tables import load_table, table_path
from iceberg_table_generator_spark.streaming.events import run_available_now
from iceberg_table_generator_spark.streaming.heavyhitters import (
    MG_CAPACITY,
    N_BUCKETS,
    heavy_hitters_stream,
)

# Skew injection: fold half the key space onto item 0 so a guaranteed
# heavy hitter exists in every bucket-0 substream (uniform props.k would
# leave the coverage clause vacuous).
_SKEW = (
    "CAST(CASE WHEN CAST(get_json_object(props, '$.k') AS INT) < 50 THEN 0 "
    "ELSE CAST(get_json_object(props, '$.k') AS INT) END AS LONG) AS item"
)


def test_mg_guarantees_across_batches(spark, sf_small, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    src = table_path(sf_small, "events")
    # Two identical arrivals -> two micro-batches: state must carry over.
    shutil.copy(src, landing / "arrival_1.parquet")
    shutil.copy(src, landing / "arrival_2.parquet")

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
        .selectExpr(_SKEW)
    )
    out = run_available_now(
        heavy_hitters_stream(stream),
        "mg_summary",
        str(tmp_path / "ckpt"),
        output_mode="update",
    )
    # Update-mode memory sink appends every emission; the final summary per
    # bucket is its max-seq row set (selected in pandas: self-joining a
    # memory-sink view hits a Spark analyzer internal error).
    emitted = out.toPandas()
    last = emitted.groupby("bucket")["seq"].transform("max")
    final = emitted[emitted["seq"] == last]

    # Exact truth: the same skewed items, counted twice (two arrivals).
    truth = (
        load_table(spark, sf_small, "events")
        .selectExpr(_SKEW)
        .groupBy("item")
        .agg((F.count("*") * 2).alias("true_cnt"))
        .withColumn("bucket", F.pmod("item", F.lit(N_BUCKETS)))
        .toPandas()
    )
    n_bucket = truth.groupby("bucket")["true_cnt"].sum().to_dict()
    err = {b: n / (MG_CAPACITY + 1) for b, n in n_bucket.items()}

    mg = {(r.bucket, r.item): r.mg_count for r in final.itertuples()}
    # state bound: <= m counters per bucket; processed == n_bucket
    assert final.groupby("bucket").size().max() <= MG_CAPACITY
    proc = final.groupby("bucket")["processed"].first().to_dict()
    assert proc == {b: int(n) for b, n in n_bucket.items()}

    guaranteed = 0
    for r in truth.itertuples():
        key = (r.bucket, r.item)
        if r.true_cnt > err[r.bucket]:
            assert key in mg, f"heavy hitter {key} missing (cnt={r.true_cnt})"
            guaranteed += 1
        if key in mg:
            assert mg[key] <= r.true_cnt <= mg[key] + err[r.bucket], key
    assert guaranteed >= 1  # the skew-planted hitter was actually exercised


def test_mg_batch_fold_guarantee_adversarial_order():
    """The batch twin's fold satisfies coverage + bound for a decrement-
    heavy adversarial order (all singletons first, hitter last) — the
    worst case for the n/(m+1) undercount."""
    import pandas as pd

    from iceberg_table_generator_spark.operators.heavyhitters import (
        _mg_fold_batch,
    )

    # 40 distinct singletons (5× capacity of decrements), then one item
    # repeated 20 times: n = 60, threshold n/(m+1) = 60/9 ≈ 6.7 — the
    # hitter (20) must survive with count ≥ 20 − 6.7.
    items = list(range(100, 140)) + [7] * 20
    pdf = pd.DataFrame(
        {
            "bucket": [7] * len(items),
            "item": items,
            "ts": pd.to_datetime(range(len(items)), unit="s"),
            "event_id": range(len(items)),
        }
    )
    out = _mg_fold_batch(pdf)
    assert len(out) <= MG_CAPACITY
    row = out[out["item"] == 7]
    assert len(row) == 1, "true heavy hitter evicted"
    mg = int(row["mg_count"].iloc[0])
    assert 20 - 60 / (MG_CAPACITY + 1) <= mg <= 20


def test_mg_batch_query_flags_true(spark, sf_small):
    from iceberg_table_generator_spark.operators.heavyhitters import (
        heavyhitters_mg_guarantee,
    )

    pdf = heavyhitters_mg_guarantee(spark, sf_small).toPandas()
    assert len(pdf) == N_BUCKETS
    assert pdf["coverage_ok"].all() and pdf["bound_ok"].all()
    assert (pdf["n_events"] > 0).all()
