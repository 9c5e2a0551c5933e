"""Model-based fuzz: random append/delete/compact sequences must always
agree with a trivial in-memory model (seeded, fully reproducible)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from iceberg_table_generator_spark.sources.lifecycle import ParquetSnapshotTable


def test_lifecycle_random_ops_match_model(spark, tmp_path):
    rng = random.Random(4242)
    t = ParquetSnapshotTable(spark, str(tmp_path / "fuzz")).create(["k"])
    model: list[int] = []
    next_k = 0
    history: list[str] = []

    for step in range(14):
        op = rng.choice(["append", "append", "delete", "compact"])
        history.append(op)
        if op == "append":
            n = rng.randint(5, 40)
            t.append(
                spark.range(next_k, next_k + n).select(F.col("id").alias("k")),
                num_files=rng.randint(1, 3),
            )
            model.extend(range(next_k, next_k + n))
            next_k += n
        elif op == "delete":
            m, r = rng.randint(2, 7), rng.randint(0, 1)
            mode = rng.choice(["equality", "positional", "equality_true"])
            if mode == "equality_true":
                # true equality-delete file (value tuples + sequence rule);
                # equivalent to the eager model here because every append
                # uses fresh k values
                t.delete_where(f"k % {m} = {r}", mode="equality", equality_columns=["k"])
            else:
                t.delete_where(f"k % {m} = {r}", mode=mode)
            model = [k for k in model if k % m != r]
        else:
            t.compact(target_files=2)

        got = sorted(r.k for r in t.read(with_row_id=False).collect())
        assert got == sorted(model), f"divergence after step {step}: {history}"

    # history length: create + one snapshot per op
    assert len(t.snapshots()) == 15
