"""Streaming quality gate: the stream's per-document verdicts equal the
batch rule projection exactly (shared `gopher_rule_flags`), across
multiple micro-batches and an empty arrival."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from iceberg_table_generator_spark.operators.wave14 import gopher_rule_flags
from iceberg_table_generator_spark.sources.tables import table_path
from iceberg_table_generator_spark.streaming.quality import (
    streaming_quality_gate,
)


def test_streaming_quality_matches_batch(spark, sf_small, tmp_path):
    docs = spark.read.parquet(table_path(sf_small, "documents")).select(
        "doc_id", "source", "text"
    )
    docs_pd = docs.toPandas()
    landing = tmp_path / "landing"
    landing.mkdir()
    # three arrivals: two halves plus an EMPTY file (gate must no-op)
    half = len(docs_pd) // 2
    pq.write_table(
        pa.Table.from_pandas(docs_pd.iloc[:half]), landing / "a1.parquet"
    )
    pq.write_table(
        pa.Table.from_pandas(docs_pd.iloc[0:0]), landing / "a2.parquet"
    )
    pq.write_table(
        pa.Table.from_pandas(docs_pd.iloc[half:]), landing / "a3.parquet"
    )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = streaming_quality_gate(
        stream,
        verdict_dir=str(tmp_path / "verdicts"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = {
        r.doc_id: (r.wc_ok, r.mwl_ok, r.stop_ok, r.rep_ok, r.keep)
        for r in spark.read.parquet(str(tmp_path / "verdicts")).collect()
    }
    expect = {
        r.doc_id: (
            r.wc_ok,
            r.mwl_ok,
            r.stop_ok,
            r.rep_ok,
            bool(r.wc_ok and r.mwl_ok and r.stop_ok and r.rep_ok),
        )
        for r in gopher_rule_flags(docs, keep=["doc_id"]).collect()
    }
    assert got == expect
    # the fixture exercises both verdicts
    assert any(v[4] for v in got.values())
    assert any(not v[4] for v in got.values())
