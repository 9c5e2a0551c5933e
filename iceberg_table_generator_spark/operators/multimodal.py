"""Multimodal column plumbing (SURVEY.md §2.8).

Treats image/audio/video payloads as opaque `binary` columns with typed
metadata.  The Spark-side plumbing — schema, partition-friendly layout,
Arrow-batched mapInPandas signatures, batch shapes — is real and tested;
the actual media decode is STUBBED (no image/audio libs in this container)
behind `decode_stub`, which raises NotImplementedError unless the
deterministic fake decoder is requested (tests use the fake).

Scale posture: payloads live in their own column so Parquet/Iceberg column
pruning keeps the blobs off the wire for metadata-only queries; decode runs
in mapInPandas over Arrow record batches, so adding executors scales decode
linearly and the Python boundary is batched, never per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), nullable=False),
        StructField("payload", BinaryType(), nullable=False),
        StructField("mime", StringType(), nullable=False),
        StructField("byte_len", LongType(), nullable=False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), nullable=False),
        StructField("mime", StringType(), nullable=False),
        StructField("width", IntegerType(), nullable=True),
        StructField("height", IntegerType(), nullable=True),
        StructField("features", ArrayType(FloatType()), nullable=True),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Synthesize a binary payload column from the document text (the
    container has no real media; the *plumbing* is the deliverable).
    Real pipelines replace this with a scan of (path, binary) Parquet."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.octet_length("text").cast("long").alias("byte_len"),
    )


def decode_stub(payload: bytes, mime: str, fake: bool = False) -> dict:
    """Decode one media payload.  Real decode requires image/audio libs not
    present in this container — STUB per the build brief.

    The deterministic fake derives a stable pseudo-feature vector from the
    payload bytes so the distributed plumbing (batching, schema, shapes)
    is testable end to end."""
    if not fake:
        raise NotImplementedError(
            "media decode requires PIL/av/soundfile, not available in this container"
        )
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % 1_000_000_007
    return {
        "width": (h % 640) + 1,
        "height": (h % 480) + 1,
        "features": [float((h >> s) & 0xFF) / 255.0 for s in range(0, 32, 4)],
    }


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    Each Python worker receives whole Arrow record batches (never row at a
    time); output schema is fixed so downstream stays fully typed."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload, mime in zip(pdf["doc_id"], pdf["payload"], pdf["mime"]):
                d = decode_stub(bytes(payload), mime, fake=fake_decode)
                out.append((doc_id, mime, d["width"], d["height"], d["features"]))
            yield pd.DataFrame(
                out, columns=["doc_id", "mime", "width", "height", "features"]
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           'text/plain'                 AS mime,
           octet_length(encode(text))   AS byte_len,
           n_chars,
           md5(text)                    AS content_md5
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payload columns — the pruning-friendly
    side of the multimodal design: this query never touches the payload
    bytes column layout-wise (column pruning), only its metadata."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit("text/plain").alias("mime"),
        F.octet_length("text").cast("long").alias("byte_len"),
        "n_chars",
        F.md5("text").alias("content_md5"),
    )
