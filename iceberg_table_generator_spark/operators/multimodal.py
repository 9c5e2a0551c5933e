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


# --------------------------------------------------------------------------
# Frame sampling (video-style payloads)
# --------------------------------------------------------------------------
FRAME_BYTES = 256  # fixed-size frame stand-in (real codecs: keyframe index)
FRAME_STRIDE = 4  # sample every 4th frame

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), nullable=False),
        StructField("frame_idx", IntegerType(), nullable=False),
        StructField("features", ArrayType(FloatType()), nullable=True),
    ]
)


@query(
    "multimodal_frame_index",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, octet_length(encode(text)) AS byte_len FROM documents),
    idx AS (
      SELECT doc_id, byte_len,
             unnest(generate_series(0, (byte_len - 1) // {FRAME_BYTES},
                                    {FRAME_STRIDE})) AS frame_idx
      FROM m)
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(frame_idx * {FRAME_BYTES} AS BIGINT) AS frame_offset,
           CAST(least({FRAME_BYTES}, byte_len - frame_idx * {FRAME_BYTES}) AS INT)
             AS frame_len
    FROM idx
    """,
)
def multimodal_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling INDEX over binary payloads: every FRAME_STRIDE-th
    fixed-size frame's (offset, length), computed without touching the
    payload bytes — the planning half of video frame extraction (a real
    pipeline swaps the fixed grid for the container's keyframe index).
    Zero shuffle; the byte-ranges then drive the batched decode below."""
    media = attach_payload(load_table(spark, sf_dir, "documents"))
    idx = media.select(
        "doc_id",
        "byte_len",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                # integer division on BOTH engines: DuckDB's CAST(double AS
                # BIGINT) rounds half-to-even, which fabricates an extra
                # (negative-length) frame when (byte_len-1)/256 has
                # fractional part >= 0.5 near a stride boundary
                F.expr(f"(byte_len - 1) div {FRAME_BYTES}"),
                F.lit(FRAME_STRIDE).cast("bigint"),
            )
        ).alias("frame_idx"),
    )
    return idx.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx") * FRAME_BYTES).cast("bigint").alias("frame_offset"),
        F.least(
            F.lit(FRAME_BYTES), F.col("byte_len") - F.col("frame_idx") * FRAME_BYTES
        )
        .cast("int")
        .alias("frame_len"),
    )


def sample_frame_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Frame-level feature extraction: one mapInPandas pass slices each
    payload into its sampled frames and featurizes them — the per-frame
    fan-out happens INSIDE the Arrow batch (no pre-explode of binary
    columns through a shuffle), so each payload's bytes cross the Python
    boundary exactly once."""

    def run(batches):  # Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max(1, (len(raw) + FRAME_BYTES - 1) // FRAME_BYTES)
                for frame_idx in range(0, n_frames, FRAME_STRIDE):
                    frame = raw[frame_idx * FRAME_BYTES : (frame_idx + 1) * FRAME_BYTES]
                    d = decode_stub(frame, "video/frame", fake=fake_decode)
                    out.append((doc_id, frame_idx, d["features"]))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "features"])

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
