"""Multimodal plumbing: schema, Arrow batch shapes, stubbed decode."""

from __future__ import annotations

import pytest

from iceberg_table_generator_spark.operators import multimodal
from iceberg_table_generator_spark.sources.tables import load_table


def test_attach_payload_schema(spark, sf_small):
    m = multimodal.attach_payload(load_table(spark, sf_small, "documents"))
    assert [f.name for f in m.schema.fields] == ["doc_id", "payload", "mime", "byte_len"]
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.first()
    assert isinstance(row.payload, bytearray | bytes)
    assert row.byte_len == len(row.payload)


def test_extract_features_fake_decode(spark, sf_small):
    m = multimodal.attach_payload(load_table(spark, sf_small, "documents"))
    feats = multimodal.extract_features(m, fake_decode=True)
    assert feats.schema == multimodal.FEATURE_SCHEMA
    rows = feats.limit(20).collect()
    assert rows
    for r in rows:
        assert 1 <= r.width <= 640 and 1 <= r.height <= 480
        assert len(r.features) == 8
        assert all(0.0 <= f <= 1.0 for f in r.features)


def test_fake_decode_deterministic():
    a = multimodal.decode_stub(b"hello world", "text/plain", fake=True)
    b = multimodal.decode_stub(b"hello world", "text/plain", fake=True)
    assert a == b


def test_real_decode_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"xx", "image/png", fake=False)


def test_real_decode_raises_through_spark(spark, sf_small):
    m = multimodal.attach_payload(load_table(spark, sf_small, "documents"))
    feats = multimodal.extract_features(m, fake_decode=False)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((Py4JJavaError, PythonException)):
        feats.first()


def test_frame_features_match_frame_index(spark, sf_small):
    """The batched frame featurizer must produce exactly the frames the
    zero-shuffle index query plans, with fixed-size feature vectors."""
    from iceberg_table_generator_spark.operators.multimodal import (
        attach_payload,
        multimodal_frame_index,
        sample_frame_features,
    )
    from iceberg_table_generator_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").limit(50)
    media = attach_payload(docs)
    feats = sample_frame_features(media).collect()
    planned = {
        (r.doc_id, r.frame_idx)
        for r in multimodal_frame_index(spark, sf_small).collect()
    }
    got = {(r.doc_id, r.frame_idx) for r in feats}
    assert got <= planned
    assert all(len(r.features) == 8 for r in feats)
    # deterministic fake decode: same input -> same features
    again = {(r.doc_id, r.frame_idx): r.features for r in sample_frame_features(media).collect()}
    for r in feats:
        assert again[(r.doc_id, r.frame_idx)] == r.features


def test_chunk_dedup_ascii_precondition(spark, sf_small, sf_medium):
    """The chunk-dedup oracle recomputes BYTE chunks via DuckDB's
    CHARACTER-offset substring — sound only while the corpus is pure
    ASCII.  Pin the precondition so a future testdata change fails here
    with a clear message instead of as an oracle hash-mismatch."""
    import pyspark.sql.functions as F

    from iceberg_table_generator_spark.sources.tables import load_table

    for sf in (sf_small, sf_medium):
        bad = (
            load_table(spark, sf, "documents")
            .filter(F.octet_length(F.col("text")) != F.length(F.col("text")))
            .count()
        )
        assert bad == 0, (
            f"{sf}: {bad} non-ASCII documents — the multimodal_chunk_dedup "
            "oracle's char-offset/byte-offset equivalence no longer holds"
        )


def test_chunk_dedup_pair_recomputable_from_bytes(spark, sf_small):
    """Take one reported pair and recompute its chunk overlap directly
    from the raw text bytes driver-side — the operator's shared count and
    containment must match the ground truth exactly."""
    import hashlib

    import pyspark.sql.functions as F

    from iceberg_table_generator_spark.operators.multimodal import (
        CHUNK_BYTES,
        multimodal_chunk_dedup,
    )
    from iceberg_table_generator_spark.sources.tables import load_table

    out = multimodal_chunk_dedup(spark, sf_small)
    rows = out.orderBy("doc_a", "doc_b").limit(1).collect()
    assert rows, "fixture yields no chunk-sharing pairs — test is vacuous"
    pair = rows[0]

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_small, "documents")
        .filter(F.col("doc_id").isin(pair.doc_a, pair.doc_b))
        .collect()
    }

    def chunk_set(text: str) -> set[str]:
        raw = text.encode("utf-8")
        return {
            hashlib.md5(raw[i : i + CHUNK_BYTES]).hexdigest()
            for i in range(0, len(raw), CHUNK_BYTES)
        }

    sa, sb = chunk_set(texts[pair.doc_a]), chunk_set(texts[pair.doc_b])
    shared = len(sa & sb)
    assert pair.shared_chunks == shared
    assert abs(pair.containment - shared / min(len(sa), len(sb))) < 1e-6
