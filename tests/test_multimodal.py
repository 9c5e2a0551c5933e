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
