"""Contract tests for functions.cache.tracked_scope (r7 advice): ad-hoc
callers get deterministic release of operator-persisted intermediates
without depending on a harness calling release_tracked()."""

from __future__ import annotations

from iceberg_table_generator_spark.functions import cache
from iceberg_table_generator_spark.functions.cache import (
    persist_tracked,
    tracked_scope,
)
from iceberg_table_generator_spark.sources.tables import load_table


def test_tracked_scope_releases_only_inner_frames(spark, sf_small):
    outer = persist_tracked(load_table(spark, sf_small, "region"))
    outer.count()
    with tracked_scope():
        inner = persist_tracked(load_table(spark, sf_small, "nation"))
        inner.count()
        assert inner.storageLevel.useDisk
    # Inner frame released and de-registered; outer untouched.
    assert not inner.storageLevel.useDisk
    assert outer.storageLevel.useDisk
    assert outer in cache._TRACKED
    assert inner not in cache._TRACKED


def test_tracked_scope_releases_on_exception(spark, sf_small):
    try:
        with tracked_scope():
            inner = persist_tracked(load_table(spark, sf_small, "nation"))
            inner.count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not inner.storageLevel.useDisk
    assert inner not in cache._TRACKED
