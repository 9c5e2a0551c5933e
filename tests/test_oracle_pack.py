"""Every oracle-paired query must hash-match DuckDB (the driver's t2 gate,
run here at sf0.001 for speed; scripts/check_oracle.py covers sf0.01)."""

from __future__ import annotations

import pytest

from iceberg_table_generator_spark import all_oracles, all_queries
from iceberg_table_generator_spark.plans.compare import compare_query

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, sf_small):
    res = compare_query(name, spark, sf_small, QUERIES[name], ORACLES[name])
    assert res.ok, f"{name}: {res.detail}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_small):
    # Approximate operators: no SQL oracle, but they must execute and
    # return a stable schema (behavioral checks live in their own modules).
    df = QUERIES[name](spark, sf_small)
    assert df.count() >= 0
    assert df.columns


def test_canon_int_float_distinct():
    """r6 verdict #2: the local comparator must be at least as strict as
    the driver's dtype-sensitive value hash.  An int 7 and a float 7.0
    (e.g. DuckDB HUGEINT sum -> pandas float64 vs Spark LongType) must
    canonicalize to DIFFERENT strings, across Python and numpy scalars."""
    import numpy as np

    from iceberg_table_generator_spark.plans.compare import _canon_value

    assert _canon_value(7) != _canon_value(7.0)
    assert _canon_value(np.int64(7)) != _canon_value(np.float64(7.0))
    assert _canon_value(7) == _canon_value(np.int64(7))
    assert _canon_value(7.0) == _canon_value(np.float64(7.0))
    # float32 (Spark FloatType / DuckDB REAL) is numpy-only: no float
    # inheritance, but it must still land on the tagged float path.
    assert _canon_value(np.float32(7.0)) == _canon_value(7.0)
    assert _canon_value(np.float32(7.0)) != _canon_value(7)
    # Decimal reaching pandas means an uncast aggregate — float-tagged too.
    from decimal import Decimal

    assert _canon_value(Decimal("7")) == _canon_value(7.0)
    assert _canon_value(Decimal("7")) != _canon_value(7)
    # NaN stays on the float path and is self-consistent.
    assert _canon_value(float("nan")) == _canon_value(np.float64("nan"))
    assert _canon_value(np.bool_(True)) == _canon_value(True)
