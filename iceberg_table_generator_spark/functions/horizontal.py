"""Horizontal (row-wise, across-columns) operations for wide schemas.

The reference's 1000-column `wide_metrics` table (`Main.java:76-82`) makes
naive horizontal expressions fail: a Python `sum(cols)` builds a
left-nested Add tree 999 deep and Catalyst's recursive analyzer throws
StackOverflowError.  The scalable form packs the columns into ONE flat
array node and folds at runtime:

    hsum(cols)  ==  aggregate(array(cols...), 0.0, (acc, x) -> acc + x)

— expression depth O(1), evaluation O(width) per row, codegen-friendly.
Same pattern for any row-wise reduction over hundreds of columns.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def _arr(cols: list[Column | str]) -> Column:
    return F.array(*[F.col(c) if isinstance(c, str) else c for c in cols])


def hsum(cols: list[Column | str]) -> Column:
    """Row-wise sum across columns (flat plan at any width)."""
    return F.aggregate(_arr(cols), F.lit(0.0), lambda acc, x: acc + x)


def havg(cols: list[Column | str]) -> Column:
    return hsum(cols) / F.lit(len(cols))


def hmax(cols: list[Column | str]) -> Column:
    return F.array_max(_arr(cols))


def hmin(cols: list[Column | str]) -> Column:
    return F.array_min(_arr(cols))


def hcount_if(cols: list[Column | str], predicate) -> Column:
    """Row-wise count of columns satisfying `predicate` (a Column lambda)."""
    return F.size(F.filter(_arr(cols), predicate))
