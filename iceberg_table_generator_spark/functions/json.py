"""Shared extraction of the events ``props`` payload's ``k`` field.

Every graph/sequence/heavy-hitter query over the events stream projects
the page id out of the JSON ``props`` column.  r15 (guide §1.2 — make
the per-task work cheap once the job shape is right): the projection is
one ``from_json`` with the narrow single-field schema instead of
``get_json_object`` path evaluation — both run Jackson once per row, but
the path evaluator re-tokenizes the document per call while the
schema'd reader pulls the one field directly (measured 0.33 vs 0.50 s
for the full events pass at sf0.1, ~18 query paths pay it).

Semantics: identical on the datagen's ``{"k": <int>}`` payloads —
missing key, JSON null, and malformed documents all yield NULL on both
forms, and every consumer is DuckDB-oracle-checked at 3 SFs.  The
``json_extraction`` query deliberately keeps ``get_json_object``:
exercising that operator is its point.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def props_k(dtype: str = "int") -> Column:
    """``props.k`` as a typed column (the events page id)."""
    return F.from_json("props", f"k {dtype}").getField("k")
