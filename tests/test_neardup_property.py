"""Property-based tests (hypothesis) for the one-pass LSH dedup verdict.

The fixture corpus exercises the rule on realistic text; these generate
ADVERSARIAL corpora — exact clones, shared prefixes, sub-shingle-length
docs, repeated tokens — and assert the verdict's contract invariants on
every one.  Spark round-trips are slow, so examples are few but each
corpus is checked against all invariants at once."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators.dedup import (
    minhash_band_keys,
    near_dedup_batch_verdict,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

doc_text = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12).map(" ".join)


@st.composite
def corpora(draw):
    base = draw(st.lists(doc_text, min_size=2, max_size=6))
    docs = list(base)
    # adversarial structure: clone an earlier doc, and extend another
    if len(base) >= 1 and draw(st.booleans()):
        docs.append(base[0])  # exact clone of the smallest doc_id
    if len(base) >= 2 and draw(st.booleans()):
        docs.append(base[1] + " omega")  # shared-prefix near-dup
    return [(i, t) for i, t in enumerate(docs)]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpora())
def test_one_pass_verdict_invariants(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    verdict = {r.doc_id: r.keep for r in near_dedup_batch_verdict(df, None).collect()}
    bk = minhash_band_keys(df).collect()
    buckets: dict[tuple, list[int]] = {}
    for r in bk:
        buckets.setdefault((r.band_id, r.band_hash), []).append(r.doc_id)
    doc_buckets: dict[int, list[list[int]]] = {}
    for members in buckets.values():
        for d in members:
            doc_buckets.setdefault(d, []).append(members)

    all_ids = {i for i, _ in corpus}
    # 1. total: every doc gets exactly one verdict
    assert set(verdict) == all_ids

    for doc_id, text in corpus:
        n_tokens = len([t for t in text.split(" ") if t])
        if n_tokens < 3:
            # 2. sub-shingle docs have no band keys and are always kept
            assert doc_id not in doc_buckets
            assert verdict[doc_id] is True
            continue
        owns_all = all(doc_id == min(ms) for ms in doc_buckets[doc_id])
        # 3. the rule: keep iff the doc owns (is the min of) every bucket
        assert verdict[doc_id] is owns_all, (doc_id, text)
        if not verdict[doc_id]:
            # 4. every dropped doc shares a bucket with a smaller doc
            assert any(min(ms) < doc_id for ms in doc_buckets[doc_id])

    # 5. an exact clone of doc 0 (identical text, >= 3 tokens) is dropped
    texts = dict(corpus)
    for doc_id, text in corpus:
        if doc_id > 0 and text == texts[0] and len(text.split(" ")) >= 3:
            assert verdict[doc_id] is False

    # 6. chains terminate: every bucket's minimum member is kept OR loses
    #    some other bucket to an even smaller doc (no orphan clusters)
    for members in buckets.values():
        m = min(members)
        if not verdict[m]:
            assert any(min(ms) < m for ms in doc_buckets[m])
