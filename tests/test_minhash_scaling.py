"""MinHash-LSH candidate-growth property (r12 verdict #3).

The lexical-dedup family's 100 TB posture rests on the banding claim:
LSH candidates are bounded by band-bucket collisions, so at a FIXED
duplicate rate the candidate-pair count grows ~LINEARLY in the corpus —
the all-pairs O(N²) join the family exists to avoid would grow
quadratically.  `semdedup_k_scaling_probe` made the semantic tier's law
empirical in r12; this is the lexical twin (probe in
`operators/wave19.py::minhash_candidate_scaling_probe`, measured values
published in SCALING.md).

Fixture: deterministic synthetic docs (no RNG) drawing words from a ~10⁶
token space, with every PERIOD-th doc an exact copy of its predecessor —
the planted duplicates.  Distinct docs share no shingles, so every band
bucket holds either one doc or one planted pair.
"""

from __future__ import annotations

from iceberg_table_generator_spark.operators.wave19 import (
    minhash_candidate_scaling_probe,
)


def test_lsh_candidates_grow_linearly(spark):
    n1, n2 = 800, 3200
    p1, c1 = minhash_candidate_scaling_probe(spark, n1)
    p2, c2 = minhash_candidate_scaling_probe(spark, n2)
    print(
        f"\nminhash candidate scaling: N={n1} planted={p1} cand={c1}; "
        f"N={n2} planted={p2} cand={c2}; "
        f"ratio={c2 / max(c1, 1):.2f} (linear=4.0, quadratic=16.0)"
    )
    # every planted pair must be found (identical docs collide in EVERY
    # band), and accidental collisions must stay a small fraction
    assert c1 >= p1 and c2 >= p2
    assert c1 <= 1.5 * p1 and c2 <= 1.5 * p2
    # 4× corpus ⇒ ~4× candidates at fixed duplicate rate; 6 allows
    # accidental-collision noise, a quadratic blowup (16×) still fails
    assert c2 <= 6 * c1, (c1, c2)
