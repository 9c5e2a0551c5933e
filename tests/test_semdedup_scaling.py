"""SemDeDup k-scaling property (r11 verdict #3).

The SemDeDup family's 100 TB posture rests on one claim: the pair join's
O(Σ cᵢ²) cost stays bounded because production scales k WITH the corpus
(the paper's 50k clusters on LAION) so cluster size — and with it pair
count per key — stays flat.  `ivf_fit(k=…)` makes k a real parameter;
this suite makes the claim EMPIRICAL on a synthetic fixture (the
`test_global_order.py` tie-fixture pattern: deterministic data built to
exercise exactly one scaling property).  The probe itself lives in
`operators/wave13.py::semdedup_k_scaling_probe` (shared with
scripts/scaling_report.py, which publishes the measured Σ cᵢ² values in
SCALING.md):

  * fit at two corpus sizes with k ∝ √N,
  * the probe asserts the realized prior-pair count equals its
    Σ cᵢ(cᵢ−1)/2 bound (the pair join materializes exactly the
    cluster-local pairs, nothing more),
  * this test asserts Σ cᵢ² follows the sub-quadratic N^1.5 law that
    k ∝ √N predicts (a fixed-k engine would grow quadratically — ratio
    16 at a 4× corpus step vs 8 for the law; the assert sits between).
"""

from __future__ import annotations

import math

from iceberg_table_generator_spark.operators.wave13 import (
    semdedup_k_scaling_probe,
)


def test_semdedup_pair_count_scales_subquadratically(spark):
    n1, n2 = 512, 2048
    k1, c2_1, p1 = semdedup_k_scaling_probe(spark, n1)
    k2, c2_2, p2 = semdedup_k_scaling_probe(spark, n2)
    print(
        f"\nsemdedup k-scaling: N={n1} k={k1} sum_c2={c2_1} pairs={p1}; "
        f"N={n2} k={k2} sum_c2={c2_2} pairs={p2}; "
        f"ratio={c2_2 / c2_1:.2f} (law=8.0, quadratic=16.0)"
    )
    # k ∝ √N ⟹ Σ cᵢ² ≈ k·(N/k)² = N^1.5: a 4× corpus step should cost
    # ~8× the pair work.  Fixed k would cost 16×.  12 splits the gap with
    # headroom for cluster-size skew; a quadratic regression still fails.
    assert c2_2 <= 12 * c2_1, (c2_1, c2_2)
    # and the per-vector pair burden grows no faster than the √N law
    # predicts (with the same skew headroom)
    assert p2 / n2 <= 3.0 * math.sqrt(n2 / n1) * max(p1 / n1, 1.0)
