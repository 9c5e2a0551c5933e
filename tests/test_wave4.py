"""Mathematical invariants for the round-7 wave-4 operators.

Each pins a property the oracle hash can't see on its own (the oracle
proves cross-engine equality; these prove the STATISTIC is the one the
docstring claims).
"""

from __future__ import annotations

from iceberg_table_generator_spark.operators.graph import (
    BFS_MAX_HOPS,
    events_bfs_hops,
    events_clustering_coefficient,
    events_modularity,
    events_triangle_count,
)
from iceberg_table_generator_spark.operators.incremental import (
    incremental_minmax_maintenance,
)
from iceberg_table_generator_spark.operators.metadata_tables import (
    _value_fixture_table,
)
from iceberg_table_generator_spark.operators.mining import (
    dq_fd_audit,
    lineitem_discount_elasticity,
    orders_autocorrelation,
    orders_fanout_hist,
    stats_theil_sen_trend,
    stats_two_proportion_z,
    stats_welch_ttest,
    supplier_herfindahl,
)
from iceberg_table_generator_spark.operators.pipeline import (
    TRIM_PCT,
    pipeline_trimmed_mean,
)
from iceberg_table_generator_spark.operators.sequences import (
    events_peak_concurrency,
)
from iceberg_table_generator_spark.operators.text import text_typo_pairs
from iceberg_table_generator_spark.sources.tables import load_table

import pyspark.sql.functions as F


def test_clustering_coefficient_bounds_and_triangle_parity(spark, sf_small):
    """local_cc ∈ [0,1]; per-node triangle counts must equal the standalone
    triangle-count query's (same graph, same algorithm)."""
    cc = {r.node: r for r in events_clustering_coefficient(spark, sf_small).collect()}
    tri = {r.node: r for r in events_triangle_count(spark, sf_small).collect()}
    assert cc
    for node, r in cc.items():
        if r.degree >= 2:
            assert 0.0 <= r.local_cc <= 1.0
            assert abs(
                r.local_cc
                - round(2 * r.n_triangles / (r.degree * (r.degree - 1)), 6)
            ) < 1e-12
        else:
            assert r.local_cc is None
        assert tri[node].n_triangles == r.n_triangles
        assert tri[node].degree == r.degree


def test_bfs_root_is_zero_and_hops_are_tight(spark, sf_small):
    """Exactly one hop-0 node (the root); every hop level h ≥ 1 is
    non-empty only if level h−1 is; hops never exceed the cap."""
    rows = events_bfs_hops(spark, sf_small).collect()
    hops = [r.hop for r in rows if r.hop is not None]
    assert hops.count(0) == 1
    levels = set(hops)
    for h in sorted(levels):
        assert h <= BFS_MAX_HOPS
        if h > 0:
            assert h - 1 in levels, "BFS levels must be contiguous"


def test_modularity_partition_identities(spark, sf_small):
    """Σ d_total = 2m (every edge endpoint counted once), Σ e_within ≤ m,
    and each q_scaled matches 4m·e_c − d_c² with Σ q_contrib ≤ 1."""
    rows = events_modularity(spark, sf_small).collect()
    assert rows
    # recover m from any row: q_scaled = 4m·e_within − d_total²
    r0 = max(rows, key=lambda r: r.e_within)
    m4 = (r0.q_scaled + r0.d_total * r0.d_total) // r0.e_within
    assert m4 % 4 == 0
    m = m4 // 4
    assert sum(r.d_total for r in rows) == 2 * m
    assert sum(r.e_within for r in rows) <= m
    for r in rows:
        assert r.q_scaled == 4 * m * r.e_within - r.d_total * r.d_total
    q = sum(r.q_scaled for r in rows) / (4 * m * m)
    assert -1.0 <= q <= 1.0


def test_welch_t_sign_and_df_bounds(spark, sf_small):
    """t's sign follows the mean difference; Welch df lies between
    min(n_a, n_b) − 1 and n_a + n_b − 2 (the classical bracketing)."""
    r = stats_welch_ttest(spark, sf_small).collect()[0]
    assert (r.t_welch > 0) == (r.mean_a > r.mean_b)
    assert min(r.n_a, r.n_b) - 1 <= r.df_welch <= r.n_a + r.n_b - 2


def test_two_proportion_counts_consistent(spark, sf_small):
    """Cell counts are consistent and proportions land in [0, 1e6]."""
    r = stats_two_proportion_z(spark, sf_small).collect()[0]
    assert 0 <= r.k_1 <= r.n_1 and 0 <= r.k_2 <= r.n_2
    assert 0 <= r.p1_micro <= 1_000_000 and 0 <= r.p2_micro <= 1_000_000
    assert (abs(r.z_score) > 1.96) == r.reject_95


def test_theil_sen_pair_count_identity(spark, sf_small):
    """n_pairs must be C(n_months, 2) — every month pair used once."""
    for r in stats_theil_sen_trend(spark, sf_small).collect():
        assert r.n_pairs == r.n_months * (r.n_months - 1) // 2


def test_typo_pairs_match_bruteforce(spark, sf_small):
    """The deletion-neighborhood blocking must find EXACTLY the pairs a
    brute-force Levenshtein join finds (FastSS completeness)."""
    import pandas as pd

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    docs = load_table(spark, sf_small, "documents")
    vocab = sorted(
        r.w
        for r in docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .distinct()
        .collect()
    )
    expected = {
        (a, b)
        for i, a in enumerate(vocab)
        for b in vocab[i + 1 :]
        if lev(a, b) <= 2
    }
    got = {
        (r.word_a, r.word_b)
        for r in text_typo_pairs(spark, sf_small).collect()
    }
    assert got == expected
    assert expected, "fixture vocabulary contains near-spellings"


def test_peak_concurrency_bounds(spark, sf_small):
    """Peak concurrency is ≥ 1 and can't exceed the distinct-user count."""
    rows = events_peak_concurrency(spark, sf_small).collect()
    assert rows
    n_users = (
        load_table(spark, sf_small, "events").select("user_id").distinct().count()
    )
    peak = rows[0].concurrent_sessions
    assert 1 <= peak <= n_users
    assert all(r.concurrent_sessions <= peak for r in rows)


def test_hhi_bounds(spark, sf_small):
    """10000/n ≤ HHI ≤ 10000 (equality ↔ uniform / monopoly)."""
    for r in supplier_herfindahl(spark, sf_small).collect():
        assert 10000.0 / r.n_suppliers <= r.hhi + 1e-9
        assert r.hhi <= 10000.0 + 1e-9


def test_fanout_histogram_totals(spark, sf_small):
    """Bucket order counts must sum to the distinct-order total and
    shares to ≤ 10000 bp (truncating div loses at most n_buckets bp)."""
    rows = orders_fanout_hist(spark, sf_small).collect()
    n_orders = (
        load_table(spark, sf_small, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert sum(r.n_orders for r in rows) == n_orders
    assert sum(r.share_bp for r in rows) <= 10000
    for r in rows:
        assert r.total_parts <= r.n_lines * r.n_orders


def test_fd_audit_key_dependency_holds(spark, sf_small):
    """The PK-derived FD must hold; violating row mass implies ≥ 2 rows
    per violating LHS group."""
    rows = {r.fd: r for r in dq_fd_audit(spark, sf_small).collect()}
    assert rows["o_orderkey -> o_custkey"].holds
    for r in rows.values():
        assert r.holds == (r.violating_lhs == 0)
        assert r.violating_rows >= 2 * r.violating_lhs


def test_minmax_ivm_matches_recompute(spark, sf_small):
    """The maintained MIN/MAX must equal a from-scratch recompute of the
    fixture's final visible state."""
    got = {
        r.lang: (r.min_source, r.max_source, r.cnt)
        for r in incremental_minmax_maintenance(spark, sf_small).collect()
    }
    final = _value_fixture_table(spark, sf_small).read()
    exp = {
        r.lang: (r.mn, r.mx, r.cnt)
        for r in final.groupBy("lang")
        .agg(
            F.min("source").alias("mn"),
            F.max("source").alias("mx"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    }
    assert got == exp


def test_correlations_bounded(spark, sf_small):
    """ACF and Pearson r are correlations: |r| ≤ 1."""
    for r in orders_autocorrelation(spark, sf_small).collect():
        assert abs(r.acf) <= 1.0 + 1e-9
    for r in lineitem_discount_elasticity(spark, sf_small).collect():
        assert abs(r.pearson_r) <= 1.0 + 1e-9


def test_trimmed_mean_within_range_and_kept_count(spark, sf_small):
    """n_kept = n − 2⌊n·pct/100⌋ and the trimmed mean lies within the
    untrimmed min/max (strictly inside when anything was trimmed)."""
    rows = pipeline_trimmed_mean(spark, sf_small).collect()
    d = load_table(spark, sf_small, "documents")
    rng = {
        r.source: (r.mn, r.mx)
        for r in d.groupBy("source")
        .agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
        .collect()
    }
    for r in rows:
        t = (r.n * TRIM_PCT) // 100
        assert r.n_kept == r.n - 2 * t
        mn, mx = rng[r.source]
        assert mn <= r.trimmed_mean <= mx


def test_hilbert_codes_match_reference_and_are_adjacent(spark, sf_small):
    """The emitted codes must equal the classic xy2d reference, the map
    (a,b) → h must be injective, and consecutive h values must be
    grid-adjacent (the Hilbert locality property Morton lacks)."""
    from iceberg_table_generator_spark.operators.zorder import (
        _HILBERT_BITS,
        _HILBERT_N,
    )
    from iceberg_table_generator_spark.registry import all_queries

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = n - 1 - x
                    y = n - 1 - y
                x, y = y, x
            s //= 2
        return d

    rows = all_queries()["zorder_hilbert_codes"](spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.h == xy2d(_HILBERT_N, r.a, r.b)
    # full-curve properties at a smaller order (n=16), via the same
    # reference: bijection + unit-step adjacency
    n = 16
    seen = {}
    for x in range(n):
        for y in range(n):
            seen[xy2d(n, x, y)] = (x, y)
    assert sorted(seen) == list(range(n * n))
    for d in range(1, n * n):
        x0, y0 = seen[d - 1]
        x1, y1 = seen[d]
        assert abs(x1 - x0) + abs(y1 - y0) == 1


def test_pca_power_unit_norm_and_eigen_residual(spark, sf_small):
    """The reported loadings must be a unit vector whose Rayleigh quotient
    dominates the trace share of any single metric, with a small eigen
    residual ‖Cv − λv‖ relative to λ (power iteration converged)."""
    import numpy as np

    from iceberg_table_generator_spark.operators.wide import (
        _PICKED,
        _wide_fixture,
        wide_metrics_pca_power,
    )

    r = wide_metrics_pca_power(spark, sf_small).collect()[0]
    v = np.array([r[f"loading_{m}"] for m in _PICKED])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    assert 0.0 < r.explained_ratio <= 1.0 + 1e-9
    X = np.array(
        spark.read.parquet(_wide_fixture(spark)).select(*_PICKED).collect(),
        dtype=float,
    )
    n = X.shape[0]
    C = n * (X.T @ X) - np.outer(X.sum(0), X.sum(0))  # unnormalized cov
    lam = v @ C @ v
    resid = np.linalg.norm(C @ v - lam * v)
    assert resid < 0.05 * abs(lam)
    # top eigenvalue share matches the reported explained ratio
    assert abs(lam / np.trace(C) - r.explained_ratio) < 1e-4


def test_ohlc_candle_ordering(spark, sf_small):
    """low ≤ {open, close} ≤ high in every candle."""
    from iceberg_table_generator_spark.operators.sequences import (
        events_ohlc_hourly,
    )

    rows = events_ohlc_hourly(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high


def test_markov_stationary_is_fixed_point(spark, sf_small):
    """π sums to 1 and satisfies π ≈ πP for the empirical transition
    matrix (checked against a numpy recompute)."""
    import numpy as np

    from iceberg_table_generator_spark.operators.sequences import (
        MARKOV_STATES,
        events_markov_stationary,
        events_markov_transitions,
    )

    r = events_markov_stationary(spark, sf_small).collect()[0]
    pi = np.array([r[f"pi_{s}"] for s in MARKOV_STATES])
    assert abs(pi.sum() - 1.0) < 1e-4
    assert (pi >= 0).all()
    t = events_markov_transitions(spark, sf_small).collect()
    n = len(MARKOV_STATES)
    idx = {s: i for i, s in enumerate(MARKOV_STATES)}
    C = np.zeros((n, n))
    for row in t:
        C[idx[row.from_type], idx[row.to_type]] = row.n_transitions
    P = C / C.sum(1, keepdims=True)
    assert np.abs(pi @ P - pi).max() < 1e-4


def test_rank_correlations_match_python_replay(spark, sf_small):
    """Spearman (average ranks) and Kendall τ-b recomputed in plain Python
    from the raw points must match the closed-form engine results."""
    from collections import Counter

    from iceberg_table_generator_spark.operators.mining import (
        stats_kendall_tau,
        stats_spearman_rho,
    )

    li = load_table(spark, sf_small, "lineitem").select(
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("d"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    pts = [(r.d, r.q) for r in li.collect()]
    n = len(pts)

    def avg_ranks(vals):
        cnt = Counter(vals)
        r, cum = {}, 0
        for v in sorted(cnt):
            r[v] = cum + (cnt[v] + 1) / 2
            cum += cnt[v]
        return r

    rd = avg_ranks([d for d, _ in pts])
    rq = avg_ranks([q for _, q in pts])
    xs = [rd[d] for d, _ in pts]
    ys = [rq[q] for _, q in pts]
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = (
        sum((x - mx) ** 2 for x in xs) * sum((y - my) ** 2 for y in ys)
    ) ** 0.5
    rho_ref = num / den
    rho = stats_spearman_rho(spark, sf_small).collect()[0].spearman_rho
    assert abs(rho - rho_ref) < 1e-6

    cells = Counter(pts)
    items = list(cells.items())
    nc = nd = 0
    for i, ((d1, q1), c1) in enumerate(items):
        for (d2, q2), c2 in items[i + 1 :]:
            s = (d2 - d1) * (q2 - q1)
            if s > 0:
                nc += c1 * c2
            elif s < 0:
                nd += c1 * c2
    cd = Counter(d for d, _ in pts)
    cq = Counter(q for _, q in pts)
    n0 = n * (n - 1) / 2
    n1 = sum(c * (c - 1) / 2 for c in cd.values())
    n2 = sum(c * (c - 1) / 2 for c in cq.values())
    tau_ref = (nc - nd) / (((n0 - n1) * (n0 - n2)) ** 0.5)
    row = stats_kendall_tau(spark, sf_small).collect()[0]
    assert row.n_concordant == nc and row.n_discordant == nd
    assert abs(row.kendall_tau_b - tau_ref) < 1e-6


def test_prorate_sums_exactly_per_order(spark, sf_small):
    """Every order's allocations are whole cents summing exactly to the
    fee, and each allocation differs from exact proportionality by < 1¢."""
    from iceberg_table_generator_spark.operators.relational_ext import (
        PRORATE_FEE_CENTS,
        lineitem_prorate_fee,
    )

    rows = lineitem_prorate_fee(spark, sf_small).collect()
    per_order: dict[int, list] = {}
    for r in rows:
        per_order.setdefault(r.l_orderkey, []).append(r)
    assert per_order
    for ok, lines in per_order.items():
        assert sum(r.alloc_cents for r in lines) == PRORATE_FEE_CENTS
        tot = sum(r.price_cents for r in lines)
        for r in lines:
            exact = PRORATE_FEE_CENTS * r.price_cents / tot
            assert abs(r.alloc_cents - exact) < 1.0


def test_hilbert_locality_beats_morton(spark, sf_small):
    """Summed slice bounding-box half-perimeters: Hilbert ≤ Morton on the
    same data (the documented reason to prefer Hilbert clustering)."""
    from iceberg_table_generator_spark.registry import all_queries

    rows = all_queries()["zorder_locality_audit"](spark, sf_small).collect()
    tot = {"hilbert": 0, "morton": 0}
    for r in rows:
        tot[r.scheme] += r.bbox_halfperim
    assert tot["hilbert"] <= tot["morton"]
    assert tot["hilbert"] > 0
