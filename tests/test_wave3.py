"""Mathematical invariants for the round-7 wave-3 operators.

Each pins a property the oracle hash can't see on its own (the oracle
proves cross-engine equality; these prove the STATISTIC is the one the
docstring claims).
"""

from __future__ import annotations

import pytest

from iceberg_table_generator_spark.operators.dedup import (
    PF_TAU_DEN,
    PF_TAU_NUM,
    dedup_prefix_filter_join,
)
from iceberg_table_generator_spark.operators.graph import (
    HITS_ITERS,
    HITS_SCALE,
    events_hits_scores,
)
from iceberg_table_generator_spark.operators.incremental import (
    TOPK_K,
    incremental_topk_maintenance,
)
from iceberg_table_generator_spark.operators.mining import (
    orders_survival_hazard,
    stats_mann_whitney_u,
)
from iceberg_table_generator_spark.operators.sequences import (
    DECAY_CAP_WEEKS,
    events_cusum_changepoint,
    events_decay_engagement,
)
from iceberg_table_generator_spark.operators.text import (
    PHRASE_TOP_K,
    text_phrase_search,
)
from iceberg_table_generator_spark.sources.tables import load_table


def test_mwu_pair_count_identity(spark, sf_small):
    """2U_A + 2U_B must equal 2·n_a·n_b — every cross pair is counted
    exactly once on each side (the tie-handling sanity check)."""
    row = stats_mann_whitney_u(spark, sf_small).collect()[0]
    assert row.u2_a + row.u2_b == 2 * row.n_a * row.n_b
    assert row.lang_a != row.lang_b


def test_prefix_filter_jaccard_threshold(spark, sf_small):
    """Every emitted pair genuinely meets the Jaccard threshold, with
    intersection bounded by both set sizes."""
    rows = dedup_prefix_filter_join(spark, sf_small).collect()
    assert rows, "fixture corpus contains near-dup pairs"
    for r in rows:
        union = r.size_a + r.size_b - r.shared
        assert PF_TAU_DEN * r.shared >= PF_TAU_NUM * union
        assert r.shared <= min(r.size_a, r.size_b)
        assert r.jacc_bp == (10000 * r.shared) // union
        assert r.doc_a < r.doc_b


def test_survival_life_table_consistency(spark, sf_small):
    """at-risk counts telescope: n_at_risk(b) = n_at_risk(b+1) + events(b)
    + censored(b), and the top bucket's at-risk equals every order."""
    rows = sorted(
        orders_survival_hazard(spark, sf_small).collect(),
        key=lambda r: r.bucket,
    )
    n_orders = load_table(spark, sf_small, "orders").count()
    assert rows[0].bucket == 0 and rows[0].n_at_risk == n_orders
    for cur, nxt in zip(rows, rows[1:]):
        assert (
            cur.n_at_risk - cur.n_events - cur.n_censored == nxt.n_at_risk
        )
    last = rows[-1]
    assert last.n_at_risk == last.n_events + last.n_censored


def test_hits_mass_and_sinks(spark, sf_small):
    """Scores are non-negative, the total stays within the normalization
    band (sum <= SCALE + |V| truncation slack, and > 0), and a node with
    no out-edges has hub exactly 0."""
    rows = events_hits_scores(spark, sf_small).collect()
    assert all(r.hub_micro >= 0 and r.auth_micro >= 0 for r in rows)
    assert sum(r.auth_micro for r in rows) > 0
    # reconstruct out-degree from the same transition definition
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_small, "events").select(
        "user_id", "ts", "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("k").alias("src"), F.lead("k").over(w).alias("dst"))
    srcs = {
        r.src for r in seq.filter(F.col("dst").isNotNull()).select("src").distinct().collect()
    }
    for r in rows:
        if r.node not in srcs:
            assert r.hub_micro == 0


def test_cusum_matches_recursive_definition(spark, sf_small):
    """The two-window closed form equals the textbook recursion
    S_t = max(0, S_{t-1} + n·x_t - tot), replayed per event type in
    plain Python over the same hourly series."""
    import pyspark.sql.functions as F

    ev = load_table(spark, sf_small, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in hourly:
        by_type.setdefault(r.event_type, []).append((r.hr, r.c))
    expected = {}
    for et, series in by_type.items():
        series.sort()
        n = len(series)
        tot = sum(c for _, c in series)
        s = 0
        peak, peak_hr = -1, None
        for hr, c in series:
            s = max(0, s + n * c - tot)
            if s > peak:
                peak, peak_hr = s, hr
        expected[et] = (peak, peak_hr)
    got = events_cusum_changepoint(spark, sf_small).collect()
    assert len(got) == len(expected)
    for r in got:
        peak, peak_hr = expected[r.event_type]
        assert r.peak_cusum_scaled == peak
        assert str(peak_hr) == r.peak_hour


def test_decay_score_bounds(spark, sf_small):
    """Each event contributes between 2^0 and 2^CAP, so the score is
    bounded by n_events and n_events << CAP."""
    rows = events_decay_engagement(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.n_events <= r.decayed_score <= r.n_events * (
            1 << DECAY_CAP_WEEKS
        )
    scores = [r.decayed_score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_topk_maintenance_equals_recompute(spark, sf_small):
    """The insert-only union algebra reproduces the full-table top-K
    (the IVM claim, asserted directly against a recompute)."""
    import pyspark.sql.functions as F

    got = incremental_topk_maintenance(spark, sf_small).collect()
    full = (
        load_table(spark, sf_small, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(TOPK_K)
        .collect()
    )
    assert [r.o_orderkey for r in got] == [r.o_orderkey for r in full]
    assert [r.rank for r in got] == list(range(1, len(full) + 1))


def test_phrase_search_counts_positive(spark, sf_small):
    """Exactly K phrases, every phrase two tokens, occurrences >= docs."""
    rows = text_phrase_search(spark, sf_small).collect()
    assert len(rows) == PHRASE_TOP_K
    for r in rows:
        assert len(r.phrase.split(" ")) == 2
        assert r.n_occurrences >= r.n_docs >= 1


def test_ks_matches_python_replay(spark, sf_small):
    """D_raw from the two-window plan equals a plain-Python ECDF sweep
    over the same per-value counts."""
    from iceberg_table_generator_spark.operators.mining import (
        _top2_lang_dist,
        stats_ks_test,
    )

    got = stats_ks_test(spark, sf_small).collect()[0]
    rows = sorted(
        _top2_lang_dist(spark, sf_small).collect(), key=lambda r: r.n_chars
    )
    n_a = sum(r.ca for r in rows)
    n_b = sum(r.cb for r in rows)
    cum_a = cum_b = 0
    d_raw = 0
    for r in rows:
        cum_a += r.ca
        cum_b += r.cb
        d_raw = max(d_raw, abs(cum_a * n_b - cum_b * n_a))
    assert (got.n_a, got.n_b, got.d_raw) == (n_a, n_b, d_raw)
    assert 0 <= got.d_micro <= 1_000_000
    assert got.reject_95 == (
        1_000_000 * d_raw * d_raw > 1_844_164 * n_a * n_b * (n_a + n_b)
    )


def test_reciprocity_parity(spark, sf_small):
    """Reciprocal edges come in pairs, so the count is even; ratios stay
    in [0, 10000]."""
    from iceberg_table_generator_spark.operators.graph import events_reciprocity

    r = events_reciprocity(spark, sf_small).collect()[0]
    assert r.n_reciprocal % 2 == 0
    assert 0 <= r.recip_bp <= 10000
    assert 0 <= r.density_bp <= 10000
    assert r.n_reciprocal <= r.n_dir_edges


def test_cms_never_undercounts(spark, sf_small):
    """The min-of-rows estimate is >= the exact count for every audited
    token (the one-sided CMS error guarantee), and bounded by N."""
    from iceberg_table_generator_spark.operators.heavyhitters import (
        CMS_TOP_K,
        heavyhitters_cms_audit,
    )

    rows = heavyhitters_cms_audit(spark, sf_small).collect()
    assert len(rows) == CMS_TOP_K
    for r in rows:
        assert r.overcount >= 0
        assert r.cms_est == r.exact_cnt + r.overcount
        assert r.cms_est <= r.n_total


def test_weighted_median_crossing(spark, sf_small):
    """The reported quantity is the exact half-weight crossing point."""
    import pyspark.sql.functions as F
    from iceberg_table_generator_spark.operators.mining import (
        lineitem_weighted_median,
    )

    got = {
        r.l_returnflag: (r.weighted_median_qty, r.total_weight)
        for r in lineitem_weighted_median(spark, sf_small).collect()
    }
    li = (
        load_table(spark, sf_small, "lineitem")
        .groupBy("l_returnflag", F.col("l_quantity").cast("long").alias("q"))
        .agg(F.sum(F.round("l_extendedprice").cast("long")).alias("w"))
        .collect()
    )
    per_flag: dict[str, list] = {}
    for r in li:
        per_flag.setdefault(r.l_returnflag, []).append((r.q, r.w))
    for flag, rows in per_flag.items():
        rows.sort()
        tot = sum(w for _, w in rows)
        cum = 0
        med = None
        for q, w in rows:
            cum += w
            if 2 * cum >= tot:
                med = q
                break
        assert got[flag] == (med, tot)


def test_ewma_no_leakage_and_replay(spark, sf_small):
    """Each forecast equals the Python replay over the PREVIOUS 12 months
    only — the target month never contributes to its own forecast."""
    import pyspark.sql.functions as F
    from iceberg_table_generator_spark.operators.mining import (
        EWMA_DEN,
        EWMA_LOOKBACK,
        orders_ewma_forecast,
    )

    monthly = {
        r.mi: r.actual
        for r in load_table(spark, sf_small, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("mi")
        )
        .agg(F.count(F.lit(1)).alias("actual"))
        .collect()
    }
    got = orders_ewma_forecast(spark, sf_small).collect()
    assert got
    by_month = {r.month[:7]: r for r in got}
    for mi, actual in monthly.items():
        hist = [
            (k, monthly.get(mi - k)) for k in range(1, EWMA_LOOKBACK + 1)
        ]
        if any(v is None for _, v in hist):
            continue
        num = sum(v * (1 << (EWMA_LOOKBACK - k)) for k, v in hist)
        fc = (1_000_000 * num) // EWMA_DEN
        key = f"{mi // 12:04d}-{mi % 12 + 1:02d}"
        r = by_month[key]
        assert r.actual == actual
        assert r.forecast_micro == fc
        assert r.abs_err_micro == abs(1_000_000 * actual - fc)


def test_cooccurrence_strength_formula(spark, sf_small):
    """Pairs are canonically ordered, meet min support, and the score is
    exactly the integer PMI proxy."""
    from iceberg_table_generator_spark.operators.text import (
        COOC_MIN_SUPPORT,
        COOC_TOP_K,
        text_cooccurrence_strength,
    )

    rows = text_cooccurrence_strength(spark, sf_small).collect()
    assert 0 < len(rows) <= COOC_TOP_K
    n_tokens = (
        load_table(spark, sf_small, "documents")
        .selectExpr("size(split(lower(text), ' ')) AS n")
        .groupBy()
        .sum("n")
        .collect()[0][0]
    )
    for r in rows:
        assert r.w1 <= r.w2
        assert r.c_pair >= COOC_MIN_SUPPORT
        assert r.strength_micro == (1_000_000 * r.c_pair * n_tokens) // (
            r.c_w1 * r.c_w2
        )


def test_bot_score_replay_one_user(spark, sf_small):
    """Recompute one user's gap statistics in Python and match the row,
    including the fraction-cleared VMR flag."""
    import pyspark.sql.functions as F
    from iceberg_table_generator_spark.operators.sequences import (
        BOT_MAX_MEAN_GAP_MIN,
        BOT_MIN_EVENTS,
        BOT_VMR_THR_MILLI,
        events_bot_score,
    )

    rows = {r.user_id: r for r in events_bot_score(spark, sf_small).collect()}
    uid = sorted(rows)[0]
    ev = (
        load_table(spark, sf_small, "events")
        .filter(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .collect()
    )
    gaps = [
        (int(b.ts.timestamp()) - int(a.ts.timestamp())) // 60
        for a, b in zip(ev, ev[1:])
    ]
    ng, sg, sg2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
    r = rows[uid]
    assert r.n_events == ng + 1
    assert r.mean_gap_min_micro == (1_000_000 * sg) // ng
    assert r.vmr_num == ng * sg2 - sg * sg
    assert r.vmr_den == ng * sg
    assert r.bot_flag == (
        r.n_events >= BOT_MIN_EVENTS
        and r.mean_gap_min_micro < BOT_MAX_MEAN_GAP_MIN * 1_000_000
        and 1000 * r.vmr_num < BOT_VMR_THR_MILLI * r.vmr_den
    )


def test_audience_overlap_bounds(spark, sf_small):
    """All type pairs present, intersection bounded by each side, ratio
    in basis points."""
    from iceberg_table_generator_spark.operators.sequences import (
        events_audience_overlap,
    )

    rows = events_audience_overlap(spark, sf_small).collect()
    types = {r.type_a for r in rows} | {r.type_b for r in rows}
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        assert r.type_a < r.type_b
        assert r.n_both <= min(r.n_a, r.n_b)
        assert 0 <= r.jaccard_bp <= 10000


def test_mase_consistent_with_per_month_backtest(spark, sf_small):
    """The scorecard's EWMA error total equals the sum of the per-month
    backtest errors (identical windows by construction)."""
    from iceberg_table_generator_spark.operators.mining import (
        orders_ewma_forecast,
        orders_forecast_mase,
    )

    per_month = orders_ewma_forecast(spark, sf_small).collect()
    card = orders_forecast_mase(spark, sf_small).collect()[0]
    assert card.n_months == len(per_month)
    assert card.ewma_abs_err_micro == sum(r.abs_err_micro for r in per_month)
    assert card.ewma_wins == (
        card.ewma_abs_err_micro < card.naive_abs_err_micro
    )
    assert card.mase_micro == (1_000_000 * card.ewma_abs_err_micro) // (
        card.naive_abs_err_micro
    )


def test_vocab_growth_monotone_and_exact_tail(spark, sf_small):
    """Cumulative curves are nondecreasing, and the final point equals the
    global token/vocab/hapax totals."""
    import pyspark.sql.functions as F
    from iceberg_table_generator_spark.operators.text import text_vocab_growth

    rows = sorted(
        text_vocab_growth(spark, sf_small).collect(), key=lambda r: r.shard
    )
    for a, b in zip(rows, rows[1:]):
        assert a.tokens_cum <= b.tokens_cum
        assert a.vocab_cum <= b.vocab_cum
        assert a.hapax_cum <= b.hapax_cum
        assert a.vocab_cum <= a.tokens_cum
    tok = (
        load_table(spark, sf_small, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .groupBy("t")
        .count()
        .collect()
    )
    last = rows[-1]
    assert last.vocab_cum == len(tok)
    assert last.tokens_cum == sum(r["count"] for r in tok)
    assert last.hapax_cum == sum(1 for r in tok if r["count"] == 1)


def test_mad_anomaly_median_properties(spark, sf_small):
    """The reported median is the lower median of the hourly counts and
    the anomaly count matches a Python replay."""
    import pyspark.sql.functions as F
    from iceberg_table_generator_spark.operators.sequences import (
        MAD_K,
        events_mad_anomaly,
    )

    got = {r.event_type: r for r in events_mad_anomaly(spark, sf_small).collect()}
    hourly = (
        load_table(spark, sf_small, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    series: dict[str, list[int]] = {}
    for r in hourly:
        series.setdefault(r.event_type, []).append(r.c)
    for et, cs in series.items():
        cs.sort()
        med = cs[(len(cs) - 1) // 2]
        devs = sorted(abs(c - med) for c in cs)
        mad = devs[(len(devs) - 1) // 2]
        r = got[et]
        assert (r.n_hours, r.median_cnt, r.mad_cnt) == (len(cs), med, mad)
        assert r.n_anomalies == sum(
            1 for c in cs if abs(c - med) > MAD_K * mad
        )
