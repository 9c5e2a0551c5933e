"""Relational pack, batch 2: time-series joins, pivots, grouping sets,
percentiles, rolling range frames, fuzzy matching, deterministic sampling.

These extend SURVEY.md §2.7's replacement surface with the operator shapes a
training-data pipeline leans on daily.  Same engineering rules as batch 1
(operators/relational.py): declarative plans, broadcast-able dims, DECIMAL
accumulation for cross-row double sums, every query paired with a DuckDB
oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iceberg_table_generator_spark.functions.sessions import (
    SESSION_GAP_INTERVAL,
    SESSION_GAP_US,
)
from iceberg_table_generator_spark.operators.relational import DEC, davg, dsum, sql_davg, sql_dsum
from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# TPC-H Q3 shape: shipping priority (join + filter + agg + top-k)
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3.  Both date filters push to their scans; the post-filter
    customer side broadcasts under AQE; top-10 is TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("string").alias("o_orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H Q6 shape: forecasting revenue change (pure scan-filter-agg)
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 — the pure pushdown benchmark: every predicate reaches the
    parquet scan (range on date, between on discount, bound on quantity),
    then a single global aggregate with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q4 shape: order-priority checking (semi join with range predicate)
# --------------------------------------------------------------------------
@query(
    "q4_priority_check",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders having at least one lineitem shipped more than
    60 days after the order date — a LEFT SEMI join whose condition mixes
    the equi key with a cross-table range predicate (Spark evaluates the
    range part as a join residual, keeping the hash/SMJ strategy)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.make_interval(days=F.lit(60))
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue, top customers
# --------------------------------------------------------------------------
@query(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: lost-revenue ranking over returned items.  Return-flag and
    date filters push to the scans; nation broadcasts; top-20 is
    TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "c_custkey", "c_name", "n_name", "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume customers (agg-in-subquery + semi filter)
# --------------------------------------------------------------------------
@query(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150)
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           {sql_dsum('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18.  The HAVING subquery reduces to a small key set that
    semi-joins (and under AQE broadcasts) into the main join — the
    aggregate-then-filter-the-fact pattern."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).filter(
        F.col("q") > 150
    ).select("l_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


# --------------------------------------------------------------------------
# As-of join (the classic "latest prior event" operator Spark lacks natively)
# --------------------------------------------------------------------------
_ASOF_ORACLE = """
WITH tagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events WHERE event_type IN ('view', 'purchase')),
carried AS (
  SELECT user_id, event_id, ts, is_p,
         last_value(CASE WHEN is_p = 0 THEN event_id END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view_id,
         max(CASE WHEN is_p = 0 THEN ts END)
             OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view_ts
  FROM tagged)
SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
       asof_view_id,
       date_diff('second', asof_view_ts, ts) AS seconds_since_view
FROM carried
WHERE is_p = 1 AND asof_view_id IS NOT NULL
"""


# --------------------------------------------------------------------------
# Event-rate anomaly detection (z-score vs trailing 24 h)
# --------------------------------------------------------------------------
ANOMALY_WINDOW_H = 24  # trailing hours forming the baseline
ANOMALY_Z = 2.0  # |z| threshold

_ANOMALY_ORACLE = f"""
WITH hourly0 AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS c FROM events GROUP BY 1),
span AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly0),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM span),
dense AS (
  SELECT g.h, CAST(coalesce(h0.c, 0) AS BIGINT) AS c
  FROM grid g LEFT JOIN hourly0 h0 ON g.h = h0.h),
win AS (
  SELECT h, c,
         sum(c)     OVER w AS s,
         sum(c * c) OVER w AS sq,
         count(*)   OVER w AS n
  FROM dense
  WINDOW w AS (ORDER BY h ROWS BETWEEN {ANOMALY_WINDOW_H} PRECEDING
                                   AND 1 PRECEDING)),
scored AS (
  SELECT h, c,
         s * 1.0 / n AS mean,
         (sq - s * 1.0 * s / n) / n AS var
  FROM win WHERE n = {ANOMALY_WINDOW_H})
SELECT CAST(h AS VARCHAR) AS hour, c AS n_events,
       round(mean, 6) AS mean_24h,
       round((c - mean) / sqrt(var), 6) AS z
FROM scored
WHERE var > 0 AND abs((c - mean) / sqrt(var)) >= {ANOMALY_Z}
"""


@query("events_rate_anomaly", oracle=_ANOMALY_ORACLE)
def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: hours whose event count deviates more
    than {ANOMALY_Z}σ from the trailing-24h baseline — the traffic-spike /
    outage detector every ingest pipeline alarms on.

    Plan: one global hourly count (map-side combine), a gap-filled hour
    grid from min/max span (in-row sequence explode — missing hours count
    0, WITHOUT which a quiet hour silently shrinks the baseline), and one
    ordered window carrying trailing integer sums.  Single-series global
    ordering is fine here (a few thousand hour rows regardless of corpus
    size); the per-entity variant partitions the same window by key.

    Cross-engine exactness WITHOUT the rounding device: every window input
    is an integer count, so the trailing sum/sum-of-squares are exact
    int64 on both engines; mean/variance/z then apply the identical
    +,*,/,sqrt sequence to identical doubles — bit-equal results, no ln,
    no per-term rounding needed (contrast text_bm25_topk)."""
    ev = load_table(spark, sf_dir, "events")
    hourly0 = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("c")
    )
    span = hourly0.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    dense = grid.join(hourly0, "h", "left").select(
        "h", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    w = Window.orderBy("h").rowsBetween(-ANOMALY_WINDOW_H, -1)
    win = dense.select(
        "h",
        "c",
        F.sum("c").over(w).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("sq"),
        F.count("*").over(w).alias("n"),
    ).filter(F.col("n") == ANOMALY_WINDOW_H)
    mean = F.col("s") * 1.0 / F.col("n")
    var = (F.col("sq") - F.col("s") * 1.0 * F.col("s") / F.col("n")) / F.col("n")
    z = (F.col("c") - mean) / F.sqrt(var)
    return (
        win.withColumn("mean_", mean)
        .withColumn("var_", var)
        .filter((F.col("var_") > 0) & (F.abs((F.col("c") - F.col("mean_")) / F.sqrt("var_")) >= ANOMALY_Z))
        .select(
            F.col("h").cast("string").alias("hour"),
            F.col("c").alias("n_events"),
            F.round("mean_", 6).alias("mean_24h"),
            F.round((F.col("c") - F.col("mean_")) / F.sqrt("var_"), 6).alias("z"),
        )
    )


ASOF_TOLERANCE_US = 24 * 3600 * 1_000_000  # conversion window: 24 h, in µs

_ASOF_FWD_ORACLE = f"""
WITH tagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_v
  FROM events WHERE event_type IN ('view', 'purchase')),
v AS (SELECT user_id, event_id AS view_id, ts AS view_ts FROM tagged WHERE is_v = 1),
p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts FROM tagged WHERE is_v = 0),
ranked AS (
  SELECT v.user_id, v.view_id, v.view_ts, p.purchase_id, p.purchase_ts,
         row_number() OVER (PARTITION BY v.user_id, v.view_id
                            ORDER BY p.purchase_ts, p.purchase_id) AS rn
  FROM v JOIN p
    ON p.user_id = v.user_id AND p.purchase_ts > v.view_ts)
SELECT user_id, view_id, view_ts, purchase_id AS next_purchase_id,
       CAST(epoch_us(purchase_ts) - epoch_us(view_ts) AS BIGINT) AS micros_to_purchase
FROM ranked
WHERE rn = 1 AND epoch_us(purchase_ts) - epoch_us(view_ts) <= {ASOF_TOLERANCE_US}
"""


@query("asof_join_forward_tolerance", oracle=_ASOF_FWD_ORACLE)
def asof_join_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a staleness bound: each view matched to the
    user's NEXT purchase, kept only when it lands within 24 h — the
    conversion-attribution shape (pandas merge_asof direction='forward' +
    tolerance), completing the as-of family next to the backward join.

    Same union-and-carry strategy as `asof_join_events`, mirrored: one
    shuffle on user_id, one window pass carrying the next purchase
    backward over (ts, is_view, event_id) order — same-instant purchases
    sort BEFORE views, so the strict `purchase_ts > view_ts` contract
    falls out of the sort order, and ties among simultaneous purchases
    break to the smallest event_id inside the same frame.  The tolerance
    compares exact epoch-µs on both engines (the `events_session_window`
    boundary lesson: second-granularity diffs disagree with real-time
    bounds at boundary crossings)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("is_v"),
    )
    # same-ts purchases sort before views => excluded from the following
    # frame => strictly-after semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_v", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    purchase_id = F.when(F.col("is_v") == 0, F.col("event_id"))
    purchase_ts = F.when(F.col("is_v") == 0, F.col("ts"))
    micros = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    carried = tagged.select(
        "user_id",
        "event_id",
        "ts",
        "is_v",
        F.first(purchase_id, ignorenulls=True).over(w).alias("next_purchase_id"),
        F.first(purchase_ts, ignorenulls=True).over(w).alias("next_purchase_ts"),
    )
    return (
        carried.filter((F.col("is_v") == 1) & F.col("next_purchase_id").isNotNull())
        .withColumn(
            "micros_to_purchase",
            micros(F.col("next_purchase_ts")) - micros(F.col("ts")),
        )
        .filter(F.col("micros_to_purchase") <= ASOF_TOLERANCE_US)
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
            "next_purchase_id",
            "micros_to_purchase",
        )
    )


@query("asof_join_events", oracle=_ASOF_ORACLE)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent prior (or
    same-instant) view.

    Implemented as the scalable union-and-carry composition, NOT a range
    crossJoin: tag both streams, union, and carry the last view forward with
    one window pass — a single shuffle on user_id, O(n) state, no pair
    blow-up.  This is the standard distributed as-of strategy (same shape
    as sort-merge as-of in kdb/pandas.merge_asof, expressed declaratively)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_id = F.when(F.col("is_p") == 0, F.col("event_id"))
    view_ts = F.when(F.col("is_p") == 0, F.col("ts"))
    epoch = lambda c: c.cast("timestamp").cast("long")  # noqa: E731
    carried = tagged.select(
        "user_id",
        "event_id",
        "ts",
        "is_p",
        F.last(view_id, ignorenulls=True).over(w).alias("asof_view_id"),
        F.max(view_ts).over(w).alias("asof_view_ts"),
    )
    return carried.filter((F.col("is_p") == 1) & F.col("asof_view_id").isNotNull()).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "asof_view_id",
        (epoch(F.col("ts")) - epoch(F.col("asof_view_ts"))).alias("seconds_since_view"),
    )


# --------------------------------------------------------------------------
# Pivot (wide conditional aggregation)
# --------------------------------------------------------------------------
@query(
    "pivot_status_revenue",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS O,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS F,
           {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.pivot with an explicit value list — explicit values keep the plan
    a single pass (no values-discovery job) and stable at any scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 2))
    )


# --------------------------------------------------------------------------
# GROUPING SETS (beyond rollup/cube)
# --------------------------------------------------------------------------
_GROUPING_SETS_SQL = """
SELECT c_mktsegment, o_orderstatus,
       count(*) AS n,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 2) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), (c_mktsegment, o_orderstatus))
"""


@query("grouping_sets", oracle=_GROUPING_SETS_SQL)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping-set lattice in one Expand pass (spark.sql)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_GROUPING_SETS_SQL)


# --------------------------------------------------------------------------
# Exact percentiles
# --------------------------------------------------------------------------
@query(
    "percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 6) AS median_price,
           round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 6) AS p90_price,
           round(CAST(quantile_cont(o_totalprice, 0.99) AS DOUBLE), 6) AS p99_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`).  At 100 TB swap to `approx_percentile` (t-digest,
    mergeable sketch) — exact percentile requires a per-group sort."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99_price"),
    )


# --------------------------------------------------------------------------
# arg-max / arg-min aggregation
# --------------------------------------------------------------------------
@query(
    "argmax_orders",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC, o_orderkey ASC)  AS rmin
      FROM orders)
    SELECT o_orderpriority,
           max(CASE WHEN rmax = 1 THEN o_orderkey END) AS biggest_order,
           round(max(o_totalprice), 2)                 AS biggest_price,
           max(CASE WHEN rmin = 1 THEN o_orderkey END) AS smallest_order,
           round(min(o_totalprice), 2)                 AS smallest_price
    FROM ranked
    GROUP BY o_orderpriority
    """,
)
def argmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (arg-max) per group, tie-broken by a composite
    (price, orderkey) struct ordering — lexicographic struct comparison is
    identical in Spark and DuckDB and stays correct at any scale factor
    (an additive epsilon perturbation would drift once keys grow past the
    price granularity)."""
    o = load_table(spark, sf_dir, "orders")
    ordv = F.struct("o_totalprice", "o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", ordv).alias("biggest_order"),
        F.round(F.max("o_totalprice"), 2).alias("biggest_price"),
        F.min_by("o_orderkey", ordv).alias("smallest_order"),
        F.round(F.min("o_totalprice"), 2).alias("smallest_price"),
    )


# --------------------------------------------------------------------------
# Rolling range frame (trailing 30-day window per customer)
# --------------------------------------------------------------------------
@query(
    "rolling_30d_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(count(*) OVER w AS BIGINT) AS n_orders_30d,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER w AS DOUBLE), 2)
               AS revenue_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day rolling aggregate via a RANGE frame over epoch days —
    the time-series rollup shape.  One shuffle on custkey; the range frame
    is evaluated with a sliding accumulator, not per-row rescans."""
    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01")))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double"), 2).alias(
            "revenue_30d"
        ),
    )


# --------------------------------------------------------------------------
# UNPIVOT / melt (wide → long)
# --------------------------------------------------------------------------
@query(
    "unpivot_customer_metrics",
    oracle="""
    SELECT c_custkey, metric, round(value, 2) AS value
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer)
    WHERE c_custkey % 10 = 0
    """,
)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt via DataFrame.unpivot (Spark plans one Expand node —
    a single pass regardless of how many columns melt)."""
    c = load_table(spark, sf_dir, "customer").filter(F.pmod("c_custkey", F.lit(10)) == 0)
    wide = c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return wide.unpivot(
        ids=["c_custkey"], values=["acctbal", "nationkey"],
        variableColumnName="metric", valueColumnName="v",
    ).select("c_custkey", "metric", F.round("v", 2).alias("value"))


# --------------------------------------------------------------------------
# Range (interval-containment) join via bucketing
# --------------------------------------------------------------------------
_RANGE_JOIN_ORACLE = """
WITH win AS (
  SELECT CAST(r.range AS INT) AS w_id,
         TIMESTAMP '2024-01-01 00:00:00'
             + to_minutes(CAST(r.range * 97 AS BIGINT))  AS w_start,
         TIMESTAMP '2024-01-01 00:00:00'
             + to_minutes(CAST(r.range * 97 + 45 AS BIGINT)) AS w_end
  FROM range(0, 200) r)
SELECT w.w_id, count(*) AS n_events,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN win w ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY w.w_id
"""


@query("range_join_events", oracle=_RANGE_JOIN_ORACLE)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join (events within maintenance windows) done
    the scalable way: a naive theta join plans as BroadcastNestedLoop —
    O(|events|·|windows|) compares.  Instead each interval explodes into
    the fixed-width time buckets it overlaps, events map to their single
    bucket, and the join becomes an EQUI join on bucket with an exact
    post-filter — compares drop to O(|events| + |windows|·spread).  This is
    the standard bucketed-range-join rewrite (Databricks range-join hints
    do the same under the hood)."""
    ev = load_table(spark, sf_dir, "events")
    bucket_s = 3600  # bucket width ≥ max interval length (45 min)
    win = (
        spark.range(0, 200)
        .select(
            F.col("id").cast("int").alias("w_id"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
             + F.make_interval(mins=F.col("id").cast("int") * 97)).alias("w_start"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
             + F.make_interval(mins=F.col("id").cast("int") * 97 + 45)).alias("w_end"),
        )
    )
    epoch = lambda c: c.cast("timestamp").cast("long")  # noqa: E731
    # every bucket the interval [start, end) overlaps
    win_b = win.select(
        "w_id", "w_start", "w_end",
        F.explode(
            F.sequence(
                F.floor(epoch(F.col("w_start")) / bucket_s),
                F.floor((epoch(F.col("w_end")) - 1) / bucket_s),
            )
        ).alias("bucket"),
    )
    ev_b = ev.select(
        "event_id", "user_id", "ts", F.floor(epoch(F.col("ts")) / bucket_s).alias("bucket")
    )
    joined = ev_b.join(F.broadcast(win_b), "bucket").filter(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
    )
    return joined.groupBy("w_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# Fuzzy matching (edit distance)
# --------------------------------------------------------------------------
@query(
    "fuzzy_brand_pairs",
    oracle="""
    WITH b AS (SELECT DISTINCT p_brand FROM part)
    SELECT a.p_brand AS brand_a, c.p_brand AS brand_b,
           CAST(levenshtein(a.p_brand, c.p_brand) AS INT) AS edit_distance
    FROM b a JOIN b c ON a.p_brand < c.p_brand
    WHERE levenshtein(a.p_brand, c.p_brand) <= 1
    """,
)
def fuzzy_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance pairing over the distinct brand domain — distinct-first
    keeps the pair space bounded by domain cardinality (25 brands → 300
    pairs) no matter how many part rows exist."""
    b = load_table(spark, sf_dir, "part").select("p_brand").distinct()
    a, c = b.alias("a"), b.alias("c")
    lev = F.levenshtein(F.col("a.p_brand"), F.col("c.p_brand"))
    return (
        a.join(c, F.col("a.p_brand") < F.col("c.p_brand"))
        .filter(lev <= 1)
        .select(
            F.col("a.p_brand").alias("brand_a"),
            F.col("c.p_brand").alias("brand_b"),
            lev.cast("int").alias("edit_distance"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic hash sampling
# --------------------------------------------------------------------------
@query(
    "deterministic_sample",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE md5(CAST(o_orderkey AS VARCHAR)) < '1a'
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% sample selected by content hash of the key — reproducible across
    engines, partitionings, and re-runs (unlike TABLESAMPLE/rand), and
    consistent for the same key across tables (joinable samples).  The
    hex-string compare keeps it expressible in any engine."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.md5(F.col("o_orderkey").cast("string")) < "1a").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# --------------------------------------------------------------------------
# Ordered string aggregation (array_agg shape, hash-stable rendering)
# --------------------------------------------------------------------------
@query(
    "string_agg_nations",
    oracle="""
    SELECT r.r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collect: sort_array(collect_list) rendered to a string —
    order made explicit so the result is deterministic under any
    partitioning (bare collect_list order is not)."""
    n = load_table(spark, sf_dir, "nation")
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
        )
    )


# --------------------------------------------------------------------------
# Date/time function pack
# --------------------------------------------------------------------------
@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                          AS yr,
           CAST(quarter(o_orderdate) AS INT)                       AS qtr,
           CAST(month(o_orderdate) AS INT)                         AS mon,
           CAST(date_trunc('month', o_orderdate) AS VARCHAR)       AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)    AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)::VARCHAR AS plus_3m,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date/time surface: extract, truncate, month-end, add_months,
    day arithmetic — all codegen'd; date outputs rendered as ISO strings for
    bridge-stable hashing."""
    o = load_table(spark, sf_dir, "orders").filter(F.pmod("o_orderkey", F.lit(100)) == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mon"),
        # DuckDB's date_trunc('month') yields DATE; align by casting.
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month_start"),
        F.last_day(d).cast("string").alias("month_end"),
        F.add_months(d, 3).cast("string").alias("plus_3m"),
        F.datediff(F.to_date(F.lit("2002-01-01")), d).cast("long").alias("days_to_2002"),
    )


# --------------------------------------------------------------------------
# Sliding event-time window (overlapping windows, 1h every 15min)
# --------------------------------------------------------------------------
@query(
    "events_sliding_window",
    oracle=f"""
    WITH k AS (SELECT unnest(generate_series(0, 3)) AS k),
    w AS (
      SELECT time_bucket(INTERVAL '15 minutes', e.ts)
               - k.k * INTERVAL '15 minutes' AS window_start,
             e.event_type, e.value
      FROM events e CROSS JOIN k)
    SELECT window_start, event_type,
           count(*)            AS n_events,
           {sql_dsum('value')} AS total_value
    FROM w GROUP BY 1, 2
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window advancing every 15 minutes — each event lands
    in exactly 4 overlapping windows (the rate-monitoring shape tumbling
    windows can't express).  Spark expands the window memberships in-row
    before the aggregate, so the shuffle carries (window, type) keys with
    map-side partial aggregation; the oracle reproduces the same 4-window
    expansion with an explicit series cross join."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# Built-in session windows (dynamic-gap grouping via F.session_window)
# --------------------------------------------------------------------------
@query(
    "events_session_window",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             -- Exact microsecond gap: session_window merges iff the gap is
             -- strictly < 30 min of real time.  date_diff('second') would
             -- count second-boundary CROSSINGS (a 1799.3s gap crossing 1800
             -- boundaries splits when Spark merges), so compare epoch_us.
             CASE WHEN epoch_us(ts) - epoch_us(
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= {SESSION_GAP_US}
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged)
    SELECT user_id,
           min(ts)             AS session_start,
           max(ts)             AS session_end,
           count(*)            AS n_events,
           {sql_dsum('value')} AS session_value
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's built-in `session_window` (dynamic gap
    merging inside the aggregation operator) — the declarative twin of the
    gaps-and-islands formulation in `events_sessionize`, and the exact
    batch shape of the streaming state-store sessionizer.  One shuffle on
    (session_window, user_id); the oracle reproduces the merge with the
    islands CTE.  Session bounds are reported as min/max event time (the
    window's `end` field extends past the last event by the gap)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP_INTERVAL).alias("sw"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            dsum("value").alias("session_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "session_value")
    )


# --------------------------------------------------------------------------
# Window analytics pack: lag / lead / ntile / percent_rank / first-last
# --------------------------------------------------------------------------
@query(
    "window_analytics_pack",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2) AS price,
           round(lag(o_totalprice)  OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           CAST(ntile(4) OVER w AS INT)        AS quartile,
           percent_rank() OVER w               AS pct_rank,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytics_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic window functions in one pass: lag/lead
    (neighbor access), ntile (equi-depth bucketing), percent_rank
    (relative position — a single exact rational division), first/last
    value with an explicit full-partition frame (the default frame stops
    at CURRENT ROW, which silently breaks last_value — pinned here on
    both engines).  All functions share one window spec → one shuffle and
    one sort serve the whole select list."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("last_price"),
    )


# --------------------------------------------------------------------------
# Funnel analysis (ordered multi-step conversion)
# --------------------------------------------------------------------------
@query(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after_view,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after_click
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user counts
    at stage N only if the stage-N event happens strictly AFTER their
    first stage-N-1 event — the sequential-pattern query every product
    analytics stack runs.

    Plan: three user_id-keyed min-aggregations chained by shuffle joins
    on user_id; the event scan is filtered per stage so each pass reads
    one event type.  The per-user timestamp tables are NOT hinted
    broadcast: one-row-per-user relations scale with the corpus (billions
    of users at 100 TB), the same corpus-correlated-broadcast class the
    keep-canonical verdict removed.  Each stage's join key equals its
    groupBy key, so the join shuffle is reused by the aggregation; AQE
    may still locally elect a broadcast when the stage table is small."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter("event_type = 'view'")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter("event_type = 'click'")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter("event_type = 'purchase'")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


# --------------------------------------------------------------------------
# Cohort retention (activity matrix by signup day)
# --------------------------------------------------------------------------
@query(
    "events_retention",
    oracle="""
    WITH cohort AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT CAST(c.d0 AS VARCHAR) AS cohort_day,
           date_diff('day', c.d0, a.d) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM active a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY c.d0, day_offset
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, counted
    on each later day they return — the engagement decay curve behind
    every DAU/WAU dashboard.

    Plan: one distinct + one min-agg on user_id-keyed shuffles, then a
    shuffle join of the (one-row-per-user) cohort table onto the distinct
    activity set.  The cohort relation is deliberately NOT hinted
    broadcast — one row per user scales with the corpus (billions of
    users at 100 TB), the corpus-correlated-broadcast class the
    keep-canonical verdict removed; AQE may still elect a broadcast when
    the cohort is actually small.  Day arithmetic stays integer; the cohort DATE
    is emitted as an ISO string (both engines' DATE→pandas bridges
    normalize differently — the string is unambiguous)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    cohort = ev.groupBy("user_id").agg(F.min(day).alias("d0"))
    active = ev.select("user_id", day.alias("d")).distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            F.col("d0").cast("string").alias("cohort_day"),
            F.datediff("d", "d0").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------------
# Time-series resample + forward fill (gap-filling hourly grid)
# --------------------------------------------------------------------------
_RESAMPLE_ORACLE = f"""
WITH ev AS (
  SELECT user_id, ts, value FROM events WHERE user_id < 20),
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         {sql_davg('value')} AS v
  FROM ev GROUP BY user_id, date_trunc('hour', ts)),
spans AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM ev GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM spans),
j AS (
  SELECT g.user_id, g.h, hourly.v
  FROM grid g LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h)
SELECT user_id, CAST(h AS VARCHAR) AS hour,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val_ffill
FROM j
"""


@query("events_resample_ffill", oracle=_RESAMPLE_ORACLE)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample with forward fill — the time-series
    normalization step (metrics pipelines, feature windows) relational
    engines bolt on as `GAP FILL` / `timescaledb time_bucket_gapfill`.

    Per user: hourly average where events exist, previous hour's value
    carried forward across gaps.  The dense grid comes from an in-row
    `sequence()` explode (no driver loop, no cross join against a global
    calendar — each user materializes only its own span), the fill is one
    `last(ignorenulls)` running window.  Shuffle count: one for the hourly
    aggregate, one for the per-user window — both keyed on user_id, so at
    100 TB they co-partition and AQE coalesces the tail."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(davg("value").alias("v"))
    spans = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    j = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.col("h").cast("string").alias("hour"),
        F.last("v", ignorenulls=True).over(w).alias("val_ffill"),
    )


# --------------------------------------------------------------------------
# SCD2 point-in-time join (temporal state lookup at fact time)
# --------------------------------------------------------------------------
def _scd2_pit_oracle() -> str:
    from iceberg_table_generator_spark.operators.tpch_ext import sql_dsum_rev

    # DuckDB's ASOF LEFT JOIN: for each fact row, the dimension row with
    # the greatest valid_from <= shipdate — interval semantics without the
    # O(facts x versions) inequality fan-out (the naive interval-join
    # formulation measured 250 s at sf0.1 vs 0.8 s for ASOF).  Same-date
    # versions dedupe to the highest orderkey first (row_number DESC),
    # matching the lead()-interval convention where the earlier same-date
    # order holds an empty interval.
    return f"""
WITH dimr AS (
  SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from,
         row_number() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders),
dim AS (SELECT o_custkey, o_orderpriority, valid_from FROM dimr WHERE rn = 1),
f AS (
  SELECT o.o_custkey AS custkey, l.l_shipdate, l.l_extendedprice, l.l_discount
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
SELECT COALESCE(d.o_orderpriority, 'UNKNOWN') AS priority_at_ship,
       CAST(year(f.l_shipdate) AS INT) AS ship_year,
       {sql_dsum_rev()} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM f ASOF LEFT JOIN dim d
  ON d.o_custkey = f.custkey AND f.l_shipdate >= d.valid_from
GROUP BY 1, 2
"""


@query("join_scd2_point_in_time", oracle=_scd2_pit_oracle())
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (SCD2) join: each lineitem is priced against the
    customer's order-priority STATE as of its ship date — the canonical
    slowly-changing-dimension lookup every warehouse fact load performs
    (pandas merge_asof against a versioned dimension; Flink temporal-table
    join).  The dimension is the per-customer priority history derived
    from the order stream itself: each order opens a [o_orderdate,
    next-order-date) validity interval, ties on the date resolved by
    orderkey (the later key wins an empty predecessor interval) —
    identical lead() semantics on both engines.

    Implemented as union-and-carry (the `asof_join_events` strategy), NOT
    an interval join: state-change rows and fact rows union into one
    relation, ONE shuffle on custkey, and one window pass carries the
    last state forward — same-instant state changes sort BEFORE facts
    (kind 0 < 1), so "state applies from its own timestamp" falls out of
    the sort.  The interval-join formulation the oracle uses would
    multiply each fact row by the customer's interval count before
    filtering; union-and-carry is O(n log n) per key with NO fan-out, the
    shape that survives dimensions with deep version histories at 100 TB.
    Revenue accumulates in exact DECIMAL (`dsum_rev`)."""
    from iceberg_table_generator_spark.operators.tpch_ext import dsum_rev

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim_rows = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderpriority").alias("priority"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("double").alias("l_extendedprice"),
        F.lit(None).cast("double").alias("l_discount"),
    )
    fact_rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_shipdate").alias("ts"),
            F.col("l_orderkey").alias("okey"),
            F.lit(None).cast("string").alias("priority"),
            F.lit(1).alias("kind"),
            "l_extendedprice",
            "l_discount",
        )
    )
    u = dim_rows.unionByName(fact_rows)
    w = (
        Window.partitionBy("custkey")
        .orderBy("ts", "kind", "okey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Facts that ship before the customer's first recorded order have no
    # state yet (474 such lines exist at sf0.001 — shipdates in this data
    # are not bounded below by the order date); both engines bucket them
    # as 'UNKNOWN' rather than dropping them.
    carried = u.withColumn(
        "priority_at_ship",
        F.coalesce(
            F.last("priority", ignorenulls=True).over(w), F.lit("UNKNOWN")
        ),
    )
    return (
        carried.filter(F.col("kind") == 1)
        .groupBy(
            "priority_at_ship",
            F.year("ts").alias("ship_year"),
        )
        .agg(
            dsum_rev().alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Bloom-filter semi-join audit (the runtime-filter pattern, made explicit)
# --------------------------------------------------------------------------
BLOOM_M, BLOOM_K, BLOOM_ACCTBAL = 8192, 3, 9000


def _bloom_oracle() -> str:
    from iceberg_table_generator_spark.operators.dedup import _sql_md5_60

    def pos(expr: str) -> str:
        return f"{_sql_md5_60(expr)} % {BLOOM_M}"

    return f"""
WITH k AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > {BLOOM_ACCTBAL}),
j(j) AS (VALUES (0), (1), (2)),
bits AS (
  SELECT DISTINCT
    {pos("CAST(j AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)")} AS pos
  FROM k CROSS JOIN j),
probe AS (SELECT o_orderkey, o_custkey FROM orders),
pp AS (
  SELECT DISTINCT o_orderkey,
    {pos("CAST(j AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)")} AS pos
  FROM probe CROSS JOIN j),
hit AS (
  SELECT p.o_orderkey, count(*) AS npos, count(b.pos) AS nhit
  FROM pp p LEFT JOIN bits b ON b.pos = p.pos
  GROUP BY p.o_orderkey),
lab AS (
  SELECT pr.o_orderkey,
         (h.nhit = h.npos) AS pass,
         (t.c_custkey IS NOT NULL) AS istrue
  FROM probe pr
  JOIN hit h ON h.o_orderkey = pr.o_orderkey
  LEFT JOIN (SELECT DISTINCT c_custkey FROM k) t
    ON t.c_custkey = pr.o_custkey)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN istrue THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(sum(CASE WHEN pass AND NOT istrue THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos,
       round(sum(CASE WHEN pass AND NOT istrue THEN 1 ELSE 0 END) * 1.0
             / sum(CASE WHEN NOT istrue THEN 1 ELSE 0 END), 6) AS fp_rate,
       COALESCE(CAST(min(CASE WHEN istrue THEN pass END) AS BOOLEAN), TRUE)
         AS no_false_negatives
FROM lab
"""


@query("join_bloom_filter_audit", oracle=_bloom_oracle())
def join_bloom_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter pre-join ({BLOOM_K} md5-60 hash positions into
    an m={BLOOM_M}-bit set over high-balance customers, probed by every
    order) with its full quality audit against the exact semi-join: pass/
    true counts, measured false-positive rate, and the no-false-negative
    invariant — computed EXACTLY on both engines because the filter is
    deterministic integer hashing, not an opaque sketch.

    This is the runtime-filter pattern Spark itself applies
    (`spark.sql.optimizer.runtime.bloomFilter.enabled`, DPP's sibling)
    made first-class and measurable: at 100 TB the filter's bit-position
    set is bounded by the CONSTANT m (8192 rows at saturation) regardless
    of key count, so it broadcasts for free and prunes the probe side
    BEFORE its shuffle — the audit quantifies exactly how much residual
    work (false positives) the downstream exact join still pays.  The
    truth-side comparison joins the real key set without a hint (data-
    dependent size — AQE decides)."""
    from iceberg_table_generator_spark.operators.dedup import _md5_60

    def positions(key: F.Column) -> F.Column:
        return F.array(
            *[
                F.pmod(
                    _md5_60(F.concat(F.lit(f"{j}:"), key.cast("string"))),
                    F.lit(BLOOM_M),
                )
                for j in range(BLOOM_K)
            ]
        )

    k = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > BLOOM_ACCTBAL)
        .select("c_custkey")
    )
    bits = (
        k.select(F.explode(positions(F.col("c_custkey"))).alias("pos"))
        .distinct()
        .withColumn("b", F.lit(1))
    )
    probe = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pp = probe.select(
        "o_orderkey", F.explode(positions(F.col("o_custkey"))).alias("pos")
    ).distinct()
    hit = (
        pp.join(F.broadcast(bits), "pos", "left")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("npos"), F.count("b").alias("nhit"))
    )
    truth = probe.join(
        k.distinct().withColumn("t", F.lit(1)),
        probe.o_custkey == F.col("c_custkey"),
        "left",
    ).select("o_orderkey", F.col("t").isNotNull().alias("istrue"))
    lab = truth.join(hit, "o_orderkey").select(
        "istrue", (F.col("nhit") == F.col("npos")).alias("pass")
    )
    fp = F.when(F.col("pass") & ~F.col("istrue"), 1).otherwise(0)
    return lab.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("istrue"), 1).otherwise(0)).alias("n_true"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0)).alias("n_pass"),
        F.sum(fp).alias("n_false_pos"),
        F.round(
            F.sum(fp) * 1.0 / F.sum(F.when(~F.col("istrue"), 1).otherwise(0)), 6
        ).alias("fp_rate"),
        F.coalesce(
            F.min(F.when(F.col("istrue"), F.col("pass"))), F.lit(True)
        ).alias("no_false_negatives"),
    )


# --------------------------------------------------------------------------
# Largest-remainder proration: allocate an order fee across line items
# --------------------------------------------------------------------------
PRORATE_FEE_CENTS = 1000  # the per-order fee to distribute

_PRORATE_ORACLE = f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents
  FROM lineitem),
w AS (
  SELECT l_orderkey, l_linenumber, price_cents,
         CAST(sum(price_cents) OVER (PARTITION BY l_orderkey) AS BIGINT) AS tot
  FROM li),
base AS (
  SELECT *,
         ({PRORATE_FEE_CENTS} * price_cents) // tot AS base_cents,
         ({PRORATE_FEE_CENTS} * price_cents) % tot AS rem
  FROM w),
ranked AS (
  SELECT *,
         CAST(row_number() OVER (PARTITION BY l_orderkey
                                 ORDER BY rem DESC, l_linenumber) AS BIGINT)
           AS rem_rank,
         CAST({PRORATE_FEE_CENTS} - sum(base_cents) OVER
              (PARTITION BY l_orderkey) AS BIGINT) AS leftover
  FROM base)
SELECT l_orderkey, l_linenumber, price_cents,
       CAST(base_cents + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_cents
FROM ranked
"""


@query("lineitem_prorate_fee", oracle=_PRORATE_ORACLE)
def lineitem_prorate_fee(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder proration (Hamilton apportionment): a fixed
    {PRORATE_FEE_CENTS}-cent per-order fee is split across the order's
    line items proportionally to price, in WHOLE CENTS that sum exactly
    to the fee — every line gets floor(fee·wᵢ/W), and the leftover cents
    go to the largest fractional remainders (l_linenumber tie-break).
    The allocation op behind payment splitting, cost attribution, and
    budget distribution, where naive rounding leaks or invents cents.

    Exactness: pure integer division/modulo — no floats anywhere; the
    per-order sum invariant is pinned in tests.  Scale: two windows and
    one rank, ALL partitioned by the order key (parallel groups bounded
    by basket size), co-partitioned with every other orderkey shuffle —
    one corpus scan, no joins."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("price_cents"),
    )
    wo = Window.partitionBy("l_orderkey")
    w = li.withColumn("tot", F.sum("price_cents").over(wo).cast("long"))
    base = w.select(
        "l_orderkey",
        "l_linenumber",
        "price_cents",
        "tot",
        F.expr(f"({PRORATE_FEE_CENTS} * price_cents) div tot").alias("base_cents"),
        F.expr(f"({PRORATE_FEE_CENTS} * price_cents) % tot").alias("rem"),
    )
    wr = Window.partitionBy("l_orderkey").orderBy(F.desc("rem"), "l_linenumber")
    ranked = base.select(
        "l_orderkey",
        "l_linenumber",
        "price_cents",
        "base_cents",
        F.row_number().over(wr).cast("long").alias("rem_rank"),
        (PRORATE_FEE_CENTS - F.sum("base_cents").over(wo)).cast("long").alias(
            "leftover"
        ),
    )
    return ranked.select(
        "l_orderkey",
        "l_linenumber",
        "price_cents",
        (
            F.col("base_cents")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_cents"),
    )
