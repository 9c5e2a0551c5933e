"""TPC-H wave 2: the remaining classic query shapes (SURVEY.md §2.7).

The testdata schema is a slimmed TPC-H (no partsupp, no
commit/receipt dates, no comments/phones), so each query keeps its
defining STRUCTURE — correlated scalar subqueries, decorrelated aggregates,
disjunctive predicate pushdown, multi-exists, distribution histograms —
with `lineitem`'s (l_partkey, l_suppkey) pairs standing in for partsupp
and shipdate-vs-orderdate lag standing in for commit/receipt lateness.

Scale posture is uniform with the rest of the pack: dims broadcast,
filters before joins (pushdown), one shuffle per aggregation, decimal
accumulation for every cross-row double sum (see operators/relational.py
module docstring for the determinism policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators.relational import DEC, dsum
from iceberg_table_generator_spark.functions.cache import persist_tracked
from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp_ntz")


# Decimal-DOMAIN discounted revenue: the raw columns (≤2 decimal places)
# cast to decimal exactly on both engines, and the multiplication then
# happens in exact decimal arithmetic — unlike casting the DOUBLE product,
# where a half-point 6th decimal rounds differently in Spark (shortest
# decimal representation, half-up) vs DuckDB (binary scaling, observed on
# q9 at sf0.001: 332153.35 vs .34).  Nothing rounds per-row, so the sum is
# reproducible to the last digit.
DEC18 = "decimal(18,6)"


def rev_dec() -> F.Column:
    return F.col("l_extendedprice").cast(DEC18) * (
        F.lit(1).cast(DEC18) - F.col("l_discount").cast(DEC18)
    )


def dsum_rev(scale: int = 2) -> F.Column:
    """Order-insensitive, cast-divergence-free discounted-revenue sum."""
    return F.round(F.sum(rev_dec()), scale).cast("double")


SQL_REV_DEC = (
    "CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (1 - CAST(l_discount AS DECIMAL(18,6)))"
)


def sql_dsum_rev(alias_prefix: str = "", scale: int = 2) -> str:
    expr = SQL_REV_DEC
    if alias_prefix:
        expr = expr.replace("l_extendedprice", f"{alias_prefix}.l_extendedprice")
        expr = expr.replace("l_discount", f"{alias_prefix}.l_discount")
    return f"CAST(round(sum({expr}), {scale}) AS DOUBLE)"


# --------------------------------------------------------------------------
# Q2 shape: min-cost supplier (correlated scalar subquery over a bridge)
# --------------------------------------------------------------------------
@query(
    "q2_min_acctbal_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT round(s.s_acctbal, 2) AS s_acctbal, s.s_name, n.n_name,
           p.p_partkey, p.p_name
    FROM part p
    JOIN ps       ON ps.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n  ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
      AND n.n_regionkey = 3
      AND s.s_acctbal = (
        SELECT min(s2.s_acctbal)
        FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        WHERE ps2.l_partkey = p.p_partkey AND n2.n_regionkey = 3)
    ORDER BY s_acctbal DESC, p.p_partkey, s.s_name
    LIMIT 20
    """,
)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the EUROPE-region supplier
    with the minimum account balance among suppliers who have actually
    shipped it (lineitem's distinct (partkey, suppkey) pairs are the
    partsupp stand-in).  The correlated scalar subquery decorrelates into
    a per-part min aggregate joined back on (partkey, min) — the standard
    Catalyst rewrite, expressed directly so the plan is two hash joins
    instead of a per-row subquery."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey"), F.col("l_suppkey"))
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    # region-filtered supplier bridge, reused by both the per-part min and
    # the final join (same subtree → Catalyst reuses the exchange)
    bridge = (
        ps.join(s, ps.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
    )
    min_bal = bridge.groupBy("l_partkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        bridge.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            min_bal.withColumnRenamed("l_partkey", "mb_partkey"),
            (F.col("p_partkey") == F.col("mb_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations
# --------------------------------------------------------------------------
@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           {sql_dsum_rev('l')} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_12' AND cn.n_name = 'NATION_11')
        OR (sn.n_name = 'NATION_11' AND cn.n_name = 'NATION_12'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY sn.n_name, cn.n_name, CAST(year(l.l_shipdate) AS INT)
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship year.
    Both nation dims broadcast; the disjunctive nation-pair predicate is a
    post-join residual on broadcast columns (no shuffle added); the fact
    table only shuffles for the final aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    sn = F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    cn = F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_11")
    ) | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_12"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum_rev().alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8: national market share within a region
# --------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,6))
               * (1 - CAST(l.l_discount AS DECIMAL(18,6))) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      WHERE cn.n_regionkey = 2
        AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_11' THEN volume
                               ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_2's share of PROMO-part volume sold to ASIA-region
    customers, by order year.  Ratio of two decimal-accumulated sums
    (order-insensitive), divided as doubles identically on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    cn = F.broadcast(
        n.filter(F.col("n_regionkey") == 2).select(F.col("n_nationkey").alias("cn_key"))
    )
    vol = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev_dec().alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_11", F.col("volume")).otherwise(
        F.lit(0)
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(nation_vol).cast("double") / F.sum("volume").cast("double"), 6
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q9: product-type profit by nation and year
# --------------------------------------------------------------------------
@query(
    "q9_nation_profit",
    oracle=f"""
    SELECT sn.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           {sql_dsum_rev('l')} AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%blue%'
    GROUP BY sn.n_name, CAST(year(o.o_orderdate) AS INT)
    """,
)
def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit ≡ discounted revenue — no partsupp cost in
    this schema): profit on blue parts by supplier nation and order year.
    The LIKE filter broadcasts with the part dim; nation broadcasts; one
    aggregate shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    sn = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum_rev().alias("profit"))
    )


# --------------------------------------------------------------------------
# Q12 shape: late-shipment priority classes (two-branch conditional count)
# --------------------------------------------------------------------------
@query(
    "q12_late_shipments",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY CAST(year(o.o_orderdate) AS INT)
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode/receiptdate are absent, so "late" is
    shipdate > orderdate + 90 days): per year, how many late-shipped lines
    belong to high- vs low-priority orders — Q12's signature two-branch
    conditional count over a join residual range predicate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.make_interval(days=F.lit(90))),
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13: customer order-count distribution (left join + double aggregation)
# --------------------------------------------------------------------------
@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer (urgent orders excluded
    in the JOIN condition, so order-less customers still count at 0 — the
    LEFT JOIN + filter-in-ON distinction Q13 exists to test).  Two
    aggregations: per-customer count, then the distribution."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q14: promotion revenue share (conditional ratio aggregate)
# --------------------------------------------------------------------------
@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                   THEN CAST(l.l_extendedprice AS DECIMAL(18,6))
                                        * (1 - CAST(l.l_discount AS DECIMAL(18,6)))
                                   ELSE 0 END) AS DOUBLE)
                   / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                              * (1 - CAST(l.l_discount AS DECIMAL(18,6)))) AS DOUBLE),
             6) AS promo_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO parts' percentage of one month's revenue.  The
    month filter pushes to the lineitem scan; part broadcasts; the ratio
    divides two decimal-accumulated sums as doubles, identically ordered
    on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = rev_dec()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue (scalar-subquery max)
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum_rev()} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum quarterly revenue.
    The revenue CTE aggregates once; the scalar-subquery max joins back as
    a broadcast single-row cross join (Catalyst's decorrelation); revenue
    is rounded identically on both engines BEFORE the equality compare so
    the max-match is stable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum_rev().alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q16 shape: supplier counts by part attributes (distinct agg after bridge)
# --------------------------------------------------------------------------
@query(
    "q16_part_supplier_counts",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    (brand, type, size) bucket — lineitem's distinct pairs stand in for
    partsupp.  The IN-list and <> filters push into the broadcast part
    dim; countDistinct expands to a two-phase aggregate (dedupe shuffle,
    then count), the plan Q16 exists to exercise."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#5")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
    )
    return (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue (correlated average, decorrelated)
# --------------------------------------------------------------------------
@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey,
             0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
                    / count(*)) AS threshold
      FROM lineitem GROUP BY l_partkey)
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < a.threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small orders — lines of Brand#3 parts
    with quantity below half that part's average.  The correlated AVG
    decorrelates into one per-part aggregate joined back; the average
    accumulates in decimal so the threshold (and therefore the `<`
    comparison) is bit-identical on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (0.5 * (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))))
        .alias("threshold")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(part_avg, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 2)
            .alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q19: disjunctive predicate revenue (OR-of-ANDs pushdown)
# --------------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dsum_rev('l')} AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: the disjunctive-predicate benchmark.  Catalyst extracts
    the common l_quantity bounds (1..30) and per-side part constraints as
    pushable conjuncts; the full OR-of-ANDs evaluates as the join
    residual."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = (
        branch("Brand#12", 5, 1, 11)
        | branch("Brand#23", 10, 10, 20)
        | branch("Brand#34", 15, 20, 30)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            dsum_rev().alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q20 shape: suppliers with excess shipped volume (nested semi joins)
# --------------------------------------------------------------------------
@query(
    "q20_excess_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'PROMO'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE EXISTS (
      SELECT 1 FROM shipped sh
      WHERE sh.l_suppkey = s.s_suppkey
        AND sh.qty > (SELECT 1.5 * CAST(sum(CAST(qty AS DECIMAL(25,6)))
                                        AS DOUBLE) / count(*) FROM shipped))
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty has no partsupp to live in, so "excess"
    means shipped more than 1.5x the average supplier's PROMO volume this
    year): a scalar-subquery threshold inside an EXISTS — implemented as
    aggregate -> broadcast single-row threshold join -> left-semi join,
    the decorrelated plan Catalyst produces for the nested form."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    )
    shipped = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"))
    )
    threshold = shipped.agg(
        (1.5 * F.sum(F.col("qty").cast(DEC)).cast("double") / F.count(F.lit(1)))
        .alias("threshold")
    )
    excess = (
        shipped.join(F.broadcast(threshold), F.col("qty") > F.col("threshold"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


# --------------------------------------------------------------------------
# Q21 shape: suppliers who kept orders waiting (exists + not-exists)
# --------------------------------------------------------------------------
@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH l_ext AS (
      SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F')
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM l_ext l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM l_ext l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l_ext l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape ("late" = shipped >90 days after order date, status
    F): suppliers whose line was late on a multi-supplier order where NO
    other supplier was late — the classic EXISTS + NOT EXISTS pair.
    Implemented as one per-order aggregate over the line set (other-supplier
    count and other-late-supplier count via conditional aggregation) joined
    back — one shuffle replaces two correlated subqueries, the same
    rewrite Catalyst cannot always find on its own."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    l_ext = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.make_interval(days=F.lit(90))
            ).alias("late"),
        )
        # DISK_ONLY persist, not localCheckpoint: this relation is
        # lineitem-sized — truncated-lineage localCheckpoint blocks are
        # not recomputable after executor loss at 100 TB, while the
        # persist keeps the write-once/read-twice trade fault-tolerant.
        .transform(persist_tracked)  # reused by per-line and per-order passes
    )
    per_order = l_ext.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supps"),
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    qualifying = (
        l_ext.filter(F.col("late"))
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        # other suppliers exist on the order; none of the OTHERS were late
        # (this line's supplier is late, so the order's late-supplier set
        # must be exactly {this supplier})
        .filter((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
    )
    return (
        qualifying.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q22 shape: dormant high-balance customers (scalar avg + anti join)
# --------------------------------------------------------------------------
@query(
    "q22_dormant_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / count(*)
               AS a
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(25,6))) AS DOUBLE), 2)
             AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (mktsegment stands in for the phone country code):
    customers with above-average balances and no recent orders — scalar
    aggregate subquery (broadcast single-row threshold) + anti join +
    grouped rollup of count and decimal-summed balance."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1)))
            .alias("a")
        )
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q11 shape: important part values (self-referential HAVING threshold)
# --------------------------------------------------------------------------
@query(
    "q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS value
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, CAST(round(value, 2) AS DOUBLE) AS part_value
    FROM pv
    -- multiplication-only compare (value*n > 1.5*total): exact decimal on
    -- both engines, unlike decimal division whose result scale differs
    WHERE value * (SELECT count(*) FROM pv)
          > (SELECT CAST(1.5 AS DECIMAL(18,6)) * sum(value) FROM pv)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp value → lineitem revenue per part): parts
    whose total value exceeds 1.5x the MEAN part value — the
    self-referential scalar-threshold query.  (Q11's fixed corpus-share
    fraction degenerates on this data: above it every part qualifies at
    one SF and none at the next, so the threshold is expressed relative
    to the mean, which keeps the selection meaningful at any scale.)  The
    per-part aggregate is computed once and consumed twice (group rows +
    global threshold); exact decimal arithmetic end to end, so the >
    comparison cannot drift.  (The plan shows a BroadcastNestedLoopJoin
    against the ONE-ROW threshold — that is Catalyst's own plan for a
    scalar subquery compare and is O(n), unlike a data×data nested
    loop.)"""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(rev_dec()).alias("value"))
    threshold = pv.agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.lit(1.5).cast(DEC18) * F.sum("value")).alias("total_x15"),
    )
    return (
        pv.join(
            F.broadcast(threshold),
            F.col("value") * F.col("n_parts") > F.col("total_x15"),
        )
        .select("l_partkey", F.round("value", 2).cast("double").alias("part_value"))
    )


# --------------------------------------------------------------------------
# Q5: local supplier volume (customer and supplier in the same nation)
# --------------------------------------------------------------------------
@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, {sql_dsum_rev('l')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue from orders where the supplier is local to the
    customer, by nation within one region.  Completes the 22-query TPC-H
    pack (reference has no queries at all — `SURVEY.md` §2.7 mandates the
    full relational surface).

    Scale posture: region and nation broadcast (25/5 rows at any SF); the
    region filter prunes nation BEFORE it reaches the fact joins, so
    supplier rows outside the region never shuffle.  The same-nation
    constraint (c_nationkey = s_nationkey) is an equi-key of the
    customer join, not a residual filter — Catalyst keeps the whole chain
    hash joins.  One final single-column aggregate."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        n, F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            c,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum_rev().alias("revenue"))
    )
