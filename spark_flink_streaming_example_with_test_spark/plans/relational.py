"""Relational operator coverage: scans, joins (broadcast / sort-merge
/ semi / anti), hash aggregation, rollup/cube, analytic windows,
top-k, set ops, exact distinct, percentiles, scalar function surface.

These fill the reference's gap map (SURVEY.md §2.6) — the reference
itself has zero joins and only time-window aggregation, so each query
here is the idiomatic Catalyst formulation, written to scale:
dimension tables broadcast, aggregates partial-before-final (free
with groupBy), filters/projections pushed to the parquet scan.

Every monetary aggregate is rounded in BOTH the Spark query and the
DuckDB oracle so double accumulation order can't flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_flink_streaming_example_with_test_spark.plans.tpch_more import _money_sum
from spark_flink_streaming_example_with_test_spark.functions.numerics import (
    half_up_duck_sql,
    half_up_ratio_col,
    half_up_spark_sql,
)
from spark_flink_streaming_example_with_test_spark.sources.tables import load_table


# --- TPC-H-ish analytical queries -----------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-table scan-heavy hash aggregation.
    Plan: parquet scan with pushed shipdate filter -> partial
    HashAggregate -> shuffle on (returnflag, linestatus) [6 groups]
    -> final HashAggregate. No join, whole-stage codegen end to end.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # Quantities are integer-valued doubles: their sum is exact in
    # any order. The price sums are accumulation-order sensitive as
    # doubles -> scale each per-row money value to its exact integer
    # unit (price: 2 decimal digits -> cents; price*(1-disc): 4 ->
    # 1e-4 units; charge: 6 -> 1e-6 units) and SUM LONGs — exact in
    # any order and a pure codegen primitive, ~2x cheaper than the
    # per-row DECIMAL(18,6) accumulation it replaces. The 2-dp
    # result is recovered with HALF-UP INTEGER DIVISION in the
    # even-divisor form (sum + d/2) DIV d — the divisors (100,
    # 10000) are even, so this equals round-half-up exactly without
    # doubling the sum first, keeping full LONG headroom on the
    # accumulator. PRECONDITION: sums are non-negative (Q1 money is
    # all positive) — Spark DIV truncates toward zero while DuckDB
    # // floors, so the engines would diverge on negative totals.
    # Headroom: 1e-6 units reach ~1.2e11/row, so a LONG group sum
    # holds ~7.6e7 max-value rows per group; past that scale flip
    # ch_u to DECIMAL(38,0) accumulation (one cast) — the win here
    # is removing per-row decimal arithmetic from the hot scan.
    prepped = l.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("bp_u"),
        F.round(disc_price * 10_000).cast("long").alias("dp_u"),
        F.round(charge * 1_000_000).cast("long").alias("ch_u"),
        # Integer twins for the three averages (VERDICT r08 item #3):
        # quantity is integral and discount 2-dec, so the averages
        # reduce to exact integer ratios emitted half-up — retiring
        # ROUND(AVG(double)) (order-dependent partial sums + decimal
        # half-boundary divergence) from the flagship query.
        F.round(F.col("l_quantity")).cast("long").alias("qty_u"),
        F.round(F.col("l_discount") * 100).cast("long").alias("ds_u"),
    )
    return (
        prepped.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.sum("bp_u").alias("__bp"),
            F.sum("dp_u").alias("__dp"),
            F.sum("ch_u").alias("__ch"),
            # r14: plain LONG sums (were DECIMAL(38,0)) — the decimal
            # accumulators cost +0.17 s of the 0.69 s single-split
            # scan stage at sf0.1. Headroom: qty_u <= 50 and ds_u <=
            # 10 per row, so at 100 TB (~6e11 lineitem rows) the
            # emission-side product __q * 20000 reaches ~6e17 — an
            # order of magnitude inside int64. __bp keeps its
            # DECIMAL cast in the avg_price emission below: cents
            # reach ~1.2e7/row and its * 20000 product has no such
            # margin.
            F.sum("qty_u").alias("__q"),
            F.sum("ds_u").alias("__ds"),
            F.count("*").alias("count_order"),
        )
        .selectExpr(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "__bp / 100e0 AS sum_base_price",
            "((__dp + 50) DIV 100) / 100e0 AS sum_disc_price",
            "((__ch + 5000) DIV 10000) / 100e0 AS sum_charge",
            '(((__q) * 20000 + (count_order)) div (2 * (count_order))) / 1e4' + " AS avg_qty",
            '(((CAST(__bp AS DECIMAL(38,0))) * 20000 + (count_order * CAST(100 AS BIGINT))) div (2 * (count_order * CAST(100 AS BIGINT)))) / 1e4' + " AS avg_price",
            '(((__ds) * 20000 + (count_order * CAST(100 AS BIGINT))) div (2 * (count_order * CAST(100 AS BIGINT)))) / 1e4' + " AS avg_disc",
            "count_order",
        )
    )


Q1_ORACLE = """
WITH u AS (
  SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice, l_discount,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS bp_u,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
             AS dp_u,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000)
             AS BIGINT) AS ch_u
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       CAST(SUM(bp_u) AS BIGINT) / 100.0 AS sum_base_price,
       ((CAST(SUM(dp_u) AS BIGINT) + 50) // 100) / 100.0 AS sum_disc_price,
       ((CAST(SUM(ch_u) AS BIGINT) + 5000) // 10000) / 100.0 AS sum_charge,
       ((CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS HUGEINT) * 20000 + (COUNT(*))) // (2 * (COUNT(*)))) / 1e4 AS avg_qty,
       ((CAST(SUM(bp_u) AS HUGEINT) * 20000 + (COUNT(*) * CAST(100 AS BIGINT))) // (2 * (COUNT(*) * CAST(100 AS BIGINT)))) / 1e4 AS avg_price,
       ((CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS HUGEINT) * 20000 + (COUNT(*) * CAST(100 AS BIGINT))) // (2 * (COUNT(*) * CAST(100 AS BIGINT)))) / 1e4 AS avg_disc,
       COUNT(*)                                                     AS count_order
FROM u
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10.
    customer is the small side -> broadcast hash join; orders joins
    lineitem on the shuffle (sort-merge / AQE choice). Top-k is
    rank-stable: ordered on the ROUNDED revenue with orderkey
    tiebreak so float noise can't reorder across engines.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
           AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with three broadcast dims
    (region 5 rows, nation 25, supplier tiny relative to facts) and
    a fact-fact join orders<->lineitem. The c_nationkey = s_nationkey
    equality rides on the customer join condition.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )


Q5_ORACLE = """
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
           AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive pushed filters +
    single global aggregate; the canonical predicate-pushdown probe."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue")
        )
    )


Q6_ORACLE = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount
           AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- Join strategies beyond inner equi-join --------------------------

def join_semi_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers that placed at least one early-1995
    order, counted per segment. Semi avoids materializing the orders
    payload — the probe side streams through a broadcast hash set."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


JOIN_SEMI_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate < TIMESTAMP '1995-07-01')
GROUP BY c_mktsegment
"""


def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with NO early-1995 order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


JOIN_ANTI_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate < TIMESTAMP '1995-07-01')
GROUP BY c_mktsegment
"""


def join_outer_nation_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + agg: every nation with its supplier count
    (nations with no suppliers keep a 0 via count of s_suppkey)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


JOIN_OUTER_ORACLE = """
SELECT n_name, COUNT(s_suppkey) AS n_suppliers
FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
GROUP BY n_name
"""


def join_range_order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join: price-band lookup. Each part is
    matched to its price band via p_retailprice BETWEEN lo AND hi.
    The tiny band table broadcasts -> BroadcastNestedLoopJoin, the
    only sane physical plan for a pure theta join."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 1e9)],
        ["band", "lo", "hi"],
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            # 2-dec money: exact integer-cent average, half-up
            # emission (VERDICT r08 item #3).
            F.sum(
                F.round(F.col("p_retailprice") * 100).cast("decimal(38,0)")
            ).alias("__pc"),
        )
        .selectExpr(
            "band",
            "n_parts",
            '(((__pc) * 20000 + (n_parts * CAST(100 AS BIGINT))) div (2 * (n_parts * CAST(100 AS BIGINT)))) / 1e4' + " AS avg_price",
        )
    )


JOIN_RANGE_ORACLE = """
WITH bands(band, lo, hi) AS (
  VALUES ('budget', 0.0, 500.0), ('mid', 500.0, 1200.0), ('premium', 1200.0, 1e9)
)
SELECT band, COUNT(*) AS n_parts,
       ((CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS HUGEINT) * 20000 + (COUNT(*) * CAST(100 AS BIGINT))) // (2 * (COUNT(*) * CAST(100 AS BIGINT)))) / 1e4 AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


# --- Analytic window functions / top-k -------------------------------

def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price: the row_number pattern —
    one shuffle on the partition key, no self-join. Deterministic
    tiebreak on o_orderkey."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""


def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + lag + date arithmetic over a per-customer
    ordered frame: running spend, previous order price, days since
    previous order."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(frame), 2).alias("running_spend"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("days_since_prev"),
    )


WINDOW_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       ROUND(LAG(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
       DATE_DIFF('day',
                 LAG(o_orderdate) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS days_since_prev
FROM orders
"""


# --- Multi-dimensional aggregation -----------------------------------

def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        _money_sum(F.col("o_totalprice"), "total_price"),
    )


ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def cube_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (brand, size). The 4-dp average is computed as
    half-up integer division on exact cents — an average of 2-dp
    prices lands exactly on .xxxx5 whenever the group size divides
    evenly, where double ROUND diverges between engines (caught by
    sf0.1 parity; the smaller fixtures never hit a tie)."""
    p = load_table(spark, sf_dir, "part").select(
        "p_brand",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    )
    return (
        p.cube("p_brand", "p_size")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("cents").alias("__s"),
        )
        .select(
            "p_brand",
            "p_size",
            "n_parts",
            (
                F.expr("(200 * __s + n_parts) DIV (2 * n_parts)") / 10_000.0
            ).alias("avg_price"),
        )
    )


CUBE_ORACLE = """
SELECT p_brand, p_size, n_parts,
       ((200 * s + n_parts) // (2 * n_parts)) / 10000.0 AS avg_price
FROM (
  SELECT p_brand, p_size, COUNT(*) AS n_parts,
         CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS s
  FROM part GROUP BY CUBE (p_brand, p_size)
)
"""


# --- Set operations ---------------------------------------------------

def setops_nation_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations hosting both BUILDING and MACHINERY
    customers."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    return a.intersect(b)


SETOPS_INTERSECT_ORACLE = """
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
"""


def setops_nation_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with BUILDING but no MACHINERY
    customers."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    return a.subtract(b)


SETOPS_EXCEPT_ORACLE = """
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
"""


def union_high_balance_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL across heterogeneous sources, schema aligned by
    projection."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cust = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    supp = s.filter(F.col("s_acctbal") > 9000).select(
        F.col("s_name").alias("name"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return cust.unionByName(supp)


UNION_ORACLE = """
SELECT c_name AS name, ROUND(c_acctbal, 2) AS acctbal, 'customer' AS kind
FROM customer WHERE c_acctbal > 9000
UNION ALL
SELECT s_name, ROUND(s_acctbal, 2), 'supplier'
FROM supplier WHERE s_acctbal > 9000
"""


# --- Distinct & order statistics --------------------------------------

def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — expands to a two-phase aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


DISTINCT_USERS_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where an
    exact distinct's shuffle would dominate. Sketch values can't
    hash-match across engines, so the query emits the exact count
    plus a ``within_tolerance`` bound on the sketch's relative error:
    each engine checks its OWN approximate against its OWN exact, and
    the (exact count, boolean) pair is what the driver hash-compares
    — a property-checked sketch instead of a rows-only row count."""
    ev = load_table(spark, sf_dir, "events")
    exact = F.count_distinct("user_id")
    approx = F.approx_count_distinct("user_id", 0.01)
    return ev.groupBy("event_type").agg(
        exact.alias("exact_users"),
        ((F.abs(approx - exact) / exact) <= 0.05).alias("within_tolerance"),
    )


APPROX_DISTINCT_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       ABS(APPROX_COUNT_DISTINCT(user_id) - COUNT(DISTINCT user_id)) * 1.0
         / COUNT(DISTINCT user_id) <= 0.05 AS within_tolerance
FROM events GROUP BY event_type
"""


def percentile_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines implement the
    same linear-interpolation definition)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.min("value"), 4).alias("v_min"),
        F.round(F.max("value"), 4).alias("v_max"),
    )


PERCENTILE_ORACLE = """
SELECT event_type,
       ROUND(QUANTILE_CONT(value, 0.5), 4)  AS p50,
       ROUND(QUANTILE_CONT(value, 0.95), 4) AS p95,
       ROUND(MIN(value), 4) AS v_min,
       ROUND(MAX(value), 4) AS v_max
FROM events GROUP BY event_type
"""


# --- Scalar expression surface ----------------------------------------

def scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.col("p_name").like("%widget%").alias("is_widget"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.round(F.sqrt("p_retailprice"), 4).alias("sqrt_price"),
        F.round(F.log(F.col("p_retailprice") + 1), 4).alias("log_price"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


SCALAR_STRING_ORACLE = """
SELECT p_partkey,
       UPPER(p_brand)                     AS brand_u,
       LENGTH(p_name)                     AS name_len,
       SUBSTRING(p_type, 1, 4)            AS type_prefix,
       p_name LIKE '%widget%'             AS is_widget,
       CONCAT_WS('/', p_brand, p_type)    AS brand_type,
       ROUND(SQRT(p_retailprice), 4)      AS sqrt_price,
       ROUND(LN(p_retailprice + 1), 4)    AS log_price,
       CASE WHEN p_size >= 25 THEN 'large'
            WHEN p_size >= 10 THEN 'medium'
            ELSE 'small' END              AS size_class
FROM part
"""


def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("quarter", "o_orderdate").alias("order_quarter"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


SCALAR_DATE_ORACLE = """
SELECT o_orderkey,
       YEAR(o_orderdate)                     AS order_year,
       MONTH(o_orderdate)                    AS order_month,
       DAY(o_orderdate)                      AS order_day,
       DATE_TRUNC('quarter', o_orderdate)    AS order_quarter,
       o_orderdate + INTERVAL 30 DAY         AS due_date
FROM orders WHERE o_orderkey % 7 = 0
"""


# --- Grouping sets / pivot / as-of / array-json surface ---------------

def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via SQL: per-status totals, per-priority totals,
    and a grand total in one aggregation pass (Catalyst expands to a
    single Expand + HashAggregate — one shuffle, not three queries).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*)                          AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                   AS DOUBLE)                    AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


GROUPING_SETS_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*)                          AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per day, one count column per event type. The
    pivot value list is explicit so Spark skips the extra
    distinct-values job and the output schema is deterministic."""
    e = load_table(spark, sf_dir, "events")
    piv = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .count()
    )
    return piv.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    )


PIVOT_ORACLE = """
SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events GROUP BY DATE_TRUNC('day', ts)
"""


def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join on the events table: each purchase paired with the
    same user's most recent click at-or-before it (ties broken by
    highest event_id). Union-window implementation — one shuffle on
    user_id, no range-join pair explosion (operators/joins.py)."""
    from spark_flink_streaming_example_with_test_spark.operators.joins import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_payload=["click_id", "click_ts"],
        right_tiebreak="click_id",
        how="inner",
    )
    return out.select(
        "user_id", "purchase_id", "purchase_ts",
        F.col("asof_click_id").alias("click_id"),
        F.col("asof_click_ts").alias("click_ts"),
    )


ASOF_ORACLE = """
SELECT user_id, purchase_id, purchase_ts, click_id, click_ts FROM (
  SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
         c.event_id AS click_id, c.ts AS click_ts,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND c.ts <= p.ts
) WHERE rn = 1
"""


def scalar_array_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / JSON scalar surface: get_json_object pulls a typed
    field out of the props JSON; sequence/aggregate/array_max cover
    array construction and folds — all JVM-side expressions."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    arr = F.sequence(F.lit(1), (k % 5) + 1)
    return e.filter(F.col("event_id") % 11 == 0).select(
        "event_id",
        k.alias("k"),
        F.size(arr).alias("arr_len"),
        F.aggregate(arr, F.lit(0), lambda a, x: a + x).alias("arr_sum"),
        F.array_max(arr).alias("arr_max"),
        F.reverse(arr)[0].alias("arr_last"),
    )


SCALAR_ARRAY_JSON_ORACLE = """
SELECT event_id,
       CAST(props->>'$.k' AS INT)                       AS k,
       LEN(RANGE(1, CAST(props->>'$.k' AS INT) % 5 + 2)) AS arr_len,
       CAST(LIST_SUM(RANGE(1, CAST(props->>'$.k' AS INT) % 5 + 2)) AS BIGINT) AS arr_sum,
       LIST_MAX(RANGE(1, CAST(props->>'$.k' AS INT) % 5 + 2)) AS arr_max,
       LIST_REVERSE(RANGE(1, CAST(props->>'$.k' AS INT) % 5 + 2))[1] AS arr_last
FROM events WHERE event_id % 11 = 0
"""


def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — orders with at least one
    lineitem shipped more than 60 days after the order date, counted
    per priority. Expressed as a left-semi join with a mixed
    equi + non-equi condition (the form Catalyst rewrites EXISTS
    into); only orderkey/priority/date columns shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = (o.o_orderkey == l.l_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def having_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING + scalar subquery shape: customers whose
    order count exceeds twice the per-customer average."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        _money_sum(F.col("o_totalprice"), "total_spend"),
    )
    avg_orders = per_cust.agg(F.avg("n_orders").alias("a"))
    return (
        per_cust.crossJoin(F.broadcast(avg_orders))
        .filter(F.col("n_orders") > 2 * F.col("a"))
        .select("o_custkey", "n_orders", "total_spend")
    )


HAVING_ORACLE = """
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS total_spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) > 2 * (SELECT AVG(n) FROM (
    SELECT COUNT(*) AS n FROM orders GROUP BY o_custkey))
"""


def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: semi join against an aggregated subquery —
    orders whose total lineitem quantity exceeds a threshold, with
    customer context. The aggregate runs first (one shuffle on
    orderkey, partial map-side), and only qualifying orderkeys flow
    into the joins."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


Q18_ORACLE = """
SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def agg_argminmax_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-selection aggregates: per order status, the orderkey
    of the cheapest/priciest order (min_by/max_by) and the modal
    priority — single hash aggregate, no window needed."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.mode("o_orderpriority", True).alias("modal_priority"),
        F.count("*").alias("n"),
    )


AGG_ARGMINMAX_ORACLE = """
WITH pc AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority
)
SELECT o.o_orderstatus,
       ARG_MIN(o.o_orderkey, o.o_totalprice) AS cheapest_order,
       ARG_MAX(o.o_orderkey, o.o_totalprice) AS priciest_order,
       MAX(pc.o_orderpriority)               AS modal_priority,
       COUNT(*)                              AS n
FROM orders o JOIN pc ON o.o_orderstatus = pc.o_orderstatus AND pc.rn = 1
GROUP BY o.o_orderstatus
"""


def nullsafe_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): events
    self-matched on a derived nullable key, where NULL = NULL counts
    as a match — semantics a plain equi-join silently drops."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 37 == 0)
    keyed = e.select(
        "event_id",
        F.when(F.col("value") > 50, F.col("event_type")).alias("k"),
    )
    a = keyed.select(F.col("event_id").alias("id_a"), F.col("k").alias("k_a"))
    b = keyed.select(F.col("event_id").alias("id_b"), F.col("k").alias("k_b"))
    return (
        a.join(b, a.k_a.eqNullSafe(b.k_b))
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy(F.coalesce("k_a", F.lit("<null>")).alias("key"))
        .agg(F.count("*").alias("n_pairs"))
    )


NULLSAFE_JOIN_ORACLE = """
WITH keyed AS (
  SELECT event_id, CASE WHEN value > 50 THEN event_type END AS k
  FROM events WHERE event_id % 37 = 0
)
SELECT COALESCE(a.k, '<null>') AS key, COUNT(*) AS n_pairs
FROM keyed a JOIN keyed b
  ON a.k IS NOT DISTINCT FROM b.k AND a.event_id < b.event_id
GROUP BY COALESCE(a.k, '<null>')
"""


def approx_percentile_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile sketch — the single-pass bounded-memory
    path for quantiles at 100 TB (exact percentile materializes and
    sorts every group). Same oracle shape as approx_distinct_users:
    each engine compares its OWN sketch (Spark: Greenwald-Khanna via
    percentile_approx; DuckDB: t-digest via APPROX_QUANTILE) against
    its OWN exact quantile, and the driver hash-compares the exact
    values plus the within-tolerance booleans."""
    ev = load_table(spark, sf_dir, "events")
    exact50 = F.expr("percentile(value, 0.5)")
    exact95 = F.expr("percentile(value, 0.95)")
    approx50 = F.expr("percentile_approx(value, 0.5, 1000)")
    approx95 = F.expr("percentile_approx(value, 0.95, 1000)")

    def within(approx, exact):
        return (
            F.abs(approx - exact) / F.greatest(F.abs(exact), F.lit(1.0))
        ) <= 0.05

    return ev.groupBy("event_type").agg(
        F.round(exact50, 4).alias("p50_exact"),
        F.round(exact95, 4).alias("p95_exact"),
        within(approx50, exact50).alias("p50_ok"),
        within(approx95, exact95).alias("p95_ok"),
    )


APPROX_PERCENTILE_ORACLE = """
SELECT event_type,
       ROUND(QUANTILE_CONT(value, 0.5), 4)  AS p50_exact,
       ROUND(QUANTILE_CONT(value, 0.95), 4) AS p95_exact,
       ABS(APPROX_QUANTILE(value, 0.5) - QUANTILE_CONT(value, 0.5))
         / GREATEST(ABS(QUANTILE_CONT(value, 0.5)), 1.0) <= 0.05 AS p50_ok,
       ABS(APPROX_QUANTILE(value, 0.95) - QUANTILE_CONT(value, 0.95))
         / GREATEST(ABS(QUANTILE_CONT(value, 0.95)), 1.0) <= 0.05 AS p95_ok
FROM events GROUP BY event_type
"""


def asof_next_click_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: for each signup event, the
    user's earliest click at-or-after it, but only within 2 hours —
    the attribution-window lookup (pandas merge_asof
    direction='forward' semantics, distributed). Same union-window
    plan as the backward form: one exchange of L+R, no pair
    explosion; the tolerance is a post-filter on the carried
    timestamp. Largest click_id wins timestamp ties."""
    from spark_flink_streaming_example_with_test_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
        "value",
    )
    out = asof_join(
        signups,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="c_ts",
        right_payload=["c_ts", "click_id", "value"],
        right_tiebreak="click_id",
        how="inner",
        direction="forward",
        tolerance="2 hours",
    )
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.col("asof_c_ts").alias("click_ts"),
        F.col("asof_click_id").alias("click_id"),
        F.round("asof_value", 4).alias("click_value"),
    )


ASOF_FORWARD_ORACLE = """
WITH s AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'signup'
), c AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS c_ts,
         event_id AS click_id, value
  FROM events WHERE event_type = 'click'
)
SELECT user_id, event_id, ts, click_ts, click_id, click_value FROM (
  SELECT s.user_id, s.event_id, s.ts,
         c.c_ts AS click_ts, c.click_id,
         ROUND(c.value, 4) AS click_value,
         ROW_NUMBER() OVER (PARTITION BY s.event_id
                            ORDER BY c.c_ts ASC, c.click_id DESC) AS rn
  FROM s JOIN c ON s.user_id = c.user_id
   AND c.c_ts >= s.ts AND c.c_ts <= s.ts + INTERVAL 2 HOUR
) WHERE rn = 1
"""


def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) construction + point-in-time
    probe: each user's click values become versioned dimension rows
    with [valid_from, valid_to) ranges (valid_to = next click's ts via
    lead; open-ended for the current version), then purchase events
    probe the dimension with a BETWEEN join — the warehouse pattern
    for "what was the attribute AT THE TIME of the fact". The
    dimension build is one window pass; the probe is an equi-join on
    user plus a range predicate the per-user version count keeps
    small."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = clicks.select(
        "user_id",
        F.col("value").alias("dim_value"),
        F.col("ts").alias("valid_from"),
        F.coalesce(
            F.lead("ts").over(w),
            F.lit("9999-12-31 00:00:00").cast("timestamp"),
        ).alias("valid_to"),
        F.col("event_id").alias("version_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        purchases.join(
            dim,
            (purchases.user_id == dim.user_id)
            & (purchases.ts >= dim.valid_from)
            & (purchases.ts < dim.valid_to),
        )
        .select(
            purchases.user_id,
            "event_id",
            "ts",
            "version_id",
            F.round("dim_value", 4).alias("value_at_purchase"),
        )
    )


SCD2_ORACLE = """
WITH clicks AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id
  FROM events WHERE event_type = 'click'
), dim AS (
  SELECT user_id, value AS dim_value,
         ts AS valid_from,
         COALESCE(LEAD(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id),
                  TIMESTAMP '9999-12-31 00:00:00') AS valid_to,
         event_id AS version_id
  FROM clicks
), p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id, p.event_id, p.ts, dim.version_id,
       ROUND(dim.dim_value, 4) AS value_at_purchase
FROM p JOIN dim ON p.user_id = dim.user_id
 AND p.ts >= dim.valid_from AND p.ts < dim.valid_to
"""


def unpivot_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) surface — the inverse of
    ``pivot_daily_event_counts``: the wide per-day count columns fold
    back to long ``(day, event_type, n)`` rows via ``DataFrame.unpivot``,
    zero-count cells dropped. The round trip reproduces the plain
    grouped counts, which is exactly what the oracle states — so both
    the pivot and unpivot directions are value-pinned."""
    e = load_table(spark, sf_dir, "events")
    wide = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .count()
    ).select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
    )
    return wide.unpivot(
        ids="day",
        values=list(EVENT_TYPES),
        variableColumnName="event_type",
        valueColumnName="n",
    ).filter(F.col("n") > 0)


UNPIVOT_ORACLE = """
SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day, event_type,
       COUNT(*) AS n
FROM events GROUP BY DATE_TRUNC('day', ts), event_type
"""


def try_functions_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe try_* scalar family: try_divide / try_add /
    try_to_number return NULL where the strict forms would raise
    (division by zero, overflow, malformed numerics). At 100 TB the
    try_* forms are the difference between one poisoned row nulling
    out and one poisoned row killing a 6-hour job — this query pins
    that the null-on-error semantics match a classic CASE/TRY_CAST
    oracle exactly."""
    e = load_table(spark, sf_dir, "events")
    divisor = (F.col("user_id") % 5).cast("double")
    numlike = F.when(
        F.col("event_id") % 7 == 0, F.lit("not-a-number")
    ).otherwise(F.col("event_id").cast("string"))
    return e.select(
        "event_id",
        F.round(F.try_divide("value", divisor), 6).alias("safe_ratio"),
        F.try_add(F.col("event_id"), F.lit(1)).alias("next_id"),
        F.try_to_number(numlike, F.lit("999999999")).cast("long")
        .alias("parsed_id"),
        (F.col("user_id") % 5 == 0).alias("was_div_zero"),
    )


TRY_FUNCTIONS_ORACLE = """
SELECT event_id,
       ROUND(CASE WHEN user_id % 5 = 0 THEN NULL
                  ELSE value / (user_id % 5) END, 6) AS safe_ratio,
       event_id + 1 AS next_id,
       TRY_CAST(CASE WHEN event_id % 7 = 0 THEN 'not-a-number'
                     ELSE CAST(event_id AS VARCHAR) END AS BIGINT)
         AS parsed_id,
       user_id % 5 = 0 AS was_div_zero
FROM events
"""


def edit_distance_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance screening — the character-level near-dup check
    the token-level dedup ladder lacks: levenshtein between each
    document's 40-char prefix and its id-successor's, normalized to
    a similarity in [0, 1]. The id-adjacent pairing keeps the check
    linear (a real fuzzy-dedup would run this as the verify step on
    LSH candidate pairs, exactly like dedup_minhash_lsh's exact
    verification).

    Scale shape: a 1-offset self-join on the id key — with the
    corpus sorted/bucketed by id this is a co-located merge join,
    and the levenshtein itself is O(40x40) per row, JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select("doc_id", F.substring("text", 1, 40).alias("pa"))
    b = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.substring("text", 1, 40).alias("pb"),
    )
    lev = F.levenshtein("pa", "pb")
    denom = F.greatest(F.length("pa"), F.length("pb"))
    # prefix_sim = (denom - lev)/denom, a per-row count ratio:
    # exact integer half-up emission; zero-length pairs keep the
    # NULL the double division produced (mirrored in the oracle).
    return a.join(b, "doc_id").select(
        "doc_id",
        lev.alias("lev"),
        F.when(
            denom > 0, half_up_ratio_col(denom - lev, denom, 6)
        ).alias("prefix_sim"),
    )


EDIT_DISTANCE_ORACLE = """
WITH a AS (SELECT doc_id, SUBSTRING(text, 1, 40) AS pa FROM documents),
b AS (SELECT doc_id - 1 AS doc_id, SUBSTRING(text, 1, 40) AS pb
      FROM documents)
SELECT doc_id, LEVENSHTEIN(pa, pb) AS lev,
       CASE WHEN GREATEST(LENGTH(pa), LENGTH(pb)) > 0 THEN
         ((CAST(GREATEST(LENGTH(pa), LENGTH(pb)) - LEVENSHTEIN(pa, pb) AS HUGEINT) * 2000000 + (GREATEST(LENGTH(pa), LENGTH(pb)))) // (2 * (GREATEST(LENGTH(pa), LENGTH(pb))))) / 1e6
       END AS prefix_sim
FROM a JOIN b USING (doc_id)
"""


def bitwise_agg_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and / bit_or / bit_xor) plus
    scalar bit ops: per-user event-type flag words OR-ed across
    events (the compact-feature-flag pattern: 1 bit per event type,
    one long per user), with bit_count on the result. All
    map-side-combinable single-pass aggregates."""
    e = load_table(spark, sf_dir, "events")
    flag = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .otherwise(16)
        .cast("long")
    )
    return (
        e.select("user_id", flag.alias("flag"), "event_id")
        .groupBy("user_id")
        .agg(
            F.bit_or("flag").alias("type_mask"),
            F.bit_and("flag").alias("common_mask"),
            F.bit_xor("event_id").alias("id_parity"),
        )
        .select(
            "user_id",
            "type_mask",
            F.bit_count("type_mask").alias("n_distinct_types"),
            "common_mask",
            "id_parity",
        )
    )


BITWISE_AGG_ORACLE = """
WITH flags AS (
  SELECT user_id, event_id,
         (CASE event_type
            WHEN 'click' THEN 1 WHEN 'view' THEN 2
            WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
            ELSE 16 END)::BIGINT AS flag
  FROM events
)
SELECT user_id,
       BIT_OR(flag) AS type_mask,
       BIT_COUNT(BIT_OR(flag)) AS n_distinct_types,
       BIT_AND(flag) AS common_mask,
       BIT_XOR(event_id) AS id_parity
FROM flags GROUP BY user_id
"""


def iso_week_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 week calendar rollup — the classic cross-engine
    divergence trap (week 1 is the week containing the first
    Thursday; early-January days can belong to the PREVIOUS ISO
    year): weekly order revenue keyed by (iso_year, iso_week),
    where iso_year is the year of the week's THURSDAY (the ISO-8601
    definition) so year-boundary rows bucket identically in both
    engines. Single map-side-combinable aggregate."""
    o = load_table(spark, sf_dir, "orders")
    # dayofweek: Sun=1..Sat=7; days since Monday = (dayofweek+5) % 7
    thursday = F.date_add(
        F.date_sub(
            F.col("o_orderdate"), (F.dayofweek("o_orderdate") + 5) % 7
        ),
        3,
    )
    return (
        o.select(
            F.year(thursday).alias("iso_year"),
            F.weekofyear("o_orderdate").alias("iso_week"),
            "o_totalprice",
        )
        .groupBy("iso_year", "iso_week")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


ISO_WEEK_ORACLE = """
SELECT YEAR(o_orderdate - INTERVAL ((ISODOW(o_orderdate) - 1)) DAY
             + INTERVAL 3 DAY) AS iso_year,
       WEEK(o_orderdate) AS iso_week,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1, 2
"""


def lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT —
    the SQL-surface twin of the window-function top-k
    (topk_orders_per_customer): each low-key customer joined
    laterally to their 2 most expensive orders. Catalyst rewrites
    the correlated limit via DomainJoin into a ranked join, so the
    physical plan converges with the window form — the point is
    that the LATERAL front-end surface works and agrees."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "__lat_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    return spark.sql("""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM __lat_customer c
        JOIN LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM __lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) o
        WHERE c.c_custkey < 50
    """)


LATERAL_TOPK_ORACLE = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c
JOIN LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) o ON TRUE
WHERE c.c_custkey < 50
"""


def scalar_string_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-scalar sweep, covering the surface the first
    (scalar_string_math) doesn't: split_part, left/right slices,
    lpad zero-fill, reverse, position (instr/strpos), translate,
    repeat, and printf-style formatting — all whole-stage-codegen
    expressions with exact DuckDB twins."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_word1"),
        F.expr("left(p_name, 5)").alias("name_left5"),
        F.expr("right(p_brand, 2)").alias("brand_num"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_name", "o").alias("first_o_pos"),
        F.translate("p_type", "aeiou", "_____").alias("type_devoweled"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
        F.format_string("%s#%04d", "p_brand", "p_partkey").alias("tag"),
    )


SCALAR_STRING2_ORACLE = """
SELECT p_partkey,
       SPLIT_PART(p_type, ' ', 1)                  AS type_word1,
       LEFT(p_name, 5)                             AS name_left5,
       RIGHT(p_brand, 2)                           AS brand_num,
       LPAD(CAST(p_partkey AS VARCHAR), 8, '0')    AS key_padded,
       REVERSE(p_brand)                            AS brand_rev,
       STRPOS(p_name, 'o')                         AS first_o_pos,
       TRANSLATE(p_type, 'aeiou', '_____')         AS type_devoweled,
       REPEAT('*', p_size % 5)                     AS stars,
       PRINTF('%s#%04d', p_brand, p_partkey)       AS tag
FROM part
"""


def grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with explicit GROUPING() markers — the disambiguator
    the plain grouping-sets query lacks: a NULL in a group column can
    mean 'this row is a subtotal' or 'the data value was NULL', and
    only the grouping flags tell them apart. Emits both per-column
    flags and the composite grouping_id."""
    o = load_table(spark, sf_dir, "orders")
    # grouping()/grouping_id() must be computed IN the aggregate —
    # Catalyst rejects them in a post-agg projection.
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.grouping_id().cast("int").alias("gid"),
        F.count("*").alias("n_orders"),
    )


GROUPING_ID_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       CAST(GROUPING(o_orderstatus) * 2
            + GROUPING(o_orderpriority) AS INT) AS gid,
       COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def percentile_disc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI inverse-distribution aggregates through the SQL
    front-end: PERCENTILE_DISC and PERCENTILE_CONT WITHIN GROUP
    (ORDER BY ...) — the standard's ordered-set aggregate syntax
    (discrete picks an actual data value; continuous interpolates),
    completing the percentile family next to the expression-form
    `percentile_event_values`. One grouped pass, map-side partials.
    """
    import uuid

    view = f"__events_pdisc_{uuid.uuid4().hex}"
    load_table(spark, sf_dir, "events").createOrReplaceTempView(view)
    out = spark.sql(
        f"""
        SELECT event_type,
               ROUND(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY value), 4)
                 AS p50_disc,
               ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value), 4)
                 AS p50_cont,
               ROUND(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY value), 4)
                 AS p90_disc
        FROM {view}
        GROUP BY event_type
        """
    )
    out.schema
    return out


PERCENTILE_DISC_ORACLE = """
-- PERCENTILE_DISC per the ANSI definition (first value whose
-- cumulative fraction >= p, i.e. the CEIL(p*n)-th ordered value)
-- spelled out explicitly rather than via QUANTILE_DISC, whose
-- positioning convention need not match across engines.
-- NULL values are excluded in BOTH legs (ADVICE r08): Spark's
-- PERCENTILE_DISC/CONT are NULL-ignoring aggregates, so a NULL row
-- must not count toward n (it would shift the CEIL(p*n) index) nor
-- be ranked.
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
  WHERE value IS NOT NULL
), disc AS (
  SELECT event_type,
         MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                  THEN value END) AS d50,
         MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                  THEN value END) AS d90
  FROM ranked GROUP BY event_type
), cont AS (
  SELECT event_type, QUANTILE_CONT(value, 0.5) AS c50
  FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT d.event_type,
       ROUND(d.d50, 4) AS p50_disc,
       ROUND(c.c50, 4) AS p50_cont,
       ROUND(d.d90, 4) AS p90_disc
FROM disc d JOIN cont c ON d.event_type = c.event_type
"""


def window_keep_last_k_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention compaction: keep the LATEST 3 versions per key
    (user_id, ordered by ts then event_id) and drop the rest — the
    time-travel/rollback retention policy sitting between
    cdc_compact_latest's keep-1 and keeping everything. Emits
    per-user kept/dropped counts and the kept-window value sum so
    the cut itself is hash-checked.

    Scale shape: one user-keyed window (WindowGroupLimit applies —
    only k rows per key per mapper survive the shuffle when the
    filter is on row_number), then a per-user aggregate on the same
    partitioning.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = ev.withColumn("rn", F.row_number().over(w))
    kept = ranked.filter(F.col("rn") <= 3)
    totals = ev.groupBy("user_id").agg(F.count("*").alias("n_total"))
    return (
        kept.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.round(F.sum("value"), 4).alias("kept_value_sum"),
        )
        .join(totals, "user_id")
        .select(
            "user_id",
            "n_kept",
            (F.col("n_total") - F.col("n_kept")).cast("long").alias(
                "n_dropped"
            ),
            "kept_value_sum",
        )
    )


KEEP_LAST_K_ORACLE = """
WITH ranked AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), totals AS (
  SELECT user_id, COUNT(*) AS n_total FROM events GROUP BY user_id
)
SELECT r.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(t.n_total - COUNT(*) AS BIGINT) AS n_dropped,
       ROUND(SUM(r.value), 4) AS kept_value_sum
FROM ranked r JOIN totals t ON r.user_id = t.user_id
WHERE r.rn <= 3
GROUP BY r.user_id, t.n_total
"""


def map_higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP higher-order functions (the map half of the lambda-HOF
    surface `higher_order_array_functions` covers for arrays):
    per-user event-type count maps built with map_from_entries,
    thresholded with map_filter, rescaled with transform_values,
    and merged with map_zip_with — all JVM-side lambdas, zero
    explode after the initial aggregate. Output flattens the final
    map to a sorted `k:v` string (driver flat-schema convention);
    the oracle recomputes the same string from plain aggregates.
    """
    ev = load_table(spark, sf_dir, "events")
    # s is integer CENTS from the start (half-up of the exact
    # ten-thousandths sum): the earlier ROUND(SUM(value), 2) of a
    # 4-decimal sum is the half-boundary class (a group landing on
    # x.xx50 rounds differently across engines), and the fused
    # integer below consumed it at full weight.
    q4 = F.round(F.col("value") * 10000).cast("long")
    per = (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("c"),
            F.sum(q4.cast("decimal(38,0)")).alias("__q4"),
        )
        .selectExpr(
            "user_id",
            "event_type",
            "c",
            "CAST((__q4 * 2 + 100) div 200 AS BIGINT) AS s_cents",
        )
    )
    entries = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "c")))
        ).alias("counts"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "s_cents")))
        ).alias("sums"),
    )
    # busy types only (count > 2), counts scaled x10, then fused
    # with the value sums as INTEGER CENTS (c*10*100 + s_cents):
    # exact integer arithmetic stringifies identically on both
    # engines, where a formatted float would hit rounding-mode
    # divergence (Spark format_number is HALF_EVEN).
    busy = F.map_filter("counts", lambda k, v: v > 2)
    scaled = F.transform_values(busy, lambda k, v: v * 10)
    fused = F.map_zip_with(
        scaled,
        F.map_filter("sums", lambda k, v: F.lit(True)),
        lambda k, c10, s: F.when(
            c10.isNotNull(),
            (c10 * 100 + s).cast("long"),
        ),
    )
    flat = F.array_join(
        F.transform(
            F.sort_array(F.map_keys(fused)),
            lambda k: F.concat_ws(
                ":",
                k,
                F.coalesce(
                    F.element_at(fused, k).cast("string"),
                    F.lit("<dropped>"),
                ),
            ),
        ),
        ",",
    )
    return entries.select(
        "user_id",
        F.size("counts").cast("int").alias("n_types"),
        F.size(busy).cast("int").alias("n_busy_types"),
        flat.alias("busy_fused"),
    )


MAP_HOF_ORACLE = """
WITH per AS (
  SELECT user_id, event_type, COUNT(*) AS c,
         (SUM(CAST(ROUND(value * 10000) AS HUGEINT)) * 2 + 100) // 200
           AS s_cents
  FROM events GROUP BY user_id, event_type
), fused AS (
  SELECT user_id, event_type,
         CASE WHEN c > 2
              THEN CAST(CAST(c * 10 * 100
                   + s_cents AS BIGINT) AS VARCHAR)
              ELSE '<dropped>' END AS val,
         c > 2 AS busy
  FROM per
)
SELECT user_id,
       CAST(COUNT(*) AS INTEGER) AS n_types,
       CAST(COUNT(*) FILTER (WHERE busy) AS INTEGER) AS n_busy_types,
       ARRAY_TO_STRING(LIST(event_type || ':' || val
                            ORDER BY event_type), ',') AS busy_fused
FROM fused GROUP BY user_id
"""
