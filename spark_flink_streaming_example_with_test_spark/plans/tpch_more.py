"""Second wave of TPC-H-shape relational coverage, adapted to the
fixture schema (no partsupp/shipmode/phone columns — each classic
query keeps its *plan shape* but swaps the missing column for an
available one).

Same conventions as plans/relational.py: dimension sides broadcast,
float aggregates rounded identically in Spark and DuckDB, every
computed column aliased the same on both sides. These extend the
reference's gap map (SURVEY.md §2.6 — the reference itself has zero
joins, so all shapes here are new surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_flink_streaming_example_with_test_spark.sources.tables import load_table

def _disc_price():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _money_sum(expr, alias: str):
    """Exact-decimal SUM of a monetary double expression, rounded to
    cents and returned as double. Summing doubles is accumulation-order
    sensitive — a value landing on a x.xx5 boundary rounds differently
    in Spark vs DuckDB; per-row cast to DECIMAL(18,6) makes the
    aggregate exact and engine-order-independent. SQL twin:
    CAST(ROUND(SUM(CAST(<expr> AS DECIMAL(18,6))), 2) AS DOUBLE)."""
    return (
        F.round(F.sum(expr.cast("decimal(18,6)")), 2)
        .cast("double")
        .alias(alias)
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year.
    Both nation aliases broadcast; supplier broadcasts onto lineitem;
    the only big shuffle is lineitem<->orders. The pair predicate
    (n1 in {A,B}, n2 in {A,B}, n1 != n2) prunes via the broadcast
    hash sets before the fact-fact join."""
    n = load_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    n1 = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_money_sum(_disc_price(), "revenue"))
    )


Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, CAST(ROUND(SUM(CAST(volume AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         YEAR(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    AND n2.n_name IN ('NATION_1', 'NATION_2')
    AND n1.n_name <> n2.n_name
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part trade volume
    per order year — conditional-sum ratio over a star join (part,
    supplier, nation broadcast; orders<->lineitem shuffled)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    vol = _disc_price()
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # Exact-integer share (VERDICT r08 item #3): volume is a
            # 4-dec rational (2-dec price x 2-dec (1-discount)), so
            # round(vol*1e4) is an exact per-row integer and the
            # share emits via the half-up helper instead of the
            # order-dependent double-sum ratio.
            F.sum(
                F.when(
                    F.col("n_name") == "NATION_3",
                    F.round(vol * 10000).cast("decimal(38,0)"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("__nv"),
            F.sum(F.round(vol * 10000).cast("decimal(38,0)")).alias("__tv"),
        )
        .selectExpr(
            "o_year",
            '(((__nv) * 2000000 + (__tv)) div (2 * (__tv))) / 1e6' + " AS mkt_share",
        )
    )


Q8_ORACLE = """
SELECT YEAR(o_orderdate) AS o_year,
       ((CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS HUGEINT) ELSE 0 END) AS HUGEINT) * 2000000 + (SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS HUGEINT)))) // (2 * (SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS HUGEINT))))) / 1e6 AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type = 'PROMO'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY YEAR(o_orderdate)
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year over parts
    matching a name pattern. No partsupp in the fixtures, so supply
    cost is modeled as 80% of p_retailprice — the plan shape (LIKE
    pushdown on a broadcast dim, fact join, two-key agg) is what
    matters."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    l = load_table(spark, sf_dir, "lineitem")
    profit = _disc_price() - 0.8 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year")
        )
        .agg(_money_sum(profit, "sum_profit"))
    )


Q9_ORACLE = """
SELECT n_name AS nation, YEAR(l_shipdate) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                      - 0.8 * p_retailprice * l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, YEAR(l_shipdate)
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns
    in one quarter. Deterministic top-k: ordered on rounded revenue
    with custkey tiebreak."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_money_sum(_disc_price(), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds 1.5x the
    mean per-part value — aggregate, then filter against a broadcast
    scalar subquery (one extra one-row crossJoin, no second scan of
    the aggregate). The mean-relative threshold is scale-free, unlike
    Q11's literal fraction which empties at larger SFs."""
    l = load_table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        F.sum(_disc_price().cast("decimal(18,6)")).alias("raw_value")
    )
    mean = per_part.agg(F.avg("raw_value").alias("mean_value"))
    return (
        per_part.crossJoin(F.broadcast(mean))
        .filter(F.col("raw_value") > 1.5 * F.col("mean_value"))
        .select(
            "l_partkey",
            F.round("raw_value", 2).cast("double").alias("part_value"),
        )
    )


Q11_ORACLE = """
WITH per_part AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS raw_value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(ROUND(raw_value, 2) AS DOUBLE) AS part_value
FROM per_part
WHERE raw_value > 1.5 * (SELECT AVG(raw_value) FROM per_part)
"""


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode column absent — grouped by
    l_linestatus instead): conditional CASE-sum counts of high- vs
    low-priority orders per group, one pass."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    including zero-order customers — left outer join, two stacked
    aggregations (custkey shuffle, then tiny c_count shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO-part share of one month's revenue —
    broadcast part dim, conditional-sum ratio, single output row."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            # Exact-integer promo share x100 (VERDICT r08 item #3).
            F.sum(
                F.when(
                    F.col("p_type") == "PROMO",
                    F.round(_disc_price() * 10000).cast("decimal(38,0)"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("__pv"),
            F.sum(
                F.round(_disc_price() * 10000).cast("decimal(38,0)")
            ).alias("__tv"),
        )
        .selectExpr(
            '(((__pv * 100) * 20000 + (__tv)) div (2 * (__tv))) / 1e4' + " AS promo_revenue_pct",
        )
    )


Q14_ORACLE = """
SELECT ((CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS HUGEINT) ELSE 0 END) * 100 AS HUGEINT) * 20000 + (SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS HUGEINT)))) // (2 * (SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS HUGEINT))))) / 1e4 AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max quarterly revenue. The
    lineitem scan + aggregate run ONCE: the global max is a
    whole-frame window over the already-aggregated per-supplier rows
    (|suppliers| rows on one partition — fine even at 1M suppliers),
    instead of a second scan for a scalar subquery. Equality is on
    the exact-decimal rounded value on both engines."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = l.groupBy("l_suppkey").agg(
        _money_sum(_disc_price(), "total_revenue")
    )
    return (
        revenue.withColumn(
            "max_revenue", F.max("total_revenue").over(Window.partitionBy())
        )
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey, CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below half the per-part
    average quantity, for one brand. The correlated scalar subquery
    is the classic rewrite: aggregate per partkey, join back, filter.
    Brand parts broadcast-prune lineitem before the per-part agg."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    l = load_table(spark, sf_dir, "lineitem")
    li_b = l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
    thresh = li_b.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li_b.join(F.broadcast(thresh), li_b.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            # Exact-integer yearly average (VERDICT r08 item #3):
            # sum 2-dec prices as integer cents, divide once.
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
            ).alias("__pc")
        )
        .selectExpr(
            '(((__pc) * 200 + (CAST(700 AS BIGINT))) div (2 * (CAST(700 AS BIGINT)))) / 1e2' + " AS avg_yearly",
        )
    )


Q17_ORACLE = """
WITH li_b AS (
  SELECT l.* FROM lineitem l JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
), thresh AS (
  SELECT l_partkey AS t_partkey, 0.5 * AVG(l_quantity) AS qty_thresh
  FROM li_b GROUP BY l_partkey
)
SELECT ((CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS HUGEINT) * 200 + (CAST(700 AS BIGINT))) // (2 * (CAST(700 AS BIGINT)))) / 1e2 AS avg_yearly
FROM li_b JOIN thresh ON l_partkey = t_partkey
WHERE l_quantity < qty_thresh
"""


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of brand/size/quantity conjunct bands over
    a broadcast part join — the disjunction can't prune the scan, but
    each conjunct narrows the broadcast hash probe."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(10, 40)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(band).agg(_money_sum(_disc_price(), "revenue"))


Q19_ORACLE = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
       AND l_quantity BETWEEN 20 AND 50)
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (no phone column — grouped by nationkey):
    customers with above-average positive balance and no *recent*
    orders (none since 2000-01-01 — every fixture customer has some
    order, so "no orders ever" is empty at all SFs). Scalar subquery
    broadcast + left-anti join against the filtered orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _money_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )


Q22_ORACLE = """
SELECT c_nationkey, COUNT(*) AS numcust, CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


def q2_min_unitprice_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp — supply cost proxied by the min
    observed unit price per (part, supplier) in lineitem): for small
    parts, the supplier(s) offering the global minimum unit price.
    Correlated-min rewrite: per-pair aggregate, window min per part,
    equality filter on rounded values."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    # Tie-free 4-dp unit price: prices are exact cents, so the
    # rounding is done as HALF-UP INTEGER DIVISION on (cents*100)/qty
    # — extendedprice/quantity lands exactly on .xxxx5 for qty in
    # {2,4,8,...}, where double ROUND diverges between engines
    # (caught by sf0.1 parity; sf0.01 never hit a tie).
    staged = l.select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    unit4 = F.expr("(200 * cents + q) DIV (2 * q)")
    per_pair = staged.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit4).alias("u4")
    )
    w = Window.partitionBy("l_partkey")
    best = (
        per_pair.withColumn("best", F.min("u4").over(w))
        .filter(F.col("u4") == F.col("best"))
        .withColumn("min_unit_price", F.col("u4") / 10_000.0)
    )
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "min_unit_price")
    )


Q2_ORACLE = """
WITH staged AS (
  SELECT l_partkey, l_suppkey,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem
), per_pair AS (
  SELECT l_partkey, l_suppkey,
         MIN((200 * cents + q) // (2 * q)) AS u4
  FROM staged GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT *, MIN(u4) OVER (PARTITION BY l_partkey) AS best
  FROM per_pair
)
SELECT p_partkey, p_name, s_name, u4 / 10000.0 AS min_unit_price
FROM best
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size < 10 AND u4 = best
"""


def map_props_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: props JSON parsed to map<string,int>, then
    exploded into (key, value) entries plus map_keys/element_at
    probes — all JVM-side expressions (from_json, explode)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 13 == 0)
    m = F.from_json("props", "map<string,int>")
    return (
        e.select("event_id", m.alias("m"))
        .select(
            "event_id",
            F.explode("m").alias("key", "value"),
            F.size("m").alias("m_size"),
            F.element_at("m", "k").alias("k_val"),
        )
    )


MAP_PROPS_ORACLE = """
SELECT event_id,
       'k'                              AS key,
       CAST(props->>'$.k' AS INT)       AS value,
       1                                AS m_size,
       CAST(props->>'$.k' AS INT)       AS k_val
FROM events WHERE event_id % 13 = 0
"""


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute,
    excluding a NOT IN subquery set (negative-balance suppliers
    standing in for the missing complaints column). NOT IN compiles
    to a left-anti join here because the subquery key is non-null;
    the distinct count rides the (brand, size) aggregate."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 5, 9, 13))
    s_bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s_bad), l.l_suppkey == s_bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 5, 9, 13)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order — a correlated EXISTS (another supplier
    shipped the same order) AND NOT EXISTS (another supplier was also
    late), composed as one aggregate over per-order supplier sets
    instead of two correlated semi/anti joins: one shuffle computes
    (n_suppliers, n_late_suppliers, late supplier) per order.
    "Late" = shipped > 60 days after order date (no receipt/commit
    dates in the fixtures)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    j = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .cast("int"),
    )
    per_supp = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supps"),
        F.sum("supp_late").alias("n_late"),
        F.max(F.when(F.col("supp_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    sole_late = per_order.filter(
        (F.col("n_supps") > 1) & (F.col("n_late") == 1)
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        sole_late.join(F.broadcast(s), sole_late.late_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


Q21_ORACLE = """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS supp_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
), per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supps,
         SUM(supp_late) AS n_late,
         MAX(CASE WHEN supp_late = 1 THEN l_suppkey END) AS late_supp
  FROM per_supp GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supps > 1 AND n_late = 1
GROUP BY s_name
"""


def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (sole-supplier-of-excess-parts): nested IN over
    a name-prefix part set with a correlated fraction-of-total
    threshold. The fixture has no partsupp, so "availqty > half the
    shipped quantity" becomes "this supplier shipped > 30% of the
    part's 1996 volume" — same plan skeleton: filtered part IN-list
    (broadcast), per-(supplier, part) aggregate, correlated per-part
    total, semi-join back to supplier.

    The 30%-of-total predicate is scale-free (SURVEY convention):
    literal quantity thresholds return 0 rows on small fixtures.
    Plan: one shuffle for the (supp, part) aggregate; the per-part
    total re-aggregates that output (no second lineitem scan); the
    final supplier filter is a semi-join on a tiny key set.
    """
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    per_sp = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    per_part = per_sp.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        per_sp.join(per_part, "l_partkey")
        .filter(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


Q20_ORACLE = """
WITH red_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
), sp AS (
  SELECT l_suppkey, l_partkey, SUM(l_quantity) AS supp_qty
  FROM lineitem JOIN red_parts ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
), pt AS (
  SELECT l_partkey, SUM(supp_qty) AS part_qty FROM sp GROUP BY 1
)
SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM sp JOIN pt USING (l_partkey)
  WHERE supp_qty > 0.3 * part_qty
)
"""
