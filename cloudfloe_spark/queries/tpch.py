"""TPC-H-shaped decision-support catalog: the classic query patterns adapted
to the driver's trimmed star schema (FIXTURES.md §2 — no partsupp, no
commitdate/receiptdate/shipmode, so Q2/Q4/Q11/Q12/Q20/Q21/Q22 are re-expressed
with the available columns while keeping their operator shape).

These exercise the delegated SELECT envelope the reference's validator admits
(reference backend/main.py:36-43 allows any read-only SELECT; SURVEY.md §2C
"Joins, window functions … inside the permitted envelope"): correlated
EXISTS / NOT EXISTS, scalar subqueries, CASE-conditional aggregation,
group-HAVING, and deep multi-join trees.

Scale notes (100 TB design):
- Bounded dimensions (nation/region: fixed 25/5 rows) and one-row global
  aggregates carry explicit ``F.broadcast`` hints. Customer / supplier /
  part joins are HINT-FREE: those tables grow with scale factor (customer
  is ~1.5 B rows at 100 TB), so the decision is left to AQE, which
  broadcasts when the runtime size fits and demotes to shuffle when it
  doesn't. A forced hint would be honored even when the build side no
  longer fits — a driver OOM at scale.
- Correlated-subquery shapes are written as semi/anti joins or pre-aggregated
  broadcast joins (agg-below-join), never per-row subquery execution.
- Multi-predicate OR brackets (q19) stay inside one scan: Catalyst pushes
  the disjunction down to the parquet reader as one filter, so the fact
  table is read once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH unit_costs AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        )
        SELECT p.p_partkey, p.p_brand, u.l_suppkey AS s_suppkey,
               ROUND(u.unit_cost, 2) AS unit_cost
        FROM part p
        JOIN unit_costs u ON u.l_partkey = p.p_partkey
        WHERE p.p_size = 25
          AND u.unit_cost = (
              SELECT MIN(u2.unit_cost) FROM unit_costs u2
              WHERE u2.l_partkey = p.p_partkey
          )
    """,
    tags=("tpch", "join", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape (min-cost supplier per part) without partsupp: unit
    cost derived from lineitem, the correlated MIN re-expressed as a window
    min over the pre-aggregated (part, supplier) relation — one shuffle on
    l_partkey serves the groupBy, the window, and the filter."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    unit = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = unit.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(p.filter(F.col("p_size") == 25), best.l_partkey == p.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            F.col("l_suppkey").alias("s_suppkey"),
            F.round("unit_cost", 2).alias("unit_cost"),
        )
    )


@register(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
    """,
    tags=("tpch", "subquery"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: correlated EXISTS → LEFT SEMI join with a compound
    condition (equi key + inter-table inequality). 'Late' is re-expressed as
    shipped >30 days after order date (no commitdate in the fixture)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    late = (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.04 AND 0.07
          AND l_quantity < 24
    """,
    tags=("tpch", "agg"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6: pure scan-filter-aggregate — the canonical pushdown probe.
    All four predicates reach the parquet reader; no shuffle at all (partial
    agg → single final row)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.04, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(year FROM l.l_shipdate) AS INT)
    """,
    tags=("tpch", "join"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7: bilateral trade volume between two nations by year. Both
    nation lookups broadcast; the disjunctive nation-pair predicate is applied
    after the joins exactly as the spec writes it."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               ROUND(
                 SUM(CASE WHEN n2.n_name = 'NATION_5'
                          THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
        GROUP BY CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    """,
    tags=("tpch", "join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8: national market share inside a region — conditional-sum
    ratio over an 8-table join tree; nation/region pinned broadcast,
    customer/supplier/part left to AQE's size-based choice."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n_cust = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    n_supp = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = _revenue()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("cn_key"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("cn_region") == r.r_regionkey,
        )
        .join(p.filter(F.col("p_type") == "STANDARD"), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
        SELECT n.n_name AS nation_name,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                         - 0.1 * p.p_retailprice * l.l_quantity), 2) AS profit
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    """,
    tags=("tpch", "join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape (product-line profit by supplier nation and year);
    supply cost proxied as 10% of p_retailprice (no partsupp table)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = _revenue() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p.filter(F.col("p_name").like("%red%")), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@register(
    "q10_returned_items",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
               ROUND(c.c_acctbal, 2) AS c_acctbal,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-07-01'
          AND o.o_orderdate <  TIMESTAMP '1997-10-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name, ROUND(c.c_acctbal, 2)
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    tags=("tpch", "join", "flagship"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10: customers who returned the most in a quarter — selective
    fact filters first, hint-free dim joins, top-20 via
    TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
          AND l.l_shipdate >= TIMESTAMP '1998-01-01'
          AND l.l_shipdate <  TIMESTAMP '1999-01-01'
        GROUP BY l.l_linestatus
    """,
    tags=("tpch", "agg"),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape: CASE-conditional counts of high/low-priority orders
    among late shipments (shipmode replaced by linestatus, commit/receipt
    lateness replaced by ship-vs-order-date lateness)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
        SELECT ROUND(
                 100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
          AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    tags=("tpch", "agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14: promotion revenue share in a month — conditional-sum ratio
    with a hint-free part join (AQE sizes it); single scalar result."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    vol = _revenue()
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15: supplier(s) achieving the max quarterly revenue — the
    scalar-subquery max re-expressed as a broadcast join against the 1-row
    global max (no second scan of lineitem; the CTE result is reused)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_revenue()), 2).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("max_rev"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_part_supplier_counts",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "agg"),
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape: distinct-supplier counts per (brand, type, size)
    bucket — partsupp replaced by the observed lineitem part↔supplier pairs."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            p.filter(
                (F.col("p_brand") != "Brand#1")
                & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
            ),
            li.l_partkey == p.p_partkey,
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
        SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN (
            SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg_qty
            FROM lineitem GROUP BY l_partkey
        ) a ON a.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3' AND l.l_quantity < a.half_avg_qty
    """,
    tags=("tpch", "subquery", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17: revenue lost to small-quantity orders. The correlated
    per-part AVG is a window over l_partkey — ONE lineitem scan, one shuffle,
    and the part join reuses that hash partitioning (no broadcast of a
    per-partkey aggregate, which has |part| cardinality and cannot be
    broadcast at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("l_partkey")
    li_avg = li.select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        (0.5 * F.avg("l_quantity").over(w)).alias("half_avg_qty"),
    )
    return (
        li_avg.join(
            p.filter(F.col("p_brand") == "Brand#3"),
            li_avg.l_partkey == p.p_partkey,
        )
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               ROUND(o.o_totalprice, 2) AS o_totalprice,
               ROUND(SUM(l.l_quantity), 2) AS total_qty
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 160
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                 ROUND(o.o_totalprice, 2)
        ORDER BY o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    tags=("tpch", "subquery", "flagship"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18: customers with very large orders — IN-subquery over a
    grouped HAVING re-expressed as a semi join on the aggregated keys; one
    shuffle on l_orderkey serves both the HAVING agg and the final group."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 160)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"), li.l_orderkey == F.col("big_key"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    oracle="""
        SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 11 AND 20
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 21 AND 40
               AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "join", "agg"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19: three OR'd predicate brackets spanning both join sides —
    stays a single hash join with a residual disjunction, one scan of each
    table (AQE picks broadcast vs shuffle by runtime size of part)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    bracket1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 20)
    )
    bracket2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(11, 20)
        & F.col("l_quantity").between(10, 30)
    )
    bracket3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(21, 40)
        & F.col("l_quantity").between(20, 40)
    )
    return joined.filter(bracket1 | bracket2 | bracket3).agg(
        F.round(F.sum(_revenue()), 2).alias("revenue")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders o    ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s.s_name
    """,
    tags=("tpch", "subquery"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order (lateness = shipped >60 days after order
    date).

    The EXISTS/NOT EXISTS pair is algebraized to per-order supplier stats:
    a (order, supplier) aggregate counts each supplier's late lines, then
    an order-partitioned window counts suppliers and late suppliers. A
    supplier qualifies iff it is late, the order has >1 supplier, and
    exactly 1 late supplier — the same predicate the correlated subqueries
    express, but with ONE scan of lineitem and two key-sharing exchanges
    instead of three scans + semi + anti joins (~1.4× faster at sf0.1
    locally; the scan-count reduction is what matters at 100 TB, where
    lineitem is the table that doesn't fit in page cache).
    """
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    # r15 (guide §2.4 — share one exchange between key-compatible
    # operators): repartition on l_orderkey ALONE before the
    # (orderkey, suppkey) aggregate. HashPartitioning(l_orderkey)
    # satisfies the clustering requirement of BOTH the two-key groupBy
    # (its keys are a superset) and the order-partitioned window, so the
    # plan drops from two data exchanges (agg on (ok, sk), re-shuffle on
    # ok for the window) to one. Columns are projected to the four the
    # query needs before the shuffle. Measured 1.11 s → 0.96 s at sf0.1;
    # same rows.
    per_supp = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            o.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(late).alias("n_late_lines"))
    )
    w = Window.partitionBy("l_orderkey")
    sole_late = (
        per_supp.withColumn("n_supp", F.count("*").over(w))
        .withColumn(
            "n_late_supp", F.sum((F.col("n_late_lines") > 0).cast("int")).over(w)
        )
        .filter(
            (F.col("n_late_lines") > 0)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        sole_late.join(s, sole_late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
    )


@register(
    "q22_dormant_rich_customers",
    oracle="""
        SELECT c.c_mktsegment, COUNT(*) AS numcust,
               ROUND(SUM(c.c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (
            SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01'
        )
        GROUP BY c.c_mktsegment
    """,
    tags=("tpch", "subquery"),
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: above-average-balance customers with no recent
    orders (country-code grouping replaced by mktsegment; 'no orders at all'
    relaxed to 'no orders since 2000' because every fixture customer has
    orders). Scalar-AVG broadcast + anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                              AND o.o_orderpriority <> '5-LOW'
            GROUP BY c.c_custkey
        ) per_cust
        GROUP BY c_count
    """,
    tags=("tpch", "agg"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13: histogram of orders-per-customer (comment filter replaced
    by a priority filter). Two-level aggregation; the outer one collapses to
    a handful of rows so the second shuffle is negligible."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "5-LOW"),
            c.c_custkey == o.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q11_important_part_values",
    oracle="""
        WITH vals AS (
            SELECT l.l_partkey,
                   SUM(l.l_extendedprice * (1 - l.l_discount)) AS part_value
            FROM lineitem l
            WHERE l.l_suppkey IN (
                SELECT s.s_suppkey
                FROM supplier s
                JOIN nation n ON n.n_nationkey = s.s_nationkey
                WHERE n.n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
            )
            GROUP BY l.l_partkey
        )
        SELECT l_partkey, ROUND(part_value, 2) AS part_value
        FROM vals
        WHERE part_value > (SELECT 0.001 * SUM(part_value) FROM vals)
    """,
    tags=("tpch", "subquery", "agg"),
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape (important inventory value) without partsupp: per-part
    revenue from suppliers in a nation set, kept only where it exceeds a
    fraction of the filtered total. The HAVING-vs-global-scalar is computed by
    re-aggregating the grouped result (a handful of rows) and broadcasting the
    one-row total back — the fact table is scanned and shuffled exactly once."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    supp = (
        s.join(
            F.broadcast(n.filter(F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))),
            s.s_nationkey == n.n_nationkey,
        ).select("s_suppkey")
    )
    vals = (
        li.join(supp, li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).alias("part_value"))
    )
    total = vals.agg((0.001 * F.sum("part_value")).alias("threshold"))
    return (
        vals.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", F.round("part_value", 2).alias("part_value"))
    )


@register(
    "q20_top_volume_suppliers",
    oracle="""
        WITH ps AS (
            SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS supp_qty
            FROM lineitem l
            WHERE l.l_partkey IN (
                      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
                  )
              AND l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l.l_partkey, l.l_suppkey
        ),
        pt AS (
            SELECT l_partkey, SUM(supp_qty) AS part_qty
            FROM ps GROUP BY l_partkey
        )
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_2', 'NATION_5', 'NATION_8', 'NATION_14')
          AND s.s_suppkey IN (
              SELECT ps.l_suppkey
              FROM ps JOIN pt ON pt.l_partkey = ps.l_partkey
              WHERE ps.supp_qty > 0.3 * pt.part_qty
          )
    """,
    tags=("tpch", "subquery", "join"),
)
def q20_top_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape (potential part promotion) without partsupp: suppliers
    in a nation set who shipped more than 30% of some 'small%' part's 1996
    volume. The nested IN-chain becomes semi joins (AQE picks
    broadcast-or-shuffle by runtime size); the correlated per-part scalar is
    a window SUM over the grouped relation — ONE lineitem scan, no broadcast
    of a per-partkey aggregate (|part| cardinality — unbroadcastable at
    scale), no recomputation of the grouped subtree."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    small = p.filter(F.col("p_name").like("small%")).select("p_partkey")
    ps = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(small, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    part_qty = F.sum("supp_qty").over(Window.partitionBy("l_partkey"))
    qualifying = (
        ps.withColumn("part_qty", part_qty)
        .filter(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(
            F.broadcast(
                n.filter(F.col("n_name").isin("NATION_2", "NATION_5", "NATION_8", "NATION_14"))
            ),
            s.s_nationkey == n.n_nationkey,
        )
        .join(qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
