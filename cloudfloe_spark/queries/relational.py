"""Relational operator catalog: scan/project/filter/scalar/agg/sort/set/nesting.

Covers SURVEY.md §2C row by row — every operator exercised by the reference's
executable surface (reference backend/main.py:743-769 demo corpus,
frontend/index.html:134-151, README examples) plus the delegated-envelope
operators an analytics engine must have (SURVEY.md §2C "Joins, window
functions, grouping sets").

Scale notes: every query here is a declarative DataFrame program — Catalyst
gets filter pushdown + column pruning into the parquet scan, partial
aggregation map-side, and TakeOrderedAndProject for top-k. No collect(),
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table


def _r2(c: Column) -> Column:
    """Round doubles for float-summation-order parity with the oracle."""
    return F.round(c, 2)


# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-flavored pricing summary.
# Reference analog: the "Movies by Decade" demo aggregation
# (frontend/index.html:142) — filter → groupBy → multi-agg → orderBy.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
            ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
            ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
            ROUND(AVG(l_quantity), 2)                                   AS avg_qty,
            ROUND(AVG(l_extendedprice), 2)                              AS avg_price,
            ROUND(AVG(l_discount), 2)                                   AS avg_disc,
            COUNT(*)                                                    AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → filter → hash-agg (partial+final) → sort. The flagship query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_price"
            ),
            _r2(F.avg("l_quantity")).alias("avg_qty"),
            _r2(F.avg("l_extendedprice")).alias("avg_price"),
            _r2(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Projection / filters / scalar expressions (SURVEY §2C projection table)
# ---------------------------------------------------------------------------
@register(
    "scan_project_alias",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
        WHERE l_returnflag = 'A'
    """,
    tags=("scan", "projection"),
)
def scan_project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + computed column + alias (reference README.md:107).

    No rounding: the per-row expression is the same IEEE op sequence in both
    engines, so the raw doubles are bit-identical (rounding would instead
    expose engine-specific round() boundary behavior)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag") == "A").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@register(
    "filter_compound",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderstatus <> 'F'
          AND o_totalprice > 1000
          AND o_orderdate > TIMESTAMP '1996-01-01'
          AND (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH')
          AND o_custkey IS NOT NULL
          AND o_totalprice BETWEEN 1000 AND 400000
          AND o_orderstatus IN ('O', 'P')
    """,
    tags=("filter",),
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every predicate form in the reference corpus: =, <>, >, AND, OR,
    IS NOT NULL (frontend/index.html:142,150), plus BETWEEN and IN —
    all pushed down to the parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") != "F")
        & (F.col("o_totalprice") > 1000)
        & (F.col("o_orderdate") > F.lit("1996-01-01").cast("timestamp"))
        & ((F.col("o_orderpriority") == "1-URGENT") | (F.col("o_orderpriority") == "2-HIGH"))
        & F.col("o_custkey").isNotNull()
        & F.col("o_totalprice").between(1000, 400000)
        & F.col("o_orderstatus").isin("O", "P")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "scalar_functions",
    oracle="""
        SELECT c_custkey,
               UPPER(c_name)                                  AS name_upper,
               LOWER(c_mktsegment)                            AS seg_lower,
               TRIM(CONCAT('  ', c_name, '  '))               AS name_trimmed,
               SUBSTRING(c_name, 1, 8)                        AS name_prefix,
               LENGTH(c_name)                                 AS name_len,
               REPLACE(c_mktsegment, 'MACHINERY', 'MACH')     AS seg_replaced,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS seg_or_na,
               CAST(TRUNC(c_acctbal) AS BIGINT)               AS acctbal_int
        FROM customer
    """,
    tags=("scalar",),
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/null functions: TRIM (backend/main.py:767), CAST
    (backend/main.py:506), COALESCE (backend/main.py:506), plus the standard
    string library. All JVM-side, whole-stage-codegen'd."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_mktsegment"), F.lit("MACHINERY"), F.lit("MACH")).alias(
            "seg_replaced"
        ),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("N/A")).alias(
            "seg_or_na"
        ),
        F.col("c_acctbal").cast("bigint").alias("acctbal_int"),
    )


@register(
    "case_when",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 300000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               CASE o_orderstatus WHEN 'F' THEN 'finished'
                                  WHEN 'O' THEN 'open'
                                  ELSE 'other' END AS status_name
        FROM orders
    """,
    tags=("scalar",),
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched + simple CASE expressions."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_name"),
    )


@register(
    "string_like_regexp",
    oracle="""
        SELECT p_partkey, p_name, p_brand
        FROM part
        WHERE p_brand LIKE 'Brand#1%'
          AND REGEXP_MATCHES(p_name, '^[a-z]+ [a-z]+')
    """,
    tags=("scalar", "filter"),
)
def string_like_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE prefix match (pushed down as StartsWith) + regexp filter."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").like("Brand#1%") & F.col("p_name").rlike("^[a-z]+ [a-z]+")
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "math_functions",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(ABS(l_discount - 0.05), 4)        AS abs_disc,
               CAST(FLOOR(l_quantity) AS BIGINT)       AS qty_floor,
               CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
               ROUND(SQRT(l_quantity), 4)              AS qty_sqrt,
               ROUND(LN(l_extendedprice), 4)           AS price_ln,
               ROUND(POWER(l_tax, 2), 6)               AS tax_sq,
               CAST(l_partkey % 10 AS BIGINT)          AS partkey_mod
        FROM lineitem
        WHERE l_linenumber = 1
    """,
    tags=("scalar",),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar library: abs/floor/ceil/sqrt/ln/power/mod."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_disc"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.pow(F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_partkey") % 10).cast("bigint").alias("partkey_mod"),
    )


@register(
    "date_trunc_parts",
    oracle="""
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
               CAST(EXTRACT(year FROM o_orderdate) AS INT)  AS order_year,
               CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_mon,
               CAST(EXTRACT(day FROM o_orderdate) AS INT)   AS order_day,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY 1, 2, 3, 4
    """,
    tags=("scalar", "agg", "datetime"),
)
def date_trunc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc (reference README.md:117) + year/month/day extraction,
    grouped — the 'events per day' reference pattern."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_mon"),
            F.dayofmonth("o_orderdate").alias("order_day"),
        )
        .groupBy("order_month", "order_year", "order_mon", "order_day")
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Aggregation (SURVEY §2C aggregation table)
# ---------------------------------------------------------------------------
@register(
    "agg_stats",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*)                                  AS n_customers,
               COUNT(DISTINCT c_nationkey)               AS n_nations,
               ROUND(SUM(c_acctbal), 2)                  AS sum_bal,
               ROUND(AVG(c_acctbal), 2)                  AS avg_bal,
               ROUND(MIN(c_acctbal), 2)                  AS min_bal,
               ROUND(MAX(c_acctbal), 2)                  AS max_bal,
               ROUND(STDDEV_SAMP(c_acctbal), 2)          AS std_bal
        FROM customer
        GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*)/COUNT(DISTINCT)/SUM/AVG/MIN/MAX/STDDEV — the reference's
    aggregate surface (README.md:119, frontend/index.html:142) + extras."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        _r2(F.sum("c_acctbal")).alias("sum_bal"),
        _r2(F.avg("c_acctbal")).alias("avg_bal"),
        _r2(F.min("c_acctbal")).alias("min_bal"),
        _r2(F.max("c_acctbal")).alias("max_bal"),
        _r2(F.stddev_samp("c_acctbal")).alias("std_bal"),
    )


@register(
    "agg_bool",
    oracle="""
        SELECT o_custkey,
               BOOL_OR(o_orderstatus = 'F')  AS any_finished,
               BOOL_AND(o_totalprice > 0)    AS all_positive
        FROM orders
        GROUP BY o_custkey
    """,
    tags=("agg",),
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOL_OR — used by the reference's delete-detection aggregate
    (backend/main.py:508: BOOL_OR(manifest_content <> 'DATA'))."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
    )


@register(
    "group_by_having",
    oracle="""
        SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_spent
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 3
    """,
    tags=("agg",),
)
def group_by_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            _r2(F.sum("o_totalprice")).alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 3)
    )


@register(
    "agg_filtered",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_discount > 0.05)            AS n_discounted,
               ROUND(SUM(l_extendedprice) FILTER (WHERE l_tax > 0.04), 2) AS taxed_price,
               COUNT(*)                                             AS n_total
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-ed aggregates (conditional aggregation)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        _r2(F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")))).alias(
            "taxed_price"
        ),
        F.count("*").alias("n_total"),
    )


@register(
    "agg_approx_distinct",
    # The sketch value itself is engine-specific, so the oracle checks the
    # *contract* instead: HLL++ at rsd=0.01 must land within 5% of the exact
    # count. Spark emits (group, exact, within_tolerance); DuckDB emits the
    # same shape with within_tolerance=TRUE, so the value-hash matches iff
    # the approximation actually honours its error bound.
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               TRUE AS within_tolerance
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the scalable variant of
    COUNT(DISTINCT) for the 100 TB path. Sketch-based, one pass, no shuffle
    of raw values. Driver-checkable via a within-tolerance boolean."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= F.lit(0.05)
        ).alias("within_tolerance"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------
@register(
    "agg_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "grouping"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — hierarchical subtotals (part of the permitted SELECT envelope,
    SURVEY §2C 'grouping sets')."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), _r2(F.sum("l_quantity")).alias("sum_qty")
    )


@register(
    "agg_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "grouping"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@register(
    "agg_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg", "grouping"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k / distinct
# ---------------------------------------------------------------------------
@register(
    "top_k_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    tags=("sort", "limit"),
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY … DESC LIMIT k (reference backend/main.py:747) — planned as
    TakeOrderedAndProject (per-partition top-k, no full sort/shuffle).
    Unique-key tiebreak keeps it deterministic across partitionings."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "distinct_values",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("distinct",),
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (hash-based partial+final dedup)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2B: UNION / INTERSECT / EXCEPT all permitted)
# ---------------------------------------------------------------------------
@register(
    "set_union_all",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.unionAll(b)


@register(
    "set_union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (dedup semantics — DuckDB bare UNION deduplicates; Spark SQL
    matches; the DataFrame union() is bag semantics so we add distinct())."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics, both engines)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "set_except",
    # Orderkeys of non-'F' orders: both operand sets are large and the
    # difference is non-empty at every fixture scale — customer-minus-
    # supplier nationkeys (the previous form) was always the empty set,
    # a vacuous differential check.
    oracle="""
        SELECT o_orderkey FROM orders
        EXCEPT
        SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics, both engines)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey").subtract(
        o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Nesting: CTE / VALUES / derived tables / subqueries (SURVEY §2C nesting)
# ---------------------------------------------------------------------------
@register(
    "cte_query",
    oracle="""
        WITH big_orders AS (
            SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000
        )
        SELECT o_custkey, COUNT(*) AS n_big, ROUND(SUM(o_totalprice), 2) AS total_big
        FROM big_orders
        GROUP BY o_custkey
    """,
    tags=("nesting",),
)
def cte_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH/CTE (permitted statement shape, backend/main.py:36-43;
    pinned by tests/test_sql_validation.py:36-39)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH big_orders AS (
            SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000
        )
        SELECT o_custkey, COUNT(*) AS n_big, ROUND(SUM(o_totalprice), 2) AS total_big
        FROM big_orders
        GROUP BY o_custkey
        """
    )


@register(
    "values_constructor",
    oracle="""
        SELECT t.band_id, t.band_name, COUNT(o.o_orderkey) AS n
        FROM (VALUES (1, 'low'), (2, 'mid'), (3, 'high')) AS t(band_id, band_name)
        LEFT JOIN orders o
          ON (t.band_id = 1 AND o.o_totalprice < 100000)
          OR (t.band_id = 2 AND o.o_totalprice >= 100000 AND o.o_totalprice < 300000)
          OR (t.band_id = 3 AND o.o_totalprice >= 300000)
        GROUP BY t.band_id, t.band_name
    """,
    tags=("nesting",),
)
def values_constructor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES row constructor (permitted shape, backend/main.py:42) joined
    against a table — a small broadcast-able inline dimension."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT t.band_id, t.band_name, COUNT(o.o_orderkey) AS n
        FROM VALUES (1, 'low'), (2, 'mid'), (3, 'high') AS t(band_id, band_name)
        LEFT JOIN orders o
          ON (t.band_id = 1 AND o.o_totalprice < 100000)
          OR (t.band_id = 2 AND o.o_totalprice >= 100000 AND o.o_totalprice < 300000)
          OR (t.band_id = 3 AND o.o_totalprice >= 300000)
        GROUP BY t.band_id, t.band_name
        """
    )


@register(
    "derived_table",
    oracle="""
        SELECT seg, ROUND(AVG(total_spent), 2) AS avg_spent
        FROM (
            SELECT c.c_mktsegment AS seg, c.c_custkey, SUM(o.o_totalprice) AS total_spent
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_mktsegment, c.c_custkey
        ) per_customer
        GROUP BY seg
    """,
    tags=("nesting", "join"),
)
def derived_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-table subquery in FROM (reference backend/main.py:767
    pattern: aggregate over a subquery)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_customer = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(c.c_mktsegment.alias("seg"), c.c_custkey)
        .agg(F.sum("o_totalprice").alias("total_spent"))
    )
    return per_customer.groupBy("seg").agg(_r2(F.avg("total_spent")).alias("avg_spent"))


@register(
    "in_subquery",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
    """,
    tags=("nesting", "subquery"),
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery — planned as a left-semi join."""
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        """
    )


@register(
    "scalar_subquery",
    # ×1.5 keeps thousands of qualifying rows at sf0.01 (×2 exceeded the
    # fixture's max totalprice → empty result → vacuous check).
    oracle="""
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
    """,
    tags=("nesting", "subquery"),
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
        """
    )


@register(
    "exists_correlated",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
    """,
    tags=("nesting", "subquery"),
)
def exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated by Catalyst into a semi join."""
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


# ---------------------------------------------------------------------------
# Array / explode / JSON (SURVEY §2C: UNNEST + string_split; events.props)
# ---------------------------------------------------------------------------
@register(
    "split_explode_wordcount",
    oracle="""
        SELECT word, COUNT(*) AS n
        FROM (
            SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents
        ) words
        WHERE TRIM(word) <> ''
        GROUP BY word
        ORDER BY n DESC, word
        LIMIT 20
    """,
    tags=("array", "explode"),
)
def split_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string_split + UNNEST (reference backend/main.py:767 genres pattern) →
    split + explode in Spark. Classic distributed word count."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.trim(F.col("word")) != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@register(
    "array_functions",
    oracle="""
        SELECT vec_id,
               CAST(LEN(embedding) AS INT)                       AS dim,
               ROUND(CAST(embedding[1] AS DOUBLE), 4)            AS first_elem,
               ROUND(LIST_SUM(CAST(embedding AS DOUBLE[])), 4)   AS vec_sum,
               ROUND(LIST_MAX(CAST(embedding AS DOUBLE[])), 4)   AS vec_max
        FROM embeddings
        WHERE vec_id < 50
    """,
    tags=("array",),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar functions over array<float>: size, 1-based element
    access, higher-order aggregate/max. JVM-side (no Python UDF)."""
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    return e.filter(F.col("vec_id") < 50).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(vec, 1), 4).alias("first_elem"),
        F.round(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.round(F.array_max(vec), 4).alias("vec_max"),
    )


@register(
    "json_extract",
    oracle="""
        SELECT event_type,
               COUNT(*)                                              AS n,
               ROUND(AVG(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)), 2) AS avg_k
        FROM events
        WHERE CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) > 10
        GROUP BY event_type
    """,
    tags=("json",),
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over events.props (FIXTURES.md §3) —
    get_json_object, filter + aggregate on the extracted value."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.filter(k > 10)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), _r2(F.avg(k)).alias("avg_k"))
    )


@register(
    "set_except_all",
    oracle="""
        SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 3
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (bag semantics): duplicates
    survive according to occurrence counts, unlike ``subtract``'s
    set semantics. Both operands repeat l_orderkey per line item, so
    the bag arithmetic is actually exercised."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") <= 3).select("l_orderkey").exceptAll(
        li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    )


@register(
    "set_intersect_all",
    oracle="""
        SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 2
        INTERSECT ALL
        SELECT l_orderkey FROM lineitem WHERE l_quantity > 25
    """,
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection: each key appears
    min(count_left, count_right) times."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linenumber") <= 2)
        .select("l_orderkey")
        .intersectAll(li.filter(F.col("l_quantity") > 25).select("l_orderkey"))
    )


@register(
    "agg_rollup_grouping_id",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "grouping"),
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() indicator columns — the standard way to
    tell a real NULL group key from a subtotal row; required for
    faithful client rendering of hierarchical reports."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count("*").alias("n"),
    )
