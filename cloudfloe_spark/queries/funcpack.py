"""Scalar/aggregate function-pack catalog: operator families inside the
reference's permitted SELECT envelope (reference backend/main.py:36-43 admits
the engine's whole function library; SURVEY.md §2C "scalar string/date/math/
array/map/json function library") that no other catalog module exercises —
min_by/max_by, ordered collect, map construction/lookup, struct-array sort,
extended string/date functions, null-handling forms, ntile/cume_dist, and
correlated LATERAL joins.

Oracle-parity dialect notes (each encoded in the paired SQL):
- DuckDB ``arg_max/arg_min`` ≡ Spark ``max_by/min_by`` (tie-free here:
  c_acctbal is unique per segment in the fixtures).
- DuckDB ``list(x ORDER BY …)`` ≡ Spark ``array_sort(collect_list(…))``.
- DuckDB ``dayofweek`` is 0-based (Sunday=0); Spark's is 1-based.
- DuckDB has no ``initcap``; the oracle emulates it per word.
- DuckDB ``IS NOT DISTINCT FROM`` ≡ Spark ``<=>`` (eqNullSafe).

All shapes are scale-safe: per-group aggregation only, no driver loops, and
the LATERAL entry decorrelates to an aggregate-join (Catalyst
DecorrelateInnerQuery), not per-row subquery execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table


@register(
    "agg_arg_minmax",
    oracle="""
        SELECT c_mktsegment,
               arg_max(c_name, c_acctbal) AS richest_customer,
               arg_min(c_name, c_acctbal) AS poorest_customer,
               ROUND(MAX(c_acctbal), 2) AS max_bal
        FROM customer
        GROUP BY c_mktsegment
    """,
    tags=("agg", "funcpack"),
)
def agg_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin aggregates): the 'which row achieved the
    extreme' pattern without a self-join or window."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_name", "c_acctbal").alias("richest_customer"),
        F.min_by("c_name", "c_acctbal").alias("poorest_customer"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
        SELECT c_nationkey,
               array_to_string(
                   list(DISTINCT c_mktsegment ORDER BY c_mktsegment), '|'
               ) AS segments,
               array_to_string(
                   (list(c_name ORDER BY c_acctbal DESC, c_name))[1:3], '|'
               ) AS top3_names
        FROM customer
        GROUP BY c_nationkey
    """,
    tags=("agg", "array", "funcpack"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: sorted distinct collect + top-3-by-value
    via sort_array over an array of structs (struct comparison sorts by
    field order; negated balance gives DESC with name ASC tie-break).

    Output arrays are joined to '|'-delimited strings on BOTH sides: the
    driver's pandas canonicalizer cannot hash top-level list cells (the
    r02/r03 red-row failure class), and a catalog-wide guard test now
    forbids top-level array/map output columns outright.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias("segments"),
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct((-F.col("c_acctbal")).alias("neg"), "c_name")
                        )
                    ),
                    lambda s: s["c_name"],
                ),
                1,
                3,
            ),
            "|",
        ).alias("top3_names"),
    )


@register(
    "map_functions",
    oracle="""
        WITH counts AS (
            SELECT user_id, event_type, COUNT(*) AS cnt
            FROM events GROUP BY user_id, event_type
        )
        SELECT user_id,
               MAX(CASE WHEN event_type = 'click' THEN cnt END) AS clicks,
               MAX(CASE WHEN event_type = 'purchase' THEN cnt END) AS purchases,
               COUNT(*) AS n_types
        FROM counts
        GROUP BY user_id
    """,
    tags=("map", "funcpack"),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + lookup: per-user event_type→count map built with
    map_from_entries(collect_list(struct)), probed with element_at (NULL for
    absent keys) and sized with map_keys. The map stays executor-side; the
    compared output is scalar."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    maps = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    return maps.select(
        "user_id",
        F.element_at("m", "click").alias("clicks"),
        F.element_at("m", "purchase").alias("purchases"),
        F.size(F.map_keys("m")).cast("bigint").alias("n_types"),
    )


@register(
    "string_functions_2",
    oracle="""
        SELECT p_partkey,
               levenshtein(p_name, 'red widget') AS edit_dist,
               translate(p_brand, '#', '-') AS brand_dashed,
               lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
               strpos(p_name, ' ') AS space_pos,
               reverse(p_type) AS type_reversed,
               repeat('*', p_size % 5) AS stars,
               ARRAY_TO_STRING(
                   LIST_TRANSFORM(STRING_SPLIT(p_name, ' '),
                       w -> UPPER(SUBSTRING(w, 1, 1)) || SUBSTRING(w, 2)),
                   ' ') AS name_title
        FROM part
        WHERE p_partkey <= 50
    """,
    tags=("string", "funcpack"),
)
def string_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string functions: levenshtein, translate, lpad, instr,
    reverse, repeat, initcap (DuckDB lacks initcap — the oracle emulates it
    word-wise, which also pins the exact capitalization semantics)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") <= 50).select(
        "p_partkey",
        F.levenshtein("p_name", F.lit("red widget")).alias("edit_dist"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.instr("p_name", " ").alias("space_pos"),
        F.reverse("p_type").alias("type_reversed"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5)).alias("stars"),
        F.initcap("p_name").alias("name_title"),
    )


@register(
    "datetime_functions_2",
    oracle="""
        SELECT o_orderkey,
               CAST(last_day(o_orderdate) AS DATE) AS month_end,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
               CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo,
               CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT)
                   AS days_to_2002,
               make_date(CAST(EXTRACT(year FROM o_orderdate) AS INT),
                         CAST(EXTRACT(month FROM o_orderdate) AS INT), 1)
                   AS month_start
        FROM orders
        WHERE o_orderkey <= 200
    """,
    tags=("datetime", "funcpack"),
)
def datetime_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic beyond date_trunc: last_day, quarter, ISO week,
    day-of-week (Spark 1-based vs DuckDB 0-based — pinned in the oracle),
    month-clamped add_months, datediff, make_date."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") <= 200).select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.add_months("o_orderdate", 3).alias("plus3mo"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).alias(
            "month_start"
        ),
    )


@register(
    "null_handling",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               COUNT(NULLIF(l_discount, 0.0)) AS n_discounted,
               CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0)
                                  IS NOT DISTINCT FROM NULLIF(l_tax, 0.0)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_same_nullsafe,
               ROUND(AVG(COALESCE(NULLIF(l_discount, 0.0), 0.05)), 6)
                   AS avg_disc_defaulted
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("null", "funcpack"),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling forms: NULLIF to introduce nulls, COUNT(col) vs
    COUNT(*) skipping them, null-safe equality (<=> ≡ IS NOT DISTINCT FROM),
    and COALESCE defaulting inside an aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    nd = F.nullif("l_discount", F.lit(0.0))
    nt = F.nullif("l_tax", F.lit(0.0))
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count(nd).alias("n_discounted"),
        F.sum(F.when(nd.eqNullSafe(nt), 1).otherwise(0)).alias("n_same_nullsafe"),
        F.round(F.avg(F.coalesce(nd, F.lit(0.05))), 6).alias("avg_disc_defaulted"),
    )


@register(
    "window_ntile_cume",
    oracle="""
        WITH ranked AS (
            SELECT l_returnflag,
                   ntile(4) OVER w AS quartile,
                   cume_dist() OVER w AS cd,
                   percent_rank() OVER w AS pr
            FROM lineitem
            WINDOW w AS (PARTITION BY l_returnflag
                         ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        )
        SELECT l_returnflag, quartile,
               COUNT(*) AS n,
               ROUND(MAX(cd), 6) AS max_cume_dist,
               ROUND(MAX(pr), 6) AS max_pct_rank
        FROM ranked
        GROUP BY l_returnflag, quartile
    """,
    tags=("window", "funcpack"),
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile quartiles, cume_dist,
    percent_rank over a deterministic (unique-key-extended) ordering,
    summarized per bucket so the compared output stays small."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = li.select(
        "l_returnflag",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
    )
    return ranked.groupBy("l_returnflag", "quartile").agg(
        F.count("*").alias("n"),
        F.round(F.max("cd"), 6).alias("max_cume_dist"),
        F.round(F.max("pr"), 6).alias("max_pct_rank"),
    )


@register(
    "lateral_correlated_agg",
    oracle="""
        SELECT r.r_name, agg.n_nations, agg.n_customers
        FROM region r,
        LATERAL (
            SELECT COUNT(DISTINCT n.n_nationkey) AS n_nations,
                   COUNT(c.c_custkey) AS n_customers
            FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
        ) agg
    """,
    tags=("join", "subquery", "funcpack"),
)
def lateral_correlated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL aggregate join (Spark SQL LATERAL subquery) —
    Catalyst decorrelates it to an aggregate + outer join, so it runs as a
    set-based plan, not per-row re-execution."""
    for t in ("region", "nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"cf_{t}")
    return spark.sql(
        """
        SELECT r.r_name, agg.n_nations, agg.n_customers
        FROM cf_region r,
        LATERAL (
            SELECT COUNT(DISTINCT n.n_nationkey) AS n_nations,
                   COUNT(c.c_custkey) AS n_customers
            FROM cf_nation n LEFT JOIN cf_customer c
              ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
        ) agg
        """
    )


@register(
    "regexp_extract_all_words",
    oracle="""
        WITH caps AS (
            SELECT doc_id, regexp_extract_all(text, '[a-z]{7,}') AS long_words
            FROM documents
        )
        SELECT doc_id,
               CAST(LEN(long_words) AS INT) AS n_long,
               ARRAY_TO_STRING(long_words[1:3], ',') AS first3
        FROM caps
        WHERE LEN(long_words) > 0
    """,
    tags=("string", "regex", "funcpack"),
)
def regexp_extract_all_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: pull every ≥7-letter word per document, count and
    preview — the multi-match regex form (single-match regexp_extract is
    covered by string_like_regexp)."""
    d = load_table(spark, sf_dir, "documents")
    caps = d.select(
        "doc_id",
        F.regexp_extract_all("text", F.lit("[a-z]{7,}"), 0).alias("long_words"),
    )
    return caps.filter(F.size("long_words") > 0).select(
        "doc_id",
        F.size("long_words").alias("n_long"),
        F.concat_ws(",", F.slice("long_words", 1, 3)).alias("first3"),
    )


@register(
    "agg_histogram_buckets",
    oracle="""
        SELECT CAST(LEAST(FLOOR(l_extendedprice / 5000) + 1, 11) AS BIGINT)
                   AS bucket,
               COUNT(*) AS n,
               ROUND(MIN(l_extendedprice), 2) AS lo,
               ROUND(MAX(l_extendedprice), 2) AS hi
        FROM lineitem
        GROUP BY CAST(LEAST(FLOOR(l_extendedprice / 5000) + 1, 11) AS BIGINT)
    """,
    tags=("agg", "histogram", "funcpack"),
)
def agg_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram via width_bucket (10 buckets over [0, 50000);
    values ≥ max land in the overflow bucket n+1 = 11, which the oracle's
    clamped floor arithmetic pins since DuckDB lacks width_bucket).
    Single partial-aggregating shuffle — the standard distributed histogram."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.width_bucket("l_extendedprice", F.lit(0.0), F.lit(50000.0), F.lit(10))
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
    )


@register(
    "agg_bitwise",
    oracle="""
        SELECT l_returnflag,
               CAST(bit_or(l_linenumber) AS INT)  AS flags_or,
               CAST(bit_and(l_linenumber) AS INT) AS flags_and,
               CAST(bit_xor(l_linenumber) AS INT) AS flags_xor
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "bitwise", "funcpack"),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (OR/AND/XOR) — flag-mask folding; all three are
    mergeable, so they partial-aggregate map-side like sum/min/max."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_or("l_linenumber").alias("flags_or"),
        F.bit_and("l_linenumber").alias("flags_and"),
        F.bit_xor("l_linenumber").alias("flags_xor"),
    )


@register(
    "group_by_all_sugar",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
    """,
    tags=("sql-sugar", "funcpack"),
)
def group_by_all_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL dialect sugar — DuckDB-corpus queries
    using the shorthand run unchanged in Spark SQL (both engines expand to
    the non-aggregate select columns)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("cf_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM cf_orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "try_arithmetic_safe_nulls",
    # Spark's try_* family returns NULL instead of raising under ANSI mode
    # (division by zero, overflow); DuckDB mirrors with NULLIF guards.
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice / NULLIF(l_quantity, 0.0), 6) AS unit_price,
               ROUND(l_discount / NULLIF(l_tax, 0.0), 4) AS disc_per_tax
        FROM lineitem
        WHERE l_orderkey % 97 = 0
    """,
    tags=("funcpack", "ansi"),
)
def try_arithmetic_safe_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: ``try_divide`` yields NULL on division by
    zero instead of failing the job — the behavior a pipeline needs when a
    denominator column can legally hold zeros. Pure projection, zero
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 97 == 0
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide(F.col("l_extendedprice"), F.col("l_quantity")), 6).alias(
            "unit_price"
        ),
        F.round(F.try_divide(F.col("l_discount"), F.col("l_tax")), 4).alias(
            "disc_per_tax"
        ),
    )


@register(
    "mask_sensitive_strings",
    # Spark's mask() maps upper→X lower→x digit→n; DuckDB reproduces with
    # chained regexp_replace over the same classes.
    oracle="""
        SELECT c_custkey,
               REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                   c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
                   '[0-9]', 'n', 'g') AS masked_name
        FROM customer
        WHERE c_custkey % 101 = 0
    """,
    tags=("funcpack", "pii"),
)
def mask_sensitive_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in data masking (`mask`): structure-preserving redaction of
    identifier strings (upper→X, lower→x, digit→n) — the lightweight
    alternative to dropping a column when downstream needs format
    validation but not values."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 101 == 0
    )
    return c.select(
        "c_custkey", F.mask(F.col("c_name")).alias("masked_name")
    )


@register(
    "agg_median_mode",
    oracle="""
        WITH counts AS (
            SELECT l_returnflag, l_quantity, COUNT(*) AS c
            FROM lineitem
            GROUP BY l_returnflag, l_quantity
        ), modes AS (
            SELECT l_returnflag,
                   ARG_MAX(l_quantity, c * 1000000.0 - l_quantity) AS mode_qty
            FROM counts
            GROUP BY l_returnflag
        )
        SELECT m.l_returnflag,
               ROUND(MEDIAN(li.l_quantity), 6) AS median_qty,
               ROUND(ANY_VALUE(m.mode_qty), 6) AS mode_qty
        FROM lineitem li
        JOIN modes m ON li.l_returnflag = m.l_returnflag
        GROUP BY m.l_returnflag
    """,
    tags=("agg", "funcpack"),
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median + deterministic modal value per group. Spark's ``mode()`` is
    non-deterministic on ties, so the mode is built explicitly: per-value
    counts, then ``max_by`` on the scalar key ``c·10⁶ − value`` (highest
    count wins; ties break to the SMALLEST value) — the same arithmetic
    the DuckDB oracle uses, so both engines agree exactly.

    Scale: two-level aggregation (value-counts partial-aggregate
    map-side; per-group argmax over the tiny distinct-value set), median
    via percentile over the group — no windows, no self-joins beyond the
    25-row mode dim join (broadcast by stats)."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("c")
    )
    modes = counts.groupBy("l_returnflag").agg(
        F.max_by(
            "l_quantity", F.col("c") * 1000000.0 - F.col("l_quantity")
        ).alias("mode_qty")
    )
    med = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty")
    )
    return med.join(modes, "l_returnflag").select(
        "l_returnflag",
        "median_qty",
        F.round("mode_qty", 6).alias("mode_qty"),
    )


@register(
    "agg_count_if_bools",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT_IF(o_totalprice > 150000) AS BIGINT) AS n_big,
               BOOL_AND(o_totalprice > 0) AS all_positive,
               CAST(MAX(CASE WHEN o_orderkey = grp_min THEN o_orderstatus END)
                    AS VARCHAR) AS first_status
        FROM (
            SELECT *, MIN(o_orderkey) OVER (PARTITION BY o_orderpriority)
                          AS grp_min
            FROM orders
        )
        GROUP BY o_orderpriority
    """,
    tags=("agg", "funcpack"),
)
def agg_count_if_bools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-count + boolean aggregates: count_if, bool_and, and a
    DETERMINISTIC any_value stand-in (the value carried by each group's
    minimum key — Spark's any_value/first are non-deterministic across
    partitions, so both engines pin the same representative row)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    keyed = o.withColumn("grp_min", F.min("o_orderkey").over(w))
    return keyed.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.max(
            F.when(F.col("o_orderkey") == F.col("grp_min"), F.col("o_orderstatus"))
        ).alias("first_status"),
    )


@register(
    "agg_approx_percentile_contract",
    # Like agg_approx_distinct: the sketch value is engine-specific, so
    # the oracle states the CONTRACT — approx_percentile at accuracy
    # 10000 must land within 1% (relative) of the exact percentile.
    oracle="""
        SELECT l_returnflag,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS exact_p50,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 6) AS exact_p99,
               TRUE AS p50_within_tol,
               TRUE AS p99_within_tol
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_percentile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the 100-TB percentile path (one pass, bounded
    sketch memory, no per-group sort), driver-checked by CONTRACT: the
    approximation must land within 1% of the exact per-group p50/p99,
    and the exact values themselves hash-compare against DuckDB's
    QUANTILE_CONT. Exact percentiles over a 100-TB group require the
    group's values materialized; the sketch is what actually ships."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("e50"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("e99"),
        F.expr(
            "approx_percentile(l_extendedprice, 0.5, 10000)"
        ).alias("a50"),
        F.expr(
            "approx_percentile(l_extendedprice, 0.99, 10000)"
        ).alias("a99"),
    )
    tol = 0.01
    return agg.select(
        "l_returnflag",
        # round 6, not 2: cent-valued inputs make interpolated medians
        # land EXACTLY on .xx5 — a 2-decimal round sits on the half
        # boundary and the engines' last-ulp difference flips it
        F.round("e50", 6).alias("exact_p50"),
        F.round("e99", 6).alias("exact_p99"),
        (F.abs(F.col("a50") - F.col("e50")) / F.col("e50") <= tol).alias(
            "p50_within_tol"
        ),
        (F.abs(F.col("a99") - F.col("e99")) / F.col("e99") <= tol).alias(
            "p99_within_tol"
        ),
    )


@register(
    "agg_hll_mergeability_contract",
    # Like agg_approx_distinct: sketch bytes are engine-specific, so the
    # oracle states the CONTRACT — the month estimate obtained by UNION-
    # MERGING the per-day sketches (never re-reading rows) must land
    # within 5% of the exact month distinct, whose value hash-compares.
    oracle="""
        SELECT CAST(DATE_TRUNC('month', ts) AS DATE) AS month,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS merged_within_tol
        FROM events
        GROUP BY month
    """,
    tags=("agg", "approx", "sketch"),
)
def agg_hll_mergeability_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog sketch MERGEABILITY — the property that makes distinct
    counting feasible at 100 TB: per-day HLL sketches (Datasketches,
    lgConfigK=14) are union-merged into month estimates WITHOUT re-reading
    any row, and the contract asserts the merged estimate lands within 5%
    of the exact month distinct. This is the incremental-rollup pattern
    (store day sketches, serve any ad-hoc period by merging) that exact
    COUNT DISTINCT cannot do — it is not re-aggregable from day results.

    Scale shape: one pass builds all day sketches map-side-combinably;
    the merge shuffles |days| sketch rows, never data. The exact distinct
    exists here only as the yardstick."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("month", "ts")).alias("month"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("month", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    merged = daily.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    exact = ev.groupBy("month").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users")
    )
    tol = 0.05
    return exact.join(merged, "month").select(
        "month",
        "exact_users",
        (
            F.abs(F.col("merged_est") - F.col("exact_users"))
            / F.col("exact_users")
            <= tol
        ).alias("merged_within_tol"),
    )
