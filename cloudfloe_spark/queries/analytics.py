"""Analytics-surface operators: ordered string aggregation, QUALIFY-style
latest-row dedup, date-spine gap filling, and growth-rate windows.

These are the reporting shapes a warehouse user runs daily on the reference
(`SELECT`-only envelope, backend/main.py:419-447 executes arbitrary
read-only SQL) that were not yet first-class catalog entries. Each is a
(Spark DataFrame program, DuckDB oracle) pair per FIXTURES.md §4: identical
aliases, BIGINT casts on integer aggregates, rounded doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table


@register(
    "string_agg_ordered",
    oracle="""
        SELECT r_name,
               CAST(COUNT(*) AS BIGINT) AS n_nations,
               STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    tags=("agg", "analytics"),
)
def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered string aggregation (LISTAGG/STRING_AGG with
    ORDER BY): collect → array_sort → array_join, so the concatenation
    order is well-defined regardless of partitioning.

    Scale: collect_list is bounded per group here (nations per region);
    at scale an unordered STRING_AGG over an unbounded group is an
    anti-pattern in any engine — the sort-before-join form at least keeps
    the nondeterminism out. One groupBy shuffle on the grouping key."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
        )
        .select("r_name", "n_nations", "nations")
    )


@register(
    "qualify_latest_order",
    oracle="""
        SELECT o_custkey,
               o_orderkey AS latest_orderkey,
               o_orderdate AS latest_orderdate,
               ROUND(o_totalprice, 2) AS latest_price
        FROM orders
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC
        ) = 1
    """,
    tags=("window", "analytics"),
)
def qualify_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key dedup (the QUALIFY idiom; DuckDB spells it
    QUALIFY, Spark spells it window + filter — same plan shape).

    Scale: rank-1 predicate on a row_number window lets Spark rewrite to
    WindowGroupLimit — a per-partition running top-1 that never
    materializes full per-key sort runs. One shuffle on o_custkey."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
            F.round("o_totalprice", 2).alias("latest_price"),
        )
    )


@register(
    "date_spine_gapfill",
    oracle="""
        WITH spine AS (
            SELECT CAST(UNNEST(GENERATE_SERIES(
                DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY
            )) AS DATE) AS day
        ),
        daily AS (
            SELECT o_orderdate AS day,
                   ROUND(SUM(o_totalprice), 2) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
            GROUP BY o_orderdate
        )
        SELECT s.day,
               COALESCE(d.revenue, 0.0) AS revenue,
               CAST(COALESCE(d.n_orders, 0) AS BIGINT) AS n_orders
        FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    tags=("analytics", "spine"),
)
def date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill: a generated calendar (sequence + explode) left
    joined against daily revenue, zero-filling days with no orders — the
    canonical time-series densification every reporting layer needs.

    Scale: the fact scan is filtered to the window BEFORE aggregating
    (predicate reaches the parquet scan); the post-agg daily frame is
    bounded by |days| so it broadcasts — the 90-row spine join never
    shuffles the fact table a second time."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.filter(
            F.col("o_orderdate").between("1995-01-01", "1995-03-31")
        )
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-03-31").cast("date"),
            )
        ).alias("day")
    )
    return spine.join(F.broadcast(daily), "day", "left").select(
        "day",
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
    )


@register(
    "monthly_growth_rate",
    oracle="""
        WITH m AS (
            SELECT DATE_TRUNC('month', o_orderdate) AS month,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders
            GROUP BY 1
        )
        SELECT CAST(month AS DATE) AS month, revenue,
               ROUND(
                   (revenue - LAG(revenue) OVER (ORDER BY month))
                   / LAG(revenue) OVER (ORDER BY month) * 100.0, 4
               ) AS growth_pct
        FROM m
    """,
    tags=("window", "analytics"),
)
def monthly_growth_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth: monthly rollup then a LAG window over the
    month axis. Revenue is rounded BEFORE the ratio so both engines divide
    identical operands (float summation order differs otherwise).

    Scale: the unpartitioned window runs over the aggregated monthly
    frame — |months| rows, bounded by the calendar, not the data. The fact
    table sees exactly one map-side-combined groupBy shuffle; the
    single-partition window sort is over ~100 rows and is free."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.trunc("o_orderdate", "month").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        F.round((F.col("revenue") - prev) / prev * 100.0, 4).alias(
            "growth_pct"
        ),
    )


@register(
    "orders_pareto_deciles",
    oracle="""
        WITH rev AS (
            SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS rev
            FROM orders GROUP BY o_custkey
        ),
        bounds AS (
            SELECT QUANTILE_CONT(rev, [0.1, 0.2, 0.3, 0.4, 0.5,
                                       0.6, 0.7, 0.8, 0.9]) AS bs
            FROM rev
        ),
        assigned AS (
            SELECT r.o_custkey, r.rev,
                   1 + LEN(LIST_FILTER(b.bs, x -> r.rev > x)) AS decile
            FROM rev r CROSS JOIN bounds b
        ),
        tot AS (SELECT ROUND(SUM(rev), 2) AS total FROM rev)
        SELECT a.decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(SUM(a.rev), 2) AS revenue,
               ROUND(ROUND(SUM(a.rev), 2) / ANY_VALUE(t.total), 6) AS share
        FROM assigned a CROSS JOIN tot t
        GROUP BY a.decile
    """,
    tags=("analytics", "window"),
)
def orders_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration report: customers bucketed into revenue
    deciles (exact percentile bounds), with each decile's share of total
    revenue — the 80/20 question every revenue dashboard answers.

    Scale shape — deliberately NOT a global ranking window: a running
    cum-share over all customers needs a single-partition sort of the
    whole per-customer frame. Instead the decile BOUNDS are one bounded
    percentile aggregate (1 row, broadcast), assignment is a zero-shuffle
    comparison projection, and shares reuse one more 1-row total — the
    same plan shape at 1000× the customers."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    bounds = rev.agg(
        F.percentile(
            "rev",
            F.array(*[F.lit(p / 10.0) for p in range(1, 10)]),
        ).alias("bs")
    )
    tot = rev.agg(F.round(F.sum("rev"), 2).alias("total"))
    assigned = rev.crossJoin(F.broadcast(bounds)).select(
        "rev",
        (
            F.lit(1)
            + F.size(F.filter("bs", lambda x: F.col("rev") > x))
        ).alias("decile"),
    )
    return (
        assigned.groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "revenue",
            F.round(F.col("revenue") / F.col("total"), 6).alias("share"),
        )
    )


@register(
    "agg_decimal_exact_sum",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                          AS DOUBLE), 2) AS sum_price,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                          AS DOUBLE) / COUNT(*), 4) AS avg_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "decimal", "analytics"),
)
def agg_decimal_exact_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent exact aggregation via DECIMAL: doubles summed in
    task order drift in the last bits run-to-run and engine-to-engine;
    casting to DECIMAL(18,4) first makes the sum EXACT (integer
    arithmetic under the hood), so any partitioning, any engine, any
    retry produces the identical answer — the money-column aggregation
    rule.

    Scale: decimal sums partial-aggregate map-side exactly like longs
    (Spark accumulates in an unscaled 128-bit value); the plan is the
    same one-shuffle hash aggregate as a double sum."""
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,4)")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(dec).cast("double"), 2).alias("sum_price"),
        F.round(
            F.sum(dec).cast("double") / F.count("*"), 4
        ).alias("avg_price"),
    )


@register(
    "customer_rfm_segments",
    oracle="""
        WITH anchor AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
        rfm AS (
            SELECT o_custkey,
                   DATEDIFF('day', MAX(o_orderdate), ANY_VALUE(a.maxd))
                       AS recency_days,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   ROUND(SUM(o_totalprice), 2) AS monetary
            FROM orders CROSS JOIN anchor a
            GROUP BY o_custkey
        ),
        scored AS (
            SELECT o_custkey, monetary,
                   NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey) AS r,
                   NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f,
                   NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m
            FROM rfm
        )
        SELECT r, f, m,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(SUM(monetary), 2) AS total_monetary
        FROM scored
        GROUP BY r, f, m
    """,
    tags=("analytics", "segmentation"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (Hughes 1994, the retention-marketing standard):
    per-customer Recency (days since last order, anchored to the dataset's
    max date so the result is reproducible), Frequency (order count), and
    Monetary (total spend), each cut into quintiles; output is the
    125-cell segment matrix with counts and revenue. NTILE orderings are
    made TOTAL with the customer key so quintile boundaries are identical
    on both engines.

    Scale shape: one fact scan + one customer-keyed aggregate; the anchor
    date is a 1-row cross-joined frame. The three NTILEs are global sorts
    over the CUSTOMER aggregate (one row per customer, orders of
    magnitude smaller than the fact table) — at 100 TB that frame is
    range-partitioned by the window sort, the standard distributed
    quantile path; the final segment rollup is map-side-combinable on a
    125-key space."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("maxd"))
    rfm = (
        o.crossJoin(anchor)
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.any_value("maxd"), F.max("o_orderdate")).alias(
                "recency_days"
            ),
            F.count("*").cast("bigint").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    scored = rfm.select(
        "o_custkey",
        "monetary",
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey")))
        .alias("r"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency").desc(), F.col("o_custkey")))
        .alias("f"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary").desc(), F.col("o_custkey")))
        .alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.round(F.sum("monetary"), 2).alias("total_monetary"),
    )


_BASKET_MIN_SUPPORT = 3


@register(
    "basket_pair_lift",
    oracle=f"""
        WITH pl AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ),
        nb AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_baskets FROM pl),
        supp AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS s FROM pl GROUP BY pk),
        pairs AS (
            SELECT a.pk AS item_a, b.pk AS item_b,
                   CAST(COUNT(*) AS BIGINT) AS pair_support
            FROM pl a JOIN pl b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY a.pk, b.pk
            HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT}
        )
        SELECT p.item_a, p.item_b, p.pair_support,
               ROUND(CAST(p.pair_support AS DOUBLE) / sa.s, 4) AS confidence,
               ROUND(CAST(p.pair_support AS DOUBLE) * nb.n_baskets
                     / (sa.s * sb.s), 4) AS lift
        FROM pairs p
        JOIN supp sa ON p.item_a = sa.pk
        JOIN supp sb ON p.item_b = sb.pk
        CROSS JOIN nb
    """,
    tags=("analytics", "basket"),
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (Agrawal & Srikant 1994, a-priori
    support pruning): item-pair support, confidence P(b|a), and lift
    support(a,b)·N / (support(a)·support(b)) over order baskets, reported
    for pairs co-purchased in >= {3} orders. Lift > 1 = genuinely
    associated items, the recommender/affinity primitive.

    Scale shape: the within-basket pair expansion is keyed on the order id
    and bounded by basket size (<= 7 lines in TPC-H — linear in the fact
    table, never quadratic in the catalog); pair support is a map-side
    combinable count; the two item-support joins key on the item (AQE
    broadcasts the item-support side when it fits); the basket total is a
    1-row cross-joined frame. The support floor is the a-priori prune that
    keeps the pair table from exploding at 100 TB."""
    pl = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    nb = pl.agg(F.count_distinct("ok").cast("bigint").alias("n_baskets"))
    supp = pl.groupBy("pk").agg(F.count("*").cast("bigint").alias("s"))
    a = pl.alias("a")
    b = pl.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("item_a"), F.col("b.pk").alias("item_b"))
        .agg(F.count("*").cast("bigint").alias("pair_support"))
        .filter(F.col("pair_support") >= _BASKET_MIN_SUPPORT)
    )
    sa = supp.select(F.col("pk").alias("item_a"), F.col("s").alias("s_a"))
    sb = supp.select(F.col("pk").alias("item_b"), F.col("s").alias("s_b"))
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .crossJoin(nb)
        .select(
            "item_a",
            "item_b",
            "pair_support",
            F.round(F.col("pair_support").cast("double") / F.col("s_a"), 4).alias(
                "confidence"
            ),
            F.round(
                F.col("pair_support").cast("double")
                * F.col("n_baskets")
                / (F.col("s_a") * F.col("s_b")),
                4,
            ).alias("lift"),
        )
    )


@register(
    "customer_revenue_gini",
    oracle="""
        WITH rev AS (
            SELECT o_custkey, SUM(o_totalprice) AS x
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT x,
                   ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i,
                   COUNT(*) OVER () AS n,
                   SUM(x) OVER () AS t
            FROM rev
        )
        SELECT ROUND(2.0 * SUM(i * x) / (ANY_VALUE(n) * ANY_VALUE(t))
                     - (ANY_VALUE(n) + 1.0) / ANY_VALUE(n), 6) AS gini,
               CAST(ANY_VALUE(n) AS BIGINT) AS n_customers,
               ROUND(ANY_VALUE(t), 2) AS total_revenue
        FROM ranked
    """,
    tags=("analytics", "stats"),
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration via the
    rank-weighted closed form G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n over
    ascending-sorted revenues (ties broken by customer key) — the
    one-number inequality summary behind "top 1% of customers drive X%"
    dashboards, complementing the Pareto-decile view.

    Scale shape: the rank runs over the CUSTOMER aggregate (one row per
    customer — range-partitioned sort at scale, same as the RFM NTILEs);
    n and Σx ride along as unbounded-frame window totals computed in the
    same pass; the final reduction is a 1-row aggregate."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("x"))
    wr = Window.orderBy(F.col("x"), F.col("o_custkey"))
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = rev.select(
        "x",
        F.row_number().over(wr).alias("i"),
        F.count("*").over(wall).alias("n"),
        F.sum("x").over(wall).alias("t"),
    )
    return ranked.agg(
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x"))
            / (F.any_value("n") * F.any_value("t"))
            - (F.any_value("n") + 1.0) / F.any_value("n"),
            6,
        ).alias("gini"),
        F.any_value("n").cast("bigint").alias("n_customers"),
        F.round(F.any_value("t"), 2).alias("total_revenue"),
    )


@register(
    "segment_repeat_purchase_rate",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_mktsegment, o.o_custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment, o.o_custkey
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_buyers,
               CAST(COUNT(*) FILTER (n_orders >= 2) AS BIGINT)
                   AS n_repeat_buyers,
               ROUND(CAST(COUNT(*) FILTER (n_orders >= 2) AS DOUBLE)
                     / COUNT(*), 4) AS repeat_rate,
               ROUND(AVG(n_orders), 4) AS avg_orders_per_buyer
        FROM per_cust
        GROUP BY c_mktsegment
    """,
    tags=("analytics", "retention"),
)
def segment_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate per market segment: the share of buyers with
    two or more orders, plus average orders per buyer — the retention KPI
    that sits next to the RFM matrix on every commerce dashboard.

    Scale shape: one fact aggregation keyed on the customer, a dimension
    join AQE broadcasts when it fits (hint-free: customer is unbounded),
    and a map-side-combinable rollup onto the 5-segment axis."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    per_cust = (
        o.groupBy("o_custkey")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .join(c, "o_custkey")
    )
    return per_cust.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_buyers"),
        F.sum((F.col("n_orders") >= 2).cast("bigint")).cast("bigint").alias(
            "n_repeat_buyers"
        ),
        F.round(
            F.sum((F.col("n_orders") >= 2).cast("double")) / F.count("*"), 4
        ).alias("repeat_rate"),
        F.round(F.avg("n_orders"), 4).alias("avg_orders_per_buyer"),
    )


@register(
    "priority_mix_drift_kl",
    oracle="""
        WITH m AS (
            SELECT DATE_TRUNC('month', o_orderdate) AS month,
                   o_orderpriority AS p, CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY month, p
        ),
        mt AS (SELECT month, SUM(c) AS t FROM m GROUP BY month),
        g AS (SELECT p, SUM(c) AS gc FROM m GROUP BY p),
        gt AS (SELECT SUM(gc) AS gt FROM g)
        SELECT m.month,
               ROUND(SUM((m.c / mt.t) * LOG2((m.c / mt.t) / (g.gc / gt.gt))),
                     6) AS kl_bits,
               CAST(ANY_VALUE(mt.t) AS BIGINT) AS n_orders
        FROM m JOIN mt USING (month) JOIN g USING (p) CROSS JOIN gt
        GROUP BY m.month
    """,
    tags=("analytics", "drift"),
)
def priority_mix_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per-month KL divergence (bits) of the
    order-priority mix against the all-time mix — the data-drift alarm a
    pipeline puts on any categorical column (a month whose mix diverges
    from baseline signals an upstream change long before row counts
    move). Every category occurs in every month of this fixture, so the
    divergence is finite on both engines.

    Scale shape: one (month, category) rollup off the fact scan; the
    global mix and totals are category-sized frames joined back
    (broadcast-sized); the KL fold is map-side-combinable per month."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        # to_date: Spark date_trunc yields TIMESTAMP, the oracle's DATE
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"),
        F.col("o_orderpriority").alias("p"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    mt = m.groupBy("month").agg(F.sum("c").alias("t"))
    g = m.groupBy("p").agg(F.sum("c").alias("gc"))
    gt = g.agg(F.sum("gc").alias("gt"))
    pm = F.col("c") / F.col("t")
    pg = F.col("gc") / F.col("gt")
    return (
        m.join(mt, "month")
        .join(g, "p")
        .crossJoin(gt)
        .groupBy("month")
        .agg(
            F.round(F.sum(pm * F.log2(pm / pg)), 6).alias("kl_bits"),
            F.any_value("t").cast("bigint").alias("n_orders"),
        )
    )


@register(
    "nation_supplier_hhi",
    oracle="""
        WITH rev AS (
            SELECT s.s_nationkey, l.l_suppkey,
                   SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY s.s_nationkey, l.l_suppkey
        ),
        tot AS (SELECT s_nationkey, SUM(r) AS t FROM rev GROUP BY s_nationkey)
        SELECT n.n_name AS nation,
               ROUND(SUM(POWER(rev.r / tot.t, 2)) * 10000, 2) AS hhi,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM rev
        JOIN tot USING (s_nationkey)
        JOIN nation n ON n.n_nationkey = rev.s_nationkey
        GROUP BY n.n_name
    """,
    tags=("analytics", "concentration"),
)
def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation (sum of squared market shares × 10000, the antitrust scale:
    under 1500 competitive, over 2500 concentrated) — the market-power
    companion to the Gini coefficient, answering "how few suppliers own
    this nation's volume".

    Scale shape: one supplier-keyed revenue aggregate off the fact scan;
    nation totals re-aggregate the supplier frame (orders smaller); the
    bounded nation dim broadcasts; the HHI fold is one squared-share sum
    per nation."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("r")
        )
        .join(sup, "l_suppkey")
    )
    tot = rev.groupBy("s_nationkey").agg(F.sum("r").alias("t"))
    return (
        rev.join(tot, "s_nationkey")
        .join(F.broadcast(nat), "s_nationkey")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.pow(F.col("r") / F.col("t"), 2)) * 10000, 2).alias(
                "hhi"
            ),
            F.count("*").cast("bigint").alias("n_suppliers"),
        )
    )


_AUC_BIN = 100  # dollars per score bin


@register(
    "quality_auc_returns",
    oracle=f"""
        WITH scored AS (
            SELECT CAST(FLOOR(l_extendedprice / {_AUC_BIN}) AS BIGINT) AS bin,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
            FROM lineitem
        ),
        per_bin AS (
            SELECT bin,
                   CAST(COUNT(*) AS DOUBLE) AS cnt,
                   CAST(SUM(pos) AS DOUBLE) AS npos
            FROM scored GROUP BY bin
        ),
        ranked AS (
            SELECT bin, cnt, npos,
                   COALESCE(SUM(cnt) OVER (
                       ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) + (cnt + 1) / 2 AS midrank
            FROM per_bin
        ),
        tot AS (
            SELECT SUM(npos) AS p, SUM(cnt) - SUM(npos) AS q,
                   SUM(npos * midrank) AS rsum
            FROM ranked
        )
        SELECT ROUND((rsum - p * (p + 1) / 2) / (p * q), 6) AS auc,
               CAST(p AS BIGINT) AS n_pos, CAST(q AS BIGINT) AS n_neg
        FROM tot
    """,
    tags=("analytics", "eval"),
)
def quality_auc_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of line price as a predictor of the return flag, via the
    Mann-Whitney rank-sum identity over BINNED scores (${100} bins) with
    midrank tie handling — the eval-harness shape for any model/quality
    score at corpus scale (e.g. does the text quality score actually
    separate kept from dropped documents?).

    Scale shape — why binned: exact AUC needs a GLOBAL rank, and a global
    window in Spark is a single-partition sort (the one shape that cannot
    scale). Binning first reduces the axis to |bins| rows: one map-side-
    combinable groupBy(bin) over the corpus, then the running-count window
    runs over thousands of bins, not billions of rows. The binned AUC is
    the exact AUC of the binned score — the standard production trade
    (finer bins → tighter bound), not an uncontrolled approximation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") / _AUC_BIN).cast("bigint").alias("bin"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("pos"),
    )
    per_bin = li.groupBy("bin").agg(
        F.count("*").cast("double").alias("cnt"),
        F.sum("pos").cast("double").alias("npos"),
    )
    w = (
        Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_bin.select(
        "npos",
        "cnt",
        (
            F.coalesce(F.sum("cnt").over(w), F.lit(0.0))
            + (F.col("cnt") + 1) / 2
        ).alias("midrank"),
    )
    return ranked.agg(
        F.round(
            (
                F.sum(F.col("npos") * F.col("midrank"))
                - F.sum("npos") * (F.sum("npos") + 1) / 2
            )
            / (F.sum("npos") * (F.sum("cnt") - F.sum("npos"))),
            6,
        ).alias("auc"),
        F.sum("npos").cast("bigint").alias("n_pos"),
        (F.sum("cnt") - F.sum("npos")).cast("bigint").alias("n_neg"),
    )


@register(
    "agg_winsorized_mean",
    oracle="""
        WITH ranked AS (
            SELECT o_orderpriority, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice, o_orderkey
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM orders
        ),
        bounds AS (
            SELECT o_orderpriority,
                   MAX(CASE WHEN rn = CAST(CEIL(0.05 * n) AS BIGINT)
                       THEN o_totalprice END) AS lo,
                   MAX(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT)
                       THEN o_totalprice END) AS hi
            FROM ranked GROUP BY o_orderpriority
        )
        SELECT r.o_orderpriority AS priority,
               ROUND(b.lo, 2) AS p05,
               ROUND(b.hi, 2) AS p95,
               ROUND(AVG(LEAST(GREATEST(r.o_totalprice, b.lo), b.hi)), 4)
                   AS winsorized_mean,
               ROUND(AVG(r.o_totalprice), 4) AS raw_mean,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM ranked r JOIN bounds b USING (o_orderpriority)
        GROUP BY r.o_orderpriority, b.lo, b.hi
    """,
    tags=("analytics", "robust-stats"),
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority winsorized mean of order value: clip at the DISCRETE
    p05/p95 order statistics (the value at position ceil(p·n), ties broken
    by key — integer logic, so both engines pick the identical boundary
    with zero float interpolation risk), then average. The robust-mean
    companion to robust_outliers_mad: winsorizing bounds influence instead
    of dropping rows.

    Scale shape: one window per group (5 priorities — each partition is a
    sorted streaming pass), boundary extraction is a combinable MAX-CASE
    aggregate, and the clip+mean re-join broadcasts the 5-row bounds
    frame."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    bounds = ranked.groupBy("o_orderpriority").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.05 * F.col("n")).cast("bigint"),
                F.col("o_totalprice"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.95 * F.col("n")).cast("bigint"),
                F.col("o_totalprice"),
            )
        ).alias("hi"),
    )
    return (
        ranked.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.round("lo", 2).alias("p05"),
            F.round("hi", 2).alias("p95"),
        )
        .agg(
            F.round(
                F.avg(
                    F.least(
                        F.greatest(F.col("o_totalprice"), F.col("lo")),
                        F.col("hi"),
                    )
                ),
                4,
            ).alias("winsorized_mean"),
            F.round(F.avg("o_totalprice"), 4).alias("raw_mean"),
            F.count("*").cast("bigint").alias("n_orders"),
        )
    )


@register(
    "orders_open_fulfillment_sweep",
    oracle="""
        WITH spans AS (
            SELECT o.o_orderdate AS start_day,
                   MAX(l.l_shipdate) AS end_day
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate
        ),
        deltas AS (
            SELECT start_day AS day, 1 AS d FROM spans
            UNION ALL
            SELECT end_day AS day, -1 AS d FROM spans
        ),
        daily AS (
            SELECT day, CAST(SUM(d) AS BIGINT) AS net
            FROM deltas GROUP BY day
        )
        SELECT day, net,
               CAST(SUM(net) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS open_orders
        FROM daily
    """,
    tags=("analytics", "interval"),
)
def orders_open_fulfillment_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order count per day (placed, not yet fully shipped) by SWEEP
    LINE over each order's fulfillment interval [order date, last ship
    date]: every interval contributes a +1 delta at its start and a -1 at
    its end; the running sum of daily nets IS the concurrent-interval
    count. The canonical trick for interval-overlap counting at scale.

    Scale shape — why sweep, not range join: the naive form (calendar ×
    intervals, day BETWEEN start AND end) plans as a |days|×|orders|
    nested-loop expansion. Here: one equi-join + combinable MAX to build
    the spans, one union projection (linear), one combinable groupBy(day),
    and a running sum over the BOUNDED day axis (~2.5k rows at any corpus
    size) — the same axis-bound argument as events_rolling_active_users."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("end_day"))
        .select(F.col("o_orderdate").alias("start_day"), "end_day")
    )
    deltas = spans.select(
        F.col("start_day").alias("day"), F.lit(1).alias("d")
    ).unionAll(
        spans.select(F.col("end_day").alias("day"), F.lit(-1).alias("d"))
    )
    daily = deltas.groupBy("day").agg(
        F.sum("d").cast("bigint").alias("net")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day", "net", F.sum("net").over(w).cast("bigint").alias("open_orders")
    )


@register(
    "orders_cohort_ltv",
    oracle="""
        WITH firsts AS (
            SELECT o_custkey,
                   MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) AS cm
            FROM orders GROUP BY o_custkey
        ),
        facts AS (
            SELECT f.cm,
                   (YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate)) - f.cm
                       AS months_since,
                   o.o_custkey, o.o_totalprice
            FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
        )
        SELECT CAST(MAKE_DATE(cm // 12, cm % 12 + 1, 1) AS DATE)
                   AS cohort_month,
               CAST(months_since AS BIGINT) AS months_since,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_buyers,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,14)))
                     AS DOUBLE), 2) AS revenue
        FROM facts
        GROUP BY cm, months_since
    """,
    tags=("analytics", "cohort"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV matrix: customers grouped by FIRST-order month, revenue
    and active-buyer counts per months-since-acquisition — the
    lifetime-value triangle every growth dashboard runs. Month arithmetic
    is integer (y*12+m), so both engines bucket identically with no
    interval/rounding semantics in play; revenue sums as DECIMAL for an
    order-independent total.

    Scale shape: one combinable MIN keyed on customer (the acquisition
    date), one equi-join back to the fact (AQE-sized), one combinable
    rollup over the bounded |cohorts|x|offsets| grid."""
    o = load_table(spark, sf_dir, "orders")
    mcol = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    firsts = o.groupBy("o_custkey").agg(F.min(mcol).alias("cm"))
    facts = o.join(firsts, "o_custkey").select(
        "cm",
        (mcol - F.col("cm")).cast("bigint").alias("months_since"),
        "o_custkey",
        "o_totalprice",
    )
    return facts.groupBy(
        F.make_date(
            (F.col("cm") / 12).cast("int"),
            F.pmod(F.col("cm"), 12) + 1,
            F.lit(1),
        ).alias("cohort_month"),
        "months_since",
    ).agg(
        F.count_distinct("o_custkey").cast("bigint").alias("n_buyers"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(28,14)")).cast(
                "double"
            ),
            2,
        ).alias("revenue"),
    )


@register(
    "linestatus_returns_chi2",
    oracle="""
        WITH obs AS (
            SELECT l_linestatus AS m, l_returnflag AS f,
                   CAST(COUNT(*) AS DOUBLE) AS o
            FROM lineitem GROUP BY m, f
        ),
        margins AS (
            SELECT m, f, o,
                   SUM(o) OVER (PARTITION BY m) AS row_tot,
                   SUM(o) OVER (PARTITION BY f) AS col_tot,
                   SUM(o) OVER () AS n
            FROM obs
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               ROUND(SUM(POW(o - row_tot * col_tot / n, 2)
                         / (row_tot * col_tot / n)), 6) AS chi2,
               CAST((COUNT(DISTINCT m) - 1) * (COUNT(DISTINCT f) - 1)
                   AS BIGINT) AS dof
        FROM margins
    """,
    tags=("analytics", "stats-test"),
)
def linestatus_returns_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence statistic for line status × return
    flag — the categorical-association test a curation pipeline runs
    before trusting a segmentation (is the label independent of the
    pipeline stage that produced it?). Expected counts from the margins,
    χ² = Σ (O−E)²/E, with the degrees of freedom alongside so the caller
    can look up the p-value.

    Scale shape: one combinable contingency groupBy (bounded
    |modes|×|flags| cells); margins are windows over that bounded grid;
    the statistic is a 1-row aggregate. Corpus touched once."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.groupBy(
        F.col("l_linestatus").alias("m"), F.col("l_returnflag").alias("f")
    ).agg(F.count("*").cast("double").alias("o"))
    wm = Window.partitionBy("m")
    wf = Window.partitionBy("f")
    wall = Window.partitionBy()
    margins = obs.select(
        "m",
        "f",
        "o",
        F.sum("o").over(wm).alias("row_tot"),
        F.sum("o").over(wf).alias("col_tot"),
        F.sum("o").over(wall).alias("n"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return margins.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.round(F.sum(F.pow(F.col("o") - exp, 2) / exp), 6).alias("chi2"),
        (
            (F.count_distinct("m") - 1) * (F.count_distinct("f") - 1)
        ).cast("bigint").alias("dof"),
    )
