"""Window-function catalog: ranking, analytic, frame-spec, gaps-and-islands.

Part of the permitted SELECT envelope (SURVEY.md §2C "window functions").
Window semantics match between Spark and DuckDB given deterministic ORDER BY
keys — every window here orders by a unique tiebreak so rank/lag results are
stable across partitioned execution.

Scale note: a window over ``partitionBy(key)`` shuffles once on the key and
sorts within partitions — same cost envelope as a groupBy. Windows without
PARTITION BY (global order) single-thread the sort at the final stage and
are avoided except on pre-aggregated (small) inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table


@register(
    "window_row_number_topn",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        ) t
        WHERE rn <= 3
    """,
    tags=("window",),
)
def window_row_number_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ROW_NUMBER — Spark plans a per-partition
    WindowGroupLimit (rank pushdown) so only N rows per key survive the
    shuffle in recent Spark versions."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_rank_dense",
    oracle="""
        SELECT p_brand, p_partkey, p_retailprice,
               RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
               DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank,
               NTILE(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_quartile
        FROM part
    """,
    tags=("window",),
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / NTILE ranking family."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    wt = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(wt).alias("price_quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               LAG(o_totalprice)  OVER w AS prev_price,
               LEAD(o_totalprice) OVER w AS next_price,
               ROUND(o_totalprice - COALESCE(LAG(o_totalprice) OVER w, 0), 2) AS price_delta
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD analytic functions (order-history deltas per customer)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(
            F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)),
            2,
        ).alias("price_delta"),
    )


@register(
    "window_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_total,
               COUNT(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS order_seq
        FROM orders
    """,
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative aggregate with explicit ROWS frame."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.count("*").over(w).alias("order_seq"),
    )


@register(
    "window_moving_avg",
    oracle="""
        SELECT user_id, event_id, ts,
               ROUND(AVG(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ), 4) AS moving_avg_3
        FROM events
    """,
    tags=("window",),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (3-event moving average per user)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.avg("value").over(w), 4).alias("moving_avg_3"),
    )


@register(
    "window_first_last",
    oracle="""
        SELECT o_custkey, o_orderkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_order,
               LAST_VALUE(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE with the full-partition frame for last."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
    )


@register(
    "window_global_pct",
    oracle="""
        SELECT seg, ROUND(seg_revenue, 2) AS seg_revenue,
               ROUND(seg_revenue / SUM(seg_revenue) OVER (), 4) AS revenue_share
        FROM (
            SELECT c.c_mktsegment AS seg, SUM(o.o_totalprice) AS seg_revenue
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        ) t
    """,
    tags=("window", "join"),
)
def window_global_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total via an unpartitioned window — safe because it runs on
    the pre-aggregated (5-row) input, not the fact table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.sum("o_totalprice").alias("seg_revenue"))
    )
    w = Window.partitionBy()
    return seg.select(
        "seg",
        "seg_revenue",
        F.round(F.col("seg_revenue") / F.sum("seg_revenue").over(w), 4).alias(
            "revenue_share"
        ),
    ).withColumn("seg_revenue", F.round("seg_revenue", 2))
