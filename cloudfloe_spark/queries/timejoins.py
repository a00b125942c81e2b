"""Time-join catalog entries: as-of join and bucketed range join over the
events table. DuckDB's native ``ASOF JOIN`` / plain range predicates are
the oracles — the strongest differential check available for operators
Spark lacks as primitives (north-star extension; the reference has no
time-join surface at all)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudfloe_spark.operators.asof import asof_join
from cloudfloe_spark.operators.rangejoin import range_join_bucketed
from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table


@register(
    "asof_last_purchase_before_click",
    oracle="""
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        purch AS (
            SELECT user_id, ts AS pts, value FROM events
            WHERE event_type = 'purchase'
        )
        SELECT c.event_id, c.user_id, c.ts,
               p.pts AS pts_p, p.value AS value_p
        FROM clicks c
        ASOF LEFT JOIN purch p
          ON c.user_id = p.user_id AND c.ts >= p.pts
    """,
    tags=("asof-join", "events"),
)
def asof_last_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each click annotated with the user's most
    recent at-or-before purchase (ts + value), NULL when none. One
    shuffle+sort on (user_id, ts) via the union+window as-of operator —
    no per-key Cartesian, so skewed users don't blow up."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("pts"), "value"
    )
    return asof_join(
        clicks,
        purchases,
        on="ts",
        by=["user_id"],
        value_columns=["pts", "value"],
        suffix="_p",
    )


@register(
    "range_join_errors_near_clicks",
    oracle="""
        SELECT e.user_id,
               e.event_id AS error_id,
               c.event_id AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id
         AND epoch_us(e.ts) BETWEEN epoch_us(c.ts) - 300000000
                                AND epoch_us(c.ts) + 300000000
    """,
    tags=("range-join", "events"),
)
def range_join_errors_near_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: (error, click) pairs of the same user within ±5
    minutes, via the bucketed range join (equi-join on user+time bucket,
    then exact filter) — a hash join instead of a nested-loop, with a
    bounded 2-3× right-side expansion at a 10-minute bucket."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.unix_micros("ts").alias("t_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        (F.unix_micros("ts") - 300_000_000).alias("t_start"),
        (F.unix_micros("ts") + 300_000_000).alias("t_end"),
    )
    joined = range_join_bucketed(
        errors,
        clicks,
        point="t_us",
        start="t_start",
        end="t_end",
        by=["user_id"],
        bucket=600_000_000,  # 10 min in µs ≈ interval width
    )
    return joined.select("user_id", "error_id", "click_id")


@register(
    "scd2_point_in_time_tier",
    oracle="""
        WITH latest_purch AS (
            SELECT user_id, ts, value FROM (
                SELECT user_id, ts, value,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id, ts ORDER BY event_id DESC
                       ) AS rn
                FROM events WHERE event_type = 'purchase'
            ) WHERE rn = 1
        ),
        dim AS (
            SELECT user_id, ts AS valid_from,
                   LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts
                   ) AS valid_to,
                   CASE WHEN value >= 50 THEN 'high'
                        WHEN value >= 10 THEN 'mid'
                        ELSE 'low' END AS tier
            FROM latest_purch
        ),
        clicks AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click'
        )
        SELECT c.event_id, c.user_id, d.tier, d.valid_from
        FROM clicks c
        LEFT JOIN dim d
          ON d.user_id = c.user_id
         AND c.ts >= d.valid_from
         AND (d.valid_to IS NULL OR c.ts < d.valid_to)
    """,
    tags=("asof-join", "scd2", "events"),
)
def scd2_point_in_time_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 point-in-time join: build a slowly-changing 'purchase tier'
    dimension from the purchase stream (each purchase opens a validity
    period [ts, next-purchase ts); half-open, NULL-terminated for the
    current period) and resolve every click against the period valid AT
    ITS EVENT TIME — the effective-dated dimension lookup every warehouse
    runs, with clicks before a user's first purchase resolving to NULL.

    The ORACLE states the textbook interval predicate (equi-key + two
    range bounds) — a different formulation than DuckDB's ASOF JOIN, so
    this differentially proves the interval semantics, not just as-of
    agreement. The SPARK plan never executes that interval join: because
    consecutive periods partition each user's timeline, period-at-time
    IS the backward as-of join to the period start, so it composes from
    ``operators/asof.asof_join`` — one shuffle+sort on (user_id, ts),
    no per-key interval expansion, skew-safe at 100 TB. Same-timestamp
    duplicate purchases are deduped to the max event_id first (the
    oracle's empty [ts, ts) intervals match nothing — parity by
    construction)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase")
    w_dedup = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    latest = (
        purch.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.when(F.col("value") >= 50, "high")
            .when(F.col("value") >= 10, "mid")
            .otherwise("low")
            .alias("tier"),
            F.col("ts").alias("valid_from"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        clicks,
        latest,
        on="ts",
        by=["user_id"],
        value_columns=["tier", "valid_from"],
        suffix="",
    ).select("event_id", "user_id", "tier", "valid_from")
