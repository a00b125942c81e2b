"""Event-stream operators over ``events`` — batch twins of the streaming ops.

Structured Streaming executes these same expressions incrementally (see
``cloudfloe_spark.streaming``); here they run in batch so the DuckDB oracle
can verify the window semantics (SURVEY.md §7.3 risk 5: the oracle is
batch-only, so every streaming op ships with a batch twin).

``F.window``/``F.session_window`` work identically over batch DataFrames —
the same query text is used by the streaming module with a watermark added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table


@register(
    "events_tumbling_window",
    oracle="""
        SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS w_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY w_start, event_type
    """,
    tags=("events", "window-agg", "streaming-twin"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (streaming twin: add
    ``withWatermark('ts', ...)`` and run on readStream unchanged)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("w_start"), "event_type", "n_events", "total_value"
        )
    )


@register(
    "events_sliding_window",
    oracle="""
        WITH starts AS (
            SELECT e.*, s.w_start
            FROM events e,
                 LATERAL (SELECT UNNEST([
                     TIME_BUCKET(INTERVAL '30 minutes', e.ts),
                     TIME_BUCKET(INTERVAL '30 minutes', e.ts) - INTERVAL '30 minutes'
                 ]) AS w_start) s
            WHERE e.ts >= s.w_start AND e.ts < s.w_start + INTERVAL '1 hour'
        )
        SELECT w_start, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
        FROM starts
        GROUP BY w_start
    """,
    tags=("events", "window-agg", "streaming-twin"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 30 min slide): each event lands in two
    overlapping windows. Spark expands via F.window(len, slide); the oracle
    expands explicitly via the two candidate starts.

    Metric is ROUND(SUM, 2), not ROUND(AVG, 4): window populations here
    are powers of two, so averages of the 2-decimal values land EXACTLY
    on 4-decimal halfway points where Spark (HALF_UP on BigDecimal) and
    DuckDB (double-based) round apart — found at sf0.01, invisible at
    sf0.001. Sums of 2-decimal rationals can never sit on a .005
    boundary, so round-2 is engine-stable."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n_events", "total_value")
    )


@register(
    "events_session_window",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             >= INTERVAL '5 minutes'
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   SUM(is_new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_seq
            FROM ordered
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS session_value
        FROM sessions
        GROUP BY user_id, session_seq
    """,
    tags=("events", "window-agg", "streaming-twin"),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute gap) per user. Spark: F.session_window —
    the native stateful operator; oracle: gaps-and-islands with LAG +
    running SUM (identical session boundaries)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "events_dedup_by_key",
    oracle="""
        SELECT event_type, COUNT(*) AS n_after_dedup
        FROM (
            SELECT DISTINCT user_id, event_type, DATE_TRUNC('minute', ts) AS minute
            FROM events
        ) d
        GROUP BY event_type
    """,
    tags=("events", "dedup", "streaming-twin"),
)
def events_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed event dedup (one event per user/type/minute) — the batch twin
    of ``dropDuplicatesWithinWatermark``. Implemented order-independently
    (count distinct keys) so batch and stream agree."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "user_id", "event_type", F.date_trunc("minute", "ts").alias("minute")
        )
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n_after_dedup"))
    )


@register(
    "events_rate_per_user",
    oracle="""
        WITH spans AS (
            SELECT user_id, COUNT(*) AS n_events,
                   EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)) AS span_us
            FROM events GROUP BY user_id
        )
        SELECT user_id, n_events,
               ROUND(CASE WHEN span_us > 0 THEN n_events / (span_us / 3600000000.0)
                          ELSE 0.0 END, 4) AS events_per_hour
        FROM spans
    """,
    tags=("events", "agg"),
)
def events_rate_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event rate (events/hour over the active span)."""
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("span_us"),
    )
    return spans.select(
        "user_id",
        "n_events",
        F.round(
            F.when(
                F.col("span_us") > 0,
                F.col("n_events") / (F.col("span_us") / 3600000000.0),
            ).otherwise(0.0),
            4,
        ).alias("events_per_hour"),
    )


@register(
    "events_funnel_ordered",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS view_ts
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS click_ts
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > v.view_ts
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS purchase_ts
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
            GROUP BY e.user_id
        )
        SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
               (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
               (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
    tags=("events", "funnel"),
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: view → first click strictly after the
    first view → first purchase strictly after that click. Each stage is an
    aggregate + broadcast-back join on user_id (the per-user stage tables
    shrink monotonically), so at scale the fact table is scanned once per
    stage with no row explosion."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


@register(
    "events_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        )
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    """,
    tags=("events", "sequence"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (behavioral bigrams): per-user ordered
    lag pairs, counted globally. One shuffle on user_id serves the window;
    event_id extends the ordering so simultaneous events stay deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "events_retention_cohorts",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(DATE_TRUNC('day', ts)) AS cohort_day
            FROM events
            GROUP BY user_id
        ), activity AS (
            SELECT DISTINCT e.user_id,
                   f.cohort_day,
                   DATE_DIFF('day', f.cohort_day, DATE_TRUNC('day', e.ts))
                       AS day_offset
            FROM events e
            JOIN firsts f ON e.user_id = f.user_id
        )
        SELECT CAST(cohort_day AS DATE) AS cohort_day,
               CAST(day_offset AS BIGINT) AS day_offset,
               COUNT(*) AS n_users
        FROM activity
        GROUP BY cohort_day, day_offset
    """,
    tags=("events", "cohort"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen day, counted on
    each later active day as an offset from their cohort day — the classic
    product-analytics rollup.

    Scale shape: the per-user first-day is a window MIN over user_id (one
    shuffle on user_id, streaming-evaluated — no join back to a separate
    firsts table needed), then distinct (user, cohort, offset) and the
    final count partial-aggregate map-side. No collects, no skew hazard
    beyond user_id itself (AQE splits a hot user)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    act = (
        # The oracle's inner JOIN on user_id silently drops NULL users; a
        # window over user_id would keep them as their own cohort. Filter
        # explicitly so both engines agree if NULLs ever appear.
        ev.filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.min(F.date_trunc("day", "ts")).over(w).alias("cohort_ts"),
            F.date_trunc("day", "ts").alias("active_ts"),
        )
        .select(
            "user_id",
            F.to_date("cohort_ts").alias("cohort_day"),
            F.datediff(F.to_date("active_ts"), F.to_date("cohort_ts"))
            .cast("bigint")
            .alias("day_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_users")
    )


@register(
    "events_rolling_active_users",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
            FROM events WHERE user_id IS NOT NULL
        ), days AS (SELECT DISTINCT day FROM du)
        SELECT d.day AS report_day,
               CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_7d
        FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day
    """,
    tags=("events", "rolling-distinct"),
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU): for every observed day, the count
    of distinct users active in the trailing 7-day window — the rolling
    DISTINCT that window frames cannot express (COUNT(DISTINCT) OVER RANGE
    is unsupported in Spark, and naive per-day self-joins are quadratic).

    Scale shape: dedup to (day, user) FIRST (the big reduction — one
    shuffle), then EXPLODE each pair into the ≤7 report days it
    contributes to (linear ×7, no join at all), semi-join against the
    bounded observed-day set (broadcast), and one final distinct-count
    shuffle on report_day. The alternative — a range join of a day spine
    against the pair set — is a broadcast nested loop whose cost is
    |days|×|pairs|; the explode form stays strictly linear and is the
    100 TB-safe construction."""
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.filter(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    observed = du.select(F.col("day").alias("report_day")).distinct()
    expanded = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("report_day"),
        "user_id",
    )
    return (
        expanded.join(F.broadcast(observed), "report_day", "semi")
        .groupBy("report_day")
        .agg(F.count_distinct("user_id").alias("active_7d"))
    )


@register(
    "events_path_trigrams",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type, 1) OVER w AS e2,
                   LEAD(event_type, 2) OVER w AS e3
            FROM events
            WHERE user_id IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_type || '>' || e2 || '>' || e3 AS path,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM seq
        WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        GROUP BY path
    """,
    tags=("events", "sequence"),
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral 3-step paths: per-user ordered event-type trigrams with
    occurrence and distinct-user counts — the path-analysis extension of
    ``events_transition_matrix``'s bigrams.

    Scale: one shuffle on user_id for the ordered window (ties broken by
    event_id so both engines see the same sequence), then a count over the
    tiny |event_types|³ path space — the final agg is map-side-combined
    into a bounded result."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.filter(F.col("user_id").isNotNull()).select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


@register(
    "events_funnel_latency",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS view_ts
            FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
            GROUP BY user_id
        ),
        p AS (
            SELECT e.user_id,
                   EPOCH(MIN(e.ts) - ANY_VALUE(v.view_ts)) AS latency_s
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > v.view_ts
            GROUP BY e.user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
               ROUND(AVG(latency_s), 3) AS avg_latency_s,
               ROUND(QUANTILE_CONT(latency_s, 0.5), 3) AS p50_latency_s,
               ROUND(QUANTILE_CONT(latency_s, 0.9), 3) AS p90_latency_s
        FROM p
    """,
    tags=("events", "funnel"),
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency distribution: per user, seconds from first view to
    first subsequent purchase; median/p90/avg across converting users —
    the how-long-does-conversion-take companion to the count funnel.

    Scale shape: SINGLE fact scan — the first-view timestamp is a
    conditional window MIN over user_id (no self-join back to a firsts
    table), purchases after it filter in the same pass, and the per-user
    MIN plus global percentile run on the already-shuffled user partitions.
    The final percentile is an exact sort-agg over one row per converted
    user — at extreme scale swap for approx_percentile; the conversion to
    a per-user frame (the expensive part) is identical."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    v_ts = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    per_user = (
        ev.filter(F.col("user_id").isNotNull())
        .withColumn("view_ts", v_ts)
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("view_ts").isNotNull()
            & (F.col("ts") > F.col("view_ts"))
        )
        .groupBy("user_id")
        .agg(
            (
                (
                    F.unix_micros(F.min("ts"))
                    - F.unix_micros(F.first("view_ts"))
                ).cast("double")
                / 1e6
            ).alias("latency_s")
        )
    )
    return per_user.agg(
        F.count("*").alias("n_converted"),
        F.round(F.avg("latency_s"), 3).alias("avg_latency_s"),
        F.round(F.percentile("latency_s", 0.5), 3).alias("p50_latency_s"),
        F.round(F.percentile("latency_s", 0.9), 3).alias("p90_latency_s"),
    )


@register(
    "events_zscore_anomaly",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, day
        ),
        stats AS (
            SELECT event_type, AVG(n) AS mu, STDDEV_SAMP(n) AS sd
            FROM daily GROUP BY event_type
        )
        SELECT d.event_type, d.day, d.n,
               ROUND((d.n - s.mu) / s.sd, 4) AS z,
               (ABS((d.n - s.mu) / s.sd) >= 2.0) AS is_anomaly
        FROM daily d JOIN stats s USING (event_type)
    """,
    tags=("events", "anomaly"),
)
def events_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: each (event_type, day) count scored as a
    z-score against that type's own daily mean/stddev, flagged at |z| >= 2
    — the ops-monitoring primitive for ingest pipelines (sudden drops =
    upstream breakage, spikes = bot floods). Sample stddev on both
    engines; scores rounded so float division noise cannot flip the hash.

    Scale shape: the daily rollup is one map-side-combinable count; the
    per-type stats re-aggregate its |types|×|days| output (tiny); the
    stats join back is an equi-join on event_type that AQE broadcasts.
    The fact table is scanned exactly once."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return daily.join(stats, "event_type").select(
        "event_type",
        "day",
        "n",
        F.round(z, 4).alias("z"),
        (F.abs(z) >= 2.0).alias("is_anomaly"),
    )


@register(
    "events_interarrival_stats",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   EPOCH(ts) - EPOCH(LAG(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   )) AS gap_s -- fractional seconds (µs precision)
            FROM events WHERE user_id IS NOT NULL
        )
        SELECT user_id,
               CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
               ROUND(AVG(gap_s), 2) AS mean_gap_s,
               ROUND(QUANTILE_CONT(gap_s, 0.5), 2) AS median_gap_s,
               ROUND(MAX(gap_s), 2) AS max_gap_s
        FROM seq
        WHERE gap_s IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(gap_s) >= 5
    """,
    tags=("events", "behavior"),
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event arrival-gap statistics (count / mean / median /
    max seconds between consecutive events, users with >= 5 gaps) — the
    behavioral-cadence profile that feeds session-timeout tuning and
    bot-vs-human triage. LAG ordering made total with the event id so
    same-timestamp events produce identical gaps on both engines.

    Scale shape: one user-keyed window shuffle for the LAG; the stats
    re-aggregate on the same user key — Catalyst reuses the window's
    partitioning, so the fact table crosses one exchange. The exact median
    is a per-group percentile over each user's own bounded gap list."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            # cast→double keeps the µs fraction (unix_timestamp truncates
            # to whole seconds and would diverge from the oracle's EPOCH)
            (
                F.col("ts").cast("double")
                - F.lag("ts").over(w).cast("double")
            ).alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.count("gap_s").cast("bigint").alias("n_gaps"),
            F.round(F.avg("gap_s"), 2).alias("mean_gap_s"),
            F.round(F.percentile("gap_s", F.lit(0.5)), 2).alias("median_gap_s"),
            F.round(F.max("gap_s"), 2).alias("max_gap_s"),
        )
        .filter(F.col("n_gaps") >= 5)
    )


@register(
    "events_activity_streaks",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
            FROM events WHERE user_id IS NOT NULL
        ),
        grp AS (
            SELECT user_id, d,
                   d - CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY d
                   ) AS INTEGER) AS island
            FROM days
        ),
        streaks AS (
            SELECT user_id, island,
                   CAST(COUNT(*) AS BIGINT) AS len,
                   MIN(d) AS streak_start
            FROM grp GROUP BY user_id, island
        )
        SELECT user_id,
               CAST(MAX(len) AS BIGINT) AS longest_streak,
               CAST(COUNT(*) AS BIGINT) AS n_streaks,
               MIN(streak_start) AS first_active_day
        FROM streaks
        GROUP BY user_id
        HAVING MAX(len) >= 2
    """,
    tags=("events", "behavior"),
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user longest run of CONSECUTIVE active days
    (the classic ``date − row_number`` trick — consecutive dates share one
    island key), plus streak count and first activity. The
    retention/habit metric engagement teams ship daily; users with a
    streak of at least 2 reported.

    Scale shape: one distinct on (user, day) — map-side combinable; one
    user-keyed window (row_number is a streaming pass over each user's
    sorted days); two re-aggregations that reuse the user_id hash
    partitioning prefix. The fact table crosses one exchange."""
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.filter(F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count("*").cast("bigint").alias("len"),
        F.min("d").alias("streak_start"),
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").cast("bigint").alias("longest_streak"),
            F.count("*").cast("bigint").alias("n_streaks"),
            F.min("streak_start").alias("first_active_day"),
        )
        .filter(F.col("longest_streak") >= 2)
    )


_EWMA_ALPHA = 0.3
_EWMA_SPAN = 14  # truncation window, days


@register(
    "events_ewma_daily_volume",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, day
        ),
        idx AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY event_type ORDER BY day) AS i
            FROM daily
        )
        SELECT a.event_type, a.day, ANY_VALUE(a.n) AS n,
               ROUND(SUM({_EWMA_ALPHA} * POWER(1 - {_EWMA_ALPHA}, a.i - b.i)
                         * b.n), 4) AS ewma
        FROM idx a JOIN idx b
          ON a.event_type = b.event_type
         AND b.i <= a.i AND b.i >= a.i - {_EWMA_SPAN - 1}
        GROUP BY a.event_type, a.day
    """,
    tags=("events", "trend"),
)
def events_ewma_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event volume per
    type (alpha {0.3}, truncated at {14} days — the window where the
    remaining weight is under 1%), the trend line ops dashboards draw
    over raw counts. Truncation makes the construction a BOUNDED-window
    self-join instead of an unbounded recursion: each day joins to at
    most {14} predecessors.

    Scale shape: the daily rollup is the only fact-sized aggregation;
    the smoothing join runs on the |types|x|days| rollup (time-bounded,
    independent of fact volume) with a x{14} expansion cap. No recursion,
    no UDFs, deterministic weights on both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    idx = daily.withColumn(
        "i",
        F.row_number().over(Window.partitionBy("event_type").orderBy("day")),
    )
    a = idx.alias("a")
    b = idx.alias("b")
    w = F.lit(_EWMA_ALPHA) * F.pow(
        F.lit(1 - _EWMA_ALPHA), F.col("a.i") - F.col("b.i")
    )
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.i") <= F.col("a.i"))
            & (F.col("b.i") >= F.col("a.i") - (_EWMA_SPAN - 1)),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), F.col("a.day").alias("day"))
        .agg(
            F.any_value(F.col("a.n")).alias("n"),
            F.round(F.sum(w * F.col("b.n")), 4).alias("ewma"),
        )
    )


@register(
    "events_bollinger_bands",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, day
        )
        SELECT event_type, day, n,
               ROUND(AVG(n) OVER w, 4) AS ma7,
               ROUND(AVG(n) OVER w + 2 * STDDEV_SAMP(n) OVER w, 4)
                   AS upper_band,
               ROUND(AVG(n) OVER w - 2 * STDDEV_SAMP(n) OVER w, 4)
                   AS lower_band,
               (n > AVG(n) OVER w + 2 * STDDEV_SAMP(n) OVER w
                OR n < AVG(n) OVER w - 2 * STDDEV_SAMP(n) OVER w)
                   AS outside_band
        FROM daily
        WINDOW w AS (
            PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
        )
    """,
    tags=("events", "trend"),
)
def events_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over daily event volume: trailing-7-day mean ±2
    sample standard deviations per type, flagging days outside the band —
    the self-calibrating volatility envelope (unlike the fixed z-score
    pass, the threshold tracks the series' own recent noise level).

    Scale shape: one fact-sized daily rollup; the band computation is a
    single bounded-frame window pass over the |types|x|days| rollup —
    Catalyst evaluates both running moments in one WindowExec. Rounded so
    cross-engine float order cannot flip the hash; the band FLAG compares
    unrounded moments identically on both engines because the frame is
    a small fixed row set summed in frame order."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    ma, sd = F.avg("n").over(w), F.stddev_samp("n").over(w)
    return daily.select(
        "event_type",
        "day",
        "n",
        F.round(ma, 4).alias("ma7"),
        F.round(ma + 2 * sd, 4).alias("upper_band"),
        F.round(ma - 2 * sd, 4).alias("lower_band"),
        ((F.col("n") > ma + 2 * sd) | (F.col("n") < ma - 2 * sd)).alias(
            "outside_band"
        ),
    )


@register(
    "events_hourly_seasonality",
    oracle="""
        SELECT event_type,
               CAST(ISODOW(ts) AS INT) AS dow,
               CAST(HOUR(ts) AS INT) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY event_type, dow, hod
    """,
    tags=("events", "seasonality"),
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonality profile: event counts and value by
    (ISO day-of-week × hour-of-day) per type — the baseline every
    volume-anomaly threshold should be conditioned on (Tuesday 3am and
    Friday 8pm have different normals; comparing either to a global mean
    flags the calendar, not incidents).

    Scale shape: a pure map-side-combinable rollup onto the bounded
    |types|x7x24 axis — one shuffle of counter cells, never rows."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.dayofweek(F.date_sub("ts", 0)).alias("_raw_dow"),
        F.hour("ts").alias("hod"),
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        "event_type",
        # Spark dayofweek: Sunday=1; ISO (DuckDB isodow): Monday=1
        (((F.col("_raw_dow") + 5) % 7) + 1).cast("int").alias("dow"),
        "hod",
        "n_events",
        "total_value",
    )


@register(
    "events_time_weighted_value",
    oracle="""
        WITH seq AS (
            SELECT event_type, value,
                   EPOCH(LEAD(ts) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                   )) - EPOCH(ts) AS dt_s
            FROM events
        )
        SELECT event_type,
               ROUND(SUM(value * dt_s) / SUM(dt_s), 6) AS twap_value,
               ROUND(AVG(value), 6) AS plain_avg,
               CAST(COUNT(dt_s) AS BIGINT) AS n_intervals
        FROM seq
        WHERE dt_s IS NOT NULL AND dt_s > 0
        GROUP BY event_type
    """,
    tags=("events", "stats"),
)
def events_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type (each observation
    weighted by how long it was the latest one — the TWAP construction),
    reported beside the plain mean it corrects: when observations arrive
    in bursts, the unweighted average over-counts the bursts and the
    time-weighted one doesn't. LEAD ordering made total with the event
    id; zero-length intervals (same-timestamp events) drop from the
    weight mass identically on both engines.

    Scale shape: one type-keyed window for the interval lengths (the
    fact's only shuffle) and a map-side-combinable weighted-sum — the
    final ratio is computed per group from two accumulated moments."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "value",
        (
            F.lead("ts").over(w).cast("double") - F.col("ts").cast("double")
        ).alias("dt_s"),
    ).filter(F.col("dt_s").isNotNull() & (F.col("dt_s") > 0))
    return seq.groupBy("event_type").agg(
        F.round(F.sum(F.col("value") * F.col("dt_s")) / F.sum("dt_s"), 6).alias(
            "twap_value"
        ),
        F.round(F.avg("value"), 6).alias("plain_avg"),
        F.count("dt_s").cast("bigint").alias("n_intervals"),
    )


@register(
    "events_user_type_entropy",
    oracle="""
        WITH counts AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
            FROM events WHERE user_id IS NOT NULL
            GROUP BY user_id, event_type
        ),
        tot AS (
            SELECT user_id, SUM(c) AS t FROM counts GROUP BY user_id
        )
        SELECT c.user_id,
               CAST(ANY_VALUE(t.t) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               ROUND(-SUM((c.c / t.t) * LOG2(c.c / t.t)), 6) AS type_entropy
        FROM counts c JOIN tot t USING (user_id)
        GROUP BY c.user_id
        HAVING SUM(c.c) >= 10
    """,
    tags=("events", "behavior"),
)
def events_user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution (users with
    >= 10 events) — the behavioral-diversity score that separates
    single-action bots (entropy ~0) from organic browse-cart-purchase
    mixes, next to raw event and type counts.

    Scale shape: one (user, type) count — map-side combinable on a key
    whose cardinality is |users|×|types|; the per-user total and the
    entropy fold reuse the user prefix of that partitioning. The fact
    table crosses one exchange."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    tot = counts.groupBy("user_id").agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t")
    return (
        counts.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.any_value("t").cast("bigint").alias("n_events"),
            F.count("*").cast("bigint").alias("n_types"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("type_entropy"),
        )
        .filter(F.col("n_events") >= 10)
    )


@register(
    "events_cumulative_distinct_users",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS day
            FROM events GROUP BY user_id
        ),
        daily AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
            FROM first_seen GROUP BY day
        )
        SELECT day, new_users,
               CAST(SUM(new_users) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cumulative_users
        FROM daily
    """,
    tags=("events", "growth"),
)
def events_cumulative_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """User-base growth curve: cumulative count of distinct users ever
    seen, per day — computed as first-seen-date per user + daily new-user
    counts + a running sum, NOT as a per-day distinct over an expanding
    window (which re-counts the whole history for every day).

    Scale shape: one combinable MIN keyed on user_id (the only
    corpus-sized shuffle), one groupBy over |days|, and a running sum on
    the bounded day axis — cumulative-distinct at 100 TB is exactly this
    decomposition or it is quadratic."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    daily = first_seen.groupBy("day").agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


@register(
    "events_dau_mau_stickiness",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
            FROM events WHERE user_id IS NOT NULL
        ), days AS (SELECT DISTINCT day FROM du),
        mau AS (
            SELECT d.day AS report_day,
                   CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
            FROM days d JOIN du u ON u.day BETWEEN d.day - 27 AND d.day
            GROUP BY d.day
        ),
        dau AS (
            SELECT day AS report_day,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
            FROM du GROUP BY day
        )
        SELECT m.report_day, d.dau, m.mau,
               ROUND(CAST(d.dau AS DOUBLE) / m.mau, 6) AS stickiness
        FROM mau m JOIN dau d USING (report_day)
    """,
    tags=("events", "rolling-distinct", "growth"),
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per observed day — the engagement ratio every
    product dashboard tracks — built from TWO rolling distincts: the
    1-day DAU is a plain per-day distinct count, the trailing-28-day MAU
    reuses the explode-into-report-days construction of
    events_rolling_active_users (linear ×28, never a |days|×|pairs|
    range join).

    Scale shape: one (day, user) dedup shuffle feeds both sides; the MAU
    explode is linear; the final join runs on the bounded day axis."""
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.filter(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .localCheckpoint(eager=False)  # feeds DAU, MAU, and the day set
    )
    observed = du.select(F.col("day").alias("report_day")).distinct()
    mau = (
        du.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 27))
            ).alias("report_day"),
            "user_id",
        )
        .join(F.broadcast(observed), "report_day", "semi")
        .groupBy("report_day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("mau"))
    )
    dau = du.groupBy(F.col("day").alias("report_day")).agg(
        F.count_distinct("user_id").cast("bigint").alias("dau")
    )
    return mau.join(dau, "report_day").select(
        "report_day",
        "dau",
        "mau",
        F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
            "stickiness"
        ),
    )


@register(
    "events_naive_forecast_mape",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, event_type,
                   CAST(COUNT(*) AS DOUBLE) AS n
            FROM events GROUP BY d, event_type
        )
        SELECT a.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(AVG(ABS(a.n - f.n) / a.n), 6) AS mape,
               ROUND(AVG(ABS(a.n - f.n)), 6) AS mae
        FROM daily a
        JOIN daily f
          ON f.event_type = a.event_type AND f.d = a.d - 7
        GROUP BY a.event_type
    """,
    tags=("events", "forecast", "eval"),
)
def events_naive_forecast_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the SEASONAL-NAIVE forecast (predict today's volume
    with the same weekday last week): per-type MAPE and MAE — the
    baseline every real forecasting model must beat, and the
    drift-detection primitive (a MAPE jump means the weekly pattern
    broke). The forecast join is calendar-exact (d-7), not LAG(7) over
    observed rows, so gaps in the day axis never misalign the pairs.

    Scale shape: one combinable (day, type) rollup, then a self-equi-join
    on the BOUNDED daily frame (|days|x|types| rows) and a combinable
    per-type error aggregate — the corpus is scanned once."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count("*").cast("double").alias("n"))
    a = daily.alias("a")
    f = daily.alias("f")
    joined = a.join(
        f,
        (F.col("f.event_type") == F.col("a.event_type"))
        & (F.col("f.d") == F.date_sub(F.col("a.d"), 7)),
    )
    err = F.abs(F.col("a.n") - F.col("f.n"))
    return joined.groupBy(F.col("a.event_type").alias("event_type")).agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.round(F.avg(err / F.col("a.n")), 6).alias("mape"),
        F.round(F.avg(err), 6).alias("mae"),
    )
