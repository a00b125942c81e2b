"""Driver-checked STREAMING correctness.

These catalog entries execute real Structured Streaming pipelines
(readStream file source → watermarked windowed aggregation → availableNow
→ memory sink) and return the completed result as a batch DataFrame — so
the driver's DuckDB comparison checks actual streaming execution, not a
batch stand-in. Complete output mode makes the terminal state equal the
batch aggregation over the same input, which is exactly Spark's unified-
model guarantee; the oracle is therefore plain SQL.

(Watermark late-data semantics — where streaming intentionally diverges
from batch — are pinned separately in tests/test_streaming.py; they are
multi-run behaviors no single-result oracle can express.)
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.streaming.windows import (
    run_available_now,
    session_counts,
    stream_events,
    tumbling_counts,
)


def _unique(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


@register(
    "streaming_tumbling_counts",
    oracle="""
        SELECT TIME_BUCKET(INTERVAL '1 day', ts) AS win_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("streaming", "window-agg"),
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts computed BY THE STREAMING ENGINE (file
    stream → watermark → window agg → availableNow → memory sink); the
    completed state equals the batch aggregation, which the SQL oracle
    expresses directly."""
    return run_available_now(
        tumbling_counts(stream_events(spark, sf_dir)),
        name=_unique("st_tumble"),
        output_mode="complete",
    )


@register(
    "streaming_session_counts",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL '30 minutes'
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS seq
            FROM ordered
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '30 minutes' AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sessions
        GROUP BY user_id, seq
    """,
    tags=("streaming", "session-window"),
)
def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows computed by the streaming engine
    (session_window state machine). Oracle: gaps-and-islands — Spark's
    session_window closes a session after a gap STRICTLY greater than
    the 30-minute gap parameter, and reports end = last event + gap."""
    return run_available_now(
        session_counts(stream_events(spark, sf_dir), gap="30 minutes"),
        name=_unique("st_sess"),
        output_mode="complete",
    )


@register(
    "streaming_interval_join",
    oracle="""
        SELECT c.user_id AS l_user,
               c.event_id AS l_event_id,
               c.ts AS l_ts,
               p.event_id AS r_event_id,
               p.ts AS r_ts
        FROM events c
        JOIN events p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL '1 hour'
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    tags=("streaming", "join"),
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join executed BY THE STREAMING ENGINE: two
    watermarked event streams joined on user_id within a 1-hour window
    (the watermark + interval bound is what lets Spark evict join state).
    Append-mode terminal output equals the batch interval join, which the
    oracle states directly."""
    from cloudfloe_spark.streaming.windows import stream_stream_interval_join

    return run_available_now(
        stream_stream_interval_join(
            stream_events(spark, sf_dir), stream_events(spark, sf_dir)
        ),
        name=_unique("st_ssjoin"),
        output_mode="append",
    )


@register(
    "streaming_sliding_avg",
    # Each event lands in width/slide = 2 windows: bucket(ts) and
    # bucket(ts) - 1 day. The DECIMAL-summed average matches the
    # streaming engine's aggregate regardless of summation order.
    oracle="""
        WITH expanded AS (
            SELECT value,
                   UNNEST([TIME_BUCKET(INTERVAL '1 day', ts),
                           TIME_BUCKET(INTERVAL '1 day', ts) - INTERVAL '1 day'])
                       AS win_start
            FROM events
        )
        SELECT win_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28,14))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_value
        FROM expanded
        GROUP BY win_start
    """,
    tags=("streaming", "window-agg"),
)
def streaming_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (2-day width, 1-day slide) average computed BY THE
    STREAMING ENGINE; complete-mode terminal state equals the batch
    sliding aggregation the oracle expands by hand."""
    from cloudfloe_spark.streaming.windows import sliding_avg

    return run_available_now(
        sliding_avg(stream_events(spark, sf_dir)),
        name=_unique("st_slide"),
        output_mode="complete",
    )


@register(
    "streaming_dedup_counts",
    # dropDuplicatesWithinWatermark keeps ONE nondeterministic row per
    # key, so the twin aggregates to the deterministic quantity: surviving
    # row count per event_type == COUNT(DISTINCT user_id) per type.
    oracle="""
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys
        FROM events
        GROUP BY event_type
    """,
    tags=("streaming", "dedup"),
)
def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup on (user_id, event_type) via
    dropDuplicatesWithinWatermark (bounded state — ids older than the
    watermark horizon are evicted), aggregated to surviving-rows-per-type
    so the result is deterministic and oracle-comparable."""
    from pyspark.sql import functions as F

    from cloudfloe_spark.streaming.windows import stream_events as _se

    deduped = (
        _se(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_keys"))
    )
    return run_available_now(
        deduped, name=_unique("st_dedup"), output_mode="complete"
    )


@register(
    "streaming_stateful_totals",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(COALESCE(value, 0.0)), 6) AS total_value
        FROM events
        GROUP BY user_id
    """,
    tags=("streaming", "stateful", "applyInPandasWithState"),
)
def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming operator executed by the real engine:
    ``applyInPandasWithState`` maintains per-user (count, sum) in explicit
    group state (``streaming/stateful.py::running_user_totals``), update
    output mode, availableNow. The memory sink accumulates one updated row
    per user per micro-batch; the TERMINAL state per user — the row with
    the highest running count — must equal the batch aggregation, which is
    what the oracle expresses.

    Scale: state is O(users) rows of (long, double) in the state store;
    the Python hop is one Arrow batch per user-group per micro-batch."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cloudfloe_spark.streaming.stateful import running_user_totals
    from cloudfloe_spark.streaming.windows import run_available_now, stream_events

    updates = run_available_now(
        running_user_totals(stream_events(spark, sf_dir)),
        name=_unique("st_state"),
        output_mode="update",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        updates.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "n_events",
            F.round("total_value", 6).alias("total_value"),
        )
    )


@register(
    "streaming_static_enrich",
    oracle="""
        WITH dim AS (
            SELECT user_id, COUNT(*) AS user_events
            FROM events
            GROUP BY user_id
        )
        SELECT e.event_id, e.user_id, d.user_events
        FROM events e
        LEFT JOIN dim d ON e.user_id = d.user_id
        WHERE e.event_id % 97 = 0
    """,
    tags=("streaming", "stream-static-join"),
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static LEFT join executed by the streaming engine: the event
    stream (filtered to keep the sink small) enriches against a static
    per-user dimension computed in batch. No forced broadcast hint — a
    user-keyed dim is unbounded at scale, so Spark sizes the join per
    microbatch (streaming/windows.py::stream_static_enrich). Append mode:
    stream-static joins emit each streamed row exactly once, so the sink
    equals the batch join the oracle expresses."""
    from pyspark.sql import functions as F

    from cloudfloe_spark.sources.tables import load_table
    from cloudfloe_spark.streaming.windows import (
        run_available_now,
        stream_events,
        stream_static_enrich,
    )

    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("user_events"))
    )
    stream = stream_events(spark, sf_dir).filter(F.col("event_id") % 97 == 0)
    enriched = stream_static_enrich(stream, dim).select(
        "event_id", "user_id", "user_events"
    )
    return run_available_now(
        enriched, name=_unique("st_enrich"), output_mode="append"
    )


@register(
    "streaming_left_outer_join",
    oracle="""
        SELECT c.user_id AS l_user,
               c.event_id AS l_event_id,
               c.ts AS l_ts,
               p.event_id AS r_event_id,
               p.ts AS r_ts
        FROM events c
        LEFT JOIN events p
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase'
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL '1 hour'
        WHERE c.event_type = 'click'
    """,
    tags=("streaming", "join"),
)
def streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join executed BY THE STREAMING
    ENGINE — the semantics no single availableNow pass can verify: an
    unmatched click is emitted with NULL purchase columns only after the
    watermark proves no purchase can still arrive, and Spark's watermark
    never advances past the final batch, so the stream's tail would stay
    buffered forever. The twin therefore drives TWO checkpointed
    availableNow runs over a growing source directory (the deterministic-
    batch-order pattern from tests/test_streaming.py): run 1 is the real
    events, run 2 adds a far-future sentinel pair (user_id -1) that
    advances the watermark beyond every real row, flushing all remaining
    matched AND null-extended rows to the append sink. The terminal sink
    contents then equal the batch LEFT JOIN, which the oracle states
    directly.

    Scale shape: the join itself is the watermark-bounded shuffled hash
    join on user_id (state evicted by watermark + interval); the sentinel
    is the standard production trick for draining a bounded replay."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from cloudfloe_spark.sources.tables import load_table
    from cloudfloe_spark.streaming.windows import stream_stream_left_outer_join

    base = tempfile.mkdtemp(prefix="cf_louter_")
    src = os.path.join(base, "src")
    out = os.path.join(base, "out")
    cp = os.path.join(base, "cp")
    os.makedirs(src, exist_ok=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b0"))

    def _run() -> None:
        sdf = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        ).parquet(f"{src}/*")
        joined = stream_stream_left_outer_join(sdf, sdf)
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(180):
                # Timed-out run = partially-written append sink — a
                # wrong-but-plausible result. Fail loudly instead.
                raise TimeoutError("left-outer streaming run exceeded 180s")
        finally:
            q.stop()

    _run()
    # Sentinel batch: one click + one purchase for a user id outside the
    # fixture's key space, timestamped beyond any fixture event (the
    # fixtures are 2024-vintage) — run 2's watermark then passes every
    # real row and the join state drains completely.
    sentinel = spark.createDataFrame(
        [
            (-1, "2035-01-01 00:00:00", -1, "click"),
            (-2, "2035-01-01 00:00:00", -1, "purchase"),
        ],
        "event_id long, ts_s string, user_id long, event_type string",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type")
    sentinel.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    _run()

    try:
        # localCheckpoint materializes the (small) result into block storage
        # and cuts lineage to the scratch files, so the scratch dir can be
        # removed before returning instead of leaking across invocations.
        return (
            spark.read.parquet(out)
            .filter(F.col("l_user") >= 0)
            .localCheckpoint(eager=True)
        )
    finally:
        import shutil

        shutil.rmtree(base, ignore_errors=True)


@register(
    "streaming_windowed_topk",
    oracle="""
        WITH counts AS (
            SELECT TIME_BUCKET(INTERVAL '1 day', ts) AS win_start,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events
            GROUP BY win_start, event_type
        )
        SELECT win_start, event_type, n_events, CAST(rk AS BIGINT) AS rk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY win_start
                ORDER BY n_events DESC, event_type
            ) AS rk
            FROM counts
        )
        WHERE rk <= 2
    """,
    tags=("streaming", "window-agg", "rank"),
)
def streaming_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 event types per daily window, with the windowed COUNT run BY
    THE STREAMING ENGINE (complete-mode tumbling aggregate) and the rank
    applied to the terminal state — the production dashboard pattern:
    Structured Streaming cannot rank inside an aggregation query (no
    windows over streaming aggregates), so the serving layer ranks the
    continuously-maintained state store. The oracle states both stages
    as one batch query.

    Scale shape: the streaming aggregate's state is |windows|×|types|
    (watermark-bounded in the twin's production form); the rank runs on
    that aggregate, never the event stream."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    counts = run_available_now(
        tumbling_counts(stream_events(spark, sf_dir), width="1 day"),
        name=_unique("st_topk"),
        output_mode="complete",
    )
    w = Window.partitionBy("win_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 2)
        .select("win_start", "event_type", "n_events", "rk")
    )


@register(
    "streaming_full_outer_join",
    oracle="""
        WITH c AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'click'),
             p AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'purchase')
        SELECT c.user_id AS l_user, c.event_id AS l_event_id, c.ts AS l_ts,
               p.user_id AS r_user, p.event_id AS r_event_id, p.ts AS r_ts
        FROM c FULL JOIN p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL '1 hour'
    """,
    tags=("streaming", "join"),
)
def streaming_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join executed BY THE STREAMING
    ENGINE: on top of the left-outer semantics, every unmatched purchase
    also emits once with NULL click columns after the watermark proves no
    click can still pair with it. Drained exactly like the left-outer
    twin — two checkpointed availableNow runs over a growing source dir,
    run 2 adding a far-future sentinel PAIR (one event per side's filter,
    VERIFY.md gotcha: the global watermark is the min across both inputs
    and each side's filter runs before its watermark). The terminal sink
    equals the batch FULL JOIN, which the oracle states directly.

    Scale shape: same watermark-bounded shuffled join as the inner/left
    variants — full-outer adds the right-side null-emission path, not
    state: both sides still evict by watermark + interval."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cloudfloe_spark.sources.tables import load_table
    from cloudfloe_spark.streaming.windows import stream_stream_full_outer_join

    base = tempfile.mkdtemp(prefix="cf_fouter_")
    src = os.path.join(base, "src")
    out = os.path.join(base, "out")
    cp = os.path.join(base, "cp")
    os.makedirs(src, exist_ok=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b0"))

    def _run() -> None:
        sdf = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        ).parquet(f"{src}/*")
        joined = stream_stream_full_outer_join(sdf, sdf)
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(180):
                raise TimeoutError("full-outer streaming run exceeded 180s")
        finally:
            q.stop()

    _run()
    sentinel = spark.createDataFrame(
        [
            (-1, "2035-01-01 00:00:00", -1, "click"),
            (-2, "2035-01-01 00:00:00", -1, "purchase"),
        ],
        "event_id long, ts_s string, user_id long, event_type string",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type")
    sentinel.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    _run()

    try:
        return (
            spark.read.parquet(out)
            .filter(
                (F.col("l_user").isNull() | (F.col("l_user") >= 0))
                & (F.col("r_user").isNull() | (F.col("r_user") >= 0))
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "streaming_approx_distinct_users",
    # Sketch values are engine-specific → contract oracle (cf.
    # agg_approx_distinct): the STREAMING engine's HLL++ estimate per
    # event type must land within 5% of the exact distinct count, whose
    # value hash-compares.
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS within_tol
        FROM events
        GROUP BY event_type
    """,
    tags=("streaming", "approx", "sketch"),
)
def streaming_approx_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate distinct users per event type computed BY THE
    STREAMING ENGINE (approx_count_distinct is one of the few aggregates
    whose state is a bounded mergeable sketch — exactly why it, and not
    exact COUNT DISTINCT, is what a 100-TB streaming dashboard runs: the
    state store holds an HLL++ buffer per group, not a user-id set).
    Contract-gated against the exact batch distinct at 5%.

    Scale shape: per-group state is O(sketch), independent of stream
    length; the exact count exists here only as the yardstick."""
    from pyspark.sql import functions as F

    from cloudfloe_spark.sources.tables import load_table
    from cloudfloe_spark.streaming.windows import (
        run_available_now,
        stream_events,
    )

    est = run_available_now(
        stream_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users")),
        name=_unique("st_approx"),
        output_mode="complete",
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").cast("bigint").alias("exact_users"))
    )
    tol = 0.05
    return exact.join(est, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= tol
        ).alias("within_tol"),
    )
