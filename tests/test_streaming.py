"""Streaming-vs-batch equivalence tests (SURVEY.md §7.3 risk 5 strategy:
every streaming op has a batch twin; the twin is oracle-checked, streaming
is checked against the twin)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloudfloe_spark.sources.tables import load_table
from cloudfloe_spark.streaming import (
    dedup_within_watermark,
    run_available_now,
    session_counts,
    sliding_avg,
    stream_events,
    stream_static_enrich,
    tumbling_counts,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture()
def events_stream(spark, sf_dir):
    return stream_events(spark, sf_dir)


@pytest.fixture()
def events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_stream_source_is_streaming(events_stream):
    assert events_stream.isStreaming
    assert events_stream.schema["ts"].dataType.simpleString() == "timestamp"


def test_stream_source_schema_cache_hits_and_invalidates(spark, sf_dir, tmp_path):
    """r16: the stream source caches the fixture schema per (realpath,
    size, mtime_ns) — a repeat call must serve the cached schema, and a
    REWRITTEN file (new identity) must re-infer, never serve stale."""
    import os
    import shutil

    from cloudfloe_spark.streaming import windows as W

    src = os.path.join(sf_dir, "events.parquet")
    work = str(tmp_path / "evdir")
    os.makedirs(work)
    shutil.copy(src, os.path.join(work, "events.parquet"))

    W._SCHEMA_CACHE.clear()
    s1 = stream_events(spark, work).schema
    key = next(iter(W._SCHEMA_CACHE))
    assert W._SCHEMA_CACHE
    s2 = stream_events(spark, work).schema
    assert s1 == s2 and list(W._SCHEMA_CACHE) == [key]  # served from cache

    # Rewrite the fixture with one column dropped: identity changes, the
    # cache must miss and the new schema must surface.
    base = spark.read.parquet(src).drop("value")
    tmp_out = str(tmp_path / "rewrite")
    base.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    part = [f for f in os.listdir(tmp_out) if f.endswith(".parquet")][0]
    shutil.copy(
        os.path.join(tmp_out, part), os.path.join(work, "events.parquet")
    )
    s3 = stream_events(spark, work).schema
    assert "value" not in s3.fieldNames()


def test_tumbling_counts_matches_batch(events_stream, events_batch):
    got = run_available_now(
        tumbling_counts(events_stream), name="t_tumble", output_mode="complete"
    )
    want = (
        events_batch.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value")
    )
    cols = ["win_start", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sliding_avg_matches_batch(events_stream, events_batch):
    got = run_available_now(
        sliding_avg(events_stream), name="t_slide", output_mode="complete"
    )
    want = (
        events_batch.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "avg_value")
    )
    cols = ["win_start", "n_events", "avg_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_counts_matches_batch(events_stream, events_batch):
    got = run_available_now(
        session_counts(events_stream), name="t_sess", output_mode="complete"
    )
    want = (
        events_batch.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_dedup_within_watermark_matches_batch(events_stream, events_batch):
    got = run_available_now(
        dedup_within_watermark(events_stream).select("event_id"),
        name="t_dedup",
        output_mode="append",
    )
    # Fixture event_ids are unique, so streaming dedup must be the identity
    # set; a duplicated-id variant is pinned in the late-data test below.
    assert got.count() == events_batch.select("event_id").distinct().count()


def test_stream_static_enrich(events_stream, spark, sf_dir):
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    got = run_available_now(
        stream_static_enrich(events_stream, dim)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n")),
        name="t_enrich",
        output_mode="complete",
    )
    assert got.count() > 0
    total = got.agg(F.sum("n")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "events").count()


def test_watermark_drops_late_data(spark, tmp_path):
    """Two checkpointed runs over a growing source dir (deterministic batch
    order, unlike relying on file-listing order): run 2 delivers an event
    ~12h older than the committed watermark → its window must never reach
    the append-mode sink."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    cp = tmp_path / "cp"
    src.mkdir()

    def _write(name, rows):
        (
            spark.createDataFrame(rows, "event_id long, ts_s string")
            .select("event_id", F.to_timestamp("ts_s").alias("ts"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(src / name))
        )

    def _run():
        sdf = spark.readStream.schema("event_id long, ts timestamp").parquet(
            f"{src}/*"
        )
        agg = (
            sdf.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("win_start"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(cp))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    _write("b0", [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:05:00"),
                  (3, "2024-01-01 12:00:00")])
    _run()  # commits watermark = 12:00 - 10min = 11:50
    _write("b1", [(4, "2024-01-01 00:00:30")])  # far below the watermark
    _run()

    starts = {
        r["win_start"].isoformat()
        for r in spark.read.parquet(str(out)).collect()
    }
    assert any(s.startswith("2024-01-01T10") for s in starts)  # emitted
    assert not any(s.startswith("2024-01-01T00") for s in starts)  # dropped


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream inner interval join (watermarks both sides) must equal
    the same join run in batch over the full fixture."""
    from cloudfloe_spark.streaming import stream_stream_interval_join

    s1 = stream_events(spark, sf_dir)
    s2 = stream_events(spark, sf_dir)
    got = run_available_now(
        stream_stream_interval_join(s1, s2),
        name="ss_join",
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
    )
    want = clicks.join(
        purchases,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 hour")),
    ).select("l_user", "l_event_id", "l_ts", "r_event_id", "r_ts")

    cols = ["l_user", "l_event_id", "l_ts", "r_event_id", "r_ts"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0


def test_left_outer_join_emits_nulls_after_watermark(spark, tmp_path):
    """The left-outer stream-stream join's distinguishing behavior — a
    click with NO purchase inside the interval must surface with NULL
    right columns once the watermark proves no match can arrive (the
    fixture corpus happens to match every click, so the catalog twin
    alone never exercises this path)."""
    from cloudfloe_spark.streaming.windows import stream_stream_left_outer_join

    src = tmp_path / "src"
    out = tmp_path / "out"
    cp = tmp_path / "cp"
    src.mkdir()
    schema = "event_id long, ts_s string, user_id long, event_type string"

    def _write(name, rows):
        (
            spark.createDataFrame(rows, schema)
            .select(
                "event_id",
                F.to_timestamp("ts_s").alias("ts"),
                "user_id",
                "event_type",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(src / name))
        )

    def _run():
        sdf = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        ).parquet(f"{src}/*")
        q = (
            stream_stream_left_outer_join(sdf, sdf)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(cp))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    _write(
        "b0",
        [
            # user 1: click matched by a purchase 30 min later
            (1, "2024-01-01 10:00:00", 1, "click"),
            (2, "2024-01-01 10:30:00", 1, "purchase"),
            # user 2: click with a purchase OUTSIDE the 1h interval
            (3, "2024-01-01 10:00:00", 2, "click"),
            (4, "2024-01-01 12:00:00", 2, "purchase"),
            # user 3: click with no purchase at all
            (5, "2024-01-01 10:00:00", 3, "click"),
        ],
    )
    _run()
    # far-future sentinel PAIR: the global watermark is the MIN across
    # both join inputs, and each side filters to its own event_type — a
    # click-only sentinel would advance the left side while the right
    # side's watermark (and therefore the global one) stays put, and no
    # null row ever flushes. One sentinel per side.
    _write(
        "b1",
        [
            (900, "2024-02-01 00:00:00", -1, "click"),
            (901, "2024-02-01 00:00:00", -1, "purchase"),
        ],
    )
    _run()

    rows = {
        r["l_event_id"]: r
        for r in spark.read.parquet(str(out))
        .filter(F.col("l_user") >= 0)
        .collect()
    }
    assert set(rows) == {1, 3, 5}
    assert rows[1]["r_event_id"] == 2           # matched inside interval
    assert rows[3]["r_event_id"] is None        # match outside interval
    assert rows[5]["r_event_id"] is None        # no match at all
