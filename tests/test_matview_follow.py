"""Continuous matview maintenance from the commit-tail source (r10,
VERDICT r9 #6): a streaming query follows the base via CDC micro-batches
and applies them to the target with exactly-once epochs — the streaming
twin of the batch incremental refresh."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pytest

from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable
from cloudfloe_spark.sources.iceberg_views import (
    IcebergViewError,
    create_iceberg_view,
    materialize_iceberg_view,
    materialized_view_status,
)
from cloudfloe_spark.sources.maintenance import delete_where, update_where
from cloudfloe_spark.streaming.matview_follow import follow_materialized_view

T1 = 1700000000000


def _rows(spark, root, cols):
    from cloudfloe_spark.service.iceberg_local import resolve_iceberg_reads

    sess = spark.newSession()
    df = sess.sql(
        resolve_iceberg_reads(
            sess, f"SELECT {cols} FROM iceberg_scan('{root}')"
        )
    )
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def followed(spark, tmp_path):
    """Base + keyed row view + materialized target, ready to follow."""
    base = str(tmp_path / "base")
    t = LocalIcebergTable(
        base,
        pa.schema(
            [("id", pa.int64()), ("lang", pa.string()), ("n", pa.int64())]
        ),
    )
    t.append_snapshot(
        [
            pa.table({"id": [1, 2, 3], "lang": ["en", "de", "en"],
                      "n": [10, 20, 30]}),
            pa.table({"id": [4, 5, 6], "lang": ["fr", "en", "de"],
                      "n": [40, 50, 60]}),
        ],
        timestamp_ms=T1,
    )
    vroot = str(tmp_path / "v")
    troot = str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT id, upper(lang) AS lang_up, n * 2 AS n2 "
        f"FROM iceberg_scan('{base}') WHERE n < 900",
        timestamp_ms=T1 + 500,
    )
    materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 1000, key_cols=["id"]
    )
    return base, vroot, troot


def test_stream_of_dmls_converges_matview(spark, followed, tmp_path):
    base, vroot, troot = followed
    ck = str(tmp_path / "ck")
    # a stream of DMLs: delete, update, update-out-of-slice
    delete_where(spark, base, "id = 2", timestamp_ms=T1 + 2000)
    update_where(spark, base, "id = 5", {"n": "55"}, timestamp_ms=T1 + 3000)
    update_where(
        spark, base, "id = 6", {"n": "1000"}, timestamp_ms=T1 + 4000
    )  # leaves the n < 900 slice
    stats = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 5000
    )
    assert stats["batches"] >= 1 and stats["skipped"] == 0
    got = _rows(spark, troot, "id, lang_up, n2")
    assert got == [
        (1, "EN", 20), (3, "EN", 60), (4, "FR", 80), (5, "EN", 110),
    ]
    # batch/stream coherence: the freshness property advanced with the
    # stream — the batch status sees the target FRESH
    assert materialized_view_status(troot)["stale"] is False


def test_crash_replayed_epoch_is_noop(spark, followed, tmp_path):
    base, vroot, troot = followed
    ck = str(tmp_path / "ck")
    delete_where(spark, base, "id = 1", timestamp_ms=T1 + 2000)
    s1 = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 3000
    )
    assert s1["batches"] == 1
    before = _rows(spark, troot, "id, n2")
    # crash window: the streaming commit log is lost, the epoch replays
    shutil.rmtree(os.path.join(ck, "commits"), ignore_errors=True)
    s2 = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 4000,
        fast_no_op=False,
    )
    assert s2["batches"] == 0 and s2["skipped"] == 1
    assert _rows(spark, troot, "id, n2") == before


def test_restart_applies_only_new_commits(spark, followed, tmp_path):
    base, vroot, troot = followed
    ck = str(tmp_path / "ck")
    delete_where(spark, base, "id = 1", timestamp_ms=T1 + 2000)
    follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 3000
    )
    update_where(spark, base, "id = 4", {"n": "44"}, timestamp_ms=T1 + 4000)
    s2 = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 5000
    )
    assert s2["batches"] == 1
    got = _rows(spark, troot, "id, n2")
    assert got == [(2, 40), (3, 60), (4, 88), (5, 100), (6, 120)]
    assert materialized_view_status(troot)["stale"] is False


@pytest.fixture()
def agg_followed(spark, tmp_path):
    """Base + per-key aggregate view + materialized target (r11: agg
    shapes follow through the pinned-range incremental apply)."""
    base = str(tmp_path / "base")
    t = LocalIcebergTable(
        base,
        pa.schema(
            [("id", pa.int64()), ("lang", pa.string()), ("n", pa.int64())]
        ),
    )
    t.append_snapshot(
        [
            pa.table({"id": [1, 2, 3], "lang": ["en", "de", "en"],
                      "n": [10, 20, 30]}),
            pa.table({"id": [4, 5, 6], "lang": ["fr", "en", "de"],
                      "n": [40, 50, 60]}),
        ],
        timestamp_ms=T1,
    )
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT lang, COUNT(*) AS c, SUM(n) AS s "
        f"FROM iceberg_scan('{base}') GROUP BY lang",
        timestamp_ms=T1 + 500,
    )
    materialize_iceberg_view(spark, vroot, troot, timestamp_ms=T1 + 1000)
    return base, vroot, troot


def test_agg_view_follows_incrementally(spark, agg_followed, tmp_path):
    """VERDICT r10 #3: a stream of base DMLs converges an AGGREGATE
    matview through the follower — each epoch applies the same
    touched-group recompute the batch incremental refresh uses, pinned
    to the epoch's commit range."""
    base, vroot, troot = agg_followed
    ck = str(tmp_path / "ck")
    delete_where(spark, base, "id = 2", timestamp_ms=T1 + 2000)  # de -1
    update_where(spark, base, "id = 5", {"n": "55"}, timestamp_ms=T1 + 3000)
    stats = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 4000
    )
    assert stats["batches"] >= 1 and stats["skipped"] == 0
    assert all(p == "incremental-agg" for p in stats["paths"]), stats
    got = _rows(spark, troot, "lang, c, s")
    assert got == [("de", 1, 60), ("en", 3, 95), ("fr", 1, 40)]
    assert materialized_view_status(troot)["stale"] is False


def test_agg_follow_crash_replayed_epoch_is_noop(
    spark, agg_followed, tmp_path
):
    base, vroot, troot = agg_followed
    ck = str(tmp_path / "ck")
    delete_where(spark, base, "id = 1", timestamp_ms=T1 + 2000)
    s1 = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 3000
    )
    assert s1["batches"] == 1
    before = _rows(spark, troot, "lang, c, s")
    # crash window: the streaming commit log is lost, the epoch replays
    shutil.rmtree(os.path.join(ck, "commits"), ignore_errors=True)
    s2 = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 4000,
        fast_no_op=False,
    )
    assert s2["batches"] == 0 and s2["skipped"] == 1
    assert _rows(spark, troot, "lang, c, s") == before
    # and new commits still flow after the replay
    update_where(spark, base, "id = 6", {"n": "66"}, timestamp_ms=T1 + 5000)
    s3 = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 6000
    )
    assert s3["batches"] == 1
    assert _rows(spark, troot, "lang, c, s") == [
        ("de", 2, 86), ("en", 2, 80), ("fr", 1, 40),
    ]


def test_join_view_follows_both_bases_moved_in_one_epoch(
    spark, tmp_path
):
    """VERDICT r10 #3 (join shape): the follower tails the FACT base;
    when the dim ALSO moved inside the epoch's window, the pinned-range
    apply routes through the both-moved ℤ-netted delta — and a crash
    replay reuses the intent-recorded range, making the epoch a no-op."""
    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    tf = LocalIcebergTable(
        fact, pa.schema([("id", pa.int64()), ("k", pa.int64()),
                         ("amt", pa.int64())])
    )
    tf.append_snapshot(
        [pa.table({"id": [1, 2, 3, 4], "k": [10, 10, 20, 30],
                   "amt": [100, 200, 300, 400]})],
        timestamp_ms=T1,
    )
    td = LocalIcebergTable(
        dim, pa.schema([("k", pa.int64()), ("name", pa.string())])
    )
    td.append_snapshot(
        [pa.table({"k": [10, 20, 30], "name": ["a", "b", "c"]})],
        timestamp_ms=T1,
    )
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT f.id AS id, f.amt AS amt, d.name AS name "
        f"FROM iceberg_scan('{fact}') f JOIN iceberg_scan('{dim}') d "
        f"ON f.k = d.k",
        timestamp_ms=T1 + 500,
    )
    materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 1000, key_cols=["id"]
    )
    # both bases move before the drain: fact DML + dim update
    delete_where(spark, fact, "id = 2", timestamp_ms=T1 + 2000)
    update_where(
        spark, dim, "k = 20", {"name": "'B'"}, timestamp_ms=T1 + 3000
    )
    ck = str(tmp_path / "ck")
    stats = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 4000
    )
    assert stats["batches"] == 1, stats
    assert stats["paths"] == ["incremental-join-both"], stats
    got = _rows(spark, troot, "id, amt, name")
    assert got == [(1, 100, "a"), (3, 300, "B"), (4, 400, "c")]
    assert materialized_view_status(troot)["stale"] is False
    # the stamp cleared the epoch intent
    from cloudfloe_spark.sources import iceberg_meta as im

    assert "cloudfloe.mv-intent" not in (
        im.load_metadata(troot).get("properties") or {}
    )
    # crash replay: commit log lost, epoch re-runs — dedup no-op
    before = _rows(spark, troot, "id, amt, name")
    shutil.rmtree(os.path.join(ck, "commits"), ignore_errors=True)
    s2 = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 5000,
        fast_no_op=False,
    )
    assert s2["batches"] == 0 and s2["skipped"] == 1, s2
    assert _rows(spark, troot, "id, amt, name") == before


def test_join_follow_single_side_epoch_uses_fact_delta(spark, tmp_path):
    """Only the fact side moved in the epoch: the pinned-range apply
    takes the ordinary Δfact ⋈ dim path."""
    fact, dim = str(tmp_path / "fact"), str(tmp_path / "dim")
    tf = LocalIcebergTable(
        fact, pa.schema([("id", pa.int64()), ("k", pa.int64())])
    )
    tf.append_snapshot(
        [pa.table({"id": [1, 2], "k": [10, 20]})], timestamp_ms=T1
    )
    td = LocalIcebergTable(
        dim, pa.schema([("k", pa.int64()), ("name", pa.string())])
    )
    td.append_snapshot(
        [pa.table({"k": [10, 20], "name": ["a", "b"]})], timestamp_ms=T1
    )
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT f.id AS id, d.name AS name "
        f"FROM iceberg_scan('{fact}') f JOIN iceberg_scan('{dim}') d "
        f"ON f.k = d.k",
        timestamp_ms=T1 + 500,
    )
    materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 1000, key_cols=["id"]
    )
    delete_where(spark, fact, "id = 1", timestamp_ms=T1 + 2000)
    stats = follow_materialized_view(
        spark, vroot, troot,
        checkpoint_dir=str(tmp_path / "ck"), timestamp_ms=T1 + 3000,
    )
    assert stats["paths"] == ["incremental-join"], stats
    assert _rows(spark, troot, "id, name") == [(2, "b")]


def test_nonqualifying_view_refuses_to_follow(spark, tmp_path):
    """Shapes outside row/agg/join (here: a GROUP BY expression) still
    fail at start with a clear pointer at the batch refresh."""
    base = str(tmp_path / "base")
    t = LocalIcebergTable(
        base, pa.schema([("lang", pa.string()), ("n", pa.int64())])
    )
    t.append_snapshot(
        [pa.table({"lang": ["en", "de"], "n": [1, 2]})], timestamp_ms=T1
    )
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT upper(lang) AS lang_up, COUNT(*) AS c "
        f"FROM iceberg_scan('{base}') GROUP BY upper(lang)",
        timestamp_ms=T1 + 500,
    )
    materialize_iceberg_view(spark, vroot, troot, timestamp_ms=T1 + 1000)
    with pytest.raises(IcebergViewError, match="refresh_materialized_view"):
        follow_materialized_view(
            spark, vroot, troot,
            checkpoint_dir=str(tmp_path / "ck"), timestamp_ms=T1 + 2000,
        )


def test_expired_batch_commits_fail_loudly_not_skip(tmp_path):
    """ADVICE r11 (medium): a non-empty batch whose commits are all gone
    from the base's snapshot-log (expire_snapshots ran between commit and
    drain) must raise — not count as an empty epoch and silently advance
    the checkpoint past the changes. An actually-empty batch stays a
    clean None."""
    from cloudfloe_spark.streaming.matview_follow import (
        _last_covered_commit,
    )

    base = str(tmp_path / "base")
    t = LocalIcebergTable(base, pa.schema([("id", pa.int64())]))
    t.append_snapshot([pa.table({"id": [1]})], timestamp_ms=T1)
    t.append_snapshot([pa.table({"id": [2]})], timestamp_ms=T1 + 1000)
    from cloudfloe_spark.sources import iceberg_meta as im

    log = [
        e["snapshot-id"]
        for e in im.load_metadata(base).get("snapshot-log", [])
    ]
    assert _last_covered_commit(base, set()) is None  # empty epoch
    assert _last_covered_commit(base, {log[0]}) == str(log[0])
    assert _last_covered_commit(base, set(log)) == str(log[-1])
    with pytest.raises(IcebergViewError, match="expired"):
        _last_covered_commit(base, {123456789})


def _join_followed(spark, tmp_path):
    fact, dim = str(tmp_path / "fact"), str(tmp_path / "dim")
    tf = LocalIcebergTable(
        fact, pa.schema([("id", pa.int64()), ("k", pa.int64())])
    )
    tf.append_snapshot(
        [pa.table({"id": [1, 2], "k": [10, 20]})], timestamp_ms=T1
    )
    td = LocalIcebergTable(
        dim, pa.schema([("k", pa.int64()), ("name", pa.string())])
    )
    td.append_snapshot(
        [pa.table({"k": [10, 20], "name": ["a", "b"]})], timestamp_ms=T1
    )
    vroot, troot = str(tmp_path / "v"), str(tmp_path / "mv")
    create_iceberg_view(
        vroot,
        f"SELECT f.id AS id, d.name AS name "
        f"FROM iceberg_scan('{fact}') f JOIN iceberg_scan('{dim}') d "
        f"ON f.k = d.k",
        timestamp_ms=T1 + 500,
    )
    materialize_iceberg_view(
        spark, vroot, troot, timestamp_ms=T1 + 1000, key_cols=["id"]
    )
    return fact, dim, vroot, troot


def test_join_follow_dim_only_movement_next_fact_epoch(spark, tmp_path):
    """VERDICT r11 #7: the follower tails the FACT base, so a dim-only
    movement produces no epoch on its own drain — and is then picked up
    by the NEXT fact epoch, whose pinned range resolves the dim's
    CURRENT snapshot (both-moved netting)."""
    fact, dim, vroot, troot = _join_followed(spark, tmp_path)
    ck = str(tmp_path / "ck")
    # dim-only movement: the drain sees no fact commits -> no apply
    update_where(
        spark, dim, "k = 10", {"name": "'A'"}, timestamp_ms=T1 + 2000
    )
    s1 = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 3000
    )
    assert s1["batches"] == 0, s1
    assert _rows(spark, troot, "id, name") == [(1, "a"), (2, "b")]
    # next fact epoch picks the dim movement up too
    delete_where(spark, fact, "id = 2", timestamp_ms=T1 + 4000)
    s2 = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 5000
    )
    assert s2["batches"] == 1, s2
    assert s2["paths"] == ["incremental-join-both"], s2
    assert _rows(spark, troot, "id, name") == [(1, "A")]
    assert materialized_view_status(troot)["stale"] is False


def test_join_follow_unresolvable_unrecorded_dim_raises(spark, tmp_path):
    """ADVICE r11 (low): when the dim base is unresolvable AND the
    target's record carries no prior id for it, the epoch raises a
    descriptive error instead of pinning the literal string 'None' into
    a VERSION AS OF clause."""
    import json as _json

    from cloudfloe_spark.sources import iceberg_meta as im
    from cloudfloe_spark.sources.iceberg_fixture import (
        write_next_metadata_version,
    )

    fact, dim, vroot, troot = _join_followed(spark, tmp_path)
    meta = im.load_metadata(troot)
    rec = _json.loads(meta["properties"]["cloudfloe.mv"])
    rec["bases"][dim] = None  # unrecorded
    meta["properties"]["cloudfloe.mv"] = _json.dumps(rec, sort_keys=True)
    write_next_metadata_version(troot, meta)
    shutil.rmtree(dim)  # unreadable
    delete_where(spark, fact, "id = 1", timestamp_ms=T1 + 2000)
    with pytest.raises(Exception, match="cannot pin base"):
        follow_materialized_view(
            spark, vroot, troot,
            checkpoint_dir=str(tmp_path / "ck"), timestamp_ms=T1 + 3000,
        )


def test_fast_no_op_drain_skips_streaming(spark, agg_followed, tmp_path):
    """VERDICT r11 #6: a drain against an unmoved base answers from
    metadata (fast_no_op) — no streaming query, ~ms instead of the
    ~1.3 s empty AvailableNow round-trip — and a moved base still takes
    the full path. The documented constraint: the WITH-data fixed cost
    is Spark's per-start streaming lifecycle (micro-batch planning +
    offset WAL + a per-query Python data-source planner worker) and is
    amortizable only by a continuous query or by using the batch
    refresh_materialized_view for one-shot agg/join maintenance."""
    import time

    base, vroot, troot = agg_followed
    ck = str(tmp_path / "ck")
    delete_where(spark, base, "id = 1", timestamp_ms=T1 + 2000)
    s1 = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 3000
    )
    assert s1["batches"] == 1 and "fast_no_op" not in s1
    before = _rows(spark, troot, "lang, c, s")
    t0 = time.time()
    s2 = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 4000
    )
    dt = time.time() - t0
    assert s2.get("fast_no_op") is True and s2["batches"] == 0
    assert dt < 0.5, dt  # metadata-only, never a streaming start
    assert _rows(spark, troot, "lang, c, s") == before
    # a new commit takes the full path again
    update_where(spark, base, "id = 6", {"n": "66"}, timestamp_ms=T1 + 5000)
    s3 = follow_materialized_view(
        spark, vroot, troot, checkpoint_dir=ck, timestamp_ms=T1 + 6000
    )
    assert s3["batches"] == 1 and "fast_no_op" not in s3
